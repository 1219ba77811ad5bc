"""Measure pure-Python codec throughput (images/sec/core, samples/sec)
so the 100 TB CPU cost of the decode stages is a NUMBER, not a caveat
(VERDICT r6 ask #5). Prints one JSON line per (codec, size).

The decode stages are zero-shuffle Arrow-batched maps, so cluster
throughput = per-core throughput x cores; these numbers feed the
SCALE.md "codec throughput" table, alongside the production swap
(codecs.register_pixel_decoder) for closing the gap with native codecs.

Usage: python tools/codec_throughput.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from stellar_etl_airflow_spark.training import codecs, flac
from stellar_etl_airflow_spark.training.jpeg import (
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_progressive,
)


def bench(name: str, payload: bytes, decode, reps: int, meta: dict) -> None:
    # warm once (numpy import, table builds)
    out = decode(payload)
    assert out is not None, name
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        decode(payload)
        best = min(best, time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "codec": name,
                **meta,
                "payload_bytes": len(payload),
                "sec_per_item": round(best, 4),
                "items_per_sec_per_core": round(1.0 / best, 2),
            }
        )
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rng = np.random.default_rng(0)

    for side in (64, 256):
        # natural-ish content (smooth + noise) — entropy in a realistic range
        xx, yy = np.meshgrid(np.arange(side), np.arange(side))
        base = (
            96
            + 64 * np.sin(xx / 17)
            + 48 * np.cos(yy / 23)
            + rng.normal(0, 12, (side, side))
        )
        img = np.clip(
            np.stack([base, base * 0.9, base * 1.1], axis=2), 0, 255
        ).astype(np.uint8)
        meta = {"px": f"{side}x{side}x3"}
        bench("jpeg_baseline", jpeg_encode(img, quant=4), jpeg_decode, reps, meta)
        bench(
            "jpeg_progressive",
            jpeg_encode_progressive(img, quant=4),
            jpeg_decode,
            reps,
            meta,
        )
        bench("png", codecs.png_encode(img), codecs.png_decode, reps, meta)

    # audio: 1 second of 44.1 kHz mono
    t = np.arange(44100)
    pcm = (12000 * np.sin(t / 15) + rng.normal(0, 300, t.size)).astype(np.int64)
    bench(
        "flac",
        flac.flac_encode(pcm, block_size=4096),
        flac.flac_decode,
        reps,
        {"px": "44100 samples (1 s mono)"},
    )


if __name__ == "__main__":
    main()
