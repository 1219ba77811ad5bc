"""Measure the native-decoder seam IN THE PIPELINE (r9, VERDICT r8 ask
#5): the same JPEG corpus driven through the real Spark path —
``multimodal.image_pixel_stats`` (mapInPandas decode + RMS over Arrow
batches) — once seam-OFF (pure-Python training/jpeg.py) and once
seam-ON (``native_jpeg`` libjpeg-turbo shim registered cluster-wide via
``codecs.use_pixel_decoder_spec``). Prints one JSON line per mode with
wall seconds and MP/s, then a summary line with the speedup. Converts
the "swap is one call" claim from tested-in-unit to measured-in-pipeline
(SCALE.md codec-throughput section).

Usage: python tools/native_seam_probe.py [n_images] [side_px] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from stellar_etl_airflow_spark.session import default_parallelism, get_spark
from stellar_etl_airflow_spark.training import codecs, multimodal, native_jpeg
from stellar_etl_airflow_spark.training.jpeg import jpeg_encode


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    if not native_jpeg.available():
        print(json.dumps({"error": "native shim unavailable (no gcc/jpeglib)"}))
        return

    spark = get_spark("native-seam-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # natural-content JPEGs (block-smooth so entropy coding has work to
    # do), encoded ONCE driver-side with the repo's own encoder
    rng = np.random.RandomState(11)
    payloads = []
    for i in range(n):
        base = rng.randint(0, 255, (side // 8, side // 8, 3)).astype(np.float64)
        img = np.kron(base, np.ones((8, 8, 1)))[:side, :side].astype(np.uint8)
        payloads.append((i, bytearray(jpeg_encode(img))))
    media = spark.createDataFrame(
        payloads, "doc_id long, payload binary"
    ).repartition(default_parallelism()).persist()
    media.count()
    megapixels = n * side * side / 1e6

    def run_mode(mode: str, spec) -> dict:
        codecs.use_pixel_decoder_spec(spec)
        try:
            walls = []
            for _ in range(reps):
                t0 = time.perf_counter()
                got = multimodal.image_pixel_stats(media)
                cnt = got.count()
                walls.append(time.perf_counter() - t0)
            assert cnt == n, f"{mode}: decoded {cnt}/{n}"
            wall = min(walls)
            row = {
                "probe": "native_seam",
                "mode": mode,
                "images": n,
                "side_px": side,
                "wall_sec": round(wall, 3),
                "mp_per_sec": round(megapixels / wall, 2),
                "reps": reps,
            }
            print(json.dumps(row), flush=True)
            return row
        finally:
            codecs.use_pixel_decoder_spec(None)

    off = run_mode("seam_off_pure_python", None)
    on = run_mode("seam_on_libjpeg_turbo", native_jpeg.NATIVE_JPEG_SPEC)
    print(
        json.dumps(
            {
                "probe": "native_seam_summary",
                "speedup": round(off["wall_sec"] / on["wall_sec"], 1),
                "mp_per_sec_off": off["mp_per_sec"],
                "mp_per_sec_on": on["mp_per_sec"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
