"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The design for image/audio/video at 100 TB: payloads travel as ``binary``
columns (or object-store URIs for very large blobs) next to typed metadata
columns; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so the Python codec cost is amortized
per batch, not per row, and the pipeline stays a plain DataFrame plan
(partitionable, spillable, AQE-planned).

Codec status: common container HEADERS are parsed for real with pure
stdlib ``struct`` (``training/codecs.py``): PNG/GIF/BMP/JPEG dimensions,
WAV sample rate / channels / duration, and true RMS energy for 16-bit PCM
WAVs. Since r6, PIXELS decode for real too: PNG (zlib inflate + numpy
scanline unfiltering), BMP, GIF (pure-Python LZW + palette), and
baseline JPEG (training/jpeg.py — Huffman + exact IDCT, cross-validated
pixel-by-pixel against the JVM's javax.imageio). Resize is a true
pixels-in/PNG-out transform and image RMS is computed from actual
pixels (progressive JPEG included since r7). Only arithmetic-coded
JPEG, video containers, and compressed audio frames fall back to
``*_stub`` deterministic fakes — the clearly-marked seam where
PIL/ffmpeg/torchaudio plug in. Everything around the seam — schema,
batching, partitioning, UDF signature — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal record layout: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from the documents fixture: the utf-8 bytes of
    the text stand in for an encoded image payload. Spread so the codec
    ``mapInPandas`` stages downstream never serialize on one scan split."""
    from ..session import spread

    df = spread(df)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """Fallback for payloads that are NOT a recognized image container.

    Deterministic fake: pseudo width/height derived from the payload md5 —
    replace the body with `PIL.Image.open(io.BytesIO(payload)).size` when a
    full pixel decoder is available. Raising NotImplementedError here would
    be correct too; the fake keeps the downstream plumbing testable.
    """
    h = hashlib.md5(payload).hexdigest()
    return 64 + int(h[:4], 16) % 1920, 64 + int(h[4:8], 16) % 1080


def decode_image(payload: bytes) -> tuple[int, int]:
    """Image dimensions: REAL header parse for PNG/GIF/BMP/JPEG
    (training/codecs.py, pure stdlib struct), deterministic stub for
    unrecognized formats."""
    from . import codecs

    dims = codecs.image_dimensions(payload)
    return dims if dims is not None else decode_image_stub(payload)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def frame_count_stub(payload: bytes) -> int:
    """STUB for container probing (ffprobe et al.): deterministic 1-4
    pseudo-frames from the payload hash."""
    h = hashlib.md5(payload).hexdigest()
    return 1 + int(h[:15], 16) % 4


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame sampling as an Arrow-batched 1->N expansion: each payload
    yields n_frames rows with per-frame digests. REAL for MJPEG-AVI since
    r6 (codecs.avi_mjpeg_frames demuxes the movi chunks; each frame is a
    standalone baseline JPEG our decoder can open) and for animated GIF
    since r7 (codecs.gif_frames slices per-image-descriptor regions) —
    frame_md5 is then the digest of the actual frame bytes. Other
    containers keep the deterministic stub (inter-frame codecs need a
    real library); the batch-explode plumbing (one output DataFrame per
    Arrow batch, rows multiplied) is the production shape for frame
    extraction at scale. Since r7 the INTER-FRAME path is real too:
    BI_RLE8 AVIs decode with frame-state carry (codecs.avi_rle8_frames —
    delta/skip opcodes reconstruct pixels from the previous frame), and
    frame_md5 digests the reconstructed pixel array, so a digest match
    proves the stateful decode, not just the demux."""
    from . import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_index": [], "n_frames": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                rle = codecs.avi_rle8_frames(raw)
                real = (
                    [f.tobytes() for f in rle]
                    if rle
                    else (
                        codecs.avi_mjpeg_frames(raw)
                        or codecs.mp4_mjpeg_frames(raw)
                        or codecs.gif_frames(raw)
                    )
                )
                if real:
                    for i, fr in enumerate(real):
                        out["doc_id"].append(doc_id)
                        out["frame_index"].append(i)
                        out["n_frames"].append(len(real))
                        out["frame_md5"].append(hashlib.md5(fr).hexdigest())
                    continue
                n = frame_count_stub(raw)
                content = hashlib.md5(raw).hexdigest()
                for i in range(n):
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(i)
                    out["n_frames"].append(n)
                    out["frame_md5"].append(hashlib.md5(f"{content}:{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_index": pd.Series(out["frame_index"], dtype="int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "frame_md5": pd.Series(out["frame_md5"], dtype="object"),
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB for formats whose pixels need an external codec (arithmetic
    JPEG, video): deterministic fake scaling the byte budget with the
    target area."""
    budget = max(16, (width * height) // 64)
    reps = (budget // max(len(payload), 1)) + 1
    return (payload * reps)[:budget]


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize for PNG/BMP/GIF/baseline-JPEG payloads since r6:
    decode pixels (codecs.image_pixels — stdlib zlib + numpy unfilter,
    GIF-LZW, or the T.81 baseline/progressive decoder), nearest-neighbor
    sample to the target grid, re-encode as PNG (codecs.png_encode).
    Formats that genuinely need an external pixel codec (arithmetic
    JPEG, video) fall back to the deterministic stub."""
    import numpy as np

    from . import codecs

    px = codecs.image_pixels(payload)
    if px is None:
        return resize_image_stub(payload, width, height)
    h, w = px.shape[:2]
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    return codecs.png_encode(px[rows][:, cols])


def resize_images(media: DataFrame, width: int = 256, height: int = 256) -> DataFrame:
    """Batch resize: binary in, binary out, pinned dims — the standard
    image-normalization stage before feature extraction. Real pixels for
    PNG/BMP, stub seam for codec-requiring formats (see resize_image).

    Captures the active pixel-decoder spec (codecs.use_pixel_decoder_spec)
    at plan-build time so executor Pythons resolve the same native
    decoder (r9) — a driver-side register_pixel_decoder alone never
    reaches workers."""
    from . import codecs

    spec = codecs.pixel_decoder_spec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codecs.ensure_pixel_decoder(spec)
        for pdf in batches:
            resized = [resize_image(bytes(p), width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "payload": resized,
                    "n_bytes": pd.Series([len(r) for r in resized], dtype="int64"),
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("rms", DoubleType()),
    ]
)


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """Decoded-pixel stats (dims + RMS intensity) for every decodable
    payload — the t36-shaped feature-extract stage as a first-class
    operator over (doc_id, payload) frames. Routes through the decode
    seam exactly like :func:`resize_images` (native decoder picked up
    worker-side via the captured spec); undecodable payloads are
    dropped, not faked. One mapInPandas, no shuffle: at 100 TB this is
    scan -> Arrow batches -> decode -> 5 small columns out."""
    import numpy as np

    from . import codecs

    spec = codecs.pixel_decoder_spec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codecs.ensure_pixel_decoder(spec)
        for pdf in batches:
            ids, hs, ws, chs, rms = [], [], [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = codecs.image_pixels(bytes(payload))
                if px is None:
                    continue
                x = px.astype(np.float64) / 255.0
                ids.append(did)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                chs.append(px.shape[2])
                rms.append(float(np.sqrt(np.mean(x * x))))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "height": pd.Series(hs, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "channels": pd.Series(chs, dtype="int32"),
                    "rms": pd.Series(rms, dtype="float64"),
                }
            )

    return media.mapInPandas(run, PIXEL_STATS_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("rms_energy", DoubleType()),
    ]
)


def audio_features_stub(payload: bytes) -> tuple[int, int, float]:
    """Fallback for payloads that are NOT RIFF-WAVE (compressed audio needs
    a real codec): deterministic pseudo duration / sample rate / energy
    from the payload hash."""
    h = hashlib.md5(payload).hexdigest()
    duration = 500 + int(h[:8], 16) % 60_000
    rate = (8000, 16000, 44100, 48000)[int(h[8:10], 16) % 4]
    energy = (int(h[10:14], 16) % 10_000) / 10_000.0
    return duration, rate, energy


def audio_features(payload: bytes) -> tuple[int, int, float]:
    """Audio probe: REAL container parses (training/codecs.py::audio_probe)
    for RIFF-WAVE (header + int16 RMS), AIFF (big-endian header + int16
    RMS, r6) and FLAC STREAMINFO (header, r6); stub only for formats whose
    FRAMES need an external codec (MP3/OGG entropy decode)."""
    from . import codecs

    feats = codecs.audio_probe(payload)
    return feats if feats is not None else audio_features_stub(payload)


def extract_audio_features(media: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [audio_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "duration_ms": pd.Series([f[0] for f in feats], dtype="int64"),
                    "sample_rate": pd.Series([f[1] for f in feats], dtype="int32"),
                    "rms_energy": pd.Series([f[2] for f in feats], dtype="float64"),
                }
            )

    return media.mapInPandas(run, AUDIO_SCHEMA)


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the payload column.

    mapInPandas (not a row UDF): each Arrow batch is one Python call, and
    the output schema is pinned so Catalyst can plan downstream stages.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode_image(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(lambda p: hashlib.md5(bytes(p)).hexdigest()),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                }
            )

    return media.mapInPandas(run, META_SCHEMA)


VIDEO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("duration_ms", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("container", StringType()),  # mp4 | unknown
    ]
)


def video_metadata_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB for containers that need a real demuxer (WebM/MKV EBML walk,
    AVI): deterministic pseudo duration/dims from the payload hash."""
    h = hashlib.md5(payload).hexdigest()
    return 1000 + int(h[:8], 16) % 600_000, 320 + int(h[8:10], 16) % 1600, 240 + int(h[10:12], 16) % 840


def video_metadata(payload: bytes) -> tuple[int, int, int, str]:
    """Video probe: REAL ISO-BMFF (MP4/MOV) header parse since r6 —
    duration from moov/mvhd, dimensions from the first visual tkhd
    (training/codecs.py::mp4_info); stub for other containers. Frame
    DECODE stays behind the sample_frames stub seam — that genuinely
    needs a codec library."""
    from . import codecs

    info = codecs.mp4_info(payload)
    if info is not None:
        return info[0], info[1], info[2], "mp4"
    return (*video_metadata_stub(payload), "unknown")


def extract_video_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched video metadata probe, same shape as the image/audio
    stages: real containers report real values, opaque payloads keep the
    deterministic stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [video_metadata(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "duration_ms": pd.Series([f[0] for f in feats], dtype="int64"),
                    "width": pd.Series([f[1] for f in feats], dtype="int32"),
                    "height": pd.Series([f[2] for f in feats], dtype="int32"),
                    "container": pd.Series([f[3] for f in feats], dtype="object"),
                }
            )

    return media.mapInPandas(run, VIDEO_SCHEMA)
