"""Stdlib media codecs (training/codecs.py): real header parses for
PNG/GIF/BMP/JPEG dimensions and RIFF-WAVE info, and their integration into
the multimodal mapInPandas stages (real formats get real values; anything
else falls back to the deterministic stub, keeping the synthetic-corpus
oracles stable)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from stellar_etl_airflow_spark.training import codecs
from stellar_etl_airflow_spark.training.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    audio_features_stub,
    decode_image,
    decode_image_stub,
    extract_audio_features,
    extract_media_metadata,
)


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _bmp(w: int, h: int) -> bytes:
    info = struct.pack("<Iii", 40, w, h) + b"\x00" * 28
    return b"BM" + struct.pack("<IHHI", 54 + 0, 0, 0, 54) + info


def _jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x01\x11\x00" * 3
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _wav(rate: int, samples: np.ndarray) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_image_dimensions_all_formats():
    assert codecs.image_dimensions(_png(640, 480)) == (640, 480)
    assert codecs.image_dimensions(_gif(320, 200)) == (320, 200)
    assert codecs.image_dimensions(_bmp(1024, 768)) == (1024, 768)
    assert codecs.image_dimensions(_bmp(1024, -768)) == (1024, 768)  # top-down BMP
    assert codecs.image_dimensions(_jpeg(1920, 1080)) == (1920, 1080)
    assert codecs.image_dimensions(b"not an image at all") is None
    assert codecs.image_dimensions(b"") is None


def test_decode_image_real_vs_fallback():
    assert decode_image(_png(12, 34)) == (12, 34)
    text = b"plain utf-8 payload"
    assert decode_image(text) == decode_image_stub(text)  # oracle-stable fallback


def test_wav_info_and_rms():
    silent = _wav(16000, np.zeros(16000, dtype=np.int16))
    assert codecs.wav_info(silent) == (16000, 1, 16, 1000)
    assert codecs.wav_rms_energy(silent) == 0.0
    # full-scale square wave -> RMS ~ 1.0
    loud = _wav(8000, np.full(4000, 32767, dtype=np.int16))
    rate, ch, bits, dur = codecs.wav_info(loud)
    assert (rate, ch, bits, dur) == (8000, 1, 16, 500)
    assert abs(codecs.wav_rms_energy(loud) - 1.0) < 1e-3
    assert codecs.wav_info(b"RIFFxxxxNOPE") is None


def test_audio_features_real_vs_fallback():
    wav = _wav(44100, np.zeros(441, dtype=np.int16))
    assert audio_features(wav) == (10, 44100, 0.0)
    blob = b"compressed-audio-stand-in"
    assert audio_features(blob) == audio_features_stub(blob)


def test_spark_metadata_stage_uses_real_headers(spark):
    """extract_media_metadata over a mixed batch: real containers report
    true dimensions; opaque payloads keep the deterministic stub values."""
    rows = [
        (1, "image", bytearray(_png(640, 480)), len(_png(640, 480))),
        (2, "image", bytearray(_gif(320, 200)), len(_gif(320, 200))),
        (3, "image", bytearray(b"opaque text payload"), 19),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["doc_id"]: (r["width"], r["height"]) for r in extract_media_metadata(media).collect()}
    assert out[1] == (640, 480)
    assert out[2] == (320, 200)
    assert out[3] == decode_image_stub(b"opaque text payload")


def test_spark_audio_stage_uses_real_headers(spark):
    wav = _wav(16000, np.zeros(8000, dtype=np.int16))  # 500 ms of silence
    rows = [(1, "audio", bytearray(wav), len(wav)), (2, "audio", bytearray(b"blob"), 4)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["doc_id"]: r for r in extract_audio_features(media).collect()}
    assert (out[1]["duration_ms"], out[1]["sample_rate"], out[1]["rms_energy"]) == (500, 16000, 0.0)
    stub = audio_features_stub(b"blob")
    assert (out[2]["duration_ms"], out[2]["sample_rate"]) == (stub[0], stub[1])


def test_truncated_wav_does_not_crash():
    """A WAV whose declared data size exceeds the actual payload (truncated
    upload) must degrade gracefully, never raise — one bad payload must not
    kill a whole Spark stage."""
    full = _wav(16000, np.zeros(100, dtype=np.int16))
    truncated = full[:-5]  # odd-length data remainder
    info = codecs.wav_info(truncated)
    assert info is not None and info[0] == 16000
    assert codecs.wav_rms_energy(truncated) == 0.0
    feats = codecs.wav_features(truncated)
    assert feats is not None and feats[1] == 16000
    assert audio_features(truncated)[1] == 16000
