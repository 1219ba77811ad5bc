"""Pure-stdlib media header codecs: image dimensions and WAV audio info.

No PIL/ffmpeg in the runtime, but the common container headers are plain
``struct`` parses — so the decode seam in ``multimodal.py`` is REAL for
PNG / GIF / BMP / JPEG dimensions and RIFF-WAVE sample rate / channels /
duration, and only falls back to the deterministic stub for formats that
genuinely need an external codec (video containers, compressed audio).

Format references (all public specs):
- PNG: ISO/IEC 15948 §11.2.2 — IHDR is the first chunk; width/height are
  big-endian uint32 at bytes 16..24 of the file.
- GIF: GIF89a spec §18 — logical screen width/height are little-endian
  uint16 at bytes 6..10.
- BMP: BITMAPINFOHEADER — int32 width/height at offsets 18/22 (height may
  be negative for top-down rows); BITMAPCOREHEADER uses uint16 at 18/20.
- JPEG: ITU-T T.81 §B.2.2 — scan marker segments for a start-of-frame
  (SOFn) marker; height/width are big-endian uint16 at payload bytes 1..5.
- WAV: RIFF/WAVE — walk chunks; ``fmt `` carries channels/rate/bits,
  ``data`` carries the PCM byte length that determines duration.
"""

from __future__ import annotations

import struct

_SOF_MARKERS = {  # JPEG start-of-frame markers (all SOFn except DHT/JPG/DAC)
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def png_dimensions(payload: bytes) -> tuple[int, int] | None:
    if len(payload) < 24 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    if payload[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", payload[16:24])
    return (w, h) if w and h else None


def gif_dimensions(payload: bytes) -> tuple[int, int] | None:
    if len(payload) < 10 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    return (w, h) if w and h else None


def bmp_dimensions(payload: bytes) -> tuple[int, int] | None:
    if len(payload) < 26 or payload[:2] != b"BM":
        return None
    header_size = struct.unpack("<I", payload[14:18])[0]
    if header_size >= 40:  # BITMAPINFOHEADER and successors
        w, h = struct.unpack("<ii", payload[18:26])
        return (w, abs(h)) if w > 0 and h != 0 else None
    if header_size == 12:  # BITMAPCOREHEADER
        w, h = struct.unpack("<HH", payload[18:22])
        return (w, h) if w and h else None
    return None


def jpeg_dimensions(payload: bytes) -> tuple[int, int] | None:
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:  # desynced — not a well-formed marker stream
            return None
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no length field
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        if seg_len < 2:
            return None
        if marker in _SOF_MARKERS:
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
            return (w, h) if w and h else None
        i += 2 + seg_len
    return None


def image_dimensions(payload: bytes) -> tuple[int, int] | None:
    """(width, height) for PNG/GIF/BMP/JPEG payloads, None for anything
    else (caller decides the fallback)."""
    for probe in (png_dimensions, gif_dimensions, bmp_dimensions, jpeg_dimensions):
        dims = probe(payload)
        if dims is not None:
            return dims
    return None


def _wav_layout(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """One walk of the RIFF chunk list: (sample_rate, channels,
    bits_per_sample, data_offset, data_len) or None. ``data_len`` is
    clamped to the bytes actually present (a truncated file's declared
    chunk size can exceed the payload)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    rate = channels = bits = None
    data_off = data_len = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            _tag, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            data_off = i + 8
            data_len = min(size, n - data_off)
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not rate or not channels or not bits or data_off is None:
        return None
    if rate * channels * (bits // 8) <= 0:
        return None
    return rate, channels, bits, data_off, data_len


def wav_info(payload: bytes) -> tuple[int, int, int, int] | None:
    """(sample_rate, channels, bits_per_sample, duration_ms) for a
    RIFF-WAVE payload; None otherwise. Handles PCM and IEEE-float WAVs
    (format tags 1 and 3, plus WAVE_FORMAT_EXTENSIBLE)."""
    layout = _wav_layout(payload)
    if layout is None:
        return None
    rate, channels, bits, _off, data_len = layout
    duration_ms = round(data_len * 1000 / (rate * channels * (bits // 8)))
    return rate, channels, bits, duration_ms


def _rms_from_layout(payload: bytes, layout: tuple) -> float | None:
    rate, _channels, bits, off, data_len = layout
    if bits != 16:
        return None
    import numpy as np

    raw = payload[off : off + data_len]
    raw = raw[: len(raw) - len(raw) % 2]  # truncation can leave an odd byte
    if not raw:
        return 0.0
    samples = np.frombuffer(raw, dtype="<i2").astype("float64") / 32768.0
    return float(np.sqrt(np.mean(samples * samples)))


def wav_rms_energy(payload: bytes) -> float | None:
    """RMS energy of a 16-bit PCM WAV's samples, normalized to [0, 1].
    None for non-WAV or non-int16 payloads (compressed audio needs a real
    codec)."""
    layout = _wav_layout(payload)
    return None if layout is None else _rms_from_layout(payload, layout)


def wav_features(payload: bytes) -> tuple[int, int, float] | None:
    """(duration_ms, sample_rate, rms_energy) in ONE chunk-list walk —
    the batch-loop entry point (wav_info + wav_rms_energy separately would
    parse the header three times per payload). RMS is 0.0 for non-int16
    encodings (header is still real)."""
    layout = _wav_layout(payload)
    if layout is None:
        return None
    rate, channels, bits, _off, data_len = layout
    duration_ms = round(data_len * 1000 / (rate * channels * (bits // 8)))
    rms = _rms_from_layout(payload, layout)
    return duration_ms, rate, (rms if rms is not None else 0.0)
