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


# ---------------------------------------------------------------------------
# PNG/BMP PIXEL decode (r6): zlib inflate + numpy unfiltering vs a
# byte-at-a-time reference implementation of the PNG spec (§9.2), plus a
# hand-built known image, plus the real resize path.
# ---------------------------------------------------------------------------


def _png_with_filters(px: np.ndarray, filters: list[int]) -> bytes:
    """Encode pixels applying a GIVEN filter type per scanline, exercising
    every decoder branch (png_encode itself always writes filter 0)."""
    import zlib

    h, w, ch = px.shape
    x = px.astype(np.int32)
    out = bytearray()
    prev = np.zeros((w, ch), dtype=np.int32)
    for r in range(h):
        ft = filters[r % len(filters)]
        cur = x[r]
        left = np.zeros((w, ch), dtype=np.int32)
        left[1:] = cur[:-1]
        up = prev
        upleft = np.zeros((w, ch), dtype=np.int32)
        upleft[1:] = prev[:-1]
        if ft == 0:
            filt = cur
        elif ft == 1:
            filt = cur - left
        elif ft == 2:
            filt = cur - up
        elif ft == 3:
            filt = cur - ((left + up) >> 1)
        else:  # Paeth
            p = left + up - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
            filt = cur - pred
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = cur
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    import zlib as _z

    def chunk(cid, body):
        return struct.pack(">I", len(body)) + cid + body + struct.pack(">I", _z.crc32(cid + body))

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_known_pixels():
    """A hand-built 2x2 RGB PNG decodes to its exact pixel values."""
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    blob = codecs.png_encode(px)
    got = codecs.png_decode(blob)
    assert got is not None and got.shape == (2, 2, 3)
    assert np.array_equal(got, px)
    # header probes still agree
    assert codecs.png_dimensions(blob) == (2, 2)


def test_png_decode_every_filter_type():
    """Round-trip through scanlines written with each of the five PNG
    filter types (the reference encoder applies the spec equations
    forward; png_decode must invert them exactly), for every supported
    channel count."""
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            blob = _png_with_filters(px, filters)
            got = codecs.png_decode(blob)
            assert got is not None, (ch, filters)
            assert np.array_equal(got, px), (ch, filters)


def test_png_encode_decode_roundtrip_grayscale():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    got = codecs.png_decode(codecs.png_encode(px))
    assert got is not None and np.array_equal(got[:, :, 0], px)


def test_png_palette_decode():
    """Color type 3 resolves through PLTE to RGB."""
    import zlib

    pal = bytes([10, 20, 30, 200, 100, 50])
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)

    def chunk(cid, body):
        return struct.pack(">I", len(body)) + cid + body + struct.pack(">I", zlib.crc32(cid + body))

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = codecs.png_decode(blob)
    assert got is not None
    assert tuple(got[0, 0]) == (10, 20, 30) and tuple(got[0, 1]) == (200, 100, 50)
    assert tuple(got[1, 0]) == (200, 100, 50) and tuple(got[1, 1]) == (10, 20, 30)


def test_png_decode_rejects_unsupported():
    """16-bit depth, interlaced, truncated, and garbage streams return
    None (stub fallback), never raise."""
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = codecs.png_encode(px)
    assert codecs.png_decode(b"not a png") is None
    assert codecs.png_decode(good[:40]) is None
    deep = bytearray(good)
    deep[24] = 16  # bit depth 16
    assert codecs.png_decode(bytes(deep)) is None
    laced = bytearray(good)
    laced[28] = 1  # Adam7
    assert codecs.png_decode(bytes(laced)) is None
    assert codecs.png_decode(_png(64, 48)) is None  # header-only, no IDAT


def _bmp_pixels(px: np.ndarray) -> bytes:
    """24-bit bottom-up BMP from an (h, w, 3) RGB array."""
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = px[r][:, [2, 1, 0]].tobytes()  # RGB -> BGR
        body.extend(row + b"\x00" * (row_bytes - len(row)))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    return hdr + info + bytes(body)


def test_bmp_decode_known_pixels():
    px = np.array([[[1, 2, 3], [4, 5, 6], [7, 8, 9]]], dtype=np.uint8)
    got = codecs.bmp_decode(_bmp_pixels(px))
    assert got is not None and np.array_equal(got, px)


def test_image_rms_real_pixels():
    white = codecs.png_encode(np.full((4, 4, 3), 255, dtype=np.uint8))
    black = codecs.png_encode(np.zeros((4, 4, 3), dtype=np.uint8))
    assert codecs.image_rms(white) == 1.0
    assert codecs.image_rms(black) == 0.0
    assert codecs.image_rms(b"jpeg-ish opaque bytes") is None


def test_resize_images_real_png_path(spark):
    """resize_images emits a REAL decodable PNG at target dims for PNG
    input, and the stub for opaque payloads."""
    from stellar_etl_airflow_spark.training.multimodal import resize_image_stub, resize_images

    src = codecs.png_encode(
        np.repeat(np.repeat(np.array([[[250, 0, 0], [0, 250, 0]]], dtype=np.uint8), 8, 0), 8, 1)
    )
    rows = [
        (1, "image", bytearray(src), len(src)),
        (2, "image", bytearray(b"opaque"), 6),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["doc_id"]: bytes(r["payload"]) for r in resize_images(media, 4, 4).collect()}
    px = codecs.png_decode(out[1])
    assert px is not None and px.shape == (4, 4, 3)
    # nearest-neighbor of a solid-color-halves image keeps the halves
    assert tuple(px[0, 0]) == (250, 0, 0) and tuple(px[0, 3]) == (0, 250, 0)
    assert out[2] == resize_image_stub(b"opaque", 4, 4)


# ---------------------------------------------------------------------------
# GIF pixel decode (r6): pure-Python LZW vs a reference encoder + a
# known-good wild fixture.
# ---------------------------------------------------------------------------


def _gif_lzw_encode(indices, min_code_size: int) -> bytes:
    """Reference GIF-LZW encoder (spec appendix F conventions): emits
    CLEAR, grows the dictionary, bumps the code width when the decoder
    will (next_code == 2^cs + 1 after an add). Data sizes in these tests
    stay below the 4096-entry table cap."""
    clear = 1 << min_code_size
    end = clear + 1
    cs = min_code_size + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    bits, nbits = 0, 0
    out = bytearray()

    def emit(code, width):
        nonlocal bits, nbits
        bits |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bits & 0xFF)
            bits >>= 8
            nbits -= 8

    emit(clear, cs)
    w = ()
    for k in indices:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        emit(table[w], cs)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << cs) + 1 and cs < 12:
            cs += 1
        w = (int(k),)
    if w:
        emit(table[w], cs)
    emit(end, cs)
    if nbits:
        out.append(bits & 0xFF)
    return bytes(out)


def _gif_bytes(idx: np.ndarray, palette: list[tuple], interlaced: bool = False) -> bytes:
    """Assemble a single-frame GIF89a from an (h, w) index array."""
    h, w = idx.shape
    n = len(palette)
    depth = max(2, (n - 1).bit_length())
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes((r, g, b))
    pal += b"\x00" * 3 * ((1 << depth) - n)
    header = b"GIF89a" + struct.pack("<HH", w, h) + bytes((0x80 | (depth - 1), 0, 0)) + pal
    rows = idx
    if interlaced:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = idx[order]
    data = _gif_lzw_encode(rows.reshape(-1), depth)
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes((0x40 if interlaced else 0,))
    blocks = bytearray([depth])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return header + desc + bytes(blocks) + b"\x3b"


def test_gif_decode_wild_fixture():
    """The ubiquitous 1x1 white GIF (published everywhere as the smallest
    valid GIF) pins our bit-level LZW conventions to real-world bytes."""
    import base64

    blob = base64.b64decode(
        "R0lGODlhAQABAIAAAP///wAAACH5BAEAAAAALAAAAAABAAEAAAICRAEAOw=="
    )
    got = codecs.gif_decode(blob)
    assert got is not None and got.shape == (1, 1, 3)
    assert tuple(got[0, 0]) == (255, 255, 255)
    assert codecs.gif_dimensions(blob) == (1, 1)


def test_gif_decode_roundtrip_with_dictionary_growth():
    """1000 pixels over 16 colors forces several LZW code-width bumps and
    the KwKwK path; decode must reproduce every index."""
    rng = np.random.default_rng(11)
    palette = [(int(i * 16), int(255 - i * 16), int(i * 7)) for i in range(16)]
    idx = rng.integers(0, 16, size=(25, 40), dtype=np.int32)
    # embed a KwKwK-triggering run (repeat pattern right after its def)
    idx[0, :8] = [1, 1, 1, 1, 1, 1, 1, 1]
    got = codecs.gif_decode(_gif_bytes(idx, palette))
    assert got is not None and got.shape == (25, 40, 3)
    want = np.array(palette, dtype=np.uint8)[idx]
    assert np.array_equal(got, want)


def test_gif_decode_interlaced():
    palette = [(0, 0, 0), (255, 255, 255), (200, 10, 10), (10, 200, 10)]
    idx = (np.arange(9 * 5).reshape(9, 5) % 4).astype(np.int32)
    for interlaced in (False, True):
        got = codecs.gif_decode(_gif_bytes(idx, palette, interlaced=interlaced))
        assert got is not None, interlaced
        assert np.array_equal(got, np.array(palette, dtype=np.uint8)[idx]), interlaced


def test_image_pixels_and_resize_cover_gif():
    from stellar_etl_airflow_spark.training.multimodal import resize_image

    palette = [(9, 9, 9), (250, 0, 0)]
    idx = np.ones((6, 6), dtype=np.int32)
    blob = _gif_bytes(idx, palette)
    px = codecs.image_pixels(blob)
    assert px is not None and tuple(px[0, 0]) == (250, 0, 0)
    out = resize_image(blob, 3, 3)
    dec = codecs.png_decode(out)  # GIF in, PNG out
    assert dec is not None and dec.shape == (3, 3, 3) and tuple(dec[0, 0]) == (250, 0, 0)
    assert codecs.image_rms(blob) is not None


# ---------------------------------------------------------------------------
# AIFF / FLAC (r6): big-endian IFF chunk walk + 80-bit-float sample rate;
# FLAC STREAMINFO bit unpacking. aifc/wave stdlib modules write AIFF
# reference fixtures; FLAC is hand-packed per the spec.
# ---------------------------------------------------------------------------


def _aiff(rate: int, samples: np.ndarray) -> bytes:
    import aifc

    class _KeepOpen(io.BytesIO):  # aifc closes the target on exit
        def close(self):
            pass

    buf = _KeepOpen()
    af = aifc.open(buf, "wb")
    af.setnchannels(1)
    af.setsampwidth(2)
    af.setframerate(rate)
    af.writeframes(samples.astype(">i2").tobytes())
    af.close()  # finalizes FORM/COMM sizes
    return buf.getvalue()


def _flac_streaminfo(rate: int, channels: int, bits: int, total: int) -> bytes:
    packed = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) | total
    si = bytearray(34)
    si[10:18] = packed.to_bytes(8, "big")
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(si)


def test_aiff_info_and_rms():
    sine = (np.sin(np.linspace(0, 200 * np.pi, 8000)) * 16384).astype(np.int16)
    blob = _aiff(16000, sine)
    info = codecs.aiff_info(blob)
    assert info == (16000, 1, 16, 500)
    rms = codecs.aiff_rms_energy(blob)
    assert rms is not None and abs(rms - 0.3536) < 0.01  # A/sqrt(2), A=0.5
    # audio_probe and the Spark-facing audio_features agree
    assert codecs.audio_probe(blob) == (500, 16000, rms)
    assert audio_features(blob) == (500, 16000, rms)
    assert codecs.aiff_info(b"FORMxxxxAIFF") is None
    assert codecs.aiff_info(b"not aiff") is None


def test_flac_streaminfo_header():
    blob = _flac_streaminfo(44100, 2, 16, 44100 * 3)
    assert codecs.flac_info(blob) == (44100, 2, 16, 3000)
    assert codecs.audio_probe(blob) == (3000, 44100, 0.0)
    assert audio_features(blob) == (3000, 44100, 0.0)
    assert codecs.flac_info(b"fLaX" + b"\x00" * 40) is None
    # a non-STREAMINFO first block is rejected
    bad = b"fLaC" + bytes([0x84, 0, 0, 34]) + b"\x00" * 34
    assert codecs.flac_info(bad) is None


def test_wav_still_wins_probe_order():
    wav = _wav(16000, np.zeros(1600, dtype=np.int16))
    assert codecs.audio_probe(wav) == (100, 16000, 0.0)


# ---------------------------------------------------------------------------
# Baseline JPEG decode (r6): cross-validated pixel-by-pixel against the
# JVM's javax.imageio (an independent libjpeg-lineage decoder) on real
# JPEGs from the CPython/IPython test suites — the same external-cross-
# validation discipline as the Avro writer. T.81 Annex A permits small
# IDCT variance between conforming decoders, hence the tolerances.
# ---------------------------------------------------------------------------

import os as _os

_DATA = _os.path.join(_os.path.dirname(__file__), "data")


def _imageio_pixels(spark, path):
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
    h, w = img.getHeight(), img.getWidth()
    raster = img.getRaster()
    nb = raster.getNumBands()
    ref = np.zeros((h, w, nb), dtype=np.int32)
    for y in range(h):
        for x in range(w):
            for band in range(nb):
                ref[y, x, band] = raster.getSample(x, y, band)
    return ref


def test_jpeg_decode_grayscale_matches_imageio_exactly(spark):
    from stellar_etl_airflow_spark.training.jpeg import jpeg_decode

    path = _os.path.join(_DATA, "gray2x2.jpg")
    mine = jpeg_decode(open(path, "rb").read())
    assert mine is not None and mine.shape == (2, 2, 1)
    ref = _imageio_pixels(spark, path)
    assert np.array_equal(mine.astype(np.int32), ref)


def test_jpeg_decode_color_subsampled_matches_imageio(spark):
    """16x16 YCbCr with 2x2 chroma subsampling (the CPython test-suite
    Python logo): exact-float IDCT + fancy triangular upsampling vs
    libjpeg's scaled-integer pipeline — agreement must be tight (the
    residual is conforming-decoder variance, not a logic bug)."""
    from stellar_etl_airflow_spark.training.jpeg import jpeg_decode

    path = _os.path.join(_DATA, "python16x16.jpg")
    mine = jpeg_decode(open(path, "rb").read()).astype(np.int32)
    ref = _imageio_pixels(spark, path)
    assert mine.shape == ref.shape == (16, 16, 3)
    diff = np.abs(mine - ref)
    assert float(diff.mean()) <= 1.0, diff.mean()
    assert int(diff.max()) <= 8, diff.max()
    assert float((diff <= 2).mean()) >= 0.9


def test_jpeg_decode_rejects_unsupported():
    from stellar_etl_airflow_spark.training.jpeg import jpeg_decode

    base = open(_os.path.join(_DATA, "python16x16.jpg"), "rb").read()
    assert jpeg_decode(b"not a jpeg") is None
    assert jpeg_decode(base[:40]) is None
    prog = bytearray(base)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2  # pretend progressive
    assert jpeg_decode(bytes(prog)) is None


def test_image_pixels_and_resize_cover_jpeg(spark):
    from stellar_etl_airflow_spark.training.multimodal import resize_image

    blob = open(_os.path.join(_DATA, "python16x16.jpg"), "rb").read()
    px = codecs.image_pixels(blob)
    assert px is not None and px.shape == (16, 16, 3)
    out = resize_image(blob, 8, 8)
    dec = codecs.png_decode(out)  # JPEG in, PNG out
    assert dec is not None and dec.shape == (8, 8, 3)
    assert codecs.image_rms(blob) is not None
    # header probe still agrees with the pixel decode
    assert codecs.jpeg_dimensions(blob) == (16, 16)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF headers (r6): box-tree walk for duration + visual dims.
# ---------------------------------------------------------------------------


def _mp4(duration_ms: int, w: int, h: int) -> bytes:
    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1000, duration_ms) + b"\x00" * 80,
    )
    tkhd_body = bytearray(84)
    tkhd_body[76:84] = struct.pack(">II", w << 16, h << 16)
    audio_trak = box(b"trak", box(b"tkhd", bytes(84)))  # 0x0 dims: skipped
    video_trak = box(b"trak", box(b"tkhd", bytes(tkhd_body)))
    return ftyp + box(b"moov", mvhd + audio_trak + video_trak)


def test_mp4_info_and_video_stage(spark):
    from stellar_etl_airflow_spark.training.multimodal import (
        extract_video_metadata,
        video_metadata_stub,
    )

    blob = _mp4(5400, 640, 360)
    assert codecs.mp4_info(blob) == (5400, 640, 360)
    assert codecs.mp4_info(blob[:30]) is None
    assert codecs.mp4_info(b"RIFFxxxxAVI LIST") is None
    rows = [
        (1, "video", bytearray(blob), len(blob)),
        (2, "video", bytearray(b"opaque webm-ish"), 15),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["doc_id"]: r for r in extract_video_metadata(media).collect()}
    assert (out[1]["duration_ms"], out[1]["width"], out[1]["height"], out[1]["container"]) == (5400, 640, 360, "mp4")
    stub = video_metadata_stub(b"opaque webm-ish")
    assert (out[2]["duration_ms"], out[2]["container"]) == (stub[0], "unknown")


def _avi_mjpeg(frames: list[bytes]) -> bytes:
    """Minimal RIFF-AVI wrapping the given JPEG frames in a movi LIST."""

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    movi_items = b"".join(chunk(b"00dc", f) for f in frames)
    movi = chunk(b"LIST", b"movi" + movi_items)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", b"\x00" * 56))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_mjpeg_demux_and_decode(spark):
    """End-to-end REAL video path: demux a hand-built MJPEG AVI, decode
    every frame with the baseline JPEG decoder, cross-check frame 0
    against javax.imageio."""
    from stellar_etl_airflow_spark.training.jpeg import jpeg_decode

    jpg = open(_os.path.join(_DATA, "python16x16.jpg"), "rb").read()
    gray = open(_os.path.join(_DATA, "gray2x2.jpg"), "rb").read()
    avi = _avi_mjpeg([jpg, gray, jpg])
    frames = codecs.avi_mjpeg_frames(avi)
    assert frames is not None and len(frames) == 3
    assert frames[0] == jpg and frames[1] == gray
    px = jpeg_decode(frames[0])
    assert px is not None and px.shape == (16, 16, 3)
    ref = _imageio_pixels(spark, _os.path.join(_DATA, "python16x16.jpg"))
    assert np.abs(px.astype(np.int32) - ref).mean() <= 1.0
    assert codecs.avi_mjpeg_frames(b"RIFFxxxxWAVEdata") is None
    assert codecs.avi_mjpeg_frames(jpg) is None


def test_sample_frames_real_for_mjpeg_avi(spark):
    from stellar_etl_airflow_spark.training.multimodal import frame_count_stub, sample_frames
    import hashlib as _hl

    jpg = open(_os.path.join(_DATA, "python16x16.jpg"), "rb").read()
    avi = _avi_mjpeg([jpg, jpg])
    rows = [
        (1, "video", bytearray(avi), len(avi)),
        (2, "video", bytearray(b"opaque"), 6),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sample_frames(media).collect()
    mine = [r for r in got if r["doc_id"] == 1]
    assert len(mine) == 2 and all(r["n_frames"] == 2 for r in mine)
    assert mine[0]["frame_md5"] == _hl.md5(jpg).hexdigest()
    other = [r for r in got if r["doc_id"] == 2]
    assert len(other) == frame_count_stub(b"opaque")


def test_webp_dimensions_all_flavors():
    # VP8 lossy: RIFF/WEBP + 'VP8 ' chunk, start code 9D 01 2A, 14-bit dims
    vp8 = (b"RIFF" + struct.pack("<I", 30) + b"WEBP" + b"VP8 " + struct.pack("<I", 18)
           + b"\x00" * 3 + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240) + b"\x00" * 8)
    assert codecs.webp_dimensions(vp8) == (320, 240)
    # VP8L lossless: signature 0x2F + packed 14-bit minus-one dims
    bits = (63) | (31 << 14)  # w=64, h=32
    vp8l = (b"RIFF" + struct.pack("<I", 20) + b"WEBP" + b"VP8L" + struct.pack("<I", 8)
            + b"\x2f" + bits.to_bytes(4, "little") + b"\x00" * 5)
    assert codecs.webp_dimensions(vp8l) == (64, 32)
    # VP8X extended: 24-bit canvas dims minus one
    vp8x = (b"RIFF" + struct.pack("<I", 22) + b"WEBP" + b"VP8X" + struct.pack("<I", 10)
            + b"\x00" * 4 + (639).to_bytes(3, "little") + (359).to_bytes(3, "little") + b"\x00" * 2)
    assert codecs.webp_dimensions(vp8x) == (640, 360)
    assert codecs.webp_dimensions(b"RIFFxxxxWAVEfmt ") is None
    assert codecs.image_dimensions(vp8l) == (64, 32)
    # ADVICE r6: zero-dim malformed VP8 frame header must return None,
    # not (0, 0) — a non-empty tuple is always truthy.
    vp8zero = (b"RIFF" + struct.pack("<I", 30) + b"WEBP" + b"VP8 " + struct.pack("<I", 18)
               + b"\x00" * 3 + b"\x9d\x01\x2a" + struct.pack("<HH", 0, 0) + b"\x00" * 8)
    assert codecs.webp_dimensions(vp8zero) is None


def test_jpeg_encoder_roundtrip_and_restart_markers():
    """Own encode -> own decode within IDCT rounding (±1 gray, ±2 via
    color-space conversion), including the DRI/RSTn restart path the wild
    fixtures don't exercise."""
    from stellar_etl_airflow_spark.training.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    for dri in (0, 1, 2):
        blob = jpeg_encode(gray, restart_interval=dri)
        dec = jpeg_decode(blob)
        assert dec is not None and dec.shape == (16, 16, 1), dri
        assert int(np.abs(dec[:, :, 0].astype(int) - gray.astype(int)).max()) <= 1, dri
    rgb = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)  # non-multiple-of-8 dims
    dec = jpeg_decode(jpeg_encode(rgb))
    assert dec is not None and dec.shape == (24, 17, 3)
    assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 2


def test_jpeg_encoder_accepted_by_imageio(spark):
    """The OTHER conformance direction: javax.imageio must accept our
    encoder's streams (custom flat Huffman tables, restart markers) and
    reproduce the original pixels — proving both the encoder emits valid
    T.81 and, transitively, that the decoder's agreement on wild files is
    not shared-bug luck."""
    import tempfile

    from stellar_etl_airflow_spark.training.jpeg import jpeg_encode

    rng = np.random.default_rng(7)
    cases = [
        (rng.integers(0, 256, (16, 16), dtype=np.uint8), 0, 1),
        (rng.integers(0, 256, (16, 16), dtype=np.uint8), 2, 1),  # with RSTn
        (rng.integers(0, 256, (11, 13, 3), dtype=np.uint8), 0, 2),
    ]
    for px, dri, tol in cases:
        blob = jpeg_encode(px, restart_interval=dri)
        with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
            f.write(blob)
            f.flush()
            ref = _imageio_pixels(spark, f.name)
        base = px if px.ndim == 3 else px[:, :, None]
        assert ref.shape == base.shape
        assert int(np.abs(ref - base.astype(np.int32)).max()) <= tol, (dri, tol)


def test_jpeg_decode_never_raises_on_malformed():
    """ADVICE r6: truncated segment bodies (short DRI/DQT/SOF/SOS) must
    return None, not raise — an exception would kill the whole Arrow
    batch in image_pixels/resize_images."""
    from stellar_etl_airflow_spark.training.jpeg import jpeg_decode

    assert jpeg_decode(b"\xff\xd8\xff\xdd\x00\x03\x01") is None  # truncated DRI
    assert jpeg_decode(b"\xff\xd8\xff\xc0\x00\x04\x08\x00") is None  # short SOF
    assert jpeg_decode(b"\xff\xd8\xff\xdb\x00\x03\x00") is None  # short DQT
    base = open(_os.path.join(_DATA, "python16x16.jpg"), "rb").read()
    for cut in (60, 100, len(base) // 2):
        # truncation anywhere must never raise (None or partial-pad OK)
        jpeg_decode(base[:cut])
    rng = np.random.default_rng(11)
    for _ in range(20):
        jpeg_decode(b"\xff\xd8" + rng.bytes(300))


def test_jpeg_single_component_scan_is_noninterleaved():
    """T.81 §A.2: a one-component scan uses non-interleaved geometry, so
    declared sampling factors >1 in SOF must not garble a grayscale
    image (ADVICE r6). Patching the sampling byte must not change the
    decoded pixels — the entropy stream is identical either way."""
    from stellar_etl_airflow_spark.training.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 40, 1), dtype=np.uint8)
    enc = bytearray(jpeg_encode(img))
    ref = jpeg_decode(bytes(enc))
    i = enc.find(b"\xff\xc0")
    hv_off = i + 2 + 2 + 1 + 2 + 2 + 1 + 1  # marker,len,prec,h,w,nc,cid -> hv
    assert enc[hv_off] == 0x11
    for hv in (0x21, 0x12, 0x22):
        enc[hv_off] = hv
        out = jpeg_decode(bytes(enc))
        assert out is not None and np.array_equal(out, ref), hex(hv)


def test_jpeg_bitreader_is_linear():
    """ADVICE r6: the bit accumulator must not grow into an unbounded
    bigint (quadratic decode). Feed ~200KB of entropy bytes through the
    reader and assert the accumulator stays word-sized."""
    from stellar_etl_airflow_spark.training.jpeg import _BitReader

    data = bytes(range(1, 251)) * 800  # no FF bytes -> plain fill path
    r = _BitReader(data, 0)
    for _ in range(len(data) * 8):
        r.read_bit()
    assert r.bits.bit_length() <= 64


def test_jpeg_progressive_roundtrip():
    """r7: full Annex-G progressive path through our own encoder — DC
    first (Al=1) + DC refine + two AC spectral bands (Al=1) + AC refine
    (Al=0, correction bits + EOB runs). quant=1 must round-trip within
    IDCT rounding; heavier quant exercises long EOB runs."""
    from stellar_etl_airflow_spark.training.jpeg import (
        jpeg_decode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(12)
    gray = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode_progressive(gray))
    assert dec is not None and dec.shape == (16, 16, 1)
    assert int(np.abs(dec[:, :, 0].astype(int) - gray.astype(int)).max()) <= 1

    rgb = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)  # odd dims
    dec = jpeg_decode(jpeg_encode_progressive(rgb))
    assert dec is not None and dec.shape == (24, 17, 3)
    assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 2

    # heavy quant -> many all-zero bands -> real EOBRUN accumulation
    dec = jpeg_decode(jpeg_encode_progressive(rgb, quant=8))
    assert dec is not None and dec.shape == (24, 17, 3)


def test_jpeg_progressive_encoder_accepted_by_imageio(spark):
    """Conformance direction 1: javax.imageio (independent libjpeg
    lineage) must accept our progressive streams and agree on pixels."""
    import tempfile

    from stellar_etl_airflow_spark.training.jpeg import (
        jpeg_decode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(13)
    for shape in [(16, 16), (24, 17, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        blob = jpeg_encode_progressive(px)
        with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
            f.write(blob)
            f.flush()
            ref = _imageio_pixels(spark, f.name)
        ours = jpeg_decode(blob)
        assert ref.shape == ours.shape
        assert int(np.abs(ours.astype(np.int32) - ref).max()) <= 2


def test_jpeg_progressive_decodes_imageio_streams(spark):
    """Conformance direction 2: progressive streams written by
    javax.imageio's OWN encoder (SOF2, 2x2-subsampled luma, multi-scan
    successive approximation — the wild-web shape) must decode and match
    imageio's decode. Also: the progressive and baseline encodings of
    the same image must agree through our decoder to within the same
    subsampled-decoder variance as the baseline conformance test."""
    import tempfile

    from stellar_etl_airflow_spark.training.jpeg import jpeg_decode

    jvm = spark._jvm

    def write_jpeg(px, path, quality, progressive):
        h, w, _ = px.shape
        img = jvm.java.awt.image.BufferedImage(
            w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
        )
        for y in range(h):
            for x in range(w):
                img.setRGB(
                    x, y,
                    (int(px[y, x, 0]) << 16) | (int(px[y, x, 1]) << 8) | int(px[y, x, 2]),
                )
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
        param = writer.getDefaultWriteParam()
        if progressive:
            param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
        param.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(float(quality))
        fos = jvm.javax.imageio.stream.FileImageOutputStream(jvm.java.io.File(path))
        writer.setOutput(fos)
        writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
        fos.close()
        writer.dispose()

    xx, yy = np.meshgrid(np.arange(48), np.arange(40))
    smooth = np.stack([(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=2).astype(np.uint8)
    with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
        write_jpeg(smooth, f.name, 0.95, True)
        blob = open(f.name, "rb").read()
        # really progressive with subsampled luma
        i = blob.find(b"\xff\xc2")
        assert i > 0 and blob[i + 2 + 2 + 1 + 5 + 1] == 0x22
        ours = jpeg_decode(blob)
        ref = _imageio_pixels(spark, f.name)
    assert ours is not None and ours.shape == ref.shape
    diff = np.abs(ours.astype(np.int32) - ref)
    assert float(diff.mean()) <= 1.0 and int(diff.max()) <= 8

    rng = np.random.default_rng(14)
    noisy = rng.integers(0, 256, (32, 24, 3), dtype=np.uint8)
    decs = []
    for progressive in (False, True):
        with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
            write_jpeg(noisy, f.name, 0.85, progressive)
            decs.append(jpeg_decode(open(f.name, "rb").read()))
    # identical content through the sequential and progressive paths
    assert decs[0] is not None and decs[1] is not None
    assert np.array_equal(decs[0], decs[1])


# ---------------------------------------------------------------------------
# FLAC subframe decode (r7): real PCM from compressed audio. FLAC is
# lossless, so the gate is EXACT sample round-trip through our encoder
# (any predictor/Rice/bit-packing defect breaks it); CRC-8/CRC-16 and
# the STREAMINFO MD5 guard the bit layer against shared bugs.
# ---------------------------------------------------------------------------


def test_flac_roundtrip_all_subframe_types():
    from stellar_etl_airflow_spark.training import flac as FL

    rng = np.random.default_rng(21)
    mono = rng.integers(-3000, 3000, 1000).astype(np.int64)
    t = np.arange(1500)
    smooth = (9000 * np.sin(t / 25)).astype(np.int64)
    stereo = rng.integers(-32768, 32767, (777, 2)).astype(np.int64)
    cases = [
        (mono, dict()),
        (mono, dict(mode=("fixed", 0))),
        (mono, dict(mode=("fixed", 4))),
        (mono, dict(mode="verbatim")),
        (smooth, dict(mode=("lpc", [3, -1], 2, 6))),
        (np.full(500, -77, dtype=np.int64), dict()),  # constant subframes
        (stereo, dict()),
        (stereo, dict(mid_side=True)),
        (smooth, dict(block_size=192)),  # multiple frames, coded numbers
    ]
    for samples, kw in cases:
        blob = FL.flac_encode(samples, **kw)
        dec = FL.flac_decode(blob)
        assert dec is not None, kw
        out, rate, bits = dec
        want = samples if samples.ndim == 2 else samples[:, None]
        assert np.array_equal(out.astype(np.int64), want), kw
        assert (rate, bits) == (44100, 16)


def test_flac_corruption_detected():
    """Any single flipped bit must be caught by CRC-8/CRC-16/MD5, never
    silently decoded to wrong samples."""
    from stellar_etl_airflow_spark.training import flac as FL

    t = np.arange(800)
    blob = FL.flac_encode((5000 * np.sin(t / 20)).astype(np.int64))
    rng = np.random.default_rng(22)
    for _ in range(12):
        pos = int(rng.integers(42, len(blob)))  # past the magic
        bad = bytearray(blob)
        bad[pos] ^= 1 << int(rng.integers(0, 8))
        dec = FL.flac_decode(bytes(bad))
        if dec is not None:  # a flip may hit padding; samples must be intact
            out, _, _ = dec
            assert np.array_equal(
                out[:, 0].astype(np.int64), (5000 * np.sin(t / 20)).astype(np.int64)
            )


def test_flac_rms_through_audio_probe_and_spark_stage(spark):
    """audio_probe now returns REAL RMS for FLAC (was 0.0 header-only),
    and the mapInPandas audio stage carries it end-to-end."""
    from stellar_etl_airflow_spark.training import flac as FL
    from stellar_etl_airflow_spark.training.multimodal import MEDIA_SCHEMA, extract_audio_features

    t = np.arange(4000)
    pcm = (16384 * np.sin(t / 10)).astype(np.int64)
    blob = FL.flac_encode(pcm, rate=16000)
    want_rms = float(np.sqrt(np.mean((pcm / 32768.0) ** 2)))
    dur, rate, rms = codecs.audio_probe(blob)
    assert rate == 16000 and dur == 250
    assert abs(rms - want_rms) < 1e-9
    rows = [(1, "audio", bytearray(blob), len(blob))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_audio_features(media).collect()[0]
    assert out["sample_rate"] == 16000 and abs(out["rms_energy"] - want_rms) < 1e-9


def test_external_decoder_seam():
    """The production swap (SCALE.md codec-throughput section): a native
    decoder registered through codecs.register_pixel_decoder takes over
    every pixel consumer; payloads it declines fall back to the built-in
    pure-Python codecs, so coverage never shrinks."""
    from stellar_etl_airflow_spark.training.multimodal import resize_image

    calls = []

    def fake_native(payload: bytes):
        calls.append(len(payload))
        if payload[:2] == b"\xff\xd8":  # handles JPEG only
            return np.full((4, 4, 3), 200, dtype=np.uint8)
        return None  # declines everything else

    from stellar_etl_airflow_spark.training.jpeg import jpeg_encode

    jpg = jpeg_encode(np.zeros((8, 8), dtype=np.uint8))
    png = codecs.png_encode(np.full((2, 2, 3), 7, dtype=np.uint8))
    codecs.register_pixel_decoder(fake_native)
    try:
        got = codecs.image_pixels(jpg)
        assert got is not None and int(got[0, 0, 0]) == 200  # native won
        got = codecs.image_pixels(png)
        assert got is not None and int(got[0, 0, 0]) == 7  # fallback won
        # consumers route through the seam without code changes
        out = codecs.png_decode(resize_image(jpg, 2, 2))
        assert out is not None and int(out[0, 0, 0]) == 200
        assert len(calls) >= 3
    finally:
        codecs.register_pixel_decoder(None)
    # seam removed: the built-in JPEG decoder is back
    got = codecs.image_pixels(jpg)
    assert got is not None and int(got[0, 0, 0]) <= 1


# ---------------------------------------------------------------------------
# r7 compressed-audio header probes (MP3 frame walk, Ogg-Vorbis page
# walk) and animated-GIF frame demux.
# ---------------------------------------------------------------------------


def _mp3_frame(kbps=128, rate=44100, padding=0, stereo=True, body=None):
    b1 = 0xFF
    b2 = 0xE0 | (3 << 3) | (1 << 1)  # MPEG1, Layer III
    br_idx = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320].index(kbps)
    sr_idx = [44100, 48000, 32000].index(rate)
    b3 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    b4 = 0x00 if stereo else 0xC0
    frame_len = 144 * kbps * 1000 // rate + padding
    hdr = bytes([b1, b2, b3, b4])
    payload = body if body is not None else b"\x00" * (frame_len - 4)
    return (hdr + payload)[:frame_len].ljust(frame_len, b"\x00")


def test_mp3_info_frame_walk_and_xing():
    # 10 CBR frames at 128 kbps / 44.1 kHz
    blob = b"".join(_mp3_frame() for _ in range(10))
    rate, ch, dur = codecs.mp3_info(blob)
    assert (rate, ch) == (44100, 2)
    assert dur == round(10 * 1152 * 1000 / 44100)
    # ID3v2 prefix is skipped (syncsafe size)
    id3 = b"ID3" + b"\x04\x00\x00" + bytes([0, 0, 0, 12]) + b"\x00" * 12
    assert codecs.mp3_info(id3 + blob) == (44100, 2, dur)
    # Xing VBR header declares the authoritative frame count
    side = 32  # MPEG1 stereo side-info bytes
    body = b"\x00" * side + b"Xing" + (1).to_bytes(4, "big") + (100).to_bytes(4, "big")
    first = _mp3_frame(body=body.ljust(144 * 128 * 1000 // 44100 - 4, b"\x00"))
    rate, ch, dur = codecs.mp3_info(first + blob)
    assert dur == round(100 * 1152 * 1000 / 44100)
    # audio_probe dispatch: real duration/rate, RMS 0.0 (PCM needs a codec)
    assert codecs.audio_probe(blob) == (round(10 * 1152 * 1000 / 44100), 44100, 0.0)
    assert codecs.mp3_info(b"\xff\xe0 not really") is None
    assert codecs.mp3_info(b"junk") is None


def _ogg_page(granule, serial, seq, packets, header_type=0):
    segs = bytearray()
    body = bytearray()
    for p in packets:
        n = len(p)
        while n >= 255:
            segs.append(255)
            n -= 255
        segs.append(n)
        body += p
    return (
        b"OggS" + bytes([0, header_type])
        + granule.to_bytes(8, "little", signed=True)
        + serial.to_bytes(4, "little") + seq.to_bytes(4, "little")
        + b"\x00" * 4  # crc (not verified by the probe)
        + bytes([len(segs)]) + bytes(segs) + bytes(body)
    )


def test_ogg_vorbis_info_page_walk():
    idh = b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([2]) + (48000).to_bytes(4, "little") + b"\x00" * 12 + b"\xb8\x01"
    pages = (
        _ogg_page(0, 7, 0, [idh], header_type=2)
        + _ogg_page(0, 7, 1, [b"\x03vorbis" + b"\x00" * 20, b"\x05vorbis" + b"\x00" * 40])
        + _ogg_page(24000, 7, 2, [b"\x00" * 300])
        + _ogg_page(96000, 7, 3, [b"\x00" * 120], header_type=4)
    )
    rate, ch, dur = codecs.ogg_vorbis_info(pages)
    assert (rate, ch) == (48000, 2)
    assert dur == 2000  # last granule 96000 samples @ 48 kHz
    assert codecs.audio_probe(pages) == (2000, 48000, 0.0)
    assert codecs.ogg_vorbis_info(b"OggS" + b"\x00" * 60) is None
    assert codecs.ogg_vorbis_info(b"not ogg") is None


def test_gif_frames_demux_and_spark_stage(spark):
    """Animated GIF: per-frame regions demuxed for real; sample_frames
    digests the actual frame bytes (GIF twin of the MJPEG-AVI path)."""
    from stellar_etl_airflow_spark.training.multimodal import MEDIA_SCHEMA, sample_frames

    rng = np.random.default_rng(31)
    pal = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255)]
    f1 = _gif_bytes(rng.integers(0, 4, (8, 8)).astype(np.int64), pal)
    f2 = _gif_bytes(rng.integers(0, 4, (8, 8)).astype(np.int64), pal)
    # splice frame 2's descriptor region into file 1 before the trailer,
    # with a graphic-control extension between frames
    head1, desc2 = f1[:-1], codecs.gif_frames(f2)[0]
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    anim = head1 + gce + desc2 + b"\x3b"
    frames = codecs.gif_frames(anim)
    assert frames is not None and len(frames) == 2
    assert frames[0] == codecs.gif_frames(f1)[0] and frames[1] == desc2
    # single-frame GIFs demux to one region; non-GIF is None
    assert len(codecs.gif_frames(f1)) == 1
    assert codecs.gif_frames(b"nope") is None
    # Spark stage: n_frames == 2 with digests of the REAL frame bytes
    import hashlib as _h

    rows = [(1, "video", bytearray(anim), len(anim))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["frame_index"]: r for r in sample_frames(media).collect()}
    assert len(got) == 2 and got[0]["n_frames"] == 2
    assert got[1]["frame_md5"] == _h.md5(desc2).hexdigest()


# ---------------------------------------------------------------------------
# r7 PNG completeness: Adam7 interlace, 16-bit, sub-byte depths. Test-side
# serializers build the exotic variants (filter-0 scanlines); decode is
# checked against the constructed pixels AND against javax.imageio where
# its sample semantics are unambiguous.
# ---------------------------------------------------------------------------

_ADAM7_TEST = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_chunks(ihdr_body: bytes, idat_raw: bytes, plte: bytes | None = None) -> bytes:
    import zlib as _z

    def chunk(cid, body):
        return struct.pack(">I", len(body)) + cid + body + struct.pack(">I", _z.crc32(cid + body))

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_body)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", _z.compress(idat_raw)) + chunk(b"IEND", b"")


def _pack_rows(samples: np.ndarray, depth: int) -> bytes:
    """(h, n_samples) int array -> filter-0 scanlines at the given depth."""
    h, ns = samples.shape
    out = bytearray()
    for r in range(h):
        out.append(0)
        if depth == 8:
            out += samples[r].astype(np.uint8).tobytes()
        elif depth == 16:
            out += samples[r].astype(">u2").tobytes()
        else:
            bits = np.zeros(ns * depth, dtype=np.uint8)
            for b in range(depth):
                bits[b::depth] = (samples[r] >> (depth - 1 - b)) & 1
            pad = (-len(bits)) % 8
            bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
            out += np.packbits(bits).tobytes()
    return bytes(out)


def test_png_decode_adam7_interlaced(spark):
    rng = np.random.default_rng(41)
    for h, w in [(13, 9), (8, 8), (3, 17), (1, 1)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7_TEST:
            pw, ph = -(-(w - x0) // dx), -(-(h - y0) // dy)
            if pw <= 0 or ph <= 0:
                continue
            sub = px[y0::dy, x0::dx].reshape(ph, pw * 3)
            raw += _pack_rows(sub.astype(np.int64), 8)
        blob = _png_chunks(struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1), bytes(raw))
        got = codecs.png_decode(blob)
        assert got is not None and np.array_equal(got, px), (h, w)
        # independent decoder agrees our interlaced serialization is valid
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".png") as f:
            f.write(blob)
            f.flush()
            ref = _imageio_pixels(spark, f.name)
        assert np.array_equal(ref.astype(np.uint8), px), (h, w)


def test_png_decode_16bit(spark):
    rng = np.random.default_rng(42)
    # grayscale
    g16 = rng.integers(0, 65536, (6, 5), dtype=np.uint16)
    blob = _png_chunks(
        struct.pack(">IIBBBBB", 5, 6, 16, 0, 0, 0, 0), _pack_rows(g16.astype(np.int64), 16)
    )
    got = codecs.png_decode(blob)
    assert got is not None and np.array_equal(got[:, :, 0], (g16 >> 8).astype(np.uint8))
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".png") as f:
        f.write(blob)
        f.flush()
        ref = _imageio_pixels(spark, f.name)
    assert np.array_equal((ref[:, :, 0] >> 8).astype(np.uint8), got[:, :, 0])
    # RGB with filters beyond 0 handled by the shared unfilter path
    c16 = rng.integers(0, 65536, (4, 3, 3), dtype=np.uint16)
    blob = _png_chunks(
        struct.pack(">IIBBBBB", 3, 4, 16, 2, 0, 0, 0),
        _pack_rows(c16.reshape(4, 9).astype(np.int64), 16),
    )
    got = codecs.png_decode(blob)
    assert got is not None and np.array_equal(got, (c16 >> 8).astype(np.uint8))


def test_png_decode_subbyte_depths():
    rng = np.random.default_rng(43)
    for depth in (1, 2, 4):
        mx = (1 << depth) - 1
        # odd width exercises row bit padding
        g = rng.integers(0, mx + 1, (7, 5), dtype=np.int64)
        blob = _png_chunks(
            struct.pack(">IIBBBBB", 5, 7, depth, 0, 0, 0, 0), _pack_rows(g, depth)
        )
        got = codecs.png_decode(blob)
        assert got is not None, depth
        assert np.array_equal(got[:, :, 0], (g * (255 // mx)).astype(np.uint8)), depth
    # 4-bit palette
    pal = bytes(range(48))  # 16 RGB entries
    idx = rng.integers(0, 16, (5, 6), dtype=np.int64)
    blob = _png_chunks(
        struct.pack(">IIBBBBB", 6, 5, 4, 3, 0, 0, 0), _pack_rows(idx, 4), plte=pal
    )
    got = codecs.png_decode(blob)
    want = np.frombuffer(pal, dtype=np.uint8).reshape(16, 3)[idx]
    assert got is not None and np.array_equal(got, want)


def _mp4_box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _mp4_mjpeg(frames: list[bytes], two_chunks: bool = True) -> bytes:
    """Minimal ISO-BMFF muxer: one MJPEG ('jpeg') video track whose
    samples are the given JPEG blobs, split across two chunks to
    exercise the stsc run logic; mdat carries the sample bytes."""
    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    # layout: ftyp | moov | mdat ; compute offsets after moov is sized
    stsd = _mp4_box(
        b"stsd",
        b"\x00" * 4 + struct.pack(">I", 1)
        + _mp4_box(b"jpeg", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70),
    )
    stsz = _mp4_box(
        b"stsz",
        b"\x00" * 4 + struct.pack(">II", 0, len(frames))
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    if two_chunks and len(frames) >= 2:
        k = (len(frames) + 1) // 2
        runs = [(1, k, 1), (2, len(frames) - k, 1)]
        chunk_starts = [0, k]
    else:
        runs = [(1, len(frames), 1)]
        chunk_starts = [0]
    stsc = _mp4_box(
        b"stsc",
        b"\x00" * 4 + struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", *r) for r in runs),
    )
    mvhd = _mp4_box(b"mvhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, 1000, 2000) + b"\x00" * 80)

    def moov_with(stco_body: bytes) -> bytes:
        stco = _mp4_box(b"stco", stco_body)
        stbl = _mp4_box(b"stbl", stsd + stsz + stsc + stco)
        minf = _mp4_box(b"minf", stbl)
        mdia = _mp4_box(b"mdia", minf)
        trak = _mp4_box(b"trak", mdia)
        return _mp4_box(b"moov", mvhd + trak)

    placeholder = b"\x00" * 4 + struct.pack(">I", len(chunk_starts)) + b"\x00" * 4 * len(chunk_starts)
    moov_len = len(moov_with(placeholder))
    mdat_payload = b"".join(frames)
    base = len(ftyp) + moov_len + 8  # mdat body offset
    sizes = [len(f) for f in frames]
    prefix = [0]
    for s in sizes:
        prefix.append(prefix[-1] + s)
    stco_body = b"\x00" * 4 + struct.pack(">I", len(chunk_starts)) + b"".join(
        struct.pack(">I", base + prefix[cs]) for cs in chunk_starts
    )
    return ftyp + moov_with(stco_body) + _mp4_box(b"mdat", mdat_payload)


def test_mp4_mjpeg_frames_demux_and_decode(spark):
    """MP4/MOV MJPEG sample extraction (r7): sample tables (stsz/stsc/
    stco) rebuild per-sample byte ranges; each sample is a standalone
    JPEG our decoder opens — closing the 'MP4 is probe-only' gap for
    the one codec with stateless frames."""
    from stellar_etl_airflow_spark.training.jpeg import jpeg_decode, jpeg_encode
    from stellar_etl_airflow_spark.training.multimodal import MEDIA_SCHEMA, sample_frames

    rng = np.random.default_rng(51)
    imgs = [rng.integers(0, 256, (16, 16), dtype=np.uint8) for _ in range(3)]
    frames = [jpeg_encode(im) for im in imgs]
    blob = _mp4_mjpeg(frames)
    got = codecs.mp4_mjpeg_frames(blob)
    assert got is not None and got == frames
    # every extracted sample decodes to its source pixels (+-1 IDCT)
    for im, fr in zip(imgs, got):
        dec = jpeg_decode(fr)
        assert dec is not None
        assert int(np.abs(dec[:, :, 0].astype(int) - im.astype(int)).max()) <= 1
    # single-chunk layout too
    assert codecs.mp4_mjpeg_frames(_mp4_mjpeg(frames, two_chunks=False)) == frames
    # the container still probes (duration from mvhd)
    assert codecs.mp4_info(blob)[0] == 2000
    # a non-MJPEG (probe-only) mp4 yields None, not garbage
    assert codecs.mp4_mjpeg_frames(b"\x00\x00\x00\x08ftyp") is None
    # Spark stage: n_frames == 3, digests of real sample bytes
    import hashlib as _h

    rows = [(1, "video", bytearray(blob), len(blob))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["frame_index"]: r for r in sample_frames(media).collect()}
    assert len(out) == 3 and out[2]["frame_md5"] == _h.md5(frames[2]).hexdigest()


def test_decoders_never_raise_on_corruption():
    """Every probe/decoder consumed inside Arrow batches must return
    None/graceful values on corrupt input, never raise — one bad payload
    must not kill a Spark stage. Fuzz: truncations and byte flips of
    REAL payloads of every supported container, plus random garbage."""
    from stellar_etl_airflow_spark.training import flac as FL
    from stellar_etl_airflow_spark.training.jpeg import jpeg_encode, jpeg_encode_progressive

    rng = np.random.default_rng(61)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    pcm = rng.integers(-3000, 3000, 500).astype(np.int64)
    seeds = [
        jpeg_encode(img),
        jpeg_encode_progressive(img),
        codecs.png_encode(img),
        FL.flac_encode(pcm),
        _gif_bytes(rng.integers(0, 4, (8, 8)).astype(np.int64),
                   [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]),
        _mp4_mjpeg([jpeg_encode(img[:, :, 0])]),
        b"".join(_mp3_frame() for _ in range(4)),
    ]
    probes = [
        codecs.image_pixels,
        codecs.image_dimensions,
        codecs.audio_probe,
        codecs.gif_frames,
        codecs.mp4_mjpeg_frames,
        codecs.mp3_info,
        codecs.ogg_vorbis_info,
        FL.flac_decode,
    ]
    for blob in seeds:
        variants = [blob[: len(blob) // 3], blob[: len(blob) - 7], blob + b"\x00" * 9]
        for _ in range(6):
            bad = bytearray(blob)
            for _ in range(3):
                bad[int(rng.integers(0, len(bad)))] ^= int(rng.integers(1, 256))
            variants.append(bytes(bad))
        variants.append(rng.bytes(200))
        for v in variants:
            for probe in probes:
                probe(v)  # must not raise; return value unconstrained


def test_jpeg_progressive_restart_intervals(spark):
    """Progressive DRI/RSTn: every scan kind restarts (DC predictors +
    EOB run reset); round-trip within IDCT rounding and javax.imageio
    independently accepts the restart-marked streams."""
    import tempfile

    from stellar_etl_airflow_spark.training.jpeg import (
        jpeg_decode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(71)
    px = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)  # 9 MCUs
    for ri in (1, 2, 4):
        blob = jpeg_encode_progressive(px, restart_interval=ri)
        assert any(bytes([0xFF, 0xD0 + k]) in blob for k in range(8)), ri
        dec = jpeg_decode(blob)
        assert dec is not None and dec.shape == (24, 17, 3), ri
        assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 2, ri
        with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
            f.write(blob)
            f.flush()
            ref = _imageio_pixels(spark, f.name)
        assert int(np.abs(dec.astype(np.int32) - ref).max()) <= 2, ri


# ------------------------------------------------------------------- RLE8
def _avi_rle8(chunks: list[bytes], w: int, h: int) -> bytes:
    """Minimal RIFF-AVI with a BI_RLE8 strf header + movi 00dc chunks."""

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    # BITMAPINFOHEADER: size, w, h, planes, bitcount=8, compression=1 (BI_RLE8)
    bih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, 0, 0, 0, 256, 0)
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", b"vids" + b"mrle" + b"\x00" * 48) + chunk(b"strf", bih))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", b"\x00" * 56) + strl)
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", c) for c in chunks))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_rle8_interframe_roundtrip():
    """Encode a sequence with partial inter-frame changes, decode through
    the AVI path, require exact reconstruction — and prove the decode is
    genuinely STATEFUL: frame 2 decoded without frame 1's state differs."""
    import numpy as np

    rng = np.random.default_rng(7)
    f0 = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    f1 = f0.copy()
    f1[3:6, 10:20] = 77            # small patch changes
    f2 = f1.copy()
    f2[0, :] = 5                   # single-row change
    frames = [f0, f1, f2]
    chunks, prev = [], None
    for f in frames:
        chunks.append(codecs.rle8_encode_frame(f, prev))
        prev = f
    # delta encoding actually engaged: later chunks are smaller than full
    assert len(chunks[1]) < len(chunks[0]) and len(chunks[2]) < len(chunks[0])

    got = codecs.avi_rle8_frames(_avi_rle8(chunks, 24, 16))
    assert got is not None and len(got) == 3
    for want, have in zip(frames, got):
        assert np.array_equal(want, have)

    # inter-frame dependence: chunk 1 standalone (no carried state) is WRONG
    standalone = codecs.rle8_decode_frame(chunks[1], 24, 16, prev=None)
    assert not np.array_equal(standalone, f1)


def test_rle8_absolute_and_delta_opcodes():
    """Hand-built opcode stream: absolute mode (00 n literals, word
    aligned), delta skip (00 02 dx dy), early end-of-bitmap carrying the
    remainder from the previous frame."""
    import numpy as np

    w = h = 4
    prev = np.full((4, 4), 9, dtype=np.uint8)
    # bottom row: absolute 3 literals (1,2,3) + pad, run of 1 value 8, EOL;
    # then delta skip (dx=1, dy=1) -> row 2 keeps prev except after skip;
    # run 3 of value 6 from x=1; EOB early: top rows stay prev
    data = bytes([0, 3, 1, 2, 3, 0, 1, 8, 0, 0,   0, 2, 1, 1,  3, 6, 0, 1])
    out = codecs.rle8_decode_frame(data, w, h, prev)
    assert out[3].tolist() == [1, 2, 3, 8]          # bottom row y=0
    assert out[2].tolist() == [9, 9, 9, 9]          # skipped by dy
    assert out[1].tolist() == [9, 6, 6, 6]          # delta dx=1 then run
    assert out[0].tolist() == [9, 9, 9, 9]          # EOB: carried over


def test_rle8_sample_frames_integration(spark):
    """sample_frames digests the RECONSTRUCTED pixel arrays for RLE8
    AVIs — digest equality across the Spark path proves the stateful
    decode ran inside the Arrow batch."""
    import hashlib

    import numpy as np

    from stellar_etl_airflow_spark.training.multimodal import sample_frames

    f0 = np.zeros((8, 8), dtype=np.uint8)
    f1 = f0.copy(); f1[4, 2:6] = 3
    c0 = codecs.rle8_encode_frame(f0)
    c1 = codecs.rle8_encode_frame(f1, f0)
    avi = _avi_rle8([c0, c1], 8, 8)
    df = spark.createDataFrame([(1, bytearray(avi))], "doc_id long, payload binary")
    rows = sample_frames(df).collect()
    assert [r["n_frames"] for r in rows] == [2, 2]
    want = [hashlib.md5(f0.tobytes()).hexdigest(), hashlib.md5(f1.tobytes()).hexdigest()]
    assert [r["frame_md5"] for r in rows] == want

    # non-RLE8 AVIs (e.g. MJPEG fixture) still take their own path
    jpg = open(_os.path.join(_DATA, "python16x16.jpg"), "rb").read()
    assert codecs.avi_rle8_frames(_avi_mjpeg([jpg])) is None


def _mp4_avc1(samples, timescale=600, stts_runs=None, syncs=None, w=640, h=360):
    """Minimal ISO-BMFF muxer for an H.264-shaped ('avc1') video track:
    hdlr 'vide' + mdhd timescale + stts decode times + optional stss
    sync table — the inter-frame shape mp4_keyframe_index exists for
    (samples are opaque NAL-ish blobs; no decode claimed)."""
    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    entry = _mp4_box(
        b"avc1",
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", w, h) + b"\x00" * 50,
    )
    stsd = _mp4_box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
    stsz = _mp4_box(
        b"stsz",
        b"\x00" * 4 + struct.pack(">II", 0, len(samples))
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stsc = _mp4_box(b"stsc", b"\x00" * 4 + struct.pack(">I", 1) + struct.pack(">III", 1, len(samples), 1))
    boxes = stsd + stsz + stsc
    if stts_runs:
        stts = _mp4_box(
            b"stts",
            b"\x00" * 4 + struct.pack(">I", len(stts_runs))
            + b"".join(struct.pack(">II", *r) for r in stts_runs),
        )
        boxes += stts
    if syncs is not None:
        boxes += _mp4_box(
            b"stss",
            b"\x00" * 4 + struct.pack(">I", len(syncs))
            + b"".join(struct.pack(">I", s) for s in syncs),
        )
    hdlr = _mp4_box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    mdhd = _mp4_box(
        b"mdhd", b"\x00" * 4 + struct.pack(">III", 0, 0, timescale) + b"\x00" * 8
    )
    mvhd = _mp4_box(b"mvhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, 1000, 2000) + b"\x00" * 80)

    def moov_with(stco_body):
        stco = _mp4_box(b"stco", stco_body)
        stbl = _mp4_box(b"stbl", boxes + stco)
        minf = _mp4_box(b"minf", stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        return _mp4_box(b"moov", mvhd + _mp4_box(b"trak", mdia))

    placeholder = b"\x00" * 4 + struct.pack(">I", 1) + b"\x00" * 4
    base = len(ftyp) + len(moov_with(placeholder)) + 8
    stco_body = b"\x00" * 4 + struct.pack(">I", 1) + struct.pack(">I", base)
    return ftyp + moov_with(stco_body) + _mp4_box(b"mdat", b"".join(samples))


def test_mp4_keyframe_index_sync_samples():
    """Keyframe index for inter-frame video (r10, VERDICT r9 ask #7):
    stss sync samples resolve to exact byte ranges and decode times —
    the seek plan a frame-sampling pipeline runs WITHOUT a decoder."""
    samples = [b"I" * 40, b"p" * 7, b"p" * 9, b"I" * 33, b"p" * 5]
    blob = _mp4_avc1(
        samples, timescale=600,
        stts_runs=[(2, 100), (3, 200)], syncs=[1, 4, 99],  # 99: corrupt, skipped
    )
    idx = codecs.mp4_keyframe_index(blob)
    assert idx is not None
    assert (idx["codec"], idx["width"], idx["height"]) == ("avc1", 640, 360)
    assert idx["timescale"] == 600 and idx["n_samples"] == 5
    assert [k["sample"] for k in idx["keyframes"]] == [1, 4]
    k1, k4 = idx["keyframes"]
    # decode times: sample 1 at t=0; sample 4 after 100+100+200 ticks
    assert k1["time_ms"] == 0 and k4["time_ms"] == round(400 * 1000 / 600)
    # byte ranges point INTO mdat at the exact sample bytes
    assert blob[k1["offset"] : k1["offset"] + k1["size"]] == samples[0]
    assert blob[k4["offset"] : k4["offset"] + k4["size"]] == samples[3]


def test_mp4_keyframe_index_absent_stss_means_all_sync():
    """ISO/IEC 14496-12 §8.6.2: no stss box => every sample is a sync
    sample (all-intra tracks); and non-video / non-BMFF payloads map to
    None, never raise."""
    samples = [b"A" * 10, b"B" * 11]
    idx = codecs.mp4_keyframe_index(_mp4_avc1(samples, syncs=None, stts_runs=[(2, 50)]))
    assert idx is not None and [k["sample"] for k in idx["keyframes"]] == [1, 2]
    assert [k["size"] for k in idx["keyframes"]] == [10, 11]
    # the MJPEG fixture has no hdlr 'vide' track: None, not garbage
    assert codecs.mp4_keyframe_index(b"\x00\x00\x00\x08ftyp") is None
    assert codecs.mp4_keyframe_index(b"RIFFxxxxAVI LIST") is None
    # truncated container: caught, None
    assert codecs.mp4_keyframe_index(_mp4_avc1(samples)[:60]) is None
