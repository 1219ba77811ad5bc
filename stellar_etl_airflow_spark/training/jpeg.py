"""Baseline JPEG decoder — pure Python/numpy, ITU-T T.81.

Completes the image codec story (PNG/BMP/GIF pixels were already real):
baseline sequential DCT JPEGs (SOF0/SOF1) decode to pixels with stdlib +
numpy only. Spec sections implemented:

- §B.2.4.1 DQT (8/16-bit precision quantization tables);
- §B.2.4.2 DHT (BITS[1..16] + HUFFVAL -> canonical code assignment per
  §C.2, decoded bit-serially per §F.2.2.3);
- §B.2.2 SOF0/1 frame header (components, sampling factors);
- §B.2.3 SOS scan header; §B.1.1.5 byte stuffing (FF 00); §B.2.4.4 DRI +
  RSTn restart intervals (DC predictors and bit buffer reset, §F.2.1.3.1);
- §F.2.1.2 DC DIFF coding + EXTEND (§F.2.2.1), §F.2.2.2 AC run/size with
  ZRL and EOB;
- §A.3.3 IDCT (exact 8x8 DCT-III as two matrix products — the spec's
  reference definition, not a fast approximation);
- §A.2 chroma upsampling by pixel replication; YCbCr -> RGB per the
  JFIF/BT.601 equations (T.871 §7).

NOT implemented (return None): progressive (SOF2), arithmetic coding,
12-bit precision, hierarchical modes. Those genuinely warrant libjpeg.

Conformance: T.81 Annex A allows small IDCT implementation variance, so
independent decoders legitimately differ by ±1-2 code values per sample.
The test suite cross-validates this decoder pixel-by-pixel against the
JVM's javax.imageio (an independent libjpeg-lineage implementation,
reachable through the Spark gateway) on real-world baseline JPEGs — the
same external-cross-validation discipline as the Avro writer.
"""

from __future__ import annotations

import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman assignment (T.81 §C.2): codes of each
    length are consecutive, starting from (code+1)<<1 of the previous
    length. Returns {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded segments with FF00
    de-stuffing; stops at any non-RST marker. RST handling is external
    (the caller realigns via :meth:`restart`)."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.i = start
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        if self.nbits == 0:
            # Drop already-consumed high bits: without this reset the
            # accumulator grows into an unbounded bigint and every shift
            # becomes O(stream length) — quadratic over the scan.
            self.bits = 0
        while self.nbits <= 24:
            if self.i >= len(d):
                return self.nbits > 0
            b = d[self.i]
            if b == 0xFF:
                nxt = d[self.i + 1] if self.i + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.i += 2
                elif 0xD0 <= nxt <= 0xD7:  # RST: caller consumes it
                    return self.nbits > 0
                else:  # EOI or next segment
                    return self.nbits > 0
            else:
                self.i += 1
            self.bits = ((self.bits << 8) | b) & 0xFFFFFFFFFF
            self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0  # spec: pad with zero bits past the end
        if self.nbits == 0:
            return 0
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> bool:
        """Consume an RSTn marker at the current byte position (discarding
        partial bits); returns False if none found."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        while self.i + 1 < len(d) and d[self.i] == 0xFF and 0xD0 <= d[self.i + 1] <= 0xD7:
            self.i += 2
            return True
        return False


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _idct_matrix():
    import numpy as np

    x = np.arange(8)
    u = x.reshape(-1, 1)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] /= np.sqrt(2.0)
    return m  # pixels = M.T @ F @ M


def jpeg_decode(payload: bytes):
    """(h, w, 3) RGB (or (h, w, 1) grayscale) uint8 pixels for a baseline
    or progressive JPEG; None for arithmetic/12-bit/hierarchical/malformed.

    Never raises: truncated/garbage segment bodies (short DRI, DQT, SOF,
    SOS) surface as ``struct.error``/``ValueError``/``IndexError`` from
    the parser and are converted to None here — an exception would kill
    the whole Arrow batch in ``image_pixels``/``resize_images``.
    """
    try:
        return _jpeg_decode(payload)
    except (struct.error, ValueError, IndexError):
        return None


def _jpeg_decode(payload: bytes):
    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    restart_interval = 0
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            return None
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        body = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(body[j : j + 64], dtype=np.uint8).astype(np.int32)
                    j += 64
                elif pq == 1:
                    tbl = np.frombuffer(body[j : j + 128], dtype=">u2").astype(np.int32)
                    j += 128
                else:
                    return None
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = body[j + 17 : j + 17 + nv]
                huff[(tc, th)] = _build_huffman(bits, vals)
                j += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                return None
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": body[8 + 3 * c]})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                return None
            ns = body[0]
            scan = {}
            for c in range(ns):
                cs = body[1 + 2 * c]
                td_ta = body[2 + 2 * c]
                scan[cs] = (td_ta >> 4, td_ta & 15)
            return _decode_scan(
                payload, i + 2 + seg_len, frame, scan, qt, huff, restart_interval
            )
        i += 2 + seg_len
    return None


def _decode_scan(payload, start, frame, scan, qt, huff, restart_interval):
    import numpy as np

    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if not h or not w:
        return None
    if len(comps) == 1:
        # T.81 §A.2: a one-component scan is NON-interleaved — the MCU is
        # a single data unit walking the component's own block grid, so
        # declared sampling factors >1 must not impose interleaved MCU
        # geometry (that would decode a grayscale image garbled).
        comps = [dict(comps[0], h=1, v=1)]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0:
        return None
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    M = _idct_matrix()
    planes = []
    for c in comps:
        planes.append(np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64))
        if c["tq"] not in qt or c["id"] not in scan:
            return None
        td, ta = scan[c["id"]]
        if (0, td) not in huff or (1, ta) not in huff:
            return None
    r = _BitReader(payload, start)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if not r.restart():
                    return None
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        t = _decode_huff(r, dc_tab)
                        if t is None:
                            return None
                        diff = _extend(r.read_bits(t), t)
                        pred[ci] += diff
                        coef = np.zeros(64, dtype=np.int32)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, ac_tab)
                            if rs is None:
                                return None
                            run, size = rs >> 4, rs & 15
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                return None
                            coef[k] = _extend(r.read_bits(size), size)
                            k += 1
                        dq = (coef * q)[ZIGZAG_INV].reshape(8, 8)
                        block = M.T @ dq @ M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample to full resolution and crop. Factor-2 axes use libjpeg's
    # "fancy" triangular filter (3:1 weights toward the nearer sample,
    # edge-replicated) — the centered-siting interpolation JFIF assumes
    # and what libjpeg-lineage decoders emit; other factors replicate.
    def _fancy2(p, axis):
        p = np.moveaxis(p, axis, 0)
        prev = np.concatenate([p[:1], p[:-1]], axis=0)
        nxt = np.concatenate([p[1:], p[-1:]], axis=0)
        even = 0.75 * p + 0.25 * prev
        odd = 0.75 * p + 0.25 * nxt
        out = np.empty((p.shape[0] * 2,) + p.shape[1:], dtype=np.float64)
        out[0::2] = even
        out[1::2] = odd
        return np.moveaxis(out, 0, axis)

    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        for axis, have, want in ((0, c["v"], vmax), (1, c["h"], hmax)):
            while have < want:
                if want % (have * 2) == 0:
                    p = _fancy2(p, axis)
                    have *= 2
                else:
                    p = np.repeat(p, want // have, axis=axis)
                    have = want
        full.append(p[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    if len(full) != 3:
        return None
    y, cb, cr = full
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# inverse zigzag: position in the 8x8 raster for each natural-order index
def _build_zz_inv():
    import numpy as np

    inv = np.zeros(64, dtype=np.int64)
    for k, z in enumerate(ZIGZAG):
        inv[z] = k
    return inv


ZIGZAG_INV = _build_zz_inv()


# ---------------------------------------------------------------------------
# Minimal baseline ENCODER — exists for conformance testing, not
# production encoding: it lets the test suite (a) round-trip arbitrary
# arrays through fresh entropy streams, (b) exercise the DRI/RSTn restart
# path the wild fixtures don't contain, and (c) hand encoder output to
# javax.imageio, which independently checks both directions. Simplicity
# over compression: every Huffman symbol is a fixed 8-bit code in a
# custom DHT (canonical, valid per §C.2 — the all-ones code stays
# unused), quantization is caller-provided (default all-ones ~ lossless
# to within IDCT rounding), components are never subsampled.
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def align(self) -> None:  # pad with 1-bits to a byte boundary (§F.1.2.3)
        while self.n:
            self.write(1, 1)

    def raw(self, b: bytes) -> None:
        assert self.n == 0
        self.out.extend(b)


def _flat_table(symbols: list[int]) -> tuple[bytes, dict[int, tuple[int, int]]]:
    """All symbols at code length 8 (≤255 symbols). Returns (DHT body
    payload after the class/id byte, {symbol: (code, len)})."""
    symbols = sorted(set(symbols))
    assert len(symbols) <= 255
    bits = [0] * 16
    bits[7] = len(symbols)
    enc = {s: (i, 8) for i, s in enumerate(symbols)}
    return bytes(bits) + bytes(symbols), enc


def _category(v: int) -> int:
    return abs(v).bit_length()


def jpeg_encode(pixels, quant: int = 1, restart_interval: int = 0) -> bytes:
    """Encode (h, w) or (h, w, {1,3}) uint8 pixels as a baseline JPEG.
    ``quant`` is a uniform quantization divisor (1 = near-lossless);
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    assert nch in (1, 3)
    if nch == 3:  # RGB -> YCbCr (T.871)
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        comps_px = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        comps_px = [px[:, :, 0].astype(np.float64)]
    M = _idct_matrix()  # forward DCT: F = M @ f @ M.T
    q = np.full(64, int(quant), dtype=np.int32)
    bh, bw = -(-h // 8), -(-w // 8)

    # first pass: compute all coefficient blocks + collect symbols
    blocks: list[list] = []  # per component, list of (dc_sym, dc_bits, [(ac_sym, bits, n)])
    # all 12 DC categories up front: the emit loop re-differences DCs
    # against restart-reset predictors, which can produce categories the
    # no-restart first pass never saw
    dc_syms, ac_syms = set(range(12)), {0x00, 0xF0}
    for plane in comps_px:
        pad = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        pred = 0
        comp_blocks = []
        for by in range(bh):
            for bx in range(bw):
                f = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                F = M @ f @ M.T
                zz = np.round(F.reshape(64)[ZIGZAG] / q).astype(np.int64)
                diff = int(zz[0]) - pred
                pred = int(zz[0])
                t = _category(diff)
                dc_syms.add(t)
                dval = diff if diff >= 0 else diff + (1 << t) - 1
                acs = []
                run = 0
                last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        acs.append((0xF0, 0, 0))
                        run -= 16
                    s = _category(v)
                    sym = (run << 4) | s
                    ac_syms.add(sym)
                    acs.append((sym, v if v >= 0 else v + (1 << s) - 1, s))
                    run = 0
                if last_nz < 63:
                    acs.append((0x00, 0, 0))  # EOB
                comp_blocks.append((t, dval, acs))
        blocks.append(comp_blocks)

    dc_dht, dc_enc = _flat_table(sorted(dc_syms))
    ac_dht, ac_enc = _flat_table(sorted(ac_syms))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + bytes(int(x) for x in q))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nch])
    for c in range(nch):
        sof += bytes([c + 1, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, b"\x00" + dc_dht)
    out += seg(0xC4, b"\x10" + ac_dht)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nch]) + b"".join(bytes([c + 1, 0x00]) for c in range(nch)) + b"\x00\x3f\x00"
    out += seg(0xDA, sos)

    wtr = _BitWriter()
    n_mcus = bh * bw
    preds_reset_points = set()
    if restart_interval:
        preds_reset_points = {m for m in range(restart_interval, n_mcus, restart_interval)}
    # rebuild absolute DC values by undoing the no-restart diffs, so the
    # emit loop below can re-difference against restart-reset predictors
    abs_dc = []
    for comp_blocks in blocks:
        pred = 0
        seq = []
        for t, dval, acs in comp_blocks:
            diff = _extend(dval, t)
            pred += diff
            seq.append(pred)
        abs_dc.append(seq)
    preds = [0] * nch
    rst_n = 0
    for m in range(n_mcus):
        if m in preds_reset_points:
            wtr.align()
            wtr.raw(bytes([0xFF, 0xD0 + (rst_n & 7)]))
            rst_n += 1
            preds = [0] * nch
        for ci in range(nch):
            t_, dval_, acs = blocks[ci][m]
            diff = abs_dc[ci][m] - preds[ci]
            preds[ci] = abs_dc[ci][m]
            t = _category(diff)
            code, ln = dc_enc[t]
            wtr.write(code, ln)
            if t:
                wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            for sym, vbits, s in acs:
                code, ln = ac_enc[sym]
                wtr.write(code, ln)
                if s:
                    wtr.write(vbits, s)
    wtr.align()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
