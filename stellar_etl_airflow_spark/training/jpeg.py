"""JPEG decoder (baseline + progressive) — pure Python/numpy, ITU-T T.81.

Completes the image codec story (PNG/BMP/GIF pixels were already real):
baseline sequential (SOF0/SOF1) AND progressive (SOF2, r7) DCT JPEGs
decode to pixels with stdlib + numpy only. Spec sections implemented:

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

- Annex G progressive mode (r7): spectral selection (Ss..Se bands),
  successive approximation (Ah/Al), DC first/refine (interleaved and
  single-component), AC first/refine with EOB-run accumulation and
  correction-bit weaving (G.1.2.2/G.1.2.3), restart intervals in every
  scan kind; one vectorized IDCT after EOI.

NOT implemented (return None): arithmetic coding, 12-bit precision,
hierarchical modes. Those genuinely warrant libjpeg.

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
    coefs = None  # progressive: per-component coefficient arrays
    any_scan = False
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
        if marker == 0xD9:  # EOI: end of progressive scans, or error pre-SOS
            break
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
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
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                return None
            ns = body[0]
            scan = {}
            scomp_order = []
            for c in range(ns):
                cs = body[1 + 2 * c]
                td_ta = body[2 + 2 * c]
                scan[cs] = (td_ta >> 4, td_ta & 15)
                scomp_order.append(cs)
            if not frame["progressive"]:
                return _decode_scan(
                    payload, i + 2 + seg_len, frame, scan, qt, huff, restart_interval
                )
            # progressive: accumulate this scan into the coefficient
            # arrays, then keep walking markers until EOI (T.81 Annex G)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
            if coefs is None:
                coefs = _alloc_coefs(frame)
                if coefs is None:
                    return None
            pos = _decode_prog_scan(
                payload, i + 2 + seg_len, frame, scan, scomp_order, huff,
                coefs, restart_interval, ss, se, ah, al,
            )
            if pos is None:
                return None
            any_scan = True
            i = pos
            continue
        i += 2 + seg_len
    if frame is not None and frame.get("progressive") and any_scan:
        return _reconstruct_progressive(frame, coefs, qt)
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
    return _upsample_color(planes, comps, hmax, vmax, h, w)


def _upsample_color(planes, comps, hmax, vmax, h, w):
    """Shared tail of baseline and progressive reconstruction: upsample
    each component plane to full resolution, crop, and color-convert.
    Factor-2 axes use libjpeg's "fancy" triangular filter (3:1 weights
    toward the nearer sample, edge-replicated) — the centered-siting
    interpolation JFIF assumes and what libjpeg-lineage decoders emit;
    other factors replicate."""
    import numpy as np

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


# ---------------------------------------------------------------------------
# Progressive mode (T.81 Annex G): scans deliver spectral bands
# (Ss..Se) at successive approximation levels (Ah/Al) into persistent
# per-component coefficient arrays; the IDCT runs once, after EOI.
# ---------------------------------------------------------------------------


def _frame_geom(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0 or not frame["h"] or not frame["w"]:
        return None
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _alloc_coefs(frame):
    """One (block_rows, block_cols, 64) int32 array per component, sized
    to the MCU-padded grid (interleaved DC scans write the padding
    blocks; non-interleaved scans cover only the true grid)."""
    import numpy as np

    g = _frame_geom(frame)
    if g is None:
        return None
    hmax, vmax, mcus_x, mcus_y = g
    return [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    ]


def _comp_blocks(frame, c):
    """True (non-padded) block grid of one component: ceil of the
    component's scaled dimensions over 8 (T.81 A.1.1)."""
    hmax, vmax, _, _ = _frame_geom(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _refine_coef(r, coef, k, p1):
    """One correction bit for a nonzero-history coefficient (G.1.2.3):
    reads a bit and, when set, moves coef[k] one p1 step away from zero
    unless that bit is already present."""
    if r.read_bit():
        if coef[k] > 0:
            if not coef[k] & p1:
                coef[k] += p1
        else:
            if not (-coef[k]) & p1:
                coef[k] -= p1


def _refine_ac(r, coef, ss, se, p1):
    """Correction-bit pass over the whole band of one block (used for
    blocks covered by an EOB run in an AC refinement scan, G.1.2.3)."""
    for k in range(ss, se + 1):
        if coef[k] != 0:
            _refine_coef(r, coef, k, p1)


def _decode_prog_scan(
    payload, start, frame, scan, scomp_order, huff, coefs, ri, ss, se, ah, al
):
    """Decode ONE progressive scan into ``coefs``; returns the payload
    index of the next marker (the 0xFF byte), or None on corruption.

    Implements all four scan kinds of G.2: DC first (Ss=Se=0, Ah=0,
    interleaved or single-component), DC refinement (Ah>0, one raw bit
    per block), AC first (single component, run/size with EOB-run), and
    AC refinement (correction bits woven through the run-length walk).
    Restart intervals reset DC predictors, the EOB run, and the bit
    buffer, exactly as in sequential mode (G.1.1)."""
    comps = frame["comps"]
    g = _frame_geom(frame)
    if g is None:
        return None
    hmax, vmax, mcus_x, mcus_y = g
    # preserve the scan header's component order (matters for interleave)
    by_id = {c["id"]: (ci, c) for ci, c in enumerate(comps)}
    if any(cs not in by_id for cs in scomp_order):
        return None
    sel = [by_id[cs] for cs in scomp_order]
    r = _BitReader(payload, start)
    p1 = 1 << al

    if ss == 0:  # DC scan (Se must be 0: DC and AC never share a scan)
        if se != 0:
            return None
        for ci, c in sel:
            td, _ = scan[c["id"]]
            if ah == 0 and (0, td) not in huff:
                return None
        pred = [0] * len(sel)
        if len(sel) > 1:  # interleaved MCU walk over all scan components
            units = []
            for si, (ci, c) in enumerate(sel):
                units.append((si, ci, c))
            mcu_count = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if ri and mcu_count and mcu_count % ri == 0:
                        if not r.restart():
                            return None
                        pred = [0] * len(sel)
                    mcu_count += 1
                    for si, ci, c in units:
                        td, _ = scan[c["id"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                row, col = my * c["v"] + by, mx * c["h"] + bx
                                coef = coefs[ci][row, col]
                                if ah == 0:
                                    t = _decode_huff(r, huff[(0, td)])
                                    if t is None:
                                        return None
                                    diff = _extend(r.read_bits(t), t)
                                    pred[si] += diff
                                    coef[0] = pred[si] << al
                                else:  # refinement: one raw bit
                                    if r.read_bit():
                                        coef[0] |= p1
        else:  # single-component: non-interleaved block walk (A.2)
            ci, c = sel[0]
            td, _ = scan[c["id"]]
            cbh, cbw = _comp_blocks(frame, c)
            mcu_count = 0
            for row in range(cbh):
                for col in range(cbw):
                    if ri and mcu_count and mcu_count % ri == 0:
                        if not r.restart():
                            return None
                        pred = [0]
                    mcu_count += 1
                    coef = coefs[ci][row, col]
                    if ah == 0:
                        t = _decode_huff(r, huff[(0, td)])
                        if t is None:
                            return None
                        diff = _extend(r.read_bits(t), t)
                        pred[0] += diff
                        coef[0] = pred[0] << al
                    else:
                        if r.read_bit():
                            coef[0] |= p1
    else:  # AC scan: exactly one component (B.2.3)
        if len(sel) != 1 or se < ss or se > 63:
            return None
        ci, c = sel[0]
        _, ta = scan[c["id"]]
        if (1, ta) not in huff:
            return None
        ac_tab = huff[(1, ta)]
        cbh, cbw = _comp_blocks(frame, c)
        eobrun = 0
        mcu_count = 0
        for row in range(cbh):
            for col in range(cbw):
                if ri and mcu_count and mcu_count % ri == 0:
                    if not r.restart():
                        return None
                    eobrun = 0
                mcu_count += 1
                coef = coefs[ci][row, col]
                if ah == 0:  # AC first (G.1.2.2)
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _decode_huff(r, ac_tab)
                        if rs is None:
                            return None
                        run, size = rs >> 4, rs & 15
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            eobrun = (1 << run) - 1
                            if run:
                                eobrun += r.read_bits(run)
                            break
                        k += run
                        if k > se:
                            return None
                        coef[k] = _extend(r.read_bits(size), size) << al
                        k += 1
                else:  # AC refinement (G.1.2.3)
                    if eobrun:
                        _refine_ac(r, coef, ss, se, p1)
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _decode_huff(r, ac_tab)
                        if rs is None:
                            return None
                        run, size = rs >> 4, rs & 15
                        if size == 0:
                            if run != 15:  # EOBn
                                eobrun = (1 << run)
                                if run:
                                    eobrun += r.read_bits(run)
                                break
                            newval = 0  # ZRL: skip 16 zero-history slots
                        elif size == 1:
                            newval = p1 if r.read_bit() else -p1
                        else:
                            return None  # refinement codes only +-1
                        # advance: correction bits on nonzero history,
                        # `run` skips on zero history
                        while k <= se:
                            if coef[k] != 0:
                                _refine_coef(r, coef, k, p1)
                            else:
                                if run == 0:
                                    break
                                run -= 1
                            k += 1
                        if size and k <= se:
                            coef[k] = newval
                        k += 1
                    if eobrun:
                        _refine_ac(r, coef, k, se, p1)
                        eobrun -= 1

    # skip to the next marker: trailing pad bits, then 0xFF + non-stuffing
    d = payload
    j = max(r.i, start)
    n = len(d)
    while j < n:
        if d[j] == 0xFF and j + 1 < n:
            nxt = d[j + 1]
            if nxt == 0x00 or nxt == 0xFF:
                j += 2 if nxt == 0x00 else 1
                continue
            if 0xD0 <= nxt <= 0xD7:  # stray restart: part of this scan
                j += 2
                continue
            return j
        j += 1
    return n  # truncated: let the caller reconstruct what it has


def _reconstruct_progressive(frame, coefs, qt):
    """Dequantize + IDCT every component's coefficient array (vectorized
    einsum over all blocks), then the shared upsample/color tail."""
    import numpy as np

    g = _frame_geom(frame)
    if g is None:
        return None
    hmax, vmax, mcus_x, mcus_y = g
    comps = frame["comps"]
    M = _idct_matrix()
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            return None
        q = qt[c["tq"]]
        bh, bw = coefs[ci].shape[:2]
        dq = (coefs[ci] * q)[:, :, ZIGZAG_INV].reshape(bh, bw, 8, 8).astype(np.float64)
        px = np.einsum("ij,xyjk,kl->xyil", M.T, dq, M) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _upsample_color(planes, comps, hmax, vmax, frame["h"], frame["w"])


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


def jpeg_encode_progressive(pixels, quant: int = 1, restart_interval: int = 0) -> bytes:
    """Encode (h, w) or (h, w, {1,3}) uint8 pixels as a PROGRESSIVE
    (SOF2) JPEG exercising every Annex-G scan kind the decoder
    implements: interleaved DC first at Al=1, DC refinement, per-
    component AC first in two spectral bands at Al=1 (with real EOB-run
    accumulation), and per-component AC refinement at Al=0 (correction
    bits woven through the run-length walk, G.1.2.3). Like the baseline
    encoder it exists for conformance testing — flat 8-bit Huffman
    tables, no subsampling — and its streams are independently decodable
    by javax.imageio (see test_codecs). ``restart_interval`` > 0 emits
    DRI + RSTn markers every N MCUs in EVERY scan (DC predictors and the
    EOB run reset at each, G.1.1) — the progressive restart path wild
    fixtures rarely contain."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    assert nch in (1, 3)
    if nch == 3:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        comps_px = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        comps_px = [px[:, :, 0].astype(np.float64)]
    M = _idct_matrix()
    q = np.full(64, int(quant), dtype=np.int32)
    bh, bw = -(-h // 8), -(-w // 8)
    # full-precision zigzag coefficients per component, block raster order
    zz_all = []
    for plane in comps_px:
        pad = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        blocks = []
        for by in range(bh):
            for bx in range(bw):
                f = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                Fq = M @ f @ M.T
                blocks.append(np.round(Fq.reshape(64)[ZIGZAG] / q).astype(np.int64))
        zz_all.append(blocks)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def trunc(v: int, al: int) -> int:  # AC point transform (toward zero)
        return (abs(v) >> al) * (1 if v >= 0 else -1)

    ri = int(restart_interval)

    # ---- event generators: ('sym', s) / ('bits', v, n) / ('bit', b) /
    # ('rst',) — a restart marker boundary ----
    def dc_first_events(al: int):
        ev = []
        preds = [0] * nch
        for m in range(bh * bw):
            if ri and m and m % ri == 0:
                ev.append(("rst",))
                preds = [0] * nch
            for ci in range(nch):
                v1 = int(zz_all[ci][m][0]) >> al  # DC: arithmetic shift
                diff = v1 - preds[ci]
                preds[ci] = v1
                t = _category(diff)
                ev.append(("sym", t))
                if t:
                    ev.append(("bits", diff if diff >= 0 else diff + (1 << t) - 1, t))
        return ev

    def dc_refine_events(al: int):
        ev = []
        for m in range(bh * bw):
            if ri and m and m % ri == 0:
                ev.append(("rst",))
            for ci in range(nch):
                ev.append(("bit", (int(zz_all[ci][m][0]) >> al) & 1))
        return ev

    def ac_first_events(ci: int, ss: int, se: int, al: int):
        ev = []
        eobrun = 0

        def flush():
            nonlocal eobrun
            if eobrun:
                rr = eobrun.bit_length() - 1
                ev.append(("sym", rr << 4))
                if rr:
                    ev.append(("bits", eobrun - (1 << rr), rr))
                eobrun = 0

        for m in range(bh * bw):
            if ri and m and m % ri == 0:
                flush()
                ev.append(("rst",))
            band = [trunc(int(zz_all[ci][m][k]), al) for k in range(ss, se + 1)]
            nz = [i for i, v in enumerate(band) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            run = 0
            for i, v in enumerate(band):
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ev.append(("sym", 0xF0))
                    run -= 16
                s = _category(v)
                ev.append(("sym", (run << 4) | s))
                ev.append(("bits", v if v >= 0 else v + (1 << s) - 1, s))
                run = 0
            if nz[-1] < se - ss:
                eobrun = 1
        flush()
        return ev

    def ac_refine_events(ci: int, ss: int, se: int, ah: int, al: int):
        ev = []
        eobrun = 0
        eob_bits: list[int] = []

        def flush():
            nonlocal eobrun, eob_bits
            if eobrun:
                rr = eobrun.bit_length() - 1
                ev.append(("sym", rr << 4))
                if rr:
                    ev.append(("bits", eobrun - (1 << rr), rr))
                ev.extend(("bit", b) for b in eob_bits)
                eobrun = 0
                eob_bits = []

        p1h = 1 << ah
        for m in range(bh * bw):
            if ri and m and m % ri == 0:
                flush()
                ev.append(("rst",))
            v = [int(zz_all[ci][m][k]) for k in range(ss, se + 1)]
            hist = [trunc(x, ah) != 0 for x in v]  # nonzero after prior scans
            new = [
                (not hist[i]) and (abs(v[i]) >> al) != 0 for i in range(len(v))
            ]
            corr = [(abs(x) >> al) & 1 for x in v]
            if not any(new):
                eob_bits.extend(corr[i] for i in range(len(v)) if hist[i])
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            k = 0
            last = len(v) - 1
            while k <= last:
                run = 0
                j = None
                x = k
                while x <= last:
                    if not hist[x] and new[x]:
                        j = x
                        break
                    if not hist[x]:
                        run += 1
                    x += 1
                if j is None:
                    eob_bits = [corr[x] for x in range(k, last + 1) if hist[x]]
                    eobrun = 1
                    break
                while run > 15:
                    ev.append(("sym", 0xF0))
                    skipped = 0
                    while True:
                        if hist[k]:
                            ev.append(("bit", corr[k]))
                        else:
                            skipped += 1
                            if skipped == 16:
                                k += 1
                                break
                        k += 1
                    run -= 16
                ev.append(("sym", (run << 4) | 1))
                ev.append(("bit", 1 if v[j] > 0 else 0))
                while k < j:
                    if hist[k]:
                        ev.append(("bit", corr[k]))
                    k += 1
                k = j + 1
        flush()
        return ev

    def write_scan(out: bytearray, events, sos_comps, ss, se, ah, al, tclass):
        syms = sorted({e[1] for e in events if e[0] == "sym"})
        enc = {}
        if syms:
            dht, enc = _flat_table(syms)
            out += seg(0xC4, bytes([tclass << 4]) + dht)
        sos = bytes([len(sos_comps)])
        for cid in sos_comps:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        wtr = _BitWriter()
        rst_n = 0
        for e in events:
            if e[0] == "sym":
                code, ln = enc[e[1]]
                wtr.write(code, ln)
            elif e[0] == "bits":
                wtr.write(e[1], e[2])
            elif e[0] == "rst":
                wtr.align()
                wtr.raw(bytes([0xFF, 0xD0 + (rst_n & 7)]))
                rst_n += 1
            else:
                wtr.write(e[1], 1)
        wtr.align()
        out += wtr.out

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + bytes(int(x) for x in q))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nch])
    for c in range(nch):
        sof += bytes([c + 1, 0x11, 0])
    out += seg(0xC2, sof)
    if ri:
        out += seg(0xDD, struct.pack(">H", ri))

    all_cids = [c + 1 for c in range(nch)]
    write_scan(out, dc_first_events(1), all_cids, 0, 0, 0, 1, 0)
    write_scan(out, dc_refine_events(0), all_cids, 0, 0, 1, 0, 0)
    for ci in range(nch):
        write_scan(out, ac_first_events(ci, 1, 5, 1), [ci + 1], 1, 5, 0, 1, 1)
        write_scan(out, ac_first_events(ci, 6, 63, 1), [ci + 1], 6, 63, 0, 1, 1)
    for ci in range(nch):
        write_scan(out, ac_refine_events(ci, 1, 63, 1, 0), [ci + 1], 1, 63, 1, 0, 1)
    out += b"\xff\xd9"
    return bytes(out)
