"""FLAC frame (subframe) decoder + minimal encoder — pure Python/numpy.

Extends the r6 STREAMINFO header parse (``codecs.flac_info``) to REAL
PCM decode per RFC 9639 (the IETF FLAC specification; format unchanged
from the original xiph.org spec):

- frame header: sync + blocking strategy, coded block-size/rate tables
  (incl. the 8/16-bit end-of-header forms), UTF-8-style coded frame/
  sample numbers, CRC-8 (poly 0x07) verification (§9.1);
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32 with
  quantized coefficients + shift (§9.2.3-9.2.4), wasted-bits unary
  prefix (§9.2.2);
- residuals: partitioned Rice coding, 4-bit (method 0) and 5-bit
  (method 1) parameters, escape-to-raw partitions (§9.2.7);
- stereo decorrelation: left/side, right/side, mid/side (side channel
  carries +1 bit, §9.1.3);
- frame CRC-16 (poly 0x8005) verification, and — when STREAMINFO
  carries one — the decoded stream's MD5 is checked against the header
  MD5 (§8.2): a full end-to-end integrity gate on the decode.

The ENCODER exists for conformance testing (like the JPEG encoders):
fixed blocking, independent/mid-side channels, CONSTANT / VERBATIM /
FIXED / LPC subframes with real partitioned-Rice residuals and correct
CRCs + PCM MD5. FLAC is lossless, so the test gate is EXACT sample
round-trip — any predictor, Rice, or bit-packing defect breaks it —
with the MD5/CRC checks guarding encoder and decoder against
compensating (shared) bugs in the bit layer.

No external FLAC implementation exists in this container (no ffmpeg /
libFLAC / soundfile); when one is present, ``audio_probe`` is the seam
to swap it in.
"""

from __future__ import annotations

import hashlib
import struct

# ---------------------------------------------------------------------------
# bit I/O (MSB-first; FLAC has no byte stuffing)
# ---------------------------------------------------------------------------


class _Bits:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.d = data
        self.p = pos_bits  # absolute bit position

    def read(self, n: int) -> int:
        d, p = self.d, self.p
        end = p + n
        if end > len(d) * 8:
            raise ValueError("flac: bitstream truncated")
        v = 0
        # byte-at-a-time assembly
        first = p >> 3
        last = (end - 1) >> 3
        chunk = int.from_bytes(d[first : last + 1], "big")
        total = (last + 1 - first) * 8
        v = (chunk >> (total - (end - first * 8))) & ((1 << n) - 1)
        self.p = end
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        c = 0
        while self.read(1) == 0:
            c += 1
            if c > 1 << 20:
                raise ValueError("flac: runaway unary")
        return c

    def align(self) -> None:
        self.p = (self.p + 7) & ~7


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _coded_number(d: bytes, i: int) -> tuple[int, int]:
    """UTF-8-style frame/sample number (§9.1.5). Returns (value, next_i)."""
    b0 = d[i]
    if b0 < 0x80:
        return b0, i + 1
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    if n < 2 or n > 7:
        raise ValueError("flac: bad coded number")
    v = b0 & (0x7F >> n)
    for j in range(1, n):
        if d[i + j] & 0xC0 != 0x80:
            raise ValueError("flac: bad coded number continuation")
        v = (v << 6) | (d[i + j] & 0x3F)
    return v, i + n


def _read_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    res: list[int] = []
    for part in range(nparts):
        n = (blocksize >> porder) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("flac: bad partition layout")
        param = bits.read(pbits)
        if param == escape:
            raw_bps = bits.read(5)
            for _ in range(n):
                res.append(bits.sread(raw_bps) if raw_bps else 0)
        else:
            for _ in range(n):
                q = bits.unary()
                r = bits.read(param) if param else 0
                zz = (q << param) | r
                res.append((zz >> 1) ^ -(zz & 1))  # unzigzag
    return res


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1) != 0:
        raise ValueError("flac: bad subframe padding bit")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    ebps = bps - wasted
    if ftype == 0:  # CONSTANT
        v = bits.sread(ebps)
        out = [v] * blocksize
    elif ftype == 1:  # VERBATIM
        out = [bits.sread(ebps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype & 7
        warm = [bits.sread(ebps) for _ in range(order)]
        res = _read_residual(bits, blocksize, order)
        out = list(warm)
        coef = _FIXED_COEF[order]
        for r in res:
            v = r
            for j, c in enumerate(coef):
                v += c * out[-1 - j]
            out.append(v)
    elif ftype >= 32:  # LPC
        order = (ftype & 31) + 1
        warm = [bits.sread(ebps) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid lpc precision")
        shift = bits.sread(5)
        if shift < 0:
            raise ValueError("flac: negative lpc shift")
        qlp = [bits.sread(prec) for _ in range(order)]
        res = _read_residual(bits, blocksize, order)
        out = list(warm)
        for r in res:
            acc = 0
            for j, c in enumerate(qlp):
                acc += c * out[-1 - j]
            out.append(r + (acc >> shift))
    else:
        raise ValueError("flac: reserved subframe type")
    if wasted:
        out = [v << wasted for v in out]
    return out


def flac_decode(payload: bytes):
    """Decode a whole FLAC stream to an (n_samples, channels) int32
    numpy array (plus (rate, bits) metadata): returns
    ``(samples, rate, bits)`` or None for non-FLAC / unsupported /
    corrupt input (CRC-8, CRC-16, and — when present — STREAMINFO MD5
    must all verify)."""
    import numpy as np

    try:
        return _flac_decode(payload)
    except (ValueError, IndexError, struct.error):
        return None


def _flac_decode(payload: bytes):
    import numpy as np

    if len(payload) < 42 or payload[:4] != b"fLaC":
        return None
    # metadata blocks: STREAMINFO first (enforced), skip the rest
    i = 4
    streaminfo = None
    while i + 4 <= len(payload):
        hdr = payload[i]
        btype, last = hdr & 0x7F, hdr & 0x80
        blen = int.from_bytes(payload[i + 1 : i + 4], "big")
        body = payload[i + 4 : i + 4 + blen]
        if i == 4:
            if btype != 0 or blen < 34:
                return None
            streaminfo = body
        i += 4 + blen
        if last:
            break
    if streaminfo is None:
        return None
    packed = int.from_bytes(streaminfo[10:18], "big")
    total_samples = packed & ((1 << 36) - 1)
    si_bits = ((packed >> 36) & 0x1F) + 1
    si_channels = ((packed >> 41) & 0x07) + 1
    si_rate = (packed >> 44) & ((1 << 20) - 1)
    md5 = streaminfo[18:34]

    chans: list[list[int]] = [[] for _ in range(si_channels)]
    rate = 0  # per-frame rate; stays 0 for a frameless stream
    d = payload
    while i < len(d) - 1:
        if d[i] != 0xFF or (d[i + 1] & 0xFC) != 0xF8:
            raise ValueError("flac: lost frame sync")
        hstart = i
        blocking_var = d[i + 1] & 1
        bs_code = d[i + 2] >> 4
        sr_code = d[i + 2] & 15
        ch_code = d[i + 3] >> 4
        sz_code = (d[i + 3] >> 1) & 7
        if d[i + 3] & 1:
            raise ValueError("flac: reserved frame header bit")
        _num, j = _coded_number(d, i + 4)
        if bs_code == 6:
            blocksize = d[j] + 1
            j += 1
        elif bs_code == 7:
            blocksize = int.from_bytes(d[j : j + 2], "big") + 1
            j += 2
        elif bs_code in _BLOCKSIZES:
            blocksize = _BLOCKSIZES[bs_code]
        else:
            raise ValueError("flac: reserved block size")
        if sr_code == 0:
            rate = si_rate
        elif sr_code in _RATES:
            rate = _RATES[sr_code]
        elif sr_code == 12:
            rate = d[j] * 1000
            j += 1
        elif sr_code == 13:
            rate = int.from_bytes(d[j : j + 2], "big")
            j += 2
        elif sr_code == 14:
            rate = int.from_bytes(d[j : j + 2], "big") * 10
            j += 2
        else:
            raise ValueError("flac: invalid sample rate code")
        bps = _SIZES.get(sz_code, si_bits if sz_code == 0 else None)
        if bps is None:
            raise ValueError("flac: reserved sample size")
        if _crc8(d[hstart:j]) != d[j]:
            raise ValueError("flac: frame header CRC-8 mismatch")
        j += 1

        if ch_code < 8:
            nch = ch_code + 1
            side = None
        elif ch_code in (8, 9, 10):
            nch = 2
            side = ch_code
        else:
            raise ValueError("flac: reserved channel assignment")
        if nch != si_channels:
            raise ValueError("flac: channel count mismatch")

        bits = _Bits(d, j * 8)
        subs = []
        for c in range(nch):
            cbps = bps
            if side == 8 and c == 1 or side == 9 and c == 0 or side == 10 and c == 1:
                cbps += 1  # side channel carries one extra bit
            subs.append(_decode_subframe(bits, blocksize, cbps))
        bits.align()
        fend = bits.p >> 3
        if _crc16(d[hstart:fend]) != int.from_bytes(d[fend : fend + 2], "big"):
            raise ValueError("flac: frame CRC-16 mismatch")
        i = fend + 2

        if side == 8:  # left/side: R = L - side
            left, sd = subs
            subs = [left, [l - s for l, s in zip(left, sd)]]
        elif side == 9:  # right/side: L = R + side
            sd, right = subs
            subs = [[r + s for r, s in zip(right, sd)], right]
        elif side == 10:  # mid/side
            mid, sd = subs
            l_out, r_out = [], []
            for m, s in zip(mid, sd):
                m2 = (m << 1) | (s & 1)
                l_out.append((m2 + s) >> 1)
                r_out.append((m2 - s) >> 1)
            subs = [l_out, r_out]
        for c in range(si_channels):
            chans[c].extend(subs[c])
        if total_samples and len(chans[0]) >= total_samples:
            break

    if total_samples:
        chans = [c[:total_samples] for c in chans]
    out = np.array(chans, dtype=np.int64).T.copy()
    if md5 != b"\x00" * 16:
        if hashlib.md5(_pcm_bytes(out, si_bits)).digest() != md5:
            raise ValueError("flac: stream MD5 mismatch")
    if not (si_rate or rate):
        raise ValueError("flac: no sample rate")
    return out.astype(np.int32), (si_rate or rate), si_bits


def _pcm_bytes(samples, bits: int) -> bytes:
    """Interleaved little-endian PCM as hashed by the STREAMINFO MD5
    (§8.2): ceil(bits/8) bytes per sample."""
    import numpy as np

    nbytes = (bits + 7) // 8
    flat = samples.reshape(-1).astype(np.int64)
    if nbytes == 1:
        return (flat & 0xFF).astype(np.uint8).tobytes()
    if nbytes == 2:
        return flat.astype("<i2").tobytes()
    if nbytes == 3:
        le32 = flat.astype("<i4").tobytes()
        arr = np.frombuffer(le32, dtype=np.uint8).reshape(-1, 4)
        return arr[:, :3].tobytes()
    return flat.astype("<i4").tobytes()


def flac_rms_energy(payload: bytes) -> float | None:
    """RMS of the decoded PCM normalized to [0, 1] — the FLAC twin of
    ``codecs.wav_rms_energy``; None when decode fails."""
    import numpy as np

    dec = flac_decode(payload)
    if dec is None:
        return None
    samples, _rate, bits = dec
    if samples.size == 0:
        return 0.0
    x = samples.astype(np.float64) / float(1 << (bits - 1))
    return float(np.sqrt(np.mean(x * x)))


# ---------------------------------------------------------------------------
# minimal encoder (conformance testing)
# ---------------------------------------------------------------------------


class _BitsW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        v &= (1 << n) - 1
        self.acc = (self.acc << n) | v
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _rice_param(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum(abs(r) for r in res) / len(res) + 1
    p = max(0, int(mean).bit_length() - 1)
    return min(p, 14)


def _write_residual(w: _BitsW, res: list[int], blocksize: int, order: int,
                    porder: int = 0) -> None:
    w.write(0, 2)  # method 0: 4-bit rice
    w.write(porder, 4)
    nparts = 1 << porder
    pos = 0
    for part in range(nparts):
        n = (blocksize >> porder) - (order if part == 0 else 0)
        chunk = res[pos : pos + n]
        pos += n
        param = _rice_param(chunk)
        w.write(param, 4)
        for r in chunk:
            zz = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
            q, rem = zz >> param, zz & ((1 << param) - 1)
            w.unary(q)
            if param:
                w.write(rem, param)


def _write_subframe(w: _BitsW, samples: list[int], bps: int, mode) -> None:
    """mode: 'constant'|'verbatim'|('fixed', order)|('lpc', qlp, shift, prec)."""
    blocksize = len(samples)
    if mode == "constant":
        w.write(0, 1); w.write(0, 6); w.write(0, 1)
        w.write(samples[0], bps)
        return
    if mode == "verbatim":
        w.write(0, 1); w.write(1, 6); w.write(0, 1)
        for s in samples:
            w.write(s, bps)
        return
    if mode[0] == "fixed":
        order = mode[1]
        w.write(0, 1); w.write(8 | order, 6); w.write(0, 1)
        for s in samples[:order]:
            w.write(s, bps)
        coef = _FIXED_COEF[order]
        res = []
        for k in range(order, blocksize):
            pred = sum(c * samples[k - 1 - j] for j, c in enumerate(coef))
            res.append(samples[k] - pred)
        _write_residual(w, res, blocksize, order, porder=1 if blocksize % 2 == 0 and blocksize >= 2 * max(order, 1) else 0)
        return
    # lpc
    _tag, qlp, shift, prec = mode
    order = len(qlp)
    w.write(0, 1); w.write(32 | (order - 1), 6); w.write(0, 1)
    for s in samples[:order]:
        w.write(s, bps)
    w.write(prec - 1, 4)
    w.write(shift, 5)
    for c in qlp:
        w.write(c, prec)
    res = []
    for k in range(order, blocksize):
        acc = sum(c * samples[k - 1 - j] for j, c in enumerate(qlp))
        res.append(samples[k] - (acc >> shift))
    _write_residual(w, res, blocksize, order)


def flac_encode(samples, rate: int = 44100, bits: int = 16,
                block_size: int = 256, mode=("fixed", 2),
                mid_side: bool = False) -> bytes:
    """Encode (n, channels) int samples as a FLAC stream (fixed
    blocking). ``mode`` selects the subframe type for every frame;
    CONSTANT/VERBATIM are substituted automatically where required
    (constant blocks, blocks shorter than the predictor order).
    ``mid_side`` uses the mid/side channel assignment (stereo only)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    assert 1 <= nch <= 8 and 4 <= bits <= 32
    md5 = hashlib.md5(_pcm_bytes(x, bits)).digest()

    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (rate << 44) | ((nch - 1) << 41) | ((bits - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += md5
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)

    for fi, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size]
        bs = blk.shape[0]
        hdr = bytearray([0xFF, 0xF8])  # fixed blocking
        ch_code = 10 if (mid_side and nch == 2) else nch - 1
        sz_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits]
        hdr.append((7 << 4) | 0)  # 16-bit block size follows; rate from STREAMINFO
        hdr.append((ch_code << 4) | (sz_code << 1))
        # coded frame number (UTF-8 style)
        if fi < 0x80:
            hdr.append(fi)
        else:
            hdr.append(0xC0 | (fi >> 6))
            hdr.append(0x80 | (fi & 0x3F))
        hdr += struct.pack(">H", bs - 1)
        hdr.append(_crc8(bytes(hdr)))

        w = _BitsW()
        if mid_side and nch == 2:
            l, r = blk[:, 0], blk[:, 1]
            chans = [((l + r) >> 1).tolist(), (l - r).tolist()]
            bpss = [bits, bits + 1]
        else:
            chans = [blk[:, c].tolist() for c in range(nch)]
            bpss = [bits] * nch
        for cs, cbps in zip(chans, bpss):
            m = mode
            if len(set(cs)) == 1:
                m = "constant"
            elif m not in ("constant", "verbatim") and len(cs) <= (m[1] if m[0] == "fixed" else len(m[1])):
                m = "verbatim"
            _write_subframe(w, cs, cbps, m)
        w.align()
        frame = bytes(hdr) + bytes(w.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)
