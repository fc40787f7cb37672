"""FLAC encode/decode in pure numpy/Python — the REAL compressed-audio
payload decode for the media pipeline (VERDICT r6 #4, adapted).

Why FLAC and not MP3: the r6 verdict suggested MPEG-1 Layer III "the same
way baseline JPEG was" — but the JPEG analogy breaks on one structural
fact: a JPEG file carries its own entropy and quantization tables in-band
(DHT/DQT segments), so a from-scratch decoder needs no spec constants
beyond the 8x8 zigzag; MPEG-1 Layer III instead FIXES its 34 Huffman
codebooks and the 512-tap synthesis window in ISO 11172-3 Annex B —
roughly two thousand opaque constants that cannot be derived, only
transcribed. With no codec library or spec text in this environment to
transcribe from, a hand-recalled table set would produce a decoder that
round-trips its own encoder while silently violating the standard — worse
than the declared stub (``multimodal.PAYLOAD_DECODE_STUBBED``). FLAC is
the honest equivalent with EVERYTHING derivable: Rice/unary entropy
coding is algorithmic, the FIXED predictors are binomial-coefficient
differencers, LPC coefficients travel in the stream, and the only
"tables" are two CRC polynomials (CRC-8/0x07, CRC-16/0x8005) and MD5 —
all first-principles. Real training corpora carry FLAC audio verbatim,
so the capability is equally load-bearing at 100 TB.

Encoder subset (valid, verifiable bitstreams): fixed 4096-sample blocks,
independent channels, CONSTANT / VERBATIM / FIXED(0-4) subframes chosen
by exact cost, single-partition Rice residuals (4- or 5-bit parameter,
escape to raw), real streaminfo MD5. Decoder superset: all of the above
plus LPC subframes of any order, all four channel assignments
(independent, left/side, right/side, mid/side with the (mid<<1)|(side&1)
reconstruction), wasted bits, multi-partition residuals, Rice escapes,
and CRC-8 / CRC-16 / MD5 verification — enough to read typical
fixed-blocksize foreign files, not just our own.

No external FLAC implementation exists in this container, so compliance
evidence is: (a) byte-level grammar checks in tests (magic, header
fields, CRCs recomputed independently), (b) encoder/decoder developed as
separate code paths against the public format layout, (c) MD5 of the
decoded stream matching the streaminfo value computed at encode time.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

MAGIC = b"fLaC"
_BLOCK = 4096

# binomial-coefficient FIXED predictors (order -> coefficients applied to
# x[i-1..i-order]); residual = x - prediction. Derivable: order-k fixed
# prediction is the k-th finite difference.
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(buf: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x^1 + 1 (0x07), init 0 — the FLAC
    frame-header CRC."""
    crc = 0
    for b in buf:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(buf: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 — the
    FLAC whole-frame CRC."""
    crc = 0
    for b in buf:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.pos = pos_bits

    def read(self, bits: int) -> int:
        out = 0
        pos = self.pos
        buf = self.buf
        end = pos + bits
        if end > len(buf) * 8:
            raise ValueError("flac: bitstream truncated")
        while bits:
            byte = buf[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, bits)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            bits -= take
        self.pos = pos
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("flac: runaway unary code")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _utf8_number(w: _BitWriter, v: int) -> None:
    """FLAC's UTF-8-style frame-number coding (same shape as UTF-8, up
    to 36 bits)."""
    if v < 0x80:
        w.write(v, 8)
        return
    # count continuation bytes needed: n of them carry 6 bits each, the
    # lead byte carries 6-n more
    n = 1
    while v >= (1 << (6 * n + (6 - n))):
        n += 1
    w.write(((0xFF00 >> (n + 1)) & 0xFF) | (v >> (6 * n)), 8)
    for i in range(n - 1, -1, -1):
        w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def _utf8_number_read(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0:
        raise ValueError("flac: bad UTF-8 frame number lead byte")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("flac: bad UTF-8 continuation byte")
        v = (v << 6) | (c & 0x3F)
    return v


# --- residual (partitioned Rice) ----------------------------------------------


def _zigzag(res: np.ndarray) -> np.ndarray:
    return (res << 1) ^ (res >> 63)


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int((u >> k).sum()) + len(u) * (k + 1)


def _best_rice_k(u: np.ndarray) -> int:
    if len(u) == 0:
        return 0
    best_k, best_c = 0, _rice_cost(u, 0)
    for k in range(1, 31):
        c = _rice_cost(u, k)
        if c < best_c:
            best_k, best_c = k, c
        elif c > best_c * 2:
            break
    return best_k


def _write_residual(w: _BitWriter, res: np.ndarray) -> None:
    """Single-partition Rice residual (partition order 0): method 0
    (4-bit parameter) when k fits, else method 1 (5-bit), escape to raw
    when Rice loses to fixed-width."""
    u = _zigzag(res.astype(np.int64))
    k = _best_rice_k(u)
    raw_bits = int(np.abs(res).max()).bit_length() + 1 if len(res) else 1
    if _rice_cost(u, k) > len(u) * raw_bits + 5:
        # escape: raw residuals at a fixed width
        method, esc = (0, 15) if raw_bits <= 31 else (1, 31)
        w.write(method, 2)
        w.write(0, 4)  # partition order 0
        w.write(esc, 4 if method == 0 else 5)
        w.write(raw_bits, 5)
        for v in res.tolist():
            w.write_signed(int(v), raw_bits)
        return
    method = 0 if k <= 14 else 1
    w.write(method, 2)
    w.write(0, 4)
    w.write(k, 4 if method == 0 else 5)
    for uv in u.tolist():
        uv = int(uv)
        w.write_unary(uv >> k)
        w.write(uv & ((1 << k) - 1), k)


def _read_residual(r: _BitReader, block: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if block % nparts:
        raise ValueError("flac: partition count does not divide blocksize")
    if (block >> porder) <= order:
        # the first partition holds (block >> porder) - order samples; a
        # malformed header where that is <= 0 would regress `pos` and leave
        # np.empty slots unwritten — fail like the other grammar checks
        raise ValueError(
            "flac: partition order leaves no samples in the first partition"
        )
    out = np.empty(block - order, np.int64)
    pos = 0
    for p in range(nparts):
        n = block >> porder
        if p == 0:
            n -= order
        k = r.read(pbits)
        if k == escape:
            width = r.read(5)
            for i in range(n):
                out[pos + i] = r.read_signed(width) if width else 0
        else:
            for i in range(n):
                q = r.read_unary()
                u = (q << k) | (r.read(k) if k else 0)
                out[pos + i] = (u >> 1) ^ -(u & 1)
        pos += n
    return out


# --- subframes -----------------------------------------------------------------


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    w.write(0, 1)  # mandatory zero pad bit
    if len(x) and (x == x[0]).all():
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write_signed(int(x[0]), bps)
        return
    # pick the FIXED order with the cheapest exact cost, fall back to
    # VERBATIM when prediction cannot beat raw
    best = None
    for order in range(0, 5):
        if len(x) <= order:
            break
        res = _fixed_residual(x, order)
        u = _zigzag(res)
        cost = order * bps + _rice_cost(u, _best_rice_k(u))
        if best is None or cost < best[1]:
            best = (order, cost, res)
    if best is None or best[1] >= len(x) * bps:
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for v in x.tolist():
            w.write_signed(int(v), bps)
        return
    order, _, res = best
    w.write(8 | order, 6)  # FIXED, 0b001000 + order
    w.write(0, 1)
    for v in x[:order].tolist():  # warmup
        w.write_signed(int(v), bps)
    _write_residual(w, res)


def _read_subframe(r: _BitReader, block: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("flac: subframe pad bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(block, r.read_signed(bps), np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([r.read_signed(bps) for _ in range(block)], np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [r.read_signed(bps) for i in range(order)]
        res = _read_residual(r, block, order)
        out = np.empty(block, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, block):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] = pred + res[i - order]
    elif stype >= 32:  # LPC, order = stype - 31
        order = stype - 31
        warm = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid LPC precision escape")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        res = _read_residual(r, block, order)
        out = np.empty(block, np.int64)
        out[:order] = warm
        for i in range(order, block):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * out[i - 1 - j]
            out[i] = (acc >> shift) + res[i - order]
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    if wasted:
        out = out << wasted
    return out


# --- stream-level encode/decode -------------------------------------------------


def _md5_samples(samples: np.ndarray, bps: int) -> bytes:
    """FLAC streaminfo MD5: the interleaved little-endian signed sample
    stream at the declared bit depth."""
    nbytes = (bps + 7) // 8
    dt = {1: "<i1", 2: "<i2", 3: None, 4: "<i4"}[nbytes]
    if dt is None:
        arr = samples.astype("<i4")
        b = arr.tobytes()
        b = b"".join(
            b[i : i + 3] for i in range(0, len(b), 4)
        )  # 24-bit: drop the high byte of each LE int32
        return hashlib.md5(b).digest()
    return hashlib.md5(samples.astype(dt).tobytes()).digest()


def encode_flac(samples: np.ndarray, sample_rate: int, bps: int = 16,
                block_size: int = _BLOCK) -> bytes:
    """Encode ``samples`` (shape (n,) or (n, channels), ints within the
    bps range) into a valid FLAC stream: streaminfo with real MD5, fixed
    blocksize, independent channels, CONSTANT/VERBATIM/FIXED subframes."""
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if not 1 <= ch <= 8:
        raise ValueError(f"flac: {ch} channels out of range")
    lim = 1 << (bps - 1)
    if n and (x.max() >= lim or x.min() < -lim):
        raise ValueError(f"flac: samples exceed {bps}-bit range")
    out = bytearray(MAGIC)
    # streaminfo metadata block (last-block flag set, type 0, 34 bytes)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + _md5_samples(x, bps)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    for f, start in enumerate(range(0, max(n, 1), block_size)):
        blk = x[start : start + block_size]
        if len(blk) == 0:
            break
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed-blocksize stream
        w.write(0b0111, 4)  # blocksize-1 follows as 16 bits
        w.write(0b0000, 4)  # sample rate from streaminfo
        w.write(ch - 1, 4)  # independent channels
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        w.write(0, 1)  # reserved
        _utf8_number(w, f)
        w.write(len(blk) - 1, 16)
        # header CRC-8 covers the byte-aligned header written so far
        if w.nbits:
            raise AssertionError("flac: frame header not byte-aligned")
        w.write(_crc8(bytes(w.buf)), 8)
        for c in range(ch):
            _write_subframe(w, blk[:, c], bps)
        w.align()
        frame = w.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def decode_flac(buf: bytes):
    """Decode a FLAC stream -> (samples int64 (n, channels), sample_rate).
    Verifies the magic, frame-header CRC-8s, whole-frame CRC-16s and the
    streaminfo MD5 (when present); raises ValueError on any mismatch."""
    if buf[:4] != MAGIC:
        raise ValueError("flac: missing fLaC magic")
    pos = 4
    info = None
    # metadata blocks
    while True:
        if pos + 4 > len(buf):
            raise ValueError("flac: truncated metadata")
        head = buf[pos]
        btype = head & 0x7F
        blen = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + blen]
        if btype == 0:
            if blen != 34:
                raise ValueError("flac: streaminfo must be 34 bytes")
            r = _BitReader(body)
            r.read(16)
            r.read(16)
            r.read(24)
            r.read(24)
            rate = r.read(20)
            ch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5 = body[18:34]
            info = (rate, ch, bps, total, md5)
        pos += 4 + blen
        if head & 0x80:
            break
    if info is None:
        raise ValueError("flac: no streaminfo block")
    rate, ch, bps, total, md5 = info
    chans: list = []
    while pos < len(buf):
        frame_start = pos
        r = _BitReader(buf, pos * 8)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"flac: lost frame sync at byte {pos}")
        r.read(1)
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        _utf8_number_read(r)
        if bs_code == 0:
            raise ValueError("flac: reserved blocksize code")
        elif bs_code == 1:
            block = 192
        elif bs_code <= 5:
            block = 576 << (bs_code - 2)
        elif bs_code == 6:
            block = r.read(8) + 1
        elif bs_code == 7:
            block = r.read(16) + 1
        else:
            block = 256 << (bs_code - 8)
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample-rate code")
        fbps = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24}.get(ss_code)
        if fbps is None:
            raise ValueError(f"flac: reserved sample-size code {ss_code}")
        assert r.pos % 8 == 0
        hdr_end = r.pos // 8
        if _crc8(buf[frame_start:hdr_end]) != r.read(8):
            raise ValueError("flac: frame header CRC-8 mismatch")
        if ch_code < 8:
            nch = ch_code + 1
            subs = [
                _read_subframe(r, block, fbps) for _ in range(nch)
            ]
        elif ch_code in (8, 9, 10):
            nch = 2
            # the difference (side) channel carries one extra bit
            b0 = fbps + (1 if ch_code == 9 else 0)
            b1 = fbps + (1 if ch_code in (8, 10) else 0)
            c0 = _read_subframe(r, block, b0)
            c1 = _read_subframe(r, block, b1)
            if ch_code == 8:  # left/side
                subs = [c0, c0 - c1]
            elif ch_code == 9:  # right/side
                subs = [c1 + c0, c1]
            else:  # mid/side
                mid = (c0 << 1) | (c1 & 1)
                subs = [(mid + c1) >> 1, (mid - c1) >> 1]
        else:
            raise ValueError(f"flac: reserved channel assignment {ch_code}")
        if nch != ch:
            raise ValueError("flac: frame channel count != streaminfo")
        r.align()
        crc_end = r.pos // 8
        if _crc16(buf[frame_start:crc_end]) != r.read(16):
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = r.pos // 8
        chans.append(np.stack(subs, axis=1))
    out = (
        np.concatenate(chans, axis=0)
        if chans
        else np.empty((0, ch), np.int64)
    )
    if total and len(out) > total:
        out = out[:total]
    if md5 != b"\x00" * 16 and _md5_samples(out, bps) != md5:
        raise ValueError("flac: decoded stream MD5 mismatch")
    return out, rate
