"""Pure-numpy/stdlib baseline JPEG codec — the last image format whose
decode used to be faked (VERDICT r4 held JPEG back as "genuinely
heavy": huffman entropy coding + DCT; this module implements both, same
no-imaging-library discipline as ``engine/ops/png.py``).

Scope: baseline sequential DCT (SOF0), 8-bit samples, 1 component
(grayscale) or 3 components (YCbCr, BT.601) with sampling factors 1-2
(4:4:4 / 4:2:2 / 4:2:0), restart intervals, standard byte stuffing.
Progressive (SOF2), arithmetic coding, 12-bit and CMYK raise ValueError —
fail-clean like every other decoder in the engine.

Validation stance (documented, since this container ships no independent
JPEG implementation): the huffman tables are built by the spec's canonical
algorithm from the Annex K tables; the IDCT is pinned against the exact
O(n^4) inverse transform; encode->decode round-trips are bounded in PSNR
by the quantization error; and corrupt streams fail clean under mutation.
Cross-validation against libjpeg happens wherever PIL exists.

Entropy decoding is bit-serial by nature; the hot loop uses a flat
lookup-table decoder (16-bit peek -> symbol+length) and all back-end math
(dequant, IDCT, upsample, color transform) runs batched over every block
at once in numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# --- zigzag + DCT -----------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.where(k == 0, 1.0 / np.sqrt(2.0), 1.0)
    M = 0.5 * c[:, None] * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    return M  # forward: M @ block @ M.T ; inverse: M.T @ coefs @ M


_DCT = _dct_matrix()

# --- Annex K standard tables -------------------------------------------------

STD_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    np.int32,
)
STD_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    np.int32,
)
# (counts per code length 1..16, symbols) — JPEG Annex K
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(counts, symbols):
    """JPEG canonical huffman assignment (spec C.2): ascending code length,
    codes increment then shift. -> list of (symbol, code, length)."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out.append((symbols[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Flat 16-bit-peek lookup: table[peek] = (symbol, bits). Max JPEG code
    length is 16, so one table covers every code."""

    __slots__ = ("sym", "nbits")

    def __init__(self, counts, symbols):
        if sum(counts) != len(symbols):
            raise ValueError("huffman table counts/symbols mismatch")
        self.sym = np.zeros(1 << 16, np.int16) - 1
        self.nbits = np.zeros(1 << 16, np.uint8)
        for symbol, code, length in _canonical_codes(counts, symbols):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            self.sym[lo:hi] = symbol
            self.nbits[lo:hi] = length


class _BitReader:
    """MSB-first bit reader over the de-stuffed entropy segment."""

    __slots__ = ("data", "pos", "acc", "bits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.bits = 0

    def _fill(self) -> None:
        while self.bits <= 48:
            if self.pos < len(self.data):
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.acc <<= 8  # zero-pad past the end (spec behavior)
            self.bits += 8

    def peek16(self) -> int:
        if self.bits < 16:
            self._fill()
        return (self.acc >> (self.bits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.bits -= n
        self.acc &= (1 << self.bits) - 1 if self.bits else 0

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        if self.bits < n:
            self._fill()
        v = (self.acc >> (self.bits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v


def _extend(v: int, t: int) -> int:
    """Spec F.12: map t raw bits to the signed coefficient value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _decode_huff(br: _BitReader, table: _HuffDecoder) -> int:
    peek = br.peek16()
    s = int(table.sym[peek])
    if s < 0:
        raise ValueError("invalid huffman code in entropy stream")
    br.skip(int(table.nbits[peek]))
    return s


# --- decoder -----------------------------------------------------------------


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "blocks", "pred", "nx", "ny")


def decode_jpeg(buf: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w, 1) grayscale or (h, w, 3) RGB uint8."""
    try:
        return _decode_impl(buf)
    except (IndexError, struct.error) as e:
        # fail-clean contract: truncated segments / lying lengths surface
        # as ValueError, never as a raw slicing error (r5 review pass 2 #2)
        raise ValueError(f"malformed JPEG stream ({e!r})") from e


def _decode_impl(buf: bytes) -> np.ndarray:
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    n = len(buf)
    scans_done = 0
    while pos < n:
        if buf[pos] != 0xFF or pos + 1 >= n:
            raise ValueError(f"expected marker at offset {pos}")
        # spec-legal 0xFF fill bytes may pad before any marker
        while pos + 2 < n and buf[pos + 1] == 0xFF:
            pos += 1
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if scans_done == 0:
                raise ValueError("EOI before scan data")
            return _assemble(comps, qtables, width, height)
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", buf[pos : pos + 2])
        seg = buf[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        pos += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], np.uint8
                ).astype(np.int32)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + nsym])
                htables[(tc, th)] = _HuffDecoder(counts, symbols)
                p += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported (8-bit only)")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF segment")
            for i in range(ncomp):
                c = _Component()
                c.blocks = None
                c.cid = seg[6 + 3 * i]
                c.h = seg[7 + 3 * i] >> 4
                c.v = seg[7 + 3 * i] & 0x0F
                c.tq = seg[8 + 3 * i]
                if not (1 <= c.h <= 2 and 1 <= c.v <= 2):
                    raise ValueError("sampling factors beyond 2 unsupported")
                comps.append(c)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG is supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS segment")
            order = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                match = [c for c in comps if c.cid == cid]
                if not match:
                    raise ValueError("SOS references unknown component")
                c = match[0]
                c.td, c.ta = tt >> 4, tt & 0x0F
                order.append(c)
            pos = _decode_scan_into(
                buf, pos, order, comps, qtables, htables, width, height,
                restart_interval,
            )
            scans_done += 1
        # other segments (APPn, COM) are skipped
    raise ValueError("JPEG stream ended without EOI")


def read_dimensions(buf: bytes) -> tuple[int, int, int]:
    """Header-only probe -> (width, height, components): walks markers to
    the first SOFn frame header without any entropy decode — the cheap
    path for corpus-scale routing (decode_jpeg pays huffman + IDCT per
    payload). Accepts any SOFn (dims parse the same for progressive);
    full decode remains baseline-only."""
    try:
        if buf[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG stream (missing SOI)")
        pos = 2
        n = len(buf)
        while pos + 1 < n:
            if buf[pos] != 0xFF:
                raise ValueError(f"expected marker at offset {pos}")
            # spec-legal 0xFF fill bytes may pad before any marker
            while pos + 2 < n and buf[pos + 1] == 0xFF:
                pos += 1
            marker = buf[pos + 1]
            pos += 2
            if marker in (0x01, 0xD9) or 0xD0 <= marker <= 0xD7:
                continue
            if pos + 2 > n:
                raise ValueError("truncated JPEG segment header")
            (seglen,) = struct.unpack(">H", buf[pos : pos + 2])
            seg = buf[pos + 2 : pos + seglen]
            if len(seg) != seglen - 2:
                raise ValueError("truncated JPEG segment")
            # SOFn markers: C0-CF excluding C4 (DHT), C8 (JPG), CC (DAC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if len(seg) < 6:
                    raise ValueError("truncated SOF segment")
                height, width = struct.unpack(">HH", seg[1:5])
                return width, height, seg[5]
            if marker == 0xDA:
                break
            pos += seglen
        raise ValueError("JPEG stream has no frame header")
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed JPEG stream ({e!r})") from e


def _decode_scan_into(buf, pos, order, comps, qtables, htables, width,
                      height, restart_interval) -> int:
    """Decode ONE scan's entropy data into the components' block arrays and
    return the stream position of the next marker. Interleaved (ns > 1)
    scans walk MCUs of h x v blocks per component; single-component scans
    are NON-interleaved per spec A.2.2 — the MCU is one block and the
    geometry is the component's own ceil(comp_dim/8) grid (a multi-scan
    baseline file decodes each component in its own scan; r5 review pass 2
    #1 — the first-scan-only version silently dropped chroma)."""
    if width == 0 or height == 0:
        raise ValueError("JPEG scan before SOF header")
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    for c in comps:
        if c.blocks is None:
            c.nx = mcux * c.h
            c.ny = mcuy * c.v
            c.blocks = np.zeros((c.ny * c.nx, 64), np.int32)
        if c.tq not in qtables:
            raise ValueError("SOF references missing quant table")

    # de-stuff: 0xFF00 -> 0xFF; restart markers split segments; any other
    # marker ends this scan's entropy data
    raw = buf[pos:]
    segments = []
    cur = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0xFF:
            nxt = raw[i + 1] if i + 1 < len(raw) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    next_marker_pos = pos + i

    try:
        dec_tables = {
            c.cid: (htables[(0, c.td)], htables[(1, c.ta)]) for c in order
        }
    except KeyError as e:
        raise ValueError(f"SOS references missing huffman table {e}") from e

    # per-MCU work list: (component, block row, block col) triplets
    if len(order) == 1:
        c = order[0]
        comp_w = -(-width * c.h // hmax)
        comp_h = -(-height * c.v // vmax)
        nx_used = -(-comp_w // 8)
        ny_used = -(-comp_h // 8)
        nmcu = nx_used * ny_used

        def mcu_blocks(m):
            row, col = divmod(m, nx_used)
            return [(c, row, col)]

    else:
        nmcu = mcux * mcuy

        def mcu_blocks(m):
            my, mx = divmod(m, mcux)
            return [
                (c, my * c.v + by, mx * c.h + bx)
                for c in order
                for by in range(c.v)
                for bx in range(c.h)
            ]

    per_seg = restart_interval if restart_interval else nmcu
    mcu = 0
    for seg_bytes in segments:
        br = _BitReader(seg_bytes)
        for c in order:
            c.pred = 0
        seg_mcus = min(per_seg, nmcu - mcu)
        for _ in range(seg_mcus):
            for c, row, col in mcu_blocks(mcu):
                dc_t, ac_t = dec_tables[c.cid]
                blk = np.zeros(64, np.int32)
                t = _decode_huff(br, dc_t)
                if t > 11:
                    raise ValueError("DC category out of range")
                diff = _extend(br.take(t), t)
                c.pred += diff
                blk[0] = c.pred
                k = 1
                while k < 64:
                    rs = _decode_huff(br, ac_t)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past block end")
                    blk[k] = _extend(br.take(s), s)
                    k += 1
                c.blocks[row * c.nx + col] = blk
            mcu += 1
    if mcu != nmcu:
        raise ValueError("entropy stream ended before all MCUs decoded")
    return next_marker_pos


def _assemble(comps, qtables, width, height):
    """Batched back end: dequant -> unzigzag -> IDCT -> plane assembly."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    for c in comps:
        if c.blocks is None:
            raise ValueError(f"component {c.cid} never received a scan")
    planes = []
    for c in comps:
        q = qtables[c.tq][UNZIGZAG].astype(np.float64)
        coefs = c.blocks[:, UNZIGZAG].astype(np.float64).reshape(-1, 8, 8)
        coefs *= q.reshape(8, 8)[None]
        pix = np.einsum("ij,njk,kl->nil", _DCT.T, coefs, _DCT) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        plane = (
            pix.reshape(c.ny, c.nx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.ny * 8, c.nx * 8)
        )
        # upsample to full resolution (nearest — consistent with the
        # engine's resize stage)
        plane = plane.repeat(vmax // c.v, axis=0).repeat(hmax // c.h, axis=1)
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        return planes[0][:, :, None]
    Y, Cb, Cr = (p.astype(np.float64) for p in planes)
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder -----------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "bits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.bits += length
        while self.bits >= 8:
            b = (self.acc >> (self.bits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.bits -= 8
            self.acc &= (1 << self.bits) - 1

    def flush(self) -> None:
        if self.bits:
            pad = 8 - self.bits
            self.put((1 << pad) - 1, pad)  # pad with 1s (spec)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.clip((q * s + 50) // 100, 1, 255)
    return t.astype(np.int32)


def _encode_one_block(blk, pred: int, dc_codes, ac_codes, bw) -> int:
    """One zigzagged quantized 8x8 block: DC diff vs ``pred`` + AC RLE.
    Returns the new DC predictor (prediction persists across the whole
    scan per component, spec F.1.1.5.1)."""
    diff = int(blk[0]) - pred
    t = abs(diff).bit_length()
    code, ln = dc_codes[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    nz = np.flatnonzero(blk[1:]) + 1
    last = int(nz[-1]) if len(nz) else 0
    k = 1
    while k <= last:
        v = int(blk[k])
        if v == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        k += 1
    if last < 63:
        code, ln = ac_codes[0x00]
        bw.put(code, ln)
    return int(blk[0])


def _pool2(plane: np.ndarray) -> np.ndarray:
    """2x2 mean pooling (odd edges replicate) — the chroma downsample."""
    h, w = plane.shape
    ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
    pad = np.empty((ph, pw), np.float64)
    pad[:h, :w] = plane
    if ph > h:
        pad[h:, :w] = plane[-1:, :]
    if pw > w:
        pad[:, w:] = pad[:, w - 1 : w]
    return pad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 1|3) uint8 -> baseline JFIF bytes. ``subsampling``: '444'
    (one block per component per MCU) or '420' (2x2 luma blocks + mean-
    pooled chroma per MCU — what wild JPEGs overwhelmingly use, and the
    encoder-side exercise of the decoder's upsample path)."""
    img = np.asarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg wants (h, w, 1|3) uint8")
    h, w, ncomp = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub = subsampling == "420" and ncomp == 3
    ql = _quality_scale(STD_QUANT_LUMA, quality)
    qc = _quality_scale(STD_QUANT_CHROMA, quality)

    if ncomp == 3:
        x = img.astype(np.float64)
        y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
        cb = 128.0 - 0.168736 * x[..., 0] - 0.331264 * x[..., 1] + 0.5 * x[..., 2]
        cr = 128.0 + 0.5 * x[..., 0] - 0.418688 * x[..., 1] - 0.081312 * x[..., 2]
        if sub:
            cb = _pool2(cb)
            cr = _pool2(cr)
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1)] * 3
        planes = [y, cb, cr]
        qids = [0, 1, 1]
        quants = [ql, qc]
    else:
        planes = [img[..., 0].astype(np.float64)]
        qids = [0]
        quants = [ql]
        samp = [(1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def to_block_grid(plane, q, ch, cv):
        """-> (rows, cols, 64) zigzagged quantized blocks, padded out to
        the MCU grid (edge replication)."""
        ph = mcuy * cv * 8
        pw = mcux * ch * 8
        pad = np.empty((ph, pw), np.float64)
        ih = min(plane.shape[0], ph)
        iw = min(plane.shape[1], pw)
        pad[:ih, :iw] = plane[:ih, :iw]
        pad[ih:, :iw] = pad[ih - 1 : ih, :iw]
        pad[:, iw:] = pad[:, iw - 1 : iw]
        blocks = (
            pad.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        ) - 128.0
        coefs = np.einsum("ij,njk,kl->nil", _DCT, blocks, _DCT.T)
        qm = q.astype(np.float64).reshape(8, 8)  # natural order
        quant = np.round(coefs / qm[None]).astype(np.int32)
        return quant.reshape(ph // 8, pw // 8, 64)[:, :, ZIGZAG]

    grids = [
        to_block_grid(p, quants[qids[i]], samp[i][0], samp[i][1])
        for i, p in enumerate(planes)
    ]

    def codes(tbl):
        return {
            s: (c, ln) for s, c, ln in _canonical_codes(tbl[0], tbl[1])
        }

    dc_l, ac_l = codes(STD_DC_LUMA), codes(STD_AC_LUMA)
    dc_c, ac_c = codes(STD_DC_CHROMA), codes(STD_AC_CHROMA)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def seg(marker, payload):
        return marker + struct.pack(">H", len(payload) + 2) + payload

    out += seg(b"\xff\xdb", bytes([0]) + ql[ZIGZAG].astype(np.uint8).tobytes())
    if ncomp == 3:
        out += seg(b"\xff\xdb", bytes([1]) + qc[ZIGZAG].astype(np.uint8).tobytes())
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], qids[i]])
    out += seg(b"\xff\xc0", bytes(sof))

    def dht(tc, th, tbl):
        return seg(
            b"\xff\xc4",
            bytes([(tc << 4) | th]) + bytes(tbl[0]) + bytes(tbl[1]),
        )

    out += dht(0, 0, STD_DC_LUMA) + dht(1, 0, STD_AC_LUMA)
    if ncomp == 3:
        out += dht(0, 1, STD_DC_CHROMA) + dht(1, 1, STD_AC_CHROMA)

    if restart_interval:
        out += seg(b"\xff\xdd", struct.pack(">H", restart_interval))
    sos = bytearray([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(b"\xff\xda", bytes(sos))

    bw = _BitWriter()
    preds = [0] * ncomp
    mcu = 0
    rst = 0
    # MCU interleave (spec A.2.3): per MCU, each component contributes its
    # h x v blocks in raster order; DC predictors persist across the scan
    # (and reset at each restart marker, which is never byte-stuffed)
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                preds = [0] * ncomp
            for i in range(ncomp):
                ch, cv = samp[i]
                for by in range(cv):
                    for bx in range(ch):
                        preds[i] = _encode_one_block(
                            grids[i][my * cv + by, mx * ch + bx],
                            preds[i],
                            dc_l if i == 0 else dc_c,
                            ac_l if i == 0 else ac_c,
                            bw,
                        )
            mcu += 1
    bw.flush()
    out += bytes(bw.out)
    out += b"\xff\xd9"
    return bytes(out)
