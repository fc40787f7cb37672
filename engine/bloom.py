"""Per-chunk Bloom filters for point lookups over byte-array columns.

Parquet attaches split-block Bloom filters to column chunks so point
predicates skip row groups whose min/max cannot help (high-cardinality ids);
the reference carries only min/max Statistics (``src/file/statistics.rs:
246-440``). This module adds the same capability to our chunk frames: an
opt-in per-chunk bitmap over one column's values, consulted by
``lineage.lookup_docs`` so a point lookup decodes ONLY chunks whose filter
admits at least one requested key. At 10^12-row scale this turns "decode the
one candidate bucket per suffix" into "decode nothing at all" for absent
keys — the dominant case when probing an id against a corpus.

Layout: the bitmap is ``m`` bits (power of two, ~10 bits per distinct value,
1 KiB floor / 1 MiB cap), ``K`` = 7 double-hashed probes. Hashing is a pair
of polynomial hashes over the value bytes computed VECTORIZED over the whole
flat (lengths, data) stream — uint64 wraparound cumsum, no per-value Python
— with a scalar twin for driver-side key probes.
"""

from __future__ import annotations

import numpy as np

K = 7  # probes per key
BITS_PER_VALUE = 10  # sizing target (~1% FPR at K=7)
MIN_BITS = 1 << 13  # 1 KiB
MAX_BITS = 1 << 23  # 1 MiB

_M1 = np.uint64(1099511628211)  # FNV-1a prime (odd)
# second multiplier MUST be odd: an even multiplier's powers vanish
# mod 2^64, so h2 would ignore bytes past position ~62 and degenerate
# the double hashing toward h1-only probes
_M2 = np.uint64(0xC6A4A7935BD1E995)  # murmur64 multiplier (odd)
_SALT2 = np.uint64(0x9E3779B97F4A7C15)


def _sized_bits(n_values: int) -> int:
    m = MIN_BITS
    while m < n_values * BITS_PER_VALUE and m < MAX_BITS:
        m <<= 1
    return m


# raw value bytes processed per vectorized segment: the hash math holds
# ~5 uint64 temporaries of the segment's byte count (byte upcast, within,
# weights, products, cumsum), so 32 MiB segments bound peak transient
# memory near 1.3 GiB even for a 2^31-byte chunk column (ADVICE r3: the
# unsegmented version needed ~8x the whole payload). Tests shrink this to
# force multi-segment runs.
_SEG_BYTES = 1 << 25


def _poly_hashes_flat(lengths: np.ndarray, data: bytes, mult: np.uint64) -> np.ndarray:
    """Polynomial hash per value over the flat byte stream: h = sum of
    byte[j] * mult^(j+1), all uint64 wraparound, one cumsum per segment —
    zero per-value Python. Each value's hash depends only on its own bytes
    (the exponent restarts per value), so the stream splits cleanly at
    value boundaries into ``_SEG_BYTES``-bounded segments; an oversized
    single value gets a segment of its own. Empty values hash to 0 (then
    salted by length downstream)."""
    lens = np.asarray(lengths, dtype=np.int64)
    n = len(lens)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    out = np.empty(n, np.uint64)
    start = 0
    while start < n:
        end = (
            int(np.searchsorted(offsets, offsets[start] + _SEG_BYTES, side="right"))
            - 1
        )
        if end <= start:
            end = start + 1
        seg_lens = lens[start:end]
        lo, hi = int(offsets[start]), int(offsets[end])
        b = np.frombuffer(data, np.uint8, count=hi - lo, offset=lo).astype(np.uint64)
        offs = (offsets[start : end + 1] - lo).astype(np.int64)
        if b.size:
            within = (
                np.arange(b.size, dtype=np.int64) - np.repeat(offs[:-1], seg_lens)
            ).astype(np.uint64)
            with np.errstate(over="ignore"):
                weights = np.power(mult, within + np.uint64(1))
                c = np.concatenate(
                    (np.zeros(1, np.uint64), np.cumsum(b * weights, dtype=np.uint64))
                )
            out[start:end] = c[offs[1:]] - c[offs[:-1]]
        else:
            out[start:end] = 0
        start = end
    with np.errstate(over="ignore"):
        return out * mult + lens.astype(np.uint64)


def _poly_hash_one(value: bytes, mult: int) -> int:
    """Scalar twin of :func:`_poly_hashes_flat` for driver-side probes."""
    mask = (1 << 64) - 1
    h = 0
    w = mult & mask
    for byte in value:
        h = (h + byte * w) & mask
        w = (w * mult) & mask
    return (h * mult + len(value)) & mask


def build(lengths: np.ndarray, data: bytes) -> bytes:
    """Bloom bitmap over the (dense) values of one chunk column."""
    n = len(lengths)
    m = _sized_bits(max(n, 1))
    bits = np.zeros(m >> 3, dtype=np.uint8)
    h1 = _poly_hashes_flat(lengths, data, _M1)
    h2 = _poly_hashes_flat(lengths, data, _M2) ^ _SALT2
    mmask = np.uint64(m - 1)
    for i in range(K):
        with np.errstate(over="ignore"):
            idx = (h1 + np.uint64(i) * h2) & mmask
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)))
    return bits.tobytes()


def key_hashes(value) -> tuple[int, int]:
    """(h1, h2) for one lookup key (str or bytes)."""
    raw = value.encode() if isinstance(value, str) else bytes(value)
    h1 = _poly_hash_one(raw, int(_M1))
    h2 = _poly_hash_one(raw, int(_M2)) ^ int(_SALT2)
    return h1, h2


def might_contain(bitmap: bytes, h1: int, h2: int) -> bool:
    """Test one pre-hashed key against a bitmap (any size from build())."""
    m = len(bitmap) << 3
    mask = (1 << 64) - 1
    for i in range(K):
        idx = ((h1 + i * h2) & mask) & (m - 1)
        if not (bitmap[idx >> 3] >> (idx & 7)) & 1:
            return False
    return True
