"""Per-chunk codec auto-selector.

Generalizes the reference's adaptive encoding selection — dict-first with
fallback-on-overflow (``src/column/writer.rs:396-420``) and per-type default
encodings (``src/column/writer.rs:721-792``) — into an explicit argmin over
closed-form size estimates computed from vectorized chunk statistics
(cardinality, run structure, value range, delta widths), per the north rule.

The estimators mirror the O(1)/O(n-vectorized) contracts of the reference's
``estimated_data_encoded_size`` (``src/encodings/encoding.rs:47-49,379-383``)
but are computed exactly where cheap:

- PLAIN:   4 * n                       (``src/encodings/encoding.rs:128-134``)
- BITPACK: header + n * bits(max-min) / 8
- RLE:     exact-ish from the maximal-run decomposition with the reference's
           run thresholds (runs >= 8 -> RLE run, ``src/encodings/rle.rs:152-184``)
- DICT:    4 * cardinality + hybrid size of the codes (codes share the
           values' run structure, so the same run stats apply)
- DELTA:   exact per-miniblock widths from one vectorized diff/reshape

Per-column overrides take precedence over auto-selection, mirroring
``WriterProperties::encoding`` precedence (``src/file/properties.rs:154-160``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .codecs import bitpack

INT_CANDIDATES = ("plain", "dict", "delta", "bitpack", "rle")
BA_CANDIDATES = ("plain_ba", "dict_ba", "delta_length_ba", "fsst")


@dataclass
class ChunkStats:
    n: int
    cardinality: int
    vmin: int
    vmax: int
    n_long_run_values: int  # values covered by runs >= 8
    n_long_runs: int
    delta_bits_total: int  # sum over miniblocks of width * 32
    n_blocks: int
    elem_bits: int = 32  # physical element width (int32 vs int64 sizing)


SAMPLE_CAP = 1 << 16  # 64k values: keeps stats one cheap pass at any chunk size


def compute_stats(
    values: np.ndarray, sample_cap: int = SAMPLE_CAP, elem_bits: int = 32
) -> ChunkStats:
    """Chunk statistics from a leading sample, extrapolated to the chunk.

    min/max are exact (single cheap pass); run structure, cardinality and
    delta widths come from a ``sample_cap``-value prefix and scale linearly —
    the selector only needs size *estimates* (the reference's own
    ``estimated_data_encoded_size`` is a heuristic too), and sampling keeps
    selection O(sample) instead of a second full pass over every chunk.

    ``elem_bits`` is the column's physical width: delta wrap arithmetic and
    downstream size models (plain/dict bytes per value) depend on it.
    """
    full = np.ascontiguousarray(values, dtype=np.int64)
    n = full.size
    if n == 0:
        return ChunkStats(0, 0, 0, 0, 0, 0, 0, 0, elem_bits)
    vmin, vmax = int(full.min()), int(full.max())
    v = full[:sample_cap]
    m = v.size
    scale = n / m
    # run structure (sample)
    change = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [m])))
    long_mask = lengths >= 8
    # cardinality: Chao1 richness estimate from the sample's abundance
    # spectrum (card + f1^2 / 2*f2). A plain plateau assumption undershoots
    # badly on heavy-tailed (zipf) chunks and makes dict look cheaper than it
    # is; Chao1 tracks the unseen mass from singleton/doubleton counts.
    if m == n:
        cardinality = len(pd.unique(v))
    else:
        codes, uniques = pd.factorize(v, use_na_sentinel=False)
        counts = np.bincount(codes)
        card_sample = len(uniques)
        f1 = int((counts == 1).sum())
        f2 = int((counts == 2).sum())
        cardinality = min(n, int(card_sample + f1 * (f1 - 1) / (2.0 * (f2 + 1))))
    # delta miniblock widths (sample, vectorized)
    delta_bits = 0
    nblocks = (n - 1 + 127) // 128 if n > 1 else 0
    if m > 1:
        if elem_bits == 32:
            mask = np.uint64(0xFFFFFFFF)
            d = (v[1:].view(np.uint64) - v[:-1].view(np.uint64)) & mask
            half = np.uint64(1 << 31)
            ds = np.where(d >= half, d.astype(np.int64) - (1 << 32), d.astype(np.int64))
        else:
            # int64: deltas wrap mod 2^64 (matching delta_for's wrapping i64)
            ds = (v[1:].view(np.uint64) - v[:-1].view(np.uint64)).view(np.int64)
        nd = ds.size
        nb = (nd + 127) // 128
        padded = np.full(nb * 128, ds.max(), dtype=np.int64)
        padded[:nd] = ds
        blocks = padded.reshape(nb, 4, 32)
        bmins = blocks.min(axis=(1, 2), keepdims=True)
        # width via float log2 of the unsigned span (int64 spans can exceed
        # the signed range; precision loss of float is fine for an estimate)
        span = (
            blocks.max(axis=2).view(np.uint64) - bmins[:, :, 0].view(np.uint64)
        ).astype(np.float64)
        widths = np.minimum(np.ceil(np.log2(span + 1)), elem_bits).astype(int)
        delta_bits = int(widths.sum() * 32 * ((n - 1) / nd))
    return ChunkStats(
        n,
        cardinality,
        vmin,
        vmax,
        int(lengths[long_mask].sum() * scale),
        max(int(long_mask.sum() * scale), int(long_mask.any())),
        delta_bits,
        nblocks,
        elem_bits,
    )


def _hybrid_size(stats: ChunkStats, width: int) -> int:
    """RLE/bit-packed hybrid size estimate for a stream with the chunk's run
    structure at the given bit width."""
    vb = (width + 7) // 8
    rle_bytes = stats.n_long_runs * (2 + vb)  # varint header (~2) + value
    n_short = stats.n - stats.n_long_run_values
    groups = (n_short + 7) // 8
    bp_bytes = groups * width + ((groups + 62) // 63)  # packed + indicators
    return rle_bytes + bp_bytes


def estimate_sizes(stats: ChunkStats) -> dict[str, int]:
    """Estimated encoded bytes per candidate codec (excluding chunk header)."""
    n = stats.n
    if n == 0:
        return {c: 0 for c in INT_CANDIDATES}
    eb = stats.elem_bits // 8  # bytes per plain/dict-page value
    range_width = bitpack.num_required_bits(stats.vmax - stats.vmin)
    dict_width = bitpack.dict_bit_width(stats.cardinality)
    return {
        "plain": eb * n,
        "bitpack": 6 + (n * range_width + 7) // 8,
        "rle": 6 + _hybrid_size(stats, range_width),
        "dict": 4 + eb * stats.cardinality + 1 + _hybrid_size(stats, dict_width),
        "delta": 10 + stats.n_blocks * 9 + (stats.delta_bits_total + 7) // 8,
    }


def select_codec(
    values: np.ndarray,
    override: str | None = None,
    candidates: tuple[str, ...] = INT_CANDIDATES,
) -> tuple[str, ChunkStats, dict[str, int]]:
    """Pick the smallest-estimate codec for an integer chunk.

    ``override`` short-circuits selection (per-column user override,
    reference ``src/file/properties.rs:351-354``). Element width is inferred
    from the array dtype so int64 columns get 8-byte plain/dict cost models
    and 64-bit delta wrap.
    """
    arr = np.asarray(values)
    elem_bits = 64 if arr.dtype.itemsize == 8 else 32
    stats = compute_stats(arr, elem_bits=elem_bits)
    sizes = estimate_sizes(stats)
    if override is not None:
        return override, stats, sizes
    choice = min((c for c in candidates), key=lambda c: sizes[c])
    return choice, stats, sizes


def select_float_codec(values: np.ndarray, override: str | None = None) -> str:
    """Floats: dictionary when low-cardinality (sensor/price-like columns),
    else PLAIN (floats have no delta/bit-pack analog in the reference either)."""
    if override is not None:
        return override
    n = len(values)
    if n == 0:
        return "plain"
    sample = np.asarray(values[: min(n, 4096)])
    card = len(pd.unique(sample))
    return "dict" if card <= len(sample) // 4 else "plain"


def select_bool_codec(values: np.ndarray, override: str | None = None) -> str:
    """Booleans: RLE value encoding when run-structured, else bit-packed PLAIN
    (the reference's v2 default for BOOLEAN is RLE, src/column/writer.rs:731-792)."""
    if override is not None:
        return override
    v = np.asarray(values[: min(len(values), 8192)], dtype=bool)
    if v.size == 0:
        return "plain"
    runs = int((v[1:] != v[:-1]).sum()) + 1
    return "rle_bool" if runs < v.size // 16 else "plain"


def _mean_adjacent_prefix(vals: list[bytes], cap: int = 512) -> float:
    """Mean common-prefix length of adjacent values over a bounded sample —
    the sortedness signal that makes front coding (DELTA_BYTE_ARRAY,
    reference src/encodings/encoding.rs:866-952) pay off."""
    m = min(len(vals), cap)
    if m < 2:
        return 0.0
    tot = 0
    for i in range(m - 1):
        a, b = vals[i], vals[i + 1]
        k = 0
        lim = min(len(a), len(b))
        while k < lim and a[k] == b[k]:
            k += 1
        tot += k
    return tot / (m - 1)


def select_ba_codec(
    lengths: np.ndarray,
    data: bytes,
    override: str | None = None,
    candidates: tuple[str, ...] = BA_CANDIDATES + ("delta_ba",),
) -> str:
    """Codec choice for byte-array chunks: dictionary when repetitive,
    front coding (delta_ba) when adjacent values share long prefixes
    (sorted keys/URLs — prefixes longer than FSST's 8-byte symbols),
    FSST when symbol-compressible, else delta-length. ``candidates``
    restricts the argmin BEFORE it runs (the parquet interchange writer
    excludes fsst, which parquet cannot express — remapping an fsst win
    afterwards would systematically pick the wrong encoding for
    prefix-sorted strings; r5 review)."""
    if override is not None:
        return override
    n = len(lengths)
    if n == 0:
        return "delta_length_ba"
    total = int(np.asarray(lengths, dtype=np.int64).sum())
    # sample-based cardinality
    sample = min(n, 4096)
    off = np.concatenate(([0], np.cumsum(np.asarray(lengths[:sample], dtype=np.int64))))
    vals = [bytes(data[off[i] : off[i + 1]]) for i in range(sample)]
    card = len(set(vals))
    if "dict_ba" in candidates and card <= max(2, sample // 4):
        return "dict_ba"
    mean_len = total / n
    est = {"delta_length_ba": total + 2 * n}
    # front coding pays when most of each value is a shared prefix of its
    # predecessor (chunk rows arrive sorted by the bucket sort key, so a
    # sorted key column sees its true adjacency here): per value, the
    # unshared suffix plus ~2 bytes of varints survive
    pbar = _mean_adjacent_prefix(vals)
    if "delta_ba" in candidates and mean_len >= 8 and pbar / mean_len >= 0.3:
        est["delta_ba"] = int(total - n * pbar + 2.2 * n)
    # FSST: a trial encode of a ~16KB sample gives the real ratio (symbol
    # table amortization included — conservative for larger chunks). The
    # table costs ~1-2KB, so tiny chunks skip the trial entirely.
    if "fsst" in candidates and total >= 8192 and mean_len >= 6:
        from .codecs import fsst as fsst_codec

        slens = np.asarray(lengths[:sample], dtype=np.int64)
        j = int(np.searchsorted(np.cumsum(slens), 16384)) + 1
        j = min(j, sample)
        trial_raw = int(slens[:j].sum())
        trial = fsst_codec.encode_flat(slens[:j], bytes(data[:trial_raw]))
        est["fsst"] = int(len(trial) / max(trial_raw, 1) * total)
    return min(est, key=est.get)
