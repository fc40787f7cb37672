"""Chunk framing, codec auto-selector, string codecs, FSST."""

import numpy as np
import pytest

from engine import chunk, selector
from engine.codecs import bytearrays, fsst

from test_plain_dict_delta import regimes


@pytest.mark.parametrize("codec", ["plain", "dict", "delta", "bitpack", "rle"])
@pytest.mark.parametrize("n", [0, 1, 8, 1023, 4096])
def test_chunk_roundtrip_int(codec, n):
    for name, vals in regimes(n).items():
        blob = chunk.encode_chunk(vals, codec, "int32")
        info = chunk.read_info(blob)
        assert info.codec == codec and info.n_values == n
        assert info.raw_bytes == 4 * n
        out = chunk.decode_chunk(blob)
        np.testing.assert_array_equal(out, vals, err_msg=f"{codec}/{name}")


def test_chunk_checksum_detects_corruption():
    blob = bytearray(chunk.encode_chunk(np.arange(100, dtype=np.int32), "delta"))
    blob[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        chunk.decode_chunk(bytes(blob))


def test_chunk_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        chunk.decode_chunk(b"XXXX" + b"\x00" * 40)


STRINGS = [
    ["doc-web-00000001", "doc-web-00000002", "doc-code-00000003", "doc-web-00000004"],
    ["", "a", "", "bb", ""],
    ["same", "same", "same", "same"],
    ["completely", "different", "words", "here", "xyz"],
]


@pytest.mark.parametrize("codec", ["plain_ba", "dict_ba", "delta_length_ba", "delta_ba", "fsst"])
@pytest.mark.parametrize("case", range(len(STRINGS)))
def test_chunk_roundtrip_strings(codec, case):
    strings = STRINGS[case]
    lengths, data = bytearrays.flat_from_values(strings)
    blob = chunk.encode_chunk((lengths, data), codec, "bytes")
    out_lens, out_data = chunk.decode_chunk(blob)
    np.testing.assert_array_equal(out_lens, lengths)
    assert out_data == data


def test_delta_byte_array_prefix_compression():
    strings = [f"doc-web-{i:08d}" for i in range(1000)]
    lengths, data = bytearrays.flat_from_values(strings)
    enc = bytearrays.encode_delta_byte_array(lengths, data)
    assert len(enc) < len(data) // 2  # shared prefixes collapse
    out_lens, out_data = bytearrays.decode_delta_byte_array(enc, 1000)
    np.testing.assert_array_equal(out_lens, lengths)
    assert out_data == data


def test_fsst_roundtrip_and_compression():
    strings = [f"doc-web-{i % 50:08d}" for i in range(2000)]
    lengths, data = bytearrays.flat_from_values(strings)
    enc = fsst.encode_flat(lengths, data)
    out_lens, out_data = fsst.decode_flat(enc, 2000)
    np.testing.assert_array_equal(out_lens, lengths)
    assert out_data == data
    assert len(enc) < len(data)  # must actually compress repetitive text


def test_fsst_escape_paths():
    # bytes outside the symbol table, incl. 0xFF literals
    raw = bytes([255, 255, 0, 1, 255, 7]) + b"abcabcabc" + bytes([255])
    lengths = np.array([len(raw)])
    enc = fsst.encode_flat(lengths, raw, symbols=[b"abc"])
    out_lens, out_data = fsst.decode_flat(enc, 1)
    assert out_data == raw


def test_fsst_empty():
    lengths, data = bytearrays.flat_from_values([])
    enc = fsst.encode_flat(lengths, data)
    out_lens, out_data = fsst.decode_flat(enc, 0)
    assert len(out_lens) == 0 and out_data == b""


# --- selector sanity (FIXTURES.md F5.5) --------------------------------------


def test_selector_regime_choices():
    r = regimes(8192)
    picks = {name: selector.select_codec(vals)[0] for name, vals in r.items()}
    assert picks["lowcard10"] in ("dict", "bitpack", "rle")
    assert picks["monotone"] == "delta"
    # constant: FOR+bitpack at width 0 (6 bytes) legitimately beats RLE (8);
    # any of these encodes a constant chunk in O(1) bytes
    assert picks["constant"] in ("rle", "dict", "delta", "bitpack")
    assert picks["fullrange"] == "plain"


def test_selector_estimates_track_actual_sizes():
    # the argmin choice should be within 15% of the true best encoding
    for name, vals in regimes(4096, seed=9).items():
        choice, stats, sizes = selector.select_codec(vals)
        actual = {
            c: len(chunk.encode_chunk(vals, c, "int32"))
            for c in selector.INT_CANDIDATES
        }
        best = min(actual.values())
        assert actual[choice] <= best * 1.15 + 64, (name, choice, actual, sizes)


def test_selector_override_wins():
    vals = regimes(1024)["lowcard10"]
    choice, _, _ = selector.select_codec(vals, override="plain")
    assert choice == "plain"


def test_selector_ba():
    lens, data = bytearrays.flat_from_values(["web"] * 1000)
    assert selector.select_ba_codec(lens, data) == "dict_ba"
    lens, data = bytearrays.flat_from_values([f"doc-{i:09d}-suffix" for i in range(500)])
    assert selector.select_ba_codec(lens, data) == "fsst"


def test_truncated_payload_fails_loudly():
    import pytest as _pytest

    blob = chunk.encode_chunk(np.arange(1000, dtype=np.int32), "delta")
    with _pytest.raises(ValueError):
        chunk.decode_chunk(blob[: len(blob) // 2])


def test_unknown_codec_id_fails_loudly():
    import pytest as _pytest

    blob = bytearray(chunk.encode_chunk(np.arange(10, dtype=np.int32), "plain"))
    blob[5] = 200  # nonexistent codec id
    with _pytest.raises(ValueError, match="unknown codec id"):
        chunk.decode_chunk(bytes(blob))


def test_paged_chunk_roundtrip_and_regime_tracking():
    from engine import datagen

    a = datagen._tokens_for("monotone", 200_000, np.random.default_rng(1))
    b = datagen._tokens_for("lowcard10", 200_000, np.random.default_rng(2))
    vals = np.concatenate([a, b])
    blob = chunk.encode_chunk_paged(vals, page_values=200_000)
    np.testing.assert_array_equal(chunk.decode_chunk(blob), vals)
    info = chunk.read_info(blob)
    assert info.codec == "paged" and info.n_values == 400_000
    # pages choose different codecs -> beats any single codec
    best_single = min(
        len(chunk.encode_chunk(vals, c, "int32")) for c in selector.INT_CANDIDATES
    )
    assert info.enc_bytes < best_single


def test_paged_empty_and_single_page():
    blob = chunk.encode_chunk_paged(np.empty(0, np.int32))
    np.testing.assert_array_equal(chunk.decode_chunk(blob), np.empty(0, np.int32))
    vals = np.arange(1000, dtype=np.int32)
    blob = chunk.encode_chunk_paged(vals)
    np.testing.assert_array_equal(chunk.decode_chunk(blob), vals)


def test_selector_int64_size_models():
    """int64 chunks use 8-byte plain/dict cost models and 64-bit delta wrap
    (ADVICE r1: int32-specific estimators made dict/plain look too cheap)."""
    import numpy as np

    from engine import selector

    rng = np.random.default_rng(7)
    # high-cardinality random int64: plain must be estimated at 8*n, and the
    # estimate should be within 2x of the real encoded size
    v64 = rng.integers(-(1 << 62), 1 << 62, 4096, dtype=np.int64)
    codec, stats, sizes = selector.select_codec(v64)
    assert stats.elem_bits == 64
    assert sizes["plain"] == 8 * len(v64)
    from engine import chunk

    blob = chunk.encode_chunk(v64, codec, "int64")
    assert np.array_equal(chunk.decode_chunk(blob), v64)

    # sorted int64 with big base but tiny deltas: delta must win (with the
    # 32-bit wrap bug, delta widths were computed from wrapped garbage)
    base = np.int64(1 << 40)
    sorted64 = base + np.cumsum(rng.integers(0, 8, 65536, dtype=np.int64))
    codec2, stats2, sizes2 = selector.select_codec(sorted64)
    assert codec2 == "delta", (codec2, sizes2)
    blob2 = chunk.encode_chunk(sorted64, "delta", "int64")
    assert np.array_equal(chunk.decode_chunk(blob2), sorted64)
    assert len(blob2) < 8 * len(sorted64) // 8  # >8x better than plain


def test_selector_int32_unchanged():
    import numpy as np

    from engine import selector

    v = np.arange(1000, dtype=np.int32)
    _, stats, sizes = selector.select_codec(v)
    assert stats.elem_bits == 32
    assert sizes["plain"] == 4 * len(v)


def test_selector_picks_delta_ba_for_sorted_grouped_keys():
    """Front coding must be reachable by AUTO selection (ADVICE r1: it was
    dead code): sorted group-prefixed keys front-code far below FSST."""
    import hashlib

    import numpy as np

    from engine import chunk, selector
    from engine.codecs import bytearrays

    keys = sorted(
        hashlib.md5(str(i % 97).encode()).hexdigest() + f"-{i:08d}"
        for i in range(4000)
    )
    lens, data = bytearrays.flat_from_values(keys)
    assert selector.select_ba_codec(lens, data) == "delta_ba"
    blob = chunk.encode_chunk((lens, data), "delta_ba", "bytes")
    out_lens, out_data = chunk.decode_chunk(blob)
    assert np.array_equal(out_lens, lens) and out_data == data
    assert len(blob) < int(np.sum(lens)) // 4  # >4x on this shape


def test_selector_keeps_fsst_for_structured_ids():
    """FSST still wins where it is genuinely smaller (trial-based estimate,
    not a cascade)."""
    from engine import selector
    from engine.codecs import bytearrays

    ids = sorted(f"doc-books-{i:08d}-s{i % 40:05d}" for i in range(4000))
    lens, data = bytearrays.flat_from_values(ids)
    assert selector.select_ba_codec(lens, data) == "fsst"


def test_fsst_refinement_is_monotone_and_boundary_aware():
    """Two r5 table-quality fixes: (1) refinement rounds are scored by
    MEASURED encoded size and the best table wins, so more rounds can
    never produce a bigger encoding than fewer; (2) scoring uses the real
    value boundaries — the old 1-value concatenated form rewarded symbols
    spanning value boundaries, which the actual encode can never match
    (id-like strings measured 5040B under the old scoring vs 2359B
    boundary-aware)."""
    import numpy as np

    from engine.codecs import fsst

    vals = [f"doc-{i:09d}" for i in range(468)]
    lens = np.array([len(v) for v in vals], np.int64)
    data = "".join(vals).encode()
    arr = np.frombuffer(data, np.uint8)
    sizes = {}
    for rr in (0, 1, 2):
        tbl = fsst.build_table(arr, lengths=lens, refine_rounds=rr)
        enc = fsst.encode_flat(lens, data, symbols=tbl)
        l2, d2 = fsst.decode_flat(enc, len(vals))
        assert d2 == data and (l2 == lens).all()
        sizes[rr] = len(enc)
    assert sizes[1] <= sizes[0] and sizes[2] <= sizes[1], sizes
    # boundary-aware default path realizes the refined size
    assert len(fsst.encode_flat(lens, data)) == sizes[2]
    assert sizes[2] < len(data) * 0.45  # strong compression on id strings
