"""Loud-failure guards: misuse and overflow paths must raise clean
ValueErrors instead of silently corrupting data (ADVICE r2 items: int64
float64-detour rounding, int32 Arrow-offset wraparound)."""

import numpy as np
import pandas as pd
import pytest

from engine.jobs import decode as decode_job
from engine.jobs import encode as encode_job


def test_scalar_int64_float_detour_raises():
    """Nullable int64 that bypassed encode_table's validity-companion split
    arrives as float64; inexact values must fail loudly, not round."""
    pdf = pd.DataFrame(
        {
            "chunk_id": ["c"] * 3,
            "doc_id": ["a", "b", "c"],
            "v": [1.0, 3.5, 2.0],  # 3.5 cannot be an int64
        }
    )
    with pytest.raises(ValueError, match="lossy"):
        encode_job._encode_group(pdf, {"v": ("int64", None)})


def test_scalar_int64_exact_floats_pass():
    pdf = pd.DataFrame(
        {
            "chunk_id": ["c"] * 3,
            "doc_id": ["a", "b", "c"],
            "v": [1.0, np.nan, float(2**60)],  # all representable exactly
        }
    )
    out = encode_job._encode_group(pdf, {"v": ("int64", None)})
    assert out["null_count"].iloc[0] == 1


def test_list_int64_float_detour_raises():
    pdf = pd.DataFrame(
        {
            "chunk_id": ["c"] * 2,
            "doc_id": ["a", "b"],
            "v": [np.array([1.0, 2.5]), np.array([3.0])],
        }
    )
    with pytest.raises(ValueError, match="lossy"):
        encode_job._encode_group(pdf, {"v": ("list:int64", None)})


def test_string_offsets_overflow_guard():
    """Concatenated byte-array payload past 2^31 bytes must raise, not wrap
    int32 Arrow offsets into silently corrupt values."""
    lengths = np.array([1 << 31], dtype=np.int64)
    with pytest.raises(ValueError, match="2\\^31"):
        decode_job._string_array_from_flat(lengths, b"")
