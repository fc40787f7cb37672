"""Size parity vs parquet-rs-compatible reference encodings (FIXTURES.md F5.4).

The reference's output sizes are reproduced with pyarrow's parquet writer
using the same encodings parquet-rs implements (PLAIN_DICTIONARY fallback to
PLAIN at the 1MB dict limit, DELTA_BINARY_PACKED for ints), UNCOMPRESSED to
match the reference default (src/file/properties.rs:59). Our auto-selected
chunks must come in at or below those column-chunk sizes (small tolerance for
parquet page-header amortization differences on tiny columns).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine import chunk, datagen, selector
from engine.codecs import bytearrays

N_DOCS = 5000


@pytest.fixture(scope="module")
def corpus():
    return datagen.generate_pandas(N_DOCS, seed=42)


def _parquet_col_size(table: pa.Table, col: str, **writer_kwargs) -> int:
    import io

    buf = io.BytesIO()
    pq.write_table(table, buf, compression="NONE", **writer_kwargs)
    buf.seek(0)
    meta = pq.ParquetFile(buf).metadata
    total = 0
    for rg in range(meta.num_row_groups):
        for ci in range(meta.num_columns):
            c = meta.row_group(rg).column(ci)
            if c.path_in_schema.split(".")[0] == col:
                total += c.total_compressed_size
    return total


def _our_int_size(vals: np.ndarray) -> tuple[int, str]:
    codec, _, _ = selector.select_codec(vals)
    blob = chunk.encode_chunk(vals, codec, "int32")
    return chunk.read_info(blob).enc_bytes, codec


def test_tokens_flat_parity(corpus):
    flat = np.concatenate([np.asarray(t, np.int32) for t in corpus["tokens"]])
    table = pa.table({"tokens": pa.array(flat, pa.int32())})
    ours, codec = _our_int_size(flat)
    ref_dict = _parquet_col_size(table, "tokens", use_dictionary=True)
    ref_delta = _parquet_col_size(
        table, "tokens", use_dictionary=False,
        column_encoding={"tokens": "DELTA_BINARY_PACKED"},
    )
    ref = min(ref_dict, ref_delta)
    print(f"tokens: ours={ours} ({codec}) ref_dict={ref_dict} ref_delta={ref_delta}")
    assert ours <= ref * 1.02 + 256


def test_tokens_per_source_parity(corpus):
    """Source-homogeneous chunks (the engine's real unit) vs parquet on the
    same slice — every regime must hold parity, not just the blend."""
    for src, g in corpus.groupby("source"):
        flat = np.concatenate([np.asarray(t, np.int32) for t in g["tokens"]])
        table = pa.table({"t": pa.array(flat, pa.int32())})
        ours, codec = _our_int_size(flat)
        ref = min(
            _parquet_col_size(table, "t", use_dictionary=True),
            _parquet_col_size(
                table, "t", use_dictionary=False,
                column_encoding={"t": "DELTA_BINARY_PACKED"},
            ),
        )
        print(f"{src}: ours={ours} ({codec}) ref={ref} ratio={ours/ref:.3f}")
        assert ours <= ref * 1.02 + 256, (src, codec, ours, ref)


def test_n_tok_parity(corpus):
    vals = corpus["n_tok"].to_numpy(np.int32)
    table = pa.table({"n": pa.array(vals, pa.int32())})
    ours, codec = _our_int_size(vals)
    ref = min(
        _parquet_col_size(table, "n", use_dictionary=True),
        _parquet_col_size(
            table, "n", use_dictionary=False,
            column_encoding={"n": "DELTA_BINARY_PACKED"},
        ),
    )
    assert ours <= ref * 1.02 + 256, (codec, ours, ref)


def test_doc_id_strings_parity(corpus):
    ids = corpus["doc_id"].tolist()
    table = pa.table({"d": pa.array(ids, pa.string())})
    lengths, data = bytearrays.flat_from_values(ids)
    codec = selector.select_ba_codec(lengths, data)
    blob = chunk.encode_chunk((lengths, data), codec, "bytes")
    ours = chunk.read_info(blob).enc_bytes
    ref_dict = _parquet_col_size(table, "d", use_dictionary=True)
    ref_plain = _parquet_col_size(table, "d", use_dictionary=False)
    ref = min(ref_dict, ref_plain)
    print(f"doc_id: ours={ours} ({codec}) ref={ref}")
    # unique ids: parquet dict degenerates to plain; FSST must beat both
    assert ours <= ref * 1.02 + 256


def test_source_strings_parity(corpus):
    vals = corpus["source"].tolist()
    table = pa.table({"s": pa.array(vals, pa.string())})
    lengths, data = bytearrays.flat_from_values(vals)
    codec = selector.select_ba_codec(lengths, data)
    blob = chunk.encode_chunk((lengths, data), codec, "bytes")
    ours = chunk.read_info(blob).enc_bytes
    ref = _parquet_col_size(table, "s", use_dictionary=True)
    print(f"source: ours={ours} ({codec}) ref={ref}")
    assert ours <= ref * 1.02 + 256
