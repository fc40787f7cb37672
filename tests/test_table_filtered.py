"""decode_table_filtered: the chunk-store filtered scan sharing ONE
predicate algebra with the parquet reader (ranges, one-sided
comparisons, IN-lists, null tests, CNF) — chunk stats prune, the exact
row residual applies in the same call."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.jobs import decode as decode_job
from engine.jobs import encode as encode_job


@pytest.fixture(scope="module")
def store(spark):
    rng = np.random.default_rng(11)
    n = 3000
    cat = rng.choice(["alpha", "beta", "gamma"], n).astype(object)
    cat[::17] = None  # nullable string column
    pdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "category": cat,
            "score": rng.standard_normal(n),
        }
    )
    df = spark.createDataFrame(pdf)
    cols = encode_job.derive_columns(df)
    chunks = encode_job.encode_table(
        df, columns=cols, rows_per_bucket=256,
        bucket_key="category", salt_col="id", sort_col="id",
    )
    chunks.persist().count()
    return chunks, cols, pdf


def _oracle(pdf, mask):
    return pdf[mask].sort_values("id").reset_index(drop=True)


def _got(df):
    return df.toPandas().sort_values("id").reset_index(drop=True)


def test_cnf_range_and_cmp(store):
    chunks, cols, pdf = store
    out = decode_job.decode_table_filtered(
        chunks, cols, [("id", 100, 900), ("score", ">", 0.5)]
    )
    got = _got(out)
    exp = _oracle(pdf, (pdf.id >= 100) & (pdf.id <= 900) & (pdf.score > 0.5))
    assert got["id"].tolist() == exp["id"].tolist()
    assert np.allclose(got["score"], exp["score"])


def test_null_tests(store):
    chunks, cols, pdf = store
    got = _got(decode_job.decode_table_filtered(
        chunks, cols, ("category", "isnull", None)
    ))
    exp = _oracle(pdf, pdf.category.isna())
    assert got["id"].tolist() == exp["id"].tolist()
    got = _got(decode_job.decode_table_filtered(
        chunks, cols, [("category", "notnull", None), ("id", "<", 50)]
    ))
    exp = _oracle(pdf, pdf.category.notna() & (pdf.id < 50))
    assert got["id"].tolist() == exp["id"].tolist()


def test_in_list_and_or_group(store):
    chunks, cols, pdf = store
    pred = [
        [("category", "in", ["alpha"]), ("score", ">=", 2.0)],  # OR
        ("id", 0, 500),
    ]
    got = _got(decode_job.decode_table_filtered(chunks, cols, pred))
    exp = _oracle(
        pdf,
        ((pdf.category == "alpha") | (pdf.score >= 2.0))
        & (pdf.id <= 500),
    )
    assert got["id"].tolist() == exp["id"].tolist()
    assert got["category"].fillna("~").tolist() == exp["category"].fillna("~").tolist()


def test_chunk_pruning_engages(store):
    """A narrow sorted-id range must survive in strictly fewer chunks
    than the store holds."""
    chunks, cols, pdf = store
    total = chunks.select("chunk_id").distinct().count()
    kept = decode_job._pruned_chunk_ids_cnf(
        chunks, [[("id", 0, 10)]]
    ).count()
    assert 0 < kept < total


def test_projection_drops_predicate_column(store):
    chunks, cols, pdf = store
    out = decode_job.decode_table_filtered(
        chunks, cols, ("id", 10, 20), select=["category"]
    )
    assert out.columns == ["category"]
    assert out.count() == 11


def test_unknown_predicate_column_raises(store):
    chunks, cols, _ = store
    with pytest.raises(ValueError, match="not in the table"):
        decode_job.decode_table_filtered(chunks, cols, ("nope", 1, 2))


def test_strict_cmp_boundary_chunk_pruned(spark):
    """vmax == v proves `> v` empty: the strict keep-expression must
    prune the chunk an inclusive envelope would keep."""
    pdf = pd.DataFrame({"id": np.arange(512, dtype=np.int64)})
    df = spark.createDataFrame(pdf)
    cols = encode_job.derive_columns(df)
    chunks = encode_job.encode_table(
        df, columns=cols, rows_per_bucket=256,
        bucket_key="id", salt_col="id", sort_col="id",
    )
    kept_strict = decode_job._pruned_chunk_ids_cnf(
        chunks, [[("id", ">", 511)]]
    ).count()
    kept_incl = decode_job._pruned_chunk_ids_cnf(
        chunks, [[("id", ">=", 511)]]
    ).count()
    assert kept_strict == 0
    assert kept_incl >= 1
