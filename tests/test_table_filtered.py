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


def test_schema_evolved_isnull_keeps_old_chunks(spark):
    """Chunks written BEFORE a column existed decode as all-NULL rows
    for it — IS NULL must keep them even though they have no stats row
    for the column (r7 review pass 5 #1: dropping them loses exactly
    the rows IS NULL exists to find)."""
    pdf = pd.DataFrame({"id": np.arange(100, dtype=np.int64)})
    df = spark.createDataFrame(pdf)
    cols = encode_job.derive_columns(df)
    chunks = encode_job.encode_table(
        df, columns=cols, rows_per_bucket=64,
        bucket_key="id", salt_col="id",
    )
    evolved = {**cols, "newcol": ("int64", None)}
    out = decode_job.decode_table_filtered(
        chunks, evolved, ("newcol", "isnull", None)
    )
    assert out.count() == 100
    out = decode_job.decode_table_filtered(
        chunks, evolved, ("newcol", "notnull", None)
    )
    assert out.count() == 0


def test_nan_rows_never_match(spark):
    """NaN semantics must agree between stats pruning (NaN-excluded
    bounds) and the residual: NaN rows fail > / >= / ==, matching the
    parquet residual (r7 review pass 5 #2)."""
    pdf = pd.DataFrame({
        "id": np.arange(300, dtype=np.int64),
        "score": np.where(np.arange(300) % 7 == 0, np.nan, 1.0),
    })
    df = spark.createDataFrame(pdf)
    cols = encode_job.derive_columns(df)
    chunks = encode_job.encode_table(
        df, columns=cols, rows_per_bucket=128,
        bucket_key="id", salt_col="id",
    )
    out = decode_job.decode_table_filtered(chunks, cols, ("score", ">", 5.0))
    assert out.count() == 0  # NaN rows must NOT surface as > 5.0
    out = decode_job.decode_table_filtered(
        chunks, cols, ("score", "==", float("nan"))
    )
    assert out.count() == 0
    out = decode_job.decode_table_filtered(
        chunks, cols, ("score", ">=", 1.0)
    )
    assert out.count() == 300 - len(range(0, 300, 7))


def test_bool_equality_predicate(spark):
    """Bool bounds compare against the stored 0/1 int stats instead of
    crashing analysis (r7 review pass 5 #3)."""
    pdf = pd.DataFrame({
        "id": np.arange(200, dtype=np.int64),
        "flag": (np.arange(200) % 3 == 0),
    })
    df = spark.createDataFrame(pdf)
    cols = encode_job.derive_columns(df)
    chunks = encode_job.encode_table(
        df, columns=cols, rows_per_bucket=64,
        bucket_key="id", salt_col="id",
    )
    out = decode_job.decode_table_filtered(chunks, cols, ("flag", "==", True))
    assert out.count() == len(range(0, 200, 3))
    out = decode_job.decode_table_filtered(
        chunks, cols, ("flag", False, False)
    )
    assert out.count() == 200 - len(range(0, 200, 3))


def test_dotted_column_names_resolve(spark):
    """Flattened struct leaves carry literal dots; the residual and the
    projection must backtick them (r7 review pass 5 #4)."""
    df = spark.createDataFrame(
        pd.DataFrame({"user.age": np.arange(10, dtype=np.int64)})
    )
    expr = decode_job.row_filter_expr(("user.age", ">", 5))
    assert df.where(expr).count() == 4


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
