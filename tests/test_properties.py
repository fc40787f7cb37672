"""WriterProperties: per-column overrides + dictionary toggles."""

import pandas as pd
import pytest

from engine import datagen, properties
from engine.jobs import decode as decode_job
from engine.jobs import encode as encode_job


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(datagen.generate_pandas(150, seed=4))
    df.persist().count()
    return df


def test_column_encoding_override_wins(spark, corpus):
    props = properties.WriterProperties(
        rows_per_bucket=64, column_encodings={"tokens": "plain"}
    )
    chunks = encode_job.encode_table(corpus, props=props).toPandas()
    tok = chunks[chunks["column"] == "tokens"]
    assert set(tok["codec"]) == {"plain"}
    # still decodes exactly
    sdf = spark.createDataFrame(chunks[encode_job.CHUNK_SCHEMA.fieldNames()])
    assert decode_job.decode_chunks(sdf).count() == 150


def test_dictionary_disable_global(spark, corpus):
    props = properties.WriterProperties(rows_per_bucket=64, dictionary_enabled=False)
    chunks = encode_job.encode_table(corpus, props=props).toPandas()
    assert "dict" not in set(chunks[chunks["column"] == "tokens"]["codec"])
    assert "dict_ba" not in set(chunks[chunks["column"] == "source"]["codec"])


def test_dictionary_disable_per_column(spark, corpus):
    props = properties.WriterProperties(
        rows_per_bucket=64, column_dictionary_enabled={"tokens": False}
    )
    chunks = encode_job.encode_table(corpus, props=props).toPandas()
    assert "dict" not in set(chunks[chunks["column"] == "tokens"]["codec"])
    # source keeps its dict override (unaffected column)
    assert set(chunks[chunks["column"] == "source"]["codec"]) == {"dict_ba"}


def test_precedence_column_over_global():
    props = properties.WriterProperties(column_encodings={"a": "delta"})
    assert props.encoding_for("a") == "delta"
    assert props.encoding_for("b") is None
    spec = props.columns_spec({"a": "int32_list", "b": "int32"})
    assert spec["a"] == ("int32_list", "delta")
    with pytest.raises(ValueError, match="unsupported"):
        props.columns_spec({"x": "decimal"})
