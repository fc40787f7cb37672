"""Determinism and contract checks for the corpus generator (no Spark)."""

import numpy as np

from engine import datagen


def test_generate_pandas_deterministic():
    a = datagen.generate_pandas(300, seed=42)
    b = datagen.generate_pandas(300, seed=42)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert all(np.array_equal(x, y) for x, y in zip(a["tokens"], b["tokens"]))


def test_generate_pandas_seed_sensitivity():
    a = datagen.generate_pandas(100, seed=1)
    b = datagen.generate_pandas(100, seed=2)
    assert list(a["doc_id"]) != list(b["doc_id"]) or not all(
        np.array_equal(x, y) for x, y in zip(a["tokens"], b["tokens"])
    )


def test_contract_fields():
    pdf = datagen.generate_pandas(500, seed=42)
    assert (pdf["n_tok"] == pdf["tokens"].map(len)).all()
    assert (pdf["n_tok"] >= 8).all() and (pdf["n_tok"] <= 4096).all()
    assert all(t.dtype == np.int32 for t in pdf["tokens"])
    assert set(pdf["source"]).issubset(set(datagen.SOURCES))


def test_source_skew_matches_weights():
    pdf = datagen.generate_pandas(20000, seed=42)
    frac = pdf["source"].value_counts(normalize=True)
    for s, w in zip(datagen.SOURCES, datagen.WEIGHTS):
        assert abs(frac.get(s, 0) - w) < 0.02, (s, frac.get(s, 0), w)


def test_regimes_cover_all():
    rng = np.random.default_rng(0)
    for regime in [
        "lowcard10", "lowcard100", "lowcard1000", "runs", "monotone",
        "smallrange", "fullrange", "zipf", "alternating", "constant",
    ]:
        v = datagen._tokens_for(regime, 257, rng)
        assert len(v) == 257 and v.dtype == np.int32
