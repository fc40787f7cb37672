"""Pipeline ops: dedup, similarity search, text stats, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.ops import dedup, multimodal, simsearch, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat", "en"),  # near dup of 1
        (4, "der hund ist nicht auf der couch und das ist gut", "de"),
        (5, "completely unrelated text about databases and encodings", "en"),
        (6, "le chat est dans la maison et il est pour content", "fr"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    ).persist()


def test_exact_dedup(spark, docs):
    out = dedup.exact_dedup(docs).toPandas()
    assert len(out) == 5  # 6 docs, one exact dup collapses
    dup_row = out[out["dup_count"] == 2]
    assert len(dup_row) == 1 and dup_row["survivor_id"].iloc[0] == 1


def test_minhash_lsh_finds_near_dup(spark, docs):
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16).toPandas()
    got = {tuple(r) for r in pairs.itertuples(index=False)}
    assert (1, 2) in got  # identical docs always collide
    assert (1, 3) in got or (2, 3) in got  # near dup shares most shingles
    assert (1, 5) not in got and (4, 5) not in got


def test_ngram_jaccard_verification(spark, docs):
    cand = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16)
    verified = dedup.ngram_jaccard_pairs(docs, cand, threshold=0.99).toPandas()
    assert set(map(tuple, verified[["id_a", "id_b"]].values)) == {(1, 2)}


def test_simhash_near_dups(spark, docs):
    pairs = dedup.simhash_near_dup_pairs(docs, max_hamming=0).toPandas()
    assert (1, 2) in set(map(tuple, pairs[["id_a", "id_b"]].values))
    # hamming 0 only for identical word multisets
    assert all(h == 0 for h in pairs["hamming"])


def test_textstats_token_count(spark, docs):
    out = textstats.token_count(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "n_words"] == 9
    assert out.loc[1, "n_chars"] == 43
    assert out.loc[1, "n_tokens_est"] == 9 + int(np.ceil(43 / 4))


def test_textstats_language_id(spark, docs):
    out = textstats.language_id(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "lang_pred"] == "en"
    assert out.loc[4, "lang_pred"] == "de"
    assert out.loc[6, "lang_pred"] == "fr"


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["ab cde", "cde ab"]})
    )
    out = textstats.fingerprint(df).toPandas()
    assert out["rolling_fp"].nunique() == 2  # order matters
    assert out["text_hash"].nunique() == 2


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((100, 8)).astype(np.float64)
    pdf = pd.DataFrame(
        {"vec_id": range(100), "embedding": [list(map(float, v)) for v in emb]}
    )
    return spark.createDataFrame(pdf).persist()


def test_bruteforce_topk_self_is_rank1(spark, vectors):
    queries = vectors.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = simsearch.cosine_topk_bruteforce(vectors, queries, k=5).toPandas()
    rank1 = out[out["rank"] == 1]
    assert (rank1["vec_id"] == rank1["query_id"]).all()
    assert (rank1["cosine"] == 1.0).all()
    assert len(out) == 15


def test_lsh_topk_contains_self(spark, vectors):
    queries = vectors.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = simsearch.cosine_topk_lsh(vectors, queries, dim=8, k=5, nbits=4).toPandas()
    rank1 = out[out["rank"] == 1]
    # self always lands in its own bucket -> rank 1 with cosine 1
    assert (rank1["vec_id"] == rank1["query_id"]).all()


def test_ivf_assign_partitions_space(spark, vectors):
    centroids = np.eye(8)[:4]
    out = simsearch.ivf_assign(vectors, centroids).toPandas()
    assert set(out["ivf_cell"]).issubset({0, 1, 2, 3})
    assert out["ivf_cell"].nunique() > 1


def test_multimodal_feature_plumbing(spark):
    media = multimodal.make_fake_media(spark, n=12)
    feats = multimodal.extract_features(media, dim=8).toPandas()
    assert len(feats) == 12
    assert all(len(f) == 8 for f in feats["feature"])
    # deterministic fake: same bytes -> same sha + feature
    again = multimodal.extract_features(media, dim=8).toPandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = again.sort_values("media_id").reset_index(drop=True)
    assert (a["content_sha"] == b["content_sha"]).all()


def test_frame_sample_plan(spark):
    media = multimodal.make_fake_media(spark, n=9)
    plan = multimodal.frame_sample_plan(media, every_n=25).toPandas()
    per_video = plan.groupby("media_id").size()
    assert (per_video == 4).all()  # frames 0,25,50,75 of 100


def test_ivf_topk_contains_self(spark, vectors):
    from engine.ops.simsearch import ivf_topk, train_centroids

    cents = train_centroids(vectors, k=4, iters=2)
    queries = vectors.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(vectors, queries, cents, k=5, nprobe=2).toPandas()
    rank1 = out[out["rank"] == 1]
    # self's cell is always among its own nearest cells
    assert (rank1["vec_id"] == rank1["query_id"]).all()
    assert (rank1["cosine"] == 1.0).all()


def test_lsh_viral_duplicate_no_blowup(spark):
    """A 10k-copy planted document must produce LINEAR star edges (one per
    copy), not O(k^2) bucket pairs (VERDICT r1 #6)."""
    base = spark.range(0, 10_001).select(
        F.col("id").alias("doc_id"),
        F.lit("the viral document that everyone copied verbatim again").alias("text"),
    )
    extra = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [20_000, 20_001, 20_002],
                "text": [
                    "completely different text one",
                    "another unrelated document two",
                    "third distinct content three",
                ],
            }
        )
    )
    docs = base.union(extra)
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4).toPandas()
    viral = pairs[pairs["id_a"] == 0]
    assert len(viral) == 10_000  # one star edge per copy, rep = min id 0
    assert len(pairs) < 10_050  # no quadratic pair set anywhere


def test_simhash_vectorized_no_python_loop(spark, docs):
    """simhash is pure built-ins now: the plan must contain no Python eval
    (BatchEvalPython / ArrowEvalPython / FlatMapsInPandas nodes)."""
    sig = dedup.simhash(docs)
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
    rows = sig.collect()
    assert len(rows) == 6
    by_id = {r["doc_id"]: r["simhash"] for r in rows}
    assert by_id[1] == by_id[2]  # identical texts -> identical signature
    assert by_id[1] != by_id[5]


def test_simhash_near_dup_tolerance(spark):
    """Flip one word in a 40-word doc: the pair must survive a generous
    hamming threshold through the block-bucket candidate stage."""
    words = [f"word{i}" for i in range(40)]
    orig = " ".join(words)
    mutated = " ".join(["zzqx"] + words[1:])
    docs2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [orig, mutated]})
    )
    pairs = dedup.simhash_near_dup_pairs(docs2, max_hamming=16).toPandas()
    assert (1, 2) in set(map(tuple, pairs[["id_a", "id_b"]].values))


def test_embedding_near_dup_planted_and_perturbed(spark):
    """Identical vectors are found deterministically (level-1 collapse);
    a slightly perturbed vector (cosine ~0.9999) is found through the LSH
    buckets; an unrelated vector is not paired."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal(32)
    base /= np.linalg.norm(base)
    near = base + 1e-3 * rng.standard_normal(32)
    near /= np.linalg.norm(near)
    other = rng.standard_normal(32)
    other /= np.linalg.norm(other)
    rows = [
        (1, [float(x) for x in base]),
        (2, [float(x) for x in base]),   # exact dup
        (3, [float(x) for x in near]),   # near dup
        (4, [float(x) for x in other]),  # unrelated
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = dedup.embedding_near_dup_pairs(vecs, dim=32, threshold=0.99, ntables=8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) in got or (2, 3) in got
    assert not any(4 in p for p in got)


def test_embedding_near_dup_viral_duplicate_linear(spark):
    """1000 copies of one vector -> linear star edges, not O(k^2) pairs."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    v = [float(x) for x in rng.standard_normal(16)]
    base = spark.range(0, 1000).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(x) for x in v]).alias("embedding"),
    )
    extra = spark.createDataFrame(
        [(5000, [float(x) for x in rng.standard_normal(16)])],
        "vec_id long, embedding array<double>",
    )
    pairs = dedup.embedding_near_dup_pairs(
        base.union(extra), dim=16, threshold=0.99, ntables=2
    ).toPandas()
    star = pairs[pairs["id_a"] == 0]
    assert len(star) == 999
    assert len(pairs) < 1010


def test_refine_centroids_matches_numpy_lloyd(spark):
    """Distributed Lloyd refinement (ivf_assign + per-element JVM sums) must
    reproduce the numpy reference loop exactly — same argmin tie order, same
    means, empty cells frozen — at k=64 over random data, i.e. correctness
    at a cell count the sf recall gate can't exercise (VERDICT r3 #5)."""
    import numpy as np

    from engine.ops import simsearch

    rng = np.random.default_rng(11)
    k, dim, n = 64, 16, 800
    X = rng.standard_normal((n, dim))
    init = X[:k].copy()
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    got = simsearch.refine_centroids(df, init, iters=3)

    want = init.copy()
    for _ in range(3):
        d = ((X[:, None, :] - want[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        nxt = want.copy()
        for c in range(k):
            members = X[assign == c]
            if len(members):
                nxt[c] = members.mean(axis=0)
        want = nxt
    assert np.allclose(got, want, rtol=0, atol=1e-9)
    # at least one cell must have gone empty-and-frozen OR all cells moved;
    # either way shapes agree and no NaNs leaked from empty cells
    assert got.shape == (k, dim) and not np.isnan(got).any()


def test_lloyd_stats_flat_plan_at_dim512(spark):
    """Each refinement round's stats query must have a plan size independent
    of BOTH k and dim (VERDICT r4 #2): the per-dimension element_at
    aggregate build put dim expressions into Catalyst; the mapInPandas
    partial-stats + applyInPandas merge keeps the plan to one Arrow stage,
    one tiny partial shuffle, no joins, no per-dim expressions — verified
    at dim=512, k=32, mirroring test_ivf_assign_flat_plan_at_k256."""
    import numpy as np

    from engine.ops import simsearch

    rng = np.random.default_rng(3)
    k, dim, n = 32, 512, 200
    X = rng.standard_normal((n, dim))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    stats = simsearch.lloyd_stats(df, X[:k].copy())
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "element_at" not in plan, plan[:1000]
    assert "Join" not in plan, plan[:1000]
    assert len(plan) < 4000, (len(plan), plan[:500])
    # and the stats are exactly the numpy reference partial sums
    got = stats.toPandas().sort_values("ivf_cell")
    c_sq = (X[:k] * X[:k]).sum(axis=1)
    cells = (c_sq[None, :] - 2.0 * (X @ X[:k].T)).argmin(axis=1)
    want_n = np.bincount(cells, minlength=k)
    want_s = np.zeros((k, dim))
    np.add.at(want_s, cells, X)
    nz = np.flatnonzero(want_n)
    assert (got["ivf_cell"].to_numpy() == nz).all()
    assert (got["_n"].to_numpy() == want_n[nz]).all()
    assert np.allclose(np.stack(got["_s"].to_numpy()), want_s[nz], atol=1e-9)


def test_train_centroids_memory_bounded_at_k1024(spark):
    """Seed k-means at k=1024, dim=512 must run in far under 1 GB of driver
    temporaries (VERDICT r4 #1): the matmul distance form peaks at the
    (sample x k) matrix, not the (sample x k x dim) cube (~16 GB here).
    tracemalloc tracks numpy allocations, so the peak is measured, not
    inferred."""
    import tracemalloc

    import numpy as np

    from engine.ops import simsearch

    rng = np.random.default_rng(5)
    X = rng.standard_normal((4096, 512))
    tracemalloc.start()
    cents = simsearch._kmeans_np(X, k=1024, iters=2)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert cents.shape == (1024, 512) and not np.isnan(cents).any()
    assert peak < 1 << 30, f"peak driver temp {peak/2**20:.0f} MiB"


def test_train_centroids_hash_stratified_sample_deterministic(spark):
    """The seed sample is drawn by seeded-hash rank, not first-N-by-id
    (VERDICT r4 #4): repeated calls give bit-identical centroids, a
    different seed gives a different (still deterministic) sample, and the
    selected vectors differ from the first-N-by-id prefix on an id-ordered
    table (the bias being removed)."""
    import numpy as np

    from engine.ops import simsearch

    rng = np.random.default_rng(9)
    n, dim = 300, 8
    X = rng.standard_normal((n, dim))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    a = simsearch.train_centroids(df, k=8, iters=0, sample=64)
    b = simsearch.train_centroids(df, k=8, iters=0, sample=64)
    assert np.array_equal(a, b)
    c = simsearch.train_centroids(df, k=8, iters=0, sample=64, seed=1)
    assert np.array_equal(c, simsearch.train_centroids(df, k=8, iters=0, sample=64, seed=1))
    assert not np.array_equal(a, c)
    # not the first-N-by-id prefix: at least one seed centroid is not X[:8]
    assert not np.allclose(a, X[:8])


def test_simhash_block_layout_pigeonhole():
    """_block_layout must tile [0,64) disjointly, and with
    blocks = max_hamming + 1 any signature pair within that distance shares
    at least one exact block (the recall guarantee the banding relies on) —
    checked exhaustively in numpy for radii 1..8 on adversarial bit
    placements (one flipped bit per block, the worst case)."""
    import numpy as np

    from engine.ops.dedup import _block_layout

    for blocks in (1, 2, 4, 6, 9, 64):
        layout = _block_layout(blocks)
        covered = sorted((o, o + w) for o, w in layout)
        assert covered[0][0] == 0 and covered[-1][1] == 64
        for (a, b), (c, _) in zip(covered, covered[1:]):
            assert b == c  # contiguous, disjoint
    rng = np.random.default_rng(5)
    for d in range(1, 9):
        layout = _block_layout(d + 1)
        for _ in range(200):
            sig = rng.integers(0, 1 << 63, dtype=np.uint64)
            # flip exactly d bits, adversarially spread over distinct blocks
            flip = np.uint64(0)
            chosen = rng.permutation(len(layout))[:d]
            for bi in chosen:
                off, w = layout[bi]
                flip |= np.uint64(1) << np.uint64(off + int(rng.integers(w)))
            other = sig ^ flip
            share = any(
                (sig >> np.uint64(off)) & np.uint64((1 << w) - 1)
                == (other >> np.uint64(off)) & np.uint64((1 << w) - 1)
                for off, w in layout
            )
            assert share, (d, layout)


def test_simhash_blocks_auto_raised(spark):
    """max_hamming beyond the block count auto-raises blocks to the
    pigeonhole minimum: a planted pair at hamming 4 (one flipped word per
    16-bit block region would be missed by the old fixed 4x16 split) must
    be proposed at max_hamming=8."""
    from engine.ops import dedup

    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta " * 3)
            for i in range(20)]
    # a near-dup: several words changed -> some hamming distance > 0
    rows.append((100, "alpha beta gamma delta epsilon zeta eta iota " * 3))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.simhash_near_dup_pairs(docs, max_hamming=8).toPandas()
    # the 20 identical docs form one star; the near-dup joins via banding
    # iff its signature is within 8 bits — compute the truth directly
    sigs = dedup.simhash(docs).toPandas().set_index("doc_id")["simhash"]
    # mask to 64 bits: signatures are signed LongType (bit 63 set ->
    # negative), and bin() on a negative XOR counts magnitude bits
    ham = bin((int(sigs.loc[0]) ^ int(sigs.loc[100])) & ((1 << 64) - 1)).count("1")
    found = ((pairs[["id_a", "id_b"]].values == [0, 100]).all(axis=1)).any()
    assert found == (ham <= 8), (ham, pairs)


def test_ppm_wav_decoders_roundtrip_and_fail_clean():
    """Real media decoders: encode->decode round-trips bit-exact for P5/P6
    images and 16-bit PCM WAV (mono + stereo); malformed inputs raise clean
    ValueErrors (same contract as the chunk decoders)."""
    import numpy as np
    import pytest

    from engine.ops import multimodal as M

    rng = np.random.default_rng(3)
    for shape in [(11, 7, 3), (5, 9, 1), (1, 1, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        np.testing.assert_array_equal(M.decode_ppm(M.encode_ppm(img)), img)
    # header with a comment line parses too
    img = rng.integers(0, 256, (3, 4, 3)).astype(np.uint8)
    buf = b"P6\n# a comment\n4 3\n255\n" + img.tobytes()
    np.testing.assert_array_equal(M.decode_ppm(buf), img)
    for ch in (1, 2):
        s = rng.integers(-(2**14), 2**14, (257, ch)).astype(np.int16)
        out, sr = M.decode_wav(M.encode_wav(s, 8000))
        assert sr == 8000
        np.testing.assert_array_equal(out, s)
    with pytest.raises(ValueError, match="netpbm"):
        M.decode_ppm(b"JFIF not a pnm")
    with pytest.raises(ValueError, match="truncated"):
        M.decode_ppm(b"P6\n100 100\n255\n\x00\x01")
    with pytest.raises(ValueError, match="malformed WAV"):
        M.decode_wav(b"RIFF\x00\x00\x00\x00WAVEjunkjunk")


def test_extract_features_routes_by_magic(spark):
    """extract_features mixes real decodes (netpbm dims/means, WAV
    rate/frames) with the declared fake for unrecognized (compressed)
    payloads in one mapInPandas pass."""
    import numpy as np

    from engine.ops import multimodal as M

    img = np.full((4, 6, 3), 200, np.uint8)
    wav = M.encode_wav(np.full(100, 1000, np.int16), 16000)
    rows = [
        ("a", "image", M.encode_ppm(img), 6, 4, None, None),
        ("b", "audio", wav, None, None, 16000, None),
        ("c", "image", b"\x89PNG fake compressed payload", None, None, None, None),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r["media_id"]: list(r["feature"]) for r in M.extract_features(media, dim=8).collect()}
    assert out["a"][:6] == [6.0, 4.0, 3.0, 200.0, 200.0, 200.0]  # w,h,c,means
    assert out["b"][0] == 16000.0 and out["b"][1] == 100.0 and out["b"][3] == 1000.0
    assert out["c"] != out["a"] and len(out["c"]) == 8  # deterministic fake


def test_resize_media_roundtrip(spark):
    """resize_media decodes netpbm payloads, nearest-neighbor resizes and
    re-encodes; non-image payloads pass through untouched. The resized
    payload must itself decode to the target shape with exact
    nearest-neighbor pixel values."""
    import numpy as np

    from engine.ops import multimodal as M

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (16, 12, 3)).astype(np.uint8)
    wav = M.encode_wav(np.zeros(10, np.int16), 8000)
    rows = [
        ("i", "image", M.encode_ppm(img), 12, 16, None, None),
        ("a", "audio", wav, None, None, 8000, None),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in M.resize_media(media, 6, 4).collect()}
    got = M.decode_ppm(bytes(out["i"]["content"]))
    np.testing.assert_array_equal(got, M.resize_image(img, 6, 4))
    assert (out["i"]["width"], out["i"]["height"]) == (6, 4)
    assert bytes(out["a"]["content"]) == wav  # untouched passthrough
    # pure-numpy resize semantics: exact index sampling
    np.testing.assert_array_equal(
        M.resize_image(img, 12, 16), img[(np.arange(16) * 16 // 16)][:, np.arange(12)]
    )
    with pytest.raises(ValueError, match="resize"):
        M.resize_image(img, 0, 4)


def test_kmeans_parallel_seed_covers_separated_blobs(spark):
    """k-means|| seeding (fully distributed: only O(rounds * l) candidate
    vectors reach the driver) must cover well-separated regions that a
    bounded uniform sample can miss, deterministically. The weighted
    reduction uses farthest-point init — a heaviest-k init measurably
    collapsed onto dense blobs (2 of 6 missed)."""
    import numpy as np

    from engine.ops import simsearch

    rng = np.random.default_rng(3)
    blobs = rng.standard_normal((6, 16)) * 10
    X = np.concatenate(
        [blobs[i] + 0.3 * rng.standard_normal((300, 16)) for i in range(6)]
    )
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    seed = simsearch.kmeans_parallel_seed(df, k=6, rounds=3, seed=7)
    assert seed.shape == (6, 16)
    assert np.array_equal(
        seed, simsearch.kmeans_parallel_seed(df, k=6, rounds=3, seed=7)
    )
    cents = simsearch.refine_centroids(df, seed, iters=3)
    d = np.sqrt(((blobs[:, None, :] - cents[None, :, :]) ** 2).sum(2)).min(axis=1)
    assert (d < 1.0).all(), d


def test_kmeans_parallel_seed_degenerate_corpus(spark):
    """All-identical vectors: cost goes to zero, sampling stops, and the
    seed pads to k by repetition instead of crashing; refinement leaves
    the empty cells frozen."""
    import numpy as np

    from engine.ops import simsearch

    df = spark.createDataFrame(
        [(int(i), [1.0, 2.0, 3.0, 4.0]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    seed = simsearch.kmeans_parallel_seed(df, k=4, rounds=2, seed=1)
    assert seed.shape == (4, 4)
    assert np.allclose(seed, [1.0, 2.0, 3.0, 4.0])
