"""ANN variants: IVF top-k degenerates to exact search at full probe,
and partial probing keeps reasonable recall on the test embeddings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_ocr_spark.operators.similarity import cosine_topk, ivf_centroids, ivf_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_ivf_full_probe_equals_exact(spark, emb):
    q = emb.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.rank): r.neighbor_id for r in cosine_topk(q, emb, k=3).collect()
    }
    ivf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(q, emb, k=3, n_lists=8, n_probe=8).collect()
    }
    assert ivf == exact


def test_ivf_partial_probe_recall(spark, emb):
    q = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(q, emb, k=3).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(q, emb, k=3, n_lists=8, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall  # half the lists probed; embeddings are
    # near-uniform (max pairwise cos ~0.5) so this is a loose floor


def test_ivf_centroids_deterministic_unit():
    import numpy as np

    a = ivf_centroids(16, 4)
    b = ivf_centroids(16, 4)
    assert (a == b).all()
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)
    assert not np.allclose(a[0], a[1])


def test_lsh_zero_planes_degenerates_to_exact(spark, emb):
    """n_planes=0 puts everything in one bucket: lsh_topk must equal
    brute-force exactly (the degeneracy that pins its semantics)."""
    from pdf_ocr_spark.operators.similarity import lsh_topk

    q = emb.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in cosine_topk(q, emb, k=3).collect()
    }
    lsh = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in lsh_topk(q, emb, k=3, n_planes=0).collect()
    }
    assert lsh == exact


def test_lsh_topk_scores_are_exact_within_bucket(spark, emb):
    """Approximation lives ONLY in candidate selection: every returned
    score must equal the true cosine (checked against brute-force
    all-pairs scores), and ranks must be dense from 1."""
    from pdf_ocr_spark.operators.similarity import lsh_topk

    q = emb.where(F.col("vec_id") < 10)
    truth = {
        (r.query_id, r.neighbor_id): r.score
        for r in cosine_topk(q, emb, k=10**6).collect()
    }
    rows = lsh_topk(q, emb, k=3, n_planes=4).collect()
    by_q = {}
    for r in rows:
        assert truth[(r.query_id, r.neighbor_id)] == r.score
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_embedding_near_dup_lsh_equals_exact_on_planted_dups(spark, emb):
    """The LSH-prefiltered near-dup composition must return the same
    pairs as the exact blocked matmul at a high threshold: planted
    identical vectors collide in every bucket table."""
    from pdf_ocr_spark.operators.similarity import (
        embedding_near_dup_lsh,
        embedding_near_dup_pairs,
    )

    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    dup = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("id"), F.col("embedding").alias("v")
    )
    corpus = base.unionByName(dup)
    exact = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(corpus, 0.99).collect()}
    lsh = {(r.id_a, r.id_b) for r in embedding_near_dup_lsh(corpus, 0.99).collect()}
    assert exact  # the planted duplicates must exist
    assert lsh == exact


def test_dim0_wide_vector_fails_loudly(spark):
    """dim=0 slices a _PLANE_MAX_DIM-wide plane literal to size(vec);
    a wider vector must raise, not null-poison every sign bit."""
    from pdf_ocr_spark.operators.similarity import _PLANE_MAX_DIM, lsh_bucket_col

    wide = spark.range(1).select(
        F.array_repeat(F.lit(1.0), _PLANE_MAX_DIM + 1).alias("v")
    )
    with pytest.raises(Exception, match="_PLANE_MAX_DIM"):
        wide.select(lsh_bucket_col(F.col("v"), n_planes=2, dim=0)).collect()
    ok = spark.range(1).select(F.array_repeat(F.lit(1.0), 16).alias("v"))
    assert ok.select(lsh_bucket_col(F.col("v"), n_planes=2, dim=0).alias("b")).first()[
        "b"
    ] == "11"


def test_int8_recall_vs_float_path(spark, emb):
    """Quantized ranking must track the float baseline closely: 127
    levels keep cosine error ~1e-3, so top-3 overlap stays high."""
    from pdf_ocr_spark.operators.similarity import int8_topk

    q = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(q, emb, k=3).collect()}
    quant = {(r.query_id, r.neighbor_id) for r in int8_topk(q, emb, k=3).collect()}
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, recall


def test_int8_quantization_range_and_scale_invariance(spark):
    from pdf_ocr_spark.operators.similarity import quantize_int8_col

    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 4.0]), (2, [0.25, -0.5, 1.0]), (3, [0.0, 0.0, 0.0])],
        "id int, v array<float>",
    )
    out = {r["id"]: r["q"] for r in df.select("id", quantize_int8_col(F.col("v")).alias("q")).collect()}
    assert out[1] == [32, -63, 127]  # floor(127*x/4 + 0.5)
    assert out[2] == out[1]  # same direction, 4x smaller scale -> same codes
    assert out[3] == [0, 0, 0]  # zero vector guard


def test_hnsw_degenerate_ef_equals_exact(spark, emb):
    """ef_search >= shard size makes every local search exhaustive:
    hnsw_topk must equal brute force exactly — ids, ranks, scores."""
    from pdf_ocr_spark.operators.similarity import hnsw_topk

    q = emb.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in cosine_topk(q, emb, k=3).collect()
    }
    hnsw = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in hnsw_topk(q, emb, k=3, ef_search=10**9, n_shards=8).collect()
    }
    assert hnsw == exact


def test_hnsw_graph_search_recall(spark, emb):
    """The REAL graph walk (ef well below corpus size) keeps recall@3
    >= 0.8 vs brute force on the test embeddings — the working-setting
    evidence the degenerate form can't give."""
    from pdf_ocr_spark.operators.similarity import hnsw_topk

    q = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(q, emb, k=3).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in hnsw_topk(q, emb, k=3, ef_search=32, n_shards=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall


def test_hnsw_index_local_recall_unit():
    """Pure-index unit check (no Spark): on a deterministic random
    corpus the layered beam search at ef=64 recovers >= 90% of true
    top-5 neighbors, builds are deterministic, and ef >= n returns the
    exact ordering."""
    import numpy as np

    from pdf_ocr_spark.operators.similarity import HnswIndex

    rng = np.random.RandomState(11)
    X = rng.randn(400, 32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    idx_a = HnswIndex(X, m=8, ef_construction=64)
    idx_b = HnswIndex(X, m=8, ef_construction=64)
    assert idx_a.links == idx_b.links  # deterministic build
    sims = X @ X.T
    hits = total = 0
    for qi in range(0, 50):
        true = set(np.argsort(-sims[qi])[:5])
        got = {j for _s, j in idx_a.search(X[qi], 5, ef=64)}
        hits += len(true & got)
        total += 5
    assert hits / total >= 0.9, hits / total
    # ef >= n: exact ordering
    got = [j for _s, j in idx_a.search(X[0], 5, ef=10**9)]
    assert got == list(np.argsort(-sims[0])[:5])


def test_ivf_trained_recall_at_least_hash_recall(spark, emb):
    """The trained coarse quantizer (k-means codebook) must buy
    equal-or-better recall than the hash-derived stand-in at the SAME
    n_probe — the reason to train at all. Deterministic end to end
    (integer k-means, fixed data), so this is a pin, not a flake."""
    from pdf_ocr_spark.operators.clustering import trained_centroids_f64
    from pdf_ocr_spark.operators.similarity import ivf_topk

    q = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(q, emb, k=3).collect()}
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    cents = trained_centroids_f64(base, k=8, n_iter=4)
    trained = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(q, emb, k=3, n_lists=8, n_probe=4, centroids=cents).collect()
    }
    hashed = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(q, emb, k=3, n_lists=8, n_probe=4).collect()
    }
    r_trained = len(exact & trained) / len(exact)
    r_hash = len(exact & hashed) / len(exact)
    assert r_trained >= r_hash, (r_trained, r_hash)
    assert r_trained >= 0.5, r_trained
