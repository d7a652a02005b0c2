"""Distributed k-means (fixed-point Lloyd's) and the operators it
feeds: assignment exactness vs a pure-python reference, determinism,
empty-cluster handling, and SemDeDup semantics on planted duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_spark.operators.clustering import (
    KMEANS_SCALE,
    _tdiv,
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
    trained_centroids_f64,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_kmeans(vecs: dict[int, list[float]], k: int, n_iter: int):
    """Independent driver-side reference of the exact same algorithm:
    floor(x*SCALE) quantization, smallest-id init, int squared-L2
    argmin with smallest-j tie-break, sum-div-count update."""
    import math

    q = {
        i: [int(math.floor(float(x) * KMEANS_SCALE)) for x in v]
        for i, v in vecs.items()
    }
    cents = [list(q[i]) for i in sorted(q)[:k]]
    while len(cents) < k:
        cents.append(list(cents[-1]))

    def assign():
        out = {}
        for i, qi in q.items():
            best = None
            for j, c in enumerate(cents):
                d = sum((a - b) * (a - b) for a, b in zip(qi, c))
                if best is None or d < best[0]:
                    best = (d, j)
            out[i] = best
        return out

    for _ in range(n_iter):
        a = assign()
        for j in range(k):
            members = [q[i] for i, (_d, jj) in a.items() if jj == j]
            if members:
                n = len(members)
                cents[j] = [
                    _tdiv(sum(m[d] for m in members), n)
                    for d in range(len(cents[j]))
                ]
    return cents, assign()


def test_kmeans_assign_matches_python_reference(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").where(F.col("vec_id") < 60)
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    got = {
        r.id: (r.cluster_id, r.sq_dist)
        for r in kmeans_assign(base, k=4, n_iter=3).collect()
    }
    vecs = {r.id: list(r.v) for r in base.collect()}
    _cents, want = _py_kmeans(vecs, k=4, n_iter=3)
    assert got == {i: (j, d) for i, (d, j) in want.items()}


def test_kmeans_fit_deterministic(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").where(F.col("vec_id") < 80)
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    a = kmeans_fit(base, k=4, n_iter=2)
    b = kmeans_fit(base, k=4, n_iter=2)
    assert a == b
    assert len(a) == 4 and all(isinstance(x, int) for c in a for x in c)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """Three distinct points, k=4: the duplicated init centroid's
    cluster stays empty (ties assign to the smaller j) and must keep
    its previous centroid instead of dividing by zero."""
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "id long, v array<float>")
    cents = kmeans_fit(df, k=4, n_iter=2)
    assert len(cents) == 4
    assert cents[3] == cents[2] or cents[3] == [0, KMEANS_SCALE]
    assigned = {r.id: r.cluster_id for r in kmeans_assign(df, k=4, n_iter=2).collect()}
    assert set(assigned.values()) <= {0, 1, 2}  # nothing lands on the twin


def test_tdiv_truncates_toward_zero():
    assert _tdiv(7, 2) == 3
    assert _tdiv(-7, 2) == -3  # python -7 // 2 == -4: the guarded case
    assert _tdiv(0, 5) == 0


def test_semantic_dedup_finds_planted_duplicates(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    dup = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("id"), F.col("embedding").alias("v")
    )
    corpus = base.unionByName(dup)
    verdicts = {r.id: r.keeper_id for r in semantic_dedup(corpus, 0.99).collect()}
    planted = {r.vec_id for r in emb.where(F.col("vec_id") % 10 == 0).collect()}
    # every planted duplicate must be attributed to its original
    for vid in planted:
        assert verdicts.get(vid + 10000) == vid, (vid, verdicts.get(vid + 10000))
    # and nothing else pairs at 0.99 on the near-uniform test vectors
    assert set(verdicts) == {v + 10000 for v in planted}


def test_trained_centroids_shape_and_determinism(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    import numpy as np

    a = trained_centroids_f64(base, k=8, n_iter=2)
    b = trained_centroids_f64(base, k=8, n_iter=2)
    assert a.shape == (8, 64)
    assert (a == b).all()
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)
