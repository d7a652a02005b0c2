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
