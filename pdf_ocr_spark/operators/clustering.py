"""Distributed k-means training over embedding columns, and the two
operators it feeds: trained-codebook IVF and SemDeDup-style semantic
dedup (cluster, then prune near-duplicates inside each cluster — the
candidate set is bounded by cluster size, never corpus²; Abbas et al.
2023, "SemDeDup").

Exactness contract (the registry's value-hash oracle): the entire
training loop runs in FIXED-POINT INTEGER arithmetic so every iteration
is engine-portable bit-for-bit —

* inputs quantize as ``floor(x * 10^6)`` (float→double is exact, the
  multiply and floor are IEEE-identical in Spark and DuckDB);
* assignment is exact-integer squared-L2 argmin with smallest-index
  tie-break (numpy int64 matmul distributes it; ``argmin`` returns the
  first minimum, matching SQL's ``ORDER BY dist, j LIMIT 1``);
* the centroid update is an element-wise integer-division mean,
  ``sum DIV count`` (truncation toward zero — Spark's ``div`` and
  DuckDB's ``//`` agree, verified incl. negatives);
* initialization is the k rows with smallest id (no RNG).

Distribution shape (the 100 TB story): per Lloyd's iteration, ONE
narrow Arrow stage computes assignments (centroid matrix broadcast,
one integer matmul per batch — no per-row Python) and ONE keyed
aggregation reduces per-cluster sums (map-side partial combine makes
the exchange k × (dim+1) longs per partition); the driver sees only
the k×dim centroid table per round — control-plane-bounded, the same
budget as dedup_components' per-round label collect. The corpus is
scanned T times; persist/localCheckpoint the quantized base to pay
the scan once.

Reference scope note: the reference engine (fabriziosalmi/pdf-ocr) has
no clustering tier; this module is part of the LLM-training-data
operator family the build brief adds as first-class components.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

#: Fixed-point scale for the portable integer pipeline. 10^6 keeps
#: every intermediate in safe int64 range: |q| <= ~10^6 for unit-ish
#: embeddings, squared distances <= (2*10^6)^2 * dim ~ 2.6e14 at
#: dim=64, cluster sums <= 10^6 * cluster_size.
KMEANS_SCALE = 10**6


def quantize_col(vec: Column) -> Column:
    """``floor(x * 10^6)`` per element, as long — the engine-portable
    fixed-point embedding (same rounding-mode-free discipline as
    :func:`similarity.quantize_int8_col`)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * float(KMEANS_SCALE)).cast("long")
    )


def _tdiv(s: int, n: int) -> int:
    """Integer division truncating toward zero (Spark ``div`` /
    DuckDB ``//`` semantics; Python's ``//`` floors, which differs on
    negative sums)."""
    q = abs(s) // n
    return q if s >= 0 else -q


def _assign_kernel(bc_centroids):
    """mapInPandas kernel: exact int64 squared-L2 assignment of each
    batch against the broadcast centroid matrix. One vectorized matmul
    per Arrow batch, no per-row Python."""
    import numpy as np

    def kernel(batches):
        C = np.asarray(bc_centroids.value, dtype="int64")  # (k, d)
        c_sq = (C * C).sum(axis=1)  # (k,)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.array(list(pdf["q"]), dtype="int64")  # (n, d)
            # ||q - c||^2 = ||q||^2 - 2 q.c + ||c||^2 ; all int64-exact
            d2 = (Q * Q).sum(axis=1)[:, None] - 2 * (Q @ C.T) + c_sq[None, :]
            arg = d2.argmin(axis=1)  # first minimum == smallest-j tie-break
            out = pdf.copy()
            out["cluster_id"] = arg.astype("int32")
            out["sq_dist"] = d2[np.arange(len(Q)), arg]
            yield out

    return kernel


def _quantized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), quantize_col(F.col(vec_col)).alias("q")
    )


def _assign(base: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(id, q) -> (id, q, cluster_id, sq_dist) via the Arrow kernel."""
    bc = base.sparkSession.sparkContext.broadcast(centroids)
    schema = StructType(
        list(base.schema.fields)
        + [StructField("cluster_id", IntegerType()), StructField("sq_dist", LongType())]
    )
    return base.mapInPandas(_assign_kernel(bc), schema=schema)


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 4,
    id_col: str = "id",
    vec_col: str = "v",
) -> list[list[int]]:
    """Distributed Lloyd's with deterministic init: centroids start as
    the quantized vectors of the ``k`` smallest ids, then ``n_iter``
    rounds of (Arrow-batch integer assignment → one keyed mean-agg →
    driver-side k×dim centroid refresh). Empty clusters keep their
    previous centroid. Returns the final integer centroid matrix."""
    base = _quantized(df, id_col, vec_col).localCheckpoint(eager=True)
    first = base.select(F.size("q").alias("d")).first()
    if first is None:
        raise ValueError("kmeans_fit: empty input")
    dim = first["d"]
    init_rows = base.orderBy("id").limit(k).collect()
    centroids = [list(r["q"]) for r in init_rows]
    if not centroids:
        raise ValueError("kmeans_fit: empty input")
    while len(centroids) < k:
        # fewer distinct rows than clusters: duplicate the last (its
        # twin cluster just stays empty — deterministic either way)
        centroids.append(list(centroids[-1]))

    sums = [F.sum(F.element_at("q", i + 1)).alias(f"s{i}") for i in range(dim)]
    for _t in range(n_iter):
        assigned = _assign(base, centroids)
        stats = (
            assigned.groupBy("cluster_id")
            .agg(F.count("*").alias("n"), *sums)
            .collect()
        )
        new_c = [list(c) for c in centroids]  # empty clusters keep theirs
        for row in stats:
            j, n = row["cluster_id"], row["n"]
            new_c[j] = [_tdiv(row[f"s{i}"], n) for i in range(dim)]
        centroids = new_c
    return centroids


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 4,
    id_col: str = "id",
    vec_col: str = "v",
) -> DataFrame:
    """Fit ``n_iter`` rounds on ``df`` and return the final assignment
    (id, cluster_id, sq_dist) under the trained centroids — the
    exact-oracle surface (every step is portable integer arithmetic;
    see the module docstring)."""
    centroids = kmeans_fit(df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    base = _quantized(df, id_col, vec_col)
    return _assign(base, centroids).select(
        "id", F.col("cluster_id").cast("int").alias("cluster_id"), "sq_dist"
    )


def trained_centroids_f64(
    df: DataFrame,
    k: int,
    n_iter: int = 4,
    id_col: str = "id",
    vec_col: str = "v",
):
    """The k-means codebook as a row-normalized float64 numpy matrix —
    the drop-in replacement for :func:`similarity.ivf_centroids`
    (IVF's coarse quantizer cares about directions only)."""
    import numpy as np

    C = np.asarray(kmeans_fit(df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col),
                   dtype="float64")
    return C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.99,
    k: int = 8,
    n_iter: int = 4,
    id_col: str = "id",
    vec_col: str = "v",
) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means the corpus, then prune
    near-duplicates INSIDE each cluster only — the equi-join on
    cluster_id bounds candidates by Σ cluster_size² instead of corpus²
    (the whole point of clustering first). Emits (id, keeper_id) where
    keeper is the smallest same-cluster id whose round-6 cosine meets
    the threshold — the same min-neighbor verdict rule as
    dedup_decisions' near tier.

    Exactness: assignment is the integer k-means above; the cosine on
    candidate pairs is computed JVM-side from the summation-order-
    disciplined :func:`similarity.dot_col` / :func:`similarity.norm_col`
    folds (the per-row norms hoisted into the join-side projections —
    value-identical to ``cosine_col``: same expressions, same operands,
    same multiply order) and rounded to 6 before the threshold compare
    — identical to the DuckDB oracle's fold."""
    from pdf_ocr_spark.operators.similarity import dot_col, norm_col

    assigned = kmeans_assign(df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    tagged = assigned.join(vecs, "id").select("id", "cluster_id", "v")
    # materialize once: the self-join below would otherwise run the
    # whole k-means twice (same rationale as dedup's _materialize)
    tagged = tagged.localCheckpoint(eager=True)
    # Norms are per-ROW values: compute them once in each side's
    # projection instead of inside the pair predicate, where the
    # cosine's three interpreted array-folds re-ran per candidate
    # pair (the dominant cost — Σ size² pairs × 3 folds). The value is
    # bit-identical to cosine_col's: same norm_col expression over the
    # same operand, same na*nb multiply order, same divide.
    #
    # Salt the self-join when clusters are fewer than the cluster's
    # task slots (k << cores): id_a takes a deterministic salt,
    # the b-side replicates S ways, so the per-pair predicate work
    # spreads over k*S tasks instead of k. S auto-collapses to 1 once
    # k >= 2*parallelism — the deployment shape (k ∝ n) is untouched.
    par = df.sparkSession.sparkContext.defaultParallelism
    s_factor = max(1, -(-2 * par // max(1, k)))
    a = tagged.select(
        F.col("cluster_id"),
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        norm_col(F.col("v")).alias("na"),
        F.pmod(F.xxhash64("id"), F.lit(s_factor)).cast("int").alias("salt"),
    )
    b = tagged.select(
        F.col("cluster_id"),
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        norm_col(F.col("v")).alias("nb"),
        F.explode(F.sequence(F.lit(0), F.lit(s_factor - 1))).alias("salt"),
    )
    pairs = (
        a.join(b, ["cluster_id", "salt"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.round(
                dot_col(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            )
            >= threshold
        )
    )
    return pairs.groupBy(F.col("id_b").alias("id")).agg(
        F.min("id_a").alias("keeper_id")
    )
