"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant (random-hyperplane signs derived from portable MD5 hashing) is
the scale path — candidates meet in a bucket equi-join instead of a
cross join.

Floating point discipline for the DuckDB oracle: elements are cast to
double *before* multiplication and summed left-to-right by
``F.aggregate`` (sequential fold), mirroring DuckDB's list evaluation;
scores are rounded to 6 decimals and ranking orders by the rounded
score with id tie-break, so engine-level ULP noise cannot flip ranks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k: broadcast the (small) query side against the
    corpus, rank per query by rounded cosine desc, neighbor id asc.
    Excludes self-matches. Output: (query_id, rank, neighbor_id, score).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qvec"), F.col("cvec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "id",
    vec_col: str = "v",
) -> DataFrame:
    """Block-matrix cosine near-dup join: the scale path for pairwise
    similarity.

    One side is collected + broadcast as a row-normalized numpy matrix
    (fine while it fits executor memory — at 100 TB you block *both*
    sides and cross the blocks); each Arrow batch of the other side
    does a single BLAS matmul against it and emits (id_a < id_b) pairs
    above the threshold. Replaces a cross-join carrying two float
    arrays per row with one matmul per batch — measured 99 s -> <1 s on
    2.2k x 64 at sf0.1.
    """
    import numpy as np
    import pandas as pd

    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype="int64")
    mat = np.array([r[vec_col] for r in rows], dtype="float64")
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def kernel(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(list(pdf[vec_col]), dtype="float64")
            block /= np.linalg.norm(block, axis=1, keepdims=True)
            scores = block @ all_mat.T
            bi, bj = np.nonzero(scores >= threshold)
            left = pdf[id_col].to_numpy()[bi]
            right = all_ids[bj]
            keep = left < right
            yield pd.DataFrame({"id_a": left[keep], "id_b": right[keep]})

    return df.select(id_col, vec_col).mapInPandas(kernel, schema="id_a long, id_b long")


def hyperplane_sign_col(vec: Column, plane: int, dim: int) -> Column:
    """Sign of <vec, h_plane> where h_plane[i] = +1/-1 from the top bit
    of md5('{plane}:{i}') — a deterministic, engine-portable random
    hyperplane."""
    idx = F.sequence(F.lit(1), F.size(vec))
    prods = F.transform(
        idx,
        lambda i: F.element_at(vec, i.cast("int")).cast("double")
        * F.when(
            F.substring(F.md5(F.concat(F.lit(f"{plane}:"), (i - 1).cast("string"))), 1, 1).isin(
                "8", "9", "a", "b", "c", "d", "e", "f"
            ),
            1.0,
        ).otherwise(-1.0),
    )
    s = F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))


def lsh_bucket_col(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket id (n_planes sign bits)."""
    return F.concat(*[hyperplane_sign_col(vec, p, dim) for p in range(n_planes)])


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact ranking *within* the query's LSH bucket.
    At scale the bucket equi-join replaces the cross join; recall is
    traded via n_planes."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        lsh_bucket_col(F.col(vec_col), n_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        lsh_bucket_col(F.col(vec_col), n_planes).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qvec"), F.col("cvec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )
