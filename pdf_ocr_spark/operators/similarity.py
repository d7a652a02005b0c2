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
