"""Bucketed-table (shuffle-free) joins — the Iceberg stand-in.

PLANS.md's 100 TB story for the media join is "bucket both tables by
``media_ref`` so the pages⋈media join is storage-partitioned and
shuffle-free". No Iceberg runtime jar exists in this container, but
Spark's built-in bucketed parquet tables (``bucketBy`` + ``sortBy`` +
``saveAsTable``) give the same physical property: both sides are
hash-partitioned *on disk* into the same number of buckets, so the
sort-merge join reads co-located buckets and the plan contains **no
Exchange** — at 10^12 documents that is the difference between
re-shuffling the whole corpus per join and a pure scan+merge.

``tests/test_bucketing.py`` asserts the no-Exchange property on the
executed plan; this module is the production write/read path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and sorted) by
    ``key``. Joins between tables bucketed on the same key with the
    same bucket count are shuffle-free; the sortBy additionally removes
    the per-bucket sort from sort-merge joins."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With both
    sides bucketed identically this compiles to a zero-Exchange
    sort-merge join (verified by :func:`exchange_count`)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def exchange_count(df: DataFrame) -> int:
    """Number of *shuffle* Exchange operators in the executed physical
    plan — the assertion primitive for shuffle-free claims.
    BroadcastExchange is excluded: broadcasting a small side moves no
    partitioned data and a broadcast-join plan is still shuffle-free."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "ReusedExchange" not in line
        and "BroadcastExchange" not in line
    )
