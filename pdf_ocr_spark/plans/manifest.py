"""Checkpointed, resumable extraction runs (SURVEY §4 #2, FIXTURES F4).

The unit of checkpointing is a *bucket*: ``pmod(xxhash64(doc_id), B)``.
A run:

1. reads the manifest, collects this run_id's completed buckets,
2. anti-joins them away (the reference's resume analogue: its task
   lifecycle at /root/reference/app.py:593-628 restarts whole jobs;
   we restart at bucket granularity),
3. extracts the remaining documents,
4. writes output parquet partitioned by bucket with **dynamic partition
   overwrite** — so re-processing a bucket is idempotent by
   construction (a half-written bucket from a killed run is simply
   overwritten),
5. appends manifest rows (status='completed', per-bucket metrics)
   only *after* the output write action has succeeded — two-phase, so
   the manifest never claims a bucket whose data didn't commit.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_ocr_spark.config import ExtractionConfig
from pdf_ocr_spark.plans.pipeline import extract_documents
from pdf_ocr_spark.schema import MANIFEST_SCHEMA


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _output_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "documents")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    path = _manifest_dir(out_dir)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def expire_manifest(spark: SparkSession, out_dir: str, ttl_seconds: float) -> int:
    """S10 retention: drop manifest rows older than the TTL (the
    reference deletes stale uploads/tasks by mtime,
    /root/reference/app.py:76-102). Parquet has no row deletes, so this
    rewrites the manifest filtered — with Iceberg it would be a
    metadata-only ``DELETE WHERE ts < cutoff``. Returns rows kept.

    The rewrite stays distributed end to end: kept rows go to a
    sibling staging directory (same filesystem as the manifest, so
    this works on HDFS/S3A paths too, unlike a driver-local tempdir)
    and are then re-read and swapped in — rows never round-trip
    through the driver, so manifest size is bounded by executor, not
    driver, memory. Staging cleanup goes through the Hadoop
    FileSystem API (resolved for the staging URI), so the claim holds
    on distributed filesystems too — a local shutil.rmtree would
    silently leave HDFS/S3A staging dirs to accumulate. A crash
    between the staging write and the final overwrite leaves the old
    manifest intact plus an orphan staging dir; the orphan is swept
    on the next expiration's entry, so re-running converges."""
    m = read_manifest(spark, out_dir)
    kept = m.where(
        F.col("ts") >= F.from_unixtime(F.unix_timestamp(F.current_timestamp()) - F.lit(int(ttl_seconds))).cast("timestamp")
    )
    path = _manifest_dir(out_dir)
    staging = path + "_expiring"
    _hadoop_delete(spark, staging)  # sweep a crashed run's orphan
    kept.write.mode("overwrite").parquet(staging)
    staged = spark.read.schema(MANIFEST_SCHEMA).parquet(staging)
    n_kept = staged.count()
    staged.write.mode("overwrite").parquet(path)
    _hadoop_delete(spark, staging)
    return n_kept


def _hadoop_delete(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` via the Hadoop FileSystem resolved
    for its URI — works for file://, hdfs://, s3a:// alike. Missing
    paths are a no-op (delete returns False)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark._jsc.hadoopConfiguration()
    fs = jpath.getFileSystem(conf)
    fs.delete(jpath, True)


def completed_buckets(spark: SparkSession, out_dir: str, run_id: str) -> DataFrame:
    return (
        read_manifest(spark, out_dir)
        .where((F.col("run_id") == run_id) & (F.col("status") == "completed"))
        .select(F.col("partition_id").alias("bucket"))
        .distinct()
    )


def run_extraction(
    spark: SparkSession,
    documents: DataFrame,
    media: DataFrame,
    out_dir: str,
    run_id: str,
    config: ExtractionConfig | None = None,
    n_buckets: int = 32,
    only_buckets: list[int] | None = None,
) -> int:
    """Execute (or resume) an extraction run. Returns the number of
    buckets processed in this invocation.

    ``only_buckets`` is a test hook simulating a run killed after k
    buckets (FIXTURES F4 resume test).
    """
    cfg = config or ExtractionConfig()
    t0 = time.time()

    docs = documents.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"))
    if only_buckets is not None:
        docs = docs.where(F.col("bucket").isin([int(b) for b in only_buckets]))

    done = completed_buckets(spark, out_dir, run_id)
    todo = docs.join(F.broadcast(done), "bucket", "left_anti")

    extracted = extract_documents(todo.drop("bucket"), media, cfg).withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )

    with_overwrite = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            extracted.write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(_output_dir(out_dir))
        )
    finally:
        if with_overwrite is not None:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", with_overwrite)
        else:
            # restore to unset — leaving 'dynamic' behind would change
            # the semantics of later partitioned overwrites in the
            # caller's session (same leak run_curation fixed)
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")

    # Phase 2: the write committed — derive per-bucket lineage metrics
    # from the freshly written output (cheap: metadata + two narrow
    # columns) and append manifest rows.
    todo_buckets = [r["bucket"] for r in todo.select("bucket").distinct().collect()]
    if not todo_buckets:
        return 0
    elapsed = time.time() - t0
    written = spark.read.parquet(_output_dir(out_dir)).where(F.col("bucket").isin(todo_buckets))
    stats = (
        written.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_pages").alias("n_pages"),
            F.avg("mean_confidence").alias("mean_confidence"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.col("bucket").alias("partition_id"),
            F.lit(None).cast("int").alias("salt"),
            F.lit("completed").alias("status"),
            "n_docs",
            "n_pages",
            "mean_confidence",
            F.lit(float(elapsed)).alias("elapsed_s"),
            F.current_timestamp().alias("ts"),
        )
    )
    stats.write.mode("append").parquet(_manifest_dir(out_dir))
    return len(todo_buckets)
