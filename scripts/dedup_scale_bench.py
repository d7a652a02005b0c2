#!/usr/bin/env python
"""Data-scale replication for the near-dup candidate-join claim.

The 10x/100x smoke (BENCH.md "Data-scale smoke") has only ever run the
flagship extraction; this script runs the MinHash+LSH near-dup
pipeline at a multiple of the bench corpus so the "cost tracks
duplicate density, not corpus^2" claim carries a measured number:
rows in, LSH candidate pairs, Jaccard-confirmed pairs, runtime.

The corpus is synthesized deterministically ON THE EXECUTORS
(spark.range -> hash-derived word sequences — same text shape as the
driver's testdata: ~50-word documents over a bounded vocabulary), with
planted duplicates: every 10th document gets a verbatim copy
(id + 10M) and every 25th a near-copy with its first two words
changed (id + 20M) — so expected-confirmed-pairs scales linearly and
a quadratic candidate blowup would be unmissable in the pair counts.

Usage:
    python scripts/dedup_scale_bench.py              # 10x (50k docs)
    python scripts/dedup_scale_bench.py --docs 500000 --cpus 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, n_docs: int):
    from pyspark.sql import functions as F

    base = spark.range(n_docs).select(
        F.col("id").cast("long").alias("id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(49)),
                lambda i: F.concat(
                    F.lit("w"),
                    (F.xxhash64(F.col("id") * 57 + i) % 5000).cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    )
    verbatim = base.where(F.col("id") % 10 == 0).select(
        (F.col("id") + 10_000_000).alias("id"), "text"
    )
    near = base.where(F.col("id") % 25 == 0).select(
        (F.col("id") + 20_000_000).alias("id"),
        F.concat(F.lit("xx yy "), F.expr("substring_index(text, ' ', -48)")).alias(
            "text"
        ),
    )
    return base.unionByName(verbatim).unionByName(near)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000, help="base documents (10x bench default)")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("dedup-scale-bench")
        .config("spark.sql.shuffle.partitions", str(max(32, args.cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    from pdf_ocr_spark.operators.dedup import lsh_candidate_pairs, minhash_near_dup

    # materialize the corpus OUTSIDE the timed region (parquet on disk,
    # like the flagship smoke) so the bench measures dedup, not synthesis
    corpus_dir = os.path.join(tempfile.gettempdir(), f"dedup_scale_{args.docs}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        build_corpus(spark, args.docs).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    n_rows = corpus.count()

    t0 = time.time()
    confirmed = minhash_near_dup(
        corpus, text_col="text", id_col="id", threshold=args.threshold
    )
    n_confirmed = confirmed.count()
    elapsed = time.time() - t0

    # candidate count on its own pass (reported, not part of the timed
    # confirm run — it re-executes the LSH stage)
    n_candidates = lsh_candidate_pairs(
        corpus, text_col="text", id_col="id"
    ).count()

    expected_verbatim = (args.docs + 9) // 10
    print(
        json.dumps(
            {
                "metric": "minhash_lsh_near_dup_scale",
                "docs_in": n_rows,
                "base_docs": args.docs,
                "lsh_candidate_pairs": n_candidates,
                "confirmed_pairs": n_confirmed,
                "expected_min_pairs": expected_verbatim,
                "seconds": round(elapsed, 1),
                "docs_per_sec": round(n_rows / elapsed),
                "cpus": args.cpus,
                "candidates_per_doc": round(n_candidates / n_rows, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
