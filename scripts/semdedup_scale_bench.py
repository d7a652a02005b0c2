#!/usr/bin/env python
"""SemDeDup candidate-linearity evidence.

The registered `dedup_semantic` query fixes k=8 so its unrolled-CTE
oracle stays tractable — at a FIXED k, cluster sizes grow with the
corpus and the intra-cluster candidate count grows quadratically.
That is not how SemDeDup deploys: k scales with the corpus (the paper
uses tens of thousands of clusters) so the expected cluster size — and
with it candidates per document — stays CONSTANT. The operator takes
`k` as a parameter; this script measures candidate pairs per document
at three corpus scales with k ∝ n and records that the ratio holds
(the same methodology as scripts/dedup_scale_bench.py's MinHash
constant).

Candidates are counted exactly from the assignment table
(Σ size·(size−1)/2 over clusters) — no pair join is executed, so the
measurement isolates the quantity that matters.

Usage: python scripts/semdedup_scale_bench.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pdf_ocr_spark.operators.clustering import kmeans_assign

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("semdedup-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for sf, docs_per_cluster in (("sf0.001", 250), ("sf0.01", 250), ("sf0.1", 250)):
        emb = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet").select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("v")
        )
        n = emb.count()
        k = max(2, n // docs_per_cluster)
        assigned = kmeans_assign(emb, k=k, n_iter=4)
        sizes = assigned.groupBy("cluster_id").agg(F.count("*").alias("s"))
        cand = sizes.agg(
            F.sum(F.col("s") * (F.col("s") - 1) / 2).alias("c")
        ).collect()[0]["c"]
        rows.append(
            {
                "sf": sf,
                "n": n,
                "k": k,
                "candidates": int(cand),
                "candidates_per_doc": round(cand / n, 2),
            }
        )
        print(json.dumps(rows[-1]))
    print(json.dumps({"rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
