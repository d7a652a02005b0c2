#!/usr/bin/env python
"""Measure the shuffle-byte reduction of dedup_substring_hashed.

dedup_substring shuffles (window_text, id) pairs into its corpus-wide
aggregation; dedup_substring_hashed shuffles (xxhash64, id) — 8-byte
keys — and rehydrates text only for duplicated-hash candidate groups.
Both produce byte-identical output (shared oracle SQL). This script
runs each form in its own job group and reads per-stage
shuffleWriteBytes from the local Spark UI REST API, reporting total
shuffle bytes written per query and the reduction factor. The number
lands in BENCH.md's round-6 section.

Usage:
    python scripts/shuffle_bytes_bench.py                     # sf0.01
    python scripts/shuffle_bytes_bench.py --sf /root/testdata/sf0.1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ui_json(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.loads(r.read().decode())


def _stage_metrics(base: str, app_id: str) -> dict[int, dict]:
    stages = _ui_json(base, f"/api/v1/applications/{app_id}/stages?status=complete")
    return {s["stageId"]: s for s in stages}


def _job_shuffle_bytes(base: str, app_id: str, group: str) -> tuple[int, int]:
    """(shuffle bytes written, records written) summed over every stage
    of every job in the given job group."""
    jobs = _ui_json(base, f"/api/v1/applications/{app_id}/jobs")
    stage_ids: set[int] = set()
    for j in jobs:
        if j.get("jobGroup") == group:
            stage_ids.update(j.get("stageIds", []))
    stages = _stage_metrics(base, app_id)
    by = sum(stages[s]["shuffleWriteBytes"] for s in stage_ids if s in stages)
    rec = sum(stages[s]["shuffleWriteRecords"] for s in stage_ids if s in stages)
    return by, rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pdf_ocr_spark.entrypoints import QUERIES

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("shuffle-bytes-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        # compression hides the key-width difference; measure what
        # actually crosses the wire in both forms, compressed, as a
        # cluster would ship it (defaults: lz4 on)
        .getOrCreate()
    )
    sc = spark.sparkContext
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}" if sc.uiWebUrl else "http://localhost:4049"
    app_id = sc.applicationId

    out: dict[str, dict] = {}
    for name in ("dedup_substring", "dedup_substring_hashed"):
        sc.setJobGroup(name, name)
        t0 = time.time()
        n = QUERIES[name](spark, args.sf).count()
        wall = time.time() - t0
        sc.setJobGroup("idle", "idle")
        time.sleep(1.0)  # let the status store drain
        by, rec = _job_shuffle_bytes(base, app_id, name)
        out[name] = {
            "rows": n,
            "wall_sec": round(wall, 2),
            "shuffle_bytes_written": by,
            "shuffle_records_written": rec,
        }
        print(f"{name}: rows={n} wall={wall:.2f}s shuffle={by/1e6:.2f} MB ({rec} records)")

    plain = out["dedup_substring"]["shuffle_bytes_written"]
    hashed = out["dedup_substring_hashed"]["shuffle_bytes_written"]
    factor = plain / hashed if hashed else float("inf")
    print(
        json.dumps(
            {
                "sf": args.sf,
                "queries": out,
                "shuffle_reduction_factor": round(factor, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
