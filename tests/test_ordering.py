"""Global ordered export: positions are a correct total order, the
plan range-partitions instead of single-task sorting, and skewed /
empty-partition shapes survive."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_spark.operators.ordering import (
    global_ordered_positions,
    global_running_totals,
)

SF_DIR = "/root/testdata/sf0.001"


def test_positions_match_driver_sort(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.length("text").alias("n")
    )
    out = global_ordered_positions(d, ["n", "doc_id"]).collect()
    got = [(r.position, r.doc_id) for r in sorted(out, key=lambda r: r.position)]
    want = sorted(((r.n, r.doc_id) for r in d.collect()))
    assert [p for p, _ in got] == list(range(1, len(want) + 1))
    assert [i for _, i in got] == [i for _n, i in want]


def test_range_exchange_no_global_sort(spark):
    """The pre-checkpoint stage must show Exchange rangepartitioning
    and a NON-global Sort (partition-local, the `false` flag) — the
    single-task global sort this operator exists to avoid."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.length("text").alias("n")
    )
    staged = d.repartitionByRange(4, F.col("n"), F.col("doc_id")).sortWithinPartitions(
        "n", "doc_id"
    )
    plan = staged._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    import re

    m = re.search(r"Sort \[[^\]]*\], (\w+), ", plan)
    assert m and m.group(1) == "false", plan[:500]  # partition-local sort


def test_running_totals_match_driver_prefix_sum(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.length("text").cast("long").alias("w")
    )
    out = {r.doc_id: r.cum for r in global_running_totals(d, ["doc_id"], "w", "cum").collect()}
    acc, want = 0, {}
    for doc_id, w in sorted((r.doc_id, r.w) for r in d.collect()):
        acc += w
        want[doc_id] = acc
    assert out == want


def test_running_totals_zero_weights_and_empty_partitions(spark):
    rows = [(i, 0 if i % 2 else i) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = {
        r.id: r.running_total
        for r in global_running_totals(df, ["id"], "w", num_partitions=32).collect()
    }
    acc, want = 0, {}
    for i, w in rows:
        acc += w
        want[i] = acc
    assert out == want


def test_positions_with_heavy_ties_and_more_partitions_than_rows(spark):
    rows = [(i, i % 3) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, grp long")
    out = {
        r.id: r.position
        for r in global_ordered_positions(df, ["grp", "id"], num_partitions=32).collect()
    }
    want = {i: pos + 1 for pos, (_g, i) in enumerate(sorted((g, i) for i, g in rows))}
    assert out == want
