"""Grouped-map equivalence + custom stateful streaming assembler."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pdf_ocr_spark.operators.grouped import reassemble_spans_grouped
from pdf_ocr_spark.operators.spans import explode_spans, reassemble_spans
from pdf_ocr_spark.sources.corpus import generate_documents
from pdf_ocr_spark.streaming.stream import (
    assemble_pages_stateful,
    stream_windowed_event_counts,
)


def test_grouped_reassembly_equivalent(spark):
    docs = generate_documents(spark, n_docs=30, seed=21)
    pages = explode_spans(docs)
    agg = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in reassemble_spans(pages).collect()}
    grp = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in reassemble_spans_grouped(pages).collect()
    }
    assert agg == grp


def test_windowed_event_counts(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    path = str(tmp_path / "ev")
    events.write.parquet(path)
    q = stream_windowed_event_counts(spark, path, events.schema, query_name="wec_test")
    q.awaitTermination(120)
    got = spark.table("wec_test")
    # streaming windowed agg == batch windowed agg
    want = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )
    g = sorted([(r["w"]["start"], r["event_type"], r["n"], round(r["sum_value"], 6)) for r in got.collect()])
    w = sorted([(r["w"]["start"], r["event_type"], r["n"], round(r["sum_value"], 6)) for r in want.collect()])
    assert g == w and len(g) > 0


def test_stateful_page_assembly(spark, tmp_path):
    """Pages of each doc split across two input files (out-of-order,
    cross-micro-batch); the stateful operator emits each document once,
    complete, with spans in offset order."""
    docs = generate_documents(spark, n_docs=20, seed=31)
    pages = explode_spans(docs).join(
        docs.select("doc_id", F.size("spans").alias("n_total")), "doc_id"
    )
    # split pages into two files: even offsets then odd offsets
    root = tmp_path / "pages_in"
    pages.where(F.col("offset") % 2 == 0).coalesce(1).write.mode("append").parquet(str(root))
    pages.where(F.col("offset") % 2 == 1).coalesce(1).write.mode("append").parquet(str(root))

    stream = (
        spark.readStream.schema(pages.schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(str(root))
    )
    out = assemble_pages_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("assembled_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("assembled_test").collect()
    want = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in docs.collect()}
    got_map = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in got}
    assert all(r["complete"] for r in got)
    assert got_map == want  # every doc exactly once, ordered, nothing lost
