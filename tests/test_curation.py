"""Tests for the resumable corpus-curation run (plans/curation.py)."""

import pyspark.sql.functions as F
import pytest

from pdf_ocr_spark.operators.curation import filter_verdicts
from pdf_ocr_spark.plans.curation import read_curated, run_curation


@pytest.fixture()
def docs(spark):
    rows = []
    for i in range(60):
        if i % 7 == 0:
            text = "tiny"  # low quality (short, no stopwords)
        elif i % 11 == 0:
            text = "the same line merge the same line merge the same line"  # repetitive
        elif i % 5 == 0:
            text = "the shared duplicate body of document for the and of to in is that"  # dup group
        else:
            text = f"the unique body {i} of document for the and of to in is that words {i}"
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_full_run_matches_batch_filter(spark, docs, tmp_path):
    out = str(tmp_path / "cur")
    n = run_curation(spark, docs, out, run_id="r1", n_buckets=8)
    assert n == 8 or n > 0
    got = {r["doc_id"] for r in read_curated(spark, out).collect()}
    want = {
        r["doc_id"]
        for r in filter_verdicts(docs).where(F.col("verdict") == "keep").collect()
    }
    assert got == want and got
    # exactly one keeper from the planted duplicate group
    dup_ids = {i for i in range(60) if i % 5 == 0 and i % 7 and i % 11}
    assert len(got & dup_ids) == 1


def test_resume_is_idempotent(spark, docs, tmp_path):
    out = str(tmp_path / "cur")
    # killed run: only 3 buckets complete
    n1 = run_curation(spark, docs, out, run_id="r1", n_buckets=8, only_buckets=[0, 1, 2])
    assert n1 == 3
    # resume finishes the rest without re-writing completed buckets
    n2 = run_curation(spark, docs, out, run_id="r1", n_buckets=8)
    assert n2 == 5
    rows = read_curated(spark, out).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))  # no duplicates from the overlap
    want = {
        r["doc_id"]
        for r in filter_verdicts(docs).where(F.col("verdict") == "keep").collect()
    }
    assert set(ids) == want
    # same run again: everything already completed
    assert run_curation(spark, docs, out, run_id="r1", n_buckets=8) == 0


def test_manifest_admission_metrics(spark, docs, tmp_path):
    out = str(tmp_path / "cur")
    run_curation(spark, docs, out, run_id="r1", n_buckets=4)
    m = spark.read.parquet(str(tmp_path / "cur" / "_manifest"))
    agg = m.agg(
        F.sum("n_docs_in").alias("n_in"), F.sum("n_docs_kept").alias("n_kept")
    ).first()
    assert agg["n_in"] == 60
    kept = read_curated(spark, out).count()
    assert agg["n_kept"] == kept
