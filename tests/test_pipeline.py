"""End-to-end pipeline tests: span-sequence equality against the
deterministic corpus oracle, error-as-row semantics, salted reassembly
equivalence, and checkpoint/resume idempotency."""

from __future__ import annotations

import pytest

from pdf_ocr_spark import oracle
from pdf_ocr_spark.config import ExtractionConfig
from pdf_ocr_spark.operators.spans import explode_spans, reassemble_spans
from pdf_ocr_spark.plans.manifest import read_manifest, run_extraction
from pdf_ocr_spark.plans.pipeline import extract_documents
from pdf_ocr_spark.plans.salting import reassemble_spans_salted
from pdf_ocr_spark.sources.corpus import (
    _media_fate,
    expected_page_text,
    generate_documents,
    generate_media,
)

MISSING_RATE = 0.06
CORRUPT_RATE = 0.06
SEED = 42


def expected_output_span(doc_id: str, span) -> tuple[str, str, str, int]:
    """The span-equality oracle: what the pipeline must emit for one
    input span (kind, text, media_ref, offset)."""
    if span["kind"] == "text":
        return ("text", oracle.fix_common_ocr_errors(oracle.sanitize_text(span["text"])) or "", "", span["offset"])
    off = span["offset"]
    fate = _media_fate(doc_id, off, SEED)
    if fate < MISSING_RATE:
        text = (
            f"[Error: File not found: {span['media_ref']}. "
            "Ensure the file exists and is accessible.]"
        )
    elif fate < MISSING_RATE + CORRUPT_RATE:
        text = f"[Error processing page {off + 1}: not a PNG (bad signature)]"
    else:
        raw = expected_page_text(doc_id, off, SEED)
        text = oracle.fix_common_ocr_errors(oracle.sanitize_text(raw)) or ""
    return ("text", text, span["media_ref"], off)


@pytest.fixture(scope="module")
def corpus(spark):
    docs = generate_documents(spark, n_docs=60, seed=SEED).cache()
    media = generate_media(
        spark, docs, seed=SEED, missing_rate=MISSING_RATE, corrupt_rate=CORRUPT_RATE
    ).cache()
    return docs, media


def test_span_sequence_equality(spark, corpus):
    """North-rule invariant: per-document span-sequence equality on
    (kind, text, media_ref, order) against the oracle."""
    docs, media = corpus
    out = {r["doc_id"]: r for r in extract_documents(docs, media).collect()}
    inputs = docs.collect()
    assert len(out) == len(inputs)
    for row in inputs:
        want = [expected_output_span(row["doc_id"], s) for s in row["spans"]]
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in out[row["doc_id"]]["spans"]]
        assert got == want, f"span mismatch for {row['doc_id']}"


def test_serialized_outputs_match_oracle(spark, corpus):
    docs, media = corpus
    out = extract_documents(docs, media).collect()
    for row in out:
        pages = {s["offset"]: s["text"] for s in row["spans"]}
        assert row["txt"] == oracle.serialize_txt(pages)
        assert row["md"] == oracle.serialize_markdown(pages)
        assert row["html"] == oracle.serialize_html(pages, title=row["doc_id"])


def test_error_rows_present_not_fatal(spark, corpus):
    docs, media = corpus
    out = extract_documents(docs, media)
    n_err = out.selectExpr("sum(n_errors) as e").collect()[0]["e"]
    assert n_err > 0  # corpus injects missing+corrupt media
    # errors recorded as data; all documents still produced
    assert out.count() == docs.count()


def test_unsupported_engine_error_rows(spark, corpus):
    docs, media = corpus
    cfg = ExtractionConfig(ocr_engine="notreal")
    out = extract_documents(docs, media, cfg, serialize=False)
    bad = out.selectExpr(
        "exists(spans, s -> s.text = '[Error: Unsupported OCR engine: notreal]') as has_err",
        "size(filter(spans, s -> s.media_ref != '')) as n_img",
    ).collect()
    for r in bad:
        assert (r["n_img"] == 0) or r["has_err"]


def test_salted_reassembly_equivalent(spark, corpus):
    docs, _ = corpus
    pages = explode_spans(docs)
    plain = {r["doc_id"]: r["spans"] for r in reassemble_spans(pages).collect()}
    salted = {r["doc_id"]: r["spans"] for r in reassemble_spans_salted(pages, n_salt=4).collect()}
    assert plain == salted


def test_resume_is_idempotent(spark, corpus, tmp_path):
    """FIXTURES F4: run killed after k buckets, rerun with same run_id ->
    completed buckets skipped, final output identical to uninterrupted."""
    docs, media = corpus
    n_buckets = 8

    interrupted = str(tmp_path / "interrupted")
    clean = str(tmp_path / "clean")

    # simulated partial run (only buckets 0-2 survive before the "kill")
    k1 = run_extraction(
        spark, docs, media, interrupted, "run1", n_buckets=n_buckets, only_buckets=[0, 1, 2]
    )
    assert 0 < k1 <= 3
    # resume: must process only the remaining buckets
    k2 = run_extraction(spark, docs, media, interrupted, "run1", n_buckets=n_buckets)
    m = read_manifest(spark, interrupted)
    assert m.where("status = 'completed'").count() == k1 + k2

    # uninterrupted reference run
    run_extraction(spark, docs, media, clean, "run1", n_buckets=n_buckets)

    a = spark.read.parquet(f"{interrupted}/documents").select("doc_id", "txt").orderBy("doc_id")
    b = spark.read.parquet(f"{clean}/documents").select("doc_id", "txt").orderBy("doc_id")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_auto_salted_reassembly_equivalent(spark, corpus):
    from pdf_ocr_spark.plans.salting import reassemble_spans_auto_salted

    docs, _ = corpus
    pages = explode_spans(docs)
    plain = {r["doc_id"]: r["spans"] for r in reassemble_spans(pages).collect()}
    # low thresholds so the hot path actually engages on the 50-200-span docs
    auto = {
        r["doc_id"]: r["spans"]
        for r in reassemble_spans_auto_salted(pages, hot_threshold=40, target_per_group=25).collect()
    }
    assert plain == auto


def test_span_equality_with_skewed_pages(spark):
    """Pages rendered with shear (deskew path) still meet the
    span-sequence-equality contract end-to-end."""
    docs = generate_documents(spark, n_docs=25, seed=55)
    media = generate_media(spark, docs, seed=55, shear_rate=0.5)
    out = {r["doc_id"]: r for r in extract_documents(docs, media).collect()}
    for row in docs.collect():
        for s in row["spans"]:
            if s["kind"] != "image":
                continue
            want = oracle.fix_common_ocr_errors(
                oracle.sanitize_text(expected_page_text(row["doc_id"], s["offset"], 55))
            ) or ""
            got = [t["text"] for t in out[row["doc_id"]]["spans"] if t["offset"] == s["offset"]][0]
            assert got == want, (row["doc_id"], s["offset"])


def test_salted_join_equivalent(spark):
    from pyspark.sql import functions as F

    from pdf_ocr_spark.plans.salting import salted_join

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dims = (
        e.groupBy("user_id").agg(F.count("*").alias("user_events"))
    )
    plain = e.join(dims, "user_id").select("event_id", "user_events")
    salted = salted_join(e, dims, key="user_id", salt_from="event_id", n_salt=8).select(
        "event_id", "user_events"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_resume_tolerates_duplicate_manifest_rows(spark, corpus, tmp_path):
    """Concurrent or retried runs can append duplicate manifest rows
    (e.g. two drivers racing on the same run_id); resume must stay
    correct: distinct completed buckets, idempotent bucket overwrite."""
    docs, media = corpus
    out = str(tmp_path / "dup")
    run_extraction(spark, docs, media, out, "run1", n_buckets=4, only_buckets=[0, 1])
    # simulate a racing driver double-appending the same manifest rows
    n_before = read_manifest(spark, out).count()
    read_manifest(spark, out).write.mode("append").parquet(f"{out}/_manifest")
    assert read_manifest(spark, out).count() == 2 * n_before
    k = run_extraction(spark, docs, media, out, "run1", n_buckets=4)
    assert k == 2  # only the genuinely missing buckets ran
    # output has every document exactly once
    got = spark.read.parquet(f"{out}/documents")
    assert got.count() == docs.count()
    assert got.select("doc_id").distinct().count() == docs.count()


def test_salted_pipeline_equivalent(spark, corpus):
    """extract_documents with reassembly_salt produces identical spans,
    serializations, and metrics to the plain single-stage pipeline."""
    docs, media = corpus
    plain = {r["doc_id"]: r for r in extract_documents(docs, media).collect()}
    salted_cfg = ExtractionConfig(reassembly_salt=4)
    salted = {r["doc_id"]: r for r in extract_documents(docs, media, salted_cfg).collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        a, b = plain[k], salted[k]
        assert [tuple(s) for s in a["spans"]] == [tuple(s) for s in b["spans"]]
        assert a["txt"] == b["txt"] and a["n_pages"] == b["n_pages"]
        assert a["n_errors"] == b["n_errors"]
        assert abs(a["mean_confidence"] - b["mean_confidence"]) < 1e-9
