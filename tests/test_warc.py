"""Tests for the WARC (ISO 28500) subset reader/writer and the
crawl-archive -> boilerplate-strip composition."""

import gzip
import io

import pytest

from pdf_ocr_spark.sources.warcsource import parse_warc, write_warc


def test_roundtrip_plain_and_gzip():
    recs = [
        ("doc-1", "https://a.example.com/1", "<p>one</p>"),
        ("doc-2", "https://a.example.com/2", "<p>two &amp; three</p>"),
    ]
    for compress in (False, True):
        data = write_warc(recs, compress=compress)
        if compress:
            assert data[:2] == b"\x1f\x8b"
            # per-record members: two gzip magics present
            assert data.count(b"\x1f\x8b\x08") >= 2
        out = parse_warc(data)
        assert [(r["record_id"], r["target_uri"], r["payload"]) for r in out] == [
            ("doc-1", "https://a.example.com/1", "<p>one</p>"),
            ("doc-2", "https://a.example.com/2", "<p>two &amp; three</p>"),
        ]
        assert all(r["warc_type"] == "response" for r in out)


def test_payload_may_contain_warc_magic():
    """Content-Length is the only safe cut: a payload containing
    'WARC/1.0' must not desync the parser."""
    evil = "before WARC/1.0\r\nWARC-Type: fake\r\n\r\n after"
    data = write_warc([("doc-9", "https://x/9", evil)])
    out = parse_warc(data)
    assert len(out) == 1 and out[0]["payload"] == evil


def test_write_is_byte_stable():
    recs = [("doc-1", "https://a/1", "<p>x</p>")]
    assert write_warc(recs, compress=True) == write_warc(recs, compress=True)


def test_malformed_warc_typed_errors():
    with pytest.raises(ValueError, match="version line"):
        parse_warc(b"NOT-WARC\r\n\r\n")
    good = write_warc([("doc-1", "https://a/1", "<p>x</p>")])
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(good.replace(b"Content-Length", b"X-Length"))
    with pytest.raises(ValueError, match="shorter"):
        parse_warc(good[:-6])


def test_foreign_warc_layout_parses():
    """A record written by another producer: extra headers, LF-ish
    spacing quirks tolerated, unknown record type kept."""
    body = b"<html><body><p>hi</p></body></html>"
    rec = (
        b"WARC/1.1\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"WARC-Record-ID: <urn:uuid:abc-123>\r\n"
        b"X-Custom: whatever\r\n"
        + b"Content-Length: %d\r\n" % len(body)
        + b"\r\n"
        + body
        + b"\r\n\r\n"
    )
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(rec)
    out = parse_warc(buf.getvalue())
    assert out[0]["record_id"] == "abc-123"
    assert out[0]["warc_type"] == "resource"
    assert out[0]["payload"] == body.decode()


def test_spark_warc_corpus_roundtrip(spark, tmp_path):
    """write_warc_corpus shards -> binaryFile scan -> record fan-out ->
    boilerplate strip equals direct extraction from the HTML corpus."""
    from pyspark.sql import functions as F

    from pdf_ocr_spark.operators.webextract import extract_main_text
    from pdf_ocr_spark.sources.warcsource import read_warc_records, write_warc_corpus
    from pdf_ocr_spark.sources.webgen import generate_html_corpus

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc {i} " * (1 + i % 4), "en") for i in range(25)],
        "doc_id LONG, text STRING, lang STRING",
    )
    html = generate_html_corpus(docs)
    out = str(tmp_path / "warc")
    manifest = write_warc_corpus(html, out, docs_per_file=10).collect()
    assert sum(m["n_records"] for m in manifest) == 25
    assert len(manifest) == 3  # 25 docs / 10 per shard

    recs = read_warc_records(spark, out).select(
        F.regexp_extract("record_id", r"^doc-(\d+)$", 1).cast("long").alias("doc_id"),
        F.col("payload").alias("html"),
    )
    got = {r["doc_id"]: r["main_text"] for r in extract_main_text(recs).collect()}
    want = {r["doc_id"]: r["main_text"] for r in extract_main_text(html).collect()}
    assert got == want and len(got) == 25


def test_poison_pill_file_becomes_error_row(spark, tmp_path):
    """One damaged archive in the scan directory costs one diagnosable
    parse_error row, not the job."""
    from pdf_ocr_spark.sources.warcsource import read_warc_records, write_warc

    good = write_warc([("doc-1", "https://a/1", "<p>fine</p>")])
    (tmp_path / "a.warc").write_bytes(good)
    (tmp_path / "b.warc").write_bytes(b"GARBAGE not a warc at all")
    bad_len = good.replace(b"Content-Length", b"X-Length")
    (tmp_path / "c.warc").write_bytes(bad_len)

    rows = read_warc_records(spark, str(tmp_path)).collect()
    ok = [r for r in rows if r["parse_error"] is None]
    bad = {r["path"].rsplit("/", 1)[-1]: r["parse_error"] for r in rows if r["parse_error"]}
    assert len(ok) == 1 and ok[0]["record_id"] == "doc-1"
    assert set(bad) == {"b.warc", "c.warc"}
    assert "version line" in bad["b.warc"] and "Content-Length" in bad["c.warc"]
