"""Streaming surface tests: the streaming pipeline must produce exactly
the batch pipeline's results (the kernel is batch/stream agnostic)."""

from __future__ import annotations

import pytest

from pdf_ocr_spark.operators.normalize import normalize_documents
from pdf_ocr_spark.plans.pipeline import extract_documents
from pdf_ocr_spark.sources.corpus import generate_documents, generate_media
from pdf_ocr_spark.streaming.stream import stream_extract, stream_normalize


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    docs = generate_documents(spark, n_docs=40, seed=11)
    docs.write.parquet(str(root / "in"))
    media = generate_media(spark, docs, seed=11).cache()
    return root, media


def test_stream_normalize_matches_batch(spark, staged):
    root, _ = staged
    q = stream_normalize(
        spark, str(root / "in"), str(root / "norm_out"), str(root / "norm_ckpt")
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in spark.read.parquet(str(root / "norm_out")).collect()
    }
    want = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in normalize_documents(spark.read.parquet(str(root / "in"))).collect()
    }
    assert got == want


def test_stream_extract_matches_batch(spark, staged):
    root, media = staged
    q = stream_extract(
        spark, str(root / "in"), media, str(root / "ex_out"), str(root / "ex_ckpt")
    )
    q.awaitTermination(180)
    got = {
        r["doc_id"]: (r["txt"], [tuple(s) for s in r["spans"]])
        for r in spark.read.parquet(str(root / "ex_out")).collect()
    }
    batch = extract_documents(spark.read.parquet(str(root / "in")), media)
    want = {
        r["doc_id"]: (r["txt"], [tuple(s) for s in r["spans"]]) for r in batch.collect()
    }
    assert got == want


def test_stream_is_incremental(spark, staged):
    """New files appended to the input dir are picked up by a later
    availableNow run without reprocessing the old ones."""
    root, media = staged
    more = generate_documents(spark, n_docs=10, seed=99).withColumnRenamed("doc_id", "doc_id")
    more = more.selectExpr("concat('late_', doc_id) as doc_id", "spans")
    more.write.mode("append").parquet(str(root / "in"))
    late_media = generate_media(spark, more, seed=11)
    q = stream_extract(
        spark, str(root / "in"), media.unionByName(late_media), str(root / "ex_out"), str(root / "ex_ckpt")
    )
    q.awaitTermination(180)
    out = spark.read.parquet(str(root / "ex_out"))
    # 40 originals exactly once + 10 late docs
    assert out.count() == 50
    assert out.where("doc_id like 'late_%'").count() == 10


def test_stream_extract_replay_is_idempotent(spark, staged):
    """foreachBatch is at-least-once: a micro-batch that fails between a
    partial write and the checkpoint commit is replayed with the SAME
    batch_id. The dynamic-partition-overwrite sink must make the replay
    a no-op (no duplicate rows)."""
    from pdf_ocr_spark.streaming.stream import write_extract_batch

    root, media = staged
    out = str(root / "replay_out")
    q = stream_extract(spark, str(root / "in"), media, out, str(root / "replay_ckpt"))
    q.awaitTermination(180)
    n_before = spark.read.parquet(out).count()
    # replay batch 0 verbatim: re-run the exact per-batch write with the
    # original input and the original batch_id
    batch0 = spark.read.parquet(str(root / "in"))
    write_extract_batch(batch0, 0, media, out)
    after = spark.read.parquet(out)
    assert after.count() == n_before
    assert after.select("doc_id").distinct().count() == n_before


def test_stream_reassemble_books_matches_batch(spark, tmp_path):
    """The driver-visible streaming query: per-micro-batch reassembly
    over book-bucketed files equals the global batch reassembly, and
    the drain really was incremental (several batch_id partitions)."""
    import pyspark.sql.functions as F

    from pdf_ocr_spark.functions.serialize import txt_doc_col
    from pdf_ocr_spark.streaming.stream import stream_reassemble_books

    pages = spark.createDataFrame(
        [(b, p, f"book {b} page {p} text") for b in range(17) for p in range(b % 4 + 1)],
        "book_id long, page int, text string",
    )
    got = stream_reassemble_books(spark, pages, str(tmp_path / "wd"), n_batches=4)
    spans = F.array_sort(
        F.collect_list(F.struct(F.col("page").alias("offset"), F.col("text").alias("text")))
    )
    want = pages.groupBy("book_id").agg(txt_doc_col(spans).alias("txt"))
    g = {r["book_id"]: r["txt"] for r in got.collect()}
    w = {r["book_id"]: r["txt"] for r in want.collect()}
    assert g == w
    batches = {
        r["batch_id"]
        for r in spark.read.parquet(str(tmp_path / "wd" / "out")).select("batch_id").distinct().collect()
    }
    assert len(batches) > 1  # the work really arrived in micro-batches


def test_stream_pdf_profiles_matches_batch(spark, tmp_path):
    """The second driver-visible streaming query, over REAL binary
    inputs: the incremental binaryFile-stream profile harvest equals
    the one-scan batch profile row-for-row, and the drain really was
    incremental (several batch_id partitions)."""
    import numpy as np

    from pdf_ocr_spark.sources.pdfcodec import encode_pdf
    from pdf_ocr_spark.sources.pdfsource import read_pdf_profiles
    from pdf_ocr_spark.streaming.stream import stream_pdf_profiles

    pdf_dir = tmp_path / "pdfs"
    pdf_dir.mkdir()
    img = np.zeros((40, 30), dtype=np.uint8)
    for d in range(13):
        links = [[f"https://s.example/{d}/{i}"] if (d + i) % 2 == 0 else [] for i in range(d % 3 + 1)]
        blob = encode_pdf(
            [img] * (d % 3 + 1),
            compress=True,
            object_streams=True,
            info={"Title": f"Doc {d}"},
            page_links=links,
        )
        (pdf_dir / f"doc_{d}.pdf").write_bytes(blob)
    got = stream_pdf_profiles(spark, str(pdf_dir), str(tmp_path / "wd"), n_batches=4)
    want = read_pdf_profiles(spark, str(pdf_dir))
    key = lambda r: r["doc_id"]  # noqa: E731
    g = sorted(map(tuple, got.collect()), key=lambda t: t[0])
    w = sorted(map(tuple, want.collect()), key=lambda t: t[0])
    assert g == w
    assert len(g) == 13
    batches = {
        r["batch_id"]
        for r in spark.read.parquet(str(tmp_path / "wd" / "out"))
        .select("batch_id").distinct().collect()
    }
    assert len(batches) > 1  # the corpus really arrived in micro-batches


def test_stream_dedup_exact_matches_batch(spark, tmp_path):
    """The third driver-visible streaming query: per-micro-batch exact
    dedup over hash-bucketed files equals the global batch dedup, and
    the drain really was incremental."""
    from pdf_ocr_spark.operators.dedup import exact_dedup_groups
    from pdf_ocr_spark.streaming.stream import stream_dedup_exact

    rows = [(i, f"doc {i % 7} body text") for i in range(40)]  # 7 groups
    corpus = spark.createDataFrame(rows, "id long, text string")
    got = stream_dedup_exact(spark, corpus, str(tmp_path / "wd"), n_batches=4, id_col="id")
    want = exact_dedup_groups(corpus, text_col="text", id_col="id")
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) == 7
    batches = {
        r["batch_id"]
        for r in spark.read.parquet(str(tmp_path / "wd" / "out"))
        .select("batch_id").distinct().collect()
    }
    assert len(batches) > 1
