"""Shuffle-free bucketed join: the executed plan of a join between two
tables bucketed on the same key must contain zero Exchange operators,
and its result must equal the plain (shuffling) join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_ocr_spark.plans.bucketing import bucketed_join, exchange_count, save_bucketed
from pdf_ocr_spark.sources.corpus import generate_documents, generate_media


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    docs = generate_documents(spark, n_docs=60, seed=5)
    from pdf_ocr_spark.operators.spans import explode_spans

    pages = explode_spans(docs).where(F.col("kind") == "image").select(
        "doc_id", "offset", "media_ref"
    )
    media = generate_media(spark, docs, seed=5)
    save_bucketed(pages, "pages_b", "media_ref", n_buckets=4, path=str(root / "pages"))
    save_bucketed(media, "media_b", "media_ref", n_buckets=4, path=str(root / "media"))
    yield pages, media
    spark.sql("DROP TABLE IF EXISTS pages_b")
    spark.sql("DROP TABLE IF EXISTS media_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "pages_b", "media_b", "media_ref")
        joined.collect()  # materialize so the executed plan is final
        assert exchange_count(joined) == 0, (
            joined._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_shuffles_for_contrast(spark, bucketed):
    pages, media = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = pages.join(media, "media_ref")
        plain.collect()
        assert exchange_count(plain) > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_result_matches_plain(spark, bucketed):
    pages, media = bucketed
    got = sorted(
        (r.media_ref, r.doc_id, r.offset)
        for r in bucketed_join(spark, "pages_b", "media_b", "media_ref")
        .select("media_ref", "pages_b.doc_id", "offset")
        .collect()
    )
    want = sorted(
        (r.media_ref, r.doc_id, r.offset)
        for r in pages.join(media, "media_ref").select("media_ref", pages.doc_id, "offset").collect()
    )
    assert got == want
