"""A3/A5: job-level metrics via Observation (the Spark-native progress
channel replacing the reference's polled TASK_STATUS dict)."""

from __future__ import annotations

from pyspark.sql import Observation

from pdf_ocr_spark.plans.pipeline import extract_documents
from pdf_ocr_spark.sources.corpus import generate_documents, generate_media


def test_observation_metrics(spark):
    docs = generate_documents(spark, n_docs=25, seed=3)
    media = generate_media(spark, docs, seed=3, missing_rate=0.1)
    obs = Observation("extract")
    out = extract_documents(docs, media, observation=obs)
    n = out.count()  # action materializes the observed metrics
    m = obs.get
    assert m["n_docs"] == n == 25
    assert m["n_pages"] > 0
    assert m["n_errors"] >= 0
    assert 0.0 <= m["mean_confidence"] <= 1.0
