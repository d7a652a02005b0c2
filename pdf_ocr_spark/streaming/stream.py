"""Structured Streaming surface: incremental document extraction.

The reference has no streaming — each upload is a batch job polled over
HTTP (/root/reference/app.py:593-628, templates/status.html backoff
polling). The Spark-native equivalent of "documents keep arriving" is a
stream over the documents table; the extraction kernel is batch/stream
agnostic, so:

* stateless span normalization runs directly on the stream
  (``stream_normalize``) — pure projection, append mode;
* the full pipeline (OCR kernel + per-document reassembly, which needs
  a per-doc aggregation) runs via ``foreachBatch`` reusing the *exact*
  batch plan (``stream_extract``) — each micro-batch is a bounded
  batch job appended to the output, the standard incremental-ETL shape.

Progress/metrics flow through StreamingQueryProgress (the analogue of
the reference's TASK_STATUS polling endpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pdf_ocr_spark.config import ExtractionConfig
from pdf_ocr_spark.operators.normalize import normalize_documents
from pdf_ocr_spark.plans.pipeline import extract_documents
from pdf_ocr_spark.schema import DOCUMENTS_SCHEMA


def stream_normalize(
    spark: SparkSession,
    input_path: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Stateless streaming normalization of text spans (M2+M5) —
    the kernel as a pure streaming projection, no state store."""
    stream = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_path)
    writer = (
        normalize_documents(stream)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_extract(
    spark: SparkSession,
    input_path: str,
    media: DataFrame,
    out_path: str,
    checkpoint: str,
    config: ExtractionConfig | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Full incremental extraction via foreachBatch: every micro-batch
    of arriving documents runs the identical batch pipeline (OCR decode
    -> normalize -> reassemble -> serialize) and appends to the output
    table. Exactly-once per micro-batch via the streaming checkpoint."""
    cfg = config or ExtractionConfig()
    stream = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        extract_documents(batch_df, media, cfg).write.mode("append").parquet(out_path)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
