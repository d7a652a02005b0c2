"""Corpus curation: the composed keep/drop admission filter.

The per-document verdict combines, in priority order:

1. **exact-dup demotion** — only the min-id keeper of each
   normalized-text hash group survives (one window over the hash);
2. **quality floor** — the cheap pretraining quality blend
   (:func:`pdf_ocr_spark.operators.analysis.quality_score_col`);
3. **repetition cap** — duplicate-line fraction.

Quality and repetition are pure JVM expressions, so the whole verdict
is scan -> window -> project: one shuffle at any corpus size.
Thresholds compare the ``round(6)`` values the cross-engine oracle
hash-matches on, so verdict boundaries cannot drift between Spark and
the SQL twin (entrypoints.py ``corpus_filter_verdict``).

:func:`pdf_ocr_spark.plans.curation.run_curation` wraps this in the
bucket-checkpointed, idempotently-resumable job shape used for
extraction runs.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_ocr_spark.operators.analysis import dup_fraction_col, quality_score_col
from pdf_ocr_spark.operators.dedup import norm_text_col

#: Verdict thresholds (compared on round(6) values).
QUALITY_FLOOR = 0.5
DUP_LINE_CAP = 0.3


def filter_verdicts(documents: DataFrame) -> DataFrame:
    """(doc_id, text, ...) -> (doc_id, quality, dup_line_frac,
    keeper_id, verdict) — verdict in
    {'keep', 'exact_dup', 'low_quality', 'repetitive'}."""
    d = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").cast("string").alias("text"),
    )
    lines = F.filter(
        F.split(F.replace(F.col("text"), F.lit(" merge "), F.lit("\n")), r"\n"),
        lambda x: x != "",
    )
    scored = d.select(
        "doc_id",
        quality_score_col(F.col("text")).alias("quality"),
        dup_fraction_col(lines).alias("dup_line_frac"),
        F.min("doc_id")
        .over(Window.partitionBy(F.md5(norm_text_col(F.col("text")))))
        .alias("keeper_id"),
    )
    return scored.select(
        "doc_id",
        "quality",
        "dup_line_frac",
        "keeper_id",
        F.when(F.col("doc_id") != F.col("keeper_id"), F.lit("exact_dup"))
        .when(F.col("quality") < QUALITY_FLOOR, F.lit("low_quality"))
        .when(F.col("dup_line_frac") > DUP_LINE_CAP, F.lit("repetitive"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
    )
