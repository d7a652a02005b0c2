"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship span-model extraction pipeline;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline operators) as
(spark, sf_dir) -> DataFrame callables with DuckDB-checkable ANSI-SQL
twins. Implementation lives in :mod:`pdf_ocr_spark.entrypoints`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pdf_ocr_spark import entrypoints  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: generated interleaved corpus -> OCR decode -> normalize
    -> ordered reassembly -> txt serialization (+ per-doc metrics)."""
    return entrypoints.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(entrypoints.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(entrypoints.ORACLES)
