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

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from pdf_ocr_spark import entrypoints  # noqa: E402


def _ship_package(spark: SparkSession) -> None:
    """Make pdf_ocr_spark importable on executor python workers even
    when the session's cwd is not the repo root: ship the package zip
    via addPyFile (idempotent per session)."""
    try:
        if getattr(spark, "_pdf_ocr_shipped", False):
            return
        zip_path = os.path.join(_REPO, "dist", "pdf_ocr_spark.zip")
        stale = True
        if os.path.exists(zip_path):
            zt = os.path.getmtime(zip_path)
            stale = any(
                f.endswith(".py") and os.path.getmtime(os.path.join(d, f)) > zt
                for d, _, fs in os.walk(os.path.join(_REPO, "pdf_ocr_spark"))
                for f in fs
            )
        if stale:
            sys.path.insert(0, os.path.join(_REPO, "scripts"))
            import make_pyfiles

            zip_path = make_pyfiles.main()
        spark.sparkContext.addPyFile(zip_path)
        spark._pdf_ocr_shipped = True
    except Exception:
        pass  # local cwd==repo still works without shipping


def entry(spark: SparkSession) -> DataFrame:
    """Flagship (driver contract): load the sf0.001 documents parquet,
    lift into the interleaved span model, run the full extraction."""
    _ship_package(spark)
    return entrypoints.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def call(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return call

    return {name: wrap(fn) for name, fn in entrypoints.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(entrypoints.ORACLES)
