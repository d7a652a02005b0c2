"""Grouped-map (applyInPandas) operators — the UDAF-shaped extension
surface (SURVEY §2.6).

``reassemble_spans_grouped`` is the pandas formulation of the ordered
reassembly: same single hash-shuffle as the aggregate version, but the
per-document merge runs as Arrow-batched pandas code — the escape hatch
for reassembly logic that outgrows column expressions (e.g. cross-span
dedup, layout stitching). Kept result-identical to
``reassemble_spans`` by an equivalence test.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

from pdf_ocr_spark.schema import DOCUMENTS_SCHEMA


def reassemble_spans_grouped(pages: DataFrame) -> DataFrame:
    """applyInPandas inverse of explode_spans: one group per doc_id,
    spans sorted by offset inside the pandas kernel."""

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("offset")
        spans = [
            {
                "kind": k,
                "text": t,
                "media_ref": m,
                "offset": int(o),
            }
            for k, t, m, o in zip(pdf["kind"], pdf["text"], pdf["media_ref"], pdf["offset"])
        ]
        return pd.DataFrame({"doc_id": [pdf["doc_id"].iloc[0]], "spans": [spans]})

    return pages.groupBy("doc_id").applyInPandas(assemble, schema=DOCUMENTS_SCHEMA)
