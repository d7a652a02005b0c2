"""Span-level structural operators: explode, offset assignment, reassembly.

Two execution shapes (SURVEY §3.1):

* **array-native** — documents stay one-row-per-doc and span transforms
  run inside ``transform(spans, ...)``. Zero shuffle; the right shape
  whenever per-span work is a scalar expression. This is the default.
* **exploded** — ``explode_spans`` fans out to one row per span so that
  pathological many-page documents can spread across executors, and
  ``reassemble_spans`` restores the per-document ordered array (the
  reference's sorted-dict reassembly, /root/reference/app.py:548) with a
  single hash-shuffle on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def explode_spans(documents: DataFrame) -> DataFrame:
    """One row per span: (doc_id, offset, kind, text, media_ref).

    Equivalent of the reference's page fan-out (one OCR task per page,
    /root/reference/app.py:503-516). Uses the stored ``offset`` as the
    ordering key rather than array position so reassembly is stable even
    if upstream storage reordered the array.
    """
    s = F.explode("spans").alias("span")
    return documents.select(
        "doc_id",
        s,
    ).select(
        "doc_id",
        F.col("span.offset").alias("offset"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )


def assign_offsets(pages: DataFrame, order_col: str = "offset") -> DataFrame:
    """(Re)assign dense 0-based offsets per document by the given order
    column — ``row_number`` over a per-doc window (SURVEY §2.4)."""
    w = Window.partitionBy("doc_id").orderBy(F.col(order_col))
    return pages.withColumn("offset", (F.row_number().over(w) - F.lit(1)).cast("int"))


def reassemble_spans(pages: DataFrame) -> DataFrame:
    """Inverse of :func:`explode_spans`: collect each document's spans
    and restore offset order.

    ``collect_list`` gathers in arbitrary (completion) order — exactly
    like the reference's ``as_completed`` loop filling ``results[i]``
    (/root/reference/app.py:513-516) — then ``array_sort`` on a struct
    whose *leading* field is ``offset`` restores order, and a
    ``transform`` re-projects the canonical (kind, text, media_ref,
    offset) field order. One hash-shuffle on doc_id; map-side partial
    aggregation applies.
    """
    ordered_struct = F.struct(
        F.col("offset").alias("offset"),
        F.col("kind").alias("kind"),
        F.col("text").alias("text"),
        F.col("media_ref").alias("media_ref"),
    )
    collected = pages.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(ordered_struct)).alias("_ordered")
    )
    canonical = F.transform(
        F.col("_ordered"),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return collected.select("doc_id", canonical.alias("spans"))
