"""Skew-aware salted reassembly (SURVEY §4 custom job logic #1).

A document with millions of pages would make the plain
``groupBy(doc_id)`` put its whole span list through one reducer. The
salted form is the classic two-stage re-merge:

  stage 1: group on (doc_id, salt) where salt = pmod(hash(offset), S)
           -> S partial lists per hot doc, each sorted
  stage 2: group on doc_id, flatten + re-sort the partials

Both stages get map-side partial aggregation; the hot key's data now
crosses the wire in S pieces landing on S different reducers. ``flatten
+ array_sort`` on stage 2 is cheap because partials are presorted and
small relative to executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str,
    n_salt: int = 16,
) -> DataFrame:
    """Skew-robust equi-join: the dim side is replicated ``n_salt``
    times with a salt column, each fact row picks a deterministic salt
    from ``salt_from`` (any high-cardinality fact column), and the join
    key becomes (key, salt) — a hot key's rows now land on ``n_salt``
    reducers instead of one. Result identical to ``fact.join(dim, key)``
    (equivalence-tested). AQE's skew-join split covers sort-merge joins
    adaptively; this explicit form also works for storage-partitioned
    joins and fixed plans."""
    dim_salted = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    fact_salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salt)).cast("int")
    )
    return fact_salted.join(dim_salted, [key, "_salt"]).drop("_salt")


def reassemble_spans_auto_salted(
    pages: DataFrame, hot_threshold: int = 10_000, target_per_group: int = 5_000
) -> DataFrame:
    """Skew-adaptive reassembly: salt counts derive from the measured
    per-document span histogram (SURVEY §4 — 'salt count derives from
    size(spans) histogram').

    1. one cheap count-agg finds hot documents (> hot_threshold spans)
       and assigns each ``salt_n = ceil(count / target_per_group)``;
    2. the (tiny) hot map is **broadcast**-joined onto pages; cold docs
       get salt 0 and flow through the plain single-stage aggregate,
       hot docs are split into salt_n partial lists and re-merged.

    Cost: one extra scan for the histogram + a broadcast join — no
    extra shuffle for the (overwhelmingly common) cold documents.
    Output identical to :func:`reassemble_spans_salted` / the plain
    aggregate (equivalence-tested).
    """
    hot = (
        pages.groupBy("doc_id")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > hot_threshold)
        .select(
            "doc_id",
            F.ceil(F.col("_n") / F.lit(target_per_group)).cast("int").alias("_salt_n"),
        )
    )
    salted = pages.join(F.broadcast(hot), "doc_id", "left").withColumn(
        "_salt",
        F.when(
            F.col("_salt_n").isNotNull(),
            F.pmod(F.xxhash64("offset"), F.col("_salt_n")),
        ).otherwise(F.lit(0)),
    )
    ordered_struct = F.struct(
        F.col("offset").alias("offset"),
        F.col("kind").alias("kind"),
        F.col("text").alias("text"),
        F.col("media_ref").alias("media_ref"),
    )
    partials = salted.groupBy("doc_id", "_salt").agg(
        F.array_sort(F.collect_list(ordered_struct)).alias("_partial")
    )
    merged = partials.groupBy("doc_id").agg(
        F.array_sort(F.flatten(F.collect_list("_partial"))).alias("_ordered")
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
    return merged.select("doc_id", canonical.alias("spans"))


def reassemble_spans_salted(pages: DataFrame, n_salt: int = 16) -> DataFrame:
    """Salted inverse of explode_spans. Output matches
    :func:`pdf_ocr_spark.operators.spans.reassemble_spans` exactly."""
    ordered_struct = F.struct(
        F.col("offset").alias("offset"),
        F.col("kind").alias("kind"),
        F.col("text").alias("text"),
        F.col("media_ref").alias("media_ref"),
    )
    partials = (
        pages.withColumn("_salt", F.pmod(F.xxhash64("offset"), F.lit(n_salt)))
        .groupBy("doc_id", "_salt")
        .agg(F.array_sort(F.collect_list(ordered_struct)).alias("_partial"))
    )
    merged = partials.groupBy("doc_id").agg(
        F.array_sort(F.flatten(F.collect_list("_partial"))).alias("_ordered")
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
    return merged.select("doc_id", canonical.alias("spans"))
