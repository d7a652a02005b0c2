"""Fixed-point PageRank over a weighted host graph — the crawl-
prioritization / quality-weighting ranking step of a web-scale corpus
pipeline (CommonCrawl publishes exactly this artifact at the domain
level; curation pipelines consume it as a per-source quality prior).

Exactness: ranks are int64 fixed-point (total mass ``scale``), every
step is integer arithmetic with explicit truncating division — Spark's
``div`` and DuckDB's ``//`` agree on non-negative operands — so a
fixed iteration count is value-hash certifiable, the same discipline
as the Lloyd's k-means and BPE training oracles (operators/
clustering.py, operators/bpe.py).

Update rule per iteration (all integer)::

    contrib(v) = Σ over edges (u,v,w) of (rank(u) * w) div outw(u)
    dangle     = Σ rank(u) over nodes u with no out-edges
    rank'(v)   = (15 * (scale div N)) div 100
               + (85 * (contrib(v) + dangle div N)) div 100

i.e. damping 0.85 with uniform teleport and uniform dangling-mass
redistribution; per-edge truncation is part of the pinned spec.

Distribution shape (the 100 TB story): the edge table is built once
(one keyed agg over the harvested links) and localCheckpoint-ed; each
iteration is ONE shuffle — ranks equi-join edges on src (both sides
keyed by host; on a bucketed edge table the join co-locates) followed
by a dst-keyed sum with map-side partials. The dangling mass is a
1-row aggregate broadcast back (the bm25 stats-row budget) and the
node count is a one-off scalar. Nothing driver-side scales with the
graph; lineage is cut per round with localCheckpoint (the
dedup_components playbook).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed iteration count shared with the SQL-oracle generator in
#: entrypoints.py (single-source-of-truth discipline).
PAGERANK_ITERS = 4

#: Total fixed-point rank mass (int64): init rank = SCALE div N.
PAGERANK_SCALE = 10**9


def pagerank_fixed(
    edges: DataFrame, n_iter: int = PAGERANK_ITERS, scale: int = PAGERANK_SCALE
) -> DataFrame:
    """``edges`` = (src, dst, w:long) weighted multigraph, pre-
    aggregated (one row per (src, dst)). Returns (host, rank:long)
    for every node appearing as src or dst.

    Overflow envelope (the fixed-point contract's own bound): the
    per-edge contribution is ``(rank * w) div outw`` in int64, and
    ``rank`` is bounded by the total mass PAGERANK_SCALE (1e9), so a
    single (src, dst) aggregated weight must stay below ~2^63 / 1e9 ≈
    9.2e9 or the multiply wraps silently. Harvested link counts sit
    many orders below that; a caller feeding synthetic/overflowing
    multiplicities must cap w (or pre-scale it — PageRank is invariant
    to uniform per-src weight scaling) before calling."""
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # control-plane scalar: host cardinality
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    e = edges.join(outw, "src").localCheckpoint(eager=True)
    init = scale // n
    base = (15 * init) // 100
    ranks = nodes.select("host", F.lit(init).cast("long").alias("rank"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e["src"] == ranks["host"])
            .select(
                F.col("dst").alias("host"),
                F.expr("(rank * w) div outw").alias("part"),
            )
            .groupBy("host")
            .agg(F.sum("part").alias("contrib"))
        )
        dangle = (
            ranks.join(outw, ranks["host"] == outw["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dangle"))
        )
        ranks = (
            nodes.join(contrib, "host", "left")
            .crossJoin(F.broadcast(dangle))
            .select(
                "host",
                (
                    F.lit(base)
                    + F.expr(
                        f"(85 * (coalesce(contrib, 0) + dangle div {n})) div 100"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
