"""pagerank_fixed: the integer fixed-point spec replayed in pure
Python must match the distributed result exactly; structural
invariants (dangling redistribution, teleport floor) hold."""

from __future__ import annotations

from pdf_ocr_spark.operators.pagerank import (
    PAGERANK_SCALE,
    pagerank_fixed,
)


def _reference(edges, n_iter, scale=PAGERANK_SCALE):
    nodes = sorted({s for s, _d, _w in edges} | {d for _s, d, _w in edges})
    n = len(nodes)
    outw = {}
    for s, _d, w in edges:
        outw[s] = outw.get(s, 0) + w
    init = scale // n
    base = (15 * init) // 100
    rank = {v: init for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0 for v in nodes}
        for s, d, w in edges:
            contrib[d] += (rank[s] * w) // outw[s]
        dangle = sum(rank[v] for v in nodes if v not in outw)
        rank = {
            v: base + (85 * (contrib[v] + dangle // n)) // 100 for v in nodes
        }
    return rank


EDGES = [
    ("a", "b", 3),
    ("a", "c", 1),
    ("b", "a", 2),
    ("b", "c", 2),
    ("c", "d", 5),  # d is dangling: its mass must redistribute
    ("e", "a", 1),  # e has no in-links: rank pinned at the teleport floor
]


def test_matches_pure_python_replay(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string, w long")
    got = {r.host: r.rank for r in pagerank_fixed(df, n_iter=3).collect()}
    assert got == _reference(EDGES, 3)


def test_dangling_mass_and_teleport_floor(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string, w long")
    got = {r.host: r.rank for r in pagerank_fixed(df, n_iter=3).collect()}
    n = 5
    base = (15 * (PAGERANK_SCALE // n)) // 100
    # every node keeps at least the teleport floor; source-only node e
    # sits close to it (it also receives its share of d's dangling mass)
    assert all(v >= base for v in got.values())
    assert got["d"] > base  # everything c has flows into d
    # total mass stays within truncation loss of the scale
    assert 0 < sum(got.values()) <= PAGERANK_SCALE
    assert PAGERANK_SCALE - sum(got.values()) < n * 200
