"""Self-check of the driver contract: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB over sf0.001, compare row counts,
column names, and (order-insensitive) values — the same comparison the
round driver performs at sf0.01."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

import os

# dress-rehearse the driver's sf0.01 comparison with
#   ORACLE_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_queries_oracle.py
SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 9) if not (math.isnan(v) or math.isinf(v)) else repr(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


QUERY_NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = sdf.collect()

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only contract: must run and have a stable schema
        assert isinstance(srows, list)
        return

    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"

    s_norm = _normalize([tuple(r[c] for c in dcols) for r in srows], dcols)
    d_norm = _normalize(drows, dcols)
    mismatches = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches, first: {mismatches[0]}"


def test_approx_error(spark):
    """Pin the HLL estimator's relative error against the exact twin.

    approx_count_distinct's default rsd is 0.05; HLL's error is
    probabilistic, so pin a generous-but-meaningful envelope (4×rsd =
    20%) per group — a regression to a broken sketch (off by 2×, or
    constant) fails loudly, while normal estimator noise passes."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in entry_mod.queries()["approx_distinct_users"](spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in entry_mod.queries()["distinct_users_exact"](spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    for etype, n in exact.items():
        rel_err = abs(approx[etype] - n) / max(n, 1)
        assert rel_err <= 0.20, f"{etype}: approx={approx[etype]} exact={n} rel_err={rel_err:.3f}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 500  # one output doc per sf0.001 documents row
    assert {"doc_id", "n_pages", "n_errors", "mean_confidence", "txt"} <= set(df.columns)
    # every document gained exactly one decoded image page
    assert all(r["n_pages"] >= 2 for r in rows)
