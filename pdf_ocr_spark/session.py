"""Session-lifecycle helpers for long-lived SparkSessions.

Several operators materialize shared intermediates with
``localCheckpoint(eager=True)`` (see ``operators.dedup._materialize``:
shingle tables, signature tables, LSH bucket tables). Checkpointed
blocks live in the block manager until the JVM-side RDD object is
garbage-collected and the ContextCleaner reaps it — they are NOT
registered in the catalog cache, so ``spark.catalog.clearCache()``
does not release them. In a long-lived session that runs many such
operators back-to-back, pinned blocks accumulate and the resulting
memory pressure shows up as multi-second GC/eviction stalls in
*unrelated* queries (measured: a 44-query bench suite intermittently
inflated individual mid-suite queries 4-10x; with explicit release
between queries the suite is stable).

Call :func:`release_session_blocks` at a point where no live DataFrame
still depends on a previously returned operator result — e.g. between
queries in a benchmark or batch driver after each result is fully
consumed. Unpersisting a checkpointed RDD that a still-referenced
DataFrame depends on would force recomputation from a truncated
lineage and fail, which is why the library cannot do this inside the
operators themselves.
"""

from __future__ import annotations

import gc

from pyspark.sql import SparkSession


def release_session_blocks(spark: SparkSession) -> int:
    """Release every pinned block of the session: catalog cache plus
    all persistent RDDs (which includes ``localCheckpoint`` data).
    Returns the number of persistent RDDs released. Only call when no
    live DataFrame from earlier operator calls will be re-executed."""
    spark.catalog.clearCache()
    # Drop py4j references so the JVM handles are collectable even if
    # the caller's frames are gone but Python hasn't GC'd yet.
    gc.collect()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    rdds = list(jmap.values())
    for rdd in rdds:
        rdd.unpersist(False)
    return len(rdds)
