"""Global ordered export — the range-Exchange operator (curriculum
sort): a total order over the corpus with explicit global positions,
computed WITHOUT a single-task sort and WITHOUT
monotonically_increasing_id.

Shape: one ``repartitionByRange`` Exchange (RangePartitioning — the
one Exchange type the engine's PLANS inventory lacked), a parallel
within-partition sort, a P-row count-per-partition job whose cumulative
offsets broadcast back, and one narrow Arrow stage that adds
``offset[pid] + local_index`` per batch (vectorized arange, no per-row
Python, no extra shuffle — a JVM window by partition id would re-
Exchange the full data just to rank inside partitions it already has).

Why this is the 100 TB shape: range partitioning bounds every task's
sort to its partition; the only global coordination is the P-row count
collect (control-plane-bounded, the Lloyd's-centroid budget); and the
output stays partitioned BY THE SORT KEY, so a downstream curriculum
reader scans position ranges without another shuffle.

Determinism: positions are derived from actual per-partition counts,
so range-boundary sampling only affects balance, never values. The
caller must pass a key set that is a total order (include a unique
tie-breaker like doc_id); with duplicate full keys the position of
equal rows would be partition-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def global_ordered_positions(
    df: DataFrame,
    keys: list[str | Column],
    position_col: str = "position",
    num_partitions: int | None = None,
) -> DataFrame:
    """Total-order ``df`` by ``keys`` (ascending) and attach 1-based
    global positions. See the module docstring for the plan shape."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        # pin the sampled range boundaries: the count job and the
        # position job below must see the SAME partitions
        .localCheckpoint(eager=True)
    )

    def count_kernel(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in batches:
            n += len(pdf)
        yield pd.DataFrame({"pid": [pid], "n": [n]})

    counts = sorted(
        (r["pid"], r["n"])
        for r in ranged.mapInPandas(count_kernel, schema="pid int, n long").collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    bc = spark.sparkContext.broadcast(offsets)

    out_schema = StructType(
        [StructField(position_col, LongType())] + list(ranged.schema.fields)
    )

    def position_kernel(batches):
        import numpy as np
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = bc.value.get(pid, 0)
        seen = 0
        for pdf in batches:
            out = pdf.copy()
            out.insert(0, position_col, base + seen + 1 + np.arange(len(pdf)))
            seen += len(pdf)
            yield out

    return ranged.mapInPandas(position_kernel, schema=out_schema)
