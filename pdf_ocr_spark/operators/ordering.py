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


def global_running_totals(
    df: DataFrame,
    keys: list[str | Column],
    weight_col: str,
    total_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive global prefix sums of ``weight_col`` in ``keys``
    order — :func:`global_ordered_positions` generalized from row
    counting to weight accumulation (positions are the weight==1
    special case). Same plan shape: one RangePartitioning Exchange, a
    parallel within-partition sort, a P-row per-partition weight-sum
    collect whose cumulative offsets broadcast back, and one narrow
    Arrow stage adding ``offset[pid] + local_cumsum`` (vectorized, no
    per-row Python, no second Exchange). This is the 100 TB shape for
    token-budget sharding: the only global coordination is P longs."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        # pin the sampled range boundaries: the weight-sum job and the
        # cumsum job below must see the SAME partitions
        .localCheckpoint(eager=True)
    )

    def sum_kernel(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        total = 0
        for pdf in batches:
            total += int(pdf[weight_col].sum()) if len(pdf) else 0
        yield pd.DataFrame({"pid": [pid], "w": [total]})

    sums = sorted(
        (r["pid"], r["w"])
        for r in ranged.mapInPandas(sum_kernel, schema="pid int, w long").collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, w in sums:
        offsets[pid] = acc
        acc += w
    bc = spark.sparkContext.broadcast(offsets)

    out_schema = StructType(
        [StructField(total_col, LongType())] + list(ranged.schema.fields)
    )

    def cumsum_kernel(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = bc.value.get(pid, 0)
        for pdf in batches:
            out = pdf.copy()
            local = pdf[weight_col].astype("int64").cumsum()
            out.insert(0, total_col, base + local)
            base += int(local.iloc[-1]) if len(pdf) else 0
            yield out

    return ranged.mapInPandas(cumsum_kernel, schema=out_schema)
