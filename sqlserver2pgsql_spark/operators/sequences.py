"""Surrogate-key / IDENTITY semantics (reference B6, sqlserver2pgsql.pl:
1451-1481 + setval-to-max :3049-3063).

Spark has no engine sequences. Two honest approximations (SURVEY §1.3 —
"document, don't fake"):

- ``assign_surrogate_keys``: deterministic keys from a total order —
  ``start + step·(row_number-1)``. Requires a global sort on the order
  columns; correct and reproducible, the choice for bounded dimension loads.
- ``next_seq_start``: the setval-to-max equivalent — after a load, the next
  IDENTITY value is max(key)+step (min for negative step, :3057-3061).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..catalog.model import Sequence


def assign_surrogate_keys(
    df: DataFrame,
    order_by: list[str],
    key_col: str = "rid",
    start: int = 1,
    step: int = 1,
) -> DataFrame:
    """Two-phase global numbering that never funnels data through one
    partition: range-partition on the order columns (disjoint sorted ranges),
    number rows within each partition, then shift by per-partition offsets
    (a #partitions-sized driver aggregate — bounded, not data-sized).
    Equivalent to row_number() over a global order, but scalable."""
    ranged = df.repartitionByRange(*[F.col(c) for c in order_by]).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = W.partitionBy("__pid").orderBy(*[F.col(c) for c in order_by])
    local = ranged.withColumn("__rn", F.row_number().over(w))

    counts = {
        r["__pid"]: r["n"]
        for r in local.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr = F.lit(0)
    for pid, off in offsets.items():
        offset_expr = F.when(F.col("__pid") == pid, F.lit(off)).otherwise(offset_expr)

    return (
        local.withColumn(
            key_col,
            (F.lit(start) + (offset_expr + F.col("__rn") - 1) * F.lit(step)).cast("long"),
        )
        .drop("__pid", "__rn")
    )


def running_total(
    df: DataFrame,
    order_by: list[str],
    value_col: str,
    out_col: str = "running_total",
) -> DataFrame:
    """Global cumulative sum over a total order WITHOUT an unpartitioned
    window (which funnels the whole dataset through one task — the scale
    killer `WindowExec: No Partition Defined` warns about).

    Same two-phase shape as :func:`assign_surrogate_keys`: range-partition on
    the order columns (disjoint sorted ranges), cumulative-sum within each
    partition, then shift by per-partition value totals (a #partitions-sized
    driver aggregate — bounded, not data-sized)."""
    ranged = df.repartitionByRange(*[F.col(c) for c in order_by]).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = (
        W.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order_by])
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = ranged.withColumn("__cum", F.sum(F.col(value_col)).over(w))

    totals = {
        r["__pid"]: r["t"]
        for r in local.groupBy("__pid").agg(F.sum(value_col).alias("t")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    offset_expr = F.lit(0)
    for pid, off in offsets.items():
        offset_expr = F.when(F.col("__pid") == pid, F.lit(off)).otherwise(offset_expr)

    return (
        local.withColumn(out_col, offset_expr + F.col("__cum"))
        .drop("__pid", "__cum")
    )


def next_seq_start(df: DataFrame, key_col: str, seq: Sequence) -> int:
    """Post-load sequence reseed value (reference emits setval(max) — or min
    when step < 0)."""
    agg = F.max(key_col) if seq.step >= 0 else F.min(key_col)
    row = df.agg(agg.alias("v")).collect()[0]
    return (row.v if row.v is not None else seq.start - seq.step) + seq.step
