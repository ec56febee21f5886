"""Pareto-frontier (skyline) operator — 2-D maximize/minimize dominance.

The classic multi-criteria query the reference's SQL surface cannot express
without a quadratic self-join: keep every row not dominated by another
(dominator is ≤ on the minimized column, ≥ on the maximized column, strict
on at least one). No counterpart in the reference (beyond-parity analytics).

Distributed shape (Börzsönyi et al., ICDE'01 divide-and-conquer adapted to
Spark): stage 1 computes the LOCAL skyline inside each hash bucket with two
RANGE-frame window maxima — any point dominated within its bucket is
dominated globally, so the filter is safe — and stage 2 re-runs the same
two windows globally over the survivors. The global skyline is a subset of
every bucket-local skyline union, so the result is exact; the stage-2
window sees only the (tiny) survivor set, never the full table, which is
what makes the single global sort admissible at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

#: stage-1 buckets — enough to parallelize, few enough that survivors stay small
N_BUCKETS = 64


def _frontier_filter(df: DataFrame, min_col: str, max_col: str, part_cols):
    """Rows not dominated within their partition: a row loses iff some row
    with strictly smaller ``min_col`` has ``max_col`` ≥ its own, or some row
    with equal-or-smaller ``min_col`` has ``max_col`` strictly greater."""
    base = W.partitionBy(*part_cols).orderBy(min_col) if part_cols else W.orderBy(min_col)
    strict = base.rangeBetween(W.unboundedPreceding, -1)
    incl = base.rangeBetween(W.unboundedPreceding, W.currentRow)
    m_strict = F.max(max_col).over(strict)
    m_incl = F.max(max_col).over(incl)
    return df.withColumn("_ms", m_strict).withColumn("_mi", m_incl).filter(
        (F.col("_ms").isNull() | (F.col("_ms") < F.col(max_col)))
        & (F.col("_mi") <= F.col(max_col))
    ).drop("_ms", "_mi")


def pareto_frontier(
    df: DataFrame, min_col: str, max_col: str, bucket_col: str
) -> DataFrame:
    """Exact 2-D skyline: minimize ``min_col``, maximize ``max_col``.

    ``min_col`` must be integer-typed (RANGE frame offset −1 expresses
    "strictly cheaper"). Ties on both dimensions all survive (neither
    dominates the other without a strict inequality). ``bucket_col`` is any
    deterministic expression-ready column used to spread stage 1.
    """
    bucketed = df.withColumn("_b", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(N_BUCKETS)))
    local = _frontier_filter(bucketed, min_col, max_col, ["_b"]).drop("_b")
    return _frontier_filter(local, min_col, max_col, [])
