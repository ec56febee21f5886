"""As-of join — Spark has no native one (SURVEY.md §2.4 'theta/as-of joins').

Composition of built-in ops (preference (a) from the build brief): union the
two streams tagged, sort within key partitions by time, and carry the most
recent right-side row forward with ``last(..., ignorenulls)`` over an
unbounded-preceding window. One shuffle on the join key — the same cost as
the equi-join Spark would do anyway; no per-group Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    strict: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts < left_ts`` (``<=`` when strict=False) and equal ``on`` key.

    Left rows with no prior right row get NULLs (left outer semantics).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lt.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    unioned = lt.unionByName(rt)

    # order: time asc; at equal timestamps, rights sort before lefts iff
    # non-strict (left may see a same-instant right), after lefts if strict.
    # __is_left: left=1, right=0 → asc puts rights first (non-strict).
    tie = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    w = (
        W.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), tie)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in right_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__carry_ts"),
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        F.col("__l.*"),
        *[F.col(f"__carry_{c}").alias(f"{c}{suffix}") for c in right_cols],
        F.col("__carry_ts").alias(f"{right_ts}{suffix}"),
    )
    return out
