"""Skew-mitigation operators — salting for hot keys.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins at
runtime; these helpers cover the cases AQE can't re-plan:

- ``salted_aggregate``: two-phase aggregation for groupBy keys with
  pathological frequency (one reducer would own the hot key). Phase 1
  aggregates (key, salt) partials; phase 2 merges partials per key. Works
  for any algebraic aggregate expressed as (partial, merge) column pairs.
- ``salted_join``: replicate the small side per salt so a skewed large side
  spreads its hot keys over ``salt_buckets`` reducers. For broadcast-sized
  small sides prefer ``F.broadcast`` — this is for the mid-size case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt__"


def with_salt(df: DataFrame, salt_buckets: int) -> DataFrame:
    """Uniform pseudo-random salt derived from a whole-row hash — stable for
    a given row, no RNG state."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: output-name → aggregate over the raw rows (phase 1,
    per (key, salt)). ``merge_aggs``: output-name → aggregate over the phase-1
    partial columns (phase 2, per key). E.g. count: partial=count(1),
    merge=sum(partial); sum: partial=sum(x), merge=sum(partial).
    """
    salted = with_salt(df, salt_buckets)
    phase1 = salted.groupBy(*keys, SALT_COL).agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merge_aggs.items()]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the large side per ROW (whole-row hash —
    salting by the join key would put the hot key back in one bucket),
    replicate the small side across all salt values, join on (keys + salt)."""
    l_salted = with_salt(large, salt_buckets)
    # replicating by explode keeps the small side a single dataset (no union loop)
    s_replicated = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("long"))
    l_salted = l_salted.withColumn(SALT_COL, F.col(SALT_COL).cast("long"))
    return l_salted.join(s_replicated, [*on, SALT_COL], how).drop(SALT_COL)