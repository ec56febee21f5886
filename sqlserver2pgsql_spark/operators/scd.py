"""Slowly-changing-dimension history and CDC log application.

The reference's incremental mode (sqlserver2pgsql.pl:4662-4689) computes a
point-in-time diff and applies it (A9/A10). Two natural extensions a
migration/sync engine needs at scale:

- ``scd2_history``: turn a change LOG (key, change_ts, attrs) into a
  Type-2 dimension table — one row per distinct attribute state with
  ``valid_from`` / ``valid_to`` / ``is_current``. Consecutive rows whose
  tracked attributes did not change are collapsed first, so reloading the
  same snapshot twice never mints a new version.
- ``cdc_apply_latest``: collapse an insert/update/delete op log to final
  state — per key, latest op wins (ordered by a total (ts, seq) order);
  a trailing delete removes the key.

Scale shape: both are ONE window shuffle partitioned by the business key —
no joins, no driver-side data. At 100 TB the window partitioning is the
same hash-shuffle a MERGE would need anyway; skewed keys (a hot entity
updated millions of times) fall under AQE skew handling since each key's
history is processed by exactly one task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def scd2_history(
    log: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Type-2 history from a change log.

    Rows are ordered per key by ``(ts_col, *order_cols)`` (pass tie-breaker
    columns to make the order total — required for deterministic output).
    Consecutive rows with identical ``attr_cols`` collapse into one version;
    each version gets ``valid_from`` (its first change ts), ``valid_to``
    (next version's valid_from, NULL for the open version) and
    ``is_current``.
    """
    ordering = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = W.partitionBy(*key_cols).orderBy(*ordering)
    # a version starts where any tracked attribute differs from the previous
    # row (null-safe: eqNullSafe, negated)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first_row = F.row_number().over(w) == 1
    versions = (
        log.withColumn("__new_version", first_row | changed)
        .filter(F.col("__new_version"))
        .drop("__new_version")
    )
    w2 = W.partitionBy(*key_cols).orderBy(*ordering)
    return versions.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def cdc_apply_latest(
    log: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Final state from an I/U/D op log: per key, the row with the highest
    ``order_cols`` value wins; keys whose winning op is ``delete_op`` are
    dropped. ``order_cols`` must be a total order within each key
    (e.g. ``(ts, seq)``) or the result is nondeterministic."""
    w = W.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .drop("__rn")
    )
