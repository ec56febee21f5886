"""M6 — constraint-validation operators.

Spark doesn't enforce PK/UNIQUE/FK/CHECK; the reference defers them to
PostgreSQL DDL executed after the load (before/after script split,
README.md:75-77; FK NOT VALID / VALIDATE modes sqlserver2pgsql.pl:2950-2959).
In a Spark-native engine, validation is itself a query:

- PK/UNIQUE  → groupBy(key).count > 1 (map-side partial agg, one shuffle).
- FK         → left_anti join child→parent must be empty; the parent key set
               is usually broadcastable (dims ≪ facts), so at 100 TB this is
               a broadcast anti-join with no shuffle of the fact table.
- CHECK      → filter(NOT expr) must be empty; fully pushed into the scan.

Each returns the *violating rows* (empty = constraint holds), mirroring
validate_constraints=yes/after/no (:2950-2959) as eager/deferred/skip policy
decided by the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pk_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Rows-per-key for duplicated or NULL primary keys."""
    null_pred = None
    for k in keys:
        p = F.col(k).isNull()
        null_pred = p if null_pred is None else (null_pred | p)
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") > 1) | null_pred)
    )
    return dup


def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Duplicated (non-NULL) value tuples under a UNIQUE constraint.

    SQL-standard UNIQUE ignores rows containing NULLs (PostgreSQL semantics,
    the reference's target system)."""
    pred = None
    for c in cols:
        p = F.col(c).isNotNull()
        pred = p if pred is None else (pred & p)
    return (
        df.filter(pred)
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def fk_violations(
    child: DataFrame,
    child_cols: list[str],
    parent: DataFrame,
    parent_cols: list[str],
    broadcast_parent: bool = True,
) -> DataFrame:
    """Child rows whose FK tuple has no match in the parent (left_anti).

    Rows with any NULL FK column are not violations (SQL MATCH SIMPLE —
    PostgreSQL's FK semantics)."""
    cond: Column | None = None
    for cc, pc in zip(child_cols, parent_cols):
        p = child[cc] == parent[pc]
        cond = p if cond is None else (cond & p)
    not_null = None
    for cc in child_cols:
        p = F.col(cc).isNotNull()
        not_null = p if not_null is None else (not_null & p)
    parent_keys = parent.select(*parent_cols).dropDuplicates()
    if broadcast_parent:
        parent_keys = F.broadcast(parent_keys)
    return child.filter(not_null).join(parent_keys, cond, "left_anti")


def check_violations(df: DataFrame, expr: str | Column) -> DataFrame:
    """Rows failing a CHECK expression. NULL check results pass (SQL
    three-valued logic: CHECK is violated only when the predicate is FALSE)."""
    pred = F.expr(expr) if isinstance(expr, str) else expr
    return df.filter(~F.coalesce(pred, F.lit(True)))
