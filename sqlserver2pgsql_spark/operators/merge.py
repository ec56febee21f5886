"""A10 — merge-apply sink (upsert/delete), consuming the diff stream.

Reference: ``SynchronizeAfterMerge`` — insert where flag=new, update where
changed, delete where deleted, against PostgreSQL with per-key lookups
(sqlserver2pgsql.pl:4628-4660, wiring :1116-1153).

Spark-first re-expressions:
- ``apply_diff``: the *relational* equivalent — the post-merge table state is
  just a projection+filter of the diff output (keep everything except
  ``deleted``). For file-backed tables (parquet/Delta) this is the correct
  scalable sink: rewrite-by-union beats per-row upserts at 100 TB, and with
  Delta it becomes a single ``MERGE INTO``.
- ``merge_sql``: generates the ANSI ``MERGE INTO`` statement for JDBC
  targets (PG 15+), replacing the reference's per-row synchronize step with
  one set-based statement executed after staging the diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .diff import DIFF_FLAG_COL, FLAG_DELETED


def apply_diff(diffed: DataFrame, flag_col: str = DIFF_FLAG_COL) -> DataFrame:
    """Materialize the post-sync table state from a diff stream."""
    return diffed.filter(F.col(flag_col) != FLAG_DELETED).drop(flag_col)


def merge_sql(
    target_table: str,
    staging_table: str,
    keys: list[str],
    value_cols: list[str],
    flag_col: str = DIFF_FLAG_COL,
) -> str:
    """ANSI MERGE statement applying a staged diff to a JDBC target.

    Set-based replacement for the reference's row-at-a-time
    SynchronizeAfterMerge (commit interval 100, sqlserver2pgsql.pl:4650).
    """
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    set_clause = ", ".join(f"{c} = s.{c}" for c in value_cols)
    all_cols = ", ".join(keys + value_cols)
    src_cols = ", ".join(f"s.{c}" for c in keys + value_cols)
    return (
        f"MERGE INTO {target_table} t USING {staging_table} s ON {on} "
        f"WHEN MATCHED AND s.{flag_col} = 'deleted' THEN DELETE "
        f"WHEN MATCHED AND s.{flag_col} = 'changed' THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED AND s.{flag_col} = 'new' THEN INSERT ({all_cols}) VALUES ({src_cols})"
    )
