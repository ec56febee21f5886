"""A9 — diff / changed-rows detector (the reference's flagship dataflow).

Reference: ``MergeRows (diff)`` — a full outer merge-join of the reference
stream (already-loaded PG table) against the compare stream (live MSSQL
table) on the PK, comparing every column and tagging each row
``identical | new | changed | deleted`` (sqlserver2pgsql.pl:4662-4689, key and
value wiring :1106-1153). Kettle needs both inputs externally sorted first
(A7/A8); Spark does not — a full outer *hash/sort-merge* join on the PK is the
same logical operator and Catalyst picks the physical strategy.

Scale notes (100 TB):
- one shuffle on the PK for each side, no pre-sort needed. PKs are unique so
  the join is skew-free by construction; AQE skew-join covers pathological
  layouts.
- ``use_hash=True`` compares a single xxhash64 of all value columns instead
  of N column equalities — narrows the comparison expression for very wide
  tables (the hash is computed map-side, inside whole-stage codegen).
  NULL-vs-empty-string stays distinguishable because xxhash64 of NULL skips
  the field while '' contributes a length-0 block; we additionally hash a
  per-column null-indicator to make this explicit.
- NULL semantics: the reference *refuses to run* unless Kettle is configured
  so empty string != NULL (check_kettle_properties, :773-802). We honor the
  same contract with null-safe equality (``<=>`` / IS NOT DISTINCT FROM).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIFF_FLAG_COL = "__changed__"

FLAG_IDENTICAL = "identical"
FLAG_NEW = "new"
FLAG_CHANGED = "changed"
FLAG_DELETED = "deleted"

_S_PRESENT = "__src_present__"
_T_PRESENT = "__tgt_present__"


def _row_hash(prefix: str, cols: list[str]) -> Column:
    # hash values AND null indicators so NULL vs '' vs 0 never collide
    parts: list[Column] = []
    for c in cols:
        parts.append(F.col(f"{prefix}.{c}"))
        parts.append(F.col(f"{prefix}.{c}").isNull().cast("int"))
    return F.xxhash64(*parts)


def diff(
    src: DataFrame,
    tgt: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    flag_col: str = DIFF_FLAG_COL,
    use_hash: bool = False,
) -> DataFrame:
    """Full-outer diff of ``src`` (desired state) vs ``tgt`` (current state).

    Returns one row per logical key with the *source-side* values (target-side
    for deleted rows) plus ``flag_col`` ∈ {identical,new,changed,deleted}.
    Inputs must already be canonicalized (operators.canonicalize) — same
    contract as the reference's sql_convert_column/postgres_convert_column
    pair (sqlserver2pgsql.pl:442-484).
    """
    if compare_cols is None:
        compare_cols = [c for c in src.columns if c not in keys]
    value_cols = [c for c in src.columns if c not in keys]

    s = src.withColumn(_S_PRESENT, F.lit(True)).alias("s")
    t = tgt.withColumn(_T_PRESENT, F.lit(True)).alias("t")

    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"s.{k}").eqNullSafe(F.col(f"t.{k}")) for k in keys],
    )
    joined = s.join(t, cond, "full_outer")

    if use_hash:
        same = _row_hash("s", compare_cols) == _row_hash("t", compare_cols)
    else:
        same = reduce(
            lambda a, b: a & b,
            [F.col(f"s.{c}").eqNullSafe(F.col(f"t.{c}")) for c in compare_cols],
        )

    in_src = F.col(f"s.{_S_PRESENT}").isNotNull()
    in_tgt = F.col(f"t.{_T_PRESENT}").isNotNull()
    flag = (
        F.when(in_src & ~in_tgt, F.lit(FLAG_NEW))
        .when(~in_src & in_tgt, F.lit(FLAG_DELETED))
        .when(same, F.lit(FLAG_IDENTICAL))
        .otherwise(F.lit(FLAG_CHANGED))
    )

    out_cols: list[Column] = []
    for k in keys:
        out_cols.append(F.when(in_src, F.col(f"s.{k}")).otherwise(F.col(f"t.{k}")).alias(k))
    for c in value_cols:
        out_cols.append(F.when(in_src, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c))
    out_cols.append(flag.alias(flag_col))
    return joined.select(*out_cols)


def diff_counts(
    src: DataFrame, tgt: DataFrame, keys: list[str], **kwargs
) -> DataFrame:
    """Per-flag row counts — the summary a sync job reports."""
    d = diff(src, tgt, keys, **kwargs)
    return d.groupBy(DIFF_FLAG_COL).agg(F.count(F.lit(1)).alias("n")).orderBy(DIFF_FLAG_COL)


def diff_key_range(
    src: DataFrame,
    tgt: DataFrame,
    keys: list[str],
    lower,
    upper,
    **kwargs,
) -> DataFrame:
    """Windowed incremental diff: both sides restricted to
    ``lower <= pk < upper`` before diffing — the surviving use of the A11
    collation-safety gate (sources.jdbc.pk_sort_order_safe must hold, or the
    range means different rows on each system). At 100 TB this turns a
    full-table sync into a key-window sync, and the range predicate pushes
    into both scans."""
    k = keys[0]
    pred = (F.col(k) >= F.lit(lower)) & (F.col(k) < F.lit(upper))
    return diff(src.filter(pred), tgt.filter(pred), keys, **kwargs)
