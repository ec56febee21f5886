"""Portable approximate-distinct sketch (HyperLogLog with an md5-derived
hash), plus the md5→60-bit hash primitive shared by the oracle-checkable
dedup/similarity operators.

Spark's built-in ``approx_count_distinct`` (HLL++) is the production path —
but its register layout and bias tables are engine-specific, so no external
oracle can reproduce its values. This module implements classic HLL
(Flajolet et al. 2007) from *portable* primitives only — md5, integer shifts,
a bigint-scaled harmonic sum — so DuckDB can compute the bit-identical
estimate and the driver's hash gate can verify the approximate aggregate
exactly. Scale shape is the whole point of HLL: one explode-free pass,
map-side partial ``max`` per (group, register), shuffle of at most
``m = 2**p`` rows per group.

Determinism notes:
- the 60-bit hash is ``int(md5(value)[:15], 16)`` — identical in Spark
  (``conv(substring(md5(x),1,15),16,10)``) and DuckDB
  (``('0x' || substr(md5(x),1,15))::BIGINT``); verified bit-equal.
- the harmonic sum ``Σ 2^(-M_j)`` is computed as the *integer*
  ``Σ 2^(51-M_j)`` (max ρ is 51), so no float summation order exists.
- the only float ops are one division, one optional ``ln``, and a final
  round — all reproducible across libm implementations in practice and
  pinned by ``round(·, 4)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_hash60(col: Column) -> Column:
    """Deterministic 60-bit non-negative integer hash from the first 15 hex
    chars of md5 — the portable replacement for xxhash64 wherever a DuckDB
    oracle must replicate signatures."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def hll_approx_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Classic HLL estimate of ``count(distinct value_col)`` per group,
    with an exact row count ``n`` for free (summed from the register pass).

    Register index = top ``p`` bits of the 60-bit hash; ρ = position of the
    first set bit in the remaining ``w = 60-p`` bits (w+1 if all zero).
    Estimate = α·m²/Σ2^(-M_j) with the standard low-range (linear counting)
    correction. Output column is ``round(est, 4)``.
    """
    m = 1 << p
    w = 60 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    scale_c = alpha * m * m * float(1 << (w + 1))

    h = md5_hash60(F.col(value_col))
    idx = F.shiftright(h, w)
    rest = h.bitwiseAND(F.lit((1 << w) - 1))
    # bit_length(rest) via base-2 string length (identical to DuckDB bin())
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.conv(rest, 10, 2)) + 1
    )

    regs = (
        df.select(*group_cols, idx.alias("__idx"), rho.alias("__rho"))
        .groupBy(*group_cols, "__idx")
        .agg(F.max("__rho").alias("__M"), F.count(F.lit(1)).alias("__c"))
    )
    agg = regs.groupBy(*group_cols).agg(
        # integer-scaled harmonic sum: 2^(w+1-M) per seen register (M ∈ 1..w+1)
        F.sum(F.expr(f"shiftleft(1L, {w + 1} - __M)")).alias("__s_seen"),
        F.count(F.lit(1)).alias("__n_regs"),
        F.sum("__c").alias("n"),
    )
    zeros = F.lit(m) - F.col("__n_regs")  # registers never touched (M would be 0)
    s_total = F.col("__s_seen") + zeros * F.lit(1 << (w + 1)).cast("long")
    e_raw = F.lit(scale_c) / s_total.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 4).alias(out_col), "n")


def hll_oracle_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
    out_col: str = "approx_distinct",
) -> str:
    """DuckDB SQL computing the identical HLL estimate (same hash, same
    integer-scaled harmonic sum, same corrections) for the driver's oracle."""
    m = 1 << p
    w = 60 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    scale_c = alpha * m * m * float(1 << (w + 1))
    g = ", ".join(group_cols)
    return f"""
    WITH hashed AS (
      SELECT {g},
             ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM {table}
    ),
    split AS (
      SELECT {g}, h >> {w} AS idx, h & {(1 << w) - 1} AS rest FROM hashed
    ),
    rho AS (
      SELECT {g}, idx,
             CASE WHEN rest = 0 THEN {w + 1}
                  ELSE {w} - length(bin(rest)) + 1 END AS r
      FROM split
    ),
    regs AS (
      SELECT {g}, idx, max(r) AS M, count(*) AS c FROM rho GROUP BY {g}, idx
    ),
    agg AS (
      SELECT {g},
             sum(1::BIGINT << ({w + 1} - M)) AS s_seen,
             count(*) AS n_regs,
             CAST(sum(c) AS BIGINT) AS n
      FROM regs GROUP BY {g}
    ),
    est AS (
      SELECT {g}, n, {m} - n_regs AS zeros,
             {scale_c!r} / CAST(s_seen + ({m} - n_regs) * (1::BIGINT << {w + 1}) AS DOUBLE) AS e_raw
      FROM agg
    )
    SELECT {g},
           round(CASE WHEN e_raw <= {2.5 * m!r} AND zeros > 0
                      THEN {float(m)!r} * ln({float(m)!r} / CAST(zeros AS DOUBLE))
                      ELSE e_raw END, 4) AS {out_col},
           n
    FROM est
    """


def hll_sliding_distinct(
    df: DataFrame,
    day_col: Column,
    value_col: str,
    p: int = 10,
    window_days: int = 7,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Trailing-window approximate distinct per day via HLL register MERGE —
    the property that makes sketches the 100 TB answer to sliding distinct
    counts: registers are max-mergeable, so each day's m=2**p registers are
    computed ONCE and every window estimate is a re-max over ≤
    ``window_days``·m tiny rows, never a re-scan of the raw data.

    Shape: one register pass over the data (groupBy day, idx), an explode of
    each day's registers to the ≤``window_days`` window-end days it serves,
    a re-max, and the same integer-scaled harmonic fold as
    ``hll_approx_distinct``. Only days present in the input are emitted."""
    m = 1 << p
    w = 60 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    scale_c = alpha * m * m * float(1 << (w + 1))

    h = md5_hash60(F.col(value_col))
    idx = F.shiftright(h, w)
    rest = h.bitwiseAND(F.lit((1 << w) - 1))
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.conv(rest, 10, 2)) + 1
    )

    day_regs = (
        df.select(day_col.alias("day"), idx.alias("__idx"), rho.alias("__rho"))
        .groupBy("day", "__idx")
        .agg(F.max("__rho").alias("__M"))
    )
    days = day_regs.select("day").distinct()
    # each day's registers serve the window-end days [day, day+window_days)
    shifted = day_regs.select(
        F.explode(
            F.expr(f"sequence(day, date_add(day, {window_days - 1}), interval 1 day)")
        ).alias("wday"),
        "__idx",
        "__M",
    ).join(days.select(F.col("day").alias("wday")), "wday")  # only real days
    merged = shifted.groupBy("wday", "__idx").agg(F.max("__M").alias("__M"))
    agg = merged.groupBy("wday").agg(
        F.sum(F.expr(f"shiftleft(1L, {w + 1} - __M)")).alias("__s_seen"),
        F.count(F.lit(1)).alias("__n_regs"),
    )
    zeros = F.lit(m) - F.col("__n_regs")
    s_total = F.col("__s_seen") + zeros * F.lit(1 << (w + 1)).cast("long")
    e_raw = F.lit(scale_c) / s_total.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select("wday", F.round(est, 4).alias(out_col))


def hll_sliding_oracle_sql(
    table: str,
    day_expr: str,
    value_col: str,
    p: int = 10,
    window_days: int = 7,
    out_col: str = "approx_distinct",
) -> str:
    """DuckDB SQL computing the identical sliding-window HLL merge."""
    m = 1 << p
    w = 60 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    scale_c = alpha * m * m * float(1 << (w + 1))
    return f"""
    WITH hashed AS (
      SELECT {day_expr} AS day,
             ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM {table}
    ),
    rho AS (
      SELECT day, h >> {w} AS idx,
             CASE WHEN (h & {(1 << w) - 1}) = 0 THEN {w + 1}
                  ELSE {w} - length(bin(h & {(1 << w) - 1})) + 1 END AS r
      FROM hashed
    ),
    day_regs AS (
      SELECT day, idx, max(r) AS M FROM rho GROUP BY day, idx
    ),
    days AS (SELECT DISTINCT day FROM day_regs),
    shifted AS (
      SELECT (dr.day + CAST(o.o AS INTEGER)) AS wday, dr.idx, dr.M
      FROM day_regs dr, (SELECT unnest(range(0, {window_days})) AS o) o
      WHERE (dr.day + CAST(o.o AS INTEGER)) IN (SELECT day FROM days)
    ),
    merged AS (
      SELECT wday, idx, max(M) AS M FROM shifted GROUP BY wday, idx
    ),
    agg AS (
      SELECT wday, sum(1::BIGINT << ({w + 1} - M)) AS s_seen, count(*) AS n_regs
      FROM merged GROUP BY wday
    ),
    est AS (
      SELECT wday, {m} - n_regs AS zeros,
             {scale_c!r} / CAST(s_seen + ({m} - n_regs) * (1::BIGINT << {w + 1}) AS DOUBLE) AS e_raw
      FROM agg
    )
    SELECT wday,
           round(CASE WHEN e_raw <= {2.5 * m!r} AND zeros > 0
                      THEN {float(m)!r} * ln({float(m)!r} / CAST(zeros AS DOUBLE))
                      ELSE e_raw END, 4) AS {out_col}
    FROM est
    """


# --- frequent items (Misra-Gries candidates + exact verification) -----------


def misra_gries_candidates(df: DataFrame, value_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries frequent-item summaries, merged by union.

    Classic streaming sketch (Misra & Gries 1982): each partition keeps at
    most ``capacity`` counters; when a new item arrives with the table full,
    the deficit is charged against every counter (vectorized batch variant:
    merge the Arrow batch's value_counts, then subtract the smallest counts
    until ≤ capacity survive). Total charge per partition is ≤
    n_p/(capacity+1), so every item with partition frequency >
    n_p/(capacity+1) survives — and by pigeonhole any item with GLOBAL
    frequency > n/(capacity+1) exceeds that bound in at least one partition.
    The union of per-partition survivor sets is therefore a SUPERSET of the
    global heavy hitters; ``exact_heavy_hitters`` prunes it with exact
    counts, so the end-to-end result is exact and partitioning-independent.

    100 TB shape: one scan, O(capacity) state per partition, candidate set
    ≤ capacity × #partitions rows — no full-cardinality shuffle ever forms.
    """
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        n_dropped = 0
        for pdf in batches:
            vc = pdf[value_col].value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                counts = sorted(counters.values())
                cut = counts[len(counters) - capacity - 1]
                counters = {v: c - cut for v, c in counters.items() if c > cut}
                n_dropped += 1
        yield pd.DataFrame({value_col: list(counters.keys())})

    return df.select(value_col).mapInPandas(
        summarize, schema=f"{value_col} string"
    ).distinct()


def exact_heavy_hitters(
    df: DataFrame, value_col: str, k: int, capacity: int | None = None
) -> DataFrame:
    """Exact items with frequency > n/k, found sketch-first.

    Pass 1 builds Misra-Gries candidate summaries (capacity defaults to 4k —
    any capacity ≥ k-1 guarantees the superset property; the margin keeps
    per-partition charge noise from evicting borderline items needlessly).
    Pass 2 re-scans, counts ONLY the candidates (broadcast semi-join — the
    grouping state is candidate-sized, not domain-sized), and keeps items
    whose exact count clears the integer threshold ``cnt * k > n``.

    Output (value, cnt, n_total) is exact and deterministic regardless of
    how the sketch pass partitioned the data. On near-uniform keys the
    candidate set degenerates toward the full domain (nothing is frequent);
    on the skewed distributions the sketch exists for, it prunes the second
    pass to O(k · #partitions) keys.
    """
    if capacity is None:
        capacity = 4 * k
    vals = df.select(F.col(value_col).cast("string").alias(value_col))
    cands = misra_gries_candidates(vals, value_col, capacity)
    counted = (
        vals.join(F.broadcast(cands), value_col, "left_semi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = vals.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n_total"))
        .select(value_col, "cnt", "n_total")
    )
