"""Isotonic regression (pool-adjacent-violators) at scale: blocked PAV.

The direct minimax form (q216) — fit[i] = max_{j<=i} min_{k>=j}
avg(y[j..k]) — is O(n^2) pairs per group. Blocked PAV bounds that: split
each group's sequence into fixed-size blocks, solve each block with the
minimax pair join (O(B^2) per block, embarrassingly parallel), summarize
each block's solution as its constant-value POOLS (sum, count — exact
integers recovered from prefix sums, never mean*count floats), then run
ONE weighted minimax pass over the pool summaries. Merging adjacent
blocks' PAV solutions by re-PAV-ing their pools is exact (the classic
parallel-PAV property: a violator across a block boundary merges pools
exactly as the global algorithm would; within-block pools are already
monotone so no intra-block information is lost).

Cost: O(B^2) per block + O(P^2) over pools per group, P = total pools
<= n/B typically much smaller; both stages are bounded pair joins, no
sequential loop, no UDF. The final fitted value is (pooled y-sum) /
(pooled count) — one IEEE division over exact integers, so the blocked
result equals the direct minimax BIT FOR BIT (verified in
tests/test_tpch_shapes.py against q216's direct form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def isotonic_fit(
    df: DataFrame,
    group: str,
    order_cols: list[str],
    y: Column,
    block: int = 256,
) -> DataFrame:
    """Monotone non-decreasing fit of integer-valued ``y`` per ``group``
    ordered by ``order_cols``. Returns (group, rn, y, fitted) with
    ``fitted`` the exact PAV solution as a double.

    ``y`` must be integral (cast to long internally) so pool sums are
    exact; callers with float targets should fix-point them first.
    """
    w = W.partitionBy(group).orderBy(*order_cols)
    base = df.select(
        F.col(group).alias("g"),
        y.cast("long").alias("y"),
        F.row_number().over(w).alias("rn"),
    ).select(
        "g", "rn", "y",
        ((F.col("rn") - 1) / block).cast("long").alias("blk"),
        F.sum("y").over(W.partitionBy("g").orderBy("rn")).alias("p"),
    )

    # --- stage 1: minimax PAV within each (group, block) --------------------
    wb = W.partitionBy("g", "blk").orderBy("rn")
    inb = base.select(
        "g", "blk", "rn", "y",
        F.row_number().over(wb).alias("i"),
        F.sum("y").over(wb).alias("bp"),
    )
    a = inb.select(
        "g", "blk", F.col("i").alias("j"), F.col("y").alias("ay"),
        F.col("bp").alias("ap"),
    )
    b = inb.select(
        F.col("g").alias("g2"), F.col("blk").alias("blk2"),
        F.col("i").alias("k"), F.col("bp").alias("bp2"),
    )
    pairs = a.join(
        b,
        (a["g"] == b["g2"]) & (a["blk"] == b["blk2"]) & (F.col("k") >= F.col("j")),
    ).select(
        "g", "blk", "j",
        (
            (F.col("bp2") - F.col("ap") + F.col("ay")).cast("double")
            / (F.col("k") - F.col("j") + 1)
        ).alias("avg_jk"),
    )
    sufmin = pairs.groupBy("g", "blk", "j").agg(F.min("avg_jk").alias("m"))
    blockfit = sufmin.select(
        "g", "blk", "j",
        F.max("m").over(W.partitionBy("g", "blk").orderBy("j")).alias("bfit"),
    )

    # --- stage 2: pools = runs of equal block-fit; exact integer sums -------
    joined = inb.join(blockfit, ["g", "blk"]).filter(
        F.col("i") == F.col("j")
    ).select("g", "blk", "rn", "y", "bfit")
    wp = W.partitionBy("g").orderBy("rn")
    pooled = joined.select(
        "g", "rn", "y", "bfit", "blk",
        F.when(
            (F.col("bfit") != F.lag("bfit").over(wp))
            | (F.col("blk") != F.lag("blk").over(wp))
            | F.lag("bfit").over(wp).isNull(),
            1,
        ).otherwise(0).alias("brk"),
    ).select(
        "g", "rn", "y",
        F.sum("brk").over(wp).alias("pool"),
    )
    pools = pooled.groupBy("g", "pool").agg(
        F.sum("y").alias("ps"),
        F.count(F.lit(1)).alias("pc"),
        F.min("rn").alias("lo"),
        F.max("rn").alias("hi"),
    )

    # --- stage 3: weighted minimax over pool summaries ----------------------
    wpool = W.partitionBy("g").orderBy("pool")
    pre = pools.select(
        "g", "pool", "ps", "pc", "lo", "hi",
        F.sum("ps").over(wpool).alias("cps"),
        F.sum("pc").over(wpool).alias("cpc"),
    )
    pa = pre.select(
        "g", F.col("pool").alias("j"), F.col("ps").alias("ajs"),
        F.col("pc").alias("ajc"), F.col("cps").alias("aps"),
        F.col("cpc").alias("apc"),
    )
    pb = pre.select(
        F.col("g").alias("g2"), F.col("pool").alias("k"),
        F.col("cps").alias("bps"), F.col("cpc").alias("bpc"),
    )
    ppairs = pa.join(
        pb, (pa["g"] == pb["g2"]) & (F.col("k") >= F.col("j"))
    ).select(
        "g", "j",
        (
            (F.col("bps") - F.col("aps") + F.col("ajs")).cast("double")
            / (F.col("bpc") - F.col("apc") + F.col("ajc"))
        ).alias("avg_jk"),
    )
    psufmin = ppairs.groupBy("g", "j").agg(F.min("avg_jk").alias("m"))
    poolfit = psufmin.select(
        "g", F.col("j").alias("pool"),
        F.max("m").over(W.partitionBy("g").orderBy("j")).alias("fit"),
    )

    # --- join fitted pool values back to rows -------------------------------
    return (
        pooled.join(poolfit, ["g", "pool"])
        .select(
            F.col("g").alias(group), "rn", "y",
            F.col("fit").alias("fitted"),
        )
    )
