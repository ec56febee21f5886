"""Eighth-wave query surface (round 4, continued): rank-correlation
statistics on merged histograms, inventory classification, queueing-law
audits, and streaming out-of-orderness planning.

Same contract as queries.py / queries_llm.py / queries_r4.py /
queries_r5.py: every query is exact-oracle-gated against DuckDB at
sf0.01. Recurring exactness tricks: integer cents/microseconds for
anything summed, a single shared IEEE chain for anything ratio-valued,
deterministic tie-breaks on every ORDER BY, and rounding only to
quantize an already-identical double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .queries import _t, register

# ---------------------------------------------------------------------------
# Rank statistics on merged histograms
# ---------------------------------------------------------------------------


@register(
    "q371_kendall_tau",
    oracle="""
    WITH pts AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_quantity) AS BIGINT) AS x,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    cells AS (
      SELECT flag, x, y, CAST(count(*) AS BIGINT) AS n
      FROM pts GROUP BY flag, x, y
    ),
    pairs AS (
      SELECT a.flag,
             CAST(sum(CASE WHEN a.y < b.y THEN a.n * b.n ELSE 0 END) AS BIGINT) AS concordant,
             CAST(sum(CASE WHEN a.y > b.y THEN a.n * b.n ELSE 0 END) AS BIGINT) AS discordant
      FROM cells a JOIN cells b ON a.flag = b.flag AND a.x < b.x
      GROUP BY a.flag
    ),
    xm AS (
      SELECT flag, CAST(sum(t * (t - 1) / 2) AS BIGINT) AS ties_x
      FROM (SELECT flag, x, CAST(sum(n) AS BIGINT) AS t FROM cells GROUP BY flag, x)
      GROUP BY flag
    ),
    ym AS (
      SELECT flag, CAST(sum(t * (t - 1) / 2) AS BIGINT) AS ties_y
      FROM (SELECT flag, y, CAST(sum(n) AS BIGINT) AS t FROM cells GROUP BY flag, y)
      GROUP BY flag
    ),
    tot AS (
      SELECT flag, CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(sum(n) * (sum(n) - 1) / 2 AS BIGINT) AS n_pairs
      FROM cells GROUP BY flag
    )
    SELECT t.flag AS l_returnflag, t.n_rows, t.n_pairs,
           p.concordant, p.discordant, x.ties_x, y.ties_y,
           round(CAST(p.concordant - p.discordant AS DOUBLE)
                 / (sqrt(CAST(t.n_pairs - x.ties_x AS DOUBLE))
                    * sqrt(CAST(t.n_pairs - y.ties_y AS DOUBLE))), 9) AS tau_b
    FROM tot t
    JOIN pairs p ON t.flag = p.flag
    JOIN xm x ON t.flag = x.flag
    JOIN ym y ON t.flag = y.flag
    ORDER BY l_returnflag
    """,
)
def q371_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between quantity and discount per
    return flag — the tie-robust companion to Spearman (q135), computed
    EXACTLY without an O(n^2) row pair join: quantity (50 levels) and
    discount (11 levels) are histogrammed into joint cells first, then
    concordant/discordant pairs are cell-count products over the tiny
    cell table (<=550 cells per flag, self-joined broadcast). Tie
    corrections come from the cell marginals; every count is BIGINT and
    the tau denominator is one sqrt*sqrt IEEE chain. The merged-histogram
    trick is the same scale shape as Jonckheere (q360): pair work is
    bounded by distinct-value cells, never by rows."""
    li = _t(spark, sf_dir, "lineitem")
    cells = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.floor("l_quantity").cast("long").alias("x"),
            F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("y"),
        )
        .groupBy("flag", "x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a, b = cells.alias("a"), cells.alias("b")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("a.flag") == F.col("b.flag")) & (F.col("a.x") < F.col("b.x")),
        )
        .groupBy(F.col("a.flag").alias("flag"))
        .agg(
            F.sum(
                F.when(F.col("a.y") < F.col("b.y"), F.col("a.n") * F.col("b.n")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("concordant"),
            F.sum(
                F.when(F.col("a.y") > F.col("b.y"), F.col("a.n") * F.col("b.n")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("discordant"),
        )
    )
    xm = (
        cells.groupBy("flag", "x")
        .agg(F.sum("n").cast("long").alias("t"))
        .groupBy("flag")
        .agg((F.sum(F.col("t") * (F.col("t") - 1) / 2)).cast("long").alias("ties_x"))
    )
    ym = (
        cells.groupBy("flag", "y")
        .agg(F.sum("n").cast("long").alias("t"))
        .groupBy("flag")
        .agg((F.sum(F.col("t") * (F.col("t") - 1) / 2)).cast("long").alias("ties_y"))
    )
    tot = cells.groupBy("flag").agg(
        F.sum("n").cast("long").alias("n_rows"),
        (F.sum("n") * (F.sum("n") - 1) / 2).cast("long").alias("n_pairs"),
    )
    tau = (
        (F.col("concordant") - F.col("discordant")).cast("double")
        / (
            F.sqrt((F.col("n_pairs") - F.col("ties_x")).cast("double"))
            * F.sqrt((F.col("n_pairs") - F.col("ties_y")).cast("double"))
        )
    )
    return (
        tot.join(pairs, "flag")
        .join(xm, "flag")
        .join(ym, "flag")
        .select(
            F.col("flag").alias("l_returnflag"),
            "n_rows",
            "n_pairs",
            "concordant",
            "discordant",
            "ties_x",
            "ties_y",
            F.round(tau, 9).alias("tau_b"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Inventory / operations analytics
# ---------------------------------------------------------------------------


@register(
    "q372_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM rev),
    ranked AS (
      SELECT r.l_partkey, r.cents, t.total,
             CAST(sum(r.cents) OVER (ORDER BY r.cents DESC, r.l_partkey) AS BIGINT) AS cum
      FROM rev r CROSS JOIN tot t
    ),
    classed AS (
      SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A'
                  WHEN cum * 20 <= total * 19 THEN 'B'
                  ELSE 'C' END AS abc_class,
             cents, total
      FROM ranked
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS class_revenue,
           round(CAST(sum(cents) AS DOUBLE) / CAST(max(total) AS DOUBLE), 9)
             AS revenue_share
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
)
def q372_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by discounted revenue,
    class A = the head covering <=80% of cumulative revenue, B = next
    <=95%, C = the tail — the Pareto cut every warehouse slotting and
    cycle-count policy starts from. Class boundaries are EXACT integer
    comparisons (cum*5 <= total*4, cum*20 <= total*19) on cents, so no
    float ever decides a class. One part-level agg, then a cumulative
    window over parts ordered by (revenue desc, partkey); the window is
    single-partition but part-bounded (|parts| ~ |lineitem|/30 — at real
    scale the same cut runs on a range-partitioned sort like q334's
    Lorenz curve). Final class rollup is three rows."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5).cast("long")
        )
        .cast("long")
        .alias("cents")
    )
    tot = rev.agg(F.sum("cents").cast("long").alias("total"))
    wc = W.orderBy(F.desc("cents"), "l_partkey").rowsBetween(W.unboundedPreceding, W.currentRow)
    ranked = rev.crossJoin(F.broadcast(tot)).withColumn(
        "cum", F.sum("cents").over(wc).cast("long")
    )
    classed = ranked.select(
        F.when(F.col("cum") * 5 <= F.col("total") * 4, F.lit("A"))
        .when(F.col("cum") * 20 <= F.col("total") * 19, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
        "cents",
        "total",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("cents").cast("double") / 100, 2).alias("class_revenue"),
            F.round(
                F.sum("cents").cast("double") / F.max("total").cast("double"), 9
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


@register(
    "q373_littles_law",
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey, o.o_orderpriority AS priority,
             date_trunc('day', o.o_orderdate) AS start_day,
             date_trunc('day', max(l.l_shipdate)) AS end_day
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    ),
    a AS (
      SELECT priority, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(date_diff('day', start_day, end_day)) AS BIGINT)
               AS total_open_days,
             CAST(date_diff('day', min(start_day), max(end_day)) AS BIGINT)
               AS span_days
      FROM per_order GROUP BY priority
    ),
    ev AS (
      SELECT priority, day, CAST(sum(delta) AS BIGINT) AS delta
      FROM (
        SELECT priority, start_day AS day, 1 AS delta FROM per_order
        UNION ALL
        SELECT priority, end_day AS day, -1 AS delta FROM per_order
      ) GROUP BY priority, day
    ),
    sweep AS (
      SELECT priority,
             CAST(sum(delta) OVER (PARTITION BY priority ORDER BY day)
                  AS BIGINT) AS wip,
             CAST(date_diff('day', day,
                            lead(day) OVER (PARTITION BY priority ORDER BY day))
                  AS BIGINT) AS gap_days
      FROM ev
    ),
    b AS (
      SELECT priority,
             CAST(sum(wip * gap_days) AS BIGINT) AS wip_integral_days
      FROM sweep WHERE gap_days IS NOT NULL GROUP BY priority
    )
    SELECT a.priority, a.n_orders, a.total_open_days, b.wip_integral_days,
           a.total_open_days = b.wip_integral_days AS identity_ok,
           round(CAST(a.n_orders AS DOUBLE) / a.span_days, 9) AS lambda_per_day,
           round(CAST(a.total_open_days AS DOUBLE) / a.n_orders, 9) AS avg_w_days,
           round(CAST(b.wip_integral_days AS DOUBLE) / a.span_days, 9) AS avg_l_wip
    FROM a JOIN b ON a.priority = b.priority
    ORDER BY a.priority
    """,
)
def q373_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit (L = lambda * W) on the order lifecycle: an
    order is "in system" from order day until its last lineitem ships.
    Side A sums per-order open durations; side B integrates the
    work-in-progress step function with a +1/-1 sweepline (cumulative
    sum over day events x day gaps). The two sides are the SAME integer
    by construction — `identity_ok` certifies the queueing identity
    exactly, the way a warehouse-ops dashboard cross-checks its WIP and
    throughput counters. lambda (orders/day), W (avg days in system) and
    L (avg WIP) are single IEEE divides over the integer sums. Shapes:
    one per-order agg (shuffle on orderkey), one day-level agg, one
    5-partition sweep window."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.col("o_orderpriority").alias("priority"), "o_orderdate")
        .agg(F.max("l_shipdate").alias("end_ts"))
        .select(
            "priority",
            F.date_trunc("day", "o_orderdate").alias("start_day"),
            F.date_trunc("day", "end_ts").alias("end_day"),
        )
    )
    a = per_order.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.datediff("end_day", "start_day")).cast("long").alias("total_open_days"),
        F.datediff(F.max("end_day"), F.min("start_day")).cast("long").alias("span_days"),
    )
    ev = (
        per_order.select("priority", F.col("start_day").alias("day"), F.lit(1).alias("delta"))
        .unionAll(
            per_order.select(
                "priority", F.col("end_day").alias("day"), F.lit(-1).alias("delta")
            )
        )
        .groupBy("priority", "day")
        .agg(F.sum("delta").cast("long").alias("delta"))
    )
    wp = W.partitionBy("priority").orderBy("day")
    sweep = ev.select(
        "priority",
        F.sum("delta").over(wp).cast("long").alias("wip"),
        F.datediff(F.lead("day").over(wp), F.col("day")).cast("long").alias("gap_days"),
    )
    b = (
        sweep.filter(F.col("gap_days").isNotNull())
        .groupBy("priority")
        .agg(F.sum(F.col("wip") * F.col("gap_days")).cast("long").alias("wip_integral_days"))
    )
    return (
        a.join(b, "priority")
        .select(
            "priority",
            "n_orders",
            "total_open_days",
            "wip_integral_days",
            (F.col("total_open_days") == F.col("wip_integral_days")).alias("identity_ok"),
            F.round(F.col("n_orders").cast("double") / F.col("span_days"), 9).alias(
                "lambda_per_day"
            ),
            F.round(F.col("total_open_days").cast("double") / F.col("n_orders"), 9).alias(
                "avg_w_days"
            ),
            F.round(F.col("wip_integral_days").cast("double") / F.col("span_days"), 9).alias(
                "avg_l_wip"
            ),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Streaming operations planning
# ---------------------------------------------------------------------------


@register(
    "q374_watermark_lateness",
    oracle="""
    WITH arr AS (
      SELECT event_type,
             CAST(epoch_us(ts) AS BIGINT) AS us,
             CAST(max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id)
                  AS BIGINT) AS run_max_us
      FROM events
    ),
    late AS (
      SELECT event_type, run_max_us - us AS lateness_us FROM arr
    ),
    ranked AS (
      SELECT event_type, lateness_us,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY lateness_us) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM late
    ),
    p95 AS (
      SELECT event_type, lateness_us AS p95_lateness_us
      FROM ranked WHERE rn = CAST(ceil(0.95 * n) AS BIGINT)
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(max(lateness_us) AS BIGINT) AS max_lateness_us,
             CAST(sum(CASE WHEN lateness_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d0,
             CAST(sum(CASE WHEN lateness_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
             CAST(sum(CASE WHEN lateness_us > 300000000 THEN 1 ELSE 0 END) AS BIGINT) AS d300,
             CAST(sum(CASE WHEN lateness_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS d3600
      FROM late GROUP BY event_type
    )
    SELECT a.event_type, a.n_events, p.p95_lateness_us, a.max_lateness_us,
           round(CAST(a.d0 AS DOUBLE) / a.n_events, 9) AS drop_pct_0s,
           round(CAST(a.d60 AS DOUBLE) / a.n_events, 9) AS drop_pct_60s,
           round(CAST(a.d300 AS DOUBLE) / a.n_events, 9) AS drop_pct_300s,
           round(CAST(a.d3600 AS DOUBLE) / a.n_events, 9) AS drop_pct_1h
    FROM agg a JOIN p95 p ON a.event_type = p.event_type
    ORDER BY a.event_type
    """,
)
def q374_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark / allowed-lateness planning for the streaming jobs
    (q32/q45/q61): out-of-orderness of each event = running-max event
    time along the ARRIVAL order (event_id per user) minus its own event
    time, in exact integer microseconds. Per event type: the exact p95
    and max lateness order statistics plus the fraction of events a
    watermark of 0s / 60s / 300s / 1h would drop — precisely the table
    an engineer reads before choosing `withWatermark`. The running max
    rides one per-user window shuffle; the drop fractions are
    conditional sums in ONE type-level agg (no 4x candidate explode);
    p95 is a per-type order statistic like q370's VaR."""
    ev = _t(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("event_id")
    # NTZ→LTZ cast is wall-clock-identical under the pinned UTC session
    eus = F.unix_micros(F.col("ts").cast("timestamp"))
    late = ev.select(
        "event_type",
        (F.max(eus).over(wu) - eus).cast("long").alias("lateness_us"),
    )
    wr = W.partitionBy("event_type").orderBy("lateness_us")
    ranked = late.select(
        "event_type",
        "lateness_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n"),
    )
    p95 = ranked.filter(
        F.col("rn") == F.ceil(0.95 * F.col("n")).cast("long")
    ).select("event_type", F.col("lateness_us").alias("p95_lateness_us"))

    def dropped(th_us: int, name: str):
        return F.sum(
            F.when(F.col("lateness_us") > th_us, F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias(name)

    agg = late.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("lateness_us").cast("long").alias("max_lateness_us"),
        dropped(0, "d0"),
        dropped(60_000_000, "d60"),
        dropped(300_000_000, "d300"),
        dropped(3_600_000_000, "d3600"),
    )
    n = F.col("n_events").cast("double")
    return (
        agg.join(F.broadcast(p95), "event_type")
        .select(
            "event_type",
            "n_events",
            "p95_lateness_us",
            "max_lateness_us",
            F.round(F.col("d0") / n, 9).alias("drop_pct_0s"),
            F.round(F.col("d60") / n, 9).alias("drop_pct_60s"),
            F.round(F.col("d300") / n, 9).alias("drop_pct_300s"),
            F.round(F.col("d3600") / n, 9).alias("drop_pct_1h"),
        )
        .orderBy("event_type")
    )
