"""Seventh-wave query surface (round 4 continuation): finance/market
analytics (drawdown, VWAP, MRR waterfall), agreement and robustness
statistics, inequality/concentration measures, graph peeling, SQL-surface
parity (lateral joins), and text/curation additions.

Same contract as queries.py / queries_llm.py / queries_r4.py: every query
is exact-oracle-gated against DuckDB at sf0.01. The recurring exactness
tricks: integer cents for anything summed, a single shared IEEE chain for
anything ratio-valued, deterministic tie-breaks on every ORDER BY, and
rounding only to quantize an already-identical double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .queries import DEC, _t, register

# ---------------------------------------------------------------------------
# Finance / market analytics
# ---------------------------------------------------------------------------


@register(
    "q328_max_drawdown",
    oracle="""
    WITH bal AS (
      SELECT user_id, ts, event_id,
             CAST(sum(CAST(floor(value * 100) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS BIGINT) AS balance
      FROM events
    ),
    dd AS (
      SELECT user_id, balance,
             CAST(max(balance) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS BIGINT) AS peak
      FROM bal
    )
    SELECT user_id,
           CAST(max(peak - balance) AS BIGINT) AS max_drawdown_cents,
           CAST(max(peak) AS BIGINT) AS peak_cents,
           CAST(count(*) AS BIGINT) AS n_obs
    FROM dd GROUP BY user_id
    ORDER BY max_drawdown_cents DESC, user_id LIMIT 50
    """,
)
def q328_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per account: running balance (cumulative cents),
    running peak (cumulative max over the same ordering), drawdown =
    peak - balance, maximized per user — the risk metric every portfolio
    and SRE error-budget dashboard shares. All-integer arithmetic: both
    cumulative windows ride ONE per-user shuffle (same partition + order),
    the groupBy reuses the partitioning, so the whole query is one
    exchange + the top-50 sort."""
    ev = _t(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    bal = ev.select(
        "user_id",
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .over(wu)
        .cast("long")
        .alias("balance"),
        F.max(
            F.sum(F.floor(F.col("value") * 100).cast("long")).over(wu)
        )
        .over(wu)
        .cast("long")
        .alias("peak"),
    )
    return (
        bal.groupBy("user_id")
        .agg(
            F.max(F.col("peak") - F.col("balance"))
            .cast("long")
            .alias("max_drawdown_cents"),
            F.max("peak").cast("long").alias("peak_cents"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .orderBy(F.desc("max_drawdown_cents"), "user_id")
        .limit(50)
    )


@register(
    "q329_vwap_bars",
    oracle="""
    WITH trades AS (
      SELECT p.p_brand AS brand,
             CAST(date_trunc('day', l.l_shipdate) AS TIMESTAMP) AS day,
             CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
               * CAST(floor(l.l_quantity) AS BIGINT) AS notional,
             CAST(floor(l.l_quantity) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    bars AS (
      SELECT brand, day,
             CAST(sum(notional) AS BIGINT) AS notional,
             CAST(sum(qty) AS BIGINT) AS volume
      FROM trades GROUP BY brand, day
    ),
    cum AS (
      SELECT brand, day, notional, volume,
             CAST(sum(notional) OVER w AS BIGINT) AS cn,
             CAST(sum(volume) OVER w AS BIGINT) AS cv
      FROM bars
      WINDOW w AS (PARTITION BY brand ORDER BY day)
    )
    SELECT brand, day, volume,
           CAST((notional // volume) * 1000000
                + ((notional % volume) * 1000000) // volume AS BIGINT)
             AS vwap_microcents,
           CAST((cn // cv) * 1000000 + ((cn % cv) * 1000000) // cv AS BIGINT)
             AS cum_vwap_microcents
    FROM cum ORDER BY brand, day
    """,
)
def q329_vwap_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily VWAP bars per brand plus the ANCHORED (cumulative) VWAP —
    volume-weighted average price and its running anchor, the
    execution-quality benchmark (q291 builds OHLC candles; this is the
    ratio layer). VWAP is emitted in INTEGER MICROCENTS via two-step
    long division (q*1e6 + (rem*1e6)//volume) — the quotient never
    touches IEEE doubles, so there is no rounding-tie surface at all
    (a round(double, 6) variant mismatched on exact half-ulp ties; all
    operands here are non-negative, where // and DIV agree across
    engines). Broadcast the part dim; one agg shuffle + one brand
    window."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    trades = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.date_trunc("day", "l_shipdate").cast("timestamp").alias("day"),
        (
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
            * F.floor(F.col("l_quantity")).cast("long")
        ).alias("notional"),
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
    )
    bars = trades.groupBy("brand", "day").agg(
        F.sum("notional").cast("long").alias("notional"),
        F.sum("qty").cast("long").alias("volume"),
    )
    w = W.partitionBy("brand").orderBy("day")
    cum = bars.select(
        "brand",
        "day",
        "notional",
        "volume",
        F.sum("notional").over(w).cast("long").alias("cn"),
        F.sum("volume").over(w).cast("long").alias("cv"),
    )

    def micro(num: str, den: str):
        q = F.expr(f"{num} DIV {den}")
        rem = F.col(num) % F.col(den)
        return (q * 1000000 + F.expr(f"(({num} % {den}) * 1000000) DIV {den}")).cast(
            "long"
        )

    return cum.select(
        "brand",
        "day",
        "volume",
        micro("notional", "volume").alias("vwap_microcents"),
        micro("cn", "cv").alias("cum_vwap_microcents"),
    ).orderBy("brand", "day")


@register(
    "q330_mrr_waterfall",
    oracle="""
    WITH rev AS (
      SELECT o_custkey AS cust,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS mrr
      FROM orders GROUP BY cust, m
    ),
    months AS (SELECT DISTINCT m FROM rev),
    custs AS (SELECT DISTINCT cust FROM rev),
    grid AS (
      SELECT c.cust, mo.m, coalesce(r.mrr, 0) AS mrr
      FROM custs c CROSS JOIN months mo
      LEFT JOIN rev r ON r.cust = c.cust AND r.m = mo.m
    ),
    moves AS (
      SELECT cust, m, mrr,
             coalesce(lag(mrr) OVER (PARTITION BY cust ORDER BY m), 0) AS prev
      FROM grid
    )
    SELECT m AS month,
           CAST(sum(CASE WHEN prev = 0 AND mrr > 0 THEN mrr ELSE 0 END)
                AS BIGINT) AS new_mrr,
           CAST(sum(CASE WHEN prev > 0 AND mrr > prev THEN mrr - prev
                         ELSE 0 END) AS BIGINT) AS expansion_mrr,
           CAST(sum(CASE WHEN prev > 0 AND mrr > 0 AND mrr < prev
                         THEN prev - mrr ELSE 0 END) AS BIGINT)
             AS contraction_mrr,
           CAST(sum(CASE WHEN prev > 0 AND mrr = 0 THEN prev ELSE 0 END)
                AS BIGINT) AS churned_mrr,
           CAST(sum(mrr - prev) AS BIGINT) AS net_change
    FROM moves GROUP BY m ORDER BY month
    """,
)
def q330_mrr_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR movement waterfall — the SaaS revenue bridge: per customer per
    month recurring revenue on a DENSE month grid (missing month = 0),
    month-over-month deltas classified new / expansion / contraction /
    churned, aggregated per month; net_change ties out to the sum of the
    four components by construction. The grid is customers x months
    (bounded: months is date-range-sized), built with a broadcast of the
    month list so the only shuffles are the revenue agg, the per-customer
    lag window, and the final month agg. Exact integer cents
    throughout."""
    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.date_trunc("month", "o_orderdate").cast("timestamp").alias("m"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("mrr")
    )
    months = rev.select("m").distinct()
    custs = rev.select("cust").distinct()
    grid = custs.crossJoin(F.broadcast(months)).join(
        rev, ["cust", "m"], "left"
    ).select("cust", "m", F.coalesce(F.col("mrr"), F.lit(0)).alias("mrr"))
    moves = grid.select(
        "cust",
        "m",
        "mrr",
        F.coalesce(
            F.lag("mrr").over(W.partitionBy("cust").orderBy("m")), F.lit(0)
        ).alias("prev"),
    )
    mrr, prev = F.col("mrr"), F.col("prev")
    return (
        moves.groupBy(F.col("m").alias("month"))
        .agg(
            F.sum(F.when((prev == 0) & (mrr > 0), mrr).otherwise(0))
            .cast("long")
            .alias("new_mrr"),
            F.sum(F.when((prev > 0) & (mrr > prev), mrr - prev).otherwise(0))
            .cast("long")
            .alias("expansion_mrr"),
            F.sum(
                F.when((prev > 0) & (mrr > 0) & (mrr < prev), prev - mrr).otherwise(0)
            )
            .cast("long")
            .alias("contraction_mrr"),
            F.sum(F.when((prev > 0) & (mrr == 0), prev).otherwise(0))
            .cast("long")
            .alias("churned_mrr"),
            F.sum(mrr - prev).cast("long").alias("net_change"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Agreement / robustness statistics
# ---------------------------------------------------------------------------


@register(
    "q331_cohens_kappa",
    oracle="""
    WITH rated AS (
      SELECT CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 500 THEN 1
                  ELSE 2 END AS ra,
             CASE WHEN len(string_split_regex(trim(text), '\\s+')) < 40 THEN 0
                  WHEN len(string_split_regex(trim(text), '\\s+')) < 100 THEN 1
                  ELSE 2 END AS rb
      FROM documents
    ),
    cells AS (SELECT ra, rb, CAST(count(*) AS BIGINT) AS c
              FROM rated GROUP BY ra, rb),
    rows_ AS (SELECT ra AS k, CAST(sum(c) AS BIGINT) AS nrow
              FROM cells GROUP BY ra),
    cols_ AS (SELECT rb AS k, CAST(sum(c) AS BIGINT) AS ncol
              FROM cells GROUP BY rb),
    agree AS (SELECT CAST(sum(CASE WHEN ra = rb THEN c ELSE 0 END) AS BIGINT)
                       AS diag,
                     CAST(sum(c) AS BIGINT) AS n FROM cells),
    expect AS (SELECT CAST(sum(r.nrow * c.ncol) AS BIGINT) AS e
               FROM rows_ r JOIN cols_ c ON r.k = c.k)
    SELECT a.n,
           a.diag AS n_agree,
           round(CAST(a.diag AS DOUBLE) / a.n, 9) AS p_observed,
           round(CAST(x.e AS DOUBLE) / (CAST(a.n AS DOUBLE) * a.n), 9)
             AS p_expected,
           round((CAST(a.diag AS DOUBLE) / a.n
                  - CAST(x.e AS DOUBLE) / (CAST(a.n AS DOUBLE) * a.n))
                 / (1 - CAST(x.e AS DOUBLE) / (CAST(a.n AS DOUBLE) * a.n)),
                 9) AS kappa
    FROM agree a, expect x
    """,
)
def q331_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa inter-rater agreement between two independent
    labeling heuristics over the corpus (a char-length rater vs a
    word-count rater, 3 classes each) — the standard chance-corrected
    agreement score for annotation-quality QA on labeled training data.
    Cell/marginal counts are exact integers; p_o, p_e, and kappa are one
    shared IEEE chain over those integers. One groupBy on the 3x3
    contingency; marginals reduce a 9-row table."""
    d = _t(spark, sf_dir, "documents")
    wc = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    rated = d.select(
        F.when(F.col("n_chars") < 200, 0)
        .when(F.col("n_chars") < 500, 1)
        .otherwise(2)
        .alias("ra"),
        F.when(wc < 40, 0).when(wc < 100, 1).otherwise(2).alias("rb"),
    )
    cells = rated.groupBy("ra", "rb").agg(F.count(F.lit(1)).alias("c"))
    rows_ = cells.groupBy(F.col("ra").alias("k")).agg(F.sum("c").alias("nrow"))
    cols_ = cells.groupBy(F.col("rb").alias("k")).agg(F.sum("c").alias("ncol"))
    agree = cells.agg(
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("diag"),
        F.sum("c").cast("long").alias("n"),
    )
    expect = (
        rows_.join(cols_, "k")
        .agg(F.sum(F.col("nrow") * F.col("ncol")).cast("long").alias("e"))
    )
    po = F.col("diag").cast("double") / F.col("n")
    pe = F.col("e").cast("double") / (F.col("n").cast("double") * F.col("n"))
    return agree.crossJoin(F.broadcast(expect)).select(
        "n",
        F.col("diag").alias("n_agree"),
        F.round(po, 9).alias("p_observed"),
        F.round(pe, 9).alias("p_expected"),
        F.round((po - pe) / (1 - pe), 9).alias("kappa"),
    )


@register(
    "q332_mcnemar_test",
    oracle="""
    WITH paired AS (
      SELECT (n_chars > 400) AS a,
             (len(string_split_regex(trim(text), '\\s+')) > 80) AS b
      FROM documents
    ),
    counts AS (
      SELECT CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
               AS b01,
             CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
               AS b10,
             CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS both_,
             CAST(count(*) AS BIGINT) AS n
      FROM paired
    )
    SELECT n, both_ AS n_both, b01 AS n_only_a, b10 AS n_only_b,
           round(CAST((abs(b01 - b10) - 1) * (abs(b01 - b10) - 1) AS DOUBLE)
                 / (b01 + b10), 9) AS mcnemar_chi2
    FROM counts
    """,
)
def q332_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired binary classifiers (char-length rule vs
    word-count rule on the SAME documents) with Edwards' continuity
    correction: chi2 = (|b-c|-1)^2/(b+c), the marginal-homogeneity check
    for comparing two models on one eval set. Discordant counts are
    exact; the statistic is one integer-over-integer division. A single
    aggregate, no shuffle beyond the partial-combine."""
    d = _t(spark, sf_dir, "documents")
    a = F.col("n_chars") > 400
    b = F.size(F.split(F.trim(F.col("text")), r"\s+")) > 80
    counts = d.select(a.alias("a"), b.alias("b")).agg(
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("b01"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("b10"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("both_"),
        F.count(F.lit(1)).alias("n"),
    )
    diff = F.abs(F.col("b01") - F.col("b10")) - 1
    return counts.select(
        "n",
        F.col("both_").alias("n_both"),
        F.col("b01").alias("n_only_a"),
        F.col("b10").alias("n_only_b"),
        F.round(
            (diff * diff).cast("double") / (F.col("b01") + F.col("b10")), 9
        ).alias("mcnemar_chi2"),
    )


@register(
    "q333_brown_forsythe",
    oracle="""
    WITH med AS (
      SELECT source, n_chars AS m FROM (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS cnt
        FROM documents
      ) WHERE rn = CAST(ceil(cnt / 2.0) AS BIGINT)
    ),
    z AS (
      SELECT d.source, CAST(abs(d.n_chars - med.m) AS BIGINT) AS z
      FROM documents d JOIN med ON d.source = med.source
    ),
    g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(z) AS DECIMAL(38,0)) AS s,
             CAST(sum(z * z) AS DECIMAL(38,0)) AS q
      FROM z GROUP BY source
    ),
    terms AS (
      SELECT source, n, s, q,
             CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 9)
                  AS DECIMAL(28,9)) AS sq_over_n
      FROM g
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k,
             sum(s) AS ss, sum(q) AS qq, sum(sq_over_n) AS b
      FROM terms
    )
    SELECT t.source, t.n,
           round(CAST(t.s AS DOUBLE) / t.n, 6) AS mean_abs_dev,
           round(
             ((CAST(tot.b AS DOUBLE)
               - CAST(tot.ss AS DOUBLE) * CAST(tot.ss AS DOUBLE) / tot.nn)
              / (tot.k - 1))
             / ((CAST(tot.qq AS DOUBLE) - CAST(tot.b AS DOUBLE))
                / (tot.nn - tot.k)),
             6) AS bf_stat
    FROM terms t, tot ORDER BY t.source
    """,
)
def q333_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe homogeneity-of-variance test across document
    sources: one-way ANOVA on |x - group_median| — the robust Levene
    variant that gates whether pooled-variance tests (Welch vs Student)
    are even applicable. Group medians are deterministic lower-median
    order statistics (integer char counts), so z is exact integer; the
    F arithmetic reuses q211's round-then-decimal order-free reduction.
    One median window + one broadcast join-back + one moment agg."""
    d = _t(spark, sf_dir, "documents")
    wsrc = W.partitionBy("source").orderBy("n_chars", "doc_id")
    med = (
        d.select(
            "source",
            "n_chars",
            F.row_number().over(wsrc).alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy("source")).alias("cnt"),
        )
        .filter(F.col("rn") == F.ceil(F.col("cnt") / 2.0).cast("long"))
        .select("source", F.col("n_chars").alias("m"))
    )
    z = d.join(F.broadcast(med), "source").select(
        "source", F.abs(F.col("n_chars") - F.col("m")).cast("long").alias("z")
    )
    g = z.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("z").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("z") * F.col("z")).cast("decimal(38,0)")).alias("q"),
    )
    terms = g.select(
        "*",
        F.round(
            F.col("s").cast("double") * F.col("s").cast("double") / F.col("n"), 9
        )
        .cast("decimal(28,9)")
        .alias("sq_over_n"),
    )
    tot = terms.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.sum("sq_over_n").alias("b"),
    )
    ssb = (
        F.col("b").cast("double")
        - F.col("ss").cast("double") * F.col("ss").cast("double") / F.col("nn")
    )
    ssw = F.col("qq").cast("double") - F.col("b").cast("double")
    return (
        terms.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n",
            F.round(F.col("s").cast("double") / F.col("n"), 6).alias("mean_abs_dev"),
            F.round(
                (ssb / (F.col("k") - 1)) / (ssw / (F.col("nn") - F.col("k"))), 6
            ).alias("bf_stat"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Inequality / concentration measures
# ---------------------------------------------------------------------------


@register(
    "q334_gini_lorenz",
    oracle="""
    WITH x AS (
      SELECT o_custkey AS cust,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY cust
    ),
    ranked AS (
      SELECT cust, rev,
             row_number() OVER (ORDER BY rev, cust) AS i,
             ntile(10) OVER (ORDER BY rev, cust) AS decile
      FROM x
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rev) AS BIGINT) AS t,
             CAST(sum(i * rev) AS DECIMAL(38,0)) AS iw
      FROM ranked
    ),
    dec AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(rev) AS BIGINT) AS dec_rev,
             CAST(max(i) AS BIGINT) AS max_i
      FROM ranked GROUP BY decile
    )
    SELECT d.decile, d.n_cust,
           round(CAST(sum(d.dec_rev) OVER (ORDER BY d.decile) AS DOUBLE)
                 / t.t, 9) AS cum_rev_share,
           round(CAST(d.max_i AS DOUBLE) / t.n, 9) AS cum_pop_share,
           round((2 * CAST(t.iw AS DOUBLE) - (t.n + 1)
                  * CAST(t.t AS DOUBLE))
                 / (CAST(t.n AS DOUBLE) * t.t), 9) AS gini
    FROM dec d, tot t ORDER BY d.decile
    """,
)
def q334_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve + Gini of customer revenue concentration — the
    decile curve auditors actually plot (q137 reports the scalar Gini
    for join-key skew; this produces the full cumulative-share curve
    over a business measure, with population shares to read the
    "top 10% hold X%" figures off directly). Rank products
    accumulate in DECIMAL(38,0) so the reduction is order-free; every
    share is one division over exact integers. One agg + one global
    rank window (range-partition sorted at scale) + a 10-row decile
    rollup."""
    o = _t(spark, sf_dir, "orders")
    x = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("rev")
    )
    wr = W.orderBy("rev", "cust")
    ranked = x.select(
        "cust",
        "rev",
        F.row_number().over(wr).cast("long").alias("i"),
        F.ntile(10).over(wr).alias("decile"),
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").cast("long").alias("t"),
        F.sum((F.col("i") * F.col("rev")).cast("decimal(38,0)")).alias("iw"),
    )
    dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("rev").cast("long").alias("dec_rev"),
        F.max("i").cast("long").alias("max_i"),
    )
    wd = W.orderBy("decile")
    gini = (
        2 * F.col("iw").cast("double")
        - (F.col("n") + 1) * F.col("t").cast("double")
    ) / (F.col("n").cast("double") * F.col("t"))
    return (
        dec.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_cust",
            F.round(
                F.sum("dec_rev").over(wd).cast("double") / F.col("t"), 9
            ).alias("cum_rev_share"),
            F.round(F.col("max_i").cast("double") / F.col("n"), 9).alias(
                "cum_pop_share"
            ),
            F.round(gini, 9).alias("gini"),
        )
        .orderBy("decile")
    )


@register(
    "q335_hhi_concentration",
    oracle="""
    WITH firm AS (
      SELECT c.c_mktsegment AS segment, l.l_suppkey AS firm,
             CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY segment, firm
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_firms,
           CAST(sum(rev) AS BIGINT) AS total_cents,
           round(CAST(CAST(sum(CAST(rev AS DECIMAL(38,0)) * rev)
                           AS DECIMAL(38,0)) AS DOUBLE)
                 / (CAST(sum(rev) AS DOUBLE) * CAST(sum(rev) AS DOUBLE))
                 * 10000, 6) AS hhi,
           round(CAST(max(rev) AS DOUBLE) / CAST(sum(rev) AS DOUBLE), 9)
             AS top_share
    FROM firm GROUP BY segment ORDER BY segment
    """,
)
def q335_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index per market segment over
    supplier revenue shares — the antitrust/marketplace concentration
    monitor. HHI = Sum(share^2)*10000 computed as Sum(rev^2)/total^2 so
    nothing is divided per row: squared revenues accumulate in
    DECIMAL(38,0) (order-free), the index is one IEEE chain over two
    exact totals. One fact-side agg (orders joined broadcast-side), one
    segment rollup."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    firm = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("l_suppkey").alias("firm"),
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("rev")
        )
    )
    tot = F.sum("rev").cast("long")
    return (
        firm.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_firms"),
            tot.alias("total_cents"),
            F.round(
                F.sum(F.col("rev").cast("decimal(38,0)") * F.col("rev"))
                .cast("decimal(38,0)")
                .cast("double")
                / (tot.cast("double") * tot.cast("double"))
                * 10000,
                6,
            ).alias("hhi"),
            F.round(
                F.max("rev").cast("double") / tot.cast("double"), 9
            ).alias("top_share"),
        )
        .orderBy("segment")
    )


@register(
    "q336_theil_index",
    oracle="""
    WITH x AS (
      SELECT o_custkey AS cust,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY cust
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(rev) AS BIGINT) AS t FROM x),
    terms AS (
      SELECT CAST(round(
               (rev / (CAST(t.t AS DOUBLE) / t.n))
               * ln(rev / (CAST(t.t AS DOUBLE) / t.n)), 9)
             AS DECIMAL(28,9)) AS term
      FROM x, tot t WHERE rev > 0
    )
    SELECT t.n, t.t AS total_cents,
           round(CAST(sum(term) AS DOUBLE) / t.n, 9) AS theil_t
    FROM terms, tot t GROUP BY t.n, t.t
    """,
)
def q336_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer revenue: T = (1/n) *
    Sum((x/mu) * ln(x/mu)) — the decomposable entropy-based inequality
    measure (0 = perfect equality, ln(n) = one customer owns it all).
    Each term is the same IEEE chain on both engines (x exact integer,
    mu one division over exact totals), round(9)-pinned and summed in
    DECIMAL(28,9) so the cross-row float reduction is order-free (the
    q211 recipe). One agg + a broadcast of the 1-row totals."""
    o = _t(spark, sf_dir, "orders")
    x = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("rev")
    )
    tot = x.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev").cast("long").alias("t")
    )
    mu = F.col("t").cast("double") / F.col("n")
    term = F.round(
        (F.col("rev") / mu) * F.log(F.col("rev") / mu), 9
    ).cast("decimal(28,9)")
    return (
        x.crossJoin(F.broadcast(tot))
        .filter(F.col("rev") > 0)
        .select("n", F.col("t").alias("total_cents"), term.alias("term"))
        .groupBy("n", "total_cents")
        .agg(
            F.round(F.sum("term").cast("double") / F.col("n"), 9).alias("theil_t")
        )
        .select("n", "total_cents", "theil_t")
    )


# ---------------------------------------------------------------------------
# Graph analytics: peeling, link prediction, degree-law fitting
# ---------------------------------------------------------------------------

_KCORE_K = 25
_KCORE_ROUNDS = 6


def _q337_oracle() -> str:
    round_cte = """
    keep{i} AS MATERIALIZED (
      SELECT node FROM (
        SELECT s AS node, count(*) AS deg FROM e{prev} GROUP BY s
      ) WHERE deg >= {k}
    ),
    e{i} AS MATERIALIZED (
      SELECT e.s, e.d FROM e{prev} e
      JOIN keep{i} a ON e.s = a.node
      JOIN keep{i} b ON e.d = b.node
    ),
    r{i} AS (
      SELECT {i} AS round,
             CAST((SELECT count(*) FROM keep{i}) AS BIGINT) AS n_nodes,
             CAST((SELECT count(*) // 2 FROM e{i}) AS BIGINT) AS n_edges
    )"""
    its = ",".join(
        round_cte.format(i=i, prev=i - 1 if i > 1 else "0", k=_KCORE_K)
        for i in range(1, _KCORE_ROUNDS + 1)
    )
    unions = " UNION ALL ".join(
        f"SELECT * FROM r{i}" for i in range(1, _KCORE_ROUNDS + 1)
    )
    return f"""
    WITH base AS (
      SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
      FROM lineitem
    ),
    e0 AS MATERIALIZED (
      SELECT p AS s, s AS d FROM base
      UNION ALL SELECT s, p FROM base
    ),
    {its}
    SELECT round, n_nodes, n_edges FROM ({unions}) ORDER BY round
    """


@register("q337_kcore_peeling", oracle=_q337_oracle())
def q337_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core peeling (k=4) of the symmetrized part-supplier graph: each
    round drops nodes with degree < k and the edges touching them; the
    fixed point is the k-core, the standard dense-subgraph / influential-
    node filter. A FIXED round count (6, matched by an unrolled-CTE
    oracle) makes the output engine-deterministic whether or not the
    peel has converged. Per round: one degree agg + two semi-joins, all
    shuffles sized to the shrinking edge list; per-round survivor counts
    are the audit trail. At 100 TB each round's edge list shrinks
    monotonically, so the first rounds dominate cost."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_partkey") * 2).alias("p"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
    ).distinct()
    edges = base.select(F.col("p").alias("s"), F.col("s").alias("d")).unionByName(
        base.select(F.col("s").alias("s"), F.col("p").alias("d"))
    )
    # repartition once to a loop-sized parallelism; every round's shuffle
    # inherits it (edge lists shrink monotonically — no session-conf writes)
    cur = edges.repartition(8, "s").localCheckpoint(eager=False)
    # Per-round checkpoints stay lazy, and the per-round counts are DEFERRED
    # DataFrame aggregates unioned into the result (the q298 shape) instead
    # of driver-side .count() actions: the whole 6-round peel now runs as
    # ONE Spark action, with each round's survivor list materialized once
    # by its checkpoint and read by the two broadcast semi-joins plus the
    # count row. The eager-count version paid 12 driver-side job barriers
    # of pure scheduling latency for the same shuffles.
    stats = []
    for i in range(1, _KCORE_ROUNDS + 1):
        keep = (
            cur.groupBy("s")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select(F.col("s").alias("node"))
            .localCheckpoint(eager=False)
        )
        cur = (
            cur.join(F.broadcast(keep.withColumnRenamed("node", "s")), "s")
            .join(F.broadcast(keep.select(F.col("node").alias("d"))), "d")
            .select("s", "d")
            .localCheckpoint(eager=False)
        )
        stats.append(
            keep.groupBy()
            .agg(F.count(F.lit(1)).alias("n_nodes"))
            .crossJoin(
                F.broadcast(
                    cur.groupBy().agg(F.expr("count(1) div 2").alias("n_edges"))
                )
            )
            .select(
                F.lit(i).cast("int").alias("round"), "n_nodes", "n_edges"
            )
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out.orderBy("round")


@register(
    "q338_adamic_adar",
    oracle="""
    WITH pairs_base AS (
      SELECT DISTINCT l_partkey AS part, l_suppkey AS supp FROM lineitem
    ),
    deg AS (SELECT supp, CAST(count(*) AS BIGINT) AS d
            FROM pairs_base GROUP BY supp),
    cand AS (
      SELECT pb.part, pb.supp FROM pairs_base pb
      JOIN part p ON pb.part = p.p_partkey WHERE p.p_size <= 3
    ),
    co AS (
      SELECT a.part AS p1, b.part AS p2, a.supp
      FROM cand a JOIN cand b ON a.supp = b.supp AND a.part < b.part
    )
    SELECT p1, p2,
           CAST(count(*) AS BIGINT) AS n_common,
           round(CAST(sum(CAST(round(1.0 / ln(CAST(d.d AS DOUBLE)), 9)
                               AS DECIMAL(28,9))) AS DOUBLE), 6) AS aa_score
    FROM co JOIN deg d ON co.supp = d.supp
    GROUP BY p1, p2
    ORDER BY aa_score DESC, p1, p2 LIMIT 100
    """,
)
def q338_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the part-supplier bipartite
    graph: candidate part pairs sharing a supplier, scored by
    Sum(1/ln(deg(supplier))) — rare shared neighbors count more. The
    candidate set is blocked to small parts (p_size <= 3) so pair
    generation is bounded (the same blocked-candidates discipline as the
    fuzzy-linkage queries); degrees come from the FULL graph. Each
    1/ln(d) term is round(9)-pinned and summed in DECIMAL so the
    reduction is order-free. One pair self-join on supplier + one pair
    agg; top-100 rides a TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_size")
    pairs_base = li.select(
        F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp")
    ).distinct()
    deg = pairs_base.groupBy("supp").agg(F.count(F.lit(1)).alias("d"))
    cand = pairs_base.join(
        F.broadcast(p.filter(F.col("p_size") <= 3)),
        pairs_base.part == p.p_partkey,
    ).select("part", "supp")
    a = cand.alias("a")
    b = cand.alias("b")
    co = a.join(
        b,
        (F.col("a.supp") == F.col("b.supp")) & (F.col("a.part") < F.col("b.part")),
    ).select(
        F.col("a.part").alias("p1"), F.col("b.part").alias("p2"), F.col("a.supp").alias("supp")
    )
    term = F.round(1.0 / F.log(F.col("d").cast("double")), 9).cast("decimal(28,9)")
    return (
        co.join(F.broadcast(deg), "supp")
        .groupBy("p1", "p2")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.round(F.sum(term).cast("double"), 6).alias("aa_score"),
        )
        .orderBy(F.desc("aa_score"), "p1", "p2")
        .limit(100)
    )


@register(
    "q339_powerlaw_degree_mle",
    oracle="""
    WITH deg AS (
      SELECT l_suppkey AS node, CAST(count(DISTINCT l_partkey) AS BIGINT) AS d
      FROM lineitem GROUP BY node
    ),
    tail AS (SELECT d FROM deg WHERE d >= 8),
    terms AS (
      SELECT CAST(round(ln(CAST(d AS DOUBLE) / 7.5), 9) AS DECIMAL(28,9))
               AS lr
      FROM tail
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM tail) AS BIGINT) AS n_tail,
           CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_degree,
           round(1.0 + (SELECT count(*) FROM tail)
                 / CAST(sum(lr) AS DOUBLE), 6) AS alpha_hat
    FROM terms
    """,
)
def q339_powerlaw_degree_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law (Pareto) fit of the supplier degree distribution: the
    Clauset-Shalizi-Newman discrete MLE alpha = 1 + n / Sum(ln(d /
    (xmin - 0.5))) over the tail d >= xmin = 8 — the heavy-tail exponent
    that predicts hub skew (and thus shuffle skew) before it bites.
    Degrees are exact distinct counts; each log-ratio term is round(9)-
    pinned and summed in DECIMAL. One distinct agg + a scalar reduce."""
    li = _t(spark, sf_dir, "lineitem")
    deg = li.groupBy(F.col("l_suppkey").alias("node")).agg(
        F.count_distinct(F.col("l_partkey")).cast("long").alias("d")
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.when(F.col("d") >= 8, 1).otherwise(0)).cast("long").alias("n_tail"),
        F.max("d").cast("long").alias("max_degree"),
    )
    terms = deg.filter(F.col("d") >= 8).select(
        F.round(F.log(F.col("d").cast("double") / 7.5), 9)
        .cast("decimal(28,9)")
        .alias("lr")
    )
    ssum = terms.agg(F.sum("lr").alias("slr"))
    return (
        stats.crossJoin(F.broadcast(ssum))
        .select(
            "n_nodes",
            "n_tail",
            "max_degree",
            F.round(
                1.0 + F.col("n_tail") / F.col("slr").cast("double"), 6
            ).alias("alpha_hat"),
        )
    )


# ---------------------------------------------------------------------------
# SQL-surface parity: lateral joins, dependency discovery, blocked ranks
# ---------------------------------------------------------------------------


@register(
    "q340_lateral_topk",
    oracle="""
    SELECT n.n_name AS nation, t.c_name, t.c_acctbal
    FROM nation n,
         LATERAL (
           SELECT c_name, round(c_acctbal, 2) AS c_acctbal
           FROM customer
           WHERE c_nationkey = n.n_nationkey
           ORDER BY c_acctbal DESC, c_custkey LIMIT 3
         ) t
    ORDER BY nation, c_acctbal DESC, c_name
    """,
)
def q340_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — top-3 customers by balance per
    nation, expressed as the SQL-standard lateral join on BOTH engines
    (Spark 3.4+ LATERAL support; DuckDB lateral). Catalyst rewrites the
    correlated limit into a ranked window under the hood — this query
    pins that the rewrite exists and agrees with the oracle's semantics.
    The balance is rounded identically on both sides (storage doubles
    pass through untouched otherwise)."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("q340_nation")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("q340_customer")
    return spark.sql(
        """
        SELECT n.n_name AS nation, t.c_name, t.c_acctbal
        FROM q340_nation n,
             LATERAL (
               SELECT c_name, round(c_acctbal, 2) AS c_acctbal
               FROM q340_customer
               WHERE c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_custkey LIMIT 3
             ) t
        ORDER BY nation, c_acctbal DESC, c_name
        """
    )


_IND_COLS = [
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_orderkey"),
    ("orders", "o_custkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
]


def _q341_oracle() -> str:
    melts = " UNION ALL ".join(
        f"SELECT '{t}.{c}' AS tag, CAST({c} AS BIGINT) AS v "
        f"FROM (SELECT DISTINCT {c} FROM {t})"
        for t, c in _IND_COLS
    )
    return f"""
    WITH vals AS ({melts}),
    sizes AS (SELECT tag, CAST(count(*) AS BIGINT) AS n
              FROM vals GROUP BY tag),
    inter AS (
      SELECT a.tag AS child, b.tag AS parent, CAST(count(*) AS BIGINT) AS m
      FROM vals a JOIN vals b ON a.v = b.v AND a.tag <> b.tag
      GROUP BY a.tag, b.tag
    )
    SELECT i.child, i.parent, sc.n AS child_distinct, i.m AS n_contained,
           round(CAST(i.m AS DOUBLE) / sc.n, 9) AS containment,
           (i.m = sc.n) AS is_ind
    FROM inter i JOIN sizes sc ON i.child = sc.tag
    WHERE CAST(i.m AS DOUBLE) / sc.n >= 0.5
    ORDER BY child, parent
    """


@register("q341_ind_discovery", oracle=_q341_oracle())
def q341_ind_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency discovery over the star schema's key columns
    (the schema-inference primitive behind FK suggestion — the reference
    migrates declared FKs, sqlserver2pgsql.pl FK collectors; this finds
    the UNDECLARED ones): melt the distinct values of 8 key columns with
    column tags, self-join on value, and report containment
    |child INTERSECT parent| / |child| for every ordered pair above 0.5
    — containment 1.0 is a candidate foreign key. Distinct melts prune
    each scan to one column; the value join shuffles once on the value.
    Exact integer counts, one division."""
    vals = None
    for t, c in _IND_COLS:
        piece = (
            _t(spark, sf_dir, t)
            .select(F.col(c).cast("long").alias("v"))
            .distinct()
            .select(F.lit(f"{t}.{c}").alias("tag"), "v")
        )
        vals = piece if vals is None else vals.unionByName(piece)
    sizes = vals.groupBy("tag").agg(F.count(F.lit(1)).alias("n"))
    a = vals.alias("a")
    b = vals.alias("b")
    inter = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.tag") != F.col("b.tag")))
        .groupBy(F.col("a.tag").alias("child"), F.col("b.tag").alias("parent"))
        .agg(F.count(F.lit(1)).alias("m"))
    )
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed("tag", "child")), "child")
        .filter(F.col("m").cast("double") / F.col("n") >= 0.5)
        .select(
            "child",
            "parent",
            F.col("n").alias("child_distinct"),
            F.col("m").alias("n_contained"),
            F.round(F.col("m").cast("double") / F.col("n"), 9).alias("containment"),
            (F.col("m") == F.col("n")).alias("is_ind"),
        )
        .orderBy("child", "parent")
    )


@register(
    "q342_friedman_test",
    oracle="""
    WITH cell AS (
      SELECT date_trunc('week', ts) AS block, event_type AS treat,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS tot
      FROM events GROUP BY block, treat
    ),
    complete AS (
      SELECT block FROM cell GROUP BY block
      HAVING count(*) = (SELECT count(DISTINCT event_type) FROM events)
    ),
    ranked AS (
      SELECT c.block, c.treat,
             CAST(row_number() OVER (PARTITION BY c.block
                                     ORDER BY c.tot, c.treat) AS BIGINT) AS r
      FROM cell c JOIN complete b ON c.block = b.block
    ),
    rsum AS (
      SELECT treat, CAST(sum(r) AS BIGINT) AS rj,
             CAST(count(*) AS BIGINT) AS n
      FROM ranked GROUP BY treat
    ),
    params AS (
      SELECT CAST(max(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(rj * rj) AS BIGINT) AS s2
      FROM rsum
    )
    SELECT r.treat, r.rj AS rank_sum,
           round(12.0 / (p.n * p.k * (p.k + 1))
                 * CAST(p.s2 AS DOUBLE)
                 - 3.0 * p.n * (p.k + 1), 9) AS friedman_q
    FROM rsum r, params p ORDER BY r.treat
    """,
)
def q342_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test for treatment effects across blocks: weekly
    blocks x event-type treatments, cell = exact total cents, ranks
    assigned WITHIN each complete block (blocks missing a treatment are
    dropped — the standard complete-block requirement), statistic
    Q = 12/(n k (k+1)) * Sum(Rj^2) - 3 n (k+1). Cent totals make ties
    measure-zero and the (tot, treat) tie-break makes ranks identical on
    both engines regardless. Exact integer rank sums; Q is one IEEE
    chain. One cell agg + one per-block rank window + a k-row reduce."""
    ev = _t(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.date_trunc("week", "ts").alias("block"),
        F.col("event_type").alias("treat"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("tot")
    )
    k_total = ev.select(F.count_distinct("event_type").alias("k_all"))
    complete = (
        cell.groupBy("block")
        .agg(F.count(F.lit(1)).alias("k_in"))
        .crossJoin(F.broadcast(k_total))
        .filter(F.col("k_in") == F.col("k_all"))
        .select("block")
    )
    ranked = cell.join(F.broadcast(complete), "block").select(
        "block",
        "treat",
        F.row_number()
        .over(W.partitionBy("block").orderBy("tot", "treat"))
        .cast("long")
        .alias("r"),
    )
    rsum = ranked.groupBy("treat").agg(
        F.sum("r").cast("long").alias("rj"), F.count(F.lit(1)).alias("n")
    )
    params = rsum.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("rj") * F.col("rj")).cast("long").alias("s2"),
    )
    q = (
        12.0
        / (F.col("n") * F.col("k") * (F.col("k") + 1))
        * F.col("s2").cast("double")
        - 3.0 * F.col("n") * (F.col("k") + 1)
    )
    return (
        rsum.select("treat", "rj")
        .crossJoin(F.broadcast(params))
        .select("treat", F.col("rj").alias("rank_sum"), F.round(q, 9).alias("friedman_q"))
        .orderBy("treat")
    )


# ---------------------------------------------------------------------------
# Time-series: autocorrelation, Holt linear smoothing, Hurst exponent
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 10


def _q343_oracle() -> str:
    lag_cols = ",\n".join(
        f"lag(x, {k}) OVER (ORDER BY h) AS x{k}" for k in range(1, _ACF_MAX_LAG + 1)
    )
    lag_aggs = ",\n".join(
        f"CAST(sum(x * x{k}) AS BIGINT) AS s{k},"
        f" CAST(sum(CASE WHEN x{k} IS NOT NULL THEN x{k} END) AS BIGINT) AS a{k},"
        f" CAST(sum(CASE WHEN x{k} IS NOT NULL THEN x END) AS BIGINT) AS b{k}"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    acf_rows = " UNION ALL ".join(
        f"""SELECT {k} AS lag,
            (CAST(s{k} AS DOUBLE)
             - (CAST(t AS DOUBLE) / n) * (a{k} + b{k})
             + (n - {k}) * ((CAST(t AS DOUBLE) / n) * (CAST(t AS DOUBLE) / n)))
            / (CAST(q AS DOUBLE) - n * ((CAST(t AS DOUBLE) / n)
               * (CAST(t AS DOUBLE) / n))) AS r,
            n FROM m"""
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    return f"""
    WITH series AS (
      SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY h
    ),
    lagged AS (SELECT x, {lag_cols} FROM series),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS t,
             CAST(sum(x * x) AS BIGINT) AS q, {lag_aggs}
      FROM lagged
    ),
    acf AS ({acf_rows})
    SELECT lag, round(r, 9) AS acf,
           round(n * (n + 2.0)
                 * CAST(sum(CAST(round(r * r / (n - lag), 12)
                                 AS DECIMAL(28,12)))
                        OVER (ORDER BY lag) AS DOUBLE), 6) AS ljung_box_q
    FROM acf ORDER BY lag
    """


@register("q343_acf_ljungbox", oracle=_q343_oracle())
def q343_acf_ljungbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau white-noise test over the hourly event-count
    series (lags 1-10, cumulative Q per lag) — the inference layer q238's
    plain ACF stops short of: Q ~ chi2(k) decides whether the
    autocorrelation is significant, which is the test run on forecast
    residuals. Algebra differs from q238 too: a position-lag window over
    the hour sequence with algebraic demeaning, vs q238's dense-calendar
    self-join Pearson. All
    cross-products, marginal sums, and squares are exact BIGINT (the
    demeaning is algebraic: r_k = (S_k - mu(A_k+B_k) + (n-k)mu^2) /
    (Q - n mu^2), so mu enters one shared IEEE chain, never a per-row
    float). LB terms are round(12)-pinned, summed in DECIMAL via a
    cumulative window so every prefix is order-free. One hourly agg +
    one 10-lag global window (bounded: hours) + a 1-row reduce."""
    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("x")
    )
    wh = W.orderBy("h")
    lag_cols = [F.lag("x", k).over(wh).alias(f"x{k}") for k in range(1, _ACF_MAX_LAG + 1)]
    lagged = series.select("x", *lag_cols)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("t"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    ]
    for k in range(1, _ACF_MAX_LAG + 1):
        xk = F.col(f"x{k}")
        aggs += [
            F.sum(F.col("x") * xk).cast("long").alias(f"s{k}"),
            F.sum(F.when(xk.isNotNull(), xk)).cast("long").alias(f"a{k}"),
            F.sum(F.when(xk.isNotNull(), F.col("x"))).cast("long").alias(f"b{k}"),
        ]
    m = lagged.agg(*aggs)
    # ONE aggregate row, exploded to 10 lag rows — never 10 rescans of the
    # series (a union of per-lag selects would replay the whole scan per lag)
    entries = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.col(f"s{k}").alias("s"),
                F.col(f"a{k}").alias("a"),
                F.col(f"b{k}").alias("b"),
            )
            for k in range(1, _ACF_MAX_LAG + 1)
        ]
    )
    mu = F.col("t").cast("double") / F.col("n")
    den = F.col("q").cast("double") - F.col("n") * (mu * mu)
    num = (
        F.col("e.s").cast("double")
        - mu * (F.col("e.a") + F.col("e.b"))
        + (F.col("n") - F.col("e.lag")) * (mu * mu)
    )
    acf = m.select("n", "t", "q", F.explode(entries).alias("e")).select(
        F.col("e.lag").alias("lag"), (num / den).alias("r"), "n"
    )
    wl = W.orderBy("lag")
    lb_term = F.round(
        F.col("r") * F.col("r") / (F.col("n") - F.col("lag")), 12
    ).cast("decimal(28,12)")
    return acf.select(
        "lag",
        F.round(F.col("r"), 9).alias("acf"),
        F.round(
            F.col("n") * (F.col("n") + 2.0) * F.sum(lb_term).over(wl).cast("double"),
            6,
        ).alias("ljung_box_q"),
    ).orderBy("lag")


_HURST_COEF = "0.36067376022224085"  # 1/(4 ln 2): slope weight for log2-spaced m


@register(
    "q344_hurst_rs",
    oracle=f"""
    WITH series AS (
      SELECT CAST(count(*) AS BIGINT) AS x,
             row_number() OVER (ORDER BY date_trunc('hour', ts)) AS i
      FROM events GROUP BY date_trunc('hour', ts)
    ),
    expanded AS (
      SELECT m.m, (s.i - 1) // m.m AS block, s.i, s.x
      FROM series s CROSS JOIN (VALUES (8), (32), (128)) m(m)
    ),
    win AS (
      SELECT m, block, x,
             row_number() OVER w AS j,
             CAST(sum(x) OVER w AS BIGINT) AS prefix,
             CAST(sum(x) OVER (PARTITION BY m, block) AS BIGINT) AS s,
             CAST(sum(x * x) OVER (PARTITION BY m, block) AS BIGINT) AS q,
             CAST(count(*) OVER (PARTITION BY m, block) AS BIGINT) AS cnt
      FROM expanded
      WINDOW w AS (PARTITION BY m, block ORDER BY i)
    ),
    dev AS (
      SELECT m, block,
             prefix - j * (CAST(s AS DOUBLE) / m) AS cumdev,
             sqrt((CAST(q AS DOUBLE)
                   - m * ((CAST(s AS DOUBLE) / m) * (CAST(s AS DOUBLE) / m)))
                  / m) AS sd
      FROM win WHERE cnt = m
    ),
    blocks AS (
      SELECT m, block,
             max(cumdev) - min(cumdev) AS r, max(sd) AS sd
      FROM dev GROUP BY m, block
    ),
    rs AS (
      SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
             round(CAST(sum(CAST(round(r / sd, 9) AS DECIMAL(28,9)))
                        AS DOUBLE) / count(*), 9) AS rs_mean
      FROM blocks WHERE sd > 0 GROUP BY m
    ),
    hurst AS (
      SELECT round(
               (round(ln(max(CASE WHEN m = 128 THEN rs_mean END)), 9)
                - round(ln(max(CASE WHEN m = 8 THEN rs_mean END)), 9))
               * {_HURST_COEF}, 6) AS hurst
      FROM rs
    )
    SELECT rs.m, rs.n_blocks, rs.rs_mean, h.hurst
    FROM rs, hurst h ORDER BY rs.m
    """,
)
def q344_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis of the hourly
    event-count series: for block sizes m = 8/32/128, each block's range
    of cumulative mean-deviations over its std gives R/S; the log-log
    slope across block sizes is H (0.5 = memoryless, >0.5 = persistent)
    — the long-memory diagnostic behind capacity planning on bursty
    traffic. Block sums/squares are exact integers; cumdev and sd are
    one shared IEEE chain; per-block R/S is round(9)-pinned into a
    DECIMAL mean; the slope is a LITERAL-coefficient linear combination
    (1/(4 ln 2) embedded as the same constant on both engines, log2-
    spaced m makes the middle point's weight exactly 0). One hourly agg
    + one 3x-exploded block window (series is calendar-bounded)."""
    ev = _t(spark, sf_dir, "events")
    series = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("x"))
        .select("x", F.row_number().over(W.orderBy("h")).alias("i"))
    )
    expanded = series.select(
        F.explode(F.array(F.lit(8), F.lit(32), F.lit(128))).alias("m"), "i", "x"
    ).select("m", F.floor((F.col("i") - 1) / F.col("m")).alias("block"), "i", "x")
    wb = W.partitionBy("m", "block")
    wo = wb.orderBy("i")
    win = expanded.select(
        "m",
        "block",
        "x",
        F.row_number().over(wo).alias("j"),
        F.sum("x").over(wo).cast("long").alias("prefix"),
        F.sum("x").over(wb).cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).over(wb).cast("long").alias("q"),
        F.count(F.lit(1)).over(wb).cast("long").alias("cnt"),
    ).filter(F.col("cnt") == F.col("m"))
    mu = F.col("s").cast("double") / F.col("m")
    dev = win.select(
        "m",
        "block",
        (F.col("prefix") - F.col("j") * mu).alias("cumdev"),
        F.sqrt(
            (F.col("q").cast("double") - F.col("m") * (mu * mu)) / F.col("m")
        ).alias("sd"),
    )
    blocks = dev.groupBy("m", "block").agg(
        (F.max("cumdev") - F.min("cumdev")).alias("r"), F.max("sd").alias("sd")
    )
    rs = (
        blocks.filter(F.col("sd") > 0)
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.round(
                F.sum(
                    F.round(F.col("r") / F.col("sd"), 9).cast("decimal(28,9)")
                ).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("rs_mean"),
        )
    )
    hurst = rs.agg(
        F.round(
            (
                F.round(
                    F.log(F.max(F.when(F.col("m") == 128, F.col("rs_mean")))), 9
                )
                - F.round(
                    F.log(F.max(F.when(F.col("m") == 8, F.col("rs_mean")))), 9
                )
            )
            * float(_HURST_COEF),
            6,
        ).alias("hurst")
    )
    return (
        rs.crossJoin(F.broadcast(hurst))
        .select("m", "n_blocks", "rs_mean", "hurst")
        .orderBy("m")
    )


# ---------------------------------------------------------------------------
# Text statistics: Zipf law fit, keyness
# ---------------------------------------------------------------------------


@register(
    "q345_zipf_slope",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
      FROM documents WHERE trim(text) <> ''
    ),
    freq AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t),
    top AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rank
      FROM freq ORDER BY c DESC, t LIMIT 1000
    ),
    terms AS (
      SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(28,9)) AS x,
             CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(28,9)) AS y,
             CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 9)
                  AS DECIMAL(28,9)) AS xy,
             CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)), 9)
                  AS DECIMAL(28,9)) AS xx,
             CAST(round(ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 9)
                  AS DECIMAL(28,9)) AS yy
      FROM top
    )
    SELECT CAST(count(*) AS BIGINT) AS n_ranks,
           round((count(*) * CAST(sum(xy) AS DOUBLE)
                  - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
                 / (count(*) * CAST(sum(xx) AS DOUBLE)
                    - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)),
                 6) AS zipf_slope,
           round((CAST(sum(y) AS DOUBLE)
                  - (count(*) * CAST(sum(xy) AS DOUBLE)
                     - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
                    / (count(*) * CAST(sum(xx) AS DOUBLE)
                       - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
                    * CAST(sum(x) AS DOUBLE)) / count(*),
                 6) AS intercept,
           round(((count(*) * CAST(sum(xy) AS DOUBLE)
                   - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
                  * (count(*) * CAST(sum(xy) AS DOUBLE)
                     - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
                 / ((count(*) * CAST(sum(xx) AS DOUBLE)
                     - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
                    * (count(*) * CAST(sum(yy) AS DOUBLE)
                       - CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE))),
                 6) AS r_squared
    FROM terms
    """,
)
def q345_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: OLS of ln(freq)
    on ln(rank) over the top-1000 tokens — slope near -1 is the natural-
    language signature, deviations flag synthetic/templated corpora (the
    distributional companion to q122's vocabulary-coverage curve). Ranks
    use a total (count desc, token) order; every log term and cross-
    product is round(9)-pinned into DECIMAL sums so the regression
    moments are order-free; slope/intercept/r^2 are one shared IEEE
    chain over those sums. One token agg + a top-k sort."""
    d = _t(spark, sf_dir, "documents")
    tok = (
        d.filter(F.trim(F.col("text")) != "")
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"))
    )
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    top = (
        freq.orderBy(F.desc("c"), "t")
        .limit(1000)
        .select("c", F.row_number().over(W.orderBy(F.desc("c"), "t")).alias("rank"))
    )
    lnr = F.log(F.col("rank").cast("double"))
    lnc = F.log(F.col("c").cast("double"))
    P = lambda e: F.round(e, 9).cast("decimal(28,9)")
    terms = top.select(
        P(lnr).alias("x"),
        P(lnc).alias("y"),
        P(lnr * lnc).alias("xy"),
        P(lnr * lnr).alias("xx"),
        P(lnc * lnc).alias("yy"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xy").alias("sxy"),
        F.sum("xx").alias("sxx"),
        F.sum("yy").alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return agg.select(
        n.alias("n_ranks"),
        F.round(cov / varx, 6).alias("zipf_slope"),
        F.round((sy - cov / varx * sx) / n, 6).alias("intercept"),
        F.round((cov * cov) / (varx * vary), 6).alias("r_squared"),
    )


@register(
    "q346_keyness_g2",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS t
      FROM documents WHERE trim(text) <> ''
    ),
    tf AS (SELECT source, t, CAST(count(*) AS BIGINT) AS a
           FROM tok GROUP BY source, t),
    totals AS (SELECT source, CAST(sum(a) AS BIGINT) AS ns FROM tf
               GROUP BY source),
    corpus AS (SELECT t, CAST(sum(a) AS BIGINT) AS ct FROM tf GROUP BY t),
    grand AS (SELECT CAST(sum(ns) AS BIGINT) AS nn FROM totals),
    cells AS (
      SELECT f.source, f.t, f.a,
             c.ct - f.a AS b,
             s.ns - f.a AS c_,
             g.nn - s.ns - (c.ct - f.a) AS d,
             CAST(s.ns AS DOUBLE) * c.ct / g.nn AS ea,
             CAST(g.nn - s.ns AS DOUBLE) * c.ct / g.nn AS eb,
             CAST(s.ns AS DOUBLE) * (g.nn - c.ct) / g.nn AS ec,
             CAST(g.nn - s.ns AS DOUBLE) * (g.nn - c.ct) / g.nn AS ed
      FROM tf f
      JOIN totals s ON f.source = s.source
      JOIN corpus c ON f.t = c.t
      CROSS JOIN grand g
      WHERE c.ct >= 50
    ),
    scored AS (
      SELECT source, t, a,
             round(2 * ((CASE WHEN a > 0 THEN a * ln(a / ea) ELSE 0 END)
                        + (CASE WHEN b > 0 THEN b * ln(b / eb) ELSE 0 END)
                        + (CASE WHEN c_ > 0 THEN c_ * ln(c_ / ec) ELSE 0 END)
                        + (CASE WHEN d > 0 THEN d * ln(d / ed) ELSE 0 END)),
                   6) AS g2,
             (CAST(a AS DOUBLE) > ea) AS overused
      FROM cells
    )
    SELECT source, t AS token, a AS tf, g2, overused FROM (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY g2 DESC, t) AS rn
      FROM scored
    ) WHERE rn <= 10
    ORDER BY source, g2 DESC, token
    """,
)
def q346_keyness_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword keyness per source via Dunning's log-likelihood G2: each
    (source, token) 2x2 contingency vs the rest of the corpus, G2 =
    2*Sum(obs*ln(obs/exp)) over the four cells — the corpus-linguistics
    standard for 'what words characterize this source' (more robust than
    raw TF-IDF at low counts). The four cell terms are summed in a FIXED
    written order (t1+t2+t3+t4, never a float SQL SUM); zero cells
    contribute zero by the CASE guard; counts are exact integers and
    expectations one shared IEEE chain. Top-10 per source rides a ranked
    window (WindowGroupLimit). Aggs: (source,token) tf + two marginal
    rollups + a broadcast grand total."""
    d = _t(spark, sf_dir, "documents")
    tok = (
        d.filter(F.trim(F.col("text")) != "")
        .select(
            "source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
        )
    )
    tf = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("a"))
    totals = tf.groupBy("source").agg(F.sum("a").cast("long").alias("ns"))
    corpus = tf.groupBy("t").agg(F.sum("a").cast("long").alias("ct"))
    grand = totals.agg(F.sum("ns").cast("long").alias("nn"))
    cells = (
        tf.join(corpus.filter(F.col("ct") >= 50), "t")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            "t",
            "a",
            (F.col("ct") - F.col("a")).alias("b"),
            (F.col("ns") - F.col("a")).alias("c_"),
            (F.col("nn") - F.col("ns") - (F.col("ct") - F.col("a"))).alias("d"),
            (F.col("ns").cast("double") * F.col("ct") / F.col("nn")).alias("ea"),
            (
                (F.col("nn") - F.col("ns")).cast("double")
                * F.col("ct")
                / F.col("nn")
            ).alias("eb"),
            (
                F.col("ns").cast("double") * (F.col("nn") - F.col("ct")) / F.col("nn")
            ).alias("ec"),
            (
                (F.col("nn") - F.col("ns")).cast("double")
                * (F.col("nn") - F.col("ct"))
                / F.col("nn")
            ).alias("ed"),
        )
    )
    term = lambda cnt, exp: F.when(
        F.col(cnt) > 0, F.col(cnt) * F.log(F.col(cnt) / F.col(exp))
    ).otherwise(0.0)
    scored = cells.select(
        "source",
        "t",
        "a",
        F.round(
            2
            * (
                term("a", "ea")
                + term("b", "eb")
                + term("c_", "ec")
                + term("d", "ed")
            ),
            6,
        ).alias("g2"),
        (F.col("a").cast("double") > F.col("ea")).alias("overused"),
    )
    ranked = scored.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("source").orderBy(F.desc("g2"), "t")),
    ).filter(F.col("rn") <= 10)
    return ranked.select(
        "source",
        F.col("t").alias("token"),
        F.col("a").alias("tf"),
        "g2",
        "overused",
    ).orderBy("source", F.desc("g2"), "token")


# ---------------------------------------------------------------------------
# Cohort economics, drift detection, empirical-Bayes smoothing
# ---------------------------------------------------------------------------


@register(
    "q347_cohort_ltv",
    oracle="""
    WITH first_m AS (
      SELECT o_custkey AS cust,
             min(year(o_orderdate) * 12 + month(o_orderdate)) AS c0
      FROM orders GROUP BY cust
    ),
    sized AS (
      SELECT c0, CAST(count(*) AS BIGINT) AS cohort_size
      FROM first_m GROUP BY c0
    ),
    rev AS (
      SELECT f.c0,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.c0
               AS offset_m,
             CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active
      FROM orders o JOIN first_m f ON o.o_custkey = f.cust
      GROUP BY f.c0, offset_m
    )
    SELECT CAST(r.c0 // 12 AS BIGINT) AS cohort_year,
           CAST(r.c0 % 12 AS BIGINT) AS cohort_month0,
           CAST(r.offset_m AS BIGINT) AS offset_m,
           r.n_active, s.cohort_size,
           CAST(sum(r.cents) OVER (PARTITION BY r.c0 ORDER BY r.offset_m)
                AS BIGINT) AS cum_cents,
           round(CAST(sum(r.cents) OVER (PARTITION BY r.c0
                                         ORDER BY r.offset_m) AS DOUBLE)
                 / s.cohort_size / 100, 6) AS ltv_per_customer
    FROM rev r JOIN sized s ON r.c0 = s.c0
    ORDER BY cohort_year, cohort_month0, offset_m
    """,
)
def q347_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: customers grouped by first-order month, revenue
    accumulated by month offset since acquisition, divided by cohort size
    — the cumulative lifetime-value table growth teams read cohort decay
    off (q133 tracks churn; this tracks the money). Month arithmetic is
    pure integers (year*12+month), revenue exact cents, the cumulative
    window rides the cohort partition, LTV is one division. Two aggs +
    one first-order agg + a broadcast cohort-size join."""
    o = _t(spark, sf_dir, "orders")
    mnum = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    first_m = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.min(mnum).alias("c0")
    )
    sized = first_m.groupBy("c0").agg(F.count(F.lit(1)).alias("cohort_size"))
    rev = (
        o.join(first_m, o.o_custkey == first_m.cust)
        .groupBy("c0", (mnum - F.col("c0")).alias("offset_m"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("cents"),
            F.count_distinct(F.col("o_custkey")).cast("long").alias("n_active"),
        )
    )
    wc = W.partitionBy("c0").orderBy("offset_m")
    cum = F.sum("cents").over(wc).cast("long")
    return (
        rev.join(F.broadcast(sized), "c0")
        .select(
            F.expr("c0 DIV 12").cast("long").alias("cohort_year"),
            (F.col("c0") % 12).cast("long").alias("cohort_month0"),
            F.col("offset_m").cast("long").alias("offset_m"),
            "n_active",
            "cohort_size",
            cum.alias("cum_cents"),
            F.round(
                cum.cast("double") / F.col("cohort_size") / 100, 6
            ).alias("ltv_per_customer"),
        )
        .orderBy("cohort_year", "cohort_month0", "offset_m")
    )


@register(
    "q348_page_hinkley",
    oracle="""
    WITH seq AS (
      SELECT ts, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
             row_number() OVER (ORDER BY ts, event_id) AS t,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  OVER (ORDER BY ts, event_id) AS BIGINT) AS prefix
      FROM events
    ),
    terms AS (
      SELECT ts, event_id, t,
             CAST(round(x - CAST(prefix AS DOUBLE) / t, 9)
                  AS DECIMAL(28,9)) AS term
      FROM seq
    ),
    cum AS (
      SELECT ts, event_id, t, sum(term) OVER (ORDER BY t) AS ph
      FROM terms
    ),
    ph AS (
      SELECT ts, t, ph, min(ph) OVER (ORDER BY t) AS ph_min
      FROM cum
    )
    SELECT t, CAST(ts AS TIMESTAMP) AS ts,
           round(CAST(ph - ph_min AS DOUBLE) / 100, 6) AS gap,
           (CAST(ph - ph_min AS DOUBLE) / 100 > 50000) AS alarm
    FROM ph
    ORDER BY gap DESC, t LIMIT 20
    """,
)
def q348_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift detection over the global event-value stream:
    PH_t = Sum(x_i - running_mean_i), alarm when PH_t - min(PH_1..t)
    exceeds the threshold — the sequential changepoint monitor for
    feature drift (q155's CUSUM locates ONE retrospective changepoint;
    Page-Hinkley is the ONLINE detector with a reflecting minimum).
    Each deviation term is round(9)-pinned into DECIMAL; the cumulative
    sum and its running minimum are exact DECIMAL windows, so the whole
    trajectory is order-free-reproducible. One global sequence window
    (range-sorted at scale) + a top-20 sort."""
    ev = _t(spark, sf_dir, "events")
    wseq = W.orderBy("ts", "event_id")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    seq = ev.select(
        "ts",
        "event_id",
        cents.alias("x"),
        F.row_number().over(wseq).alias("t"),
        F.sum(cents).over(wseq).cast("long").alias("prefix"),
    )
    terms = seq.select(
        "ts",
        "event_id",
        "t",
        F.round(F.col("x") - F.col("prefix").cast("double") / F.col("t"), 9)
        .cast("decimal(28,9)")
        .alias("term"),
    )
    wt = W.orderBy("t")
    cum = terms.select("ts", "t", F.sum("term").over(wt).alias("ph"))
    ph = cum.select("ts", "t", "ph", F.min("ph").over(wt).alias("ph_min"))
    gap = (F.col("ph") - F.col("ph_min")).cast("double") / 100
    return (
        ph.select(
            "t",
            F.col("ts").cast("timestamp").alias("ts"),
            F.round(gap, 6).alias("gap"),
            (gap > 50000).alias("alarm"),
        )
        .orderBy(F.desc("gap"), "t")
        .limit(20)
    )


@register(
    "q349_beta_binomial_smoothing",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a
      FROM events GROUP BY user_id
    ),
    pinned AS (
      SELECT user_id, n, a,
             CAST(round(CAST(a AS DOUBLE) / n, 9) AS DECIMAL(28,9)) AS p,
             CAST(round((CAST(a AS DOUBLE) / n) * (CAST(a AS DOUBLE) / n), 9)
                  AS DECIMAL(28,9)) AS p2
      FROM per_user
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(p) AS DOUBLE) / count(*) AS mu,
             CAST(sum(p2) AS DOUBLE) / count(*)
               - (CAST(sum(p) AS DOUBLE) / count(*))
                 * (CAST(sum(p) AS DOUBLE) / count(*)) AS v
      FROM pinned
    ),
    prior AS (
      SELECT k, mu, v,
             mu * (mu * (1 - mu) / v - 1) AS alpha,
             (1 - mu) * (mu * (1 - mu) / v - 1) AS beta
      FROM mom
    )
    SELECT u.user_id, u.n, u.a,
           round(p.alpha, 6) AS alpha,
           round(p.beta, 6) AS beta,
           round((u.a + p.alpha) / (u.n + p.alpha + p.beta), 9)
             AS smoothed_rate
    FROM per_user u, prior p
    ORDER BY smoothed_rate DESC, u.user_id LIMIT 50
    """,
)
def q349_beta_binomial_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes conversion-rate smoothing: fit a Beta prior to the
    population of per-user purchase rates by method of moments (alpha =
    mu(mu(1-mu)/v - 1)), then shrink each user's raw a/n toward it as
    (a+alpha)/(n+alpha+beta) — the standard CTR/conversion smoothing that
    stops 1-for-1 users from ranking above 98-for-100 users. Raw rates
    and their squares are round(9)-pinned DECIMAL sums (order-free
    moments); the prior and each smoothed rate are one shared IEEE
    chain. One user agg + a 1-row broadcast prior."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("a"),
    )
    p_raw = F.col("a").cast("double") / F.col("n")
    pinned = per_user.select(
        "user_id",
        "n",
        "a",
        F.round(p_raw, 9).cast("decimal(28,9)").alias("p"),
        F.round(p_raw * p_raw, 9).cast("decimal(28,9)").alias("p2"),
    )
    mom = pinned.agg(
        F.count(F.lit(1)).alias("k"),
        (F.sum("p").cast("double") / F.count(F.lit(1))).alias("mu"),
        (
            F.sum("p2").cast("double") / F.count(F.lit(1))
            - (F.sum("p").cast("double") / F.count(F.lit(1)))
            * (F.sum("p").cast("double") / F.count(F.lit(1)))
        ).alias("v"),
    )
    disp = F.col("mu") * (1 - F.col("mu")) / F.col("v") - 1
    prior = mom.select(
        "k",
        "mu",
        "v",
        (F.col("mu") * disp).alias("alpha"),
        ((1 - F.col("mu")) * disp).alias("beta"),
    )
    return (
        per_user.crossJoin(F.broadcast(prior))
        .select(
            "user_id",
            "n",
            "a",
            F.round(F.col("alpha"), 6).alias("alpha"),
            F.round(F.col("beta"), 6).alias("beta"),
            F.round(
                (F.col("a") + F.col("alpha"))
                / (F.col("n") + F.col("alpha") + F.col("beta")),
                9,
            ).alias("smoothed_rate"),
        )
        .orderBy(F.desc("smoothed_rate"), "user_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Iterative proportional fitting, receivables aging
# ---------------------------------------------------------------------------

_IPF_ROUNDS = 5


def _q350_oracle() -> str:
    # one raking round = row-scale then column-scale, every weight
    # round(9)-pinned DECIMAL so the 5-cell sums are order-free; CTEs are
    # MATERIALIZED (DuckDB would inline the unrolled chain exponentially)
    step = """
    r{i} AS MATERIALIZED (
      SELECT w.seg, w.pri,
             CAST(round(CAST(w.w AS DOUBLE) * CAST(t.tr AS DOUBLE)
                        / CAST(rs.s AS DOUBLE), 9) AS DECIMAL(28,9)) AS w
      FROM w{prev} w
      JOIN (SELECT seg, sum(w) AS s FROM w{prev} GROUP BY seg) rs
        ON w.seg = rs.seg
      JOIN rowt t ON w.seg = t.seg
    ),
    w{i} AS MATERIALIZED (
      SELECT w.seg, w.pri,
             CAST(round(CAST(w.w AS DOUBLE) * CAST(t.tc AS DOUBLE)
                        / CAST(cs.s AS DOUBLE), 9) AS DECIMAL(28,9)) AS w
      FROM r{i} w
      JOIN (SELECT pri, sum(w) AS s FROM r{i} GROUP BY pri) cs
        ON w.pri = cs.pri
      JOIN colt t ON w.pri = t.pri
    )"""
    its = ",".join(
        step.format(i=i, prev=i - 1 if i > 1 else "0")
        for i in range(1, _IPF_ROUNDS + 1)
    )
    return f"""
    WITH obs AS MATERIALIZED (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
             CAST(count(*) AS BIGINT) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY seg, pri
    ),
    grand AS (SELECT CAST(sum(n) AS BIGINT) AS g FROM obs),
    segc AS (
      SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS nc
      FROM customer GROUP BY seg
    ),
    rowt AS MATERIALIZED (
      SELECT s.seg,
             CAST(round(CAST(s.nc AS DOUBLE)
                        / (SELECT sum(nc) FROM segc)
                        * (SELECT g FROM grand), 9) AS DECIMAL(28,9)) AS tr
      FROM segc s
    ),
    colt AS MATERIALIZED (
      SELECT pri,
             CAST(round(CAST((SELECT g FROM grand) AS DOUBLE)
                        / (SELECT count(*) FROM (SELECT DISTINCT pri
                                                 FROM obs)), 9)
                  AS DECIMAL(28,9)) AS tc
      FROM (SELECT DISTINCT pri FROM obs)
    ),
    w0 AS MATERIALIZED (
      SELECT seg, pri, CAST(n AS DECIMAL(28,9)) AS w FROM obs
    ),
    {its}
    SELECT w.seg, w.pri, o.n AS observed,
           round(CAST(w.w AS DOUBLE), 6) AS raked_weight,
           round(CAST(w.w AS DOUBLE) / o.n, 6) AS adjustment
    FROM w{_IPF_ROUNDS} w JOIN obs o ON w.seg = o.seg AND w.pri = o.pri
    ORDER BY w.seg, w.pri
    """


@register("q350_ipf_raking", oracle=_q350_oracle())
def q350_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) of the segment x priority
    order-count table to external margins — row targets from the
    customer dimension's segment shares, uniform column targets — the
    survey-weighting/bias-correction primitive (and the classical IPF
    behind log-linear models). 5 unrolled rounds, each a row-scale and a
    column-scale; every weight is round(9)-pinned DECIMAL so the 5-cell
    margin sums are order-free and both engines walk the identical
    trajectory. The table is category-sized (25 cells): Spark iterates
    on a broadcast-joined 25-row frame, the heavy work is only the one
    fact-table agg."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    obs = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grand = obs.agg(F.sum("n").cast("long").alias("g"))
    segc = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("nc")
    )
    seg_tot = segc.agg(F.sum("nc").alias("nct"))
    rowt = (
        segc.crossJoin(F.broadcast(seg_tot))
        .crossJoin(F.broadcast(grand))
        .select(
            "seg",
            F.round(
                F.col("nc").cast("double") / F.col("nct") * F.col("g"), 9
            )
            .cast("decimal(28,9)")
            .alias("tr"),
        )
    )
    pris = obs.select("pri").distinct()
    npri = pris.agg(F.count(F.lit(1)).alias("np"))
    colt = (
        pris.crossJoin(F.broadcast(grand))
        .crossJoin(F.broadcast(npri))
        .select(
            "pri",
            F.round(F.col("g").cast("double") / F.col("np"), 9)
            .cast("decimal(28,9)")
            .alias("tc"),
        )
    )
    # The IPF table is CONSTANT-sized (25 cells), so the 5 raking rounds run
    # as a single-row fold over collect_list'ed cells instead of 10 join+agg
    # rounds with per-round checkpoints (106 Spark jobs of stage latency;
    # guide §1.2 step 1). Arithmetic mirrored exactly: margin sums are exact
    # decimal folds (order-free), each rescale is the identical double chain
    # round(w·target/margin, 9) cast DECIMAL(28,9). The fold accumulator is
    # a bound lambda variable, evaluated once per step (see q358).
    cells_row = obs.agg(
        F.collect_list(
            F.struct("seg", "pri", F.col("n").cast("decimal(28,9)").alias("w"))
        ).alias("cells")
    )
    rowt_row = rowt.agg(
        F.map_from_entries(F.collect_list(F.struct("seg", "tr"))).alias("trm")
    )
    colt_row = colt.agg(
        F.map_from_entries(F.collect_list(F.struct("pri", "tc"))).alias("tcm")
    )
    folded = cells_row.crossJoin(F.broadcast(rowt_row)).crossJoin(
        F.broadcast(colt_row)
    )
    dec0 = F.lit(0).cast("decimal(28,9)")

    def _margin(cells, key):
        """Exact decimal margin sum over the cells sharing z[key]."""
        return lambda z: F.aggregate(
            F.filter(cells, lambda y: y[key] == z[key]),
            dec0,
            lambda a, y: (a + y["w"]).cast("decimal(28,9)"),
        )

    def _scale(cells, key, targets):
        m = _margin(cells, key)
        return F.transform(
            cells,
            lambda z: F.struct(
                z["seg"].alias("seg"),
                z["pri"].alias("pri"),
                F.round(
                    z["w"].cast("double")
                    * F.element_at(targets, z[key]).cast("double")
                    / m(z).cast("double"),
                    9,
                )
                .cast("decimal(28,9)")
                .alias("w"),
            ),
        )

    def _round(acc, i):
        return _scale(_scale(acc, "seg", F.col("trm")), "pri", F.col("tcm"))

    raked = folded.select(
        F.explode(
            F.aggregate(
                F.sequence(F.lit(1), F.lit(_IPF_ROUNDS)), F.col("cells"), _round
            )
        ).alias("c")
    ).select("c.seg", "c.pri", "c.w")
    return (
        raked.join(F.broadcast(obs), ["seg", "pri"])
        .select(
            "seg",
            "pri",
            F.col("n").alias("observed"),
            F.round(F.col("w").cast("double"), 6).alias("raked_weight"),
            F.round(F.col("w").cast("double") / F.col("n"), 6).alias("adjustment"),
        )
        .orderBy("seg", "pri")
    )


@register(
    "q351_ar_aging_dso",
    oracle="""
    WITH asofd AS (SELECT CAST(max(o_orderdate) AS DATE) AS d FROM orders),
    open_ar AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             date_diff('day', CAST(o_orderdate AS DATE), a.d) AS age
      FROM orders o, asofd a WHERE o.o_orderstatus <> 'F'
    ),
    bucketed AS (
      SELECT CASE WHEN age <= 30 THEN '0-030'
                  WHEN age <= 60 THEN '031-060'
                  WHEN age <= 90 THEN '061-090'
                  ELSE '091+' END AS bucket,
             cents
      FROM open_ar
    ),
    rev365 AS (
      SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS r
      FROM orders o, asofd a
      WHERE CAST(o.o_orderdate AS DATE) > a.d - INTERVAL 365 DAY
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS ar FROM bucketed)
    SELECT b.bucket,
           CAST(count(*) AS BIGINT) AS n_invoices,
           CAST(sum(b.cents) AS BIGINT) AS bucket_cents,
           round(CAST(sum(b.cents) AS DOUBLE) / t.ar, 9) AS bucket_share,
           round(CAST(t.ar AS DOUBLE) / (CAST(r.r AS DOUBLE) / 365) , 6)
             AS dso_days
    FROM bucketed b, tot t, rev365 r
    GROUP BY b.bucket, t.ar, r.r ORDER BY b.bucket
    """,
)
def q351_ar_aging_dso(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounts-receivable aging report + days-sales-outstanding: open
    (non-final) orders bucketed by age at the as-of date (the data's own
    max order date — no wall clock), per-bucket totals and shares, and
    DSO = open AR / (trailing-365-day revenue / 365) — the receivables
    health report every finance close produces. Day arithmetic is exact
    integer date_diff; cents exact; shares and DSO one IEEE chain. One
    filtered agg + two broadcast scalars."""
    o = _t(spark, sf_dir, "orders")
    asof = o.agg(F.max(F.to_date("o_orderdate")).alias("d"))
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    open_ar = (
        o.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(asof))
        .select(
            cents.alias("cents"),
            F.datediff(F.col("d"), F.to_date("o_orderdate")).alias("age"),
        )
    )
    bucketed = open_ar.select(
        F.when(F.col("age") <= 30, "0-030")
        .when(F.col("age") <= 60, "031-060")
        .when(F.col("age") <= 90, "061-090")
        .otherwise("091+")
        .alias("bucket"),
        "cents",
    )
    rev365 = (
        o.crossJoin(F.broadcast(asof))
        .filter(F.to_date("o_orderdate") > F.date_sub(F.col("d"), 365))
        .agg(F.sum(cents).cast("long").alias("r"))
    )
    tot = bucketed.agg(F.sum("cents").cast("long").alias("ar"))
    return (
        bucketed.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(rev365))
        .groupBy("bucket", "ar", "r")
        .agg(
            F.count(F.lit(1)).alias("n_invoices"),
            F.sum("cents").cast("long").alias("bucket_cents"),
        )
        .select(
            "bucket",
            "n_invoices",
            "bucket_cents",
            F.round(F.col("bucket_cents").cast("double") / F.col("ar"), 9).alias(
                "bucket_share"
            ),
            F.round(
                F.col("ar").cast("double") / (F.col("r").cast("double") / 365), 6
            ).alias("dso_days"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Multimodal audio segmentation, stylometry, ordered-trend test
# ---------------------------------------------------------------------------


@register(
    "q352_audio_silence_windows",
    oracle="""
    WITH ids AS (
      SELECT i AS media_id FROM range(0, 64) t(i) WHERE i % 3 = 1
    ),
    samples AS (
      SELECT d.media_id, s.i,
             ((d.media_id % 7) * 1000 + s.i * 37) % 4096 - 2048 AS s
      FROM ids d CROSS JOIN range(0, 256) s(i)
    )
    SELECT media_id,
           CAST(i // 64 AS INTEGER) AS window_idx,
           CAST(count(*) AS INTEGER) AS n_samples,
           CAST(sum(s * s) AS BIGINT) AS energy_ss,
           round(sqrt(CAST(sum(s * s) AS DOUBLE) / count(*)), 6) AS rms,
           (sqrt(CAST(sum(s * s) AS DOUBLE) / count(*)) < 1180.0) AS silent
    FROM samples GROUP BY media_id, window_idx
    ORDER BY media_id, window_idx
    """,
)
def q352_audio_silence_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio silence segmentation over REAL PCM16 WAV payloads: decode the
    RIFF container with the pure-numpy chunk walker (operators/
    multimodal.py:decode_wav), window into 64-sample frames, and emit
    per-window energy + an RMS silence flag — the VAD-style front end of
    any audio curation pipeline (the oracle mirrors the synth waveform's
    closed form, so the REAL byte-level decode is what's being verified,
    q42's pattern). Python touches only Arrow batches and returns 4
    integers per window (the heavy bytes never leave the executor); RMS
    is one IEEE chain over an exact integer energy."""
    import pandas as _pd

    from .operators.multimodal import decode_wav, synth_media

    media = synth_media(spark, 64).filter(F.col("modality") == "audio")

    def windows(it):
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s = decode_wav(bytes(payload)).astype("int64")
                for w in range(len(s) // 64):
                    blk = s[w * 64 : (w + 1) * 64]
                    out.append((int(mid), w, len(blk), int((blk * blk).sum())))
            yield _pd.DataFrame(
                out, columns=["media_id", "window_idx", "n_samples", "energy_ss"]
            )

    dec = media.select("media_id", "payload").mapInPandas(
        windows,
        "media_id long, window_idx int, n_samples int, energy_ss long",
    )
    rms = F.sqrt(F.col("energy_ss").cast("double") / F.col("n_samples"))
    return dec.select(
        "media_id",
        "window_idx",
        "n_samples",
        "energy_ss",
        F.round(rms, 6).alias("rms"),
        (rms < 1180.0).alias("silent"),
    ).orderBy("media_id", "window_idx")


@register(
    "q353_burrows_delta",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS t
      FROM documents WHERE trim(text) <> ''
    ),
    tf AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY source, t),
    totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
               FROM tf GROUP BY source),
    top AS (
      SELECT t FROM (SELECT t, sum(c) AS ct FROM tf GROUP BY t
                     ORDER BY ct DESC, t LIMIT 30)
    ),
    f AS (
      SELECT s.source, tp.t,
             coalesce(CAST(x.c AS DOUBLE), 0.0) / s.ns AS f
      FROM totals s CROSS JOIN top tp
      LEFT JOIN tf x ON x.source = s.source AND x.t = tp.t
    ),
    mom AS (
      SELECT t,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(round(f, 9) AS DECIMAL(28,9))) AS DOUBLE)
               / count(*) AS mu,
             CAST(sum(CAST(round(f * f, 9) AS DECIMAL(28,9))) AS DOUBLE)
               / count(*) AS m2
      FROM f GROUP BY t
    ),
    z AS (
      SELECT f.source, f.t,
             (f.f - m.mu) / sqrt(m.m2 - m.mu * m.mu) AS z
      FROM f JOIN mom m ON f.t = m.t
      WHERE m.m2 - m.mu * m.mu > 0
    ),
    pairs AS (
      SELECT a.source AS s1, b.source AS s2, a.t,
             CAST(round(abs(a.z - b.z), 9) AS DECIMAL(28,9)) AS dterm
      FROM z a JOIN z b ON a.t = b.t AND a.source < b.source
    )
    SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_terms,
           round(CAST(sum(dterm) AS DOUBLE) / count(*), 6) AS delta
    FROM pairs GROUP BY s1, s2 ORDER BY s1, s2
    """,
)
def q353_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between sources: z-scores of
    the top-30 corpus tokens' relative frequencies (standardized across
    sources), Delta = mean |z1 - z2| per source pair — the authorship-
    attribution classic, here as a source-similarity matrix for corpus
    forensics (q249's Jaccard compares vocabularies; Delta compares
    USAGE RATES of the shared core vocabulary). Frequencies are single
    divisions; cross-source moments and the final pair sums are
    round(9)-pinned DECIMAL reductions; z and Delta are one shared IEEE
    chain. Everything after the tf agg runs on a 30 x sources table."""
    d = _t(spark, sf_dir, "documents")
    tok = (
        d.filter(F.trim(F.col("text")) != "")
        .select(
            "source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
        )
    )
    tf = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    totals = tf.groupBy("source").agg(F.sum("c").cast("long").alias("ns"))
    top = (
        tf.groupBy("t")
        .agg(F.sum("c").alias("ct"))
        .orderBy(F.desc("ct"), "t")
        .limit(30)
        .select("t")
    )
    tf_top = tf.join(F.broadcast(top), "t")  # prune BEFORE the grid join
    f = (
        totals.crossJoin(F.broadcast(top))
        .join(F.broadcast(tf_top), ["source", "t"], "left")
        .select(
            "source",
            "t",
            (
                F.coalesce(F.col("c").cast("double"), F.lit(0.0)) / F.col("ns")
            ).alias("f"),
        )
    )
    P = lambda e: F.round(e, 9).cast("decimal(28,9)")
    mom = f.groupBy("t").agg(
        F.count(F.lit(1)).alias("k"),
        (F.sum(P(F.col("f"))).cast("double") / F.count(F.lit(1))).alias("mu"),
        (
            F.sum(P(F.col("f") * F.col("f"))).cast("double") / F.count(F.lit(1))
        ).alias("m2"),
    )
    z = (
        f.join(F.broadcast(mom), "t")
        .filter(F.col("m2") - F.col("mu") * F.col("mu") > 0)
        .select(
            "source",
            "t",
            (
                (F.col("f") - F.col("mu"))
                / F.sqrt(F.col("m2") - F.col("mu") * F.col("mu"))
            ).alias("z"),
        )
    )
    a = z.alias("a")
    b = z.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.t") == F.col("b.t")) & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("s1"),
        F.col("b.source").alias("s2"),
        P(F.abs(F.col("a.z") - F.col("b.z"))).alias("dterm"),
    )
    return (
        pairs.groupBy("s1", "s2")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("dterm").cast("double") / F.count(F.lit(1)), 6).alias(
                "delta"
            ),
        )
        .orderBy("s1", "s2")
    )


@register(
    "q354_cochran_armitage",
    oracle="""
    WITH g AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS score,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r
      FROM orders GROUP BY score
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(r) AS BIGINT) AS rr,
             CAST(sum(score * r) AS BIGINT) AS sr,
             CAST(sum(score * n) AS BIGINT) AS sn,
             CAST(sum(score * score * n) AS BIGINT) AS ssn
      FROM g
    )
    SELECT g.score, g.n, g.r,
           round(CAST(g.r AS DOUBLE) / g.n, 9) AS rate,
           round(
             (CAST(tot.sr AS DOUBLE)
              - CAST(tot.rr AS DOUBLE) * tot.sn / tot.nn)
             / sqrt((CAST(tot.rr AS DOUBLE) / tot.nn)
                    * (1 - CAST(tot.rr AS DOUBLE) / tot.nn)
                    * (CAST(tot.ssn AS DOUBLE)
                       - CAST(tot.sn AS DOUBLE) * tot.sn / tot.nn)),
             6) AS trend_z
    FROM g, tot ORDER BY g.score
    """,
)
def q354_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does order-completion rate trend
    MONOTONICALLY across the ordered priority levels (scores 1..5)? —
    the dose-response test for ordered categories that a plain chi-square
    (q189) cannot see (chi-square detects ANY deviation; CA detects the
    ordered one with far more power). All five moments are exact BIGINT;
    Z is one shared IEEE chain. One category agg + a 1-row reduce."""
    o = _t(spark, sf_dir, "orders")
    g = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("score")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("r"),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("r").cast("long").alias("rr"),
        F.sum(F.col("score") * F.col("r")).cast("long").alias("sr"),
        F.sum(F.col("score") * F.col("n")).cast("long").alias("sn"),
        F.sum(F.col("score") * F.col("score") * F.col("n"))
        .cast("long")
        .alias("ssn"),
    )
    p = F.col("rr").cast("double") / F.col("nn")
    num = F.col("sr").cast("double") - F.col("rr").cast("double") * F.col("sn") / F.col("nn")
    den = F.sqrt(
        p
        * (1 - p)
        * (
            F.col("ssn").cast("double")
            - F.col("sn").cast("double") * F.col("sn") / F.col("nn")
        )
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "score",
            "n",
            "r",
            F.round(F.col("r").cast("double") / F.col("n"), 9).alias("rate"),
            F.round(num / den, 6).alias("trend_z"),
        )
        .orderBy("score")
    )


# ---------------------------------------------------------------------------
# Native recursive CTE, video scene cuts
# ---------------------------------------------------------------------------

_Q355_SQL = """
    WITH RECURSIVE walk(node, depth) AS (
      SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
      UNION ALL
      SELECT p.p_partkey, w.depth + 1
      FROM {part} p JOIN walk w
        ON CAST((p.p_partkey - (p.p_partkey % 8)) / 8 AS BIGINT) = w.node
       AND p.p_partkey > 0
    )
    SELECT depth,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_key,
           CAST(max(node) AS BIGINT) AS max_key
    FROM walk GROUP BY depth ORDER BY depth
"""


@register("q355_recursive_cte_native", oracle=_Q355_SQL.format(part="part"))
def q355_recursive_cte_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard WITH RECURSIVE executed NATIVELY by Spark's recursion
    operator (new in Spark 4.x) against DuckDB's recursive CTE — ONE SQL
    text on both engines, walking an implicit BOM tree (parent =
    partkey DIV 8) from the root and profiling nodes per depth. The
    engine's checkpoint-loop operators (q243 subtree rollup, q305
    materialized paths) predate native recursion and remain the scale
    path with explicit lineage control; this pins the native surface's
    SEMANTICS so either can serve the query. Integer-exact; the parent
    expression avoids `//` vs DIV dialect drift via (k - k%8)/8 on an
    exact integer-valued double."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("q355_part")
    return spark.sql(_Q355_SQL.format(part="q355_part"))


@register(
    "q356_video_scene_cuts",
    oracle="""
    WITH ids AS (
      SELECT i AS media_id FROM range(0, 64) t(i) WHERE i % 3 = 2
    ),
    px AS (
      SELECT d.media_id, f.f AS pair_idx,
             abs((((d.media_id + f.f + 1) % 7) * 11
                  + 16 * y.y + 3 * x.x + 5 * c.c) % 256
                 - ((((d.media_id + f.f) % 7) * 11
                     + 16 * y.y + 3 * x.x + 5 * c.c) % 256)) AS ad
      FROM ids d
      CROSS JOIN range(0, 3) f(f)
      CROSS JOIN range(0, 6) y(y)
      CROSS JOIN range(0, 8) x(x)
      CROSS JOIN range(0, 3) c(c)
    )
    SELECT media_id, CAST(pair_idx AS INTEGER) AS pair_idx,
           CAST(sum(ad) AS BIGINT) AS sum_abs_diff,
           CAST(count(*) AS INTEGER) AS n_px,
           round(CAST(sum(ad) AS DOUBLE) / count(*), 6) AS mean_abs_diff,
           (CAST(sum(ad) AS DOUBLE) / count(*) > 60.0) AS cut
    FROM px GROUP BY media_id, pair_idx
    ORDER BY media_id, pair_idx
    """,
)
def q356_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over REAL concatenated-BMP video payloads:
    split the frame stream on BMP headers, decode each frame with the
    pure-numpy codec, and score consecutive-frame mean absolute pixel
    difference — the shot-boundary primitive of video curation (frame
    SAMPLING is q42's pipeline; this is the inter-frame ANALYSIS step).
    The oracle mirrors the synth pattern's closed form, so what's
    verified is the real byte-level container walk + decode. Python
    emits 2 integers per frame pair; the ratio and threshold run
    JVM-side."""
    import pandas as _pd

    from .operators.multimodal import decode_bmp, split_bmp_stream, synth_media

    media = synth_media(spark, 64).filter(F.col("modality") == "video")

    def diffs(it):
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = [
                    decode_bmp(b).astype("int64")
                    for b in split_bmp_stream(bytes(payload))
                ]
                for i in range(len(frames) - 1):
                    d = abs(frames[i + 1] - frames[i])
                    out.append((int(mid), i, int(d.sum()), int(d.size)))
            yield _pd.DataFrame(
                out, columns=["media_id", "pair_idx", "sum_abs_diff", "n_px"]
            )

    dec = media.select("media_id", "payload").mapInPandas(
        diffs, "media_id long, pair_idx int, sum_abs_diff long, n_px int"
    )
    mean = F.col("sum_abs_diff").cast("double") / F.col("n_px")
    return dec.select(
        "media_id",
        "pair_idx",
        "sum_abs_diff",
        "n_px",
        F.round(mean, 6).alias("mean_abs_diff"),
        (mean > 60.0).alias("cut"),
    ).orderBy("media_id", "pair_idx")


# ---------------------------------------------------------------------------
# MMR result diversification
# ---------------------------------------------------------------------------

_MMR_CANDS = 12
_MMR_K = 6
_MMR_LAM = 0.7


def _q357_oracle() -> str:
    # unrolled greedy: sel{j} picks the argmax of lam*rel - (1-lam)*maxsim
    # over the not-yet-selected candidates; selu{j} accumulates the set.
    # rel/sims are the exact left-fold cosine chains (q21's portability
    # pattern); scores are identical doubles on both engines so the argmax
    # ordering (score DESC, cand) agrees without rounding.
    steps = []
    for j in range(2, _MMR_K + 1):
        steps.append(f"""
    ms{j} AS MATERIALIZED (
      SELECT s.a AS cand, max(s.sim) AS mx
      FROM sims s JOIN selu{j-1} u ON s.b = u.cand
      GROUP BY s.a
    ),
    sel{j} AS MATERIALIZED (
      SELECT r.cand, {_MMR_LAM} * r.rel - {1 - _MMR_LAM:.1f} * m.mx AS score
      FROM rel r JOIN ms{j} m ON m.cand = r.cand
      WHERE r.cand NOT IN (SELECT cand FROM selu{j-1})
      ORDER BY score DESC, r.cand LIMIT 1
    ),
    selu{j} AS MATERIALIZED (
      SELECT cand FROM selu{j-1} UNION ALL SELECT cand FROM sel{j}
    )""")
    finals = " UNION ALL ".join(
        f"SELECT {j} AS mmr_rank, cand, score FROM sel{j}"
        for j in range(1, _MMR_K + 1)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    q AS (SELECT e FROM v WHERE vec_id = 0),
    scored AS (
      SELECT c.vec_id AS cand,
             list_reduce(list_transform(list_zip(q.e, c.e),
                                        p -> p[1] * p[2]), (a, b) -> a + b)
             / (sqrt(list_reduce(list_transform(q.e, x -> x * x),
                                 (a, b) -> a + b))
                * sqrt(list_reduce(list_transform(c.e, x -> x * x),
                                   (a, b) -> a + b))) AS rel
      FROM v c, q WHERE c.vec_id <> 0
    ),
    rel AS MATERIALIZED (
      SELECT cand, rel FROM scored
      ORDER BY rel DESC, cand LIMIT {_MMR_CANDS}
    ),
    sims AS MATERIALIZED (
      SELECT a.cand AS a, b.cand AS b,
             list_reduce(list_transform(list_zip(va.e, vb.e),
                                        p -> p[1] * p[2]), (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(va.e, x -> x * x),
                                 (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(vb.e, x -> x * x),
                                   (x, y) -> x + y))) AS sim
      FROM rel a JOIN rel b ON a.cand <> b.cand
      JOIN v va ON va.vec_id = a.cand
      JOIN v vb ON vb.vec_id = b.cand
    ),
    sel1 AS MATERIALIZED (
      SELECT cand, {_MMR_LAM} * rel AS score FROM rel
      ORDER BY score DESC, cand LIMIT 1
    ),
    selu1 AS MATERIALIZED (SELECT cand FROM sel1),
    {",".join(steps)}
    SELECT f.mmr_rank, f.cand AS vec_id, round(r.rel, 9) AS rel,
           round(f.score, 9) AS mmr_score
    FROM ({finals}) f JOIN rel r ON r.cand = f.cand
    ORDER BY f.mmr_rank
    """


@register("q357_mmr_diversification", oracle=_q357_oracle())
def q357_mmr_diversification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking: from the query's top-12
    cosine candidates, greedily select 6 maximizing lam*relevance -
    (1-lam)*max-similarity-to-already-selected — the diversity layer
    retrieval stacks put between ANN search (q21) and fusion (q163),
    de-duplicating semantically redundant hits. Relevance and all 132
    pairwise similarities are the exact left-fold cosine chains, so the
    greedy argmax ordering agrees across engines without rounding; the
    oracle unrolls the same 6 steps as MATERIALIZED CTEs. Spark drives
    the greedy on a checkpointed 12-row candidate table — the heavy work
    (corpus scan + top-k) is the same one-shuffle plan as q21. All
    checkpoints are LAZY (r6): they exist to truncate the per-round
    doubling of the logical plan, and the single final action
    materializes every round's 12-row iterate in one job instead of six
    driver-blocking barrier jobs."""
    from .operators.similarity import ann_bruteforce_topk, cosine

    emb = _t(spark, sf_dir, "embeddings")
    rel = (
        ann_bruteforce_topk(emb, emb.filter(F.col("vec_id") == 0), k=_MMR_CANDS)
        .select(F.col("vec_id").alias("cand"), F.col("cos_sim").alias("rel"))
        .localCheckpoint(eager=False)
    )
    vecs = emb.join(
        rel.select(F.col("cand").alias("vec_id")), "vec_id"
    ).localCheckpoint(eager=False)
    a = vecs.alias("a")
    b = vecs.alias("b")
    sims = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a"),
            F.col("b.vec_id").alias("b"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("sim"),
        )
        .localCheckpoint(eager=False)
    )
    lam = _MMR_LAM
    sel = (
        rel.select("cand", (F.lit(lam) * F.col("rel")).alias("score"))
        .orderBy(F.desc("score"), "cand")
        .limit(1)
        .select(F.lit(1).alias("mmr_rank"), "cand", "score")
        .localCheckpoint(eager=False)
    )
    picked = sel
    for j in range(2, _MMR_K + 1):
        chosen = picked.select("cand")
        ms = (
            sims.join(chosen.withColumnRenamed("cand", "b"), "b")
            .groupBy(F.col("a").alias("cand"))
            .agg(F.max("sim").alias("mx"))
        )
        step = (
            rel.join(ms, "cand")
            .join(chosen, "cand", "left_anti")
            .select(
                F.lit(j).alias("mmr_rank"),
                "cand",
                (F.lit(lam) * F.col("rel") - F.lit(1 - lam) * F.col("mx")).alias(
                    "score"
                ),
            )
            .orderBy(F.desc("score"), "cand")
            .limit(1)
        )
        picked = picked.unionByName(step).localCheckpoint(eager=False)
    return (
        picked.join(rel, "cand")
        .select(
            "mmr_rank",
            F.col("cand").alias("vec_id"),
            F.round("rel", 9).alias("rel"),
            F.round("score", 9).alias("mmr_score"),
        )
        .orderBy("mmr_rank")
    )


# ---------------------------------------------------------------------------
# Markov-chain (removal-effect) attribution
# ---------------------------------------------------------------------------

_MK_ITERS = 16
_MK_CHANNELS = ("click", "error", "signup", "view")


def _q358_oracle() -> str:
    scen_rows = " UNION ALL ".join(
        ["SELECT 'base' AS scenario, NULL AS removed"]
        + [f"SELECT 'no_{c}', '{c}'" for c in _MK_CHANNELS]
    )
    iter_cte = """
    v{i} AS MATERIALIZED (
      SELECT e.scenario, e.src AS state,
             CAST(sum(CAST(round(e.p * v.v, 12) AS DECIMAL(28,12)))
                  AS DOUBLE) AS v
      FROM sedges e JOIN v{prev} v
        ON e.scenario = v.scenario AND e.dst = v.state
      GROUP BY e.scenario, e.src
      UNION ALL SELECT scenario, 'CONV', 1.0 FROM scen
      UNION ALL SELECT scenario, 'DROP', 0.0 FROM scen
    )"""
    its = ",".join(
        iter_cte.format(i=i, prev=i - 1 if i > 1 else "0")
        for i in range(1, _MK_ITERS + 1)
    )
    return f"""
    WITH seq AS (
      SELECT user_id,
             CASE WHEN event_type = 'purchase' THEN 'CONV'
                  ELSE event_type END AS state,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    firstp AS (
      SELECT user_id, min(CASE WHEN state = 'CONV' THEN rn END) AS pr,
             max(rn) AS mr
      FROM seq GROUP BY user_id
    ),
    kept AS (
      SELECT s.user_id, s.state, s.rn,
             coalesce(f.pr, f.mr) AS last_rn, f.pr IS NULL AS dropped
      FROM seq s JOIN firstp f ON s.user_id = f.user_id
      WHERE s.rn <= coalesce(f.pr, f.mr)
    ),
    trans AS (
      SELECT coalesce(lag(state) OVER w2, 'START') AS src, state AS dst
      FROM kept
      WINDOW w2 AS (PARTITION BY user_id ORDER BY rn)
      UNION ALL
      SELECT state, 'DROP' FROM kept WHERE dropped AND rn = last_rn
    ),
    cnt AS (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM trans
      GROUP BY src, dst
    ),
    edges AS MATERIALIZED (
      SELECT src, dst,
             CAST(n AS DOUBLE)
               / sum(n) OVER (PARTITION BY src) AS p
      FROM cnt
    ),
    scen AS MATERIALIZED ({scen_rows}),
    sedges AS MATERIALIZED (
      SELECT s.scenario,
             e.src,
             CASE WHEN e.dst = s.removed THEN 'DROP' ELSE e.dst END AS dst,
             CAST(sum(e.p) AS DOUBLE) AS p
      FROM scen s JOIN edges e
        ON s.removed IS NULL OR e.src <> s.removed
      GROUP BY s.scenario, e.src,
               CASE WHEN e.dst = s.removed THEN 'DROP' ELSE e.dst END
    ),
    states AS (SELECT DISTINCT scenario, src AS state FROM sedges),
    v0 AS MATERIALIZED (
      SELECT scenario, state, 0.0 AS v FROM states
      UNION ALL SELECT scenario, 'CONV', 1.0 FROM scen
      UNION ALL SELECT scenario, 'DROP', 0.0 FROM scen
    ),
    {its},
    pconv AS (
      SELECT scenario, v FROM v{_MK_ITERS} WHERE state = 'START'
    ),
    base AS (SELECT v AS pb FROM pconv WHERE scenario = 'base'),
    effects AS (
      SELECT p.scenario, p.v AS p_conv,
             CASE WHEN p.scenario = 'base' THEN 0.0
                  ELSE 1.0 - p.v / b.pb END AS removal_effect
      FROM pconv p, base b
    ),
    tot AS (
      SELECT CAST(sum(CAST(round(removal_effect, 9) AS DECIMAL(28,9)))
                  AS DOUBLE) AS te
      FROM effects WHERE scenario <> 'base'
    )
    SELECT e.scenario, round(e.p_conv, 9) AS p_conv,
           round(e.removal_effect, 9) AS removal_effect,
           round(CASE WHEN e.scenario = 'base' THEN NULL
                      ELSE e.removal_effect / t.te END, 9) AS attribution
    FROM effects e, tot t ORDER BY e.scenario
    """


@register("q358_markov_attribution", oracle=_q358_oracle())
def q358_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain (removal-effect) multi-touch attribution: user
    journeys (truncated at first purchase) become a first-order
    transition graph START -> channels -> CONV/DROP; each channel's
    credit is 1 - P(conv | channel removed)/P(conv), normalized — the
    data-driven attribution standard that last-touch (q170) and
    position (q262) heuristics approximate. Absorption probabilities
    run 16 fixed matrix-vector iterations on the channel-sized graph;
    each product term is round(12)-pinned into DECIMAL sums (order-free)
    and scenario edges merge at most TWO probabilities (IEEE addition is
    commutative, so the 2-term re-aggregation is engine-identical). The
    only data-sized work is the one journey window + transition agg;
    all scenarios iterate together on one ~30-row edge table."""
    ev = _t(spark, sf_dir, "events")
    wq = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.when(F.col("event_type") == "purchase", "CONV")
        .otherwise(F.col("event_type"))
        .alias("state"),
        F.row_number().over(wq).alias("rn"),
    )
    firstp = seq.groupBy("user_id").agg(
        F.min(F.when(F.col("state") == "CONV", F.col("rn"))).alias("pr"),
        F.max("rn").alias("mr"),
    )
    kept = (
        seq.join(firstp, "user_id")
        .filter(F.col("rn") <= F.coalesce(F.col("pr"), F.col("mr")))
        .select(
            "user_id",
            "state",
            "rn",
            F.coalesce(F.col("pr"), F.col("mr")).alias("last_rn"),
            F.col("pr").isNull().alias("dropped"),
        )
    )
    w2 = W.partitionBy("user_id").orderBy("rn")
    trans = kept.select(
        F.coalesce(F.lag("state").over(w2), F.lit("START")).alias("src"),
        F.col("state").alias("dst"),
    ).unionByName(
        kept.filter(F.col("dropped") & (F.col("rn") == F.col("last_rn"))).select(
            F.col("state").alias("src"), F.lit("DROP").alias("dst")
        )
    )
    cnt = trans.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    edges = cnt.select(
        "src",
        "dst",
        (
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("src"))
        ).alias("p"),
    )
    scen = spark.createDataFrame(
        [("base", None)] + [(f"no_{c}", c) for c in _MK_CHANNELS],
        "scenario string, removed string",
    )
    sedges = (
        F.broadcast(scen)
        .join(edges, F.col("removed").isNull() | (F.col("src") != F.col("removed")))
        .select(
            "scenario",
            "src",
            F.when(F.col("dst") == F.col("removed"), "DROP")
            .otherwise(F.col("dst"))
            .alias("dst"),
            "p",
        )
        .groupBy("scenario", "src", "dst")
        .agg(F.sum("p").cast("double").alias("p"))
    )
    # The absorption fixed point iterates over CONSTANT-sized state (the
    # ~5-state channel vocabulary per scenario), so the 16 matrix-vector
    # iterations run as a single-row higher-order-function fold per scenario
    # instead of 16 join+agg rounds (was 60+ Spark jobs of pure stage
    # latency; guide §1.2 "remove passes"). Arithmetic is mirrored exactly:
    # each term is round(p * v[dst], 12) cast DECIMAL(28,12), summed
    # exactly (decimal addition is order-free), cast DOUBLE — and an edge
    # whose dst carries no state value contributes 0, which is value-
    # identical to the oracle's inner join dropping the term.
    per_scen = sedges.groupBy("scenario").agg(
        F.array_sort(F.collect_set("src")).alias("srcs"),
        F.collect_list(F.struct("src", "dst", "p")).alias("edges"),
    )
    dec0 = F.lit(0).cast("decimal(28,12)")

    def _next_v(v):
        """One absorption iteration: map src -> Σ round(p·v[dst], 12).
        ``v`` must be a bound lambda VARIABLE (the fold accumulator), so
        each lookup reads a materialized per-row value — referencing the
        previous iterate as a plain nested expression instead re-evaluates
        the whole chain per term (exponential)."""

        def state_val(s):
            def term(acc, e):
                vdst = (
                    F.when(e["dst"] == "CONV", F.lit(1.0))
                    .when(e["dst"] == "DROP", F.lit(0.0))
                    .otherwise(F.element_at(v, e["dst"]))
                )
                return (
                    acc
                    + F.coalesce(
                        F.round(e["p"] * vdst, 12).cast("decimal(28,12)"), dec0
                    )
                ).cast("decimal(28,12)")

            return F.aggregate(
                F.filter(F.col("edges"), lambda e: e["src"] == s),
                dec0,
                term,
                lambda acc: acc.cast("double"),
            )

        return F.map_from_arrays(
            F.col("srcs"), F.transform(F.col("srcs"), state_val)
        )

    v0 = F.map_from_arrays(
        F.col("srcs"), F.transform(F.col("srcs"), lambda s: F.lit(0.0))
    )
    v16 = F.aggregate(
        F.sequence(F.lit(1), F.lit(_MK_ITERS)), v0, lambda acc, i: _next_v(acc)
    )
    pconv = per_scen.select(
        "scenario", F.element_at(v16, F.lit("START")).alias("v")
    )
    wall = W.partitionBy()
    pb = F.first(
        F.when(F.col("scenario") == "base", F.col("v")), ignorenulls=True
    ).over(wall)
    effects = pconv.select(
        "scenario",
        F.col("v").alias("p_conv"),
        F.when(F.col("scenario") == "base", 0.0)
        .otherwise(1.0 - F.col("v") / pb)
        .alias("removal_effect"),
    )
    te = (
        F.sum(
            F.when(
                F.col("scenario") != "base",
                F.round(F.col("removal_effect"), 9).cast("decimal(28,9)"),
            )
        )
        .over(wall)
        .cast("double")
    )
    return (
        effects.select(
            "scenario",
            F.round("p_conv", 9).alias("p_conv"),
            F.round("removal_effect", 9).alias("removal_effect"),
            F.round(
                F.when(
                    F.col("scenario") == "base", F.lit(None).cast("double")
                ).otherwise(F.col("removal_effect") / te),
                9,
            ).alias("attribution"),
        )
        .orderBy("scenario")
    )


# ---------------------------------------------------------------------------
# Image histogram equalization (real BMP decode)
# ---------------------------------------------------------------------------


@register(
    "q359_histogram_equalization",
    oracle="""
    WITH ids AS (
      SELECT i AS media_id FROM range(0, 64) t(i) WHERE i % 3 = 0
    ),
    px AS (
      SELECT d.media_id,
             ((d.media_id % 7) * 11 + 16 * y.y + 3 * x.x + 5 * c.c) % 256 AS v
      FROM ids d
      CROSS JOIN range(0, 6) y(y)
      CROSS JOIN range(0, 8) x(x)
      CROSS JOIN range(0, 3) c(c)
    ),
    hist AS (
      SELECT media_id, v, CAST(count(*) AS BIGINT) AS n FROM px
      GROUP BY media_id, v
    ),
    cdf AS (
      SELECT media_id, v, n,
             CAST(sum(n) OVER (PARTITION BY media_id ORDER BY v)
                  AS BIGINT) AS c,
             CAST(min(n) OVER (PARTITION BY media_id) AS BIGINT) AS dummy
      FROM hist
    ),
    lims AS (
      SELECT media_id,
             CAST(min(c) AS BIGINT) AS cmin,
             CAST(max(c) AS BIGINT) AS total
      FROM cdf GROUP BY media_id
    ),
    eq AS (
      SELECT h.media_id, h.v, h.n,
             CAST(((h.c - l.cmin) * 255) // (l.total - l.cmin) AS BIGINT)
               AS ev
      FROM cdf h JOIN lims l ON h.media_id = l.media_id
    )
    SELECT media_id,
           CAST(sum(n) AS BIGINT) AS n_px,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(v * n) AS BIGINT) AS orig_sum,
           CAST(sum(ev * n) AS BIGINT) AS eq_sum,
           CAST(max(ev) AS BIGINT) AS eq_max
    FROM eq GROUP BY media_id ORDER BY media_id
    """,
)
def q359_histogram_equalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram equalization over REAL decoded BMP images: per-image
    value histogram, CDF, and the classic integer remap eq(v) =
    (cdf(v)-cdf_min)*255 / (N-cdf_min) — contrast normalization, the
    standard image-preprocessing step before feature extraction. ALL
    integer arithmetic (the remap uses floor division, no floats
    anywhere), so the decoded-pixel path is verified bit-exactly against
    the synth pattern's closed form. Python decodes Arrow batches and
    emits 6 integers per image; nothing else leaves the executor."""
    import numpy as _np
    import pandas as _pd

    from .operators.multimodal import decode_bmp, synth_media

    media = synth_media(spark, 64).filter(F.col("modality") == "image")

    def equalize(it):
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                v = decode_bmp(bytes(payload)).astype("int64").ravel()
                vals, counts = _np.unique(v, return_counts=True)
                c = counts.cumsum()
                cmin, total = int(c[0]), int(c[-1])
                ev = (c - cmin) * 255 // (total - cmin)
                out.append(
                    (
                        int(mid),
                        total,
                        len(vals),
                        int((vals * counts).sum()),
                        int((ev * counts).sum()),
                        int(ev.max()),
                    )
                )
            yield _pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_px", "n_distinct",
                    "orig_sum", "eq_sum", "eq_max",
                ],
            )

    return (
        media.select("media_id", "payload")
        .mapInPandas(
            equalize,
            "media_id long, n_px long, n_distinct long, "
            "orig_sum long, eq_sum long, eq_max long",
        )
        .orderBy("media_id")
    )


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered-alternative test
# ---------------------------------------------------------------------------


@register(
    "q360_jonckheere_terpstra",
    oracle="""
    WITH x AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
      FROM orders
    ),
    hist AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n FROM x GROUP BY g, v),
    gp AS (
      SELECT a.g AS gi, b.g AS gj FROM
      (SELECT DISTINCT g FROM hist) a JOIN (SELECT DISTINCT g FROM hist) b
      ON a.g < b.g
    ),
    merged AS (
      SELECT p.gi, p.gj, h.v,
             CASE WHEN h.g = p.gi THEN h.n ELSE 0 END AS ni,
             CASE WHEN h.g = p.gj THEN h.n ELSE 0 END AS nj
      FROM gp p JOIN hist h ON h.g = p.gi OR h.g = p.gj
    ),
    axis AS (
      SELECT gi, gj, v, CAST(sum(ni) AS BIGINT) AS ni,
             CAST(sum(nj) AS BIGINT) AS nj
      FROM merged GROUP BY gi, gj, v
    ),
    cums AS (
      SELECT gi, gj, v, ni, nj,
             CAST(coalesce(sum(ni) OVER (PARTITION BY gi, gj ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS less_i
      FROM axis
    ),
    pairu AS (
      SELECT gi, gj,
             CAST(sum(2 * nj * less_i + ni * nj) AS BIGINT) AS u2
      FROM cums GROUP BY gi, gj
    ),
    sizes AS (SELECT g, CAST(sum(n) AS BIGINT) AS m FROM hist GROUP BY g),
    tot AS (
      SELECT CAST(sum(u2) AS BIGINT) AS jt2 FROM pairu
    ),
    moments AS (
      SELECT CAST(sum(m) AS BIGINT) AS nn,
             CAST(sum(m * m) AS BIGINT) AS s2,
             CAST(sum(m * m * (2 * m + 3)) AS BIGINT) AS s3
      FROM sizes
    )
    SELECT p.gi, p.gj, p.u2,
           t.jt2,
           round((CAST(t.jt2 AS DOUBLE) / 2
                  - (CAST(m.nn AS DOUBLE) * m.nn - m.s2) / 4)
                 / sqrt((CAST(m.nn AS DOUBLE) * m.nn * (2 * m.nn + 3) - m.s3)
                        / 72), 6) AS jt_z
    FROM pairu p, tot t, moments m
    ORDER BY p.gi, p.gj
    """,
)
def q360_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED trend in order value
    across priority levels — the rank test with power against monotone
    alternatives that Kruskal-Wallis (q242, any-difference) and
    Cochran-Armitage (q354, binary outcome) don't cover. Pairwise
    Mann-Whitney counts are computed EXACTLY from per-group value
    histograms on a merged value axis (2U = 2*sum(n_j * less_i) +
    ties, all BIGINT — never an O(n^2) pair join); the normal
    approximation z uses the classic no-ties variance (documented).
    One histogram agg + a 10-pair exploded window over distinct
    values."""
    o = _t(spark, sf_dir, "orders")
    x = o.select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("g"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("v"),
    )
    hist = x.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n"))
    gs = hist.select("g").distinct()
    gp = (
        gs.alias("a")
        .join(gs.alias("b"), F.col("a.g") < F.col("b.g"))
        .select(F.col("a.g").alias("gi"), F.col("b.g").alias("gj"))
    )
    merged = F.broadcast(gp).join(
        hist, (F.col("g") == F.col("gi")) | (F.col("g") == F.col("gj"))
    ).select(
        "gi",
        "gj",
        "v",
        F.when(F.col("g") == F.col("gi"), F.col("n")).otherwise(0).alias("ni"),
        F.when(F.col("g") == F.col("gj"), F.col("n")).otherwise(0).alias("nj"),
    )
    axis = merged.groupBy("gi", "gj", "v").agg(
        F.sum("ni").cast("long").alias("ni"), F.sum("nj").cast("long").alias("nj")
    )
    wv = (
        W.partitionBy("gi", "gj")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cums = axis.select(
        "gi",
        "gj",
        "ni",
        "nj",
        F.coalesce(F.sum("ni").over(wv), F.lit(0)).cast("long").alias("less_i"),
    )
    pairu = cums.groupBy("gi", "gj").agg(
        F.sum(2 * F.col("nj") * F.col("less_i") + F.col("ni") * F.col("nj"))
        .cast("long")
        .alias("u2")
    )
    sizes = hist.groupBy("g").agg(F.sum("n").cast("long").alias("m"))
    tot = pairu.agg(F.sum("u2").cast("long").alias("jt2"))
    moments = sizes.agg(
        F.sum("m").cast("long").alias("nn"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("s2"),
        F.sum(F.col("m") * F.col("m") * (2 * F.col("m") + 3))
        .cast("long")
        .alias("s3"),
    )
    mean = (F.col("nn").cast("double") * F.col("nn") - F.col("s2")) / 4
    var = (
        F.col("nn").cast("double") * F.col("nn") * (2 * F.col("nn") + 3)
        - F.col("s3")
    ) / 72
    return (
        pairu.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(moments))
        .select(
            "gi",
            "gj",
            "u2",
            "jt2",
            F.round(
                (F.col("jt2").cast("double") / 2 - mean) / F.sqrt(var), 6
            ).alias("jt_z"),
        )
        .orderBy("gi", "gj")
    )


# ---------------------------------------------------------------------------
# Spectral diurnal power, Fellegi-Sunter EM record linkage
# ---------------------------------------------------------------------------


@register(
    "q361_dft_diurnal_power",
    oracle="""
    WITH series AS (
      SELECT row_number() OVER (ORDER BY date_trunc('hour', ts)) - 1 AS t,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY date_trunc('hour', ts)
    ),
    terms AS (
      SELECT p.p AS period, s.t, s.x,
             CAST(round(s.x * cos((s.t % p.p) * (2 * pi() / p.p)), 9)
                  AS DECIMAL(28,9)) AS tc,
             CAST(round(s.x * sin((s.t % p.p) * (2 * pi() / p.p)), 9)
                  AS DECIMAL(28,9)) AS ts
      FROM series s CROSS JOIN (VALUES (12), (24), (168)) p(p)
    )
    SELECT period,
           CAST(count(*) AS BIGINT) AS n_hours,
           round(CAST(sum(tc) AS DOUBLE), 6) AS sum_cos,
           round(CAST(sum(ts) AS DOUBLE), 6) AS sum_sin,
           round(
             (CAST(sum(tc) AS DOUBLE) * CAST(sum(tc) AS DOUBLE)
              + CAST(sum(ts) AS DOUBLE) * CAST(sum(ts) AS DOUBLE))
             / count(*), 6) AS power,
           round(2 * sqrt(CAST(sum(tc) AS DOUBLE) * CAST(sum(tc) AS DOUBLE)
                          + CAST(sum(ts) AS DOUBLE)
                            * CAST(sum(ts) AS DOUBLE)) / count(*),
                 6) AS amplitude
    FROM terms GROUP BY period ORDER BY period
    """,
)
def q361_dft_diurnal_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-bin DFT (Goertzel-equivalent) power of the hourly event
    series at the 12h / 24h / weekly periods — 'how diurnal is this
    traffic', the spectral question behind capacity planning and
    seasonality-aware forecasting (q149 decomposes by averaging; this
    measures the periodicity strength directly). Phase angles reduce
    t mod period so both engines evaluate trig on identical small
    inputs; each x*cos / x*sin term is round(9)-pinned into DECIMAL
    sums (the q311 circular-statistics discipline), and power/amplitude
    are one shared IEEE chain. One hourly agg + a 3x-exploded pinned
    reduction."""
    import math

    ev = _t(spark, sf_dir, "events")
    series = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("x"))
        .select((F.row_number().over(W.orderBy("h")) - 1).alias("t"), "x")
    )
    terms = series.select(
        F.explode(F.array(F.lit(12), F.lit(24), F.lit(168))).alias("period"),
        "t",
        "x",
    ).select(
        "period",
        F.round(
            F.col("x")
            * F.cos((F.col("t") % F.col("period")) * (2 * math.pi / F.col("period"))),
            9,
        )
        .cast("decimal(28,9)")
        .alias("tc"),
        F.round(
            F.col("x")
            * F.sin((F.col("t") % F.col("period")) * (2 * math.pi / F.col("period"))),
            9,
        )
        .cast("decimal(28,9)")
        .alias("ts"),
    )
    sc = F.sum("tc").cast("double")
    ss = F.sum("ts").cast("double")
    n = F.count(F.lit(1))
    return (
        terms.groupBy("period")
        .agg(
            n.alias("n_hours"),
            F.round(sc, 6).alias("sum_cos"),
            F.round(ss, 6).alias("sum_sin"),
            F.round((sc * sc + ss * ss) / n, 6).alias("power"),
            F.round(2 * F.sqrt(sc * sc + ss * ss) / n, 6).alias("amplitude"),
        )
        .orderBy("period")
    )


_FS_ITERS = 8


def _q362_oracle() -> str:
    # one EM iteration: E-step posterior r per pattern from em{prev}'s
    # params, M-step pinned sums over the 8 patterns. a/b multiply in a
    # FIXED order (p*c1*c2*c3 left-assoc) on both engines.
    def cases(pfx: str) -> str:
        return " * ".join(
            f"(CASE WHEN pt.g{k} = 1 THEN e.{pfx}{k} ELSE 1 - e.{pfx}{k} END)"
            for k in (1, 2, 3)
        )

    r_expr = (
        f"(e.p * {cases('m')})"
        f" / (e.p * {cases('m')} + (1 - e.p) * {cases('u')})"
    )
    psum = "CAST(sum(CAST(round(pt.n * {expr}, 6) AS DECIMAL(28,6))) AS DOUBLE)"
    step = f"""
    em{{i}} AS MATERIALIZED (
      SELECT
        {psum.format(expr=r_expr)} / (SELECT sum(n) FROM pt) AS p,
        {psum.format(expr=f"({r_expr}) * pt.g1")}
          / {psum.format(expr=r_expr)} AS m1,
        {psum.format(expr=f"({r_expr}) * pt.g2")}
          / {psum.format(expr=r_expr)} AS m2,
        {psum.format(expr=f"({r_expr}) * pt.g3")}
          / {psum.format(expr=r_expr)} AS m3,
        {psum.format(expr=f"(1 - ({r_expr})) * pt.g1")}
          / {psum.format(expr=f"(1 - ({r_expr}))")} AS u1,
        {psum.format(expr=f"(1 - ({r_expr})) * pt.g2")}
          / {psum.format(expr=f"(1 - ({r_expr}))")} AS u2,
        {psum.format(expr=f"(1 - ({r_expr})) * pt.g3")}
          / {psum.format(expr=f"(1 - ({r_expr}))")} AS u3
      FROM pt, em{{prev}} e
    )"""
    its = ",".join(
        step.format(i=i, prev=i - 1 if i > 1 else "0")
        for i in range(1, _FS_ITERS + 1)
    )
    return f"""
    WITH c AS (
      SELECT c_custkey AS k, c_nationkey AS nk, c_mktsegment AS seg,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal,
             CAST(floor(c_acctbal / 500) AS BIGINT) AS bb
      FROM customer
    ),
    pairs AS (
      SELECT CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS g1,
             CASE WHEN abs(a.bal - b.bal) <= 2000 THEN 1 ELSE 0 END AS g2,
             CASE WHEN a.k % 10 = b.k % 10 THEN 1 ELSE 0 END AS g3
      FROM c a JOIN c b ON a.nk = b.nk AND a.bb = b.bb AND a.k < b.k
    ),
    pt AS MATERIALIZED (
      SELECT g1, g2, g3, CAST(count(*) AS BIGINT) AS n FROM pairs
      GROUP BY g1, g2, g3
    ),
    em0 AS (SELECT 0.1 AS p, 0.8 AS m1, 0.8 AS m2, 0.8 AS m3,
                   0.2 AS u1, 0.2 AS u2, 0.2 AS u3),
    {its}
    SELECT pt.g1, pt.g2, pt.g3, pt.n,
           round({r_expr}, 6) AS posterior,
           round(e.p, 6) AS p_match,
           round(e.m1, 6) AS m1, round(e.m2, 6) AS m2,
           round(e.m3, 6) AS m3,
           round(e.u1, 6) AS u1, round(e.u2, 6) AS u2, round(e.u3, 6) AS u3
    FROM pt, em{_FS_ITERS} e
    ORDER BY pt.g1, pt.g2, pt.g3
    """


@register("q362_fellegi_sunter_em", oracle=_q362_oracle())
def q362_fellegi_sunter_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage fit by EM: blocked
    customer pairs scored on 3 binary agreement features (segment,
    balance proximity, key-digit), EM estimating the match prevalence p
    and per-feature m/u probabilities WITHOUT labels — the Splink-style
    unsupervised linkage standard (q188's deterministic ER picks a
    threshold by hand; this LEARNS the weights). With binary features
    the sufficient statistics collapse to 8 pattern counts, so 8 EM
    iterations run on an 8-row table: every per-pattern posterior is
    the same fixed-order IEEE chain on both engines and every M-step
    sum is round(6)-pinned DECIMAL. The only data-sized work is the
    blocked pair join + one pattern count agg."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("bal"),
        F.floor(F.col("c_acctbal") / 500).cast("long").alias("bb"),
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.nk") == F.col("b.nk"))
        & (F.col("a.bb") == F.col("b.bb"))
        & (F.col("a.k") < F.col("b.k")),
    ).select(
        F.when(F.col("a.seg") == F.col("b.seg"), 1).otherwise(0).alias("g1"),
        F.when(F.abs(F.col("a.bal") - F.col("b.bal")) <= 2000, 1)
        .otherwise(0)
        .alias("g2"),
        F.when(F.col("a.k") % 10 == F.col("b.k") % 10, 1).otherwise(0).alias("g3"),
    )
    pt = pairs.groupBy("g1", "g2", "g3").agg(F.count(F.lit(1)).alias("n"))
    # With 3 binary features the sufficient statistics are 8 pattern counts —
    # CONSTANT-sized state — so the 8 EM rounds run as a single-row fold over
    # the collect_list'ed pattern array instead of 8 crossJoin+agg rounds
    # with per-round checkpoints (guide §1.2 step 1; see q358/q350 for the
    # bound-lambda-variable discipline). Arithmetic mirrored exactly: the
    # m/u chains multiply left-associated p*c1*c2*c3, every M-step sum is
    # round(n·expr, 6) cast DECIMAL(28,6) summed exactly (order-free).
    folded = pt.agg(
        F.collect_list(F.struct("g1", "g2", "g3", "n")).alias("pats"),
        F.sum("n").cast("long").alias("nt"),
    )
    dec0 = F.lit(0).cast("decimal(28,6)")

    def chain(e, prm, pfx: str):
        out = prm["p"] if pfx == "m" else (F.lit(1) - prm["p"])
        for k in (1, 2, 3):
            out = out * F.when(
                e[f"g{k}"] == 1, prm[f"{pfx}{k}"]
            ).otherwise(F.lit(1) - prm[f"{pfx}{k}"])
        return out

    def r_of(e, prm):
        return chain(e, prm, "m") / (chain(e, prm, "m") + chain(e, prm, "u"))

    def sum6(expr_fn):
        return F.aggregate(
            F.col("pats"),
            dec0,
            lambda a, e: (
                a + F.round(e["n"] * expr_fn(e), 6).cast("decimal(28,6)")
            ).cast("decimal(28,6)"),
            lambda a: a.cast("double"),
        )

    def em_round(prm, _i):
        r = lambda e: r_of(e, prm)  # noqa: E731
        return F.struct(
            (sum6(r) / F.col("nt")).alias("p"),
            *[
                (sum6(lambda e: r(e) * e[f"g{k}"]) / sum6(r)).alias(f"m{k}")
                for k in (1, 2, 3)
            ],
            *[
                (
                    sum6(lambda e: (F.lit(1) - r(e)) * e[f"g{k}"])
                    / sum6(lambda e: F.lit(1) - r(e))
                ).alias(f"u{k}")
                for k in (1, 2, 3)
            ],
        )

    params0 = F.struct(
        F.lit(0.1).alias("p"),
        *[F.lit(0.8).alias(f"m{k}") for k in (1, 2, 3)],
        *[F.lit(0.2).alias(f"u{k}") for k in (1, 2, 3)],
    )
    em = F.aggregate(
        F.sequence(F.lit(1), F.lit(_FS_ITERS)), params0, em_round
    )
    # lazy checkpoint: the final projection references `em` ~30 times
    # (posterior chain + 7 rounded params); without a barrier CollapseProject
    # inlines the whole 8-round fold into every reference and codegen
    # compiles it 30x (measured +15s cold). One 8-row materialization keeps
    # the fold compiled and evaluated once.
    res = folded.select(
        F.explode("pats").alias("e"), em.alias("em")
    ).localCheckpoint(eager=False)
    r_final = r_of(F.col("e"), F.col("em"))
    return (
        res.select(
            F.col("e.g1").alias("g1"),
            F.col("e.g2").alias("g2"),
            F.col("e.g3").alias("g3"),
            F.col("e.n").alias("n"),
            F.round(r_final, 6).alias("posterior"),
            F.round(F.col("em.p"), 6).alias("p_match"),
            F.round(F.col("em.m1"), 6).alias("m1"),
            F.round(F.col("em.m2"), 6).alias("m2"),
            F.round(F.col("em.m3"), 6).alias("m3"),
            F.round(F.col("em.u1"), 6).alias("u1"),
            F.round(F.col("em.u2"), 6).alias("u2"),
            F.round(F.col("em.u3"), 6).alias("u3"),
        )
        .orderBy("g1", "g2", "g3")
    )


# ---------------------------------------------------------------------------
# Exact Shapley-value attribution over channel coalitions
# ---------------------------------------------------------------------------

_SH_CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
# (channel, subset-mask-without-channel, 24*weight) where weight =
# |S|! (4-1-|S|)! / 4!  ->  24w in {6, 2, 2, 6} for |S| = 0..3
_SH_TERMS = [
    (c, s, {0: 6, 1: 2, 2: 2, 3: 6}[bin(s).count("1")])
    for c, bit in _SH_CHANNELS
    for s in range(16)
    if not s & bit
]


def _q363_oracle() -> str:
    coef_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, {s} AS s_mask, "
        f"{s | dict(_SH_CHANNELS)[c]} AS s_with, {w} AS w24"
        for c, s, w in _SH_TERMS
    )
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    firstp AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'purchase' THEN rn END) AS pr
      FROM seq GROUP BY user_id
    ),
    exposure AS (
      SELECT s.user_id,
             CAST(max(CASE WHEN s.event_type = 'click' THEN 1 ELSE 0 END)
                  + 2 * max(CASE WHEN s.event_type = 'error' THEN 1 ELSE 0 END)
                  + 4 * max(CASE WHEN s.event_type = 'signup' THEN 1 ELSE 0 END)
                  + 8 * max(CASE WHEN s.event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS mask,
             CAST(max(CASE WHEN f.pr IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS conv
      FROM seq s JOIN firstp f ON s.user_id = f.user_id
      WHERE f.pr IS NULL OR s.rn < f.pr
      GROUP BY s.user_id
    ),
    v AS MATERIALIZED (
      SELECT mask, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(conv) AS DOUBLE) / count(*) AS rate
      FROM exposure GROUP BY mask
    ),
    coef AS ({coef_rows}),
    terms AS (
      SELECT c.channel,
             CAST(round(c.w24 * (coalesce(v1.rate, 0.0)
                                 - coalesce(v0.rate, 0.0)), 12)
                  AS DECIMAL(28,12)) AS t
      FROM coef c
      LEFT JOIN v v0 ON v0.mask = c.s_mask
      LEFT JOIN v v1 ON v1.mask = c.s_with
    )
    SELECT channel,
           round(CAST(sum(t) AS DOUBLE) / 24, 9) AS shapley
    FROM terms GROUP BY channel ORDER BY channel
    """


@register("q363_shapley_attribution", oracle=_q363_oracle())
def q363_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution over channel coalitions: each
    user's pre-conversion exposure SET (4 channels -> 16 masks), v(S) =
    conversion rate of users exposed to exactly S, and each channel's
    Shapley value as the factorially-weighted marginal-contribution sum
    — the game-theoretic attribution that Markov removal (q358)
    approximates and position heuristics (q170/q262) guess at. With 4
    channels the coalition lattice is 16 cells, so the computation is
    EXACT, not sampled: weights enter as INTEGER 24w coefficients,
    marginals are single-division rates, and each channel's 8-term sum
    is round(12)-pinned DECIMAL. One journey window + one mask agg; the
    lattice math is a 32-row literal join."""
    ev = _t(spark, sf_dir, "events")
    wq = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(wq).alias("rn")
    )
    firstp = seq.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        ).alias("pr")
    )
    bit = lambda t, b: b * F.max(
        F.when(F.col("event_type") == t, 1).otherwise(0)
    )
    exposure = (
        seq.join(firstp, "user_id")
        .filter(F.col("pr").isNull() | (F.col("rn") < F.col("pr")))
        .groupBy("user_id")
        .agg(
            (
                bit("click", 1) + bit("error", 2) + bit("signup", 4)
                + bit("view", 8)
            )
            .cast("long")
            .alias("mask"),
            F.max(F.when(F.col("pr").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("conv"),
        )
    )
    v = exposure.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("conv").cast("double") / F.count(F.lit(1))).alias("rate"),
    )
    coef = spark.createDataFrame(
        [(c, s, s | dict(_SH_CHANNELS)[c], w) for c, s, w in _SH_TERMS],
        "channel string, s_mask long, s_with long, w24 long",
    )
    v0 = v.select(F.col("mask").alias("s_mask"), F.col("rate").alias("r0"))
    v1 = v.select(F.col("mask").alias("s_with"), F.col("rate").alias("r1"))
    terms = (
        coef.join(F.broadcast(v0), "s_mask", "left")
        .join(F.broadcast(v1), "s_with", "left")
        .select(
            "channel",
            F.round(
                F.col("w24")
                * (
                    F.coalesce(F.col("r1"), F.lit(0.0))
                    - F.coalesce(F.col("r0"), F.lit(0.0))
                ),
                12,
            )
            .cast("decimal(28,12)")
            .alias("t"),
        )
    )
    return (
        terms.groupBy("channel")
        .agg(F.round(F.sum("t").cast("double") / 24, 9).alias("shapley"))
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities
# ---------------------------------------------------------------------------

_HITS_ITERS = 4


def _q364_oracle() -> str:
    step = """
    a{i} AS MATERIALIZED (
      SELECT e.s, CAST(sum(CAST(round(h.h, 12) AS DECIMAL(28,12)))
                       AS DOUBLE) AS a
      FROM e JOIN h{prev} h ON e.p = h.p GROUP BY e.s
    ),
    an{i} AS MATERIALIZED (
      SELECT s, a / (SELECT max(a) FROM a{i}) AS a FROM a{i}
    ),
    hh{i} AS MATERIALIZED (
      SELECT e.p, CAST(sum(CAST(round(a.a, 12) AS DECIMAL(28,12)))
                       AS DOUBLE) AS h
      FROM e JOIN an{i} a ON e.s = a.s GROUP BY e.p
    ),
    h{i} AS MATERIALIZED (
      SELECT p, h / (SELECT max(h) FROM hh{i}) AS h FROM hh{i}
    )"""
    its = ",".join(
        step.format(i=i, prev=i - 1 if i > 1 else "0")
        for i in range(1, _HITS_ITERS + 1)
    )
    return f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    h0 AS (SELECT DISTINCT p, 1.0 AS h FROM e),
    {its},
    hubs AS (
      SELECT 'hub' AS side, p AS node, h AS score,
             row_number() OVER (ORDER BY h DESC, p) AS rnk
      FROM h{_HITS_ITERS}
    ),
    auths AS (
      SELECT 'authority' AS side, s AS node, a AS score,
             row_number() OVER (ORDER BY a DESC, s) AS rnk
      FROM an{_HITS_ITERS}
    )
    SELECT side, CAST(rnk AS BIGINT) AS rnk, CAST(node AS BIGINT) AS node,
           round(score, 9) AS score
    FROM (SELECT * FROM hubs WHERE rnk <= 10
          UNION ALL SELECT * FROM auths WHERE rnk <= 10)
    ORDER BY side, rnk
    """


@register("q364_hits_hubs_authorities", oracle=_q364_oracle())
def q364_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (hubs & authorities) over the part->supplier purchase graph:
    4 mutual-reinforcement iterations — authority(s) = sum of hub scores
    of linking parts, hub(p) = sum of authority scores of its suppliers,
    max-normalized per half-step — PageRank's (q100) bipartite sibling,
    ranking 'versatile parts' and 'authoritative suppliers' jointly.
    Every edge-sum is round(12)-pinned DECIMAL (order-free); the
    normalizing max and each ratio are the same IEEE ops on both
    engines. Per iteration: two edge-list joins + two aggs, shuffles
    sized to the edge count (the q100 discipline); top-10 per side via
    ranked windows."""
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    P12 = lambda c: F.round(c, 12).cast("decimal(28,12)")
    h = e.select("p").distinct().select("p", F.lit(1.0).alias("h"))
    a = None
    # The score vectors are node-sized (|parts| + |suppliers|), orders of
    # magnitude below the edge list — broadcast them so the edge list is
    # never shuffled; each half-step is scan-cached-edges + broadcast hash
    # join + one partial-aggregated shuffle of node-sized sums. Lineage
    # truncates at every half-step via the lazy checkpoint on the
    # normalized frame.
    # r6: the max-normalizer is a WINDOW over the raw half-step aggregate,
    # not a separate agg + crossJoin(broadcast) — the raw agg then has ONE
    # consumer, so the checkpoint moves to the normalized frame and each
    # half-step materializes once (the old shape paid a broadcast sub-job
    # for the max plus a second scan of the raw agg per half-step). The
    # single-partition window is over the NODE-sized score vector — the
    # same memory class as broadcasting it, which the next join does
    # anyway. Arithmetic unchanged: same IEEE division by the same max.
    w_all = W.partitionBy()
    for _ in range(_HITS_ITERS):
        a = (
            e.join(F.broadcast(h), "p")
            .groupBy("s")
            .agg(F.sum(P12(F.col("h"))).cast("double").alias("a_raw"))
            .select("s", (F.col("a_raw") / F.max("a_raw").over(w_all)).alias("a"))
            .localCheckpoint(eager=False)
        )
        h = (
            e.join(F.broadcast(a), "s")
            .groupBy("p")
            .agg(F.sum(P12(F.col("a"))).cast("double").alias("h_raw"))
            .select("p", (F.col("h_raw") / F.max("h_raw").over(w_all)).alias("h"))
            .localCheckpoint(eager=False)
        )
    hubs = h.select(
        F.lit("hub").alias("side"),
        F.col("p").alias("node"),
        F.col("h").alias("score"),
        F.row_number().over(W.orderBy(F.desc("h"), "p")).cast("long").alias("rnk"),
    )
    auths = a.select(
        F.lit("authority").alias("side"),
        F.col("s").alias("node"),
        F.col("a").alias("score"),
        F.row_number().over(W.orderBy(F.desc("a"), "s")).cast("long").alias("rnk"),
    )
    return (
        hubs.filter(F.col("rnk") <= 10)
        .unionByName(auths.filter(F.col("rnk") <= 10))
        .select("side", "rnk", F.col("node").cast("long").alias("node"),
                F.round("score", 9).alias("score"))
        .orderBy("side", "rnk")
    )


# ---------------------------------------------------------------------------
# IPTW causal estimate, feature-hashing collision audit
# ---------------------------------------------------------------------------


@register(
    "q365_iptw_ate",
    oracle="""
    WITH units AS (
      SELECT o_custkey AS cust,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS treated,
             CAST(substr(o_orderpriority, 3, 1) AS VARCHAR) AS dummy,
             o_orderstatus AS stratum,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
      FROM orders
    ),
    strata AS (
      SELECT stratum, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(treated) AS BIGINT) AS nt
      FROM units GROUP BY stratum
    ),
    weighted AS (
      SELECT u.treated, u.stratum, u.y,
             CASE WHEN u.treated = 1
                  THEN 1.0 / (CAST(s.nt AS DOUBLE) / s.n)
                  ELSE 1.0 / (1 - CAST(s.nt AS DOUBLE) / s.n) END AS w
      FROM units u JOIN strata s ON u.stratum = s.stratum
    ),
    sums AS (
      SELECT treated,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(w, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sw,
             CAST(sum(CAST(round(w * y, 6) AS DECIMAL(28,6))) AS DOUBLE)
               AS swy
      FROM weighted GROUP BY treated
    )
    SELECT t.n AS n_treated, c.n AS n_control,
           round(t.swy / t.sw / 100, 6) AS mean_treated,
           round(c.swy / c.sw / 100, 6) AS mean_control,
           round((t.swy / t.sw - c.swy / c.sw) / 100, 6) AS ate
    FROM sums t, sums c WHERE t.treated = 1 AND c.treated = 0
    """,
)
def q365_iptw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect: 'treatment'
    = urgent/high priority, outcome = order value, propensity estimated
    per stratum (order status) as the exact treated share, units
    weighted 1/p (treated) or 1/(1-p) (control), ATE = weighted-mean
    difference — the observational-causal workhorse that completes the
    panel beside DiD (q323), CUPED (q313) and Mantel-Haenszel (q318).
    Propensities are single divisions over exact counts; weights and
    weighted outcomes are round-pinned DECIMAL sums; the ATE is one
    shared IEEE chain. One stratum agg + one broadcast join + one
    2-group reduce."""
    o = _t(spark, sf_dir, "orders")
    units = o.select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("treated"),
        F.col("o_orderstatus").alias("stratum"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    strata = units.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n"), F.sum("treated").cast("long").alias("nt")
    )
    p = F.col("nt").cast("double") / F.col("n")
    weighted = units.join(F.broadcast(strata), "stratum").select(
        "treated",
        "y",
        F.when(F.col("treated") == 1, 1.0 / p).otherwise(1.0 / (1 - p)).alias("w"),
    )
    sums = weighted.groupBy("treated").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("w"), 9).cast("decimal(28,9)"))
        .cast("double")
        .alias("sw"),
        F.sum(F.round(F.col("w") * F.col("y"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("swy"),
    )
    t = sums.filter(F.col("treated") == 1).select(
        F.col("n").alias("n_treated"),
        F.col("sw").alias("tsw"),
        F.col("swy").alias("tswy"),
    )
    c = sums.filter(F.col("treated") == 0).select(
        F.col("n").alias("n_control"),
        F.col("sw").alias("csw"),
        F.col("swy").alias("cswy"),
    )
    mt = F.col("tswy") / F.col("tsw")
    mc = F.col("cswy") / F.col("csw")
    return t.crossJoin(F.broadcast(c)).select(
        "n_treated",
        "n_control",
        F.round(mt / 100, 6).alias("mean_treated"),
        F.round(mc / 100, 6).alias("mean_control"),
        F.round((mt - mc) / 100, 6).alias("ate"),
    )


@register(
    "q366_feature_hash_collisions",
    oracle="""
    WITH feats AS (
      SELECT DISTINCT unnest(string_split_regex(trim(text), '\\s+')) AS f
      FROM documents WHERE trim(text) <> ''
    ),
    hashed AS (
      SELECT f, ('0x' || substr(md5(f), 1, 15))::BIGINT AS h FROM feats
    ),
    dims AS (SELECT unnest([1024, 4096, 16384]) AS dim),
    bucketed AS (
      SELECT d.dim, h.h % d.dim AS bucket
      FROM hashed h CROSS JOIN dims d
    ),
    stats AS (
      SELECT dim,
             CAST(count(*) AS BIGINT) AS n_features,
             CAST(count(DISTINCT bucket) AS BIGINT) AS n_buckets_used,
             CAST(max(cnt) AS BIGINT) AS max_bucket_load
      FROM (SELECT dim, bucket, count(*) AS cnt FROM bucketed
            GROUP BY dim, bucket)
      GROUP BY dim
    )
    SELECT dim, n_features, n_buckets_used,
           CAST(n_features - n_buckets_used AS BIGINT) AS n_collided,
           round(CAST(n_features - n_buckets_used AS DOUBLE) / n_features, 9)
             AS collision_rate,
           max_bucket_load
    FROM stats ORDER BY dim
    """,
)
def q366_feature_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing (hashing-trick) collision audit: the corpus's
    distinct token features hashed into 2^10 / 2^12 / 2^14 buckets with
    the portable md5-60bit hash, reporting collided-feature counts,
    collision rate, and the hottest bucket — the dimension-sizing
    decision every hashed feature pipeline makes before training (the
    sketch-QA sibling of q281's bloom FPR and q284's HLL error curve,
    for the FEATURE side). Exact distinct counts; one division. One
    distinct agg + a 3x-exploded bucket rollup."""
    from .operators.sketches import md5_hash60

    d = _t(spark, sf_dir, "documents")
    feats = (
        d.filter(F.trim(F.col("text")) != "")
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("f"))
        .distinct()
    )
    hashed = feats.select(md5_hash60(F.col("f")).alias("h"))
    bucketed = hashed.select(
        F.explode(F.array(F.lit(1024), F.lit(4096), F.lit(16384))).alias("dim"),
        "h",
    ).select("dim", (F.col("h") % F.col("dim")).alias("bucket"))
    loads = bucketed.groupBy("dim", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    stats = loads.groupBy("dim").agg(
        F.sum("cnt").cast("long").alias("n_features"),
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.max("cnt").cast("long").alias("max_bucket_load"),
    )
    collided = (F.col("n_features") - F.col("n_buckets_used")).cast("long")
    return stats.select(
        "dim",
        "n_features",
        "n_buckets_used",
        collided.alias("n_collided"),
        F.round(collided.cast("double") / F.col("n_features"), 9).alias(
            "collision_rate"
        ),
        "max_bucket_load",
    ).orderBy("dim")


# ---------------------------------------------------------------------------
# Supply-chain planning, behavioral predictability, count-data QA
# ---------------------------------------------------------------------------


@register(
    "q367_safety_stock_reorder",
    oracle="""
    WITH daily AS (
      SELECT l_partkey AS part, date_trunc('day', l_shipdate) AS d,
             CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY part, d
    ),
    stats AS (
      SELECT part, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(q) AS BIGINT) AS s,
             CAST(sum(q * q) AS BIGINT) AS ss
      FROM daily GROUP BY part HAVING count(*) >= 30
    )
    SELECT part, n_days,
           round(CAST(s AS DOUBLE) / n_days, 6) AS mean_daily,
           round(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days)
                      / (n_days - 1)), 6) AS sd_daily,
           round(1.6449 * sqrt((CAST(ss AS DOUBLE)
                                - CAST(s AS DOUBLE) * s / n_days)
                               / (n_days - 1)) * sqrt(7.0), 6)
             AS safety_stock,
           round(CAST(s AS DOUBLE) / n_days * 7
                 + 1.6449 * sqrt((CAST(ss AS DOUBLE)
                                  - CAST(s AS DOUBLE) * s / n_days)
                                 / (n_days - 1)) * sqrt(7.0), 6)
             AS reorder_point
    FROM stats ORDER BY reorder_point DESC, part LIMIT 50
    """,
)
def q367_safety_stock_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety stock + reorder point per part: daily-demand mean and
    sample SD from exact integer moments, safety stock = z * sd *
    sqrt(lead time) at a 95% service level (z = 1.6449 as a LITERAL —
    no distribution functions), ROP = lead-time demand + safety stock —
    the inventory-planning formula behind every replenishment system
    (q174 allocates FIFO lots; this decides how much buffer to hold).
    One daily agg + one per-part moment agg; top-50 via
    TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.date_trunc("day", "l_shipdate").alias("d"),
    ).agg(F.sum(F.floor("l_quantity").cast("long")).cast("long").alias("q"))
    stats = (
        daily.groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("q").cast("long").alias("s"),
            F.sum(F.col("q") * F.col("q")).cast("long").alias("ss"),
        )
        .filter(F.col("n_days") >= 30)
    )
    mean = F.col("s").cast("double") / F.col("n_days")
    sd = F.sqrt(
        (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n_days"))
        / (F.col("n_days") - 1)
    )
    ss_stock = 1.6449 * sd * F.sqrt(F.lit(7.0))
    return (
        stats.select(
            "part",
            "n_days",
            F.round(mean, 6).alias("mean_daily"),
            F.round(sd, 6).alias("sd_daily"),
            F.round(ss_stock, 6).alias("safety_stock"),
            F.round(mean * 7 + ss_stock, 6).alias("reorder_point"),
        )
        .orderBy(F.desc("reorder_point"), "part")
        .limit(50)
    )


@register(
    "q368_markov_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS s,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS t
      FROM events
    ),
    trans AS (
      SELECT s, t, CAST(count(*) AS BIGINT) AS n FROM seq
      WHERE t IS NOT NULL GROUP BY s, t
    ),
    marg AS (SELECT s, CAST(sum(n) AS BIGINT) AS ns FROM trans GROUP BY s),
    tot AS (SELECT CAST(sum(ns) AS BIGINT) AS nn FROM marg),
    terms AS (
      SELECT t1.s,
             CAST(round(
               (CAST(m.ns AS DOUBLE) / g.nn)
               * (CAST(t1.n AS DOUBLE) / m.ns)
               * ln(CAST(t1.n AS DOUBLE) / m.ns), 12)
             AS DECIMAL(28,12)) AS term
      FROM trans t1 JOIN marg m ON t1.s = m.s CROSS JOIN tot g
    )
    SELECT CAST(count(*) AS BIGINT) AS n_transitions_kinds,
           round(-CAST(sum(term) AS DOUBLE), 9) AS entropy_rate_nats,
           round(-CAST(sum(term) AS DOUBLE) / ln(5.0), 9)
             AS normalized_entropy
    FROM terms
    """,
)
def q368_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the first-order behavior chain: H = -Sum_s pi(s)
    Sum_t p(s,t) ln p(s,t) with the empirical source distribution as
    pi — 'how predictable is the next user action', the sequence-
    predictability score that q143's raw transition matrix feeds
    (normalized by ln(k) to [0,1]). All probabilities are single
    divisions over exact BIGINT counts; each pi*p*ln(p) term is
    round(12)-pinned DECIMAL so the 25-term reduction is order-free.
    One lead window + one pair agg."""
    ev = _t(spark, sf_dir, "events")
    wq = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("s"),
        F.lead("event_type").over(wq).alias("t"),
    ).filter(F.col("t").isNotNull())
    trans = seq.groupBy("s", "t").agg(F.count(F.lit(1)).alias("n"))
    marg = trans.groupBy("s").agg(F.sum("n").cast("long").alias("ns"))
    tot = marg.agg(F.sum("ns").cast("long").alias("nn"))
    p = F.col("n").cast("double") / F.col("ns")
    pi = F.col("ns").cast("double") / F.col("nn")
    terms = (
        trans.join(F.broadcast(marg), "s")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(pi * p * F.log(p), 12).cast("decimal(28,12)").alias("term")
        )
    )
    import math

    return terms.agg(
        F.count(F.lit(1)).alias("n_transitions_kinds"),
        F.round(-F.sum("term").cast("double"), 9).alias("entropy_rate_nats"),
        F.round(-F.sum("term").cast("double") / math.log(5.0), 9).alias(
            "normalized_entropy"
        ),
    )


@register(
    "q369_overdispersion_test",
    oracle="""
    WITH counts AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY event_type, user_id
    ),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS ss
      FROM counts GROUP BY event_type
    )
    SELECT event_type, k AS n_users,
           round(CAST(s AS DOUBLE) / k, 9) AS mean_count,
           round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / k)
                 / (k - 1), 9) AS var_count,
           round(((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / k) / (k - 1))
                 / (CAST(s AS DOUBLE) / k), 9) AS dispersion_index,
           round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / k)
                 / (CAST(s AS DOUBLE) / k), 6) AS poisson_chi2
    FROM g ORDER BY event_type
    """,
)
def q369_overdispersion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion test on per-user event counts: variance/
    mean dispersion index per event type plus the chi-square dispersion
    statistic Sum((x-xbar)^2)/xbar ~ chi2(k-1) — the count-data QA gate
    that decides Poisson vs negative-binomial modeling (and flags bot-
    like burst users when the index explodes). All moments exact BIGINT;
    the statistics are one shared IEEE chain. Two stacked aggs."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("x")
    )
    g = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("k")
    css = F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("k")
    var = css / (F.col("k") - 1)
    return g.select(
        "event_type",
        F.col("k").alias("n_users"),
        F.round(mean, 9).alias("mean_count"),
        F.round(var, 9).alias("var_count"),
        F.round(var / mean, 9).alias("dispersion_index"),
        F.round(css / mean, 6).alias("poisson_chi2"),
    ).orderBy("event_type")


@register(
    "q370_var_cvar",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS tot
      FROM events GROUP BY event_type, d
    ),
    deltas AS (
      SELECT event_type,
             tot - lag(tot) OVER (PARTITION BY event_type ORDER BY d)
               AS delta
      FROM daily
    ),
    losses AS (
      SELECT event_type, CAST(-delta AS BIGINT) AS loss
      FROM deltas WHERE delta IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, loss,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY loss, event_type) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM losses
    ),
    var95 AS (
      SELECT event_type, loss AS var_cents, n
      FROM ranked WHERE rn = CAST(ceil(0.95 * n) AS BIGINT)
    ),
    tail AS (
      SELECT l.event_type,
             CAST(count(*) AS BIGINT) AS n_tail,
             CAST(sum(l.loss) AS BIGINT) AS tail_sum
      FROM losses l JOIN var95 v ON l.event_type = v.event_type
      WHERE l.loss >= v.var_cents
      GROUP BY l.event_type
    )
    SELECT v.event_type, CAST(v.n AS BIGINT) AS n_days,
           round(CAST(v.var_cents AS DOUBLE) / 100, 6) AS var95,
           t.n_tail,
           round(CAST(t.tail_sum AS DOUBLE) / t.n_tail / 100, 6) AS cvar95
    FROM var95 v JOIN tail t ON v.event_type = t.event_type
    ORDER BY v.event_type
    """,
)
def q370_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-risk and expected shortfall (CVaR) of day-over-day
    drops in daily event value per type: losses = negative daily
    deltas, VaR95 = the exact 95th-percentile order statistic, CVaR95 =
    the exact tail mean at-or-beyond it — the risk pair that max
    drawdown (q328) complements (drawdown is path-dependent; VaR/CVaR
    are distributional). Deltas are exact integer cents; the quantile
    is a deterministic order statistic (never an interpolated
    percentile, whose engine conventions differ); the tail mean is one
    division. One daily agg + one lag window + one rank window."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("tot")
    )
    wd = W.partitionBy("event_type").orderBy("d")
    losses = (
        daily.select(
            "event_type",
            (F.col("tot") - F.lag("tot").over(wd)).alias("delta"),
        )
        .filter(F.col("delta").isNotNull())
        .select("event_type", (-F.col("delta")).cast("long").alias("loss"))
    )
    wr = W.partitionBy("event_type").orderBy("loss", "event_type")
    ranked = losses.select(
        "event_type",
        "loss",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n"),
    )
    var95 = ranked.filter(
        F.col("rn") == F.ceil(0.95 * F.col("n")).cast("long")
    ).select("event_type", F.col("loss").alias("var_cents"), "n")
    tail = (
        losses.join(F.broadcast(var95), "event_type")
        .filter(F.col("loss") >= F.col("var_cents"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_tail"),
            F.sum("loss").cast("long").alias("tail_sum"),
        )
    )
    return (
        var95.join(tail, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.round(F.col("var_cents").cast("double") / 100, 6).alias("var95"),
            "n_tail",
            F.round(
                F.col("tail_sum").cast("double") / F.col("n_tail") / 100, 6
            ).alias("cvar95"),
        )
        .orderBy("event_type")
    )
