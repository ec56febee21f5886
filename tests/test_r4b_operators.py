"""Round-4 continuation operator tests: Misra-Gries heavy hitters, Pareto
frontier, BPE pair merging, quantile normalization, inverted index, and
interval coalescing — semantics that the sf-fixture oracles can't stress
(adversarial skew, dominance ties, overlapping merges, the lag-vs-running-max
trap)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sqlserver2pgsql_spark.operators.curation import quantile_normalize
from sqlserver2pgsql_spark.operators.sketches import (
    exact_heavy_hitters,
    misra_gries_candidates,
)
from sqlserver2pgsql_spark.operators.skyline import pareto_frontier
from sqlserver2pgsql_spark.operators.text import (
    adjacent_pair_counts,
    bpe_apply_top_merge,
    inverted_index,
    unwrap_tokens,
    wrap_tokens,
)

# --- heavy hitters ----------------------------------------------------------


def _zipf_stream(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    # heavy head: item 'h0' ~ 30%, 'h1' ~ 15%, long uniform tail
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.30:
            out.append("h0")
        elif r < 0.45:
            out.append("h1")
        else:
            out.append(f"t{rng.randrange(500)}")
    return out


def test_misra_gries_candidates_superset_under_adversarial_partitioning(spark):
    """Every item with global count > n/(capacity+1) must survive the sketch
    pass regardless of how rows land in partitions — including sorted order,
    which maximizes per-partition eviction pressure on the head items."""
    vals = sorted(_zipf_stream(4000))  # sorted = clustered = worst case
    df = spark.createDataFrame([(v,) for v in vals], "v string").repartition(8)
    capacity = 20
    cands = {r.v for r in misra_gries_candidates(df, "v", capacity).collect()}
    from collections import Counter

    counts = Counter(vals)
    for item, c in counts.items():
        if c > len(vals) / (capacity + 1):
            assert item in cands, f"{item} (count {c}) evicted from summary"


def test_exact_heavy_hitters_matches_bruteforce(spark):
    vals = _zipf_stream(3000, seed=11)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    k = 8
    got = {(r.v, r.cnt) for r in exact_heavy_hitters(df, "v", k).collect()}
    from collections import Counter

    counts = Counter(vals)
    want = {(i, c) for i, c in counts.items() if c * k > len(vals)}
    assert got == want
    for _, cnt, n_total in [tuple(r) for r in exact_heavy_hitters(df, "v", k).collect()]:
        assert cnt * k > n_total


# --- skyline ----------------------------------------------------------------


def _brute_skyline(pts):
    out = []
    for p in pts:
        dominated = any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in pts
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_pareto_frontier_matches_bruteforce_with_ties(spark):
    rng = random.Random(3)
    pts = [(i, rng.randrange(50), rng.randrange(50)) for i in range(300)]
    # inject exact duplicates — neither dominates the other, both survive
    pts += [(300, pts[0][1], pts[0][2]), (301, 7, 7), (302, 7, 7)]
    df = spark.createDataFrame(pts, "id long, price long, size long")
    got = sorted(
        (r.id, r.price, r.size)
        for r in pareto_frontier(df, "price", "size", "id").collect()
    )
    assert got == _brute_skyline(pts)


# --- BPE merge --------------------------------------------------------------


def test_wrap_unwrap_roundtrip(spark):
    df = spark.createDataFrame([(["a", "bc", "d"],), (["x"],)], "tok array<string>")
    out = df.select(unwrap_tokens(wrap_tokens(F.col("tok"))).alias("t")).collect()
    assert [r.t for r in out] == [["a", "bc", "d"], ["x"]]


def test_bpe_merge_is_greedy_left_to_right(spark):
    """'a a a' with top pair (a,a) merges the FIRST two only; consecutive
    non-overlapping occurrences all merge ('a b a b' → 'a~b a~b')."""
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],), (["c"],)],
        "tok array<string>",
    )
    counts = adjacent_pair_counts(df, "tok")
    # (a,b)=2, (a,a)=2, (b,a)=1 → tie between (a,a) and (a,b): lexicographic → (a,a)
    merged = bpe_apply_top_merge(df, "tok", counts)
    got = sorted(tuple(r.tok) for r in merged.collect())
    assert got == sorted(
        [("a~a", "a"), ("a", "b", "a", "b"), ("c",)]
    )


def test_bpe_merge_does_not_match_token_suffixes(spark):
    """Pair (a,b) must not fire inside tokens 'xa' or 'bx'."""
    df = spark.createDataFrame(
        [(["a", "b"],), (["xa", "b"],), (["a", "bx"],)], "tok array<string>"
    )
    pair = spark.createDataFrame([("a", "b", 99)], "left string, right string, cnt long")
    merged = bpe_apply_top_merge(df, "tok", pair)
    got = sorted(tuple(r.tok) for r in merged.collect())
    assert got == sorted([("a~b",), ("xa", "b"), ("a", "bx")])


# --- quantile normalization -------------------------------------------------


def test_quantile_normalize_single_group_is_identity(spark):
    df = spark.createDataFrame(
        [(i, "s", v) for i, v in enumerate([5, 1, 9, 3, 7])],
        "id long, g string, v long",
    )
    out = quantile_normalize(df, "g", "v", "id")
    assert all(r.normalized == r.v for r in out.collect())


def test_quantile_normalize_maps_group_extremes_to_global_extremes(spark):
    # two groups with disjoint ranges: each group's max maps to the global max
    rows = [(i, "lo", i) for i in range(10)] + [(100 + i, "hi", 1000 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = {(r.g, r.v): r.normalized for r in quantile_normalize(df, "g", "v", "id").collect()}
    assert out[("lo", 9)] == 1009  # group rank 10/10 → global rank 20 → max
    assert out[("hi", 1009)] == 1009


# --- inverted index ---------------------------------------------------------


def test_inverted_index_caps_postings_but_counts_full_df(spark):
    rows = [(i, "common unique%d" % i) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.term: r for r in inverted_index(df, postings_cap=5, min_df=2).collect()}
    assert set(out) == {"common"}  # unique terms fall below min_df
    assert out["common"].df == 30
    assert out["common"].postings == "0,1,2,3,4"


def test_inverted_index_postings_are_numeric_order(spark):
    df = spark.createDataFrame(
        [(2, "w"), (100, "w"), (11, "w")], "doc_id long, text string"
    )
    out = inverted_index(df, postings_cap=20, min_df=2).collect()
    assert out[0].postings == "2,11,100"  # not the string sort 100,11,2


# --- interval coalescing ----------------------------------------------------


def test_interval_islands_use_running_max_not_lag(spark):
    """One long interval [0,100] swallows [10,20] and [30,40]; a lag(end)
    implementation would wrongly split at s=30 (30 > 20). Exercises the q144
    island logic directly on crafted rows."""
    from pyspark.sql import Window as W

    iv = spark.createDataFrame(
        [(1, 1, 0, 100), (1, 2, 10, 20), (1, 3, 30, 40), (1, 4, 150, 160)],
        "user_id long, event_id long, s long, e long",
    )
    wprev = (
        W.partitionBy("user_id").orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wrun = (
        W.partitionBy("user_id").orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    isl = (
        iv.withColumn(
            "ni", F.when(F.col("s") > F.max("e").over(wprev), 1).otherwise(0)
        )
        .withColumn("island", F.sum("ni").over(wrun))
        .groupBy("island")
        .count()
        .orderBy("island")
        .collect()
    )
    assert [(r.island, r["count"]) for r in isl] == [(0, 3), (1, 1)]


# --- triangle counting (q148's oriented counter) ----------------------------


def _oriented_triangles(spark, edges):
    """Run q148's degree-ordered orientation + wedge closure on an explicit
    edge list (u < v)."""
    e = spark.createDataFrame(edges, "u long, v long")
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        e.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            F.when(
                F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v")),
                F.struct(F.col("u").alias("x"), F.col("v").alias("y")),
            )
            .otherwise(F.struct(F.col("v").alias("x"), F.col("u").alias("y")))
            .alias("o")
        )
        .select("o.x", "o.y")
    )
    nbrs = ed.groupBy("x").agg(F.array_sort(F.collect_list("y")).alias("ys"))
    ys = F.col("ys")
    wedge = nbrs.select(
        F.explode(
            F.flatten(
                F.transform(
                    ys,
                    lambda a, i: F.transform(
                        F.slice(ys, i + 2, F.size(ys)),
                        lambda b: F.struct(
                            F.least(a, b).alias("u"), F.greatest(a, b).alias("v")
                        ),
                    ),
                )
            )
        ).alias("w")
    ).select("w.u", "w.v")
    return wedge.join(e, ["u", "v"], "left_semi").count()


def _brute_triangles(edges):
    es = set(map(tuple, edges))
    nodes = sorted({x for e in edges for x in e})
    t = 0
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in es:
                continue
            for c in nodes[nodes.index(b) + 1:]:
                if (a, c) in es and (b, c) in es:
                    t += 1
    return t


def test_oriented_triangle_count_matches_bruteforce(spark):
    # K5 (10 triangles), a hub star (0 triangles), a random graph
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    assert _oriented_triangles(spark, k5) == 10 == _brute_triangles(k5)
    star = [(0, i) for i in range(1, 8)]
    assert _oriented_triangles(spark, star) == 0
    rng = random.Random(5)
    rnd = sorted({tuple(sorted(rng.sample(range(12), 2))) for _ in range(40)})
    rnd = [(a, b) for a, b in rnd]
    assert _oriented_triangles(spark, rnd) == _brute_triangles(rnd)


# --- winsorization ----------------------------------------------------------


def test_winsorize_fences_clamp_exact_ranks(spark, duck):
    """q145 on the fixture: fences must be actual data values at ceil(p·n)
    rank, and the winsorized mean must lie within [p05, p95]."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    rows = entrymod.queries()["q145_winsorized_stats"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.p05_cents <= r.p95_cents
        assert r.p05_cents / 100.0 <= r.winsorized_mean <= r.p95_cents / 100.0
        # ~5% of each tail clamps on a continuous-ish price distribution
        assert r.n_clamped_low > 0 and r.n_clamped_high > 0


# --- Kaplan-Meier / Welch / IVM / seasonal (q149-q152 semantics) ------------


def test_kaplan_meier_hand_computed(spark):
    """5 subjects: deaths at day 1 (n=5) and day 3 (n=3), censors at day 2
    and day 4, last subject dies at day 5 exhausting the risk set →
    S(1)=0.8, S(3)=0.8*2/3, S(5)=0 (absorbing zero, no ln(0))."""
    from pyspark.sql import Window as W

    subj = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1)], "t_days long, ev int"
    )
    byday = subj.groupBy("t_days").agg(
        F.sum("ev").alias("d"), F.sum(1 - F.col("ev")).alias("c")
    )
    wprev = W.orderBy("t_days").rowsBetween(W.unboundedPreceding, -1)
    wrun = W.orderBy("t_days").rowsBetween(W.unboundedPreceding, W.currentRow)
    risk = byday.select(
        "t_days", "d", "c",
        (F.lit(5) - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0))).alias("n_risk"),
    )
    step = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.log((F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    dead = F.max(F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)).over(wrun)
    out = {
        r.t_days: r.survival
        for r in risk.select(
            "t_days",
            F.when(dead == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.sum(step).over(wrun)), 9))
            .alias("survival"),
        ).collect()
    }
    assert out[1] == 0.8
    assert abs(out[2] - 0.8) < 1e-12          # censoring alone never drops S
    assert abs(out[3] - 0.8 * 2 / 3) < 1e-9
    assert out[5] == 0.0                       # risk set exhausted


def test_welch_tstat_matches_numpy(spark):
    import numpy as np

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR
    import duckdb

    rows = entrymod.queries()["q152_welch_ttest"](spark, SF_DIR).collect()
    con = duckdb.connect()
    for r in rows:
        a, b = con.execute(
            f"""SELECT list(CASE WHEN dow NOT IN (0,6) THEN cents END),
                       list(CASE WHEN dow IN (0,6) THEN cents END)
                FROM (SELECT CAST(strftime(ts,'%w') AS INTEGER) dow,
                             floor(value*100+0.5) cents
                      FROM '{SF_DIR}/events.parquet'
                      WHERE event_type = '{r.event_type}')"""
        ).fetchone()
        a = np.array([x for x in a if x is not None], dtype=float)
        b = np.array([x for x in b if x is not None], dtype=float)
        t = (a.mean() - b.mean()) / np.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        assert abs(r.t_stat - t) < 1e-4, (r.event_type, r.t_stat, t)


def test_ivm_split_is_a_partition(spark):
    """q151's base/delta splits must partition both tables — every row in
    exactly one side — or the maintained view silently over/under-counts."""
    from tests.conftest import SF_DIR

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = o.count()
    nb = o.filter(F.col("o_orderkey") % 10 != 0).count()
    nd = o.filter(F.col("o_orderkey") % 10 == 0).count()
    assert nb + nd == n and nd > 0


def test_seasonal_constant_series_has_zero_index(spark):
    """A flat hourly series must decompose to seasonal ≡ 0 for every
    hour-of-day (24·y − Σwindow = 0 when all y equal)."""
    from pyspark.sql import Window as W

    rows = [("a", i, 100) for i in range(96)]  # 4 days, constant
    df = spark.createDataFrame(rows, "t string, hr int, y long")
    w = W.partitionBy("t").orderBy("hr").rowsBetween(-12, 11)
    ma = df.select(
        "t", (F.col("hr") % 24).alias("hod"), "y",
        F.sum("y").over(w).alias("num"), F.count(F.lit(1)).over(w).alias("cnt"),
    ).filter(F.col("cnt") == 24)
    out = ma.select((24 * F.col("y") - F.col("num")).alias("d24")).agg(
        F.min("d24"), F.max("d24")
    ).first()
    assert tuple(out) == (0, 0)


# --- CUSUM / KS / bootstrap (q154-q156 semantics) ---------------------------


def test_cusum_prefix_form_equals_sequential_recurrence(spark):
    """q155's windowed form P_t - min(P_s, s<=t) must equal the textbook
    sequential recurrence C_t = max(0, C_{t-1} + d_t) on arbitrary series."""
    from pyspark.sql import Window as W

    rng = random.Random(11)
    series = [rng.randrange(-50, 51) for _ in range(200)]
    # sequential reference
    c, seq = 0, []
    for d in series:
        c = max(0, c + d)
        seq.append(c)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(series)], "t long, d long"
    )
    wrun = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    p = F.sum("d").over(wrun)
    got = [
        r.cpos
        for r in df.select(
            "t", (p - F.least(F.lit(0), F.min(p).over(wrun))).alias("cpos")
        ).orderBy("t").collect()
    ]
    # C_t = P_t - min(P_0..P_t) with P_0 = 0 — the least(0, ·) term IS the
    # empty-prefix baseline the pure windowed min misses
    assert got == seq


def test_ks_statistic_matches_python_ecdf(spark):
    rng = random.Random(4)
    a = [rng.randrange(100) for _ in range(300)]
    b = [rng.randrange(20, 120) for _ in range(200)]
    rows = [("g", 0, v) for v in a] + [("g", 1, v) for v in b]
    df = spark.createDataFrame(rows, "g string, we int, cents long")
    from pyspark.sql import Window as W

    c = df.groupBy("g", "cents").agg(
        F.sum(1 - F.col("we")).alias("n1c"), F.sum("we").alias("n2c")
    )
    wrun = W.partitionBy("g").orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy("g")
    r = c.select(
        F.sum("n1c").over(wrun).alias("i"), F.sum("n2c").over(wrun).alias("j"),
        F.sum("n1c").over(wall).alias("n1"), F.sum("n2c").over(wall).alias("n2"),
    )
    row = r.agg(
        F.max(F.abs(F.col("i") * F.col("n2") - F.col("j") * F.col("n1"))).alias("dnum"),
        F.max("n1").alias("n1"), F.max("n2").alias("n2"),
    ).first()
    got = row.dnum / (row.n1 * row.n2)
    # brute-force sup |F1 - F2| over all thresholds
    want = max(
        abs(sum(1 for x in a if x <= t) / len(a) - sum(1 for x in b if x <= t) / len(b))
        for t in set(a) | set(b)
    )
    assert abs(got - want) < 1e-12


def test_bootstrap_weights_deterministic_and_poisson_like(spark):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    q = entrymod.queries()["q156_bootstrap_ci"]
    r1, r2 = q(spark, SF_DIR).first(), q(spark, SF_DIR).first()
    assert tuple(r1) == tuple(r2)  # hash-driven resampling: re-run identical
    assert r1.ci_lo_cents <= r1.mean_cents <= r1.ci_hi_cents
