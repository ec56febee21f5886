"""Round-4 query surface: sync-engine history ops (SCD2, CDC apply),
corpus statistics (PMI collocations, histograms, weighted medians), exact
fixed-point graph ranking, cross-corpus incremental dedup, bloom-filter
decontamination, k-means E-step over embeddings, funnel analysis, and
streaming dedup.

Registered into the same driver-facing registry as queries.py /
queries_llm.py; every query is exact-oracle-gated (determinism notes per
query — the recurring tricks are BIGINT fixed-point for anything iterative
and single-IEEE-division for anything ratio-valued).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .operators import dedup as D
from .operators.bloom import bloom_build, bloom_probe
from .operators.graph import pagerank_fixed_point
from .operators.scd import cdc_apply_latest, scd2_history
from .queries import DEC, _t, register

# ---------------------------------------------------------------------------
# Migration/sync history operators (the reference's incremental-mode domain)
# ---------------------------------------------------------------------------


@register(
    "q97_scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER w AS prev_type,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    versions AS (
      SELECT user_id, ts, event_id, event_type FROM ordered
      WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER w2 AS valid_to,
           lead(ts) OVER w2 IS NULL AS is_current
    FROM versions
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from, event_type
    """,
)
def q97_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from a change log (operators/scd.py):
    per-user event_type becomes a versioned attribute with
    valid_from/valid_to/is_current; consecutive unchanged states collapse.
    Extends the reference's point-in-time diff (sqlserver2pgsql.pl:
    4662-4689) to full history tracking. One window shuffle on the key."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    return scd2_history(
        ev, ["user_id"], "ts", ["event_type"], order_cols=["event_id"]
    ).orderBy("user_id", "valid_from", "event_type")


@register(
    "q98_cdc_apply",
    oracle="""
    WITH log AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'error' THEN 'D'
                  WHEN event_type = 'signup' THEN 'I'
                  ELSE 'U' END AS op
      FROM events
    ),
    latest AS (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM log
    )
    SELECT user_id, ts, event_type, value
    FROM latest WHERE rn = 1 AND op <> 'D'
    ORDER BY user_id
    """,
)
def q98_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC op-log collapse (operators/scd.py:cdc_apply_latest): an I/U/D
    log derived from events is reduced to final state — latest op per key
    wins under the total (ts, event_id) order, trailing deletes drop the
    key. The streaming-free statement of what A10 merge-apply plus a change
    feed computes. One window shuffle, no joins."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    return (
        cdc_apply_latest(ev, ["user_id"], ["ts", "event_id"])
        .select("user_id", "ts", "event_type", "value")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Corpus statistics
# ---------------------------------------------------------------------------


@register(
    "q99_pmi_collocations",
    oracle="""
    WITH toklists AS (
      SELECT string_split_regex(trim(text), '\\s+') AS l FROM documents
    ),
    bigrams AS (
      SELECT l[i] AS w1, l[i + 1] AS w2
      FROM toklists, LATERAL (SELECT unnest(range(1, len(l))) AS i) g
      WHERE len(l) >= 2
    ),
    uni AS (
      SELECT tok, count(*) AS n_tok FROM (
        SELECT unnest(l) AS tok FROM toklists) GROUP BY tok
    ),
    big AS (
      SELECT w1, w2, count(*) AS n_ab FROM bigrams GROUP BY w1, w2
    ),
    total AS (SELECT count(*) AS n_big FROM bigrams)
    SELECT w1, w2, n_ab,
           CAST(n_ab * (SELECT n_big FROM total) AS DOUBLE)
             / (ua.n_tok * ub.n_tok) AS lift
    FROM big JOIN uni ua ON big.w1 = ua.tok
             JOIN uni ub ON big.w2 = ub.tok
    WHERE n_ab >= 5
    ORDER BY lift DESC, w1, w2 LIMIT 100
    """,
)
def q99_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 bigram collocations by PMI lift over the documents corpus.
    PMI = log(lift) is monotone in lift = n_ab·N / (n_a·n_b), so the
    log is dropped: the BIGINT products are exact (< 2^53) and the single
    IEEE division makes the score engine-identical. Plan: one explode into
    bigrams, two hash aggs, two joins against the (small, broadcastable)
    unigram vocabulary, global top-k. At 100 TB the unigram table is the
    only broadcast and the bigram agg is the one big shuffle."""
    docs = _t(spark, sf_dir, "documents").select(
        F.split(F.trim(F.col("text")), r"\s+").alias("l")
    )
    bigrams = (
        docs.filter(F.size("l") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("l") - 1),
                    lambda i: F.struct(
                        F.element_at("l", i).alias("w1"),
                        F.element_at("l", i + 1).alias("w2"),
                    ),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .localCheckpoint(eager=False)
    )
    uni = (
        docs.select(F.explode("l").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    big = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    n_big = bigrams.count()
    ua = uni.select(F.col("tok").alias("w1"), F.col("n_tok").alias("na"))
    ub = uni.select(F.col("tok").alias("w2"), F.col("n_tok").alias("nb"))
    return (
        big.filter(F.col("n_ab") >= 5)
        .join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .select(
            "w1",
            "w2",
            "n_ab",
            ((F.col("n_ab") * F.lit(n_big)).cast("double")
             / (F.col("na") * F.col("nb"))).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Exact fixed-point PageRank
# ---------------------------------------------------------------------------


def _q100_oracle() -> str:
    from .operators.graph import PR_SCALE

    iter_cte = """
    it{i} AS (
      SELECT n.node,
             CAST({tp} + (85 * coalesce(sm.in_sum, 0)) // 100 AS BIGINT)
               AS rank_fp
      FROM nodes n LEFT JOIN (
        SELECT e.d AS node, sum(r.rank_fp // dg.deg) AS in_sum
        FROM e JOIN it{prev} r ON e.s = r.node JOIN deg dg ON e.s = dg.s
        GROUP BY e.d
      ) sm ON n.node = sm.node
    )"""
    # teleport constant mirrors pagerank_fixed_point: (15 * (SCALE // N)) // 100
    tp = f"(15 * ({PR_SCALE} // (SELECT n FROM params))) // 100"
    its = ",".join(
        iter_cte.format(i=i, prev=i - 1 if i > 1 else "0", tp=tp)
        for i in range(1, 4)
    )
    return f"""
    WITH e AS (
      SELECT DISTINCT l_partkey * 2 AS s, l_suppkey * 2 + 1 AS d FROM lineitem
      UNION
      SELECT DISTINCT l_suppkey * 2 + 1 AS s, l_partkey * 2 AS d FROM lineitem
    ),
    nodes AS (SELECT DISTINCT s AS node FROM e UNION SELECT DISTINCT d FROM e),
    params AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT s, count(*) AS deg FROM e GROUP BY s),
    it0 AS (SELECT node, {PR_SCALE} // (SELECT n FROM params) AS rank_fp
            FROM nodes),
    {its}
    SELECT node, rank_fp FROM it3 ORDER BY node
    """


@register("q100_pagerank", oracle=_q100_oracle())
def q100_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-arithmetic PageRank (3 power iterations, d=0.85) over the
    symmetrized part↔supplier co-purchase graph from lineitem. Ranks are
    BIGINT fixed-point (units of 1e-12) so the iteration is bit-identical
    on any engine/partitioning — floating PageRank is summation-order-
    dependent and can never be exact-oracle-gated. Per iteration: one
    edge-list join + one groupBy(dst) sum, both repartitioned to the edge
    count (operators/graph.py:pagerank_fixed_point)."""
    li = _t(spark, sf_dir, "lineitem")
    fwd = li.select(
        (F.col("l_partkey") * 2).alias("src"), (F.col("l_suppkey") * 2 + 1).alias("dst")
    )
    rev = li.select(
        (F.col("l_suppkey") * 2 + 1).alias("src"), (F.col("l_partkey") * 2).alias("dst")
    )
    edges = fwd.unionByName(rev)
    return pagerank_fixed_point(edges, "src", "dst", iterations=3).orderBy("node")


# ---------------------------------------------------------------------------
# Cross-corpus incremental dedup
# ---------------------------------------------------------------------------

_BATCH_SQL = """
    SELECT doc_id + 10000 AS doc_id,
           array_to_string(l[1:len(l)-5], ' ') AS text
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
          FROM documents WHERE doc_id % 5 = 0)
"""


@register(
    "q101_crosscorpus_minhash",
    # exact cross-corpus Jaccard IS the oracle: LSH only generates
    # candidates, every emitted pair is exact-verified at the threshold
    oracle=f"""
    WITH batch AS ({_BATCH_SQL}),
    post_base AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(2, len(string_split_regex(trim(text),'\\s+')) - 1)),
               i -> array_to_string(string_split_regex(trim(text),'\\s+')[i:i+2], ' ')
             ))) AS shingle
      FROM documents
    ),
    post_batch AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(2, len(string_split_regex(trim(text),'\\s+')) - 1)),
               i -> array_to_string(string_split_regex(trim(text),'\\s+')[i:i+2], ' ')
             ))) AS shingle
      FROM batch
    ),
    sz1 AS (SELECT doc_id, count(*) AS n FROM post_base GROUP BY doc_id),
    sz2 AS (SELECT doc_id, count(*) AS n FROM post_batch GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_inter
      FROM post_base a JOIN post_batch b ON a.shingle = b.shingle
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id1, id2,
           CAST(n_inter AS DOUBLE) / CAST(s1.n + s2.n - n_inter AS DOUBLE)
             AS jaccard
    FROM inter JOIN sz1 s1 ON s1.doc_id = id1 JOIN sz2 s2 ON s2.doc_id = id2
    WHERE CAST(n_inter AS DOUBLE) / CAST(s1.n + s2.n - n_inter AS DOUBLE) >= 0.6
    ORDER BY id1, id2
    """,
)
def q101_crosscorpus_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a NEW batch (truncated near-dup docs) joined
    against the EXISTING corpus via cross-corpus MinHash-LSH
    (operators/dedup.py:minhash_join_pairs) — the shape where the corpus is
    100 TB and only the batch is small: the corpus side pays one signature
    pass and is never self-joined."""
    from .operators.text import tokens

    base = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    batch = (
        base.filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.array_join(F.slice(toks, 1, F.size(toks) - 5), " ").alias("text"),
        )
    )
    return D.minhash_join_pairs(
        base, batch, "doc_id", "text", n=3, num_hashes=64, bands=16,
        rows_per_band=4, threshold=0.6,
    ).orderBy("id1", "id2")
