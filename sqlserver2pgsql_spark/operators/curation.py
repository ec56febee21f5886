"""Corpus-curation operators beyond dedup/quality: PII-style redaction,
repetition-based quality signals, per-source stratified caps.

M7 extensions (no reference counterpart — the reference migrates schemas,
not corpora). Like text.py, everything here is pure column expressions or a
rank-limited window: no Python in the hot path, no driver-side collection.

Portability discipline: every regex is RE2-compatible (no lookaround, no
backreferences) so a DuckDB oracle runs the IDENTICAL pattern, and every
ratio is a single IEEE division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .sketches import md5_hash60
from .text import tokens

#: redaction patterns — applied in this order (emails before URLs is safe:
#: the URL pattern anchors on the scheme; markers contain no digits so the
#: digit-run pass cannot re-match them)
REDACT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>", "n_emails"),
    (r"https?://[^\s]+", "<URL>", "n_urls"),
    (r"[0-9]{6,}", "<NUM>", "n_digit_runs"),
)


def redact_text(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Redact emails / URLs / long digit runs with typed markers, counting
    matches per class (counts are taken on the ORIGINAL text, before any
    marker could shadow a later pattern). One projection — Catalyst fuses
    the three count+replace pairs into a single scan pass."""
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).alias(cname)
        for pat, _, cname in REDACT_PATTERNS
    ]
    red: Column = t
    for pat, marker, _ in REDACT_PATTERNS:
        red = F.regexp_replace(red, pat, marker)
    return df.select("*", *counts, red.alias(out_col))


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals: duplicate-token and duplicate-bigram
    ratios (boilerplate and low-quality spam score high on both).

    Array-only computation (tokenize once, no explode, no shuffle); ratios
    are single IEEE divisions guarded to 0.0 for degenerate short docs so
    the column is total."""
    # materialize the token array as a column FIRST: HOF subexpressions are
    # not CSE'd, so referencing tokens(text) in-place would re-split the
    # text inside every element_at of every bigram (observed 8.5s → 0.4s at
    # sf0.1); CollapseProject keeps the split un-inlined because the
    # attribute is referenced many times
    toks_col = "__rep_toks"
    df = df.withColumn(toks_col, tokens(F.col(text_col)))
    toks = F.col(toks_col)
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), n - 1)),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    n_bg = n - 1
    n_uniq_bg = F.size(F.array_distinct(bigrams))
    dup_tok = F.when(
        n > 0, F.lit(1.0) - n_uniq.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    dup_bg = F.when(
        n >= 2, F.lit(1.0) - n_uniq_bg.cast("double") / n_bg.cast("double")
    ).otherwise(F.lit(0.0))
    return df.select(
        "*",
        n.alias("rep_tokens"),
        dup_tok.alias("rep_dup_token_ratio"),
        dup_bg.alias("rep_dup_bigram_ratio"),
    ).drop(toks_col)


def stratified_cap(
    df: DataFrame,
    group_col: str,
    order_col: str,
    cap: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Keep at most ``cap`` rows per group (the per-domain / per-source cap
    every web-scale corpus applies), deterministically: the lowest
    ``order_col`` rows win.

    rank-filter window — Spark compiles ``row_number() <= k`` into
    WindowGroupLimit (partial per-partition top-k BEFORE the shuffle), so a
    heavy-hitter group ships at most ``cap`` rows per input partition
    instead of its full row count; the post-shuffle state per group is
    ≤ cap·#partitions, not group size. No driver-side anything."""
    w = W.partitionBy(group_col).orderBy(order_col)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= cap)
    )


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from the md5-derived 60-bit hash
    of ``col`` — the portable substrate for reproducible sampling (DuckDB
    mirror: ``('0x' || substr(md5(x), 1, 15))::BIGINT % buckets``)."""
    return md5_hash60(col) % buckets


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    pct: Column,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash bucket
    falls below the stratum's percentage (``pct`` is a Column so callers
    express rates as CASE/map lookups over ``strata_col``).

    Pure filter over a hash of the key — no shuffle, no RNG state, and the
    SAME rows are kept on any cluster size or partition layout, which is
    what makes sampled corpora reproducible at 100 TB."""
    return df.withColumn(bucket_col, hash_bucket(F.col(key_col))).filter(
        F.col(bucket_col) < pct
    )


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row to a fixed-budget pack: rows are laid out in
    ``order_col`` order within each group on a running token tape, and a
    row's pack is the budget-chunk its START offset lands in
    (``pack_id = floor((cum - weight) / budget)``).

    The chunked running-sum formulation (vs true first-fit bin packing) is
    deliberately window-expressible: one partitioned running sum, no
    iterative state, exactly reproducible in SQL — the standard
    sequence-packing approximation for pretraining shards. Groups are
    independent → embarrassingly parallel across the cluster; the window
    shuffles once on ``group_col``."""
    w = (
        W.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(F.col(weight_col)).over(w)
    return df.select(
        "*",
        cum.alias("cum_weight"),
        F.floor((cum - F.col(weight_col)) / F.lit(budget)).alias("pack_id"),
    )


def decontamination_hits(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: for every training document that shares at
    least one word-``n``-gram shingle with the benchmark corpus, report how
    many of its distinct shingles are contaminated and the contamination
    ratio.

    Shape for 100 TB: the benchmark shingle set is small by definition
    (eval suites are thousands of docs, not billions) → broadcast it; the
    training postings stream through a broadcast semi-side join and one
    groupBy on the doc id. No benchmark-side shuffle, one training-side
    aggregation shuffle."""
    from .dedup import shingle_postings

    tp = shingle_postings(train, id_col, text_col, n)
    bench_shingles = (
        shingle_postings(benchmark, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    sizes = tp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        tp.join(F.broadcast(bench_shingles), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_hits",
        "n_shingles",
        (F.col("n_hits").cast("double") / F.col("n_shingles").cast("double")).alias(
            "contamination_ratio"
        ),
    )


def token_budget_mix(
    df: DataFrame,
    source_col: str,
    order_cols: list[Column],
    tokens_col: str,
    parts: Column,
    total_parts: int,
    budget: int,
) -> DataFrame:
    """Token-budgeted corpus mixing: each source gets
    ``floor(parts * budget / total_parts)`` tokens of the global budget, and
    docs are admitted per source in ``order_col`` order while their running
    token total fits the allocation.

    Integer allocation arithmetic (parts are integer mixing weights) keeps
    the admission boundary exactly reproducible in SQL. One window shuffle
    on ``source_col``; allocation is a scalar expression, not a join."""
    alloc = F.floor((parts * F.lit(budget)) / F.lit(total_parts)).cast("long")
    w = (
        W.partitionBy(source_col)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    return (
        df.select("*", alloc.alias("alloc"), cum.alias("cum_tokens"))
        .filter(F.col("cum_tokens") <= F.col("alloc"))
    )


def weighted_systematic_sample(
    df: DataFrame,
    group_col: str,
    order_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Per-group weighted systematic sampling: lay rows on a weight tape in
    ``order_col`` order and keep the rows whose tape interval spans a
    multiple of ``W/k`` (W = the group's total weight) — the classic
    inverse-CDF / systematic draw, selection probability ∝ weight. Yields
    ``k`` rows per group when no row outweighs the ``W/k`` spacing (a row
    spanning several boundaries is kept once, so oversized rows — which are
    ALWAYS kept — can only shrink the count below ``k``).

    Everything is BIGINT arithmetic (``weight_col`` must be integral):
    a row is kept iff ``(cum*k) div W > ((cum-w)*k) div W``, so the draw is
    bit-reproducible in any engine — no RNG, no floats. Scale shape: one
    window shuffle on ``group_col`` (groups are independent strata); for an
    ungrouped global sample at 100 TB, pre-stratify first — a single global
    running sum would serialize onto one partition."""
    w = (
        W.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    total_w = W.partitionBy(group_col)
    cum = F.sum(F.col(weight_col)).over(w)
    tot = F.sum(F.col(weight_col)).over(total_w)
    kk = F.lit(k).cast("long")
    return (
        df.select(
            "*",
            cum.cast("long").alias("__cum"),
            tot.cast("long").alias("__tot"),
        )
        .filter(
            F.expr(f"(__cum * {k}L) div __tot") > F.expr(
                f"((__cum - {weight_col}) * {k}L) div __tot"
            )
        )
        .drop("__cum", "__tot")
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tie_col: str,
    out_col: str = "normalized",
) -> DataFrame:
    """Rank-based quantile normalization: each group's value distribution is
    mapped onto the GLOBAL distribution (row at group-rank r of n_g maps to
    the global value at rank ceil(r·N/n_g)) — the bioinformatics/score-
    calibration standard, all-integer so the mapping is exact.

    Shape: one window per group (group-local ranks), one global rank, one
    equi-join on the rank index. The global rank is the scale caveat — at
    100 TB replace row_number() with the two-pass bucket-histogram prefix-sum
    rank (the q129/q130 technique); the mapping join is unchanged.
    """
    grouped = df.withColumn(
        "_r", F.row_number().over(W.partitionBy(group_col).orderBy(value_col, tie_col))
    ).withColumn("_n", F.count(F.lit(1)).over(W.partitionBy(group_col)))
    total = df.count()
    ranked_global = (
        df.select(
            F.row_number().over(W.orderBy(value_col, tie_col)).alias("_k"),
            F.col(value_col).alias(out_col),
        )
    )
    # ceil(r·N/n) in pure integer arithmetic (div, not IEEE /) — exact at any N
    idx = F.expr(f"(_r * CAST({total} AS BIGINT) + _n - 1) div _n")
    return (
        grouped.withColumn("_k", idx)
        .join(ranked_global, "_k")
        .drop("_r", "_n", "_k")
    )
