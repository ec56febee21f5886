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
