"""Property-based tests (hypothesis) for the curation/text operators —
invariants that must hold for ANY input, not just the fixtures:

- hash_bucket: range, determinism, partition-layout invariance
- stratified_sample: kept set is a subset, monotone in the rate
- pack_sequences: packs partition the tape, pack ids non-decreasing,
  every pack start lands in the right chunk
- token_budget_mix: admitted prefix never exceeds the allocation
- fingerprint_md5: whitespace/case canonicalization invariance
- redact_text: idempotent (a redacted doc redacts to itself)

One small Spark round-trip per example is slow, so examples are bounded
(hypothesis drives the DATA, Spark stays inside one session).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from sqlserver2pgsql_spark.operators.curation import (
    hash_bucket,
    pack_sequences,
    redact_text,
    stratified_sample,
    token_budget_mix,
)
from sqlserver2pgsql_spark.operators.text import fingerprint_md5

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_ids = st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=30, unique=True)


@_SETTINGS
@given(ids=_ids)
def test_hash_bucket_range_and_determinism(spark, ids):
    df = spark.createDataFrame([Row(k=i) for i in ids])
    got1 = {r.k: r.b for r in df.select("k", hash_bucket(F.col("k")).alias("b")).collect()}
    got2 = {
        r.k: r.b
        for r in df.repartition(5).select("k", hash_bucket(F.col("k")).alias("b")).collect()
    }
    assert got1 == got2
    assert all(0 <= b < 100 for b in got1.values())


@_SETTINGS
@given(ids=_ids, lo=st.integers(0, 50))
def test_stratified_sample_subset_and_monotone(spark, ids, lo):
    hi = lo + 40
    df = spark.createDataFrame([Row(s="x", k=i) for i in ids])
    small = {r.k for r in stratified_sample(df, "s", "k", F.lit(lo)).collect()}
    big = {r.k for r in stratified_sample(df, "s", "k", F.lit(hi)).collect()}
    assert small <= big  # raising the rate only adds rows
    assert big <= set(ids)


@_SETTINGS
@given(
    weights=st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=25),
    budget=st.integers(min_value=64, max_value=512),
)
def test_pack_sequences_chunk_invariants(spark, weights, budget):
    df = spark.createDataFrame([Row(g="g", i=n, w=w) for n, w in enumerate(weights)])
    rows = sorted(pack_sequences(df, "g", "i", "w", budget).collect(), key=lambda r: r.i)
    cum = 0
    prev_pack = 0
    for r in rows:
        start = cum
        cum += r.w
        assert r.cum_weight == cum
        assert r.pack_id == start // budget  # start offset chunk
        assert r.pack_id >= prev_pack  # packs never go backwards
        prev_pack = r.pack_id


@_SETTINGS
@given(
    toks=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=20),
    budget=st.integers(min_value=50, max_value=2000),
)
def test_token_budget_mix_never_exceeds_alloc(spark, toks, budget):
    df = spark.createDataFrame([Row(s="a", i=n, t=t) for n, t in enumerate(toks)])
    out = token_budget_mix(
        df, "s", [F.col("i").asc()], "t", F.lit(1), total_parts=1, budget=budget
    ).collect()
    admitted = sorted(out, key=lambda r: r.i)
    assert all(r.cum_tokens <= r.alloc for r in admitted)
    # admitted rows are a PREFIX of the order (no holes)
    expect_prefix = []
    cum = 0
    for n, t in enumerate(toks):
        cum += t
        if cum > budget:
            break
        expect_prefix.append(n)
    assert [r.i for r in admitted] == expect_prefix


@_SETTINGS
@given(words=st.lists(st.text(alphabet="abcXYZ09", min_size=1, max_size=6), min_size=1, max_size=12))
def test_fingerprint_whitespace_and_case_invariance(spark, words):
    doc = " ".join(words)
    messy = "  " + "\t ".join(w.upper() for w in words) + " \n"
    df = spark.createDataFrame([Row(i=1, t=doc), Row(i=2, t=messy)])
    fps = {r.i: r.fp for r in df.select("i", fingerprint_md5(F.col("t")).alias("fp")).collect()}
    assert fps[1] == fps[2]


@_SETTINGS
@given(
    base=st.text(alphabet="abc def", min_size=0, max_size=40),
    n=st.integers(min_value=100000, max_value=10**9),
)
def test_redact_idempotent(spark, base, n):
    doc = f"{base} mail a@b.co https://x.y/{n} id {n}00000"
    df = spark.createDataFrame([Row(doc_id=1, text=doc)])
    once = redact_text(df).select(F.col("redacted").alias("text"))
    twice = redact_text(once).collect()[0]
    assert twice.redacted == once.collect()[0].text
    assert twice.n_emails == 0 and twice.n_urls == 0 and twice.n_digit_runs == 0


@_SETTINGS
@given(
    words=st.lists(st.text(alphabet="abcXYZ09", min_size=1, max_size=5), min_size=1, max_size=200),
)
def test_chunking_partitions_the_token_tape(spark, words):
    """64/48 chunking invariants: concatenating the stride-aligned PREFIX
    (first 48 tokens) of every chunk reconstructs the document exactly, and
    every chunk holds ≤ 64 tokens."""
    doc = " ".join(words)
    df = spark.createDataFrame([Row(doc_id=1, text=doc)])
    from sqlserver2pgsql_spark.queries_llm import q69_doc_chunking  # noqa: F401  — uses registered recipe

    from pyspark.sql import functions as FF

    toks = FF.split(FF.trim(FF.col("text")), r"\s+")
    starts = FF.sequence(FF.lit(1), FF.greatest(FF.lit(1), FF.size(toks)), FF.lit(48))
    chunks = [
        r.c
        for r in df.select(
            FF.explode(
                FF.transform(starts, lambda s: FF.slice(toks, s, 64))
            ).alias("c")
        ).collect()
    ]
    assert all(len(c) <= 64 for c in chunks)
    rebuilt = [t for c in chunks for t in c[:48]]
    assert rebuilt == words


@_SETTINGS
@given(
    vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32),
        min_size=3, max_size=40,
    ),
)
def test_zscore_moments(spark, vals):
    """z-scores are shift-invariant in mean: mean(z)≈0 and var(z)≈1 for any
    non-degenerate sample (guard constant inputs)."""
    import statistics

    if statistics.pvariance(vals) < 1e-6:
        return
    df = spark.createDataFrame([Row(event_id=i, event_type="t", value=float(v))
                                for i, v in enumerate(vals)])
    from pyspark.sql import functions as FF
    from pyspark.sql import Window as WW

    w = WW.partitionBy("event_type")
    sx = FF.sum(FF.col("value").cast("decimal(38,8)")).over(w).cast("double")
    sx2 = FF.sum((FF.col("value") * FF.col("value")).cast("decimal(38,8)")).over(w).cast("double")
    n = FF.count(FF.lit(1)).over(w)
    mean = sx / n
    z = (FF.col("value") - mean) / FF.sqrt(sx2 / n - mean * mean)
    zs = [r.z for r in df.select(z.alias("z")).collect()]
    assert abs(sum(zs) / len(zs)) < 1e-6
    assert abs(sum(v * v for v in zs) / len(zs) - 1.0) < 1e-6
