"""Consumer-level cap-boundary audit for grouped_pairs (VERDICT r5 #6).

Every pair-generating query passes a ``max_group`` (the shared default,
10k) that exceeds the TRUE maximum group size of its own input at the
BENCH scale factor — so the drop-mode consumers (q126/q247/q252) stay
value-exact in practice and the error-mode consumers (q190/q218/q286)
never trip their raise_error guard on the committed data. The sf0.01
correctness gate cannot see a cap that only bites at sf0.1+; this test
recomputes each consumer's group-size distribution AT the bench sf, so a
testdata regeneration that fattens a group past the cap fails here
instead of silently turning an exact query approximate (drop mode) or
failing the bench (error mode).

If this test ever fails: raise the consumer's ``max_group`` (exactness
queries) or accept and document the approximation (scale-survival
queries) — do not shrink the fixture.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

BENCH_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# the cap each consumer passes to grouped_pairs (all use the shared default)
DEFAULT_CAP = 10_000


def _read(spark, table: str):
    return spark.read.parquet(os.path.join(BENCH_SF_DIR, f"{table}.parquet"))


def _max_group(df, group_col: str) -> int:
    row = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m"))
        .collect()[0]
    )
    return int(row.m)


@pytest.fixture(scope="module")
def bench_data_present():
    if not os.path.isdir(BENCH_SF_DIR):
        pytest.skip(f"bench sf dir missing: {BENCH_SF_DIR}")


def test_order_basket_groups_under_cap(spark, bench_data_present):
    """q126 + q218 group on l_orderkey over distinct (order, part) rows."""
    li = _read(spark, "lineitem").select("l_orderkey", "l_partkey").distinct()
    m = _max_group(li, "l_orderkey")
    assert m < DEFAULT_CAP, (
        f"max order basket {m} >= cap {DEFAULT_CAP}: q126 turns approximate "
        f"and q218 (on_overflow='error') fails at bench sf"
    )


def test_customer_basket_groups_under_cap(spark, bench_data_present):
    """q247 + q252 group on o_custkey over distinct (cust, part) rows."""
    li = _read(spark, "lineitem").select("l_orderkey", "l_partkey")
    o = _read(spark, "orders").select("o_orderkey", "o_custkey")
    baskets = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    m = _max_group(baskets, "cust")
    assert m < DEFAULT_CAP, (
        f"max customer basket {m} >= cap {DEFAULT_CAP}: q247/q252 turn "
        f"approximate at bench sf"
    )


def test_purchase_series_groups_under_cap(spark, bench_data_present):
    """q190 groups on user_id over purchase events (on_overflow='error')."""
    ev = _read(spark, "events").filter(F.col("event_type") == "purchase")
    m = _max_group(ev.select("user_id", "event_id"), "user_id")
    assert m < DEFAULT_CAP, (
        f"max purchase series {m} >= cap {DEFAULT_CAP}: q190 fails at bench sf"
    )


def test_shingle_posting_groups_under_cap(spark, bench_data_present):
    """q286 groups on shingle over even-doc postings (on_overflow='error').

    Posting-list sizes grow linearly with corpus size (ADVICE r5) — this is
    the consumer most likely to cross its cap on a data regeneration."""
    from sqlserver2pgsql_spark.operators.dedup import shingle_postings

    docs = _read(spark, "documents").filter(F.col("doc_id") % 2 == 0)
    post = shingle_postings(docs, "doc_id", "text", n=3)
    m = _max_group(post.select("shingle", "doc_id"), "shingle")
    assert m < DEFAULT_CAP, (
        f"max shingle posting list {m} >= cap {DEFAULT_CAP}: q286 fails at "
        f"bench sf"
    )
