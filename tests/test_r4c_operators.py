"""Round-4 third-wave operator tests: RRF hybrid fusion, the expectations
audit, deterministic epoch sharding, centroid similarity, leakage-safe
splitting, and char-bigram entropy — properties the sf-fixture oracles
can't stress (rank-fusion algebra, leakage invariants, entropy bounds,
permutation-invariance of the shard plan)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

# --- q163: reciprocal-rank fusion -------------------------------------------


def test_rrf_fusion_scores_and_ranks(spark):
    rows = entrymod.queries()["q163_rrf_hybrid_fusion"](spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        expect = 0.0
        if r.lex_rank is not None:
            assert 1 <= r.lex_rank <= 200
            expect += 1.0 / (60 + r.lex_rank)
        if r.vec_rank is not None:
            assert 1 <= r.vec_rank <= 200
            expect += 1.0 / (60 + r.vec_rank)
        assert abs(r.rrf_score - expect) < 1e-9
    # fused output is sorted by score; a doc present in BOTH lists at rank 1
    # would dominate — verify monotone non-increasing order
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)


# --- q164: expectations audit -----------------------------------------------


def test_expectations_audit_clean_fixture_passes(spark):
    rows = entrymod.queries()["q164_expectations_audit"](spark, SF_DIR).collect()
    by_rule = {r.rule: r for r in rows}
    assert len(by_rule) == 7
    # the TPC-H-ish fixture is referentially clean: every rule passes
    for r in rows:
        assert r.passed and r.violations == 0, r.rule


def test_expectations_audit_detects_planted_violations(spark):
    # plant a dup key, a null custkey, and an out-of-domain status
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(50)
    bad = o.limit(1).select(
        "o_orderkey",  # duplicate of an existing key
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit("X").alias("o_orderstatus"),
        *[c for c in o.columns if c not in
          ("o_orderkey", "o_custkey", "o_orderstatus")],
    ).select(o.columns)
    n1 = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    agg = o.unionByName(bad).agg(
        n1(F.col("o_custkey").isNull()).alias("null_custkey"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_orderkey"),
        n1(~F.col("o_orderstatus").isin("O", "F", "P")).alias("status_domain"),
    ).first()
    assert agg.null_custkey == 1
    assert agg.dup_orderkey == 1
    assert agg.status_domain == 1


# --- q165: epoch shard plan -------------------------------------------------


def test_epoch_shard_plan_partition_invariant_and_complete(spark):
    q = entrymod.queries()["q165_epoch_shard_plan"]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = q(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    assert {r.shard for r in rows} <= set(range(16))
    # determinism across physical layouts: the manifest is a pure function
    # of doc ids, so any repartitioning yields the identical plan
    again = q(spark, SF_DIR).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


# --- q166: label-centroid cosine matrix -------------------------------------


def test_centroid_similarity_upper_triangle_and_bounds(spark):
    rows = entrymod.queries()["q166_label_centroid_similarity"](
        spark, SF_DIR
    ).collect()
    labels = set()
    for r in rows:
        assert r.label_a < r.label_b
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9
        labels |= {r.label_a, r.label_b}
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2


# --- q167: leakage-safe split -----------------------------------------------


def test_leakage_safe_split_no_cross_pairs_and_covers_corpus(spark):
    rows = entrymod.queries()["q167_leakage_safe_split"](spark, SF_DIR).collect()
    by_split = {r.split: r for r in rows}
    assert set(by_split) <= {"train", "val"}
    # THE invariant: no near-dup pair straddles the split
    for r in rows:
        assert r.cross_split_pairs == 0
    # corpus = documents + the mutated near-dup copies (doc_id % 5 == 0)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    n_mut = docs.filter(F.col("doc_id") % 5 == 0).count()
    assert sum(r.n_docs for r in rows) == n + n_mut


# --- q168: char-bigram entropy ----------------------------------------------


def test_char_entropy_bounds_and_closed_forms(spark):
    rows = entrymod.queries()["q168_char_entropy"](spark, SF_DIR).collect()
    for r in rows:
        # 0 <= H <= ln(n_distinct), with slack for the round(9)/round(6) pins
        assert -1e-6 <= r.entropy <= math.log(r.n_distinct) + 1e-6
        assert r.n_bigrams >= r.n_distinct


def test_char_entropy_closed_form_on_synthetic_docs(spark):
    # uniform text: "abab..." has bigrams {ab, ba} near-uniform; repeated
    # char "aaaa" has a single bigram -> H = 0
    rng = random.Random(11)
    uniform = "".join(rng.choice("abcdefgh") for _ in range(4096))
    df = spark.createDataFrame(
        [(1, "aaaaaaaa"), (2, "abababab"), (3, uniform)], "doc_id long, text string"
    )
    grams = df.filter(F.length("text") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 1),"
                " i -> substring(text, i, 2))"
            )
        ).alias("bg"),
    )
    counts = grams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("n"))
    t = F.sum("n").cast("long")
    nlnn = F.sum(
        F.round(F.col("n") * F.log(F.col("n").cast("double")), 9)
        .cast("decimal(28,15)")
    )
    got = {
        r.doc_id: r.h
        for r in counts.groupBy("doc_id")
        .agg(
            F.round(
                F.log(t.cast("double")) - nlnn.cast("double") / t.cast("double"), 6
            ).alias("h")
        )
        .collect()
    }
    assert got[1] == 0.0  # single repeated bigram
    # "abababab": 7 bigrams = 4x"ab" + 3x"ba"
    want2 = math.log(7) - (4 * math.log(4) + 3 * math.log(3)) / 7
    assert abs(got[2] - want2) < 1e-5
    # near-uniform random text approaches ln(64) from below
    assert got[3] <= math.log(64) + 1e-6
