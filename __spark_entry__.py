"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``sqlserver2pgsql_spark.queries`` — the registry pairs each
Spark implementation with its DuckDB oracle SQL (SURVEY.md §2 inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqlserver2pgsql_spark import queries as _q
from sqlserver2pgsql_spark import queries_llm as _q_llm  # noqa: F401 — registers M7 queries
from sqlserver2pgsql_spark import queries_r4 as _q_r4  # noqa: F401 — registers round-4 queries
from sqlserver2pgsql_spark import queries_r5 as _q_r5  # noqa: F401 — registers seventh-wave queries
from sqlserver2pgsql_spark import queries_r6 as _q_r6  # noqa: F401 — registers eighth-wave queries
from sqlserver2pgsql_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's central dataflow — the
    incremental-sync diff (A9, sqlserver2pgsql.pl:4662-4689) re-expressed as
    a full-outer join with null-safe row comparison."""
    tune_session(spark)
    return _q.q06_incremental_diff(spark, SMOKE_SF_DIR)


# The driver's correctness window checks the first 50 entries in insertion
# order. Queries WITHOUT a green driver row in any committed
# CORRECTNESS_r*.json are registered FIRST (numeric order), so every round
# the window certifies 50 never-certified queries automatically; previously
# certified queries keep their recorded rows and take the tail slots
# (VERDICT r3 #2). `_certified_names()` derives the rotation from the
# driver's own records; the frozen r03 list below is the fallback when no
# record parses.
_CERTIFIED_R03 = frozenset({
    "q01_pricing_summary", "q02_segment_revenue", "q03_top_customers_per_segment",
    "q04_orders_with_big_lineitems_semi", "q05_customers_without_orders_anti",
    "q06_incremental_diff", "q07_incremental_apply", "q08_rollup", "q09_cube",
    "q10_setops", "q11_topk_orders", "q12_tsql_scalars", "q13_translated_view",
    "q14_fk_validation", "q15_pk_validation", "q16_cleanse", "q17_dedup_exact",
    "q18_ngram_jaccard_pairs", "q19_minhash_lsh_pairs", "q20_simhash_neardup",
    "q21_ann_bruteforce_topk", "q22_ann_lsh_topk", "q23_embedding_neardup",
    "q24_text_quality", "q25_langid", "q26_fingerprint", "q27_asof_join",
    "q28_sessionize", "q29_json_extract", "q30_pivot_events",
    "q32_stream_window_agg", "q40_token_counts", "q41_ann_ivf_topk",
    "q42_multimodal_pipeline", "q43_corpus_curation", "q44_embedding_neardup_lsh",
    "q45_stream_sessionize", "q46_redact_pii", "q47_repetition_quality",
    "q48_source_cap", "q49_quarantine_split", "q50_salted_aggregate",
    "q51_dedup_clusters", "q52_string_agg", "q53_tfidf_top_terms",
    "q54_stratified_sample", "q55_sequence_packing", "q56_decontaminate",
    "q57_token_budget_mix", "q58_stream_enrich",
})


def _certified_names() -> frozenset[str]:
    """Union of query names with a fully-green row in any committed
    CORRECTNESS_r*.json — the driver's own certification record. Falls
    back to the frozen r03 list if no record is readable."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    certified: set[str] = set()
    found = False
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rec, dict):
            continue
        found = True
        for name, row in rec.items():
            if isinstance(row, dict) and row.get("err") is None and all(
                row.get(k) is True
                for k in ("rows_match", "schema_match", "hash_match")
            ):
                certified.add(name)
    return frozenset(certified) if found else _CERTIFIED_R03


def _qnum(name: str) -> tuple[int, str]:
    """Numeric-aware sort key: 'q100_x' must sort after 'q99_x' (plain
    string sort puts three-digit ids first, which would push the r3
    backlog out of the driver's 50-entry window)."""
    import re

    m = re.match(r"q(\d+)", name)
    return (int(m.group(1)) if m else 10**9, name)


def _window_order(names: list[str]) -> list[str]:
    cert = _certified_names()
    uncertified = sorted((n for n in names if n not in cert), key=_qnum)
    certified = sorted((n for n in names if n in cert), key=_qnum)
    return uncertified + certified


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: _q.QUERIES[n] for n in _window_order(list(_q.QUERIES))}


def oracle_sql() -> dict[str, str]:
    order = _window_order(list(_q.QUERIES))
    return {n: _q.ORACLES[n] for n in order if n in _q.ORACLES}
