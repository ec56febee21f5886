"""Physical-plan audits: the scale properties the queries claim must be
visible in `.explain` output — filter pushdown into the parquet scan, column
pruning, broadcast joins for small dims, TakeOrderedAndProject for top-k,
whole-stage codegen in the hot paths (§4 of SURVEY.md)."""

from __future__ import annotations

from sqlserver2pgsql_spark import queries as Q
from sqlserver2pgsql_spark import queries_llm as QL
from tests.conftest import SF_DIR


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_filter_pushdown_and_pruning(spark):
    plan = _plan(Q.q01_pricing_summary(spark, SF_DIR))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_quantity" in read_schema
    assert "l_orderkey" not in read_schema  # pruned — not referenced
    # hot path stays JVM-side: no Python row evaluation anywhere in the plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q02_broadcasts_small_dims(spark):
    plan = _plan(Q.q02_segment_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_q04_semi_join_strategy(spark):
    plan = _plan(Q.q04_orders_with_big_lineitems_semi(spark, SF_DIR))
    assert "LeftSemi" in plan
    # quantity filter pushed into the lineitem scan
    assert "l_quantity" in plan.split("PushedFilters")[1][:300]


def test_q11_topk_is_take_ordered(spark):
    plan = _plan(Q.q11_topk_orders(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT k


def test_q06_diff_single_join_no_presort(spark):
    plan = _plan(Q.q06_incremental_diff(spark, SF_DIR))
    # one full-outer join; no Kettle-style pre-sort operators feeding it
    assert plan.count("SortMergeJoin FullOuter") + plan.count("ShuffledHashJoin FullOuter") == 1


def test_q14_fk_validation_broadcast_anti(spark):
    plan = _plan(Q.q14_fk_validation(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_q21_ann_broadcasts_queries(spark):
    plan = _plan(QL.q21_ann_bruteforce_topk(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan  # corpus must not shuffle
