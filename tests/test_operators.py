"""Unit tests for the core dataflow operators (SURVEY.md §2.A)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from sqlserver2pgsql_spark.operators.cleanse import cleanse_strings
from sqlserver2pgsql_spark.operators.canonicalize import canonicalize
from sqlserver2pgsql_spark.operators.constraints import (
    check_violations,
    fk_violations,
    pk_violations,
    unique_violations,
)
from sqlserver2pgsql_spark.operators.diff import (
    DIFF_FLAG_COL,
    FLAG_CHANGED,
    FLAG_DELETED,
    FLAG_IDENTICAL,
    FLAG_NEW,
    diff,
)
from sqlserver2pgsql_spark.operators.merge import apply_diff, merge_sql


def test_cleanse_strips_nul_bytes(spark):
    df = spark.createDataFrame(
        [Row(id=1, a="he\x00llo", b=10), Row(id=2, a=None, b=20), Row(id=3, a="", b=30)]
    )
    out = {r.id: r.a for r in cleanse_strings(df).collect()}
    assert out[1] == "hello"
    assert out[2] is None
    assert out[3] == ""  # empty string preserved, NOT nulled (Kettle contract :773-802)


def test_diff_flags_all_four_states(spark):
    src = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b2"), Row(k=3, v=None), Row(k=5, v="new")]
    )
    tgt = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v=""), Row(k=4, v="gone")]
    )
    d = {r.k: r[DIFF_FLAG_COL] for r in diff(src, tgt, ["k"]).collect()}
    assert d == {
        1: FLAG_IDENTICAL,
        2: FLAG_CHANGED,
        3: FLAG_CHANGED,  # NULL vs '' must differ — the reference refuses to
        # run without this guarantee (sqlserver2pgsql.pl:773-802)
        4: FLAG_DELETED,
        5: FLAG_NEW,
    }


def test_diff_hash_variant_matches_column_compare(spark):
    src = spark.createDataFrame([Row(k=i, v=f"v{i}", w=i * 2) for i in range(100)])
    tgt = spark.createDataFrame(
        [Row(k=i, v=f"v{i}" if i % 3 else "x", w=i * 2) for i in range(1, 101)]
    )
    a = diff(src, tgt, ["k"]).orderBy("k").collect()
    b = diff(src, tgt, ["k"], use_hash=True).orderBy("k").collect()
    assert a == b


def test_apply_diff_reproduces_source(spark):
    src = spark.createDataFrame([Row(k=i, v=str(i)) for i in range(50)])
    tgt = spark.createDataFrame(
        [Row(k=i, v=str(i) if i % 7 else "stale") for i in range(10, 60)]
    )
    synced = apply_diff(diff(src, tgt, ["k"])).select("k", "v")
    assert sorted((r.k, r.v) for r in synced.collect()) == [(i, str(i)) for i in range(50)]


def test_merge_sql_shape():
    sql = merge_sql("tgt", "stg", ["id"], ["a", "b"])
    assert "MERGE INTO tgt t USING stg s ON t.id = s.id" in sql
    assert "THEN DELETE" in sql and "UPDATE SET a = s.a, b = s.b" in sql


def test_canonicalize_uuid_and_strings(spark):
    import datetime

    df = spark.createDataFrame(
        [Row(u="ABC-DEF", s="MiXeD", d=datetime.date(2020, 1, 2))]
    )
    row = canonicalize(df, uuid_cols={"u"}).collect()[0]
    assert row.u == "abc-def" and row.s == "MiXeD"
    srow = canonicalize(df, uuid_cols={"u"}, as_strings=True).collect()[0]
    assert srow.d == "2020-01-02"


def test_constraint_validators(spark):
    child = spark.createDataFrame(
        [Row(id=1, fk=10), Row(id=2, fk=99), Row(id=3, fk=None), Row(id=3, fk=10)]
    )
    parent = spark.createDataFrame([Row(pk=10), Row(pk=11)])
    assert [r.fk for r in fk_violations(child, ["fk"], parent, ["pk"]).collect()] == [99]
    assert [(r.id, r.n) for r in pk_violations(child, ["id"]).collect()] == [(3, 2)]
    dup = spark.createDataFrame([Row(u=1), Row(u=1), Row(u=None), Row(u=None)])
    assert [(r.u, r.n) for r in unique_violations(dup, ["u"]).collect()] == [(1, 2)]
    chk = spark.createDataFrame([Row(x=5), Row(x=-1), Row(x=None)])
    assert [r.x for r in check_violations(chk, "x >= 0").collect()] == [-1]
