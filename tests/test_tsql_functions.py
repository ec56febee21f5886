"""T-SQL function layer (B10) + expression translator unit tests."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sqlserver2pgsql_spark.functions import tsql
from sqlserver2pgsql_spark.functions.translate import translate_tsql_expr


def test_charindex_and_len(spark):
    df = spark.createDataFrame([Row(s="hello world  ")])
    row = df.select(
        tsql.charindex("world", F.col("s")).alias("pos"),
        tsql.charindex("zzz", F.col("s")).alias("missing"),
        tsql.len_(F.col("s")).alias("n"),
    ).collect()[0]
    assert row.pos == 7
    assert row.missing == 0  # T-SQL returns 0, not NULL
    assert row.n == 11  # LEN ignores trailing spaces


def test_dateadd_datediff_datepart(spark):
    df = spark.createDataFrame([Row(d=datetime.datetime(2020, 12, 31, 23, 0, 0))])
    row = df.select(
        tsql.dateadd("day", 2, F.col("d")).alias("plus2d"),
        tsql.dateadd("month", 1, F.col("d")).alias("plus1m"),
        tsql.datepart("quarter", F.col("d")).alias("q"),
        tsql.datediff("year", F.col("d"), F.lit("2021-01-01").cast("timestamp")).alias("ydiff"),
        tsql.datediff("day", F.col("d"), F.lit("2021-01-01 00:30:00").cast("timestamp")).alias("ddiff"),
        tsql.datediff("hour", F.col("d"), F.lit("2020-12-31 23:59:59").cast("timestamp")).alias("hdiff"),
    ).collect()[0]
    assert row.plus2d == datetime.datetime(2021, 1, 2, 23, 0, 0)
    assert row.plus1m == datetime.datetime(2021, 1, 31, 23, 0, 0)
    assert row.q == 4
    # DATEDIFF counts boundary crossings: 2020-12-31 23:00 → 2021-01-01 is 1 year
    assert row.ydiff == 1 and row.ddiff == 1 and row.hdiff == 0


def test_concat_null_semantics(spark):
    df = spark.createDataFrame([("x", None)], schema="a string, b string")
    row = df.select(tsql.tsql_concat(F.col("a"), F.col("b")).alias("c")).collect()[0]
    assert row.c is None  # CONCAT_NULL_YIELDS_NULL ON


def test_convert_styles(spark):
    df = spark.createDataFrame([Row(d=datetime.datetime(2020, 1, 2, 3, 4, 5), x=1.5)])
    row = df.select(
        tsql.convert("varchar", F.col("d"), 120).alias("iso"),
        tsql.convert("int", F.col("x")).alias("i"),
        tsql.convert("varchar(3)", F.lit("abcdef")).alias("trunc"),
    ).collect()[0]
    assert row.iso == "2020-01-02 03:04:05"
    assert row.i == 1
    assert row.trunc == "abc"


def test_unsupported_datepart_raises():
    with pytest.raises(ValueError):
        tsql.datepart("fortnight", F.lit("2020-01-01"))


# --- translator -----------------------------------------------------------


def test_translate_isnull_getdate():
    r = translate_tsql_expr("ISNULL([Some Col], getdate())")
    assert r.sql == "coalesce(some_col, current_timestamp())"
    assert not r.unsure


def test_translate_nested_and_literals():
    r = translate_tsql_expr("ISNULL(CONVERT(VARCHAR(10), [a]), N'isnull(x)')")
    assert "CAST(a AS STRING)" in r.sql
    # the literal containing 'isnull(' survives untouched (V5 fixture,
    # regression/basic_test/views.sql:96)
    assert "'isnull(x)'" in r.sql
    assert not r.unsure


def test_translate_dateadd_charindex_space():
    r = translate_tsql_expr("DATEADD(day, 2, [d]) ")
    assert r.sql == "timestampadd(DAY, 2, d)"
    r2 = translate_tsql_expr("charindex('-', [s], 3)")
    assert r2.sql == "locate('-', s, 3)"
    r3 = translate_tsql_expr("SPACE(5)")
    assert r3.sql == "repeat(' ', 5)"


def test_translate_string_concat():
    r = translate_tsql_expr("[a] + '|' + [b]")
    assert r.sql == "a || '|' || b"


def test_translate_unknown_function_marks_unsure():
    r = translate_tsql_expr("my_weird_udf([x])")
    assert r.unsure
    assert "my_weird_udf" in r.sql  # left intact, not guessed
    assert any("my_weird_udf" in n for n in r.notes)


def test_translate_executes_on_spark(spark):
    r = translate_tsql_expr("ISNULL(NULLIF('a','a'), 'fallback') + SPACE(1) + 'z'")
    assert not r.unsure
    assert spark.sql(f"SELECT {r.sql} AS v").collect()[0].v == "fallback z"
