"""File source/sink tests: JSONL/CSV quarantine contract, partitioned
parquet sink + reader-side partition pruning (the §4 physical technique)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlserver2pgsql_spark.sources.files import (
    read_csv,
    read_jsonl,
    write_partitioned,
)

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_jsonl_quarantine_split(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "score": 0.5}\n'
        '{"id": 2, "name": "b", "score": 0.25}\n'
        "this is not json at all\n"
        '{"id": "NaNope", "name": "c", "score": 1.0}\n'
    )
    good, bad = read_jsonl(spark, str(p), _SCHEMA)
    assert sorted(r.id for r in good.collect()) == [1, 2]
    bad_rows = [r.raw_line for r in bad.collect()]
    assert len(bad_rows) == 2
    assert any("not json" in b for b in bad_rows)
    assert any("NaNope" in b for b in bad_rows)


def test_csv_quarantine_split(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name,score\n1,a,0.5\n2,b,not_a_double\n3,c,1.25\n")
    good, bad = read_csv(spark, str(p), _SCHEMA)
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert [r.raw_line for r in bad.collect()] == ["2,b,not_a_double"]


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    from sqlserver2pgsql_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select("event_id", "event_type", "value")
    out = str(tmp_path / "ev_parts")
    write_partitioned(ev, out, ["event_type"], sort_cols=["event_id"])

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    # the filter must become a PartitionFilter on the directory layout, not
    # a post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]
    exp = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == exp


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from sqlserver2pgsql_spark.sources.files import read_orc, write_orc

    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) / 2) for i in range(100)], _SCHEMA
    )
    out = str(tmp_path / "t.orc")
    write_orc(df, out)
    back = read_orc(spark, out, _SCHEMA)
    assert back.count() == 100
    assert sorted(r.id for r in back.collect()) == list(range(100))
    # predicate pushdown reaches the ORC scan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("id") > 50).select("id").explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "id" in plan.split("PushedFilters")[1][:120]


def test_orc_partitioned_layout(spark, tmp_path):
    import os

    from sqlserver2pgsql_spark.sources.files import write_orc

    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd", 0.0) for i in range(20)], _SCHEMA
    )
    out = str(tmp_path / "p.orc")
    write_orc(df, out, partition_cols=["name"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("name=")
    ) == ["name=even", "name=odd"]


def test_text_lines_source(spark, tmp_path):
    from sqlserver2pgsql_spark.sources.files import read_text_lines

    p = tmp_path / "crawl.txt"
    p.write_text("hello world\n\n   \nsecond line\nhello world\n")
    rows = read_text_lines(spark, str(p)).collect()
    # blank/whitespace-only lines dropped; duplicate lines share a line_id
    assert len(rows) == 3
    by_line = {}
    for r in rows:
        by_line.setdefault(r.line, set()).add(r.line_id)
    assert set(by_line) == {"hello world", "second line"}
    assert all(len(ids) == 1 for ids in by_line.values())
