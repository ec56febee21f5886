"""Skew-mitigation and quarantine operator tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from sqlserver2pgsql_spark.ddl import parse_text
from sqlserver2pgsql_spark.operators.quarantine import (
    split_valid_invalid,
    validation_predicates,
)
from sqlserver2pgsql_spark.operators.skew import salted_aggregate, salted_join


def test_salted_aggregate_matches_plain(spark):
    # one pathologically hot key
    rows = [Row(k="hot", v=float(i)) for i in range(5000)] + [
        Row(k=f"k{i}", v=float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    plain = {
        (r.k): (r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v").cast("decimal(38,8)")).alias("s"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.s)
        for r in salted_aggregate(
            df,
            ["k"],
            partial_aggs={
                "pn": F.count(F.lit(1)),
                "ps": F.sum(F.col("v").cast("decimal(38,8)")),
            },
            merge_aggs={"n": F.sum("pn"), "s": F.sum("ps")},
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    large = spark.createDataFrame(
        [Row(k="hot", x=i) for i in range(2000)] + [Row(k="k1", x=-1)]
    )
    small = spark.createDataFrame([Row(k="hot", tag="H"), Row(k="k1", tag="A")])
    plain = sorted((r.k, r.x, r.tag) for r in large.join(small, ["k"]).collect())
    salted = sorted((r.k, r.x, r.tag) for r in salted_join(large, small, ["k"]).collect())
    assert salted == plain


def test_quarantine_split(spark):
    cat = parse_text(
        """
CREATE TABLE [dbo].[t](
  [id] [int] NOT NULL,
  [name] [nvarchar](5) NULL,
 CONSTRAINT [ck_pos] CHECK ([id] >= 0)
) ON [PRIMARY]
GO
"""
    )
    table = cat.schemas["public"].tables["t"]
    preds = validation_predicates(table)
    assert set(preds) == {"id_not_null", "name_check0", "ck_pos"}

    df = spark.createDataFrame(
        [
            Row(id=1, name="ok"),
            Row(id=None, name="x"),  # NOT NULL violation
            Row(id=2, name="toolongname"),  # length check violation
            Row(id=-5, name=None),  # CHECK violation; NULL name passes
        ],
        schema="id int, name string",
    )
    clean, bad = split_valid_invalid(df, preds)
    assert [r.id for r in clean.collect()] == [1]
    reasons = {r.id: r["__reject_reason__"] for r in bad.collect()}
    assert reasons[None] == "id_not_null"
    assert reasons[2] == "name_check0"
    assert reasons[-5] == "ck_pos"
