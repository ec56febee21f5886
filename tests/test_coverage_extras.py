"""Tests for the A11 sort-safety gate, B13 conflict resolver, citext
canonicalization, and the approx-distinct error bound."""

from __future__ import annotations

from pyspark.sql import Row

from sqlserver2pgsql_spark import queries_llm as QL
from sqlserver2pgsql_spark.catalog.conflicts import resolve_name_conflicts
from sqlserver2pgsql_spark.ddl import parse_text
from sqlserver2pgsql_spark.operators.canonicalize import canonicalize
from sqlserver2pgsql_spark.operators.diff import DIFF_FLAG_COL, FLAG_IDENTICAL, diff
from sqlserver2pgsql_spark.sources.jdbc import pk_sort_order_safe
from tests.conftest import SF_DIR

_DDL = """
CREATE TABLE [dbo].[num_pk]([id] [int] NOT NULL, CONSTRAINT [p1] PRIMARY KEY CLUSTERED ([id] ASC)) ON [PRIMARY]
GO
CREATE TABLE [dbo].[str_pk]([code] [nvarchar](10) NOT NULL, CONSTRAINT [p2] PRIMARY KEY CLUSTERED ([code] ASC)) ON [PRIMARY]
GO
CREATE TABLE [dbo].[ts_pk]([at] [datetime2](7) NOT NULL, CONSTRAINT [p3] PRIMARY KEY CLUSTERED ([at] ASC)) ON [PRIMARY]
GO
"""


def test_pk_sort_order_safe_gate():
    cat = parse_text(_DDL)
    tables = cat.schemas["public"].tables
    assert pk_sort_order_safe(tables["num_pk"])  # numeric → safe (:502-524)
    assert pk_sort_order_safe(tables["ts_pk"])  # timestamp → safe
    assert not pk_sort_order_safe(tables["str_pk"])  # collation-dependent


def test_name_conflict_resolver():
    cat = parse_text(
        """
CREATE TABLE [dbo].[orders]([id] [int] NOT NULL) ON [PRIMARY]
GO
CREATE TABLE [dbo].[customers]([id] [int] NOT NULL) ON [PRIMARY]
GO
CREATE NONCLUSTERED INDEX [customers] ON [dbo].[orders]([id] ASC)
GO
"""
    )
    renames = resolve_name_conflicts(cat)
    assert len(renames) == 1 and "customers2pgi1" in renames[0]
    assert "customers2pgi1" in cat.schemas["public"].tables["orders"].indexes


def test_citext_canonicalize_diff(spark):
    src = spark.createDataFrame([Row(k=1, name="Alice", uid="AB-1")])
    tgt = spark.createDataFrame([Row(k=1, name="ALICE", uid="ab-1")])
    kwargs = dict(uuid_cols={"uid"}, ci_cols={"name"})
    d = diff(canonicalize(src, **kwargs), canonicalize(tgt, **kwargs), ["k"])
    assert d.collect()[0][DIFF_FLAG_COL] == FLAG_IDENTICAL


def test_approx_distinct_error_bound(spark):
    # exact distinct lives here, NOT in the q33 query (a full distinct
    # shuffle would defeat the cheap one-pass profiling the query models)
    from pyspark.sql import functions as F

    from sqlserver2pgsql_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r.l_returnflag: r.exact
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("hllpp"),
        )
        .collect()
    }
    hllpp = {
        r.l_returnflag: r.hllpp
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", rsd=0.02).alias("hllpp"))
        .collect()
    }
    rows = QL.q33_approx_distinct(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        ex = exact[r.l_returnflag]
        # portable HLL (p=10, σ≈3.3%) — the oracle-checkable query path
        assert abs(r.approx_orders - ex) / max(ex, 1) < 0.1, r.l_returnflag
        # engine HLL++ — the production fast path
        assert abs(hllpp[r.l_returnflag] - ex) / max(ex, 1) < 0.1, r.l_returnflag


def test_diff_key_range_windows_both_sides(spark):
    src = spark.createDataFrame([Row(k=i, v=str(i)) for i in range(100)])
    tgt = spark.createDataFrame(
        [Row(k=i, v=str(i) if i != 50 else "stale") for i in range(5, 105)]
    )
    d = diff(src, tgt, ["k"])
    from sqlserver2pgsql_spark.operators.diff import diff_key_range

    windowed = diff_key_range(src, tgt, ["k"], lower=40, upper=60)
    flags = {r.k: r[DIFF_FLAG_COL] for r in windowed.collect()}
    assert set(flags) == set(range(40, 60))  # outside-window rows untouched
    assert flags[50] == "changed"
    assert all(f == FLAG_IDENTICAL for k, f in flags.items() if k != 50)
    # plan: range predicate pushes into both parquet-less scans as filters
    assert d.count() > windowed.count()


def test_correctness_window_rotates_from_driver_records():
    """The driver's 50-entry window must always see never-certified queries
    first: _certified_names() unions green rows from committed
    CORRECTNESS_r*.json and _window_order sorts uncertified-first."""
    import __spark_entry__ as e

    cert = e._certified_names()
    assert cert, "committed records should certify at least round 1's window"
    order = list(e.queries())
    n_uncert = sum(1 for n in order if n not in cert)
    # every uncertified query precedes every certified one
    assert all(n not in cert for n in order[: min(50, n_uncert)])
    tail_start = n_uncert
    assert all(n in cert for n in order[tail_start:])
    # numeric ordering inside each block (q99 before q100)
    nums = [e._qnum(n) for n in order[:tail_start]]
    assert nums == sorted(nums)


def test_certified_names_falls_back_without_records(monkeypatch, tmp_path):
    import __spark_entry__ as e

    monkeypatch.setattr(
        "os.path.dirname", lambda _p, _real=__import__("os").path.dirname: str(tmp_path)
    )
    # no CORRECTNESS files in tmp_path -> frozen r03 fallback
    assert e._certified_names() == e._CERTIFIED_R03


def test_rounding_mode_pin(spark, duck):
    """Engine-behavior pin: Spark's round() on DOUBLE is HALF_UP away
    from zero and bround() is HALF_EVEN (banker's); DuckDB's round() on
    DOUBLE agrees with Spark's round() on exact-representable halves.
    Oracle-gated queries therefore only ever round values whose 10^-k
    neighborhood is unambiguous OR rely on identical double inputs — this
    pin documents the boundary the exactness discipline steers around."""
    from pyspark.sql import functions as F

    rows = spark.range(1).select(
        F.round(F.lit(2.5), 0).alias("r25"),
        F.round(F.lit(-2.5), 0).alias("rm25"),
        F.round(F.lit(3.5), 0).alias("r35"),
        F.bround(F.lit(2.5), 0).alias("b25"),
        F.bround(F.lit(3.5), 0).alias("b35"),
    ).collect()[0]
    assert (rows["r25"], rows["rm25"], rows["r35"]) == (3.0, -3.0, 4.0)
    assert (rows["b25"], rows["b35"]) == (2.0, 4.0)
    d = duck.execute(
        "SELECT round(2.5), round(-2.5), round(3.5)"
    ).fetchone()
    assert tuple(float(x) for x in d) == (3.0, -3.0, 4.0)
