"""M3 tests: JDBC option/SQL builders and the parquet-backed full-load +
incremental orchestration end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from sqlserver2pgsql_spark.catalog.model import Column, Table, UniqueConstraint
from sqlserver2pgsql_spark.ddl import parse_text
from sqlserver2pgsql_spark.plans import (
    Orchestrator,
    ParquetStore,
    build_transfer_plans,
    format_report,
)
from sqlserver2pgsql_spark.sources.jdbc import (
    JdbcConfig,
    MSSQL_DRIVER,
    PG_DRIVER,
    mssql_scan_sql,
    partitioned_read_spec,
    pg_scan_sql,
    reader_options,
    writer_options,
)

_DDL = """
CREATE TABLE [dbo].[items](
    [id] [int] NOT NULL,
    [uid] [uniqueidentifier] NOT NULL,
    [name] [nvarchar](50) NULL,
    [born] [date] NULL,
    [blob] [varbinary](max) NULL,
 CONSTRAINT [pk_items] PRIMARY KEY CLUSTERED ([id] ASC)
) ON [PRIMARY]
GO
CREATE TABLE [dbo].[nopk](
    [a] [int] NULL,
    [b] [nvarchar](10) NULL
) ON [PRIMARY]
GO
"""


@pytest.fixture(scope="module")
def catalog():
    return parse_text(_DDL)


def test_mssql_scan_sql_coercions(catalog):
    t = catalog.schemas["public"].tables["items"]
    sql = mssql_scan_sql(t)
    assert sql.startswith("SELECT ")
    assert "lower([uid])" in sql  # uuid canonicalization (:446)
    assert "convert(varchar(50), [born], 120)" in sql  # date (:451)
    assert sql.endswith("WITH(NOLOCK)")  # dirty reads (:3666)
    assert "SELECT *" not in sql  # explicit projection (:984-1001)


def test_pg_scan_sql_matches_canonical_forms(catalog):
    t = catalog.schemas["public"].tables["items"]
    sql = pg_scan_sql("public", t)
    assert "lower(cast(uid as varchar))" in sql  # (:471)
    assert "to_char(born, 'YYYY-MM-DD')" in sql  # (:472)


def test_partitioned_read_heuristic(catalog):
    items = catalog.schemas["public"].tables["items"]
    assert items.has_lobs  # varbinary(max)
    spec = partitioned_read_spec(items)
    assert spec == {"partitionColumn": "id", "numPartitions": "8"}
    nopk = catalog.schemas["public"].tables["nopk"]
    assert partitioned_read_spec(nopk) is None  # no PK → no parallel scan

    # composite-PK table → excluded (single int PK required, :949-963)
    t = Table(name="x", orig_schema="dbo")
    t.columns["a"] = Column("a", "a", "int", spark_type="int", nullable=False, position=1)
    t.has_lobs = True
    t.primary_key = UniqueConstraint(name=None, cols=["a", "b"], is_primary=True)
    assert partitioned_read_spec(t) is None


def test_reader_writer_options(catalog):
    t = catalog.schemas["public"].tables["items"]
    cfg = JdbcConfig("jdbc:sqlserver://h:1433;db=x", "u", "p", MSSQL_DRIVER)
    ropts = reader_options(t, cfg)
    assert "dbtable" in ropts and ropts["partitionColumn"] == "id"  # LOB path
    pg = JdbcConfig("jdbc:postgresql://h/db", "u", "p", PG_DRIVER)
    wopts = writer_options(pg, "public.items")
    assert wopts["batchsize"] == "10000"
    assert wopts["numPartitions"] == "8"  # reference write parallelism (:166)
    assert "reWriteBatchedInserts=true" in wopts["url"]  # (:3470)
    assert wopts["sessionInitStatement"] == "SET synchronous_commit TO off"  # (:3479)


def test_full_load_and_incremental_orchestration(spark, catalog, tmp_path):
    src_store = ParquetStore(spark, str(tmp_path / "src"))
    tgt_store = ParquetStore(spark, str(tmp_path / "tgt"))

    rows = [
        Row(id=i, uid=f"UUID-{i}", name=f"n{i}\x00", born=None, blob=None)
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, schema="id int, uid string, name string, born date, blob binary"
    )
    src_store.write(df, "public", "items")
    src_store.write(
        spark.createDataFrame([Row(a=1, b="x")], schema="a int, b string"),
        "public",
        "nopk",
    )

    hooks_ran = []
    orch = Orchestrator(
        src_store,
        tgt_store,
        before_hooks=[lambda: hooks_ran.append("before")],
        after_hooks=[lambda: hooks_ran.append("after")],
    )

    # full load
    plans = build_transfer_plans(catalog)
    assert [p.mode for p in plans] == ["full", "full"]
    metrics = orch.run(plans)
    assert hooks_ran == ["before", "after"]
    assert {m.table: m.rows for m in metrics} == {"items": 100, "nopk": 1}
    # cleanse ran: NUL bytes stripped (A5)
    assert tgt_store.read("public", "items").filter("name LIKE '%\x00%'").count() == 0

    # drift the source, then incremental sync
    drifted = df.filter("id % 7 != 0").unionByName(
        spark.createDataFrame(
            [Row(id=1000, uid="NEW", name="new", born=None, blob=None)],
            schema=df.schema,
        )
    )
    src_store.write(drifted, "public", "items")
    plans2 = build_transfer_plans(catalog, incremental=True)
    assert {p.table.name: p.mode for p in plans2} == {
        "items": "incremental",
        "nopk": "full",  # PK-less → full reload (:1163-1166)
    }
    m2 = orch.run(plans2)
    synced = tgt_store.read("public", "items")
    assert synced.count() == drifted.count()
    assert synced.filter("id = 1000").count() == 1  # insert applied
    assert synced.filter("id = 7").count() == 0  # delete applied

    report = format_report(m2)
    assert "rows/sec" in report and "public.items" in report


def test_datetimeoffset_same_string_contract():
    # identical instants must render the SAME string on both scan sides, or
    # the incremental diff flags every datetimeoffset row as changed
    cat = parse_text(
        "CREATE TABLE [dbo].[t](\n"
        "  [id] [int] NOT NULL,\n"
        "  [at] [datetimeoffset](7) NULL,\n"
        " CONSTRAINT [pk_t] PRIMARY KEY ([id])\n"
        ")\nGO\n"
    )
    t = cat.schemas["public"].tables["t"]
    ms = mssql_scan_sql(t)
    pg = pg_scan_sql("public", t)
    # MSSQL: UTC-normalized, microsecond precision, literal '+00' suffix
    assert "switchoffset([at], '+00:00')" in ms
    assert "datetime2(6)" in ms and "+ '+00'" in ms
    # PG: same shape — UTC, .US (6-digit), '+00'
    assert "AT TIME ZONE 'UTC'" in pg and "HH24:MI:SS.US+00" in pg
