"""Parquet fixture loader for the driver-generated TPC-H-ish star schema.

TESTDATA.md: tables live at ``{sf_dir}/{name}.parquet``. Parquet is the
columnar scan path (A1-equivalent for local fixtures): Catalyst pushes
filters and prunes columns into the scan, which is exactly the projection
pushdown the reference hand-builds into its generated SELECT lists
(sqlserver2pgsql.pl:984-1001 — never ``SELECT *``).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _nano_ts_columns(path: str) -> list[str]:
    schema = pq.read_schema(path)
    return [
        n
        for n, t in zip(schema.names, schema.types)
        if str(t).startswith("timestamp[ns")
    ]


#: (applicationId, sf_dir, table) -> (session, lazy relation DataFrame).
#: METADATA memo only — the cached value is an unexecuted plan (file index +
#: schema), so every action still scans the parquet inputs; nothing computed
#: is reused. This is what registering the fixtures as catalog tables would
#: give: ``spark.read.parquet`` re-resolves the DataSource relation (listing
#: + footer schema inference) on EVERY call — measured ~110 ms warm — and the
#: bench re-builds every query each pass, so ~680 table loads/pass were ~75 s
#: of pure re-resolution. The session object is stored and identity-checked
#: so a restarted/foreign session (driver contract) never receives a plan
#: bound to a dead session.
_RELATIONS: dict[tuple[str, str, str], tuple[SparkSession, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan. TIMESTAMP(NANOS) columns (which Spark rejects,
    PARQUET_TYPE_ILLEGAL) are read as nanosecond longs and truncated to
    microsecond timestamps — lossless for micro-aligned data, and integer
    `div` keeps the conversion exact beyond 2^53."""
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    hit = _RELATIONS.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos = _nano_ts_columns(path)
    if not nanos:
        df = spark.read.parquet(path)
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in nanos:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    _RELATIONS[key] = (spark, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def spread(df: DataFrame) -> DataFrame:
    """Rebalance a narrow frame to core-count width ahead of CPU-heavy
    fan-out (shingle/token explodes, per-row hashing, pair generation).

    The fixture parquet is one row group per table, so a scan is ONE task
    and any hot loop sitting on it runs single-core no matter the session
    width; at scale the same repartition is a row-sized exchange that
    rebalances skewed splits before a fan-out whose output dwarfs it. The
    width tracks the session's core count — never a constant."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (mirrors the oracle side,
    where DuckDB pre-registers the same names)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
