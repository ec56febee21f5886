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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan. TIMESTAMP(NANOS) columns (which Spark rejects,
    PARQUET_TYPE_ILLEGAL) are read as nanosecond longs and truncated to
    microsecond timestamps — lossless for micro-aligned data, and integer
    `div` keeps the conversion exact beyond 2^53."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos = _nano_ts_columns(path)
    if not nanos:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (mirrors the oracle side,
    where DuckDB pre-registers the same names)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
