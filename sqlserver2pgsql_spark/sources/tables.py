"""Parquet fixture loader for the driver-generated TPC-H-ish star schema.

TESTDATA.md: tables live at ``{sf_dir}/{name}.parquet``. Parquet is the
columnar scan path (A1-equivalent for local fixtures): Catalyst pushes
filters and prunes columns into the scan, which is exactly the projection
pushdown the reference hand-builds into its generated SELECT lists
(sqlserver2pgsql.pl:984-1001 — never ``SELECT *``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (mirrors the oracle side,
    where DuckDB pre-registers the same names)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
