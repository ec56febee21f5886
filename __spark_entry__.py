"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``sqlserver2pgsql_spark.queries`` — the registry pairs each
Spark implementation with its DuckDB oracle SQL (SURVEY.md §2 inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqlserver2pgsql_spark import queries as _q
from sqlserver2pgsql_spark import queries_llm as _q_llm  # noqa: F401 — registers M7 queries
from sqlserver2pgsql_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's central dataflow — the
    incremental-sync diff (A9, sqlserver2pgsql.pl:4662-4689) re-expressed as
    a full-outer join with null-safe row comparison."""
    tune_session(spark)
    return _q.q06_incremental_diff(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
