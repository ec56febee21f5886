from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sqlserver2pgsql_spark.session import get_spark
from sqlserver2pgsql_spark.sources.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-compare mirror: sort columns by name, coerce decimals to float,
    strip tz, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            dt = df[c]
            if getattr(dt.dt, "tz", None) is not None:
                dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = dt.astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: float(v) if type(v).__name__ == "Decimal" else v)
    return df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str):
    s = normalize(spark_df.toPandas())
    o = normalize(duck_con.execute(oracle_sql).fetchdf())
    assert list(s.columns) == list(o.columns), f"{list(s.columns)} != {list(o.columns)}"
    assert len(s) == len(o), f"rowcount {len(s)} != {len(o)}"
    # Float-vs-int dtype divergence fails the driver's representation-
    # sensitive hash even when values are equal (DuckDB HUGEINT -> float64
    # vs Spark int64 — VERDICT r4 #1); check_dtype=False below is blind to
    # it, so gate it explicitly. Datetime resolution / integer width
    # divergence are driver-proven safe and stay allowed.
    mixed = [
        c for c in s.columns
        if (pd.api.types.is_float_dtype(s[c]) and pd.api.types.is_integer_dtype(o[c]))
        or (pd.api.types.is_integer_dtype(s[c]) and pd.api.types.is_float_dtype(o[c]))
    ]
    assert not mixed, (
        f"float-vs-int dtype divergence on {mixed}: "
        f"spark {[str(s[c].dtype) for c in mixed]} vs "
        f"oracle {[str(o[c].dtype) for c in mixed]} — driver hash would fail"
    )
    pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
