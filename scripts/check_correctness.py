"""Local mirror of the driver's correctness gate.

For every entry in __spark_entry__.queries(), run the Spark query and the
DuckDB oracle at the given sf dir, sort columns by name, sort rows, and
compare values exactly. Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from sqlserver2pgsql_spark.session import get_spark
from sqlserver2pgsql_spark.sources.tables import TABLE_NAMES


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            dt = df[c]
            if getattr(dt.dt, "tz", None) is not None:
                dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = dt.astype("datetime64[ns]")
        # NOTE: deliberately NO Decimal→float coercion here. The driver's hash
        # is representation-sensitive: Spark toPandas renders DECIMAL as
        # decimal.Decimal objects while DuckDB fetchdf renders DECIMAL/HUGEINT
        # as float64 — coercing would mask exactly the mismatch the driver
        # fails on (round-1 lesson). Queries must emit DOUBLE/BIGINT finals.
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures: list[str] = []
    ran = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only check, {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        s, o = _normalize(sdf), _normalize(odf)
        if list(s.columns) != list(o.columns):
            print(f"FAIL  {name}: columns {list(s.columns)} != {list(o.columns)}")
            failures.append(name)
            continue
        # Driver-hash parity: float-vs-int dtype divergence is exactly the
        # class the driver's representation-sensitive hash fails on (DuckDB
        # HUGEINT -> pandas float64 vs Spark int64 — VERDICT r4 #1), and
        # `check_dtype=False` below is blind to it. Datetime-resolution and
        # integer-width divergence are driver-proven safe; float-vs-int is not.
        mixed = [
            c for c in s.columns
            if (pd.api.types.is_float_dtype(s[c]) and pd.api.types.is_integer_dtype(o[c]))
            or (pd.api.types.is_integer_dtype(s[c]) and pd.api.types.is_float_dtype(o[c]))
        ]
        if mixed:
            print(
                f"FAIL  {name}: float-vs-int dtype divergence on {mixed} "
                f"(spark {[str(s[c].dtype) for c in mixed]} vs "
                f"oracle {[str(o[c].dtype) for c in mixed]}) — the driver's "
                f"hash will mismatch even if values are equal"
            )
            failures.append(name)
            continue
        if len(s) != len(o):
            print(f"FAIL  {name}: rowcount {len(s)} != {len(o)}")
            failures.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
            print(f"ok    {name}: {len(s)} rows exact-match ({time.time()-t0:.1f}s)")
        except AssertionError as e:
            print(f"FAIL  {name}: value mismatch:\n{str(e)[:2000]}")
            failures.append(name)

    print(f"\n{ran - len(failures)}/{ran} passed ({len(qs)} registered)")
    return 1 if failures or ran == 0 else 0


if __name__ == "__main__":
    raise SystemExit(main())
