"""Oracle type lint: no registered DuckDB oracle may yield HUGEINT/UHUGEINT.

DuckDB widens integer ``sum()`` to HUGEINT, which ``fetchdf`` renders as
float64 while Spark emits int64 — the driver's representation-sensitive
hash then fails even when every value is equal (VERDICT r4 #1: q61/q85/q96
red, q113/q118/q119/q127 latent). This lint binds every oracle against the
sf0.001 views (no Spark, no execution — DuckDB relation .types only) and
fails on any HUGEINT-family column, so the class can't ship again.

Usage:  python scripts/lint_oracles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb

BANNED = {"HUGEINT", "UHUGEINT"}


def hugeint_columns(con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    rel = con.sql(sql)
    return [
        c for c, t in zip(rel.columns, rel.types) if str(t).upper() in BANNED
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from sqlserver2pgsql_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad: list[str] = []
    oracles = entrymod.oracle_sql()
    for name, sql in sorted(oracles.items()):
        try:
            cols = hugeint_columns(con, sql)
        except Exception as e:  # noqa: BLE001 — bind error is its own failure
            print(f"FAIL  {name}: oracle does not bind: {e}")
            bad.append(name)
            continue
        if cols:
            print(f"FAIL  {name}: HUGEINT column(s) {cols} — wrap the final "
                  f"integer aggregate in CAST(... AS BIGINT)")
            bad.append(name)

    print(f"\n{len(oracles) - len(bad)}/{len(oracles)} oracles HUGEINT-clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
