"""Every registered query must match its DuckDB oracle at sf0.001 — the same
comparison the driver runs at sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_matches_oracle

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def test_all_queries_registered():
    assert _QUERIES, "queries() must not be empty"
    unknown_oracles = set(_ORACLES) - set(_QUERIES)
    assert not unknown_oracles


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = _QUERIES[name](spark, SF_DIR)
    if name in _ORACLES:
        assert_matches_oracle(df, duck, _ORACLES[name])
    else:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
