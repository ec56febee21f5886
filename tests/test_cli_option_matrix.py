"""Reference test-strategy parity (SURVEY §5 layer 2): the converter runs
over every regression corpus file under a cross-product of option flags
without crashing — plus CLI end-to-end checks."""

from __future__ import annotations

import glob
import itertools
import json

import pytest

from sqlserver2pgsql_spark.catalog.conflicts import resolve_name_conflicts
from sqlserver2pgsql_spark.cli import main as cli_main
from sqlserver2pgsql_spark.ddl import parse_dump
from sqlserver2pgsql_spark.ddl.emit_pg import emit_after, emit_before, emit_unsure
from sqlserver2pgsql_spark.ddl.parser import ParserOptions

CORPUS = sorted(
    glob.glob("/root/reference/regression/*.sql")
    + glob.glob("/root/reference/regression/basic_test/*.sql")
)

_FLAG_MATRIX = list(
    itertools.product([False, True], [False, True], ["lower", "keep"], [False, True])
)  # case_insensitive × numeric_as_int × identifier_mode × drop_rowversion


@pytest.mark.parametrize("path", CORPUS, ids=[p.split("/")[-1] for p in CORPUS])
def test_option_matrix_never_crashes(path):
    """Mirror of t/test_convert.t:19-61 — every corpus file × every flag
    combination parses and emits all three scripts."""
    for ci, num, ident, drop_rv in _FLAG_MATRIX:
        cat = parse_dump(
            path,
            ParserOptions(
                identifier_mode=ident,
                numeric_as_int=num,
                case_insensitive=ci,
                drop_rowversion=drop_rv,
            ),
        )
        resolve_name_conflicts(cat)
        assert emit_before(cat) and emit_after(cat) is not None
        emit_unsure(cat)


def test_citext_mode_emission():
    cat = parse_dump(
        "/root/reference/regression/issue_59.sql", ParserOptions(case_insensitive=True)
    )
    before = emit_before(cat)
    assert "CREATE EXTENSION IF NOT EXISTS citext;" in before
    assert '"account_number" citext' in before
    assert "char_length" in emit_unsure(cat)  # dropped length → CHECK


def test_cli_convert_end_to_end(tmp_path):
    out = {k: str(tmp_path / f"{k}.sql") for k in ("before", "after", "unsure")}
    plans = str(tmp_path / "plans.json")
    rc = cli_main(
        [
            "convert",
            "-f", "/root/reference/regression/reg_tests.sql",
            "-b", out["before"],
            "-a", out["after"],
            "-u", out["unsure"],
            "--plan-out", plans,
            "--num",
        ]
    )
    assert rc == 0
    assert "CREATE TABLE" in open(out["before"]).read()
    assert "PRIMARY KEY" in open(out["after"]).read()
    payload = json.loads(open(plans).read())
    by_table = {p["table"]: p for p in payload}
    assert by_table["testtable"]["pk_sort_order_safe"] is True
    assert by_table["generatedcolumns"]["mode"] == "full"
