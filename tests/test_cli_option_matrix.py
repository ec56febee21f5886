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
    by_table = {p["table"]: p for p in payload["tables"]}
    assert by_table["testtable"]["pk_sort_order_safe"] is True
    assert by_table["generatedcolumns"]["mode"] == "full"
    assert payload["options"]["ignore_errors"] is False
    assert payload["connections"]["mssql_url"] is None


def test_cli_conf_file_and_full_option_surface(tmp_path):
    conf = tmp_path / "migrate.conf"
    conf.write_text(
        """
# reference conf format — keys verbatim from sqlserver2pgsql.pl:84-121
sql server database = SourceDb
sql server host = mssql.example.internal   # host comment
sql server port = 1433
sql server username = loader
sql server password = hunter2
postgresql database = targetdb
postgresql host = pg.example.internal
postgresql port = 5432
postgresql username = pgloader
sql server dump filename = /root/reference/regression/reg_tests.sql
parallelism_in = 4
parallelism_out = 2
sort size = 50000
ignore errors = 1
stringtype unspecified = 1
use identity column = 1
validate constraints = after
"""
    )
    out = {k: str(tmp_path / f"{k}.sql") for k in ("before", "after", "unsure")}
    plans = str(tmp_path / "plans.json")
    colmap = str(tmp_path / "colmap.tsv")
    rc = cli_main(
        [
            "convert",
            "-conf", str(conf),
            "-b", out["before"],
            "-a", out["after"],
            "-u", out["unsure"],
            "--plan-out", plans,
            "--col_map_file", colmap,
            "--col_map_file_header",
        ]
    )
    assert rc == 0
    payload = json.loads(open(plans).read())
    assert payload["options"] == {
        "parallelism_in": 4,
        "parallelism_out": 2,
        "sort_size": 50000,
        "use_pk_if_possible": None,
        "ignore_errors": True,
    }
    conns = payload["connections"]
    assert conns["mssql_url"] == (
        "jdbc:sqlserver://mssql.example.internal:1433;databaseName=SourceDb"
    )
    assert conns["pg_url"] == (
        "jdbc:postgresql://pg.example.internal:5432/targetdb?stringtype=unspecified"
    )
    assert all(t["quarantine"] for t in payload["tables"])
    # conf-driven emit options took effect
    after_sql = open(out["after"]).read()
    assert "NOT VALID" in after_sql
    assert "VALIDATE CONSTRAINT" in open(out["unsure"]).read()
    # delimited col map with header
    lines = open(colmap).read().splitlines()
    assert lines[0].split("\t")[:3] == ["orig_schema", "orig_table", "orig_column"]
    assert len(lines) > 1


def test_cli_conf_unknown_key_dies(tmp_path):
    conf = tmp_path / "bad.conf"
    conf.write_text("frobnicate the database = yes\n")
    rc = cli_main(["convert", "-conf", str(conf), "-f",
                   "/root/reference/regression/reg_tests.sql"])
    assert rc == 1


def test_cli_nr_and_camel_to_snake(tmp_path):
    out = str(tmp_path / "before.sql")
    rc = cli_main(
        ["convert", "-f", "/root/reference/regression/reg_tests.sql",
         "-b", out, "-nr", "--camel_to_snake"]
    )
    assert rc == 0
    before = open(out).read()
    assert '"dbo"' in before  # -nr kept dbo
    assert "CREATE SCHEMA IF NOT EXISTS" in before
