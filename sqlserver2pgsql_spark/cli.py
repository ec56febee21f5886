"""Command-line entry point — the reference's CLI surface, Spark-first.

The reference is invoked as
``sqlserver2pgsql.pl -f dump.sql -b before.sql -a after.sql -u unsure.sql
[-k kettledir] [-i] [-num] [-nr] [-keep_identifier_case] [-relabel_schemas]``
(README.md:49-170). This CLI covers the same surface:

    python -m sqlserver2pgsql_spark convert -f dump.sql -b before.sql \\
        -a after.sql -u unsure.sql [--case-insensitive] [--num] \\
        [--keep-identifier-case] [--relabel 'dbo=>public;etl=>etl'] \\
        [--drop-rowversion] [--plan-out plans.json]

``convert`` parses the dump into the catalog, resolves PG name conflicts,
and writes the three DDL scripts plus (optionally) the per-table transfer
plans as JSON — the engine analog of generating Kettle jobs (B19).
"""

from __future__ import annotations

import argparse
import json
import sys

from .catalog.conflicts import resolve_name_conflicts
from .catalog.identifiers import parse_relabel_arg
from .ddl import parse_dump
from .ddl.emit_pg import emit_after, emit_before, emit_unsure
from .ddl.parser import ParserOptions
from .plans.transfer import build_transfer_plans
from .sources.jdbc import partitioned_read_spec, pk_sort_order_safe


def _convert(args: argparse.Namespace) -> int:
    options = ParserOptions(
        identifier_mode="keep" if args.keep_identifier_case else "lower",
        numeric_as_int=args.num,
        relabel=parse_relabel_arg(args.relabel) if args.relabel else None,
        drop_rowversion=args.drop_rowversion,
        case_insensitive=args.case_insensitive,
    )
    catalog = parse_dump(args.file, options)
    renames = resolve_name_conflicts(catalog)

    if args.before:
        open(args.before, "w").write(emit_before(catalog))
    if args.after:
        open(args.after, "w").write(emit_after(catalog))
    if args.unsure:
        open(args.unsure, "w").write(emit_unsure(catalog))

    if args.col_map:
        # reference -col_map (:2588-2610): original → normalized identifiers
        mapping = {
            f"{sname}.{t.name}": {
                "orig_schema": t.orig_schema,
                "columns": {c.orig_name: c.name for c in t.ordered_columns()},
            }
            for sname, t in catalog.all_tables()
        }
        open(args.col_map, "w").write(json.dumps(mapping, indent=2))

    if args.plan_out:
        plans = build_transfer_plans(catalog, incremental=args.incremental)
        payload = [
            {
                "schema": p.schema,
                "table": p.table.name,
                "mode": p.mode,
                "partitioned_read": partitioned_read_spec(p.table),
                "pk_sort_order_safe": pk_sort_order_safe(p.table),
                "columns": [
                    {"name": c.name, "type": c.spark_type, "nullable": c.nullable}
                    for c in p.table.ordered_columns()
                ],
            }
            for p in plans
        ]
        open(args.plan_out, "w").write(json.dumps(payload, indent=2))

    n_tables = sum(len(s.tables) for s in catalog.schemas.values())
    n_views = sum(len(s.views) for s in catalog.schemas.values())
    print(
        f"parsed {n_tables} tables, {n_views} views across "
        f"{len(catalog.schemas)} schemas; {len(renames)} conflict renames"
    )
    for w in catalog.warnings:
        print(f"warning: {w}", file=sys.stderr)
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="sqlserver2pgsql_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="parse an SSMS DDL dump; emit PG DDL + plans")
    c.add_argument("-f", "--file", required=True, help="SQL Server DDL dump")
    c.add_argument("-b", "--before", help="output: pre-load DDL script")
    c.add_argument("-a", "--after", help="output: post-load DDL script")
    c.add_argument("-u", "--unsure", help="output: unguaranteed DDL script")
    c.add_argument("--plan-out", help="output: per-table transfer plans JSON")
    c.add_argument("--col-map", help="output: original→normalized identifier map JSON")
    c.add_argument("--incremental", action="store_true")
    c.add_argument("-i", "--case-insensitive", action="store_true")
    c.add_argument("--num", action="store_true", help="numeric(p,0) → int types")
    c.add_argument("--keep-identifier-case", action="store_true")
    c.add_argument("--relabel", help="schema map 'src=>dst;…' (default dbo=>public)")
    c.add_argument("--drop-rowversion", action="store_true")
    c.set_defaults(fn=_convert)

    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    except Exception as e:  # DdlParseError, bad relabel spec, …
        print(f"error: {type(e).__name__}: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
