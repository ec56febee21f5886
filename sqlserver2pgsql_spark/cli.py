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
from .ddl.emit_pg import EmitOptions, emit_after, emit_before, emit_unsure
from .ddl.parser import ParserOptions
from .plans.transfer import build_transfer_plans
from .sources.jdbc import partitioned_read_spec, pk_sort_order_safe


#: conf-file option name → argparse attribute (CLI wins; conf fills gaps —
#: reference :144-148). Only names that differ are listed.
_CONF_TO_ARG = {
    "filename": "file",
    "before_file": "before",
    "after_file": "after",
    "unsure_file": "unsure",
    "convert_numeric_to_int": "num",
    "relabel_schemas": "relabel",
    "norelabel_dbo": "nr",
    "parallelism_in": "pi",
    "parallelism_out": "po",
    "kettle": "kettle_dir",
}


def _apply_conf(args: argparse.Namespace) -> None:
    if not getattr(args, "conf", None):
        return
    from .conf import parse_conf_file

    for name, value in parse_conf_file(args.conf).items():
        attr = _CONF_TO_ARG.get(name, name)
        # identity checks, not `in (None, False)`: an explicit integer 0 from
        # the CLI (e.g. -pi 0) equals False and must still win over the conf
        # (the reference keeps any `defined` CLI value, :142-146)
        current = getattr(args, attr, None)
        if current is None or current is False:
            setattr(args, attr, value)


def _convert(args: argparse.Namespace) -> int:
    _apply_conf(args)
    args.validate_constraints = args.validate_constraints or "yes"
    args.col_map_file_delimiter = args.col_map_file_delimiter or "\t"
    if not args.file:
        print("error: no dump file given (-f or conf 'sql server dump filename')",
              file=sys.stderr)
        return 2
    if args.keep_identifier_case:
        ident_mode = "keep"
    elif args.camel_to_snake:
        ident_mode = "snake"
    else:
        ident_mode = "lower"
    relabel = parse_relabel_arg(args.relabel) if args.relabel else {}
    if args.nr:
        relabel.setdefault("dbo", "dbo")  # -nr: keep dbo as dbo (reference -nr)
    options = ParserOptions(
        identifier_mode=ident_mode,
        numeric_as_int=args.num,
        relabel=relabel or None,
        drop_rowversion=args.drop_rowversion,
        case_insensitive=args.case_insensitive,
    )
    catalog = parse_dump(args.file, options)
    renames = resolve_name_conflicts(catalog)

    emit_opts = EmitOptions(
        validate_constraints=args.validate_constraints,
        use_identity_column=args.use_identity_column,
        skip_citext_length_check=args.skip_citext_length_check,
    )
    if args.before:
        open(args.before, "w").write(emit_before(catalog, emit_opts))
    if args.after:
        open(args.after, "w").write(emit_after(catalog, emit_opts))
    if args.unsure:
        open(args.unsure, "w").write(emit_unsure(catalog, emit_opts))

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

    if args.col_map_file:
        # reference delimited format (:2690-2706): one line per column —
        # orig_schema D table D col D new_schema D new_table D new_col
        d = args.col_map_file_delimiter
        lines = []
        if args.col_map_file_header:
            lines.append(d.join(
                ["orig_schema", "orig_table", "orig_column",
                 "schema", "table", "column"]
            ))
        for sname, t in catalog.all_tables():
            for c in t.ordered_columns():
                lines.append(d.join(
                    [t.orig_schema, t.name, c.orig_name, sname, t.name, c.name]
                ))
        open(args.col_map_file, "w").write("\n".join(lines) + "\n")

    plan_out = args.plan_out
    if not plan_out and args.kettle_dir:
        # -k kettledir: the reference generates one Kettle job per table
        # there; the Spark analog is the transfer-plan JSON
        import os

        os.makedirs(args.kettle_dir, exist_ok=True)
        plan_out = os.path.join(args.kettle_dir, "transfer_plans.json")

    if plan_out:
        from .conf import mssql_jdbc_url, pg_jdbc_url

        plans = build_transfer_plans(catalog, incremental=args.incremental)
        payload = {
            "options": {
                "parallelism_in": args.pi,
                "parallelism_out": args.po,
                # sort_size is a documented no-op: Spark's external sort
                # spills to disk on its own; there is no Kettle in-memory
                # sort buffer to size (reference -sort_size)
                "sort_size": args.sort_size,
                "use_pk_if_possible": args.use_pk_if_possible,
                "ignore_errors": bool(args.ignore_errors),
            },
            "connections": {
                "mssql_url": mssql_jdbc_url(
                    args.sh, args.sd, args.sp, args.si, bool(args.sforce_ssl)
                )
                if args.sh and args.sd
                else None,
                "mssql_user": args.su,
                "pg_url": pg_jdbc_url(
                    args.ph, args.pd, args.pp, bool(args.pforce_ssl),
                    bool(args.stringtype_unspecified),
                )
                if args.ph and args.pd
                else None,
                "pg_user": args.pu,
            },
            "tables": [
                {
                    "schema": p.schema,
                    "table": p.table.name,
                    "mode": p.mode,
                    "partitioned_read": partitioned_read_spec(
                        p.table, num_partitions=args.pi or 8
                    ),
                    "pk_sort_order_safe": pk_sort_order_safe(p.table),
                    # -ignore_errors: route reject rows to a quarantine sink
                    # instead of failing the load (operators/quarantine.py)
                    "quarantine": bool(args.ignore_errors),
                    "columns": [
                        {"name": c.name, "type": c.spark_type, "nullable": c.nullable}
                        for c in p.table.ordered_columns()
                    ],
                }
                for p in plans
            ],
        }
        open(plan_out, "w").write(json.dumps(payload, indent=2))

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
    c.add_argument("-f", "--file", help="SQL Server DDL dump (or conf file key)")
    c.add_argument("-b", "--before", help="output: pre-load DDL script")
    c.add_argument("-a", "--after", help="output: post-load DDL script")
    c.add_argument("-u", "--unsure", help="output: unguaranteed DDL script")
    c.add_argument("-conf", "--conf", help="conf file (reference format; CLI wins)")
    c.add_argument("--plan-out", help="output: per-table transfer plans JSON")
    c.add_argument("--col-map", help="output: original→normalized identifier map JSON")
    c.add_argument("--incremental", action="store_true")
    c.add_argument("-i", "--case-insensitive", action="store_true")
    c.add_argument("--num", action="store_true", help="numeric(p,0) → int types")
    c.add_argument("--keep-identifier-case", action="store_true")
    c.add_argument("--relabel", help="schema map 'src=>dst;…' (default dbo=>public)")
    c.add_argument("-nr", action="store_true", dest="nr",
                   help="do NOT relabel dbo to public")
    c.add_argument("--camel_to_snake", "--camel-to-snake", action="store_true",
                   dest="camel_to_snake", help="camelCase → snake_case identifiers")
    c.add_argument("--drop-rowversion", action="store_true")
    c.add_argument(
        "--validate-constraints", "--validate_constraints",
        dest="validate_constraints",
        choices=["yes", "after", "no"],
        default=None,  # resolved to 'yes' after the conf merge
        help="FK policy: yes=plain, after=NOT VALID + VALIDATE in unsure, no=NOT VALID",
    )
    c.add_argument(
        "--use-identity-column", "--use_identity_column",
        dest="use_identity_column",
        action="store_true",
        help="emit GENERATED ALWAYS AS IDENTITY instead of sequences",
    )
    c.add_argument("--skip_citext_length_check", action="store_true",
                   help="omit char_length CHECKs on citext columns")
    # Kettle-analog / transfer knobs
    c.add_argument("-k", "--kettle-dir", dest="kettle_dir",
                   help="directory for generated transfer plans (reference -k)")
    c.add_argument("-pi", dest="pi", type=int,
                   help="read parallelism (JDBC partitioned scan)")
    c.add_argument("-po", dest="po", type=int, help="write parallelism")
    c.add_argument("--sort_size", dest="sort_size", type=int,
                   help="accepted for parity; no-op (Spark spills sorts itself)")
    c.add_argument("--use_pk_if_possible", dest="use_pk_if_possible",
                   help="prefer PK order for sorted-merge diffs (list or regex)")
    c.add_argument("--ignore_errors", action="store_true",
                   help="route reject rows to quarantine instead of failing")
    # connection endpoints (reference sd/sh/si/sp/su/sw, pd/ph/pp/pu/pw)
    for opt, hlp in (
        ("sd", "SQL Server database"), ("sh", "SQL Server host"),
        ("si", "SQL Server instance"), ("sp", "SQL Server port"),
        ("su", "SQL Server user"), ("sw", "SQL Server password"),
        ("pd", "PostgreSQL database"), ("ph", "PostgreSQL host"),
        ("pp", "PostgreSQL port"), ("pu", "PostgreSQL user"),
        ("pw", "PostgreSQL password"),
    ):
        c.add_argument(f"-{opt}", dest=opt, help=hlp)
    c.add_argument("--sforce_ssl", action="store_true", help="SQL Server TLS")
    c.add_argument("--pforce_ssl", action="store_true", help="PostgreSQL TLS")
    c.add_argument("--stringtype_unspecified", action="store_true",
                   help="PG JDBC stringtype=unspecified (citext/uuid/xml binds)")
    # col map in the reference's delimited-file format
    c.add_argument("--col_map_file", help="output: delimited identifier map")
    c.add_argument("--col_map_file_header", action="store_true")
    c.add_argument("--col_map_file_delimiter", default=None)
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
