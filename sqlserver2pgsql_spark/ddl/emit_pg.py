"""PostgreSQL DDL emitters — before / after / unsure script split.

Re-expression of the reference's generate_schema (B15, sqlserver2pgsql.pl:
2580-3171) with the same three-file contract (README.md:73-79):

- before: schemas, tables, columns (load the data against this),
- after : PKs, uniques, indexes, FKs, defaults, comments (apply post-load —
  the constraint/index deferral policy, README.md:75-77),
- unsure: views, CHECK constraints, partial indexes — anything whose
  translated SQL can't be guaranteed.

Emission order matches the reference: schemas → tables → sequences → PK →
unique → indexes → FK → checks → defaults → comments → views.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..catalog.model import Catalog, Column, Table


@dataclass
class EmitOptions:
    """Emission knobs mirroring the reference's CLI (GetOptions :3272-3312).

    - ``validate_constraints``: 'yes' (default — plain FKs), 'after' (FKs
      added NOT VALID; a VALIDATE CONSTRAINT statement per FK goes to the
      unsure script, to run once data is loaded), or 'no' (NOT VALID, never
      validated) — reference :2950-2959. The reference only marks NOT VALID
      when the source constraint had a usable name; this emitter always
      names constraints (fallback ``<table>_<cols>_fkey``), so every FK is
      validatable.
    - ``use_identity_column``: emit ``GENERATED ALWAYS AS IDENTITY`` on the
      owning column instead of CREATE SEQUENCE + nextval default —
      reference :2722-2744.
    """

    validate_constraints: str = "yes"
    use_identity_column: bool = False
    #: reference -skip_citext_length_check: omit the char_length CHECK that
    #: replaces the length qualifier citext drops
    skip_citext_length_check: bool = False

#: spark DDL type → postgres type (targets match the reference's %types
#: matrix, :261-288, from the Spark side of SURVEY §1.3)
_PG_TYPES = {
    "int": "integer",
    "smallint": "smallint",
    "bigint": "bigint",
    "double": "double precision",
    "float": "real",
    "boolean": "boolean",
    "string": "text",
    "date": "date",
    "timestamp": "timestamp",
    "binary": "bytea",
}


def _pg_type(col: Column) -> str:
    st = col.spark_type
    if st == "string" and col.case_insensitive:
        # citext mode (reference :386-418); the length limit becomes a CHECK
        # (char_length) emitted in the unsure script
        return "citext"
    if st.startswith("decimal"):
        return st.replace("decimal", "numeric")
    # char(n)/nchar(n) keep blank-padded char semantics (reference %types
    # :261-288 maps them to char, not varchar)
    if st == "string" and col.type_name in ("char", "nchar") and col.type_qual:
        qual = col.type_qual.replace(" ", "")
        if qual.lower() != "(max)":
            return f"char{qual}"
    # varchar(n)/nvarchar(n) limits survive via the original qualifier
    if st == "string" and col.type_name in ("varchar", "nvarchar", "char", "nchar") and col.type_qual:
        qual = col.type_qual.replace(" ", "")
        if qual.lower() != "(max)":
            return f"varchar{qual}"
    if st == "string" and col.type_name == "uniqueidentifier":
        return "uuid"
    if st == "string" and col.type_name == "xml":
        return "xml"
    if st == "string" and col.type_name == "time":
        # 'HH:MM:SS[.fff]' strings cast cleanly into PG time (reference %types)
        return "time"
    return _PG_TYPES.get(st, "text")


def _quote(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


#: Spark-dialect → PostgreSQL spellings for default expressions: the stored
#: translation targets Spark SQL (current_timestamp() etc.), but PG spells
#: these as parenthesis-free keywords — current_user() is a syntax error on
#: PG 15 (caught by the live-PG e2e, tests/test_live_pg.py)
_PG_DEFAULT_REWRITES = (
    (re.compile(r"\bcurrent_timestamp\(\)", re.IGNORECASE), "CURRENT_TIMESTAMP"),
    (re.compile(r"\bcurrent_user\(\)", re.IGNORECASE), "CURRENT_USER"),
    (re.compile(r"\bcurrent_date\(\)", re.IGNORECASE), "CURRENT_DATE"),
    (re.compile(r"\buuid\(\)", re.IGNORECASE), "gen_random_uuid()"),
)


def _pg_default(sql: str) -> str:
    for pat, rep in _PG_DEFAULT_REWRITES:
        sql = pat.sub(rep, sql)
    return sql


def emit_before(catalog: Catalog, opts: EmitOptions | None = None) -> str:
    opts = opts or EmitOptions()
    out: list[str] = ["\\set ON_ERROR_STOP", "BEGIN;"]
    if any(
        c.case_insensitive
        for _, t in catalog.all_tables()
        for c in t.columns.values()
    ):
        out.append("CREATE EXTENSION IF NOT EXISTS citext;")  # (:2615-2618)
    for k, v in catalog.variables.items():
        out.append(f"\\set {k} '{v}'")
    for sname in sorted(catalog.schemas):
        if sname != "public":
            out.append(f"CREATE SCHEMA IF NOT EXISTS {_quote(sname)};")
    for sname, table in catalog.all_tables():
        cols = []
        for c in table.ordered_columns():
            if c.computed_expr is not None:
                continue  # reference declares varchar + comment (:1576-1616);
                # we keep computed columns virtual (projection-only)
            null = "" if c.nullable else " NOT NULL"
            cols.append(f"  {_quote(c.name)} {_pg_type(c)}{null}")
        out.append(
            f"CREATE TABLE {_quote(sname)}.{_quote(table.name)} (\n"
            + ",\n".join(cols)
            + "\n);"
        )
    for sname in sorted(catalog.schemas):
        for seq in catalog.schemas[sname].sequences.values():
            if opts.use_identity_column and seq.owner_table:
                continue  # ALTER COLUMN … ADD GENERATED … goes in the after script
            parts = [f"CREATE SEQUENCE {_quote(sname)}.{_quote(seq.name)}"]
            if seq.step != 1:
                parts.append(f"INCREMENT BY {seq.step}")
            if seq.step < 0:
                parts.append("MINVALUE -9223372036854775807")
            parts.append(f"START WITH {seq.start}")
            out.append(" ".join(parts) + ";")
    out.append("COMMIT;")
    return "\n".join(out) + "\n"


def emit_after(catalog: Catalog, opts: EmitOptions | None = None) -> str:
    opts = opts or EmitOptions()
    out: list[str] = ["\\set ON_ERROR_STOP", "BEGIN;"]
    qual = lambda s, t: f"{_quote(s)}.{_quote(t)}"  # noqa: E731
    if opts.use_identity_column:
        # IDENTITY becomes a true identity column on the owner (:2722-2744)
        for sname in sorted(catalog.schemas):
            for seq in catalog.schemas[sname].sequences.values():
                if not seq.owner_table:
                    continue
                stmt = (
                    f"ALTER TABLE {_quote(sname)}.{_quote(seq.owner_table)} "
                    f"ALTER COLUMN {_quote(seq.owner_column)} "
                    "ADD GENERATED ALWAYS AS IDENTITY"
                )
                details = []
                if seq.start != 1:
                    details.append(f"START WITH {seq.start}")
                if seq.step != 1:
                    details.append(f"INCREMENT BY {seq.step}")
                if details:
                    stmt += " ( " + " ".join(details) + " )"
                out.append(stmt + ";")
    else:
        # sequence mode must WIRE the sequence to its column or inserts
        # without an explicit id fail — the serial default (:1449-1460)
        for sname in sorted(catalog.schemas):
            for seq in catalog.schemas[sname].sequences.values():
                if not seq.owner_table:
                    continue
                seq_lit = f"{sname}.{seq.name}".replace("'", "''")
                out.append(
                    f"ALTER TABLE {_quote(sname)}.{_quote(seq.owner_table)} "
                    f"ALTER COLUMN {_quote(seq.owner_column)} "
                    f"SET DEFAULT nextval('{seq_lit}');"
                )
    for sname, table in catalog.all_tables():
        tq = qual(sname, table.name)
        if table.primary_key:
            cols = ", ".join(_quote(c) for c in table.primary_key.cols)
            name = table.primary_key.name or f"{table.name}_pkey"
            out.append(f"ALTER TABLE {tq} ADD CONSTRAINT {_quote(name)} PRIMARY KEY ({cols});")
        for u in table.uniques:
            cols = ", ".join(_quote(c) for c in u.cols)
            name = u.name or f"{table.name}_{'_'.join(u.cols)}_key"
            out.append(f"ALTER TABLE {tq} ADD CONSTRAINT {_quote(name)} UNIQUE ({cols});")
    for sname, table in catalog.all_tables():
        tq = qual(sname, table.name)
        for idx in table.indexes.values():
            if idx.where_raw is not None:
                continue  # partial indexes → unsure
            cols = ", ".join(
                f"{_quote(c.name)}{'' if c.ascending else ' DESC'}" for c in idx.cols
            )
            stmt = f"CREATE {'UNIQUE ' if idx.unique else ''}INDEX {_quote(idx.name)} ON {tq} ({cols})"
            if idx.include:
                stmt += " INCLUDE (" + ", ".join(_quote(c) for c in idx.include) + ")"
            stmt += ";"
            if idx.disabled:
                stmt = "-- disabled in source: " + stmt  # (:2841-2844)
            out.append(stmt)
    for sname, table in catalog.all_tables():
        tq = qual(sname, table.name)
        for fk in table.foreign_keys:
            cols = ", ".join(_quote(c) for c in fk.cols)
            rcols = ", ".join(_quote(c) for c in fk.ref_cols)
            name = fk.name or f"{table.name}_{'_'.join(fk.cols)}_fkey"
            stmt = (
                f"ALTER TABLE {tq} ADD CONSTRAINT {_quote(name)} FOREIGN KEY ({cols}) "
                f"REFERENCES {_quote(fk.ref_schema)}.{_quote(fk.ref_table)} ({rcols})"
            )
            if fk.on_delete:
                stmt += f" ON DELETE {fk.on_delete}"
            if fk.on_update:
                stmt += f" ON UPDATE {fk.on_update}"
            if opts.validate_constraints in ("after", "no"):
                # loaded-data FKs are added unvalidated (:2950-2959); 'after'
                # pairs this with VALIDATE CONSTRAINT in the unsure script
                stmt += " NOT VALID"
            out.append(stmt + ";")
        for c in table.ordered_columns():
            if c.default is not None and not c.default.unsure:
                out.append(
                    f"ALTER TABLE {tq} ALTER COLUMN {_quote(c.name)} SET DEFAULT {_pg_default(c.default.sql)};"
                )
            if c.comment:
                out.append(
                    f"COMMENT ON COLUMN {tq}.{_quote(c.name)} IS '{c.comment.replace(chr(39), chr(39)*2)}';"
                )
        if table.comment:
            out.append(f"COMMENT ON TABLE {tq} IS '{table.comment.replace(chr(39), chr(39)*2)}';")
    out.append("COMMIT;")
    return "\n".join(out) + "\n"


def emit_unsure(catalog: Catalog, opts: EmitOptions | None = None) -> str:
    opts = opts or EmitOptions()
    out: list[str] = []
    qual = lambda s, t: f"{_quote(s)}.{_quote(t)}"  # noqa: E731
    if opts.validate_constraints == "after":
        for sname, table in catalog.all_tables():
            for fk in table.foreign_keys:
                name = fk.name or f"{table.name}_{'_'.join(fk.cols)}_fkey"
                out.append(
                    f"ALTER TABLE {qual(sname, table.name)} "
                    f"VALIDATE CONSTRAINT {_quote(name)};"
                )
    for sname, table in catalog.all_tables():
        tq = qual(sname, table.name)
        for ck in table.checks:
            name = ck.name or "check"
            out.append(f"ALTER TABLE {tq} ADD CONSTRAINT {_quote(name)} CHECK ({ck.sql});")
        for idx in table.indexes.values():
            if idx.where_raw is None:
                continue
            cols = ", ".join(_quote(c.name) for c in idx.cols)
            out.append(
                f"CREATE {'UNIQUE ' if idx.unique else ''}INDEX {_quote(idx.name)} "
                f"ON {tq} ({cols}) WHERE {idx.where_sql or idx.where_raw};"
            )
        for c in table.ordered_columns():
            if c.default is not None and c.default.unsure:
                out.append(
                    f"ALTER TABLE {tq} ALTER COLUMN {_quote(c.name)} SET DEFAULT {_pg_default(c.default.sql)};"
                )
            if (
                not opts.skip_citext_length_check
                and c.case_insensitive
                and c.type_qual
                and c.type_qual.strip("() ").isdigit()
            ):
                # citext drops the length qualifier → CHECK instead (:386-418)
                n = c.type_qual.strip("() ")
                out.append(
                    f"ALTER TABLE {tq} ADD CONSTRAINT {_quote(c.name + '_len')} "
                    f"CHECK (char_length({_quote(c.name)}) <= {n});"
                )
    for sname, vname in catalog.view_order:
        v = catalog.schemas[sname].views[vname]
        cols = f" ({', '.join(_quote(c) for c in v.columns)})" if v.columns else ""
        out.append(f"CREATE VIEW {_quote(sname)}.{_quote(vname)}{cols} AS {v.sql or v.raw_sql};")
    # trigger functions, then the triggers that bind them (reference
    # :3122-3161 — declared last in the unsure script, after everything they
    # might reference exists)
    for sname in sorted(catalog.schemas):
        for fname in sorted(catalog.schemas[sname].trig_functions):
            tf = catalog.schemas[sname].trig_functions[fname]
            out.append(
                f"CREATE FUNCTION {_quote(sname)}.{_quote(tf.name)}() "
                f"RETURNS trigger LANGUAGE {tf.language} AS $def$\n"
                f"{tf.body}\n$def$;"
            )
    for sname, table in catalog.all_tables():
        for trg in table.triggers:
            out.append(
                f"CREATE TRIGGER {_quote(trg.name)} {trg.events} "
                f"ON {qual(sname, table.name)} {trg.when} "
                f"EXECUTE PROCEDURE {_quote(sname)}.{_quote(trg.function)}();"
            )
    return "\n".join(out) + "\n"
