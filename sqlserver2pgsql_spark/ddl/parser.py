"""SSMS-dump DDL parser → Catalog.

Own-design statement parser covering the reference's handled/ignored
statement sets (B3-B9, B16-B18; dispatch table sqlserver2pgsql.pl:1535-2574)
with the same behavior contract: recognized statements are parsed fully,
listed noise is skipped, anything else raises DdlParseError ("die on all
error conditions", :7-8).

Validated against every file in /root/reference/regression/ (tests/test_ddl.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..catalog.identifiers import normalize_identifier, relabel_schema
from ..catalog.model import (
    Catalog,
    CheckConstraint,
    Column,
    DefaultValue,
    ForeignKey,
    IdentitySpec,
    Index,
    IndexColumn,
    Schema,
    Sequence,
    Table,
    TableType,
    UniqueConstraint,
    View,
)
from ..catalog.types import convert_type
from ..functions.translate import translate_tsql_expr
from .reader import clean_statements, read_dump


class DdlParseError(Exception):
    pass


_IDENT = r"\[?([^\]\s.(]+)\]?"  # [Name] or Name
_QIDENT = rf"(?:{_IDENT}\.)?{_IDENT}"  # [schema].[name] or name

#: statements skipped wholesale (reference ignore set, :1746-1785, :2424-2570)
_SKIP = re.compile(
    r"^\s*(USE\b|SET\b|GRANT\b|DENY\b|REVOKE\b|PRINT\b|DECLARE\b|"
    r"BEGIN\b|END\b|IF\b|CREATE\s+DATABASE\b|ALTER\s+DATABASE\b|"
    r"CREATE\s+USER\b|ALTER\s+USER\b|CREATE\s+LOGIN\b|ALTER\s+LOGIN\b|"
    r"CREATE\s+ROLE\b|ALTER\s+ROLE\b|"
    r"CREATE\s+FULLTEXT\b|ALTER\s+FULLTEXT\b|"
    r"CREATE\s+XML\s+SCHEMA\s+COLLECTION\b|"
    r"CREATE\s+(OR\s+ALTER\s+)?(PROC(EDURE)?|FUNCTION|TRIGGER)\b|"
    r"ALTER\s+(PROC(EDURE)?|FUNCTION|TRIGGER)\b|"
    r"CREATE\s+PARTITION\b|CREATE\s+ASSEMBLY\b|"
    r"DROP\b|INSERT\b|UPDATE\b|DELETE\b|"
    r"EXEC(UTE)?\s+(?!sys\.sp_addextendedproperty|sp_addextendedproperty))",
    re.IGNORECASE,
)


def _split_top_commas(s: str) -> list[str]:
    parts, depth, cur, in_str = [], 0, [], False
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str:
            cur.append(ch)
            if ch == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    cur.append("'")
                    i += 2
                    continue
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if "".join(cur).strip():
        parts.append("".join(cur).strip())
    return parts


def _outer_parens(s: str, start: int = 0) -> tuple[str, int]:
    """Return (inner text, index after closing paren) of the first balanced
    paren group at/after ``start`` (string-literal-aware)."""
    i = s.index("(", start)
    depth = 0
    in_str = False
    for j in range(i, len(s)):
        ch = s[j]
        if in_str:
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[i + 1 : j], j + 1
    raise DdlParseError(f"unbalanced parens in: {s[:120]!r}")


def _cols_list(inner: str) -> list[IndexColumn]:
    out = []
    for item in _split_top_commas(inner):
        m = re.match(rf"{_IDENT}\s*(ASC|DESC)?\s*$", item.strip(), re.IGNORECASE)
        if not m:
            raise DdlParseError(f"bad index/key column: {item!r}")
        out.append(
            IndexColumn(
                name=normalize_identifier(m.group(1)),
                ascending=(m.group(2) or "ASC").upper() == "ASC",
            )
        )
    return out


@dataclass
class ParserOptions:
    identifier_mode: str = "lower"
    numeric_as_int: bool = False
    relabel: dict[str, str] | None = None
    drop_rowversion: bool = False
    #: reference -i flag: text columns become case-insensitive (citext in PG;
    #: here: marked for lower()-normalized comparison, :386-418)
    case_insensitive: bool = False


class DdlParser:
    def __init__(self, options: ParserOptions | None = None):
        self.opt = options or ParserOptions()
        self.catalog = Catalog()

    # -- helpers ------------------------------------------------------------

    def _norm(self, name: str) -> str:
        return normalize_identifier(name, self.opt.identifier_mode, self.catalog.warnings)

    def _schema_table(self, schema: str | None, table: str) -> tuple[str, str]:
        s = relabel_schema((schema or "dbo").lower(), self.opt.relabel)
        return s, self._norm(table)

    def _get_table(self, schema: str | None, table: str) -> Table:
        s, t = self._schema_table(schema, table)
        sch = self.catalog.schema(s)
        if t not in sch.tables:
            raise DdlParseError(f"ALTER references unknown table {s}.{t}")
        return sch.tables[t]

    def _translate(self, expr: str) -> tuple[str, bool]:
        r = translate_tsql_expr(expr)
        return r.sql, r.unsure

    def _translate_with(self, expr: str, string_idents: set[str]) -> tuple[str, bool]:
        r = translate_tsql_expr(expr, string_idents)
        return r.sql, r.unsure

    # -- entry --------------------------------------------------------------

    def parse(self, text: str) -> Catalog:
        for stmt in clean_statements(text):
            self._dispatch(stmt)
        return self.catalog

    def _dispatch(self, stmt: str) -> None:
        first = stmt.lstrip()
        if re.match(r"^:setvar\s", first, re.IGNORECASE):
            m = re.match(r':setvar\s+(\S+)\s+"?([^"]*)"?\s*$', first, re.IGNORECASE)
            if m:
                self.catalog.variables[m.group(1)] = m.group(2)
            return
        if re.match(r"^\s*ALTER\s+DATABASE\b.*ARITHABORT\s+OFF", first, re.IGNORECASE | re.DOTALL):
            self.catalog.warnings.append(
                "ARITHABORT OFF detected — computed-column semantics may differ "
                "(reference warns, sqlserver2pgsql.pl:2496-2508)"
            )
            return
        handlers = [
            (r"^\s*CREATE\s+TABLE\b", self._create_table),
            (r"^\s*ALTER\s+TABLE\b", self._alter_table),
            (r"^\s*CREATE\s+(UNIQUE\s+)?(NON)?CLUSTERED\s+INDEX\b", self._create_index),
            (r"^\s*CREATE\s+(UNIQUE\s+)?INDEX\b", self._create_index),
            (r"^\s*ALTER\s+INDEX\b", self._alter_index),
            (r"^\s*CREATE\s+VIEW\b", self._create_view),
            (r"^\s*CREATE\s+TYPE\b", self._create_type),
            (r"^\s*CREATE\s+SCHEMA\b", self._create_schema),
            (r"^\s*CREATE\s+SEQUENCE\b", self._create_sequence),
            (r"^\s*EXEC(UTE)?\s+(sys\.)?sp_addextendedproperty\b", self._extended_property),
        ]
        for pat, fn in handlers:
            if re.match(pat, first, re.IGNORECASE):
                fn(stmt)
                return
        if _SKIP.match(first):
            return
        raise DdlParseError(f"unknown statement: {first.splitlines()[0][:120]!r}")

    # -- CREATE TABLE -------------------------------------------------------

    _COLUMN_RE = re.compile(
        rf"^{_IDENT}\s+"  # column name
        r"(?:\[(?P<bt>[a-zA-Z_][^\]]*)\]|(?P<ut>[a-zA-Z_]\w*))"  # [type] | type
        r"\s*(?P<qual>\(\s*(?:\d+|max)\s*(?:,\s*\d+\s*)?\))?"  # qualifier
        r"(?P<rest>.*)$",
        re.IGNORECASE | re.DOTALL,
    )

    def _create_table(self, stmt: str) -> None:
        m = re.match(rf"\s*CREATE\s+TABLE\s+{_QIDENT}\s*\(", stmt, re.IGNORECASE)
        if not m:
            raise DdlParseError(f"bad CREATE TABLE header: {stmt[:120]!r}")
        schema_raw, name_raw = m.group(1), m.group(2)
        s, t = self._schema_table(schema_raw, name_raw)
        body, _ = _outer_parens(stmt, stmt.index("("))

        table = Table(name=t, orig_schema=(schema_raw or "dbo"))
        sch = self.catalog.schema(s)
        sch.tables[t] = table

        pos = 0
        for item in _split_top_commas(body):
            item = item.strip()
            if not item:
                continue
            if re.match(
                r"^(CONSTRAINT\b|PRIMARY\s+KEY\b|UNIQUE\b|FOREIGN\s+KEY\b|CHECK\b)",
                item,
                re.IGNORECASE,
            ):
                self._table_constraint(s, table, item)
            else:
                pos += 1
                col = self._parse_column(s, t, item, pos)
                if col is not None:
                    table.columns[col.name] = col
        self._update_lob_flag(table)

    def _update_lob_flag(self, table: Table) -> None:
        table.has_lobs = any(
            c.type_name in ("text", "ntext", "image", "xml")
            or (c.type_qual or "").replace(" ", "").lower() == "(max)"
            for c in table.columns.values()
        )

    def _parse_column(self, schema: str, tname: str, item: str, pos: int) -> Column | None:
        # computed column: [name] AS (expr) [PERSISTED] [NOT NULL] (:1576-1616)
        m = re.match(rf"^{_IDENT}\s+AS\s+\(", item, re.IGNORECASE)
        if m:
            expr, end = _outer_parens(item, item.index("(", m.end() - 1))
            rest = item[end:]
            # the catalog knows which referenced columns are strings, so
            # T-SQL `+` translates to concat for them (FIXTURES.md F6: the
            # reference punts computed columns to comments, :1576-1616 —
            # this engine evaluates them as projections)
            tbl = self.catalog.schema(schema).tables.get(tname)
            string_cols = (
                {c.name for c in tbl.columns.values() if c.spark_type == "string"}
                if tbl
                else set()
            )
            sql, _unsure = self._translate_with(expr, string_cols)
            return Column(
                name=self._norm(m.group(1)),
                orig_name=m.group(1),
                type_name="computed",
                spark_type="string",
                computed_expr=sql,
                persisted=bool(re.search(r"\bPERSISTED\b", rest, re.IGNORECASE)),
                nullable=not re.search(r"\bNOT\s+NULL\b", rest, re.IGNORECASE),
                position=pos,
            )

        m = self._COLUMN_RE.match(item)
        if not m:
            raise DdlParseError(f"bad column definition: {item[:120]!r}")
        cname_raw = m.group(1)
        type_raw = (m.group("bt") or m.group("ut")).strip().lower()
        qual = m.group("qual")
        rest = m.group("rest") or ""
        if self.opt.drop_rowversion and type_raw in ("rowversion", "timestamp"):
            return None  # reference -drop_rowversion (:1437-1443)

        cname = self._norm(cname_raw)
        sch = self.catalog.schema(schema)
        conv = convert_type(
            type_raw,
            qual,
            column=cname,
            numeric_as_int=self.opt.numeric_as_int,
            domains=sch.domains,
            table_types=sch.table_types,
        )
        col = Column(
            name=cname,
            orig_name=cname_raw,
            type_name=type_raw,
            type_qual=qual,
            spark_type=conv.spark_type,
            position=pos,
            check_exprs=list(conv.check_exprs),
        )
        self.catalog.warnings.extend(conv.warnings)

        mi = re.search(r"\bIDENTITY\s*\(\s*(-?\d+)\s*,\s*(-?\d+)\s*\)", rest, re.IGNORECASE)
        if mi:
            col.identity = IdentitySpec(int(mi.group(1)), int(mi.group(2)))
            seq = Sequence(
                name=f"{tname}_{cname}_seq",
                start=col.identity.start,
                step=col.identity.step,
                owner_schema=schema,
                owner_table=tname,
                owner_column=cname,
            )
            sch.sequences[seq.name] = seq
        elif re.search(r"\bIDENTITY\b", rest, re.IGNORECASE):
            col.identity = IdentitySpec()

        col.is_rowguidcol = bool(re.search(r"\bROWGUIDCOL\b", rest, re.IGNORECASE))
        col.is_sparse = bool(re.search(r"\bSPARSE\b", rest, re.IGNORECASE))
        mc = re.search(r"\bCOLLATE\s+(\S+)", rest, re.IGNORECASE)
        if mc:
            col.collation = mc.group(1)
        if conv.spark_type == "string" and type_raw in (
            "char", "nchar", "varchar", "nvarchar", "text", "ntext", "sysname",
        ):
            col.case_insensitive = self.opt.case_insensitive or bool(
                col.collation and "_CI" in col.collation.upper()
            )
        col.nullable = not re.search(r"\bNOT\s+NULL\b", rest, re.IGNORECASE)

        md = re.search(
            rf"(?:CONSTRAINT\s+{_IDENT}\s+)?DEFAULT\s*\(", rest, re.IGNORECASE
        )
        if md:
            raw_default, _ = _outer_parens(rest, rest.index("(", md.end() - 1))
            col.default = self._parse_default(
                raw_default, md.group(1), col_type=col.type_name
            )

        # inline PRIMARY KEY / UNIQUE (incl. memory-optimized HASH form);
        # absent for table-type bodies, which aren't registered as tables
        tbl = self.catalog.schema(schema).tables.get(tname)
        if tbl is not None:
            if re.search(r"\bPRIMARY\s+KEY\b", rest, re.IGNORECASE):
                self._set_pk(tbl, UniqueConstraint(name=None, cols=[cname], is_primary=True))
            elif re.search(r"\bUNIQUE\b", rest, re.IGNORECASE):
                tbl.uniques.append(UniqueConstraint(name=None, cols=[cname]))
        return col

    def _parse_default(
        self, raw: str, cons_name: str | None, col_type: str | None = None
    ) -> DefaultValue:
        """Default-value normalizer (reference B7, :633-683): strip nested
        parens; numeric / bit-boolean / NULL / N'str' are sure; anything else
        is a function call → translated and possibly UNSURE. A bit column's
        0/1 default becomes false/true — PG rejects an integer default on a
        boolean column (caught by the live-PG e2e, tests/test_live_pg.py)."""
        inner = raw.strip()
        while inner.startswith("(") and inner.endswith(")"):
            inner = inner[1:-1].strip()
        if re.fullmatch(r"-?\d+(\.\d+)?", inner):
            if col_type == "bit" and inner in ("0", "1"):
                return DefaultValue(
                    raw=raw,
                    sql="true" if inner == "1" else "false",
                    constraint_name=cons_name,
                )
            return DefaultValue(raw=raw, sql=inner, constraint_name=cons_name)
        if inner.upper() == "NULL":
            return DefaultValue(raw=raw, sql="NULL", constraint_name=cons_name)
        ms = re.fullmatch(r"N?('(?:[^']|'')*')", inner)
        if ms:
            return DefaultValue(raw=raw, sql=ms.group(1), constraint_name=cons_name)
        sql, unsure = self._translate(inner)
        return DefaultValue(raw=raw, sql=sql, unsure=unsure, constraint_name=cons_name)

    def _set_pk(self, table: Table, pk: UniqueConstraint) -> None:
        table.primary_key = pk

    def _table_constraint(self, schema: str, table: Table, item: str) -> None:
        name = None
        m = re.match(rf"^CONSTRAINT\s+{_IDENT}\s+(?P<rest>.*)$", item, re.IGNORECASE | re.DOTALL)
        if m:
            name = self._norm(m.group(1))
            item = m.group("rest")

        if re.match(r"^PRIMARY\s+KEY\b", item, re.IGNORECASE):
            inner, _ = _outer_parens(item)
            self._set_pk(
                table,
                UniqueConstraint(
                    name=name, cols=[c.name for c in _cols_list(inner)], is_primary=True
                ),
            )
        elif re.match(r"^UNIQUE\b", item, re.IGNORECASE):
            inner, _ = _outer_parens(item)
            table.uniques.append(
                UniqueConstraint(name=name, cols=[c.name for c in _cols_list(inner)])
            )
        elif re.match(r"^FOREIGN\s+KEY\b", item, re.IGNORECASE):
            self._add_fk(table, name, item)
        elif re.match(r"^CHECK\b", item, re.IGNORECASE):
            self._add_check(table, name, item)
        else:
            raise DdlParseError(f"unknown table constraint: {item[:120]!r}")

    def _add_fk(self, table: Table, name: str | None, item: str) -> None:
        cols_inner, end = _outer_parens(item)
        mref = re.search(
            rf"REFERENCES\s+{_QIDENT}\s*\(", item[end:], re.IGNORECASE
        )
        if not mref:
            raise DdlParseError(f"FOREIGN KEY without REFERENCES: {item[:120]!r}")
        ref_inner, _ = _outer_parens(item[end:], item[end:].index("(", mref.end() - 1))
        rs, rt = self._schema_table(mref.group(1), mref.group(2))
        fk = ForeignKey(
            name=name,
            cols=[c.name for c in _cols_list(cols_inner)],
            ref_schema=rs,
            ref_table=rt,
            ref_cols=[c.name for c in _cols_list(ref_inner)],
        )
        tail = item[end:]
        if re.search(r"ON\s+DELETE\s+CASCADE", tail, re.IGNORECASE):
            fk.on_delete = "CASCADE"
        elif re.search(r"ON\s+DELETE\s+SET\s+NULL", tail, re.IGNORECASE):
            fk.on_delete = "SET NULL"
        if re.search(r"ON\s+UPDATE\s+CASCADE", tail, re.IGNORECASE):
            fk.on_update = "CASCADE"
        elif re.search(r"ON\s+UPDATE\s+SET\s+NULL", tail, re.IGNORECASE):
            fk.on_update = "SET NULL"
        table.foreign_keys.append(fk)

    def _add_check(self, table: Table, name: str | None, item: str) -> None:
        # CHECK [NOT FOR REPLICATION] (expr)
        raw, _ = _outer_parens(item)
        sql, unsure = self._translate(raw)
        table.checks.append(
            CheckConstraint(name=name, raw=raw, sql=sql, unsure=unsure)
        )

    # -- ALTER TABLE --------------------------------------------------------

    def _alter_table(self, stmt: str) -> None:
        m = re.match(
            rf"\s*ALTER\s+TABLE\s+{_QIDENT}\s+(WITH\s+(NO)?CHECK\s+)?ADD\s+(?P<rest>.*)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            # other ALTER TABLE forms (ENABLE/DISABLE TRIGGER, SET …) → skip,
            # like the reference's ignore list
            if re.match(r"\s*ALTER\s+TABLE\b", stmt, re.IGNORECASE):
                return
            raise DdlParseError(f"bad ALTER TABLE: {stmt[:120]!r}")
        table = self._get_table(m.group(1), m.group(2))
        rest = m.group("rest").strip()

        name = None
        mc = re.match(rf"^CONSTRAINT\s+{_IDENT}\s+(?P<rest>.*)$", rest, re.IGNORECASE | re.DOTALL)
        if mc:
            name = self._norm(mc.group(1))
            rest = mc.group("rest").strip()

        if re.match(r"^PRIMARY\s+KEY\b", rest, re.IGNORECASE):
            inner, _ = _outer_parens(rest)
            self._set_pk(
                table,
                UniqueConstraint(name=name, cols=[c.name for c in _cols_list(inner)], is_primary=True),
            )
        elif re.match(r"^UNIQUE\b", rest, re.IGNORECASE):
            inner, _ = _outer_parens(rest)
            table.uniques.append(
                UniqueConstraint(name=name, cols=[c.name for c in _cols_list(inner)])
            )
        elif re.match(r"^FOREIGN\s+KEY\b", rest, re.IGNORECASE):
            self._add_fk(table, name, rest)
        elif re.match(r"^CHECK\b", rest, re.IGNORECASE):
            self._add_check(table, name, rest)
        elif re.match(r"^DEFAULT\b", rest, re.IGNORECASE):
            # ADD CONSTRAINT df DEFAULT (x) FOR [col] (:2178-2205)
            raw, end = _outer_parens(rest)
            mf = re.search(rf"FOR\s+{_IDENT}", rest[end:], re.IGNORECASE)
            if not mf:
                raise DdlParseError(f"DEFAULT without FOR: {rest[:120]!r}")
            col = table.columns.get(self._norm(mf.group(1)))
            if col is not None:
                col.default = self._parse_default(raw, name, col_type=col.type_name)
        else:
            raise DdlParseError(f"unknown ALTER TABLE ADD: {rest[:120]!r}")

    # -- indexes ------------------------------------------------------------

    def _create_index(self, stmt: str) -> None:
        m = re.match(
            rf"\s*CREATE\s+(?P<u>UNIQUE\s+)?((NON)?CLUSTERED\s+)?INDEX\s+{_IDENT}\s+ON\s+{_QIDENT}\s*\(",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            # spatial/fulltext/columnstore → skipped like the reference (:2065-2073)
            if re.match(r"\s*CREATE\s+(SPATIAL|FULLTEXT|COLUMNSTORE)\b", stmt, re.IGNORECASE):
                return
            raise DdlParseError(f"bad CREATE INDEX: {stmt[:120]!r}")
        idx_name = self._norm(m.group(4))
        table = self._get_table(m.group(5), m.group(6))
        inner, end = _outer_parens(stmt, m.end() - 1)
        idx = Index(name=idx_name, unique=bool(m.group("u")), cols=_cols_list(inner))

        tail = stmt[end:]
        mi = re.search(r"\bINCLUDE\s*\(", tail, re.IGNORECASE)
        if mi:
            inc_inner, inc_end = _outer_parens(tail, tail.index("(", mi.end() - 1))
            idx.include = [c.name for c in _cols_list(inc_inner)]
            tail = tail[:mi.start()] + tail[inc_end:]
        mw = re.search(r"\bWHERE\s+(?P<pred>.*?)(?:\bWITH\s*\(|\bON\s+\[|$)", tail, re.IGNORECASE | re.DOTALL)
        if mw:
            pred = mw.group("pred").strip().rstrip(")")
            # rebalance: the corpus contains over-parenthesized predicates
            opens, closes = pred.count("("), pred.count(")")
            if opens > closes:
                pred += ")" * (opens - closes)
            idx.where_raw = pred
            sql, unsure = self._translate(pred)
            idx.where_sql = None if unsure else sql
        table.indexes[idx.name] = idx

    def _alter_index(self, stmt: str) -> None:
        m = re.match(
            rf"\s*ALTER\s+INDEX\s+{_IDENT}\s+ON\s+{_QIDENT}\s+(?P<action>\w+)",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise DdlParseError(f"bad ALTER INDEX: {stmt[:120]!r}")
        table = self._get_table(m.group(2), m.group(3))
        idx = table.indexes.get(self._norm(m.group(1)))
        if idx and m.group("action").upper() == "DISABLE":
            idx.disabled = True  # emitted commented-out by the reference (:2841-2844)

    # -- views --------------------------------------------------------------

    def _create_view(self, stmt: str) -> None:
        m = re.match(
            rf"\s*CREATE\s+VIEW\s+{_QIDENT}\s*(?P<cols>\([^)]*\))?\s*AS\s+(?P<body>.*)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise DdlParseError(f"bad CREATE VIEW: {stmt[:120]!r}")
        s, v = self._schema_table(m.group(1), m.group(2))
        cols = []
        if m.group("cols"):
            cols = [self._norm(c.strip()) for c in m.group("cols").strip("()").split(",")]
        body = m.group("body").strip()
        sql, unsure = self._translate(body)
        view = View(
            name=v,
            raw_sql=body,
            sql=None if unsure else sql,
            columns=cols,
            unsure=unsure,
        )
        self.catalog.schema(s).views[v] = view
        self.catalog.view_order.append((s, v))  # dependency order (:75, :1890)

    # -- types / schemas / sequences ----------------------------------------

    def _create_type(self, stmt: str) -> None:
        m = re.match(
            rf"\s*CREATE\s+TYPE\s+{_QIDENT}\s+FROM\s+\[?(\w+)\]?\s*(\([\d,\s]*\))?",
            stmt,
            re.IGNORECASE,
        )
        if m:  # domain (:1898-1913)
            s, name = self._schema_table(m.group(1), m.group(2))
            self.catalog.schema(s).domains[name] = m.group(3).lower()
            return
        m = re.match(
            rf"\s*CREATE\s+TYPE\s+{_QIDENT}\s+AS\s+TABLE\s*\(", stmt, re.IGNORECASE
        )
        if m:  # composite/table type (:1917-1972)
            s, name = self._schema_table(m.group(1), m.group(2))
            body, _ = _outer_parens(stmt, m.end() - 1)
            tt = TableType(name=name)
            pos = 0
            for item in _split_top_commas(body):
                if re.match(r"^(PRIMARY\s+KEY|UNIQUE|CHECK|INDEX)\b", item.strip(), re.IGNORECASE):
                    continue
                pos += 1
                col = self._parse_column(s, name, item, pos)
                if col is not None:
                    tt.columns.append(col)
            self.catalog.schema(s).table_types[name] = tt
            return
        raise DdlParseError(f"bad CREATE TYPE: {stmt[:120]!r}")

    def _create_schema(self, stmt: str) -> None:
        m = re.match(rf"\s*CREATE\s+SCHEMA\s+{_IDENT}", stmt, re.IGNORECASE)
        if not m:
            raise DdlParseError(f"bad CREATE SCHEMA: {stmt[:120]!r}")
        self.catalog.schema(relabel_schema(m.group(1).lower(), self.opt.relabel))

    def _create_sequence(self, stmt: str) -> None:
        m = re.match(rf"\s*CREATE\s+SEQUENCE\s+{_QIDENT}", stmt, re.IGNORECASE)
        if not m:
            raise DdlParseError(f"bad CREATE SEQUENCE: {stmt[:120]!r}")
        s, name = self._schema_table(m.group(1), m.group(2))
        seq = Sequence(name=name)
        for attr, pat in [
            ("start", r"START\s+WITH\s+(-?\d+)"),
            ("step", r"INCREMENT\s+BY\s+(-?\d+)"),
            ("min_value", r"MINVALUE\s+(-?\d+)"),
            ("max_value", r"MAXVALUE\s+(-?\d+)"),
            ("cache", r"CACHE\s+(\d+)"),
        ]:
            mm = re.search(pat, stmt, re.IGNORECASE)
            if mm:
                setattr(seq, attr, int(mm.group(1)))
        self.catalog.schema(s).sequences[name] = seq

    # -- extended properties (comments, B16 :2299-2412) ----------------------

    _EP_ARG = re.compile(r"@(\w+)\s*=\s*N?'((?:[^']|'')*)'", re.IGNORECASE)

    def _extended_property(self, stmt: str) -> None:
        args = {k.lower(): v.replace("''", "'") for k, v in self._EP_ARG.findall(stmt)}
        prop = args.get("name", "")
        if prop not in ("MS_Description", "MS_SSMA_SOURCE", "Dictionary"):
            return  # ~50 GUI property names ignored (:2367-2410)
        value = args.get("value", "")
        s = relabel_schema(args.get("level0name", "dbo").lower(), self.opt.relabel)
        l1type = args.get("level1type", "").upper()
        l1 = self._norm(args.get("level1name", "")) if args.get("level1name") else None
        l2type = args.get("level2type", "").upper()
        l2 = self._norm(args.get("level2name", "")) if args.get("level2name") else None

        sch = self.catalog.schema(s)
        if l1type == "TABLE" and l1 in sch.tables:
            table = sch.tables[l1]
            if not l2:
                table.comment = value
            elif l2type == "COLUMN" and l2 in table.columns:
                table.columns[l2].comment = value
            elif l2type == "INDEX" and l2 in table.indexes:
                table.indexes[l2].comment = value
            elif l2type == "CONSTRAINT":
                for c in [table.primary_key, *table.uniques, *table.foreign_keys, *table.checks]:
                    if c is not None and getattr(c, "name", None) == l2:
                        c.comment = value
        elif l1type == "VIEW" and l1 in sch.views:
            sch.views[l1].comment = value
        elif not l1:
            sch.comment = value


def parse_text(text: str, options: ParserOptions | None = None) -> Catalog:
    return DdlParser(options).parse(text)


def parse_dump(path: str, options: ParserOptions | None = None) -> Catalog:
    return parse_text(read_dump(path), options)
