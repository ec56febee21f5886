"""B10 — T-SQL → Spark SQL scalar-expression translator.

The reference does this with regexes targeting PostgreSQL
(sqlserver2pgsql.pl:587-630): ISNULL→COALESCE, getdate()→CURRENT_TIMESTAMP,
user_name()→CURRENT_USER, SPACE(→REPEAT(' ', charindex(a,b)→POSITION,
datepart(x,y)→date_part, DATEADD(u,n,d)→d+INTERVAL, three CONVERT
forms→CAST, [ident]→renamed identifier, and a recursive AND/OR splitter for
CHECK-constraint bodies.

This implementation targets the Spark SQL dialect instead and keeps the
reference's behavior contract: anything it can't confidently translate is
returned with ``unsure=True`` (the reference routes such text to the
"unsure" output file — README.md:77-79) rather than silently guessed.

Used for: DEFAULT expressions (B7), CHECK constraint bodies (B8), partial
index predicates (B9), view bodies (B11). Deliberately regex-based like the
reference — the input language is the narrow scalar-expression subset that
appears in SSMS DDL dumps, not arbitrary T-SQL.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class TranslationResult:
    sql: str
    unsure: bool = False
    notes: tuple[str, ...] = ()


_DATEPART_NORM = {
    "yy": "YEAR", "yyyy": "YEAR", "year": "YEAR",
    "qq": "QUARTER", "q": "QUARTER", "quarter": "QUARTER",
    "mm": "MONTH", "m": "MONTH", "month": "MONTH",
    "dd": "DAY", "d": "DAY", "day": "DAY",
    "wk": "WEEK", "ww": "WEEK", "week": "WEEK",
    "hh": "HOUR", "hour": "HOUR",
    "mi": "MINUTE", "n": "MINUTE", "minute": "MINUTE",
    "ss": "SECOND", "s": "SECOND", "second": "SECOND",
}

_TYPE_MAP = {
    "int": "INT", "integer": "INT", "bigint": "BIGINT", "smallint": "SMALLINT",
    "tinyint": "SMALLINT", "bit": "BOOLEAN", "float": "DOUBLE", "real": "FLOAT",
    "date": "DATE", "datetime": "TIMESTAMP", "datetime2": "TIMESTAMP",
    "smalldatetime": "TIMESTAMP", "money": "DECIMAL(19,4)",
    "smallmoney": "DECIMAL(10,4)", "uniqueidentifier": "STRING", "sysname": "STRING",
}


def _map_type(t: str) -> str | None:
    t = t.strip().lower()
    m = re.fullmatch(r"(n?var)?char\s*\(\s*(\d+|max)\s*\)", t) or re.fullmatch(
        r"n?(var)?char", t
    ) or re.fullmatch(r"n?text", t)
    if m:
        return "STRING"
    m = re.fullmatch(r"(decimal|numeric)\s*(\(\s*\d+\s*(,\s*\d+)?\s*\))?", t)
    if m:
        inner = re.sub(r"\s", "", m.group(2) or "(18,0)")
        return f"DECIMAL{inner}"
    return _TYPE_MAP.get(t)


def _strip_brackets(expr: str) -> str:
    # [Some Ident] → some_ident (the reference lowercases identifiers by
    # default, :527-571); inside string literals brackets survive because we
    # protect literals first.
    return re.sub(r"\[([^\]]+)\]", lambda m: m.group(1).strip().lower().replace(" ", "_"), expr)


def _protect_literals(expr: str) -> tuple[str, list[str]]:
    """Replace 'string literals' (incl. N'...') with placeholders so function
    rewrites never fire inside data."""
    out: list[str] = []
    lits: list[str] = []

    i = 0
    n = len(expr)
    while i < n:
        ch = expr[i]
        is_nprefix = ch in "Nn" and i + 1 < n and expr[i + 1] == "'"
        if ch == "'" or is_nprefix:
            j = i + (2 if is_nprefix else 1)
            buf = []
            while j < n:
                if expr[j] == "'" and j + 1 < n and expr[j + 1] == "'":
                    buf.append("''")
                    j += 2
                elif expr[j] == "'":
                    break
                else:
                    buf.append(expr[j])
                    j += 1
            lits.append("'" + "".join(buf) + "'")
            out.append(f"\x01{len(lits) - 1}\x02")
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out), lits


def _restore_literals(expr: str, lits: list[str]) -> str:
    return re.sub(r"\x01(\d+)\x02", lambda m: lits[int(m.group(1))], expr)


def _split_args(argstr: str) -> list[str]:
    """Split a function argument list on top-level commas."""
    args, depth, cur = [], 0, []
    for ch in argstr:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    return args


def _find_call(expr: str, fname: str) -> tuple[int, int, str] | None:
    """Locate ``fname( args )`` (case-insensitive, word boundary); return
    (start, end_exclusive, argstr) of the outermost call, or None."""
    m = re.search(rf"\b{fname}\s*\(", expr, flags=re.IGNORECASE)
    if not m:
        return None
    depth = 1
    i = m.end()
    while i < len(expr) and depth:
        if expr[i] == "(":
            depth += 1
        elif expr[i] == ")":
            depth -= 1
        i += 1
    if depth:
        return None
    return m.start(), i, expr[m.end() : i - 1]


def _rewrite_calls(expr: str, fname: str, render) -> tuple[str, bool]:
    """Repeatedly rewrite fname(...) via render(args)->str|None; returns
    (expr, unsure_flag)."""
    unsure = False
    while True:
        hit = _find_call(expr, fname)
        if hit is None:
            return expr, unsure
        start, end, argstr = hit
        args = _split_args(argstr)
        # translate inner expressions first (args may contain nested calls)
        args = [_translate_inner(a)[0] for a in args]
        rendered = render(args)
        if rendered is None:
            unsure = True
            rendered = f"{fname}({', '.join(args)})"
        expr = expr[:start] + rendered + expr[end:]


def _render_convert(args: list[str]) -> str | None:
    if len(args) not in (2, 3):
        return None
    target = _map_type(args[0])
    if target is None:
        return None
    if len(args) == 3 and target == "STRING" and args[2].strip() in ("120", "121"):
        fmt = "yyyy-MM-dd HH:mm:ss" if args[2].strip() == "120" else "yyyy-MM-dd HH:mm:ss.SSS"
        return f"date_format({args[1]}, '{fmt}')"
    return f"CAST({args[1]} AS {target})"


def _render_dateadd(args: list[str]) -> str | None:
    if len(args) != 3:
        return None
    unit = _DATEPART_NORM.get(args[0].strip().lower().strip("'\""))
    if unit is None:
        return None
    return f"timestampadd({unit}, {args[1]}, {args[2]})"


def _render_datediff(args: list[str]) -> str | None:
    if len(args) != 3:
        return None
    unit = _DATEPART_NORM.get(args[0].strip().lower().strip("'\""))
    if unit is None:
        return None
    return f"timestampdiff({unit}, {args[1]}, {args[2]})"


def _render_datepart(args: list[str]) -> str | None:
    if len(args) != 2:
        return None
    unit = _DATEPART_NORM.get(args[0].strip().lower().strip("'\""))
    if unit is None:
        return None
    return f"extract({unit} FROM {args[1]})"


_SIMPLE_CALLS = {
    "isnull": lambda a: f"coalesce({', '.join(a)})" if len(a) == 2 else None,
    "space": lambda a: f"repeat(' ', {a[0]})" if len(a) == 1 else None,
    "charindex": lambda a: (
        f"locate({a[0]}, {a[1]})" if len(a) == 2
        else f"locate({a[0]}, {a[1]}, {a[2]})" if len(a) == 3 else None
    ),
    "len": lambda a: f"length(rtrim({a[0]}))" if len(a) == 1 else None,
    "convert": _render_convert,
    "dateadd": _render_dateadd,
    "datediff": _render_datediff,
    "datepart": _render_datepart,
    "replicate": lambda a: f"repeat({a[0]}, {a[1]})" if len(a) == 2 else None,
    "newid": lambda a: "uuid()" if not a else None,
}

_ZERO_ARG = {
    r"\bgetdate\s*\(\s*\)": "current_timestamp()",
    r"\bgetutcdate\s*\(\s*\)": "current_timestamp()",
    r"\bsysdatetime\s*\(\s*\)": "current_timestamp()",
    r"\buser_name\s*\(\s*\)": "current_user()",
    r"\bsuser_sname\s*\(\s*\)": "current_user()",
}

#: functions we can pass through unchanged (same name/semantics in Spark SQL)
_PASSTHROUGH = {
    "coalesce", "nullif", "upper", "lower", "ltrim", "rtrim", "trim", "abs",
    "round", "floor", "ceiling", "substring", "replace", "concat", "left",
    "right", "year", "month", "day", "cast", "case", "when", "then", "else",
    "end", "and", "or", "not", "in", "like", "between", "is", "null",
    "sign", "power", "exp", "log", "sqrt",
    # aggregates / window functions valid in both dialects
    "count", "sum", "min", "max", "avg", "row_number", "rank", "dense_rank",
    "lag", "lead", "over",
    # SQL keywords that can directly precede '(' in query text
    "on", "where", "exists", "values", "select", "from", "join", "union",
    "all", "any", "some", "distinct", "group", "by", "having", "partition",
    "as",
}


# NOTE: coalesce/nullif are type-preserving, not string-producing — including
# them here would wrongly rewrite numeric `C3+ISNULL(x,0)` (V2 fixture,
# regression/basic_test/views.sql:90) into string concat.
_STRINGY_FUNCS = {
    "concat", "repeat", "upper", "lower", "ltrim", "rtrim", "trim",
    "substring", "replace", "left", "right", "date_format",
}


def _split_top(s: str, sep: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _is_stringy(operand: str, string_idents: frozenset[str]) -> bool:
    o = operand.strip()
    if re.search(r"\x01\d+\x02", o):  # contains a protected string literal
        return True
    m = re.match(r"([a-zA-Z_]\w*)\s*\(", o)
    if m and m.group(1).lower() in _STRINGY_FUNCS:
        return True
    if re.fullmatch(r"[a-zA-Z_][\w.]*", o) and o.lower().split(".")[-1] in string_idents:
        return True  # caller told us this column is a string (catalog types)
    return bool(
        re.match(r"cast\s*\(.*as\s+(string|n?(var)?char)", o, re.IGNORECASE | re.DOTALL)
    )


def _rewrite_plus(expr: str, string_idents: frozenset[str] = frozenset()) -> str:
    """T-SQL string ``+`` → ``||`` wherever a ``+``-chain has at least one
    provably-string operand: a string literal, a string-returning function,
    or an identifier the caller declared string-typed (the catalog knows
    column types — reference rewrites + concat for PG, :1857-1876). A chain
    of bare unknown columns stays arithmetic."""
    out: list[str] = []
    i = 0
    while i < len(expr):
        if expr[i] == "(":
            depth, j = 1, i + 1
            while j < len(expr) and depth:
                if expr[j] == "(":
                    depth += 1
                elif expr[j] == ")":
                    depth -= 1
                j += 1
            out.append("(" + _rewrite_plus(expr[i + 1 : j - 1], string_idents) + ")")
            i = j
        else:
            out.append(expr[i])
            i += 1
    s = "".join(out)
    segments = []
    for seg in _split_top(s, ","):
        ops = _split_top(seg, "+")
        if len(ops) > 1 and any(_is_stringy(o, string_idents) for o in ops):
            segments.append("||".join(ops))
        else:
            segments.append(seg)
    return ",".join(segments)


def _translate_inner(expr: str) -> tuple[str, bool]:
    unsure = False
    for pat, repl in _ZERO_ARG.items():
        expr = re.sub(pat, repl, expr, flags=re.IGNORECASE)
    for fname, render in _SIMPLE_CALLS.items():
        expr, u = _rewrite_calls(expr, fname, render)
        unsure = unsure or u
    return expr, unsure


def translate_tsql_expr(
    expr: str, string_idents: frozenset[str] | set[str] = frozenset()
) -> TranslationResult:
    """Translate a T-SQL scalar expression to Spark SQL.

    ``string_idents``: identifiers known (from the catalog) to be
    string-typed, so ``+`` over them becomes concat. Unknown function calls
    are left textually intact and flagged ``unsure=True`` — the caller
    decides whether to route the object to an 'unsure' bucket (reference
    behavior) or fail fast.
    """
    protected, lits = _protect_literals(expr)
    protected = _strip_brackets(protected)
    translated, unsure = _translate_inner(protected)

    notes: list[str] = []
    translated = _rewrite_plus(translated, frozenset(string_idents))

    # any remaining unknown function call? (name not in passthrough set)
    for m in re.finditer(r"\b([a-zA-Z_][a-zA-Z0-9_]*)\s*\(", translated):
        name = m.group(1).lower()
        if name not in _PASSTHROUGH and name not in (
            "current_timestamp", "current_user", "date_format", "timestampadd",
            "timestampdiff", "extract", "locate", "repeat", "length", "uuid",
            # type constructors appearing inside CAST(... AS T(p,s))
            "decimal", "numeric", "varchar", "char",
        ):
            unsure = True
            notes.append(f"unknown function: {name}")

    return TranslationResult(
        sql=_restore_literals(translated, lits).strip(),
        unsure=unsure,
        notes=tuple(notes),
    )
