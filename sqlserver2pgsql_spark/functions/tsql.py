"""T-SQL scalar-function layer as native Spark Column functions.

The reference translates these textually for PostgreSQL (sqlserver2pgsql.pl
:587-601: ISNULL→COALESCE, getdate()→CURRENT_TIMESTAMP, SPACE(→REPEAT(' ',
charindex→POSITION, datepart→date_part, DATEADD→interval arithmetic,
CONVERT→CAST). Here each becomes a real Spark expression, JVM-side and
codegen-friendly — no UDFs.

Semantics notes (T-SQL quirks preserved):
- CHARINDEX returns 0 when not found (Spark ``locate`` matches).
- LEN ignores trailing spaces (→ length(rtrim(x))).
- String ``+`` with a NULL operand yields NULL (CONCAT_NULL_YIELDS_NULL ON,
  the server default) — Spark ``concat`` matches exactly.
- DATEDIFF counts *boundary crossings*, not elapsed time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DATEPART_ALIASES = {
    "yy": "year", "yyyy": "year", "year": "year",
    "qq": "quarter", "q": "quarter", "quarter": "quarter",
    "mm": "month", "m": "month", "month": "month",
    "dd": "day", "d": "day", "day": "day",
    "wk": "week", "ww": "week", "week": "week",
    "dy": "dayofyear", "dayofyear": "dayofyear",
    "dw": "dayofweek", "weekday": "dayofweek",
    "hh": "hour", "hour": "hour",
    "mi": "minute", "n": "minute", "minute": "minute",
    "ss": "second", "s": "second", "second": "second",
}


def _part(part: str) -> str:
    p = part.strip().lower()
    if p not in _DATEPART_ALIASES:
        raise ValueError(f"unsupported datepart: {part!r}")
    return _DATEPART_ALIASES[p]


def isnull(col: Column, replacement: Column) -> Column:
    """T-SQL ISNULL(a, b) → COALESCE (reference :589)."""
    return F.coalesce(col, replacement)


def getdate() -> Column:
    """T-SQL getdate() → CURRENT_TIMESTAMP (reference :591)."""
    return F.current_timestamp()


def space(n: Column | int) -> Column:
    """T-SQL SPACE(n) → repeat(' ', n) (reference :593)."""
    n = F.lit(n) if isinstance(n, int) else n
    return F.repeat(F.lit(" "), n)


def replicate(col: Column, n: Column | int) -> Column:
    n = F.lit(n) if isinstance(n, int) else n
    return F.repeat(col, n)


def charindex(substr: str, col: Column, start: int = 1) -> Column:
    """T-SQL CHARINDEX(sub, s[, start]) → locate; 0 when absent
    (reference :594 maps to POSITION)."""
    if not isinstance(substr, str):
        raise TypeError("charindex: substr must be a literal string")
    return F.locate(substr, col, pos=start)


def len_(col: Column) -> Column:
    """T-SQL LEN: string length excluding trailing spaces."""
    return F.length(F.rtrim(col))


def datepart(part: str, col: Column) -> Column:
    """T-SQL DATEPART(part, d) → extract (reference :595)."""
    p = _part(part)
    extract_field = {
        "year": "YEAR", "quarter": "QUARTER", "month": "MONTH", "day": "DAY",
        "week": "WEEK", "dayofyear": "DOY", "dayofweek": "DOW",
        "hour": "HOUR", "minute": "MINUTE", "second": "SECOND",
    }[p]
    c = F.extract(F.lit(extract_field), col)
    if p == "dayofweek":
        # T-SQL default DATEFIRST=7: Sunday=1..Saturday=7; extract DOW is 0-based Sunday
        c = c + F.lit(1)
    return c.cast("int")


def dateadd(part: str, n: Column | int, col: Column) -> Column:
    """T-SQL DATEADD(part, n, d) → timestampadd (reference :596-597 renders
    ``d + INTERVAL 'n part'``)."""
    p = _part(part)
    unit = {
        "year": "YEAR", "quarter": "QUARTER", "month": "MONTH", "day": "DAY",
        "week": "WEEK", "hour": "HOUR", "minute": "MINUTE", "second": "SECOND",
        "dayofyear": "DAY", "dayofweek": "DAY",
    }[p]
    n = F.lit(n) if isinstance(n, int) else n
    return F.timestamp_add(unit, n, col)


def datediff(part: str, start: Column, end: Column) -> Column:
    """T-SQL DATEDIFF: number of *part boundaries* crossed between start and
    end (not elapsed intervals)."""
    p = _part(part)
    if p == "year":
        out = F.year(end) - F.year(start)
    elif p == "quarter":
        out = (F.year(end) - F.year(start)) * 4 + (F.quarter(end) - F.quarter(start))
    elif p == "month":
        out = (F.year(end) - F.year(start)) * 12 + (F.month(end) - F.month(start))
    elif p in ("day", "dayofyear", "dayofweek"):
        out = F.datediff(F.to_date(end), F.to_date(start))
    elif p == "week":
        # boundary = Sunday with default DATEFIRST; count Sunday crossings
        out = (
            F.floor(F.datediff(F.to_date(end), F.lit("1900-01-07").cast("date")) / 7)
            - F.floor(F.datediff(F.to_date(start), F.lit("1900-01-07").cast("date")) / 7)
        )
    elif p in ("hour", "minute", "second"):
        secs = {"hour": 3600, "minute": 60, "second": 1}[p]
        trunc_unit = {"hour": "HOUR", "minute": "MINUTE", "second": "SECOND"}[p]
        out = (
            F.unix_timestamp(F.date_trunc(trunc_unit, end))
            - F.unix_timestamp(F.date_trunc(trunc_unit, start))
        ) / secs
    else:  # pragma: no cover
        raise ValueError(part)
    return out.cast("int")


_CONVERT_TYPES = {
    # T-SQL type → Spark cast target (subset of the %types matrix, SURVEY §1.2)
    "int": "int", "bigint": "bigint", "smallint": "smallint", "tinyint": "smallint",
    "float": "double", "real": "float", "bit": "boolean",
    "date": "date", "datetime": "timestamp", "datetime2": "timestamp",
    "uniqueidentifier": "string", "money": "decimal(19,4)", "smallmoney": "decimal(10,4)",
}


def convert(type_name: str, col: Column, style: int | None = None) -> Column:
    """T-SQL CONVERT(type, x [, style]) → CAST (reference :598-600 handles the
    three CONVERT forms). Styles 120/121 (ODBC canonical) render timestamps
    to their canonical string forms."""
    t = type_name.strip().lower()
    base = t.split("(")[0]
    if base in ("varchar", "nvarchar", "char", "nchar", "sysname", "text", "ntext"):
        if style in (120, 121):
            fmt = "yyyy-MM-dd HH:mm:ss" if style == 120 else "yyyy-MM-dd HH:mm:ss.SSS"
            return F.date_format(col, fmt)
        out = col.cast("string")
        if "(" in t and base in ("varchar", "nvarchar", "char", "nchar"):
            n = t.split("(")[1].rstrip(")")
            if n.isdigit():
                out = F.substring(out, 1, int(n))
        return out
    if base in ("decimal", "numeric"):
        inner = t[len(base):].strip("()")
        return col.cast(f"decimal({inner})" if inner else "decimal(18,0)")
    if base in _CONVERT_TYPES:
        return col.cast(_CONVERT_TYPES[base])
    raise ValueError(f"unsupported CONVERT target: {type_name!r}")


def tsql_concat(*cols: Column) -> Column:
    """T-SQL string ``+``: NULL if any operand is NULL (server default
    CONCAT_NULL_YIELDS_NULL ON). Spark ``concat`` has exactly this semantic;
    the reference rewrites ``+``→``||`` for PG (:1857-1876)."""
    return F.concat(*cols)
