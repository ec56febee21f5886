"""MSSQL → Spark type-conversion matrix.

Mirrors the reference's three-layer scheme (SURVEY.md §1.2):
1. static map (%types, sqlserver2pgsql.pl:261-288),
2. special cases (convert_type :295-434: bit, ntext, numeric(p,0) with -num,
   sysname, geometry, sql_variant, citext mode, (max) dropping, binary
   length-checks, table-type arrays),
3. user-defined DOMAIN / TABLE types registered at parse time (:1898-1972).

Targets are Spark DDL type strings (SURVEY.md §1.3 mapping table). Length
semantics Spark can't enforce (varchar(n), binary(n)) become check
expressions, like the reference's citext/binary CHECK constraints
(:308-317, :386-418).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

#: layer-1 static map: mssql base type → spark DDL type (None ⇒ special-cased)
_BASE_TYPES: dict[str, str] = {
    "int": "int",
    "integer": "int",
    "smallint": "smallint",
    "tinyint": "smallint",  # unsigned 0-255 doesn't fit byte → smallint (:269)
    "bigint": "bigint",
    "decimal": None,  # numeric(p,s) → decimal(p,s)
    "numeric": None,
    "float": "double",
    "real": "float",
    "money": "decimal(19,4)",
    "smallmoney": "decimal(10,4)",
    "bit": "boolean",  # (:326-329)
    "char": "string",
    "nchar": "string",
    "varchar": "string",
    "nvarchar": "string",
    "text": "string",
    "ntext": "string",  # (:330-333)
    "sysname": "string",  # varchar(128) (:356-360)
    "date": "date",
    "datetime": "timestamp",
    "datetime2": "timestamp",
    "smalldatetime": "timestamp",
    "datetimeoffset": "timestamp",  # UTC-normalized (:473)
    "time": "string",  # Spark has no TimeType (SURVEY §1.3)
    "timestamp": "binary",  # rowversion (:279-280)
    "rowversion": "binary",
    "binary": "binary",
    "varbinary": "binary",
    "image": "binary",
    "uniqueidentifier": "string",  # lower-cased on compare (:446)
    "xml": "string",
    "sql_variant": "string",  # with warning (:373-378)
    "geometry": "string",  # WKT passthrough (:362-372 → PostGIS in reference)
    "geography": "string",
    "hierarchyid": "string",
}

#: types whose payload can exceed in-row storage → drives has_lobs, which
#: selects the partitioned parallel scan (reference :1486-1491, :949-963)
LOB_TYPES = {
    "text", "ntext", "image", "xml",
    "varchar(max)", "nvarchar(max)", "varbinary(max)",
}


@dataclass
class TypeConversion:
    spark_type: str
    check_exprs: list[str] = field(default_factory=list)  # length guards
    warnings: list[str] = field(default_factory=list)
    is_lob: bool = False
    needs_lower_compare: bool = False  # uuid / case-insensitive collation


def _parse_qual(qual: str | None) -> tuple[int | None, int | None, bool]:
    """'(35)' → (35, None, False); '(10, 2)' → (10, 2, False); '(max)' →
    (None, None, True)."""
    if not qual:
        return None, None, False
    inner = qual.strip().strip("()")
    if inner.lower() == "max":
        return None, None, True
    parts = [p.strip() for p in inner.split(",")]
    p = int(parts[0]) if parts[0] else None
    s = int(parts[1]) if len(parts) > 1 and parts[1] else None
    return p, s, False


def numeric_to_int(precision: int) -> str:
    """numeric(p,0) → integer types (reference convert_numeric_to_int
    :227-238): p≤4→smallint, ≤9→int, ≤18→bigint, else stays decimal."""
    if precision <= 4:
        return "smallint"
    if precision <= 9:
        return "int"
    if precision <= 18:
        return "bigint"
    return f"decimal({precision},0)"


def convert_type(
    type_name: str,
    qual: str | None = None,
    column: str | None = None,
    numeric_as_int: bool = False,
    domains: dict[str, str] | None = None,
    table_types: dict[str, object] | None = None,
) -> TypeConversion:
    """Convert an MSSQL column type to Spark. Raises on unknown types — the
    reference's die-on-unknown contract (:7-8, :2570-2573)."""
    t = type_name.strip().lower()
    p, s, is_max = _parse_qual(qual)
    col = column or "col"

    # layer-3: user domains resolve to their base type
    if domains and t in domains:
        return convert_type(domains[t], qual, column, numeric_as_int)
    # schema-qualified TABLE type → array of struct (:419-428)
    if table_types and t in table_types:
        tt = table_types[t]
        inner = ", ".join(f"{c.name}: {c.spark_type}" for c in tt.columns)
        return TypeConversion(spark_type=f"array<struct<{inner}>>")

    if t in ("decimal", "numeric"):
        if p is None:
            return TypeConversion(spark_type="decimal(18,0)")
        if (s or 0) == 0 and numeric_as_int:
            return TypeConversion(spark_type=numeric_to_int(p))
        return TypeConversion(spark_type=f"decimal({p},{s or 0})")

    if t not in _BASE_TYPES:
        raise ValueError(f"unknown MSSQL type: {type_name!r}")

    spark = _BASE_TYPES[t]
    conv = TypeConversion(spark_type=spark)

    if t in ("char", "nchar", "varchar", "nvarchar") and p and not is_max:
        # Spark strings are unbounded → keep the limit as a validation rule,
        # like the reference's citext CHECK (char_length(col) <= n, :386-418)
        conv.check_exprs.append(f"length({col}) <= {p}")
    if t in ("binary", "varbinary") and p and not is_max:
        # reference emits octet_length CHECK instead of a qualifier (:308-317)
        conv.check_exprs.append(f"length({col}) <= {p}")
    if t == "sysname":
        conv.check_exprs.append(f"length({col}) <= 128")
    if t == "uniqueidentifier":
        conv.needs_lower_compare = True
    if t == "sql_variant":
        conv.warnings.append(f"sql_variant column {col} mapped to string (:373-378)")
    if t in ("geometry", "geography"):
        conv.warnings.append(f"spatial column {col} mapped to string WKT passthrough")

    lob_key = f"{t}(max)" if is_max else t
    conv.is_lob = lob_key in LOB_TYPES
    return conv
