"""Configuration-file support (reference parse_conf_file,
sqlserver2pgsql.pl:80-151).

The reference accepts every CLI option from an INI-ish conf file
(``long name = value`` lines, ``#`` comments); command-line values win over
conf values. The key names below are the reference's verbatim, so an
existing conf file drops in unchanged.
"""

from __future__ import annotations

#: conf-file key → canonical option name (reference %parameters :84-121)
CONF_KEYS: dict[str, str] = {
    "sql server database": "sd",
    "sql server host": "sh",
    "sql server host instance": "si",
    "sql server port": "sp",
    "sql server username": "su",
    "sql server password": "sw",
    "postgresql database": "pd",
    "postgresql host": "ph",
    "postgresql port": "pp",
    "postgresql username": "pu",
    "postgresql password": "pw",
    "kettle directory": "kettle",
    "parallelism_in": "parallelism_in",
    "parallelism_out": "parallelism_out",
    "before file": "before_file",
    "after file": "after_file",
    "unsure file": "unsure_file",
    "sql server dump filename": "filename",
    "case insensitive": "case_insensitive",
    "no relabel dbo": "norelabel_dbo",
    "relabel schemas": "relabel_schemas",
    "keep identifier case": "keep_identifier_case",
    "camelcasetosnake": "camel_to_snake",
    "col map file": "col_map_file",
    "col map file header": "col_map_file_header",
    "col map file delimiter": "col_map_file_delimiter",
    "convert numeric to int": "convert_numeric_to_int",
    "drop rowversion": "drop_rowversion",
    "validate constraints": "validate_constraints",
    "sort size": "sort_size",
    "use pk if possible": "use_pk_if_possible",
    "ignore errors": "ignore_errors",
    "sql server force ssl": "sforce_ssl",
    "postgresql force ssl": "pforce_ssl",
    "stringtype unspecified": "stringtype_unspecified",
    "skip citext length check": "skip_citext_length_check",
    "use identity column": "use_identity_column",
}

#: options that are flags/ints rather than strings
_INT_OPTIONS = {"parallelism_in", "parallelism_out", "sort_size", "sp", "pp"}
_FLAG_OPTIONS = {
    "case_insensitive",
    "norelabel_dbo",
    "keep_identifier_case",
    "camel_to_snake",
    "col_map_file_header",
    "convert_numeric_to_int",
    "drop_rowversion",
    "ignore_errors",
    "sforce_ssl",
    "pforce_ssl",
    "stringtype_unspecified",
    "skip_citext_length_check",
    "use_identity_column",
}


def parse_conf_file(path: str) -> dict[str, object]:
    """Parse a reference-format conf file into {canonical_option: value}.

    Mirrors the reference's semantics: ``#`` starts a comment ANYWHERE in the
    line (s/#.*// — :129), so values cannot legitimately contain '#'
    (passwords with '#' are silently truncated in the reference too; use the
    CLI flag for such values), whitespace around ``=`` is ignored, unknown
    keys are an error (die, :139-142)."""
    out: dict[str, object] = {}
    with open(path) as fh:
        for raw in fh:
            line = raw.split("#", 1)[0].rstrip()
            if not line.strip():
                continue
            if "=" not in line:
                raise ValueError(f"cannot parse conf line: {raw.rstrip()!r}")
            key, value = line.split("=", 1)
            key, value = key.strip(), value.strip()
            if key not in CONF_KEYS:
                raise ValueError(f"cannot understand parameter {key!r} in {path}")
            name = CONF_KEYS[key]
            if name in _INT_OPTIONS:
                out[name] = int(value)
            elif name in _FLAG_OPTIONS:
                out[name] = value.lower() not in ("0", "false", "no", "")
            else:
                out[name] = value
    return out


def mssql_jdbc_url(
    host: str,
    database: str,
    port: str | int | None = None,
    instance: str | None = None,
    force_ssl: bool = False,
) -> str:
    """SQL Server JDBC URL from the reference's sd/sh/si/sp knobs."""
    hostpart = host
    if instance:
        hostpart += f"\\{instance}"
    if port:
        hostpart += f":{port}"
    url = f"jdbc:sqlserver://{hostpart};databaseName={database}"
    if force_ssl:
        url += ";encrypt=true;trustServerCertificate=true"
    return url


def pg_jdbc_url(
    host: str,
    database: str,
    port: str | int | None = None,
    force_ssl: bool = False,
    stringtype_unspecified: bool = False,
) -> str:
    """PostgreSQL JDBC URL from pd/ph/pp (+ ssl / stringtype knobs).

    ``stringtype=unspecified`` lets PG coerce varchar binds into citext/uuid/
    xml columns (the reference sets the same driver property, :3550-3555)."""
    hostpart = f"{host}:{port}" if port else host
    url = f"jdbc:postgresql://{hostpart}/{database}"
    params = []
    if force_ssl:
        params.append("ssl=true&sslmode=require")
    if stringtype_unspecified:
        params.append("stringtype=unspecified")
    if params:
        url += "?" + "&".join(params)
    return url
