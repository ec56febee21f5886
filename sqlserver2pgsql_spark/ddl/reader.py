"""DDL dump reader: encoding sniff + cleaning + statement grouping.

Reference B1/B2 (sqlserver2pgsql.pl:1358-1402, 1515-1532): SSMS "Generate
Scripts" output is frequently UTF-16; the reference guesses encoding over the
whole file and strips BOM/CR/block-comments, and unwraps
``EXEC sp_executesql N'...'``.

Statement grouping here is structural rather than line-regex-driven: lines
are grouped into statements by ``GO`` separators plus statement-start
keywords at paren depth 0 (string-literal-aware), which handles SSMS dumps
that omit GO between statements.
"""

from __future__ import annotations

import re

_STMT_START = re.compile(
    r"^\s*(CREATE|ALTER|EXEC(UTE)?|USE|SET|GRANT|DENY|REVOKE|IF|BEGIN|END|"
    r"DECLARE|PRINT|DROP|INSERT|UPDATE|DELETE|:setvar)\b",
    re.IGNORECASE,
)


def read_dump(path: str) -> str:
    raw = open(path, "rb").read()
    if raw.startswith(b"\xff\xfe") or raw.startswith(b"\xfe\xff"):
        return raw.decode("utf-16")
    if raw.startswith(b"\xef\xbb\xbf"):
        return raw[3:].decode("utf-8")
    # UTF-16 without BOM: NUL bytes are a giveaway
    if b"\x00" in raw[:200]:
        return raw.decode("utf-16-le" if raw[1:2] == b"\x00" else "utf-16-be")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("iso8859-15")  # the reference's fallback (:1522)


def _strip_block_comments(text: str) -> str:
    """Remove /* ... */ (multi-line, non-nested — T-SQL block comments),
    outside string literals."""
    out: list[str] = []
    i, n = 0, len(text)
    in_str = False
    in_comment = False
    while i < n:
        ch = text[i]
        if in_comment:
            if ch == "*" and i + 1 < n and text[i + 1] == "/":
                in_comment = False
                i += 2
                continue
            i += 1
            continue
        if in_str:
            out.append(ch)
            if ch == "'":
                if i + 1 < n and text[i + 1] == "'":
                    out.append("'")
                    i += 2
                    continue
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
            out.append(ch)
            i += 1
            continue
        if ch == "/" and i + 1 < n and text[i + 1] == "*":
            in_comment = True
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _depth_delta(line: str) -> int:
    """Net paren depth change, ignoring parens inside string literals."""
    depth = 0
    in_str = False
    i = 0
    while i < len(line):
        ch = line[i]
        if in_str:
            if ch == "'":
                if i + 1 < len(line) and line[i + 1] == "'":
                    i += 2
                    continue
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    return depth


_SP_EXECUTESQL = re.compile(
    r"^\s*EXEC(UTE)?\s+(sys\.)?sp_executesql\s+N?'(?P<body>.*)'\s*$",
    re.IGNORECASE | re.DOTALL,
)


def clean_statements(text: str) -> list[str]:
    """Cleaned text → list of statement strings (GO separators removed)."""
    text = text.replace("\r\n", "\n").replace("\r", "\n").lstrip("﻿")
    text = _strip_block_comments(text)

    statements: list[str] = []
    cur: list[str] = []
    depth = 0

    def flush() -> None:
        nonlocal cur, depth
        stmt = "\n".join(cur).strip()
        if stmt:
            m = _SP_EXECUTESQL.match(stmt)
            if m:  # unwrap dynamic SQL (reference :1379-1390)
                stmt = m.group("body").replace("''", "'")
            statements.append(stmt)
        cur = []
        depth = 0

    for line in text.split("\n"):
        stripped = line.strip()
        if re.fullmatch(r"GO(\s*;)?", stripped, re.IGNORECASE):
            flush()
            continue
        if depth == 0 and cur and _STMT_START.match(line):
            flush()
        cur.append(line)
        # clamp at 0: the corpus contains unbalanced parens (reg_tests.sql
        # 'WHERE ((ID) > 10))') that must not poison later statements
        depth = max(0, depth + _depth_delta(line))
    flush()
    return statements
