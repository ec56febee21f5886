"""B13 — name-conflict resolver for the PostgreSQL sink.

PostgreSQL keeps tables, views, and indexes in one relation namespace per
schema; SQL Server does not, so a dump can legally contain an index named
like a table. The reference renames collisions (`X2pgd` for domains,
`X2pgiN` for indexes, :3178-3265). Spark itself has no such collision
(separate namespaces) — this pass runs only before PG DDL emission.
"""

from __future__ import annotations

from .model import Catalog


def resolve_name_conflicts(catalog: Catalog) -> list[str]:
    """Rename indexes/views that collide with relation names; returns a log
    of renames applied (also appended to catalog.warnings)."""
    renames: list[str] = []
    for sname, schema in catalog.schemas.items():
        taken: set[str] = set(schema.tables) | set(schema.views)
        counter = 0
        for table in schema.tables.values():
            for old_name in list(table.indexes):
                if old_name in taken:
                    counter += 1
                    new_name = f"{old_name}2pgi{counter}"
                    while new_name in taken:
                        counter += 1
                        new_name = f"{old_name}2pgi{counter}"
                    idx = table.indexes.pop(old_name)
                    idx.name = new_name
                    table.indexes[new_name] = idx
                    renames.append(f"{sname}: index {old_name} -> {new_name}")
                    taken.add(new_name)
                else:
                    taken.add(old_name)
    catalog.warnings.extend(renames)
    return renames
