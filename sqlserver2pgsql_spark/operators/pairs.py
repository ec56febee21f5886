"""Bounded in-group pair generation — the repo's single quadratic-safe shape.

Every co-occurrence-style pair workload (market-basket q126, item-item CF
q247, co-purchase graph q252, the dedup shingle paths) must generate pairs
with THIS generator, never a raw ``a.join(b, key).filter(i < j)`` self-join:
the self-join shuffles |group|² rows per group and has no defense against a
power-law key (one customer with 10k distinct parts = 50M shuffled pair rows
at 100×). Here the group is collapsed to a sorted array in ONE hash
aggregation, groups above ``max_group`` are dropped before any quadratic
work happens, and pairs are emitted by an in-memory array slice-combination
inside the explode — the quadratic term never crosses the wire unaggregated
and is hard-capped at max_group²/2 per group.

Semantics: with ``max_group`` above the true maximum group size the output
is EXACT (all unordered in-group pairs, p1 < p2 by the item's sort order);
a group that exceeds the cap contributes no pairs, so treat a capped run as
approximate — same contract as dedup.py's ``max_group`` / LSH ``max_bucket``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_pairs"]


def _pair_explode(items: Column, left: str, right: str) -> Column:
    """All unordered pairs of a sorted array: for each element x at index i,
    pair it with every later element (slice i+2.. in 1-based slice terms)."""
    return F.explode(
        F.flatten(
            F.transform(
                items,
                lambda x, i: F.transform(
                    F.slice(items, i + 2, F.size(items)),
                    lambda y: F.struct(x.alias(left), y.alias(right)),
                ),
            )
        )
    )


def grouped_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    left: str = "p1",
    right: str = "p2",
    max_group: int = 10_000,
    keep_group: bool = False,
) -> DataFrame:
    """(left, right) rows — one per unordered distinct-item pair co-occurring
    in a ``group_col`` group, with ``left < right``. One shuffle (the group
    hash agg); the quadratic pair emission happens array-side per group and
    only for groups of size in (1, max_group]. ``keep_group=True`` prepends
    the group column for per-group pair statistics (Mann-Kendall etc.)."""
    grouped = (
        df.groupBy(group_col)
        .agg(F.array_sort(F.collect_set(item_col)).alias("items"))
        .filter((F.size("items") > 1) & (F.size("items") <= max_group))
    )
    head = [group_col] if keep_group else []
    return grouped.select(
        *head, _pair_explode(F.col("items"), left, right).alias("pr")
    ).select(*head, f"pr.{left}", f"pr.{right}")
