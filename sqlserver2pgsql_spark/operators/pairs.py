"""Bounded in-group pair generation — the repo's single quadratic-safe shape.

Every co-occurrence-style pair workload (market-basket q126, item-item CF
q247, co-purchase graph q252, two-hop reach q218, exact-Jaccard calibration
q286, Mann-Kendall q190) must generate pairs with THIS generator, never an
uncapped ``a.join(b, key).filter(i < j)`` self-join: the bare self-join
shuffles |group|² rows per group with no defense against a power-law key
(one customer with 10k distinct parts = 50M shuffled pair rows at 100×).

Shape: group sizes are counted first and groups above ``max_group`` are
removed by a BROADCAST anti-join BEFORE the pair join runs — the quadratic
term is hard-capped at max_group²/2 per group while pair emission itself
stays a whole-stage-codegen equi-join. Two earlier formulations measured
worse: the nested ``F.transform``/``F.slice`` array combination pays O(k²)
array-tail copies per group (q247 8.3s → 20.0s at sf0.1, basket size ~150),
and collapse-to-array + explode + self-join pays the collect_set pass plus
re-sorts (2.1× the bare join). The oversized-group list is group-count-sized
and almost always empty, so the anti-join is a no-op broadcast filter.

Semantics: with ``max_group`` above the true maximum group size the output
is EXACT (all unordered in-group pairs of distinct items, left < right by
the item ordering); a group that exceeds the cap contributes no pairs, so
treat a capped run as approximate — same contract as dedup.py's
``max_group`` / LSH ``max_bucket``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_pairs"]


def grouped_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    left: str = "p1",
    right: str = "p2",
    max_group: int = 10_000,
    keep_group: bool = False,
    assume_distinct: bool = False,
) -> DataFrame:
    """(left, right) rows — one per unordered distinct-item pair co-occurring
    in a ``group_col`` group, with ``left < right`` (the item type's native
    ordering; structs compare field-by-field, so a unique leading field makes
    the order deterministic). ``keep_group=True`` prepends the group column
    for per-group pair statistics (Mann-Kendall etc.). Pass
    ``assume_distinct=True`` when (group, item) rows are already distinct to
    skip the dedup shuffle."""
    base = df.select(group_col, item_col)
    if not assume_distinct:
        base = base.dropDuplicates([group_col, item_col])
    big = (
        base.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_group)
        .select(group_col)
    )
    capped = base.join(F.broadcast(big), group_col, "left_anti")
    a = capped.select(group_col, F.col(item_col).alias(left))
    b = capped.select(group_col, F.col(item_col).alias(right))
    head = [group_col] if keep_group else []
    return (
        a.join(b, group_col)
        .filter(F.col(left) < F.col(right))
        .select(*head, left, right)
    )
