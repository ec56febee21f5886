"""Bounded in-group pair generation — the repo's single quadratic-safe shape.

Every co-occurrence-style pair workload (market-basket q126, item-item CF
q247, co-purchase graph q252, two-hop reach q218, exact-Jaccard calibration
q286, Mann-Kendall q190) must generate pairs with THIS generator, never an
uncapped ``a.join(b, key).filter(i < j)`` self-join: the bare self-join
shuffles |group|² rows per group with no defense against a power-law key
(one customer with 10k distinct parts = 50M shuffled pair rows at 100×).

Shape: the group size is attached to the LEFT join side only, with a window
count over the same hash-partitioning the pair equi-join requires, so the
cap is a filter (or a ``raise_error`` guard) riding an exchange the plan
pays anyway. Capping one side is sufficient: an equi-join emits a group's
pairs only when BOTH sides have rows for the key, so an empty left side
suppresses the group entirely — and the right side stays the raw input
(no second window pass; under sort-merge the window's sort-by-key already
satisfies the left ordering requirement, and under AQE-elected broadcast
the uncapped raw side is the cheaper one to build). The quadratic term is
hard-capped at max_group²/2 per group while pair emission stays a
whole-stage-codegen equi-join. Three earlier formulations measured worse:
(1) a separate group-count aggregate + broadcast anti-join (the round-5
shape) pays an extra full scan of the input for the agg plus a broadcast
job — q247 8.3→9.7s, q252 8.3→9.7s median-warm at sf0.1 (VERDICT r5 #1);
a two-sided window variant re-ran the sized subtree once per join side
(4.9s vs 2.6s on the q247 pair core at sf0.1); (2) the nested
``F.transform``/``F.slice`` array combination pays O(k²) array-tail copies
per group (q247 8.3s → 20.0s at sf0.1, basket size ~150); (3)
collapse-to-array + explode + self-join pays the collect_set pass plus
re-sorts (2.1× the bare join).

Semantics: with ``max_group`` above the true maximum group size the output
is EXACT (all unordered in-group pairs of distinct items, left < right by
the item ordering). What happens to an over-cap group is the caller's
declared contract via ``on_overflow``:

* ``"drop"`` (default) — the group contributes no pairs; treat a capped run
  as approximate, same contract as dedup.py's ``max_group`` / LSH
  ``max_bucket``. For scale-survival paths (q126/q247/q252) where losing a
  pathological hub group is the documented behavior.
* ``"error"`` — any over-cap group fails the job at execution time with the
  offending group key in the message (``raise_error`` inside the row
  pipeline: zero extra jobs, zero extra scans). For exactness-contract
  queries whose oracle is uncapped (q190/q218/q286 — ADVICE r5): a silent
  drop there would change inter/jaccard/s_stat to a plausible-looking wrong
  value at a scale factor the sf0.01 gate never sees.

Caller caching contract: the input is referenced by BOTH pair-join sides.
They share one exchange via ReuseExchange, so the subtree below it is
planned once — but if ``df`` is expensive to compute and its own plan
contains no exchange boundary at the group key, pass a lazily
localCheckpoint-ed frame (the q247 `baskets` discipline) so a planner
change can never silently double-compute it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    on_overflow: str = "drop",
) -> DataFrame:
    """(left, right) rows — one per unordered distinct-item pair co-occurring
    in a ``group_col`` group, with ``left < right`` (the item type's native
    ordering; structs compare field-by-field, so a unique leading field makes
    the order deterministic). ``keep_group=True`` prepends the group column
    for per-group pair statistics (Mann-Kendall etc.). Pass
    ``assume_distinct=True`` when (group, item) rows are already distinct to
    skip the dedup shuffle. ``on_overflow`` declares the over-cap contract:
    ``"drop"`` (approximate — the group emits no pairs) or ``"error"``
    (exactness — the job fails loudly naming the group)."""
    if on_overflow not in ("drop", "error"):
        raise ValueError(
            f"grouped_pairs: on_overflow must be 'drop' or 'error', got {on_overflow!r}"
        )
    base = df.select(group_col, item_col)
    if not assume_distinct:
        base = base.dropDuplicates([group_col, item_col])
    sized = base.withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
    )
    if on_overflow == "error":
        # Execution-time guard on the item column itself: costs no extra
        # scan/job, and the guarded column feeds the join so Catalyst
        # cannot prune it away.
        guarded = (
            F.when(
                F.col("__n") > max_group,
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"grouped_pairs: group exceeds max_group={max_group}"
                            f" (on_overflow='error'): {group_col}="
                        ),
                        F.col(group_col).cast("string"),
                    )
                ),
            )
            .otherwise(F.col(item_col))
            .alias(item_col)
        )
        capped = sized.select(group_col, guarded)
    else:
        capped = sized.filter(F.col("__n") <= max_group).select(
            group_col, item_col
        )
    a = capped.select(group_col, F.col(item_col).alias(left))
    b = base.select(group_col, F.col(item_col).alias(right))
    head = [group_col] if keep_group else []
    return (
        a.join(b, group_col)
        .filter(F.col(left) < F.col(right))
        .select(*head, left, right)
    )
