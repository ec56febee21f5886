"""Eighth-wave operator tests: invariants the sf-fixture oracles can't
stress — tau-b staying inside [-1, 1] with exact pair bookkeeping, the
ABC classes partitioning all parts with monotone boundaries, Little's law
holding as an exact integer identity, and watermark drop fractions being
monotone in the allowed lateness."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR


def _run(name, spark):
    return entrymod.queries()[name](spark, SF_DIR).collect()


def test_kendall_tau_pair_bookkeeping(spark):
    rows = _run("q371_kendall_tau", spark)
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r.tau_b <= 1.0 + 1e-9
        assert r.n_pairs == r.n_rows * (r.n_rows - 1) // 2
        # concordant + discordant + (pairs tied in x or y) == all pairs;
        # ties_x and ties_y overlap on doubly-tied pairs, so c+d can't
        # exceed pairs minus the larger marginal tie count
        assert r.concordant + r.discordant <= r.n_pairs - max(r.ties_x, r.ties_y)
        assert r.concordant >= 0 and r.discordant >= 0


def test_abc_classes_partition_parts(spark):
    rows = {r.abc_class: r for r in _run("q372_abc_classification", spark)}
    assert set(rows) == {"A", "B", "C"}
    total_share = sum(r.revenue_share for r in rows.values())
    assert abs(total_share - 1.0) < 1e-6
    # the head class must carry more revenue per part than the tail
    density_a = rows["A"].class_revenue / rows["A"].n_parts
    density_c = rows["C"].class_revenue / rows["C"].n_parts
    assert density_a > density_c


def test_littles_law_exact_identity(spark):
    rows = _run("q373_littles_law", spark)
    assert rows
    for r in rows:
        assert r.identity_ok  # sum of durations == WIP integral, exactly
        assert r.total_open_days == r.wip_integral_days
        # L = lambda * W up to the rounding quantum of the three ratios
        assert abs(r.avg_l_wip - r.lambda_per_day * r.avg_w_days) < 1e-6


def test_watermark_drop_fraction_monotone(spark):
    rows = _run("q374_watermark_lateness", spark)
    assert rows
    for r in rows:
        # larger allowed lateness can only drop fewer events
        assert r.drop_pct_0s >= r.drop_pct_60s >= r.drop_pct_300s >= r.drop_pct_1h
        assert 0.0 <= r.drop_pct_1h and r.drop_pct_0s <= 1.0
        assert 0 <= r.p95_lateness_us <= r.max_lateness_us
