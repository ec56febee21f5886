"""Seventh-wave operator tests: invariants the sf-fixture oracles can't
stress — accounting identities (MRR bridge ties out, Lorenz reaches 1,
rank-sum totals), monotone peeling, shrinkage direction, raked-margin
convergence, and known-FK inclusion discovery."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR


def _run(name, spark):
    return entrymod.queries()[name](spark, SF_DIR).collect()


def test_max_drawdown_nonnegative_and_bounded(spark):
    rows = _run("q328_max_drawdown", spark)
    assert rows
    for r in rows:
        assert r.max_drawdown_cents >= 0
        # drawdown is measured from the running peak: can't exceed peak minus
        # the global minimum balance, and peak >= 0 would not hold in general,
        # but drawdown <= peak - (peak - drawdown) trivially; check ordering
    dd = [r.max_drawdown_cents for r in rows]
    assert dd == sorted(dd, reverse=True)


def test_vwap_bar_bounds(spark):
    rows = _run("q329_vwap_bars", spark)
    assert rows
    for r in rows:
        assert r.volume > 0
        assert r.vwap_microcents > 0
        assert r.cum_vwap_microcents > 0


def test_mrr_waterfall_bridge_ties_out(spark):
    rows = _run("q330_mrr_waterfall", spark)
    assert rows
    for r in rows:
        assert (
            r.net_change
            == r.new_mrr + r.expansion_mrr - r.contraction_mrr - r.churned_mrr
        ), r
    # first month on the grid: everything active is "new"
    first = rows[0]
    assert first.churned_mrr == 0 and first.contraction_mrr == 0


def test_kappa_within_bounds(spark):
    (r,) = _run("q331_cohens_kappa", spark)
    assert 0 <= r.p_observed <= 1
    assert 0 <= r.p_expected <= 1
    assert -1 <= r.kappa <= 1


def test_mcnemar_counts_consistent(spark):
    (r,) = _run("q332_mcnemar_test", spark)
    assert r.n_both + r.n_only_a + r.n_only_b <= r.n
    assert r.mcnemar_chi2 >= 0


def test_gini_lorenz_curve_shape(spark):
    rows = _run("q334_gini_lorenz", spark)
    assert len(rows) == 10
    shares = [r.cum_rev_share for r in rows]
    assert shares == sorted(shares)
    assert abs(shares[-1] - 1.0) < 1e-9
    pop = [r.cum_pop_share for r in rows]
    assert abs(pop[-1] - 1.0) < 1e-9
    # Lorenz curve lies under the diagonal for any non-uniform distribution
    for r in rows[:-1]:
        assert r.cum_rev_share <= r.cum_pop_share + 1e-9
    g = rows[0].gini
    assert 0 <= g < 1


def test_hhi_bounds(spark):
    rows = _run("q335_hhi_concentration", spark)
    assert rows
    for r in rows:
        # HHI of n equal firms = 10000/n; concentration can only raise it
        assert 10000.0 / r.n_firms - 1e-6 <= r.hhi <= 10000.0 + 1e-6
        assert 0 < r.top_share <= 1


def test_theil_nonnegative(spark):
    (r,) = _run("q336_theil_index", spark)
    assert r.theil_t >= 0


def test_kcore_peeling_monotone(spark):
    rows = _run("q337_kcore_peeling", spark)
    assert len(rows) == 6
    nodes = [r.n_nodes for r in rows]
    edges = [r.n_edges for r in rows]
    assert nodes == sorted(nodes, reverse=True)
    assert edges == sorted(edges, reverse=True)


def test_ind_discovery_finds_known_fks(spark):
    rows = _run("q341_ind_discovery", spark)
    by_pair = {(r.child, r.parent): r for r in rows}
    # the star schema's real FKs must be discovered as full inclusions
    for child, parent in [
        ("lineitem.l_orderkey", "orders.o_orderkey"),
        ("orders.o_custkey", "customer.c_custkey"),
        ("lineitem.l_suppkey", "supplier.s_suppkey"),
        ("lineitem.l_partkey", "part.p_partkey"),
    ]:
        r = by_pair.get((child, parent))
        assert r is not None and r.is_ind, (child, parent, r)
    for r in rows:
        assert r.child != r.parent
        assert 0.5 <= r.containment <= 1.0


def test_friedman_rank_sums_total(spark):
    rows = _run("q342_friedman_test", spark)
    k = len(rows)
    assert k >= 2
    total = sum(r.rank_sum for r in rows)
    # ranks 1..k per complete block: total = n_blocks * k(k+1)/2
    n_blocks = total * 2 // (k * (k + 1))
    assert total == n_blocks * k * (k + 1) // 2
    q = rows[0].friedman_q
    assert q >= 0


def test_ljungbox_monotone_cumulative(spark):
    rows = _run("q343_acf_ljungbox", spark)
    assert len(rows) == 10
    lb = [r.ljung_box_q for r in rows]
    assert lb == sorted(lb)  # cumulative sum of squares is monotone
    for r in rows:
        assert -1.0001 <= r.acf <= 1.0001


def test_beta_binomial_shrinks_toward_prior(spark):
    rows = _run("q349_beta_binomial_smoothing", spark)
    assert rows
    alpha, beta = rows[0].alpha, rows[0].beta
    assert alpha > 0 and beta > 0
    mu = alpha / (alpha + beta)
    for r in rows:
        raw = r.a / r.n
        lo, hi = min(raw, mu), max(raw, mu)
        assert lo - 1e-9 <= r.smoothed_rate <= hi + 1e-9, r


def test_ipf_margins_converge(spark):
    rows = _run("q350_ipf_raking", spark)
    assert len(rows) == 25
    total = sum(r.raked_weight for r in rows)
    observed = sum(r.observed for r in rows)
    # raking preserves the grand total (row and column targets both sum to it)
    assert abs(total - observed) / observed < 1e-3
    # column margins were raked LAST, so they match the uniform target tightly
    by_pri: dict[str, float] = {}
    for r in rows:
        by_pri[r.pri] = by_pri.get(r.pri, 0.0) + r.raked_weight
    target = observed / len(by_pri)
    for pri, s in by_pri.items():
        assert abs(s - target) / target < 1e-6, (pri, s, target)


def test_ar_aging_shares_sum_to_one(spark):
    rows = _run("q351_ar_aging_dso", spark)
    assert rows
    assert abs(sum(r.bucket_share for r in rows) - 1.0) < 1e-6
    assert all(r.dso_days > 0 for r in rows)
