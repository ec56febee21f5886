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


# --- second half of the wave: q352-q366 --------------------------------------


def test_audio_windows_shape_and_energy(spark):
    rows = _run("q352_audio_silence_windows", spark)
    # 21 audio rows x 4 windows of 64 samples
    assert len(rows) == 84
    for r in rows:
        assert r.n_samples == 64
        assert r.energy_ss >= 0
        assert abs(r.rms * r.rms - r.energy_ss / 64) < 1.0


def test_burrows_delta_symmetric_nonnegative(spark):
    rows = _run("q353_burrows_delta", spark)
    assert rows
    seen = set()
    for r in rows:
        assert r.s1 < r.s2  # upper triangle only
        assert r.delta >= 0
        assert (r.s1, r.s2) not in seen
        seen.add((r.s1, r.s2))


def test_cochran_armitage_same_z_all_rows(spark):
    rows = _run("q354_cochran_armitage", spark)
    assert len(rows) == 5
    assert len({r.trend_z for r in rows}) == 1
    assert [r.score for r in rows] == [1, 2, 3, 4, 5]


def test_recursive_cte_covers_all_parts(spark):
    rows = _run("q355_recursive_cte_native", spark)
    n_parts = (
        spark.read.parquet(f"{SF_DIR}/part.parquet").count()
    )
    # every part reachable from the root exactly once (+1 for the root row)
    covered = sum(r.n_nodes for r in rows)
    has_zero = (
        spark.read.parquet(f"{SF_DIR}/part.parquet")
        .filter("p_partkey = 0").count()
    )
    assert covered == n_parts + 1 - has_zero
    depths = [r.depth for r in rows]
    assert depths == sorted(depths)


def test_video_scene_cuts_pairs(spark):
    rows = _run("q356_video_scene_cuts", spark)
    # 21 video rows x 3 consecutive-frame pairs
    assert len(rows) == 63
    for r in rows:
        assert r.n_px == 8 * 6 * 3
        assert 0 <= r.mean_abs_diff <= 255


def test_mmr_prefix_is_relevance_order_then_diversifies(spark):
    rows = _run("q357_mmr_diversification", spark)
    assert [r.mmr_rank for r in rows] == list(range(1, 7))
    assert len({r.vec_id for r in rows}) == 6  # no repeats
    # rank 1 is the pure-relevance argmax
    assert rows[0].rel == max(r.rel for r in rows)


def test_markov_attribution_sums_to_one(spark):
    rows = _run("q358_markov_attribution", spark)
    by = {r.scenario: r for r in rows}
    assert set(by) == {"base", "no_click", "no_error", "no_signup", "no_view"}
    assert 0 < by["base"].p_conv <= 1
    # removing a channel cannot help conversion in this absorbing chain
    for s, r in by.items():
        if s != "base":
            assert r.p_conv <= by["base"].p_conv + 1e-9
            assert r.removal_effect >= -1e-9
    attr = sum(r.attribution for s, r in by.items() if s != "base")
    assert abs(attr - 1.0) < 1e-6


def test_histogram_equalization_stretches_range(spark):
    rows = _run("q359_histogram_equalization", spark)
    assert len(rows) == 22  # image rows of 64 synth media
    for r in rows:
        assert r.n_px == 144
        assert r.eq_max == 255  # equalization reaches full range


def test_jonckheere_pairs_bounded(spark):
    rows = _run("q360_jonckheere_terpstra", spark)
    assert len(rows) == 10  # 5 choose 2 ordered pairs
    for r in rows:
        assert 0 <= r.u2


def test_dft_power_nonnegative(spark):
    rows = _run("q361_dft_diurnal_power", spark)
    assert [r.period for r in rows] == [12, 24, 168]
    for r in rows:
        assert r.power >= 0
        assert r.amplitude >= 0


def test_fellegi_sunter_probabilities_valid(spark):
    rows = _run("q362_fellegi_sunter_em", spark)
    # only the OBSERVED agreement patterns appear (sf0.001's tiny blocks
    # don't produce all 8); each must carry valid probabilities
    assert 1 <= len(rows) <= 8
    r = rows[0]
    for v in (r.p_match, r.m1, r.m2, r.m3, r.u1, r.u2, r.u3):
        assert 0 <= v <= 1, rows[0]
    for row in rows:
        assert 0 <= row.posterior <= 1
    # posteriors must be monotone in agreement count when comparable
    by_pattern = {(r.g1, r.g2, r.g3): r.posterior for r in rows}
    if (1, 1, 1) in by_pattern:
        assert by_pattern[(1, 1, 1)] == max(by_pattern.values())


def test_shapley_channels_complete(spark):
    rows = _run("q363_shapley_attribution", spark)
    assert {r.channel for r in rows} == {"click", "error", "signup", "view"}


def test_hits_scores_normalized(spark):
    rows = _run("q364_hits_hubs_authorities", spark)
    hubs = [r for r in rows if r.side == "hub"]
    auths = [r for r in rows if r.side == "authority"]
    assert len(hubs) == 10 and len(auths) == 10
    assert hubs[0].score == 1.0 and auths[0].score == 1.0  # max-normalized
    for seq in (hubs, auths):
        scores = [r.score for r in seq]
        assert scores == sorted(scores, reverse=True)
        assert all(0 <= s <= 1 for s in scores)


def test_iptw_ate_is_mean_difference(spark):
    (r,) = _run("q365_iptw_ate", spark)
    assert abs(r.ate - (r.mean_treated - r.mean_control)) < 1e-5
    assert r.n_treated > 0 and r.n_control > 0


def test_feature_hash_collisions_decrease_with_dim(spark):
    rows = _run("q366_feature_hash_collisions", spark)
    assert [r.dim for r in rows] == [1024, 4096, 16384]
    rates = [r.collision_rate for r in rows]
    assert rates == sorted(rates, reverse=True)  # bigger table, fewer collisions
    for r in rows:
        assert r.n_buckets_used <= r.dim
        assert r.n_collided == r.n_features - r.n_buckets_used


def test_safety_stock_reorder_identity(spark):
    rows = _run("q367_safety_stock_reorder", spark)
    for r in rows:
        assert r.sd_daily >= 0
        assert abs(r.reorder_point - (r.mean_daily * 7 + r.safety_stock)) < 1e-4


def test_entropy_rate_bounds(spark):
    (r,) = _run("q368_markov_entropy_rate", spark)
    assert 0 <= r.entropy_rate_nats
    assert 0 <= r.normalized_entropy <= 1.0 + 1e-9


def test_overdispersion_positive(spark):
    rows = _run("q369_overdispersion_test", spark)
    assert len(rows) == 5
    for r in rows:
        assert r.mean_count > 0
        assert r.var_count >= 0
        assert r.poisson_chi2 >= 0


def test_var_cvar_ordering(spark):
    rows = _run("q370_var_cvar", spark)
    assert rows
    for r in rows:
        # expected shortfall dominates VaR by construction (tail mean)
        assert r.cvar95 >= r.var95 - 1e-9
        assert 1 <= r.n_tail <= r.n_days
