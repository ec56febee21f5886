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


def test_price_index_bounds(spark):
    rows = _run("q375_price_indexes", spark)
    assert rows
    for r in rows:
        assert r.n_common_parts >= 1
        assert r.laspeyres > 0 and r.paasche > 0
        # Fisher is the geometric mean: always between the two
        lo, hi = sorted([r.laspeyres, r.paasche])
        assert lo - 1e-6 <= r.fisher <= hi + 1e-6


def test_perfect_order_dominated_by_fill_rate(spark):
    rows = _run("q376_perfect_order_rate", spark)
    assert rows
    for r in rows:
        assert 0.0 <= r.perfect_order_rate <= 1.0
        assert 0.0 <= r.fill_rate <= 1.0
        # a perfect order needs every line on time, so the perfect rate
        # can't exceed the line fill rate
        assert r.perfect_order_rate <= r.fill_rate + 1e-9
        assert r.n_lineitems >= r.n_orders


def test_fertility_at_least_one(spark):
    rows = _run("q377_tokenizer_fertility", spark)
    assert rows
    for r in rows:
        # the BPE-ish pre-tokenizer only ever splits whitespace words
        # further, so fertility >= 1 and chars/token <= chars/word
        assert r.fertility >= 1.0
        assert r.bpe_tokens >= r.ws_tokens
        assert r.bytes_per_token >= 1.0


def test_rake_scores_positive_and_sorted(spark):
    rows = _run("q378_rake_keywords", spark)
    assert rows
    scores = [r.rake_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # each member word contributes degree/freq >= 1
        assert r.rake_score >= r.n_words - 1e-6
        assert r.n_occurrences >= 1
        assert " " not in ("",) and r.phrase == r.phrase.strip()


def test_dbscan_roles_consistent(spark):
    rows = _run("q379_dbscan_grid", spark)
    assert rows
    clusters = {}
    for r in rows:
        assert r.role in ("core", "border", "noise")
        if r.role == "noise":
            assert r.cluster_id == -1
        else:
            assert r.cluster_id >= 0
            clusters.setdefault(r.cluster_id, []).append(r)
    # a cluster's id is the min vec_id of its CORE members (label = min
    # core node; borders never lower it)
    for cid, members in clusters.items():
        cores = [m.vec_id for m in members if m.role == "core"]
        if cores:  # isolated core keeps its own id
            assert cid == min(cores)


def test_newsvendor_fractile_position(spark):
    rows = _run("q380_newsvendor", spark)
    assert rows
    for r in rows:
        assert r.q_star >= 0
        assert r.expected_cost_per_day >= 0
        # at the 0.9 fractile, <=10% of days exceed q*, so underage days
        # are rare but each costs 9x — both tallies must be finite ints
        assert r.overage_units >= 0 and r.underage_units >= 0


def test_huber_between_extremes_and_c_positive(spark):
    rows = _run("q381_huber_irls", spark)
    assert rows
    for r in rows:
        assert r.tuning_c_dollars > 0
        # Huber downweights tails: the estimate stays within a tuning
        # constant of the plain mean
        assert abs(r.huber_dollars - r.mean_dollars) <= r.tuning_c_dollars + 1e-6


def test_bullwhip_ratio_consistency(spark):
    rows = _run("q382_bullwhip_effect", spark)
    assert rows
    for r in rows:
        assert r.cv2_placed >= 0 and r.cv2_shipped > 0
        assert abs(r.bullwhip_ratio - r.cv2_placed / r.cv2_shipped) < 1e-6


def test_groupby_all_parity_shapes(spark):
    rows = _run("q383_groupby_all_parity", spark)
    assert rows
    for r in rows:
        assert r.n_deep_discount <= r.n_rows
        if r.n_deep_discount == 0:
            assert r.deep_discount_revenue is None
    # ORDER BY ALL = select-column order
    keys = [(r.l_returnflag, r.l_linestatus) for r in rows]
    assert keys == sorted(keys)


def test_demand_classes_exhaustive_shares(spark):
    rows = _run("q384_demand_classification", spark)
    assert rows
    assert {r.demand_class for r in rows} <= {"smooth", "intermittent", "erratic", "lumpy"}
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert r.avg_adi >= 1.0  # span >= demand weeks by construction
        assert r.avg_cv2 >= 0.0


def test_average_precision_bounds(spark):
    rows = _run("q385_average_precision", spark)
    assert rows
    for r in rows:
        assert 0.0 < r.average_precision <= 1.0
        assert r.n_relevant >= 1


def test_textrank_top_words(spark):
    rows = _run("q386_textrank_keywords", spark)
    assert len(rows) == 30
    ranks = [r.rank_fp for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    for r in rows:
        assert len(r.word) >= 3 and r.word.islower()
        assert r.rank_fp > 0


def test_croston_rate_identity(spark):
    rows = _run("q387_croston_forecast", spark)
    assert rows
    for r in rows:
        assert r.n_demand_weeks >= 2
        assert r.smoothed_demand > 0
        assert r.smoothed_interval_weeks >= 1.0 - 1e-9  # weekly buckets
        assert abs(r.croston_rate - r.smoothed_demand / r.smoothed_interval_weeks) < 1e-6


def test_abc_xyz_shares_sum_to_one(spark):
    rows = _run("q388_abc_xyz_matrix", spark)
    assert rows
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert r.abc_class in "ABC" and r.xyz_class in "XYZ"
        assert r.n_parts >= 1


def test_ppr_mass_concentrates_near_seeds(spark):
    rows = _run("q389_personalized_pagerank", spark)
    assert rows
    ranks = [r.rank_fp for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # the top-ranked nodes must include supplier nodes (odd ids) reached
    # FROM the seed parts — pure seed self-rank would be even-only
    assert any(r.node % 2 == 1 for r in rows)
    assert all(r.rank_fp > 0 for r in rows)


def test_association_rule_metric_consistency(spark):
    rows = _run("q390_association_rules", spark)
    assert rows
    for r in rows:
        assert 0.0 < r.confidence <= 1.0
        assert r.supp_ab <= min(r.supp_a, r.supp_c)
        assert abs(r.lift - 1.0) < 10  # sanity envelope
        # lift > 1 <=> leverage > 0 (same sign by algebra)
        if r.lift > 1.0 + 1e-9:
            assert r.leverage > -1e-12
        if r.conviction is not None and r.confidence < 1.0:
            assert r.conviction > 0


def test_bitmap_distinct_bounds(spark):
    rows = _run("q391_bitmap_distinct", spark)
    assert rows
    for r in rows:
        assert 1 <= r.n_distinct_users <= r.n_events


def test_variant_shred_bucket_arithmetic(spark):
    rows = _run("q392_variant_shred", spark)
    assert rows
    for r in rows:
        assert 1 <= r.k_bucket <= 6
        assert 0 <= r.min_k <= r.max_k
        # every k in the bucket satisfies the width_bucket closed form
        assert r.min_k // 20 + 1 == r.k_bucket
        assert r.max_k // 20 + 1 == r.k_bucket
        assert r.n * r.min_k <= r.sum_k <= r.n * r.max_k


def test_collation_collapses_case_variants(spark):
    rows = _run("q393_collation_parity", spark)
    assert rows
    for r in rows:
        # the Initcap union doubles case-sensitive spellings; LCASE
        # collation must collapse them back
        assert r.n_case_insensitive * 2 == r.n_case_sensitive


def test_holdout_calibration_bins(spark):
    rows = _run("q394_holdout_calibration", spark)
    assert rows
    bins = [r.bin for r in rows]
    assert bins == sorted(bins) and all(0 <= b <= 9 for b in bins)
    for r in rows:
        assert 0.0 < r.mean_confidence < 1.0
        assert 0.0 <= r.holdout_rate <= 1.0
        # smoothed predictions inside a bin stay within its bounds
        assert r.bin / 10 - 1e-9 <= r.mean_confidence <= (r.bin + 1) / 10 + 1e-9


def test_dhash_groups_partition_images(spark):
    rows = _run("q395_image_dhash_dedup", spark)
    assert rows
    # dHash is brightness-shift invariant: the synth corpus is 7 shifted
    # variants of one gradient, so every image shares ONE structure hash
    assert len({r.dhash for r in rows}) == 1
    # ...while the exact luminance level splits the true duplicate groups
    by_key = {}
    for r in rows:
        by_key.setdefault((r.dhash, r.lum_sum), []).append(r)
    assert len(by_key) == 7
    for members in by_key.values():
        ids = [m.media_id for m in members]
        assert all(m.keeper == min(ids) for m in members)
        assert all(m.group_size == len(ids) for m in members)
        # same synth pattern class -> same id residue mod 7
        assert len({i % 7 for i in ids}) == 1
    assert sum(len(v) for v in by_key.values()) == len(rows)


def test_stream_watermark_actually_drops(spark):
    rows = _run("q396_stream_watermark_drop", spark)
    assert rows
    # the odd half of the corpus must NOT be in any emitted window: the
    # total emitted events are strictly fewer than half the corpus
    total = sum(r.n_events for r in rows)
    n_all = entrymod.queries()["q391_bitmap_distinct"](
        spark, SF_DIR
    ).agg({"n_events": "sum"}).collect()[0][0]
    assert total < n_all / 2 + 1
    starts = [r.window_start for r in rows]
    assert starts == sorted(starts)


def test_seasonal_strength_bounds(spark):
    rows = _run("q397_seasonal_strength", spark)
    assert rows
    for r in rows:
        assert 0.0 <= r.strength_seasonal <= 1.0
        assert 0.0 <= r.strength_trend <= 1.0
        assert r.n_hours > 0


def test_price_stickiness_rates(spark):
    rows = _run("q398_price_stickiness", spark)
    assert rows
    for r in rows:
        assert r.n_parts >= 1
        if r.change_rate is not None:
            assert 0.0 <= r.change_rate <= 1.0
        if r.mean_abs_change_dollars is not None:
            assert r.mean_abs_change_dollars > 0


def test_qte_quantiles_monotone(spark):
    rows = _run("q399_quantile_treatment_effect", spark)
    assert [r.q_pct for r in rows] == [25, 50, 75, 90]
    tv = [r.treated_value for r in rows]
    cv = [r.control_value for r in rows]
    assert tv == sorted(tv) and cv == sorted(cv)  # order stats are monotone
    for r in rows:
        assert abs(r.qte - (r.treated_value - r.control_value)) < 0.011


def test_curation_funnel_monotone(spark):
    rows = _run("q400_curation_funnel_audit", spark)
    assert [r.stage for r in rows] == [0, 1, 2, 3, 4]
    docs = [r.docs for r in rows]
    toks = [r.bpe_tokens for r in rows]
    # every stage only ever removes documents and tokens
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert docs[-1] >= 1
