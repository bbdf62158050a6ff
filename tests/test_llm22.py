"""Property tests for the thirteenth analytics batch
(queries_surface13) and the twenty-second LLM batch (queries_llm22):
conservation identities, window-frame semantics recounted, curriculum
normalization, winnow monotonicity, margin ordering, KMV merge
identity, truncation-curve monotonicity, TVD bounds, and planning
arithmetic."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_fill_rate_and_returns_bounds(spark):
    """SLA and return-rate ppm arithmetic exact; totals match the
    join cardinality."""
    from etl_building_inspector_spark.plans.queries_surface13 import (
        lineitem_return_rate_by_nation,
        orders_fill_rate_sla,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    n_lines = load_table(spark, SF, "lineitem").count()
    sla = orders_fill_rate_sla(spark, SF).collect()
    assert sum(r.n_lines for r in sla) == n_lines
    for r in sla:
        assert r.sla_ppm == r.n_within_sla * 1_000_000 // r.n_lines
    ret = lineitem_return_rate_by_nation(spark, SF).collect()
    assert sum(r.n_lines for r in ret) == n_lines
    for r in ret:
        assert r.return_ppm == r.n_returned * 1_000_000 // r.n_lines


def test_first_last_nth_recounted(spark):
    """first/second/last custkey per nation recounted from a raw
    Python sort on (cents, custkey)."""
    from etl_building_inspector_spark.plans.queries_surface13 import (
        window_first_last_value_battery,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    by_nation: dict = {}
    for r in load_table(spark, SF, "customer").collect():
        by_nation.setdefault(r.c_nationkey, []).append(
            (int(round(r.c_acctbal * 100)), r.c_custkey)
        )
    for r in window_first_last_value_battery(spark, SF).collect():
        vals = sorted(by_nation[r.nationkey])
        assert r.first_cust == vals[0][1]
        assert r.last_cust == vals[-1][1]
        assert r.second_cust == (vals[1][1] if len(vals) > 1 else None)


def test_ratio_to_report_sums(spark):
    """Shares within a nation sum to <= 1e6 and each share is the
    exact floor-div of its cents."""
    from etl_building_inspector_spark.plans.queries_surface13 import (
        window_ratio_to_report,
    )

    rows = window_ratio_to_report(spark, SF).collect()
    by_nation: dict = {}
    for r in rows:
        by_nation.setdefault(r.nationkey, []).append(r)
    for nation, rs in by_nation.items():
        total = sum(r.cents for r in rs)
        assert sum(r.share_ppm for r in rs) <= 1_000_000
        assert sum(r.share_ppm for r in rs) > 1_000_000 - len(rs)
        for r in rs:
            assert r.share_ppm == r.cents * 1_000_000 // total


def test_lifecycle_and_cohort_identities(spark):
    """new + returning == active every month; first months are new;
    cohort medians are actual observed day values."""
    from etl_building_inspector_spark.plans.queries_surface13 import (
        cohort_time_to_first_purchase,
        customers_monthly_lifecycle,
    )

    life = customers_monthly_lifecycle(spark, SF).collect()
    assert life
    for r in life:
        assert r.n_new + r.n_returning == r.n_active
    first = min(life, key=lambda r: r.ym)
    assert first.n_returning == 0  # nobody predates the first month
    for r in cohort_time_to_first_purchase(spark, SF).collect():
        assert 0 <= r.p50_days <= r.max_days
        assert r.n_converted >= 1


def test_gap_buckets_and_weekday_totals(spark):
    """Gap buckets cover exactly n_events - n_users gaps; weekday
    profile covers all orders."""
    from etl_building_inspector_spark.plans.queries_surface13 import (
        events_gap_time_buckets,
        orders_weekday_profile,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    n_gaps = ev.count() - ev.select("user_id").distinct().count()
    assert sum(r.n_gaps for r in events_gap_time_buckets(spark, SF).collect()) == n_gaps
    wk = orders_weekday_profile(spark, SF).collect()
    assert sum(r.n_orders for r in wk) == load_table(spark, SF, "orders").count()
    assert sorted(r.iso_weekday for r in wk) == list(range(1, 8))


def test_asof_forward_is_next_purchase(spark):
    """Every matched click's purchase is the EARLIEST purchase at or
    after the click (recounted in Python)."""
    from etl_building_inspector_spark.plans.queries_surface13 import (
        asof_join_forward,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    purchases: dict = {}
    clicks = []
    for r in load_table(spark, SF, "events").collect():
        if r.event_type == "purchase":
            purchases.setdefault(r.user_id, []).append(r.ts)
        elif r.event_type == "click":
            clicks.append((r.user_id, r.ts, r.event_id))
    out = {r.click_id: r for r in asof_join_forward(spark, SF).collect()}
    for user_id, ts, cid in clicks:
        nxt = sorted(p for p in purchases.get(user_id, []) if p >= ts)
        if not nxt:
            assert cid not in out
        else:
            assert out[cid].next_purchase_ts == nxt[0]


def test_hhi_bounds(spark):
    """1/n <= HHI <= 1 for every nation (cross-multiplied)."""
    from etl_building_inspector_spark.plans.queries_surface13 import (
        revenue_concentration_hhi,
    )

    for r in revenue_concentration_hhi(spark, SF).collect():
        assert r.hhi_num <= r.hhi_den
        assert r.hhi_num * r.n_suppliers >= r.hhi_den  # HHI >= 1/n


def test_curriculum_weights_normalized(spark):
    """Every phase's weights sum to ~1e6 (floor remainder < n_sources)
    and later phases tilt toward higher terciles."""
    from etl_building_inspector_spark.plans.queries_llm22 import (
        corpus_curriculum_phases,
    )

    rows = corpus_curriculum_phases(spark, SF).collect()
    phases: dict = {}
    for r in rows:
        phases.setdefault(r.phase, []).append(r)
    assert set(phases) == {1, 2, 3}
    for p, rs in phases.items():
        s = sum(r.weight_ppm for r in rs)
        assert 1_000_000 - len(rs) < s <= 1_000_000
    w3 = {r.source: r.weight_ppm for r in phases[3]}
    t = {r.source: r.tercile for r in phases[3]}
    hi = [w3[s] for s in w3 if t[s] == 3]
    lo = [w3[s] for s in w3 if t[s] == 1]
    assert min(hi) > max(lo)


def test_winnow_sensitivity_monotone(spark):
    """Fingerprint volume is non-increasing in w; hash volume is
    constant; w=4 matches text_winnow_fingerprints' total."""
    from etl_building_inspector_spark.plans.queries_llm3 import (
        text_winnow_fingerprints,
    )
    from etl_building_inspector_spark.plans.queries_llm22 import (
        dedup_winnow_window_sensitivity,
    )

    rows = sorted(
        dedup_winnow_window_sensitivity(spark, SF).collect(),
        key=lambda r: r.w,
    )
    assert [r.w for r in rows] == [4, 8, 16]
    fps = [r.n_fingerprints for r in rows]
    assert fps == sorted(fps, reverse=True)
    assert len({r.n_hashes for r in rows}) == 1
    assert rows[0].n_fingerprints == text_winnow_fingerprints(spark, SF).count()


def test_margin_and_radius_consistent(spark):
    """cos1 >= cos2 and margin == cos1 - cos2; radius counts are
    non-increasing in the threshold."""
    from etl_building_inspector_spark.plans.queries_llm22 import (
        ann_radius_sensitivity,
        ann_topk_margin_eval,
    )

    for r in ann_topk_margin_eval(spark, SF).collect():
        assert r.cos1 >= r.cos2
        assert abs(r.margin - (r.cos1 - r.cos2)) < 1e-12
    for r in ann_radius_sensitivity(spark, SF).collect():
        assert r.n_ge_200 >= r.n_ge_250 >= r.n_ge_300 >= 0


def test_embedding_exact_census(spark):
    """Clones planted on every 10th vector: the census shows exactly
    the size-2 groups for them and size-1 for the rest."""
    from etl_building_inspector_spark.plans.queries_llm22 import (
        dedup_embedding_exact,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    n = load_table(spark, SF, "embeddings").count()
    n_cloned = load_table(spark, SF, "embeddings").filter(
        "vec_id % 10 = 0"
    ).count()
    rows = {r.group_size: r for r in dedup_embedding_exact(spark, SF).collect()}
    assert rows[2].n_groups == n_cloned
    assert rows[1].n_groups == n - n_cloned
    assert sum(r.n_vectors for r in rows.values()) == n + n_cloned


def test_kmv_merge_identity(spark):
    """The mergeability identity holds exactly."""
    from etl_building_inspector_spark.plans.queries_llm22 import (
        sketch_kmv_merge_eval,
    )

    r = sketch_kmv_merge_eval(spark, SF).collect()[0]
    assert r.merge_exact
    assert r.direct_hk == r.merged_hk


def test_truncation_curve_monotone(spark):
    """Longer contexts keep more and lose less; kept+lost is the
    constant token total."""
    from etl_building_inspector_spark.plans.queries_llm22 import (
        pack_truncation_loss_curve,
    )

    rows = sorted(
        pack_truncation_loss_curve(spark, SF).collect(),
        key=lambda r: r.context_len,
    )
    totals = {r.kept_tokens + r.lost_tokens for r in rows}
    assert len(totals) == 1
    kept = [r.kept_tokens for r in rows]
    assert kept == sorted(kept)
    for r in rows:
        assert r.lost_ppm == r.lost_tokens * 1_000_000 // (
            r.kept_tokens + r.lost_tokens
        )


def test_source_tvd_and_hapax_bounds(spark):
    """TVD ppm within [0, 1e6]; hapax occurrences bounded by token
    count and hapax tokens are globally unique by construction."""
    from etl_building_inspector_spark.plans.queries_llm22 import (
        corpus_source_token_tvd,
        text_hapax_ratio_by_source,
    )

    for r in corpus_source_token_tvd(spark, SF).collect():
        assert 0 <= r.tvd_ppm <= 1_000_000
    for r in text_hapax_ratio_by_source(spark, SF).collect():
        assert 0 <= r.n_hapax <= r.n_tokens
        assert r.hapax_ppm == r.n_hapax * 1_000_000 // r.n_tokens


def test_planning_and_percentiles_arithmetic(spark):
    """rows_per_file = rows DIV files with files >= 1; percentiles are
    ordered and are observed values."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.plans.queries_llm22 import (
        corpus_length_percentiles_by_lang,
        layout_partition_size_planning,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    for r in layout_partition_size_planning(spark, SF).collect():
        assert r.n_files >= 1
        assert r.rows_per_file == r.n_rows // r.n_files
    lengths: dict = {}
    for row in load_table(spark, SF, "documents").collect():
        lengths.setdefault(row.lang, []).append(row.n_chars)
    for r in corpus_length_percentiles_by_lang(spark, SF).collect():
        vals = sorted(lengths[r.lang])
        n = len(vals)
        assert r.n_docs == n
        assert r.p25_chars == vals[(n + 3) // 4 - 1]
        assert r.p50_chars == vals[(n + 1) // 2 - 1]
        assert r.p75_chars == vals[(3 * n + 3) // 4 - 1]
        assert r.p95_chars == vals[(19 * n + 19) // 20 - 1]
        assert r.p25_chars <= r.p50_chars <= r.p75_chars <= r.p95_chars
