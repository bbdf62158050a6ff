"""Property tests for the mixture/sketch batch (queries_llm19) and
the eleventh analytics batch (queries_surface11): pair-rule recounts,
correlation-stat identities, ladder monotonicity, exact-percentile
membership, diversity identities, waterfill feasibility/optimality,
fingerprint-partition coarsening, and KMV error bounds."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_rapid_repeat_orders_recounted(spark):
    """Every reported pair satisfies the rule; a brute-force Python
    recount finds exactly the same pair set."""
    from etl_building_inspector_spark.plans.queries_surface11 import (
        dq_rapid_repeat_orders,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    orders: dict = {}
    for r in load_table(spark, SF, "orders").collect():
        orders.setdefault(r.o_custkey, []).append(
            (r.o_orderkey, int(round(r.o_totalprice * 100)),
             r.o_orderdate.date())
        )
    expect = set()
    for cust, rows in orders.items():
        for i, (ka, ca, da) in enumerate(rows):
            for kb, cb, db in rows[i + 1:]:
                lo, hi = min(ka, kb), max(ka, kb)
                la, lb = (ca, cb) if ka < kb else (cb, ca)
                if abs((da - db).days) <= 7 and abs(la - lb) * 20 <= la:
                    expect.add((cust, lo, hi))
    got = {
        (r.custkey, r.order_a, r.order_b)
        for r in dq_rapid_repeat_orders(spark, SF).collect()
    }
    assert got == expect


def test_xcorr_lag0_matches_direct(spark):
    """Lag-0 stats equal a direct Python recount on the aligned daily
    series; every lag's implied correlation is within [-1, 1]."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.plans.queries_surface11 import (
        timeseries_xcorr_lags,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    daily: dict = {}
    for r in (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.round("value", 0).cast("long")).alias("u"))
        .collect()
    ):
        daily[(r.event_type, str(r.day))] = r.u
    days = sorted({d for (t, d) in daily if t == "purchase"})
    xs, ys = [], []
    for d in days:
        if ("click", d) in daily:
            xs.append(daily[("click", d)])
            ys.append(daily[("purchase", d)])
    rows = {r.lag: r for r in timeseries_xcorr_lags(spark, SF).collect()}
    r0 = rows[0]
    n = len(xs)
    assert r0.n_days == n
    assert r0.corr_num == n * sum(
        x * y for x, y in zip(xs, ys)
    ) - sum(xs) * sum(ys)
    for r in rows.values():
        if r.corr_den_x > 0 and r.corr_den_y > 0:
            c = r.corr_num / math.sqrt(r.corr_den_x * r.corr_den_y)
            assert -1.0 - 1e-9 <= c <= 1.0 + 1e-9


def test_generalization_ladder_monotone(spark):
    """Coarsening can only help: group counts shrink and min group
    size grows up the ladder; exposed rows <= k * violating groups."""
    from etl_building_inspector_spark.plans.queries_surface11 import (
        privacy_generalization_ladder,
    )

    rows = {r.level: r for r in privacy_generalization_ladder(spark, SF).collect()}
    fine, mid, coarse = (
        rows["nation+segment"], rows["nation"], rows["region"]
    )
    assert fine.n_groups >= mid.n_groups >= coarse.n_groups
    assert fine.min_group_size <= mid.min_group_size <= coarse.min_group_size
    for r in rows.values():
        assert r.n_exposed_rows <= 10 * r.n_violating_groups
        assert (r.n_violating_groups == 0) == (r.min_group_size >= 10)


def test_ship_latency_percentiles_membership(spark):
    """p50/p90 are actual latency values at the exact ceil(p*n) rank,
    recounted from a raw sort; p50 <= p90 <= max."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.plans.queries_surface11 import (
        orders_ship_latency_percentiles,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    lat: dict = {}
    for r in (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("d"),
        )
        .collect()
    ):
        lat.setdefault(r.ym, []).append(r.d)
    for r in orders_ship_latency_percentiles(spark, SF).collect():
        vals = sorted(lat[r.ym])
        n = len(vals)
        assert r.n_lines == n
        assert r.p50_days == vals[(n + 1) // 2 - 1]
        assert r.p90_days == vals[(9 * n + 9) // 10 - 1]
        assert r.max_days == vals[-1]
        assert r.p50_days <= r.p90_days <= r.max_days


def test_mixture_diversity_identities(spark):
    """Simpson rationals recounted from raw group sizes; Shannon is
    within [0, ln(n_groups)] and matches a Python recount to 1e-9."""
    from etl_building_inspector_spark.plans.queries_llm19 import (
        corpus_mixture_diversity,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").collect()
    for r in corpus_mixture_diversity(spark, SF).collect():
        col = "source" if r.scope == "source" else "lang"
        counts: dict = {}
        for d in docs:
            counts[d[col]] = counts.get(d[col], 0) + 1
        n = sum(counts.values())
        assert r.n_groups == len(counts)
        assert r.simpson_num == sum(c * (c - 1) for c in counts.values())
        assert r.simpson_den == n * (n - 1)
        shannon = -sum(
            (c / n) * math.log(c / n) for c in counts.values()
        )
        assert abs(r.shannon_nats - shannon) < 1e-9
        assert -1e-12 <= r.shannon_nats <= math.log(len(counts)) + 1e-9


def test_waterfill_feasible_and_waterlevel(spark):
    """Allocations never exceed availability; total allocation is
    within n_sources of the budget (floor-division remainder only);
    uncapped sources keep everything; capped sources share one level
    that is <= every capped source's availability."""
    from etl_building_inspector_spark.plans.queries_llm19 import (
        corpus_token_budget_waterfill,
    )

    rows = corpus_token_budget_waterfill(spark, SF).collect()
    total = sum(r.avail_tokens for r in rows)
    budget = total // 2
    alloc = sum(r.alloc_tokens for r in rows)
    assert alloc <= budget
    n_capped = sum(1 for r in rows if r.capped)
    # budget = total//2 < total forces a waterline, and the floor-div
    # remainder is strictly less than the number of capped shares
    assert n_capped >= 1
    assert budget - alloc < n_capped
    levels = {r.alloc_tokens for r in rows if r.capped}
    assert len(levels) <= 1
    for r in rows:
        assert 0 <= r.alloc_tokens <= r.avail_tokens
        if not r.capped:
            assert r.alloc_tokens == r.avail_tokens
        else:
            assert r.alloc_tokens <= r.avail_tokens


def test_bytes_vs_norm_coarsening(spark):
    """Normalized fingerprints form a coarser partition: fewer or
    equal groups, more or equal duplicates, missed_by_raw >= 0 and the
    arithmetic is self-consistent."""
    from etl_building_inspector_spark.plans.queries_llm19 import (
        dedup_exact_bytes_vs_norm_eval,
    )

    r = dedup_exact_bytes_vs_norm_eval(spark, SF).collect()[0]
    assert r.groups_norm <= r.groups_raw <= r.n_docs
    assert r.dup_docs_raw == r.n_docs - r.groups_raw
    assert r.dup_docs_norm == r.n_docs - r.groups_norm
    assert r.missed_by_raw == r.groups_raw - r.groups_norm >= 0
    assert r.dup_docs_raw > 0  # the fixture plants exact dups


def test_kmv_estimate_reasonable(spark):
    """The KMV estimate is deterministic, within 25% of exact at
    k=256 (std err ~ 1/sqrt(k) ~ 6%), and err_ppm is the exact
    integer arithmetic it claims."""
    from etl_building_inspector_spark.plans.queries_llm19 import (
        sketch_bottomk_theta_eval,
    )

    r = sketch_bottomk_theta_eval(spark, SF).collect()[0]
    assert r.k == 256
    assert abs(r.kmv_estimate - r.exact_distinct) * 4 <= r.exact_distinct
    assert r.err_ppm == abs(r.kmv_estimate - r.exact_distinct) * 1_000_000 // r.exact_distinct
    r2 = sketch_bottomk_theta_eval(spark, SF).collect()[0]
    assert r2.kmv_estimate == r.kmv_estimate
