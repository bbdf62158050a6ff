"""Property tests for the operational-honesty batch (queries_llm16):
cap-loss arithmetic bounded by the real pairs query, winsorized-mean
bounds, and lifecycle conservation identities."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_lsh_cap_loss_consistent_with_pairs(spark):
    """pairs_kept per band must bound the registered pairs query's
    output: the distinct cross-band union is <= sum of per-band kept
    pairs, and every band's arithmetic obeys w*(w-1)/2 >= 0."""
    from etl_building_inspector_spark.plans.queries_llm import (
        dedup_minhash_lsh_pairs,
    )
    from etl_building_inspector_spark.plans.queries_llm16 import (
        dedup_lsh_cap_loss_report,
    )

    report = dedup_lsh_cap_loss_report(spark, SF).collect()
    assert len(report) == 4  # one row per band
    kept_total = sum(r.pairs_kept for r in report)
    for r in report:
        assert r.n_over_cap <= r.n_buckets
        assert r.pairs_kept >= 0 and r.pairs_lost >= 0
        assert (r.pairs_lost > 0) == (r.n_over_cap > 0)
    n_pairs = dedup_minhash_lsh_pairs(spark, SF).count()
    assert n_pairs <= kept_total  # distinct union <= per-band sum


def test_winsorized_mean_bounded_by_percentiles(spark):
    """The winsorized mean must lie within [p5, p95], and clipping
    counts must match a raw recount."""
    from etl_building_inspector_spark.plans.queries_llm16 import (
        outlier_winsorized_stats,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    raw: dict = {}
    for r in load_table(spark, SF, "customer").collect():
        raw.setdefault(r.c_nationkey, []).append(int(round(r.c_acctbal * 100)))
    rows = outlier_winsorized_stats(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.p5_cents <= r.winsor_mean_cents <= r.p95_cents
        vals = raw[r.c_nationkey]
        assert r.n == len(vals)
        assert r.n_clipped_low == sum(1 for v in vals if v < r.p5_cents)
        assert r.n_clipped_high == sum(1 for v in vals if v > r.p95_cents)


def test_lifecycle_states_conserve_users(spark):
    """Per day: new + retained + resurrected must equal the day's
    distinct active users; and since churn is charged to d for users
    active on d-1 and absent on d, active(d-1) = retained(d) +
    churned(d) for every calendar-adjacent day. Both identities
    recounted from raw events."""
    from etl_building_inspector_spark.plans.queries_llm16 import (
        events_user_lifecycle_states,
    )
    from etl_building_inspector_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    active = (
        load_table(spark, SF, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .collect()
    )
    by_day: dict = {}
    for r in active:
        by_day.setdefault(r.d, set()).add(r.user_id)
    days = sorted(by_day)
    rows = events_user_lifecycle_states(spark, SF).collect()
    table: dict = {}
    for r in rows:
        table.setdefault(r.day, {})[r.state] = r.n_users
    for i, d in enumerate(days):
        st = table.get(d, {})
        inflow = st.get("new", 0) + st.get("retained", 0) + st.get("resurrected", 0)
        assert inflow == len(by_day[d]), d
        if i > 0:
            prev = days[i - 1]
            # calendar-adjacent only: retained/churned split applies
            # to users active the previous CALENDAR day
            if (d - prev).days == 1:
                assert st.get("retained", 0) + table.get(d, {}).get(
                    "churned", 0
                ) == len(by_day[prev]), d
