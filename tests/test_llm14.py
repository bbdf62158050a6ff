"""Property tests for the set-algebra / sampling / l-diversity batch
(queries_llm14)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_building_inspector_spark.plans.queries_llm14 import (
    LDIV_L,
    NS_DRAWS,
    corpus_negative_sampling,
    privacy_l_diversity,
    sketch_hll_intersection_eval,
)

SF = "/root/testdata/sf0.001"


def test_negative_sampling_totality_and_bias(spark):
    """The inverse-CDF intervals partition [0, 2^32): every draw lands
    in exactly one interval, so sum(n_draws) == NS_DRAWS. And the
    unigram^0.75 bias must show: the draw-weighted mean frequency of
    sampled tokens exceeds the unweighted vocab mean frequency."""
    from etl_building_inspector_spark.functions.text import tokens
    from etl_building_inspector_spark.sources.tables import load_table

    rows = corpus_negative_sampling(spark, SF).collect()
    assert sum(r.n_draws for r in rows) == NS_DRAWS
    vocab = (
        load_table(spark, SF, "documents")
        .select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .count()
        .collect()
    )
    mean_vocab_freq = sum(r["count"] for r in vocab) / len(vocab)
    mean_draw_freq = sum(r.freq * r.n_draws for r in rows) / NS_DRAWS
    assert mean_draw_freq > mean_vocab_freq


def test_hll_intersection_exact_side_is_truth(spark):
    """n_exact must equal the directly-computed distinct-user overlap
    per pair (independent recomputation, not the shared CTE)."""
    from etl_building_inspector_spark.plans.queries_llm14 import OVERLAP_PAIRS
    from etl_building_inspector_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").select("event_type", "user_id").distinct()
    users = {}
    for r in ev.collect():
        users.setdefault(r.event_type, set()).add(r.user_id)
    got = {
        (r.type_a, r.type_b): (r.n_exact, r.est_inter)
        for r in sketch_hll_intersection_eval(spark, SF).collect()
    }
    assert set(got) == set(OVERLAP_PAIRS)
    for (a, b), (n_exact, est) in got.items():
        assert n_exact == len(users[a] & users[b])
        assert est == est  # finite (not NaN)


def test_l_diversity_groups_verified(spark):
    """Every reported group truly has >= 2 members and < L distinct
    segments (recomputed from raw customer rows)."""
    from etl_building_inspector_spark.sources.tables import load_table

    cust = load_table(spark, SF, "customer").collect()
    groups = {}
    for r in cust:
        cents = int(round(r.c_acctbal * 100))
        band = (cents + 100000) // 100000
        groups.setdefault((r.c_nationkey, band), []).append(r.c_mktsegment)
    rows = privacy_l_diversity(spark, SF).collect()
    reported = {(r.c_nationkey, r.bal_band) for r in rows}
    expect = {
        k
        for k, segs in groups.items()
        if len(segs) >= 2 and len(set(segs)) < LDIV_L
    }
    assert reported == expect
    for r in rows:
        segs = groups[(r.c_nationkey, r.bal_band)]
        assert r.group_size == len(segs)
        assert r.n_distinct_sensitive == len(set(segs))


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
    n_pairs = dedup_minhash_lsh_pairs.__wrapped__(spark, SF).count() if hasattr(
        dedup_minhash_lsh_pairs, "__wrapped__"
    ) else dedup_minhash_lsh_pairs(spark, SF).count()
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
    distinct active users, and churned(d) = active(d-1) - retained(d)
    ... wait, churn is charged to d for users active on d-1 and absent
    on d, so active(d-1) = retained(d) + churned(d) for every
    non-first day. Both identities recounted from raw events."""
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
