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
