"""Property tests for the corpus-growth/retrieval batch
(queries_llm18) and the tenth analytics batch (queries_surface10):
session-window parity with the manual sessionizer, clustering-
coefficient identities, anomaly-rule recounts, nearest-asof
optimality, Heaps monotonicity, radius-search completeness vs brute
force, shingle-sensitivity orderings, and DP sensitivity bounds."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_session_window_native_counts(spark):
    """Native session_window must agree with the manual gap-merge on
    totals: same event count overall, and per-user session counts
    equal to events_sessionize's (both use the probed strict-`>`
    boundary convention, so they agree on ANY data)."""
    from etl_building_inspector_spark.plans.queries_core import (
        events_sessionize,
    )
    from etl_building_inspector_spark.plans.queries_surface10 import (
        events_session_window_native,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    rows = events_session_window_native(spark, SF).collect()
    assert sum(r.n_events for r in rows) == load_table(
        spark, SF, "events"
    ).count()
    per_user: dict = {}
    for r in rows:
        per_user[r.user_id] = per_user.get(r.user_id, 0) + 1
        assert r.session_start < r.session_end
        assert r.n_events >= 1
    manual = {r.user_id: r.n_sessions for r in events_sessionize(spark, SF).collect()}
    assert per_user == manual


def test_local_clustering_identities(spark):
    """Triangles per vertex: 3x the global triangle count when summed
    over ALL vertices; every row has n_triangles <= n_wedges and
    degree consistent with wedges."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.operators.graph import (
        local_triangle_counts,
        triangle_count,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey").filter(F.col("u") != F.col("v")).select("u", "v")
    )
    local = local_triangle_counts(edges).collect()
    total = triangle_count(edges).collect()[0].n_triangles
    assert sum(r.n_triangles for r in local) == 3 * total
    for r in local:
        assert r.n_wedges == r.degree * (r.degree - 1) // 2
        assert 0 <= r.n_triangles <= r.n_wedges


def test_volume_anomaly_rule_recounted(spark):
    """med7 is the exact middle of the trailing 7 daily counts and the
    flag matches the doubling/halving rule, recounted in Python."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.plans.queries_surface10 import (
        dq_volume_anomaly_daily,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    daily: dict = {}
    ev = load_table(spark, SF, "events")
    for r in (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect()
    ):
        daily.setdefault(r.event_type, []).append((str(r.day), r.n))
    out = dq_volume_anomaly_daily(spark, SF).collect()
    by_type: dict = {}
    for t, series in daily.items():
        series.sort()
        counts = [n for _, n in series]
        for i in range(7, len(series)):
            med = sorted(counts[i - 7 : i])[3]
            by_type[(t, series[i][0])] = (
                counts[i],
                med,
                counts[i] > 2 * med or 2 * counts[i] < med,
            )
    assert len(out) == len(by_type)
    for r in out:
        n, med, flag = by_type[(r.event_type, str(r.day))]
        assert (r.n_events, r.med7, r.is_anomaly) == (n, med, flag)


def test_asof_nearest_is_optimal(spark):
    """For every matched purchase: the reported distance equals the
    true minimum |click_ts - purchase_ts| over ALL the user's clicks
    (recounted in Python), and the chosen click realizes it."""
    from etl_building_inspector_spark.plans.queries_surface10 import (
        asof_join_nearest,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").collect()
    clicks: dict = {}
    purchases = []
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000)
        if r.event_type == "click":
            clicks.setdefault(r.user_id, []).append((us, r.event_id))
        elif r.event_type == "purchase":
            purchases.append((r.user_id, us, r.event_id))
    out = {r.purchase_id: r for r in asof_join_nearest(spark, SF).collect()}
    n_matched = 0
    for user_id, pus, pid in purchases:
        cl = clicks.get(user_id)
        if not cl:
            assert pid not in out
            continue
        n_matched += 1
        best = min(abs(cus - pus) for cus, _ in cl)
        r = out[pid]
        assert r.dist_us == best
        chosen = next(cus for cus, cid in cl if cid == r.click_id)
        assert abs(chosen - pus) == best
    assert n_matched == len(out)


def test_heaps_growth_monotone(spark):
    """Cumulative curves are strictly ordered: tokens_cum and
    vocab_cum non-decreasing, vocab <= tokens, final vocab equals the
    corpus's true distinct token count."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.functions.text import tokens
    from etl_building_inspector_spark.plans.queries_llm18 import (
        text_vocab_growth_heaps,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    rows = sorted(
        text_vocab_growth_heaps(spark, SF).collect(), key=lambda r: r.bucket
    )
    assert [r.bucket for r in rows] == list(range(10))
    for a, b in zip(rows, rows[1:]):
        assert a.tokens_cum <= b.tokens_cum
        assert a.vocab_cum <= b.vocab_cum
    docs = load_table(spark, SF, "documents")
    true_vocab = (
        docs.select(F.explode(tokens("text")).alias("t")).distinct().count()
    )
    assert rows[-1].vocab_cum == true_vocab
    assert all(r.vocab_cum <= r.tokens_cum for r in rows)


def test_range_search_complete_vs_bruteforce(spark):
    """Radius search returns EXACTLY the pairs a full brute-force
    cosine pass finds above the threshold (completeness is the whole
    point vs the bucketed variants)."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.operators.similarity import _dot, _norm
    from etl_building_inspector_spark.plans.queries_llm18 import (
        RANGE_SEARCH_QUERIES,
        RANGE_SEARCH_THRESHOLD,
        ann_range_search,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    got = {
        (r.q_id, r.vec_id) for r in ann_range_search(spark, SF).collect()
    }
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < RANGE_SEARCH_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    cos = _dot(F.col("qe"), F.col("embedding")) / (
        _norm(F.col("qe")) * _norm(F.col("embedding"))
    )
    brute = {
        (r.q_id, r.vec_id)
        for r in emb.crossJoin(q)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("c"))
        .filter(F.col("c") >= RANGE_SEARCH_THRESHOLD)
        .collect()
    }
    assert got == brute


def test_shingle_sensitivity_orderings(spark):
    """Longer shingles => fewer total shingles (each doc loses n-1
    slots) and a HIGHER distinct/total ratio (rarer shingles); totals
    recounted from the shingle helper."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.functions.text import shingles
    from etl_building_inspector_spark.plans.queries_llm18 import (
        dedup_shingle_size_sensitivity,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    rows = sorted(
        dedup_shingle_size_sensitivity(spark, SF).collect(),
        key=lambda r: r.shingle_n,
    )
    assert [r.shingle_n for r in rows] == [2, 3, 5]
    totals = [r.total_shingles for r in rows]
    assert totals == sorted(totals, reverse=True)
    # distinct/total ratio strictly grows with n: cross-multiplied
    for a, b in zip(rows, rows[1:]):
        assert (
            a.distinct_shingles * b.total_shingles
            <= b.distinct_shingles * a.total_shingles
        )
    docs = load_table(spark, SF, "documents")
    t2 = docs.agg(F.sum(F.size(shingles("text", 2)))).collect()[0][0]
    assert rows[0].total_shingles == t2


def test_histogram_sensitivity_bounds(spark):
    """max contribution <= bucket rows, n_users <= rows, and the max
    recounted from a raw (type, user) count."""
    from etl_building_inspector_spark.plans.queries_llm18 import (
        privacy_histogram_sensitivity,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    per: dict = {}
    for r in load_table(spark, SF, "events").collect():
        k = (r.event_type, r.user_id)
        per[k] = per.get(k, 0) + 1
    rows = privacy_histogram_sensitivity(spark, SF).collect()
    for r in rows:
        contribs = [v for (t, _), v in per.items() if t == r.event_type]
        assert r.n_rows == sum(contribs)
        assert r.n_users == len(contribs)
        assert r.max_user_contribution == max(contribs)
        assert 1 <= r.max_user_contribution <= r.n_rows
