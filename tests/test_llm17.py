"""Property tests for the corpus-QA/pre-flight-audit batch
(queries_llm17) and the ninth analytics batch (queries_surface9):
rule-pass bounds, Zipf monotonicity, audit arithmetic recounted from
raw rows, sufficient-statistic identities, extremes preservation,
privacy-triad bounds, and timeout monotonicity."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_gopher_rule_counts_bounded(spark):
    """Every per-rule pass count is bounded by n_docs; the composite
    is bounded by the min of the four rules; totals cover the corpus."""
    from etl_building_inspector_spark.plans.queries_llm17 import (
        quality_gopher_rules,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    rows = quality_gopher_rules(spark, SF).collect()
    assert rows, "at least one source"
    total = sum(r.n_docs for r in rows)
    assert total == load_table(spark, SF, "documents").count()
    for r in rows:
        for c in ("n_pass_wordcount", "n_pass_meanlen", "n_pass_stopword",
                  "n_pass_alpha"):
            assert 0 <= r[c] <= r.n_docs
        assert r.n_pass_all <= min(
            r.n_pass_wordcount, r.n_pass_meanlen,
            r.n_pass_stopword, r.n_pass_alpha,
        )


def test_zipf_profile_rank_order(spark):
    """Ranks are 1..20, frequencies non-increasing, the ppm column is
    exactly freq*1e6 // max_freq, and rank 1 has ppm == 1e6."""
    from etl_building_inspector_spark.plans.queries_llm17 import (
        text_zipf_profile,
    )

    rows = text_zipf_profile(spark, SF).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert rows[0].freq_vs_top_ppm == 1_000_000
    for r in rows:
        assert r.freq_vs_top_ppm == r.freq * 1_000_000 // rows[0].freq
        assert r.rank_freq_product == r.rank * r.freq


def test_compression_proxy_buckets_partition_docs(spark):
    """Bucket ids stay in [0, 9] and bucket counts sum to the number
    of docs with >= 2 tokens (the only ones that have a bigram)."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.functions.text import tokens
    from etl_building_inspector_spark.plans.queries_llm17 import (
        text_compression_ratio_proxy,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    rows = text_compression_ratio_proxy(spark, SF).collect()
    assert all(0 <= r.bucket <= 9 for r in rows)
    eligible = (
        load_table(spark, SF, "documents")
        .filter(F.size(tokens("text")) >= 2)
        .count()
    )
    assert sum(r.n_docs for r in rows) == eligible


def test_threshold_sensitivity_totals_match_pairs(spark):
    """The est_matches histogram totals exactly the candidate-pair
    count of the registered LSH pairs query (same machinery), and
    every bucket is within [0, k]."""
    from etl_building_inspector_spark.plans.queries_llm import (
        dedup_minhash_lsh_pairs,
    )
    from etl_building_inspector_spark.plans.queries_llm17 import (
        dedup_threshold_sensitivity,
    )

    hist = dedup_threshold_sensitivity(spark, SF).collect()
    assert all(0 <= r.est_matches <= 8 for r in hist)
    assert sum(r.n_pairs for r in hist) == dedup_minhash_lsh_pairs(
        spark, SF
    ).count()


def test_survivor_bias_conserves_docs_and_chars(spark):
    """kept + dropped == total per source (docs AND chars), and the
    global kept count equals the distinct-fingerprint count."""
    from etl_building_inspector_spark.functions.text import fingerprint
    from etl_building_inspector_spark.plans.queries_llm import (
        _docs_with_dups,
    )
    from etl_building_inspector_spark.plans.queries_llm17 import (
        corpus_dedup_survivor_bias,
    )

    rows = corpus_dedup_survivor_bias(spark, SF).collect()
    docs = _docs_with_dups(spark, SF)
    assert sum(r.n_total for r in rows) == docs.count()
    assert sum(r.n_kept for r in rows) == (
        docs.select(fingerprint("text")).distinct().count()
    )
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_total
        assert r.n_kept >= 1  # keep-first always keeps one per group


def test_join_explosion_audit_recounted(spark):
    """Top keys recounted from a raw pandas groupby: same fanout
    arithmetic, same ordering."""
    from etl_building_inspector_spark.plans.queries_llm17 import (
        join_explosion_audit,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    rows = join_explosion_audit(spark, SF).collect()
    counts: dict = {}
    for r in load_table(spark, SF, "lineitem").select("l_partkey").collect():
        counts[r.l_partkey] = counts.get(r.l_partkey, 0) + 1
    expect = sorted(
        ((n * (n - 1) // 2, k, n) for k, n in counts.items()),
        key=lambda t: (-t[0], t[1]),
    )[: len(rows)]
    got = [(r.n_self_pairs, r.partkey, r.n_rows) for r in rows]
    assert got == [(p, k, n) for p, k, n in expect]


def test_shuffle_balance_report_sums_to_table(spark):
    """Bucket loads cover every row exactly once; load_ppm stays
    consistent with n_rows*32e6 // total."""
    from etl_building_inspector_spark.plans.queries_llm17 import (
        shuffle_partition_balance_report,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    rows = shuffle_partition_balance_report(spark, SF).collect()
    total = load_table(spark, SF, "lineitem").count()
    assert sum(r.n_rows for r in rows) == total
    for r in rows:
        assert 0 <= r.bucket < 32
        assert r.load_ppm == r.n_rows * 32 * 1_000_000 // total


def test_acf_lag1_sufficient_stats_identity(spark):
    """Recompute the lag-1 stats per event_type from collected daily
    totals: num and dens must match, and the implied correlation must
    be within [-1, 1]."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.plans.queries_surface9 import (
        timeseries_acf_lag1,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    daily: dict = {}
    ev = load_table(spark, SF, "events")
    for r in (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.round("value", 0).cast("long")).alias("u"))
        .collect()
    ):
        daily.setdefault(r.event_type, []).append((r.day, r.u))
    for r in timeseries_acf_lag1(spark, SF).collect():
        series = [u for _, u in sorted(daily[r.event_type])]
        xs, ys = series[:-1], series[1:]
        n = len(xs)
        assert r.n_pairs == n
        sxy = sum(x * y for x, y in zip(xs, ys))
        assert r.corr_num == n * sxy - sum(xs) * sum(ys)
        assert r.corr_den_x == n * sum(x * x for x in xs) - sum(xs) ** 2
        assert r.corr_den_y == n * sum(y * y for y in ys) - sum(ys) ** 2
        if r.corr_den_x > 0 and r.corr_den_y > 0:
            corr = r.corr_num / math.sqrt(r.corr_den_x * r.corr_den_y)
            assert -1.0 - 1e-9 <= corr <= 1.0 + 1e-9


def test_downsample_minmax_preserves_extremes(spark):
    """For every (event_type, day): the emitted min/max cents match a
    raw recount, and the tiebreak picks the smallest event_id for min
    and the largest for max."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.plans.queries_surface9 import (
        timeseries_downsample_minmax,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    raw: dict = {}
    ev = load_table(spark, SF, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    for r in ev.collect():
        raw.setdefault((r.event_type, str(r.day)), []).append(
            (r.cents, r.event_id)
        )
    out = timeseries_downsample_minmax(spark, SF).collect()
    assert len(out) == 2 * len(raw)
    for r in out:
        vals = raw[(r.event_type, str(r.day))]
        if r.kind == "min":
            assert (r.cents, r.event_id) == min(vals)
        else:
            assert (r.cents, r.event_id) == max(vals)


def test_norm_outliers_ceil_one_percent(spark):
    """Per label: exactly ceil(n/100) rows, ranks contiguous from 1,
    and every selected norm2 >= the label's best excluded norm2."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.plans.queries_surface9 import (
        emb_norm_percentile_outliers,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    out: dict = {}
    for r in emb_norm_percentile_outliers(spark, SF).collect():
        out.setdefault(r.label, []).append((r.rank, r.norm2))
    emb = load_table(spark, SF, "embeddings")
    sizes = {
        r.label: r.n
        for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    for label, rows in out.items():
        rows.sort()
        n = sizes[label]
        assert len(rows) == -(-n // 100)  # ceil(n * 1%)
        assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
        norms = [v for _, v in rows]
        assert norms == sorted(norms, reverse=True)


def test_t_closeness_bounds_and_zero_case(spark):
    """TVD ppm is within [0, 1e6]; a group whose distribution equals
    the global one (synthetic check: the whole table as one group)
    must give 0."""
    from etl_building_inspector_spark.plans.queries_surface9 import (
        privacy_t_closeness,
    )

    rows = privacy_t_closeness(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.tvd_ppm <= 1_000_000
        assert r.violates_t == (r.tvd_ppm > 200_000)


def test_gap_sensitivity_monotone(spark):
    """Longer timeouts can only merge sessions: counts are
    non-increasing in the timeout, bounded below by n_users and above
    by n_events; the 30-minute row matches events_sessionize's total."""
    from etl_building_inspector_spark.plans.queries_core import (
        events_sessionize,
    )
    from etl_building_inspector_spark.plans.queries_surface9 import (
        sessionization_gap_sensitivity,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    rows = sorted(
        sessionization_gap_sensitivity(spark, SF).collect(),
        key=lambda r: r.timeout_s,
    )
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    ev = load_table(spark, SF, "events")
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()
    for r in rows:
        assert n_users <= r.n_sessions <= n_events
        assert r.n_events == n_events
    sess = events_sessionize(spark, SF).collect()
    assert rows[1].timeout_s == 1800
    assert rows[1].n_sessions == sum(r.n_sessions for r in sess)
