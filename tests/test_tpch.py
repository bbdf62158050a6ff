"""Plan guards for the TPC-H-shape battery (queries_tpch.py): the
scale-relevant physical properties per query shape -- pushdown into
the fact scan, fixed-dim broadcasts, semi/anti (not fanout+dedup)
joins, and window-over-aggregate instead of self-joins."""

from __future__ import annotations

import re

from etl_building_inspector_spark.plans.registry import QUERIES


def _executed(spark, name, sf_dir):
    return (
        QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )


def _full(spark, name, sf_dir):
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().toString()


def test_q6_pushdown_and_pruned_schema(spark, sf_dir):
    qe = _full(spark, "tpch_q6_forecast_revenue", sf_dir)
    # predicates reach the parquet scan (toString elides the full
    # PushedFilters list, so assert on its visible head)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in qe
    # scan reads only the 4 referenced columns
    schema = next(s for s in re.findall(r"ReadSchema: struct<([^>]*)", qe))
    for col in ("l_orderkey", "l_tax", "l_returnflag", "l_partkey"):
        assert col not in schema, f"unpruned column {col} in {schema}"


def test_q5_nation_region_broadcast_no_cartesian(spark, sf_dir):
    plan = _executed(spark, "tpch_q5_local_supplier_volume", sf_dir)
    assert "BroadcastHashJoin" in plan  # the collapsed nation⋈region dim
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q4_exists_is_left_semi(spark, sf_dir):
    plan = _executed(spark, "tpch_q4_order_priority_exists", sf_dir)
    assert "LeftSemi" in plan
    # EXISTS must not fan out: no dedup-after-join aggregate on orderkey
    assert "CartesianProduct" not in plan


def test_q16_not_in_is_left_anti(spark, sf_dir):
    plan = _executed(spark, "tpch_q16_supplier_variety", sf_dir)
    assert "LeftAnti" in plan


def test_q17_window_not_self_join(spark, sf_dir):
    # per-part stats via window over the SAME scan: exactly one
    # lineitem parquet scan in the plan
    qe = _full(spark, "tpch_q17_small_quantity_revenue", sf_dir)
    executed = qe[qe.index("== Physical Plan ==") :]
    assert executed.count("lineitem.parquet") <= 1 or (
        executed.count("Scan parquet") - executed.count("part.parquet") <= 1
    )
    assert "Window" in executed


def test_q15_max_is_broadcast_not_collected(spark, sf_dir):
    plan = _executed(spark, "tpch_q15_top_supplier", sf_dir)
    # global max arrives as a 1-row broadcast join, not a driver literal
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q10_rank_after_aggregate(spark, sf_dir):
    # top-20 window must sit ABOVE the customer-grain aggregate
    plan = _executed(spark, "tpch_q10_returned_items", sf_dir)
    agg_pos = plan.index("HashAggregate")
    win_pos = plan.index("Window")
    # executedPlan prints top-down: Window (later stage) appears first
    assert win_pos < agg_pos


def test_battery_no_nested_loop_anywhere(spark, sf_dir):
    for name in (
        "tpch_q2_best_supplier",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_profit_by_nation_year",
        "tpch_q12_shipping_delay_buckets",
        "tpch_q13_order_count_distribution",
        "tpch_q14_promo_share",
        "tpch_q18_large_volume_customers",
        "tpch_q19_disjunctive_predicates",
        "tpch_q20_dominant_suppliers",
    ):
        plan = _executed(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q19_partkey_equi_join_extracted(spark, sf_dir):
    # the OR predicate must not demote the join to nested-loop; the
    # common l_partkey = p_partkey equi-key is extracted
    plan = _executed(spark, "tpch_q19_disjunctive_predicates", sf_dir)
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan


def test_spatial_knn_grid_equi_join_only(spark, sf_dir):
    # the KNN candidate join must be an equi hash join on (layer,
    # cell), never a distance cross join
    plan = _executed(spark, "spatial_knn_join", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_source_overlap_no_shingle_self_join(spark, sf_dir):
    # pair generation is a per-shingle source-set explode; the only
    # joins are the two broadcast per-source-count lookups
    plan = _executed(spark, "corpus_source_overlap", sf_dir)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2
    assert "Generate explode" in plan or "Generate" in plan


def test_cusum_single_preaggregate(spark, sf_dir):
    # everything after the daily pre-agg runs at days x types grain:
    # exactly one aggregate over raw events
    plan = _executed(spark, "timeseries_cusum_changepoint", sf_dir)
    assert plan.count("HashAggregate") <= 4  # partial+final daily agg (+AQE variants)
    assert "Window" in plan


def test_graph_additions_no_nested_loop(spark, sf_dir):
    for name in (
        "graph_label_propagation",
        "graph_kcore",
        "graph_common_neighbors_topk",
        "graph_neighbor_jaccard_topk",
    ):
        plan = _executed(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_kcore_rounds_are_semi_joins(spark, sf_dir):
    plan = _executed(spark, "graph_kcore", sf_dir)
    # peel filters must be semi joins (no fanout), 2 per round
    assert plan.count("LeftSemi") >= 6


def test_e2e_pipeline_no_nested_loop_and_anti_joins(spark, sf_dir):
    plan = _executed(spark, "pipeline_corpus_curation_e2e", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan  # decontamination + near-dup removal


def test_bbox_join_equi_only(spark, sf_dir):
    plan = _executed(spark, "spatial_bbox_intersect_join", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_intervals_merge_single_user_shuffle(spark, sf_dir):
    # windows + final aggregate all share the user_id partitioning:
    # at most 2 exchanges (scan->user_id shuffle, +AQE artifacts)
    plan = _executed(spark, "intervals_merge_overlaps", sf_dir)
    assert plan.count("Exchange") <= 3
    assert "Window" in plan


# --- round 4: exact spatial refine + COW merge plan guards ----------------


def test_polygon_intersect_equi_only_and_subset_of_bbox(spark, sf_dir):
    """The SAT refine must stay an equi grid join (no nested loop),
    and its result must be a SUBSET of the bbox-stage pairs (SAT can
    only reject candidates, never add)."""
    plan = _executed(spark, "spatial_polygon_intersect_join", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    exact = {
        (r["poly_id"], r["box_id"])
        for r in QUERIES["spatial_polygon_intersect_join"](spark, sf_dir).collect()
    }
    bbox = {
        (r["poly_id"], r["box_id"])
        for r in QUERIES["spatial_bbox_intersect_join"](spark, sf_dir).collect()
    }
    assert exact <= bbox


def test_polygon_sat_rejects_corner_only_overlap(spark):
    """Unit pin of the separating-axis semantics: a unit rectangle in
    the diamond bbox's corner overlaps the bbox but not the diamond
    (the diagonal axis separates); a rectangle crossing an edge
    midpoint intersects; touching exactly at a vertex counts (closed
    intervals)."""
    # diamond: center (0,0), r=4 -> vertices (4,0),(0,4),(-4,0),(0,-4)
    def sat(bx0, bx1, by0, by1, acx=0, acy=0, r=4):
        return (
            bx0 <= acx + r and acx - r <= bx1
            and by0 <= acy + r and acy - r <= by1
            and bx0 + by0 <= acx + acy + r and acx + acy - r <= bx1 + by1
            and bx0 - by1 <= acx - acy + r and acx - acy - r <= bx1 - by0
        )

    assert not sat(3, 4, 3, 4)      # bbox corner: x+y in [6,8] > 4 -> separated
    assert sat(3, 5, -1, 1)         # crosses the right vertex region
    assert sat(4, 6, 0, 2)          # touches vertex (4,0) exactly -> counts
    assert not sat(5, 6, 0, 2)      # fully right of the diamond
    assert sat(-1, 1, -1, 1)        # contained


def test_merge_cow_plan_no_per_row_output(spark, sf_dir):
    """The COW plan's output is per FILE (metadata-sized): row count
    == n_files + 1 (append line), and the rewrite set is exactly the
    files holding matched keys."""
    rows = QUERIES["merge_on_files_cow"](spark, sf_dir).collect()
    by_action = {}
    for r in rows:
        by_action.setdefault(r["action"], []).append(r)
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["n_rows_before"] for r in rows) == n_orders
    assert len(by_action["append"]) == 1
    # every rewrite row really holds a matched key; keep rows hold none
    for r in by_action.get("rewrite", []):
        assert r["n_matched"] > 0
    for r in by_action.get("keep", []):
        assert r["n_matched"] == 0


def test_containment_capped_join_and_exact_dup_crosscheck(spark, sf_dir):
    """dedup_containment: no nested loop (the fp self-join is an equi
    join over df-capped fingerprints), and every EXACT duplicate pair
    (same md5(text), from the exact-dedup operator's key) must appear
    with 100% containment (shared == n_contained) -- a cross-operator
    consistency pin."""
    from pyspark.sql import functions as F

    plan = _executed(spark, "dedup_containment", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    rows = QUERIES["dedup_containment"](spark, sf_dir).collect()
    got = {(r["contained_id"], r["container_id"]): r for r in rows}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dups = (
        docs.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") >= 2)
        .collect()
    )
    for r in dups:  # sf0.001 may plant none; sf0.01 does
        ids = sorted(r["ids"])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pair = got.get((ids[i], ids[j])) or got.get((ids[j], ids[i]))
                assert pair is not None, (ids[i], ids[j])
                assert pair["shared_fp"] == pair["n_contained_fp"]
    # unconditional invariants: containment is a partial overlap count
    # of the smaller side's fingerprints, directed small -> large
    for p in rows:
        assert p["contained_id"] != p["container_id"]
        assert 0 < p["shared_fp"] <= p["n_contained_fp"]
        assert p["shared_fp"] * 100 >= 80 * p["n_contained_fp"]


def test_convex_sat_hand_checked_shapes(spark):
    """convex_intersects on hand-built cases: near-miss where bboxes
    overlap but shapes don't, edge-touching (counts), vertex-touching
    (counts), full containment (no separating axis), and an angled
    triangle pair the axis-aligned tests can't distinguish."""
    from pyspark.sql import functions as F

    from etl_building_inspector_spark.operators.spatial import (
        convex_intersects,
    )

    def ring(*pts):
        return [list(p) for p in pts + (pts[0],)]

    dia = ring((4, 0), (0, 4), (-4, 0), (0, -4))          # diamond r=4
    corner_sq = ring((3, 3), (4, 3), (4, 4), (3, 4))      # bbox-corner miss
    touch_sq = ring((4, 0), (6, 0), (6, 2), (4, 2))       # vertex touch
    inner_sq = ring((-1, -1), (1, -1), (1, 1), (-1, 1))   # contained
    tri_hit = ring((2, 2), (-2, 3), (1, -1))              # crosses edge
    tri_miss = ring((5, 5), (9, 5), (5, 9))               # far
    big = ring((-10, -10), (10, -10), (10, 10), (-10, 10))  # contains dia

    cases = [
        (dia, corner_sq, False),
        (dia, touch_sq, True),
        (dia, inner_sq, True),
        (dia, tri_hit, True),
        (dia, tri_miss, False),
        (dia, big, True),
        (big, dia, True),  # containment is symmetric in SAT
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b, _) in enumerate(cases)],
        "i int, ra array<array<bigint>>, rb array<array<bigint>>",
    )
    got = {
        r["i"]: r["hit"]
        for r in df.select(
            "i", convex_intersects(F.col("ra"), F.col("rb")).alias("hit")
        ).collect()
    }
    for i, (_, _, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: want {want}"


def test_convex_sat_join_matches_specialized_diamond_rect(spark, sf_dir):
    """The general SAT operator, fed the SAME diamond/rect geometry as
    spatial_polygon_intersect_join, must produce the identical pair
    set -- the generalization is consistent with its special case."""
    from pyspark.sql import functions as F

    from etl_building_inspector_spark.operators.spatial import convex_sat_join
    from etl_building_inspector_spark.sources.tables import load_table

    sup = load_table(spark, sf_dir, "supplier")
    r = (F.lit(3) + F.col("s_suppkey") % 4).cast("long")
    cx = ((F.col("s_suppkey") % 40) * 10).cast("long")
    cy = (F.expr("s_suppkey DIV 40") * 10).cast("long")
    dia = sup.select(
        F.col("s_suppkey").cast("long").alias("a_id"),
        (F.col("s_nationkey") % 5).cast("long").alias("layer_id"),
        F.array(
            F.array(cx + r, cy), F.array(cx, cy + r),
            F.array(cx - r, cy), F.array(cx, cy - r), F.array(cx + r, cy),
        ).alias("ring"),
    )
    part = load_table(spark, sf_dir, "part")
    h = (F.lit(1) + F.col("p_partkey") % 3).cast("long")
    bx = ((F.col("p_partkey") % 40) * 10 + 2).cast("long")
    by = ((F.expr("p_partkey DIV 40") % 25) * 10 + 2).cast("long")
    rect = part.select(
        F.col("p_partkey").cast("long").alias("b_id"),
        (F.col("p_partkey") % 5).cast("long").alias("layer_id"),
        F.array(  # CCW rectangle ring
            F.array(bx - h, by - h), F.array(bx + h, by - h),
            F.array(bx + h, by + h), F.array(bx - h, by + h),
            F.array(bx - h, by - h),
        ).alias("ring"),
    )
    general = {
        (r["a_id"], r["b_id"])
        for r in convex_sat_join(dia, rect, cell=10).collect()
    }
    special = {
        (r["poly_id"], r["box_id"])
        for r in QUERIES["spatial_polygon_intersect_join"](spark, sf_dir).collect()
    }
    assert general == special and len(general) > 0
