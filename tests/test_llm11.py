"""Property tests for the governance / prefix-filter batch
(queries_llm11): invariants the shared-steps DuckDB oracles cannot
check — prefix-filter completeness vs brute force, the Bloom
no-false-negative guarantee, and the contribution-cap bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_building_inspector_spark.operators.dedup import (
    jaccard_prefix_filter_pairs,
    ngram_jaccard_pairs,
)
from etl_building_inspector_spark.plans.queries_llm import _docs_with_dups
from etl_building_inspector_spark.plans.queries_llm11 import (
    BLOOM_K,
    CONTRIB_CAP,
    PREFIX_T_PCT,
)

SF = "/root/testdata/sf0.001"


def test_prefix_filter_complete_vs_bruteforce(spark):
    """The AllPairs prefix filter must return EXACTLY the pairs the
    uncapped brute-force threshold join returns: completeness is the
    theorem (any J >= t pair shares a prefix shingle), precision is
    the verify stage. ngram_jaccard_pairs with no df cap IS the
    brute-force all-shared-shingle join."""
    docs = _docs_with_dups(spark, SF)
    got = {
        (r.id_a, r.id_b)
        for r in jaccard_prefix_filter_pairs(
            docs, "text", "doc_id", shingle_n=3, threshold_pct=PREFIX_T_PCT
        ).collect()
    }
    brute = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", shingle_n=3, threshold=PREFIX_T_PCT / 100
        ).collect()
    }
    assert got == brute
    assert len(got) > 0  # the planted dups must surface


def test_prefix_filter_jaccard_values_exact(spark):
    """inter/union must be the exact set sizes, not candidates'."""
    docs = _docs_with_dups(spark, SF)
    rows = jaccard_prefix_filter_pairs(
        docs, "text", "doc_id", shingle_n=3, threshold_pct=PREFIX_T_PCT
    ).collect()
    for r in rows:
        assert r.inter_sh <= r.union_sh
        assert 100 * r.inter_sh >= PREFIX_T_PCT * r.union_sh
        assert abs(r.jaccard - r.inter_sh / r.union_sh) < 1e-12


def test_bloom_members_never_false_negative(spark):
    """Every MEMBER fingerprint probed against the built bit set must
    hit all K positions — the Bloom guarantee the FPR eval relies on
    (probes measure only the false-POSITIVE side)."""
    from etl_building_inspector_spark.functions.text import fingerprint
    from etl_building_inspector_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    fps = docs.select("doc_id", fingerprint("text").alias("fp"))
    members = fps.filter(F.col("doc_id") % 2 == 0).select("fp").distinct()

    def positions(df):
        h = df.withColumn("h", F.md5("fp"))
        from etl_building_inspector_spark.plans.queries_llm11 import BLOOM_BITS

        pos = F.explode(
            F.array(
                *[
                    F.conv(F.substring("h", 1 + 8 * j, 8), 16, 10).cast("long")
                    % BLOOM_BITS
                    for j in range(BLOOM_K)
                ]
            )
        )
        return h.select("fp", pos.alias("pos"))

    bits = positions(members).select("pos").distinct()
    hits = (
        positions(members)
        .join(bits, "pos")
        .groupBy("fp")
        .agg(F.count("*").alias("n_hit"))
    )
    assert hits.filter(F.col("n_hit") < BLOOM_K).count() == 0


def test_contribution_cap_bounds(spark):
    """After capping, no customer contributes more than CONTRIB_CAP
    orders, and every month's capped revenue <= total revenue."""
    from etl_building_inspector_spark.plans.queries_llm11 import (
        privacy_contribution_cap,
    )
    from etl_building_inspector_spark.sources.tables import load_table
    from pyspark.sql import Window

    out = privacy_contribution_cap(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_orders_capped <= r.n_orders_total
        assert r.rev_capped_cents <= r.rev_total_cents

    orders = load_table(spark, SF, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    per_user = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= CONTRIB_CAP)
        .groupBy("o_custkey")
        .count()
    )
    assert per_user.filter(F.col("count") > CONTRIB_CAP).count() == 0
