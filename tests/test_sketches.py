"""Approximate/statistical sketch surface exposed by the Python API
(approxQuantile = Greenwald-Khanna, freqItems = misra-gries-style,
stratified sampleBy, correlation). Error bounds pinned vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_building_inspector_spark.sources.tables import load_table


def test_approx_quantile_bounds(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    (q25, q50, q75) = li.stat.approxQuantile(
        "l_extendedprice", [0.25, 0.5, 0.75], relativeError=0.01
    )
    assert q25 <= q50 <= q75
    exact = li.selectExpr(
        "percentile(l_extendedprice, 0.24) p_lo",
        "percentile(l_extendedprice, 0.26) p_hi",
    ).collect()[0]
    assert exact.p_lo <= q25 <= exact.p_hi


def test_freq_items_finds_heavy_hitters(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    found = set(
        li.stat.freqItems(["l_returnflag"], support=0.2).collect()[0][0]
    )
    heavy = {
        r.l_returnflag
        for r in li.groupBy("l_returnflag").count().collect()
        if r["count"] / li.count() >= 0.2
    }
    assert heavy <= found  # no heavy hitter missed (may over-report)


def test_stratified_sample(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    sample = orders.stat.sampleBy(
        "o_orderstatus", fractions={"O": 0.1, "F": 0.5}, seed=42
    )
    got = {
        r.o_orderstatus: r["count"]
        for r in sample.groupBy("o_orderstatus").count().collect()
    }
    full = {
        r.o_orderstatus: r["count"]
        for r in orders.groupBy("o_orderstatus").count().collect()
    }
    assert "P" not in got  # unlisted stratum excluded
    assert 0.02 < got["O"] / full["O"] < 0.3
    assert 0.3 < got["F"] / full["F"] < 0.7


def test_correlation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "derived", F.col("l_quantity") * 3 + 7
    )
    # exact linear dependence -> 1; independent synthetic columns -> ~0
    assert li.stat.corr("l_quantity", "derived") > 0.999
    assert abs(li.stat.corr("l_extendedprice", "l_quantity")) < 0.1


def test_hll_sketch_partials_merge(spark):
    """DataSketches HLL surface (Spark 3.5+): per-shard sketches
    merged with hll_union_agg estimate the same cardinality as one
    whole-table sketch -- the mergeable-state pattern that replaces
    exact count_distinct at 100 TB (exact distinct shuffles every key;
    sketches ship a few KB per shard). Merge is NOT bit-identical to
    the whole-table sketch (sparse->dense promotion differs), so the
    assertion is tolerance-based, against the true cardinality."""
    from pyspark.sql import functions as F

    df = spark.range(0, 10000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") % 37).alias("g")
    )
    whole = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("k")).alias("est")
    ).collect()[0]["est"]
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("k").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert abs(whole - 500) <= 10
    assert abs(merged - 500) <= 10


def test_ahash_band_blocking_lossless_at_threshold():
    """Pigeonhole property the banded aHash join relies on: ANY pair
    of 64-bit hashes at hamming distance <= 3 shares at least one of
    the four 16-bit bands. Pure-python over randomized flips."""
    import random

    rnd = random.Random(42)
    for _ in range(500):
        lo = rnd.getrandbits(32)
        hi = rnd.getrandbits(32)
        flips = rnd.sample(range(64), rnd.randint(0, 3))
        lo2, hi2 = lo, hi
        for f in flips:
            if f < 32:
                lo2 ^= 1 << f
            else:
                hi2 ^= 1 << (f - 32)
        bands_a = [lo & 0xFFFF, (lo >> 16) & 0xFFFF, hi & 0xFFFF, (hi >> 16) & 0xFFFF]
        bands_b = [lo2 & 0xFFFF, (lo2 >> 16) & 0xFFFF, hi2 & 0xFFFF, (hi2 >> 16) & 0xFFFF]
        assert any(a == b for a, b in zip(bands_a, bands_b))


def test_hll_register_table_is_max_mergeable(spark):
    """The sketch property everything downstream relies on: building
    HLL registers over a UNION equals max-merging the two halves'
    register tables -- so shards/days/streams merge for free."""
    from pyspark.sql import functions as F

    from etl_building_inspector_spark.plans.queries_llm9 import _hll_exprs

    reg, v, rho = _hll_exprs("spark")
    ids = spark.range(2000).select(
        F.md5(F.col("id").cast("string")).alias("h"),
        (F.col("id") % 2).alias("half"),
    )
    rr = ids.select("half", F.expr(reg).alias("reg"), F.expr(v).alias("v"))
    whole = {
        (r.reg): r.m
        for r in rr.groupBy("reg").agg(F.max(F.expr(rho)).alias("m")).collect()
    }
    halves = (
        rr.groupBy("half", "reg").agg(F.max(F.expr(rho)).alias("m")).collect()
    )
    merged = {}
    for r in halves:
        merged[r.reg] = max(merged.get(r.reg, 0), r.m)
    assert merged == whole
