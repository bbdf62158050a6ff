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
