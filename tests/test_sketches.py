"""Driver-side probabilistic sketches (count-min, Bloom) -- the
"novel sketch" surface: Spark-native, error bounds pinned."""

from __future__ import annotations

from etl_building_inspector_spark.sources.tables import load_table


def test_count_min_sketch(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sketch = li.stat.countMinSketch("l_returnflag", eps=0.01, confidence=0.95, seed=42)
    exact = {
        r.l_returnflag: r["count"]
        for r in li.groupBy("l_returnflag").count().collect()
    }
    n = sum(exact.values())
    for flag, true_count in exact.items():
        est = sketch.estimateCount(flag)
        assert true_count <= est <= true_count + 0.01 * n  # CMS overestimates


def test_bloom_filter(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    bf = orders.stat.bloomFilter("o_orderkey", expectedNumItems=10000, fpp=0.01)
    keys = [r.o_orderkey for r in orders.select("o_orderkey").limit(100).collect()]
    assert all(bf.mightContain(k) for k in keys)  # no false negatives
    misses = sum(bf.mightContain(-k - 1) for k in range(1, 2001))
    assert misses / 2000 < 0.05  # fpp holds with slack
