"""Skew-mitigation operators: the salted rewrites must be result-
invisible (equal to the plain plan) while actually spreading keys
across salt values."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_building_inspector_spark.operators.skew import (
    _derived_salt,
    salted_join,
    salted_twophase_agg,
)


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold") for i in range(200)],
        "row_id long, k string",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("absent", 3)], "k string, v long"
    )
    salted = salted_join(big, small, "k", "row_id", n_salts=4)
    plain = big.join(small, "k")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    assert "_salt" not in salted.columns


def test_salted_agg_equals_plain_agg(spark):
    df = spark.createDataFrame(
        [(i, "t%d" % (i % 3), i * 10) for i in range(300)],
        "row_id long, k string, x long",
    )
    salted = salted_twophase_agg(
        df,
        "k",
        "row_id",
        {
            "n": (F.count("*"), "sum"),
            "sx": (F.sum("x"), "sum"),
            "mn": (F.min("x"), "min"),
            "mx": (F.max("x"), "max"),
        },
        n_salts=8,
    )
    plain = df.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_derived_salt_spreads_and_is_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "row_id long")
    salts = df.select(
        _derived_salt(F.col("row_id"), 8).alias("s")
    )
    hist = {r.s: r.n for r in salts.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(hist) == set(range(8))  # every salt value used
    assert max(hist.values()) < 1000 * 0.25  # no degenerate pile-up
    # deterministic: same inputs -> same salts on recompute
    again = {r.s: r.n for r in salts.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert hist == again


def test_auto_salt_factor_sizes_from_histogram(spark, sf_dir):
    """S is derived from the hottest key's row count: a skewed frame
    (one key holding half the rows) gets S > 1 at a small target; a
    uniform frame gets S == 1; results equal the plain join either
    way."""
    from pyspark.sql import functions as F

    from etl_building_inspector_spark.operators.skew import (
        auto_salt_factor,
        salted_join_auto,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    # manufacture skew: fold most keys onto one hot key
    skewed = li.withColumn(
        "k",
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(0)).otherwise(
            F.col("l_orderkey")
        ),
    )
    n_hot = skewed.where(F.col("k") == 0).count()
    target = max(1, n_hot // 4)
    s = auto_salt_factor(skewed, "k", target_rows_per_task=target)
    assert 4 <= s <= 5  # ceil(n_hot / (n_hot//4))

    uniform = li.withColumn("k", F.col("l_orderkey"))
    assert auto_salt_factor(uniform, "k", target_rows_per_task=10**9) == 1

    dim = skewed.select("k").distinct().withColumn("tag", F.concat(F.lit("d"), F.col("k")))
    got = salted_join_auto(
        skewed, dim, "k", salt_from="l_linenumber", target_rows_per_task=target
    )
    want = skewed.join(dim, "k")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
