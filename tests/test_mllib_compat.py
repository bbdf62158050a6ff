"""Ecosystem compatibility: pyspark.ml estimators run directly over
the engine's tables (a user mixing this engine with MLlib pipelines
needs the DataFrames to interoperate -- vector conversion, fit,
transform). Our own operators stay the scale path (documented in
SCALING.md); these prove the standard library path works too."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_building_inspector_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def vec_df(spark, sf_dir):
    ml = pytest.importorskip("pyspark.ml")
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "features"
        ),
    )


def test_mllib_kmeans_fits_on_embeddings(vec_df):
    from pyspark.ml.clustering import KMeans

    model = KMeans(k=4, seed=7, maxIter=5).fit(vec_df)
    assert len(model.clusterCenters()) == 4
    out = model.transform(vec_df)
    counts = {r.prediction for r in out.select("prediction").distinct().collect()}
    assert counts <= {0, 1, 2, 3} and len(counts) >= 2


def test_mllib_minhash_lsh_self_join_finds_planted_dup(spark, sf_dir, vec_df):
    """MinHashLSH over binarized embeddings: a planted exact duplicate
    must appear in the approxSimilarityJoin candidates (hash-family
    differs from operators/dedup.py's sha256-chunk scheme, so this is
    an API-surface check, not a value oracle)."""
    from pyspark.ml.feature import Binarizer, MinHashLSH
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("arr"),
    )
    dup = base.where(F.col("vec_id") == 0).select(
        F.lit(999999).alias("vec_id"), "arr"
    )
    both = base.unionByName(dup).select(
        "vec_id", array_to_vector("arr").alias("dense")
    )
    binz = Binarizer(threshold=0.0, inputCol="dense", outputCol="bin")
    binned = binz.transform(both)
    # MinHashLSH requires at least one non-zero entry; random embeddings
    # always have positive coords above 0.0 threshold
    mh = MinHashLSH(inputCol="bin", outputCol="hashes", numHashTables=4, seed=3)
    model = mh.fit(binned)
    pairs = model.approxSimilarityJoin(binned, binned, 0.1).select(
        F.col("datasetA.vec_id").alias("a"), F.col("datasetB.vec_id").alias("b")
    )
    hits = pairs.where((F.col("a") == 0) & (F.col("b") == 999999)).count()
    assert hits == 1


def test_vector_array_roundtrip(vec_df):
    from pyspark.ml.functions import vector_to_array

    back = vec_df.select(
        "vec_id", vector_to_array("features").alias("arr")
    )
    row = back.orderBy("vec_id").first()
    assert len(row.arr) == 64
