"""Approximate-nearest-neighbor similarity search over embedding
columns (array<float>).

Baseline: brute-force cosine top-k -- exact, a broadcast nested-loop
join where only the query side is broadcast. The corpus is never
shuffled and never collected, so it scales to arbitrarily large corpora
(cost is one full scan per query batch).

Scale path: LSH bucketing via random hyperplanes (SimHash for vectors)
-- corpus hashed once, queries probe only their bucket (+ optional
multi-probe neighbors). Hyperplanes are derived deterministically from
md5 so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """JVM-native dot product over array columns (no Python): zip_with
    multiply + aggregate sum, fused by codegen. Cast to double FIRST so
    Spark and the float32-reading oracle accumulate identically."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    # unrounded: identical sequential folds yield bit-identical doubles
    # in Spark and the DuckDB list_reduce oracle; round() is not
    # engine-portable at half-boundaries.
    return df.withColumn(out, _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b))))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Plan: broadcast(queries) cross-join corpus -> cosine (codegen'd
    column math) -> per-query top-k via row_number window partitioned
    by query id. The window shuffles only (n_queries x n_corpus) slim
    rows of (qid, cid, sim); at scale replace with a per-partition
    top-k pre-reduce (mapInPandas heap) before the window if the
    candidate set explodes.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    joined = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    ).crossJoin(F.broadcast(q))
    sim = joined.select(
        "query_id",
        "neighbor_id",
        (
            _dot(F.col("__qvec"), F.col("__cvec"))
            / (_norm(F.col("__qvec")) * _norm(F.col("__cvec")))
        ).alias("cosine"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes
    (reproducible across engines/runs; no RNG state)."""
    vals: list[float] = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        for off in range(0, 16, 4):
            if len(vals) >= dim:
                break
            n = int.from_bytes(h[off : off + 4], "big", signed=True)
            vals.append(n / 2**31)
        i += 1
    return vals


def lsh_bucket(df: DataFrame, vec_col: str, n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) as `bucket`.
    Hyperplane constants are literals folded into the plan -- zero
    runtime cost beyond the dot products; no shuffle."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        bit = F.when(_dot(F.col(vec_col), plane) > 0, F.lit(2**p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return df.withColumn("bucket", bucket)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: equi-join on LSH bucket, exact cosine within bucket.

    vs brute force: the cross join becomes a hash join on `bucket`, so
    candidate count drops ~2^n_planes-fold. Recall < 1 by construction
    (neighbors across a hyperplane are missed) -- standard multi-probe
    extension would add adjacent buckets. This is the 100 TB path: the
    corpus-side hash is computed once (persist/write it), queries touch
    one bucket each.
    """
    c = lsh_bucket(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")),
        "__cvec",
        n_planes,
        dim,
    )
    q = lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")),
        "__qvec",
        n_planes,
        dim,
    )
    joined = c.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    sim = joined.select(
        "query_id",
        "neighbor_id",
        (
            _dot(F.col("__qvec"), F.col("__cvec"))
            / (_norm(F.col("__qvec")) * _norm(F.col("__cvec")))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
