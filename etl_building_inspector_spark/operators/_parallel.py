"""Scan fan-out for expensive narrow passes.

The fixture tables are single-file, single-row-group parquet, so every
scan is ONE input split regardless of spark.sql.files.maxPartitionBytes
(a parquet split below row-group granularity reads zero rows). Any
operator that does expensive per-row work BEFORE its first shuffle --
regex normalization, shingle explode, one sha256/md5 per shingle,
interpreted higher-order-function folds -- therefore ran on 1-2 cores
of a 32-core box (measured: dedup_cluster_assign's pair build 7.1 s of
task time on n=2 tasks; quality_ngram_lm_score 4.6 s on n=1).

Fix per the optimization guide section 2.5 ("input skew: one huge
unsplittable file ... repartition immediately after the read"):
round-robin repartition the narrow input to the session's default
parallelism BEFORE the heavy pass. Scale-adaptive, not local-tuned:

  * target = sparkContext.defaultParallelism (cores locally, total
    executor slots on a cluster), not a constant;
  * NO-OP when the input already has >= target partitions -- at real
    scale the corpus arrives as thousands of splits and this helper
    must never REDUCE that parallelism.

The shuffle this inserts moves only the slim (id, text) projection --
megabytes here; at 100 TB the no-op branch applies -- and buys a
full-width stage for the dominant CPU cost. Round-robin repartition is
deterministic under retry (sortBeforeRepartition, SPARK-23207), and
every downstream consumer is order-insensitive (aggregates, equi-joins,
windows with total orderings), so results are bit-identical -- verified
against the DuckDB oracles for every affected query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_scan(df: DataFrame) -> DataFrame:
    """Repartition `df` to defaultParallelism iff it currently has
    fewer partitions (see module docstring). Call it on a slim
    projection (id + the columns the heavy pass needs), right before
    the expensive narrow work."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        # plan not convertible cheaply (streaming source pre-batch):
        # leave the input alone rather than fail the build
        return df
    if current >= target:
        return df
    return df.repartition(target)
