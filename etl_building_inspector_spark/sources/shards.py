"""Training-corpus shard export: the sink side of the data pipeline.

Training jobs consume a corpus as deterministic, bounded-size shards
(webdataset/tfrecord-style), usually keyed by a stratum (language,
source) so mixes can be loaded selectively. The writer here produces
hive-partitioned parquet `stratum=.../shard=NN/part-*.parquet` with:

- DETERMINISTIC shard membership: shard = u32(md5(salt:id)) % n_shards
  — a function of the row, not of partitioning/run order, so re-runs
  and incremental rebuilds place every doc in the same shard.
- one file per (stratum, shard) by construction: the frame is
  hash-repartitioned on exactly the partition keys before the write,
  so each directory receives its rows from a single task —
  `maxRecordsPerFile` stays as the guard for oversized shards.
- pushdown-friendly layout: readers prune whole directories by
  stratum/shard (partition pruning), and parquet prunes columns within.

At 100 TB: n_shards scales the write parallelism and the downstream
loader's unit of work; the repartition is the one shuffle, done on the
final slim output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_SALT = "shard"


def shard_of(id_col: str, n_shards: int, salt: str = SHARD_SALT):
    """Deterministic shard id: u32 of the first 8 md5 hex chars of
    salt:id, mod n_shards (the same md5-derived-u32 discipline as
    stratified_sample — portable and auditable)."""
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (u32 % n_shards).cast("int")


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    stratum_col: str | None = "lang",
    n_shards: int = 8,
    max_records_per_file: int = 1_000_000,
) -> None:
    sharded = df.withColumn("shard", shard_of(id_col, n_shards))
    parts = ([stratum_col] if stratum_col else []) + ["shard"]
    (
        sharded.repartition(*[F.col(c) for c in parts])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*parts)
        .parquet(out_dir)
    )


def read_training_shards(
    spark: SparkSession, out_dir: str, **filters
) -> DataFrame:
    """Read back with partition pruning: pass stratum/shard filters as
    keyword equalities (e.g. lang='en', shard=3) — they prune whole
    directories before any file is opened."""
    df = spark.read.parquet(out_dir)
    for k, v in filters.items():
        df = df.filter(F.col(k) == v)
    return df
