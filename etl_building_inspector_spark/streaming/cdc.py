"""Streaming CDC: SCD2 dimension maintenance from an update stream.

foreachBatch is the sink for stateful table maintenance Spark's
declarative sinks can't express: each micro-batch applies
operators/scd.scd2_apply (close current version, append new open
version) against the latest dimension SNAPSHOT and writes a NEW
versioned snapshot directory — never in-place. Versioned snapshots
give idempotent re-delivery (an epoch retried overwrites ITS OWN
version dir, the foreachBatch exactly-once recipe) plus time travel
for free; a `_LATEST` pointer file is the one atomically-renamed
commit point. This is the parquet-only reduction of what a table
format (Delta/Iceberg) does with a transaction log — same shape the
reference's dataset-dir artifacts use (SURVEY §2.1 S9).

At scale the per-batch cost is one broadcast semi/anti join of the
dim against the (small) update batch — the dim never shuffles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scd import scd2_apply


def _read_pointer(dim_dir: str) -> tuple[int, int]:
    """(snapshot version, last committed epoch); (-1, -1) if none."""
    ptr = os.path.join(dim_dir, "_LATEST")
    if not os.path.exists(ptr):
        return -1, -1
    with open(ptr) as f:
        parts = f.read().split()
    return int(parts[0]), int(parts[1])


def latest_version(dim_dir: str) -> int:
    return _read_pointer(dim_dir)[0]


def read_dim(spark: SparkSession, dim_dir: str) -> DataFrame:
    v = latest_version(dim_dir)
    if v < 0:
        raise ValueError(f"no committed snapshot under {dim_dir}")
    return spark.read.parquet(os.path.join(dim_dir, f"v{v}"))


def init_dim(initial: DataFrame, dim_dir: str) -> None:
    """Write snapshot v0 (all rows open) and commit the pointer."""
    opened = (
        initial.withColumn("valid_from", F.lit(None).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    opened.write.mode("overwrite").parquet(os.path.join(dim_dir, "v0"))
    _commit_pointer(dim_dir, 0, -1)


def scd2_foreach_batch(dim_dir: str, key: str, ts_col: str = "__effective"):
    """Returns the foreachBatch(df, epoch_id) function. Update batches
    carry (key, attrs..., ts_col); ts_col becomes the close/open
    timestamp. Empty batches commit nothing."""

    def apply_batch(updates: DataFrame, epoch_id: int) -> None:
        if updates.isEmpty():
            return
        v_cur, last_epoch = _read_pointer(dim_dir)
        if epoch_id <= last_epoch:
            return  # epoch already committed: re-delivery is a no-op
        spark = updates.sparkSession
        current = read_dim(spark, dim_dir)
        effective = updates.agg(F.max(ts_col)).collect()[0][0]
        upd = updates.drop(ts_col).dropDuplicates([key])
        merged = scd2_apply(current, upd, key, F.lit(effective))
        v_next = v_cur + 1
        # write the new snapshot FULLY, then commit the pointer — a
        # crash between the two leaves the old snapshot live and the
        # epoch uncommitted, so the retry redoes the whole batch
        # against unchanged state (exactly-once via epoch gating)
        merged.write.mode("overwrite").parquet(
            os.path.join(dim_dir, f"v{v_next}")
        )
        _commit_pointer(dim_dir, v_next, epoch_id)

    return apply_batch


def pointintime_enrich_foreach_batch(
    dim_dir: str, key: str, ts_col: str, out_dir: str
):
    """Stream enrichment against a SLOWLY CHANGING dimension with
    point-in-time correctness (the feature-store as-of join).

    Structured Streaming's stream-static join plans the static side
    ONCE at query start — a dim updated mid-stream is silently stale.
    This foreachBatch re-resolves the `_LATEST` SCD2 snapshot every
    micro-batch, then joins each event to the dim VERSION VALID AT THE
    EVENT'S OWN TIMESTAMP (key equality + valid_from <= ts < valid_to
    over the full version history), not the version current at
    processing time. That asymmetry is what prevents label leakage in
    training pipelines: a late-arriving event enriches with the
    attributes the entity had when the event happened, even if the dim
    has changed since.

    Scale: the dim (with history) broadcasts; the range predicate is a
    post-filter on the key-equi broadcast hash join, so per batch the
    cost is one narrow pass over the batch. Output partitions by
    epoch and overwrites its own epoch dir — idempotent re-delivery,
    same recipe as the SCD2 writer.
    """

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        dim = read_dim(spark, dim_dir)
        attrs = [
            c
            for c in dim.columns
            if c not in (key, "valid_from", "valid_to", "is_current")
        ]
        b, d = batch.alias("b"), dim.alias("d")
        cond = (
            (F.col(f"b.{ts_col}") >= F.coalesce(
                F.col("d.valid_from"), F.lit("1970-01-01").cast("timestamp")
            ))
            & (
                F.col("d.valid_to").isNull()
                | (F.col(f"b.{ts_col}") < F.col("d.valid_to"))
            )
        )
        enriched = b.join(
            F.broadcast(d), (F.col(f"b.{key}") == F.col(f"d.{key}")) & cond, "left"
        ).select("b.*", *[F.col(f"d.{c}").alias(c) for c in attrs])
        enriched.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )

    return apply_batch


def _commit_pointer(dim_dir: str, version: int, epoch: int) -> None:
    ptr = os.path.join(dim_dir, "_LATEST")
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"{version} {epoch}")
    os.replace(tmp, ptr)  # atomic on POSIX
