"""CDC / slowly-changing-dimension operators.

No Delta/Iceberg in this environment, so MERGE INTO semantics are
emulated with the classic anti-join + union shape (one shuffle on the
key, or zero when the updates side broadcasts). At 100 TB the same
logical shape runs against a table format's MERGE for file-level
skipping; the semantics below are the contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """UPSERT: rows of `target` whose key has no update, plus all
    update rows (updates win). Schemas must match."""
    kept = target.join(
        F.broadcast(updates.select(key)), key, "left_anti"
    )
    return kept.unionByName(updates)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    effective: Column,
) -> DataFrame:
    """SCD type 2: close the current version of every updated key
    (valid_to = effective, is_current = false) and append the update as
    the new open version.

    `current` carries (key, attrs..., valid_from, valid_to, is_current);
    `updates` carries (key, attrs...). History rows pass through
    untouched.
    """
    upd_keys = updates.select(key)
    # rows whose key is updated AND are currently open -> close them
    closed = (
        current.join(F.broadcast(upd_keys), key, "left_semi")
        .filter(F.col("is_current"))
        .withColumn("valid_to", effective)
        .withColumn("is_current", F.lit(False))
    )
    # untouched: historical rows of updated keys + all rows of other keys
    untouched = current.join(
        F.broadcast(upd_keys), key, "left_anti"
    ).unionByName(
        current.join(F.broadcast(upd_keys), key, "left_semi").filter(
            ~F.col("is_current")
        )
    )
    opened = updates.withColumn("valid_from", effective).withColumn(
        "valid_to", F.lit(None).cast("timestamp")
    ).withColumn("is_current", F.lit(True))
    return untouched.unionByName(closed).unionByName(opened)
