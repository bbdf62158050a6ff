"""Tracked persist() for self-join inputs.

Self-joins recompute the whole upstream plan per side unless the slim
projection is persisted (measured round 1: LSH buckets, jaccard
shingles). But a long-lived session running many queries (bench /
driver loops) leaks cached blocks if nothing unpersists them -- so
every operator-internal persist registers here and callers (bench.py,
tests, the CLI) call release_persisted() between queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    p = df.persist()
    _PERSISTED.append(p)
    return p


def release_persisted() -> int:
    """Unpersist every tracked intermediate; returns how many."""
    n = len(_PERSISTED)
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
    return n
