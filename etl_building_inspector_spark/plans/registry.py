"""Unified query registry: merges the core (reference-parity +
agg/window) and LLM-pipeline query sets for the driver contract
(__spark_entry__.queries / oracle_sql).

Every registered callable is wrapped to release operator-internal
persisted blocks (operators/_cache.py) BEFORE building its plan: the
driver runs all ~70 queries in one long-lived session and never calls
release_persisted() itself, so without this hook the self-join caches
(LSH buckets, jaccard shingles, CC edge lists) accumulate until a
default-sized heap OOMs. Releasing at next-query entry is safe because
the driver materializes each result before invoking the next query.
"""

from __future__ import annotations

from ..operators._cache import release_persisted
from . import (
    queries_core,
    queries_domain,
    queries_llm,
    queries_llm2,
    queries_llm3,
    queries_llm4,
    queries_spatial,
    queries_surface,
    queries_surface2,
    queries_surface3,
    queries_surface4,
    queries_surface5,
    queries_surface6,
)

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _released(fn):
    def wrapped(spark, sf_dir):
        release_persisted()
        return fn(spark, sf_dir)

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    wrapped.__wrapped__ = fn
    return wrapped


for mod in (
    queries_core,
    queries_domain,
    queries_llm,
    queries_llm2,
    queries_llm3,
    queries_llm4,
    queries_spatial,
    queries_surface,
    queries_surface2,
    queries_surface3,
    queries_surface4,
    queries_surface5,
    queries_surface6,
):
    QUERIES.update({k: _released(v) for k, v in mod.QUERIES.items()})
    ORACLES.update(mod.ORACLES)
