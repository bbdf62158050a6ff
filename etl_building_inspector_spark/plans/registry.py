"""Unified query registry: merges the core (reference-parity +
agg/window) and LLM-pipeline query sets for the driver contract
(__spark_entry__.queries / oracle_sql)."""

from __future__ import annotations

from . import (
    queries_core,
    queries_domain,
    queries_llm,
    queries_spatial,
    queries_surface,
    queries_surface2,
    queries_surface3,
)

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

for mod in (
    queries_core,
    queries_domain,
    queries_llm,
    queries_spatial,
    queries_surface,
    queries_surface2,
    queries_surface3,
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
