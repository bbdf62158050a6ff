from __future__ import annotations

import fnmatch
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from etl_building_inspector_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Driver-budget test tiers (VERDICT r10 #1).
#
# The full suite outgrew the driver's pytest window (r10: 1069 tests,
# ~35 min on this host; VERIFY_r10 recorded tests_ok=false with zero
# failures -- the run was cut mid-suite at ~94%). The rotated-out
# registry queries' only driver-visible oracle attestation is this
# suite, so it MUST complete under driver conditions.
#
# Split: the DEFAULT `pytest tests/` run keeps the load-bearing gates
# -- tests/test_queries_oracle.py (oracle conformance for ALL
# registered queries at sf0.001), the per-query plan pins in
# tests/test_plans.py, and every fast unit/golden test -- and finishes
# in ~14 min (measured 2026-08-18, durations in /tmp and
# OPTIMIZATION_r11.md). The HEAVY tier (EBI_HEAVY_TESTS=1) adds back:
#
#   * the independent pandas-recompute property layer
#     (tests/test_r*_properties.py, ~480 s): second-opinion recomputes
#     of every query, redundant with the oracle layer for gate
#     purposes (a shared-conceptual-error detector, run per round by
#     the builder, not per verify by the driver);
#   * two whole-registry sweeps (~450 s): the 364-query scalar-output
#     contract sweep and the registry-wide plan lint -- each iterates
#     every registered query end-to-end;
#   * individually slow (>10 s) operator soak tests (~320 s):
#     streaming lifecycle drains, LSH-vs-triangle cross-checks,
#     multi-round kmeans -- real soaks, not gates.
#
# Builders: run `EBI_HEAVY_TESTS=1 python -m pytest tests/ -q` at
# least once per round before committing substantive operator changes.
_HEAVY_PATTERNS = [
    "test_r*_properties.py::*",
    "test_contract_guard.py::test_every_registered_query_has_scalar_output",
    "test_plans.py::test_whole_registry_plan_lint",
    "test_streaming.py::test_stream_stream_left_outer_emits_nulls_after_watermark",
    "test_streaming.py::test_expiring_sessions_timeout_lifecycle",
    "test_streaming.py::test_streaming_foreachbatch_merge_lifecycle",
    "test_streaming.py::test_watermark_drops_late_data",
    "test_streaming.py::test_streaming_dedup_within_watermark",
    "test_streaming.py::test_pointintime_enrich_slowly_changing_dim",
    "test_streaming.py::test_scd2_streaming_cdc",
    "test_similarity.py::test_neardup_lsh_vs_triangle_oracle",
    "test_similarity.py::test_ivf_index_persist_probe_matches_inline",
    "test_similarity.py::test_kmeans_fit_inertia_non_increasing",
    "test_similarity.py::test_arrow_buckets_bit_identical_to_hof",
    "test_similarity.py::test_lsh_recall_reasonable",
    "test_similarity.py::test_ivf_pq_consistent_with_pq_adc",
    "test_dedup_caps.py::test_simhash_hamming_cap_and_exact_recall",
    "test_functions.py::test_keep_first_properties",
    "test_analytics.py::test_sssp_prefers_cheaper_two_hop_path",
    "test_storage_layout.py::test_compact_small_files_roundtrip",
]


def pytest_collection_modifyitems(config, items):
    if os.environ.get("EBI_HEAVY_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="heavy tier -- run with EBI_HEAVY_TESTS=1 (driver-budget "
        "split, VERDICT r10 #1; see tests/conftest.py)"
    )
    for item in items:
        nid = item.nodeid
        if nid.startswith("tests/"):
            nid = nid[len("tests/"):]
        base = nid.split("[", 1)[0]
        if any(
            fnmatch.fnmatch(nid, p) or fnmatch.fnmatch(base, p)
            for p in _HEAVY_PATTERNS
        ):
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
