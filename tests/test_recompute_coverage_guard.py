"""Registry-wide recompute-coverage guard (the contract-guard pattern
applied to the property-test layer).

As of round 7 every registered query is named in an independent
pandas/python recompute test (tests/test_r6_properties.py,
tests/test_r7_properties.py, tests/test_r7_*_properties.py). This
guard makes that invariant STRUCTURAL: registering a new query
without adding it to a property-test file fails the suite, so the
driver-oracle twin can never again be a query's only value check.

The check is name-based (the same grep the coverage audit runs):
coarse, but cheap, dependency-free, and impossible to satisfy by
accident -- a query name is a long snake_case token that does not
appear in test prose unless someone wrote a test around it.
"""

from __future__ import annotations

import glob
import os
import re

TESTS_DIR = os.path.dirname(__file__)


def test_every_registered_query_has_a_property_test():
    from etl_building_inspector_spark.plans.registry import QUERIES

    corpus = ""
    files = sorted(
        set(
            glob.glob(os.path.join(TESTS_DIR, "test_r*_properties.py"))
        )
    )
    assert len(files) >= 18, f"property-test files missing: found {files}"
    for f in files:
        with open(f, encoding="utf-8") as fh:
            corpus += fh.read()
    # Whole-token match, not substring (ADVICE r7): several query
    # names are prefixes of longer ones (dedup_simhash vs
    # dedup_simhash_hamming_pairs), so substring matching would let a
    # test naming only the longer query silently "cover" the shorter.
    tokens = set(re.findall(r"[A-Za-z0-9_]+", corpus))
    missing = [name for name in QUERIES if name not in tokens]
    assert not missing, (
        "registered queries without an independent recompute test "
        f"({len(missing)}): {missing[:10]}... -- add a pandas/python "
        "property test to a tests/test_r*_properties.py file before "
        "registering"
    )
