"""Driver-contract schema guard.

The driver canonicalizes each registered query's result by sorting raw
pandas columns and hashing cell values; a cell holding a Python list
(ArrayType), dict (MapType), or Row (StructType) is unhashable and
crashes the comparator (`TypeError: unhashable type: 'list'`,
CORRECTNESS_r05 `emb_pq_encode`). The local oracle gate used to paper
over this by canonicalizing lists to tuples, so the class of failure
was invisible locally while fatal at the driver.

This module is the single choke point that keeps it impossible:
`assert_scalar_output_schema` FAILS any result schema containing a
nested type, and is called by tools/oracle_check.py,
tools/verify_driver_contract.py, and tests/test_contract_guard.py's
whole-registry scan (schema analysis only -- no job runs).

Queries that naturally produce nested values must explode/flatten to
scalar rows before registration (see emb_pq_encode's reshape).
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType, StructType

NESTED_TYPES = (ArrayType, MapType, StructType)


def nested_output_fields(schema: StructType) -> list[str]:
    """Names of top-level result columns with driver-unhashable types."""
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, NESTED_TYPES)
    ]


def assert_scalar_output_schema(schema: StructType, name: str) -> None:
    """Raise TypeError if any result column is Array/Map/Struct-typed.

    The driver's comparator cannot hash such cells; a query that would
    pass every value check still lands as a red `err` row. Fail loudly
    at registration/gate time instead.
    """
    bad = nested_output_fields(schema)
    if bad:
        raise TypeError(
            f"{name}: driver-uncanonicalizable output schema -- "
            f"column(s) {bad} are Array/Map/Struct-typed. The driver "
            "hashes scalar cells only; explode or flatten to scalar "
            "rows before registering (see emb_pq_encode)."
        )
