"""Driver-shape contract guard (VERDICT r5 #2).

The driver's canonicalizer hashes raw pandas cells; Array/Map/Struct
result columns crash it even when every value is correct (the
emb_pq_encode red row in CORRECTNESS_r05). plans/contract.py is the
choke point; these tests pin (a) the guard rejects each nested type
and accepts scalars, and (b) NO registered query -- the whole
registry, schema analysis only, no jobs -- produces a nested output
column, so the class of failure cannot recur.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_building_inspector_spark.plans.contract import (
    assert_scalar_output_schema,
    nested_output_fields,
)
from etl_building_inspector_spark.plans.registry import QUERIES


def test_guard_rejects_array_output(spark):
    # a dummy registered-query-shaped result with an array column:
    # exactly the emb_pq_encode failure class
    df = spark.range(3).select(
        F.col("id"), F.array(F.lit(1), F.lit(2)).alias("codes")
    )
    with pytest.raises(TypeError, match="codes.*Array/Map/Struct"):
        assert_scalar_output_schema(df.schema, "dummy_array_query")


def test_guard_rejects_map_and_struct_output(spark):
    df = spark.range(1).select(
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.struct(F.lit(1).alias("a")).alias("s"),
    )
    assert nested_output_fields(df.schema) == ["m", "s"]
    with pytest.raises(TypeError):
        assert_scalar_output_schema(df.schema, "dummy_nested_query")


def test_guard_accepts_scalar_schema(spark):
    df = spark.range(1).select(
        F.col("id"),
        F.lit("x").alias("s"),
        F.lit(1.5).alias("d"),
        F.lit(True).alias("b"),
        F.current_date().alias("day"),
    )
    assert nested_output_fields(df.schema) == []
    assert_scalar_output_schema(df.schema, "scalar_query")  # no raise


def test_every_registered_query_has_scalar_output(spark, sf_dir):
    """Whole-registry scan: .schema is analysis-only (no job runs), so
    checking all ~350 registered queries is cheap. Any query whose
    result schema contains a nested type would be a guaranteed red
    driver row -- fail it here first."""
    offenders: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as e:  # noqa: BLE001 -- env-gated queries skip
            pytest.fail(f"{name}: plan analysis failed: {str(e)[:200]}")
        bad = nested_output_fields(schema)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "registered queries with driver-uncanonicalizable output: "
        f"{offenders}"
    )
