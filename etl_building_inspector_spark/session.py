"""SparkSession factory.

One shared session across queries/tests (BASELINE.md: session reuse is
part of the 2x bench envelope). Config is chosen for correctness of the
DuckDB-oracle comparison (UTC timestamps, ANSI off to match permissive
cast semantics) and for scale-readiness (AQE with skew-join handling,
Arrow for the few pandas_udf kernels).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "etl-building-inspector-spark") -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    Local parallelism comes from ``SPARK_GRAFT_CPUS`` (default: all
    cores). ``spark.sql.shuffle.partitions`` is sized to the local core
    count -- on a real cluster this is overridden by AQE coalescing,
    which stays enabled here so plans behave the same way at 1000
    executors.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # shuffle sizing: ~cores locally; AQE re-coalesces at runtime so
        # the same code scales to cluster partition counts.
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow: fast path for the pandas_udf kernels and for
        # createDataFrame/ toPandas in tests.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Oracle comparison: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Permissive (classic) semantics: element_at out-of-range -> NULL,
        # cast('12abc' as int) -> NULL -- matches the reference's JS
        # parseInt-style leniency (building-inspector.js:102) and keeps
        # the DuckDB oracles expressible with try_cast.
        .config("spark.sql.ansi.enabled", "false")
        # local[N] = single JVM; driver memory is the only knob.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # nested-schema pruning ON (default, but pinned: the GeoJSON
        # structs rely on it for column pruning at scale).
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
