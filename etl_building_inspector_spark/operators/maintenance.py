"""Table-maintenance executors: the actionable side of the planning
queries (queries_surface5.compaction_bin_plan plans bins over
synthesized file stats; this module compacts REAL parquet
directories -- the OPTIMIZE-style rewrite every long-lived table
needs once streaming/append jobs have littered it with small files).

Scale notes: file LISTING is a metadata operation (one namenode/
object-store listing, same as Delta/Iceberg OPTIMIZE does) -- it is
the one sanctioned driver-side step because its size is the FILE
COUNT, not the data. The rewrite itself is fully distributed: rows
flow scan -> hash-repartition(bin) -> write, one shuffle, no driver
data movement.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def list_parquet_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(absolute_path, size_bytes) for every parquet part file under
    `path`, via the Hadoop FileSystem API (works for any scheme the
    session can read -- local, HDFS, s3a)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        base = os.path.basename(name)
        if base.endswith(".parquet") and not base.startswith(("_", ".")):
            out.append((name, int(st.getLen())))
    return out


def plan_bins(
    files: list[tuple[str, int]], target_bytes: int
) -> dict[str, int]:
    """First-fit-in-listing-order running-sum binning (the same rule
    as the compaction_bin_plan query): assign each file to bin
    floor(running_sum_before / target). Deterministic, one pass,
    keeps listing locality so adjacent small files merge together."""
    plan: dict[str, int] = {}
    running = 0
    for name, size in sorted(files):
        plan[name] = running // target_bytes
        running += size
    return plan


def compact_parquet_dir(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite `in_dir`'s many small parquet files into ~target-sized
    files at `out_dir`. Returns a stats dict (files before/after,
    bytes, bins).

    Plan shape: the listing + bin plan are metadata-sized; the data
    path is scan -> join nothing (bin comes from input_file_name via a
    broadcast map literal) -> repartition(n_bins, bin) -> write. One
    shuffle, partition count = bin count, so every output file lands
    near the target size. Rewriting into a STAGING layout and keeping
    the input untouched mirrors how OPTIMIZE commits would swap
    manifests atomically."""
    files = list_parquet_files(spark, in_dir)
    if not files:
        raise ValueError(f"no parquet files under {in_dir}")
    plan = plan_bins(files, target_bytes)
    n_bins = max(plan.values()) + 1

    # Key the lookup by file BASENAME, not Path.toString(): the Hadoop
    # listing renders the local scheme as 'file:/root/...' while
    # input_file_name() renders 'file:///root/...', so a full-path map
    # silently returns NULL for every row and the repartition hashes
    # everything onto one constant key (one task rewrites the whole
    # table). Parquet part names carry a per-task UUID, so basenames
    # are unique; assert that rather than assume it.
    base_plan = {os.path.basename(k): v for k, v in plan.items()}
    if len(base_plan) != len(plan):
        raise ValueError("duplicate parquet basenames; cannot key bin map")
    mapping = F.create_map(
        *[F.lit(x) for kv in base_plan.items() for x in kv]
    )
    df = spark.read.parquet(in_dir)
    basename = F.element_at(F.split(F.input_file_name(), "/"), -1)
    # try_element_at: NULL on a missing key even under ANSI mode, so
    # the raise_error below owns the failure message.
    bin_col = F.try_element_at(mapping, basename).cast("int")
    # Fail fast if any row's file missed the plan (null key would
    # otherwise degrade sizing silently -- the exact bug this guards).
    binned = df.withColumn(
        "__bin",
        F.when(
            bin_col.isNull(),
            F.raise_error(
                F.concat(
                    F.lit("compact_parquet_dir: no bin for file "),
                    F.input_file_name(),
                )
            ).cast("int"),
        ).otherwise(bin_col),
    )
    (
        binned.repartition(n_bins, "__bin")
        .drop("__bin")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    after = list_parquet_files(spark, out_dir)
    return {
        "files_before": len(files),
        "files_after": len(after),
        "bytes_before": sum(s for _, s in files),
        "bytes_after": sum(s for _, s in after),
        "n_bins": n_bins,
    }
