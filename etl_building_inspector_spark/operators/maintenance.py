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
    # repartition(n, col) hash-partitions, and Murmur3 collides bin
    # ids heavily (measured: n distinct ids land in ~0.63n partitions
    # -- merged bins produce ~2x-target files, breaking the sizing
    # contract). Route each bin to its OWN partition by remapping bin
    # b -> a preimage integer j with pmod(hash(j), n_bins) == b; the
    # preimage search is a driver-side loop over F.hash's documented
    # Murmur3 (evaluated once through a tiny literal plan so the
    # Python side never re-implements the hash).
    probe_vals = list(range(16 * n_bins + 64))
    hashed = (
        spark.createDataFrame([(v,) for v in probe_vals], "j int")
        .select("j", F.pmod(F.hash(F.col("j")), F.lit(n_bins)).alias("b"))
        .collect()
    )
    preimage: dict[int, int] = {}
    for r in hashed:
        preimage.setdefault(r["b"], r["j"])
    missing_bins = [b for b in range(n_bins) if b not in preimage]
    if missing_bins:  # statistically absurd at 16x oversampling
        raise RuntimeError(f"no hash preimage found for bins {missing_bins}")
    # ONE composed map basename -> preimage(bin): both lookups are
    # known driver-side, so the row-level plan carries a single map
    # literal and a single try_element_at
    mapping = F.create_map(
        *[
            F.lit(x)
            for name, b in base_plan.items()
            for x in (name, preimage[b])
        ]
    )
    df = spark.read.parquet(in_dir)
    basename = F.element_at(F.split(F.input_file_name(), "/"), -1)
    # try_element_at: NULL on a missing key even under ANSI mode, so
    # the raise_error below owns the failure message.
    pt_col = F.try_element_at(mapping, basename).cast("int")
    # Fail fast if any row's file missed the plan (null key would
    # otherwise degrade sizing silently -- the exact bug this guards).
    binned = df.withColumn(
        "__pt",
        F.when(
            pt_col.isNull(),
            F.raise_error(
                F.concat(
                    F.lit("compact_parquet_dir: no bin for file "),
                    F.input_file_name(),
                )
            ).cast("int"),
        ).otherwise(pt_col),
    )
    (
        binned.repartition(n_bins, "__pt")
        .drop("__pt")
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


def merge_on_files(
    spark: SparkSession,
    base_dir: str,
    out_dir: str,
    updates,
    key: str,
    set_cols: list[str],
) -> dict:
    """Copy-on-write MERGE executor (the physical half of the
    merge_on_files_cow plan query): apply an upsert changeset to a
    parquet directory by rewriting ONLY the files that contain a
    matched key, Delta/Iceberg-OPTIMIZE style.

    Phases, and why each scales:
    1. TOUCH PROBE: base left-semi-joins the update keys, collapses to
       distinct input_file_name() -- output is one row per TOUCHED
       FILE (metadata-sized; the one sanctioned collect, same contract
       as list_parquet_files). Untouched files are never rewritten.
    2. REWRITE: the touched files are re-read BY PATH -- real file
       pruning, the scan never opens an untouched file -- left-joined
       to the changeset, and matched rows take the update's set_cols
       (unmatched rows in a touched file pass through). Written to
       out_dir/rewritten.
    3. APPEND: not-matched-by-key updates (left-anti against the base
       KEY projection -- a column-pruned scan) land in out_dir/appended.
    4. COMMIT (simulated): the returned manifest lists kept files,
       rewritten output, and the appended file -- exactly the
       remove+add actions a Delta commit would publish. The final
       logical table is kept + rewritten + appended; the base dir is
       untouched (snapshot isolation for free).

    At 100 TB with 0.1% of keys updated, phase 2 touches only the
    files those keys land in; with a min/max-key manifest the phase-1
    probe itself prunes to candidate files before reading data."""
    from pyspark.sql import functions as _F

    # Validate BEFORE any Spark job: a malformed changeset should fail
    # with the friendly error, not a raw AnalysisException mid-probe.
    missing = [c for c in [key, *set_cols] if c not in updates.columns]
    if missing:
        raise ValueError(f"changeset lacks required columns {missing}")

    base = spark.read.parquet(base_dir)
    # MERGE cardinality contract: a base row MATCHED by >1 changeset
    # row would silently duplicate in the rewrite (the left join fans
    # out) -- real MERGE raises, so do we. The guard applies only to
    # keys that exist in the base: several NOT-matched rows with the
    # same new key are plain inserts (legal MERGE input) and all
    # append. One metadata-sized agg.
    dup = (
        updates.groupBy(key)
        .agg(_F.count("*").alias("n"))
        .where(_F.col("n") > 1)
        .join(base.select(key).distinct(), key, "left_semi")
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"multiple changeset rows matched {key}={dup[0][key]}; "
            "MERGE requires at most one source row per target row"
        )

    upd_keys = updates.select(key).distinct()
    # input_file_name() must bind to a SINGLE file source, so project
    # it directly above the base scan BEFORE the join (evaluating it
    # after would see two sources -- the changeset may itself come
    # from parquet -- and fail PreReadCheck)
    base_f = base.select(key, _F.input_file_name().alias("__f"))
    touched = sorted(
        r[0]
        for r in base_f.join(upd_keys, key, "left_semi")
        .select("__f")
        .distinct()
        .collect()
    )
    all_files = sorted(f for f, _ in list_parquet_files(spark, base_dir))
    # input_file_name() and the Hadoop listing render the local scheme
    # differently (file:/// vs file:/) -- compare by basename, the
    # same normalization the compaction bin map uses
    touched_base = {os.path.basename(f) for f in touched}
    kept = [f for f in all_files if os.path.basename(f) not in touched_base]

    rows_rewritten = 0
    base_types = {f.name: f.dataType for f in base.schema.fields}
    # MERGE type contract: an update value that cannot cast to the
    # base column type must FAIL the merge (real MERGE raises), not
    # silently become NULL (this session runs ANSI off, where cast()
    # yields NULL on overflow/parse failure). One changeset-sized
    # probe per set column, same class of guard as the dup-key check.
    for c in set_cols:
        bad = (
            updates.where(
                _F.col(c).isNotNull() & _F.col(c).cast(base_types[c]).isNull()
            )
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(
                f"changeset column {c!r} value {bad[0][c]!r} does not cast "
                f"to base type {base_types[c].simpleString()}; MERGE refuses "
                "to silently null it"
            )
    if touched:
        tbase = spark.read.parquet(*touched).alias("b")
        # __matched marker instead of coalesce: coalesce(u.c, b.c)
        # cannot express a legitimate set-to-NULL update -- matched
        # rows take the update value even when it is NULL.
        u = updates.select(
            key, *set_cols
        ).withColumn("__matched", _F.lit(True)).alias("u")
        out_cols = []
        for c in base.columns:
            if c in set_cols:
                # cast the update value to the BASE column type
                # (mirrors the insert alignment below): a changeset
                # with a narrower/wider type must not make rewritten
                # files' schema drift from the kept files (ADVICE r4)
                out_cols.append(
                    _F.when(
                        _F.col("u.__matched").isNotNull(),
                        _F.col("u." + c).cast(base_types[c]),
                    )
                    .otherwise(_F.col("b." + c))
                    .alias(c)
                )
            else:
                out_cols.append(_F.col("b." + c).alias(c))
        merged = tbase.join(u, _F.col("b." + key) == _F.col("u." + key), "left")
        merged.select(out_cols).write.mode("overwrite").parquet(
            out_dir + "/rewritten"
        )
        rows_rewritten = spark.read.parquet(out_dir + "/rewritten").count()

    # Not-matched inserts are schema-ALIGNED to the base: columns the
    # changeset lacks become typed NULLs (never silently dropped --
    # the previous behavior skipped the append entirely for narrow
    # changesets, losing the insert rows from the merge result).
    inserts = updates.join(base.select(key), key, "left_anti")
    aligned = inserts.select(
        *[
            (
                _F.col(c).cast(base_types[c])
                if c in inserts.columns
                else _F.lit(None).cast(base_types[c])
            ).alias(c)
            for c in base.columns
        ]
    )
    aligned.write.mode("overwrite").parquet(out_dir + "/appended")
    n_inserts = spark.read.parquet(out_dir + "/appended").count()

    return {
        "files_total": len(all_files),
        "files_rewritten": len(touched),
        "files_kept": len(kept),
        "kept": kept,
        "rewritten_dir": out_dir + "/rewritten" if touched else None,
        "appended_dir": out_dir + "/appended" if n_inserts else None,
        "rows_rewritten": rows_rewritten,
        "rows_inserted": n_inserts,
    }


def zorder_rewrite(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = 10,
) -> dict:
    """Z-order clustering executor (the physical half of the
    zorder_bucket_stats plan query; Delta OPTIMIZE ZORDER / Iceberg
    sort-order rewrite): recluster a table so file-level min/max
    stats prune on EITHER of two dimensions.

    Mechanics: each key is RANGE-NORMALIZED to [0, 2^bits) from its
    measured min/max (one metadata-sized agg) -- NOT masked: masking
    keeps only the low bits, so any column whose range exceeds 2^bits
    would interleave noise and cluster nothing (verified: on a
    0..15000 key, masked z-files each spanned ~97% of the key range
    -- zero pruning). Then z = bit-interleave of the two normalized
    keys (pure codegen integer arithmetic),
    repartitionByRange(n_files, z) + sortWithinPartitions(z) -> one
    range shuffle, n_files output files each covering a compact z
    range, i.e. a compact rectangle-ish region of (x, y) space. A
    point/range predicate on x OR y then overlaps only the files
    whose rectangle crosses it -- at 100 TB the difference between
    scanning ~sqrt-fraction of files and scanning all of them.
    Returns per-file (x, y) min/max spans -- exactly the stats a
    manifest/pruning layer would persist -- plus file counts."""
    df = spark.read.parquet(in_dir)
    mask = (1 << bits) - 1
    rng = df.agg(
        F.min(F.col(x_col).cast("long")).alias("x0"),
        F.max(F.col(x_col).cast("long")).alias("x1"),
        F.min(F.col(y_col).cast("long")).alias("y0"),
        F.max(F.col(y_col).cast("long")).alias("y1"),
    ).collect()[0]
    if rng["x0"] is None or rng["y0"] is None:
        # empty table or all-NULL cluster column: nothing to cluster
        # on -- degrade to a plain rewrite instead of a TypeError
        rng = {"x0": 0, "x1": 0, "y0": 0, "y1": 0}
    x_span = max(1, rng["x1"] - rng["x0"])
    y_span = max(1, rng["y1"] - rng["y0"])
    x = ((F.col(x_col).cast("long") - F.lit(rng["x0"])) * mask / x_span).cast(
        "long"
    )
    y = ((F.col(y_col).cast("long") - F.lit(rng["y0"])) * mask / y_span).cast(
        "long"
    )
    z = F.lit(0)
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    stats = (
        spark.read.parquet(out_dir)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min(x_col).alias("x_min"),
            F.max(x_col).alias("x_max"),
            F.min(y_col).alias("y_min"),
            F.max(y_col).alias("y_max"),
        )
        .collect()
    )
    return {
        "files": len(stats),
        "spans": [r.asDict() for r in stats],
    }


def vacuum_plan(
    spark: SparkSession,
    base_dir: str,
    live_files: list[str],
) -> dict:
    """VACUUM planning: files physically present under `base_dir` but
    absent from the manifest of LIVE files (by basename -- the same
    normalization every executor here uses, because input_file_name
    and the Hadoop listing render the local scheme differently) are
    orphans left behind by failed writes, aborted compactions, or
    superseded COW rewrites.

    Returns {"live": [...], "orphans": [...], "missing": [...]}:
    orphans are safe to delete, missing are manifest entries with no
    backing file (a corruption signal that must BLOCK deletion --
    matching Delta's VACUUM refusing to run when the log references
    absent files). Pure metadata: one listing, set arithmetic --
    nothing is read or deleted here; the caller deletes orphans after
    whatever retention window its sessions need (concurrent readers
    of a superseded snapshot may still hold the files open).
    """
    listed = list_parquet_files(spark, base_dir)
    present = {os.path.basename(f): f for f, _ in listed}
    # basename keying is only sound when basenames are unique under
    # base_dir (parquet part names carry per-task UUIDs, so they are
    # -- unless someone nested a copy of the table). A collision would
    # silently classify an orphan as live; refuse instead, the same
    # guard compact_parquet_dir applies to its bin map.
    if len(present) != len(listed):
        raise ValueError(
            "duplicate parquet basenames under "
            f"{base_dir}; basename-keyed vacuum planning would "
            "misclassify orphans -- deduplicate the layout first"
        )
    live = {os.path.basename(f) for f in live_files}
    orphans = sorted(p for b, p in present.items() if b not in live)
    missing = sorted(b for b in live if b not in present)
    return {
        "live": sorted(present[b] for b in present if b in live),
        "orphans": orphans,
        "missing": missing,
    }


def vacuum_execute(spark: SparkSession, plan: dict) -> int:
    """Delete the planned orphans; refuses when the plan shows missing
    live files (the table metadata cannot be trusted at that point).
    Returns the number of files removed. Driver-side file ops sized by
    the orphan COUNT -- the same metadata class as the listing."""
    if plan["missing"]:
        raise ValueError(
            f"manifest references {len(plan['missing'])} absent file(s) "
            f"(e.g. {plan['missing'][0]!r}); refusing to vacuum a table "
            "whose metadata is inconsistent"
        )
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    n = 0
    for f in plan["orphans"]:
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(conf)
        if fs.delete(p, False):
            n += 1
    return n
