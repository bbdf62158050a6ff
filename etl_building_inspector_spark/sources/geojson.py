"""GeoJSON ingestion (reference S6/S7/S8).

The reference stream-parses one giant FeatureCollection document with
JSONStream (building-inspector.js:327-335). At scale a single JSON doc
is not splittable, so the engine's landing format is JSONL (one feature
per line; sources/landing.py converts) and the scan is a plain
schema'd `spark.read.json` -- splittable, predicate/column pruned.

Two schema-on-read tricks keep everything columnar despite GeoJSON's
polymorphism (both verified against Spark 4's Jackson parser):
  * a StringType field swallows ANY JSON value as its raw text -- used
    for `consensus_address` ('NONE' | array, building-inspector.js:142)
    and for `coordinates` (Point vs Polygon shapes);
  * the typed forms are recovered with from_json AFTER the scan, so
    the parse cost is paid only for rows/columns that survive pruning.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import ADDRESS_ENTRY, POINT_COORDS, POLYGON_COORDS

# raw ingest schemas: polymorphic leaves read as raw-JSON strings
RAW_GEOMETRY = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("coordinates", T.StringType()),
    ]
)

RAW_CONSOLIDATED = T.StructType(
    [
        T.StructField("_seq", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField(
            "properties",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("map_id", T.StringType()),
                    T.StructField("sheet_id", T.LongType()),
                    T.StructField("consensus_color", T.StringType()),
                    T.StructField("consensus_address", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "geometry",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("geometries", T.ArrayType(RAW_GEOMETRY)),
                ]
            ),
        ),
    ]
)

RAW_TOPONYMS = T.StructType(
    [
        T.StructField("_seq", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField(
            "properties",
            T.StructType(
                [
                    T.StructField("sheet_id", T.LongType()),
                    T.StructField("consensus", T.StringType()),
                ]
            ),
        ),
        T.StructField("geometry", RAW_GEOMETRY),
    ]
)

RAW_SHEETS = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "properties",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("map_id", T.StringType()),
                    T.StructField(
                        "layer",
                        T.StructType(
                            [
                                T.StructField("external_id", T.LongType()),
                                T.StructField("year", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def featurecollection_to_jsonl(src: str, dst: str, seq_start: int = 0) -> int:
    """Landing-side convert: one GeoJSON FeatureCollection document ->
    JSONL, one feature per line (driver-side, runs once per download;
    the cluster never touches the unsplittable original). Each line is
    stamped with an explicit `_seq` file-order column (see
    landing._seq_line); for multi-file landing dirs chain the counter:
    n = featurecollection_to_jsonl(a, f1); featurecollection_to_jsonl(
    b, f2, seq_start=n)."""
    with open(src) as f:
        doc = json.load(f)
    feats = doc.get("features", [])
    with open(dst, "w") as out:
        for i, feat in enumerate(feats):
            out.write(
                json.dumps({"_seq": seq_start + i, **feat}, separators=(",", ":"))
                + "\n"
            )
    return len(feats)


def write_geojson_featurecollection(
    lines_df: DataFrame, out_path: str, line_col: str = "value"
) -> int:
    """Export-parity writer (reference S5): wrap feature JSON lines into
    one valid GeoJSON FeatureCollection document. Collect-based by
    design -- a single JSON doc is a driver-side artifact; cluster-scale
    exports stay JSONL."""
    rows = lines_df.select(line_col).collect()
    with open(out_path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[\n')
        for i, r in enumerate(rows):
            f.write(("," if i else "") + r[0] + "\n")
        f.write("]}\n")
    return len(rows)


def read_consolidated(spark: SparkSession, path: str) -> DataFrame:
    """Scan consolidated features. `_seq` drives keep-first dedup
    determinism (reference D1 is first-in-FILE-order,
    building-inspector.js:97-100). Landed lines carry an explicit
    `_seq` column written at download time (landing._seq_line) --
    contractual across any split/partition/file-listing order. Legacy
    landings without the column fall back to
    monotonically_increasing_id, which tracks file order only within a
    single file's splits (documented weaker guarantee)."""
    df = spark.read.schema(RAW_CONSOLIDATED).json(path)
    return df.withColumn(
        "_seq", F.coalesce(F.col("_seq"), F.monotonically_increasing_id())
    )


def read_toponyms(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.schema(RAW_TOPONYMS).json(path)
    return df.withColumn(
        "_seq", F.coalesce(F.col("_seq"), F.monotonically_increasing_id())
    )


def read_sheets(spark: SparkSession, path: str) -> DataFrame:
    """Sheets are the broadcast build side (reference loads them whole
    into memory, building-inspector.js:374-386)."""
    return spark.read.schema(RAW_SHEETS).json(path)


def read_layer_boroughs(spark: SparkSession, path: str) -> DataFrame:
    """Static dim table: JSON array file of {id, borough}
    (layer-boroughs.json)."""
    with open(path) as f:
        rows = json.load(f)
    return spark.createDataFrame(
        [(int(r["id"]), r["borough"]) for r in rows],
        "layer_id long, borough string",
    )


def parse_polygon(raw: F.Column) -> F.Column:
    return F.from_json(raw, POLYGON_COORDS)


def parse_point(raw: F.Column) -> F.Column:
    return F.from_json(raw, POINT_COORDS)


def parse_addresses(raw: F.Column) -> F.Column:
    """'NONE' (or anything non-array) -> NULL; array form -> typed."""
    return F.when(
        raw.isNotNull() & raw.startswith("["),
        F.from_json(raw, T.ArrayType(ADDRESS_ENTRY)),
    )


def read_jsonl_with_quarantine(
    spark: SparkSession, path: str, schema
) -> tuple[DataFrame, DataFrame]:
    """Schema'd JSONL scan that QUARANTINES malformed lines instead of
    nulling them silently (PERMISSIVE default) or killing the job
    (FAILFAST). Returns (good_rows, quarantined) where quarantined
    carries the raw offending line for replay/repair.

    This is the reference's logs-as-data discipline (S10,
    building-inspector.js:129-136 -- bad input becomes a record, the
    job continues) applied to the INGEST boundary: at 100 TB some
    landed lines WILL be truncated or malformed, and the difference
    between a job that quarantines 0.001% and one that dies at hour
    six is this split.

    Mechanics: a TEXT scan (splittable, one raw line per row) +
    `from_json`, which yields NULL for a syntactically-invalid line.
    This deliberately avoids the json reader's
    columnNameOfCorruptRecord route: Spark refuses plans that
    reference ONLY the corrupt column from a raw scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) and its
    documented workaround is cache() -- caching a 100 TB landing scan
    is not an ingest pattern. Here both outputs are plain column
    predicates over one codegen'd from_json pass. from_json signals
    BOTH syntactic corruption and per-field type mismatches through
    its corrupt-record field (an all-null struct is not
    distinguishable otherwise), so a line whose value cannot coerce
    to the declared type ({"id": "abc"} against id LONG) is ALSO
    quarantined -- deliberately: a type-drifted feed should surface
    as quarantine volume with the raw lines preserved for replay
    after a schema fix, not as silent NULLs corrupting aggregates
    downstream. Structural drift that still parses (missing fields,
    extra fields) stays on the good side with NULLs, which is
    dq_constraint_checks territory."""
    from pyspark.sql import types as T

    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    raw = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.input_file_name().alias("src_file"),
        F.from_json(
            F.col("value"),
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("data"),
    )
    bad = F.col("data").isNull() | F.col("data._corrupt").isNotNull()
    good = raw.where(~bad).select("data.*").drop("_corrupt")
    quarantined = raw.where(bad).select("raw_line", "src_file")
    return good, quarantined
