"""Explicit schemas for every input/output the engine touches.

Never schema-infer on a production path: inference on a 100 TB JSON
corpus is a full extra scan. These StructTypes mirror how the reference
reads each field (citations: /root/reference/building-inspector.js).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# GeoJSON geometry. The reference handles Polygon, Point and
# GeometryCollection (building-inspector.js:123, :162, :247). GeoJSON
# coordinates are heterogeneous (Point: [x,y]; Polygon: [[[x,y],...]]),
# so a single typed struct can't hold both shapes losslessly. We model
# geometry with BOTH shapes as nullable fields; exactly one is set,
# discriminated by `type`. This keeps everything columnar (no opaque
# JSON strings on the hot path) while staying pure-Spark (no Sedona in
# this environment).
# ---------------------------------------------------------------------------

POINT_COORDS = T.ArrayType(T.DoubleType())
RING = T.ArrayType(T.ArrayType(T.DoubleType()))  # ring = array of [x, y]
POLYGON_COORDS = T.ArrayType(RING)

GEOMETRY = T.StructType(
    [
        T.StructField("type", T.StringType()),  # 'Point' | 'Polygon'
        T.StructField("point", POINT_COORDS, True),
        T.StructField("polygon", POLYGON_COORDS, True),
    ]
)

GEOMETRY_COLLECTION = T.StructType(
    [
        T.StructField("type", T.StringType()),  # 'GeometryCollection'
        T.StructField("geometries", T.ArrayType(GEOMETRY)),
    ]
)

# ---------------------------------------------------------------------------
# Inputs (FIXTURES.md family A; shapes from building-inspector.js:96-162,
# :207-247, :384-386 and layer-boroughs.json).
#
# `consensus_address` is POLYMORPHIC in the source JSON (the literal
# string 'NONE' or an array of {flag_value}) -- building-inspector.js:142.
# On ingest we read it as a JSON string and parse the array form with
# from_json, so the typed schema below holds array-or-null.
# ---------------------------------------------------------------------------

ADDRESS_ENTRY = T.StructType([T.StructField("flag_value", T.StringType())])

CONSOLIDATED = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "properties",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),  # dedup key (:96)
                    T.StructField("map_id", T.StringType()),  # numeric string (:102)
                    T.StructField("sheet_id", T.LongType()),  # FK -> sheets (:103)
                    T.StructField("consensus_color", T.StringType(), True),  # csv (:120)
                    # raw polymorphic payload: 'NONE' | JSON array text (:142)
                    T.StructField("consensus_address", T.StringType(), True),
                ]
            ),
        ),
        T.StructField("geometry", GEOMETRY_COLLECTION),
    ]
)

TOPONYMS = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "properties",
            T.StructType(
                [
                    T.StructField("sheet_id", T.LongType()),  # (:208)
                    T.StructField("consensus", T.StringType(), True),  # name (:240)
                ]
            ),
        ),
        T.StructField("geometry", GEOMETRY),  # Point (:247)
    ]
)

SHEETS = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "properties",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),  # PK (:385)
                    T.StructField("map_id", T.StringType()),  # numeric string (:218)
                    T.StructField(
                        "layer",
                        T.StructType(
                            [
                                T.StructField("external_id", T.LongType()),  # (:104)
                                T.StructField("year", T.StringType()),  # numeric (:105)
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)

LAYER_BOROUGHS = T.StructType(
    [
        T.StructField("layer_id", T.LongType()),
        T.StructField("borough", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Output: canonical wide record for the tagged union
# {object | relation | log} (SURVEY section 1.1, 2.8). One wide
# StructType with nullable branches + record_type discriminator keeps
# the sink a single partitioned write instead of three.
# ---------------------------------------------------------------------------

OBJECT_DATA = T.StructType(
    [
        T.StructField("sheet_id", T.LongType(), True),
        T.StructField("layer_id", T.LongType(), True),
        T.StructField("map_id", T.IntegerType(), True),
        T.StructField("colors", T.ArrayType(T.StringType()), True),
        T.StructField("borough", T.StringType(), True),
        T.StructField("number", T.StringType(), True),
    ]
)

RECORD = T.StructType(
    [
        T.StructField("record_type", T.StringType()),  # object|relation|log
        # object branch (building-inspector.js:108-125, :146-165, :232-249)
        T.StructField("id", T.StringType(), True),
        T.StructField("type", T.StringType(), True),  # st:Building | st:Address
        T.StructField("valid_since", T.IntegerType(), True),
        T.StructField("valid_until", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("data", OBJECT_DATA, True),
        T.StructField("geometry", GEOMETRY, True),
        # relation branch (:167-176, :183-202, :288-296)
        T.StructField("rel_from", T.StringType(), True),
        T.StructField("rel_to", T.StringType(), True),
        T.StructField("rel_type", T.StringType(), True),  # st:in | st:sameAs
        # log branch (:129-136, :222-230, :297-313)
        T.StructField("error", T.StringType(), True),
    ]
)

# Driver testdata tables (FIXTURES.md family B) -- parquet carries its own
# schema; listed here for reference use by loaders/tests.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
