"""Golden tests for the domain pipeline against reference semantics
(every trap from SURVEY section 7's hard-parts list)."""

from __future__ import annotations

import hashlib
import json

import pytest

from etl_building_inspector_spark.plans.pipeline import transform, to_ndjson_line

from domain_fixtures import make_landing


def _b62(n: int) -> str:
    chars = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    if n == 0:
        return "0"
    out = []
    while n:
        n, r = divmod(n, 62)
        out.append(chars[r])
    return "".join(reversed(out))


def _toponym_id(sheet_id: int, coords: list[float]) -> str:
    joined = ",".join(
        str(int(c)) if float(c).is_integer() else str(c) for c in coords
    )
    h = hashlib.md5(joined.encode()).hexdigest()
    return f"toponym-{sheet_id}-{_b62(int(h, 16))}"


@pytest.fixture(scope="module")
def records(spark, tmp_path_factory):
    paths = make_landing(str(tmp_path_factory.mktemp("landing")))
    df = transform(
        spark,
        paths["consolidated"],
        paths["toponyms"],
        paths["sheets"],
        paths["layer_boroughs"],
    )
    rows = df.collect()
    return {
        "objects": [r for r in rows if r.record_type == "object"],
        "relations": [r for r in rows if r.record_type == "relation"],
        "logs": [r for r in rows if r.record_type == "log"],
        "all": rows,
    }


T_IN_TWO = _toponym_id(10, [2.0, 2.0])
T_IN_ONE = _toponym_id(10, [0.5, 0.5])
T_NOMATCH = _toponym_id(10, [-10.0, -10.0])
T_NO_INDEX = _toponym_id(12, [1.0, 1.0])
T_NO_BOROUGH = _toponym_id(11, [52.0, 52.0])
T_IN_HOLE = _toponym_id(10, [24.0, 24.0])
T_IN_DONUT = _toponym_id(10, [21.0, 21.0])


def test_js_num_rendering(spark):
    """_js_num must agree with JS String(number) across the ranges
    where Java Double.toString diverges (scientific-notation
    thresholds, ADVICE r01): integers stay integral at any magnitude,
    decimals in the shared-shortest-repr range pass through, and the
    un-renderable range fails loudly instead of hashing a wrong id."""
    from pyspark.sql import functions as F

    from etl_building_inspector_spark.plans.pipeline import _js_num

    cases = [
        (40.0, "40"),
        (-73.9876543, "-73.9876543"),
        (0.5, "0.5"),
        (-0.0, "0"),
        (12345678.0, "12345678"),  # Java: 1.2345678E7; JS: 12345678
        (1e15, "1000000000000000"),
        (0.001, "0.001"),
        (None, None),
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "x double")
    got = [r.s for r in df.select(_js_num(F.col("x")).alias("s")).collect()]
    assert got == [want for _, want in cases]

    import pytest as _pytest

    bad = spark.createDataFrame([(1e-5,)], "x double")
    with _pytest.raises(Exception, match="JS-compatible"):
        bad.select(_js_num(F.col("x")).alias("s")).collect()


def test_building_objects(records):
    buildings = {
        r.id: r
        for r in records["objects"]
        if r.type == "st:Building" and r.geom_type == "Polygon"
    }
    # id 3 suppressed entirely (degenerate first copy marks the cache,
    # valid later copy never re-admitted), id 1 kept-first, so: 1, 2, 4
    assert set(buildings) == {"1", "2", "4", "6"}
    b1 = buildings["1"]
    assert b1.valid_since == 1857 and b1.valid_until == 1857
    assert b1.data.colors == ["pink", "yellow"]
    assert b1.data.borough == "Manhattan"
    assert b1.data.map_id == 500  # kept-FIRST copy (dup had 999)
    b4 = buildings["4"]
    assert b4.data.borough is None  # layer 101 miss -> row survives


def test_addresses_positional_alignment(records):
    addrs = {r.id: r for r in records["objects"] if r.type == "st:Address"}
    assert set(addrs) == {"1-1", "1-2"}
    assert addrs["1-1"].name == "25" and addrs["1-1"].data.number == "25"
    # i-th address pairs with geometries[i+1]
    assert json.loads(addrs["1-1"].geom_coords_json) == [1.0, 1.0]
    assert json.loads(addrs["1-2"].geom_coords_json) == [2.0, 2.0]
    # address -> building containment relations
    rels = {
        (r.rel_from, r.rel_to)
        for r in records["relations"]
        if r.rel_type == "st:in" and "-" in (r.rel_from or "")
    }
    assert ("1-1", "1") in rels and ("1-2", "1") in rels


def test_mapwarper_relations(records):
    rels = {
        (r.rel_from, r.rel_to)
        for r in records["relations"]
        if r.rel_type == "st:in"
    }
    assert ("1", "mapwarper/500") in rels
    assert ("1", "mapwarper/layer-100") in rels
    # toponym mapId comes from the sheet (sheet 10 -> map 500)
    assert (T_IN_TWO, "mapwarper/500") in rels
    assert (T_IN_TWO, "mapwarper/layer-100") in rels


def test_toponym_objects_and_dedup(records):
    tops = {
        r.id: r
        for r in records["objects"]
        if r.type == "st:Building" and r.geom_type == "Point"
    }
    # t_dup (same coords+sheet as t_in_two) deduped: 5 toponyms -> 4
    assert set(tops) == {
        T_IN_TWO, T_IN_ONE, T_NOMATCH, T_NO_INDEX, T_NO_BOROUGH,
        T_IN_HOLE, T_IN_DONUT,
    }
    # keep-FIRST: name is from the first occurrence
    assert tops[T_IN_TWO].name == "Tontine Coffee House"
    assert tops[T_IN_TWO].valid_since == 1857


def test_spatial_sameas_one_to_many(records):
    sameas = {
        (r.rel_from, r.rel_to)
        for r in records["relations"]
        if r.rel_type == "st:sameAs"
    }
    assert (T_IN_TWO, "1") in sameas and (T_IN_TWO, "2") in sameas
    assert (T_IN_ONE, "1") in sameas
    assert (T_IN_ONE, "2") not in sameas
    assert (T_NO_BOROUGH, "4") in sameas
    # full-polygon semantics (geo-indices.js:38-50): the courtyard-
    # hole toponym must NOT match b6; the ring-body one must
    assert (T_IN_DONUT, "6") in sameas
    assert (T_IN_HOLE, "6") not in sameas
    assert len(sameas) == 5


def test_logs(records):
    errors = sorted(r.error for r in records["logs"])
    assert f"Can't find building for toponym {T_NOMATCH}" in errors
    # hole-interior toponym is OUTSIDE its layer's buildings -> no-match
    assert f"Can't find building for toponym {T_IN_HOLE}" in errors
    assert f"Error computing intersection for toponym {T_NO_INDEX}" in errors
    # borough logs: building 4 (layer 101) + toponym on layer 101
    assert errors.count("Can't find borough for layer 101") == 2
    # degenerate feature's would-be borough log never emitted; layer
    # 100/102 boroughs exist
    assert len(errors) == 5


def test_ndjson_shape(records, spark):
    df = spark.createDataFrame(records["all"])
    lines = {r.value for r in to_ndjson_line(df).collect()}
    parsed = [json.loads(ln) for ln in lines]
    assert {p["type"] for p in parsed} == {"object", "relation", "log"}
    objs = [p for p in parsed if p["type"] == "object"]
    b1 = next(p for p in objs if p["obj"]["id"] == "1")
    # camelCase payload, geometry spliced as valid GeoJSON
    assert b1["obj"]["validSince"] == 1857
    assert b1["obj"]["data"]["sheetId"] == 10
    assert b1["obj"]["geometry"]["type"] == "Polygon"
    assert b1["obj"]["geometry"]["coordinates"][0][0] == [0.0, 0.0]
    # null fields omitted (JS undefined semantics)
    assert "name" not in b1["obj"]


def test_output_data_schema_conformance(records):
    """SURVEY section 5 item 5: the reference's one shipped correctness
    artifact is the JSON Schema for the `data` payload
    (building-inspector.dataset.json: oneOf Building/Address,
    additionalProperties false, required keys). Validate every emitted
    object against it."""
    for r in records["objects"]:
        d = r.data.asDict()
        assert set(d) <= {
            "sheet_id", "layer_id", "map_id", "colors", "borough", "number",
        }
        # required on both variants
        assert d["sheet_id"] is not None
        assert d["layer_id"] is not None
        assert d["map_id"] is not None
        if r.type == "st:Address":
            assert d["number"] is not None  # required for Address
            assert d["colors"] is None  # not a property of Address
        if d["colors"] is not None:
            assert len(d["colors"]) >= 1  # minItems: 1
            assert all(isinstance(c, str) for c in d["colors"])
        if d["borough"] is not None:
            assert isinstance(d["borough"], str)


def test_flatten_paths_projection(records, spark):
    from etl_building_inspector_spark.plans.pipeline import flatten_records

    df = spark.createDataFrame(records["all"])
    flat = {r.id: r for r in flatten_records(df).collect()}
    assert flat["1"].data_colors_0 == "pink"
    assert flat["1"].data_colors_1 == "yellow"
    assert flat["1"].data_colors == ["pink", "yellow"]
    assert flat["1"].data_sheetId == 10
    assert flat["1-1"].data_number == "25"
    assert flat["1-1"].data_colors_0 is None
