"""Reference-shaped GeoJSON fixtures (FIXTURES.md family A) covering
every branch in SURVEY section 7's trap list. Written as JSONL to a
temp dir by make_landing()."""

from __future__ import annotations

import json
import os

# sheets: 10 -> layer 100 (year 1857, borough known)
#         11 -> layer 101 (year 1880, borough MISSING from dim)
#         12 -> layer 102 (year 1899, borough known, no polygons land here)
SHEETS = [
    {"type": "Feature", "properties": {"id": 10, "map_id": "500", "layer": {"external_id": 100, "year": "1857"}}},
    {"type": "Feature", "properties": {"id": 11, "map_id": "501", "layer": {"external_id": 101, "year": "1880"}}},
    {"type": "Feature", "properties": {"id": 12, "map_id": "502", "layer": {"external_id": 102, "year": "1899"}}},
]

LAYER_BOROUGHS = [
    {"id": 100, "borough": "Manhattan"},
    {"id": 102, "borough": "Brooklyn"},
    # 101 intentionally absent -> F4 borough log
]


def _gc(polygon, points):
    geoms = [{"type": "Polygon", "coordinates": polygon}]
    geoms += [{"type": "Point", "coordinates": p} for p in points]
    return {"type": "GeometryCollection", "geometries": geoms}


UNIT_SQ = [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]]
INNER_SQ = [[[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0]]]
FAR_SQ = [[[100.0, 100.0], [104.0, 100.0], [104.0, 104.0], [100.0, 104.0], [100.0, 100.0]]]
DEGENERATE = [[[0.0, 0.0], [1.0, 1.0], [0.0, 0.0]]]  # 3 coords < 4
L101_SQ = [[[50.0, 50.0], [54.0, 50.0], [54.0, 54.0], [50.0, 54.0], [50.0, 50.0]]]
# courtyard: outer 20..28 square with a 23..25 hole -- full GeoJSON
# Polygon semantics (geo-indices.js:38-50): a toponym inside the hole
# is OUTSIDE the building; one in the ring body is inside.
COURTYARD = [
    [[20.0, 20.0], [28.0, 20.0], [28.0, 28.0], [20.0, 28.0], [20.0, 20.0]],
    [[23.0, 23.0], [25.0, 23.0], [25.0, 25.0], [23.0, 25.0], [23.0, 23.0]],
]

CONSOLIDATED = [
    # b1: 2 addresses, colors, inside-tests target (layer 100)
    {"type": "Feature",
     "properties": {"id": 1, "map_id": "500", "sheet_id": 10,
                    "consensus_color": "pink,yellow",
                    "consensus_address": [{"flag_value": "25"}, {"flag_value": "27"}]},
     "geometry": _gc(UNIT_SQ, [[1.0, 1.0], [2.0, 2.0]])},
    # b2: overlapping polygon on same layer (one-to-many J3), NONE addresses
    {"type": "Feature",
     "properties": {"id": 2, "map_id": "500", "sheet_id": 10,
                    "consensus_address": "NONE"},
     "geometry": _gc(INNER_SQ, [])},
    # b3: DEGENERATE first occurrence of id 3 (F2) ...
    {"type": "Feature",
     "properties": {"id": 3, "map_id": "500", "sheet_id": 10,
                    "consensus_address": "NONE"},
     "geometry": _gc(DEGENERATE, [])},
    # ... followed by a VALID duplicate of id 3: must stay suppressed
    # (D1 marks before F2 filters -- the trap)
    {"type": "Feature",
     "properties": {"id": 3, "map_id": "500", "sheet_id": 10,
                    "consensus_address": "NONE"},
     "geometry": _gc(UNIT_SQ, [])},
    # b4: far polygon (no toponym hits), missing borough layer 101
    {"type": "Feature",
     "properties": {"id": 4, "map_id": "501", "sheet_id": 11,
                    "consensus_address": "NONE"},
     "geometry": _gc(L101_SQ, [])},
    # b5: plain duplicate of id 1 (keep-first: later copy dropped)
    {"type": "Feature",
     "properties": {"id": 1, "map_id": "999", "sheet_id": 10,
                    "consensus_address": "NONE"},
     "geometry": _gc(FAR_SQ, [])},
    # b6: courtyard building WITH A HOLE (layer 100) -- the full-
    # polygon J3 semantics golden (VERDICT r4 #3)
    {"type": "Feature",
     "properties": {"id": 6, "map_id": "500", "sheet_id": 10,
                    "consensus_address": "NONE"},
     "geometry": _gc(COURTYARD, [])},
]

TOPONYMS = [
    # t_in_two: inside BOTH b1 and b2 (one-to-many)
    {"type": "Feature", "properties": {"sheet_id": 10, "consensus": "Tontine Coffee House"},
     "geometry": {"type": "Point", "coordinates": [2.0, 2.0]}},
    # t_in_one: inside b1 only
    {"type": "Feature", "properties": {"sheet_id": 10, "consensus": "Old Brewery"},
     "geometry": {"type": "Point", "coordinates": [0.5, 0.5]}},
    # t_nomatch: on layer 100, inside nothing -> no-match log
    {"type": "Feature", "properties": {"sheet_id": 10, "consensus": "Lost Place"},
     "geometry": {"type": "Point", "coordinates": [-10.0, -10.0]}},
    # t_dup: identical coords to t_in_two on same sheet -> D2 dedup
    {"type": "Feature", "properties": {"sheet_id": 10, "consensus": "Tontine Again"},
     "geometry": {"type": "Point", "coordinates": [2.0, 2.0]}},
    # t_no_index: layer 102 has no polygons -> error log (throw path)
    {"type": "Feature", "properties": {"sheet_id": 12, "consensus": "Ghost Town"},
     "geometry": {"type": "Point", "coordinates": [1.0, 1.0]}},
    # t_no_borough: layer 101 -> borough log too; inside b4
    {"type": "Feature", "properties": {"sheet_id": 11, "consensus": "Uncharted"},
     "geometry": {"type": "Point", "coordinates": [52.0, 52.0]}},
    # t_in_hole: inside b6's COURTYARD HOLE -> must NOT match b6
    # (even-odd parity over all rings; outer-ring-only would wrongly
    # match) -> no-match log
    {"type": "Feature", "properties": {"sheet_id": 10, "consensus": "Hidden Court"},
     "geometry": {"type": "Point", "coordinates": [24.0, 24.0]}},
    # t_in_donut: in b6's ring body (between outer ring and hole) ->
    # matches b6
    {"type": "Feature", "properties": {"sheet_id": 10, "consensus": "Court Gate"},
     "geometry": {"type": "Point", "coordinates": [21.0, 21.0]}},
]


def make_landing(tmpdir: str) -> dict[str, str]:
    paths = {}
    for name, feats in (
        ("consolidated", CONSOLIDATED),
        ("toponyms", TOPONYMS),
        ("sheets", SHEETS),
    ):
        p = os.path.join(tmpdir, f"{name}.jsonl")
        with open(p, "w") as f:
            for feat in feats:
                f.write(json.dumps(feat, separators=(",", ":")) + "\n")
        paths[name] = p
    p = os.path.join(tmpdir, "layer-boroughs.json")
    with open(p, "w") as f:
        json.dump(LAYER_BOROUGHS, f)
    paths["layer_boroughs"] = p
    return paths
