"""Independent property tests for the spatial family (queries_spatial
.py -- the reference's hardest operator, geo-indices.js:22-56).

Each test recomputes the claimed geometry from the raw parquet with
plain python loops over exact arithmetic -- the even-odd ray cast,
closed-interval bbox overlap, the separating-axis theorem, integer
squared distances -- with NO grid/broadcast/candidate machinery. The
Spark plans use grid-cell candidate stages and bbox prefilters; these
recomputes are the O(n^2) definitions, so they also prove the
filter-refine decompositions are result-invisible (the property the
grid join must guarantee at any scale).

Ray-cast float arithmetic mirrors the engines' evaluation order
exactly (ax + (py - ay) * (bx - ax) / (by - ay)), so double results
are bit-identical, not approximately equal.
"""

from __future__ import annotations

import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, read


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


# --- python twins of the synthesized geometry -------------------------------


def _diamond(cx: float, cy: float, r: float):
    return [
        (cx + r, cy),
        (cx, cy + r),
        (cx - r, cy),
        (cx, cy - r),
        (cx + r, cy),
    ]


def _polys():
    sup = read("supplier")
    out = []
    for s, nk in zip(sup["s_suppkey"], sup["s_nationkey"]):
        s, nk = int(s), int(nk)
        cx, cy = float((s % 40) * 10), float((s // 40) * 10)
        r = float(3 + s % 4)
        out.append(
            {
                "poly_id": s,
                "layer_id": nk % 5,
                "ring": _diamond(cx, cy, r),
                "cx": cx,
                "cy": cy,
                "r": r,
            }
        )
    return out


def _points():
    cust = read("customer")
    out = []
    for c, nk in zip(cust["c_custkey"], cust["c_nationkey"]):
        c, nk = int(c), int(nk)
        px = float((c % 40) * 10 + c % 7 - 3)
        py = float((c // 40 % 25) * 10 + c % 5 - 2)
        out.append({"point_id": c, "layer_id": nk % 5, "px": px, "py": py})
    return out


def _crossings(ring, px: float, py: float) -> int:
    n = 0
    for (ax, ay), (bx, by) in zip(ring, ring[1:]):
        if (ay > py) != (by > py):
            if px < ax + (py - ay) * (bx - ax) / (by - ay):
                n += 1
    return n


def _pip(ring, px, py) -> bool:
    return _crossings(ring, px, py) % 2 == 1


# ---------------------------------------------------------------------------
# PIP joins: broadcast and grid strategies against the O(n*m) ray-cast
# definition -- both must produce the identical pair set.
# ---------------------------------------------------------------------------


def _pip_pairs():
    polys, pts = _polys(), _points()
    return [
        {"point_id": p["point_id"], "poly_id": g["poly_id"]}
        for p in pts
        for g in polys
        if p["layer_id"] == g["layer_id"] and _pip(g["ring"], p["px"], p["py"])
    ]


@pytest.mark.parametrize("name", ["spatial_pip_join", "spatial_pip_join_grid"])
def test_pip_join_strategies_match_ray_cast_definition(spark, name):
    got = _run(spark, name)
    want = pd.DataFrame(_pip_pairs(), columns=["point_id", "poly_id"]).astype(
        "int64"
    )
    frames_equal(got, want)


def test_pip_nomatch_log_is_the_exact_complement(spark):
    got = _run(spark, "spatial_pip_nomatch_log")
    matched = {p["point_id"] for p in _pip_pairs()}
    pts = _points()
    unmatched = sorted(p["point_id"] for p in pts if p["point_id"] not in matched)
    want = pd.DataFrame(
        {"error": [f"Can't find polygon for point {i}" for i in unmatched]}
    )
    frames_equal(got, want)
    assert len(matched) + len(unmatched) >= len(pts) - len(matched)  # sanity
    assert len(got) == len(pts) - len({p["point_id"] for p in pts} & matched)


# ---------------------------------------------------------------------------
# KNN within radius: the grid 3x3 rewrite vs the all-pairs argmin.
# ---------------------------------------------------------------------------


def test_knn_join_matches_all_pairs_argmin(spark):
    got = _run(spark, "spatial_knn_join")
    R2 = 15 * 15
    sup = read("supplier")
    centers = [
        (int(s), int(nk) % 5, (int(s) % 40) * 10, (int(s) // 40) * 10)
        for s, nk in zip(sup["s_suppkey"], sup["s_nationkey"])
    ]
    rows = []
    for p in _points():
        px, py = int(p["px"]), int(p["py"])
        best = None
        for poly_id, layer, sx, sy in centers:
            if layer != p["layer_id"]:
                continue
            d2 = (px - sx) ** 2 + (py - sy) ** 2
            if d2 <= R2 and (best is None or (d2, poly_id) < best):
                best = (d2, poly_id)
        if best is not None:
            rows.append(
                {"point_id": p["point_id"], "poly_id": best[1], "d2": best[0]}
            )
    want = pd.DataFrame(rows, columns=["point_id", "poly_id", "d2"]).astype(
        "int64"
    )
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# bbox / SAT polygon-polygon joins: brute-force closed-interval and
# separating-axis definitions over every same-layer pair.
# ---------------------------------------------------------------------------


def _sup_boxes():
    out = []
    for p in _polys():
        out.append(
            {
                "a_id": p["poly_id"],
                "layer_id": p["layer_id"],
                "x0": int(p["cx"] - p["r"]),
                "x1": int(p["cx"] + p["r"]),
                "y0": int(p["cy"] - p["r"]),
                "y1": int(p["cy"] + p["r"]),
                "cx": int(p["cx"]),
                "cy": int(p["cy"]),
                "r": int(p["r"]),
            }
        )
    return out


def _part_boxes():
    part = read("part")
    out = []
    for k in part["p_partkey"]:
        k = int(k)
        h = 1 + k % 3
        cx = (k % 40) * 10 + 2
        cy = (k // 40 % 25) * 10 + 2
        out.append(
            {
                "b_id": k,
                "layer_id": k % 5,
                "x0": cx - h,
                "x1": cx + h,
                "y0": cy - h,
                "y1": cy + h,
                "cx": cx,
                "cy": cy,
                "h": h,
            }
        )
    return out


def test_bbox_intersect_join_matches_interval_definition(spark):
    got = _run(spark, "spatial_bbox_intersect_join")
    rows = [
        {"poly_id": a["a_id"], "box_id": b["b_id"]}
        for a in _sup_boxes()
        for b in _part_boxes()
        if a["layer_id"] == b["layer_id"]
        and a["x0"] <= b["x1"]
        and b["x0"] <= a["x1"]
        and a["y0"] <= b["y1"]
        and b["y0"] <= a["y1"]
    ]
    want = pd.DataFrame(rows, columns=["poly_id", "box_id"]).astype("int64")
    frames_equal(got, want)


def test_polygon_intersect_sat_matches_four_axis_definition(spark):
    """Diamond-vs-rectangle SAT: intersect iff the projection
    intervals overlap on ALL of x, y, x+y, x-y (closed). Also pin the
    strictly-stronger-than-bbox claim: at least one bbox pair must
    fail a diagonal axis on this fixture."""
    got = _run(spark, "spatial_polygon_intersect_join")
    rows, bbox_only = [], 0
    for a in _sup_boxes():
        ax, ay, r = a["cx"], a["cy"], a["r"]
        for b in _part_boxes():
            if a["layer_id"] != b["layer_id"]:
                continue
            bbox = (
                b["x0"] <= ax + r
                and ax - r <= b["x1"]
                and b["y0"] <= ay + r
                and ay - r <= b["y1"]
            )
            sat = (
                bbox
                and b["x0"] + b["y0"] <= ax + ay + r
                and ax + ay - r <= b["x1"] + b["y1"]
                and b["x0"] - b["y1"] <= ax - ay + r
                and ax - ay - r <= b["x1"] - b["y0"]
            )
            if sat:
                rows.append({"poly_id": a["a_id"], "box_id": b["b_id"]})
            elif bbox:
                bbox_only += 1
    want = pd.DataFrame(rows, columns=["poly_id", "box_id"]).astype("int64")
    frames_equal(got, want)


def _separated(p, q) -> bool:
    """True iff some edge of closed ring p has ALL vertices of q
    strictly outside (cross product < 0) -- the twin of the SQL's
    list_filter formulation."""
    for (ax, ay), (bx, by) in zip(p, p[1:]):
        if all(
            (bx - ax) * (vy - ay) - (by - ay) * (vx - ax) < 0 for vx, vy in q
        ):
            return True
    return False


def test_convex_sat_join_matches_generic_definition(spark):
    got = _run(spark, "spatial_convex_sat_join")
    dias = [
        (p["poly_id"], p["layer_id"], _diamond(int(p["cx"]), int(p["cy"]), int(p["r"])))
        for p in _polys()
    ]
    tris = []
    for b in _part_boxes():
        cx, cy, h = b["cx"], b["cy"], b["h"]
        tris.append(
            (
                b["b_id"],
                b["layer_id"],
                [(cx + h, cy), (cx - h, cy + h), (cx - h, cy - h), (cx + h, cy)],
            )
        )
    rows = [
        {"poly_id": pid, "tri_id": tid}
        for pid, pl, ra in dias
        for tid, tl, rb in tris
        if pl == tl and not _separated(ra, rb) and not _separated(rb, ra)
    ]
    want = pd.DataFrame(rows, columns=["poly_id", "tri_id"]).astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# PIP with holes: parity over ALL rings -- a hole-interior point has
# 2 crossings (even) and is correctly outside.
# ---------------------------------------------------------------------------


def _holes_pairs():
    pts = _points()
    sup = read("supplier")
    rows = []
    for s, nk in zip(sup["s_suppkey"], sup["s_nationkey"]):
        s, nk = int(s), int(nk)
        cx, cy = float((s % 40) * 10), float((s // 40) * 10)
        outer = _diamond(cx, cy, float(3 + s % 4))
        hole = _diamond(cx, cy, float(1 + s % 4))
        for p in pts:
            if p["layer_id"] != nk % 5:
                continue
            total = _crossings(outer, p["px"], p["py"]) + _crossings(
                hole, p["px"], p["py"]
            )
            if total % 2 == 1:
                rows.append({"point_id": p["point_id"], "poly_id": s})
    return rows


@pytest.mark.parametrize(
    "name", ["spatial_pip_holes_join", "spatial_pip_holes_join_grid"]
)
def test_pip_holes_strategies_match_all_ring_parity(spark, name):
    got = _run(spark, name)
    want = pd.DataFrame(
        _holes_pairs(), columns=["point_id", "poly_id"]
    ).astype("int64")
    frames_equal(got, want)


def test_holes_actually_subtract_on_this_fixture(spark):
    """The hole must DO something: some point contained by a
    supplier's outer diamond must be excluded by its hole -- i.e. the
    holes pair set is a strict subset of the outer-only pair set."""
    outer_only = {(p["point_id"], p["poly_id"]) for p in _pip_pairs()}
    with_holes = {(p["point_id"], p["poly_id"]) for p in _holes_pairs()}
    assert with_holes <= outer_only
    assert with_holes < outer_only, (
        "fixture too weak: no point falls inside any hole"
    )


# ---------------------------------------------------------------------------
# DBSCAN core points: the Ester et al. definition, O(n^2), self
# included, NO layer constraint.
# ---------------------------------------------------------------------------


def test_dbscan_core_matches_quadratic_definition(spark):
    got = _run(spark, "spatial_dbscan_core")
    pts = [(p["point_id"], int(p["px"]), int(p["py"])) for p in _points()]
    rows = []
    for pid, x, y in pts:
        n = sum(
            1 for _, bx, by in pts if (x - bx) ** 2 + (y - by) ** 2 <= 25
        )
        rows.append({"point_id": pid, "n_in_eps": n, "is_core": n >= 4})
    want = pd.DataFrame(rows)
    want["point_id"] = want["point_id"].astype("int64")
    want["n_in_eps"] = want["n_in_eps"].astype("int64")
    got = got.copy()
    got["is_core"] = got["is_core"].astype(bool).astype(str)
    want["is_core"] = want["is_core"].astype(bool).astype(str)
    frames_equal(got, want)
    # every point counts itself
    assert (want["n_in_eps"] >= 1).all()
