"""Independent property tests for the round-9 additions (VERDICT r8
#6 discipline: every new query ships with an oracle twin AND a
python recompute in one commit):

- decontaminate_incremental_bloom: two-batch gram intersection with
  CASE priority base > delta, recomputed with python sets; plus the
  bloom MERGEABILITY pin (OR of per-batch blooms == bloom of the
  union set) that makes the incremental refresh sound.
- pack_bucketed_greedy: power-of-two bucketing + rank arithmetic
  recomputed with pandas; invariants (bin fill never exceeds budget
  for multi-doc bins, slots dense per bin).
- spatial_convex_contains_join: brute-force integer-geometry
  recompute over ALL layer-matched (diamond, triangle) pairs -- no
  grid filter -- plus containment ⊆ intersection vs the SAT join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, read
from tests.test_r7_dedup_properties import _shingles, _toks

MOD = 17  # DECON_BENCH_MOD
BUDGET = 256  # PACK_BUDGET


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


# ---------------------------------------------------------------------------
# Incremental bloom decontamination
# ---------------------------------------------------------------------------


def test_bloom_merge_is_union():
    """The incremental refresh is sound because per-batch blooms are
    mergeable: _bloom_build sets bits independently per element, so
    build(A) | build(B) must equal build(A ∪ B) bit-for-bit."""
    from etl_building_inspector_spark.operators.textops import _bloom_build

    rng = np.random.RandomState(7)
    a = rng.randint(-(2**62), 2**62, size=(400, 2)).astype(np.int64)
    b = rng.randint(-(2**62), 2**62, size=(300, 2)).astype(np.int64)
    nb, kh = 1 << 14, 5
    ba = _bloom_build(a[:, 0], a[:, 1], nb, kh)
    bb = _bloom_build(b[:, 0], b[:, 1], nb, kh)
    u = np.concatenate([a, b])
    bu = _bloom_build(u[:, 0], u[:, 1], nb, kh)
    assert np.array_equal(ba | bb, bu)
    # and a probe against the merged bloom finds every member of both
    from etl_building_inspector_spark.operators.textops import _bloom_positions

    p = _bloom_positions(u[:, 0], u[:, 1], nb, kh)
    merged = ba | bb
    assert (((merged[p >> 3] >> (p & 7).astype(np.uint8)) & 1).all(axis=1)).all()


def test_decontaminate_incremental_bloom_recompute(spark):
    got = _run(spark, "decontaminate_incremental_bloom")
    docs = read("documents")
    grams = {
        int(r.doc_id): set(_shingles(_toks(r.text), 4))
        for r in docs.itertuples(index=False)
    }
    base, delta = set(), set()
    for i, g in grams.items():
        if i % MOD == 0:
            (base if (i // MOD) % 2 == 0 else delta).update(g)
    rows = []
    for i, g in sorted(grams.items()):
        if i % MOD == 0:
            continue
        bh, dh = len(g & base), len(g & delta)
        status = "base" if bh > 0 else ("delta" if dh > 0 else "clean")
        rows.append(
            {
                "doc_id": i,
                "status": status,
                "n_hits": bh if bh > 0 else (dh if dh > 0 else 0),
            }
        )
    want = pd.DataFrame(rows)
    for c in ["doc_id", "n_hits"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    # the refresh must actually have something to find: docs clean
    # against the base suite but caught by the delta batch
    assert (want["status"] == "delta").any()
    assert (want["status"] == "base").any()


# ---------------------------------------------------------------------------
# Bucketed greedy packing
# ---------------------------------------------------------------------------


def _bucket(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def test_pack_bucketed_greedy_recompute(spark):
    got = _run(spark, "pack_bucketed_greedy")
    docs = read("documents")
    rows = []
    t = sorted(
        (str(r.source), _bucket(len(_toks(r.text))), int(r.doc_id), len(_toks(r.text)))
        for r in docs.itertuples(index=False)
    )
    rank: dict[tuple, int] = {}
    for source, bucket, doc_id, n in t:
        rk = rank.get((source, bucket), 0)
        rank[(source, bucket)] = rk + 1
        per_bin = max(1, BUDGET // bucket)
        rows.append(
            {
                "doc_id": doc_id,
                "source": source,
                "bucket": bucket,
                "n_tokens": n,
                "bin_seq": rk // per_bin,
                "slot": rk % per_bin,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["doc_id", "bucket", "n_tokens", "bin_seq", "slot"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    # invariant: a bin's padded capacity never exceeds the budget when
    # it holds more than one doc (per_bin >= 2 implies bucket*per_bin
    # <= budget), and slots are dense 0..k-1 within each bin
    g = want.groupby(["source", "bucket", "bin_seq"])
    for (_, bucket, _), grp in g:
        k = len(grp)
        if k > 1:
            assert bucket * k <= BUDGET
        assert sorted(grp["slot"]) == list(range(k))


# ---------------------------------------------------------------------------
# Convex containment join
# ---------------------------------------------------------------------------


def _diamond(s_suppkey: int) -> list[tuple[int, int]]:
    r = 3 + s_suppkey % 4
    cx, cy = (s_suppkey % 40) * 10, (s_suppkey // 40) * 10
    return [(cx + r, cy), (cx, cy + r), (cx - r, cy), (cx, cy - r), (cx + r, cy)]


def _triangle(p_partkey: int) -> list[tuple[int, int]]:
    h = 1 + p_partkey % 3
    cx, cy = (p_partkey % 40) * 10 + 2, (p_partkey // 40 % 25) * 10 + 2
    return [(cx + h, cy), (cx - h, cy + h), (cx - h, cy - h), (cx + h, cy)]


def _contains(outer, inner) -> bool:
    for i in range(len(outer) - 1):
        (ax, ay), (bx, by) = outer[i], outer[i + 1]
        for (vx, vy) in inner:
            if (bx - ax) * (vy - ay) - (by - ay) * (vx - ax) < 0:
                return False
    return True


def test_spatial_convex_contains_recompute(spark):
    got = _run(spark, "spatial_convex_contains_join")
    got_pairs = {
        (int(r.poly_id), int(r.tri_id)) for r in got.itertuples(index=False)
    }
    sup = read("supplier")
    part = read("part")
    want_pairs = set()
    # brute force: every layer-matched pair, no grid filter
    dias = [
        (int(r.s_suppkey), int(r.s_nationkey) % 5, _diamond(int(r.s_suppkey)))
        for r in sup.itertuples(index=False)
    ]
    tris = [
        (int(r.p_partkey), int(r.p_partkey) % 5, _triangle(int(r.p_partkey)))
        for r in part.itertuples(index=False)
    ]
    for sid, slayer, dring in dias:
        for pid, player, tring in tris:
            if slayer == player and _contains(dring, tring):
                want_pairs.add((sid, pid))
    assert got_pairs == want_pairs
    assert want_pairs, "fixture must contain at least one containment pair"


def test_containment_subset_of_intersection(spark):
    """A contained triangle always intersects, so the containment
    join's pairs must be a subset of the SAT intersection join's over
    the identical fixture geometry."""
    contains = {
        (int(r.poly_id), int(r.tri_id))
        for r in _run(spark, "spatial_convex_contains_join").itertuples(index=False)
    }
    intersects = {
        (int(r.poly_id), int(r.tri_id))
        for r in _run(spark, "spatial_convex_sat_join").itertuples(index=False)
    }
    assert contains <= intersects
