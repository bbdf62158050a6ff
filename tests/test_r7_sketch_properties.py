"""Independent property tests for the sketch family: Count-Min heavy
hitters, HLL merge-rollup and inclusion-exclusion intersection, Bloom
false-positive rate, and histogram quantile error -- every sketch
REBUILT in pure python from its md5 byte spec and compared cell-for-
cell / register-for-register against the engine output.

These extend the r6 layer's HLL distinct-eval reimplementation to the
remaining sketch queries: the merge-rollup identity (shard max-merge
== direct build) is itself re-proved in python, not just trusted.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, half_up, read
from tests.test_r7_dedup_properties import _md5, _norm, _toks


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


# ---------------------------------------------------------------------------
# Count-Min: d=4 x w=1024 sketch + top-20 readout
# ---------------------------------------------------------------------------

_CM_ROWS = [(1, 0), (31, 7), (131, 17), (1031, 29)]
_CM_P, _CM_W = 2147483647, 1024


def test_countmin_heavy_hitters(spark):
    got = _run(spark, "sketch_countmin_heavy_hitters")
    docs = read("documents")
    bigrams = []
    for t in docs["text"]:
        toks = _toks(t)
        bigrams.extend(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    sketch: dict[tuple[int, int], int] = {}
    keys = {}
    for bg in bigrams:
        k = keys.get(bg)
        if k is None:
            k = keys[bg] = int(_md5(bg)[:8], 16)
        for d, (a, b) in enumerate(_CM_ROWS):
            cell = (d, (a * k + b) % _CM_P % _CM_W)
            sketch[cell] = sketch.get(cell, 0) + 1
    est = {
        bg: min(
            sketch[(d, (a * k + b) % _CM_P % _CM_W)]
            for d, (a, b) in enumerate(_CM_ROWS)
        )
        for bg, k in keys.items()
    }
    top = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = pd.DataFrame(
        [
            {"bigram": bg, "estimate": e, "rank": i + 1}
            for i, (bg, e) in enumerate(top)
        ]
    )
    want["estimate"] = want["estimate"].astype("int64")
    want["rank"] = want["rank"].astype("int64")
    frames_equal(got, want)
    # CM law: estimate >= true count for every readout bigram
    true = {}
    for bg in bigrams:
        true[bg] = true.get(bg, 0) + 1
    assert all(est[bg] >= true[bg] for bg, _ in top)


# ---------------------------------------------------------------------------
# HLL: shared register construction from md5 hex digits
# ---------------------------------------------------------------------------

_HLL_M, _VBITS, _SHIFT = 64, 48, 49
_ALPHA = 0.7213 / (1 + 1.079 / 64)
_NUM = _ALPHA * 64 * 64 * float(2**49)


def _hll_reg_rho(key: str) -> tuple[int, int]:
    h = _md5(key)
    reg = (int(h[0], 16) * 16 + int(h[1], 16)) % _HLL_M
    v = int(h[2:14], 16)
    rho = _SHIFT if v == 0 else _SHIFT - v.bit_length()
    return reg, rho


def _z_int(regs: dict[int, int]) -> int:
    return sum(1 << (_SHIFT - m) for m in regs.values()) + (
        _HLL_M - len(regs)
    ) * (1 << _SHIFT)


def test_hll_merge_rollup_identity(spark):
    got = _run(spark, "sketch_hll_merge_rollup")
    ev = read("events")
    rows = []
    for et, grp in ev.groupby("event_type"):
        shard_regs: dict[str, dict[int, int]] = {}
        direct: dict[int, int] = {}
        for r in grp.itertuples(index=False):
            shard = r.ts.strftime("%Y-%m")
            reg, rho = _hll_reg_rho(str(int(r.user_id)))
            s = shard_regs.setdefault(shard, {})
            s[reg] = max(s.get(reg, 0), rho)
            direct[reg] = max(direct.get(reg, 0), rho)
        merged: dict[int, int] = {}
        for s in shard_regs.values():
            for reg, m in s.items():
                merged[reg] = max(merged.get(reg, 0), m)
        # the identity re-proved in python, not just read off the twin
        assert merged == direct
        rows.append(
            {
                "event_type": et,
                "n_shards": len(shard_regs),
                "n_regs_merged": len(merged),
                "n_regs_direct": len(direct),
                "est_merged": _NUM / float(_z_int(merged)),
                "est_direct": _NUM / float(_z_int(direct)),
                "registers_equal": 1,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["n_shards", "n_regs_merged", "n_regs_direct", "registers_equal"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


def test_hll_intersection_inclusion_exclusion(spark):
    got = _run(spark, "sketch_hll_intersection_eval")
    ev = read("events")
    users = {
        et: set(grp["user_id"].astype(int)) for et, grp in ev.groupby("event_type")
    }
    regs = {}
    for et, us in users.items():
        r: dict[int, int] = {}
        for u in us:
            reg, rho = _hll_reg_rho(str(u))
            r[reg] = max(r.get(reg, 0), rho)
        regs[et] = r
    rows = []
    for a, b in [("click", "purchase"), ("view", "click"), ("signup", "error")]:
        uni: dict[int, int] = dict(regs[a])
        for reg, m in regs[b].items():
            uni[reg] = max(uni.get(reg, 0), m)
        est = (
            _NUM / float(_z_int(regs[a]))
            + _NUM / float(_z_int(regs[b]))
            - _NUM / float(_z_int(uni))
        )
        rows.append(
            {
                "type_a": a,
                "type_b": b,
                "n_exact": len(users[a] & users[b]),
                "est_inter": est,
            }
        )
    want = pd.DataFrame(rows)
    want["n_exact"] = want["n_exact"].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Bloom FPR: 1024-bit filter, 3 md5-slice hashes
# ---------------------------------------------------------------------------


def test_bloom_fpr_realized(spark):
    got = _run(spark, "sketch_bloom_fpr_eval")
    docs = read("documents")
    fps = {
        int(r.doc_id): _md5(_norm(r.text)) for r in docs.itertuples(index=False)
    }
    members = {fp for i, fp in fps.items() if i % 2 == 0}
    probes = {fp for i, fp in fps.items() if i % 2 == 1} - members

    def positions(fp: str):
        h = _md5(fp)
        return [int(h[8 * j : 8 * j + 8], 16) % 1024 for j in range(3)]

    bits = {p for fp in members for p in positions(fp)}
    false_pos = sum(
        1 for fp in probes if all(p in bits for p in positions(fp))
    )
    assert len(got) == 1
    r = got.iloc[0]
    assert int(r["n_members"]) == len(members)
    assert int(r["n_bits_set"]) == len(bits)
    assert int(r["n_probes"]) == len(probes)
    assert int(r["n_false_pos"]) == false_pos
    assert int(r["fpr_ppm"]) == 1_000_000 * false_pos // len(probes)
    # theoretical sanity: realized FPR within 5x of (bits_set/1024)^3
    theo = (len(bits) / 1024) ** 3
    assert false_pos / len(probes) <= max(5 * theo, 0.05)


# ---------------------------------------------------------------------------
# Histogram quantile: 16-bin equi-width median estimate vs exact
# ---------------------------------------------------------------------------


def test_histogram_quantile_eval(spark):
    got = _run(spark, "sketch_histogram_quantile_eval")
    orders = read("orders").copy()
    orders["cents"] = half_up(orders["o_totalprice"], 2).to_numpy()
    B = 16
    rows = []
    for pri, grp in orders.groupby("o_orderpriority"):
        vals = sorted(int(c) for c in grp["cents"])
        n = len(vals)
        lo, hi = vals[0], vals[-1]
        width = hi - lo + 1
        hist: dict[int, int] = {}
        for c in vals:
            b = min(B - 1, (c - lo) * B // width)
            hist[b] = hist.get(b, 0) + 1
        target = (n + 1) // 2
        cum = 0
        med_bin = None
        for b in sorted(hist):
            cum += hist[b]
            if cum >= target:
                med_bin = b
                break
        est = lo + (med_bin + 1) * width // B
        exact = vals[target - 1]
        rows.append(
            {
                "o_orderpriority": pri,
                "n": n,
                "exact_med_cents": exact,
                "est_med_cents": est,
                "err_cents": abs(est - exact),
            }
        )
    want = pd.DataFrame(rows)
    for c in ["n", "exact_med_cents", "est_med_cents", "err_cents"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
