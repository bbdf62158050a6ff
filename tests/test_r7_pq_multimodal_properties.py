"""Independent property tests for the PQ/ANN-eval and multimodal
families: PQ encode + ADC readout, recall evals (IVF and truncated-
dim), embedding decontamination, byte histograms, image aHash pairs,
and video shot cuts -- each recomputed in python/numpy-free loops.

The aHash recompute rebuilds the Arrow kernel's bit algebra from the
byte spec (pixel*64 > total, two 32-bit halves) and re-proves the
4-band pigeonhole losslessness by comparing against the O(n^2)
threshold join.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, read
from tests.test_r7_dedup_properties import _md5
from tests.test_r7_embedding_properties import _cos, _dot, _hyperplane, _vecs


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


# ---------------------------------------------------------------------------
# Product quantization: encode and ADC top-k
# ---------------------------------------------------------------------------


def _pq_encode():
    """vec_id -> (codes[8], recon[64]) via the md5-sampled codebook."""
    vecs = _vecs()
    pri = sorted(
        vecs, key=lambda i: (hashlib.md5(f"pq:{i}".encode()).hexdigest(), i)
    )
    samp = {code: vecs[vid] for code, vid in enumerate(pri[:16], start=1)}
    codes = {}
    recon = {}
    for vid, v in vecs.items():
        cs, rs = [], []
        for sub in range(8):
            sv = v[sub * 8 : sub * 8 + 8]
            best = None
            for code, cw_full in samp.items():
                cw = cw_full[sub * 8 : sub * 8 + 8]
                d2 = 0.0
                for a, b in zip(sv, cw):
                    d2 += (a - b) * (a - b)
                if best is None or (d2, code) < best[:2]:
                    best = (d2, code, cw)
            cs.append(best[1])
            rs.extend(best[2])
        codes[vid] = cs
        recon[vid] = rs
    return codes, recon


def test_emb_pq_encode_codes(spark):
    got = _run(spark, "emb_pq_encode")
    codes, _ = _pq_encode()
    rows = [
        {"vec_id": vid, "sub_id": sub, "code": c}
        for vid, cs in sorted(codes.items())
        for sub, c in enumerate(cs)
    ]
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)
    # every code is one of the 16 sampled codewords
    assert got["code"].between(1, 16).all()


def test_ann_pq_adc_topk(spark):
    got = _run(spark, "ann_cosine_pq_adc")
    vecs = _vecs()
    _, recon = _pq_encode()
    rows = []
    for q in sorted(vecs):
        if q >= 10:
            continue
        sims = []
        for c in sorted(vecs):
            if c == q:
                continue
            sims.append((_cos(vecs[q], recon[c]), c))
        sims.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, c) in enumerate(sims[:5], start=1):
            rows.append(
                {
                    "query_id": q,
                    "neighbor_id": c,
                    "adc_cosine": cos,
                    "rank": rank,
                }
            )
    want = pd.DataFrame(rows)
    for c in ["query_id", "neighbor_id", "rank"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Recall evals: IVF vs brute force; truncated-dim vs full-dim
# ---------------------------------------------------------------------------


def _topk_by_cos(vecs, queries, k, dims=None):
    out = {}
    for q in queries:
        qv = vecs[q] if dims is None else vecs[q][:dims]
        sims = []
        for c in sorted(vecs):
            if c == q:
                continue
            cv = vecs[c] if dims is None else vecs[c][:dims]
            sims.append((_cos(qv, cv), c))
        sims.sort(key=lambda t: (-t[0], t[1]))
        out[q] = [c for _, c in sims[:k]]
    return out


def test_ann_recall_eval(spark):
    got = _run(spark, "ann_recall_eval")
    vecs = _vecs()
    queries = [q for q in sorted(vecs) if q < 10]
    brute = _topk_by_cos(vecs, queries, 5)
    # IVF-sampled side: reuse the already-pinned construction
    pri = sorted(
        vecs, key=lambda i: (hashlib.md5(f"cent:{i}".encode()).hexdigest(), i)
    )
    cents = {c: vecs[c] for c in pri[:16]}

    def rank_cents(v):
        return sorted(
            ((_cos(v, cv), cid) for cid, cv in cents.items()),
            key=lambda t: (-t[0], t[1]),
        )

    assign = {vid: rank_cents(v)[0][1] for vid, v in vecs.items()}
    rows = []
    for q in queries:
        probes = {cid for _, cid in rank_cents(vecs[q])[:6]}
        cand = {c for c, cell in assign.items() if cell in probes and c != q}
        sims = sorted(
            ((_cos(vecs[q], vecs[c]), c) for c in cand),
            key=lambda t: (-t[0], t[1]),
        )
        ivf = {c for _, c in sims[:5]}
        matched = len(set(brute[q]) & ivf)
        rows.append(
            {
                "query_id": q,
                "k": 5,
                "n_matched": matched,
                "recall": matched / 5,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["query_id", "k", "n_matched"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


def test_ann_truncated_dim_recall_eval(spark):
    got = _run(spark, "ann_truncated_dim_recall_eval")
    vecs = _vecs()
    queries = [q for q in sorted(vecs) if q < 10]
    full = _topk_by_cos(vecs, queries, 5)
    trunc = _topk_by_cos(vecs, queries, 5, dims=16)
    rows = []
    for q in queries:
        matched = len(set(full[q]) & set(trunc[q]))
        rows.append(
            {"query_id": q, "k": 5, "n_matched": matched, "recall": matched / 5}
        )
    want = pd.DataFrame(rows)
    for c in ["query_id", "k", "n_matched"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Embedding decontamination: LSH candidates + exact cosine confirm
# ---------------------------------------------------------------------------


def test_decontaminate_embedding_lsh(spark):
    got = _run(spark, "decontaminate_embedding_lsh")
    vecs = _vecs()
    bench = {i: v for i, v in vecs.items() if i % 20 == 0}
    corpus = {i: v for i, v in vecs.items() if i % 20 != 0}
    for i, v in vecs.items():
        if i % 40 == 0:
            corpus[i + 200000] = [
                x * (1 + 0.01 * ((j % 5) - 2)) for j, x in enumerate(v)
            ]
    planes = {
        (t, p): _hyperplane(64, t * 8 + p) for t in range(6) for p in range(8)
    }

    def buckets(vs):
        out = {}
        for vid, v in vs.items():
            for t in range(6):
                b = 0
                for p in range(8):
                    if _dot(v, planes[(t, p)]) > 0:
                        b += 2**p
                out[(vid, t)] = b
        return out

    cb, bb = buckets(corpus), buckets(bench)
    cand = set()
    for (cv, t), b in cb.items():
        for bv in bench:
            if bb[(bv, t)] == b:
                cand.add((cv, bv))
    rows = {}
    for cv, bv in cand:
        cos = _cos(corpus[cv], bench[bv])
        if cos >= 0.95:
            cur = rows.get(cv)
            if cur is None or (-cos, bv) < (-cur[1], cur[0]):
                rows[cv] = (bv, cos)
    want = pd.DataFrame(
        [
            {"corpus_id": cv, "bench_id": bv, "cosine": cos}
            for cv, (bv, cos) in sorted(rows.items())
        ],
        columns=["corpus_id", "bench_id", "cosine"],
    )
    want["corpus_id"] = want["corpus_id"].astype("int64")
    want["bench_id"] = want["bench_id"].astype("int64")
    frames_equal(got, want)
    # the planted contamination (vec+200000 vs its bench source) is found
    planted = {cv for cv in rows if cv >= 200000}
    assert planted, "no planted contaminated vector detected"


# ---------------------------------------------------------------------------
# Multimodal: byte histogram / aHash pairs / shot cuts
# ---------------------------------------------------------------------------


def test_multimodal_byte_histogram(spark):
    got = _run(spark, "multimodal_byte_histogram")
    docs = read("documents")
    rows = []
    for r in docs.itertuples(index=False):
        if not all(0x20 <= ord(c) <= 0x7E for c in r.text):
            continue
        bins = [0] * 16
        for c in r.text:
            bins[ord(c) // 16] += 1
        rows.append(
            {
                "doc_id": int(r.doc_id),
                "n_bytes": len(r.text),
                **{f"h{b}": bins[b] for b in range(16)},
            }
        )
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)
    # histogram partition law
    hcols = [f"h{b}" for b in range(16)]
    assert (want[hcols].sum(axis=1) == want["n_bytes"]).all()


def _ahash(payload: str) -> tuple[int, int]:
    px = [ord(c) for c in payload[:64]]
    total = sum(px)
    lo = sum(1 << i for i in range(32) if px[i] * 64 > total)
    hi = sum(1 << (i - 32) for i in range(32, 64) if px[i] * 64 > total)
    return lo, hi


def test_multimodal_image_ahash_pairs(spark):
    got = _run(spark, "multimodal_image_ahash_pairs")
    part = read("part")
    imgs = {}
    for k in part["p_partkey"].astype(int):
        payload = _md5(str(k)) * 2
        imgs[k] = payload
        if k % 10 == 0:
            pos = k % 64
            ch = "a" if payload[pos] == "z" else "z"
            imgs[-k] = payload[:pos] + ch + payload[pos + 1 :]
    hashes = {k: _ahash(p) for k, p in imgs.items()}
    rows = []
    keys = sorted(hashes)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            ham = bin(hashes[a][0] ^ hashes[b][0]).count("1") + bin(
                hashes[a][1] ^ hashes[b][1]
            ).count("1")
            if ham <= 3:
                rows.append({"key_a": a, "key_b": b, "hamming": ham})
    want = pd.DataFrame(rows, columns=["key_a", "key_b", "hamming"]).astype(
        "int64"
    )
    frames_equal(got, want)
    # the planted one-pixel twins dominate the pair set
    assert any(a == -b or b == -a for a, b, _ in want.itertuples(index=False))


def test_multimodal_video_shot_cuts(spark):
    got = _run(spark, "multimodal_video_shot_cuts")
    sup = read("supplier")
    rows = []
    for s in sup["s_suppkey"].astype(int):
        payload = _md5(str(s)) * 4
        n_frames = (s % 5 + 1) * 3000 // 1000
        energies = []
        for idx in range(n_frames):
            fh = _md5(f"{payload}@{idx * 1000}").upper()
            # energy hashes the HEX STRING again (md5(frame_hex))
            energies.append(int(_md5(fh)[:8], 16) % 1000)
        shot, agg = 0, {}
        prev = None
        for idx, e in enumerate(energies):
            if prev is None or abs(e - prev) > 400:
                shot += 1
            prev = e
            a = agg.setdefault(shot, [idx, idx, 0, e, e])
            a[1] = idx
            a[2] += 1
            a[3] = min(a[3], e)
            a[4] = max(a[4], e)
        for sh, (f0, f1, n, lo, hi) in agg.items():
            rows.append(
                {
                    "key": s,
                    "shot_id": sh,
                    "first_frame": f0,
                    "last_frame": f1,
                    "n_frames": n,
                    "min_energy": lo,
                    "max_energy": hi,
                }
            )
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)
    # segmentation law: shots tile the frame range with no overlap
    for key, grp in want.groupby("key"):
        grp = grp.sort_values("shot_id")
        assert grp["first_frame"].iloc[0] == 0
        for i in range(1, len(grp)):
            assert (
                grp["first_frame"].iloc[i] == grp["last_frame"].iloc[i - 1] + 1
            )
