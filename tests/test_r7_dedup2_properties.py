"""Independent property tests for the advanced dedup family:
calibration/threshold/b-bit/agreement evals, the cap-loss report,
connected-component clustering (both iterative strategies),
representative selection, the lossless AllPairs prefix filter,
winnowing containment, incremental index probing, substring spans,
and SemDeDup -- all recomputed with python dict/set algorithms.

Highlights of what the recomputes prove that the twin pair cannot:
- the prefix filter is checked against the BRUTE-FORCE all-pairs
  threshold join (no prefix, no cap) -- the completeness theorem
  verified on the real fixture;
- both CC strategies (min-label and large/small-star) are checked
  against a plain union-find;
- the cap-loss report's pair arithmetic is checked against counts
  derived from actually materializing the pairs.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, read
from tests.test_r7_dedup_properties import (
    _docs_with_dups,
    _md5,
    _shingles,
    _signature,
    _toks,
)
from tests.test_r7_embedding_properties import _cos, _vecs
from tests.test_r7_text_properties import _winnow_fps


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


# --- shared LSH machinery (twin of the dedup batch's bucket build) ----------


def _band_buckets():
    """(band, key) -> [doc_ids] over the dup corpus, pre-cap."""
    d = _docs_with_dups()
    buckets: dict[tuple[int, str], list[int]] = {}
    sigs: dict[int, list] = {}
    for r in d.itertuples(index=False):
        sig = _signature(r.text)
        sigs[int(r.doc_id)] = sig
        if sig[0] is None:
            continue
        for b in range(4):
            key = _md5("|".join([sig[b * 2], sig[b * 2 + 1]]))
            buckets.setdefault((b, key), []).append(int(r.doc_id))
    return buckets, sigs


def _lsh_pairs_capped(buckets) -> set[tuple[int, int]]:
    pairs = set()
    for ids in buckets.values():
        if len(ids) > 16:
            continue
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if a != b:
                    pairs.add((min(a, b), max(a, b)))
    return pairs


def _distinct_shingle_sets():
    d = _docs_with_dups()
    return {
        int(r.doc_id): set(_shingles(_toks(r.text)))
        for r in d.itertuples(index=False)
    }


# ---------------------------------------------------------------------------
# Calibration / threshold histogram / b-bit / cap loss / agreement
# ---------------------------------------------------------------------------


def test_minhash_calibration_estimate_vs_exact(spark):
    got = _run(spark, "dedup_minhash_calibration")
    buckets, sigs = _band_buckets()
    pairs = _lsh_pairs_capped(buckets)
    sh = _distinct_shingle_sets()
    rows = []
    for a, b in sorted(pairs):
        est = sum(
            1
            for i in range(8)
            if sigs[a][i] is not None and sigs[a][i] == sigs[b][i]
        )
        inter = len(sh[a] & sh[b])
        rows.append(
            {
                "id_a": a,
                "id_b": b,
                "est_matches": est,
                "k": 8,
                "n_shared": inter,
                "n_a": len(sh[a]),
                "n_b": len(sh[b]),
            }
        )
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)


def test_threshold_sensitivity_histogram(spark):
    got = _run(spark, "dedup_threshold_sensitivity")
    buckets, sigs = _band_buckets()
    pairs = _lsh_pairs_capped(buckets)
    hist: dict[int, int] = {}
    for a, b in pairs:
        est = sum(1 for i in range(8) if sigs[a][i] == sigs[b][i])
        hist[est] = hist.get(est, 0) + 1
    want = pd.DataFrame(
        sorted(hist.items()), columns=["est_matches", "n_pairs"], dtype="int64"
    )
    frames_equal(got, want)
    # every LSH pair shares a full band -> est_matches >= 2 always
    assert want["est_matches"].min() >= 2


def test_cap_loss_report_width_arithmetic(spark):
    """The report claims pure width arithmetic equals materialized
    pair counts -- verify by actually materializing them."""
    got = _run(spark, "dedup_lsh_cap_loss_report")
    buckets, _ = _band_buckets()
    per_band: dict[int, dict] = {}
    for (band, _key), ids in buckets.items():
        st = per_band.setdefault(
            band,
            {"n_buckets": 0, "n_over_cap": 0, "max_width": 0, "kept": 0, "lost": 0},
        )
        w = len(ids)
        st["n_buckets"] += 1
        st["max_width"] = max(st["max_width"], w)
        n_pairs = len({(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]})
        assert n_pairs == w * (w - 1) // 2  # the arithmetic claim itself
        if w > 16:
            st["n_over_cap"] += 1
            st["lost"] += n_pairs
        else:
            st["kept"] += n_pairs
    rows = [
        {
            "band": b,
            "n_buckets": st["n_buckets"],
            "n_over_cap": st["n_over_cap"],
            "max_width": st["max_width"],
            "pairs_kept": st["kept"],
            "pairs_lost": st["lost"],
        }
        for b, st in sorted(per_band.items())
    ]
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)


def test_bbit_eval_li_koenig_estimator(spark):
    got = _run(spark, "dedup_minhash_bbit_eval")
    buckets, sigs = _band_buckets()
    pairs = _lsh_pairs_capped(buckets)
    sh = _distinct_shingle_sets()
    odd = set("13579bdf")
    rows = []
    for a, b in sorted(pairs):
        bits = sum(
            1
            for i in range(8)
            if (sigs[a][i][7] in odd) == (sigs[b][i][7] in odd)
        )
        inter = len(sh[a] & sh[b])
        union = len(sh[a]) + len(sh[b]) - inter
        rows.append(
            {
                "id_a": a,
                "id_b": b,
                "n_equal_bits": bits,
                "k": 8,
                "j_bbit_est": (2.0 * bits - 8) / 8,
                "j_exact": inter / union,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["id_a", "id_b", "n_equal_bits", "k"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


def test_pair_agreement_eval_summary(spark):
    got = _run(spark, "dedup_pair_agreement_eval")
    buckets, _ = _band_buckets()
    lsh = _lsh_pairs_capped(buckets)
    # exact side: DF-capped jaccard pairs (same recompute as
    # test_ngram_jaccard_pairs_with_df_cap)
    sh_all = _distinct_shingle_sets()
    df: dict[str, int] = {}
    for s in sh_all.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    kept = {g for g, c in df.items() if c <= 32}
    sh_capped = {i: s & kept for i, s in sh_all.items()}
    inv: dict[str, list[int]] = {}
    for i, s in sh_capped.items():
        for g in s:
            inv.setdefault(g, []).append(i)
    shared: dict[tuple[int, int], int] = {}
    for ids in inv.values():
        ids = sorted(ids)
        for x, a in enumerate(ids):
            for b in ids[x + 1 :]:
                shared[(a, b)] = shared.get((a, b), 0) + 1
    jac = {
        (a, b)
        for (a, b), ns in shared.items()
        if ns / (len(sh_capped[a]) + len(sh_capped[b]) - ns) >= 0.5
    }
    both = len(lsh & jac)
    assert len(got) == 1
    r = got.iloc[0]
    assert int(r["n_lsh"]) == len(lsh)
    assert int(r["n_exact"]) == len(jac)
    assert int(r["n_both"]) == both
    assert int(r["agree_vs_lsh_ppm"]) == 1_000_000 * both // len(lsh)
    assert int(r["agree_vs_exact_ppm"]) == 1_000_000 * both // len(jac)


# ---------------------------------------------------------------------------
# Connected components (both strategies) + representatives
# ---------------------------------------------------------------------------


def _union_find_components():
    buckets, _ = _band_buckets()
    pairs = _lsh_pairs_capped(buckets)
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in parent}


@pytest.mark.parametrize(
    "name", ["dedup_cluster_assign", "dedup_cluster_assign_lss"]
)
def test_cluster_assign_strategies_match_union_find(spark, name):
    got = _run(spark, name)
    comp = _union_find_components()
    want = pd.DataFrame(
        sorted(comp.items()), columns=["doc_id", "component"], dtype="int64"
    )
    frames_equal(got, want)
    # the synthesized twins must cluster: some component has >= 2 nodes
    assert len(set(comp.values())) < len(comp)


def test_keep_representatives_complement(spark):
    got = _run(spark, "dedup_keep_representatives")
    comp = _union_find_components()
    d = _docs_with_dups()
    keep = [
        int(i)
        for i in d["doc_id"]
        if int(i) not in comp or comp[int(i)] == int(i)
    ]
    want = pd.DataFrame({"doc_id": sorted(keep)}, dtype="int64")
    frames_equal(got, want)
    # kept = untouched + one representative per component
    n_comps = len(set(comp.values()))
    assert len(keep) == (len(d) - len(comp)) + n_comps


# ---------------------------------------------------------------------------
# AllPairs prefix filter vs BRUTE FORCE (the completeness theorem)
# ---------------------------------------------------------------------------


def test_prefix_filter_equals_brute_force_threshold_join(spark):
    got = _run(spark, "dedup_jaccard_prefix_filter")
    sh = _distinct_shingle_sets()
    ids = sorted(sh)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            union = len(sh[a]) + len(sh[b]) - inter
            if 100 * inter >= 60 * union:
                rows.append(
                    {
                        "id_a": a,
                        "id_b": b,
                        "inter_sh": inter,
                        "union_sh": union,
                        "jaccard": inter / union,
                    }
                )
    want = pd.DataFrame(rows, columns=["id_a", "id_b", "inter_sh", "union_sh", "jaccard"])
    for c in ["id_a", "id_b", "inter_sh", "union_sh"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    assert len(want) > 0


# ---------------------------------------------------------------------------
# Winnowing containment: asymmetric coverage of the smaller doc
# ---------------------------------------------------------------------------


def test_containment_pairs(spark):
    got = _run(spark, "dedup_containment")
    docs = read("documents")
    fps = {
        int(r.doc_id): _winnow_fps(r.text) for r in docs.itertuples(index=False)
    }
    n = {i: len(s) for i, s in fps.items()}
    df: dict[int, int] = {}
    for s in fps.values():
        for fp in s:
            df[fp] = df.get(fp, 0) + 1
    rare = {fp for fp, c in df.items() if c <= 50}
    capped = {i: s & rare for i, s in fps.items()}
    ids = sorted(capped)
    rows = []
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            shared = len(capped[a] & capped[b])
            if shared == 0:
                continue
            if 100 * shared >= 80 * min(n[a], n[b]):
                small_is_a = n[a] < n[b] or (n[a] == n[b] and a < b)
                rows.append(
                    {
                        "contained_id": a if small_is_a else b,
                        "container_id": b if small_is_a else a,
                        "shared_fp": shared,
                        "n_contained_fp": min(n[a], n[b]),
                    }
                )
    want = pd.DataFrame(
        rows,
        columns=["contained_id", "container_id", "shared_fp", "n_contained_fp"],
    ).astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Incremental index probing: new docs vs the pre-aggregated band index
# ---------------------------------------------------------------------------


def test_incremental_minhash_index_probe(spark):
    got = _run(spark, "dedup_incremental_minhash")
    docs = read("documents")
    sigs = {
        int(r.doc_id): _signature(r.text)
        for r in docs.itertuples(index=False)
    }

    def bandkeys(sig):
        out = []
        for b in range(4):
            parts = [s for s in (sig[b * 2], sig[b * 2 + 1]) if s is not None]
            out.append((b, _md5("|".join(parts))))
        return out

    idx: dict[tuple[int, str], list[int]] = {}
    for i, sig in sigs.items():
        if i % 10 != 7:
            for bk in bandkeys(sig):
                idx.setdefault(bk, []).append(i)
    rows = []
    for i, sig in sigs.items():
        if i % 10 != 7:
            continue
        hits = [idx[bk] for bk in bandkeys(sig) if bk in idx]
        if hits:
            rows.append(
                {
                    "doc_id": i,
                    "hit_bands": len(hits),
                    "n_index_docs": sum(len(h) for h in hits),
                    "first_match_id": min(min(h) for h in hits),
                }
            )
    want = pd.DataFrame(
        rows, columns=["doc_id", "hit_bands", "n_index_docs", "first_match_id"]
    ).astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Substring spans: corpus-wide duplicated-window coverage
# ---------------------------------------------------------------------------


def test_substring_spans_dup_ratio(spark):
    got = _run(spark, "dedup_substring_spans")
    docs = read("documents")
    N = 8
    doc_spans: dict[int, list[str]] = {}
    total: dict[str, int] = {}
    for r in docs.itertuples(index=False):
        toks = _toks(r.text)
        if len(toks) < N:
            continue
        spans = [
            _md5(" ".join(toks[i : i + N])) for i in range(len(toks) - N + 1)
        ]
        doc_spans[int(r.doc_id)] = spans
        for h in spans:
            total[h] = total.get(h, 0) + 1
    rows = []
    for i, spans in sorted(doc_spans.items()):
        n_dup = sum(1 for h in spans if total[h] >= 2)
        rows.append(
            {
                "doc_id": i,
                "n_spans": len(spans),
                "n_dup_spans": n_dup,
                "dup_ratio_ppm": 1_000_000 * n_dup // len(spans),
            }
        )
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# SemDeDup: cluster-then-prune with md5 centroids
# ---------------------------------------------------------------------------


def test_semantic_clusters_prune(spark):
    got = _run(spark, "dedup_semantic_clusters")
    vecs = _vecs()
    pri = sorted(
        vecs, key=lambda i: (hashlib.md5(f"cent:{i}".encode()).hexdigest(), i)
    )
    cents = {c: vecs[c] for c in pri[:16]}
    assign = {}
    for vid, v in vecs.items():
        best = sorted(
            ((_cos(v, cv), cid) for cid, cv in cents.items()),
            key=lambda t: (-t[0], t[1]),
        )[0][1]
        assign[vid] = best
    dominated = set()
    by_cell: dict[int, list[int]] = {}
    for vid, cell in assign.items():
        by_cell.setdefault(cell, []).append(vid)
    for cell, members in by_cell.items():
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                if _cos(vecs[a], vecs[b]) >= 0.35:
                    dominated.add(b)
    rows = [
        {"vec_id": vid, "cent_id": assign[vid], "keep": vid not in dominated}
        for vid in sorted(vecs)
    ]
    want = pd.DataFrame(rows)
    want["vec_id"] = want["vec_id"].astype("int64")
    want["cent_id"] = want["cent_id"].astype("int64")
    got = got.copy()
    got["keep"] = got["keep"].astype(bool).astype(str)
    want["keep"] = want["keep"].astype(bool).astype(str)
    frames_equal(got, want)
    # pruning must actually drop someone on this fixture
    assert len(dominated) > 0
