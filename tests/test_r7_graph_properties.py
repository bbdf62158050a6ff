"""Independent property tests for the graph family: triangle count,
synchronous LPA, k-core peeling, capped-wedge link prediction,
bounded BFS and Bellman-Ford SSSP -- each recomputed with plain
python dict/set algorithms over the raw parquet.

The Spark operators use degree-oriented wedges (Schank-Wagner),
frontier delta iteration, and hub-capped joins; these recomputes are
the textbook definitions (ordered-triple enumeration, synchronous
label rounds, literal peel rounds, bounded relaxation), so they prove
the scalable rewrites result-identical.

BFS/SSSP run over the MinHash-LSH near-dup pair graph -- the python
twin of that construction lives in tests/test_r7_dedup_properties.py
and is reused here, so the graph tests inherit an already-pinned
edge set.
"""

from __future__ import annotations

import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, read
from tests.test_r7_dedup_properties import (
    _docs_with_dups,
    _md5,
    _signature,
)


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


# --- co-purchase graph twin --------------------------------------------------


def _e0():
    """Distinct undirected co-purchase edges (u < v): parts sharing an
    order."""
    li = read("lineitem")[["l_orderkey", "l_partkey"]]
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(int(p) for p in grp["l_partkey"]))
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                edges.add((a, b))
    return edges


def _adj(edges):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


# --- MinHash-LSH pair graph twin (reusing the dedup recompute) ---------------


def _lsh_pairs() -> set[tuple[int, int]]:
    d = _docs_with_dups()
    buckets: dict[tuple[int, str], list[int]] = {}
    for r in d.itertuples(index=False):
        sig = _signature(r.text)
        if sig[0] is None:
            continue
        for b in range(4):
            key = _md5("|".join([sig[b * 2], sig[b * 2 + 1]]))
            buckets.setdefault((b, key), []).append(int(r.doc_id))
    pairs = set()
    for ids in buckets.values():
        if len(ids) > 16:
            continue
        for i, a in enumerate(ids):
            for bb in ids[i + 1 :]:
                if a != bb:
                    pairs.add((min(a, bb), max(a, bb)))
    return pairs


# ---------------------------------------------------------------------------
# Triangle count: ordered-triple enumeration
# ---------------------------------------------------------------------------


def test_triangle_count_matches_ordered_triple_enumeration(spark):
    got = _run(spark, "graph_triangle_count")
    edges = _e0()
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)  # ordered: u < v only
    n = 0
    for u, v in edges:
        for w in adj.get(v, ()):  # v < w
            if w in adj.get(u, ()):
                n += 1
    assert len(got) == 1
    assert int(got["n_triangles"].iloc[0]) == n
    assert n > 0, "fixture too weak: no triangles"


# ---------------------------------------------------------------------------
# Synchronous label propagation: 2 deterministic rounds
# ---------------------------------------------------------------------------


def test_label_propagation_two_synchronous_rounds(spark):
    got = _run(spark, "graph_label_propagation")
    adj = _adj(_e0())
    labels = {n: n for n in adj}
    for _ in range(2):
        nxt = {}
        for node in adj:
            freq: dict[int, int] = {}
            for nb in adj[node]:
                lab = labels[nb]
                freq[lab] = freq.get(lab, 0) + 1
            if freq:
                # most frequent, smallest label on ties
                nxt[node] = min(freq, key=lambda l: (-freq[l], l))
            else:
                nxt[node] = labels[node]
        labels = nxt
    want = pd.DataFrame(
        sorted(labels.items()), columns=["node", "community"], dtype="int64"
    )
    frames_equal(got, want)
    # propagation must actually coalesce labels on this fixture
    assert len(set(labels.values())) < len(labels)


# ---------------------------------------------------------------------------
# k-core peeling: 3 literal rounds at k=60
# ---------------------------------------------------------------------------


def test_kcore_three_peel_rounds(spark):
    got = _run(spark, "graph_kcore")
    K = 60
    # directed symmetric edge list, exactly as the query iterates
    sym = set()
    for u, v in _e0():
        sym.add((u, v))
        sym.add((v, u))
    for _ in range(3):
        deg: dict[int, int] = {}
        for s, _d in sym:
            deg[s] = deg.get(s, 0) + 1
        keep = {n for n, c in deg.items() if c >= K}
        sym = {(s, d) for s, d in sym if s in keep and d in keep}
    deg = {}
    for s, _d in sym:
        deg[s] = deg.get(s, 0) + 1
    want = pd.DataFrame(
        sorted(deg.items()), columns=["node", "core_degree"], dtype="int64"
    )
    frames_equal(got, want)
    # peeling must drop someone, and survivors meet the bar
    assert (want["core_degree"] >= K).all() or len(want) == 0


# ---------------------------------------------------------------------------
# Link prediction: capped-middle wedges, raw count and jaccard variants
# ---------------------------------------------------------------------------


def _capped_wedge_counts(cap: int = 100):
    edges = _e0()
    adj = _adj(edges)
    deg = {n: len(a) for n, a in adj.items()}
    mid = {n for n, d in deg.items() if d <= cap}
    common: dict[tuple[int, int], int] = {}
    for m in mid:
        nbrs = sorted(adj[m])
        for i, u in enumerate(nbrs):
            for v in nbrs[i + 1 :]:
                common[(u, v)] = common.get((u, v), 0) + 1
    # drop adjacent pairs
    cand = {p: c for p, c in common.items() if p not in edges}
    return cand, deg


def test_common_neighbors_topk_capped_wedges(spark):
    got = _run(spark, "graph_common_neighbors_topk")
    cand, _ = _capped_wedge_counts()
    per_u: dict[int, list[tuple[int, int]]] = {}
    for (u, v), c in cand.items():
        per_u.setdefault(u, []).append((c, v))
    rows = []
    for u, lst in per_u.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for rk, (c, v) in enumerate(lst[:5], start=1):
            rows.append({"node": u, "candidate": v, "common": c, "rk": rk})
    want = pd.DataFrame(
        rows, columns=["node", "candidate", "common", "rk"]
    ).astype("int64")
    frames_equal(got, want)


def test_neighbor_jaccard_topk_uses_full_degrees(spark):
    got = _run(spark, "graph_neighbor_jaccard_topk")
    cand, deg = _capped_wedge_counts()
    per_u: dict[int, list] = {}
    for (u, v), c in cand.items():
        j = c / (deg[u] + deg[v] - c)
        per_u.setdefault(u, []).append((j, v, c))
    rows = []
    for u, lst in per_u.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for rk, (j, v, c) in enumerate(lst[:5], start=1):
            rows.append(
                {
                    "node": u,
                    "candidate": v,
                    "common": c,
                    "deg_u": deg[u],
                    "deg_v": deg[v],
                    "jaccard": j,
                    "rk": rk,
                }
            )
    want = pd.DataFrame(
        rows,
        columns=["node", "candidate", "common", "deg_u", "deg_v", "jaccard", "rk"],
    )
    for c in ["node", "candidate", "common", "deg_u", "deg_v", "rk"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Bounded BFS / SSSP over the near-dup pair graph: textbook bounded
# relaxation vs the frontier delta iteration
# ---------------------------------------------------------------------------


def _seeds():
    d = _docs_with_dups()
    return sorted(set(int(i) for i in d["doc_id"] if i % 50 == 0))


def _bounded_relax(weights: dict[tuple[int, int], int], rounds: int):
    """dist_k[v] = min over walks of <= k edges from any seed --
    exactly the recursive-CTE min the oracle computes."""
    sym: dict[int, list[tuple[int, int]]] = {}
    for (a, b), w in weights.items():
        sym.setdefault(a, []).append((b, w))
        sym.setdefault(b, []).append((a, w))
    dist = {s: 0 for s in _seeds()}
    for _ in range(rounds):
        nxt = dict(dist)
        for u, du in dist.items():
            for v, w in sym.get(u, ()):
                if du + w < nxt.get(v, float("inf")):
                    nxt[v] = du + w
        dist = nxt
    return dist


def test_bfs_hops_matches_bounded_relaxation(spark):
    got = _run(spark, "graph_bfs_hops")
    weights = {p: 1 for p in _lsh_pairs()}
    dist = _bounded_relax(weights, 3)
    want = pd.DataFrame(
        sorted(dist.items()), columns=["doc_id", "hops"], dtype="int64"
    )
    frames_equal(got, want)
    # some non-seed node must be reached, else the graph part is moot
    assert (want["hops"] > 0).any()


def test_sssp_bounded_matches_bellman_ford_rounds(spark):
    got = _run(spark, "graph_sssp_bounded")
    weights = {(a, b): 1 + (a + b) % 5 for a, b in _lsh_pairs()}
    dist = _bounded_relax(weights, 3)
    want = pd.DataFrame(
        sorted(dist.items()), columns=["doc_id", "dist"], dtype="int64"
    )
    frames_equal(got, want)
    # weighted distances must differ from hop counts somewhere
    hops = _bounded_relax({p: 1 for p in weights}, 3)
    assert any(dist[n] != hops[n] for n in dist)
