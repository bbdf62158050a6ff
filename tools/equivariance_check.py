"""Replication-equivariance check for graph queries on derived
fixtures (round 9).

make_scaled_fixture's key-shifted replication makes every copy an
ISOMORPHIC, DISCONNECTED subgraph (all join keys co-shift, so edges
never cross copies). That yields an exact engine-side oracle that
needs no DuckDB: per-node results grouped by copy (node DIV stride),
unshifted (node MOD stride), must be IDENTICAL multisets across all
copies; and for structure-LOCAL measures (k-core number, LPA
min-label, triangle counts, degrees) copy 0 must equal the engine's
own output on the UNREPLICATED base fixture. PageRank is equivariant
across copies but NOT equal to base (the teleport term (1-d)/N sees
the 10x node count), so it gets the cross-copy check only.

Why this exists: at x10 the iterative DuckDB oracles (k-core peel,
LPA rounds, PageRank fixed point as unrolled recursive CTEs) spill
hundreds of GB of temp and die on disk -- an ORACLE-cost limit, not
an engine one (the engine finishes each in well under two minutes).
This check keeps the x10 soak meaningful for the iterative graph
family: the equivariance property is exactly what replication is
supposed to preserve, so an engine bug that merges copies (the r8
cap-asymmetry class) or drops one breaks it loudly.

Usage: python tools/equivariance_check.py <derived_dir> <base_dir> <stride> [query ...]
Default queries: graph_kcore graph_label_propagation graph_pagerank
"""

from __future__ import annotations

import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

# query -> (id column, equal-to-base?, columns holding NODE-ID-valued
# results that must be unshifted per copy, e.g. LPA's min-label)
CHECKS = {
    "graph_kcore": ("node", True, ()),
    "graph_label_propagation": ("node", True, ("community",)),
    "graph_pagerank": ("node", False, ()),
    "graph_triangle_count": ("node", True, ()),
}


def main() -> int:
    derived = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0-derived"
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    stride = int(sys.argv[3]) if len(sys.argv) > 3 else 100000
    names = sys.argv[4:] or ["graph_kcore", "graph_label_propagation", "graph_pagerank"]

    from etl_building_inspector_spark.plans.registry import QUERIES
    from etl_building_inspector_spark.session import get_spark

    spark = get_spark("equivariance-check")
    n_fail = 0
    for name in names:
        id_col, eq_base, unshift_cols = CHECKS[name]
        rows = QUERIES[name](spark, derived).collect()
        cols = [c for c in rows[0].asDict() if c != id_col]
        per_copy: dict[int, Counter] = {}
        for r in rows:
            d = r.asDict()
            copy, local = d[id_col] // stride, d[id_col] % stride
            vals = tuple(
                (d[c] % stride if c in unshift_cols else d[c]) for c in cols
            )
            per_copy.setdefault(copy, Counter())[(local, vals)] += 1
        copies = sorted(per_copy)
        ok = all(per_copy[c] == per_copy[copies[0]] for c in copies[1:])
        msg = f"{len(copies)} copies identical" if ok else "COPIES DIVERGE"
        if not ok:
            n_fail += 1
            a, b = per_copy[copies[0]], per_copy[copies[1]]
            diff = list((a - b).items())[:3] + list((b - a).items())[:3]
            msg += f" e.g. {diff}"
        if ok and eq_base:
            base_rows = QUERIES[name](spark, base).collect()
            base_ms = Counter(
                (r.asDict()[id_col], tuple(r.asDict()[c] for c in cols))
                for r in base_rows
            )
            if base_ms != per_copy[copies[0]]:
                n_fail += 1
                msg += "; COPY-0 != BASE"
            else:
                msg += "; copy-0 == base output"
        print(f"{'PASS' if 'DIVERGE' not in msg and '!=' not in msg else 'FAIL'} "
              f"{name}: {len(rows)} rows, {msg}")
    print("ALL PASS" if n_fail == 0 else f"{n_fail} FAILURES")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
