"""Derive a larger-scale soak fixture by key-shifted replication of
an existing read-only fixture (VERDICT r7 #4: one scale notch past
the sf0.1 soak, cheaply).

Each copy i>0 offsets every primary/foreign key by i*stride (stride =
a power of ten above the table's max key) so referential integrity is
preserved across copies, while every NON-key attribute repeats
verbatim -- deliberately: the r7 soak proved that hash-divergence
classes (engine-order-dependent window prefixes, unstable top-k,
argmin ties) surface only when scale CREATES ties, and replication is
the densest tie generator possible: every (sort-key, value) pair now
occurs >= factor times with distinct ids. A query that is
deterministic on this fixture is deterministic under duplication by
construction.

Timestamps, text, embeddings are copied as-is. event_id/doc_id/vec_id
are offset like keys so uniqueness invariants (dedup keep-first,
reservoir ids) stay well-defined. region/nation are dimensions shared
by all copies and are NOT replicated.

Usage: python tools/make_scaled_fixture.py [src_sf_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/sf0.3-derived 3
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq


# table -> columns to offset (primary + foreign keys). Offsets use a
# shared per-entity stride so FKs stay aligned: orders.o_custkey and
# customer.c_custkey shift by the same stride.
KEY_COLS: dict[str, list[tuple[str, str]]] = {
    "region": [],
    "nation": [],
    "customer": [("c_custkey", "cust")],
    "supplier": [("s_suppkey", "supp")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [
        ("l_orderkey", "order"),
        ("l_partkey", "part"),
        ("l_suppkey", "supp"),
    ],
    # events.user_id carries the SAME entity tag as customer.c_custkey
    # (ADVICE r8): queries_streaming.py joins events.user_id =
    # customer.c_custkey, so an independent 'user' stride (user_id max
    # 1499 -> 10000 vs c_custkey max 14999 -> 100000) made copy-1
    # events spuriously join copy-0 customers and copy-2 events
    # dangle. Sharing the 'cust' stride keeps the FK aligned per copy.
    "events": [("event_id", "event"), ("user_id", "cust")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "vec")],
}

TABLES = list(KEY_COLS)


def stride_above(n: int) -> int:
    s = 10
    while s <= n:
        s *= 10
    return s


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.3-derived"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    os.makedirs(dst, exist_ok=True)

    frames = {t: pq.read_table(f"{src}/{t}.parquet").to_pandas() for t in TABLES}

    # one stride per entity, global across tables so FKs stay aligned
    strides: dict[str, int] = {}
    for t, keys in KEY_COLS.items():
        for col, ent in keys:
            m = int(frames[t][col].max())
            strides[ent] = max(strides.get(ent, 0), stride_above(m))

    for t in TABLES:
        df = frames[t]
        keys = KEY_COLS[t]
        if not keys:  # shared dimension: single copy
            out = df
        else:
            copies = []
            for i in range(factor):
                c = df.copy()
                for col, ent in keys:
                    c[col] = c[col] + i * strides[ent]
                copies.append(c)
            import pandas as pd

            out = pd.concat(copies, ignore_index=True)
        out.to_parquet(f"{dst}/{t}.parquet", index=False)
        print(f"{t}: {len(df)} -> {len(out)} rows")
    print(f"wrote {dst} (factor={factor}, strides={strides})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
