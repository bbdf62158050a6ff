"""Independent property tests for the lakehouse/ops family: zonemap
file skipping, z-order buckets, compaction planning, copy-on-write
MERGE file plans, provenance, skew/balance/explosion audits, the DQ
constraint battery, retraction-stream aggregation, and join-view IVM
-- each recomputed from raw parquet in python.

The IVM test recomputes the MONOLITHIC join aggregate; the engine
runs the four-way delta merge -- equality is the delta identity
V(A u dA, B u dB) = merge of the four partials, proved on real data.
"""

from __future__ import annotations

import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, half_up, read
from tests.test_r7_dedup_properties import _md5


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


# ---------------------------------------------------------------------------
# Zonemap skipping: arrival vs clustered layouts
# ---------------------------------------------------------------------------


def test_file_skipping_effectiveness(spark):
    got = _run(spark, "file_skipping_effectiveness")
    orders = read("orders")
    preds = [
        ("1993", "1993-01-01", "1994-01-01"),
        ("1995h1", "1995-01-01", "1995-07-01"),
        ("1997", "1997-01-01", "1998-01-01"),
        ("old", "1992-01-01", "1992-04-01"),
    ]
    rows = []
    for layout, cols in (
        ("arrival", ["o_orderkey"]),
        ("clustered", ["o_orderdate", "o_orderkey"]),
    ):
        o = orders.sort_values(cols).reset_index(drop=True)
        o["file_id"] = o.index // 512
        zm = o.groupby("file_id")["o_orderdate"].agg(["min", "max", "size"])
        for pid, lo, hi in preds:
            lo_t, hi_t = pd.Timestamp(lo), pd.Timestamp(hi)
            pruned = ((zm["max"] < lo_t) | (zm["min"] >= hi_t)).sum()
            scanned = int(
                zm.loc[~((zm["max"] < lo_t) | (zm["min"] >= hi_t)), "size"].sum()
            )
            rows.append(
                {
                    "layout": layout,
                    "pred_id": pid,
                    "n_files": len(zm),
                    "n_pruned": int(pruned),
                    "n_rows_scanned": scanned,
                }
            )
    want = pd.DataFrame(rows)
    for c in ["n_files", "n_pruned", "n_rows_scanned"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    # the clustered layout must prune at least as much, per predicate
    g = want.set_index(["layout", "pred_id"])
    for pid, _, _ in preds:
        assert (
            g.loc[("clustered", pid), "n_pruned"]
            >= g.loc[("arrival", pid), "n_pruned"]
        )


def test_zorder_bucket_stats(spark):
    got = _run(spark, "zorder_bucket_stats")
    li = read("lineitem")
    stats: dict[int, list] = {}
    for pk, sk in zip(li["l_partkey"].astype(int), li["l_suppkey"].astype(int)):
        x, y = pk % 1024, sk % 1024
        z = 0
        for i in range(10):
            z += ((x >> i) & 1) << (2 * i)
            z += ((y >> i) & 1) << (2 * i + 1)
        b = z >> 14
        st = stats.setdefault(b, [0, x, x, y, y])
        st[0] += 1
        st[1] = min(st[1], x)
        st[2] = max(st[2], x)
        st[3] = min(st[3], y)
        st[4] = max(st[4], y)
    rows = [
        {
            "z_bucket": b,
            "n_rows": st[0],
            "x_min": st[1],
            "x_max": st[2],
            "y_min": st[3],
            "y_max": st[4],
        }
        for b, st in sorted(stats.items())
    ]
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)
    # z-locality law: each bucket's x/y spans are narrow (<= 1024/4)
    assert ((want["x_max"] - want["x_min"]) <= 256).all()
    assert ((want["y_max"] - want["y_min"]) <= 256).all()


# ---------------------------------------------------------------------------
# Compaction plan / COW merge plan / provenance
# ---------------------------------------------------------------------------


def test_compaction_bin_plan(spark):
    got = _run(spark, "compaction_bin_plan")
    li = read("lineitem").copy()
    li["month"] = li["l_shipdate"].dt.strftime("%Y-%m")
    li["day"] = li["l_shipdate"].dt.normalize()
    files = (
        li.groupby(["month", "day"]).size().mul(100).rename("bytes").reset_index()
    )
    rows = []
    for month, grp in files.groupby("month"):
        grp = grp.sort_values("day")
        cum = 0
        bins: dict[int, list[int]] = {}
        for b in grp["bytes"]:
            bin_id = cum // 65536
            st = bins.setdefault(bin_id, [0, 0])
            st[0] += 1
            st[1] += int(b)
            cum += int(b)
        for bin_id, (n, tot) in bins.items():
            rows.append(
                {
                    "part_month": month,
                    "bin": bin_id,
                    "files_merged": n,
                    "bin_bytes": tot,
                }
            )
    want = pd.DataFrame(rows)
    for c in ["bin", "files_merged", "bin_bytes"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


def test_merge_on_files_cow_plan(spark):
    got = _run(spark, "merge_on_files_cow")
    orders = read("orders")
    keys = orders["o_orderkey"].astype(int)
    upd = set(k for k in keys if k % 97 == 0)
    n_ins = sum(1 for k in keys if k % 499 == 0)
    per_file: dict[int, list[int]] = {}
    for k in keys:
        st = per_file.setdefault(k // 4096, [0, 0])
        st[0] += 1
        if k in upd:
            st[1] += 1
    rows = [
        {
            "file_id": f,
            "n_rows_before": n,
            "n_matched": m,
            "action": "rewrite" if m > 0 else "keep",
            "n_rows_after": n,
        }
        for f, (n, m) in sorted(per_file.items())
    ]
    rows.append(
        {
            "file_id": -1,
            "n_rows_before": 0,
            "n_matched": 0,
            "action": "append",
            "n_rows_after": n_ins,
        }
    )
    want = pd.DataFrame(rows)
    for c in ["file_id", "n_rows_before", "n_matched", "n_rows_after"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    # plan algebra (scale-independent; "some file stays keep" is NOT
    # -- a 4096-key file almost always contains a key % 97 == 0 once
    # the table spans several files): rewrite iff matched, exactly
    # one append row, and base rows are conserved
    g = got.set_index("file_id")
    assert ((g["action"] == "rewrite") == (g["n_matched"] > 0)).all()
    assert (got["action"] == "append").sum() == 1
    assert (
        got.loc[got["action"] != "append", "n_rows_before"].sum()
        == len(orders)
    )


def test_provenance_file_counts(spark):
    got = _run(spark, "provenance_file_counts")
    orders = read("orders")
    assert len(got) == 1
    r = got.iloc[0]
    assert r["file_name"] == "orders.parquet"
    assert int(r["n_rows"]) == len(orders)
    assert int(r["n_customers"]) == orders["o_custkey"].nunique()


# ---------------------------------------------------------------------------
# Skew / balance / explosion audits
# ---------------------------------------------------------------------------


def test_skew_key_diagnostics(spark):
    got = _run(spark, "skew_key_diagnostics")
    li = read("lineitem")
    freq = li["l_suppkey"].value_counts()
    total, nkeys = len(li), len(freq)
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = [
        {
            "key": int(k),
            "n": int(n),
            "ppm": int(n) * 1_000_000 // total,
            "skew_pct_of_avg": int(n) * nkeys * 100 // total,
        }
        for k, n in top
    ]
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)


def test_shuffle_partition_balance_report(spark):
    got = _run(spark, "shuffle_partition_balance_report")
    li = read("lineitem")
    counts: dict[int, int] = {}
    for k in li["l_orderkey"].astype(int):
        b = int(_md5(f"shuffle:{k}")[:8], 16) % 32
        counts[b] = counts.get(b, 0) + 1
    total = len(li)
    rows = [
        {
            "bucket": b,
            "n_rows": n,
            "load_ppm": n * 32 * 1_000_000 // total,
        }
        for b, n in sorted(counts.items())
    ]
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)
    # md5 bucketing must be roughly balanced on this uniform key
    assert want["load_ppm"].max() < 2_000_000


def test_join_explosion_audit(spark):
    got = _run(spark, "join_explosion_audit")
    li = read("lineitem")
    freq = li["l_partkey"].value_counts()
    scored = sorted(
        ((int(n) * (int(n) - 1) // 2, int(k), int(n)) for k, n in freq.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    want = pd.DataFrame(
        [
            {"partkey": k, "n_rows": n, "n_self_pairs": p}
            for p, k, n in scored
        ]
    ).astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# DQ constraint battery: zero-violation rows still present
# ---------------------------------------------------------------------------


def test_dq_constraint_checks(spark):
    got = _run(spark, "dq_constraint_checks")
    li, orders = read("lineitem"), read("orders")
    cust, nation = read("customer"), read("nation")
    okeys = set(orders["o_orderkey"])
    lkeys = set(li["l_orderkey"])
    dup = orders["o_orderkey"].value_counts()
    checks = {
        "lineitem_orphan_orderkey": int((~li["l_orderkey"].isin(okeys)).sum()),
        "orders_without_lineitems": int(
            (~orders["o_orderkey"].isin(lkeys)).sum()
        ),
        "duplicate_orderkeys": int((dup[dup > 1] - 1).sum()),
        "customer_orphan_nationkey": int(
            (~cust["c_nationkey"].isin(set(nation["n_nationkey"]))).sum()
        ),
        "nonpositive_totalprice": int((orders["o_totalprice"] <= 0).sum()),
        "quantity_out_of_range": int(
            ((li["l_quantity"] < 1) | (li["l_quantity"] > 50)).sum()
        ),
    }
    want = pd.DataFrame(
        [{"check_name": k, "violations": v} for k, v in checks.items()]
    )
    want["violations"] = want["violations"].astype("int64")
    frames_equal(got, want)
    # the report shows ALL checks, passing ones included
    assert len(got) == 6


# ---------------------------------------------------------------------------
# Retraction-stream aggregation / join-view IVM
# ---------------------------------------------------------------------------


def test_incremental_agg_retract_weighted_deltas(spark):
    got = _run(spark, "incremental_agg_retract")
    ev = read("events").copy()
    ev["cents"] = half_up(ev["value"], 2).to_numpy()
    rows = []
    for et, grp in ev.groupby("event_type"):
        n = len(grp)
        total = int(grp["cents"].sum())
        corrected = grp[grp["event_id"] % 97 == 0]
        # each correction: -old +new(old+500): count unchanged, +500 each
        total += 500 * len(corrected)
        rows.append({"event_type": et, "n_rows": n, "total_cents": total})
    want = pd.DataFrame(rows)
    want["n_rows"] = want["n_rows"].astype("int64")
    want["total_cents"] = want["total_cents"].astype("int64")
    frames_equal(got, want)
    # retraction law also re-proved directly: the weighted-delta
    # aggregate equals the recompute on the PATCHED table
    patched = ev.copy()
    mask = patched["event_id"] % 97 == 0
    patched.loc[mask, "cents"] += 500
    for et, grp in patched.groupby("event_type"):
        w = want[want["event_type"] == et].iloc[0]
        assert int(grp["cents"].sum()) == int(w["total_cents"])


def test_mv_join_delta_equals_monolithic_recompute(spark):
    got = _run(spark, "mv_join_delta_maintenance")
    orders, li = read("orders"), read("lineitem")
    li = li.copy()
    li["cents"] = half_up(li["l_extendedprice"], 2).to_numpy()
    j = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    g = j.groupby("o_orderpriority").agg(
        n_rows=("cents", "size"), revenue_cents=("cents", "sum")
    )
    want = g.reset_index().rename(columns={"o_orderpriority": "priority"})
    want["n_rows"] = want["n_rows"].astype("int64")
    want["revenue_cents"] = want["revenue_cents"].astype("int64")
    frames_equal(got, want)
