"""Independent property tests for the core agg/window/events/setop/
scalar surface (queries_core.py tail + queries_surface.py): each
recomputed from the raw parquet with pandas/python only.

Includes the engine's one surrogate-key kernel (md5 -> base62, P7):
the python twin rebuilds the 128-bit divmod chain digit by digit, so
the pandas_udf kernel and its UHUGEINT DuckDB twin are now pinned by
a third implementation.

agg_approx_sketches has no exact oracle by design (sketches are
implementation-defined); its property test pins ERROR BOUNDS against
the exact answers instead.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, half_up, read


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


# ---------------------------------------------------------------------------
# agg_pricing_summary / agg_rollup: exact-integer money aggregation
# ---------------------------------------------------------------------------


def test_agg_pricing_summary_exact_integer_domain(spark):
    got = _run(spark, "agg_pricing_summary")
    li = read("lineitem")
    f = li[li["l_shipdate"] <= "1998-09-02"].copy()
    f["qty"] = f["l_quantity"].astype("int64")
    f["base_cents"] = half_up(f["l_extendedprice"], 2).to_numpy()
    f["disc_e4"] = half_up(
        f["l_extendedprice"] * (1 - f["l_discount"]), 4
    ).to_numpy()
    g = f.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("qty", "sum"),
        sum_base_cents=("base_cents", "sum"),
        sum_disc_e4=("disc_e4", "sum"),
        count_order=("qty", "size"),
    )
    for c in ["sum_qty", "sum_base_cents", "sum_disc_e4", "count_order"]:
        g[c] = g[c].astype("int64")
    frames_equal(got, g)


def test_agg_rollup_totals_are_consistent(spark):
    """ROLLUP = (flag,status) + (flag, NULL) + (NULL, NULL): rebuild
    all three grains and check the subtotal/total closure."""
    got = _run(spark, "agg_rollup")
    li = read("lineitem").copy()
    li["qty"] = li["l_quantity"].astype("int64")
    fine = li.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        n_rows=("qty", "size"), sum_qty=("qty", "sum")
    )
    sub = li.groupby(["l_returnflag"], as_index=False).agg(
        n_rows=("qty", "size"), sum_qty=("qty", "sum")
    )
    sub["l_linestatus"] = None
    total = pd.DataFrame(
        {
            "l_returnflag": [None],
            "l_linestatus": [None],
            "n_rows": [len(li)],
            "sum_qty": [li["qty"].sum()],
        }
    )
    want = pd.concat([fine, sub, total], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "n_rows", "sum_qty"]
    ]
    want["n_rows"] = want["n_rows"].astype("int64")
    want["sum_qty"] = want["sum_qty"].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# events: hourly windows + gap sessionization
# ---------------------------------------------------------------------------


def test_events_windowed_agg_hour_buckets(spark):
    got = _run(spark, "events_windowed_agg")
    ev = read("events").copy()
    ev["window_start"] = ev["ts"].dt.floor("h")
    rows = []
    for (ws, et), grp in ev.groupby(["window_start", "event_type"]):
        s = float(grp["value"].sum())
        rows.append(
            {
                "window_start": ws,
                "event_type": et,
                "n_events": len(grp),
                "n_users": grp["user_id"].nunique(),
                "sum_value": int(half_up([s], 4).iloc[0]) / 1e4,
            }
        )
    want = pd.DataFrame(rows)
    want["n_events"] = want["n_events"].astype("int64")
    want["n_users"] = want["n_users"].astype("int64")
    frames_equal(got, want)


def test_events_sessionize_gap_walk(spark):
    got = _run(spark, "events_sessionize")
    ev = read("events").sort_values(["user_id", "ts", "event_id"])
    rows = []
    for uid, grp in ev.groupby("user_id"):
        n_sessions, prev = 0, None
        for ts in grp["ts"]:
            if prev is None or (ts - prev) > pd.Timedelta(minutes=30):
                n_sessions += 1
            prev = ts
        rows.append(
            {"user_id": int(uid), "n_sessions": n_sessions, "n_events": len(grp)}
        )
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)
    assert (want["n_sessions"] >= 1).all()


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


def test_setop_intersect_is_distinct_key_intersection(spark):
    got = _run(spark, "setop_intersect")
    o = read("orders")
    keys = set(o.loc[o["o_orderstatus"] == "O", "o_custkey"]) & set(
        o.loc[o["o_orderstatus"] == "F", "o_custkey"]
    )
    want = pd.DataFrame({"cust_key": sorted(keys)}, dtype="int64")
    frames_equal(got, want)


def test_setop_except_is_distinct_key_difference(spark):
    got = _run(spark, "setop_except")
    cust, orders = read("customer"), read("orders")
    keys = set(cust["c_custkey"]) - set(orders["o_custkey"])
    want = pd.DataFrame({"cust_key": sorted(keys)}, dtype="int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Pivot: status counts per segment, zero-filled
# ---------------------------------------------------------------------------


def test_pivot_status_by_segment_counts(spark):
    got = _run(spark, "pivot_status_by_segment")
    o, c = read("orders"), read("customer")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    rows = []
    for seg, grp in j.groupby("c_mktsegment"):
        vc = grp["o_orderstatus"].value_counts()
        rows.append(
            {
                "segment": seg,
                "status_o": int(vc.get("O", 0)),
                "status_f": int(vc.get("F", 0)),
                "status_p": int(vc.get("P", 0)),
            }
        )
    want = pd.DataFrame(rows)
    for col in ["status_o", "status_f", "status_p"]:
        want[col] = want[col].astype("int64")
    frames_equal(got, want)
    # pivot conservation: statuses partition the joined rows
    assert (
        got[["status_o", "status_f", "status_p"]].to_numpy().sum() == len(j)
    )


# ---------------------------------------------------------------------------
# Scalar batteries: string / date / json per-row rebuilds
# ---------------------------------------------------------------------------


def test_string_functions_per_row(spark):
    got = _run(spark, "string_functions")
    cust = read("customer")
    rows = []
    for r in cust.itertuples(index=False):
        m = re.search(r"([0-9]+)", r.c_name)
        rows.append(
            {
                "cust_key": int(r.c_custkey),
                "name_upper": r.c_name.upper(),
                "seg_lower": r.c_mktsegment.lower(),
                "name_prefix": r.c_name[:8],
                "name_len": len(r.c_name),
                "name_replaced": r.c_name.replace("Customer", "Cust"),
                "key_padded": str(r.c_custkey).rjust(10, "0")[-10:]
                if len(str(r.c_custkey)) <= 10
                else str(r.c_custkey)[:10],
                "key_digits": m.group(1) if m else "",
                "seg_rev": r.c_mktsegment[::-1],
                "joined": f"{r.c_name}|{r.c_mktsegment}",
            }
        )
    want = pd.DataFrame(rows)
    want["name_len"] = want["name_len"].astype("int64")
    frames_equal(got, want)


def test_date_functions_per_row(spark):
    got = _run(spark, "date_functions")
    o = read("orders")
    d = o["o_orderdate"]
    eoy = pd.Timestamp("1998-12-31")
    want = pd.DataFrame(
        {
            "order_key": o["o_orderkey"].astype("int64"),
            "y": d.dt.year.astype("int64"),
            "m": d.dt.month.astype("int64"),
            "d": d.dt.day.astype("int64"),
            # pandas dayofweek: Mon=0..Sun=6 -> Sun=0..Sat=6
            "dow0": ((d.dt.dayofweek + 1) % 7).astype("int64"),
            "month_start": d.dt.to_period("M").dt.start_time,
            "days_to_eoy": (
                eoy.normalize() - d.dt.normalize()
            ).dt.days.astype("int64"),
        }
    )
    frames_equal(got, want)


def test_json_extraction_per_row(spark):
    got = _run(spark, "json_extraction")
    ev = read("events")
    want = pd.DataFrame(
        {
            "event_id": ev["event_id"].astype("int64"),
            "prop_k": ev["props"]
            .map(lambda p: int(json.loads(p)["k"]))
            .astype("int64"),
        }
    )
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# agg_stats_exact: variance from integer power sums
# ---------------------------------------------------------------------------


def test_agg_stats_exact_power_sums(spark):
    got = _run(spark, "agg_stats_exact")
    li = read("lineitem").copy()
    li["q"] = li["l_quantity"].astype("int64")
    rows = []
    for flag, grp in li.groupby("l_returnflag"):
        n = len(grp)
        s1 = int(grp["q"].sum())
        s2 = int((grp["q"] * grp["q"]).sum())
        rows.append(
            {
                "l_returnflag": flag,
                "n": n,
                "min_qty": int(grp["q"].min()),
                "max_qty": int(grp["q"].max()),
                "mean_qty": float(s1) / n,
                "var_qty": (float(s2) - float(s1) * s1 / n) / (n - 1),
            }
        )
    want = pd.DataFrame(rows)
    for c in ["n", "min_qty", "max_qty"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# window_rank_battery: rank/dense_rank/lag/lead/ntile rebuilt per group
# ---------------------------------------------------------------------------


def _ntile(n_rows: int, buckets: int) -> list[int]:
    base, rem = divmod(n_rows, buckets)
    out = []
    for b in range(1, buckets + 1):
        out.extend([b] * (base + (1 if b <= rem else 0)))
    return out[:n_rows]


def test_window_rank_battery_per_group(spark):
    got = _run(spark, "window_rank_battery")
    o = read("orders").sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    rows = []
    for _, grp in o.groupby("o_custkey", sort=False):
        keys = list(zip(grp["o_orderdate"], grp["o_orderkey"]))
        orderkeys = list(grp["o_orderkey"])
        n = len(grp)
        quartiles = _ntile(n, 4)
        rnk, drnk = [], []
        seen_distinct = 0
        for i, k in enumerate(keys):
            if i == 0 or k != keys[i - 1]:
                rnk.append(i + 1)
                seen_distinct += 1
            else:
                rnk.append(rnk[-1])
            drnk.append(seen_distinct)
        for i in range(n):
            rows.append(
                {
                    "cust_key": int(grp["o_custkey"].iloc[i]),
                    "order_key": int(orderkeys[i]),
                    "rnk": rnk[i],
                    "drnk": drnk[i],
                    "prev_order": orderkeys[i - 1] if i > 0 else None,
                    "next_order": orderkeys[i + 1] if i < n - 1 else None,
                    "quartile": quartiles[i],
                }
            )
    want = pd.DataFrame(rows)
    for c in ["cust_key", "order_key", "rnk", "drnk", "quartile"]:
        want[c] = want[c].astype("int64")
    for c in ["prev_order", "next_order"]:
        want[c] = want[c].astype("float64")
        got[c] = got[c].astype("float64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# agg_approx_sketches: error-bound pinning against exact answers
# ---------------------------------------------------------------------------


def test_approx_sketches_within_bounds_of_exact(spark):
    got = _run(spark, "agg_approx_sketches").set_index("l_returnflag")
    li = read("lineitem")
    for flag, grp in li.groupby("l_returnflag"):
        exact_orders = grp["l_orderkey"].nunique()
        row = got.loc[flag]
        # approx_count_distinct default rsd = 5%; allow 3x
        assert abs(row["approx_orders"] - exact_orders) <= max(
            3, 0.15 * exact_orders
        )
        prices = np.sort(grp["l_extendedprice"].to_numpy())
        lo, hi = np.quantile(prices, [0.4, 0.6])
        assert lo - 1e-9 <= row["approx_median_price"] <= hi + 1e-9 or (
            prices.min() <= row["approx_median_price"] <= prices.max()
        )
        q = np.sort(grp["l_quantity"].to_numpy())
        assert q.min() <= row["qty_p25"] <= row["qty_p75"] <= q.max()


# ---------------------------------------------------------------------------
# P7: md5 -> base62 surrogate (the pandas_udf kernel)
# ---------------------------------------------------------------------------


def _base62(n: int) -> str:
    from etl_building_inspector_spark.functions.ids import _B62

    if n == 0:
        return "0"
    digits = []
    while n > 0:
        n, r = divmod(n, 62)
        digits.append(_B62[r])
    return "".join(reversed(digits))


def test_p7_base62_surrogate_digit_chain(spark):
    import hashlib

    got = _run(spark, "p7_base62_surrogate")
    part = read("part")
    rows = []
    for r in part.itertuples(index=False):
        h = hashlib.md5(f"{r.p_name},{r.p_brand}".encode()).hexdigest()
        rows.append(
            {
                "part_key": int(r.p_partkey),
                "surrogate_id": f"part-{r.p_partkey}-{_base62(int(h, 16))}",
            }
        )
    want = pd.DataFrame(rows)
    want["part_key"] = want["part_key"].astype("int64")
    frames_equal(got, want)
