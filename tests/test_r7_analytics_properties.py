"""Independent property tests for the analytics surface: skyline,
attribution, funnels, market-basket, RFM, robust outliers, revenue
concentration, backlog aging, date-spine densify, tolerance as-of
join, interval merging, exact medians (incl. the UDAF twin), column
profiling and freshness -- each recomputed with pandas/python.

Several of these queries use scale-safe rewrites (sort-based skyline
instead of the dominance anti-join, carry-forward window instead of a
range join, rank-based medians instead of interpolated quantiles);
the recomputes are the naive definitions, proving the rewrites
result-identical.
"""

from __future__ import annotations

import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, half_up, read
from tests.test_r7_surface_properties import _ntile


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


US = 1_000_000


# ---------------------------------------------------------------------------
# Skyline: naive dominance definition vs the sort-based rewrite
# ---------------------------------------------------------------------------


def test_skyline_matches_naive_dominance(spark):
    got = _run(spark, "skyline_price_size")
    part = read("part")
    pts = [
        (int(r.p_partkey), int(half_up([r.p_retailprice], 2).iloc[0]), int(r.p_size))
        for r in part.itertuples(index=False)
    ]
    rows = []
    for pk, price, size in pts:
        dominated = any(
            qp <= price
            and qs >= size
            and (qp < price or qs > size)
            for _, qp, qs in pts
        )
        if not dominated:
            rows.append({"p_partkey": pk, "price_cents": price, "size": size})
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)
    assert 0 < len(want) < len(pts)


# ---------------------------------------------------------------------------
# Last-touch attribution: per-user event walk
# ---------------------------------------------------------------------------


def test_attribution_last_touch_walk(spark):
    got = _run(spark, "attribution_last_touch")
    ev = read("events").sort_values(["user_id", "ts", "event_id"])
    stats: dict[str, list[int]] = {}
    for _, grp in ev.groupby("user_id"):
        last_type, last_ts = None, None
        for r in grp.itertuples(index=False):
            if r.event_type == "purchase":
                if (
                    last_ts is not None
                    and (r.ts - last_ts).total_seconds() * US
                    <= 3 * 86400 * US
                ):
                    ch = last_type
                else:
                    ch = "unattributed"
                cents = int(half_up([r.value], 2).iloc[0])
                s = stats.setdefault(ch, [0, 0])
                s[0] += 1
                s[1] += cents
            if r.event_type in ("click", "view"):
                last_type, last_ts = r.event_type, r.ts
    want = pd.DataFrame(
        [
            {"channel": ch, "purchases": n, "revenue_cents": c}
            for ch, (n, c) in sorted(stats.items())
        ]
    )
    want["purchases"] = want["purchases"].astype("int64")
    want["revenue_cents"] = want["revenue_cents"].astype("int64")
    frames_equal(got, want)
    # every purchase is attributed to exactly one channel
    assert want["purchases"].sum() == (ev["event_type"] == "purchase").sum()


# ---------------------------------------------------------------------------
# Funnels: stage chain with/without the 7-day deadline
# ---------------------------------------------------------------------------


def _funnel_times(deadline_us=None):
    ev = read("events")
    out = {}
    for uid, grp in ev.groupby("user_id"):

        def stage_min(etype, after, t1=None):
            cond = grp["event_type"] == etype
            if after is not None:
                cond &= grp["ts"] > after
            if deadline_us is not None and t1 is not None:
                cond &= (
                    grp["ts"] - t1
                ).dt.total_seconds() * US <= deadline_us
            sel = grp.loc[cond, "ts"]
            return sel.min() if len(sel) else None

        t1 = stage_min("signup", None)
        t2 = stage_min("view", t1, t1) if t1 is not None else None
        t3 = stage_min("click", t2, t1) if t2 is not None else None
        t4 = stage_min("purchase", t3, t1) if t3 is not None else None
        out[uid] = (t1, t2, t3, t4)
    return out


def test_funnel_stages_windowed_counts(spark):
    got = _run(spark, "funnel_stages_windowed")
    times = _funnel_times(deadline_us=7 * 86400 * US)
    counts = [
        sum(1 for t in times.values() if t[i] is not None) for i in range(4)
    ]
    want = pd.DataFrame(
        {
            "stage_order": [1, 2, 3, 4],
            "stage": ["signup", "view", "click", "purchase"],
            "users": counts,
        }
    )
    want["stage_order"] = want["stage_order"].astype("int32")
    want["users"] = want["users"].astype("int64")
    got = got.copy()
    got["stage_order"] = got["stage_order"].astype("int32")
    frames_equal(got, want)
    # funnel monotonicity
    assert counts == sorted(counts, reverse=True)


def test_funnel_time_to_convert_exact_medians(spark):
    got = _run(spark, "funnel_time_to_convert")
    times = _funnel_times(deadline_us=None)
    diffs = {1: [], 2: [], 3: []}
    names = {1: "signup>view", 2: "view>click", 3: "click>purchase"}
    for t1, t2, t3, t4 in times.values():
        if t2 is not None:
            diffs[1].append(int((t2 - t1).total_seconds() * US))
        if t3 is not None:
            diffs[2].append(int((t3 - t2).total_seconds() * US))
        if t4 is not None:
            diffs[3].append(int((t4 - t3).total_seconds() * US))
    rows = []
    for k, us in diffs.items():
        us = sorted(us)
        n = len(us)
        lo, hi = us[(n + 1) // 2 - 1], us[n // 2]
        rows.append(
            {
                "transition_order": k,
                "transition": names[k],
                "n_users": n,
                "median_us_x2": lo + hi,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["n_users", "median_us_x2"]:
        want[c] = want[c].astype("int64")
    got = got.copy()
    got["transition_order"] = got["transition_order"].astype("int64")
    want["transition_order"] = want["transition_order"].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Market basket: support and lift
# ---------------------------------------------------------------------------


def _basket_pairs():
    li = read("lineitem")
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    pair_n: dict[tuple[int, int], int] = {}
    marg: dict[int, int] = {}
    for _, grp in items.groupby("l_orderkey"):
        parts = sorted(int(p) for p in grp["l_partkey"])
        for p in parts:
            marg[p] = marg.get(p, 0) + 1
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    n_orders = items["l_orderkey"].nunique()
    return pair_n, marg, n_orders


def test_basket_pair_support(spark):
    got = _run(spark, "basket_pair_support")
    pair_n, _, _ = _basket_pairs()
    rows = [
        {"part_a": a, "part_b": b, "support": n}
        for (a, b), n in sorted(pair_n.items())
        if n >= 3
    ]
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)


def test_basket_pair_lift_marginals(spark):
    got = _run(spark, "basket_pair_lift")
    pair_n, marg, n_orders = _basket_pairs()
    rows = [
        {
            "part_a": a,
            "part_b": b,
            "n_ab": n,
            "lift_num": n * n_orders,
            "lift_den": marg[a] * marg[b],
        }
        for (a, b), n in sorted(pair_n.items())
        if n >= 3
    ]
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# RFM segmentation: three ntile codes over the customer aggregate
# ---------------------------------------------------------------------------


def test_rfm_segmentation_codes(spark):
    got = _run(spark, "rfm_segmentation")
    orders = read("orders").copy()
    orders["cents"] = half_up(orders["o_totalprice"], 2).to_numpy()
    cust = orders.groupby("o_custkey").agg(
        last=("o_orderdate", "max"),
        frequency=("o_orderkey", "size"),
        monetary=("cents", "sum"),
    )
    cust["recency"] = (
        pd.Timestamp("1999-01-01") - cust["last"].dt.normalize()
    ).dt.days
    cust = cust.reset_index()

    def codes(keys):
        order = sorted(range(len(cust)), key=lambda i: keys[i])
        q = _ntile(len(cust), 4)
        out = [0] * len(cust)
        for pos, i in enumerate(order):
            out[i] = q[pos]
        return out

    r = codes(
        [(row.recency, row.o_custkey) for row in cust.itertuples(index=False)]
    )
    f = codes(
        [(-row.frequency, row.o_custkey) for row in cust.itertuples(index=False)]
    )
    m = codes(
        [(-row.monetary, row.o_custkey) for row in cust.itertuples(index=False)]
    )
    cust["segment"] = [
        100 * ri + 10 * fi + mi for ri, fi, mi in zip(r, f, m)
    ]
    g = cust.groupby("segment").agg(
        customers=("o_custkey", "size"), segment_cents=("monetary", "sum")
    )
    want = pd.DataFrame(
        {
            "segment": g.index.astype("int64"),
            "customers": g["customers"].astype("int64").to_numpy(),
            "segment_cents": g["segment_cents"].astype("int64").to_numpy(),
        }
    )
    frames_equal(got, want)
    assert got["customers"].sum() == len(cust)


# ---------------------------------------------------------------------------
# Null-safe join: NULL keys match
# ---------------------------------------------------------------------------


def test_join_null_safe_null_bucket(spark):
    got = _run(spark, "join_null_safe")
    orders = read("orders").copy()
    orders["cents"] = half_up(orders["o_totalprice"], 2).to_numpy()
    label = {
        "1-URGENT": "hot",
        "2-HIGH": "hot",
        "3-MEDIUM": "scrubbed",  # scrubbed to NULL, matches the NULL dim row
        "4-NOT SPECIFIED": "cold",
        "5-LOW": "cold",
    }
    orders["label"] = orders["o_orderpriority"].map(label)
    g = orders.groupby("label").agg(n=("cents", "size"), cents=("cents", "sum"))
    want = pd.DataFrame(
        {
            "label": g.index,
            "n": g["n"].astype("int64").to_numpy(),
            "cents": g["cents"].astype("int64").to_numpy(),
        }
    )
    frames_equal(got, want)
    # the null-safe law: no order vanishes at the join
    assert got["n"].sum() == len(orders)


# ---------------------------------------------------------------------------
# Robust outliers: rank-based IQR and MAD rules
# ---------------------------------------------------------------------------


def test_outlier_iqr_by_group(spark):
    got = _run(spark, "outlier_iqr_by_group")
    orders = read("orders").copy()
    orders["cents"] = half_up(orders["o_totalprice"], 2).to_numpy()
    rows = []
    for pri, grp in orders.groupby("o_orderpriority"):
        vals = grp.sort_values(["cents", "o_orderkey"])["cents"].tolist()
        n = len(vals)
        q1 = vals[(n + 3) // 4 - 1]
        q3 = vals[(3 * n + 3) // 4 - 1]
        iqr = q3 - q1
        n_out = sum(
            1 for c in vals if 2 * c < 2 * q1 - 3 * iqr or 2 * c > 2 * q3 + 3 * iqr
        )
        rows.append({"priority": pri, "n": n, "n_outliers": n_out})
    want = pd.DataFrame(rows)
    want["n"] = want["n"].astype("int64")
    want["n_outliers"] = want["n_outliers"].astype("int64")
    frames_equal(got, want)


def test_outlier_mad_by_group(spark):
    got = _run(spark, "outlier_mad_by_group")
    ev = read("events").copy()
    ev["cents"] = half_up(ev["value"], 2).to_numpy()
    rows = []
    for et, grp in ev.groupby("event_type"):
        vals = sorted(grp["cents"].tolist())
        n = len(vals)
        med = vals[(n + 1) // 2 - 1]
        devs = sorted(abs(c - med) for c in vals)
        mad = devs[(n + 1) // 2 - 1]
        n_out = sum(1 for c in vals if abs(c - med) > 3 * mad)
        rows.append(
            {
                "event_type": et,
                "n": n,
                "median_cents": med,
                "mad_cents": mad,
                "n_outliers": n_out,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["n", "median_cents", "mad_cents", "n_outliers"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Revenue concentration, backlog aging
# ---------------------------------------------------------------------------


def test_revenue_concentration_8020(spark):
    got = _run(spark, "revenue_concentration_8020")
    orders = read("orders").copy()
    orders["cents"] = half_up(orders["o_totalprice"], 2).to_numpy()
    cust = (
        orders.groupby("o_custkey")["cents"].sum().reset_index()
    )
    cust = cust.sort_values(["cents", "o_custkey"], ascending=[False, True])
    total = int(cust["cents"].sum())
    cum = 0
    rk80 = None
    for rk, c in enumerate(cust["cents"], start=1):
        cum += int(c)
        if 5 * cum >= 4 * total:
            rk80 = rk
            break
    assert len(got) == 1
    assert int(got["customers_to_80pct"].iloc[0]) == rk80
    assert int(got["total_cents"].iloc[0]) == total
    assert int(got["n_customers"].iloc[0]) == len(cust)
    assert rk80 < len(cust)  # concentration is real on this fixture


def test_orders_backlog_aging_buckets(spark):
    got = _run(spark, "orders_backlog_aging")
    orders = read("orders").copy()
    horizon = orders["o_orderdate"].max()
    open_o = orders[orders["o_orderstatus"] == "O"].copy()
    open_o["cents"] = half_up(open_o["o_totalprice"], 2).to_numpy()
    open_o["age"] = (
        horizon.normalize() - open_o["o_orderdate"].dt.normalize()
    ).dt.days
    open_o["bucket"] = open_o["age"].map(
        lambda a: "0-30"
        if a <= 30
        else ("31-90" if a <= 90 else ("91-365" if a <= 365 else "365+"))
    )
    g = open_o.groupby(["o_orderpriority", "bucket"]).agg(
        n_orders=("cents", "size"),
        backlog_cents=("cents", "sum"),
        oldest_days=("age", "max"),
    )
    want = g.reset_index().rename(
        columns={"o_orderpriority": "priority", "bucket": "age_bucket"}
    )
    for c in ["n_orders", "backlog_cents", "oldest_days"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Date-spine densify: zero-activity days survive
# ---------------------------------------------------------------------------


def test_densify_date_spine_zero_fill(spark):
    got = _run(spark, "densify_date_spine")
    orders, cust, nation = read("orders"), read("customer"), read("nation")
    o = orders[
        (orders["o_orderdate"] >= "1995-01-01")
        & (orders["o_orderdate"] < "1995-02-01")
    ].copy()
    o["cents"] = half_up(o["o_totalprice"], 2).to_numpy()
    j = o.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["d"] = j["o_orderdate"].dt.normalize()
    rev = j.groupby(["n_nationkey", "d"])["cents"].sum()
    days = pd.date_range("1995-01-01", "1995-01-31", freq="D")
    rows = []
    for nk in sorted(nation["n_nationkey"]):
        for d in days:
            rows.append(
                {
                    "nationkey": int(nk),
                    "day": d,
                    "revenue_cents": int(rev.get((nk, d), 0)),
                }
            )
    want = pd.DataFrame(rows)
    want["nationkey"] = want["nationkey"].astype("int64")
    want["revenue_cents"] = want["revenue_cents"].astype("int64")
    got = got.copy()
    got["day"] = pd.to_datetime(got["day"])
    got["nationkey"] = got["nationkey"].astype("int64")
    frames_equal(got, want)
    assert len(want) == len(nation) * 31
    assert (want["revenue_cents"] == 0).any(), "no zero days densified"


# ---------------------------------------------------------------------------
# As-of join with tolerance: naive per-click scan
# ---------------------------------------------------------------------------


def test_asof_tolerance_naive_scan(spark):
    got = _run(spark, "asof_join_tolerance")
    ev = read("events")
    purch = (
        ev[ev["event_type"] == "purchase"]
        .groupby(["user_id", "ts"])["value"]
        .max()
        .reset_index()
    )
    rows = []
    for r in ev[ev["event_type"] == "click"].itertuples(index=False):
        cand = purch[(purch["user_id"] == r.user_id) & (purch["ts"] <= r.ts)]
        if len(cand):
            best = cand.sort_values("ts").iloc[-1]
            in_tol = (r.ts - best["ts"]).total_seconds() * US <= 3600 * US
            pts = best["ts"] if in_tol else None
            pval = float(best["value"]) if in_tol else None
        else:
            pts, pval = None, None
        rows.append(
            {
                "click_id": int(r.event_id),
                "user_id": int(r.user_id),
                "purchase_ts": pts,
                "purchase_value": pval,
            }
        )
    want = pd.DataFrame(rows)
    want["click_id"] = want["click_id"].astype("int64")
    want["user_id"] = want["user_id"].astype("int64")
    want["purchase_value"] = want["purchase_value"].astype("float64")
    frames_equal(got, want)
    # LEFT semantics: every click survives
    assert len(got) == (ev["event_type"] == "click").sum()


# ---------------------------------------------------------------------------
# Interval union: running-max island walk
# ---------------------------------------------------------------------------


def test_intervals_merge_overlaps_islands(spark):
    got = _run(spark, "intervals_merge_overlaps")
    ev = read("events")
    rows = []
    for uid, grp in ev.groupby("user_id"):
        iv = []
        for r in grp.itertuples(index=False):
            s = int(r.ts.value // 1000)  # ns -> us
            e = s + (1 + int(r.event_id) % 120) * 60 * US
            iv.append((s, e, int(r.event_id)))
        iv.sort()
        island, prev_max = 0, None
        agg: dict[int, list] = {}
        for s, e, _ in iv:
            if prev_max is None or s > prev_max:
                island += 1
            prev_max = e if prev_max is None else max(prev_max, e)
            a = agg.setdefault(island, [s, e, 0])
            a[0] = min(a[0], s)
            a[1] = max(a[1], e)
            a[2] += 1
        for isl, (s, e, n) in agg.items():
            rows.append(
                {
                    "user_id": int(uid),
                    "island": isl,
                    "start_us": s,
                    "end_us": e,
                    "n_intervals": n,
                }
            )
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)
    # islands are disjoint: per user, sorted islands never overlap
    for uid, grp in want.groupby("user_id"):
        grp = grp.sort_values("island")
        ends = grp["end_us"].tolist()
        starts = grp["start_us"].tolist()
        assert all(starts[i + 1] > ends[i] for i in range(len(grp) - 1))


# ---------------------------------------------------------------------------
# Exact median UDAF twin, profiling, freshness
# ---------------------------------------------------------------------------


def test_median_exact_udaf(spark):
    got = _run(spark, "median_exact_udaf")
    orders = read("orders").copy()
    orders["cents"] = half_up(orders["o_totalprice"], 2).to_numpy()
    rows = []
    for pri, grp in orders.groupby("o_orderpriority"):
        vals = sorted(grp["cents"].tolist())
        n = len(vals)
        rows.append(
            {
                "priority": pri,
                "median_cents_x2": vals[(n + 1) // 2 - 1] + vals[n // 2],
                "n": n,
            }
        )
    want = pd.DataFrame(rows)
    want["median_cents_x2"] = want["median_cents_x2"].astype("int64")
    want["n"] = want["n"].astype("int64")
    frames_equal(got, want)


def test_profile_columns_one_pass(spark):
    got = _run(spark, "profile_columns")
    li = read("lineitem")
    cols = [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
    ]
    rows = [
        {
            "column_name": c,
            "n_rows": len(li),
            "n_nulls": int(li[c].isna().sum()),
            "n_distinct": int(li[c].nunique()),
        }
        for c in cols
    ]
    want = pd.DataFrame(rows)
    for c in ["n_rows", "n_nulls", "n_distinct"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


def test_dq_freshness_by_type(spark):
    got = _run(spark, "dq_freshness_by_type")
    ev = read("events")
    horizon = ev["ts"].max()
    rows = []
    for et, grp in ev.groupby("event_type"):
        latest = grp["ts"].max()
        lag_us = int((horizon - latest).total_seconds() * US)
        rows.append(
            {
                "event_type": et,
                "n_events": len(grp),
                "latest_ts": latest,
                "lag_minutes": lag_us // (60 * US),
                "stale": lag_us > 86400 * US,
            }
        )
    want = pd.DataFrame(rows)
    want["n_events"] = want["n_events"].astype("int64")
    want["lag_minutes"] = want["lag_minutes"].astype("int64")
    got = got.copy()
    got["stale"] = got["stale"].astype(bool).astype(str)
    want["stale"] = want["stale"].astype(bool).astype(str)
    frames_equal(got, want)
