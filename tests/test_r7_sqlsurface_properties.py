"""Independent property tests for the SQL-surface batteries: arrays,
null semantics, window frames/distribution, conditional aggregates,
grouping sets, regexp, map/variant extraction, correlated and lateral
subqueries, the Q3/Q11/Q21/Q22 shapes, recursive reachability, SCD2,
hypertable rollup, unpivot, the try_* battery, and the skew-salted
rewrites -- each recomputed per-row/per-group in python.

The salted join/agg recomputes are the PLAIN formulations, proving
the 8/16-way salting result-invisible (its whole contract).
"""

from __future__ import annotations

import json
import re

import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, half_up, read, rev_e4
from tests.test_r7_dedup_properties import _toks


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


def _bool_str(df, cols):
    df = df.copy()
    for c in cols:
        df[c] = df[c].astype(bool).astype(str)
    return df


# ---------------------------------------------------------------------------
# sql_api_q3 / q11ish / q21ish / q22ish
# ---------------------------------------------------------------------------


def test_sql_api_q3(spark):
    got = _run(spark, "sql_api_q3")
    cust, orders, li = read("customer"), read("orders"), read("lineitem")
    j = (
        cust[cust["c_mktsegment"] == "BUILDING"]
        .merge(orders, left_on="c_custkey", right_on="o_custkey")
        .merge(li, left_on="o_orderkey", right_on="l_orderkey")
    )
    j = j[
        (j["o_orderdate"] < "1995-03-15") & (j["l_shipdate"] > "1995-03-15")
    ].copy()
    j["rev"] = rev_e4(j["l_extendedprice"], j["l_discount"]).to_numpy()
    g = (
        j.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])["rev"]
        .sum()
        .reset_index()
    )
    want = pd.DataFrame(
        {
            "order_key": g["l_orderkey"].astype("int64"),
            "revenue_e4": g["rev"].astype("int64"),
            "order_date": g["o_orderdate"],
            "priority": g["o_orderpriority"],
        }
    )
    frames_equal(got, want)


def test_sql_api_q11ish_important_brands(spark):
    got = _run(spark, "sql_api_q11ish")
    part, li = read("part"), read("lineitem")
    li = li.copy()
    li["cents"] = half_up(li["l_extendedprice"], 2).to_numpy()
    total = int(li["cents"].sum())
    j = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
    g = j.groupby("p_brand")["cents"].sum()
    keep = g[g * 25 > total]
    want = pd.DataFrame(
        {"brand": keep.index, "revenue_cents": keep.astype("int64").to_numpy()}
    )
    frames_equal(got, want)
    assert 0 < len(keep) < len(g)


def test_sql_api_q21ish_last_shipper(spark):
    got = _run(spark, "sql_api_q21ish")
    sup, li, orders = read("supplier"), read("lineitem"), read("orders")
    finished = set(orders.loc[orders["o_orderstatus"] == "F", "o_orderkey"])
    by_order: dict[int, list] = {}
    for r in li.itertuples(index=False):
        by_order.setdefault(int(r.l_orderkey), []).append(
            (int(r.l_suppkey), r.l_shipdate)
        )
    names = sup.set_index("s_suppkey")["s_name"]
    waits: dict[str, int] = {}
    for r in li.itertuples(index=False):
        ok = int(r.l_orderkey)
        if ok not in finished:
            continue
        others = [
            (s, d) for s, d in by_order[ok] if s != int(r.l_suppkey)
        ]
        if not others:
            continue
        if any(d > r.l_shipdate for _, d in others):
            continue
        waits[names[int(r.l_suppkey)]] = (
            waits.get(names[int(r.l_suppkey)], 0) + 1
        )
    top = sorted(waits.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    want = pd.DataFrame(top, columns=["supp_name", "numwait"])
    want["numwait"] = want["numwait"].astype("int64")
    frames_equal(got, want)


def test_sql_api_q22ish_rich_inactive(spark):
    got = _run(spark, "sql_api_q22ish")
    cust, orders = read("customer"), read("orders")
    cust = cust.copy()
    cust["cents"] = half_up(cust["c_acctbal"], 2).to_numpy()
    pos = cust[cust["c_acctbal"] > 0.0]
    n_pos, sum_pos = len(pos), int(pos["cents"].sum())
    open_cust = set(
        orders.loc[orders["o_orderstatus"] == "O", "o_custkey"]
    )
    sel = cust[
        (cust["cents"] * n_pos > sum_pos)
        & (~cust["c_custkey"].isin(open_cust))
    ]
    g = sel.groupby("c_mktsegment").agg(
        numcust=("cents", "size"), totbal_cents=("cents", "sum")
    )
    want = pd.DataFrame(
        {
            "segment": g.index,
            "numcust": g["numcust"].astype("int64").to_numpy(),
            "totbal_cents": g["totbal_cents"].astype("int64").to_numpy(),
        }
    )
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Array / null / regexp / map / variant batteries
# ---------------------------------------------------------------------------


def test_array_function_battery(spark):
    got = _run(spark, "array_function_battery")
    docs = read("documents")
    rows = []
    for r in docs.itertuples(index=False):
        toks = r.text.split(" ")
        distinct = sorted(set(toks))
        pos = toks.index("table") + 1 if "table" in toks else None
        rows.append(
            {
                "doc_id": int(r.doc_id),
                "first_distinct_sorted": distinct[0] if distinct else None,
                "n_distinct": len(distinct),
                "has_spark": "spark" in toks,
                "head3": "_".join(toks[:3]),
                "max_tok": max(toks) if toks else None,
                "first_table_pos": pos,
            }
        )
    want = pd.DataFrame(rows)
    want["doc_id"] = want["doc_id"].astype("int64")
    want["n_distinct"] = want["n_distinct"].astype("int64")
    want["first_table_pos"] = want["first_table_pos"].astype("float64")
    got = got.copy()
    got["first_table_pos"] = got["first_table_pos"].astype("float64")
    got = _bool_str(got, ["has_spark"])
    want = _bool_str(want, ["has_spark"])
    frames_equal(got, want)


def test_null_semantics_battery(spark):
    got = _run(spark, "null_semantics_battery")
    orders = read("orders")
    rows = []
    for r in orders.itertuples(index=False):
        big = r.o_totalprice if r.o_totalprice > 200000 else None
        rows.append(
            {
                "order_key": int(r.o_orderkey),
                "status_or_open": "open"
                if r.o_orderstatus == "O"
                else r.o_orderstatus,
                "big_price": big,
                "big_price_or_zero": big if big is not None else 0.0,
                "at_least_100k": max(r.o_totalprice, 100000.0),
                "at_most_100k": min(r.o_totalprice, 100000.0),
                "price_is_null": False,
                "not_open_flag": 0 if r.o_orderstatus == "O" else 1,
            }
        )
    want = pd.DataFrame(rows)
    want["order_key"] = want["order_key"].astype("int64")
    want["not_open_flag"] = want["not_open_flag"].astype("int32")
    want["big_price"] = want["big_price"].astype("float64")
    got = got.copy()
    got["not_open_flag"] = got["not_open_flag"].astype("int32")
    got = _bool_str(got, ["price_is_null"])
    want = _bool_str(want, ["price_is_null"])
    frames_equal(got, want)


def test_regexp_battery(spark):
    got = _run(spark, "regexp_battery")
    docs = read("documents")
    rows = []
    for r in docs.itertuples(index=False):
        m = re.search(r"([a-z]+) ([a-z]+)", r.text)
        rows.append(
            {
                "doc_id": int(r.doc_id),
                "mentions_spark": "spark" in r.text,
                "words_with_a": len(re.findall(r"[a-z]+a[a-z]*", r.text)),
                "second_word": m.group(2) if m else "",
                "devoweled": re.sub(r"[aeiou]", "_", r.text),
            }
        )
    want = pd.DataFrame(rows)
    want["doc_id"] = want["doc_id"].astype("int64")
    want["words_with_a"] = want["words_with_a"].astype("int64")
    got = _bool_str(got, ["mentions_spark"])
    want = _bool_str(want, ["mentions_spark"])
    frames_equal(got, want)


def test_map_and_variant_extraction(spark):
    ev = read("events")
    parsed = [json.loads(p) for p in ev["props"]]
    # map ops
    got_m = _run(spark, "map_column_ops")
    want_m = pd.DataFrame(
        {
            "event_id": ev["event_id"].astype("int64"),
            "k_value": [int(p["k"]) for p in parsed],
            "n_keys": [len(p) for p in parsed],
            "first_key": [sorted(p)[0] for p in parsed],
        }
    )
    want_m["k_value"] = want_m["k_value"].astype("int64")
    want_m["n_keys"] = want_m["n_keys"].astype("int64")
    frames_equal(got_m, want_m)
    # variant ops
    got_v = _run(spark, "variant_extraction")
    want_v = pd.DataFrame(
        {
            "event_id": ev["event_id"].astype("int64"),
            "k": [int(p["k"]) for p in parsed],
            "missing_val": [None] * len(parsed),
            "has_k": [True] * len(parsed),
        }
    )
    want_v["k"] = want_v["k"].astype("int64")
    want_v["missing_val"] = want_v["missing_val"].astype("float64")
    got_v = got_v.copy()
    got_v["missing_val"] = got_v["missing_val"].astype("float64")
    got_v = _bool_str(got_v, ["has_k"])
    want_v = _bool_str(want_v, ["has_k"])
    frames_equal(got_v, want_v)


# ---------------------------------------------------------------------------
# Window frames / distribution; conditional aggs; grouping sets
# ---------------------------------------------------------------------------


def test_window_frames_battery(spark):
    got = _run(spark, "window_frames_battery")
    li = read("lineitem").sort_values(
        ["l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        kind="mergesort",
    )
    rows = []
    for _, grp in li.groupby("l_suppkey", sort=False):
        oks = grp["l_orderkey"].tolist()
        qtys = grp["l_quantity"].astype(int).tolist()
        for i in range(len(grp)):
            rows.append(
                {
                    "supp_key": int(grp["l_suppkey"].iloc[i]),
                    "order_key": int(oks[i]),
                    "line_number": int(grp["l_linenumber"].iloc[i]),
                    "first_order": int(oks[0]),
                    "last_order_so_far": int(oks[i]),
                    "second_order": int(oks[1]) if i >= 1 else None,
                    "qty_3row": sum(qtys[max(0, i - 2) : i + 1]),
                }
            )
    want = pd.DataFrame(rows)
    for c in ["supp_key", "order_key", "line_number", "first_order", "last_order_so_far", "qty_3row"]:
        want[c] = want[c].astype("int64")
    want["second_order"] = want["second_order"].astype("float64")
    got = got.copy()
    got["second_order"] = got["second_order"].astype("float64")
    frames_equal(got, want)


def test_window_distribution(spark):
    got = _run(spark, "window_distribution")
    orders = read("orders").sort_values(
        ["o_custkey", "o_totalprice", "o_orderkey"]
    )
    rows = []
    for _, grp in orders.groupby("o_custkey", sort=False):
        n = len(grp)
        for i in range(n):
            rows.append(
                {
                    "cust_key": int(grp["o_custkey"].iloc[i]),
                    "order_key": int(grp["o_orderkey"].iloc[i]),
                    # the (price, orderkey) order is UNIQUE, so
                    # rank == row_number and cume = rn/n
                    "pct_rank": 0.0 if n == 1 else i / (n - 1),
                    "cume": (i + 1) / n,
                    "rn": i + 1,
                }
            )
    want = pd.DataFrame(rows)
    want["cust_key"] = want["cust_key"].astype("int64")
    want["order_key"] = want["order_key"].astype("int64")
    want["rn"] = want["rn"].astype("int64")
    frames_equal(got, want)


def test_conditional_agg_battery(spark):
    got = _run(spark, "conditional_agg_battery")
    li = read("lineitem")
    rows = []
    for flag, grp in li.groupby("l_returnflag"):
        fq = grp.loc[grp["l_linestatus"] == "F", "l_quantity"]
        rows.append(
            {
                "l_returnflag": flag,
                "n_big": int((grp["l_quantity"] > 25).sum()),
                "n_discounted": int((grp["l_discount"] > 0.05).sum()),
                "all_positive": bool((grp["l_quantity"] > 0).all()),
                "any_huge": bool((grp["l_quantity"] > 49).any()),
                "max_qty_f": int(fq.max()) if len(fq) else None,
            }
        )
    want = pd.DataFrame(rows)
    want["n_big"] = want["n_big"].astype("int64")
    want["n_discounted"] = want["n_discounted"].astype("int64")
    want["max_qty_f"] = want["max_qty_f"].astype("float64")
    got = got.copy()
    got["max_qty_f"] = got["max_qty_f"].astype("float64")
    got = _bool_str(got, ["all_positive", "any_huge"])
    want = _bool_str(want, ["all_positive", "any_huge"])
    frames_equal(got, want)


def test_agg_grouping_sets_markers(spark):
    got = _run(spark, "agg_grouping_sets")
    orders = read("orders")
    rows = []
    for status, grp in orders.groupby("o_orderstatus"):
        rows.append(
            {
                "o_orderstatus": status,
                "o_orderpriority": None,
                "g_status": 0,
                "g_priority": 1,
                "n": len(grp),
            }
        )
    for pri, grp in orders.groupby("o_orderpriority"):
        rows.append(
            {
                "o_orderstatus": None,
                "o_orderpriority": pri,
                "g_status": 1,
                "g_priority": 0,
                "n": len(grp),
            }
        )
    rows.append(
        {
            "o_orderstatus": None,
            "o_orderpriority": None,
            "g_status": 1,
            "g_priority": 1,
            "n": len(orders),
        }
    )
    want = pd.DataFrame(rows)
    for c in ["g_status", "g_priority", "n"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Correlated / lateral subqueries; recursive reachability
# ---------------------------------------------------------------------------


def test_correlated_scalar_subquery(spark):
    got = _run(spark, "correlated_scalar_subquery")
    orders = read("orders")
    avg = orders.groupby("o_custkey")["o_totalprice"].mean()
    sel = orders[
        orders["o_totalprice"]
        > 1.5 * orders["o_custkey"].map(avg)
    ]
    want = pd.DataFrame(
        {
            "order_key": sel["o_orderkey"].astype("int64"),
            "total_price": sel["o_totalprice"],
        }
    )
    frames_equal(got, want)


def test_lateral_topk_orders(spark):
    got = _run(spark, "lateral_topk_orders")
    cust, orders = read("customer"), read("orders")
    rows = []
    for ck in cust["c_custkey"]:
        mine = orders[orders["o_custkey"] == ck].sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(3)
        for r in mine.itertuples(index=False):
            rows.append(
                {
                    "cust_key": int(ck),
                    "order_key": int(r.o_orderkey),
                    "total_price": r.o_totalprice,
                }
            )
    want = pd.DataFrame(rows)
    want["cust_key"] = want["cust_key"].astype("int64")
    want["order_key"] = want["order_key"].astype("int64")
    frames_equal(got, want)


def test_sql_recursive_reachability(spark):
    got = _run(spark, "sql_recursive_reachability")
    li = read("lineitem")
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    pair_n: dict[tuple[int, int], int] = {}
    for _, grp in items.groupby("l_orderkey"):
        parts = sorted(int(p) for p in grp["l_partkey"])
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    pairs = {p for p, n in pair_n.items() if n >= 2}
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seed = min(a for a, _ in pairs)
    dist = {seed: 0}
    frontier = [seed]
    for hop in (1, 2):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        frontier = nxt
    want = pd.DataFrame(
        sorted(dist.items()), columns=["part", "hops"], dtype="int64"
    )
    frames_equal(got, want)
    assert (want["hops"] > 0).any()


# ---------------------------------------------------------------------------
# SCD2 / hypertable rollup / unpivot / try battery
# ---------------------------------------------------------------------------


def test_scd2_dimension_close_and_insert(spark):
    got = _run(spark, "scd2_dimension")
    cust = read("customer")
    t0, t1 = pd.Timestamp("2020-01-01"), pd.Timestamp("2024-01-01")
    rows = []
    for r in cust.itertuples(index=False):
        updated = r.c_custkey % 7 == 0
        if updated:
            rows.append(  # closed old version
                {
                    "cust_key": int(r.c_custkey),
                    "acctbal": r.c_acctbal,
                    "segment": r.c_mktsegment,
                    "valid_from": t0,
                    "valid_to": t1,
                    "is_current": False,
                }
            )
            rows.append(  # new current version
                {
                    "cust_key": int(r.c_custkey),
                    "acctbal": r.c_acctbal * 2,
                    "segment": "UPDATED",
                    "valid_from": t1,
                    "valid_to": None,
                    "is_current": True,
                }
            )
        else:
            rows.append(
                {
                    "cust_key": int(r.c_custkey),
                    "acctbal": r.c_acctbal,
                    "segment": r.c_mktsegment,
                    "valid_from": t0,
                    "valid_to": None,
                    "is_current": True,
                }
            )
    want = pd.DataFrame(rows)
    want["cust_key"] = want["cust_key"].astype("int64")
    got = got.copy()
    got = _bool_str(got, ["is_current"])
    want = _bool_str(want, ["is_current"])
    frames_equal(got, want)
    # SCD2 law: exactly one current row per key
    assert (
        got[got["is_current"] == "True"].groupby("cust_key").size() == 1
    ).all()


def test_hypertable_rollup_daily_lossless(spark):
    got = _run(spark, "hypertable_rollup_daily")
    ev = read("events").copy()
    ev["bucket_start"] = ev["ts"].dt.floor("D")
    rows = []
    for (bs, et), grp in ev.groupby(["bucket_start", "event_type"]):
        s = float(grp["value"].sum())
        rows.append(
            {
                "bucket_start": bs,
                "event_type": et,
                "n_events": len(grp),
                "sum_value": int(half_up([s], 4).iloc[0]) / 1e4,
                "min_value": float(grp["value"].min()),
                "max_value": float(grp["value"].max()),
            }
        )
    want = pd.DataFrame(rows)
    want["n_events"] = want["n_events"].astype("int64")
    frames_equal(got, want)


def test_unpivot_metrics_fanout(spark):
    got = _run(spark, "unpivot_metrics")
    li = read("lineitem")
    rows = []
    for r in li.itertuples(index=False):
        for metric, value in (
            ("quantity", r.l_quantity),
            ("extendedprice", r.l_extendedprice),
            ("discount", r.l_discount),
            ("tax", r.l_tax),
        ):
            rows.append(
                {
                    "order_key": int(r.l_orderkey),
                    "line_number": int(r.l_linenumber),
                    "metric": metric,
                    "value": value,
                }
            )
    want = pd.DataFrame(rows)
    want["order_key"] = want["order_key"].astype("int64")
    want["line_number"] = want["line_number"].astype("int64")
    frames_equal(got, want)
    assert len(got) == 4 * len(li)


def test_try_function_battery(spark):
    got = _run(spark, "try_function_battery")
    li = read("lineitem")
    rows = []
    for status, grp in li.groupby("l_linestatus"):
        rows.append(
            {
                "status": status,
                "n": len(grp),
                "zero_qty": int((grp["l_quantity"] == 0).sum()),
                "unit_price_ok": int((grp["l_quantity"] != 0).sum()),
                "flag_as_number": 0,  # letters never cast to BIGINT
            }
        )
    want = pd.DataFrame(rows)
    for c in ["n", "zero_qty", "unit_price_ok", "flag_as_number"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Skew-salted rewrites vs the plain formulations
# ---------------------------------------------------------------------------


def test_j_skew_salted_join_equals_plain_join(spark):
    got = _run(spark, "j_skew_salted_join")
    li, sup = read("lineitem"), read("supplier")
    j = li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    want = pd.DataFrame(
        {
            "order_key": j["l_orderkey"].astype("int64"),
            "line_number": j["l_linenumber"].astype("int64"),
            "supp_key": j["l_suppkey"].astype("int64"),
            "supp_name": j["s_name"],
        }
    )
    frames_equal(got, want)
    assert len(got) == len(li)  # supplier key is unique: no fanout


def test_agg_skew_salted_equals_plain_agg(spark):
    got = _run(spark, "agg_skew_salted")
    ev = read("events").copy()
    ev["cents"] = half_up(ev["value"], 2).to_numpy()
    g = ev.groupby("event_type").agg(
        n_events=("cents", "size"),
        value_cents=("cents", "sum"),
        min_user=("user_id", "min"),
        max_user=("user_id", "max"),
    )
    want = g.reset_index()
    for c in ["n_events", "value_cents", "min_user", "max_user"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
