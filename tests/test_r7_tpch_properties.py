"""Independent property tests for the TPC-H-shape battery
(queries_tpch.py): each adapted classic recomputed from the raw
parquet with plain pandas/numpy -- no Spark, no DuckDB -- so a
conceptual mistake shared by both twins (e.g. a wrong rounding mode
in the exact-money domain, a HAVING applied at the wrong grain, a
NOT-IN/anti-join mix-up) cannot hide behind a matching hash.

Money recomputes use the same exact integer domain the queries
declare (HALF_UP e4/cents via recompute_util.half_up), built from
numpy floor arithmetic rather than any engine round().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, half_up, read, rev_e4


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


def _eu_suppliers():
    sup, nat, reg = read("supplier"), read("nation"), read("region")
    j = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey").merge(
        reg, left_on="n_regionkey", right_on="r_regionkey"
    )
    return j


def test_q2_best_supplier_max_with_ties(spark):
    got = _run(spark, "tpch_q2_best_supplier")
    li, part = read("lineitem"), read("part")
    sp = li[["l_partkey", "l_suppkey"]].drop_duplicates()
    eu = _eu_suppliers()
    eu = eu[eu["r_name"] == "EUROPE"][["s_suppkey", "s_name", "s_acctbal"]]
    eu = eu.assign(acctbal_cents=half_up(eu["s_acctbal"], 2).to_numpy())
    cand = (
        part[(part["p_type"] == "STANDARD") & (part["p_size"] <= 10)]
        .merge(sp, left_on="p_partkey", right_on="l_partkey")
        .merge(eu, left_on="l_suppkey", right_on="s_suppkey")
    )
    mx = cand.groupby("p_partkey")["acctbal_cents"].transform("max")
    best = cand[cand["acctbal_cents"] == mx]
    want = pd.DataFrame(
        {
            "partkey": best["p_partkey"].astype("int64"),
            "part_name": best["p_name"],
            "supplier_name": best["s_name"],
            "acctbal_cents": best["acctbal_cents"].astype("int64"),
        }
    )
    frames_equal(got, want)
    # correlated-max law: every retained row carries its group's max
    assert (
        got.groupby("partkey")["acctbal_cents"].nunique() == 1
    ).all()


def test_q4_exists_counts_orders_not_lines(spark):
    """EXISTS must count each order ONCE however many late lines it
    has -- recomputed with a python set of late order keys."""
    got = _run(spark, "tpch_q4_order_priority_exists")
    orders, li = read("orders"), read("lineitem")
    o = orders[
        (orders["o_orderdate"] >= "1996-01-01")
        & (orders["o_orderdate"] < "1996-07-01")
    ]
    j = li.merge(o[["o_orderkey", "o_orderdate"]], left_on="l_orderkey", right_on="o_orderkey")
    late_keys = set(
        j.loc[
            j["l_shipdate"] > j["o_orderdate"] + pd.Timedelta(days=90),
            "l_orderkey",
        ]
    )
    sel = o[o["o_orderkey"].isin(late_keys)]
    g = sel.groupby("o_orderpriority").size()
    want = pd.DataFrame(
        {"priority": g.index, "order_count": g.astype("int64").to_numpy()}
    )
    frames_equal(got, want)
    assert got["order_count"].sum() == len(late_keys)


def test_q5_local_supplier_volume(spark):
    got = _run(spark, "tpch_q5_local_supplier_volume")
    cust, orders, li = read("customer"), read("orders"), read("lineitem")
    sup, nat, reg = read("supplier"), read("nation"), read("region")
    o = orders[
        (orders["o_orderdate"] >= "1996-01-01")
        & (orders["o_orderdate"] < "1997-01-01")
    ]
    asia = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia[asia["r_name"] == "ASIA"][["n_nationkey", "n_name"]]
    j = (
        li.merge(o[["o_orderkey", "o_custkey"]], left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[j["c_nationkey"] == j["s_nationkey"]]
    j = j.merge(asia, left_on="s_nationkey", right_on="n_nationkey")
    j = j.assign(rev=rev_e4(j["l_extendedprice"], j["l_discount"]).to_numpy())
    g = j.groupby("n_name")["rev"].sum()
    want = pd.DataFrame(
        {"nation": g.index, "revenue_e4": g.astype("int64").to_numpy()}
    )
    frames_equal(got, want)


def test_q6_scan_filter_aggregate(spark):
    got = _run(spark, "tpch_q6_forecast_revenue")
    li = read("lineitem")
    f = li[
        (li["l_shipdate"] >= "1996-01-01")
        & (li["l_shipdate"] < "1997-01-01")
        & (li["l_discount"] >= 0.05)
        & (li["l_discount"] <= 0.07)
        & (li["l_quantity"] < 24)
    ]
    delta = int(half_up(f["l_extendedprice"] * f["l_discount"], 4).sum())
    assert len(got) == 1
    assert int(got["revenue_delta_e4"].iloc[0]) == delta
    assert int(got["n_lines"].iloc[0]) == len(f)


def test_q7_volume_shipping_both_directions(spark):
    got = _run(spark, "tpch_q7_volume_shipping")
    li, orders = read("lineitem"), read("orders")
    cust, sup, nat = read("customer"), read("supplier"), read("nation")
    li = li[(li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1998-01-01")]
    j = (
        li.merge(orders[["o_orderkey", "o_custkey"]], left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey")
        .merge(sup[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
        .merge(
            nat.rename(columns={"n_nationkey": "sn_key", "n_name": "supp_nation"})[
                ["sn_key", "supp_nation"]
            ],
            left_on="s_nationkey",
            right_on="sn_key",
        )
        .merge(
            nat.rename(columns={"n_nationkey": "cn_key", "n_name": "cust_nation"})[
                ["cn_key", "cust_nation"]
            ],
            left_on="c_nationkey",
            right_on="cn_key",
        )
    )
    pair = (
        (j["supp_nation"] == "NATION_18") & (j["cust_nation"] == "NATION_19")
    ) | ((j["supp_nation"] == "NATION_19") & (j["cust_nation"] == "NATION_18"))
    j = j[pair]
    j = j.assign(
        ship_year=j["l_shipdate"].dt.year.astype("int64"),
        rev=rev_e4(j["l_extendedprice"], j["l_discount"]).to_numpy(),
    )
    g = (
        j.groupby(["supp_nation", "cust_nation", "ship_year"], as_index=False)[
            "rev"
        ]
        .sum()
        .rename(columns={"rev": "volume_e4"})
    )
    g["volume_e4"] = g["volume_e4"].astype("int64")
    frames_equal(got, g)


def test_q8_market_share_conditional_ratio(spark):
    got = _run(spark, "tpch_q8_market_share")
    li, orders = read("lineitem"), read("orders")
    cust, sup, nat, reg, part = (
        read("customer"),
        read("supplier"),
        read("nation"),
        read("region"),
        read("part"),
    )
    am = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    am_keys = set(am.loc[am["r_name"] == "AMERICA", "n_nationkey"])
    promo = set(part.loc[part["p_type"] == "PROMO", "p_partkey"])
    j = (
        li[li["l_partkey"].isin(promo)]
        .merge(orders[["o_orderkey", "o_custkey", "o_orderdate"]], left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey")
        .merge(sup[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
        .merge(
            nat.rename(columns={"n_nationkey": "sn_key", "n_name": "supp_nation"})[
                ["sn_key", "supp_nation"]
            ],
            left_on="s_nationkey",
            right_on="sn_key",
        )
    )
    j = j[j["c_nationkey"].isin(am_keys)]
    j = j.assign(
        order_year=j["o_orderdate"].dt.year.astype("int64"),
        rev=rev_e4(j["l_extendedprice"], j["l_discount"]).to_numpy(),
    )
    rows = []
    for year, grp in j.groupby("order_year"):
        nation = int(grp.loc[grp["supp_nation"] == "NATION_3", "rev"].sum())
        total = int(grp["rev"].sum())
        rows.append(
            {
                "order_year": year,
                "nation_e4": nation,
                "total_e4": total,
                "share_ppm": nation * 1_000_000 // total,
            }
        )
    frames_equal(got, pd.DataFrame(rows))


def test_q9_profit_by_nation_year(spark):
    got = _run(spark, "tpch_q9_profit_by_nation_year")
    li, part, sup, nat, orders = (
        read("lineitem"),
        read("part"),
        read("supplier"),
        read("nation"),
        read("orders"),
    )
    widget = set(part.loc[part["p_name"].str.contains("widget"), "p_partkey"])
    j = (
        li[li["l_partkey"].isin(widget)]
        .merge(sup[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        .merge(orders[["o_orderkey", "o_orderdate"]], left_on="l_orderkey", right_on="o_orderkey")
    )
    j = j.assign(
        order_year=j["o_orderdate"].dt.year.astype("int64"),
        rev=rev_e4(j["l_extendedprice"], j["l_discount"]).to_numpy(),
    )
    g = (
        j.groupby(["n_name", "order_year"], as_index=False)["rev"]
        .sum()
        .rename(columns={"n_name": "nation", "rev": "profit_e4"})
    )
    g["profit_e4"] = g["profit_e4"].astype("int64")
    frames_equal(got, g)


def test_q10_top20_returned_revenue_deterministic(spark):
    got = _run(spark, "tpch_q10_returned_items")
    cust, orders, li, nat = (
        read("customer"),
        read("orders"),
        read("lineitem"),
        read("nation"),
    )
    o = orders[
        (orders["o_orderdate"] >= "1996-10-01")
        & (orders["o_orderdate"] < "1997-01-01")
    ]
    r = li[li["l_returnflag"] == "R"]
    j = (
        r.merge(o[["o_orderkey", "o_custkey"]], left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    )
    j = j.assign(rev=rev_e4(j["l_extendedprice"], j["l_discount"]).to_numpy())
    agg = (
        j.groupby(["c_custkey", "c_name", "n_name"], as_index=False)["rev"]
        .sum()
        .sort_values(["rev", "c_custkey"], ascending=[False, True])
        .head(20)
    )
    want = pd.DataFrame(
        {
            "custkey": agg["c_custkey"].astype("int64"),
            "cust_name": agg["c_name"],
            "nation": agg["n_name"],
            "returned_e4": agg["rev"].astype("int64"),
        }
    )
    frames_equal(got, want)


def test_q12_delay_buckets_partition_all_lines(spark):
    got = _run(spark, "tpch_q12_shipping_delay_buckets")
    li, orders = read("lineitem"), read("orders")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    dd = (j["l_shipdate"].dt.normalize() - j["o_orderdate"].dt.normalize()).dt.days
    j = j.assign(dd=dd)
    rows = []
    for pri, grp in j.groupby("o_orderpriority"):
        rows.append(
            {
                "priority": pri,
                "fast_lines": int((grp["dd"] <= 30).sum()),
                "mid_lines": int(((grp["dd"] > 30) & (grp["dd"] <= 90)).sum()),
                "late_lines": int((grp["dd"] > 90).sum()),
            }
        )
    want = pd.DataFrame(rows)
    frames_equal(got, want)
    # the three buckets partition every joined line
    assert (
        got[["fast_lines", "mid_lines", "late_lines"]].to_numpy().sum()
        == len(j)
    )


def test_q13_distribution_keeps_zero_order_customers(spark):
    got = _run(spark, "tpch_q13_order_count_distribution")
    cust, orders = read("customer"), read("orders")
    q = orders[orders["o_orderpriority"] != "5-LOW"]
    per = q.groupby("o_custkey").size()
    counts = cust["c_custkey"].map(per).fillna(0).astype("int64")
    g = counts.value_counts()
    want = pd.DataFrame(
        {"c_count": g.index.astype("int64"), "custdist": g.astype("int64").to_numpy()}
    )
    frames_equal(got, want)
    # the histogram must cover every customer exactly once
    assert got["custdist"].sum() == len(cust)


def test_q14_promo_share_ppm(spark):
    got = _run(spark, "tpch_q14_promo_share")
    li, part = read("lineitem"), read("part")
    f = li[(li["l_shipdate"] >= "1996-03-01") & (li["l_shipdate"] < "1996-04-01")]
    j = f.merge(part[["p_partkey", "p_type"]], left_on="l_partkey", right_on="p_partkey")
    rev = rev_e4(j["l_extendedprice"], j["l_discount"]).to_numpy()
    promo = int(rev[(j["p_type"] == "PROMO").to_numpy()].sum())
    total = int(rev.sum())
    assert len(got) == 1
    assert int(got["promo_e4"].iloc[0]) == promo
    assert int(got["total_e4"].iloc[0]) == total
    assert int(got["promo_ppm"].iloc[0]) == promo * 1_000_000 // total


def test_q15_top_supplier_includes_ties(spark):
    got = _run(spark, "tpch_q15_top_supplier")
    li, sup = read("lineitem"), read("supplier")
    f = li[(li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1996-04-01")]
    f = f.assign(rev=rev_e4(f["l_extendedprice"], f["l_discount"]).to_numpy())
    per = f.groupby("l_suppkey")["rev"].sum()
    mx = per.max()
    top = per[per == mx]
    names = sup.set_index("s_suppkey")["s_name"]
    want = pd.DataFrame(
        {
            "suppkey": top.index.astype("int64"),
            "supplier_name": [names[k] for k in top.index],
            "total_e4": top.astype("int64").to_numpy(),
        }
    )
    frames_equal(got, want)
    assert (got["total_e4"] == int(mx)).all()


def test_q16_supplier_variety_not_in(spark):
    got = _run(spark, "tpch_q16_supplier_variety")
    part, li, sup = read("part"), read("lineitem"), read("supplier")
    bad = set(sup.loc[sup["s_acctbal"] < 1000, "s_suppkey"])
    p = part[part["p_size"].isin([5, 15, 25, 35])]
    l = li[~li["l_suppkey"].isin(bad)]
    j = p.merge(l, left_on="p_partkey", right_on="l_partkey")
    g = (
        j.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
        .nunique()
        .reset_index()
    )
    want = pd.DataFrame(
        {
            "brand": g["p_brand"],
            "type": g["p_type"],
            "size": g["p_size"].astype("int64"),
            "supplier_cnt": g["l_suppkey"].astype("int64"),
        }
    )
    frames_equal(got, want)


def test_q17_small_quantity_integer_cross_multiplication(spark):
    got = _run(spark, "tpch_q17_small_quantity_revenue")
    li, part = read("lineitem"), read("part")
    keys = set(part.loc[part["p_brand"] == "Brand#13", "p_partkey"])
    b = li[li["l_partkey"].isin(keys)].copy()
    b["qty"] = b["l_quantity"].astype("int64")
    b["rev"] = rev_e4(b["l_extendedprice"], b["l_discount"]).to_numpy()
    stats = b.groupby("l_partkey")["qty"].agg(["sum", "count"])
    b = b.join(stats, on="l_partkey")
    small = b[5 * b["qty"] * b["count"] < b["sum"]]
    assert len(got) == 1
    assert int(got["small_rev_e4"].iloc[0]) == int(small["rev"].sum())
    assert int(got["n_lines"].iloc[0]) == len(small)


def test_q18_having_on_order_grain(spark):
    got = _run(spark, "tpch_q18_large_volume_customers")
    li, orders, cust = read("lineitem"), read("orders"), read("customer")
    per = li.groupby("l_orderkey")["l_quantity"].sum().astype("int64")
    big = per[per > 250]
    o = orders[orders["o_orderkey"].isin(set(big.index))].merge(
        cust[["c_custkey", "c_name"]], left_on="o_custkey", right_on="c_custkey"
    )
    want = pd.DataFrame(
        {
            "cust_name": o["c_name"],
            "custkey": o["c_custkey"].astype("int64"),
            "orderkey": o["o_orderkey"].astype("int64"),
            "order_date": o["o_orderdate"],
            "totalprice_e4": half_up(o["o_totalprice"], 4).to_numpy(),
            "total_qty": o["o_orderkey"].map(big).astype("int64"),
        }
    )
    frames_equal(got, want)
    # HAVING law: every surviving order's recomputed quantity > 250
    assert (got["total_qty"] > 250).all()


def test_q19_disjunctive_predicates(spark):
    got = _run(spark, "tpch_q19_disjunctive_predicates")
    li, part = read("lineitem"), read("part")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    q, sz, br = j["l_quantity"], j["p_size"], j["p_brand"]
    cond = (
        ((br == "Brand#13") & sz.between(1, 5) & q.between(1, 11))
        | ((br == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((br == "Brand#20") & sz.between(1, 15) & q.between(20, 30))
    )
    sel = j[cond]
    rev = int(rev_e4(sel["l_extendedprice"], sel["l_discount"]).sum())
    assert len(got) == 1
    assert int(got["revenue_e4"].iloc[0]) == rev
    assert int(got["n_lines"].iloc[0]) == len(sel)


def test_q20_dominant_suppliers_share_threshold(spark):
    got = _run(spark, "tpch_q20_dominant_suppliers")
    li, part, sup = read("lineitem"), read("part"), read("supplier")
    widget = set(part.loc[part["p_name"].str.contains("widget"), "p_partkey"])
    wl = (
        li[li["l_partkey"].isin(widget)]
        .assign(qty=lambda d: d["l_quantity"].astype("int64"))
        .groupby(["l_partkey", "l_suppkey"], as_index=False)["qty"]
        .sum()
    )
    tot = wl.groupby("l_partkey")["qty"].transform("sum")
    dom = wl[10 * wl["qty"] > tot]
    names = sup.set_index("s_suppkey")["s_name"]
    keys = sorted(set(dom["l_suppkey"]))
    want = pd.DataFrame(
        {
            "suppkey": pd.Series(keys, dtype="int64"),
            "supplier_name": [names[k] for k in keys],
        }
    )
    frames_equal(got, want)
