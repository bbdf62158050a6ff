"""Independent property tests for staged driver-window queries
(round-6 consolidation, VERDICT r5 #5: "deepen tests for the r5
additions" instead of growing the surface).

These queries were previously pinned ONLY by their DuckDB twins. The
twin is a strong cross-engine check, but both sides are written from
the same reasoning and can share a conceptual mistake; each test here
recomputes the CLAIMED PROPERTY from the raw parquet with plain
pandas/numpy/hashlib -- no Spark expressions, no DuckDB SQL -- so a
shared-twin bug cannot hide.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES

from tests.recompute_util import SF  # env-overridable scale


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


def _half_up_cents(x: pd.Series) -> pd.Series:
    # Spark F.round = HALF_UP (away from zero); numpy round is
    # half-even, so spell it out
    v = x * 100.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64")


def test_k_anonymity_violations_match_pandas_recount(spark):
    from etl_building_inspector_spark.plans.queries_llm11 import KANON_K

    got = _run(spark, "privacy_k_anonymity")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    band = (_half_up_cents(cust["c_acctbal"]) + 100000) // 100000
    sizes = (
        cust.assign(bal_band=band)
        .groupby(["c_nationkey", "c_mktsegment", "bal_band"])
        .size()
    )
    want = {
        (int(n), s, int(b)): int(c)
        for (n, s, b), c in sizes.items()
        if c < KANON_K
    }
    have = {
        (int(r.c_nationkey), r.c_mktsegment, int(r.bal_band)): int(r.group_size)
        for r in got.itertuples()
    }
    assert have == want  # exact violation set, not just subset


def test_whitening_output_is_zero_mean_unit_variance(spark):
    """The whole point of whitening: per-dimension population mean 0,
    population std 1 (checked from the OUTPUT, not the formula)."""
    got = _run(spark, "emb_whitening_apply")
    # the query's mean/std come from 2^20-quantized integer atoms
    # (cross-engine exactness) applied to the raw doubles, so the
    # output stats sit within ~2^-20 quantization of ideal, not at
    # machine epsilon
    for dim, g in got.groupby("dim"):
        w = g["w"].to_numpy()
        assert abs(w.mean()) < 1e-4, f"dim {dim} mean {w.mean()}"
        assert abs(w.std(ddof=0) - 1.0) < 1e-4, f"dim {dim} std {w.std(ddof=0)}"
    # every (vec, dim) cell exactly once
    assert len(got) == got["vec_id"].nunique() * got["dim"].nunique()


def test_equi_depth_histogram_invariants(spark):
    from etl_building_inspector_spark.plans.queries_surface8 import (
        EQUI_DEPTH_BUCKETS,
    )

    got = _run(spark, "histogram_equi_depth").sort_values("bucket")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    assert list(got["bucket"]) == list(range(1, EQUI_DEPTH_BUCKETS + 1))
    assert got["n"].sum() == len(orders)  # every row in exactly one bucket
    assert got["n"].max() - got["n"].min() <= 1  # equi-DEPTH
    # ntile assigns the larger buckets first
    assert list(got["n"]) == sorted(got["n"], reverse=True)
    # value ranges are ordered and non-overlapping (ties at the seam
    # can share a value, but never invert)
    for prev, nxt in zip(got.itertuples(), list(got.itertuples())[1:]):
        assert prev.min_cents <= prev.max_cents
        assert prev.max_cents <= nxt.min_cents
    # bucket sums reconcile against the raw data
    assert got["sum_cents"].sum() == _half_up_cents(orders["o_totalprice"]).sum()


def test_zscore_anomaly_flags_match_pandas_recompute(spark):
    from etl_building_inspector_spark.plans.queries_surface8 import (
        ZSCORE_BASELINE,
        ZSCORE_K,
    )

    got = _run(spark, "timeseries_zscore_anomaly")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    daily = (
        ev.assign(
            day=ev["ts"].dt.normalize(), cents=_half_up_cents(ev["value"])
        )
        .groupby(["event_type", "day"], as_index=False)["cents"]
        .sum()
        .sort_values(["event_type", "day"])
    )
    want = {}
    n, k2 = ZSCORE_BASELINE, ZSCORE_K * ZSCORE_K
    for et, g in daily.groupby("event_type"):
        c = g["cents"].to_numpy()
        days = g["day"].dt.date.to_numpy()
        for i in range(n, len(c)):
            base = c[i - n : i]
            s, q = int(base.sum()), int((base.astype(object) ** 2).sum())
            dev = n * int(c[i]) - s
            want[(et, days[i])] = (
                dev * dev,
                k2 * (n * q - s * s),
            )
    have = {
        (r.event_type, r.day): (int(r.lhs), int(r.rhs))
        for r in got.itertuples()
    }
    assert have == want
    for r in got.itertuples():
        assert bool(r.is_anomaly) == (r.lhs > r.rhs)


def test_benford_digit_audit_recount(spark):
    got = _run(spark, "dq_benford_first_digit").set_index("digit")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    first = (
        _half_up_cents(orders["o_totalprice"]).astype(str).str.lstrip("-").str[0]
    ).astype(int)
    counts = first.value_counts()
    total = int(counts.sum())
    assert total == len(orders)
    for d in got.index:
        n = int(counts.get(d, 0))
        assert int(got.loc[d, "n"]) == n
        assert int(got.loc[d, "observed_ppm"]) == (1_000_000 * n) // total
        exp = math.floor(1e6 * math.log10(1 + 1 / d))
        assert int(got.loc[d, "expected_ppm"]) == exp
        assert int(got.loc[d, "dev_ppm"]) == abs((1_000_000 * n) // total - exp)


def test_systematic_sample_is_every_kth_in_md5_order(spark):
    from etl_building_inspector_spark.plans.queries_surface7 import (
        _SYSTEMATIC_K as K,
    )

    got = set(_run(spark, "sample_systematic")["o_orderkey"])
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    keys = sorted(
        orders["o_orderkey"],
        key=lambda k: (hashlib.md5(str(k).encode()).hexdigest(), k),
    )
    want = set(keys[::K])
    assert got == want
    assert len(got) == math.ceil(len(orders) / K)  # exact 1/k size


def test_url_canonicalize_collapses_each_page_group(spark):
    got = _run(spark, "dedup_url_canonicalize")
    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def canon(doc_id, source):
        m = doc_id % 3
        page = doc_id // 3
        if m == 0:
            url = f"https://www.Example-{source}.com/docs/{page}"
        elif m == 1:
            url = f"HTTPS://EXAMPLE-{source}.COM/docs/{page}/"
        else:
            url = f"https://example-{source}.com/docs/{page}?utm_source=feed&utm_medium=rss"
        url = url.lower()
        url = re.sub(r"^https://www\.", "https://", url)
        url = re.sub(r"\?utm[a-z_=&]*$", "", url)
        return re.sub(r"/$", "", url)

    docs = docs.assign(
        cu=[canon(int(d), s) for d, s in zip(docs["doc_id"], docs["source"])]
    )
    want = (
        docs.groupby("cu")
        .agg(kept=("doc_id", "min"), n=("doc_id", "size"))
        .reset_index()
    )
    have = {r.canonical_url: (r.kept_doc_id, r.n_variants) for r in got.itertuples()}
    assert have == {r.cu: (r.kept, r.n) for r in want.itertuples()}
    # canonical forms carry no scheme noise, tracking params, or
    # trailing slash
    for u in have:
        assert not u.startswith("https://www.")
        assert "utm" not in u and not u.endswith("/")
        assert u == u.lower()


def test_assortativity_matches_numpy_pearson(spark):
    got = _run(spark, "graph_degree_assortativity").iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    pairs = li.merge(li, on="l_orderkey")
    pairs = pairs[pairs["l_partkey_x"] != pairs["l_partkey_y"]]
    u = np.minimum(pairs["l_partkey_x"], pairs["l_partkey_y"])
    v = np.maximum(pairs["l_partkey_x"], pairs["l_partkey_y"])
    e0 = pd.DataFrame({"u": u, "v": v}).drop_duplicates()
    s = pd.concat([e0["u"], e0["v"]]).to_numpy()
    d = pd.concat([e0["v"], e0["u"]]).to_numpy()
    deg = pd.Series(s).value_counts()
    x, y = deg[s].to_numpy(dtype=float), deg[d].to_numpy(dtype=float)
    assert int(got["n"]) == len(x) == 2 * len(e0)
    r = np.corrcoef(x, y)[0, 1]
    assert got["assortativity"] == pytest.approx(r, abs=1e-9)


def test_referential_and_uniqueness_audits_recount(spark):
    got_ri = _run(spark, "dq_referential_integrity").set_index("relation")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want_ri = {
        "lineitem->orders": (~li["l_orderkey"].isin(orders["o_orderkey"])).sum(),
        "lineitem->part": (~li["l_partkey"].isin(part["p_partkey"])).sum(),
        "orders->customer": (~orders["o_custkey"].isin(cust["c_custkey"])).sum(),
        "customer->nation": (~cust["c_nationkey"].isin(nation["n_nationkey"])).sum(),
    }
    assert {k: int(got_ri.loc[k, "orphans"]) for k in want_ri} == {
        k: int(v) for k, v in want_ri.items()
    }
    got_u = _run(spark, "dq_uniqueness_violations").set_index("constraint_name")
    want_u = {
        "lineitem_pk": (li.groupby(["l_orderkey", "l_linenumber"]).size() > 1).sum(),
        "orders_pk": (orders.groupby("o_orderkey").size() > 1).sum(),
        "events_pk": (ev.groupby("event_id").size() > 1).sum(),
        "documents_pk": (docs.groupby("doc_id").size() > 1).sum(),
    }
    assert {k: int(got_u.loc[k, "violating_keys"]) for k in want_u} == {
        k: int(v) for k, v in want_u.items()
    }


def test_ohlc_daily_matches_pandas_resample(spark):
    got = _run(spark, "timeseries_ohlc_daily")
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["ts", "event_id"])
    ev = ev.assign(day=ev["ts"].dt.date)
    want = ev.groupby("day").agg(
        open=("value", "first"),
        high=("value", "max"),
        low=("value", "min"),
        close=("value", "last"),
        volume=("value", "size"),
    )
    assert len(got) == len(want)
    for r in got.itertuples():
        w = want.loc[r.day]
        assert (r.open, r.high, r.low, r.close, r.volume) == (
            w["open"], w["high"], w["low"], w["close"], w["volume"],
        )


def test_seasonal_naive_error_is_lag7(spark):
    got = _run(spark, "timeseries_seasonal_naive_error")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    daily = (
        orders.assign(cents=_half_up_cents(orders["o_totalprice"]))
        .groupby("o_orderdate")["cents"]
        .sum()
        .sort_index()
    )
    fc = daily.shift(7)
    want = {
        d: (int(c), int(f), abs(int(c) - int(f)))
        for (d, c), f in zip(daily.items(), fc)
        if not pd.isna(f)
    }
    have = {
        r.day: (int(r.cents), int(r.forecast_cents), int(r.abs_err_cents))
        for r in got.itertuples()
    }
    assert have == want


def test_percentiles_battery_matches_numpy_linear(spark):
    got = _run(spark, "percentiles_exact_battery")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    cents = cust.assign(c=_half_up_cents(cust["c_acctbal"]))
    for r in got.itertuples():
        vals = cents.loc[cents["c_nationkey"] == r.nation, "c"].to_numpy()
        assert r.val == pytest.approx(
            np.percentile(vals, 100 * r.p, method="linear"), abs=1e-6
        )


def test_mode_exact_deterministic_tiebreak(spark):
    got = _run(spark, "agg_mode_exact")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    counts = (
        orders.groupby(["o_orderpriority", "o_orderstatus"])
        .size()
        .reset_index(name="n")
    )
    want = {}
    for grp, g in counts.groupby("o_orderpriority"):
        top = g.sort_values(["n", "o_orderstatus"], ascending=[False, True]).iloc[0]
        want[grp] = (top["o_orderstatus"], int(top["n"]))
    assert {
        r.priority: (r.mode_status, int(r.n)) for r in got.itertuples()
    } == want


def test_sequence_pattern_matches_python_regex(spark):
    got = _run(spark, "events_sequence_pattern")
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["ts", "event_id"])
    want = {}
    for uid, g in ev.groupby("user_id"):
        path = "".join(t[0] for t in g["event_type"])
        want[int(uid)] = (len(path), len(re.findall(r"v[cs]*p", path)))
    assert {
        int(r.user_id): (int(r.path_len), int(r.n_conversions))
        for r in got.itertuples()
    } == want


def test_intervals_intersection_brute_force(spark):
    got = {
        int(r.user_id): int(r.overlap_seconds)
        for r in _run(spark, "intervals_intersection_total").itertuples()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    epoch = pd.Timestamp("1970-01-01")
    ev = ev.assign(s=((ev["ts"] - epoch).dt.total_seconds()).astype("int64"))

    def merged(g, dur):
        iv = sorted((int(s), int(s) + dur) for s in g)
        out = []
        for s, e in iv:
            if out and s <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], e))
            else:
                out.append((s, e))
        return out

    want = {}
    for uid, g in ev.groupby("user_id"):
        a = merged(g.loc[g["event_type"] == "view", "s"], 1800)
        b = merged(g.loc[g["event_type"] == "purchase", "s"], 3600)
        tot = sum(
            max(0, min(ae, be) - max(as_, bs))
            for as_, ae in a
            for bs, be in b
        )
        if tot > 0:
            want[int(uid)] = tot
    assert got == want


def test_temperature_mixture_allocates_exact_budget(spark):
    from etl_building_inspector_spark.plans.queries_llm9 import MIX_BUDGET

    got = _run(spark, "corpus_temperature_mixture")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n = docs.groupby("source").size()
    assert set(got["source"]) == set(n.index)
    # largest-remainder: the allocation sums EXACTLY to the budget
    assert int(got["alloc"].sum()) == MIX_BUDGET
    # each source's allocation is within 1 of its exact proportional
    # share of n^2 weights
    w = (n**2).astype("int64")
    for r in got.itertuples():
        exact = MIX_BUDGET * int(w[r.source]) / int(w.sum())
        assert exact - 1 <= r.alloc <= exact + 1
        assert int(r.n_docs) == int(n[r.source])


def test_bitemporal_as_of_matches_python_rebuild(spark):
    """Rebuild 'value at V as known at T' naively in python: restrict
    to txn-visible versions FIRST, then chain valid intervals per
    customer. (The classic-bug formulation -- chain before the txn
    filter -- happens to coincide on this fixture's V/T, so the bug
    class is pinned by the pipeline goldens instead; this test pins
    exact row-level equality with an independent rebuild.)"""
    from etl_building_inspector_spark.plans.queries_surface8 import (
        BT_TXN_AS_OF,
        BT_TXN_LAG_MOD,
        BT_VALID_AS_OF,
    )

    got = _run(spark, "bitemporal_as_of_join")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    V = pd.Timestamp(BT_VALID_AS_OF).date()
    T = pd.Timestamp(BT_TXN_AS_OF).date()

    def rebuild(filter_first: bool):
        rows = []
        for r in orders.itertuples():
            vf = r.o_orderdate if hasattr(r.o_orderdate, "year") else r.o_orderdate
            vf = pd.Timestamp(vf).date()
            txn = vf + pd.Timedelta(days=int(r.o_orderkey % BT_TXN_LAG_MOD))
            rows.append((int(r.o_custkey), vf, txn.date() if hasattr(txn, "date") else txn, int(r.o_orderkey), int(_half_up_cents(pd.Series([r.o_totalprice])).iloc[0])))
        out = {}
        for cust in {r[0] for r in rows}:
            versions = sorted(
                (r for r in rows if r[0] == cust), key=lambda r: (r[1], r[3])
            )
            if filter_first:
                versions = [r for r in versions if r[2] <= T]
            chained = [
                (*v, versions[i + 1][1] if i + 1 < len(versions) else None)
                for i, v in enumerate(versions)
            ]
            if not filter_first:
                chained = [c for c in chained if c[2] <= T]
            for c in chained:
                if c[1] <= V and (c[5] is None or c[5] > V):
                    out[(c[0], c[1], c[2])] = c[4]
        return out

    want = rebuild(filter_first=True)
    have = {
        (int(r.custkey), r.valid_from, r.txn_date): int(r.price_cents)
        for r in got.itertuples()
    }
    assert have == want


def test_audience_overlap_set_arithmetic(spark):
    got = _run(spark, "audience_overlap_daily")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    du = ev.assign(day=ev["ts"].dt.date)[["day", "user_id"]].drop_duplicates()
    by_day = {d: set(g["user_id"]) for d, g in du.groupby("day")}
    want = {}
    for d in by_day:
        prev = d - pd.Timedelta(days=1)
        if prev in by_day:
            t, y = by_day[d], by_day[prev]
            want[d] = (len(t), len(t & y), len(t - y))
    have = {
        r.day: (int(r.n_active), int(r.n_retained), int(r.n_new))
        for r in got.itertuples()
    }
    assert have == want
    for a, r, n in have.values():
        assert a == r + n  # growth accounting conserves


def test_event_order_inversions_recount(spark):
    got = _run(spark, "dq_event_order_inversions")
    ev = pd.read_parquet(f"{SF}/events.parquet")[["user_id", "event_id", "ts"]]
    late = ev[ev["event_id"] % 50 == 0].assign(
        event_id=lambda d: d["event_id"] + 10_000_000,
        ts=lambda d: d["ts"] - pd.Timedelta(hours=2),
    )
    feed = pd.concat([ev, late]).sort_values(["user_id", "event_id"])
    epoch = pd.Timestamp("1970-01-01")
    # unix_timestamp()/epoch() floor EACH timestamp to whole seconds
    # before subtracting (not the difference)
    feed = feed.assign(
        es=((feed["ts"] - epoch).dt.total_seconds()).apply(math.floor)
    )
    want = {}
    for uid, g in feed.groupby("user_id"):
        prev_ts = g["ts"].shift(1)
        inv = g["ts"] < prev_ts
        if inv.sum() > 0:
            back = (g["es"].shift(1) - g["es"])[inv].max()
            want[int(uid)] = (len(g), int(inv.sum()), int(back))
    have = {
        int(r.user_id): (int(r.n_events), int(r.n_inversions), int(r.max_backstep_seconds))
        for r in got.itertuples()
    }
    assert have == want


def test_lead_lag_battery_matches_pandas_shift(spark):
    got = _run(spark, "window_lead_lag_battery")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[li["l_suppkey"] < 5]
    d = pd.to_datetime(li["l_shipdate"])
    monthly = (
        li.assign(
            ym=d.dt.year * 100 + d.dt.month,
            cents=_half_up_cents(li["l_extendedprice"]),
        )
        .groupby(["l_suppkey", "ym"], as_index=False)["cents"]
        .sum()
        .sort_values(["l_suppkey", "ym"])
    )
    want = {}
    for sk, g in monthly.groupby("l_suppkey"):
        c = g["cents"]
        for ym, cents, p1, p2, n1, pd1 in zip(
            g["ym"], c,
            c.shift(1, fill_value=0), c.shift(2, fill_value=-1),
            c.shift(-1, fill_value=0), c.shift(1),
        ):
            delta = 0 if pd.isna(pd1) else int(cents) - int(pd1)
            want[(int(sk), int(ym))] = (
                int(cents), int(p1), int(p2), int(n1), delta,
            )
    have = {
        (int(r.suppkey), int(r.ym)): (
            int(r.cents), int(r.prev1), int(r.prev2), int(r.next1), int(r.delta)
        )
        for r in got.itertuples()
    }
    assert have == want


def test_money_precision_audit_recount(spark):
    got = _run(spark, "dq_money_precision_audit").set_index("col")
    tables = {
        "o_totalprice": pd.read_parquet(f"{SF}/orders.parquet")["o_totalprice"],
        "l_extendedprice": pd.read_parquet(f"{SF}/lineitem.parquet")["l_extendedprice"],
        "c_acctbal": pd.read_parquet(f"{SF}/customer.parquet")["c_acctbal"],
    }
    for col, v in tables.items():
        v100 = v * 100.0
        subcent = v100 != (np.sign(v100) * np.floor(np.abs(v100) + 0.5))
        r = got.loc[col]
        assert int(r["n_rows"]) == len(v)
        assert int(r["n_negative"]) == int((v < 0).sum())
        assert int(r["n_zero"]) == int((v == 0).sum())
        assert int(r["n_subcent"]) == int(subcent.sum())


def _py_tokens(text: str) -> list[str]:
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")


def test_word_length_histogram_recount(spark):
    got = {
        int(r.token_len): int(r.n_tokens)
        for r in _run(spark, "text_word_length_histogram").itertuples()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    from collections import Counter

    c = Counter(
        min(len(t), 15) for txt in docs["text"] for t in _py_tokens(txt)
    )
    assert got == dict(c)


def test_cohort_ltv_curve_recompute(spark):
    got = _run(spark, "cohort_ltv_curve")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    d = pd.to_datetime(orders["o_orderdate"])
    o = orders.assign(
        midx=d.dt.year * 12 + d.dt.month - 1,
        cents=_half_up_cents(orders["o_totalprice"]),
    )
    cohort = o.groupby("o_custkey")["midx"].min().rename("cohort")
    a = o.join(cohort, on="o_custkey")
    a = a.assign(age=a["midx"] - a["cohort"])
    m = (
        a.groupby(["cohort", "age"])
        .agg(n_active=("o_custkey", "nunique"), cents=("cents", "sum"))
        .reset_index()
        .sort_values(["cohort", "age"])
    )
    m = m.assign(cum=m.groupby("cohort")["cents"].cumsum())
    want = {
        (int((r.cohort // 12) * 100 + r.cohort % 12 + 1), int(r.age)): (
            int(r.n_active), int(r.cents), int(r.cum)
        )
        for r in m.itertuples()
    }
    have = {
        (int(r.cohort_ym), int(r.age_months)): (
            int(r.n_active), int(r.cents), int(r.cum_cents)
        )
        for r in got.itertuples()
    }
    assert have == want


def test_local_clustering_matches_bruteforce_triangles(spark):
    """Brute-force the co-purchase graph in python sets: triangle
    count per vertex, degree, wedges -- then compare the query's
    top-K rows (same deterministic ordering)."""
    from etl_building_inspector_spark.plans.queries_surface10 import (
        CLUSTERING_TOP_K,
    )

    got = _run(spark, "graph_local_clustering")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    adj: dict[int, set[int]] = {}
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(set(g["l_partkey"]))
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
    tri = {u: 0 for u in adj}
    for u in adj:
        for v in adj[u]:
            if v > u:
                for w in adj[u] & adj[v]:
                    if w > v:
                        tri[u] += 1
                        tri[v] += 1
                        tri[w] += 1
    rows = sorted(
        (
            (u, len(adj[u]), len(adj[u]) * (len(adj[u]) - 1) // 2, tri[u])
            for u in adj
        ),
        key=lambda r: (-r[3], r[0]),
    )[:CLUSTERING_TOP_K]
    have = [
        (int(r.vertex), int(r.degree), int(r.n_wedges), int(r.n_triangles))
        for r in got.itertuples()
    ]
    assert have == rows


def test_hll_eval_matches_python_reimplementation(spark):
    """Full independent HLL: same md5 bit layout re-derived with
    hashlib + int arithmetic, plus exact distinct via pandas."""
    from etl_building_inspector_spark.plans.queries_llm9 import (
        HLL_M,
        _HLL_NUM,
    )

    got = _run(spark, "sketch_hll_distinct_eval")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    want = {}
    for et, g in ev.groupby("event_type"):
        regs: dict[int, int] = {}
        for uid in g["user_id"]:
            h = hashlib.md5(str(int(uid)).encode()).hexdigest()
            reg = int(h[:2], 16) % HLL_M
            v = int(h[2:14], 16)
            rho = 49 - v.bit_length() if v else 49
            regs[reg] = max(regs.get(reg, 0), rho)
        z_int = sum(1 << (49 - m) for m in regs.values()) + (
            HLL_M - len(regs)
        ) * 2**49
        est = _HLL_NUM / z_int
        n_exact = g["user_id"].nunique()
        want[et] = (
            n_exact,
            len(regs),
            est,
            math.floor(abs(est - n_exact) * 1e6 / n_exact),
        )
    for r in got.itertuples():
        ne, nr, est, err = want[r.event_type]
        assert (int(r.n_exact), int(r.n_regs)) == (ne, nr)
        assert r.hll_est == pytest.approx(est, rel=1e-12)
        assert int(r.err_ppm) == err


def test_scd2_as_of_read_reconstructs_preupdate_state(spark):
    got = _run(spark, "scd2_as_of_read")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    # pivot 2022-06-01 predates every 2024 update: every key appears
    # exactly once with its ORIGINAL value, including the %7 keys
    assert sorted(got["cust_key"]) == sorted(cust["c_custkey"])
    orig = cust.set_index("c_custkey")
    for r in got.itertuples():
        assert r.acctbal == orig.loc[r.cust_key, "c_acctbal"]
        assert r.segment == orig.loc[r.cust_key, "c_mktsegment"]
        assert r.segment != "UPDATED"


def test_interpurchase_stats_recompute(spark):
    from etl_building_inspector_spark.plans.queries_surface8 import (
        INTERPURCHASE_MIN_ORDERS,
    )

    got = _run(spark, "customer_interpurchase_stats")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    o = orders.assign(d=pd.to_datetime(orders["o_orderdate"])).sort_values(
        ["o_custkey", "d", "o_orderkey"]
    )
    want = {}
    for ck, g in o.groupby("o_custkey"):
        if len(g) < INTERPURCHASE_MIN_ORDERS:
            continue
        gaps = g["d"].diff().dt.days.dropna().astype(int)
        want[int(ck)] = (
            len(g), int(gaps.min()), int(gaps.max()),
            int(gaps.sum()) // len(gaps),
        )
    have = {
        int(r.custkey): (
            int(r.n_orders), int(r.min_gap_days), int(r.max_gap_days),
            int(r.avg_gap_days),
        )
        for r in got.itertuples()
    }
    assert have == want


def test_volume_anomaly_median_recompute(spark):
    got = _run(spark, "dq_volume_anomaly_daily")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    daily = (
        ev.assign(day=ev["ts"].dt.date)
        .groupby(["event_type", "day"])
        .size()
        .reset_index(name="n")
        .sort_values(["event_type", "day"])
    )
    want = {}
    for et, g in daily.groupby("event_type"):
        n = g["n"].tolist()
        days = g["day"].tolist()
        for i in range(7, len(n)):
            med = sorted(n[i - 7 : i])[3]  # exact middle of 7
            want[(et, days[i])] = (
                n[i], med, n[i] > 2 * med or 2 * n[i] < med,
            )
    have = {
        (r.event_type, r.day): (int(r.n_events), int(r.med7), bool(r.is_anomaly))
        for r in got.itertuples()
    }
    assert have == want


def test_gap_time_buckets_recount(spark):
    from etl_building_inspector_spark.plans.queries_surface13 import (
        GAP_BUCKETS,
    )

    got = {
        r.bucket: int(r.n_gaps)
        for r in _run(spark, "events_gap_time_buckets").itertuples()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    from collections import Counter

    c: Counter = Counter()
    epoch = pd.Timestamp("1970-01-01")
    ev = ev.assign(us=((ev["ts"] - epoch) // pd.Timedelta(microseconds=1)))
    for _, g in ev.groupby("user_id"):
        for gap in g["us"].diff().dropna():
            for name, hi in GAP_BUCKETS:
                if gap <= hi:
                    c[name] += 1
                    break
            else:
                c["gt_1h"] += 1
    assert got == dict(c)


def test_emb_dimension_stats_recompute(spark):
    from etl_building_inspector_spark.plans.queries_llm7 import _EMB_SCALE

    got = _run(spark, "emb_dimension_stats")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    n = mat.shape[0]
    for r in got.itertuples():
        col = mat[:, int(r.dim) - 1]
        ssum = int(np.floor(col * _EMB_SCALE).astype("int64").sum())
        assert int(r.n) == n
        assert int(r.sum_scaled) == ssum
        assert r.min_v == col.min() and r.max_v == col.max()
        assert r.mean_v == pytest.approx(ssum / n / _EMB_SCALE, rel=1e-12)


def test_ratio_to_report_shares_recompute(spark):
    got = _run(spark, "window_ratio_to_report")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j = j.assign(cents=_half_up_cents(j["o_totalprice"]))
    rev = (
        j.groupby(["c_nationkey", "c_mktsegment"])["cents"].sum().reset_index()
    )
    tot = rev.groupby("c_nationkey")["cents"].transform("sum")
    rev = rev.assign(share=(rev["cents"] * 1_000_000) // tot)
    want = {
        (int(r.c_nationkey), r.c_mktsegment): (int(r.cents), int(r.share))
        for r in rev.itertuples()
    }
    have = {
        (int(r.nationkey), r.segment): (int(r.cents), int(r.share_ppm))
        for r in got.itertuples()
    }
    assert have == want
    # shares within each nation sum to <= 1e6 and within rounding of it
    for nk, g in got.groupby("nationkey"):
        s = g["share_ppm"].sum()
        assert 1_000_000 - len(g) < s <= 1_000_000


def test_first_last_battery_under_total_order(spark):
    got = _run(spark, "window_first_last_value_battery")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    cust = cust.assign(cents=_half_up_cents(cust["c_acctbal"]))
    want = {}
    for nk, g in cust.groupby("c_nationkey"):
        o = g.sort_values(["cents", "c_custkey"])["c_custkey"].tolist()
        want[int(nk)] = (o[0], o[1] if len(o) > 1 else None, o[-1])
    have = {
        int(r.nationkey): (
            int(r.first_cust),
            None if pd.isna(r.second_cust) else int(r.second_cust),
            int(r.last_cust),
        )
        for r in got.itertuples()
    }
    assert have == want


def test_acf_lag1_sufficient_stats_recompute(spark):
    got = _run(spark, "timeseries_acf_lag1")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    v = ev["value"]
    units = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64")
    daily = (
        ev.assign(day=ev["ts"].dt.date, units=units)
        .groupby(["event_type", "day"])["units"]
        .sum()
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    want = {}
    for et, g in daily.groupby("event_type"):
        u = g["units"].to_numpy()
        x, y = u[:-1].astype(object), u[1:].astype(object)
        n = len(x)
        want[et] = (
            n,
            n * sum(a * b for a, b in zip(x, y)) - sum(x) * sum(y),
            n * sum(a * a for a in x) - sum(x) * sum(x),
            n * sum(b * b for b in y) - sum(y) * sum(y),
        )
    have = {
        r.event_type: (
            int(r.n_pairs), int(r.corr_num), int(r.corr_den_x), int(r.corr_den_y)
        )
        for r in got.itertuples()
    }
    assert have == want


def test_rake_keywords_python_reimplementation(spark):
    from etl_building_inspector_spark.plans.queries_llm9 import (
        RAKE_STOPWORDS,
        RAKE_TOPK,
    )

    got = _run(spark, "text_rake_keywords")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    freq: dict[str, int] = {}
    degree: dict[str, int] = {}
    for txt in docs["text"]:
        phrase: list[str] = []
        phrases: list[list[str]] = []
        for t in _py_tokens(txt):
            if t in RAKE_STOPWORDS:
                if phrase:
                    phrases.append(phrase)
                phrase = []
            else:
                phrase.append(t)
        if phrase:
            phrases.append(phrase)
        for ph in phrases:
            for w in ph:
                freq[w] = freq.get(w, 0) + 1
                degree[w] = degree.get(w, 0) + len(ph)
    rows = sorted(
        (
            (w, freq[w], degree[w], (1_000_000 * degree[w]) // freq[w])
            for w in freq
        ),
        key=lambda r: (-r[3], r[0]),
    )[:RAKE_TOPK]
    have = [
        (r.word, int(r.freq), int(r.degree), int(r.score_ppm))
        for r in got.itertuples()
    ]
    assert have == rows


def test_pivot_event_counts_crosstab(spark):
    got = _run(spark, "pivot_event_counts").set_index("day")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ct = pd.crosstab(ev["ts"].dt.date, ev["event_type"])
    assert len(got) == len(ct)
    for day, row in ct.iterrows():
        for t in ("click", "error", "purchase", "signup", "view"):
            assert int(got.loc[day, t]) == int(row.get(t, 0))


def test_privacy_release_gate_composition(spark):
    from etl_building_inspector_spark.plans.queries_llm16 import GATE_K, GATE_L

    got = _run(spark, "privacy_release_gate")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    band = (_half_up_cents(cust["c_acctbal"]) + 100000) // 100000
    g = (
        cust.assign(bal_band=band)
        .groupby(["c_nationkey", "bal_band"])
        .agg(size=("c_custkey", "size"), ldiv=("c_mktsegment", "nunique"))
    )
    want = {
        (int(n), int(b)): (
            int(r["size"]), int(r["ldiv"]),
            int(r["size"] >= GATE_K), int(r["ldiv"] >= GATE_L),
            int(r["size"] >= GATE_K and r["ldiv"] >= GATE_L),
        )
        for (n, b), r in g.iterrows()
    }
    have = {
        (int(r.c_nationkey), int(r.bal_band)): (
            int(r.group_size), int(r.n_distinct_sensitive),
            int(r.k_ok), int(r.l_ok), int(r.released),
        )
        for r in got.itertuples()
    }
    assert have == want


def test_distribution_drift_tvd_recompute(spark):
    from etl_building_inspector_spark.plans.queries_surface8 import (
        DRIFT_BUCKET_CENTS,
        DRIFT_SPLIT_DAY,
    )

    got = _run(spark, "dq_distribution_drift")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    split = pd.Timestamp(DRIFT_SPLIT_DAY).date()
    cents = _half_up_cents(ev["value"])
    e = ev.assign(
        half=(ev["ts"].dt.date > split).astype(int),
        bucket=cents // DRIFT_BUCKET_CENTS,
    )
    want = {}
    for et, g in e.groupby("event_type"):
        b = g.groupby(["bucket", "half"]).size().unstack(fill_value=0)
        n1 = b.get(0, pd.Series(0, index=b.index))
        n2 = b.get(1, pd.Series(0, index=b.index))
        t1, t2 = int(n1.sum()), int(n2.sum())
        num = int(sum(abs(int(a) * t2 - int(c) * t1) for a, c in zip(n1, n2)))
        want[et] = (t1, t2, len(b), (1_000_000 * num) // (2 * t1 * t2))
    have = {
        r.event_type: (int(r.n_early), int(r.n_late), int(r.n_buckets), int(r.tvd_ppm))
        for r in got.itertuples()
    }
    assert have == want


def test_range_frames_trailing_hour_recompute(spark):
    got = _run(spark, "window_range_frames")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    epoch = pd.Timestamp("1970-01-01")
    e = ev.assign(
        sec=((ev["ts"] - epoch).dt.total_seconds()).apply(math.floor),
        v4=(np.sign(ev["value"] * 10000.0)
            * np.floor(np.abs(ev["value"] * 10000.0) + 0.5)).astype("int64"),
    )
    want = {}
    for uid, g in e.groupby("user_id"):
        secs = g["sec"].to_numpy()
        v4 = g["v4"].to_numpy()
        for eid, s in zip(g["event_id"], secs):
            mask = (secs >= s - 3599) & (secs <= s)
            want[(int(uid), int(eid))] = (int(s), int(v4[mask].sum()), int(mask.sum()))
    have = {
        (int(r.user_id), int(r.event_id)): (int(r.sec), int(r.v4_1h), int(r.n_1h))
        for r in got.itertuples()
    }
    assert have == want


def test_hopping_window_two_windows_per_event(spark):
    got = _run(spark, "streaming_hopping_window_agg")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    epoch = pd.Timestamp("1970-01-01")
    secs = ((ev["ts"] - epoch).dt.total_seconds()).apply(math.floor)
    v4 = (
        np.sign(ev["value"] * 10000.0)
        * np.floor(np.abs(ev["value"] * 10000.0) + 0.5)
    ).astype("int64")
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for s, v in zip(secs, v4):
        base = (s // 1800) * 1800
        for start in (base, base - 1800):
            if start <= s < start + 3600:
                agg[start][0] += 1
                agg[start][1] += int(v)
    want = {
        pd.Timestamp(s, unit="s"): tuple(v) for s, v in agg.items()
    }
    have = {
        r.window_start: (int(r.n_events), int(r.value_e4))
        for r in got.itertuples()
    }
    assert have == want


def test_truncation_prefix_dedup_recompute(spark):
    from etl_building_inspector_spark.plans.queries_llm7 import _PREFIX_CHARS

    got = _run(spark, "dedup_truncation_prefix")
    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def norm(t: str) -> str:
        return re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()

    corpus = [(int(d), norm(t)) for d, t in zip(docs["doc_id"], docs["text"])]
    corpus += [(-d - 1, t[:100]) for d, t in corpus[: len(docs)]]
    groups: dict[str, list[tuple[int, int]]] = {}
    for did, t in corpus:
        pk = hashlib.md5(t[:_PREFIX_CHARS].encode()).hexdigest()
        groups.setdefault(pk, []).append((did, len(t)))
    want = {}
    for pk, members in groups.items():
        if len(members) > 1:
            kept = min(
                members, key=lambda m: (-m[1], 1 if m[0] < 0 else 0, m[0])
            )[0]
            want[pk] = (kept, len(members))
    have = {
        r.prefix_key: (int(r.kept_doc_id), int(r.n_members))
        for r in got.itertuples()
    }
    assert have == want


def test_countmin_error_eval_python_reimplementation(spark):
    """Full independent Count-Min: same md5 key, same (a*k+b)%P%W hash
    rows, sketch and readout rebuilt in plain python dicts. Also
    re-proves the structural CM guarantee: estimate >= exact."""
    from etl_building_inspector_spark.plans.queries_llm7 import (
        _CM_P,
        _CM_ROWS,
        _CM_W,
    )
    from etl_building_inspector_spark.plans.queries_llm10 import CM_EVAL_TOPK

    got = _run(spark, "sketch_countmin_error_eval")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    from collections import Counter

    exact: Counter = Counter()
    for txt in docs["text"]:
        t = _py_tokens(txt)
        for a, b in zip(t, t[1:]):
            exact[f"{a} {b}"] += 1
    sketch = [Counter() for _ in _CM_ROWS]
    keyof = {
        bg: int(hashlib.md5(bg.encode()).hexdigest()[:8], 16) for bg in exact
    }
    for bg, n in exact.items():
        for d, (a, b) in enumerate(_CM_ROWS):
            sketch[d][(a * keyof[bg] + b) % _CM_P % _CM_W] += n
    topk = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:CM_EVAL_TOPK]
    want = []
    for bg, n in topk:
        est = min(
            sketch[d][(a * keyof[bg] + b) % _CM_P % _CM_W]
            for d, (a, b) in enumerate(_CM_ROWS)
        )
        want.append((bg, n, est, est - n, (1_000_000 * (est - n)) // n))
    have = [
        (r.bigram, int(r.n_exact), int(r.estimate), int(r.overestimate), int(r.err_ppm))
        for r in got.itertuples()
    ]
    assert have == want
    assert all(r[3] >= 0 for r in have)  # CM never underestimates


def test_int8_fidelity_recompute(spark):
    got = _run(spark, "emb_int8_fidelity_eval")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").set_index("vec_id")
    assert len(got) == len(emb)
    for r in got.itertuples():
        x = [float(v) for v in emb.loc[r.vec_id, "embedding"]]
        maxabs = max(abs(v) for v in x)
        ql = [math.copysign(math.floor(abs(v) * 127 / maxabs), v) for v in x]
        # same sequential left-fold order as the engines
        dot = sum(a * b for a, b in zip(x, ql))
        nx = math.sqrt(sum(a * a for a in x))
        nq = math.sqrt(sum(b * b for b in ql))
        cos = dot / (nx * nq)
        assert r.cos_fidelity == pytest.approx(cos, rel=1e-9)
        assert int(r.loss_ppb) in (
            math.floor((1.0 - cos) * 1e9) - 1,
            math.floor((1.0 - cos) * 1e9),
            math.floor((1.0 - cos) * 1e9) + 1,
        )  # floor is ULP-sensitive at the boundary; +-1 ppb tolerance
        assert r.cos_fidelity > 0.99  # int8 keeps cosine essentially intact


def test_geohash_density_recompute(spark):
    got = _run(spark, "spatial_geohash_density")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    ck = cust["c_custkey"].astype("int64")
    x = (ck % 40) * 10 + (ck % 7) - 3
    y = ((ck // 40) % 25) * 10 + (ck % 5) - 2
    ix = (x + 16) // 16
    iy = (y + 16) // 16

    def interleave(a: int, b: int) -> int:
        cell = 0
        for bit in range(5):
            cell += ((a >> bit) & 1) * (1 << (2 * bit + 1))
            cell += ((b >> bit) & 1) * (1 << (2 * bit))
        return cell

    df = pd.DataFrame({
        "cell": [interleave(int(a), int(b)) for a, b in zip(ix, iy)],
        "x": x.astype("int64"),
        "y": y.astype("int64"),
    })
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    g = df.groupby("cell").agg(
        n=("x", "size"), sum_x=("x", "sum"), sum_y=("y", "sum")
    )
    assert len(got) == len(g)
    for r in got.itertuples():
        w = g.loc[int(r.cell)]
        assert r.gh == alpha[int(r.cell) // 32] + alpha[int(r.cell) % 32]
        assert (int(r.n), int(r.sum_x), int(r.sum_y)) == (
            int(w["n"]), int(w["sum_x"]), int(w["sum_y"])
        )
        assert r.avg_x == pytest.approx(w["sum_x"] / w["n"], rel=1e-12)
        assert r.avg_y == pytest.approx(w["sum_y"] / w["n"], rel=1e-12)


def test_decompose_weekly_recompute(spark):
    got = _run(spark, "timeseries_decompose_weekly")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    daily = (
        orders.assign(cents=_half_up_cents(orders["o_totalprice"]))
        .groupby("o_orderdate")["cents"]
        .sum()
        .sort_index()
    )
    days = list(daily.index)
    cents = daily.to_list()
    rows = []
    for i in range(3, len(days) - 3):
        tsum = sum(cents[i - 3 : i + 4])
        wd = pd.Timestamp(days[i]).weekday()  # 0 = Monday, same as Spark
        rows.append((days[i], cents[i], tsum, cents[i] * 7 - tsum, wd))
    seas = {}
    for _, _, _, detr7, wd in rows:
        s, n = seas.get(wd, (0, 0))
        seas[wd] = (s + detr7, n + 1)
    want = {
        d: (c, tsum / 7, wd, seas[wd][0] / seas[wd][1] / 7)
        for d, c, tsum, _, wd in rows
    }
    have = {
        r.day: (int(r.cents), r.trend_cents, int(r.wd), r.seasonal_cents)
        for r in got.itertuples()
    }
    assert set(have) == set(want)
    for d in want:
        assert have[d][0] == want[d][0] and have[d][2] == want[d][2]
        assert have[d][1] == pytest.approx(want[d][1], rel=1e-12)
        assert have[d][3] == pytest.approx(want[d][3], rel=1e-12)


def test_code_switch_detect_python_reimplementation(spark):
    from etl_building_inspector_spark.functions.text import LANG_STOPWORDS
    from etl_building_inspector_spark.plans.queries_llm10 import CSW_WINDOW

    got = _run(spark, "text_code_switch_detect")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    langs = sorted(LANG_STOPWORDS)
    sw = {lang: set(ws) for lang, ws in LANG_STOPWORDS.items()}
    want = {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        toks = _py_tokens(txt)
        wins: dict[int, list[str]] = {}
        for i, t in enumerate(toks):
            wins.setdefault(i // CSW_WINDOW, []).append(t)
        wlangs = []
        for ws in wins.values():
            scores = {
                lang: sum(1 for t in ws if t in sw[lang]) for lang in langs
            }
            if all(v == 0 for v in scores.values()):
                wlangs.append("und")
                continue
            # the generated CASE: first lang (sorted) whose score >=
            # every LATER lang's score
            for i, lang in enumerate(langs):
                if all(scores[lang] >= scores[o] for o in langs[i + 1 :]):
                    wlangs.append(lang)
                    break
        ident = [w for w in wlangs if w != "und"]
        want[int(did)] = (
            len(wlangs), len(ident), len(set(ident)), len(set(ident)) >= 2
        )
    have = {
        int(r.doc_id): (
            int(r.n_windows), int(r.n_identified), int(r.n_langs),
            bool(r.code_switched),
        )
        for r in got.itertuples()
    }
    assert have == want


def test_pack_length_bucket_waste_recompute(spark):
    got = _run(spark, "pack_length_bucket_waste")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0])
    for txt in docs["text"]:
        n = len(_py_tokens(txt))
        bucket = 1 if n <= 1 else 1 << (n - 1).bit_length()
        agg[bucket][0] += 1
        agg[bucket][1] += n
        agg[bucket][2] += bucket - n
    want = {
        b: (v[0], v[1], v[2], (1_000_000 * v[2]) // (v[0] * b))
        for b, v in agg.items()
    }
    have = {
        int(r.bucket): (
            int(r.n_docs), int(r.sum_tokens), int(r.pad_tokens), int(r.pad_ppm)
        )
        for r in got.itertuples()
    }
    assert have == want
    # buckets are powers of two and capacity >= content
    for b, (nd, st, ptk, _) in have.items():
        assert b & (b - 1) == 0 and st + ptk == nd * b


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _er_python_pipeline():
    """The whole ER lifecycle reimplemented flat in python: block ->
    levenshtein match -> union-find merge -> survivorship."""
    from etl_building_inspector_spark.plans.queries_llm5 import ER_LEV_MAX

    part = pd.read_parquet(f"{SF}/part.parquet")
    names = part.groupby("p_name")["p_partkey"].min()  # name -> rep key
    blocks: dict[str, list[str]] = {}
    for n in names.index:
        blocks.setdefault(n.split(" ")[0], []).append(n)
    pairs = []
    for blk in blocks.values():
        for i, a in enumerate(sorted(blk)):
            for b in sorted(blk)[i + 1 :]:
                d = _lev(a, b)
                if d <= ER_LEV_MAX:
                    pairs.append((a, b, int(names[a]), int(names[b]), d))
    # union-find, min-label canonical
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, _, ka, kb, _ in pairs:
        ra, rb = find(ka), find(kb)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {k: find(k) for k in parent}
    return names, pairs, comp


def test_er_fuzzy_pairs_match_python_levenshtein(spark):
    got = _run(spark, "er_blocked_fuzzy_match")
    _, pairs, _ = _er_python_pipeline()
    want = {(a, b): (ka, kb, d) for a, b, ka, kb, d in pairs}
    have = {
        (r.name_a, r.name_b): (int(r.key_a), int(r.key_b), int(r.dist))
        for r in got.itertuples()
    }
    assert have == want


def test_er_resolution_clusters_match_union_find(spark):
    got = _run(spark, "er_resolution_clusters")
    _, _, comp = _er_python_pipeline()
    have = {
        int(r.entity_key): int(r.canonical_key) for r in got.itertuples()
    }
    assert have == comp


def test_er_survivorship_golden_rules(spark):
    got = _run(spark, "er_survivorship_golden")
    names, _, comp = _er_python_pipeline()
    key_to_name = {int(k): n for n, k in names.items()}
    clusters: dict[int, list[int]] = {}
    for k, c in comp.items():
        clusters.setdefault(c, []).append(k)
    want = {}
    for c, members in clusters.items():
        golden = min(
            members,
            key=lambda k: (-len(key_to_name[k]), key_to_name[k], k),
        )
        want[c] = (len(members), golden, key_to_name[golden])
    have = {
        int(r.canonical_key): (int(r.n_members), int(r.golden_key), r.golden_name)
        for r in got.itertuples()
    }
    assert have == want


def test_cross_table_reconciliation_recount(spark):
    got = _run(spark, "dq_cross_table_reconciliation")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    ep = _half_up_cents(li["l_extendedprice"])
    disc = _half_up_cents(li["l_discount"])
    tax = _half_up_cents(li["l_tax"])
    rollup = (
        pd.DataFrame({
            "k": li["l_orderkey"],
            "e4c": ep * (100 - disc) * (100 + tax),
        })
        .groupby("k")["e4c"]
        .sum()
    )
    from collections import defaultdict

    agg = defaultdict(list)
    for ok, tp in zip(orders["o_orderkey"], orders["o_totalprice"]):
        o_e4c = int(_half_up_cents(pd.Series([tp])).iloc[0]) * 10000
        if ok in rollup.index:
            ad = abs(o_e4c - int(rollup[ok]))
            agg[len(str(ad))].append(ad)
        else:
            agg[-1].append(None)
    want = {
        d: (
            len(v),
            None if d == -1 else min(v),
            None if d == -1 else max(v),
        )
        for d, v in agg.items()
    }
    have = {
        int(r.diff_digits): (
            int(r.n_orders),
            None if pd.isna(r.min_diff_e4c) else int(r.min_diff_e4c),
            None if pd.isna(r.max_diff_e4c) else int(r.max_diff_e4c),
        )
        for r in got.itertuples()
    }
    assert have == want


def test_hierarchy_rollup_closed_form_recompute(spark):
    got = _run(spark, "hierarchy_rollup_cost")
    part = pd.read_parquet(f"{SF}/part.parquet")
    cents = _half_up_cents(part["p_retailprice"])
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for k, c in zip(part["p_partkey"], cents):
        anc = int(k)
        while True:
            agg[anc][0] += 1
            agg[anc][1] += int(c)
            if anc < 10:
                break
            anc //= 10
    want = {a: (v[0], v[1]) for a, v in agg.items()}
    have = {
        int(r.node): (int(r.n_subtree), int(r.subtree_cents))
        for r in got.itertuples()
    }
    assert have == want


def test_centroid_drift_recompute(spark):
    from etl_building_inspector_spark.plans.queries_llm import EMB_DIM
    from etl_building_inspector_spark.plans.queries_llm10 import _DRIFT_SCALE

    got = _run(spark, "emb_centroid_drift_eval")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    want = {}
    for label, g in emb.groupby("label"):
        ref = g[g["vec_id"] % 2 == 0]
        cur = g[g["vec_id"] % 2 == 1]
        n0, n1 = len(ref), len(cur)
        m0 = np.floor(np.stack(ref["embedding"]).astype(np.float64) * _DRIFT_SCALE).astype("int64") if n0 else None
        m1 = np.floor(np.stack(cur["embedding"]).astype(np.float64) * _DRIFT_SCALE).astype("int64") if n1 else None
        s0 = m0.sum(axis=0).astype(object) if n0 else np.zeros(EMB_DIM, dtype=object)
        s1 = m1.sum(axis=0).astype(object) if n1 else np.zeros(EMB_DIM, dtype=object)
        num = int(sum(abs(a * n1 - b * n0) for a, b in zip(s0, s1)))
        mean = (
            None if n0 == 0 or n1 == 0
            else num / (float(n0) * n1 * _DRIFT_SCALE * EMB_DIM)
        )
        want[int(label)] = (n0, n1, num, mean)
    for r in got.itertuples():
        n0, n1, num, mean = want[int(r.label)]
        assert (int(r.n_ref), int(r.n_cur), int(r.drift_num)) == (n0, n1, num)
        if mean is None:
            assert pd.isna(r.drift_l1_mean)
        else:
            assert r.drift_l1_mean == pytest.approx(mean, rel=1e-12)


def test_augment_swap_md5_recompute(spark):
    got = _run(spark, "corpus_augment_swap")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        t = _py_tokens(txt)
        n = len(t)
        if n < 1:
            continue
        p1, p2 = int(did) % n, (int(did) * 7) % n
        a = list(t)
        a[p1], a[p2] = t[p2], t[p1]
        want[int(did)] = (
            n, p1 != p2, hashlib.md5(" ".join(a).encode()).hexdigest()
        )
    have = {
        int(r.doc_id): (int(r.n_toks), bool(r.swapped), r.aug_md5)
        for r in got.itertuples()
    }
    assert have == want


def test_schema_evolution_union_null_accounting(spark):
    got = _run(spark, "schema_evolution_union").set_index("src_version")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    even = orders[orders["o_orderkey"] % 2 == 0]
    odd = orders[orders["o_orderkey"] % 2 == 1]
    assert int(got.loc["v1", "n_rows"]) == len(even)
    assert int(got.loc["v2", "n_rows"]) == len(odd)
    # v1 predates status -> every v1 row has NULL status, no NULL price
    assert int(got.loc["v1", "n_null_price"]) == 0
    assert int(got.loc["v1", "n_null_status"]) == len(even)
    # v2 dropped price -> every v2 row has NULL price, real status
    assert int(got.loc["v2", "n_null_price"]) == len(odd)
    assert int(got.loc["v2", "n_null_status"]) == 0
    assert int(got.loc["v1", "price_cents_sum"]) == int(
        _half_up_cents(even["o_totalprice"]).sum()
    )
    assert int(got.loc["v2", "price_cents_sum"]) == 0


def _audio_payloads():
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    out = {}
    for k in sup["s_suppkey"]:
        k = int(k)
        h = hashlib.md5(str(k).encode()).hexdigest()
        out[k] = h * (k % 3 + 2) + h[: k % 7]
    return out


def _audio_windows_python():
    from etl_building_inspector_spark.plans.queries_llm9 import AUDIO_WIN

    rows = []
    for k, payload in _audio_payloads().items():
        nw = (len(payload) + AUDIO_WIN - 1) // AUDIO_WIN
        for wi in range(nw):
            seg = payload[wi * AUDIO_WIN : (wi + 1) * AUDIO_WIN]
            rows.append((k, wi, len(seg), sum(ord(c) ** 2 for c in seg)))
    return rows


def test_audio_energy_windows_kernel_recompute(spark):
    """The mapInPandas audio kernel AND the blob synthesis, both
    recomputed in pure python (md5 strings, ord^2 sums)."""
    got = _run(spark, "multimodal_audio_energy_windows")
    want = {
        (k, wi): (nb, en) for k, wi, nb, en in _audio_windows_python()
    }
    have = {
        (int(r.key), int(r.win_idx)): (int(r.n_bytes), int(r.energy))
        for r in got.itertuples()
    }
    assert have == want


def test_audio_silence_segments_islands_recompute(spark):
    got = _run(spark, "multimodal_audio_silence_segments")
    wins = _audio_windows_python()
    from collections import defaultdict

    per_key = defaultdict(list)
    for k, wi, _, en in wins:
        per_key[k].append((wi, en))
    want = []
    for k, ws in per_key.items():
        tot = sum(e for _, e in ws)
        n = len(ws)
        sil = sorted(wi for wi, e in ws if e * n < tot)
        run: list[int] = []
        for wi in sil:
            if run and wi == run[-1] + 1:
                run.append(wi)
            else:
                if run:
                    want.append((k, run[0], run[-1], len(run)))
                run = [wi]
        if run:
            want.append((k, run[0], run[-1], len(run)))
    want.sort()
    have = sorted(
        (int(r.key), int(r.seg_start), int(r.seg_end), int(r.n_windows))
        for r in got.itertuples()
    )
    assert have == want


def test_frame_fanout_kernel_recompute(spark):
    from etl_building_inspector_spark.plans.queries_llm8 import (
        _FRAME_EVERY_MS,
    )

    got = _run(spark, "multimodal_frame_sample_fanout")
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    want = {}
    for k in sup["s_suppkey"]:
        k = int(k)
        payload = hashlib.md5(str(k).encode()).hexdigest() * 4
        duration = (k % 5 + 1) * 3000
        for fi in range(duration // _FRAME_EVERY_MS):
            ts = fi * _FRAME_EVERY_MS
            want[(k, fi)] = (
                ts,
                hashlib.md5(f"{payload}@{ts}".encode()).hexdigest().upper(),
            )
    have = {
        (int(r.key), int(r.frame_idx)): (int(r.ts_ms), r.frame_hex)
        for r in got.itertuples()
    }
    assert have == want


def test_ngram_lm_score_python_reimplementation(spark):
    """The self-trained char-trigram LM rebuilt in python Counters:
    same normalization, same corpus-wide n3/n2 tables, same
    floor(1e6*n3/n2) per position, same integer-DIV doc mean."""
    got = _run(spark, "quality_ngram_lm_score")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    from collections import Counter

    norm = {
        int(d): re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    c3: Counter = Counter()
    c2: Counter = Counter()
    for t in norm.values():
        if len(t) < 3:
            continue
        for i in range(len(t) - 2):
            c3[t[i : i + 3]] += 1
            c2[t[i : i + 2]] += 1
    want = {}
    for d, t in norm.items():
        if len(t) < 3:
            continue
        ppms = [
            math.floor(1e6 * c3[t[i : i + 3]] / c2[t[i : i + 2]])
            for i in range(len(t) - 2)
        ]
        want[d] = (len(ppms), sum(ppms) // len(ppms))
    have = {
        int(r.doc_id): (int(r.n_positions), int(r.lm_score_ppm))
        for r in got.itertuples()
    }
    assert have == want


def test_weighted_median_recompute(spark):
    got = _run(spark, "weighted_median_exact")
    part = pd.read_parquet(f"{SF}/part.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    j = part.merge(li, left_on="p_partkey", right_on="l_partkey")
    j = j.assign(cents=_half_up_cents(j["p_retailprice"]))
    want = {}
    for brand, g in j.groupby("p_brand"):
        wts = g.groupby("cents")["l_quantity"].sum().sort_index()
        total = int(wts.sum())
        cum = 0
        for price, wt in wts.items():
            cum += int(wt)
            if 2 * cum >= total:
                want[brand] = (int(price), total)
                break
    have = {
        r.brand: (int(r.weighted_median_cents), int(r.total_weight))
        for r in got.itertuples()
    }
    assert have == want


def test_median_exact_groups_recompute(spark):
    got = _run(spark, "median_exact_groups")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    o = orders.assign(cents=_half_up_cents(orders["o_totalprice"])).sort_values(
        ["cents", "o_orderkey"]
    )
    want = {}
    for pri, g in o.groupby("o_orderpriority"):
        c = g.sort_values(["cents", "o_orderkey"])["cents"].tolist()
        n = len(c)
        want[pri] = (c[(n + 1) // 2 - 1] + c[n // 2], n)
    have = {
        r.priority: (int(r.median_cents_x2), int(r.n)) for r in got.itertuples()
    }
    assert have == want
    # x2 median halves to the true statistical median
    for pri, (x2, n) in want.items():
        c = sorted(
            o.loc[o["o_orderpriority"] == pri, "cents"]
        )
        assert x2 / 2 == float(np.median(c))


def test_regression_slope_sufficient_stats(spark):
    got = _run(spark, "regression_slope_by_nation")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    d = pd.to_datetime(orders["o_orderdate"])
    j = orders.assign(
        x=d.dt.year * 12 + d.dt.month,
        cents=_half_up_cents(orders["o_totalprice"]),
    ).merge(cust, left_on="o_custkey", right_on="c_custkey")
    monthly = (
        j.groupby(["c_nationkey", "x"])["cents"].sum().reset_index()
    )
    xmin = int(monthly["x"].min())
    want = {}
    for nk, g in monthly.groupby("c_nationkey"):
        xr = (g["x"] - xmin).astype(object)
        y = g["cents"].astype(object)
        n = len(g)
        want[int(nk)] = (
            n,
            n * (xr * y).sum() - xr.sum() * y.sum(),
            n * (xr * xr).sum() - xr.sum() * xr.sum(),
        )
    have = {
        int(r.nationkey): (int(r.n_months), int(r.slope_num), int(r.slope_den))
        for r in got.itertuples()
    }
    assert have == want
    # slope sign sanity: den is nonnegative by Cauchy-Schwarz
    assert all(den >= 0 for _, _, den in want.values())


def test_mom_growth_recompute(spark):
    got = _run(spark, "mom_revenue_growth")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    d = pd.to_datetime(orders["o_orderdate"])
    monthly = (
        orders.assign(
            month=d.dt.strftime("%Y-%m"),
            cents=_half_up_cents(orders["o_totalprice"]),
        )
        .groupby("month")["cents"]
        .sum()
        .sort_index()
    )
    prev = monthly.shift(1)
    want = {
        m: (
            int(c),
            None if pd.isna(p) else int(p),
            None if pd.isna(p) else int(c) - int(p),
        )
        for (m, c), p in zip(monthly.items(), prev)
    }
    have = {
        r.month: (
            int(r.revenue_cents),
            None if pd.isna(r.prev_cents) else int(r.prev_cents),
            None if pd.isna(r.delta_cents) else int(r.delta_cents),
        )
        for r in got.itertuples()
    }
    assert have == want


def test_cumulative_unique_users_recompute(spark):
    got = _run(spark, "cumulative_unique_users").sort_values("day")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    first = ev.assign(day=ev["ts"].dt.date).groupby("user_id")["day"].min()
    per_day = first.value_counts().sort_index()
    cum = per_day.cumsum()
    assert list(got["day"]) == list(per_day.index)
    assert list(got["new_users"]) == per_day.tolist()
    assert list(got["cumulative_users"]) == cum.tolist()
    # the final cumulative count is the total distinct-user count
    assert int(got["cumulative_users"].iloc[-1]) == ev["user_id"].nunique()


def test_streaks_gaps_islands_recompute(spark):
    got = _run(spark, "streaks_gaps_islands")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    du = ev.assign(d=ev["ts"].dt.date)[["user_id", "d"]].drop_duplicates()
    want = {}
    for uid, g in du.groupby("user_id"):
        days = sorted(g["d"])
        runs, cur = [], 1
        for a, b in zip(days, days[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        want[int(uid)] = (max(runs), len(runs))
    have = {
        int(r.user_id): (int(r.longest_streak), int(r.n_islands))
        for r in got.itertuples()
    }
    assert have == want


def test_max_concurrent_sweep_recompute(spark):
    got = _run(spark, "max_concurrent_intervals")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    want = {}
    for sk, g in li.groupby("l_suppkey"):
        bounds = []
        for d in pd.to_datetime(g["l_shipdate"]):
            bounds.append((d, 1))
            bounds.append((d + pd.Timedelta(days=7), -1))
        # (-1 before +1) at ties? the query orders by (ts, delta):
        # delta -1 sorts before +1 at the same ts
        bounds.sort(key=lambda b: (b[0], b[1]))
        live = peak = 0
        for _, delta in bounds:
            live += delta
            peak = max(peak, live)
        want[int(sk)] = peak
    have = {int(r.suppkey): int(r.peak_concurrent) for r in got.itertuples()}
    assert have == want


def test_status_transition_matrix_recount(spark):
    got = _run(spark, "status_transition_matrix")
    orders = pd.read_parquet(f"{SF}/orders.parquet").sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"]
    )
    from collections import Counter

    c: Counter = Counter()
    for _, g in orders.groupby("o_custkey"):
        st = g["o_orderstatus"].tolist()
        for a, b in zip(st, st[1:]):
            c[(a, b)] += 1
    have = {
        (r.from_status, r.to_status): int(r.transitions)
        for r in got.itertuples()
    }
    assert have == dict(c)


def test_id_gap_ranges_recompute(spark):
    got = _run(spark, "id_gap_ranges")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    ids = sorted(set(int(k) for k in orders["o_orderkey"] if k % 7 != 0))
    want = {
        (a + 1, b - 1, b - a - 1)
        for a, b in zip(ids, ids[1:])
        if b - a > 1
    }
    have = {
        (int(r.gap_start), int(r.gap_end), int(r.missing))
        for r in got.itertuples()
    }
    assert have == want
    # every reported gap contains no surviving id
    surviving = set(ids)
    for s, e, _ in have:
        assert not any(i in surviving for i in range(s, e + 1))


def test_relational_division_recompute(spark):
    got = _run(spark, "relational_division")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    universe = orders["o_orderpriority"].nunique()
    per = orders.groupby("o_custkey").agg(
        nc=("o_orderpriority", "nunique"), no=("o_orderkey", "size")
    )
    want = {
        int(k): int(r["no"]) for k, r in per.iterrows() if r["nc"] == universe
    }
    have = {int(r.custkey): int(r.n_orders) for r in got.itertuples()}
    assert have == want
    # "for all" semantics: every selected customer covers the universe
    cov = orders.groupby("o_custkey")["o_orderpriority"].nunique()
    for k in have:
        assert cov[k] == universe


def test_twap_recompute(spark):
    got = _run(spark, "time_weighted_value")
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    epoch = pd.Timestamp("1970-01-01")
    ev = ev.assign(
        t=((ev["ts"] - epoch) // pd.Timedelta(microseconds=1)),
        cents=_half_up_cents(ev["value"]),
    )
    want = {}
    for uid, g in ev.groupby("user_id"):
        t = g["t"].tolist()
        c = g["cents"].tolist()
        num = sum(cv * (t2 - t1) for cv, t1, t2 in zip(c, t, t[1:]))
        den = t[-1] - t[0]
        if len(t) > 1:
            want[int(uid)] = (num, den, len(t) - 1)
    have = {
        int(r.user_id): (int(r.twap_num), int(r.twap_den), int(r.n_intervals))
        for r in got.itertuples()
    }
    assert have == want


def test_degree_distribution_recompute(spark):
    got = _run(spark, "graph_degree_distribution")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    adj: dict[int, set[int]] = {}
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(set(g["l_partkey"]))
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
    from collections import Counter

    hist = Counter(len(vs) for vs in adj.values())
    have = {int(r.degree): int(r.n_nodes) for r in got.itertuples()}
    assert have == dict(hist)
    # conservation: node count and total degree mass
    assert sum(have.values()) == len(adj)
    assert sum(d * n for d, n in have.items()) == sum(
        len(v) for v in adj.values()
    )


def test_funnel_stages_sequential_semantics(spark):
    got = {r.stage: int(r.users) for r in _run(spark, "funnel_stages").itertuples()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    u1 = u2 = u3 = u4 = 0
    for _, g in ev.groupby("user_id"):
        def first_after(et, after):
            sel = g[(g["event_type"] == et)]
            if after is not None:
                sel = sel[sel["ts"] > after]
            return sel["ts"].min() if len(sel) else None

        t1 = first_after("signup", None)
        if t1 is None or pd.isna(t1):
            continue
        u1 += 1
        t2 = first_after("view", t1)
        if t2 is None or pd.isna(t2):
            continue
        u2 += 1
        t3 = first_after("click", t2)
        if t3 is None or pd.isna(t3):
            continue
        u3 += 1
        t4 = first_after("purchase", t3)
        if t4 is None or pd.isna(t4):
            continue
        u4 += 1
    assert got == {"signup": u1, "view": u2, "click": u3, "purchase": u4}
    # funnel is monotone by construction
    assert u1 >= u2 >= u3 >= u4


def test_text_fingerprint_and_lang_id_recompute(spark):
    from etl_building_inspector_spark.functions.text import LANG_STOPWORDS

    got_fp = _run(spark, "text_fingerprint")
    got_ld = _run(spark, "text_lang_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    fp_want, ld_want = {}, {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        nrm = re.sub(r"[^a-z0-9]+", " ", txt.lower()).strip()
        fp_want[int(did)] = hashlib.md5(nrm.encode()).hexdigest()
        toks = nrm.split(" ")
        scores = {
            lang: sum(1 for t in toks if t in set(ws))
            for lang, ws in LANG_STOPWORDS.items()
        }
        if max(scores.values()) == 0:
            ld_want[int(did)] = "und"
        else:
            # argmax with alphabetical tiebreak: min over (-score, lang)
            ld_want[int(did)] = min(
                ((-s, lang) for lang, s in scores.items())
            )[1]
    assert {
        int(r.doc_id): r.fingerprint for r in got_fp.itertuples()
    } == fp_want
    assert {
        int(r.doc_id): r.lang_pred for r in got_ld.itertuples()
    } == ld_want


def test_asof_join_matches_pandas_merge_asof(spark):
    """The union+carry-forward as-of join vs pandas.merge_asof -- an
    entirely independent implementation of the same semantics."""
    got = _run(spark, "asof_join_click_purchase")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    purchases = (
        ev[ev["event_type"] == "purchase"]
        .groupby(["user_id", "ts"], as_index=False)["value"]
        .max()
        .rename(columns={"value": "purchase_value"})
        .sort_values("ts")
    )
    clicks = ev[ev["event_type"] == "click"][
        ["user_id", "ts", "event_id"]
    ].sort_values("ts")
    m = pd.merge_asof(
        clicks, purchases, on="ts", by="user_id", direction="backward"
    )
    want = {
        int(r.event_id): r.purchase_value
        for r in m.itertuples()
        if not pd.isna(r.purchase_value)
    }
    cols = set(got.columns)
    id_col = "event_id" if "event_id" in cols else "click_id"
    val_col = (
        "purchase_value" if "purchase_value" in cols else "last_purchase_value"
    )
    have = {
        int(getattr(r, id_col)): getattr(r, val_col)
        for r in got.itertuples()
        if not pd.isna(getattr(r, val_col))
    }
    assert have == want


def test_range_join_brute_force(spark):
    got = {
        (int(r.id_a), int(r.id_b))
        for r in _run(spark, "range_join_events").itertuples()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    epoch = pd.Timestamp("1970-01-01")
    ev = ev.assign(s=(ev["ts"] - epoch).dt.total_seconds())
    want = set()
    for _, g in ev.groupby("event_type"):
        rows = list(zip(g["event_id"], g["s"]))
        for i, (ia, sa) in enumerate(rows):
            for ib, sb in rows:
                if ia < ib and abs(sa - sb) <= 60.0:
                    want.add((int(ia), int(ib)))
    assert got == want


def test_global_topk_and_per_group_topk(spark):
    got = _run(spark, "sort_global_topk")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    want = li.sort_values(
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        ascending=[False, True, True],
    ).head(100)
    assert [
        (int(r.order_key), int(r.line_number), r.price)
        for r in got.itertuples()
    ] == [
        (int(r.l_orderkey), int(r.l_linenumber), r.l_extendedprice)
        for r in want.itertuples()
    ]
    got2 = _run(spark, "window_topk_per_group")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    want2 = set()
    for ck, g in orders.groupby("o_custkey"):
        top = g.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(3)
        for rank, r in enumerate(top.itertuples(), 1):
            want2.add((int(ck), int(r.o_orderkey), r.o_totalprice, rank))
    have2 = {
        (int(r.cust_key), int(r.order_key), r.total_price, int(r.rank))
        for r in got2.itertuples()
    }
    assert have2 == want2


def test_cohort_retention_recount(spark):
    got = _run(spark, "cohort_retention")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    d = pd.to_datetime(orders["o_orderdate"])
    o = orders.assign(m=d.dt.year * 12 + d.dt.month)
    first = o.groupby("o_custkey")["m"].min().rename("cm")
    o = o.join(first, on="o_custkey")
    o = o.assign(
        label=[
            f"{(cm - 1) // 12:04d}-{(cm - 1) % 12 + 1:02d}" for cm in o["cm"]
        ],
        off=o["m"] - o["cm"],
    )
    want = {
        (lab, int(off)): int(n)
        for (lab, off), n in o.groupby(["label", "off"])["o_custkey"]
        .nunique()
        .items()
    }
    have = {
        (r.cohort_month, int(r.month_offset)): int(r.customers)
        for r in got.itertuples()
    }
    assert have == want


def test_agg_histogram_recount(spark):
    got = _run(spark, "agg_histogram")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    buckets = (_half_up_cents(orders["o_totalprice"]) // 50000).value_counts()
    have = {int(r.bucket): int(r.n) for r in got.itertuples()}
    assert have == {int(b): int(n) for b, n in buckets.items()}
    for r in got.itertuples():
        assert int(r.lo_dollars) == int(r.bucket) * 500
        assert int(r.hi_dollars) == (int(r.bucket) + 1) * 500


def test_stratified_sample_hash_bernoulli_recompute(spark):
    from etl_building_inspector_spark.plans.queries_llm2 import (
        SAMPLE_DEFAULT_RATE,
        SAMPLE_RATES,
        SAMPLE_SALT,
    )

    got = set(_run(spark, "sample_stratified")["doc_id"])
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = set()
    for did, lang in zip(docs["doc_id"], docs["lang"]):
        u32 = int(
            hashlib.md5(f"{SAMPLE_SALT}:{int(did)}".encode()).hexdigest()[:8],
            16,
        )
        rate = SAMPLE_RATES.get(lang, SAMPLE_DEFAULT_RATE)
        if u32 < int(rate * 2**32):
            want.add(int(did))
    assert got == want


def test_pack_greedy_first_fit_sequential_recompute(spark):
    from etl_building_inspector_spark.plans.queries_llm3 import PACK_BUDGET

    got = _run(spark, "pack_greedy_bins")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    # replay first-fit-sequential per source in doc_id order:
    # (grp, doc_id, n_tokens, bin, bin_fill) -- bin_fill is the
    # RUNNING fill after placing this doc
    want = {}
    for src, g in docs.sort_values("doc_id").groupby("source"):
        bin_id, fill, first = 0, 0, True
        for did, txt in zip(g["doc_id"], g["text"]):
            n = len(_py_tokens(txt))
            if first:
                fill, first = n, False
            elif fill + n <= PACK_BUDGET:
                fill += n
            else:
                bin_id += 1
                fill = n
            want[int(did)] = (src, n, bin_id, fill)
    have = {
        int(r.doc_id): (r.grp, int(r.n_tokens), int(r.bin), int(r.bin_fill))
        for r in got.itertuples()
    }
    assert have == want


def test_pagerank_integer_python_reimplementation(spark):
    from etl_building_inspector_spark.plans.queries_surface4 import (
        _PR_ITER,
        _PR_SCALE,
    )

    got = _run(spark, "graph_pagerank")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    edges = set()
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(set(g["l_partkey"]))
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                edges.add((u, v))
                edges.add((v, u))
    nodes = sorted({u for u, _ in edges})
    out: dict[int, list[int]] = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    n = len(nodes)
    r = {u: _PR_SCALE // n for u in nodes}
    base = (15 * (_PR_SCALE // n)) // 100
    for _ in range(_PR_ITER):
        contrib = {u: 0 for u in nodes}
        for u in nodes:
            deg = len(out[u])
            c = (85 * r[u]) // (100 * deg)
            for v in out[u]:
                contrib[v] += c
        r = {u: base + contrib[u] for u in nodes}
    have = {int(x.node): int(x.rank_scaled) for x in got.itertuples()}
    assert have == r


def test_event_path_topk_recount(spark):
    got = _run(spark, "event_path_topk")
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    from collections import Counter

    c: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        et = g["event_type"].tolist()
        for a, b2, c3 in zip(et, et[1:], et[2:]):
            c[f"{a}>{b2}>{c3}"] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    have = [(r.path, int(r.occurrences)) for r in got.itertuples()]
    assert have == want


def test_session_entry_exit_recount(spark):
    from etl_building_inspector_spark.plans.queries_surface5 import (
        SESSION_GAP_US,
    )

    got = _run(spark, "session_entry_exit")
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    epoch = pd.Timestamp("1970-01-01")
    ev = ev.assign(t=((ev["ts"] - epoch) // pd.Timedelta(microseconds=1)))
    from collections import Counter

    c: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        rows = list(zip(g["t"], g["event_id"], g["event_type"]))
        sessions, cur = [], [rows[0]]
        for prev, nxt in zip(rows, rows[1:]):
            if nxt[0] - prev[0] > SESSION_GAP_US:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        for s in sessions:
            c[(s[0][2], s[-1][2])] += 1
    have = {(r.entry, r.exit): int(r.sessions) for r in got.itertuples()}
    assert have == dict(c)


def test_sample_weighted_hash_rule_recompute(spark):
    got = set(_run(spark, "sample_weighted")["doc_id"])
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = set()
    for did, nc in zip(docs["doc_id"], docs["n_chars"]):
        u32 = int(
            hashlib.md5(f"wsam:{int(did)}".encode()).hexdigest()[:8], 16
        )
        if u32 * 600 < int(nc) * 4294967296:
            want.add(int(did))
    assert got == want


def test_budget_fill_by_quality_recompute(spark):
    got = _run(spark, "budget_fill_by_quality")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = {}
    for src, g in docs.groupby("source"):
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        cum = 0
        for did, nc in zip(g["doc_id"], g["n_chars"]):
            est = (int(nc) + 3) // 4
            cum += est
            if cum <= 1500:
                want[int(did)] = (src, est, cum)
    have = {
        int(r.doc_id): (r.source, int(r.est_tokens), int(r.cum_tokens))
        for r in got.itertuples()
    }
    assert have == want


def test_agg_cube_all_grouping_sets(spark):
    got = _run(spark, "agg_cube")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    o = orders.assign(cents=_half_up_cents(orders["o_totalprice"]))

    def agg(keys):
        if keys:
            g = o.groupby(keys).agg(n=("cents", "size"), s=("cents", "sum"))
            return {
                (k if isinstance(k, tuple) else (k,)): (int(r["n"]), int(r["s"]))
                for k, r in g.iterrows()
            }
        return {(): (len(o), int(o["cents"].sum()))}

    full = agg(["o_orderstatus", "o_orderpriority"])
    by_status = agg(["o_orderstatus"])
    by_pri = agg(["o_orderpriority"])
    total = agg([])
    want = {}
    for (s, p), v in full.items():
        want[(s, p)] = v
    for (s,), v in by_status.items():
        want[(s, None)] = v
    for (p,), v in by_pri.items():
        want[(None, p)] = v
    want[(None, None)] = total[()]
    have = {
        (r.o_orderstatus, r.o_orderpriority): (int(r.n), int(r.sum_cents))
        for r in got.itertuples()
    }
    assert have == want


def test_count_distinct_recount(spark):
    got = _run(spark, "agg_count_distinct")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    g = li.groupby("l_returnflag").agg(
        no=("l_orderkey", "nunique"),
        np=("l_partkey", "nunique"),
        nr=("l_orderkey", "size"),
    )
    have = {
        r.l_returnflag: (int(r.n_orders), int(r.n_parts), int(r.n_rows))
        for r in got.itertuples()
    }
    assert have == {
        k: (int(r["no"]), int(r["np"]), int(r["nr"])) for k, r in g.iterrows()
    }


def test_rolling_7d_active_users_recompute(spark):
    got = _run(spark, "rolling_7d_active_users")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    du = ev.assign(d=ev["ts"].dt.date)[["d", "user_id"]].drop_duplicates()
    lo, hi = du["d"].min(), du["d"].max()
    want = {}
    days = sorted({lo + pd.Timedelta(days=i) for i in range((hi - lo).days + 1)})
    for day in days:
        day = day if not hasattr(day, "date") else day.date()
        active = du[
            (du["d"] > day - pd.Timedelta(days=7)) & (du["d"] <= day)
        ]["user_id"].nunique()
        if active:
            want[day] = active
    have = {r.day: int(r.active_7d) for r in got.itertuples()}
    assert have == want


def test_first_touch_attribution_recompute(spark):
    got = _run(spark, "attribution_first_touch")
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    from collections import defaultdict

    cents_by_channel = defaultdict(int)
    n_by_channel = defaultdict(int)
    for _, g in ev.groupby("user_id"):
        first_mkt = None
        for r in g.itertuples():
            if r.event_type in ("click", "view") and first_mkt is None:
                first_mkt = r.event_type
            if r.event_type == "purchase":
                ch = first_mkt if first_mkt is not None else "unattributed"
                cents_by_channel[ch] += int(
                    _half_up_cents(pd.Series([r.value])).iloc[0]
                )
                n_by_channel[ch] += 1
                first_mkt = None  # new journey starts after a purchase
    have = {
        r.channel: (int(r.journeys), int(r.revenue_cents))
        for r in got.itertuples()
    }
    assert have == {
        ch: (n_by_channel[ch], cents_by_channel[ch]) for ch in cents_by_channel
    }


def test_snapshot_diff_recount(spark):
    got = {r.change_type: int(r.n) for r in _run(spark, "snapshot_diff").itertuples()}
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    o = orders.assign(
        cents=_half_up_cents(orders["o_totalprice"]),
        d=pd.to_datetime(orders["o_orderdate"]),
    )
    v1 = {
        int(r.o_orderkey): (r.o_orderstatus, int(r.cents))
        for r in o[o["d"] < "1996-01-01"].itertuples()
    }
    v2 = {
        int(r.o_orderkey): (
            "X" if r.o_orderkey % 97 == 0 else r.o_orderstatus,
            int(r.cents),
        )
        for r in o[o["d"] < "1997-01-01"].itertuples()
    }
    from collections import Counter

    c: Counter = Counter()
    for k in set(v1) | set(v2):
        if k not in v1:
            c["added"] += 1
        elif k not in v2:
            c["removed"] += 1
        elif v1[k] != v2[k]:
            c["changed"] += 1
        else:
            c["unchanged"] += 1
    assert got == dict(c)


def test_setop_semi_anti_partition(spark):
    got = _run(spark, "setop_semi_anti")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    with_orders = set(orders["o_custkey"]) & set(cust["c_custkey"])
    have_semi = {
        int(r.cust_key) for r in got.itertuples() if r.bucket == "has_orders"
    }
    have_anti = {
        int(r.cust_key) for r in got.itertuples() if r.bucket == "no_orders"
    }
    assert have_semi == with_orders
    assert have_anti == set(cust["c_custkey"]) - with_orders
    # exact partition of the customer universe
    assert not (have_semi & have_anti)
    assert have_semi | have_anti == set(cust["c_custkey"])


def test_decontaminate_ngram_recount(spark):
    from etl_building_inspector_spark.plans.queries_llm2 import (
        DECON_BENCH_MOD,
        DECON_N,
    )

    got = _run(spark, "decontaminate_ngram")
    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def grams(txt):
        t = _py_tokens(txt)
        return {
            " ".join(t[i : i + DECON_N]) for i in range(len(t) - DECON_N + 1)
        }

    bench: set = set()
    train = {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        g = grams(txt)
        if did % DECON_BENCH_MOD == 0:
            bench |= g
        else:
            train[int(did)] = g
    cols = set(got.columns)
    have = {
        int(r.doc_id): (int(r.n_shingles), int(r.n_contaminated))
        for r in got.itertuples()
    }
    want = {
        did: (len(g), len(g & bench)) for did, g in train.items()
    }
    assert have == want


def test_merge_upsert_semantics(spark):
    got = _run(spark, "merge_upsert")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    want = {}
    for r in cust.itertuples():
        k = int(r.c_custkey)
        if k % 7 == 0:
            want[k] = (r.c_acctbal * 2, "UPDATED")
        else:
            want[k] = (r.c_acctbal, r.c_mktsegment)
        if k % 97 == 0:
            want[k + 1000000] = (1.0, "NEW")
    have = {
        int(r.cust_key): (r.acctbal, r.segment) for r in got.itertuples()
    }
    assert have == want


def test_incremental_agg_merge_equals_direct(spark):
    got = _run(spark, "incremental_agg_merge")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    o = orders.assign(cents=_half_up_cents(orders["o_totalprice"]))
    g = o.groupby("o_orderpriority").agg(
        n=("cents", "size"), s=("cents", "sum")
    )
    have = {
        r.priority: (int(r.n_orders), int(r.revenue_cents))
        for r in got.itertuples()
    }
    assert have == {k: (int(r["n"]), int(r["s"])) for k, r in g.iterrows()}


def test_ngram_novelty_first_seen_recount(spark):
    from etl_building_inspector_spark.plans.queries_llm4 import NOVELTY_N

    got = _run(spark, "text_ngram_novelty")
    docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    first_seen: dict[str, int] = {}
    per_doc = {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        t = _py_tokens(txt)
        g = {
            " ".join(t[i : i + NOVELTY_N])
            for i in range(len(t) - NOVELTY_N + 1)
        }
        per_doc[int(did)] = g
        for x in g:
            first_seen.setdefault(x, int(did))
    want = {
        did: (len(g), sum(1 for x in g if first_seen[x] == did))
        for did, g in per_doc.items()
        if g
    }
    have = {
        int(r.doc_id): (int(r.n_shingles), int(r.n_novel))
        for r in got.itertuples()
    }
    assert have == want
    # novelty is conserved: every gram is novel in exactly one doc
    assert sum(n for _, n in want.values()) == len(first_seen)
