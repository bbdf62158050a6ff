"""Independent property tests for the timeseries + deterministic
sampling families: LOCF and linear gap-fill on a dense date spine,
integer CUSUM changepoints, min/max-preserving downsample, bounded
power-of-two EWMA, hash-deterministic samples/splits, and the corpus
trigram profile -- each recomputed with plain pandas/python.

The sampling recomputes re-derive the md5 priorities with hashlib, so
the 'deterministic reservoir' claim (result depends only on the salt
and the keys, never on partitioning) is pinned by a third
implementation.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, half_up, read


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _daily_counts():
    ev = read("events").copy()
    ev["day"] = ev["ts"].dt.normalize()
    return (
        ev.groupby(["event_type", "day"]).size().rename("n").reset_index()
    )


# ---------------------------------------------------------------------------
# Gap fill: LOCF and linear interpolation on the dense spine
# ---------------------------------------------------------------------------


def _spine_join():
    daily = _daily_counts()
    lo, hi = daily["day"].min(), daily["day"].max()
    days = pd.date_range(lo, hi, freq="D")
    types = sorted(daily["event_type"].unique())
    obs = {
        (r.event_type, r.day): int(r.n) for r in daily.itertuples(index=False)
    }
    return types, days, obs


def test_gapfill_locf_carry_and_staleness(spark):
    got = _run(spark, "timeseries_gapfill_locf")
    types, days, obs = _spine_join()
    rows = []
    for t in types:
        locf, last_day = None, None
        for d in days:
            n = obs.get((t, d))
            if n is not None:
                locf, last_day = n, d
            rows.append(
                {
                    "event_type": t,
                    "day": d,
                    "n_events": n if n is not None else 0,
                    "observed": n is not None,
                    "locf_n_events": locf if locf is not None else 0,
                    "days_since_obs": (d - last_day).days
                    if last_day is not None
                    else None,
                }
            )
    want = pd.DataFrame(rows)
    want["n_events"] = want["n_events"].astype("int64")
    want["locf_n_events"] = want["locf_n_events"].astype("int64")
    want["days_since_obs"] = want["days_since_obs"].astype("float64")
    got = got.copy()
    got["day"] = pd.to_datetime(got["day"])
    got["days_since_obs"] = got["days_since_obs"].astype("float64")
    got["observed"] = got["observed"].astype(bool).astype(str)
    want["observed"] = want["observed"].astype(bool).astype(str)
    frames_equal(got, want)
    # NOTE: at sf0.001 the spine happens to be dense (every type has
    # an event every day), so this run pins the observed path and the
    # spine construction; the gap-carry path is exercised by the same
    # recompute logic whenever the fixture has holes (and by the
    # densify_date_spine tests on sparser grains).
    assert len(want) == len(types) * len(days)


def test_gapfill_linear_integer_interpolation(spark):
    got = _run(spark, "timeseries_gapfill_linear")
    types, days, obs = _spine_join()
    rows = []
    for t in types:
        tdays = [d for d in days]
        observed_days = [d for d in tdays if (t, d) in obs]
        for d in tdays:
            n = obs.get((t, d))
            if n is not None:
                interp = n * 1000
            else:
                prevs = [x for x in observed_days if x < d]
                nexts = [x for x in observed_days if x > d]
                if not prevs or not nexts:
                    interp = None
                else:
                    pd_, nd_ = prevs[-1], nexts[0]
                    pn, nn = obs[(t, pd_)], obs[(t, nd_)]
                    interp = pn * 1000 + (nn - pn) * 1000 * (
                        d - pd_
                    ).days // (nd_ - pd_).days
            rows.append(
                {
                    "event_type": t,
                    "day": d,
                    "observed": n is not None,
                    "interp_milli": interp,
                }
            )
    want = pd.DataFrame(rows)
    want["interp_milli"] = want["interp_milli"].astype("float64")
    got = got.copy()
    got["day"] = pd.to_datetime(got["day"])
    got["interp_milli"] = got["interp_milli"].astype("float64")
    got["observed"] = got["observed"].astype(bool).astype(str)
    want["observed"] = want["observed"].astype(bool).astype(str)
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# CUSUM changepoint: integer-scaled deviations, peak |cusum| per type
# ---------------------------------------------------------------------------


def test_cusum_changepoint_peak_deviation(spark):
    got = _run(spark, "timeseries_cusum_changepoint")
    daily = _daily_counts()
    rows = []
    for t, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day")
        n_days = len(grp)
        total = int(grp["n"].sum())
        cusum, best = 0, None
        for r in grp.itertuples(index=False):
            cusum += int(r.n) * n_days - total
            key = (-abs(cusum), r.day)
            if best is None or key < best[0]:
                best = (key, r.day, cusum)
        rows.append(
            {
                "event_type": t,
                "changepoint_day": best[1],
                "cusum_scaled": best[2],
                "n_days": n_days,
                "total": total,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["cusum_scaled", "n_days", "total"]:
        want[c] = want[c].astype("int64")
    got = got.copy()
    got["changepoint_day"] = pd.to_datetime(got["changepoint_day"])
    frames_equal(got, want)
    # the scaled cusum telescopes to zero over the whole series --
    # sanity for the recompute itself
    for t, grp in daily.groupby("event_type"):
        n_days, total = len(grp), int(grp["n"].sum())
        assert sum(int(n) * n_days - total for n in grp["n"]) == 0


# ---------------------------------------------------------------------------
# Min/max downsample: composite-key extremes per (type, day)
# ---------------------------------------------------------------------------


def test_downsample_minmax_composite_key_extremes(spark):
    got = _run(spark, "timeseries_downsample_minmax")
    ev = read("events").copy()
    ev["day"] = ev["ts"].dt.normalize()
    ev["cents"] = half_up(ev["value"], 2).to_numpy()
    ev["ckey"] = ev["cents"] * 1_000_000_000_000 + ev["event_id"]
    rows = []
    for (t, d), grp in ev.groupby(["event_type", "day"]):
        lo, hi = int(grp["ckey"].min()), int(grp["ckey"].max())
        rows.append(
            {
                "event_type": t,
                "day": d,
                "kind": "min",
                "event_id": lo % 1_000_000_000_000,
                "cents": lo // 1_000_000_000_000,
            }
        )
        rows.append(
            {
                "event_type": t,
                "day": d,
                "kind": "max",
                "event_id": hi % 1_000_000_000_000,
                "cents": hi // 1_000_000_000_000,
            }
        )
    want = pd.DataFrame(rows)
    want["event_id"] = want["event_id"].astype("int64")
    want["cents"] = want["cents"].astype("int64")
    got = got.copy()
    got["day"] = pd.to_datetime(got["day"])
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Bounded EWMA: 8-row power-of-two weights, integer num/den
# ---------------------------------------------------------------------------


def test_ewma_bounded_weights(spark):
    got = _run(spark, "timeseries_ewma_bounded")
    o = read("orders").copy()
    o["cents"] = half_up(o["o_totalprice"], 2).to_numpy()
    daily = (
        o.groupby("o_orderdate")["cents"].sum().sort_index().reset_index()
    )
    cents = daily["cents"].astype("int64").tolist()
    rows = []
    W = 8
    for i, (day, c) in enumerate(zip(daily["o_orderdate"], cents)):
        num = den = 0
        for j in range(max(0, i - W + 1), i + 1):
            wgt = 1 << (W - 1 - (i - j))
            num += cents[j] * wgt
            den += wgt
        rows.append(
            {
                "day": day,
                "cents": c,
                "ewma_num": num,
                "ewma_den": den,
                "ewma_cents": num / den,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["cents", "ewma_num", "ewma_den"]:
        want[c] = want[c].astype("int64")
    got = got.copy()
    got["day"] = pd.to_datetime(got["day"])
    frames_equal(got, want)
    # full-window rows have the full geometric denominator 2^8 - 1
    assert (want["ewma_den"].iloc[W - 1 :] == (1 << W) - 1).all()


# ---------------------------------------------------------------------------
# Deterministic sampling: md5 priorities rebuilt with hashlib
# ---------------------------------------------------------------------------


def test_sample_bottomk_is_md5_priority_prefix(spark):
    got = _run(spark, "sample_bottomk")
    docs = read("documents").copy()
    docs["pri"] = docs["doc_id"].map(lambda i: _md5(f"rsv:{i}"))
    pick = docs.sort_values(["pri", "doc_id"]).head(100)
    want = pd.DataFrame(
        {
            "doc_id": pick["doc_id"].astype("int64"),
            "source": pick["source"],
            "n_chars": pick["n_chars"].astype("int64"),
        }
    )
    frames_equal(got, want)


def test_sample_reservoir_merge_equals_global_bottomk(spark):
    """The two-stage per-partition reservoir + merge must be
    partitioning-INVISIBLE: identical to the plain global bottom-50
    on the same salted priority."""
    got = _run(spark, "sample_reservoir_merge")
    docs = read("documents").copy()
    docs["pri"] = docs["doc_id"].map(lambda i: _md5(f"rsvm:{i}"))
    pick = docs.sort_values(["pri", "doc_id"]).head(50)
    want = pd.DataFrame(
        {
            "doc_id": pick["doc_id"].astype("int64"),
            "source": pick["source"],
            "n_chars": pick["n_chars"].astype("int64"),
        }
    )
    frames_equal(got, want)


def test_sample_group_bottomk_nested_prefix_property(spark):
    got = _run(spark, "sample_group_bottomk")
    docs = read("documents").copy()
    docs["pri"] = docs["doc_id"].map(lambda i: _md5(f"grp:{i}"))
    rows = []
    for src, grp in docs.groupby("source"):
        grp = grp.sort_values(["pri", "doc_id"])
        for rn, r in enumerate(grp.itertuples(index=False), start=1):
            if rn > 10:
                break
            rows.append({"doc_id": int(r.doc_id), "source": src, "rn": rn})
    want = pd.DataFrame(rows)
    want["doc_id"] = want["doc_id"].astype("int64")
    want["rn"] = want["rn"].astype("int64")
    frames_equal(got, want)


def test_split_train_valid_test_hash_buckets(spark):
    got = _run(spark, "split_train_valid_test")
    docs = read("documents")
    pct = docs["doc_id"].map(lambda i: int(_md5(f"split:{i}")[:8], 16) % 100)
    split = pct.map(
        lambda p: "train" if p < 80 else ("valid" if p < 90 else "test")
    )
    want = pd.DataFrame(
        {
            "doc_id": docs["doc_id"].astype("int64"),
            "source": docs["source"],
            "split": split,
        }
    )
    frames_equal(got, want)
    # every document is assigned exactly once (partition law)
    assert len(got) == len(docs)


# ---------------------------------------------------------------------------
# Corpus trigram profile: raw-split trigrams, deterministic top-20
# ---------------------------------------------------------------------------


def test_text_ngram_topk_counts(spark):
    got = _run(spark, "text_ngram_topk")
    docs = read("documents")
    counts: dict[str, int] = {}
    for t in docs["text"]:
        w = t.split(" ")
        for i in range(len(w) - 2):
            g = f"{w[i]} {w[i + 1]} {w[i + 2]}"
            counts[g] = counts.get(g, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = pd.DataFrame(top, columns=["gram", "n"])
    want["n"] = want["n"].astype("int64")
    frames_equal(got, want)
