"""Independent property tests for the streaming surface, the composed
curation pipeline, IVF-PQ, and the domain transform.

The streaming tests recompute each query's BATCH-EQUIVALENT semantics
in pandas and compare against the INCREMENTAL execution (file-source
micro-batches, state store, memory sink) -- so the streaming engine's
session merging, watermark eviction, stream-static join, and
within-watermark dedup are pinned by a third implementation, not just
by the DuckDB twin.

The domain-transform tests are structural (cross-query consistency +
NDJSON validity): the full per-record values are already pinned by
the golden files in tests/test_pipeline.py.
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, half_up, read
from tests.test_r7_dedup_properties import (
    _docs_with_dups,
    _md5,
    _norm,
    _shingles,
    _signature,
    _toks,
)
from tests.test_r7_embedding_properties import _cos, _vecs
from tests.test_r7_pq_multimodal_properties import _pq_encode


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


US = 1_000_000


# ---------------------------------------------------------------------------
# Streaming: batch-equivalent recomputes vs incremental execution
# ---------------------------------------------------------------------------


def test_streaming_sessionize_incremental_equals_gap_walk(spark):
    got = _run(spark, "streaming_sessionize")
    ev = read("events").sort_values(["user_id", "ts", "event_id"])
    rows = []
    for uid, grp in ev.groupby("user_id"):
        cur = None
        for ts in grp["ts"]:
            if cur is None or (ts - cur[1]).total_seconds() * US > 1800 * US:
                if cur is not None:
                    rows.append(cur)
                cur = [ts, ts, 1, int(uid)]
            else:
                cur[1] = ts
                cur[2] += 1
        if cur is not None:
            rows.append(cur)
    want = pd.DataFrame(
        [
            {
                "user_id": uid,
                "session_start": s,
                "session_end": e + pd.Timedelta(minutes=30),
                "n_events": n,
            }
            for s, e, n, uid in rows
        ]
    )
    want["user_id"] = want["user_id"].astype("int64")
    want["n_events"] = want["n_events"].astype("int64")
    frames_equal(got, want)


def test_streaming_windowed_agg_incremental(spark):
    got = _run(spark, "streaming_windowed_agg")
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
                "sum_value": int(half_up([s], 4).iloc[0]) / 1e4,
            }
        )
    want = pd.DataFrame(rows)
    want["n_events"] = want["n_events"].astype("int64")
    frames_equal(got, want)


def test_streaming_dim_join_agg_incremental(spark):
    got = _run(spark, "streaming_dim_join_agg")
    ev, cust = read("events"), read("customer")
    j = ev.merge(cust, left_on="user_id", right_on="c_custkey")
    j["e4"] = half_up(j["value"], 4).to_numpy()
    g = j.groupby("c_mktsegment").agg(
        n_events=("e4", "size"), value_e4=("e4", "sum")
    )
    want = pd.DataFrame(
        {
            "segment": g.index,
            "n_events": g["n_events"].astype("int64").to_numpy(),
            "value_e4": g["value_e4"].astype("int64").to_numpy(),
        }
    )
    frames_equal(got, want)


def test_streaming_stream_stream_join_incremental(spark):
    got = _run(spark, "streaming_stream_stream_join")
    ev = read("events")
    clicks = ev[ev["event_type"] == "click"]
    purchases = ev[ev["event_type"] == "purchase"]
    rows = []
    for p in purchases.itertuples(index=False):
        mine = clicks[
            (clicks["user_id"] == p.user_id)
            & (clicks["ts"] <= p.ts)
            & (clicks["ts"] >= p.ts - pd.Timedelta(hours=1))
        ]
        for c in mine.itertuples(index=False):
            rows.append(
                {
                    "user_id": int(c.user_id),
                    "click_id": int(c.event_id),
                    "click_ts": c.ts,
                    "purchase_id": int(p.event_id),
                    "purchase_ts": p.ts,
                    "purchase_value": p.value,
                }
            )
    want = pd.DataFrame(
        rows,
        columns=[
            "user_id",
            "click_id",
            "click_ts",
            "purchase_id",
            "purchase_ts",
            "purchase_value",
        ],
    )
    for c in ["user_id", "click_id", "purchase_id"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    assert len(want) > 0


def test_streaming_dedup_exact_emits_each_event_once(spark):
    """The stream feeds every event TWICE (self-union);
    dropDuplicatesWithinWatermark must emit the distinct set."""
    got = _run(spark, "streaming_dedup_exact")
    ev = read("events")
    want = pd.DataFrame(
        {
            "event_id": ev["event_id"].astype("int64"),
            "user_id": ev["user_id"].astype("int64"),
            "event_type": ev["event_type"],
            "ts": ev["ts"],
        }
    )
    frames_equal(got, want)


def test_streaming_late_data_drop_watermark_algebra(spark):
    got = _run(spark, "streaming_late_data_drop")
    ev = read("events")
    t0, t1 = pd.Timestamp("2024-01-16"), pd.Timestamp("2024-01-29")
    bulk = ev[(ev["ts"] >= t0) & (ev["ts"] < t1)]
    wm1 = bulk["ts"].max() - pd.Timedelta(days=20)
    wm2 = ev["ts"].max() - pd.Timedelta(days=20)
    stragglers = ev[ev["ts"] < t0].copy()
    stragglers["window_start"] = stragglers["ts"].dt.floor("h")
    cells = (
        stragglers.groupby(["window_start", "event_type"])
        .size()
        .rename("n_events")
        .reset_index()
    )
    cells["window_end"] = cells["window_start"] + pd.Timedelta(hours=1)
    keep = cells[(cells["window_end"] > wm1) & (cells["window_end"] <= wm2)]
    want = keep[["window_start", "event_type", "n_events"]].copy()
    want["n_events"] = want["n_events"].astype("int64")
    frames_equal(got, want)
    # the drop is real: some straggler cells fall outside (wm1, wm2]
    assert len(keep) < len(cells)


# ---------------------------------------------------------------------------
# IVF-PQ: probed cells x PQ reconstructions
# ---------------------------------------------------------------------------


def test_ann_ivf_pq_composition(spark):
    got = _run(spark, "ann_cosine_ivf_pq")
    vecs = _vecs()
    _, recon = _pq_encode()
    pri = sorted(
        vecs, key=lambda i: (hashlib.md5(f"cent:{i}".encode()).hexdigest(), i)
    )
    cents = {c: vecs[c] for c in pri[:16]}

    def rank_cents(v):
        return sorted(
            ((_cos(v, cv), cid) for cid, cv in cents.items()),
            key=lambda t: (-t[0], t[1]),
        )

    assign = {vid: rank_cents(v)[0][1] for vid, v in vecs.items()}
    rows = []
    for q in sorted(vecs):
        if q >= 10:
            continue
        probes = {cid for _, cid in rank_cents(vecs[q])[:6]}
        cand = {c for c, cell in assign.items() if cell in probes and c != q}
        sims = sorted(
            ((_cos(vecs[q], recon[c]), c) for c in cand),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (cos, c) in enumerate(sims[:5], start=1):
            rows.append(
                {
                    "query_id": q,
                    "neighbor_id": c,
                    "adc_cosine": cos,
                    "rank": rank,
                }
            )
    want = pd.DataFrame(rows)
    for c in ["query_id", "neighbor_id", "rank"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Composed curation pipeline: stage-by-stage python replay
# ---------------------------------------------------------------------------


def test_pipeline_corpus_curation_e2e_composition(spark):
    got = _run(spark, "pipeline_corpus_curation_e2e")
    docs = read("documents")
    recs = {
        int(r.doc_id): (r.lang, r.source, _toks(r.text), r.text)
        for r in docs.itertuples(index=False)
    }
    # stage 1: quality gate on token count
    quality = {
        i: v for i, v in recs.items() if 30 <= len(v[2]) <= 1000
    }
    # stage 2: exact dedup, keep lowest id per normalized-text md5
    first: dict[str, int] = {}
    for i in sorted(quality):
        f = _md5(_norm(quality[i][3]))
        first.setdefault(f, i)
    keep1 = {i: v for i, v in quality.items() if first[_md5(_norm(v[3]))] == i}
    # stage 3: benchmark exclusion + 4-gram decontamination
    grams = {i: set(_shingles(v[2], 4)) for i, v in keep1.items()}
    bench_grams = set()
    for i, g in grams.items():
        if i % 17 == 0:
            bench_grams |= g
    clean = {
        i: v
        for i, v in keep1.items()
        if i % 17 != 0 and not (grams[i] & bench_grams)
    }
    # stage 4: MinHash-LSH near-dup removal (keep-lowest, cap 32)
    buckets: dict[tuple[int, str], list[int]] = {}
    for i, v in clean.items():
        sig = _signature(v[3])
        if sig[0] is None:
            continue
        for b in range(4):
            key = _md5("|".join([sig[b * 2], sig[b * 2 + 1]]))
            buckets.setdefault((b, key), []).append(i)
    drop = set()
    for ids in buckets.values():
        if len(ids) > 32:
            continue
        ids = sorted(ids)
        drop.update(ids[1:])  # every non-lowest member of the bucket
    # NOTE: the SQL drops b.doc_id for any pair a<b -- i.e. any doc
    # with a SMALLER co-bucketed doc anywhere, which equals dropping
    # all non-minimum members per bucket unioned across buckets
    final = {i: v for i, v in clean.items() if i not in drop}
    want = pd.DataFrame(
        [
            {
                "doc_id": i,
                "lang": v[0],
                "source": v[1],
                "n_tokens": len(v[2]),
            }
            for i, v in sorted(final.items())
        ]
    )
    want["doc_id"] = want["doc_id"].astype("int64")
    want["n_tokens"] = want["n_tokens"].astype("int64")
    frames_equal(got, want)
    # every stage must bite on this fixture
    assert len(quality) < len(recs)
    assert len(clean) < len(keep1)


# ---------------------------------------------------------------------------
# Domain transform: structural cross-consistency + NDJSON validity
# (full per-record values are pinned by tests/test_pipeline.py goldens)
# ---------------------------------------------------------------------------


def test_domain_transform_and_ndjson_consistency(spark):
    records = _run(spark, "domain_transform_records")
    lines = _run(spark, "domain_ndjson_lines")
    # 1. one NDJSON line per record, same record_type marginals
    assert len(records) == len(lines)
    assert (
        records["record_type"].value_counts().to_dict()
        == lines["record_type"].value_counts().to_dict()
    )
    # 2. every line is valid JSON of shape {type, obj}
    for v in lines["value"]:
        obj = json.loads(v)
        assert set(obj.keys()) == {"type", "obj"}
    # 3. the union is heterogeneous: objects, relations AND logs exist
    kinds = set(records["record_type"])
    assert {"object", "relation", "log"} <= kinds
    # 4. relations reference object ids that exist (integrity law)
    obj_ids = set(records.loc[records["record_type"] == "object", "id"])
    rel_from = records.loc[records["record_type"] == "relation", "rel_from"]
    assert rel_from.isin(obj_ids).all()
