"""Independent property tests for the corpus-engineering family:
packing layout/efficiency, epoch shuffle, mixture resampling and
deficit planning, domain caps, T5 span corruption, negative sampling,
contrastive pair mining, the privacy triad's cap/l-diversity/
t-closeness, source overlap, survivor bias, and norm outliers --
each recomputed from raw parquet with python/hashlib.

The negative-sampling recompute replays the engine's EXACT float
discipline (sequential cumulative fold in token order, total = last
cumulative value, lo = previous hi) -- the construction whose whole
point is that naive reformulations (unordered sum, independent floor)
would NOT reproduce it.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, half_up, read
from tests.test_r7_dedup_properties import (
    _docs_with_dups,
    _md5,
    _norm,
    _shingles,
    _toks,
)


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


def _u32(s: str) -> int:
    return int(_md5(s)[:8], 16)


# ---------------------------------------------------------------------------
# Packing: concat-chunk layout and greedy-bin efficiency
# ---------------------------------------------------------------------------


def test_pack_concat_chunks_prefix_layout(spark):
    got = _run(spark, "pack_concat_chunks")
    docs = read("documents").sort_values("doc_id")
    C = 256
    off = 0
    rows = []
    for r in docs.itertuples(index=False):
        n = len(_toks(r.text))
        rows.append(
            {
                "doc_id": int(r.doc_id),
                "n_tokens": n,
                "start_offset": off,
                "chunk_first": off // C,
                "chunk_last": off // C if n == 0 else (off + n - 1) // C,
                "offset_in_chunk": off % C,
            }
        )
        off += n
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)
    # layout law: consecutive docs tile the token line with no gaps
    assert off == want["n_tokens"].sum()


def test_pack_efficiency_stats_first_fit_walk(spark):
    got = _run(spark, "pack_efficiency_stats")
    docs = read("documents").sort_values("doc_id")
    B = 256
    bins: dict[str, list[list[int]]] = {}  # src -> list of [fill, n_docs]
    for r in docs.itertuples(index=False):
        n = len(_toks(r.text))
        blist = bins.setdefault(r.source, [])
        if not blist or blist[-1][0] + n > B:
            blist.append([n, 1])
        else:
            blist[-1][0] += n
            blist[-1][1] += 1
    rows = []
    for src, blist in sorted(bins.items()):
        fills = [f for f, _ in blist]
        rows.append(
            {
                "grp": src,
                "n_bins": len(blist),
                "n_docs": sum(nd for _, nd in blist),
                "tokens_packed": sum(fills),
                "tokens_capacity": len(blist) * B,
                "fill_ppm": sum(fills) * 1_000_000 // (len(blist) * B),
                "max_fill": max(fills),
                "min_fill": min(fills),
            }
        )
    want = pd.DataFrame(rows)
    for c in want.columns:
        if c != "grp":
            want[c] = want[c].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Epoch shuffle / mixture resample / domain cap
# ---------------------------------------------------------------------------


def test_corpus_epoch_shuffle_shards_and_positions(spark):
    got = _run(spark, "corpus_epoch_shuffle")
    docs = read("documents")
    recs = []
    for i in docs["doc_id"].astype(int):
        h = _md5(f"ep3:{i}")
        recs.append((int(h[:8], 16) % 8, h, i))
    rows = []
    for shard in range(8):
        members = sorted((h, i) for s, h, i in recs if s == shard)
        for pos, (_, i) in enumerate(members, start=1):
            rows.append({"doc_id": i, "shard": shard, "position": pos})
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)
    # permutation law: every doc appears exactly once
    assert len(want) == len(docs)


def test_mixture_resample_rates_and_kept(spark):
    got = _run(spark, "mixture_resample")
    docs = read("documents")
    counts = docs["lang"].value_counts().to_dict()
    targets = {"en": 0.5, "zh": 0.3}
    ratio = {
        lang: targets.get(lang, 0.2) / n for lang, n in counts.items()
    }
    mx = max(ratio.values())
    rate = {lang: r / mx for lang, r in ratio.items()}
    rows = []
    for r in docs.itertuples(index=False):
        u = _u32(f"mix:{r.doc_id}")
        import math

        kept = u < int(math.floor(rate[r.lang] * 4294967296.0))
        rows.append(
            {
                "doc_id": int(r.doc_id),
                "lang": r.lang,
                "rate": rate[r.lang],
                "kept": kept,
            }
        )
    want = pd.DataFrame(rows)
    want["doc_id"] = want["doc_id"].astype("int64")
    got = got.copy()
    got["kept"] = got["kept"].astype(bool).astype(str)
    want["kept"] = want["kept"].astype(bool).astype(str)
    frames_equal(got, want)
    # the most-underrepresented language keeps everything (rate 1.0)
    full_lang = max(rate, key=rate.get)
    assert rate[full_lang] == 1.0
    assert want.loc[want["lang"] == full_lang, "kept"].eq("True").all()


def test_domain_cap_sample_ranks(spark):
    got = _run(spark, "domain_cap_sample")
    docs = read("documents")
    rows = []
    for src, grp in docs.groupby("source"):
        members = sorted(
            (_md5(f"cap:{i}"), int(i)) for i in grp["doc_id"]
        )
        for rk, (_, i) in enumerate(members, start=1):
            rows.append(
                {"doc_id": i, "source": src, "cap_rank": rk, "kept": rk <= 100}
            )
    want = pd.DataFrame(rows)
    want["doc_id"] = want["doc_id"].astype("int64")
    want["cap_rank"] = want["cap_rank"].astype("int64")
    got = got.copy()
    got["kept"] = got["kept"].astype(bool).astype(str)
    want["kept"] = want["kept"].astype(bool).astype(str)
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# T5 span corruption: deterministic masks, merged-run sentinels
# ---------------------------------------------------------------------------


def test_corpus_span_corruption(spark):
    got = _run(spark, "corpus_span_corruption")
    docs = read("documents")
    rows = []
    for r in docs.itertuples(index=False):
        toks = _toks(r.text)
        n = len(toks)

        def masked(pos: int) -> bool:  # 1-based
            for k in range(3):
                start = pos - k
                if start < 1:
                    continue
                u = _u32(f"sc:{r.doc_id}:{start}")
                if u % 20 == 0 and 1 + (u // 20) % 3 >= k + 1:
                    return True
            return False

        flags = [masked(p) for p in range(1, n + 1)]
        pieces = []
        n_spans = 0
        for i, (tok, m) in enumerate(zip(toks, flags)):
            if not m:
                pieces.append(tok)
            elif i == 0 or not flags[i - 1]:
                pieces.append("<X>")
                n_spans += 1
        n_masked = sum(flags)
        rows.append(
            {
                "doc_id": int(r.doc_id),
                "n_tokens": n,
                "n_masked": n_masked,
                "n_spans": n_spans,
                "mask_ppm": 1_000_000 * n_masked // n,
                "corrupted_md5": _md5(" ".join(pieces)),
            }
        )
    want = pd.DataFrame(rows)
    for c in ["doc_id", "n_tokens", "n_masked", "n_spans", "mask_ppm"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    assert want["n_masked"].sum() > 0


# ---------------------------------------------------------------------------
# Negative sampling: the exact float discipline replayed
# ---------------------------------------------------------------------------


def test_corpus_negative_sampling_inverse_cdf(spark):
    got = _run(spark, "corpus_negative_sampling")
    docs = read("documents")
    freq: dict[str, int] = {}
    for t in docs["text"]:
        for tok in _toks(t):
            freq[tok] = freq.get(tok, 0) + 1
    import math

    toks_sorted = sorted(freq)
    cw = 0.0
    his = []
    for tok in toks_sorted:
        f = float(freq[tok])
        cw += math.sqrt(f) * math.sqrt(math.sqrt(f))
        his.append(cw)
    total = his[-1]  # last cumulative value, the engines' max(cw)
    intervals = []
    lo = 0
    for tok, cwi in zip(toks_sorted, his):
        hi = int(math.floor(cwi / total * 2**32))
        if hi > lo:
            intervals.append((lo, hi, tok))
        lo = hi
    draws: dict[str, int] = {}
    import bisect

    los = [iv[0] for iv in intervals]
    for i in range(1000):
        u = _u32(f"ns:{i}")
        j = bisect.bisect_right(los, u) - 1
        lo_j, hi_j, tok = intervals[j]
        assert lo_j <= u < hi_j  # the partition really covers u
        draws[tok] = draws.get(tok, 0) + 1
    rows = [
        {"tok": tok, "freq": freq[tok], "n_draws": n}
        for tok, n in sorted(draws.items())
    ]
    want = pd.DataFrame(rows)
    want["freq"] = want["freq"].astype("int64")
    want["n_draws"] = want["n_draws"].astype("int64")
    frames_equal(got, want)
    assert want["n_draws"].sum() == 1000  # every draw lands somewhere


# ---------------------------------------------------------------------------
# Contrastive pairs: md5-priority top-k per (anchor, side)
# ---------------------------------------------------------------------------


def test_emb_contrastive_pairs(spark):
    got = _run(spark, "emb_contrastive_pairs")
    emb = read("embeddings")
    labels = dict(zip(emb["vec_id"].astype(int), emb["label"].astype(int)))
    rows = []
    for a in sorted(labels):
        if a >= 20:
            continue
        pos, neg = [], []
        for c in sorted(labels):
            if c == a:
                continue
            pri = (_u32(f"cp:{a}:{c}"), c)
            (pos if labels[c] == labels[a] else neg).append(pri)
        for side, lst, k in ((1, pos, 2), (0, neg, 2)):
            lst.sort()
            for rnk, (_, c) in enumerate(lst[:k], start=1):
                rows.append(
                    {
                        "anchor_id": a,
                        "cand_id": c,
                        "is_positive": side,
                        "rnk": rnk,
                    }
                )
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Privacy triad: contribution cap, l-diversity, t-closeness
# ---------------------------------------------------------------------------


def test_privacy_contribution_cap(spark):
    got = _run(spark, "privacy_contribution_cap")
    orders = read("orders").copy()
    orders["cents"] = half_up(orders["o_totalprice"], 2).to_numpy()
    orders["month"] = orders["o_orderdate"].dt.strftime("%Y-%m")
    orders = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    orders["rn"] = orders.groupby("o_custkey").cumcount() + 1
    capped = orders[orders["rn"] <= 3]
    t = orders.groupby("month").agg(
        n_orders_total=("cents", "size"), rev_total_cents=("cents", "sum")
    )
    c = capped.groupby("month").agg(
        n_orders_capped=("cents", "size"), rev_capped_cents=("cents", "sum")
    )
    want = t.join(c, how="left").fillna(0).reset_index()
    want = want[
        ["month", "n_orders_capped", "n_orders_total", "rev_capped_cents", "rev_total_cents"]
    ]
    for col in want.columns[1:]:
        want[col] = want[col].astype("int64")
    frames_equal(got, want)
    # the cap must bite on this fixture
    assert (want["n_orders_capped"] < want["n_orders_total"]).any()


def test_privacy_l_diversity(spark):
    got = _run(spark, "privacy_l_diversity")
    cust = read("customer").copy()
    cust["cents"] = half_up(cust["c_acctbal"], 2).to_numpy()
    cust["band"] = (cust["cents"] + 100000) // 100000
    rows = []
    for (nk, band), grp in cust.groupby(["c_nationkey", "band"]):
        size, nd = len(grp), grp["c_mktsegment"].nunique()
        if size >= 2 and nd < 3:
            rows.append(
                {
                    "c_nationkey": int(nk),
                    "bal_band": int(band),
                    "group_size": size,
                    "n_distinct_sensitive": nd,
                }
            )
    want = pd.DataFrame(
        rows,
        columns=["c_nationkey", "bal_band", "group_size", "n_distinct_sensitive"],
    ).astype("int64")
    frames_equal(got, want)


def test_privacy_t_closeness_tvd(spark):
    got = _run(spark, "privacy_t_closeness")
    cust = read("customer")
    n = len(cust)
    seg_tot = cust["c_mktsegment"].value_counts().to_dict()
    rows = []
    for nk, grp in cust.groupby("c_nationkey"):
        n_g = len(grp)
        gc = grp["c_mktsegment"].value_counts().to_dict()
        num = sum(
            abs(gc.get(seg, 0) * n - cnt_s * n_g)
            for seg, cnt_s in seg_tot.items()
        )
        tvd_ppm = num * 1_000_000 // (2 * n_g * n)
        rows.append(
            {
                "nationkey": int(nk),
                "n_group": n_g,
                "tvd_ppm": tvd_ppm,
                "violates_t": tvd_ppm > 200_000,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["nationkey", "n_group", "tvd_ppm"]:
        want[c] = want[c].astype("int64")
    got = got.copy()
    got["violates_t"] = got["violates_t"].astype(bool).astype(str)
    want["violates_t"] = want["violates_t"].astype(bool).astype(str)
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# Source overlap / survivor bias / mixture deficit / norm outliers
# ---------------------------------------------------------------------------


def test_corpus_source_overlap_jaccard_matrix(spark):
    got = _run(spark, "corpus_source_overlap")
    docs = read("documents")
    per_src: dict[str, set] = {}
    for r in docs.itertuples(index=False):
        per_src.setdefault(r.source, set()).update(_shingles(_toks(r.text)))
    srcs = sorted(per_src)
    rows = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            common = len(per_src[a] & per_src[b])
            if common == 0:
                continue
            na, nb = len(per_src[a]), len(per_src[b])
            rows.append(
                {
                    "src_a": a,
                    "src_b": b,
                    "n_common": common,
                    "n_a": na,
                    "n_b": nb,
                    "jaccard_ppm": common * 1_000_000 // (na + nb - common),
                }
            )
    want = pd.DataFrame(rows)
    for c in ["n_common", "n_a", "n_b", "jaccard_ppm"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


def test_corpus_dedup_survivor_bias(spark):
    got = _run(spark, "corpus_dedup_survivor_bias")
    d = _docs_with_dups()
    docs = read("documents")
    src_of = dict(zip(docs["doc_id"].astype(int), docs["source"]))
    d = d.assign(
        source=d["doc_id"].map(lambda i: src_of[int(i) % 100_000]),
        fp=d["text"].map(lambda t: _md5(_norm(t))),
        n_chars=d["text"].str.len(),
    )
    first = d.groupby("fp")["doc_id"].min()
    d["kept"] = d.apply(lambda r: int(r["doc_id"] == first[r["fp"]]), axis=1)
    rows = []
    for src, grp in d.groupby("source"):
        rows.append(
            {
                "source": src,
                "n_total": len(grp),
                "n_kept": int(grp["kept"].sum()),
                "n_dropped": int((1 - grp["kept"]).sum()),
                "kept_chars": int((grp["kept"] * grp["n_chars"]).sum()),
                "dropped_chars": int(
                    ((1 - grp["kept"]) * grp["n_chars"]).sum()
                ),
            }
        )
    want = pd.DataFrame(rows)
    for c in ["n_total", "n_kept", "n_dropped", "kept_chars", "dropped_chars"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    assert (want["n_dropped"] > 0).any()


def test_corpus_mixture_deficit(spark):
    got = _run(spark, "corpus_mixture_deficit")
    docs = read("documents")
    actual: dict[str, int] = {}
    for r in docs.itertuples(index=False):
        actual[r.lang] = actual.get(r.lang, 0) + len(_toks(r.text))
    total = sum(actual.values())
    n_langs = len(actual)
    target = total // n_langs
    rows = [
        {
            "lang": lang,
            "actual_tokens": n,
            "target_tokens": target,
            "deficit_tokens": target - n,
            "resample_factor": float(target) / n,
        }
        for lang, n in sorted(actual.items())
    ]
    want = pd.DataFrame(rows)
    for c in ["actual_tokens", "target_tokens", "deficit_tokens"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    # deficits sum to ~0 (up to integer-division remainder)
    assert 0 <= -want["deficit_tokens"].sum() < n_langs + total % n_langs


def test_emb_norm_percentile_outliers(spark):
    got = _run(spark, "emb_norm_percentile_outliers")
    emb = read("embeddings")
    rows = []
    for label, grp in emb.groupby("label"):
        scored = []
        for r in grp.itertuples(index=False):
            acc = 0.0
            for x in r.embedding:
                acc += float(x) * float(x)
            scored.append((-acc, int(r.vec_id), acc))
        scored.sort()
        n_label = len(scored)
        for rank, (_, vid, norm2) in enumerate(scored, start=1):
            if rank * 100 <= n_label * 1 + 99:
                rows.append(
                    {
                        "label": int(label),
                        "vec_id": vid,
                        "rank": rank,
                        "norm2": norm2,
                    }
                )
    want = pd.DataFrame(rows)
    for c in ["label", "vec_id", "rank"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
