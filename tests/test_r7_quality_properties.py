"""Independent property tests for the quality/eval/ER remainder:
Gopher rules, CCNet terciles, OOV rates, integer TF-IDF, PII scrub,
boilerplate strip, BPE merge pairs, winsorized stats, lifecycle
states, sessionization timeout sensitivity, linear attribution,
class balancing, phonetic ER blocking (with a python Soundex and
Levenshtein), and bloom decontamination -- recomputed in python.
"""

from __future__ import annotations

import re

import pandas as pd
import pytest

from etl_building_inspector_spark.functions.text import LANG_STOPWORDS
from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, half_up, read
from tests.test_r7_dedup_properties import _md5, _shingles, _toks
from tests.test_r7_surface_properties import _ntile


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


US = 1_000_000


# ---------------------------------------------------------------------------
# Gopher rules / CCNet terciles
# ---------------------------------------------------------------------------


def test_quality_gopher_rules(spark):
    got = _run(spark, "quality_gopher_rules")
    docs = read("documents")
    en = set(LANG_STOPWORDS["en"])
    per_src: dict[str, list[int]] = {}
    for r in docs.itertuples(index=False):
        toks = _toks(r.text)
        n_tok = len(toks)
        n_chr = len("".join(toks))
        stop_hits = sum(1 for t in toks if t in en)
        n_alpha = sum(1 for t in toks if re.search(r"[a-z]", t))
        rules = [
            20 <= n_tok <= 100_000,
            3 * n_tok <= n_chr <= 10 * n_tok,
            stop_hits >= 2,
            5 * n_alpha >= 4 * n_tok,
        ]
        st = per_src.setdefault(r.source, [0, 0, 0, 0, 0, 0])
        st[0] += 1
        for i, ok in enumerate(rules):
            st[1 + i] += int(ok)
        st[5] += int(all(rules))
    rows = [
        {
            "source": s,
            "n_docs": st[0],
            "n_pass_wordcount": st[1],
            "n_pass_meanlen": st[2],
            "n_pass_stopword": st[3],
            "n_pass_alpha": st[4],
            "n_pass_all": st[5],
        }
        for s, st in sorted(per_src.items())
    ]
    want = pd.DataFrame(rows)
    for c in want.columns:
        if c != "source":
            want[c] = want[c].astype("int64")
    frames_equal(got, want)


def test_quality_terciles_by_lang(spark):
    got = _run(spark, "quality_terciles_by_lang")
    docs = read("documents")
    en = set(LANG_STOPWORDS["en"])
    rows = []
    for lang, grp in docs.groupby("lang"):
        scored = []
        for r in grp.itertuples(index=False):
            toks = _toks(r.text)
            score = sum(1 for t in toks if t in en) / len(toks)
            scored.append((-score, int(r.doc_id), score))
        scored.sort()
        tiles = _ntile(len(scored), 3)
        for (_, doc_id, score), tile in zip(scored, tiles):
            rows.append(
                {
                    "doc_id": doc_id,
                    "lang": lang,
                    "score": score,
                    "bucket": {1: "head", 2: "middle"}.get(tile, "tail"),
                }
            )
    want = pd.DataFrame(rows)
    want["doc_id"] = want["doc_id"].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# OOV / TF-IDF / BPE merge pairs
# ---------------------------------------------------------------------------


def test_text_oov_bigram_rate(spark):
    got = _run(spark, "text_oov_bigram_rate")
    docs = read("documents")
    doc_grams: dict[int, list[str]] = {}
    freq: dict[str, int] = {}
    for r in docs.itertuples(index=False):
        grams = [r.text[i : i + 2] for i in range(len(r.text) - 1)]
        doc_grams[int(r.doc_id)] = grams
        for g in grams:
            freq[g] = freq.get(g, 0) + 1
    vocab = {
        g
        for g, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:64]
    }
    rows = []
    for i, grams in sorted(doc_grams.items()):
        n_oov = sum(1 for g in grams if g not in vocab)
        rows.append(
            {
                "doc_id": i,
                "n_bigrams": len(grams),
                "n_oov": n_oov,
                "oov_ppm": n_oov * US // len(grams),
            }
        )
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)


def test_text_tfidf_topk_floor_idf(spark):
    got = _run(spark, "text_tfidf_topk")
    docs = read("documents")
    N = len(docs)
    tf: dict[int, dict[str, int]] = {}
    df: dict[str, int] = {}
    for r in docs.itertuples(index=False):
        c: dict[str, int] = {}
        for t in _toks(r.text):
            c[t] = c.get(t, 0) + 1
        tf[int(r.doc_id)] = c
        for t in c:
            df[t] = df.get(t, 0) + 1
    import math

    rows = []
    for doc_id in sorted(tf):
        scored = [
            (t, cnt * int(math.floor(1000000.0 * N / df[t])))
            for t, cnt in tf[doc_id].items()
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (t, s) in enumerate(scored[:3], start=1):
            rows.append({"doc_id": doc_id, "tok": t, "score": s, "rank": rank})
    want = pd.DataFrame(rows)
    for c in ["doc_id", "score", "rank"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


def test_text_bpe_merge_pairs(spark):
    got = _run(spark, "text_bpe_merge_pairs")
    docs = read("documents")
    wf: dict[str, int] = {}
    for t in docs["text"]:
        for w in _toks(t):
            wf[w] = wf.get(w, 0) + 1
    totals: dict[str, int] = {}
    words_of: dict[str, set] = {}
    for w, f in wf.items():
        if len(w) < 2:
            continue
        for i in range(len(w) - 1):
            p = w[i : i + 2]
            totals[p] = totals.get(p, 0) + f  # per occurrence within w
            words_of.setdefault(p, set()).add(w)
    top = sorted(
        totals.items(), key=lambda kv: (-kv[1], kv[0])
    )[:20]
    want = pd.DataFrame(
        [
            {"pair": p, "n_total": n, "n_words": len(words_of[p])}
            for p, n in top
        ]
    )
    want["n_total"] = want["n_total"].astype("int64")
    want["n_words"] = want["n_words"].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# PII scrub / boilerplate strip (md5-verified transforms)
# ---------------------------------------------------------------------------


def test_text_pii_scrub(spark):
    got = _run(spark, "text_pii_scrub")
    docs = read("documents")
    rows = []
    for r in docs.itertuples(index=False):
        t = (
            f"{r.text} contact user{r.doc_id}@mail-{r.doc_id % 7}"
            f".example.com or {100 + r.doc_id % 900}-555-"
            f"{1000 + r.doc_id % 9000}"
        )
        n_emails = len(re.findall(r"[a-z0-9._-]+@[a-z0-9.-]+", t))
        n_phones = len(re.findall(r"[0-9]{3}-555-[0-9]{4}", t))
        clean = re.sub(r"[a-z0-9._-]+@[a-z0-9.-]+", "<EMAIL>", t)
        clean = re.sub(r"[0-9]{3}-555-[0-9]{4}", "<PHONE>", clean)
        rows.append(
            {
                "doc_id": int(r.doc_id),
                "n_emails": n_emails,
                "n_phones": n_phones,
                "clean_md5": _md5(clean),
            }
        )
    want = pd.DataFrame(rows)
    for c in ["doc_id", "n_emails", "n_phones"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    assert (want["n_emails"] >= 1).all() and (want["n_phones"] >= 1).all()


def test_text_boilerplate_strip(spark):
    got = _run(spark, "text_boilerplate_strip")
    docs = read("documents")
    rows = []
    for r in docs.itertuples(index=False):
        html = (
            f"<html><head><title>Doc {r.doc_id}</title></head><body>\n"
            '<nav><a href="/home">home</a> | <a href="/about">about</a>'
            ' | <a href="/login">login</a></nav>\n'
            f"<p>{r.text}</p>\n"
            '<div class="ads"><a href="/buy">click here buy now</a>'
            ' <a href="/sub">subscribe today</a></div>\n'
            '<footer><a href="/tos">terms</a> copyright 2024 example corp</footer>'
        )
        lines = html.split("\n")
        clean = []
        for l in lines:
            n_links = (len(l) - len(l.replace("<a ", ""))) // 3
            stripped = re.sub(r" +", " ", re.sub(r"<[^>]*>", " ", l)).strip()
            alnum = len(re.sub(r"[^a-z0-9]", "", stripped))
            if n_links == 0 and alnum >= 20:
                clean.append(stripped)
        rows.append(
            {
                "doc_id": int(r.doc_id),
                "n_lines": len(lines),
                "n_kept": len(clean),
                "clean_md5": _md5(" ".join(clean)),
            }
        )
    want = pd.DataFrame(rows)
    for c in ["doc_id", "n_lines", "n_kept"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    # the boilerplate lines (nav/ads/footer) must be dropped
    assert (want["n_kept"] < want["n_lines"]).all()


# ---------------------------------------------------------------------------
# Winsorized stats / lifecycle / gap sensitivity
# ---------------------------------------------------------------------------


def test_outlier_winsorized_stats(spark):
    got = _run(spark, "outlier_winsorized_stats")
    cust = read("customer").copy()
    cust["cents"] = half_up(cust["c_acctbal"], 2).to_numpy()
    rows = []
    for nk, grp in cust.groupby("c_nationkey"):
        vals = sorted(int(c) for c in grp["cents"])
        n = len(vals)
        lo_rn = max(1, (n * 50_000 + 999_999) // US)
        hi_rn = max(1, (n * 950_000 + 999_999) // US)
        p_lo, p_hi = vals[lo_rn - 1], vals[hi_rn - 1]
        w = [min(max(c, p_lo), p_hi) for c in vals]
        rows.append(
            {
                "c_nationkey": int(nk),
                "n": n,
                "p5_cents": p_lo,
                "p95_cents": p_hi,
                "n_clipped_low": sum(1 for c in vals if c < p_lo),
                "n_clipped_high": sum(1 for c in vals if c > p_hi),
                "winsor_sum_cents": sum(w),
                "winsor_mean_cents": float(sum(w)) / n,
                "raw_mean_cents": float(sum(vals)) / n,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["n", "p5_cents", "p95_cents", "n_clipped_low", "n_clipped_high", "winsor_sum_cents"]:
        want[c] = want[c].astype("int64")
    want["c_nationkey"] = want["c_nationkey"].astype("int32")
    got = got.copy()
    got["c_nationkey"] = got["c_nationkey"].astype("int32")
    frames_equal(got, want)


def test_events_user_lifecycle_states(spark):
    got = _run(spark, "events_user_lifecycle_states")
    ev = read("events")
    active = (
        ev.assign(d=ev["ts"].dt.normalize())[["user_id", "d"]]
        .drop_duplicates()
    )
    max_d = active["d"].max()
    counts: dict[tuple, int] = {}
    for uid, grp in active.groupby("user_id"):
        days = sorted(grp["d"])
        for i, d in enumerate(days):
            if i == 0:
                state = "new"
            elif days[i - 1] == d - pd.Timedelta(days=1):
                state = "retained"
            else:
                state = "resurrected"
            counts[(d, state)] = counts.get((d, state), 0) + 1
            nxt = d + pd.Timedelta(days=1)
            if d < max_d and (i + 1 >= len(days) or days[i + 1] != nxt):
                counts[(nxt, "churned")] = counts.get((nxt, "churned"), 0) + 1
    rows = [
        {"day": d, "state": s, "n_users": n}
        for (d, s), n in sorted(counts.items(), key=lambda kv: (kv[0][0], kv[0][1]))
    ]
    want = pd.DataFrame(rows)
    want["n_users"] = want["n_users"].astype("int64")
    got = got.copy()
    got["day"] = pd.to_datetime(got["day"])
    frames_equal(got, want)


def test_sessionization_gap_sensitivity(spark):
    got = _run(spark, "sessionization_gap_sensitivity")
    ev = read("events").sort_values(["user_id", "ts", "event_id"])
    n_events = len(ev)
    n_users = ev["user_id"].nunique()
    gaps = []
    for _, grp in ev.groupby("user_id"):
        prev = None
        for ts in grp["ts"]:
            if prev is not None:
                gaps.append(int((ts - prev).total_seconds() * US))
            prev = ts
    rows = []
    for t in (600, 1800, 3600):
        b = sum(1 for g in gaps if g > t * US)
        rows.append(
            {"timeout_s": t, "n_sessions": n_users + b, "n_events": n_events}
        )
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)
    # more timeout -> fewer sessions (monotone law)
    s = want.sort_values("timeout_s")["n_sessions"].tolist()
    assert s == sorted(s, reverse=True)


# ---------------------------------------------------------------------------
# Linear attribution / balanced classes
# ---------------------------------------------------------------------------


def test_attribution_linear_touch(spark):
    got = _run(spark, "attribution_linear_touch")
    ev = read("events")
    touches = ev[ev["event_type"].isin(["click", "view"])]
    purchases = ev[ev["event_type"] == "purchase"].copy()
    purchases["cents"] = half_up(purchases["value"], 2).to_numpy()
    agg: dict[str, list[int]] = {}
    for p in purchases.itertuples(index=False):
        mine = touches[
            (touches["user_id"] == p.user_id)
            & (
                (touches["ts"] - p.ts).dt.total_seconds() * US
                >= -3 * 86400 * US
            )
            & (
                (touches["ts"] < p.ts)
                | ((touches["ts"] == p.ts) & (touches["event_id"] < p.event_id))
            )
        ]
        n = len(mine)
        cents = int(p.cents)
        if n == 0:
            s = agg.setdefault("unattributed", [0, 0, 0])
            s[0] += 1
            s[1] += US
            s[2] += cents * US
        else:
            for ch in mine["event_type"]:
                s = agg.setdefault(ch, [0, 0, 0])
                s[0] += 1
                s[1] += US // n
                s[2] += (cents * US) // n
    rows = [
        {
            "channel": ch,
            "touches": a[0],
            "credit_ppm": a[1],
            "revenue_micro_cents": a[2],
        }
        for ch, a in sorted(agg.items())
    ]
    want = pd.DataFrame(rows)
    for c in ["touches", "credit_ppm", "revenue_micro_cents"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


def test_sample_balanced_classes(spark):
    got = _run(spark, "sample_balanced_classes")
    emb = read("embeddings")
    sizes = emb.groupby("label").size()
    cap = int(sizes.min())
    rows = []
    for label, grp in emb.groupby("label"):
        ranked = sorted(
            (_md5(f"bal:{v}"), int(v)) for v in grp["vec_id"]
        )
        kept = [v for _, v in ranked[:cap]]
        rows.append(
            {
                "label": int(label),
                "n_total": len(grp),
                "n_kept": len(kept),
                "kept_id_sum": sum(kept),
            }
        )
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)
    assert (want["n_kept"] == cap).all()


# ---------------------------------------------------------------------------
# Phonetic ER blocking: python Soundex + Levenshtein twins
# ---------------------------------------------------------------------------

_PH_FROM = "abcdefghijklmnopqrstuvwxyz"
_PH_TO = "01230120022455012623010202"
_PH_MAP = dict(zip(_PH_FROM, _PH_TO))


def _phonetic(tok: str) -> str:
    code = "".join(_PH_MAP.get(c, c) for c in tok)
    for _ in range(3):  # literal twin of the three replace passes
        for d in "123456":
            code = code.replace(d + d, d)
    body = code[1:].replace("0", "")
    return tok[:1] + (body + "000")[:3]


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_er_phonetic_blocking(spark):
    got = _run(spark, "er_phonetic_blocking")
    part = read("part")
    base = part.groupby("p_name")["p_partkey"].min()
    names = [(n, int(k)) for n, k in base.items()]
    for n, k in list(names):
        if k % 7 == 0:
            t1, _, rest = n.partition(" ")
            typo = t1[0] + t1[2] + t1[1] + t1[3:] + (" " + rest if rest else "")
            names.append((typo, -(k + 1)))
    keyed = [(n, k, _phonetic(n.split(" ")[0])) for n, k in names]
    rows = []
    for i, (na, ka, pa) in enumerate(keyed):
        for nb, kb, pb in keyed:
            if pa == pb and na < nb:
                d = _lev(na, nb)
                if d <= 2:
                    rows.append(
                        {
                            "name_a": na,
                            "name_b": nb,
                            "key_a": ka,
                            "key_b": kb,
                            "dist": d,
                            "found_by_exact": int(
                                na.split(" ")[0] == nb.split(" ")[0]
                            ),
                        }
                    )
    want = pd.DataFrame(
        rows,
        columns=["name_a", "name_b", "key_a", "key_b", "dist", "found_by_exact"],
    )
    for c in ["key_a", "key_b", "dist", "found_by_exact"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    # the planted typos must be caught by phonetic-but-not-exact pairs
    assert (want["found_by_exact"] == 0).any()


# ---------------------------------------------------------------------------
# Bloom decontamination: exact output through the prefiltered path
# ---------------------------------------------------------------------------


def test_decontaminate_bloom_exact_output(spark):
    got = _run(spark, "decontaminate_bloom")
    docs = read("documents")
    grams = {
        int(r.doc_id): set(_shingles(_toks(r.text), 4))
        for r in docs.itertuples(index=False)
    }
    bench = set()
    for i, g in grams.items():
        if i % 17 == 0:
            bench |= g
    rows = []
    for i, g in sorted(grams.items()):
        if i % 17 == 0:
            continue
        n_cont = len(g & bench)
        rows.append(
            {
                "doc_id": i,
                "n_shingles": len(g),
                "n_contaminated": n_cont,
                "contaminated": n_cont > 0,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["doc_id", "n_shingles", "n_contaminated"]:
        want[c] = want[c].astype("int64")
    got = got.copy()
    got["contaminated"] = got["contaminated"].astype(bool).astype(str)
    want["contaminated"] = want["contaminated"].astype(bool).astype(str)
    frames_equal(got, want)
