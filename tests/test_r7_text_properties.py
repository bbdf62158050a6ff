"""Independent property tests for the text-analysis family: quality
gates, PII redaction, repetition signals, TF-IDF, zipf/compression
profiles, phrase search, BPE estimates, winnowing, chunking, C4 line
dedup, and the lang-ID confusion eval -- each recomputed from raw
parquet with python re/hashlib/dict loops.

These queries share the engine tokenization contract (functions/
text.py); the python twin re-derives it independently (re.sub +
split), so a tokenizer drift would fail every test here at once.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pytest

from etl_building_inspector_spark.functions.text import LANG_STOPWORDS
from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, read
from tests.test_r7_dedup_properties import _md5, _shingles, _toks


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


# ---------------------------------------------------------------------------
# quality_filter_composite: C4/Gopher gate flags
# ---------------------------------------------------------------------------


def test_quality_filter_composite_flags(spark):
    got = _run(spark, "quality_filter_composite")
    docs = read("documents")
    rows = []
    for r in docs.itertuples(index=False):
        toks = _toks(r.text)
        n = len(toks)
        mtl = len("".join(toks)) / n
        punct = (len(r.text) - len(re.sub(r"[^\w\s]", "", r.text))) / len(
            r.text
        )
        stopr = sum(1 for t in toks if t in set(LANG_STOPWORDS["en"])) / n
        ok_len = 30 <= n <= 2000
        ok_mtl = 3.0 <= mtl <= 4.6
        ok_punct = punct <= 0.2
        ok_stop = stopr >= 0.05
        rows.append(
            {
                "doc_id": int(r.doc_id),
                "ok_len": ok_len,
                "ok_token_len": ok_mtl,
                "ok_punct": ok_punct,
                "ok_stopwords": ok_stop,
                "keep": ok_len and ok_mtl and ok_punct and ok_stop,
            }
        )
    want = pd.DataFrame(rows)
    want["doc_id"] = want["doc_id"].astype("int64")
    got = got.copy()
    for c in ["ok_len", "ok_token_len", "ok_punct", "ok_stopwords", "keep"]:
        got[c] = got[c].astype(bool).astype(str)
        want[c] = want[c].astype(bool).astype(str)
    frames_equal(got, want)
    # the gate must both keep and drop on this fixture
    assert want["keep"].eq("True").any() and want["keep"].eq("False").any()


# ---------------------------------------------------------------------------
# text_pii_redact: planted PII found exactly
# ---------------------------------------------------------------------------

_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE = r"\b\d{3}-\d{4}\b"


def test_pii_redact_counts_and_text(spark):
    got = _run(spark, "text_pii_redact")
    docs = read("documents")
    rows = []
    for r in docs.itertuples(index=False):
        text = r.text
        if r.doc_id % 7 == 0:
            text = (
                f"{text} contact user{r.doc_id}@example.com from "
                f"10.0.{r.doc_id % 256}.7 call 555-{r.doc_id % 10000:04d}"
            )
        # counts on the raw seeded text (the oracle's formulation);
        # redaction applies the rules sequentially (PII_RULES order)
        n_email = len(re.findall(_EMAIL, text))
        n_ip = len(re.findall(_IP, text))
        n_phone = len(re.findall(_PHONE, text))
        red = re.sub(_EMAIL, "[EMAIL]", text)
        red = re.sub(_IP, "[IP]", red)
        red = re.sub(_PHONE, "[PHONE]", red)
        rows.append(
            {
                "doc_id": int(r.doc_id),
                "n_email": n_email,
                "n_ip": n_ip,
                "n_phone": n_phone,
                "redacted": red,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["doc_id", "n_email", "n_ip", "n_phone"]:
        want[c] = want[c].astype("int64")
    # NOTE: the oracle counts each rule on the ALREADY-REDACTED text
    # of prior rules (PII_RULES order contractual) -- but counting on
    # the raw text gives the same numbers here because the planted
    # forms never overlap; verify both claims hold.
    frames_equal(got, want)
    planted = want[want["doc_id"] % 7 == 0]
    assert (planted[["n_email", "n_ip", "n_phone"]] >= 1).all().all()
    clean = want[want["doc_id"] % 7 != 0]
    assert (clean[["n_email", "n_ip", "n_phone"]] == 0).all().all()


# ---------------------------------------------------------------------------
# text_repetition: Gopher 2-gram signals
# ---------------------------------------------------------------------------


def test_repetition_signals(spark):
    got = _run(spark, "text_repetition")
    docs = read("documents")
    rows = []
    for r in docs.itertuples(index=False):
        grams = _shingles(_toks(r.text), 2)
        cnt: dict[str, int] = {}
        for g in grams:
            cnt[g] = cnt.get(g, 0) + 1
        n_grams, n_distinct = len(grams), len(cnt)
        top = max(cnt.values()) if cnt else 0
        rows.append(
            {
                "doc_id": int(r.doc_id),
                "n_grams": n_grams,
                "n_distinct_grams": n_distinct,
                "top_gram_count": top,
                "dup_gram_frac": (n_grams - n_distinct) / n_grams
                if n_grams
                else None,
                "top_gram_frac": top / n_grams if n_grams else None,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["doc_id", "n_grams", "n_distinct_grams", "top_gram_count"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# tfidf_topk_terms: integer milli-idf ranking
# ---------------------------------------------------------------------------


def test_tfidf_topk_integer_idf(spark):
    got = _run(spark, "tfidf_topk_terms")
    docs = read("documents")
    n_docs = len(docs)
    tf: dict[int, dict[str, int]] = {}
    df: dict[str, int] = {}
    for r in docs.itertuples(index=False):
        c: dict[str, int] = {}
        for t in _toks(r.text):
            c[t] = c.get(t, 0) + 1
        tf[int(r.doc_id)] = c
        for t in c:
            df[t] = df.get(t, 0) + 1
    rows = []
    for doc_id, c in tf.items():
        scored = [
            (t, cnt * (n_docs * 1000 // df[t])) for t, cnt in c.items()
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rk, (t, s) in enumerate(scored[:3], start=1):
            rows.append(
                {"doc_id": doc_id, "term": t, "score": s, "rk": rk}
            )
    want = pd.DataFrame(rows)
    want["doc_id"] = want["doc_id"].astype("int64")
    want["score"] = want["score"].astype("int64")
    want["rk"] = want["rk"].astype("int32")
    got = got.copy()
    got["rk"] = got["rk"].astype("int32")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# text_zipf_profile / text_compression_ratio_proxy
# ---------------------------------------------------------------------------


def test_zipf_profile_top20(spark):
    got = _run(spark, "text_zipf_profile")
    docs = read("documents")
    freq: dict[str, int] = {}
    for t in docs["text"]:
        for tok in _toks(t):
            freq[tok] = freq.get(tok, 0) + 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    mx = top[0][1]
    rows = [
        {
            "rank": i + 1,
            "token": tok,
            "freq": f,
            "rank_freq_product": (i + 1) * f,
            "freq_vs_top_ppm": f * 1_000_000 // mx,
        }
        for i, (tok, f) in enumerate(top)
    ]
    want = pd.DataFrame(rows)
    for c in ["rank", "freq", "rank_freq_product", "freq_vs_top_ppm"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


def test_compression_ratio_proxy_buckets(spark):
    got = _run(spark, "text_compression_ratio_proxy")
    docs = read("documents")
    cells: dict[tuple[str, int], int] = {}
    for r in docs.itertuples(index=False):
        toks = _toks(r.text)
        if len(toks) < 2:
            continue
        grams = _shingles(toks, 2)
        ppm = len(set(grams)) * 1_000_000 // len(grams)
        bucket = min(ppm // 100_000, 9)
        cells[(r.source, bucket)] = cells.get((r.source, bucket), 0) + 1
    rows = [
        {"source": s, "bucket": b, "n_docs": n}
        for (s, b), n in sorted(cells.items())
    ]
    want = pd.DataFrame(rows)
    want["bucket"] = want["bucket"].astype("int64")
    want["n_docs"] = want["n_docs"].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# text_phrase_search: positional postings
# ---------------------------------------------------------------------------


def test_phrase_search_positions(spark):
    got = _run(spark, "text_phrase_search")
    docs = read("documents")
    phrases = [("p1", "order", "fast"), ("p2", "join", "column")]
    rows = []
    for pid, w1, w2 in phrases:
        for r in docs.itertuples(index=False):
            toks = _toks(r.text)
            hits = [
                i + 1
                for i in range(len(toks) - 1)
                if toks[i] == w1 and toks[i + 1] == w2
            ]
            if hits:
                rows.append(
                    {
                        "phrase_id": pid,
                        "doc_id": int(r.doc_id),
                        "n_occurrences": len(hits),
                        "first_pos": hits[0],
                    }
                )
    want = pd.DataFrame(
        rows, columns=["phrase_id", "doc_id", "n_occurrences", "first_pos"]
    )
    for c in ["doc_id", "n_occurrences", "first_pos"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    assert len(want) > 0, "fixture too weak: no phrase hits"


# ---------------------------------------------------------------------------
# text_bpe_token_estimate: piece regex + ceil(len/4)
# ---------------------------------------------------------------------------


def test_bpe_token_estimate(spark):
    got = _run(spark, "text_bpe_token_estimate")
    docs = read("documents")
    piece_re = re.compile(r"[a-z]+|[0-9]|[^a-z0-9\s]")
    rows = []
    for r in docs.itertuples(index=False):
        pieces = piece_re.findall(r.text.lower())
        est = sum(
            (len(p) + 3) // 4 if "a" <= p[0] <= "z" else 1 for p in pieces
        )
        rows.append(
            {
                "doc_id": int(r.doc_id),
                "n_pieces": len(pieces),
                "bpe_tokens": est if pieces else 0,
                "ws_tokens": len(_toks(r.text)),
            }
        )
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# text_winnow_fingerprints: rolling-min sketch + its guarantee
# ---------------------------------------------------------------------------


def _winnow_fps(text: str, k: int = 3, w: int = 4) -> set[int]:
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
        for s in _shingles(_toks(text), k)
    ]
    if not hs:
        return set()
    if len(hs) < w:
        return set(hs)
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def test_winnow_fingerprints_and_shared_run_guarantee(spark):
    got = _run(spark, "text_winnow_fingerprints")
    docs = read("documents")
    rows = []
    for r in docs.itertuples(index=False):
        for fp in _winnow_fps(r.text):
            rows.append({"doc_id": int(r.doc_id), "fp": fp})
    want = pd.DataFrame(rows).astype("int64")
    frames_equal(got, want)
    # MOSS guarantee: a doc sharing a >= k+w-1 token run with another
    # must share a fingerprint -- verify on a synthetic pair
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "prefix words " + a + " suffix tail"
    assert _winnow_fps(a) & _winnow_fps(b)


# ---------------------------------------------------------------------------
# text_chunk_windows: stride/size/tail-truncation laws
# ---------------------------------------------------------------------------


def test_chunk_windows_cover_and_truncate(spark):
    got = _run(spark, "text_chunk_windows")
    docs = read("documents")
    rows = []
    for r in docs.itertuples(index=False):
        toks = _toks(r.text)
        n = max(len(toks), 1)
        starts = list(range(1, n + 1, 48))
        for idx, s in enumerate(starts):
            chunk = toks[s - 1 : s - 1 + 64]
            rows.append(
                {
                    "doc_id": int(r.doc_id),
                    "chunk_idx": idx,
                    "start_pos": s,
                    "chunk_len": len(chunk),
                    "chunk_text": " ".join(chunk),
                }
            )
    want = pd.DataFrame(rows)
    for c in ["doc_id", "chunk_idx", "start_pos", "chunk_len"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# text_line_dedup: global keep-first of 10-token spans
# ---------------------------------------------------------------------------


def test_line_dedup_keep_first_reassembly(spark):
    got = _run(spark, "text_line_dedup")
    docs = read("documents").sort_values("doc_id")
    N = 10
    all_lines = []  # (doc_id, line_idx, text) in global keep-first order
    for r in docs.itertuples(index=False):
        toks = _toks(r.text)
        n = max(len(toks), 1)
        for idx, s in enumerate(range(1, n + 1, N)):
            all_lines.append(
                (int(r.doc_id), idx, " ".join(toks[s - 1 : s - 1 + N]))
            )
    first_owner: dict[str, tuple[int, int]] = {}
    for doc_id, idx, text in sorted(all_lines):
        key = _md5(text)
        if key not in first_owner:
            first_owner[key] = (doc_id, idx)
    rows = []
    by_doc: dict[int, list[tuple[int, str]]] = {}
    for doc_id, idx, text in all_lines:
        by_doc.setdefault(doc_id, []).append((idx, text))
    for doc_id, lines in by_doc.items():
        kept = [
            (idx, text)
            for idx, text in lines
            if first_owner[_md5(text)] == (doc_id, idx)
        ]
        kept.sort()
        rows.append(
            {
                "doc_id": doc_id,
                "n_lines": len(lines),
                "n_kept": len(kept),
                "kept_text": " ".join(t for _, t in kept) if kept else None,
            }
        )
    want = pd.DataFrame(rows)
    for c in ["doc_id", "n_lines", "n_kept"]:
        want[c] = want[c].astype("int64")
    frames_equal(got, want)
    # dedup law: each distinct line string is kept exactly once globally
    assert want["n_kept"].sum() == len(first_owner)


# ---------------------------------------------------------------------------
# eval_langid_confusion: heuristic classifier + recall ppm
# ---------------------------------------------------------------------------


def _lang_pred(toks: list[str]) -> str:
    langs = sorted(LANG_STOPWORDS)
    scores = {
        lang: sum(1 for t in toks if t in set(LANG_STOPWORDS[lang]))
        for lang in langs
    }
    if all(v == 0 for v in scores.values()):
        return "und"
    # first lang (alphabetical) whose score >= every LATER lang's
    for i, lang in enumerate(langs):
        if all(scores[lang] >= scores[o] for o in langs[i + 1 :]):
            return lang
    return langs[-1]


def test_langid_confusion_recall_ppm(spark):
    got = _run(spark, "eval_langid_confusion")
    docs = read("documents")
    cells: dict[tuple[str, str], int] = {}
    totals: dict[str, int] = {}
    for r in docs.itertuples(index=False):
        pred = _lang_pred(_toks(r.text))
        cells[(r.lang, pred)] = cells.get((r.lang, pred), 0) + 1
        totals[r.lang] = totals.get(r.lang, 0) + 1
    rows = [
        {
            "lang_true": lt,
            "lang_pred": lp,
            "n": n,
            "recall_ppm": n * 1_000_000 // totals[lt],
        }
        for (lt, lp), n in sorted(cells.items())
    ]
    want = pd.DataFrame(rows)
    want["n"] = want["n"].astype("int64")
    want["recall_ppm"] = want["recall_ppm"].astype("int64")
    frames_equal(got, want)
    # confusion-matrix law: each row's cells sum to its true total
    for lt, tot in totals.items():
        assert sum(n for (l, _), n in cells.items() if l == lt) == tot
