"""Independent property tests for the core dedup/text/ANN queries
(queries_llm.py): MinHash, SimHash, n-gram Jaccard, exact-text dedup,
token stats, and brute-force cosine top-k, each recomputed from the
raw parquet with hashlib/python loops only.

The recomputes rebuild the full constructions -- sha256-substring
minhashes, md5 bit votes, banded bucket keys with the width cap, the
df-capped shingle inverted index -- so a shared conceptual mistake in
the Spark/DuckDB twins (wrong band slicing, cap applied after
pairing, signature over non-distinct shingles, ...) cannot hide.

Float outputs (ratios, cosines) are compared bit-exactly: the python
twin folds in the same left-to-right order as F.aggregate/list_reduce.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pytest

from etl_building_inspector_spark.functions.text import LANG_STOPWORDS
from etl_building_inspector_spark.plans.registry import QUERIES
from tests.recompute_util import SF, frames_equal, read


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


def _toks(text: str) -> list[str]:
    # the engine-wide tokenization contract (functions/text.py):
    # lowercase, non-alphanumeric runs -> space, trim, split(' ') --
    # an all-punctuation doc yields the single empty token.
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")


def _norm(text: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _sha256(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _shingles(toks: list[str], n: int = 3) -> list[str]:
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _docs_with_dups() -> pd.DataFrame:
    """Twin of _docs_with_dups: originals + (doc_id%5==0) copies with
    the last token dropped, offset by 100000."""
    docs = read("documents")[["doc_id", "text"]]
    mut = docs[docs["doc_id"] % 5 == 0].copy()
    mut["text"] = mut["text"].map(lambda t: " ".join(_toks(t)[:-1]))
    mut["doc_id"] = mut["doc_id"] + 100000
    return pd.concat([docs, mut], ignore_index=True)


# ---------------------------------------------------------------------------
# text_token_stats: the five quality features per document
# ---------------------------------------------------------------------------


def test_token_stats_recomputed_per_document(spark):
    got = _run(spark, "text_token_stats")
    docs = read("documents")
    en = set(LANG_STOPWORDS["en"])
    rows = []
    for r in docs.itertuples(index=False):
        toks = _toks(r.text)
        n_chars = len(r.text)
        n_tokens = len(toks)
        total_tok_chars = len("".join(toks))
        n_punct = len(r.text) - len(re.sub(r"[^\w\s]", "", r.text))
        stop_hits = sum(1 for t in toks if t in en)
        rows.append(
            {
                "doc_id": int(r.doc_id),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "mean_token_len": total_tok_chars / n_tokens,
                "punct_ratio": n_punct / n_chars,
                "stopword_ratio": stop_hits / n_tokens,
            }
        )
    want = pd.DataFrame(rows)
    want["doc_id"] = want["doc_id"].astype("int64")
    want["n_chars"] = want["n_chars"].astype("int64")
    want["n_tokens"] = want["n_tokens"].astype("int64")
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# dedup_exact_text: md5-of-normalized-text grouping over the dup corpus
# ---------------------------------------------------------------------------


def test_exact_dedup_groups_by_normalized_md5(spark):
    got = _run(spark, "dedup_exact_text")
    d = _docs_with_dups()
    d["fp"] = d["text"].map(lambda t: _md5(_norm(t)))
    g = d.groupby("fp")
    want = pd.DataFrame(
        {
            "fp": g.size().index,
            "doc_id": g["doc_id"].min().astype("int64").to_numpy(),
            "dup_count": g.size().astype("int64").to_numpy(),
        }
    )
    frames_equal(got, want)
    # conservation + the synthesized dups are genuinely distinct texts
    assert got["dup_count"].sum() == len(d)


# ---------------------------------------------------------------------------
# MinHash: signature construction and banded LSH pairs with the cap
# ---------------------------------------------------------------------------


def _signature(text: str, k: int = 8) -> list[str | None]:
    sh = _shingles(_toks(text))
    if not sh:
        return [None] * k
    hexes = [_sha256(s) for s in sh]
    return [min(h[i * 8 : i * 8 + 8] for h in hexes) for i in range(k)]


def test_minhash_signature_is_min_of_sha256_slices(spark):
    got = _run(spark, "dedup_minhash_signature")
    docs = read("documents")
    rows = []
    for r in docs.itertuples(index=False):
        sig = _signature(r.text)
        rows.append(
            {"doc_id": int(r.doc_id), **{f"minhash_{i}": sig[i] for i in range(8)}}
        )
    want = pd.DataFrame(rows)
    want["doc_id"] = want["doc_id"].astype("int64")
    frames_equal(got, want)


def test_minhash_lsh_pairs_banding_and_cap(spark):
    """Full rebuild: signatures over the dup corpus -> 4 band keys of
    2 rows each -> drop buckets wider than the cap -> distinct
    id_a<id_b pairs. Also pins that every synthesized near-dup pair
    that shares a FULL band is found."""
    got = _run(spark, "dedup_minhash_lsh_pairs")
    d = _docs_with_dups()
    buckets: dict[tuple[int, str], list[int]] = {}
    for r in d.itertuples(index=False):
        sig = _signature(r.text)
        if sig[0] is None:
            continue
        for b in range(4):
            key = _md5("|".join([sig[b * 2], sig[b * 2 + 1]]))
            buckets.setdefault((b, key), []).append(int(r.doc_id))
    pairs = set()
    for (_, _), ids in buckets.items():
        if len(ids) > 16:  # MINHASH_BUCKET_CAP
            continue
        for i, a in enumerate(ids):
            for bb in ids[i + 1 :]:
                if a != bb:
                    pairs.add((min(a, bb), max(a, bb)))
    want = pd.DataFrame(
        sorted(pairs), columns=["id_a", "id_b"], dtype="int64"
    )
    frames_equal(got, want)


# ---------------------------------------------------------------------------
# SimHash: md5 bit votes; banded hamming pairs vs the O(n^2) threshold
# ---------------------------------------------------------------------------


def _simhash(toks: list[str], bits: int) -> int:
    votes = [0] * bits
    for tok in toks:
        h = int(_md5(tok)[:8], 16)
        for b in range(bits):
            votes[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(bits) if votes[b] > 0)


def test_simhash_votes_recomputed(spark):
    got = _run(spark, "dedup_simhash")
    docs = read("documents")
    want = pd.DataFrame(
        {
            "doc_id": docs["doc_id"].astype("int64"),
            "simhash": docs["text"]
            .map(lambda t: _simhash(_toks(t), 16))
            .astype("int64"),
        }
    )
    frames_equal(got, want)


def test_simhash_hamming_pairs_match_quadratic_threshold_join(spark):
    got = _run(spark, "dedup_simhash_hamming_pairs")
    d = _docs_with_dups()
    sims = [
        (int(r.doc_id), _simhash(_toks(r.text), 32))
        for r in d.itertuples(index=False)
    ]
    rows = []
    for i, (ida, sa) in enumerate(sims):
        for idb, sb in sims[i + 1 :]:
            a, b = (ida, idb) if ida < idb else (idb, ida)
            sa2, sb2 = (sa, sb) if ida < idb else (sb, sa)
            ham = bin(sa2 ^ sb2).count("1")
            if ham <= 3:
                rows.append({"id_a": a, "id_b": b, "hamming": ham})
    want = pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"]).astype(
        "int64"
    )
    frames_equal(got, want)
    assert len(want) > 0, "fixture too weak: no near-dup within hamming 3"


# ---------------------------------------------------------------------------
# n-gram Jaccard with the df cap: full inverted-index rebuild
# ---------------------------------------------------------------------------


def test_ngram_jaccard_pairs_with_df_cap(spark):
    got = _run(spark, "dedup_ngram_jaccard")
    d = _docs_with_dups()
    doc_sh = {
        int(r.doc_id): set(_shingles(_toks(r.text)))
        for r in d.itertuples(index=False)
    }
    df: dict[str, int] = {}
    for sh in doc_sh.values():
        for s in sh:
            df[s] = df.get(s, 0) + 1
    kept = {s for s, c in df.items() if c <= 32}  # JACCARD_DF_CAP
    doc_sh = {i: {s for s in sh if s in kept} for i, sh in doc_sh.items()}
    inv: dict[str, list[int]] = {}
    for i, sh in doc_sh.items():
        for s in sh:
            inv.setdefault(s, []).append(i)
    shared: dict[tuple[int, int], int] = {}
    for ids in inv.values():
        ids = sorted(ids)
        for x, a in enumerate(ids):
            for b in ids[x + 1 :]:
                shared[(a, b)] = shared.get((a, b), 0) + 1
    rows = []
    for (a, b), ns in shared.items():
        union = len(doc_sh[a]) + len(doc_sh[b]) - ns
        j = ns / union
        if j >= 0.5:
            rows.append({"id_a": a, "id_b": b, "jaccard": j})
    want = pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])
    want["id_a"] = want["id_a"].astype("int64")
    want["id_b"] = want["id_b"].astype("int64")
    frames_equal(got, want)
    assert len(want) > 0


# ---------------------------------------------------------------------------
# Brute-force cosine top-k: sequential-fold dot products, exact ranks
# ---------------------------------------------------------------------------


def _dot_seq(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def test_ann_cosine_topk_matches_sequential_fold_ranking(spark):
    got = _run(spark, "ann_cosine_topk")
    emb = read("embeddings").sort_values("vec_id")
    vecs = {int(r.vec_id): list(r.embedding) for r in emb.itertuples(index=False)}
    import math

    norms = {i: math.sqrt(_dot_seq(v, v)) for i, v in vecs.items()}
    rows = []
    for q in sorted(vecs):
        if q >= 10:
            continue
        sims = []
        for c in sorted(vecs):
            if c == q:
                continue
            cos = _dot_seq(vecs[q], vecs[c]) / (norms[q] * norms[c])
            sims.append((cos, c))
        sims.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, c) in enumerate(sims[:5], start=1):
            rows.append(
                {
                    "query_id": q,
                    "neighbor_id": c,
                    "cosine": cos,
                    "rank": rank,
                }
            )
    want = pd.DataFrame(rows)
    want["query_id"] = want["query_id"].astype("int64")
    want["neighbor_id"] = want["neighbor_id"].astype("int64")
    want["rank"] = want["rank"].astype("int64")
    frames_equal(got, want)
