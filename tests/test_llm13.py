"""Property tests for the retrieval / metric-learning batch
(queries_llm13): ground-truth containment for phrase search,
estimator-range structure for b-bit minhash, and per-anchor count
guarantees for contrastive mining."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_building_inspector_spark.plans.queries_llm13 import (
    BBIT_K,
    CONTRA_ANCHORS,
    CONTRA_NEG,
    CONTRA_POS,
    PHRASES,
    dedup_minhash_bbit_eval,
    emb_contrastive_pairs,
    text_phrase_search,
)

SF = "/root/testdata/sf0.001"


def test_phrase_search_matches_string_containment(spark):
    """Every (phrase, doc) hit — and ONLY those — must contain the
    phrase in the normalized text: the independent ground truth the
    positional-join plan and its shared-steps oracle cannot provide."""
    from etl_building_inspector_spark.functions.text import normalize_text
    from etl_building_inspector_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.concat(F.lit(" "), normalize_text("text"), F.lit(" ")).alias("nt")
    )
    got = {
        (r.phrase_id, r.doc_id)
        for r in text_phrase_search(spark, SF).collect()
    }
    want = set()
    nts = {r.doc_id: r.nt for r in docs.collect()}
    for pid, w1, w2 in PHRASES:
        needle = f" {w1} {w2} "
        for did, nt in nts.items():
            # overlapping repeats can't hide a first occurrence for a
            # two-distinct-word phrase; containment is exact truth
            if needle in nt:
                want.add((pid, did))
    assert got == want
    assert len(got) > 0


def test_bbit_estimator_structure(spark):
    """n_equal_bits <= k; the estimate is (2c - 1) on the 1/k grid;
    exact J in [0, 1]; and the mean signed error over the LSH pairs is
    small (unbiasedness shows even at k=8 over ~150 pairs)."""
    rows = dedup_minhash_bbit_eval(spark, SF).collect()
    assert len(rows) > 0
    errs = []
    for r in rows:
        assert 0 <= r.n_equal_bits <= BBIT_K
        assert abs(r.j_bbit_est - (2 * r.n_equal_bits - BBIT_K) / BBIT_K) < 1e-12
        assert 0.0 <= r.j_exact <= 1.0
        errs.append(r.j_bbit_est - r.j_exact)
    mean_err = sum(errs) / len(errs)
    assert abs(mean_err) < 0.25, mean_err  # k=8 noise bound, not tightness


def test_contrastive_pairs_counts_and_labels(spark):
    """Each anchor yields exactly CONTRA_POS positives and CONTRA_NEG
    negatives (the fixture has >= that many candidates per side), the
    label relation matches is_positive, and no self-pairs."""
    from etl_building_inspector_spark.sources.tables import load_table

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, SF, "embeddings").select("vec_id", "label").collect()
    }
    rows = emb_contrastive_pairs(spark, SF).collect()
    per_anchor: dict = {}
    for r in rows:
        assert r.cand_id != r.anchor_id
        same = labels[r.cand_id] == labels[r.anchor_id]
        assert same == bool(r.is_positive)
        per_anchor.setdefault(r.anchor_id, [0, 0])[r.is_positive] += 1
    assert len(per_anchor) == min(CONTRA_ANCHORS, len(labels))
    for a, (neg, pos) in per_anchor.items():
        assert pos == CONTRA_POS, (a, pos)
        assert neg == CONTRA_NEG, (a, neg)
