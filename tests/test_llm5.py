"""Round-3 curation batch: value-level checks beyond the DuckDB
oracles -- PQ/ADC recall vs brute force, SemDeDup prune semantics,
and hand-computed fixtures for line dedup, fuzzy match, and LOCF."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_building_inspector_spark.operators.similarity import (
    cosine_topk_bruteforce,
    pq_adc_topk,
    pq_encode_sampled,
    semantic_dedup_sampled,
)
from etl_building_inspector_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_pq_encode_shape_and_determinism(spark, emb):
    enc = pq_encode_sampled(emb, n_sub=8, codes_per_sub=16, dim=64)
    rows = enc.collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        assert len(r.codes) == 8
        assert all(1 <= c <= 16 for c in r.codes)
        assert len(r.recon) == 64
    # deterministic: a second plan produces identical codes
    again = {r.vec_id: r.codes for r in pq_encode_sampled(
        emb, n_sub=8, codes_per_sub=16, dim=64
    ).collect()}
    assert all(again[r.vec_id] == r.codes for r in rows)


def test_pq_recon_is_codeword_concat(spark, emb):
    """recon must be exactly the chosen codewords' values: every recon
    subvector appears verbatim in some corpus vector's same slice
    (codewords are sampled corpus subvectors)."""
    enc = pq_encode_sampled(emb, n_sub=8, codes_per_sub=16, dim=64)
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}
    sub_slices = {
        j: {tuple(v[j * 8 : (j + 1) * 8]) for v in vecs.values()} for j in range(8)
    }
    for r in enc.limit(20).collect():
        for j in range(8):
            assert tuple(r.recon[j * 8 : (j + 1) * 8]) in sub_slices[j]


def test_pq_adc_recall_vs_bruteforce(spark, emb):
    """ADC with 16 codes x 8 subspaces on random uniform 64-dim
    vectors (PQ's worst case -- no cluster structure) must still beat
    random ranking decisively at k=10."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(emb, queries, "embedding", "vec_id", k=10)
    adc = pq_adc_topk(emb, queries, "embedding", "vec_id", k=10)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in adc.collect()}
    recall = len(e & a) / len(e)
    # random top-10 of ~500 would give recall ~0.02
    assert recall >= 0.2, recall


def test_semantic_dedup_prune_monotone_in_tau(spark, emb):
    """Lower tau prunes at least as much; tau > 1 prunes nothing."""
    kept = {}
    for tau in (0.2, 0.35, 1.01):
        out = semantic_dedup_sampled(emb, tau=tau)
        kept[tau] = out.filter("keep").count()
        assert out.count() == emb.count()
    assert kept[0.2] <= kept[0.35] <= kept[1.01]
    assert kept[1.01] == emb.count()


def test_semantic_dedup_dropped_have_smaller_kept_neighbor(spark, emb):
    """Every dropped item must have a smaller-id in-cluster neighbor
    above tau (the prune rule, verified directly on the output)."""
    tau = 0.35
    out = semantic_dedup_sampled(emb, tau=tau).collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb)

    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r.cent_id, []).append(r)
    for rows in by_cluster.values():
        for r in rows:
            if not r.keep:
                assert any(
                    o.vec_id < r.vec_id
                    and cos(vecs[o.vec_id], vecs[r.vec_id]) >= tau
                    for o in rows
                ), f"dropped {r.vec_id} has no dominating neighbor"


def test_line_dedup_keeps_first_occurrence(spark, sf_dir):
    """Fixture: doc 2 repeats doc 1's line; only doc 1 keeps it."""
    from etl_building_inspector_spark.plans.queries_llm5 import text_line_dedup

    out = {r.doc_id: r for r in text_line_dedup(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    assert len(out) == docs.count()
    # invariants: kept <= lines, text word count == 10*full kept lines (+ tail)
    for r in list(out.values())[:50]:
        assert 0 <= r.n_kept <= r.n_lines
        if r.n_kept == 0:
            assert r.kept_text is None


def test_line_dedup_synthetic_repeat(spark):
    from etl_building_inspector_spark.functions.text import tokens

    line = "a b c d e f g h i j"  # exactly 10 tokens
    df = spark.createDataFrame(
        [(1, line + " " + "k l m n o p q r s t"), (2, line + " unique tail here")],
        "doc_id long, text string",
    )
    n = 10
    t = df.select("doc_id", tokens("text").alias("toks")).withColumn(
        "nn", F.size("toks")
    )
    lines = t.select(
        "doc_id",
        F.posexplode(
            F.sequence(F.lit(1), F.greatest("nn", F.lit(1)), F.lit(n))
        ).alias("line_idx", "start"),
        "toks",
    ).select(
        "doc_id",
        "line_idx",
        F.concat_ws(" ", F.slice("toks", F.col("start"), F.lit(n))).alias(
            "line_text"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("line_text")).orderBy("doc_id", "line_idx")
    kept = (
        lines.withColumn("rnk", F.row_number().over(w))
        .filter("rnk = 1")
        .collect()
    )
    kept_pairs = {(r.doc_id, r.line_text) for r in kept}
    assert (1, line) in kept_pairs
    assert (2, line) not in kept_pairs  # doc 2's copy of the line dropped
    assert (2, "unique tail here") in kept_pairs


def test_fuzzy_match_blocked_pairs(spark, sf_dir):
    from etl_building_inspector_spark.plans.queries_llm5 import (
        er_blocked_fuzzy_match,
    )

    rows = er_blocked_fuzzy_match(spark, sf_dir).collect()
    for r in rows:
        assert r.name_a < r.name_b
        assert 1 <= r.dist <= 3
        assert r.name_a.split(" ")[0] == r.name_b.split(" ")[0]  # block respected


def test_gapfill_locf_synthetic(spark, tmp_path):
    """Hand-computed LOCF: type A observed on day 1 and 4, spine is
    1..4 (type B extends the global range)."""
    from etl_building_inspector_spark.plans.queries_llm5 import (
        timeseries_gapfill_locf,
    )

    t0 = datetime.datetime(2024, 3, 1, 10, 0, 0)

    def d(days):
        return t0 + datetime.timedelta(days=days)

    rows = [
        (1, d(0), 1, "A", 1.0, None),
        (2, d(0), 2, "A", 1.0, None),
        (3, d(3), 3, "A", 1.0, None),
        (4, d(0), 4, "B", 1.0, None),
        (5, d(3), 5, "B", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d_dir = str(tmp_path / "events_gap")
    df.write.parquet(d_dir)
    # route through the query's logic by staging a lookalike sf_dir
    import os

    os.makedirs(str(tmp_path / "sfx"), exist_ok=True)
    os.rename(d_dir, str(tmp_path / "sfx" / "events.parquet"))
    out = {
        (r.event_type, r.day.isoformat()): r
    for r in timeseries_gapfill_locf(spark, str(tmp_path / "sfx")).collect()}
    assert len(out) == 8  # 2 types x 4 days
    a1 = out[("A", "2024-03-02")]
    assert (a1.n_events, a1.observed, a1.locf_n_events, a1.days_since_obs) == (
        0, False, 2, 1,
    )
    a3 = out[("A", "2024-03-04")]
    assert (a3.n_events, a3.observed, a3.locf_n_events, a3.days_since_obs) == (
        1, True, 1, 0,
    )


def test_pq_encode_query_is_exploded_scalar_form(spark, sf_dir, emb):
    """The REGISTERED emb_pq_encode query is the posexploded scalar
    form of the operator output -- (vec_id, sub_id, code) BIGINT rows,
    no Array/Map/Struct columns (the driver's canonicalizer hashes
    scalar cells only; its r5 row was the one red in CORRECTNESS_r05
    precisely because the array form crashed it). Pin: row-for-row
    equal to the operator's code arrays, and schema all-scalar."""
    from etl_building_inspector_spark.plans.registry import QUERIES
    from etl_building_inspector_spark.plans.contract import (
        nested_output_fields,
    )

    q = QUERIES["emb_pq_encode"](spark, sf_dir)
    assert q.columns == ["vec_id", "sub_id", "code"]
    assert nested_output_fields(q.schema) == []
    assert [f.dataType.simpleString() for f in q.schema.fields] == [
        "bigint", "bigint", "bigint"
    ]
    from etl_building_inspector_spark.plans.queries_llm5 import (
        PQ_CODES, PQ_DIM, PQ_NSUB,
    )

    op = {
        r.vec_id: r.codes
        for r in pq_encode_sampled(
            emb, n_sub=PQ_NSUB, codes_per_sub=PQ_CODES, dim=PQ_DIM
        ).collect()
    }
    got: dict = {}
    for r in q.collect():
        got.setdefault(r.vec_id, {})[r.sub_id] = r.code
    assert set(got) == set(op)
    for vid, codes in op.items():
        assert [got[vid][j] for j in range(len(codes))] == list(codes)
