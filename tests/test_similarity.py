"""Similarity-search correctness beyond the oracle: LSH recall vs the
exact brute force, and numpy cross-check of the cosine math."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_building_inspector_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from etl_building_inspector_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_bruteforce_matches_numpy(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    got = cosine_topk_bruteforce(emb, queries, k=3).collect()

    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    by_query = {}
    for qi in range(len(ids)):
        if ids[qi] >= 5:
            continue
        sims = mat @ mat[qi] / (norms * norms[qi])
        order = sorted(
            [(s, i) for s, i in zip(sims, ids) if i != ids[qi]],
            key=lambda t: (-t[0], t[1]),
        )
        by_query[ids[qi]] = [i for _, i in order[:3]]

    got_by_query = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        got_by_query.setdefault(r.query_id, []).append(r.neighbor_id)
    assert got_by_query == by_query


def test_lsh_recall_reasonable(spark, emb):
    """LSH is approximate; on the fixture it must still find a decent
    fraction of the true top-5 (and every result must be a genuine
    same-bucket cosine, which the shared oracle query already checks at
    the value level)."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk_bruteforce(emb, queries, k=5).collect()
    approx = cosine_topk_lsh(emb, queries, k=5, n_tables=6, planes_per_table=4, dim=64).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.4  # 6 tables x 4 planes: conservative floor
    # approx similarities are genuine cosines (subset sanity)
    exact_sims = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk_bruteforce(emb, queries, k=500).collect()
    }
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_sims:
            assert r.cosine == pytest.approx(
                exact_sims[(r.query_id, r.neighbor_id)], abs=1e-12
            )


def test_ivf_recall_reasonable(spark, emb):
    """IVF with 4/16 probes must beat random cell selection by a wide
    margin (random would give ~25% recall; nearest-centroid probing on
    clustered data does much better)."""
    from etl_building_inspector_spark.operators.similarity import cosine_topk_ivf

    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk_bruteforce(emb, queries, k=5).collect()
    approx = cosine_topk_ivf(
        emb, queries, k=5, n_centroids=16, n_probe=4
    ).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5
