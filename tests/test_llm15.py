"""Property tests for the phonetic-blocking / shot-cut batch
(queries_llm15)."""

from __future__ import annotations

from etl_building_inspector_spark.plans.queries_llm15 import (
    PHON_LEV_MAX,
    SHOT_DELTA,
    er_phonetic_blocking,
    multimodal_video_shot_cuts,
)

SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_phonetic_pairs_verified_and_gain_recall(spark):
    """Every pair is a true lev <= 2 pair (Python recompute), and at
    least one pair has found_by_exact = 0 — the recall the
    exact-first-token strategy loses, which is this query's point."""
    rows = er_phonetic_blocking(spark, SF).collect()
    assert len(rows) > 0
    gains = 0
    for r in rows:
        assert _lev(r.name_a, r.name_b) == r.dist <= PHON_LEV_MAX
        first_a, first_b = r.name_a.split(" ")[0], r.name_b.split(" ")[0]
        assert bool(r.found_by_exact) == (first_a == first_b)
        gains += 1 - r.found_by_exact
    assert gains > 0


def test_shot_cuts_partition_frames(spark):
    """Shots partition each video's frames contiguously (shot i+1
    starts right after shot i ends), and energies within a shot never
    jump by more than SHOT_DELTA between consecutive frames (the cut
    rule, restated on the output)."""
    rows = multimodal_video_shot_cuts(spark, SF).collect()
    assert len(rows) > 0
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    for key, shots in by_key.items():
        shots.sort(key=lambda r: r.shot_id)
        assert shots[0].first_frame == 0
        assert [s.shot_id for s in shots] == list(range(1, len(shots) + 1))
        for prev, cur in zip(shots, shots[1:]):
            assert cur.first_frame == prev.last_frame + 1, key
        for s in shots:
            assert s.n_frames == s.last_frame - s.first_frame + 1
            assert 0 <= s.min_energy <= s.max_energy <= 999
