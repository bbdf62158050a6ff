"""Property tests for the sketch/layout/augmentation batch
(queries_llm12): invariants beyond the shared-steps oracles."""

from __future__ import annotations

from etl_building_inspector_spark.plans.queries_llm12 import (
    HIST_BINS,
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


def test_span_corruption_structure(spark):
    """Spans never outnumber masked tokens; a span is at most
    SPAN_MAX_LEN long (merged runs can exceed it only via overlap,
    in which case n_spans counts the merged run once)."""
    rows = corpus_span_corruption(spark, SF).collect()
    assert len(rows) > 0
    masked_total = sum(r.n_masked for r in rows)
    assert masked_total > 0  # the 1-in-20 rate must fire on 500 docs
    for r in rows:
        assert r.n_spans <= r.n_masked
        assert r.n_masked <= r.n_tokens
        # each merged run contributes >= 1 and <= run length
        if r.n_spans:
            assert r.n_masked / r.n_spans <= r.n_tokens
    # global mask rate should be in the right ballpark for
    # start rate 1/20 and mean span length 2: ~8-12%
    tokens_total = sum(r.n_tokens for r in rows)
    rate = masked_total / tokens_total
    assert 0.04 < rate < 0.2, rate


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
