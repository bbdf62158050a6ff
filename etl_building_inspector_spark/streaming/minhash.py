"""Streaming MinHash index maintenance: the CORPUS arrives as a
stream, and each micro-batch is absorbed into the standing banded
signature index by merge -- the streaming twin of
dedup_minhash_index_refresh the way streaming/decon.py is the
streaming twin of decontaminate_incremental_bloom.

foreachBatch is the right sink for the same reason as streaming/cdc
and streaming/decon: the per-batch work (build the batch's band
index, merge it into the standing index) is stateful table
maintenance. Unlike the decon case there is NO driver-side result
state at all -- the cross-batch state is the index DataFrame itself,
localCheckpoint()ed per batch so the plan stays O(1) in batches and
the blocks survive the micro-batch that produced them.

Arrival-order robustness is by ALGEBRA here, not staging discipline:
merge_minhash_band_indexes is a commutative monoid fold (count/min),
so any interleaving of corpus batches yields the identical refreshed
index -- pinned in tests/test_r10b_properties.py by merging a
shuffled batch order.

At 100 TB each micro-batch's index build is one shuffle of the
BATCH's (band, key) rows; the merge re-aggregates |index| + |batch|
summary rows (both sides already hash-partitioned on (band, key)
from their own builds). In production the merged index is written to
a bucketed table per batch -- exactly the persisted artifact
minhash_band_index documents; localCheckpoint is the in-session
analogue of that write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..operators._cache import free_local_checkpoint, track_local_checkpoint
from ..operators.dedup import (
    merge_minhash_band_indexes,
    minhash_lsh_buckets,
    probe_minhash_band_index,
)


def streaming_minhash_index_refresh(
    spark: SparkSession,
    corpus_stream: DataFrame,
    probe_docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Drain `corpus_stream` (a STREAMING DataFrame of corpus docs),
    absorbing each micro-batch into a standing band index by merge,
    then probe `probe_docs` (today's static batch) against the final
    refreshed index. Returns probe_minhash_band_index's schema:
    (id, hit_bands, n_index_docs, first_match_id).
    """
    state: dict = {"index": None}

    def _absorb(batch_df: DataFrame, epoch_id: int) -> None:
        # No isEmpty() JOB per micro-batch (it cost one extra Spark job
        # per batch, r10): merging an EMPTY batch's rows is the
        # monoid's identity, so the fold is correct without any guard.
        # ADVICE r10 #2 suggested a cheap metadata guard so an empty
        # batch skips the union + re-agg + checkpoint of the standing
        # index; measured and REJECTED (r11): batch_df.inputFiles()
        # returns [] for REAL file-source micro-batches too (the
        # micro-batch plan is a LogicalRDD over the batch's rows, not
        # a file scan), which silently dropped every batch after the
        # first -- and every row-probing guard is a Spark job, i.e.
        # exactly the per-batch cost the r10 change removed. The
        # sources this absorber serves (file source under
        # processAllAvailable) never emit empty batches.
        # Fold the batch's RAW bucket rows into the standing index
        # with ONE aggregation (r11, VERDICT r10 #4): each (band, key,
        # id) assignment is itself a 1-doc index row (count=1,
        # min=id), so pre-aggregating the batch into its own index
        # before merging spent a second shuffle per micro-batch for an
        # intermediate nobody reads. merge(index, 1-doc rows) is the
        # same commutative monoid fold, so the refreshed index is
        # bit-identical (when no index exists yet, the merge of the
        # batch's own rows IS minhash_band_index(batch)).
        raw_b = minhash_lsh_buckets(
            batch_df.select(id_col, text_col),
            text_col,
            id_col,
            k=k,
            bands=bands,
            shingle_n=shingle_n,
            # micro-batches are a few hundred rows: the scan fan-out's
            # exchange is pure overhead per batch (A/B'd 0.92x, r10
            # optimization round) -- at production batch sizes the
            # batch arrives as many splits and fan-out is a no-op
            # anyway, so skipping it here loses nothing at scale
            fanout=False,
        )
        idx_b = raw_b.select(
            "band",
            "key",
            F.lit(1).cast("long").alias("n_index_docs"),
            F.col(id_col).cast("long").alias("first_match_id"),
        )
        prev = state["index"]
        merged = merge_minhash_band_indexes(*( [prev] if prev is not None else [] ), idx_b)
        # materialize THIS batch's refreshed index and cut its lineage
        # (it references the micro-batch source, which is gone after
        # this call returns); then free the superseded snapshot
        state["index"] = track_local_checkpoint(merged)
        if prev is not None:
            free_local_checkpoint(prev)

    q = corpus_stream.writeStream.foreachBatch(_absorb).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    index = state["index"]
    if index is None:
        raise ValueError("corpus stream produced no batches; nothing to probe")
    return probe_minhash_band_index(
        probe_docs, index, text_col, id_col, k=k, bands=bands, shingle_n=shingle_n
    )
