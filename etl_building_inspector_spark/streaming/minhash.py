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

from ..operators._cache import free_local_checkpoint, track_local_checkpoint
from ..operators.dedup import (
    merge_minhash_band_indexes,
    minhash_band_index,
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
        # per batch, r10): merging an EMPTY batch index is the monoid's
        # identity, so the fold is correct without any guard. But an
        # empty batch folded WITHOUT a guard would still pay a full
        # union + re-aggregation + localCheckpoint of the standing
        # index (ADVICE r10 #2) -- so when an index already exists,
        # skip empty batches using driver-side file metadata only
        # (a file-source micro-batch with no input files has no rows;
        # zero Spark jobs spent deciding).
        if state["index"] is not None:
            try:
                if not batch_df.inputFiles():
                    return
            except Exception:
                pass  # non-file source: fall through to the safe fold
        idx_b = minhash_band_index(
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
        prev = state["index"]
        merged = idx_b if prev is None else merge_minhash_band_indexes(prev, idx_b)
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
