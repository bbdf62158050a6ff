"""Structured Streaming tests: drive bounded file streams through the
real incremental engine and cross-check against the batch plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_building_inspector_spark.sources.tables import load_table
from etl_building_inspector_spark.streaming.events import (
    read_event_stream,
    run_to_memory,
    session_windows,
    streaming_windowed_counts,
)


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir, tmp_path_factory):
    # fixture parquet is TIMESTAMP(NANOS); rewrite via the batch loader
    # (which normalizes to micros) so the stream source can read it
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    return d


def test_streaming_window_counts_match_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    result = run_to_memory(
        streaming_windowed_counts(stream, "1 hour"), "win_counts"
    ).collect()
    batch = (
        spark.read.parquet(event_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    stream_counts = {(r.window_start, r.event_type): r.n_events for r in result}
    batch_counts = {(r.w.start, r.event_type): r.n for r in batch}
    assert stream_counts == batch_counts


def test_streaming_session_windows(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    result = run_to_memory(session_windows(stream, "30 minutes"), "sessions")
    rows = result.collect()
    assert len(rows) > 0
    # session invariants: start <= end, counts positive
    assert all(r.session_start <= r.session_end and r.n_events > 0 for r in rows)
    # total events preserved across sessions
    total = sum(r.n_events for r in rows)
    assert total == spark.read.parquet(event_dir).count()


def test_stateful_running_totals(spark, event_dir):
    """applyInPandasWithState: final per-user state must equal the
    batch aggregate (update mode -> last emit per user wins)."""
    from etl_building_inspector_spark.streaming.events import running_user_totals

    stream = read_event_stream(spark, event_dir)
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # last emitted row per user = final state
    emitted = spark.sql("SELECT * FROM user_totals").collect()
    final = {}
    for r in emitted:  # memory sink appends in emit order per batch
        cur = final.get(r.user_id)
        if cur is None or r.n_events >= cur.n_events:
            final[r.user_id] = r
    batch = {
        r.user_id: r
        for r in spark.read.parquet(event_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(final) == set(batch)
    for uid, r in final.items():
        assert r.n_events == batch[uid].n
        assert r.total_value == pytest.approx(batch[uid].tv)


def test_watermark_drops_late_data(spark, tmp_path_factory):
    """Append-mode window agg across micro-batches: an event far older
    than the advanced watermark must be dropped; windows close and emit
    once the watermark passes them."""
    import datetime as dt

    d = str(tmp_path_factory.mktemp("late_events"))
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    # batch 1: events in hour 0 and hour 5 (watermark -> 5:00 - 10min)
    write_batch("b1", [
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=5), 1, "click", 1.0, "{}"),
    ])

    stream = spark.readStream.schema(schema).parquet(d)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 -> watermark advances to 4:50
        # batch 2 lands while the query runs: one on-time event (hour 6)
        # + one VERY late event back in hour 0 -- the hour-0 window is
        # already past the watermark, so the late row must be dropped
        write_batch("b2", [
            (3, t0 + dt.timedelta(hours=6), 1, "click", 1.0, "{}"),
            (4, t0 + dt.timedelta(minutes=1), 1, "click", 99.0, "{}"),
        ])
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = {
        r.w.start.hour: (r.n, r.v)
        for r in spark.sql("SELECT * FROM late_test").collect()
    }
    # hour-0 window emitted exactly once with ONLY the on-time event:
    # the late 99.0-value row was dropped by the watermark
    assert emitted.get(0) == (1, 1.0)


def test_foreach_batch_exactly_once_sink(spark, event_dir, tmp_path_factory):
    """foreachBatch custom sink: per-epoch idempotent parquet writes
    (mode=overwrite into an epoch-keyed dir) -- re-delivery of a batch
    can't duplicate rows; total rows match the source exactly."""
    out = str(tmp_path_factory.mktemp("fb_sink"))

    def write_epoch(df, epoch_id):
        df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")
        # simulate a retry re-delivering the same epoch: idempotent
        df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    stream = read_event_stream(spark, event_dir)
    q = stream.writeStream.foreachBatch(write_epoch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    written = spark.read.parquet(out)
    src_count = spark.read.parquet(event_dir).count()
    assert written.count() == src_count
    assert written.select("event_id").distinct().count() == src_count


def test_expiring_sessions_timeout_lifecycle(spark, tmp_path_factory):
    """applyInPandasWithState + EventTimeTimeout: a session is emitted
    exactly once when the watermark passes session_end + gap (state
    removed), and a still-open session is NOT emitted."""
    import datetime as dt

    from etl_building_inspector_spark.streaming.events import expiring_sessions

    d = str(tmp_path_factory.mktemp("sess_events"))
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    # batch 1: user 1 (two events 10 min apart => one session), user 2
    write_batch([
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 1, "click", 1.0, "{}"),
        (3, t0, 2, "click", 1.0, "{}"),
    ])
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        expiring_sessions(stream, gap="30 minutes", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("exp_sessions")
        .start()
    )
    try:
        q.processAllAvailable()  # watermark still at batch-0 floor
        # batch 2: user 3 far in the future -> watermark for the NEXT
        # batch jumps past user 1/2's session_end + gap
        write_batch([(4, t0 + dt.timedelta(hours=5), 3, "click", 1.0, "{}")])
        q.processAllAvailable()
        # batch 3: nudge event time forward so batch 3 runs with the
        # advanced watermark and fires the timeouts for users 1 and 2
        # (user 3's timeout at 5:31 stays unexpired: watermark 4:51)
        write_batch([(5, t0 + dt.timedelta(hours=5, minutes=1), 3, "click", 1.0, "{}")])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.user_id: r for r in spark.sql("SELECT * FROM exp_sessions").collect()}
    assert set(rows) == {1, 2}, f"expected closed sessions for 1,2 got {sorted(rows)}"
    assert rows[1].session_start == t0
    assert rows[1].session_end == t0 + dt.timedelta(minutes=10)
    assert rows[1].n_events == 2
    assert rows[2].session_start == rows[2].session_end == t0
    assert rows[2].n_events == 1


def test_streaming_dedup_within_watermark(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark: duplicates inside the watermark
    horizon collapse to one row; the key state is evicted after the
    watermark passes, which is what bounds it (we verify the dedup
    semantics and that the query runs append-mode across batches)."""
    import datetime as dt

    from etl_building_inspector_spark.streaming.events import streaming_dedup

    d = str(tmp_path_factory.mktemp("dedup_events"))
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    # batch 1: event 1 twice (in-horizon dup) + event 2
    write_batch([
        (1, t0, 1, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(seconds=30), 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 2.0, "{}"),
    ])
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        streaming_dedup(stream, ["event_id"], watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: event 1 AGAIN within the horizon (still dropped) and
        # a fresh event 3 advancing the watermark
        write_batch([
            (1, t0 + dt.timedelta(minutes=2), 1, "click", 1.0, "{}"),
            (3, t0 + dt.timedelta(minutes=3), 1, "click", 3.0, "{}"),
        ])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT event_id FROM dedup_stream").collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3]


def test_stream_stream_join_matches_batch(spark, event_dir):
    """Stream-stream range join must produce exactly the batch join's
    pairs once both streams are exhausted."""
    from etl_building_inspector_spark.streaming.events import (
        stream_stream_click_purchase_join,
    )

    ev = spark.read.parquet(event_dir)
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    ct, pt = sorted(types)[0], sorted(types)[-1]

    clicks_s = read_event_stream(spark, event_dir).filter(
        F.col("event_type") == ct
    )
    purch_s = read_event_stream(spark, event_dir).filter(
        F.col("event_type") == pt
    )
    joined = stream_stream_click_purchase_join(
        clicks_s, purch_s, horizon="1 hour", watermark="24 hours"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    c = ev.filter(F.col("event_type") == ct).select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == pt).select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    want = {
        (r.cid, r.pid)
        for r in c.join(
            p,
            (F.col("cu") == F.col("pu"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 hour")),
        ).collect()
    }
    assert got == want
    assert len(want) > 0


def test_scd2_streaming_cdc(spark, tmp_path_factory):
    """foreachBatch SCD2 maintenance: two micro-batches of updates
    produce versioned snapshots whose final state equals applying the
    updates in batch order (history closed, latest open); re-delivered
    epochs are no-ops (epoch gating)."""
    import datetime as dt

    from etl_building_inspector_spark.streaming.cdc import (
        init_dim,
        read_dim,
        scd2_foreach_batch,
    )

    dim_dir = str(tmp_path_factory.mktemp("dim"))
    src = str(tmp_path_factory.mktemp("cdc_updates"))
    init_dim(
        spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "k long, attr string"
        ),
        dim_dir,
    )
    schema = "k long, attr string, __effective timestamp"
    t1 = dt.datetime(2024, 1, 1, 10, 0, 0)
    t2 = dt.datetime(2024, 1, 1, 11, 0, 0)

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    write_batch([(1, "alpha2", t1)])
    stream = spark.readStream.schema(schema).parquet(src)
    fb = scd2_foreach_batch(dim_dir, "k")
    q = stream.writeStream.foreachBatch(fb).start()
    try:
        q.processAllAvailable()
        write_batch([(1, "alpha3", t2), (3, "gamma", t2)])
        q.processAllAvailable()
    finally:
        q.stop()

    dim = read_dim(spark, dim_dir)
    cur = {r.k: r.attr for r in dim.filter("is_current").collect()}
    assert cur == {1: "alpha3", 2: "beta", 3: "gamma"}
    hist1 = sorted(
        (r.attr, r.valid_to)
        for r in dim.filter("k = 1 AND NOT is_current").collect()
    )
    assert [a for a, _ in hist1] == ["alpha", "alpha2"]
    assert [vt for _, vt in hist1] == [t1, t2]  # closed at update times
    # re-delivery of an already-committed epoch is a no-op
    from etl_building_inspector_spark.streaming.cdc import latest_version

    v_before = latest_version(dim_dir)
    batch1 = spark.read.parquet(src).limit(1)
    fb(batch1, 0)  # epoch 0 already committed
    assert latest_version(dim_dir) == v_before


def test_pointintime_enrich_slowly_changing_dim(spark, tmp_path_factory):
    """Streaming enrichment against a dim that changes MID-STREAM must
    be point-in-time correct: each event joins the dim version valid at
    its own event time, and batches after the dim update see the new
    version only for events timestamped after the change."""
    import datetime as dt

    from etl_building_inspector_spark.streaming.cdc import (
        init_dim,
        pointintime_enrich_foreach_batch,
        scd2_foreach_batch,
    )

    dim_dir = str(tmp_path_factory.mktemp("ptdim"))
    src = str(tmp_path_factory.mktemp("pt_events"))
    out = str(tmp_path_factory.mktemp("pt_out"))
    init_dim(
        spark.createDataFrame([(1, "bronze"), (2, "gold")], "k long, tier string"),
        dim_dir,
    )
    t1 = dt.datetime(2024, 1, 1, 10, 0, 0)
    t2 = dt.datetime(2024, 1, 1, 11, 0, 0)
    t3 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "event_id long, k long, ts timestamp"

    def write_events(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    write_events([(100, 1, t1), (101, 2, t1)])
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream.writeStream.foreachBatch(
        pointintime_enrich_foreach_batch(dim_dir, "k", "ts", out)
    ).start()
    try:
        q.processAllAvailable()
        # dim changes at t2: user 1 bronze -> silver
        upd = spark.createDataFrame([(1, "silver", t2)],
                                    "k long, tier string, __effective timestamp")
        scd2_foreach_batch(dim_dir, "k")(upd, 0)
        # batch 2 carries one event BEFORE the change and one after
        write_events([(102, 1, t1), (103, 1, t3), (104, 9, t3)])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r.event_id: r.tier for r in spark.read.parquet(out + "/epoch=*").collect()}
    assert rows[100] == "bronze"  # enriched before the change
    assert rows[101] == "gold"
    assert rows[102] == "bronze"  # late event: version valid at t1, not current
    assert rows[103] == "silver"  # post-change event gets the new version
    assert rows[104] is None  # unknown key survives (left join)


def test_stream_stream_left_outer_emits_nulls_after_watermark(
    spark, tmp_path_factory
):
    """LEFT OUTER stream-stream join: a click with an in-horizon
    purchase emits the pair; a click with none must STILL emit -- with
    null purchase columns -- but only after the watermark proves no
    match can arrive. A second micro-batch far in the future advances
    the watermark to force that closure."""
    import datetime as dt

    from etl_building_inspector_spark.streaming.events import (
        stream_stream_left_outer_join,
    )

    d = str(tmp_path_factory.mktemp("louter_events"))
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # user 1: click + purchase 10 min later (match)
    # user 2: click, never purchases (must emit null-padded)
    write_batch([
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 1, "purchase", 5.0, "{}"),
        (3, t0, 2, "click", 1.0, "{}"),
    ])

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    joined = stream_stream_left_outer_join(
        clicks, purchases, horizon="1 hour", watermark="10 minutes"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("louter")
        .start()
    )
    try:
        q.processAllAvailable()
        # push the watermark far past click_ts + horizon + watermark.
        # BOTH event types must advance: the query watermark is the MIN
        # across the two watermarked inputs, so a click-only batch
        # leaves the purchase side's (and thus the global) watermark
        # stuck at the first batch.
        write_batch([
            (99, t0 + dt.timedelta(days=2), 9, "click", 0.0, "{}"),
            (98, t0 + dt.timedelta(days=2), 9, "purchase", 0.0, "{}"),
        ])
        q.processAllAvailable()
        # one more nudge batch: outer-row emission happens in the
        # micro-batch AFTER the one that advanced the watermark
        write_batch([
            (100, t0 + dt.timedelta(days=2, minutes=1), 9, "click", 0.0, "{}"),
            (101, t0 + dt.timedelta(days=2, minutes=1), 9, "purchase", 0.0, "{}"),
        ])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM louter").collect()
    got = {(r.click_id, r.purchase_id) for r in rows}
    assert (1, 2) in got  # matched pair
    assert (3, None) in got  # unmatched click emitted null-padded


def test_statestore_reader_exposes_agg_state(spark, tmp_path_factory):
    """Spark 4 state-store data source: the state of a running
    streaming aggregation read back as a BATCH DataFrame from the
    checkpoint -- the debugging/ops surface for stateful pipelines
    (inspect skew across state partitions, audit per-key state
    without stopping the job)."""
    import datetime as dt

    d = str(tmp_path_factory.mktemp("ss_events"))
    ckpt = str(tmp_path_factory.mktemp("ss_ckpt"))
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    t0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (1, t0, 1, "click", 1.0, "{}"),
            (2, t0, 1, "view", 2.0, "{}"),
            (3, t0, 2, "view", 2.0, "{}"),
        ],
        schema,
    ).write.mode("append").parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    agg = stream.groupBy("user_id").agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ss_state_test")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = spark.read.format("statestore").load(ckpt)
    got = {r["key"]["user_id"]: r["value"]["count"] for r in state.collect()}
    assert got == {1: 2, 2: 1}


def _has_protobuf() -> bool:
    # transformWithState's python<->JVM protocol is protobuf-encoded;
    # this container ships no google.protobuf (and pip install is
    # unavailable), so the TWS surface is env-gated like PIL decode
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="google.protobuf missing: transformWithState protocol unavailable",
)
def test_transform_with_state_matches_batch_totals(spark, event_dir):
    """transformWithStateInPandas (Spark 4 StatefulProcessor): final
    per-user totals must equal the batch aggregate, same contract as
    the applyInPandasWithState twin (test_stateful_running_totals)."""
    from etl_building_inspector_spark.streaming.events import (
        read_event_stream,
        running_user_totals_tws,
    )

    totals = running_user_totals_tws(read_event_stream(spark, event_dir))
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_totals")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode may emit several rows per user across batches; the
    # running count is monotone, so the emission with MAX n_events per
    # user is the final one (collect() row order from the memory sink
    # is NOT guaranteed to follow micro-batch emission order).
    emitted = spark.sql("SELECT * FROM tws_totals").collect()
    final = {}
    for r in emitted:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.total_value)
    batch = {
        r.user_id: (r.n, r.v)
        for r in spark.read.parquet(event_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert set(final) == set(batch)
    for uid, (n, v) in batch.items():
        fn, fv = final[uid]
        assert fn == n
        assert abs(fv - v) < 1e-6


def test_session_window_exact_gap_boundary_merges(spark, tmp_path):
    """Pin the gap-merge boundary semantics the streaming_sessionize
    oracle depends on: an inter-event gap of EXACTLY the session gap
    merges (new session only when gap is strictly greater), matching
    the batch/oracle lag+cumsum formulation's strict-`>` condition.
    Probed against the real incremental engine, not the batch twin."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def us(**kw):
        return t0 + datetime.timedelta(**kw)

    rows = [
        (1, 10, us()), (2, 10, us(minutes=30)),                      # == gap: merge
        (3, 20, us()), (4, 20, us(minutes=30, microseconds=1)),      # > gap by 1us: split
        (5, 30, us()), (6, 30, us(minutes=29, seconds=59)),          # < gap: merge
    ]
    d = str(tmp_path / "boundary_events")
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    ).withColumn("event_type", F.lit("x")).withColumn(
        "value", F.lit(0.0)
    ).withColumn("props", F.lit(None).cast("string")).write.parquet(d)

    stream = read_event_stream(spark, d)
    got = {
        (r.user_id, r.n_events)
        for r in run_to_memory(
            session_windows(stream, "30 minutes"), "boundary_sessions"
        ).collect()
    }
    assert got == {(10, 2), (20, 1), (30, 2)}


def test_streaming_sessionize_driver_query_matches_batch_twin(spark, sf_dir):
    """The registered driver query (incremental session_window path)
    must agree with the batch lag+cumsum sessionization on session
    count and total events per user."""
    from etl_building_inspector_spark.plans.queries_core import events_sessionize
    from etl_building_inspector_spark.plans.queries_streaming import (
        streaming_sessionize,
    )

    stream_rows = streaming_sessionize(spark, sf_dir)
    got = {
        (r.user_id, r.n_sessions, r.n_events)
        for r in stream_rows.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .collect()
    }
    want = {
        (r.user_id, r.n_sessions, r.n_events)
        for r in events_sessionize(spark, sf_dir).collect()
    }
    assert got == want


def test_checkpoint_restart_no_double_count(spark, sf_dir, tmp_path_factory):
    """Kill a checkpointed aggregation mid-input, add more input,
    restart with the SAME checkpoint: totals equal the batch answer --
    the checkpoint replays offsets exactly once, never re-counting the
    first tranche. (The recovery contract every production streaming
    job leans on; memory-sink tests elsewhere never exercise it.)"""
    import os

    from pyspark.sql import functions as F

    from etl_building_inspector_spark.sources.tables import load_table
    from etl_building_inspector_spark.streaming.events import read_event_stream

    base = str(tmp_path_factory.mktemp("ckpt_restart"))
    in_dir, ckpt, out = base + "/in", base + "/ckpt", base + "/out"
    os.makedirs(in_dir)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    first = ev.where(F.col("event_id") % 2 == 0)
    second = ev.where(F.col("event_id") % 2 == 1)
    first.write.parquet(in_dir + "/batch0")

    def start():
        stream = read_event_stream(spark, in_dir + "/*")
        agg = stream.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 10000, 0).cast("long")).alias(
                "value_e4"
            ),
        )
        return (
            agg.writeStream.outputMode("complete")
            .option("checkpointLocation", ckpt)
            .format("memory")
            .queryName("ckpt_restart_agg")
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()  # simulate failure/redeploy after tranche 1 committed

    second.write.parquet(in_dir + "/batch1")
    q = start()
    q.processAllAvailable()
    got = {
        (r.event_type, r.n, r.value_e4)
        for r in spark.sql("SELECT * FROM ckpt_restart_agg").collect()
    }
    q.stop()

    expect = {
        (r.event_type, r.n, r.value_e4)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 10000, 0).cast("long")).alias(
                "value_e4"
            ),
        )
        .collect()
    }
    assert got == expect


def test_streaming_foreachbatch_merge_lifecycle(spark, tmp_path_factory):
    """Streaming upsert sink: a file-source stream of changesets is
    applied through foreachBatch -> merge_on_files (the COW MERGE
    executor), each micro-batch committing a new table version (kept +
    rewritten + appended). The final version must equal the classic
    MERGE of all changesets over the original base -- the
    streaming-ingest lifecycle that connects the streaming surface to
    the maintenance executors."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.operators.maintenance import merge_on_files

    root = str(tmp_path_factory.mktemp("fbm"))
    base0 = root + "/base_v0"
    spark.range(100).select(
        F.col("id").alias("key"), (F.col("id") * 10).alias("val")
    ).repartitionByRange(4, "key").write.parquet(base0)

    # two changeset arrivals (disjoint keys -> final state is batch-
    # order independent): updates + one insert each
    upd_dir = root + "/updates"
    b1 = spark.range(10, 15).select(
        F.col("id").alias("key"), (F.col("id") + 1000).alias("val")
    ).unionByName(
        spark.createDataFrame([(1000, 1)], "key long, val long")
    )
    b1.coalesce(1).write.mode("append").parquet(upd_dir)
    b2 = spark.range(20, 25).select(
        F.col("id").alias("key"), (F.col("id") + 2000).alias("val")
    ).unionByName(
        spark.createDataFrame([(2000, 2)], "key long, val long")
    )
    b2.coalesce(1).write.mode("append").parquet(upd_dir)

    state = {"base": base0, "versions": 0}

    def apply_batch(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        out = f"{root}/delta_v{epoch_id}"
        stats = merge_on_files(
            batch_df.sparkSession, state["base"], out, batch_df, "key", ["val"]
        )
        parts = list(stats["kept"])
        if stats["rewritten_dir"]:
            parts.append(stats["rewritten_dir"])
        if stats["appended_dir"]:
            parts.append(stats["appended_dir"])
        new_base = f"{root}/base_v{epoch_id + 1}"
        batch_df.sparkSession.read.parquet(*parts).write.parquet(new_base)
        state["base"] = new_base
        state["versions"] += 1

    stream = (
        spark.readStream.schema("key long, val long")
        .option("maxFilesPerTrigger", 1)
        .parquet(upd_dir)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/ckpt")
        .start()
    )
    try:
        # awaitTermination returns False on timeout with the query
        # still running -- failing HERE beats racing the asserts below
        # against an in-flight batch
        assert q.awaitTermination(120), "stream did not drain in 120s"
    finally:
        q.stop()
    assert state["versions"] >= 1  # maxFilesPerTrigger may still batch

    final = {
        r.key: r.val for r in spark.read.parquet(state["base"]).collect()
    }
    expected = {k: k * 10 for k in range(100)}
    expected.update({k: k + 1000 for k in range(10, 15)})
    expected.update({k: k + 2000 for k in range(20, 25)})
    expected[1000] = 1
    expected[2000] = 2
    assert final == expected


def test_late_data_drop_metric_matches_prediction(spark, sf_dir):
    """streaming_late_data_drop's oracle checks the RESULT; this pins
    the MECHANISM: the straggler batch's numRowsDroppedByWatermark
    must equal the count of straggler CELLS (post-partial-agg rows,
    not raw events) whose window_end <= wm1 (the PREVIOUS batch's
    watermark -- Spark's late-input filter lags the eviction
    watermark by one batch)."""
    import datetime
    import json

    from pyspark.sql import functions as F

    from etl_building_inspector_spark.plans.queries_streaming import (
        LATE_DELAY_DAYS,
        LATE_T0,
        LATE_T1,
        _stream_late_events_dir,
    )
    from etl_building_inspector_spark.sources.tables import load_table
    from etl_building_inspector_spark.streaming.events import EVENTS_SCHEMA

    d = _stream_late_events_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    agg = (
        stream.withWatermark("ts", f"{LATE_DELAY_DAYS} days")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_drop_metric_probe")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()

    dropped_per_batch = [
        sum(s.get("numRowsDroppedByWatermark", 0) for s in p.get("stateOperators", []))
        for p in progress
        if p["numInputRows"] > 0
    ]
    assert len(dropped_per_batch) == 3  # bulk, newest, stragglers
    assert dropped_per_batch[0] == 0 and dropped_per_batch[1] == 0

    ev = load_table(spark, sf_dir, "events")
    bulk_max = (
        ev.filter((F.col("ts") >= LATE_T0) & (F.col("ts") < LATE_T1))
        .agg(F.max("ts"))
        .collect()[0][0]
    )
    wm1 = bulk_max - datetime.timedelta(days=LATE_DELAY_DAYS)
    expected_dropped_cells = (
        ev.filter(F.col("ts") < LATE_T0)
        .select(F.window("ts", "1 hour").alias("w"), "event_type")
        .distinct()
        .filter(F.col("w.end") <= F.lit(wm1))
        .count()
    )
    assert dropped_per_batch[2] == expected_dropped_cells
    assert expected_dropped_cells > 0  # the fixture must exercise the drop


def test_stream_staging_cache_invalidates_on_inplace_rewrite(spark, tmp_path):
    """Pin the round-9 incident class (queries_streaming staging cache
    served stale events after an in-place fixture rebuild) at its
    sharpest edge: a rewrite that keeps the SAME byte size within the
    SAME wall-clock second must still invalidate (ADVICE r9 -->
    st_mtime_ns in the fingerprint), and stale stagings for the same
    fixture basename must be reaped, not leaked."""
    import os
    import shutil

    from etl_building_inspector_spark.plans.queries_streaming import (
        _stream_events_dir,
    )

    sf_like = tmp_path / "sfTESTfp"
    sf_like.mkdir()
    src = str(sf_like / "events.parquet")
    shutil.copyfile("/root/testdata/sf0.001/events.parquet", src)
    os.utime(src, ns=(1_700_000_000_000_000_000, 1_700_000_000_000_000_000))

    d1 = _stream_events_dir(spark, str(sf_like))
    assert os.path.exists(os.path.join(d1, "_SUCCESS"))

    # in-place rewrite: identical bytes (same size), mtime bumped by
    # ONE NANOSECOND -- int(st_mtime) is unchanged, so the old
    # size+whole-second key would have reused d1
    os.utime(src, ns=(1_700_000_000_000_000_000, 1_700_000_000_000_000_001))
    d2 = _stream_events_dir(spark, str(sf_like))
    assert d2 != d1
    assert os.path.exists(os.path.join(d2, "_SUCCESS"))
    # the stale staging for the same basename was reaped, not leaked
    assert not os.path.exists(d1)

    # unchanged source -> cache hit (no re-stage, same dir back)
    assert _stream_events_dir(spark, str(sf_like)) == d2
