"""Stateful streaming sessionization vs the batch sessionizer.

With a single availableNow pass, every session EXCEPT each user's last
(still open, held in state) must be emitted — exactly the batch result
minus the per-user final session."""

from __future__ import annotations

import pyarrow.parquet as pq

from data_catalog_spark.operators.sessionize import sessionize_events
from data_catalog_spark.streaming import sessions as ss
from data_catalog_spark.streaming.events import events_stream_source


def test_stream_sessions_match_batch_closed_sessions(spark, sf_dir):
    got = {
        (r.user_id, r.session_start, r.n_events, r.duration_sec)
        for r in ss.run_sessionize_available_now(spark, sf_dir, "t_sessions").collect()
    }
    batch = sessionize_events(spark, sf_dir).collect()
    last_seq = {}
    for r in batch:
        last_seq[r.user_id] = max(last_seq.get(r.user_id, 0), r.session_seq)
    want = {
        (r.user_id, r.session_start, r.n_events, r.duration_sec)
        for r in batch
        if r.session_seq != last_seq[r.user_id]  # drop each user's open tail
    }
    assert got == want
    assert got, "must emit closed sessions"


def test_state_carries_across_micro_batches(spark, sf_dir, tmp_path):
    """Split the events file at the time median into two files; with
    maxFilesPerTrigger=1 they become two micro-batches, so sessions spanning
    the split only come out right if state genuinely carries over.  The
    emitted set must be identical to the single-batch run (batching-
    independent semantics)."""
    table = pq.read_table(f"{sf_dir}/events.parquet")
    df = table.to_pandas().sort_values("ts")
    mid = len(df) // 2
    stage = tmp_path / "staged"
    stage.mkdir()
    # lexicographic file order == arrival order for the file source
    df.iloc[:mid].to_parquet(stage / "part-0.parquet", index=False)
    df.iloc[mid:].to_parquet(stage / "part-1.parquet", index=False)

    events = events_stream_source(spark, str(stage))
    q = (
        ss.sessionize_stream(events)
        .writeStream.format("memory")
        .queryName("t_sessions_2b")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # floor to whole seconds: the single-batch helper formats session_start
    # at seconds granularity
    got = {
        (r.user_id, int(r.session_start), r.n_events, round(r.duration_sec, 3))
        for r in spark.table("t_sessions_2b").collect()
    }

    single = {
        (r.user_id, int(r.session_start), r.n_events, round(r.duration_sec, 3))
        for r in ss.run_sessionize_available_now(spark, sf_dir, "t_sessions_1b")
        .selectExpr(
            "user_id",
            "cast(to_timestamp(session_start) as double) AS session_start",
            "n_events",
            "duration_sec",
        )
        .collect()
    }
    assert got == single


def test_sessions_identical_under_rocksdb_state_store(spark, sf_dir):
    """State-store provider is a deployment choice, not a semantics choice:
    the RocksDB provider (the production backend — state spills to disk
    instead of living on the JVM heap) must produce byte-identical session
    output to the default HDFS-backed store."""
    baseline = {
        (r.user_id, r.session_start, r.n_events, r.duration_sec)
        for r in ss.run_sessionize_available_now(spark, sf_dir, "t_sess_hdfs").collect()
    }
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        rocks = {
            (r.user_id, r.session_start, r.n_events, r.duration_sec)
            for r in ss.run_sessionize_available_now(
                spark, sf_dir, "t_sess_rocks"
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    assert rocks == baseline and rocks


def test_timer_flush_emits_idle_sessions(spark, sf_dir):
    """EventTimeTimeout sessionizer: every session closed by a successor
    event emits as usual, AND each user's final (idle) session emits iff
    the final watermark (max event time − 1 h) passed its gap edge
    (last_ts + gap) — i.e. timers evict idle state the NoTimeout version
    would hold forever."""
    import pyarrow.parquet as pq

    q = (
        ss.sessionize_stream_timered(ss.read_events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("t_timered")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # batch formats session_start at whole seconds — compare at that grain
    got = {
        (r.user_id, int(r.session_start), r.n_events, round(r.duration_sec, 3))
        for r in spark.table("t_timered").collect()
    }

    batch = sessionize_events(spark, sf_dir).collect()
    last_seq = {}
    for r in batch:
        last_seq[r.user_id] = max(last_seq.get(r.user_id, 0), r.session_seq)
    max_ts = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()["ts"].max().timestamp()
    wm_final = max_ts - 3600.0  # TIMER_WATERMARK

    def epoch(r):
        # batch emits formatted session_start; recover epoch from start+dur
        from datetime import datetime, timezone

        return datetime.strptime(r.session_start, "%Y-%m-%d %H:%M:%S").replace(
            tzinfo=timezone.utc
        ).timestamp()

    want = set()
    for r in batch:
        start = epoch(r)
        is_final = r.session_seq == last_seq[r.user_id]
        flushes = (start + r.duration_sec + ss.SESSION_GAP_SEC) < wm_final
        if (not is_final) or flushes:
            want.add((r.user_id, int(start), r.n_events, round(r.duration_sec, 3)))
    assert got == want
    assert len(got) > sum(1 for r in batch if r.session_seq != last_seq[r.user_id])
