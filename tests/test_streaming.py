"""Structured Streaming: the hourly rollup run incrementally must equal the
batch rollup over the same files."""

from __future__ import annotations

from data_catalog_spark.operators.analytics import events_hourly_rollup
from data_catalog_spark.streaming import events as se


def test_stream_rollup_matches_batch(spark, sf_dir):
    got = se.run_rollup_available_now(spark, sf_dir, query_name="t_rollup")
    want = events_hourly_rollup(spark, sf_dir)
    g = sorted((r.hour, r.event_type, r.n_events, round(r.sum_value, 6)) for r in got.collect())
    w = sorted((r.hour, r.event_type, r.n_events, round(r.sum_value, 6)) for r in want.collect())
    assert g == w
    assert len(g) > 0


def test_stream_is_incremental(spark, sf_dir):
    """The source must be a real streaming relation (not a batch read)."""
    stream = se.hourly_rollup_stream(se.read_events_stream(spark, sf_dir))
    assert stream.isStreaming


def test_checkpoint_prevents_double_processing(spark, sf_dir, tmp_path):
    """Exactly-once file-source semantics: a second availableNow start on
    the SAME checkpoint must process nothing new (no double counting),
    because the source's processed-file log lives in the checkpoint."""
    import os

    from data_catalog_spark.streaming.events import (
        events_stream_source,
        hourly_rollup_stream,
    )

    # stable staging dir: the source path must be IDENTICAL across restarts
    # so the checkpoint's processed-file log is what prevents reprocessing
    stage = tmp_path / "events_src"
    stage.mkdir()
    os.symlink(f"{sf_dir}/events.parquet", stage / "events.parquet")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "rollup_out")

    def run_once():
        events = events_stream_source(spark, str(stage))
        q = (
            hourly_rollup_stream(events)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    # append mode + watermark: only closed windows are emitted
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    run_once()  # same checkpoint: the file was already processed
    n2 = spark.read.parquet(out).count()
    assert n2 == n1, "restart from checkpoint must not reprocess input"


def test_foreach_batch_merge_sink_equals_batch_rollup(spark, sf_dir, ddb):
    """Two update-mode micro-batches merged by key must converge to the
    batch rollup — re-emitted windows overwrite, nothing duplicates."""
    from data_catalog_spark.streaming.sink import (
        STREAM_MERGE_ORACLE,
        stream_rollup_merge_sink,
    )
    from conftest import assert_same

    assert_same(stream_rollup_merge_sink(spark, sf_dir), ddb, STREAM_MERGE_ORACLE)


def test_stream_ingest_indexed_search_parity(spark, sf_dir, ddb):
    """The registered write-path query: one streamed micro-batch lands in
    catalog + index, and the indexed search equals the sqlgen oracle over
    seed ∪ planted rows."""
    from conftest import assert_same
    from data_catalog_spark.streaming import ingest

    df = ingest.stream_ingest_indexed_search(spark, sf_dir)
    rows = df.collect()
    # exactly the PUBLIC planted entries (marker token is new vocabulary)
    assert {r.id for r in rows} == {
        f"stream-{i:02d}" for i in range(0, ingest.BATCH_N, 2)
    }
    assert_same(df, ddb, ingest._ingest_oracle())
