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
