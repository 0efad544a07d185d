"""transformWithStateInPandas running totals (gated on protobuf)."""

from __future__ import annotations

import pytest

from data_catalog_spark.streaming import twstate

pytestmark = pytest.mark.skipif(
    not twstate._protobuf_available(),
    reason="transformWithState needs protobuf (not shipped in this container)",
)


def test_single_pass_matches_batch_aggregate(spark, sf_dir, ddb):
    from conftest import assert_same

    assert_same(
        twstate.stream_user_activity_totals(spark, sf_dir),
        ddb,
        twstate.USER_ACTIVITY_ORACLE,
    )


def test_state_accumulates_across_batches(spark, sf_dir, tmp_path):
    """Split events into two files (two micro-batches): each user's LAST
    snapshot must equal the single-pass totals — state carried over."""
    import pyarrow.parquet as pq

    from data_catalog_spark.streaming.events import events_stream_source

    df = pq.read_table(f"{sf_dir}/events.parquet").to_pandas().sort_values("ts")
    mid = len(df) // 2
    stage = tmp_path / "staged"
    stage.mkdir()
    df.iloc[:mid].to_parquet(stage / "part-0.parquet", index=False)
    df.iloc[mid:].to_parquet(stage / "part-1.parquet", index=False)

    q = (
        twstate.user_activity_stream(events_stream_source(spark, str(stage)))
        .writeStream.format("memory")
        .queryName("t_tws_2b")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_tws_2b").collect()
    last = {}
    for r in rows:  # append order: later snapshot overwrites
        prev = last.get(r.user_id)
        if prev is None or r.n_events > prev.n_events:
            last[r.user_id] = r

    single = {
        r.user_id: r
        for r in twstate.stream_user_activity_totals(spark, sf_dir).collect()
    }
    assert set(last) == set(single)
    for uid, r in last.items():
        s = single[uid]
        assert (r.n_events, r.n_purchases, r.purchase_value) == (
            s.n_events,
            s.n_purchases,
            s.purchase_value,
        )
