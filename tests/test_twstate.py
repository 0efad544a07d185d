"""Per-user running activity totals — transformWithStateInPandas where the
protobuf worker protocol exists, its applyInPandasWithState twin otherwise.
The oracle-parity and cross-batch tests run on WHICHEVER engine the entry
selects (so this file is never fully skipped); the v2-API-specific test
stays protobuf-gated."""

from __future__ import annotations

import pytest

from data_catalog_spark.streaming import twstate

needs_protobuf = pytest.mark.skipif(
    not twstate._protobuf_available(),
    reason="transformWithState needs protobuf (not shipped in this container)",
)


def test_round_half_away_cents_matches_duckdb_round(ddb):
    """The cents contract, ungated: DuckDB round() is half-away-from-zero;
    numpy/pandas round is banker's.  Pin equality element-by-element on
    exact .5 ties and regular values, including negatives."""
    values = [0.005, 0.015, 0.025, -0.005, -0.015, 1.005, 2.675, -2.675, 0.1, 12.34]
    # CAST AS DOUBLE: the oracle's `value` column IS a double — a bare
    # literal would be DECIMAL-typed in DuckDB and round differently
    # (1.005*100 is exactly 100.500 in decimal, 100.4999… in binary).
    want = sum(
        ddb.execute(
            f"SELECT CAST(round(CAST({v!r} AS DOUBLE) * 100) AS BIGINT)"
        ).fetchone()[0]
        for v in values
    )
    assert twstate.round_half_away_cents(values) == want
    assert twstate.round_half_away_cents([]) == 0


def test_single_pass_matches_batch_aggregate(spark, sf_dir, ddb):
    from conftest import assert_same

    assert_same(
        twstate.stream_user_activity_totals(spark, sf_dir),
        ddb,
        twstate.USER_ACTIVITY_ORACLE,
    )


def _run_two_batch(spark, stage, build, name):
    from data_catalog_spark.streaming.events import events_stream_source

    q = (
        build(events_stream_source(spark, str(stage)))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    last = {}
    for r in rows:  # append order: later snapshot has strictly more events
        prev = last.get(r.user_id)
        if prev is None or r.n_events > prev.n_events:
            last[r.user_id] = r
    return last


def _stage_two_files(sf_dir, tmp_path):
    import pyarrow.parquet as pq

    df = pq.read_table(f"{sf_dir}/events.parquet").to_pandas().sort_values("ts")
    mid = len(df) // 2
    stage = tmp_path / "staged"
    stage.mkdir()
    df.iloc[:mid].to_parquet(stage / "part-0.parquet", index=False)
    df.iloc[mid:].to_parquet(stage / "part-1.parquet", index=False)
    return stage


def test_state_accumulates_across_batches_v1(spark, sf_dir, tmp_path):
    """Two files = two micro-batches through the v1 twin: each user's LAST
    snapshot must equal the single-pass totals — state carried over."""
    stage = _stage_two_files(sf_dir, tmp_path)
    last = _run_two_batch(spark, stage, twstate.user_activity_stream_v1, "t_tws_v1_2b")
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


@needs_protobuf
def test_state_accumulates_across_batches_v2(spark, sf_dir, tmp_path):
    """Same contract through the transformWithState engine itself."""
    stage = _stage_two_files(sf_dir, tmp_path)
    last = _run_two_batch(spark, stage, twstate.user_activity_stream, "t_tws_v2_2b")
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
