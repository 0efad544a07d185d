"""Session-timezone and stream-stage-unit guards: misconfigured sessions
must fail loudly, never silently shift timestamps (ADVICE r1/r2 items)."""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def non_utc(spark):
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_batch_read_guards_non_utc_session(non_utc, sf_dir):
    from data_catalog_spark.io import read_table

    with pytest.raises(ValueError, match="timeZone"):
        read_table(non_utc, sf_dir, "events")


def test_batch_read_timestamp_free_table_unaffected(non_utc, sf_dir):
    """Tables without timestamp normalization must still read fine on a
    non-UTC session — the guard fires only where a conversion happens."""
    from data_catalog_spark.io import read_table

    assert read_table(non_utc, sf_dir, "region").count() > 0


def test_stream_source_guards_non_utc_session(non_utc, sf_dir, tmp_path):
    from data_catalog_spark.streaming.events import events_stream_source

    stage = tmp_path / "stage"
    stage.mkdir()
    os.symlink(f"{sf_dir}/events.parquet", stage / "events.parquet")
    with pytest.raises(ValueError, match="timeZone"):
        events_stream_source(non_utc, str(stage))


def test_stream_stage_rejects_mixed_ts_units(sf_dir, tmp_path):
    """A stage directory whose files disagree on the ts storage unit must be
    rejected at stream-definition time (a declared schema would silently
    misread the minority files)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_catalog_spark.streaming.events import _ts_unit

    df = pq.read_table(f"{sf_dir}/events.parquet")
    idx = df.schema.get_field_index("ts")
    t_us = df.set_column(idx, "ts", df.column("ts").cast(pa.timestamp("us")))
    t_ns = df.set_column(idx, "ts", df.column("ts").cast(pa.timestamp("ns")))
    stage = tmp_path / "mixed"
    stage.mkdir()
    pq.write_table(t_us, stage / "a.parquet")
    pq.write_table(t_ns, stage / "b.parquet", store_schema=False)
    with pytest.raises(ValueError, match="mixed ts units"):
        _ts_unit(str(stage))


def test_ts_unit_agreeing_files_ok(sf_dir, tmp_path):
    import shutil

    from data_catalog_spark.streaming.events import _ts_unit

    stage = tmp_path / "same"
    stage.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stage / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", stage / "b.parquet")
    assert _ts_unit(str(stage)) in ("us", "ms", "ns")
