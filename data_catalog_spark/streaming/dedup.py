"""Streaming deduplication — ``dropDuplicatesWithinWatermark``.

The ingestion-side twin of batch dedup: at-least-once sources (Kafka,
file landing zones, retried uploads) deliver duplicates; keying the stream
on the record id inside the watermark horizon makes the pipeline
effectively-once without a full-history state table — state is bounded by
the watermark delay, the 100 TB-safe property.

The driver entry replays the events table TWICE (two staged copies → two
micro-batches) through the dedup; the output must equal the single-copy
table exactly, which the batch oracle checks.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.registry import register
from .events import events_stream_source

# Covers the full event-time span of the test corpus (~30 days), so every
# replayed duplicate is inside the horizon — semantics, not tuning; a real
# deployment sets this to its redelivery window (minutes).
DEDUP_WATERMARK = "35 days"


def dedup_events_stream(events: DataFrame) -> DataFrame:
    return events.withWatermark("ts", DEDUP_WATERMARK).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_dedup_replay_available_now(
    spark: SparkSession, sf_dir: str, query_name: str = "dedup_events"
) -> DataFrame:
    """Stage the events file twice (simulated at-least-once redelivery),
    stream with one file per micro-batch, dedup, land in a memory sink."""
    stage = tempfile.mkdtemp(prefix="events-replay-")
    for i in range(2):
        os.symlink(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(stage, f"copy-{i}.parquet"),
        )
    events = events_stream_source(spark, stage)
    q = (
        dedup_events_stream(events)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def stream_dedup_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: per-type stats over the DEDUPED replayed stream — equal
    to stats over the plain table iff dedup removed exactly the replay."""
    out = run_dedup_replay_available_now(spark, sf_dir, "dedup_events_q")
    return (
        out.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


STREAM_DEDUP_ORACLE = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""


register("stream_dedup_type_stats", stream_dedup_type_stats, STREAM_DEDUP_ORACLE)
