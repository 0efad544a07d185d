"""Stateful streaming sessionization — ``applyInPandasWithState``.

The streaming twin of ``operators.sessionize``: per-user gap-based sessions
maintained as explicit group state across micro-batches.  A session closes
when a later event arrives past the gap; the still-open session rides in
state to the next batch (production adds ProcessingTimeTimeout to flush
idle sessions; with availableNow the final open session per user simply
remains in state — tests exploit exactly that semantic).

State is O(1) per user (start_ts, last_ts, n_events) — the canonical
bounded-state streaming design; the shuffle key is user_id.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events import read_events_stream

SESSION_GAP_SEC = 1800.0

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.DoubleType()),  # epoch sec
        T.StructField("n_events", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ts", T.DoubleType()),
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    ts = (
        pd.concat([p["ts"] for p in pdfs])
        .map(lambda t: t.timestamp())
        .sort_values()
        .tolist()
    )
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0
    closed: list[tuple[float, int, float]] = []
    for t in ts:
        if last is None:
            start, last, n = t, t, 1
        elif t - last > SESSION_GAP_SEC:
            closed.append((start, n, last - start))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    state.update((start, last, n))  # the open session rides to the next batch
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [c[0] for c in closed],
                "n_events": [c[1] for c in closed],
                "duration_sec": [c[2] for c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionize_available_now(
    spark: SparkSession, sf_dir: str, query_name: str = "sessions"
) -> DataFrame:
    stream = sessionize_stream(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name).select(
        "user_id",
        F.date_format(F.timestamp_seconds("session_start"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n_events",
        F.round("duration_sec", 6).alias("duration_sec"),
    )


# -- event-time-timer session flushing ----------------------------------------
#
# The NoTimeout sessionizer above can only close a session when a LATER
# event from the same user arrives — a user who goes silent leaves their
# last session in state forever.  Timer-based eviction is the streaming
# capability that fixes it: each group arms an event-time timer at
# (last_ts + gap); when the WATERMARK passes that point without new data,
# Spark invokes the function with state.hasTimedOut=True and no rows, and
# the open session flushes.  State is evicted by time, not by traffic —
# at 100 TB of users this is the difference between bounded and unbounded
# state for long-tail-idle keys.

TIMER_WATERMARK = "1 hour"


def _sessionize_group_timered(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # silent group: the watermark proved no event can extend the open
        # session — flush it and drop the state
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [start],
                "n_events": [n],
                "duration_sec": [last - start],
            }
        )
        return
    ts = (
        pd.concat([p["ts"] for p in pdfs])
        .map(lambda t: t.timestamp())
        .sort_values()
        .tolist()
    )
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0
    closed: list[tuple[float, int, float]] = []
    for t in ts:
        if last is None:
            start, last, n = t, t, 1
        elif t - last > SESSION_GAP_SEC:
            closed.append((start, n, last - start))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    state.update((start, last, n))
    # arm the eviction timer: fires once the watermark passes the gap edge
    state.setTimeoutTimestamp(int((last + SESSION_GAP_SEC) * 1000))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [c[0] for c in closed],
                "n_events": [c[1] for c in closed],
                "duration_sec": [c[2] for c in closed],
            }
        )


def sessionize_stream_timered(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", TIMER_WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group_timered,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_sessions_timered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: availableNow pass of the timer-evicting sessionizer.
    Deterministic (fixed input, fixed watermark) but the emission rule is
    watermark-relative — rows-only driver check; pytest pins the exact
    semantics against the batch sessionizer + final-watermark rule."""
    import uuid

    name = f"sess_timer_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream_timered(read_events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "user_id",
        F.date_format(
            F.timestamp_seconds("session_start"), "yyyy-MM-dd HH:mm:ss"
        ).alias("session_start"),
        "n_events",
        F.round("duration_sec", 3).alias("duration_sec"),
    ).orderBy("user_id", "session_start")


from ..operators.registry import register  # noqa: E402

register("stream_sessions_timered", stream_sessions_timered, None)  # rows-only: watermark semantics
