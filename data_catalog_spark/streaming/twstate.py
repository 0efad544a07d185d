"""Arbitrary-state streaming v2 — ``transformWithStateInPandas``.

The modern (Spark 4) stateful API: explicit typed state variables instead of
one opaque tuple, per-group Arrow batches, optional timers/TTL.  Here: a
per-user running activity profile (event count, purchase count, cumulative
purchase value) updated across micro-batches, emitting one snapshot row per
user per batch it appears in — the streaming-native form of a cumulative
groupBy that never recomputes history.

Contrast with ``streaming/sessions.py`` (applyInPandasWithState, the v1
API): state there is a single tuple; here each quantity is a named
``ValueState`` with its own schema, which is what survives schema evolution
of the state store at deployment scale.

Scale: state is O(1) per user and the shuffle key is user_id; snapshots are
append-mode so downstream sinks see a monotone change log (the same
pattern as a Kafka-compacted topic keyed by user).

Availability: transformWithState's Python worker protocol needs protobuf.
Where protobuf is absent the entry transparently runs the
``applyInPandasWithState`` twin below (identical state quantities and
output contract), so the oracle row is exercisable in every container and
the v2 engine is used wherever it can be.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ..operators.registry import register
from .events import events_stream_source


def round_half_away_cents(values) -> int:
    """Sum of value·100 with HALF-AWAY-FROM-ZERO rounding per element, as an
    exact int — matches DuckDB's round() semantics; numpy/pandas ``round``
    is banker's (half-to-even) and diverges on exact .5 ties.  Pure-pandas
    helper so the rounding contract is unit-testable without the streaming
    engine (or protobuf) present."""
    import numpy as np

    v = np.asarray(values, dtype=np.float64) * 100.0
    return int((np.floor(np.abs(v) + 0.5) * np.sign(v)).sum())

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_purchases", T.LongType()),
        T.StructField("purchase_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("n_purchases", T.LongType()),
        T.StructField("purchase_cents", T.LongType()),
    ]
)


class UserActivityProcessor(StatefulProcessor):
    """Running per-user totals.  Purchase value accumulates in integer
    cents (LongType state) so cross-batch accumulation is exact and
    order-independent — the streaming analog of the DECIMAL-before-SUM
    rule the batch operators follow."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n_events, n_purchases, cents = (
            tuple(self._state.get()) if self._state.exists() else (0, 0, 0)
        )
        for pdf in rows:
            n_events += len(pdf)
            purch = pdf[pdf["event_type"] == "purchase"]
            n_purchases += len(purch)
            # exact: per-row cents summed as ints (round_half_away_cents
            # pins the tie-breaking contract vs DuckDB's round()).
            cents += round_half_away_cents(purch["value"].to_numpy())
        self._state.update((n_events, n_purchases, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "n_purchases": [n_purchases],
                "purchase_value": [cents / 100.0],
            }
        )

    def close(self) -> None:
        pass


def user_activity_stream(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserActivityProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def _activity_group_v1(key, pdfs, state):
    """applyInPandasWithState twin of UserActivityProcessor — identical
    state quantities (events, purchases, integer cents) and identical
    output contract, expressed in the v1 single-tuple state API.  Used as
    the FALLBACK engine where transformWithState's protobuf-based worker
    protocol is unavailable; the parity test pins both against the same
    oracle."""
    import pandas as pd

    n_events, n_purchases, cents = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n_events += len(pdf)
        purch = pdf[pdf["event_type"] == "purchase"]
        n_purchases += len(purch)
        cents += round_half_away_cents(purch["value"].to_numpy())
    state.update((n_events, n_purchases, cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n_events],
            "n_purchases": [n_purchases],
            "purchase_value": [cents / 100.0],
        }
    )


def user_activity_stream_v1(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").applyInPandasWithState(
        _activity_group_v1,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def stream_user_activity_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: one availableNow pass ⇒ exactly one snapshot per user,
    equal to the batch per-user aggregate (the parity pytest pins this).
    Engine: transformWithState where its protobuf worker protocol exists,
    else the applyInPandasWithState twin — same state, same output."""
    import os
    import tempfile
    import uuid

    stage = tempfile.mkdtemp(prefix="events-tws-")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(stage, "events.parquet")
    )
    name = f"tws_{uuid.uuid4().hex[:8]}"
    build = user_activity_stream if _protobuf_available() else user_activity_stream_v1
    q = (
        build(events_stream_source(spark, stage))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("user_id")


# Single-batch totals are the plain per-user aggregate; value goes through
# integer cents in BOTH engines so the double is identical.
USER_ACTIVITY_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchases,
       CAST(COALESCE(sum(CAST(round(value * 100) AS BIGINT))
                     FILTER (event_type = 'purchase'), 0) AS DOUBLE) / 100.0
         AS purchase_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def _protobuf_available() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


# Registered UNCONDITIONALLY: the entry picks its engine at run time
# (transformWithState when protobuf exists, the v1 twin otherwise), so the
# oracle row is exercisable in every container.
register(
    "stream_user_activity_totals",
    stream_user_activity_totals,
    USER_ACTIVITY_ORACLE,
)
