"""Custom stateful streaming operator: gap-based sessionization.

Demonstrates the ``applyInPandasWithState`` surface for operators Spark
lacks natively — here, user sessions that close after ``gap`` seconds of
inactivity, emitted as they expire via event-time timeout. This is the
pattern any custom stateful extraction operator (e.g. multi-part
document reassembly across stream records) would follow.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start", TimestampType()),
        StructField("end", TimestampType()),
        StructField("n", LongType()),
    ]
)

GAP_SECONDS = 30 * 60


def _sessionize(key, pdf_iter, state: GroupState):
    """Per-user session accumulator with processing-time timeout."""
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        start, end, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [start],
                "session_end": [end],
                "n_events": [n],
            }
        )
        return

    start = end = None
    n = 0
    if state.exists:
        start, end, n = state.get
    closed = []
    for pdf in pdf_iter:
        for ts in sorted(pdf["ts"]):
            ts = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
            if start is None:
                start, end, n = ts, ts, 0
            elif (ts - end).total_seconds() > GAP_SECONDS:
                closed.append((start, end, n))
                start, end, n = ts, ts, 0
            n += 1
            end = max(end, ts)
    state.update((start, end, n))
    state.setTimeoutDuration(GAP_SECONDS * 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [c[0] for c in closed],
                "session_end": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(user_id, ts, ...) stream → closed sessions."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """Batch twin of the stateful operator (window-function formulation)
    — used to cross-check the streaming results and as the backfill
    path. One shuffle on user_id; sessions assigned by gap cuts."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gaps = events.select("user_id", "ts").withColumn(
        "new_session",
        (
            # interval comparison: works for TIMESTAMP and TIMESTAMP_NTZ
            F.col("ts") - F.lag("ts").over(w)
            > F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
        ).cast("int"),
    )
    sessions = gaps.withColumn(
        "session_id", F.sum(F.coalesce("new_session", F.lit(0))).over(w)
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    ).drop("session_id")
