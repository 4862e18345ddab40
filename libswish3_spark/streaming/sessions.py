"""Custom stateful streaming operator: gap-based sessionization.

Demonstrates the ``applyInPandasWithState`` surface for operators Spark
lacks natively — here, user sessions that close after ``gap`` seconds of
inactivity, emitted as they expire via EVENT-TIME timeout against the
stream's watermark. This is the pattern any custom stateful extraction
operator (e.g. multi-part document reassembly across stream records)
would follow.

Event-time (not processing-time) timeouts are a correctness AND
liveness choice: expiry follows the data's own clock, so replays and
backfills close the same sessions deterministically regardless of
wall-clock speed, late events within the watermark still extend their
session, and a drained ``availableNow`` backfill TERMINATES — a
processing-time timeout re-arms on every batch, which keeps the
no-new-data loop spinning empty micro-batches forever (measured: the
old form never terminated; the suite paid full awaitTermination
timeouts).
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


def _tzinfo_for(name: str | None):
    """tzinfo for a Spark session-timezone string (region name or
    ±HH:MM offset); None → fall back to the machine's local zone."""
    if not name:
        return None
    try:
        if name[0] in "+-":
            h, m = name[1:].split(":")
            delta = dt.timedelta(hours=int(h), minutes=int(m))
            return dt.timezone(-delta if name[0] == "-" else delta)
        from zoneinfo import ZoneInfo

        return ZoneInfo(name)
    except Exception:
        return None


def _make_sessionize(session_tz: str | None):
    """Build the per-user session accumulator with event-time timeout:
    the open session expires when the WATERMARK passes session_end + gap.

    ``session_tz`` is captured at plan time: Arrow hands the state
    function tz-NAIVE timestamps localized to ``spark.sql.session.
    timeZone``, while ``getCurrentWatermarkMs``/``setTimeoutTimestamp``
    speak UTC epoch ms — converting the naive session end via bare
    ``datetime.timestamp()`` (machine-local zone) shifts every expiry
    by the zone delta whenever the session tz differs from the host tz
    (e.g. ``timeZone=UTC`` on a UTC-8 box: sessions emit 8 h late)."""
    tzinfo = _tzinfo_for(session_tz)

    def _sessionize(key, pdf_iter, state: GroupState):
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
        # drain ALL chunks before sorting: Arrow splits a large group
        # into multiple pandas chunks (maxRecordsPerBatch) in no
        # particular order — sorting per chunk processed later-chunk
        # earlier events against an already-advanced session and
        # produced boundaries the batch twin (global sort) never would
        all_ts = []
        for pdf in pdf_iter:
            all_ts.extend(pdf["ts"])
        for ts in sorted(all_ts):
            ts = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
            if start is None:
                start, end, n = ts, ts, 0
            elif (ts - end).total_seconds() > GAP_SECONDS:
                closed.append((start, end, n))
                start, end, n = ts, ts, 0
            n += 1
            end = max(end, ts)
        state.update((start, end, n))
        # expire when the watermark passes the gap after the last event;
        # clamp above the current watermark (Spark requires a future
        # timestamp when a late event lands after its own expiry point)
        end_utc = end.replace(tzinfo=tzinfo) if tzinfo else end
        expiry_ms = int(end_utc.timestamp() * 1000) + GAP_SECONDS * 1000
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(expiry_ms, wm_ms + 1))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return _sessionize


def sessionize_stream(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """events(user_id, ts, ...) stream → closed sessions.

    ``watermark`` bounds how late an event may arrive and still extend
    its session; sessions whose gap the watermark has passed emit via
    event-time timeout (deterministic under replay, and an
    ``availableNow`` backfill drains and terminates)."""
    session_tz = events.sparkSession.conf.get(
        "spark.sql.session.timeZone", None
    )
    return (
        # watermarks require TIMESTAMP (NTZ parquet columns cast via the
        # session zone — UTC in this pipeline's sessions)
        events.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionize(session_tz),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
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
