"""Event-time windowed aggregations with late-data watermarks.

The reference's stream has no event-time semantics (one framed doc at a
time, parser.c:2050-2216), but a production extraction pipeline monitors
itself over event time: documents/sec, words/sec, error rates per
window, tolerant of late arrivals. These helpers are that layer over
any timestamped table/stream (the synthetic ``events`` table carries
``ts`` for tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "10 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling-window counts with a late-data watermark.

    Works identically on a batch DataFrame (watermark is a no-op) and on
    a stream (append-mode emission once the watermark passes the window
    end) — the dual-mode shape that makes backfill + live use one code
    path.
    """
    # watermarks require TIMESTAMP; parquet NTZ columns are cast (session
    # tz should be UTC for naive-data fidelity)
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    aggs = [F.count("*").alias("cnt")]
    # value aggregation only when the source HAS the column (the helper
    # is documented as layering over any timestamped table — a
    # hard-coded 'value' raised UNRESOLVED_COLUMN on every other source)
    if value_col and value_col in events.columns:
        aggs.append(
            F.floor(F.sum(value_col) * 100).cast("long").alias("sum_value_c")
        )
    return src.groupBy(F.window(ts_col, window).alias("win"), key_col).agg(*aggs)


def extraction_rate_monitor(
    extracted_stream: DataFrame,
    ts_col: str,
    window: str = "5 minutes",
    watermark: str = "1 minute",
) -> DataFrame:
    """docs/sec + words/sec + error counts per window over the extracted
    stream — the live analogue of ``pipeline.extraction_metrics``."""
    return (
        extracted_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"))
        .agg(
            F.count("*").alias("docs"),
            F.sum("nwords").alias("words"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
        )
    )
