"""Structured Streaming front-end for the extraction pipeline (S3).

The reference's aggregator stream (``swish_parse_fh``, reference:
parser.c:2050-2216) is an unbounded sequence of framed documents
processed one at a time with per-document state only — no watermarks or
cross-document windows are needed. The Spark mapping is therefore the
simplest possible streaming topology: ``readStream`` over the docs
table (file source here; Kafka/Iceberg in production), the same narrow
``extract`` transformation per micro-batch, checkpointed sink — restart
resumes from the last committed batch for exactly-once file output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from libswish3_spark.config import SwishConfig
from libswish3_spark.pipeline import DOCS_FULL_SCHEMA, extract


def read_docs_stream(
    spark: SparkSession,
    input_path: str,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-source stream of docs rows (one parquet file = one batch unit)."""
    return (
        spark.readStream.schema(DOCS_FULL_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def extract_stream(
    docs_stream: DataFrame,
    config: SwishConfig | None = None,
) -> DataFrame:
    """The same narrow extraction, applied per micro-batch."""
    return extract(docs_stream, config=config)


def start_extraction_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    config: SwishConfig | None = None,
    once: bool = True,
):
    """Run the streaming pipeline; ``once=True`` drains what's available
    and stops (the batch-catchup mode; cron-able). Restart with the same
    checkpoint resumes exactly where the last run committed."""
    out = extract_stream(read_docs_stream(spark, input_path), config)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
