"""Idempotent, resumable batch extraction.

The north rule requires 10^12-document runs to resume from checkpointed
partition manifests. Mechanism:

* documents are assigned a deterministic ``bucket = pmod(xxhash64(doc_id), B)``;
* each completed bucket appends its rows to the output (partitioned by
  bucket) and then records ``(bucket, docs, words, errors, run_id)`` in
  a manifest table — manifest write happens only *after* the bucket's
  data is durably written, so a crash can at worst leave a bucket's
  data present but unrecorded;
* resume = recompute the bucket set, anti-join against the manifest,
  process only the missing buckets, and rewrite those buckets' output
  directories (dynamic partition overwrite), which makes the data+
  manifest pair idempotent per bucket.

This is the batch analogue of Structured Streaming's checkpoint (see
``libswish3_spark.streaming``), usable where the input is a static
table rather than a stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from libswish3_spark.config import SwishConfig
from libswish3_spark.pipeline import extract


def with_bucket(docs: DataFrame, num_buckets: int) -> DataFrame:
    return docs.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)).cast("int")
    )


def completed_buckets(spark: SparkSession, manifest_path: str) -> set[int]:
    try:
        rows = spark.read.parquet(manifest_path).select("bucket").distinct().collect()
        return {r["bucket"] for r in rows}
    except Exception:
        return set()


def run_extraction(
    spark: SparkSession,
    docs: DataFrame,
    output_path: str,
    num_buckets: int = 16,
    config: SwishConfig | None = None,
    include_map: dict | None = None,
    run_id: str = "run0",
    buckets_per_pass: int | None = None,
) -> dict:
    """Checkpointed extraction: resumes where the manifest left off.

    Returns {"processed": [...buckets...], "skipped": [...]}.
    At cluster scale ``num_buckets`` is sized so one bucket ≈ one
    retry-able unit of work (e.g. 10k buckets over 10^12 docs).
    """
    manifest_path = os.path.join(output_path, "_manifest")
    data_path = os.path.join(output_path, "data")
    done = completed_buckets(spark, manifest_path)
    bucketed = with_bucket(docs, num_buckets)
    todo = [b for b in range(num_buckets) if b not in done]
    if buckets_per_pass:
        todo = todo[:buckets_per_pass]

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    processed = []
    for bucket in todo:
        part = bucketed.where(F.col("bucket") == bucket).drop("bucket")
        out = extract(part, config=config, include_map=include_map)
        out = out.withColumn("bucket", F.lit(bucket))
        # data first, manifest second: the commit point is the manifest row
        out.write.mode("overwrite").partitionBy("bucket").parquet(data_path)
        stats = out.agg(
            F.count("*").alias("docs"),
            F.coalesce(F.sum("nwords"), F.lit(0)).alias("words"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
        ).collect()[0]
        spark.createDataFrame(
            [(bucket, stats["docs"], stats["words"], stats["errors"], run_id)],
            "bucket int, docs long, words long, errors long, run_id string",
        ).write.mode("append").parquet(manifest_path)
        processed.append(bucket)
    return {"processed": processed, "skipped": sorted(done)}


def read_extracted(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_path, "data"))


def read_manifest(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_path, "_manifest"))
