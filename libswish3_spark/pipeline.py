"""Spark pipeline: docs → extracted, designed for 10^12-document scale.

Physical plan (see SURVEY.md §3.4):

    scan(docs)                         — Iceberg/parquet, column-pruned to
                                         the columns the parser needs
      → optional skew repartition      — hash(doc_id) + salt for mega-docs
      → mapInPandas(extract_batch)     — P1-P12 + T1-T9 per Arrow batch,
                                         narrow (zero shuffle)
      → sink append + metrics          — per-partition lineage counters

The whole extraction is a narrow map: Catalyst prunes and pushes down
around it, AQE handles post-shuffle sizing for downstream aggs, and the
only state per task is one document's parse state. Arrow batch size is
the memory bound (``spark.sql.execution.arrow.maxRecordsPerBatch``).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from libswish3_spark.config import SwishConfig, default_config

# --- schemas (BASELINE.json input_hint: authoritative input shape) ---------
SPAN_IN = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)
DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_IN)),
    ]
)
# docs + optional header/docinfo metadata columns (FIXTURES.md §1)
DOCS_FULL_SCHEMA = StructType(
    DOCS_SCHEMA.fields
    + [
        StructField("mime", StringType()),
        StructField("parser", StringType()),
        StructField("encoding", StringType()),
        StructField("size", LongType()),
        StructField("error", StringType()),
    ]
)

SPAN_OUT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("order", IntegerType()),
    ]
)
EXTRACTED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_OUT)),
        StructField("metanames", MapType(StringType(), StringType())),
        StructField("properties", MapType(StringType(), StringType())),
        StructField("nwords", LongType()),
        StructField("parser", StringType()),
        StructField("error", StringType()),
    ]
)

_EXTRACT_COLS = ["doc_id", "spans", "parser", "mime", "error"]


def extract_batch_fn(config: SwishConfig, include_map: dict | None = None):
    """Build the mapInPandas function (config captured by closure —
    Spark pickles it into the task, the moral equivalent of a broadcast
    for this small object; pass ``include_map`` for XInclude joins)."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from libswish3_spark.parser import make_include_resolver, parse_document

        resolver = make_include_resolver(include_map) if include_map else None
        for pdf in batches:
            has_parser = "parser" in pdf.columns
            has_mime = "mime" in pdf.columns
            has_error = "error" in pdf.columns
            out = []
            for i in range(len(pdf)):
                row = pdf.iloc[i]
                out.append(
                    parse_document(
                        row["doc_id"],
                        row["spans"] if row["spans"] is not None else [],
                        parser=row["parser"] if has_parser else None,
                        mime=row["mime"] if has_mime else None,
                        config=config,
                        include_resolver=resolver,
                        error=row["error"] if has_error else None,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "spans",
                    "metanames",
                    "properties",
                    "nwords",
                    "parser",
                    "error",
                ],
            )

    return fn


def extract(
    docs: DataFrame,
    config: SwishConfig | None = None,
    include_map: dict | None = None,
    salt_partitions: int | None = None,
) -> DataFrame:
    """The extraction pipeline: ``docs`` → ``extracted``.

    Narrow by construction — no shuffle unless ``salt_partitions`` is
    set, in which case documents are redistributed by
    ``hash(doc_id) + size-salt`` so mega-documents (the skew unit, cf.
    the reference's 100 MB guard libswish3.h:177) spread across tasks
    instead of pinning one executor.
    """
    cfg = config or default_config()
    cols = [c for c in _EXTRACT_COLS if c in docs.columns]
    pruned = docs.select(*cols)  # column pruning reaches the scan
    if salt_partitions:
        pruned = salt_by_size(pruned, salt_partitions)
    return pruned.mapInPandas(
        extract_batch_fn(cfg, include_map), schema=EXTRACTED_SCHEMA
    )


def salt_by_size(docs: DataFrame, num_partitions: int) -> DataFrame:
    """Skew-aware redistribution for mega-documents.

    Size class = total text length of the span array (computed without
    leaving the JVM). Docs are ranged by size class so each partition
    gets a mix of big and small documents; within a class, hash(doc_id)
    salts placement. At 100 TB this is the difference between p50 and
    p99 task time being 100× apart or ~flat.
    """
    sized = docs.withColumn(
        "_sz",
        F.aggregate(
            "spans", F.lit(0), lambda acc, s: acc + F.length(s["text"])
        ),
    ).withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(num_partitions)))
    return (
        sized.repartitionByRange(num_partitions, F.col("_sz") % num_partitions, "_salt")
        .drop("_sz", "_salt")
    )


def extraction_metrics(extracted: DataFrame) -> DataFrame:
    """Per-partition lineage + counter metrics (A4; reference:
    swish_lint.c:50,152 files/twords counters).

    One partial-aggregated pass; written alongside the output table so a
    resume can reconcile what each partition produced.
    """
    return (
        extracted.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("docs"),
            F.sum("nwords").alias("words"),
            F.sum(F.size("spans")).alias("spans"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
        )
    )


def totals(extracted: DataFrame) -> DataFrame:
    """Run totals (reference: swish_lint.c:268-345 'total words')."""
    return extracted.agg(
        F.count("*").alias("files"), F.sum("nwords").alias("total_words")
    )
