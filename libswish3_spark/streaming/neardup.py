"""Streaming near-dup detection against the STORED corpus index.

The ingest-time twin of the batch minhash chain: each arriving
document's band buckets are computed WITHIN the row (stateless — the
same `functions.dedup.band_buckets` fold the batch path uses) and
joined against the STATIC stored bucket index
(operators/signatures.py). Spark executes the stream-static join
without any streaming state: the static side is just re-planned per
micro-batch, so the operator survives restarts for free and its cost
per batch is (batch buckets) ⋈ (index) — at 100 TB, a bucket-bucketed
index makes that a co-located lookup, not a scan.

Output rows ``(doc_id, matched_id, bucket)`` are CANDIDATES of new docs
against already-indexed content — the signal an ingest pipeline uses to
drop near-duplicates before they land. A pair sharing k band buckets
appears k times (per-batch `dropDuplicates` in the sink, or the
downstream exact verification, collapses them — a global streaming
`distinct` would accumulate unbounded state for no benefit).
Exact verification (`jaccard_verify`) composes downstream exactly as in
the batch chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from libswish3_spark.functions.dedup import band_buckets
from libswish3_spark.functions.text import tokens
from libswish3_spark.functions.dedup import shingles


def stream_band_buckets(docs: DataFrame) -> DataFrame:
    """docs stream (doc_id, spans) → exploded (id, bucket) rows.

    Stateless per-row fold + explode — no watermark, no state store.
    Batch invocations get the same exchange barrier `doc_band_buckets`
    uses (without it ColumnPruning inlines the hash chain into
    Generate's interpreted eval, ~3× the projection); per-micro-batch
    volumes are small enough that the stream path skips it.
    """
    text = F.element_at("spans", 1)["text"]
    packed = docs.select(
        F.col("doc_id").alias("id"),
        band_buckets(shingles(tokens(text))).alias("bks"),
    )
    if not docs.isStreaming:
        packed = packed.repartition("id")
    # outer + null filter: a plain explode's inferred size()>0 predicate
    # sinks the signature chain into the scan (see doc_band_buckets)
    return packed.select("id", F.explode_outer("bks").alias("bucket")).where(
        F.col("bucket").isNotNull()
    )


def near_dup_stream(
    docs_stream: DataFrame, bucket_index: DataFrame
) -> DataFrame:
    """Arriving docs ⋈ stored index → (doc_id, matched_id, bucket).

    ``bucket_index`` is the materialized (id, bucket) table — pass the
    parquet/Iceberg reader, already hot-bucket-capped at build time if
    cap semantics are wanted (applying the cap here would re-aggregate
    the static side every micro-batch).
    """
    idx = bucket_index.select(
        F.col("id").alias("matched_id"), F.col("bucket").alias("bucket")
    )
    mine = stream_band_buckets(docs_stream)
    return (
        mine.join(idx, "bucket")
        .where(F.col("id") != F.col("matched_id"))
        .select(F.col("id").alias("doc_id"), "matched_id", "bucket")
    )
