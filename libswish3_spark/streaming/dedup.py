"""Stateful streaming dedup: first-seen-fingerprint filter.

The training-pipeline twin of batch exact dedup for a continuously
ingested corpus: per content fingerprint (md5 of lowercased text, the
same key ``functions.dedup.exact_duplicates`` groups on), the FIRST
arrival is emitted and every later duplicate is dropped — including
duplicates that arrive after a restart, because the seen-set lives in
the streaming checkpoint, not in memory.

Batch twin: ``keep_first`` below (oracle-checked as the
``dedup_keep_first`` query) — keeper = arg-min by arrival ``seq`` per
fingerprint, which is exactly what the stream emits when replayed in
order.

At scale: state is hash-partitioned by fingerprint across executors;
each micro-batch touches only the fingerprints it contains, and the
state row is a single boolean-shaped marker (the keeper id) per unique
document ever seen — the minimal seen-set a streaming dedup can carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

from libswish3_spark.functions.text import fingerprint

DEDUP_EMIT_SCHEMA = StructType(
    [
        StructField("fp", StringType()),
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
    ]
)

_SEEN_SCHEMA = StructType([StructField("keeper", StringType())])


def _keep_first(key, pdf_iter, state: GroupState):
    import pandas as pd

    (fp,) = key
    if state.exists:
        # fingerprint already admitted in a previous batch/run: drain
        # and drop (the checkpointed seen-set is the dedup contract)
        for _ in pdf_iter:
            pass
        yield pd.DataFrame({"fp": [], "doc_id": [], "text": []})
        return
    # within-batch keeper = min over (seq, doc_id) — the SAME two-field
    # ordering the batch twin keep_first uses (min_by struct(seq,
    # doc_id)), so equal/missing-seq ties resolve identically instead
    # of by pandas iteration order (which varies with partitioning and
    # task retries)
    first_key = first_doc = first_text = None
    for pdf in pdf_iter:
        for doc_id, text, seq in zip(pdf["doc_id"], pdf["text"], pdf["seq"]):
            key = (0 if pd.isnull(seq) else int(seq), doc_id)
            if first_key is None or key < first_key:
                first_key, first_doc, first_text = key, doc_id, text
    state.update((first_doc,))
    yield pd.DataFrame({"fp": [fp], "doc_id": [first_doc], "text": [first_text]})


def _span_fingerprint_cols() -> list:
    """Projection shared by BOTH twins: the fingerprint covers the FULL
    span sequence (kind + text + media_ref per span, field- and
    span-delimited), not just ``spans[0].text`` — an earlier form
    fingerprinted only the first span's text, so every media-first or
    empty-spans document got a NULL fingerprint and ALL of them
    collapsed into one group where only the first ever survived
    (distinct image-only docs silently dropped, forever). ``text`` is
    the joined text-span content (what downstream consumes); NULL spans
    coalesce to the empty canon so truly content-less docs dedup among
    themselves."""
    canon = F.array_join(
        F.transform(
            "spans",
            lambda s: F.concat_ws(
                "\x01",
                s["kind"],
                F.coalesce(s["text"], F.lit("")),
                F.coalesce(s["media_ref"], F.lit("")),
            ),
        ),
        "\x02",
    )
    text = F.array_join(
        F.transform(
            F.filter("spans", lambda s: s["kind"] == F.lit("text")),
            lambda s: F.coalesce(s["text"], F.lit("")),
        ),
        " ",
    )
    return [
        fingerprint(F.coalesce(canon, F.lit(""))).alias("fp"),
        text.alias("text"),
    ]


def dedup_stream(docs: DataFrame) -> DataFrame:
    """docs stream (doc_id, spans[, seq]) → first-seen rows only.

    Output mode append-like (each fingerprint emits at most once,
    ever); downstream is the surviving corpus feed. ``seq`` (the
    stream frame index parse_framed_stream assigns) breaks ties within
    a micro-batch; across batches, batch order IS arrival order.
    """
    skinny = docs.select(
        "doc_id",
        *_span_fingerprint_cols(),
        (F.col("seq") if "seq" in docs.columns else F.lit(0)).alias("seq"),
    )
    return skinny.groupBy("fp").applyInPandasWithState(
        _keep_first,
        outputStructType=DEDUP_EMIT_SCHEMA,
        stateStructType=_SEEN_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def keep_first(docs: DataFrame) -> DataFrame:
    """Batch twin: per fingerprint, the row with the smallest arrival
    ``seq`` (falling back to doc_id order for equal/missing seq —
    deterministic either way). NULL seq coalesces to 0 — the identical
    key the streaming twin's ``_keep_first`` builds (``0 if
    pd.isnull(seq)``); without the coalesce, Spark struct ordering
    sorts NULL before 0, so a fingerprint holding both a null-seq and a
    seq=0 row would pick different keepers in the two paths."""
    skinny = docs.select(
        "doc_id",
        *_span_fingerprint_cols(),
        (
            F.coalesce(F.col("seq"), F.lit(0))
            if "seq" in docs.columns
            else F.lit(0)
        ).alias("seq"),
    )
    return (
        skinny.groupBy("fp")
        .agg(
            F.min_by(
                F.struct("doc_id", "text"), F.struct("seq", "doc_id")
            ).alias("r")
        )
        .select("fp", F.col("r.doc_id").alias("doc_id"), F.col("r.text").alias("text"))
    )
