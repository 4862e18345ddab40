"""Stateful streaming upsert: the Action header applied continuously.

The aggregator protocol carries ``Action: add|update|delete`` per framed
doc (reference: parser.c:2002-2013); a Swish-e consumer applies these
against its index as the stream flows. The Spark-native form is a
keyed state machine over the docs stream: per doc_id, keep the latest
version (mtime, then arrival order) and emit the surviving row — or a
tombstone when the latest action is delete — each time the key changes.

Batch twin: ``pipeline.reconcile_actions`` (oracle-checked as the
``reconcile_actions`` query). State survives restarts through the
checkpoint, so a delete arriving after a crash still beats the add it
follows (tested in test_streaming_ops).

At scale: state is hash-partitioned by doc_id across executors (the
same key space the sink merges on), and each micro-batch touches only
the keys it contains — this is the Iceberg/Delta MERGE feed shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

UPSERT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("mtime", LongType()),
        StructField("action", StringType()),
        StructField("text", StringType()),
        StructField("alive", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("mtime", LongType()),
        StructField("seq", LongType()),
        StructField("action", StringType()),
        StructField("text", StringType()),
    ]
)


# null seq sorts AFTER every genuine seq value — the batch twin
# (pipeline.reconcile_actions) coalesces null seq to Long.MAX in its
# max_by key, so a (mtime, seq=null) row beats a (mtime, seq=k) row in
# BOTH engines; an earlier 0-coalesce here made the two twins resolve
# that tie in opposite directions.
_LONG_MAX = (1 << 63) - 1


def _upsert(key, pdf_iter, state: GroupState):
    import pandas as pd

    (doc_id,) = key
    best_key = None
    best_action = best_text = None
    if state.exists:
        mtime0, seq0, best_action, best_text = state.get
        best_key = (mtime0, seq0)
    for pdf in pdf_iter:
        for mtime, seq, action, text in zip(
            pdf["mtime"], pdf["seq"], pdf["action"], pdf["text"]
        ):
            # equal mtimes resolve by the frame seq (the same tiebreak
            # the batch twin's max_by(struct(mtime, _seq, ...)) uses) —
            # pandas iteration order after the groupBy shuffle is NOT
            # arrival order and varies across task retries, so a bare
            # ``m >= best`` could resurrect a deleted doc
            k = (
                0 if pd.isnull(mtime) else int(mtime),
                _LONG_MAX if pd.isnull(seq) else int(seq),
            )
            if best_key is None or k >= best_key:
                best_key = k
                best_action = (action or "add").lower()
                best_text = text
    state.update((best_key[0], best_key[1], best_action, best_text))
    best_mtime = best_key[0]
    yield pd.DataFrame(
        {
            "doc_id": [doc_id],
            "mtime": [best_mtime],
            "action": [best_action],
            "text": [best_text],
            "alive": [best_action != "delete"],
        }
    )


def upsert_stream(docs: DataFrame) -> DataFrame:
    """docs stream (doc_id, spans, mtime, action) → per-key latest rows.

    Output mode is update: each micro-batch re-emits the current
    surviving value of every key it touched (alive=False rows are the
    delete tombstones a MERGE sink consumes).
    """
    skinny = docs.select(
        "doc_id",
        F.coalesce(F.col("mtime"), F.lit(0)).alias("mtime"),
        (
            # null seq → Long.MAX: identical tie key to the batch twin's
            # reconcile_actions (see _LONG_MAX above)
            F.coalesce(F.col("seq"), F.lit(_LONG_MAX))
            if "seq" in docs.columns
            else F.lit(_LONG_MAX)
        ).cast("long").alias("seq"),
        F.coalesce(F.col("action"), F.lit("add")).alias("action"),
        F.element_at("spans", 1)["text"].alias("text"),
    )
    return skinny.groupBy("doc_id").applyInPandasWithState(
        _upsert,
        outputStructType=UPSERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
