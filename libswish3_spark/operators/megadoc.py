"""Mega-document segmentation: intra-document parallelism for TXT.

``salt_by_size`` spreads big documents across tasks, but a single
multi-GB text document still parses on one core (the skew unit the
reference guards with its 100 MB cap, libswish3.h:177). For plain-text
payloads the parse is segmentable: token positions are a prefix sum, so
segments can tokenize independently and reassemble order-preserving:

    Arrow kernel: slice at whitespace near seg_chars boundaries
      → repartition  →  extract() per segment (narrow, parallel)
      → window prefix-sum of per-segment token counts
      → shift each segment's span orders by its offset
      → (optional) groupBy(doc) sorted-flatten + title-from-path tail

Markup documents cannot be split blindly (a segment boundary inside a
tag breaks the state machine), so this path is TXT-only by design; the
markup analogue would segment at parser-visible boundaries (e.g.
top-level block elements), which is future work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from libswish3_spark.functions.text import TOKEN_PATTERN
from libswish3_spark.pipeline import extract

_SEG_SEP = "\x02"  # rides inside doc_id through the fixed kernel schema


def _segment_kernel(seg_chars: int):
    def fn(batches):
        import pyarrow as pa

        from libswish3_spark.tokenizer import count_positions

        out_schema = pa.schema(
            [("doc_id", pa.string()), ("seg_text", pa.string())]
        )
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            o_id, o_txt = [], []
            for doc_id, text in zip(doc_ids, texts):
                text = text or ""
                segs: list[str] = []
                start = 0
                n = len(text)
                while n - start > seg_chars:
                    # cut at the next whitespace after the target so no
                    # token straddles a boundary
                    cut = start + seg_chars
                    while cut < n and not text[cut].isspace():
                        cut += 1
                    segs.append(text[start:cut])
                    start = cut
                segs.append(text[start:])
                # prefix-sum computed HERE, where the doc is whole — no
                # cluster-wide window over the span payload later.
                # count_positions end-pos includes bumper gaps, so
                # segment-local positions + offset == global positions,
                # and the doc total seeds the title tail exactly where the
                # unsegmented position counter would sit. Count-only: the
                # full tokenize happens exactly once, in extract().
                offsets = []
                pos = 0
                for seg in segs:
                    offsets.append(pos)
                    pos += count_positions(seg)
                for idx, seg in enumerate(segs):
                    o_id.append(
                        f"{doc_id}{_SEG_SEP}{idx}{_SEG_SEP}{offsets[idx]}{_SEG_SEP}{pos}"
                    )
                    o_txt.append(seg)
            yield pa.RecordBatch.from_arrays(
                [pa.array(o_id, pa.string()), pa.array(o_txt, pa.string())],
                schema=out_schema,
            )

    return fn


def segment_text_docs(docs: DataFrame, seg_chars: int = 1 << 20) -> DataFrame:
    """docs(doc_id, spans[single text span]) → one row per segment.

    Segmentation runs in an Arrow kernel (O(length) string slicing at
    whitespace boundaries) — JVM array formulations re-evaluate the
    word split per segment, which is quadratic on mega-documents.
    """
    base = docs.select(
        "doc_id", F.element_at("spans", 1)["text"].alias("text")
    )
    seg = base.mapInArrow(
        _segment_kernel(seg_chars), schema="doc_id string, seg_text string"
    )
    return seg.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("seg_text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
        F.lit("TXTSEG").alias("parser"),  # TXT semantics, no title-from-path
    )


def extract_txt_segmented_rows(
    docs: DataFrame, config=None, seg_chars: int = 1 << 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """The scalable form: one output row per segment with *globally
    correct* span orders (window prefix-sum of per-segment counts).

    This is the shape to keep at scale — a 10^9-token document stays
    exploded, and the span payload never shuffles: the position offset
    of every segment is precomputed by the segmentation kernel (which
    sees the document whole), rides inside the segment doc_id, and the
    global shift is a narrow per-row transform. Segments are
    hash-redistributed before extraction (mapInArrow keeps children in
    the parent's partition, which would serialize the very document we
    segmented to parallelize).
    """
    seg = segment_text_docs(docs, seg_chars)
    sc = docs.sparkSession.sparkContext
    seg = seg.repartition(num_partitions or sc.defaultParallelism * 2, "doc_id")
    # the extraction kernel applies the offset at span-append time (it
    # reads the doc_id tail for TXTSEG), so orders arrive global already.
    # The two kernel-appended fields are parsed from the RIGHT so a
    # doc_id that itself contains the separator stays intact.
    seg_out = extract(seg, config=config)
    parts = F.split("doc_id", _SEG_SEP)
    return seg_out.select(
        F.array_join(F.slice(parts, 1, F.size(parts) - 3), _SEG_SEP).alias("orig_id"),
        F.element_at(parts, -3).cast("int").alias("seg_idx"),
        F.element_at(parts, -1).cast("int").alias("doc_end_pos"),
        "nwords",
        "spans",
    )


def segmented_nwords(docs: DataFrame, config=None, seg_chars: int = 1 << 20) -> DataFrame:
    """doc_id → nwords via the segmented path (counts only — no span
    payload ever shuffles). Includes the title-from-path tokens."""
    rows = extract_txt_segmented_rows(docs, config, seg_chars)
    title_toks = F.regexp_extract_all(F.lower("doc_id"), F.lit(TOKEN_PATTERN), 0)
    return (
        rows.groupBy(F.col("orig_id").alias("doc_id"))
        .agg(F.sum("nwords").alias("body_words"))
        .select(
            "doc_id",
            (F.col("body_words") + F.size(title_toks)).cast("long").alias("nwords"),
        )
    )


def extract_txt_segmented(
    docs: DataFrame, config=None, seg_chars: int = 1 << 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Full reassembly into one row per document, matching the plain TXT
    extraction exactly (same tokens, positions, title tail, nwords).

    NOTE: materializing one document's full span array in a single row
    is only sane for parity checks and modest documents — the terminal
    groupBy funnels every span of a document through one reducer. At
    scale use :func:`extract_txt_segmented_rows` (exploded, no funnel).
    """
    shifted = extract_txt_segmented_rows(
        docs, config, seg_chars, num_partitions
    )
    body = shifted.groupBy(F.col("orig_id").alias("doc_id")).agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("seg_idx").alias("i"), "spans"))
                ),
                lambda e: e["spans"],
            )
        ).alias("spans"),
        F.sum("nwords").alias("body_words"),
        F.max("doc_end_pos").alias("doc_end_pos"),
    )
    # title-from-path tail (TXT semantics, parser.c:2690-2699). ASCII token
    # pattern matches the engine tokenizer for path-like doc_ids. Title
    # positions continue from the document's END POSITION (which includes
    # bumper gaps), exactly like the unsegmented position counter.
    title_toks = F.regexp_extract_all(F.lower("doc_id"), F.lit(TOKEN_PATTERN), 0)
    title_spans = F.zip_with(
        title_toks,
        F.sequence(F.lit(1), F.greatest(F.size(title_toks), F.lit(1))),
        lambda t, i: F.struct(
            F.lit("word").alias("kind"),
            t.alias("text"),
            F.lit("").alias("media_ref"),
            (F.col("doc_end_pos") + i).cast("int").alias("order"),
        ),
    )
    return body.select(
        "doc_id",
        F.concat("spans", F.when(F.size(title_toks) > 0, title_spans).otherwise(
            F.array().cast("array<struct<kind:string,text:string,media_ref:string,order:int>>")
        )).alias("spans"),
        (F.col("body_words") + F.size(title_toks)).cast("long").alias("nwords"),
    )
