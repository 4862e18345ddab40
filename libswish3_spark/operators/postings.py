"""Index-sink postings (S9): the contract a downstream indexer needs.

The reference's Xapian consumer builds index documents from tokens with
(value, metaname, pos) and properties with (id, typed value)
(reference: src/xapian/swish_xapian.cpp:416-561). This operator emits
exactly that shape as a DataFrame — one posting row per token — so any
indexer (or an Iceberg-backed inverted-index build) can consume the
extraction output without re-parsing.

Narrow mapInArrow like the extraction itself; the output fan-out (one
row per token) is the only volume change, so partition sizing should
target token counts, not document counts.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from libswish3_spark.config import SwishConfig, default_config

POSTINGS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("term", StringType()),
        StructField("pos", IntegerType()),
        StructField("metaname", StringType()),
        StructField("context", StringType()),
        # T8: byte offset into the doc's shared token buffer and token
        # byte length (reference: swish_token_list_add_token
        # tokenizer.c:384-386 — offset = buffer length so far, len
        # excludes the NUL, each stored token advances len+1)
        StructField("offset", IntegerType()),
        StructField("len", IntegerType()),
    ]
)


def postings_batch_fn(config: SwishConfig, include_map: dict | None = None):
    def fn(batches) -> Iterator:
        import pyarrow as pa

        from libswish3_spark.parser import (
            make_include_resolver,
            parse_to_state,
        )
        from libswish3_spark.pipeline import _guess_parser_cached

        cfg = config or default_config()
        base_resolver = make_include_resolver(include_map) if include_map else None
        out_schema = pa.schema(
            [
                ("doc_id", pa.string()),
                ("term", pa.string()),
                ("pos", pa.int32()),
                ("metaname", pa.string()),
                ("context", pa.string()),
                ("offset", pa.int32()),
                ("len", pa.int32()),
            ]
        )
        for batch in batches:
            names = set(batch.schema.names)
            n = batch.num_rows
            doc_ids = batch.column("doc_id").to_pylist()
            spans_in = batch.column("spans").to_pylist()
            parsers = (
                batch.column("parser").to_pylist() if "parser" in names else [None] * n
            )
            mimes = batch.column("mime").to_pylist() if "mime" in names else [None] * n
            errors = (
                batch.column("error").to_pylist() if "error" in names else [None] * n
            )
            includes = (
                batch.column("includes").to_pylist()
                if "includes" in names
                else [None] * n
            )
            o_doc, o_term, o_pos, o_meta, o_ctx = [], [], [], [], []
            o_off, o_len = [], []
            for i in range(n):
                if errors[i]:
                    continue  # ingest failure: no postings (parser.c:2505)
                # parser resolution identical to the extraction kernel
                # (pipeline.extract_batch_fn), including the memoized
                # ext lookup — this kernel has the highest fan-out in
                # the project (one output row per token)
                parser = parsers[i]
                if parser is None:
                    parser = (
                        cfg.parser_for_mime(mimes[i])
                        if mimes[i]
                        else _guess_parser_cached(doc_ids[i], cfg)
                    )
                parser = (parser or "HTML").upper()
                resolver = base_resolver
                if includes[i]:
                    resolver = make_include_resolver(dict(includes[i]))
                st = parse_to_state(
                    doc_ids[i],
                    spans_in[i] or [],
                    parser,
                    cfg,
                    include_resolver=resolver,
                    keep_token_meta=True,
                )
                if st.error:
                    # mid-parse failure: emit nothing — an indexer must not
                    # index a doc the extraction marks as errored
                    continue
                # mega-doc TXTSEG rows carry their global position offset
                # in the doc_id tail — the same shift the extraction
                # kernel applies (pipeline.py), so postings positions
                # join consistently against extracted span orders
                # instead of restarting at 1 per segment
                pos_off = 0
                if parser == "TXTSEG" and "\x02" in doc_ids[i]:
                    try:
                        pos_off = int(doc_ids[i].rsplit("\x02", 2)[1])
                    except (ValueError, IndexError):
                        pos_off = 0
                words = [s for s in st.spans if s[0] == "word"]
                buf_off = 0  # per-doc shared-buffer write position
                for (_, term, _, pos), (meta, ctx) in zip(words, st.token_meta):
                    o_doc.append(doc_ids[i])
                    o_term.append(term)
                    o_pos.append(pos + pos_off)
                    o_meta.append(meta)
                    o_ctx.append(ctx)
                    blen = len(term.encode("utf-8"))
                    o_off.append(buf_off)
                    o_len.append(blen)
                    buf_off += blen + 1  # +1: the stored NUL
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_doc, pa.string()),
                    pa.array(o_term, pa.string()),
                    pa.array(o_pos, pa.int32()),
                    pa.array(o_meta, pa.string()),
                    pa.array(o_ctx, pa.string()),
                    pa.array(o_off, pa.int32()),
                    pa.array(o_len, pa.int32()),
                ],
                schema=out_schema,
            )

    return fn


def extract_index_postings(
    docs: DataFrame,
    config: SwishConfig | None = None,
    include_map: dict | None = None,
) -> DataFrame:
    cols = [
        c
        for c in ("doc_id", "spans", "parser", "mime", "error", "includes")
        if c in docs.columns
    ]
    return docs.select(*cols).mapInArrow(
        postings_batch_fn(config or default_config(), include_map),
        schema=POSTINGS_SCHEMA,
    )
