"""libswish3_spark — a PySpark-native document extraction engine.

A from-scratch reimplementation of the *semantics* of karpet/libswish3
(the Swish3 document-parsing C library) as an idiomatic Spark pipeline:

* input: tables of interleaved text + media documents
  ``docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
* output: ``extracted(doc_id, spans array<struct<kind,text,media_ref,order>>,
  metanames map<string,string>, properties map<string,string>, nwords, ...)``

The reference's libxml2 SAX callbacks (reference: src/libswish3/parser.c)
are replaced by a batched byte-stream markup scanner + DOM-heuristic
classifier running inside ``mapInPandas`` over Arrow batches; the
tokenizer (reference: src/libswish3/tokenizer.c) is re-expressed with
precompiled Unicode character-class regexes, vectorized per batch.

Nothing here is a code port: the reference is consulted only for
behavioral parity (word-boundary rules, metaname/property bucketing,
token positions), verified against the counts published in its own
test suite (reference: src/t/001-wordcount.t).
"""

from libswish3_spark.config import SwishConfig, default_config, load_config_xml
from libswish3_spark.parser import parse_document
from libswish3_spark.pipeline import (
    DOCS_SCHEMA,
    EXTRACTED_SCHEMA,
    extract,
    extraction_metrics,
    reconcile_actions,
    salt_by_size,
)

__all__ = [
    "SwishConfig",
    "default_config",
    "load_config_xml",
    "parse_document",
    "extract",
    "extraction_metrics",
    "reconcile_actions",
    "salt_by_size",
    "DOCS_SCHEMA",
    "EXTRACTED_SCHEMA",
]

__version__ = "0.1.0"
