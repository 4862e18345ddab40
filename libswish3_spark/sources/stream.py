"""Aggregator-stream source (S3/S4): the Swish-e ``-S prog`` protocol.

Parses the framed document stream the reference reads on stdin
(reference: src/libswish3/parser.c:2050-2216 ``swish_parse_fh``,
parser.c:1767-1846 ``buf_to_head``, parser.c:1848-2030
``head_to_docinfo``):

    Content-Length: <bytes>     (required)
    Content-Location: <uri>     (required)
    Content-Type: <mime>
    Parser-Type: <HTML|XML|TXT>
    Last-Modified: <time>
    Encoding|Charset: <enc>
    Action: <...>
    <blank line>
    <body of exactly Content-Length bytes>

Each framed doc becomes one ``docs`` row; header fields map to the
optional metadata columns. In production this shape arrives as rows of
an Iceberg/Kafka-backed table and is consumed with Structured Streaming
(see ``libswish3_spark.streaming``); this byte-parser exists for
protocol compatibility and tests.
"""

from __future__ import annotations

from libswish3_spark.config import SwishConfig, default_config
from libswish3_spark.sources.files import ingest_bytes

# The reference caps the header section at 6 LINES (libswish3.h:40,
# parser.c:1789 `while (j < SWISH_MAX_HEADERS ...)`) and silently stops
# reading there — but its own protocol defines 7 logical headers
# (Content-Length/-Location/-Type, Parser-Type, Last-Modified/Update,
# Encoding|Charset, Action), so a fully-headed frame would mis-parse.
# Documented deviation: accept every documented header (7 logical + 1
# slack for an Encoding AND Charset double) and count EVERY header
# line toward the cap — unrecognized lines included, so a malicious
# unbounded header section is still bounded (the point of the C cap).
MAX_HEADER_LINES = 8

_HEADER_ALIASES = {
    "content-length": "length",
    "content-location": "uri",
    "content-type": "mime",
    "parser-type": "parser",
    "last-modified": "mtime",
    "update": "mtime",
    "encoding": "encoding",
    "charset": "encoding",
    "action": "action",
}


def parse_framed_stream(data: bytes, config: SwishConfig | None = None) -> list[dict]:
    """Split a framed byte stream into ingested ``docs`` rows."""
    cfg = config or default_config()
    rows: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # collect header lines until blank line
        headers: dict[str, str] = {}
        nheaders = 0
        while pos < n:
            eol = data.find(b"\n", pos)
            if eol == -1:
                pos = n
                break
            line = data[pos:eol].strip()
            pos = eol + 1
            if not line:
                if headers:
                    break
                continue  # leading blank lines between docs
            key, _, val = line.partition(b":")
            k = key.decode("ascii", "ignore").strip().lower()
            nheaders += 1
            if nheaders > MAX_HEADER_LINES:
                raise ValueError("too many stream headers")  # parser.c:1789
            if k in _HEADER_ALIASES:
                headers[_HEADER_ALIASES[k]] = val.decode("utf-8", "ignore").strip()
        if not headers:
            break
        if "length" not in headers or "uri" not in headers:
            # parser.c:1906-1918: Content-Length and Content-Location required
            raise ValueError("stream doc missing Content-Length or Content-Location")
        length = int(headers["length"])
        body = data[pos : pos + length]
        pos += length
        # Last-Modified is an epoch-seconds integer in the protocol
        # (reference: parser.c:1888-1893 swish_string_to_int); a
        # malformed value warns and is dropped, it never fails the doc
        mtime: int | None = None
        if "mtime" in headers:
            try:
                mtime = int(headers["mtime"])
            except ValueError:
                import sys

                print(
                    f"Failed to parse Last-Modified header '{headers['mtime']}'",
                    file=sys.stderr,
                )
        row = ingest_bytes(
            body,
            headers["uri"],
            cfg,
            declared_mime=headers.get("mime"),
            declared_parser=headers.get("parser"),
            declared_encoding=headers.get("encoding"),
            mtime=mtime,
            # Action: add|update|delete rides to the sink
            # (reference: parser.c:2002-2013; see pipeline.reconcile_actions)
            action=headers.get("action"),
            # frame index: the deterministic equal-mtime tiebreak for
            # reconcile_actions/upsert (stream arrival order)
            seq=len(rows),
        )
        rows.append(row)
    return rows
