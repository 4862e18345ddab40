"""PDF text extraction (opt-in parser type ``PDF``).

The reference has no PDF parser: ``application/pdf`` falls through to
the default parser (HTML — config.c:350, libswish3.h:69), so a .pdf
indexed by the reference yields whatever survives an HTML parse of
binary bytes (its own test corpus ships no real PDF; ``empty.pdf`` is a
framed-stream fixture). This module is the *beyond-the-reference*
extraction path a training-data pipeline needs: a dependency-free text
extractor for the (large) class of PDFs whose content streams are
uncompressed or FlateDecode-compressed — zlib is stdlib, so the whole
path runs inside the normal Arrow ingest kernel with no new packages.

Scope, explicitly:

* **Supported**: linear scan of ``stream``/``endstream`` blocks; raw
  and ``/FlateDecode`` streams (predictors unsupported — rare for
  *content* streams, common only for xref streams which carry no text);
  text-showing operators ``Tj``, ``'``, ``"``, ``TJ``; literal strings
  with octal/char escapes and balanced parens; hex strings; UTF-16BE
  strings (BOM-detected, per PDF 32000-1 §7.9.2.2) with PDFDocEncoding
  fallback; line structure from ``Td``/``TD``/``T*`` and ``ET``.
* **Not supported** (documented, not silent: unsupported filters are
  counted in the return): LZW/DCT/CCITT/JBIG2 filters, CID/Type0 fonts
  with ToUnicode CMaps, encrypted files. Rows whose PDFs hit those
  decode as empty text with an error note, the same contract as
  ``sources.files._decode`` for undecodable bytes.

Spark-side wiring: ``config.with_overrides(parsers={...,
"application/pdf": "PDF"})`` routes .pdf docs here at ingest
(sources/files.ingest_bytes); extraction then treats the recovered text
exactly like a TXT document (title-from-path, swishdefault bucketing),
so every downstream operator — tokenize, postings, dedup, quality —
works on PDFs unchanged. Binary payload stays out of the scrub path
(NUL scrub would corrupt Flate streams).
"""

from __future__ import annotations

import re
import zlib

# stream blocks: the dict immediately before `stream` declares filters.
# PDF EOL before stream data is CRLF or LF (ISO 32000-1 §7.3.8.1).
_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_FILTER_RE = re.compile(rb"/Filter\s*(?:\[([^\]]*)\]|/(\w+))")
_NAME_RE = re.compile(rb"/(\w+)")

# content-stream tokens we care about; everything else is skipped.
# strings are pre-matched so operator scanning never looks inside them.
_TOKEN_RE = re.compile(
    rb"""
      \((?P<lit>(?:\\.|[^\\()])*(?:\((?:\\.|[^\\()])*\)(?:\\.|[^\\()])*)*)\)
    | <(?P<hex>[0-9A-Fa-f\s]*)>
    | \[(?P<arr>(?:\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|[^\]])*)\]\s*TJ
    | (?P<op>T[jdD*]|'|"|ET|BT)
    """,
    re.S | re.X,
)

_ESC = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}

_ESC_RE = re.compile(rb"\\(\d{1,3}|\r\n|\n|\r|.)")


def _unescape_literal(raw: bytes) -> bytes:
    """PDF literal-string escapes (§7.3.4.2): named escapes, 1-3 digit
    octal, and line continuations (backslash-EOL vanishes)."""

    def sub(m: re.Match) -> bytes:
        e = m.group(1)
        if e.isdigit():
            return bytes([int(e, 8) & 0xFF])
        if e in (b"\r\n", b"\r", b"\n"):
            return b""
        return _ESC.get(e, e)

    return _ESC_RE.sub(sub, raw)


def _decode_string(raw: bytes) -> str:
    """PDF string bytes → str: UTF-16BE when BOM'd, else latin-1 (the
    printable range of PDFDocEncoding matches Latin-1 for the code
    points simple fonts emit)."""
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be", errors="replace")
        except Exception:
            return raw[2:].decode("latin-1")
    return raw.decode("latin-1")


def _hex_bytes(h: bytes) -> bytes:
    h = re.sub(rb"\s+", b"", h)
    if len(h) % 2:
        h += b"0"  # §7.3.4.3: odd final digit implies trailing 0
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _stream_text(content: bytes) -> list[str]:
    """Text lines of one content stream, in stream order."""
    lines: list[str] = []
    cur: list[str] = []

    def endline():
        if cur:
            line = "".join(cur).strip()
            if line:
                lines.append(line)
            cur.clear()

    pending: str | None = None  # string awaiting its operator
    for m in _TOKEN_RE.finditer(content):
        if m.group("lit") is not None:
            pending = _decode_string(_unescape_literal(m.group("lit")))
        elif m.group("hex") is not None:
            pending = _decode_string(_hex_bytes(m.group("hex")))
        elif m.group("arr") is not None:
            # TJ: concatenate the array's strings; kerning numbers are
            # layout, not characters
            parts = []
            for sm in re.finditer(
                rb"\((?P<lit>(?:\\.|[^\\()])*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>",
                m.group("arr"),
            ):
                if sm.group("lit") is not None:
                    parts.append(_decode_string(_unescape_literal(sm.group("lit"))))
                else:
                    parts.append(_decode_string(_hex_bytes(sm.group("hex"))))
            cur.append("".join(parts))
            pending = None
        else:
            op = m.group("op")
            if op == b"Tj":
                if pending is not None:
                    cur.append(pending)
                    pending = None
            elif op in (b"'", b'"'):
                # §9.4.3: ' and " move to next line, then show
                endline()
                if pending is not None:
                    cur.append(pending)
                    pending = None
            elif op in (b"Td", b"TD", b"T*", b"ET"):
                endline()
    endline()
    return lines


def pdf_text(data: bytes) -> tuple[str, int, int]:
    """Extract text from PDF bytes.

    Returns ``(text, n_streams_read, n_streams_unsupported)`` — the
    unsupported count is the no-silent-caps contract: a caller (or
    metrics sink) can see when a document's content was only partially
    decodable rather than inferring emptiness meant empty.
    """
    if not data.startswith(b"%PDF"):
        return "", 0, 0
    lines: list[str] = []
    read = skipped = 0
    for m in _STREAM_RE.finditer(data):
        params, body = m.group(1), m.group(2)
        fm = _FILTER_RE.search(params)
        if fm:
            # group(2) (single /Name form) already excludes the slash;
            # group(1) (array form) still carries /-prefixed names
            names = (
                [fm.group(2)]
                if fm.group(2)
                else _NAME_RE.findall(fm.group(1) or b"")
            )
            if names == [b"FlateDecode"]:
                try:
                    body = zlib.decompress(body)
                except zlib.error:
                    skipped += 1
                    continue
            else:
                skipped += 1  # LZW/DCT/... — images or exotic encodings
                continue
        # only text-bearing content streams contribute
        if b"BT" not in body and b"Tj" not in body and b"TJ" not in body:
            continue
        read += 1
        lines.extend(_stream_text(body))
    return "\n".join(lines), read, skipped
