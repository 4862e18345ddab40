"""Byte-level document ingest: S1/S2/S6/S7/D1/D2/D3/D5.

Turns raw document bytes into rows of the interleaved ``docs`` table.
Replicates the reference's slurp-side behaviors:

* gzip transparency      — reference: src/libswish3/io.c:155-196,
  detection docinfo.c:213-222
* NUL/bumper scrub       — io.c:43-72 (``\\0`` and ``\\x03`` → ``\\n``)
* MIME by extension      — mime_types.c:236-251
* parser by MIME         — mime_types.c:253-273, config.c:341-351
* encoding detection     — parser.c:2712-2759 (txt set_encoding,
  html latin-1 default parser.c:2572-2581, xml declaration)

At cluster scale the Spark path is ``spark.read.format("binaryFile")``
(recursive lookup = the reference's directory walker
parser.c:2355-2447, dot-file skip via ``pathGlobFilter``), followed by
``mapInPandas(ingest_batch)`` — decode is CPU-bound and embarrassingly
parallel, no shuffle.
"""

from __future__ import annotations

import gzip
import re

from libswish3_spark.config import LATIN1_ENCODING, SwishConfig, default_config
from libswish3_spark.events import WOUND_SENTINEL

_XML_DECL_ENC = re.compile(rb'<\?xml[^>]*encoding=["\']([^"\']+)["\']', re.I)
_HTML_META_CHARSET = re.compile(
    rb'<meta[^>]+charset\s*=\s*["\']?([A-Za-z0-9_\-]+)', re.I
)


def _scrub_nuls(data: bytes) -> bytes:
    # reference: io.c:43-72 — embedded NUL and \x03 become newlines
    if b"\x00" in data or b"\x03" in data:
        data = data.replace(b"\x00", b"\n").replace(b"\x03", b"\n")
    return data


def _is_gzip(data: bytes, uri: str) -> bool:
    return uri.lower().endswith(".gz") or data[:2] == b"\x1f\x8b"


def _valid_utf8(data: bytes) -> bool:
    try:
        data.decode("utf-8", errors="strict")
        return True
    except UnicodeDecodeError:
        return False


def ingest_bytes(
    data: bytes,
    uri: str,
    config: SwishConfig | None = None,
    declared_mime: str | None = None,
    declared_parser: str | None = None,
    declared_encoding: str | None = None,
    mtime: int | None = None,
    action: str | None = None,
    seq: int | None = None,
) -> dict:
    """One document's bytes → a ``docs`` row dict.

    Resolution order per ``swish_docinfo_check`` (reference:
    docinfo.c:123-199): declared header values win, then extension
    lookups; gz is stripped before extension resolution. ``mtime`` is
    epoch seconds (stream Last-Modified or filesystem stat — reference:
    docinfo.c:202-258); ``action`` is the stream's Action header
    (add|update|delete, parser.c:2002-2013), carried for the sink.
    """
    cfg = config or default_config()
    gzip_error: str | None = None
    if _is_gzip(data, uri):
        # corrupt/truncated/misnamed .gz must yield an ERROR ROW (the
        # module's contract — _decode does the same for undecodable
        # bytes), never an exception: one bad file in a 10^9-file crawl
        # would otherwise fail the Spark task 4x and abort the job
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError) as e:  # BadGzipFile is an OSError
            gzip_error = f"gzip decompress failed: {e}"
            data = b""
        uri_for_ext = uri[: -len(".gz")] if uri.lower().endswith(".gz") else uri
    else:
        uri_for_ext = uri

    ext = uri_for_ext.rsplit(".", 1)[-1].lower() if "." in uri_for_ext else ""
    mime = declared_mime or cfg.mime_for_ext(ext)
    parser = (declared_parser or cfg.parser_for_mime(mime)).upper()

    if parser == "PDF":
        # opt-in PDF text extraction (functions/pdf.py): operates on the
        # RAW bytes — the NUL scrub below would corrupt Flate streams —
        # and yields TXT-like text downstream (parse_to_state routes
        # parser="PDF" through the TXT path)
        from libswish3_spark.functions.pdf import pdf_text

        text, nread, nskip = pdf_text(data)
        encoding = "UTF-8"
        error = None
        if nskip and not text:
            error = f"pdf: {nskip} stream(s) with unsupported filters"
        text_len = len(data)
        if gzip_error is not None:
            text, error = "", gzip_error
        return {
            "doc_id": uri,
            "spans": [
                {"kind": "text", "text": text, "media_ref": "", "offset": 0}
            ],
            "mime": mime,
            "parser": parser,
            "encoding": encoding,
            "size": text_len,
            "mtime": mtime,
            "action": action,
            "seq": seq,
            "error": error,
        }

    data = _scrub_nuls(data)
    text, encoding, error = _decode(data, parser, declared_encoding, cfg)
    if gzip_error is not None:
        text, error = "", gzip_error

    row = {
        "doc_id": uri,
        "spans": [
            {"kind": "text", "text": text, "media_ref": "", "offset": 0}
        ],
        "mime": mime,
        "parser": parser,
        "encoding": encoding,
        "size": len(data),
        "mtime": mtime,
        "action": action,
        "seq": seq,
        "error": error,
    }
    return row


def _utf8_then_latin1(data: bytes) -> str:
    """Decode as UTF-8 until the first invalid byte, LATIN-1 from
    there on — libxml2's recovery for a lying utf-8 declaration
    (probed m1/m2/t5 vs the compiled reference: content before the
    bad byte keeps its multi-byte sequences, content after reads as
    latin-1 mojibake; HTML parses on without a wound)."""
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError as e:
        return data[: e.start].decode("utf-8") + data[e.start :].decode(
            "latin-1"
        )


def _scrub_sentinel(text: str) -> str:
    """Map a NATURAL U+E000 (a legal XML private-use char) to a space
    before the text reaches the XML parser: WOUND_SENTINEL is an
    in-band marker, so an unscrubbed occurrence would spuriously wound
    the parse (parser._consume_markup drops everything after it — the
    reference delivers all the text). A space, like U+E000 itself, is
    a token boundary to the reference tokenizer (iswpunct), so
    tokenization is unchanged in every adjacency case (a plain delete
    would fuse 'a\\ue000b' into one token); the one-char substitution
    in stored property text is the cost of in-band wound marking.
    Applied only on XML decode paths — HTML/TXT never read the marker."""
    if WOUND_SENTINEL in text:
        return text.replace(WOUND_SENTINEL, " ")
    return text


def _decode(
    data: bytes, parser: str, declared: str | None, cfg: SwishConfig
) -> tuple[str, str, str | None]:
    """Returns (text, encoding, error)."""
    declared_norm = (declared or "").replace("-", "").replace("_", "").lower()

    if parser.startswith("X"):
        # a UTF-8 BOM is stripped and selects UTF-8 (probes t3/t4)
        if data.startswith(b"\xef\xbb\xbf"):
            data = data[3:]
        m = _XML_DECL_ENC.search(data[:1024])
        enc = (m.group(1).decode("ascii", "ignore") if m else declared) or None
        if enc and enc.replace("-", "").replace("_", "").lower() in (
            "iso88591",
            "latin1",
        ):
            return data.decode("latin-1"), LATIN1_ENCODING, None
        if enc:
            try:
                return _scrub_sentinel(data.decode(enc)), enc.upper(), None
            except (LookupError, UnicodeDecodeError):
                pass
        if _valid_utf8(data):
            return _scrub_sentinel(data.decode("utf-8")), "UTF-8", None
        # invalid byte under an effective UTF-8 encoding: FATAL to a
        # libxml2 XML parse — text before the byte delivers, the rest
        # of that run drops, and the parse wounds (probes m4/m5/t1:
        # '<root>na\xefve <b>rest</b> more' indexes 'narest', 'more').
        # The sentinel carries the wound point to the parser; the
        # remainder reads as latin-1 so its markup keeps driving the
        # wound's silent depth bookkeeping.
        try:
            data.decode("utf-8")
        except UnicodeDecodeError as e:
            text = (
                _scrub_sentinel(data[: e.start].decode("utf-8"))
                + WOUND_SENTINEL
                + data[e.start :].decode("latin-1").replace(WOUND_SENTINEL, " ")
            )
            return text, "UTF-8", None

    if parser.startswith("H"):
        bom = data.startswith(b"\xef\xbb\xbf")
        if bom:
            data = data[3:]
        m = _HTML_META_CHARSET.search(data[:4096])
        enc = m.group(1).decode("ascii", "ignore").lower() if m else None
        if enc in ("utf-8", "utf8") or (bom and enc is None):
            # a lying utf-8 declaration switches to latin-1 at the
            # first invalid byte (no wound in HTML, probe t5); a BOM
            # with no meta selects utf-8 (probes c13/t6); a meta
            # OVERRIDES the BOM (probe m7)
            return _utf8_then_latin1(data), "UTF-8", None
        if enc:
            try:
                return data.decode(enc), enc.upper(), None
            except (LookupError, UnicodeDecodeError):
                pass
        # libxml2 HTML default is latin-1 (reference: parser.c:2572-2581)
        # but pure-ASCII and valid-UTF-8 bodies decode as UTF-8 identically
        # only for ASCII; prefer reference behavior: latin-1 unless declared.
        if data.isascii():
            return data.decode("ascii"), "UTF-8", None
        return data.decode("latin-1"), LATIN1_ENCODING, None

    # TXT: set_encoding (reference: parser.c:2712-2731)
    if _valid_utf8(data):
        return data.decode("utf-8"), "UTF-8", None
    env = declared or cfg.default_encoding
    if env.replace("-", "").replace("_", "").lower() in ("iso88591", "latin1"):
        # isolat1ToUTF8 transcode path (parser.c:2626-2642)
        return data.decode("latin-1"), LATIN1_ENCODING, None
    # undecodable under the default locale: the reference's UTF-8
    # tokenizer fails and the doc yields nothing (golden: latin1.txt → 0,
    # reference: src/t/001-wordcount.t:42)
    return "", env, "undecodable bytes under encoding " + env


def ingest_batches(iterator, config: SwishConfig):
    """mapInPandas adapter: batches of (path, content[, mtime_epoch])
    from ``binaryFile`` → ``docs`` rows. ``mtime_epoch`` (epoch seconds,
    computed JVM-side via unix_timestamp so no session-timezone shift)
    becomes the docinfo ``mtime``, like the reference's stat path
    (docinfo.c:202-258)."""
    import pandas as pd

    for pdf in iterator:
        if "mtime_epoch" in pdf.columns:
            mtimes = [
                None if pd.isnull(t) else int(t) for t in pdf["mtime_epoch"]
            ]
        else:
            mtimes = [None] * len(pdf)
        rows = [
            ingest_bytes(content, path, config, mtime=mt)
            for path, content, mt in zip(pdf["path"], pdf["content"], mtimes)
        ]
        yield pd.DataFrame(rows)


def read_directory(spark, path: str, config: SwishConfig | None = None, glob: str = "*"):
    """Directory scan → docs DataFrame (reference: parser.c:2355-2447).

    Dot-files are skipped like the reference's walker; symlink policy is
    delegated to the filesystem listing.
    """
    from pyspark.sql import functions as F

    from libswish3_spark.pipeline import DOCS_FULL_SCHEMA

    cfg = config or default_config()
    bin_df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            "path",
            "content",
            # epoch seconds computed JVM-side: timestamps are UTC
            # instants internally, so this is session-timezone-proof
            # (a pandas-side naive .timestamp() shifts by the tz offset)
            F.unix_timestamp("modificationTime").cast("long").alias("mtime_epoch"),
        )
        .where(~_dotfile_expr())
    )
    return bin_df.mapInPandas(
        lambda it: ingest_batches(it, cfg), schema=DOCS_FULL_SCHEMA
    )


def _dotfile_expr():
    from pyspark.sql import functions as F

    return F.element_at(F.split(F.col("path"), "/"), -1).startswith(".")


def parse_filelist(text: str) -> list[str]:
    """S5 filelist scan: one path per line, blank and ``#`` lines skipped
    (reference: swish_lint.c:295-343 + ``swish_io_is_skippable_line``)."""
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        out.append(line)
    return out


_GLOB_CHARS = re.compile(r"([*?\[\]{}])")


def read_filelist(
    spark, filelist_path: str, config: SwishConfig | None = None, strict: bool = False
):
    """Manifest-driven scan: the filelist becomes a DataFrame joined
    against a binaryFile load of its paths — at scale the manifest is a
    table and this is a semi-join pruning the scan.

    Manifest lines are literal paths: glob metacharacters are escaped
    before the load, and (unless ``strict``) missing files are warned
    and skipped like the reference's walker instead of failing the job.
    Caveat: Spark's leaf-file listing hides basenames starting with
    ``.`` or ``_`` even when explicitly listed — such entries are
    reported as skipped.
    """
    import os
    import sys

    from pyspark.sql import functions as F

    from libswish3_spark.pipeline import DOCS_FULL_SCHEMA

    cfg = config or default_config()
    with open(filelist_path) as f:
        raw_paths = parse_filelist(f.read())
    paths = []
    for p in raw_paths:
        base = os.path.basename(p)
        if base.startswith((".", "_")):
            print(
                f"{p}: skipped (Spark file listing hides '.'/'_' basenames)",
                file=sys.stderr,
            )
            continue
        if not strict and "://" not in p and not os.path.exists(p):
            print(f"{p}: error: file not found, skipping", file=sys.stderr)
            continue
        paths.append(_GLOB_CHARS.sub(r"\\\1", p))
    if not paths:
        return spark.createDataFrame([], schema=DOCS_FULL_SCHEMA)
    bin_df = (
        spark.read.format("binaryFile")
        .load(paths)
        .select(
            "path",
            "content",
            F.unix_timestamp("modificationTime").cast("long").alias("mtime_epoch"),
        )
    )
    return bin_df.mapInPandas(
        lambda it: ingest_batches(it, cfg), schema=DOCS_FULL_SCHEMA
    )
