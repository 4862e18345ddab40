"""Single-node convenience API mirroring the reference's bindings.

The reference's Perl bindings expose ``SWISH::3->new(config=>...)`` with
``parse_file`` / ``parse_buffer`` / ``parse_fh`` (reference:
bindings/perl/lib/SWISH/3.pm; C entry points parser.c:2302, 2240,
2050). ``Swish3`` is the drop-in equivalent for single-document and
small-batch use; the Spark pipeline (``libswish3_spark.pipeline``) is
the scale path over the same parser core.
"""

from __future__ import annotations

import io
import os

from libswish3_spark.config import SwishConfig, default_config, load_config_xml
from libswish3_spark.parser import make_include_resolver, parse_document
from libswish3_spark.sources.files import ingest_bytes
from libswish3_spark.sources.stream import parse_framed_stream


class Swish3:
    """swish_3 session equivalent (reference: libswish3.h:267-274)."""

    def __init__(self, config: SwishConfig | str | None = None):
        if isinstance(config, str):
            config = load_config_xml(config)
        self.config = config or default_config()

    # -- S1: swish_parse_file (parser.c:2302-2350) --------------------------
    def parse_file(self, path: str, encoding: str | None = None) -> dict:
        with open(path, "rb") as f:
            data = f.read()
        row = ingest_bytes(data, path, self.config, declared_encoding=encoding)
        return self._parse_row(row, include_base=os.path.dirname(path))

    # -- S4: swish_parse_buffer (parser.c:2240-2297) -------------------------
    def parse_buffer(self, buf: bytes | str, uri: str = "buffer") -> dict:
        if isinstance(buf, str):
            buf = buf.encode("utf-8")
        # framed header form accepted like the reference's parse_buffer.
        # The sniff requires the REQUIRED protocol headers before the
        # first blank line (LF or CRLF): a bare startswith(b'Content-')
        # swallowed ordinary prose beginning with the word 'Content-…'
        # (returned {}), and the old b'\n\n' probe missed CRLF frames,
        # indexing the protocol headers as body words instead.
        if _looks_framed(buf):
            rows = parse_framed_stream(buf, self.config)
            return self._parse_row(rows[0]) if rows else {}
        row = ingest_bytes(buf, uri, self.config)
        return self._parse_row(row)

    # -- S3: swish_parse_fh (parser.c:2050-2216) ------------------------------
    def parse_fh(self, fh: io.IOBase | bytes) -> list[dict]:
        data = fh if isinstance(fh, bytes) else fh.read()
        if isinstance(data, str):
            data = data.encode("utf-8")
        return [self._parse_row(r) for r in parse_framed_stream(data, self.config)]

    # -- S2: swish_parse_directory (parser.c:2355-2447) -----------------------
    def parse_directory(self, root: str, follow_symlinks: bool = False) -> list[dict]:
        out = []
        for dirpath, dirnames, filenames in os.walk(root, followlinks=follow_symlinks):
            dirnames[:] = [d for d in sorted(dirnames) if not d.startswith(".")]
            for name in sorted(filenames):
                if name.startswith("."):
                    continue  # dot-file skip like the reference walker
                path = os.path.join(dirpath, name)
                try:
                    out.append(self.parse_file(path))
                except OSError as e:
                    # unreadable file (dangling symlink, permissions):
                    # warn and continue like the reference walker —
                    # aborting would discard the rest of the corpus
                    import warnings

                    warnings.warn(f"{path}: {e}", RuntimeWarning, stacklevel=2)
        return out

    def _parse_row(self, row: dict, include_base: str | None = None) -> dict:
        resolver = None
        if self.config.follow_xinclude and include_base is not None:
            resolver = _fs_resolver(self.config, include_base)
        return parse_document(
            row["doc_id"],
            row["spans"],
            parser=row.get("parser"),
            mime=row.get("mime"),
            config=self.config,
            include_resolver=resolver,
            error=row.get("error"),
        )


def _looks_framed(buf: bytes) -> bool:
    """True iff the buffer's prefix is an aggregator-protocol header
    section: both REQUIRED headers (Content-Length, Content-Location —
    parser.c:1906-1918) appear before the first blank line (LF or
    CRLF)."""
    head, sep, _ = buf[:1024].replace(b"\r\n", b"\n").partition(b"\n\n")
    if not sep:
        return False
    lower = head.lower()
    return b"content-length" in lower and b"content-location" in lower


def _fs_resolver(config: SwishConfig, base: str):
    """Filesystem XInclude resolver for single-node use (the Spark path
    resolves includes as a join — operators/xinclude.py)."""

    class _Map:
        def get(self, key):
            path = key if os.path.isabs(key) else os.path.join(base, os.path.basename(key))
            # resolver already joined parent dir; key is the resolved id
            candidate = key if os.path.exists(key) else path
            if not os.path.exists(candidate):
                return None
            with open(candidate, "rb") as f:
                row = ingest_bytes(f.read(), candidate, config)
            return (row["spans"][0]["text"], row["parser"])

    return make_include_resolver(_Map())
