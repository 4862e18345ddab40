"""CLI tools mirroring the reference binaries.

* ``lint``     — swish_lint equivalent (reference: src/swish_lint.c):
  parse paths (or a framed stream on stdin with ``-``), print per-doc
  nwords and run totals.
* ``tokenize`` — swish_tokenize equivalent (src/swish_tokenize.c):
  tokenize argv strings, print tokens with positions.
* ``header``   — swish_header equivalent (src/swish_header.c): read a
  config file, validate, dump the merged view.

Usage: ``python -m libswish3_spark.cli lint [-c conf.xml] PATH...``
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from libswish3_spark.api import Swish3
from libswish3_spark.config import default_config, load_config_xml
from libswish3_spark.tokenizer import tokenize_with_positions


def _load_config(path: str | None):
    if not path:
        return default_config()
    with open(path) as f:
        return load_config_xml(f.read())


def cmd_lint(args) -> int:
    s3 = Swish3(_load_config(args.config))
    t0 = time.perf_counter()
    files = 0
    twords = 0
    results = []
    errors = 0
    if args.paths == ["-"]:
        results = s3.parse_fh(sys.stdin.buffer.read())
    else:
        for path in args.paths:
            try:
                results.append(s3.parse_file(path))
            except OSError as e:
                # swish_lint warns and continues on unreadable paths
                print(f"{path}: error: {e}", file=sys.stderr)
                errors += 1
    for r in results:
        files += 1
        twords += r["nwords"]
        if args.verbose:
            print(f"{r['doc_id']}: nwords: {r['nwords']}")
        if r.get("error"):
            # per-document parse/ingest errors (the ingest layer yields
            # error ROWS, never exceptions) must reach stderr and the
            # exit status even without -v — a CI lint gate that exits 0
            # over a corpus of unparseable docs is worse than useless
            print(f"{r['doc_id']}: error: {r['error']}", file=sys.stderr)
            errors += 1
    # swish_lint.c:345-350 output shape
    print(f"{files} files")
    print(f"total words: {twords}")
    print(f"total time: {time.perf_counter() - t0:.4f} sec")
    return 1 if errors else 0


def cmd_tokenize(args) -> int:
    # swish_tokenize prints token value/len/pos per token (005-tokenizer.t)
    text = " ".join(args.strings)
    toks, _pos = tokenize_with_positions(text, 0)
    for value, pos, _m, _c in toks:
        # t->len is a BYTE length in the reference (xmlStrlen of the
        # UTF-8 token, token.c) — postings.py's len column uses the
        # same byte semantics; a char count diverges on every
        # non-ASCII token
        blen = len(value.encode("utf-8"))
        print(f"t->value = {value}\nt->len = {blen}\nt->pos = {pos}")
    print(f"parsed {len(toks)} tokens")
    return 0


def cmd_header(args) -> int:
    cfg = _load_config(args.config_file)
    if args.write:
        # swish_header writes the merged view back out (header.c:1386+
        # swish_header_write; the binary writes swish_header.xml)
        from libswish3_spark.config import config_to_xml

        with open(args.write, "w") as f:
            f.write(config_to_xml(cfg))
        print(f"wrote {args.write}", file=sys.stderr)
        return 0
    dump = {
        "metanames": {k: vars(v) for k, v in sorted(cfg.metanames.items())},
        "properties": {k: vars(v) for k, v in sorted(cfg.properties.items())},
        "tag_aliases": dict(sorted(cfg.tag_aliases.items())),
        "parsers": dict(sorted(cfg.parsers.items())),
        "flags": {
            "tokenize": cfg.tokenize,
            "cascade_meta_context": cfg.cascade_meta_context,
            "ignore_xmlns": cfg.ignore_xmlns,
            "follow_xinclude": cfg.follow_xinclude,
            "undef_metas": cfg.undef_metas,
            "undef_attrs": cfg.undef_attrs,
        },
    }
    json.dump(dump, sys.stdout, indent=2, default=str)
    print()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="libswish3_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lint = sub.add_parser("lint", help="parse documents, report word counts")
    lint.add_argument("-c", "--config")
    lint.add_argument("-v", "--verbose", action="store_true")
    lint.add_argument("paths", nargs="+", help="file paths, or - for framed stdin")
    lint.set_defaults(fn=cmd_lint)

    tok = sub.add_parser("tokenize", help="tokenize strings")
    tok.add_argument("strings", nargs="+")
    tok.set_defaults(fn=cmd_tokenize)

    hdr = sub.add_parser("header", help="read + validate a config file")
    hdr.add_argument("config_file")
    hdr.add_argument(
        "-w", "--write", metavar="OUT_XML",
        help="write the merged config back out (swish_header.xml form)",
    )
    hdr.set_defaults(fn=cmd_header)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
