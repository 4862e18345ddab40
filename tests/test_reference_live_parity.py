"""Live token-stream parity against a compiled reference binary.

``reference_bench.build_swish_lint`` compiles the reference's own
sources (read-only, in place) into a scratch ``swish_lint``;
``SWISH_DEBUG=4`` makes it dump its final token list — (pos, context,
metaname, offset, len, value) per token, exactly the columns our
postings kernel emits. Comparing the two streams end-to-end is the
strongest parity check available: it folds parser recovery, metaname
bucketing, bump-word gaps, tokenizer classes, lowercasing and the
shared-buffer offset layout into one equality.

Round-5 session results this suite pins:

* 37 of 39 parseable reference fixtures match TOKEN-FOR-TOKEN
  (pos+context+meta+offset+len+value), as do all 50 sf0.1 bench docs.
* ``UTF-8-demo.txt``: every field matches except ONE token's value —
  the reference's ``strip_utf8_chrs`` (tokenizer.c:242-245) strips a
  leading ignore-char by advancing a LOCAL pointer, so its caller
  stores the unadvanced bytes: ``'San`` becomes the corrupted ``'sa``
  (UTF-8 path only; the ASCII strip memmoves in place and is correct).
  We deliberately do NOT replicate the corruption: we emit ``san``.
* ``latin1.txt``: the reference emits ZERO tokens (its UTF-8 tokenizer
  stops on invalid bytes — silent data loss for non-UTF-8 TXT); our
  ingest transcodes and indexes the words. Deliberate improvement.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess

import pytest

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
TEST_DOCS = os.path.join(REFERENCE, "src", "test_docs")

_ENV = dict(os.environ, LC_ALL="C.utf8", SWISH_DEBUG="4")
_BLOCK = re.compile(
    r"t->pos\s+= (\d+)\n\s*t->context\s+= (\S+)\n\s*t->meta\s+= \d+ \[([^\]]*)\]"
    r"\n\s*t->offset\s+= (\d+)\n\s*t->len\s+= (\d+)\n\s*t->value\s+= (.*)\n"
)
_PARSER_BY_EXT = {"html": "HTML", "htm": "HTML", "xml": "XML", "txt": "TXT"}

# fixtures whose divergence is understood + deliberate (see module doc)
_KNOWN_DIVERGENT = {"UTF-8-demo.txt", "latin1.txt"}


def _binary():
    if not os.path.isdir(TEST_DOCS):
        pytest.skip("reference corpus not present")
    try:
        import reference_bench

        return reference_bench.build_swish_lint()
    except Exception as e:  # no gcc / libxml2 headers in this env
        pytest.skip(f"cannot build reference binary: {e}")


def _ref_tokens(binary: str, path: str, extra: tuple[str, ...] = ()):
    r = subprocess.run(
        # extra (e.g. --config) BEFORE --xinclude: swish_config_add
        # resets flags to config defaults, silently re-enabling xinclude
        [binary, "--tokenize", "1", *extra, "--xinclude", "0", path],
        capture_output=True,
        env=_ENV,
    )
    err = r.stderr.decode("utf-8", errors="replace")
    # the dump appears twice: once per add (pre-NUL-termination buffer
    # noise possible) and once from token_list_debug at end — only the
    # final pass is authoritative
    part = err.split("swish_token_list_debug:", 1)
    part = part[1] if len(part) > 1 else part[0]
    return [
        (int(p), c, m, int(o), int(ln), v)
        for p, c, m, o, ln, v in (x.groups() for x in _BLOCK.finditer(part))
    ]


def _our_tokens(path: str, parser: str, config=None):
    import pyarrow as pa

    from libswish3_spark.config import default_config
    from libswish3_spark.operators.postings import postings_batch_fn
    from libswish3_spark.sources.files import _decode, _scrub_nuls

    data = _scrub_nuls(open(path, "rb").read())
    # the PRODUCT decode (D5): xml-decl / meta-charset / libxml2's
    # latin-1 HTML default — naive utf-8-first here diverged from the
    # binary on undeclared-charset HTML carrying UTF-8 bytes
    text, _enc, err = _decode(data, parser, None, config or default_config())
    if err:
        text = ""
    span_type = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([path]),
            pa.array(
                [[{"kind": "text", "text": text, "media_ref": "", "offset": 0}]],
                pa.list_(span_type),
            ),
            pa.array([parser]),
        ],
        names=["doc_id", "spans", "parser"],
    )
    out = pa.Table.from_batches(
        list(postings_batch_fn(config or default_config())([batch]))
    )
    return list(
        zip(
            out["pos"].to_pylist(),
            out["context"].to_pylist(),
            out["metaname"].to_pylist(),
            out["offset"].to_pylist(),
            out["len"].to_pylist(),
            out["term"].to_pylist(),
        )
    )


def test_fixture_corpus_token_streams_match_compiled_reference():
    binary = _binary()
    checked = 0
    failures = []
    for p in sorted(glob.glob(os.path.join(TEST_DOCS, "*"))):
        name = os.path.basename(p)
        ext = p.rsplit(".", 1)[-1].lower() if "." in p else ""
        parser = _PARSER_BY_EXT.get(ext)
        if parser is None or name in _KNOWN_DIVERGENT:
            continue
        rt = _ref_tokens(binary, p)
        ot = _our_tokens(p, parser)
        if rt != ot:
            head = next((f"{a} != {b}" for a, b in zip(rt, ot) if a != b), "len diff")
            failures.append(f"{name}: ref {len(rt)} vs ours {len(ot)} ({head})")
        checked += 1
    assert checked >= 30, f"only {checked} fixtures found — corpus moved?"
    assert not failures, "token-stream divergence vs live reference:\n" + "\n".join(
        failures
    )


def test_utf8_demo_known_single_divergence_is_the_reference_strip_bug():
    """Everything matches except the one token corrupted by the
    reference's leading-strip pointer bug (see module docstring) —
    if more diffs appear, a regression crept in on our side."""
    binary = _binary()
    p = os.path.join(TEST_DOCS, "UTF-8-demo.txt")
    rt = _ref_tokens(binary, p)
    ot = _our_tokens(p, "TXT")
    assert len(rt) == len(ot)
    diffs = [(a, b) for a, b in zip(rt, ot) if a != b]
    # the fixture has three leading-apostrophe words on the UTF-8 path
    # ('San, 'He, 'He) — each hits the reference's strip bug
    assert len(diffs) == 3, f"expected the 3 strip-bug diffs, got {diffs[:5]}"
    for ref_tok, our_tok in diffs:
        # same slot (pos/context/meta/offset/len); the ref's printed
        # value is the unadvanced buffer starting at the strippable
        # apostrophe, ours is the correctly stripped word right after it
        assert ref_tok[:5] == our_tok[:5]
        assert ref_tok[5].startswith("'")
        assert ref_tok[5][1 : 1 + len(our_tok[5])] == our_tok[5]


def test_xinclude_expansion_token_stream_matches_compiled_reference():
    """XInclude ENABLED (--xinclude 1) over the reference's own
    xinclude.xml — the one parser feature the corpus-wide token test
    bypasses. Exercises in one equality: nested expansion
    (include-recursive.xml → included.xml), parse="text" forcing the
    TXT parser (whose title-from-path tokens must stay under
    swishtitle THROUGH the merge — the reference copies each child
    token's MetaName pointer, parser.c:963-988), missing-href skip
    (/tmp/nosuchfile.xml), and contiguous position/offset renumbering
    across merge points."""
    import pyarrow as pa

    from libswish3_spark.config import default_config
    from libswish3_spark.operators.postings import postings_batch_fn

    binary = _binary()
    path = os.path.join(TEST_DOCS, "xinclude.xml")
    r = subprocess.run(
        [binary, "--tokenize", "1", "--xinclude", "1", path],
        capture_output=True,
        env=_ENV,
    )
    err = r.stderr.decode("utf-8", errors="replace")
    part = err.split("swish_token_list_debug:", 1)
    part = part[1] if len(part) > 1 else part[0]
    ref = [
        (int(p), c, m, int(o), int(ln), v)
        for p, c, m, o, ln, v in (x.groups() for x in _BLOCK.finditer(part))
    ]
    assert len(ref) == 50  # 001-wordcount.t:62 with $txt_file_words folded in

    def rd(name):
        return open(os.path.join(TEST_DOCS, name), "rb").read().decode("utf-8")

    include_map = {
        os.path.join(TEST_DOCS, n): (rd(n), p)
        for n, p in [
            ("included.xml", "XML"),
            ("include-recursive.xml", "XML"),
            ("foo.txt", "TXT"),
        ]
        # /tmp/nosuchfile.xml deliberately absent: resolver returns None
    }
    span_type = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([path]),
            pa.array(
                [[{"kind": "text", "text": rd("xinclude.xml"), "media_ref": "", "offset": 0}]],
                pa.list_(span_type),
            ),
            pa.array(["XML"]),
        ],
        names=["doc_id", "spans", "parser"],
    )
    out = pa.Table.from_batches(
        list(postings_batch_fn(default_config(), include_map)([batch]))
    )
    ours = list(
        zip(
            out["pos"].to_pylist(),
            out["context"].to_pylist(),
            out["metaname"].to_pylist(),
            out["offset"].to_pylist(),
            out["len"].to_pylist(),
            out["term"].to_pylist(),
        )
    )
    assert ours == ref


def test_latin1_txt_reference_drops_ours_indexes():
    binary = _binary()
    p = os.path.join(TEST_DOCS, "latin1.txt")
    rt = _ref_tokens(binary, p)
    ot = _our_tokens(p, "TXT")
    assert rt == []  # reference: silent data loss on non-UTF-8 TXT
    assert len(ot) > 0  # ours: transcode + index


_BUF_MARK = re.compile(rb"print_buffer: len=(\d+) (MetaName|Property):<([^>]+)>")


def _ref_buffers(binary: str, path: str, extra: tuple[str, ...] = ()):
    """Final MetaName/Property buffers from SWISH_DEBUG=64.

    ``len=N`` counts BYTES: slice the raw stderr bytes, not decoded
    chars, or every non-ASCII buffer bleeds into the next dump line."""
    env = dict(_ENV, SWISH_DEBUG="64")
    r = subprocess.run(
        [binary, "--tokenize", "0", *extra, "--xinclude", "0", path],
        capture_output=True,
        env=env,
    )
    metas, props = {}, {}
    for m in _BUF_MARK.finditer(r.stderr):
        n = int(m.group(1))
        name = m.group(3).decode()
        val = r.stderr[m.end() : m.end() + n].decode("utf-8", "replace")
        (metas if m.group(2) == b"MetaName" else props)[name] = val
    return metas, props


def _our_buffers(path: str, parser: str, config=None):
    from libswish3_spark.config import default_config
    from libswish3_spark.parser import parse_to_state
    from libswish3_spark.sources.files import _decode, _scrub_nuls

    cfg = config or default_config()
    data = _scrub_nuls(open(path, "rb").read())
    text, _enc, err = _decode(data, parser, None, cfg)
    if err:
        text = ""
    st = parse_to_state(path, [("text", text, "")], parser, cfg)
    return dict(st.metanames), dict(st.properties)


def test_metaname_and_property_buffers_match_compiled_reference():
    """SWISH_DEBUG=64 dumps every final named buffer with its byte
    length — comparing maps end-to-end covers metaname bucketing, the
    body→swishdescription default alias (incl. libxml2's IMPLIED
    <body> around bare flow content), property cleanwsp, and the NUL
    scrub (reference pre-registers empty buffers; empty == absent)."""
    binary = _binary()
    norm = lambda d: {k: v for k, v in d.items() if v}
    failures = []
    checked = 0
    for p in sorted(glob.glob(os.path.join(TEST_DOCS, "*"))):
        name = os.path.basename(p)
        ext = p.rsplit(".", 1)[-1].lower() if "." in p else ""
        parser = _PARSER_BY_EXT.get(ext)
        if parser is None or name in _KNOWN_DIVERGENT:
            continue
        rm, rp = map(norm, _ref_buffers(binary, p))
        om, op = map(norm, _our_buffers(p, parser))
        if rm != om:
            failures.append(f"{name} META: ref={rm} ours={om}")
        if rp != op:
            failures.append(f"{name} PROP: ref={rp} ours={op}")
        checked += 1
    assert checked >= 30
    assert not failures, "buffer divergence vs live reference:\n" + "\n".join(
        failures[:10]
    )


def test_bench_shaped_html_docs_match_exactly(tmp_path):
    """A deterministic sample of sf documents in the bench HTML wrap —
    the corpus shape the throughput numbers are measured on."""
    import pyarrow.parquet as pq

    binary = _binary()
    sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    df = pq.read_table(os.path.join(sf, "documents.parquet")).to_pandas().head(20)
    for r in df.itertuples():
        p = tmp_path / f"{r.doc_id}.html"
        p.write_text(
            f"<html><head><title>doc {r.doc_id} from {r.source}"
            f"</title></head><body>{r.text}</body></html>"
        )
        rt = _ref_tokens(binary, str(p))
        ot = _our_tokens(str(p), "HTML")
        assert rt == ot, f"doc {r.doc_id}: first diff " + str(
            next(((a, b) for a, b in zip(rt, ot) if a != b), "len")
        )


def test_charset_declaration_parity_matches_compiled_reference(tmp_path):
    """Byte-level decode rules probed against the binary (c/m/t
    series): a UTF-8 BOM is stripped and selects UTF-8 (a meta charset
    still OVERRIDES it); a lying utf-8 declaration switches to latin-1
    at the FIRST invalid byte in HTML (content before keeps its
    multi-byte sequences, content after reads as mojibake, the parse
    continues); the same invalid byte in XML is FATAL — text before
    the byte delivers, the rest of that run drops, and the parse
    wounds ('<root>na\\xefve <b>rest</b> more' indexes 'narest',
    'more'); undeclared HTML stays latin-1 from byte 0."""
    CASES = {
        "c1.html": '<html><head><meta charset="utf-8"></head><body>naïve tôt</body></html>'.encode("utf-8"),
        "c3.html": '<html><head><meta charset="iso-8859-1"></head><body>na\xefve t\xf4t</body></html>'.encode("latin-1"),
        "c5.html": '<html><head><meta charset="iso-8859-1"></head><body>naïve</body></html>'.encode("utf-8"),
        "c6.html": '<html><head><meta charset="utf-8"></head><body>na\xefve end</body></html>'.encode("latin-1"),
        "c7.html": "<html><body>naïve tôt</body></html>".encode("utf-8"),
        "c13.html": "﻿<html><body>naïve</body></html>".encode("utf-8"),
        "m1.html": b'<html><head><meta charset="utf-8"></head><body>caf\xc3\xa9 na\xefve</body></html>',
        "m2.html": b'<html><head><meta charset="utf-8"></head><body>na\xefve caf\xc3\xa9</body></html>',
        "m4.xml": b'<?xml version="1.0" encoding="utf-8"?><root>na\xefve rest</root>',
        "m5.xml": b'<root>na\xefve rest</root>',
        "m7.html": b'\xef\xbb\xbf<html><head><meta charset="iso-8859-1"></head><body>caf\xc3\xa9</body></html>',
        "t1.xml": b'<root>na\xefve <b>rest</b> more</root>',
        "t3.xml": b'\xef\xbb\xbf<?xml version="1.0"?><root>na\xc3\xafve ok</root>',
        "t5.html": b'<html><head><meta charset="utf-8"></head><body>a<b>caf\xe9 x</b>done</body></html>',
        "t6.html": "﻿plain bare naivëe</html>".encode("utf-8"),
        "c11.xml": '<?xml version="1.0" encoding="ISO-8859-1"?><root>na\xefve</root>'.encode("latin-1"),
    }
    binary = _binary()

    def _norm(d):
        return {k: v for k, v in d.items() if v}

    failures = []
    for name, raw in CASES.items():
        p = tmp_path / name
        p.write_bytes(raw)
        parser = "XML" if name.endswith(".xml") else "HTML"
        rt = _ref_tokens(binary, str(p))
        ot = _our_tokens(str(p), parser)
        if rt != ot:
            first = next(
                ((a, b) for a, b in zip(rt, ot) if a != b),
                ("len", (len(rt), len(ot))),
            )
            failures.append(f"{name} tokens: {first}")
            continue
        rb = _ref_buffers(binary, str(p))
        ob = _our_buffers(str(p), parser)
        if (_norm(rb[0]), _norm(rb[1])) != (_norm(ob[0]), _norm(ob[1])):
            failures.append(f"{name} buffers diverge")
    assert not failures, "charset parity divergence:\n" + "\n".join(failures)


def test_implied_head_stickiness_matches_compiled_reference(tmp_path):
    """After a head element (meta/title/script/link/base) opens the
    implied <head>, a table-internal or UNKNOWN tag NESTS in the head
    instead of forcing the head→body transition — its content never
    reaches body's swishdescription alias — while any known body tag
    (p/div/h1/table/…) closes the head and opens body. Nesting keeps
    the stickiness ('<meta …><td>w<p>x' stays in head); an explicitly
    closed </head> exits head context."""
    CASES = {
        "a": '<meta charset="utf-8"><td>word here</td>',
        "d": '<meta name="x" content="y"><td>word here</td>',
        "e": "<head></head><td>word here</td>",
        "g": "<title>t</title><td>word here</td>",
        "h": '<meta charset="utf-8"><td>w</td><p>later</p>',
        "i": "<html><td>word</td></html>",
        "j": "<script>x=1</script><td>word</td>",
        "k": '<meta name="m" content="c"><custom>in</custom><p>later</p>',
        "l": '<meta name="m" content="c"><td>w<p>inner</p></td>',
        "m": '<base href="x"><td>word</td>',
        "n": "<html><head><p>word</p></html>",
        "q": "<td>word</td>",
        "r": '<meta name="m" content="c"><table><td>w</td></table>done',
    }
    binary = _binary()

    def _norm(d):
        return {k: v for k, v in d.items() if v}

    failures = []
    for name, doc in CASES.items():
        p = tmp_path / f"{name}.html"
        p.write_text(doc)
        rt = _ref_tokens(binary, str(p))
        ot = _our_tokens(str(p), "HTML")
        rb = _ref_buffers(binary, str(p))
        ob = _our_buffers(str(p), "HTML")
        if rt != ot or (_norm(rb[0]), _norm(rb[1])) != (
            _norm(ob[0]),
            _norm(ob[1]),
        ):
            failures.append(name)
    assert not failures, f"implied-head divergence: {failures}"


def test_charset_variant_fuzz_matches_compiled_reference(tmp_path):
    """Seeded fuzz docs re-encoded under charset variants: explicit
    utf-8 meta, UTF-8 BOM, a true latin-1 declaration, and undeclared
    utf-8 bytes (the latin-1 default). EXCLUDED: a lying utf-8
    declaration over latin-1 bytes when attrs hold non-ASCII — libxml2
    half-emits the first recovered char INSIDE ATTRIBUTE VALUES
    (\\xef indexes as 'Ã', the first byte of its utf-8 re-encoding,
    while later bad bytes and all body content recover fully) — a
    reference-side byte glitch we deliberately do not reproduce; the
    body-content lying-utf8 rule is pinned by the charset battery."""
    import random
    import sys

    sys.path.insert(0, "tests")
    from test_reference_live_fuzz_parity import gen_html_doc, gen_xml_doc

    binary = _binary()

    def _norm(d):
        return {k: v for k, v in d.items() if v}

    rng = random.Random(20260818)
    failures = []
    for i in range(25):
        doc = gen_html_doc(rng)
        variant = rng.random()
        if variant < 0.3:
            raw = ('<meta charset="utf-8">' + doc).encode("utf-8")
        elif variant < 0.55:
            raw = b"\xef\xbb\xbf" + doc.encode("utf-8")
        elif variant < 0.75:
            try:
                raw = ('<meta charset="iso-8859-1">' + doc).encode("latin-1")
            except UnicodeEncodeError:
                raw = ('<meta charset="iso-8859-1">' + doc).encode("utf-8")
        else:
            raw = doc.encode("utf-8")
        docs = [(f"h{i}.html", "HTML", raw)]
        xdoc = gen_xml_doc(rng)
        if not xdoc.lstrip().startswith("<?xml"):
            try:
                xraw = (
                    '<?xml version="1.0" encoding="ISO-8859-1"?>\n' + xdoc
                ).encode("latin-1")
            except UnicodeEncodeError:
                xraw = xdoc.encode("utf-8")
        else:
            xraw = xdoc.encode("utf-8")
        docs.append((f"x{i}.xml", "XML", xraw))
        for name, parser, raw in docs:
            p = tmp_path / name
            p.write_bytes(raw)
            rt = _ref_tokens(binary, str(p))
            ot = _our_tokens(str(p), parser)
            if rt != ot:
                failures.append(f"{name} tokens")
                continue
            rb = _ref_buffers(binary, str(p))
            ob = _our_buffers(str(p), parser)
            if (_norm(rb[0]), _norm(rb[1])) != (_norm(ob[0]), _norm(ob[1])):
                failures.append(f"{name} buffers")
    assert not failures, "charset fuzz divergence: " + ", ".join(failures)
