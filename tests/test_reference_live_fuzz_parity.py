"""Seeded random-markup parity against the compiled reference binary.

The fixture corpus is 39 hand-written documents; this module generates
pseudo-random XML/HTML (fixed seed — fully deterministic) and compares
token streams AND named buffers end-to-end against the live binary.
Driving this generator found and fixed eight real divergence classes
the fixtures never exercised (all now modeled + cited in code):

* xmlns declarations minting attr metanames (events.xml_events);
* SAX2 atts truncation at the first empty-valued attribute
  (mystartElementNs, parser.c:897-911);
* non-whitespace text before the XML root ("Start tag expected")
  killing the whole document, and a second top-level element ("Extra
  content") ending delivery at the root's close (parser phase gate);
* libxml2's post-TAG_NAME_MISMATCH wounded state: one silent pop, no
  element callbacks ever again, literal text with entity/charref
  expansions REMOVED and per-run truncation at the first non-ASCII
  byte, CDATA dropped, delivery ending when the stack empties
  (parser._consume_markup phase 3, probes q1-q16/u1-u6/w1-w2);
* buffer_characters appending the bumper and eating the pending bump
  even for EMPTY content (<meta content=""> leaves a trailing \\x03);
* the HTML AUTO_CLOSE table (now extracted empirically from the binary
  — <table> closes <pre>, <p> closes <b>/<i>/…, full matrix);
* htmlEndPriority: '</div>' cannot force-close a <td>/<table>; such
  end tags are ignored entirely (htmltags.END_PRIORITY);
* document-leading whitespace-only text (node NULL) never reaching
  the buffer (ignorableWhitespace handler is NULL, parser.c:1472).

Generator constraints (deliberate, reference-bug shaped):

* no duplicate attribute names per element — a duplicate attr is a
  fatal wf error whose libxml2 recovery mangles content byte-garbage;
* no leading-apostrophe words — the reference's strip_utf8_chrs bug
  (tokenizer.c:242-245) corrupts them on the UTF-8 path (pinned
  separately by test_reference_live_parity).
"""

from __future__ import annotations

import random

import pytest

from test_reference_live_parity import (
    _binary,
    _our_buffers,
    _our_tokens,
    _ref_buffers,
    _ref_tokens,
)

TAGS = ["title", "p", "b", "div", "foo", "bar2", "em", "span"]
ATTR_NAMES = ["a", "href", "name", "class", "id"]
WORDS = [
    "hello", "world", "don't", "foo.bar", "x1", "MiXeD", "naïve",
    "Σίσυφος", "tôt", "a_b", "O'Neil", "trailing'", "under_score_",
    "42", "3.14", "—dash—", "co&amp;de", "&lt;tag&gt;", "&#65;bc",
    "ordinary",
]
HTML_TAGS = [
    "p", "b", "i", "div", "span", "h1", "li", "table", "td", "pre",
    "custom", "th", "tr", "tbody", "thead", "caption", "form",
    "select", "option", "label", "fieldset", "ul", "iframe",
]


# injected rarely (3%): an invalid ref WOUNDS a whole-doc XML parse
# (parser phase 3), so a high rate would starve normal-path coverage
BAD_REFS = ["&broken;", "&#zz;", "&", "&;", "&#150;", "&notit;", "&amp x"]


def _text(rng, n):
    parts = []
    for _ in range(n):
        if rng.random() < 0.03:
            parts.append(rng.choice(BAD_REFS))
        else:
            parts.append(rng.choice(WORDS))
        parts.append(rng.choice([" ", "  ", "\n", " \t "]))
    return "".join(parts)


def _xml(rng, depth=0):
    out = []
    for _ in range(rng.randint(1, 5)):
        r = rng.random()
        if r < 0.35 or depth >= 4:
            out.append(_text(rng, rng.randint(1, 6)))
        elif r < 0.45:
            c = rng.choice(
                ["a comment", "noindex", "index", "SwishCommand noindex"]
            )
            if rng.random() < 0.06:
                # double-hyphen / trailing-hyphen comments: FATAL wound
                # (no callback, resync at the next '-->'; probes
                # c7/d1-d6/e1-e5) — rare so they don't starve coverage
                out.append(rng.choice(
                    [f"<!-- {c} -- bad -->", f"<!-- {c} --->"]
                ))
            else:
                out.append(f"<!-- {c} -->")
        elif r < 0.5:
            out.append(f"<![CDATA[{_text(rng, 2)}]]>")
        elif r < 0.52:
            out.append(rng.choice(["<?pi data?>", "<?php echo 1; ?>"]))
        else:
            t = rng.choice(TAGS)
            attrs = ""
            for an in rng.sample(ATTR_NAMES, rng.randint(0, 3)):
                if rng.random() < 0.04:
                    # invalid ref in an attr value: wounds AT the start
                    # tag; an external-id DTD rescues `&name;` only
                    # (probes x/y/z series) — rare to keep coverage
                    av = rng.choice(
                        ["p &broken; q", "p &#zz; q", "p & q", "p &#0; q"]
                    )
                else:
                    av = rng.choice(
                        ["v1", "", "Two Words", "don't", "ü", "p &amp; q"]
                    )
                attrs += f' {an}="{av}"'
            if rng.random() < 0.15:
                out.append(f"<{t}{attrs}/>")
            else:
                inner = _xml(rng, depth + 1)
                close = t if rng.random() > 0.06 else rng.choice(TAGS)
                out.append(f"<{t}{attrs}>{inner}</{close}>")
    return "".join(out)


def gen_xml_doc(rng):
    pre = rng.choice(
        ["", "\n", '<?xml version="1.0" encoding="utf-8"?>\n']
    )
    if rng.random() < 0.25:
        # DOCTYPE declarations: skipped decls whose internal subset
        # must lex bracket-aware (quoted `]>`, nested decls, comments);
        # entity-error recovery is probed identical with/without one
        pre += rng.choice(
            [
                "<!DOCTYPE root>",
                '<!DOCTYPE root SYSTEM "missing.dtd">',
                '<!DOCTYPE root PUBLIC "-//X//Y//EN" "no.dtd">',
                '<!DOCTYPE root [<!ENTITY c "X">]>',
                '<!DOCTYPE root SYSTEM "m.dtd" [<!ENTITY c "X">]>',
                '<!DOCTYPE root [\n<!ENTITY c "tricky ]> val">'
                "<!-- dtd ]> comment -->\n<!ELEMENT root ANY>]>",
            ]
        )
    return f"{pre}<root>{_xml(rng)}</root>{rng.choice(['', chr(10)])}"


def _html(rng, depth=0):
    out = []
    for _ in range(rng.randint(1, 5)):
        r = rng.random()
        if r < 0.4 or depth >= 4:
            out.append(_text(rng, rng.randint(1, 6)))
        elif r < 0.48:
            # --!> is a valid HTML comment terminator (probes c5/d7/d9)
            term = "--!>" if rng.random() < 0.15 else "-->"
            out.append(f"<!-- {rng.choice(['c', 'noindex', 'index'])} {term}")
        elif r < 0.53:
            # libxml2 HTML has NO CDATA sections / generic decls: `<!`
            # that opens neither a comment nor a DOCTYPE delivers `<`
            # as literal text and resumes content parsing at the `!`;
            # `<?` PIs end at the FIRST `>` (probed h1-h10/l1-l3)
            out.append(
                rng.choice(
                    [
                        "<![CDATA[ hidden words ]]>",
                        "<![CDATA[zz]]>",
                        "<!x bogus>",
                        "<!- y>",
                        "<!->",
                        "<!>",
                        "<?pi data?>",
                        "<?pi first > rest?>",
                        "<!DOCTYPE html>",
                    ]
                )
            )
        elif r < 0.56:
            out.append(
                rng.choice(
                    [
                        "<br>", "<br/>", '<img src="x.gif">', "<hr>",
                        # no-separator img + inline tag: the canceled
                        # img bump FUSES the surrounding token
                        # ('y<img><b>co' indexes ONE word 'yco') — the
                        # media span must not split it
                        'fuse<img src="m.png"><b>joined</b>',
                        'pre<img src="m.png"><label>lab</label>',
                    ]
                )
            )
        elif r < 0.60:
            # rawtext: scan stops at `</`+letter; non-matching closes
            # are consumed-and-dropped with rawtext resuming; tags
            # lex through '<' to the first '>' (probes rb1-7/rc1-7/
            # sc1-2/g1-7)
            out.append(
                rng.choice(
                    [
                        "<script>var x = 1;</script>",
                        "<script>if (a<b && c>d) f();</script>",
                        "<script>x</scr>y</script>",
                        "<script>x // </notag, </script>",
                        "<style>p { color: red }</style>",
                        "<style>x</styleQ>y</style>",
                        "<SCRIPT>x</SCRIPT>",
                    ]
                )
            )
        else:
            t = rng.choice(HTML_TAGS)
            attrs = ""
            if rng.random() < 0.4:
                for an in rng.sample(ATTR_NAMES, rng.randint(1, 2)):
                    # NOT "'word …'": when the tag text lands as
                    # literal rawtext/bogus content, ='word becomes a
                    # leading-apostrophe token and the reference's
                    # strip_utf8_chrs bug corrupts it (see module
                    # docstring exclusions)
                    av = rng.choice(
                        ['"v1"', "' sq v'", "unquoted", '""', ""]
                    )
                    attrs += f" {an}={av}" if av else f" {an}"
            inner = _html(rng, depth + 1)
            if rng.random() < 0.12:
                out.append(f"<{t}{attrs}>{inner}")  # unclosed
            else:
                out.append(f"<{t}{attrs}>{inner}</{t}>")
    return "".join(out)


def gen_html_doc(rng):
    body = _html(rng)
    if rng.random() < 0.05:
        # unterminated tag at EOF: dropped entirely (probes q1-q5)
        body += rng.choice(["<title x=1", "</b x", "<div", "<script"])
    shape = rng.random()
    if shape < 0.4:
        return (
            f"<html><head><title>{_text(rng, 3)}</title></head>"
            f"<body>{body}</body></html>"
        )
    if shape < 0.6:
        return f"<html><body>{body}</body></html>"
    if shape < 0.8:
        return body  # bare flow content (implied body/html)
    return (
        f'<html><head><meta name="author" content="{_text(rng, 2)}">'
        f'<meta name="keywords" content=""></head><body>{body}</body></html>'
    )


def _norm(d):
    return {k: v for k, v in d.items() if v}


@pytest.mark.parametrize("seed", [42, 7])
def test_fuzz_corpus_matches_compiled_reference(seed, tmp_path):
    binary = _binary()
    rng = random.Random(seed)
    failures = []
    for i in range(50):
        for kind, parser, gen_fn in (
            ("xml", "XML", gen_xml_doc),
            ("html", "HTML", gen_html_doc),
        ):
            doc = gen_fn(rng)
            p = tmp_path / f"fuzz{i}.{kind}"
            p.write_text(doc)
            rt = _ref_tokens(binary, str(p))
            ot = _our_tokens(str(p), parser)
            if rt != ot:
                first = next(
                    ((a, b) for a, b in zip(rt, ot) if a != b),
                    ("len", (len(rt), len(ot))),
                )
                failures.append(f"seed{seed}/{i}.{kind} tokens: {first}")
                continue
            rb = _ref_buffers(binary, str(p))
            ob = _our_buffers(str(p), parser)
            if (_norm(rb[0]), _norm(rb[1])) != (_norm(ob[0]), _norm(ob[1])):
                failures.append(f"seed{seed}/{i}.{kind} buffers diverge")
    assert not failures, "fuzz divergence vs live reference:\n" + "\n".join(
        failures[:10]
    )


# Pinned probe corpus from the DOCTYPE / bogus-markup / entity-recovery
# parity session: every case was first observed against the compiled
# binary, minimized, and the engine fixed to match. Covers: XML DOCTYPE
# internal subsets lexing bracket-aware (quoted ]>, nested decls,
# comments); the external-id (SYSTEM/PUBLIC) entity rescue — a
# well-formed `&name;` is a benign skip while every other invalid ref
# still wounds; HTML's bogus `<!…` → literal '<' + resume; HTML
# PI/DOCTYPE ending at the first '>'; the misplaced-DOCTYPE adjacency
# (an immediately-following close/DOCTYPE lexes as bogus text); the
# implied <p> around top-level text; and pre-tree leading-blank drops.
PINNED_PROBES = {
    "dt4.xml": '<!DOCTYPE root [<!ENTITY custom "expanded words">]><root>alpha &custom; beta</root>',
    "e10.xml": '<!DOCTYPE root [<!ENTITY c "X">]><root><title>al &c; be</title>rest</root>',
    "e12.xml": '<!DOCTYPE root [<!ENTITY c "tricky ]> value">]><root>alpha &c; beta</root>',
    "s1.xml": '<!DOCTYPE r SYSTEM "m.dtd"><root>al &c; <title>be</title>rest</root>',
    "s2.xml": '<!DOCTYPE r SYSTEM "m.dtd"><root>al &c; naïve end</root>',
    "s3.xml": '<!DOCTYPE r SYSTEM "m.dtd"><root>al &c; x<![CDATA[ inner ]]>y</root>',
    "s5.xml": '<!DOCTYPE r SYSTEM "m.dtd"><root>p&q;r</root>',
    "s6.xml": '<!DOCTYPE r SYSTEM "m.dtd"><root>al &#zz; be <b>w</b></root>',
    "s7.xml": '<!DOCTYPE r SYSTEM "m.dtd"><root>al & be <b>w</b></root>',
    "s8.xml": '<!DOCTYPE r SYSTEM "m.dtd"><root>al &unterminated be <title>w</title></root>',
    "s9.xml": '<!DOCTYPE r SYSTEM "m.dtd"><root><a>x</b>word<title>t</title></root>',
    "s10.xml": '<!DOCTYPE r PUBLIC "-//X//Y//EN" "no.dtd"><root>al &c; <title>be</title>rest</root>',
    "s11.xml": '<!DOCTYPE r SYSTEM "m.dtd" [<!ENTITY z "Z">]><root>al &c; <title>be</title>rest</root>',
    "s12.xml": '<!DOCTYPE r SYSTEM "m.dtd"><root>al &#0; be <title>w</title></root>',
    "s14.xml": '<!DOCTYPE r SYSTEM "m.dtd"><root>al &ok; mid &#zz; be <title>w</title></root>',
    "r1.xml": '<!DOCTYPE root SYSTEM "missing.dtd"><root>x &notit; 3.14 &#65;bc',
    "q1.xml": '<!DOCTYPE r><root>al &c; a&#66;c</root>',
    "p1.xml": '<!DOCTYPE r><root>al &c; <title>be</title> rest</root>',
    "cd1.html": "<p>alpha<![CDATA[ hidden words ]]>beta</p>",
    "h1.html": "<p>alpha<![CDATA[ hid <b>bold</b> den]]>beta</p>",
    "h2.html": "<p>alpha<!x junk<b>bold</b>beta</p>",
    "h6.html": "<p>a<script>x<![CDATA[y]]>z</script>b</p>",
    "h10.html": "<p>alpha <?pi with <b>inner?> beta</p>",
    "l3.html": "<!DOCTYPE html [<!ENTITY x 'y'>]><p>alpha</p>",
    "u2.html": "<!x bogus>word",
    "u3.html": "< bogus word",
    "v6.html": "a_b<!DOCTYPE html></table>end",
    "v7.html": "&lt;x word",
    "v8.html": "<< x word",
    "y2.html": "a<!DOCTYPE html></a></b>end",
    "y4.html": "a<!DOCTYPE html><!DOCTYPE html></p>x",
    "y7.html": "a<!DOCTYPE html></p><b>w</b>",
    "z1.html": "<!DOCTYPE a><p>x</p><!DOCTYPE b>y",
    "z3.html": "x<!doctype lower></table>end",
    "z4.html": "<head><title>t</title></head><!DOCTYPE html></table>end",
    "w3.html": "<!-- c --><!DOCTYPE html></p>x",
    "w5.html": "<html><!DOCTYPE html></p>x",
    "pi1.html": "<?pi first > rest?>",
    "k2.html": "<html><head></head>word<div>x</div>",
    # rawtext scan: stops at `</`+letter; the end tag there is parsed
    # NORMALLY (auto-close pops an open script via `</h1>`/`</span>`),
    # a not-open name is dropped with rawtext RESUMING, the tag is
    # consumed to its first '>' (can swallow the real `</script>`),
    # and tags lex through '<' to the first '>' (probes rb/rc/sc/re/g)
    "rc2.html": "<p>a<script>x y</scriptx>b</p>",
    "rc6.html": "<p>a<script>if(a<b)x</script>b</p>",
    "rb1.html": "<p>a<script>x</scr>y</script>b</p>",
    "rb3.html": "<p>a<script>x</ script>y</script>b</p>",
    "rb5.html": "<p>a<style>x</styleQ>y</style>b</p>",
    "re1.html": "<p>a<script>x</scr>y<b>z</b>q</script>w</p>",
    "sc1.html": "<p>a<script>x // </notag, </script>w</p>",
    "sc2.html": "<p>a<script>x</0>y</script>w</p>",
    "m2x.html": "<span><script></span><script>",
    "hx1.html": '<h1 id="v1" class=\' sq v\'><script></h1><td>',
    "g1.html": "<p>a</b x<i>y>w</p>",
    "g2.html": "<p a=x<y>w</p>",
    "g7.html": "<p>a<b x=1 y=2<i>z>w</p>",
    # unterminated tags at EOF: dropped entirely (probes q1-q5)
    # XML: an invalid ref in an ATTRIBUTE value wounds AT the start
    # tag (no callbacks for the element); an external-id DTD rescues
    # well-formed &name; refs only (value kept, refs stripped)
    "ax1.xml": '<root><foo a="p &c; q">w</foo><title>t</title></root>',
    "ax2.xml": '<root>pre<foo a="p &broken; q">w</foo>post</root>',
    "ax3.xml": '<root><foo a="p &broken; q"><bar>in</bar></foo>post</root>',
    "ax4.xml": '<root><foo a="p &#66; q"><title>t</title></foo></root>',
    "ax5.xml": '<!DOCTYPE r SYSTEM "m.dtd"><root><foo a="p &c; q">w</foo><title>t</title></root>',
    "ax6.xml": '<!DOCTYPE r SYSTEM "m.dtd"><root><foo a="p &#zz; q">w</foo><title>t</title></root>',
    "ax7.xml": '<root>a<span id="p & q"/>trailing</root>',
    "ax8.xml": '<!DOCTYPE r [<!ENTITY c "X">]><root><foo a="p &c; q">w</foo><title>t</title></root>',
    # attribute-value entity rules: malformed / invalid-codepoint
    # charrefs TRUNCATE the value (content merely drops the ref bytes)
    "av1.html": '<meta name="author" content="x &#zz; y"><p>w</p>',
    "av2.html": '<meta name="author" content="x &#0; y"><p>w</p>',
    "av3.html": '<meta name="author" content="x &broken; &#66; &amp y"><p>w</p>',
    "av4.html": '<meta name="author" content="&#zz;  foo.bar"><p>w</p>',
    # comment terminators / fatal double-hyphen comments
    "cm1.html": "<p>a<!-- x --!>b</p>",
    "cm2.html": "<p>a<!-- noindex --!>hidden<!-- index -->shown</p>",
    "cm3.xml": "<root>a<!-- x -- y --><title>t</title>b</root>",
    "cm4.xml": "<root>a<!-- x -- y --><!-- z -->b<title>t</title></root>",
    "cm5.xml": "<root>a<!--- x --->b<title>t</title></root>",
    "cm6.xml": "<!-- x -- y --><root>a<title>t</title>b</root>",
    "cm7.xml": "<root>a<!-- x --!>b</root>",
    "q1x.html": "<p>a<title",
    "q3x.html": "<p>a</p",
    "q5x.html": "a<script",
    "sw1.html": "a<script>x<b)</script>tail words",
}


def test_pinned_doctype_and_bogus_markup_probes(tmp_path):
    binary = _binary()
    failures = []
    for name, doc in PINNED_PROBES.items():
        parser = "XML" if name.endswith(".xml") else "HTML"
        p = tmp_path / name
        p.write_text(doc)
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
    assert not failures, "pinned probe divergence:\n" + "\n".join(failures)


def test_xinclude_fuzz_matches_compiled_reference(tmp_path):
    """Seeded random XInclude trees (plain/metaname/nested-includer/
    parse="text"/missing-href children, mixed 2001/2003 namespaces like
    the fixtures) expanded with --xinclude 1 and compared
    token-for-token through the postings kernel's include_map path."""
    import os
    import subprocess

    import pyarrow as pa

    from libswish3_spark.config import default_config
    from libswish3_spark.operators.postings import postings_batch_fn
    from test_reference_live_parity import _BLOCK, _ENV

    binary = _binary()
    rng = random.Random(20240818)
    d = str(tmp_path)
    words = ["hello", "world", "alpha", "beta", "don't", "x1", "naïve"]

    def txt(k):
        return " ".join(rng.choice(words) for _ in range(k))

    files = {
        "childa.xml": f'<?xml version="1.0"?>\n<ca>{txt(4)}<b>{txt(2)}</b></ca>\n',
        "childb.xml": f"<cb><title>{txt(2)}</title>{txt(3)}</cb>",
        "childn.xml": (
            '<cn xmlns:xi="http://www.w3.org/2003/XInclude">'
            f'{txt(2)} <xi:include href="childa.xml"/> {txt(1)}</cn>'
        ),
        "childt.txt": txt(5) + "\n",
    }
    for n, c in files.items():
        (tmp_path / n).write_text(c)
    include_map = {
        os.path.join(d, n): (c, "TXT" if n.endswith(".txt") else "XML")
        for n, c in files.items()
    }
    pool = [
        '<xi:include href="childa.xml"/>',
        '<xi:include href="childb.xml"/>',
        '<xi:include href="childn.xml"/>',
        '<xi:include href="childt.txt" parse="text"/>',
        '<xi:include href="childa.xml" parse="text"/>',
        '<xi:include href="/tmp/definitely_missing_xyz.xml"/>',
    ]
    span_type = pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    failures = []
    for i in range(8):
        parts = [f" {txt(rng.randint(1, 4))} "]
        for _ in range(rng.randint(1, 4)):
            parts.append(rng.choice(pool))
            parts.append(f" {txt(rng.randint(0, 3))} ")
            if rng.random() < 0.3:
                parts.append(f"<sect>{txt(2)}</sect>")
        doc = (
            rng.choice(["", '<?xml version="1.0"?>\n'])
            + '<doc xmlns:xi="http://www.w3.org/2001/XInclude">'
            + "".join(parts)
            + "</doc>\n"
        )
        p = os.path.join(d, f"parent{i}.xml")
        open(p, "w").write(doc)
        r = subprocess.run(
            [binary, "--tokenize", "1", "--xinclude", "1", p],
            capture_output=True, env=_ENV,
        )
        assert r.returncode == 0
        err = r.stderr.decode("utf-8", errors="replace")
        part = err.split("swish_token_list_debug:", 1)
        part = part[1] if len(part) > 1 else part[0]
        ref = [
            (int(pp), c, m, int(o), int(ln), v)
            for pp, c, m, o, ln, v in (x.groups() for x in _BLOCK.finditer(part))
        ]
        batch = pa.RecordBatch.from_arrays(
            [
                pa.array([p]),
                pa.array(
                    [[{"kind": "text", "text": doc, "media_ref": "",
                       "offset": 0}]],
                    pa.list_(span_type),
                ),
                pa.array(["XML"]),
            ],
            names=["doc_id", "spans", "parser"],
        )
        out = pa.Table.from_batches(
            list(postings_batch_fn(default_config(), include_map)([batch]))
        )
        ours = list(zip(
            out["pos"].to_pylist(), out["context"].to_pylist(),
            out["metaname"].to_pylist(), out["offset"].to_pylist(),
            out["len"].to_pylist(), out["term"].to_pylist(),
        ))
        if ref != ours:
            first = next(
                ((a, b) for a, b in zip(ref, ours) if a != b),
                ("len", (len(ref), len(ours))),
            )
            failures.append(f"parent{i}: {first}")
    assert not failures, "xinclude fuzz divergence:\n" + "\n".join(failures)


def test_txt_fuzz_matches_compiled_reference(tmp_path):
    """Seeded plain-text fuzz through the TXT parser: markup-looking
    text stays literal, entities stay unexpanded, and the control-char
    separators (\\x0b/\\x0c/CRLF) tokenize like the binary."""
    binary = _binary()
    words = WORDS + ["<not-a-tag>", "a<b", "x&y"]
    seps = [" ", "  ", "\n", "\t", " \t ", "\r\n", "\x0b", "\x0c"]
    rng = random.Random(20260819)
    failures = []
    for i in range(30):
        parts = []
        for _ in range(rng.randint(1, 40)):
            w = rng.choice(words)
            if w.startswith(("'", "trailing")):
                continue  # leading-apostrophe exclusion (module doc)
            parts.append(w)
            parts.append(rng.choice(seps))
        p = tmp_path / f"t{i}.txt"
        p.write_text("".join(parts))
        rt = _ref_tokens(binary, str(p))
        ot = _our_tokens(str(p), "TXT")
        if rt != ot:
            failures.append(f"t{i} tokens")
            continue
        rb = _ref_buffers(binary, str(p))
        ob = _our_buffers(str(p), "TXT")
        if (_norm(rb[0]), _norm(rb[1])) != (_norm(ob[0]), _norm(ob[1])):
            failures.append(f"t{i} buffers")
    assert not failures, "txt fuzz divergence: " + ", ".join(failures)
