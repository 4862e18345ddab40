"""Batched byte-stream markup scanners.

These replace the reference's libxml2 SAX parsers (reference:
src/libswish3/parser.c:2454-2535 ``xml_parser``, parser.c:2537-2597
``html_parser``) with precompiled-regex event scanners. One compiled
master pattern finds every markup construct; the per-document loop is
bounded by *tag count*, not byte count — text between tags is sliced in
bulk, which is what makes this viable inside an Arrow batch without
per-character Python.

Event tuples:
    ("start", name, attrs: list[(k, v)], prefix, selfclosing: bool
            [, nsdecls: list[(prefix, uri)] — XML events only])
    ("end", name, prefix)
    ("text", s)
    ("comment", s)

XML scanning is *literal*: events fire in document order exactly as
written, which matches libxml2's error-recovering SAX stream on the
reference's malformed fixtures (badxml.xml; parser.c:2505-2507 ignores
parse errors and keeps the events already delivered).

HTML scanning adds the lenient-parser behaviors the reference inherits
from libxml2's HTML mode: void elements, implied end tags, bogus end
tags dropped, unclosed elements closed at EOF, raw-text (script/style)
contents treated as character data.
"""

from __future__ import annotations

import re

from libswish3_spark.htmlentities import HTML_ENTITIES
from libswish3_spark.htmltags import (
    AUTO_CLOSE,
    END_PRIORITY as _END_PRIORITY,
    KNOWN_TAGS,
    RAWTEXT_TAGS,
    TABLE_INTERNAL,
    VOID_TAGS,
)

MARKUP_RE = re.compile(
    r"""
    <!--(?P<comment>.*?)(?:-->|\Z)
  | <!\[CDATA\[(?P<cdata>.*?)(?:\]\]>|\Z)
  | <!(?P<doctype>DOCTYPE\b
      (?:"[^"]*"|'[^']*'|[^>\[])*
      (?:\[(?:<!--.*?-->|"[^"]*"|'[^']*'|[^\]])*\])?
      [^>]*>)
  | <!(?P<decl>[^>]*)>
  | <\?(?P<pi>.*?)(?:\?>|\Z)
  | <(?P<close>/)?(?P<name>(?:[:_]|[^\W\d])[^\s<>/]*)
      (?P<attrs>(?:"[^"]*"|'[^']*'|[^<>"'])*?)
      (?P<selfclose>/)?>
    """,
    re.DOTALL | re.VERBOSE,
)

# The HTML scanner's lexer is DELIBERATELY different (all probed
# against the compiled reference, tests/test_reference_live_fuzz_parity):
# libxml2's HTML parser has no CDATA sections and no generic <!decl>
# skipping — `<!` not opening a comment or DOCTYPE delivers `<` as
# literal text and resumes normal content parsing at the `!`
# (`alpha<![CDATA[ hid <b>x</b>]]>` indexes "cdata", "hid", and parses
# the inner <b>); its DOCTYPE and processing instructions both end at
# the FIRST `>`, bracket subsets included (`<!DOCTYPE html [<!ENTITY…>`
# stops at the entity's `>`, leaving `]>` as text; `<?pi with <b>` eats
# the `<b`). Constructs absent here simply fall into the text slices.
HTML_MARKUP_RE = re.compile(
    r"""
    <!--(?P<comment>.*?)(?:--!?>|\Z)
  | <!(?P<doctype>[Dd][Oo][Cc][Tt][Yy][Pp][Ee][^>]*)(?:>|\Z)
  | <\?(?P<pi>[^>]*)(?:>|\Z)
  | <(?P<close>/)?(?P<name>(?:[:_]|[^\W\d])[^\s<>/]*)
      (?P<attrs>(?:"[^"]*"|'[^']*'|[^>"'])*?)
      (?P<selfclose>/)?>
  | <(?P<unterm>/?(?:[:_]|[^\W\d])[^>]*)\Z
    """,
    re.DOTALL | re.VERBOSE,
)

ATTR_RE = re.compile(
    r"""([^\s=/'"<>]+)(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*)))?""",
)

# Decode-level wound marker (sources.files._decode): an invalid byte
# under an effective UTF-8 encoding is FATAL to a libxml2 XML parse —
# text before the byte delivers, the rest of that text run DROPS, and
# the parse wounds (probed m4/m5/t1: '<root>na\xefve <b>rest</b> more'
# indexes 'narest', 'more'). The marker is a private-use char; a
# NATURAL U+E000 in the source (legal XML) is mapped to a space by
# sources.files._scrub_sentinel on every XML decode path before the
# marker can be injected, so an occurrence here is always the wound.
WOUND_SENTINEL = "\ue000"

_XML_ENT = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}
_ENT_RE = re.compile(r"&(#x?[0-9a-fA-F]+|\w+);")
# DOCTYPE with an ExternalID (SYSTEM or PUBLIC, XML spec [75]) — the
# keyword immediately follows the doctype name, before any [subset]
_EXTERNAL_ID_RE = re.compile(r"DOCTYPE\s+\S+\s+(?:SYSTEM|PUBLIC)\b")


def xml_unescape(s: str) -> str:
    """Resolve the five XML entities + numeric refs.

    Matches xmlSubstituteEntitiesDefault(1) (reference: parser.c:288)
    for well-formed predefined/numeric entities; unknown entities are
    left literal (libxml2 recovery drops/keeps them — the fixture corpus
    contains only predefined ones in XML mode).
    """
    if "&" not in s:
        return s

    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e.startswith("#"):
            try:
                cp = int(e[2:], 16) if e[1] in "xX" else int(e[1:])
                # surrogate-range / out-of-range / NUL refs map to
                # U+FFFD like html.unescape: chr(0xD800) builds a
                # lone-surrogate str that Arrow refuses to serialize
                # ('surrogates not allowed'), killing the whole task
                # instead of error-rowing one document
                if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF or cp == 0:
                    return "�"
                return chr(cp)
            except (ValueError, OverflowError):
                return m.group(0)
        return _XML_ENT.get(e, m.group(0))

    return _ENT_RE.sub(sub, s)


_HTML_REF_RE = re.compile(
    r"&(?:#[xX]([0-9a-fA-F]+);?|#([0-9]+);?|([A-Za-z][A-Za-z0-9]*);)"
)
_HTML_BAD_CHARREF_RE = re.compile(r"&#[xX]?")


def html_unescape(s: str) -> str:
    """Entity resolution as libxml2's HTML parser does it — NOT
    Python's html.unescape (that implements HTML5: legacy semicolon-
    less names, longest-prefix matching, windows-1252 charref remaps,
    U+FFFD for invalid codepoints — all of which diverge from the
    binary). Verified rules: named refs resolve only on an exact
    `&name;` hit in the HTML4 table (htmlentities.HTML_ENTITIES);
    numeric refs resolve with or without ';', keep control codepoints
    raw (&#150; → U+0096), and DISAPPEAR for NUL/surrogates/past
    U+10FFFF; a malformed charref's consumed prefix ('&#'/'&#x')
    disappears too ('&#zz;' → 'zz;')."""
    if "&" not in s:
        return s

    def sub(m: re.Match) -> str:
        name = m.group(3)
        if name is not None:
            return HTML_ENTITIES.get(name, m.group(0))
        cp = int(m.group(1), 16) if m.group(1) else int(m.group(2))
        if cp == 0 or 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
            return ""
        return chr(cp)

    s = _HTML_REF_RE.sub(sub, s)
    if "&#" in s:
        s = _HTML_BAD_CHARREF_RE.sub("", s)
    return s


def html_attr_unescape(s: str) -> str:
    """Entity resolution inside ATTRIBUTE values — one probed
    difference from content (html_unescape): a malformed charref
    (`&#zz;`) or a numeric ref to NUL/a surrogate/past U+10FFFF
    TRUNCATES the value at the ref (content merely drops the ref's
    bytes); named/valid-numeric/semicolon-less forms behave exactly
    like content (probes a1-a12 vs the compiled reference)."""
    if "&" not in s:
        return s
    out = []
    pos = 0
    while True:
        i = s.find("&", pos)
        if i < 0:
            out.append(s[pos:])
            break
        m = _HTML_REF_RE.match(s, i)
        if m is None:
            if _HTML_BAD_CHARREF_RE.match(s, i):
                out.append(s[pos:i])  # malformed charref: truncate
                break
            out.append(s[pos : i + 1])  # bare '&': literal
            pos = i + 1
            continue
        name = m.group(3)
        out.append(s[pos:i])
        if name is not None:
            out.append(HTML_ENTITIES.get(name, m.group(0)))
        else:
            cp = int(m.group(1), 16) if m.group(1) else int(m.group(2))
            if cp == 0 or 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
                break  # invalid codepoint: truncate
            out.append(chr(cp))
        pos = m.end()
    return "".join(out)


# a reference libxml2 accepts without erroring: the 5 predefined
# entities, or a numeric charref (validity of the codepoint is checked
# separately — 0/surrogates/out-of-range are fatal)
_VALID_REF_RE = re.compile(r"&(?:#(\d+);|#[xX]([0-9a-fA-F]+);|(amp|lt|gt|quot|apos);)")
_BAD_NAMED_REF_RE = re.compile(r"&[A-Za-z_:][A-Za-z0-9._:-]*;?")
# a syntactically complete `&name;` — the only invalid-ref shape an
# external-id DTD rescues (it might define the entity); everything
# else wounds even then (probed s6-s8/s12-s13, attrs z1-z6)
_WF_NAMED_REF_RE = re.compile(r"&[A-Za-z_:][A-Za-z0-9._:-]*;")
_BAD_NUM_REF_RE = re.compile(r"&#(?:[xX][0-9a-fA-F]*|\d*)")
# well-formed named refs that are NOT predefined — the shape an
# external-id DTD rescue strips from attribute values (probe z3/z6)
_SOFT_REF_STRIP_RE = re.compile(
    r"&(?!(?:amp|lt|gt|quot|apos);)[A-Za-z_:][A-Za-z0-9._:-]*;"
)


def _bad_ref_consumed(raw: str, i: int) -> int:
    """How many bytes libxml2 eats for the malformed/undefined ref at
    raw[i] (== '&'), mapped empirically: '&broken;' → all 8, '&foo '
    → 4 (name, no ';'), '&#zz;' → 2 (just '&#'), '&;'/'& ' → 1."""
    m = _BAD_NAMED_REF_RE.match(raw, i)
    if m:
        return m.end() - i
    m = _BAD_NUM_REF_RE.match(raw, i)
    if m:
        return m.end() - i
    return 1


def _first_invalid_ref(raw: str) -> tuple[int, int] | None:
    """(offset, consumed) of the first '&' that libxml2 fatals on in
    content — an undefined/unterminated entity, a malformed charref,
    or a numeric ref to NUL/a surrogate/past U+10FFFF — else None."""
    pos = 0
    while True:
        i = raw.find("&", pos)
        if i < 0:
            return None
        m = _VALID_REF_RE.match(raw, i)
        if m:
            if m.group(3):
                pos = m.end()
                continue
            cp = int(m.group(1)) if m.group(1) else int(m.group(2), 16)
            if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
                pos = m.end()
                continue
            return i, m.end() - i  # well-shaped, invalid codepoint
        return i, _bad_ref_consumed(raw, i)


def _attr_ref_badness(v: str) -> int:
    """0 = no invalid refs in this raw attr value; 1 = only well-formed
    `&name;` refs (an external-id DTD rescues these, probe z3/z6);
    2 = a malformed/bare/invalid-numeric ref (wounds even then)."""
    badness = 0
    pos = 0
    while True:
        bad = _first_invalid_ref(v[pos:])
        if bad is None:
            return badness
        i, consumed = bad
        if _WF_NAMED_REF_RE.match(v, pos + i):
            badness = 1
            pos += i + consumed
        else:
            return 2


def _parse_attrs(raw: str, unescape) -> list[tuple[str, str]]:
    if not raw or "=" not in raw and not raw.strip():
        return []
    out = []
    for m in ATTR_RE.finditer(raw):
        k = m.group(1)
        v = m.group(2) or m.group(3) or m.group(4) or ""
        out.append((k, unescape(v)))
    return out


def _split_prefix(name: str) -> tuple[str | None, str]:
    if ":" in name:
        p, _, local = name.partition(":")
        return p, local
    return None, name


def xml_events(text: str):
    """Literal SAX-like event LIST for XML (recovering) — returns a
    list for the same reason html_events does (generator suspend/resume
    overhead on the parse kernel); every consumer just iterates.

    Text events carry a third slot: the RAW slice for markup text
    (same object as the unescaped string when it holds no entity, so
    no extra allocation), or None for CDATA content. The parser's
    wounded mode (post-TAG_NAME_MISMATCH, see parser._consume_markup)
    needs both: libxml2 then delivers literal bytes with entity/charref
    expansions REMOVED and drops CDATA blocks entirely.
    """
    out: list = []
    append = out.append
    pos = 0
    for m in MARKUP_RE.finditer(text):
        if m.start() < pos:
            continue  # inside a fatal comment's extended consumption
        if m.start() > pos:
            raw = text[pos : m.start()]
            append(("text", xml_unescape(raw), raw))
        pos = m.end()
        # one C-level call for all groups beats 4-8 named lookups
        comment, cdata, doctype, decl, pi, close, name, rawattrs, selfclose = (
            m.group(
                "comment", "cdata", "doctype", "decl", "pi",
                "close", "name", "attrs", "selfclose",
            )
        )
        if comment is not None:
            if "--" in comment or comment.endswith("-"):
                # XML forbids '--' inside a comment (and a '-' right
                # before the terminator): libxml2 fatals — NO comment
                # callback, consumption resyncs at the next '-->'
                # AFTER the offending hyphens (EOF if none), and the
                # parse is WOUNDED from there: element callbacks stop,
                # text keeps flowing wound-style ('a<!-- x -- y -->'
                # '<title>t</title>b' indexes the merged 'atb'; probes
                # c7/d1-d6/e1-e5 vs the compiled reference)
                cstart = m.start() + 4
                q = comment.find("--")
                bad_abs = cstart + (q if q >= 0 else len(comment) - 1)
                nxt = text.find("-->", bad_abs + 2)
                pos = nxt + 3 if nxt >= 0 else len(text)
                append(("wound",))
                continue
            append(("comment", comment))
        elif cdata is not None:
            append(("text", cdata, None))  # None raw: CDATA (see above)
        elif doctype is not None:
            # DOCTYPE has its own bracket-aware alternative so an
            # internal subset's `>`s don't truncate the lex (the old
            # generic decl match left `]>` behind as fatal pre-root
            # text). A bare/internal-subset-only DOCTYPE changes
            # nothing (six wound shapes probed token-identical), but
            # an EXTERNAL-id DOCTYPE (SYSTEM/PUBLIC) flips libxml2
            # into benign-skip recovery for invalid entity refs — the
            # unloadable DTD might define them, so no wound (probes
            # r1-r8, s1-s13 vs the compiled reference)
            if _EXTERNAL_ID_RE.match(doctype):
                append(("dtd",))
        elif decl is not None or pi is not None:
            continue
        else:
            prefix, local = _split_prefix(name)
            if close:
                append(("end", local, prefix))
            else:
                # namespace declarations are NOT attributes: libxml2's
                # SAX2 layer consumes xmlns/xmlns:* before the callbacks,
                # so the reference's bake_tag attr loop (parser.c:599-607)
                # never sees them — under UndefinedXMLAttributes
                # auto/index/error they must not mint metanames or index
                # their URI values. And the reference's SAX2→atts shim
                # (mystartElementNs, parser.c:897-911) writes NULL into
                # the NAME slot of any EMPTY-valued attribute, so every
                # atts[i] != NULL consumer loop stops there: a tag's
                # attributes are visible only up to (excluding) the
                # first one with an empty value.
                attrs = []
                nsdecls = []
                badattr = 0
                if rawattrs and "&" in rawattrs:
                    # an invalid entity ref in an ATTRIBUTE value wounds
                    # the parse AT THE START TAG — the element fires no
                    # callbacks, its attrs are never indexed (probes
                    # x1-x7/y1-y7/z1-z7 under the attr-indexing config).
                    # An external-id DTD rescues only well-formed
                    # `&name;` refs: the value is kept with those refs
                    # stripped. Raw-value scan first, then unescape.
                    raw_pairs = _parse_attrs(rawattrs, str)
                    for k, v in raw_pairs:
                        b = _attr_ref_badness(v)
                        if b > badattr:
                            badattr = b
                            if b == 2:
                                break
                    for k, v in raw_pairs:
                        if badattr == 1:
                            v = _SOFT_REF_STRIP_RE.sub("", v)
                        v = xml_unescape(v)
                        if k.startswith("xmlns"):
                            if k.startswith("xmlns:"):
                                nsdecls.append((k[6:], v))
                            continue
                        if v == "":
                            break
                        attrs.append((k, v))
                else:
                    for k, v in _parse_attrs(rawattrs or "", xml_unescape):
                        if k.startswith("xmlns"):
                            if k.startswith("xmlns:"):
                                nsdecls.append((k[6:], v))
                            continue
                        if v == "":
                            break
                        attrs.append((k, v))
                if badattr:
                    append((
                        "start", local, attrs, prefix,
                        bool(selfclose), nsdecls, badattr,
                    ))
                else:
                    append((
                        "start", local, attrs, prefix,
                        bool(selfclose), nsdecls,
                    ))
                if selfclose:
                    append(("end", local, prefix))
    if pos < len(text):
        raw = text[pos:]
        append(("text", xml_unescape(raw), raw))
    return out


_RAWTEXT_STOP = re.compile(r"</[A-Za-z]")


def _rawtext_step(text: str, pos: int, n: int):
    """One libxml2 script/style scan step from ``pos``.

    The rawtext scan stops at ``</`` + ASCII letter (ANY letter —
    ``</scr>`` stops a <script> scan; ``</0>`` and ``</ x`` do not,
    probed rb1-rb7/sc1-sc2). The stop's end tag is then parsed
    NORMALLY — htmlAutoCloseOnClose applies, so ``</span>`` with span
    on the stack pops the open script implicitly (probed: zero-token
    '<span><script></span>…'), a not-open name is a dropped bogus
    close, and rawtext RESUMES whenever the element survived. The tag
    is consumed to its first '>', which can swallow even the real
    ``</script>`` (probe sc1); unterminated at EOF it is dropped.

    Returns (run, close_name, resume): the literal text run, the
    lowercased end-tag name at the stop (None at EOF), and the offset
    after the consumed tag.
    """
    mm = _RAWTEXT_STOP.search(text, pos)
    if mm is None:
        return text[pos:n], None, n
    s = mm.start()
    run = text[pos:s]
    j = s + 2
    while j < n and (
        "a" <= text[j] <= "z"
        or "A" <= text[j] <= "Z"
        or "0" <= text[j] <= "9"
        or text[j] in "-_:."
    ):
        j += 1
    gt = text.find(">", s)
    if gt < 0:
        return run, None, n  # unterminated close at EOF: dropped
    return run, text[s + 2 : j].lower(), gt + 1

# libxml2's HTML parser IMPLIES <body> before any flow content that
# appears without one (htmlParser's implied-element handling): tags in
# this set may appear before/without body, anything else — or a
# non-whitespace text node — auto-opens body first. This matters
# because the default config aliases body → swishdescription
# (config.c:369-371): '<html><p>some text' must land in the
# swishdescription property exactly like the reference (verified
# live: the compiled binary buckets html_broken.html's text there).
_PRE_BODY_TAGS = frozenset(
    ("html", "head", "title", "meta", "link", "base", "basefont",
     "script", "style", "isindex")
)


def html_events(text: str):
    """Lenient HTML event list (libxml2 htmlParser equivalents).

    Single finditer pass; rawtext (script/style) content is consumed by
    advancing ``last`` past it, and finditer matches inside the consumed
    region are skipped.

    Returns a LIST (not a generator): the ~1 microsecond suspend/resume
    per yielded event was ~25 % of scan+consume on the parse kernel —
    building the list and iterating it is measurably faster, and every
    consumer just iterates.
    """
    out: list = []
    append = out.append
    stack: list[str] = []
    last = 0
    n = len(text)
    rawtext_until: str | None = None
    body_seen = False
    # prolog_done: any element opened or text delivered — a DOCTYPE
    # after that point is MISPLACED, and libxml2 then lexes the
    # immediately-adjacent next `</…`/`<!…` construct as bogus text
    # (probes v4-v6, y1-y7, z1-z5, w1-w7: closes and doctypes go
    # literal, start tags/comments/PIs parse normally, any gap —
    # even whitespace — defuses it)
    prolog_done = False
    bogus_at = -1
    # implied-head context: a head element (meta/title/script/…) at the
    # top opens an implied <head>; a KNOWN body tag then forces the
    # head→body transition, but table-internal and UNKNOWN tags NEST in
    # the head instead — their content never reaches body/
    # swishdescription ('<meta …><td>word' — probed vs the binary;
    # '<meta …><td>w<p>x' stays in head through the nesting too)
    in_head = False

    def _imply_body():
        # libxml2: flow content without a <body> opens one implicitly
        stack.append("body")
        return ("start", "body", [], None, False)

    def _do_close(name):  # appends end events (no generator round-trip)
        # libxml2 htmlAutoCloseOnClose: an end tag may pop the
        # elements above its (topmost) match ONLY when none of them
        # has a HIGHER end priority (htmlEndPriority: div 150 < td
        # 160 < table 170 < head 180 < body 190 < html 200, default
        # 100) — '</div>' cannot force a <td> closed, '</td>' cannot
        # force a <table> closed; such an end tag is IGNORED entirely
        # (probed matrix vs the compiled binary). A close whose tag is
        # not open at all is a dropped bogus end tag.
        if name not in stack:
            return
        if stack[-1] != name:
            idx = len(stack) - 1 - stack[::-1].index(name)
            pr = _END_PRIORITY.get(name, 100)
            if any(
                _END_PRIORITY.get(t, 100) > pr for t in stack[idx + 1 :]
            ):
                return
        # pop everything above, then the element itself
        while stack:
            top = stack.pop()
            append(("end", top, None))
            if top == name:
                break

    def _imply_body_p():
        # TEXT outside body implies <body> AND <p> (traced: 'word'
        # alone opens html/body/p; a later </p> or block tag really
        # pops it — probe y4's `</p>` bumps only with the p open).
        # Tag-triggered implication opens body only.
        append(_imply_body())
        stack.append("p")
        append(("start", "p", [], None, False))

    def _deliver(raw):
        # text delivery with the implied-body dance. Literal '<'s from
        # bogus constructs are delivered BEFORE the implied open —
        # libxml2 emits them pre-tree, so the implied-open bumper lands
        # AFTER the '<' bytes (probes u2/u3/v8/z4: '<< x' buffers
        # '<<\x03 x', not '\x03<< x'). Entity-produced '<' (&lt;) is
        # normal text — the check is on the RAW slice.
        nonlocal body_seen, prolog_done
        if (
            raw
            and raw[0] == "<"
            and not body_seen
            and (not stack or stack == ["html"])
        ):
            pre = len(raw) - len(raw.lstrip("<"))
            prolog_done = True
            append(("text", raw[:pre]))
            rest = raw[pre:]
            if rest:
                if rest.strip():
                    body_seen = True
                    _imply_body_p()
                append(("text", html_unescape(rest)))
            return
        if raw and not prolog_done and not stack and not body_seen:
            # pre-tree text: libxml2 splits the LEADING blank run into
            # its own ignorable-whitespace callback (areBlanks: node
            # NULL) and swish's ignorableWhitespace handler is NULL
            # (parser.c:1472) — it never reaches the buffer; the
            # remainder then implies body. Blanks inside html/head ARE
            # delivered (fixture t.html pins the resulting leading
            # bumper gap), and blanks AFTER any delivered content
            # (e.g. a literal '<') are normal text — probed
            # '<?pi x> rest' drops the gap, '<< x' keeps it.
            raw = raw.lstrip(" \t\r\n")
        chunk = html_unescape(raw)
        if not chunk.strip() and not stack and not body_seen:
            # whitespace-only (or fully-consumed) text before ANY
            # element is ignorable
            return
        if (
            not body_seen
            and chunk.strip()
            and (not stack or stack == ["html"])
        ):
            body_seen = True
            _imply_body_p()
        prolog_done = True
        append(("text", chunk))

    for m in HTML_MARKUP_RE.finditer(text):
        if m.start() < last:
            continue  # inside already-consumed rawtext
        if rawtext_until is not None:
            # closes are processed HERE (not via finditer — a
            # '<'-spanning tag inside the rawtext can swallow the real
            # close from the regex's view, probe rc6's 'if(a<b)x');
            # rawtext resumes until the element actually leaves the
            # stack (probe re1: '<b>' after a bogus '</scr>' stays
            # literal; probe m2: '</span>' auto-closes the script)
            while rawtext_until is not None:
                run, cname, last = _rawtext_step(text, last, n)
                if run:
                    append(("text", run))
                if cname is None:
                    rawtext_until = None
                else:
                    _do_close(cname)
                    if rawtext_until not in stack:
                        rawtext_until = None
            if m.start() < last:
                continue
        if m.start() > last:
            # hot path: once body is open, text needs none of the
            # implied-element / pre-tree dance — keep it inline (the
            # generator round-trip measurably slows the parse kernel)
            if body_seen:
                prolog_done = True
                append(("text", html_unescape(text[last : m.start()])))
            else:
                _deliver(text[last : m.start()])
        # hot path first: a real tag match needs only 4 of the 7 groups
        # (one C-level multi-group call per branch instead of all 7)
        name = m.group("name")
        if name is None:
            comment, doctype, pi = m.group("comment", "doctype", "pi")
            if doctype is not None and m.start() == bogus_at:
                # immediately after a misplaced DOCTYPE, another DOCTYPE
                # lexes as bogus text: '<' delivers now and scanning
                # resumes at the next byte
                bogus_at = -1
                prolog_done = True
                append(("text", "<"))
                last = m.start() + 1
                continue
            bogus_at = -1
            last = m.end()
            if comment is not None:
                append(("comment", comment))
            elif doctype is not None:
                if prolog_done:
                    bogus_at = m.end()
            # pi: skipped; unterminated tag at EOF (`<p>a<title`):
            # libxml2 drops it entirely — the element never opens
            # (probes q1-q5)
            continue
        close, rawattrs, selfclose = m.group("close", "attrs", "selfclose")
        if close and m.start() == bogus_at:
            # a close tag immediately after a misplaced DOCTYPE lexes
            # as bogus text (see above)
            bogus_at = -1
            prolog_done = True
            append(("text", "<"))
            last = m.start() + 1
            continue
        bogus_at = -1
        last = m.end()
        name = name.lower()
        prolog_done = True
        if close:
            if name == "head":
                # an explicitly closed head exits head context: a
                # following <td> then forces body like any block tag
                in_head = False
            # hot path: a properly-nested close (stack top) needs no
            # auto-close/priority logic — keep it inline
            if stack and stack[-1] == name:
                stack.pop()
                append(("end", name, None))
            else:
                _do_close(name)
            continue
        if name == "body":
            body_seen = True
        elif name in _PRE_BODY_TAGS:
            if name != "html":
                in_head = True
        elif not body_seen:
            if in_head and (
                name not in KNOWN_TAGS
                or name in TABLE_INTERNAL
                or any(
                    t not in KNOWN_TAGS or t in TABLE_INTERNAL
                    for t in stack
                )
            ):
                pass  # nests inside the (implied) head
            else:
                body_seen = True
                append(_imply_body())
        # implied end tags
        closers = AUTO_CLOSE.get(name)
        if closers:
            while stack and stack[-1] in closers:
                append(("end", stack.pop(), None))
        # libxml2's HTML parser lowercases attribute NAMES (values keep
        # case): without this, <META NAME=... CONTENT=...> never hits
        # bake_tag's case-sensitive k == "name" meta path and the
        # content silently vanishes from the index
        if rawattrs:
            attrs = [
                (k.lower(), v)
                for k, v in _parse_attrs(rawattrs, html_attr_unescape)
            ]
        else:
            attrs = []
        void = name in VOID_TAGS
        append(("start", name, attrs, None, void))
        if void or selfclose:
            append(("end", name, None))
        else:
            stack.append(name)
            if name in RAWTEXT_TAGS:
                rawtext_until = name
    while rawtext_until is not None:
        run, cname, last = _rawtext_step(text, last, n)
        if run:
            append(("text", run))
        if cname is None:
            rawtext_until = None
        else:
            _do_close(cname)
            if rawtext_until not in stack:
                rawtext_until = None
    if last < n:
        # tail text in a markup-free (or post-</html>) document still
        # opens the implied <body> — libxml2 wraps ANY bare flow
        # content, so body's swishdescription alias must see it; a
        # whitespace-only tail outside body is ignorable (see above)
        if body_seen:
            append(("text", html_unescape(text[last:])))
        else:
            _deliver(text[last:])
    while stack:
        append(("end", stack.pop(), None))
    return out
