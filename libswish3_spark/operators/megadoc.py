"""Mega-document segmentation: intra-document parallelism for TXT.

``salt_by_size`` spreads big documents across tasks, but a single
multi-GB text document still parses on one core (the skew unit the
reference guards with its 100 MB cap, libswish3.h:177). For plain-text
payloads the parse is segmentable: token positions are a prefix sum, so
segments can tokenize independently and reassemble order-preserving:

    Arrow kernel: slice at whitespace near seg_chars boundaries
      → repartition  →  extract() per segment (narrow, parallel)
      → window prefix-sum of per-segment token counts
      → shift each segment's span orders by its offset
      → (optional) groupBy(doc) sorted-flatten + title-from-path tail

Markup documents cannot be split blindly (a segment boundary inside a
tag breaks the state machine). The HTML analogue below segments at
PARSER-NEUTRAL boundaries: between top-level children of <body> (or the
document root for fragments), outside comments/rawtext, with the
noindex counter at zero. At such a point the single-pass parser state
is fully reconstructible — the open-element chain is at most
[html, body], which continuation segments re-open synthetically — so
word spans, positions, nwords and the metanames map reproduce the
unsegmented extraction byte-for-byte (test_megadoc). Two caveats,
by construction of the reference's semantics:

* property VALUES (cleanwsp buckets like swishdescription) may differ
  in whitespace immediately adjacent to a cut: the single pass
  edge-strips its one big buffer once, the segmented path strips each
  fragment (fragments join with the same \\x03 the single pass would
  have inserted, so token-relevant content is identical). The deviation
  is PINNED by test_megadoc.test_segment_cut_property_whitespace_
  deviation_is_pinned: whitespace-NORMALIZED parity always holds, and
  any byte-level difference is confined to cleanwsp buckets;
* configs with statically-declared mid-body MetaNames ARE handled: the
  cut scanners derive the buffer-flush tag set from the config
  (_config_flush_tags) and the reassembly inserts the inter-flush
  bumper _nb_add would (test: custom <chapter/> MetaName parity).
  Configs the literal scanner can NOT model — dynamically auto-vivified
  metanames (UndefinedMetaTags auto/autoall/ignore/error), flattened
  DOM-path aliases, XML attribute metanames (XMLClassAttributes /
  UndefinedXMLAttributes), cascade-meta-context — are GUARDED at
  runtime (config_supports_segmentation): the router parses every
  document whole through the plain parser instead of silently
  producing shifted positions.

Routing is a SINGLE pass: one Arrow kernel per entry point reads each
input row once and emits either per-segment rows (parser=TXTSEG/
HTMLSEG/XMLSEG) or one whole-document row (parser=TXTW/HTMLW/XMLW —
plain parse, doc_id tail-marked for the uniform downstream strip).
The old where(pred)/where(~pred) union read the source twice; at
100 TB that doubled scan I/O for every segmented job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from libswish3_spark.functions.text import TOKEN_PATTERN
from libswish3_spark.pipeline import extract

_SEG_SEP = "\x02"  # rides inside doc_id through the fixed kernel schema


def _config_flush_tags(config=None) -> frozenset:
    """Tags whose open/close flushes (empties) the parser's meta buffer:
    bake(tag) is meta-defined — literal metaname tags plus tag aliases
    targeting a metaname (parser.py open_tag/close_tag flush rule).
    Derived from the config so segmentation seeds correctly for custom
    MetaName configs, not just the default (title→swishtitle). Limits:
    dynamically auto-vivified metanames (UndefinedMetaTags auto/autoall)
    and flattened-DOM-path aliases are not modeled — use the
    unsegmented path for those configs."""
    from libswish3_spark.config import default_config

    cfg = config or default_config()
    tags = set(cfg.metanames)
    for t, target in cfg.tag_aliases.items():
        if target in cfg.metanames:
            tags.add(t)
    return frozenset(tags)


def config_supports_segmentation(config=None) -> bool:
    """True iff the cut scanners model this config's flush/position
    semantics exactly. The scanners are LITERAL tag matchers: any
    config feature that decides flushes or content suppression from
    runtime state they don't track must run unsegmented (reference
    semantics: parser.c:454-498, 565-672, 679-720, 728-747):

    * ``UndefinedMetaTags`` other than the default ``index`` —
      auto/autoall vivify new metanames (new flush tags) mid-parse,
      ignore suppresses content regions, error aborts;
    * ``UndefinedXMLAttributes`` other than ``disable`` and
      ``XMLClassAttributes`` — attributes become metaname/composite-tag
      candidates the scanners don't see;
    * dotted (flattened-DOM-path) metanames or tag aliases — flush
      decisions depend on the full element path, not the bare tag;
    * ``CascadeMetaContext`` — buffer fan-out to every open metaname.

    The megadoc router consults this ONCE (driver-side) and routes the
    whole input through the plain parser when it returns False — wrong
    answers are not an acceptable failure mode for a config knob.
    """
    from libswish3_spark.config import (
        CLASS_ATTRIBUTES,
        UNDEF_DISABLE,
        UNDEF_INDEX,
        default_config,
    )

    cfg = config or default_config()
    if cfg.undef_metas != UNDEF_INDEX:
        return False
    if cfg.undef_attrs != UNDEF_DISABLE:
        return False
    if cfg.stringlists.get(CLASS_ATTRIBUTES):
        return False
    if cfg.cascade_meta_context:
        return False
    if any("." in n for n in cfg.metanames):
        return False
    if any("." in a or "." in t for a, t in cfg.tag_aliases.items()):
        return False
    return True


def _config_reset_exempt(config=None) -> frozenset:
    """Tags that do NOT reset the XML noindex counter: the parser's
    default UndefinedMetaTags=index policy resets ``ignore_content`` at
    any XML tag (start OR close — close_tag re-bakes) that is neither a
    defined metaname nor an alias (parser.py bake_tag:336-338,
    parser.c:708-717). The XML cut scanner must model the reset or its
    text_seen goes stale after ``<!--noindex-->…<tag>`` and the next
    cut's bumper seed is wrong (off-by-one positions)."""
    from libswish3_spark.config import default_config

    cfg = config or default_config()
    return frozenset(cfg.metanames) | frozenset(cfg.tag_aliases)


_FLUSH_TAGS = _config_flush_tags(None)  # default-config sets
_RESET_EXEMPT = _config_reset_exempt(None)
import re as _re


def _txt_segments(doc_id: str, text: str, seg_chars: int, count) -> list:
    """One TXT document → [(tail-encoded id, segment text)].

    Slices at whitespace just past each seg_chars boundary so no token
    straddles a cut. The position prefix-sum is computed HERE, where the
    doc is whole — no cluster-wide window over the span payload later.
    count() end-pos includes bumper gaps, so segment-local positions +
    offset == global positions, and the doc total seeds the title tail
    exactly where the unsegmented position counter would sit.
    Count-only: the full tokenize happens exactly once, in extract().
    """
    segs: list[str] = []
    start = 0
    n = len(text)
    while n - start > seg_chars:
        cut = start + seg_chars
        while cut < n and not text[cut].isspace():
            cut += 1
        segs.append(text[start:cut])
        start = cut
    segs.append(text[start:])
    offsets = []
    pos = 0
    for seg in segs:
        offsets.append(pos)
        pos += count(seg)
    return [
        (f"{doc_id}{_SEG_SEP}{i}{_SEG_SEP}{offsets[i]}{_SEG_SEP}{pos}", seg)
        for i, seg in enumerate(segs)
    ]


_SEG_LABEL = {"txt": "TXTSEG", "html": "HTMLSEG", "xml": "XMLSEG"}
_WHOLE_LABEL = {"txt": "TXTW", "html": "HTMLW", "xml": "XMLW"}
_ROUTER_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>, parser string"
)


def _router_kernel(family: str, seg_chars: int, config=None):
    """ONE input pass that both segments and routes (the old
    where(pred)/where(~pred) union scanned the source twice).

    Per row: a single-text-span document under a scanner-supported
    config emits per-segment rows (parser=*SEG); anything else —
    multi-span/media docs, null spans, or ANY doc when
    config_supports_segmentation is False — emits one whole-document
    row (parser=*W: plain parse downstream, full fidelity). Whole rows
    carry the same 3-field doc_id tail (idx 0, 0, nseg/total marker) so
    the downstream tail-strip is uniform; parse_to_state strips it
    before plain parsing.
    """
    seg_label = _SEG_LABEL[family]
    whole_label = _WHOLE_LABEL[family]
    allow = config_supports_segmentation(config)
    flush_tags = _config_flush_tags(config)
    reset_exempt = _config_reset_exempt(config)
    whole_tail = f"{_SEG_SEP}0{_SEG_SEP}0{_SEG_SEP}" + ("0" if family == "txt" else "1")
    title_re = _re.compile(TOKEN_PATTERN)

    def fn(batches):
        import pyarrow as pa

        if family == "txt":
            from libswish3_spark.tokenizer import (
                count_positions,
                count_positions_with,
                resolve_tokenizer,
                split_tokens,
            )

            # offsets must be counted with the tokenizer extract() will
            # use: the fast finditer counter only matches the default
            tok = (
                resolve_tokenizer(config) if config is not None else split_tokens
            )
            if tok is split_tokens:
                count = count_positions
            else:
                count = lambda text: count_positions_with(text, tok)

        spans_type = pa.list_(
            pa.struct(
                [
                    pa.field("kind", pa.string()),
                    pa.field("text", pa.string()),
                    pa.field("media_ref", pa.string()),
                    pa.field("offset", pa.int32()),
                ]
            )
        )
        out_schema = pa.schema(
            [("doc_id", pa.string()), ("spans", spans_type), ("parser", pa.string())]
        )
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            spans_py = batch.column("spans").to_pylist()
            o_id: list[str] = []
            o_spans: list = []
            o_parser: list[str] = []
            for doc_id, spans in zip(doc_ids, spans_py):
                if (
                    allow
                    and spans is not None
                    and len(spans) == 1
                    and spans[0] is not None  # null struct element
                    and spans[0]["kind"] == "text"
                ):
                    text = spans[0]["text"] or ""
                    if family == "txt":
                        # the reassembly's title-from-path tail uses the
                        # ASCII TOKEN_PATTERN; the plain parse tokenizes
                        # state.uri with the ENGINE tokenizer. Segment
                        # only when the two agree on this doc_id —
                        # underscore runs (edge-stripped to nothing) or
                        # non-ASCII paths route whole for exact parity
                        if tok(doc_id) == title_re.findall(doc_id.lower()):
                            pieces = _txt_segments(doc_id, text, seg_chars, count)
                        else:
                            pieces = []
                    elif family == "html":
                        pieces = _html_segments(doc_id, text, seg_chars, flush_tags)
                    else:
                        pieces = _xml_segments(
                            doc_id, text, seg_chars, flush_tags, reset_exempt
                        )
                    if not pieces:
                        o_id.append(doc_id + whole_tail)
                        o_spans.append(spans)
                        o_parser.append(whole_label)
                        continue
                    for tail_id, seg_text in pieces:
                        o_id.append(tail_id)
                        o_spans.append(
                            [
                                {
                                    "kind": "text",
                                    "text": seg_text,
                                    "media_ref": "",
                                    "offset": 0,
                                }
                            ]
                        )
                        o_parser.append(seg_label)
                else:
                    o_id.append(f"{doc_id}{whole_tail}")
                    o_spans.append(spans)
                    o_parser.append(whole_label)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, pa.string()),
                    pa.array(o_spans, spans_type),
                    pa.array(o_parser, pa.string()),
                ],
                schema=out_schema,
            )

    return fn


def segment_text_docs(
    docs: DataFrame, seg_chars: int = 1 << 20, config=None
) -> DataFrame:
    """docs(doc_id, spans) → one row per TXT segment (plus one whole-doc
    TXTW row per non-segmentable document; see _router_kernel).

    Segmentation runs in an Arrow kernel (O(length) string slicing at
    whitespace boundaries) — JVM array formulations re-evaluate the
    word split per segment, which is quadratic on mega-documents.
    """
    from libswish3_spark.pipeline import ensure_parallelism

    pruned = ensure_parallelism(docs.select("doc_id", "spans"))
    return pruned.mapInArrow(
        _router_kernel("txt", seg_chars, config), schema=_ROUTER_SCHEMA
    )


def extract_txt_segmented_rows(
    docs: DataFrame, config=None, seg_chars: int = 1 << 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """The scalable form: one output row per segment with *globally
    correct* span orders (window prefix-sum of per-segment counts).
    Accepts ANY docs: non-segmentable rows (multi-span/media, or any
    row under a guarded config) come back as single whole-document rows
    with parser='TXTW' (plain parse, title already included).

    This is the shape to keep at scale — a 10^9-token document stays
    exploded, and the span payload never shuffles: the position offset
    of every segment is precomputed by the segmentation kernel (which
    sees the document whole), rides inside the segment doc_id, and the
    global shift is a narrow per-row transform. Segments are
    hash-redistributed before extraction (mapInArrow keeps children in
    the parent's partition, which would serialize the very document we
    segmented to parallelize).
    """
    seg = segment_text_docs(docs, seg_chars, config)
    sc = docs.sparkSession.sparkContext
    seg = seg.repartition(num_partitions or sc.defaultParallelism * 2, "doc_id")
    # the extraction kernel applies the offset at span-append time (it
    # reads the doc_id tail for TXTSEG), so orders arrive global already.
    # The three kernel-appended fields are parsed from the RIGHT so a
    # doc_id that itself contains the separator stays intact.
    seg_out = extract(seg, config=config, spread=False)
    parts = F.split("doc_id", _SEG_SEP)
    return seg_out.select(
        F.array_join(F.slice(parts, 1, F.size(parts) - 3), _SEG_SEP).alias("orig_id"),
        F.element_at(parts, -3).cast("int").alias("seg_idx"),
        F.element_at(parts, -1).cast("int").alias("doc_end_pos"),
        "nwords",
        "spans",
        "parser",
    )


def segmented_nwords(docs: DataFrame, config=None, seg_chars: int = 1 << 20) -> DataFrame:
    """doc_id → nwords via the segmented path (counts only — no span
    payload ever shuffles). Includes the title-from-path tokens (whole
    TXTW rows already counted theirs in the plain parse)."""
    rows = extract_txt_segmented_rows(docs, config, seg_chars)
    title_toks = F.regexp_extract_all(F.lower("doc_id"), F.lit(TOKEN_PATTERN), 0)
    return (
        rows.groupBy(F.col("orig_id").alias("doc_id"))
        .agg(
            F.sum("nwords").alias("body_words"),
            F.max(F.col("parser") == "TXTW").alias("is_whole"),
        )
        .select(
            "doc_id",
            F.when(F.col("is_whole"), F.col("body_words"))
            .otherwise(F.col("body_words") + F.size(title_toks))
            .cast("long")
            .alias("nwords"),
        )
    )


def _html_cut_scan(
    text: str, seg_chars: int, flush_tags: frozenset = _FLUSH_TAGS
):
    """Find parser-neutral cut offsets in one HTML document.

    Position-tracking twin of events.html_events' consume loop (same
    HTML_MARKUP_RE, same auto-close/void/rawtext handling) that tracks only
    the open-element stack, the noindex counter and whether any text has
    been buffered. Cost is O(tags) with tiny per-tag work — no
    tokenization, no attribute parsing, no buffer building.

    Returns (cuts, seeds, chains): byte offsets where a segment may end,
    whether the meta buffer is non-empty there (the pending-bumper seed),
    and the open-element chain (⊆ {html, body}) the next segment must
    re-open.
    """
    from libswish3_spark.events import _PRE_BODY_TAGS, HTML_MARKUP_RE
    from libswish3_spark.htmltags import (
        AUTO_CLOSE,
        INLINE_TAGS,
        KNOWN_TAGS,
        RAWTEXT_TAGS,
        TABLE_INTERNAL,
        VOID_TAGS,
    )

    cuts: list[int] = []
    seeds: list[int] = []
    chains: list[tuple[str, ...]] = []
    stack: list[str] = []
    last = 0
    seg_start = 0
    n = len(text)
    rawtext_until: str | None = None
    ignore = 0
    # text since the last meta-buffer flush (see _xml_cut_scan note):
    # open/close of a meta-defined tag empties the parser's buffer, so
    # only text after the latest flush leaves a pending bumper at a cut
    text_seen = False
    # bump_word twin (parser.c:399-424): each KNOWN tag open/close
    # overwrites bump_word — an INLINE tag between a cut tag and the
    # next text CANCELS the cut tag's bump, so the single pass FUSES
    # the token across the cut ('</script><td><script>var' glues
    # 'xy'+'var'). A seeded cut is provisional until the next buffered
    # text confirms the bump survived; otherwise it is cancelled
    # (fuzz-caught vs the plain parse).
    bump = True
    pending_cuts = 0
    pending_prev_seg = 0
    # implied-head twin (events.html_events): a table-internal tag
    # inside head context NESTS in the head — body is never implied
    # there, so a cut's [html, body] chain replay would diverge
    in_head = False
    # misplaced-DOCTYPE adjacency (events.html_events twin): after a
    # mid-content DOCTYPE, an immediately-adjacent close/DOCTYPE lexes
    # as bogus text, so it must not pop the stack here
    prolog_done = False
    bogus_at = -1

    def note_text(s: str) -> None:
        nonlocal text_seen, prolog_done, bump, pending_cuts, seg_start
        if s:
            # pre-tree whitespace-only text is ignorable (html_events
            # drops it) — it must not mark the prolog as done
            if s.strip() or stack:
                prolog_done = True
            if not ignore:
                if pending_cuts and not bump and not s[0].isspace():
                    # the single pass reaches this text with NO pending
                    # bump (an inline tag cancelled the cut tag's) and
                    # a non-empty buffer: the token FUSES across the
                    # provisional cut(s) — cancel them
                    del cuts[-pending_cuts:]
                    del seeds[-pending_cuts:]
                    del chains[-pending_cuts:]
                    seg_start = pending_prev_seg
                pending_cuts = 0
                text_seen = True
                bump = False

    def do_close(name: str) -> None:
        # html_events._do_close twin: bogus closes dropped; a real
        # close pops every element above it, and each popped flush tag
        # DID flush (implied end events → close_tag). The LAST pop
        # re-bakes the named tag: bump_word follows its inline rule
        # (dropped bogus closes leave bump untouched — 'a_b</table>end'
        # fuses in the binary)
        nonlocal text_seen, bump
        if name in stack:
            idx = len(stack) - 1 - stack[::-1].index(name)
            popped = stack[idx:]
            del stack[idx:]
            if any(t in flush_tags for t in popped):
                text_seen = False
            if name in KNOWN_TAGS:
                bump = name not in INLINE_TAGS

    for m in HTML_MARKUP_RE.finditer(text):
        if m.start() < last:
            continue
        if rawtext_until is not None:
            from libswish3_spark.events import _rawtext_step

            # closes processed here (html_events twin): rawtext
            # resumes until the element actually leaves the stack
            while rawtext_until is not None:
                run, cname, last = _rawtext_step(text, last, n)
                note_text(run)
                if cname is None:
                    rawtext_until = None
                else:
                    do_close(cname)
                    if rawtext_until not in stack:
                        rawtext_until = None
            if m.start() < last:
                continue
        note_text(text[last : m.start()])
        if (
            m.group("close") or m.group("doctype") is not None
        ) and m.start() == bogus_at:
            bogus_at = -1
            note_text("<")
            last = m.start() + 1
            continue
        bogus_at = -1
        last = m.end()
        if m.group("comment") is not None:
            # noindex/index toggles (parser.c:1321-1388 incl. SwishCommand)
            t = m.group("comment").strip()
            if t.lower().startswith("swishcommand"):
                t = t[len("swishcommand") :].strip()
            tl = t.lower()
            if tl == "noindex":
                ignore += 1
            elif tl == "index" and ignore > 0:
                ignore -= 1
            continue
        if m.group("doctype") is not None:
            if prolog_done:
                bogus_at = m.end()
            continue
        if m.group("pi") is not None:
            # bogus `<!…`/`<![CDATA[` constructs are NOT matched by
            # HTML_MARKUP_RE — they fall into the text slices above,
            # exactly as html_events delivers them as literal text
            continue
        if m.group("name") is None:
            continue  # unterminated tag at EOF: dropped (html_events twin)
        name = m.group("name").lower()
        prolog_done = True
        if m.group("close"):
            if name == "head":
                in_head = False
            do_close(name)
            continue
        if name == "meta":
            # <meta name content>: content buffers invisibly to this
            # scanner (parser.py bake_tag meta branch, attrs parsed with
            # the SAME ATTR_RE as html_events — a regex over the raw tag
            # matched 'name=' inside other attribute VALUES). Defined
            # metaname → its own open/close flush pair (net: buffer
            # empty, even under noindex — open_tag's flush is
            # unconditional); undefined (default policy: index) →
            # non-empty content joins the CURRENT buffer when not
            # suppressed by noindex.
            from libswish3_spark.events import _parse_attrs, html_attr_unescape

            attrs = _parse_attrs(m.group("attrs") or "", html_attr_unescape)
            metaname = next((v for k, v in attrs if k == "name"), None)
            metacontent = next((v for k, v in attrs if k == "content"), None)
            if metaname is not None and metacontent is not None:
                if metaname.lower() in flush_tags:
                    text_seen = False
                elif metacontent and ignore == 0:
                    text_seen = True
                if ignore == 0:
                    # content buffers (even empty) → eats any pending
                    # bump; it lands in its own metaname bucket, so no
                    # fusion with the main buffer — just resolve cuts
                    pending_cuts = 0
                    bump = False
            elif name in KNOWN_TAGS:
                bump = name not in INLINE_TAGS
            continue
        # cut BEFORE this start tag if, after its implied closes, only
        # html/body remain open — i.e. it begins a top-level body child
        peek = len(stack)
        closers = AUTO_CLOSE.get(name)
        if closers:
            while peek and stack[peek - 1] in closers:
                peek -= 1
        # only cut before a tag that deterministically sets
        # bump_word=True (known block element, or br/img) — cutting
        # before an inline tag could split a token the single pass
        # glues across the tag (parser.c:399-424 inline no-bump rule)
        if name in _PRE_BODY_TAGS:
            if name != "html":
                in_head = True
        bumps = name in ("br", "img") or (
            name in KNOWN_TAGS and name not in INLINE_TAGS
        )
        if (
            bumps
            and not (in_head and name in TABLE_INTERNAL)
            and ignore == 0
            and m.start() - seg_start >= seg_chars
            and all(t in ("html", "body") for t in stack[:peek])
            # a METANAME tag open across the cut would flush its text
            # to swishdefault at the non-final segment's end_document
            # (parser.py:451-453) — refuse. Property-only tags (the
            # default body→swishdescription alias) are fine: the
            # reassembly merges per-segment property fragments
            and not any(t in flush_tags for t in stack[:peek])
        ):
            cuts.append(m.start())
            seeds.append(int(text_seen))
            chains.append(tuple(stack[:peek]))
            if text_seen:
                # provisional: if an inline tag cancels this tag's bump
                # before the next text, the single pass fuses a token
                # across this boundary and note_text cancels the cut
                if pending_cuts == 0:
                    pending_prev_seg = seg_start
                pending_cuts += 1
            seg_start = m.start()
        if name in ("br", "img"):
            bump = True
        elif name in KNOWN_TAGS:
            bump = name not in INLINE_TAGS
        if name in flush_tags:
            text_seen = False  # open_tag flushes before pushing
        if closers:
            # implied closes (AUTO_CLOSE) emit end events → close_tag
            # flushes each popped flush tag, exactly like explicit pops
            if any(t in flush_tags for t in stack[peek:]):
                text_seen = False
            del stack[peek:]
        if name in VOID_TAGS or m.group("selfclose"):
            pass
        else:
            stack.append(name)
            if name in RAWTEXT_TAGS:
                rawtext_until = name
    return cuts, seeds, chains


def _html_segments(
    doc_id: str, text: str, seg_chars: int, flush_tags: frozenset
) -> list:
    """One HTML document → [(tail-encoded id, segment text)].
    Continuation segments re-open the elements still open at the cut so
    stacks (and DOM paths) match the single pass."""
    if len(text) <= seg_chars:
        # a cut requires m.start() - seg_start >= seg_chars, so a text
        # this short can't produce one — skip the O(tags) scan and
        # return exactly the no-cut result (single SEG, idx 0, nseg 1)
        return [(f"{doc_id}{_SEG_SEP}0{_SEG_SEP}0{_SEG_SEP}1", text)]
    cuts, seeds, chains = _html_cut_scan(text, seg_chars, flush_tags)
    bounds = [0] + cuts + [len(text)]
    nseg = len(bounds) - 1
    out = []
    for idx in range(nseg):
        seg = text[bounds[idx] : bounds[idx + 1]]
        if idx > 0:
            seg = "".join(f"<{t}>" for t in chains[idx - 1]) + seg
        seed = seeds[idx - 1] if idx > 0 else 0
        out.append((f"{doc_id}{_SEG_SEP}{idx}{_SEG_SEP}{seed}{_SEG_SEP}{nseg}", seg))
    return out


def segment_html_docs(
    docs: DataFrame, seg_chars: int = 1 << 20, config=None
) -> DataFrame:
    """docs(doc_id, spans) → one row per HTML segment with parser=HTMLSEG
    (continuation segments re-open html/body and carry the pending-bumper
    seed in the doc_id tail), plus one whole-doc HTMLW row per
    non-segmentable document (see _router_kernel)."""
    from libswish3_spark.pipeline import ensure_parallelism

    pruned = ensure_parallelism(docs.select("doc_id", "spans"))
    return pruned.mapInArrow(
        _router_kernel("html", seg_chars, config), schema=_ROUTER_SCHEMA
    )


def extract_html_segmented_rows(
    docs: DataFrame, config=None, seg_chars: int = 1 << 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable form: one output row per HTML segment with GLOBAL span
    orders. Unlike the TXT path (offsets precomputable by a cheap token
    count), HTML end positions exist only after the parse, so a window
    prefix-sum over (doc, seg_idx, end_pos) shifts each segment's
    orders; the window partitions by document (parallel across docs,
    and a doc's segments co-locate — exactly what reassembly needs)."""
    seg = segment_html_docs(docs, seg_chars, config)
    return _markup_segmented_rows(seg, config, num_partitions)


def _markup_segmented_rows(
    seg: DataFrame, config=None, num_partitions: int | None = None
) -> DataFrame:
    from pyspark.sql import Window

    from libswish3_spark.parser import SEG_INFO_KEY

    sc = seg.sparkSession.sparkContext
    seg = seg.repartition(num_partitions or sc.defaultParallelism * 2, "doc_id")
    seg_out = extract(seg, config=config, spread=False)
    parts = F.split("doc_id", _SEG_SEP)
    rows = seg_out.select(
        F.array_join(F.slice(parts, 1, F.size(parts) - 3), _SEG_SEP).alias("orig_id"),
        F.element_at(parts, -3).cast("int").alias("seg_idx"),
        F.element_at("metanames", SEG_INFO_KEY).cast("int").alias("end_pos"),
        F.map_filter("metanames", lambda k, _: k != F.lit(SEG_INFO_KEY)).alias(
            "metanames"
        ),
        "properties",
        "nwords",
        "spans",
        "parser",
        "error",
    )
    w = (
        Window.partitionBy("orig_id")
        .orderBy("seg_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # whole-document (*W) rows have no SEG_INFO_KEY → null end_pos, but
    # they are single-"segment" groups, so the prefix-sum shift is 0
    off = F.coalesce(F.sum("end_pos").over(w), F.lit(0)).cast("int")
    return rows.select(
        "orig_id",
        "seg_idx",
        "end_pos",
        "metanames",
        "properties",
        "nwords",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                (s["order"] + off).cast("int").alias("order"),
            ),
        ).alias("spans"),
        "parser",
        "error",
    )


def extract_html_segmented(
    docs: DataFrame, config=None, seg_chars: int = 1 << 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Full reassembly into one row per document: word spans, positions,
    nwords and metanames match the unsegmented HTML extraction exactly
    (property values may differ in cut-adjacent whitespace — module
    docstring). Parity-check / modest-doc form; at scale keep
    :func:`extract_html_segmented_rows` exploded. Single input scan:
    non-segmentable docs ride the same kernel output as whole HTMLW
    rows (identity reassembly)."""
    rows = extract_html_segmented_rows(docs, config, seg_chars, num_partitions)
    return _reassemble_markup(rows, config, "HTML")


def _reassemble_markup(rows: DataFrame, config, parser_label: str) -> DataFrame:
    """Per-document reassembly, entirely JVM-side (a per-doc
    applyInPandas pays pandas overhead for every group — at 10^12 docs
    that is the whole job). ONE aggregate on orig_id — maps travel as
    orderable entry-arrays so a single sorted collect_list feeds spans,
    metanames and properties (an earlier three-subtree formulation
    re-ran the extraction kernel once per subtree: ReuseExchange shares
    the shuffle below extract, not the map above it). Merge rules:

    * spans: sorted-flatten of the already-shifted segment arrays;
    * metanames: per-key idx-ordered concat, inserting the \\x03 that
      _nb_add puts between separate flushes UNLESS the next fragment
      already starts with one — a continuation of the SAME buffer
      carries its paid seed bumper (one flush in the single pass, no
      _nb_add join), while a fresh-after-flush fragment does not (a
      separate flush, so the join byte must be inserted);
    * properties: per-key join with the space the cleanwsp pass turns
      the cut bumper into (verbatim properties keep the raw byte).
    """
    from libswish3_spark.config import TOKENPOS_BUMPER, default_config

    cfg = config or default_config()
    verbatim = [n for n, p in cfg.properties.items() if p.verbatim]

    agg = rows.groupBy("orig_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("seg_idx").alias("i"),
                    F.col("spans").alias("sp"),
                    F.map_entries("metanames").alias("mn"),
                    F.map_entries("properties").alias("pr"),
                )
            )
        ).alias("segs"),
        F.sum("nwords").cast("long").alias("nwords"),
        # any segment's (or a whole-row plain parse's) error surfaces —
        # max over strings ignores nulls, so clean docs stay error-null
        F.max("error").alias("error"),
    )

    def keys_of(field):
        return F.array_distinct(
            F.flatten(
                F.transform(
                    F.col("segs"), lambda e: F.transform(e[field], lambda kv: kv["key"])
                )
            )
        )

    def vals_of(field, k):
        # per segment (in idx order): this key's value, absent → null,
        # then drop the nulls. F.get is OOB-null-safe under ANSI mode.
        per_seg = F.transform(
            F.col("segs"),
            lambda e: F.get(F.filter(e[field], lambda kv: kv["key"] == k), 0)["value"],
        )
        return F.filter(per_seg, lambda v: v.isNotNull())

    def meta_val(k):
        return F.aggregate(
            vals_of("mn", k),
            F.lit(""),
            lambda acc, v: F.when(acc == "", v).otherwise(
                F.when(v.startswith(TOKENPOS_BUMPER), F.concat(acc, v)).otherwise(
                    F.concat(acc, F.lit(TOKENPOS_BUMPER), v)
                )
            ),
        )

    def prop_val(k):
        verb = k.isin(*verbatim) if verbatim else F.lit(False)
        return F.when(
            verb, F.array_join(vals_of("pr", k), TOKENPOS_BUMPER)
        ).otherwise(F.array_join(vals_of("pr", k), " "))

    return agg.select(
        F.col("orig_id").alias("doc_id"),
        F.flatten(F.transform("segs", lambda e: e["sp"])).alias("spans"),
        F.map_from_entries(
            F.transform(keys_of("mn"), lambda k: F.struct(k.alias("key"), meta_val(k).alias("value")))
        ).alias("metanames"),
        F.map_from_entries(
            F.transform(keys_of("pr"), lambda k: F.struct(k.alias("key"), prop_val(k).alias("value")))
        ).alias("properties"),
        "nwords",
        F.lit(parser_label).alias("parser"),
        "error",
    )


def extract_txt_segmented(
    docs: DataFrame, config=None, seg_chars: int = 1 << 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Full reassembly into one row per document, matching the plain TXT
    extraction exactly (same tokens, positions, title tail, nwords).

    NOTE: materializing one document's full span array in a single row
    is only sane for parity checks and modest documents — the terminal
    groupBy funnels every span of a document through one reducer. At
    scale use :func:`extract_txt_segmented_rows` (exploded, no funnel).

    Single input scan: non-segmentable docs arrive as whole TXTW rows
    (plain parse, title-from-path already included) and bypass the
    title-tail append below.
    """
    shifted = extract_txt_segmented_rows(
        docs, config, seg_chars, num_partitions
    )
    body = shifted.groupBy(F.col("orig_id").alias("doc_id")).agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("seg_idx").alias("i"), "spans"))
                ),
                lambda e: e["spans"],
            )
        ).alias("spans"),
        F.sum("nwords").alias("body_words"),
        F.max("doc_end_pos").alias("doc_end_pos"),
        F.max(F.col("parser") == "TXTW").alias("is_whole"),
    )
    # title-from-path tail (TXT semantics, parser.c:2690-2699). ASCII token
    # pattern matches the engine tokenizer for path-like doc_ids. Title
    # positions continue from the document's END POSITION (which includes
    # bumper gaps), exactly like the unsegmented position counter.
    title_toks = F.regexp_extract_all(F.lower("doc_id"), F.lit(TOKEN_PATTERN), 0)
    title_spans = F.zip_with(
        title_toks,
        F.sequence(F.lit(1), F.greatest(F.size(title_toks), F.lit(1))),
        lambda t, i: F.struct(
            F.lit("word").alias("kind"),
            t.alias("text"),
            F.lit("").alias("media_ref"),
            (F.col("doc_end_pos") + i).cast("int").alias("order"),
        ),
    )
    with_title = F.concat(
        "spans",
        F.when(F.size(title_toks) > 0, title_spans).otherwise(
            F.array().cast(
                "array<struct<kind:string,text:string,media_ref:string,order:int>>"
            )
        ),
    )
    return body.select(
        "doc_id",
        F.when(F.col("is_whole"), F.col("spans")).otherwise(with_title).alias("spans"),
        F.when(F.col("is_whole"), F.col("body_words"))
        .otherwise(F.col("body_words") + F.size(title_toks))
        .cast("long")
        .alias("nwords"),
    )


def _xml_cut_scan(
    text: str,
    seg_chars: int,
    flush_tags: frozenset = _FLUSH_TAGS,
    reset_exempt: frozenset = _RESET_EXEMPT,
):
    """Parser-neutral cut offsets for one XML document.

    Literal-event twin of events.xml_events (same MARKUP_RE, no
    auto-close/void/rawtext): cut before a start tag when exactly the
    root element is open, outside comments/CDATA, noindex==0. Every XML
    tag bumps word position (parser.c:543-549), so any top-level start
    tag is a safe boundary. On any close-tag mismatch (malformed XML)
    segmentation bails out — the document runs unsegmented rather than
    risking a state divergence the literal scanner can't model. Two
    further parser behaviors are modeled exactly:

    * a ROOT that is itself a METANAME tag (``flush_tags``) refuses
      segmentation entirely — a non-final segment's end_document would
      flush the root's buffered text to swishdefault instead of its
      bucket (parser.py:451-453); property-only roots are fine (the
      reassembly merges per-segment property fragments);
    * under the default UndefinedMetaTags=index policy, any start OR
      close tag outside ``reset_exempt`` resets the noindex counter
      (parser.py bake_tag:336-338, parser.c:708-717).

    Returns (cuts, seeds, root_raw) — root_raw is the root's original
    open-tag text, replayed verbatim as each continuation segment's
    prefix so prefixes/attrs bake identically.
    """
    from libswish3_spark.events import MARKUP_RE, WOUND_SENTINEL

    cuts: list[int] = []
    seeds: list[int] = []
    depth = 0
    names: list[str] = []
    root_raw: str | None = None
    last = 0
    seg_start = 0
    ignore = 0
    # the seed mirrors the parser's meta_len at the cut: text buffered
    # SINCE THE LAST FLUSH (open/close of a meta-defined tag flushes and
    # empties the buffer, parser.py open_tag/close_tag) — "text seen
    # ever" would over-pay a bumper gap after e.g. </title>, shifting
    # every later position by one. Flush tags are the default-config
    # set (this scanner, like the whole segmented path, is documented
    # default-config-only). NOT reset at cuts: the single-pass buffer
    # carries across segment boundaries until a real flush.
    text_seen = False

    def note_text(s: str) -> bool:
        # returns True when the doc must run UNSEGMENTED: non-whitespace
        # text at element depth 0 — pre-root it fatals the whole doc
        # (libxml2 "Start tag expected"), post-root it is never
        # delivered; a final segment (no depth gate) would index it.
        # Same for an invalid entity/charref anywhere: it WOUNDS the
        # whole-doc parse (parser phase 3) and segments (no phase gate)
        # would diverge from that.
        nonlocal text_seen
        # depth-0 text NEVER reaches the buffer (libxml2 fires no
        # characters() outside the root): prolog whitespace must not
        # flag a pending bumper or the first cut's seed over-pays a
        # position gap (fuzz-caught: '<?xml?>\n<!DOCTYPE r><root>…')
        if s and not ignore and depth > 0:
            text_seen = True
        if depth == 0 and s.strip():
            return True
        if WOUND_SENTINEL in s:
            # decode-level wound marker (invalid source byte): the
            # whole-doc parse wounds there — run unsegmented
            return True
        if "&" in s:
            from libswish3_spark.parser import _first_invalid_ref

            if _first_invalid_ref(s) is not None:
                return True
        return False

    for m in MARKUP_RE.finditer(text):
        if note_text(text[last : m.start()]):
            return [], [], None
        last = m.end()
        if m.group("comment") is not None:
            c = m.group("comment")
            if "--" in c or c.endswith("-"):
                # double-hyphen comment: fatal wound (xml_events yields
                # ("wound",)) — segments have no phase gate, so the
                # document must run unsegmented
                return [], [], None
            t = c.strip()
            if t.lower().startswith("swishcommand"):
                t = t[len("swishcommand") :].strip()
            tl = t.lower()
            if tl == "noindex":
                ignore += 1
            elif tl == "index" and ignore > 0:
                ignore -= 1
            continue
        if m.group("cdata") is not None:
            if note_text(m.group("cdata")):
                return [], [], None
            continue
        if (
            m.group("doctype") is not None
            or m.group("decl") is not None
            or m.group("pi") is not None
        ):
            # a DOCTYPE (internal subset included) is a skipped decl;
            # entity refs it might make benign-LOOKING still wound the
            # parse identically (probed), and any doc containing an
            # invalid ref already routes unsegmented via note_text
            continue
        name = m.group("name")
        rawattrs = m.group("attrs")
        if rawattrs and "&" in rawattrs:
            from libswish3_spark.events import _first_invalid_ref

            if _first_invalid_ref(rawattrs) is not None:
                # invalid ref in an attribute value wounds the parse AT
                # the start tag (events.xml_events badattr path) —
                # segments have no phase gate, run unsegmented.
                # Conservative: scans the raw attr region, so a '&' in
                # an attr NAME also refuses (harmless, just unsegmented)
                return [], [], None
        if m.group("close"):
            if not names or names[-1] != name:
                return [], [], None  # malformed: refuse to segment
            names.pop()
            depth -= 1
            if name.lower() in flush_tags:
                text_seen = False  # close_tag flushed the buffer
            elif name.lower() not in reset_exempt:
                ignore = 0  # close_tag re-bakes → undef policy reset
            continue
        if name.lower() not in reset_exempt:
            ignore = 0  # any undefined XML tag resets noindex
        if (
            depth == 1
            and ignore == 0
            and m.start() - seg_start >= seg_chars
        ):
            cuts.append(m.start())
            seeds.append(int(text_seen))
            seg_start = m.start()
        if name.lower() in flush_tags:
            text_seen = False  # open_tag flushes before pushing
        if depth == 0 and root_raw is not None:
            # second top-level element: libxml2 "Extra content at the
            # end of the document" stops delivery at the root's close —
            # a segment would index it, so run unsegmented
            return [], [], None
        if not m.group("selfclose"):
            if depth == 0 and root_raw is None:
                if name.lower() in flush_tags:
                    # root is a metaname tag: a cut would split its
                    # bucket — run this document unsegmented
                    return [], [], None
                root_raw = m.group(0)
            names.append(name)
            depth += 1
        elif depth == 0 and root_raw is None:
            # a SELF-CLOSING element at depth 0 is the root too: any
            # later depth-0 start tag must hit the extra-content
            # refusal above, exactly as the whole-doc parse applies
            # libxml2's "Extra content at the end of the document"
            # rule ('<root/><x>…</x>' previously adopted <x> as root
            # and segmented, diverging from the unsegmented result)
            root_raw = m.group(0)
    return cuts, seeds, root_raw


def _xml_segments(
    doc_id: str,
    text: str,
    seg_chars: int,
    flush_tags: frozenset,
    reset_exempt: frozenset = _RESET_EXEMPT,
) -> list:
    """One XML document → [(tail-encoded id, segment text)].
    Continuation segments replay the root open tag verbatim so
    prefixes/attrs bake identically; a malformed doc yields one
    segment (the cut scan bails)."""
    if len(text) <= seg_chars:
        # no cut possible below seg_chars (see _html_segments) — same
        # single-SEG result the scan would return, without the scan
        return [(f"{doc_id}{_SEG_SEP}0{_SEG_SEP}0{_SEG_SEP}1", text)]
    cuts, seeds, root_raw = _xml_cut_scan(
        text, seg_chars, flush_tags, reset_exempt
    )
    bounds = [0] + cuts + [len(text)]
    nseg = len(bounds) - 1
    out = []
    for idx in range(nseg):
        seg = text[bounds[idx] : bounds[idx + 1]]
        if idx > 0:
            seg = (root_raw or "") + seg
        seed = seeds[idx - 1] if idx > 0 else 0
        out.append((f"{doc_id}{_SEG_SEP}{idx}{_SEG_SEP}{seed}{_SEG_SEP}{nseg}", seg))
    return out


def segment_xml_docs(
    docs: DataFrame, seg_chars: int = 1 << 20, config=None
) -> DataFrame:
    """docs(doc_id, spans) → one row per XML segment with parser=XMLSEG,
    plus one whole-doc XMLW row per non-segmentable document (see
    _router_kernel). Exotic configs (attr metanames, DOM-path aliases,
    UndefinedMetaTags != index, …) route EVERY doc whole — see
    config_supports_segmentation."""
    from libswish3_spark.pipeline import ensure_parallelism

    pruned = ensure_parallelism(docs.select("doc_id", "spans"))
    return pruned.mapInArrow(
        _router_kernel("xml", seg_chars, config), schema=_ROUTER_SCHEMA
    )


def extract_xml_segmented_rows(
    docs: DataFrame, config=None, seg_chars: int = 1 << 20,
    num_partitions: int | None = None,
) -> DataFrame:
    seg = segment_xml_docs(docs, seg_chars, config)
    return _markup_segmented_rows(seg, config, num_partitions)


def extract_xml_segmented(
    docs: DataFrame, config=None, seg_chars: int = 1 << 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """XML mega-doc segmentation with full per-document reassembly;
    parity contract identical to the HTML path. Single input scan —
    non-segmentable docs ride as whole XMLW rows."""
    rows = extract_xml_segmented_rows(docs, config, seg_chars, num_partitions)
    return _reassemble_markup(rows, config, "XML")
