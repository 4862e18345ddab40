"""Per-document extraction state machine.

Re-implements the semantics of the reference's SAX callback layer
(reference: src/libswish3/parser.c) as a plain-Python event consumer.
Each function below names its C counterpart:

* ``bake_tag``           — parser.c:323-754 (tag normalization, HTML
  <meta> synthesis, XML attribute metanames, undef-tag policies, alias
  rewrite on bare tag then DOM path)
* ``open_tag/close_tag`` — parser.c:1095-1250 (dom/meta/prop stacks)
* ``buffer_characters``  — parser.c:1255-1296 (bumper-byte word gaps)
* ``flush_buffer``       — parser.c:756-808 (metaname bucketing +
  tokenize)
* ``add_stack_to_prop_buf`` — parser.c:2868-2916 (Swish-e 2.x nested
  property accumulation, alias redirect, verbatim)
* ``comments``           — parser.c:1321-1388 (noindex/index toggles)
* ``txt_parser``         — parser.c:2599-2710 (body → swishdefault,
  uri → swishtitle)
* end-of-document flush  — parser.c:831-846

One DocState is built per document inside the Arrow batch loop; all
markup scanning and tokenization is regex-vectorized per text segment
(see ``events`` and ``tokenizer``). Media spans: where the reference
only bumps the token position at ``<img>``/media boundaries
(parser.c:388-397), we additionally emit a ``kind='media'`` span whose
``order`` equals the bumper gap position, so the span sequence carries
the media reference without disturbing reference token positions.
"""

from __future__ import annotations

import re
from array import array as _array


def _int_array():
    return _array("i")

from libswish3_spark.config import (
    CLASS_ATTRIBUTES,
    DEFAULT_METANAME,
    DOM_STR,
    SwishConfig,
    TITLE_METANAME,
    TOKENPOS_BUMPER,
    UNDEF_AUTO,
    UNDEF_AUTOALL,
    UNDEF_ERROR,
    UNDEF_IGNORE,
    UNDEF_INDEX,
    MetaName,
    Property,
    default_config,
)
from libswish3_spark.events import (
    _ENT_RE,
    _bad_ref_consumed,
    _first_invalid_ref,
    _WF_NAMED_REF_RE,
    WOUND_SENTINEL,
    html_events,
    xml_events,
    xml_unescape,
)
from libswish3_spark.htmltags import INLINE_TAGS, KNOWN_TAGS
from libswish3_spark.charclasses import word_run_re
from libswish3_spark.tokenizer import resolve_tokenizer, split_tokens

_BUMPER = TOKENPOS_BUMPER
_WS = " \t\n\r\f\v"
# reference: string.c:593-607 (ctrl bytes -> space). Applied to ASCII
# strings only, so the bytes-level translate (C table lookup, ~5x the
# per-char dict translate) is exact.
_CTRL_TO_WS = bytes.maketrans(bytes(range(32)), b" " * 32)

# reserved metanames key carrying a mega-doc segment's end position
# through the fixed extraction schema (stripped at reassembly)
SEG_INFO_KEY = "\x02seg"


class _Tag:
    __slots__ = ("raw", "baked", "context")

    def __init__(self, raw: str, baked: str, context: str):
        self.raw = raw
        self.baked = baked
        self.context = context


# per-config fast-path eligibility + shared simple-bake memo, keyed by
# id(config) (the config outlives the batch closure that holds it —
# same convention as pipeline._PARSER_GUESS_CACHE); size-capped so a
# pathological tag corpus cannot grow executor memory unboundedly
# value: (eligible, html_memo, xml_memo, cfg) — the bake result depends
# on the document KIND (HTML bump rules vs XML every-tag bump + undef
# policy), so HTML and XML parses of the same config must not share
# entries (a shared memo let an XML <em> poison the HTML inline-tag
# no-bump rule and vice versa — caught by round-6 review, test pinned)
_FASTPATH_CACHE: dict[int, tuple[bool, dict, dict, object]] = {}


def _config_fastpath(cfg: SwishConfig, is_html: bool) -> tuple[bool, dict]:
    got = _FASTPATH_CACHE.get(id(cfg))
    if got is not None:
        return got[0], got[1] if is_html else got[2]
    eligible = (
        cfg.undef_metas not in (UNDEF_AUTO, UNDEF_AUTOALL)
        and cfg.undef_attrs not in (UNDEF_AUTO, UNDEF_AUTOALL)
        and not any("." in k for k in cfg.tag_aliases)
        and not any("." in k for k in cfg.metanames)
        and not any("." in k for k in cfg.properties)
    )
    if len(_FASTPATH_CACHE) < 64:
        # the cfg rides in the entry so its id cannot be recycled by a
        # later config while the memo is alive
        _FASTPATH_CACHE[id(cfg)] = (eligible, {}, {}, cfg)
        got = _FASTPATH_CACHE[id(cfg)]
        return got[0], got[1] if is_html else got[2]
    return eligible, {}


# shared immutable stack roots (never mutated; _pop_on_match keeps the
# last member, so these are common to every document)
_META_ROOT = _Tag(DEFAULT_METANAME, DEFAULT_METANAME, DEFAULT_METANAME)
_PROP_ROOT = _Tag(DOM_STR, DOM_STR, DOM_STR)


def _all_ws(s: str) -> bool:
    # reference: string.c:570-589 (byte-wise C isspace; \x03 is NOT ws)
    return s.strip(_WS) == ""


class DocState:
    """swish_ParserData equivalent (reference: libswish3.h:427-445)."""

    def __init__(self, config: SwishConfig, is_html: bool, uri: str = ""):
        self.config = config
        self.is_html = is_html
        self.uri = uri
        # runtime-extensible overlays for undef auto/autoall policies
        # (the C code mutates shared config at parser.c:694-706; we keep
        # growth per-document so the broadcast config stays immutable)
        self.extra_metanames: dict[str, MetaName] = {}
        self.extra_properties: dict[str, Property] = {}
        # buffers: meta_buf is a piece list so media markers can be
        # interleaved without perturbing the text-emptiness checks
        # text pieces as a plain string list; media markers pinned to
        # their blob char offset at add time (media is rare — the O(n)
        # offset sum at add matches the old piece-walk computation,
        # including the HTMLSEG meta_len priming which contributes no
        # chars)
        self.meta_buf: list[str] = []
        self.media_marks: list[tuple[int, str]] = []
        self.meta_len = 0
        # running char total of meta_buf (== sum(map(len, meta_buf)):
        # unlike meta_len it is NOT touched by the HTMLSEG priming) —
        # gives add_media its O(1) marker offset
        self.buf_chars = 0
        self.prop_parts: list[str] = []
        self.prop_len = 0
        # stacks (reference: init_parser_data parser.c:1594-1614)
        self.metastack = [_META_ROOT]
        self.propstack = [_PROP_ROOT]
        self.domstack: list = []
        self.bump_word = True
        self.ignore_content = 0
        # outputs
        self.metanames: dict[str, str] = {}
        self.properties: dict[str, str] = {}
        # spans as four parallel columns (kind, text, ref, order): the
        # Arrow kernel consumes them columnar (pipeline.extract_batch_fn),
        # so the hot word-emission path never allocates a per-token
        # tuple; the ``spans`` property below zips rows for cold callers
        self.s_kindc = bytearray()  # span kind codes: 0 word, 1 media
        self.s_text: list[str] = []
        # media refs are SPARSE: (span index, ref) pairs only — the
        # dense all-"" ref column is synthesized at Arrow build time
        self.s_refs: list[tuple[int, str]] = []
        self.s_ord = _int_array()
        # optional per-token (metaname, context) postings for index sinks
        # (S9 contract: swish_xapian.cpp:416-561 needs value+meta+pos)
        self.keep_token_meta = False
        # T10: pluggable tokenizer resolved once per doc state
        self.split_tokens = resolve_tokenizer(config)
        # bake_tag fast path: dotted-DOM-path alias keys are rare; when
        # none exist the per-tag domstack join can never match
        self._dom_aliases = any("." in k for k in config.tag_aliases)
        # simple-bake fast path (per-config memo, see _bake_simple):
        # eligible when tag baking is a PURE function of (tag, prefix) —
        # no dotted defined names (a flattened DOM path could then match
        # a definition), no dotted aliases, and no auto/autoall undef
        # policy (those mint per-doc overlay definitions mid-parse,
        # which would invalidate both the memo and the skipped dom-path
        # checks). True for the reference default config; exotic configs
        # take the unmemoized path unchanged.
        self._fast_ctx, self._bake_memo = _config_fastpath(config, is_html)
        self.token_meta: list[tuple[str, str]] = []
        self.pos = 0
        self.nwords = 0
        self.error: str | None = None

    @property
    def spans(self) -> list[tuple[str, str, str, int]]:
        """Row view of the parallel span columns (cold paths only)."""
        refs = dict(self.s_refs)
        return [
            ("media" if k else "word", t, refs.get(i, ""), o)
            for i, (k, t, o) in enumerate(
                zip(self.s_kindc, self.s_text, self.s_ord)
            )
        ]

    # -- config lookups with per-doc overlay --------------------------------
    def meta_defined(self, name: str) -> bool:
        return name in self.config.metanames or name in self.extra_metanames

    def meta_def(self, name: str) -> MetaName | None:
        return self.config.metanames.get(name) or self.extra_metanames.get(name)

    def prop_defined(self, name: str) -> bool:
        return name in self.config.properties or name in self.extra_properties

    def prop_def(self, name: str) -> Property | None:
        return self.config.properties.get(name) or self.extra_properties.get(name)

    # -- named buffers (reference: namedbuffer.c:179-240) -------------------
    def _nb_add(self, nb: dict[str, str], name: str, s: str, cleanwsp: bool) -> None:
        if _all_ws(s):
            return
        if cleanwsp:
            if s.isascii():
                # ctrl → space (ascii only)
                s = s.encode("ascii").translate(_CTRL_TO_WS).decode("ascii")
            s = s.strip(_WS)
        cur = nb.get(name)
        nb[name] = (cur + _BUMPER + s) if cur else s

    # -- character buffering (reference: parser.c:1255-1296) ----------------
    def buffer_characters(self, text: str) -> None:
        if self.ignore_content:
            return
        # NO empty early-out: the reference appends the bumper and
        # resets bump_word even for zero-length content (parser.c:
        # 128-169) — '<meta name="x" content="">' leaves a trailing
        # \x03 in the enclosing buffer and eats the pending bump
        if self.bump_word:
            if self.meta_len:
                self.meta_buf.append(_BUMPER)
                self.meta_len += 1
                self.buf_chars += 1
            if self.prop_len:
                self.prop_parts.append(_BUMPER)
                self.prop_len += 1
        if text:
            self.meta_buf.append(text)
            self.meta_len += len(text)
            self.buf_chars += len(text)
            self.prop_parts.append(text)
            self.prop_len += len(text)
        self.bump_word = False

    def add_media(self, ref: str) -> None:
        """Interleave a media marker at the current buffer point
        (O(1): buf_chars is the running char total of meta_buf)."""
        self.media_marks.append((self.buf_chars, ref))

    # -- tokenize + span emission -------------------------------------------
    def _tokenize_pieces(self, meta: str, context: str, blob: str) -> None:
        """Walk the flushed buffer emitting word + media spans in order.

        Equivalent to ``tokenize`` (parser.c:2761-2788) over the flushed
        buffer, with media markers resolved to ``kind='media'`` spans at
        the position gap their bump creates.
        """
        # ONE continuous blob with media markers pinned to their char
        # offsets: a marker between two text pieces must NOT split a
        # token the reference fuses — an inline tag after <img> cancels
        # the img's bump, so 'y<img src=x><b>co' indexes ONE word 'yco'
        # (probed vs the compiled binary). Markers at a piece boundary
        # keep their old emission point; one inside a fused token emits
        # right after it. Offsets were pinned at add_media time.
        medias = self.media_marks

        s_kindc = self.s_kindc
        s_text = self.s_text
        s_refs = self.s_refs
        s_ord = self.s_ord
        split_tokens = self.split_tokens
        keep_meta = self.keep_token_meta

        def _emit_tokens(seg: str) -> None:
            toks = split_tokens(seg)
            if toks:
                n = len(toks)
                base = self.pos
                s_kindc.extend(bytes(n))  # n zero codes
                s_text.extend(toks)
                s_ord.extend(range(base + 1, base + n + 1))
                if keep_meta:
                    self.token_meta.extend([(meta, context)] * n)
                self.pos = base + n
                self.nwords += n

        def _emit_media(ref: str) -> None:
            s_refs.append((len(s_kindc), ref))
            s_kindc.append(1)
            s_text.append("")
            s_ord.append(self.pos + 1)

        mi = 0
        nm = len(medias)
        seg_start = 0
        segments = blob.split(_BUMPER)
        last = len(segments) - 1
        for i, seg in enumerate(segments):
            while mi < nm and medias[mi][0] <= seg_start:
                _emit_media(medias[mi][1])
                mi += 1
            seg_end = seg_start + len(seg)
            if seg:
                cur = 0
                while mi < nm and medias[mi][0] < seg_end:
                    cut = medias[mi][0] - seg_start
                    if cut < cur:
                        cut = cur
                    elif 0 < cut < len(seg):
                        wr = word_run_re()
                        if wr.match(seg, cut) and wr.match(seg, cut - 1):
                            # the marker splits a token the reference
                            # fuses: finish the word run first, then
                            # emit the media span right after it
                            cut = wr.match(seg, cut).end()
                    if cut > cur:
                        _emit_tokens(seg[cur:cut])
                        cur = cut
                    _emit_media(medias[mi][1])
                    mi += 1
                if cur < len(seg):
                    _emit_tokens(seg[cur:])
            while mi < nm and medias[mi][0] <= seg_end:
                _emit_media(medias[mi][1])
                mi += 1
            if i != last:
                self.pos += 1  # bumper gap (tokenizer.c:693-697)
                seg_start = seg_end + 1
        while mi < nm:
            _emit_media(medias[mi][1])
            mi += 1

    # -- flush (reference: parser.c:756-808) ---------------------------------
    def flush_buffer(self, metaname: str, context: str) -> None:
        if not self.meta_buf and not self.media_marks:
            # empty buffer: _nb_add would no-op on "" and tokenize has
            # nothing to walk — skip the lookups (hot on meta-tag opens)
            self.meta_len = 0
            return
        meta = self.meta_def(metaname)
        stored = meta.alias_for if (meta and meta.alias_for) else metaname
        buf = self.meta_buf
        blob = buf[0] if len(buf) == 1 else "".join(buf)
        # metanames NamedBuffer: raw append, autovivify (namedbuffer.c:165-177)
        self._nb_add(self.metanames, stored, blob, cleanwsp=False)
        if self.config.cascade_meta_context:
            for t in self.metastack:
                if t.baked != stored:
                    self._nb_add(self.metanames, t.baked, blob, cleanwsp=False)
        if self.config.tokenize:
            self._tokenize_pieces(stored, context, blob)
        else:
            # still surface media markers even when not tokenizing
            for _, val in self.media_marks:
                self.s_refs.append((len(self.s_kindc), val))
                self.s_kindc.append(1)
                self.s_text.append("")
                self.s_ord.append(self.pos + 1)
        self.meta_buf = []
        self.media_marks = []
        self.meta_len = 0
        self.buf_chars = 0

    # -- properties (reference: parser.c:2868-2916) --------------------------
    def add_stack_to_prop_buf(self, baked: str | None) -> None:
        if not self.prop_parts:
            # empty buffer: every _nb_add below would no-op and the
            # stored values are already max-truncated — skip the joins
            # and dict probes (hot on prop-tag opens)
            return
        s = "".join(self.prop_parts)
        cleanwsp = True
        if baked is not None:
            prop = self.prop_def(baked)
            store = prop.alias_for if (prop and prop.alias_for) else baked
            if prop is not None and prop.verbatim:
                cleanwsp = False
            self._nb_add(self.properties, store, s, cleanwsp)
            self._apply_prop_max(store)
        for t in self.propstack:
            if t.baked == DOM_STR:
                continue
            self._nb_add(self.properties, t.baked, s, cleanwsp)
            self._apply_prop_max(t.baked)

    def _apply_prop_max(self, name: str) -> None:
        # Property.max caps the STORED value (Swish-e 2.x
        # PropertyNamesMaxLength semantics; the reference parses max at
        # header.c:487-488 and round-trips it, leaving enforcement to
        # the consumer — we enforce at store time so the cap actually
        # bounds memory on mega-documents). max is a BYTE count
        # (unsigned prefix of a C string, libswish3.h:357 — same
        # rationale as sort_key's byte-based sort_length): encode,
        # slice, and drop any character the cut splits (errors=
        # "ignore"), matching functions/props.utf8_byte_truncate.
        prop = self.prop_def(name)
        if prop is not None and prop.max > 0:
            cur = self.properties.get(name)
            if cur is not None and len(cur.encode("utf-8")) > prop.max:
                self.properties[name] = (
                    cur.encode("utf-8")[: prop.max].decode("utf-8", "ignore")
                )

    def _clear_prop_buf(self) -> None:
        self.prop_parts = []
        self.prop_len = 0

    # -- tag stacks (reference: parser.c:2939-3031) ---------------------------
    @staticmethod
    def _push(stack: list[_Tag], raw: str, baked: str, joiner: str) -> None:
        # context = joiner-join of every baked name on the stack; each
        # stack uses one fixed joiner, so extend the top's context
        # incrementally instead of re-joining the whole stack per push
        ctx = (stack[-1].context + joiner + baked) if stack else baked
        stack.append(_Tag(raw, baked, ctx))

    # -- bake_tag (reference: parser.c:323-754) -------------------------------
    def _bake_simple(self, tag: str, prefix: str | None) -> str:
        """Memoized attr-less bake (fast-ctx configs only): replicates
        the slow path below for ``attrs in (None, [])`` exactly —
        lowercase + optional prefix join, bump rule, XML undef policy
        (index/ignore/error; auto* is excluded by the eligibility gate),
        bare-tag alias rewrite. The entry is a pure function of
        (tag, prefix) under the gate; the state-dependent policy effect
        is replayed from the action code on every call, as the slow
        path would."""
        cfg = self.config
        t = tag.lower()
        if prefix is not None and not cfg.ignore_xmlns:
            t = prefix.lower() + ":" + t
        bump: bool | None = None
        code = 0
        if self.is_html:
            if t in ("br", "img"):
                bump = True  # attr-less img: no src, no media span
            elif t in KNOWN_TAGS:
                bump = t not in INLINE_TAGS
        else:
            bump = True  # parser.c:543-549: every XML tag bumps
            if t not in cfg.metanames and t not in cfg.tag_aliases:
                pol = cfg.undef_metas
                if pol == UNDEF_ERROR:
                    code = 3
                elif pol == UNDEF_IGNORE:
                    code = 2
                elif pol == UNDEF_INDEX:
                    code = 1
        entry = (cfg.tag_aliases.get(t, t), bump, code, t)
        if len(self._bake_memo) < 4096:
            self._bake_memo[(tag, prefix)] = entry
        self._apply_simple_bake(entry)
        return entry[0]

    def _apply_simple_bake(self, entry) -> None:
        baked, bump, code, t = entry
        if bump is not None:
            self.bump_word = bump
        if code:
            if code == 1:  # UNDEF_INDEX on an XML tag resets ignore
                if self.ignore_content:
                    self.ignore_content = 0
            elif code == 2:  # UNDEF_IGNORE
                self.ignore_content += 1
            else:  # UNDEF_ERROR
                raise ValueError(
                    f"tag '{t}' is not a defined MetaName and "
                    "UndefinedMetaTags == error"
                )

    def bake_tag(
        self,
        tag: str,
        attrs: list[tuple[str, str]] | None,
        prefix: str | None,
    ) -> str | None:
        if not attrs and self._fast_ctx:
            entry = self._bake_memo.get((tag, prefix))
            if entry is None:
                return self._bake_simple(tag, prefix)
            self._apply_simple_bake(entry)
            return entry[0]
        cfg = self.config
        t = tag.lower()
        if prefix is not None and not cfg.ignore_xmlns:
            t = prefix.lower() + ":" + t  # parser.c:366-378

        if self.is_html:
            if t in ("br", "img"):
                self.bump_word = True  # parser.c:388-397
                if t == "img" and attrs:
                    src = next((v for k, v in attrs if k.lower() == "src"), None)
                    if src:
                        self.add_media(src)
            elif t in KNOWN_TAGS:
                self.bump_word = t not in INLINE_TAGS  # parser.c:399-424
            # unknown tag: bump_word unchanged (parser.c:404-406)

            if t == "meta" and attrs:
                metaname = next((v for k, v in attrs if k == "name"), None)
                metacontent = next((v for k, v in attrs if k == "content"), None)
                if metaname is not None:
                    prev_ignore = self.ignore_content
                    if not self.meta_defined(metaname) and metaname not in cfg.tag_aliases:
                        self._apply_undef_meta_policy(metaname)
                    if metacontent is not None:
                        prev_bump = self.bump_word
                        self.bump_word = True  # parser.c:509-513
                        self.open_tag(metaname, None, prefix)
                        self.buffer_characters(metacontent)
                        self.close_tag(metaname, prefix)
                        self.bump_word = prev_bump
                        return None  # parser.c:536 — fully handled
                    self.ignore_content = prev_ignore
        else:
            self.bump_word = True  # parser.c:543-549: every XML tag bumps
            if attrs:
                classattrs = cfg.stringlists.get(CLASS_ATTRIBUTES)
                for k, v in attrs:
                    attr_lower = k.lower()
                    val_lower = v.lower()
                    if classattrs and attr_lower in classattrs:
                        # composite tag.<attrval> (parser.c:580-597)
                        t = t + "." + val_lower
                    mfa = t + "." + attr_lower  # parser.c:599-607
                    if not self.meta_defined(mfa):
                        self._apply_undef_attr_policy(mfa, val_lower)
                    if self.meta_defined(mfa):
                        # attr value becomes content (parser.c:650-668)
                        self.bump_word = True
                        self.open_tag(mfa, None, prefix)
                        self.buffer_characters(val_lower)
                        self.close_tag(mfa, prefix)
            if not self.meta_defined(t) and t not in cfg.tag_aliases:
                self._apply_undef_meta_policy(t, is_xml_tag=True)

        # alias rewrite: bare tag, then flattened DOM path (parser.c:728-747)
        alias = cfg.tag_aliases.get(t)
        if alias:
            t = alias
        elif self._dom_aliases:
            # only built when some alias key IS a dotted DOM path —
            # otherwise the join can never hit and is pure overhead
            domtag = ".".join([d.baked for d in self.domstack] + [t])
            alias = cfg.tag_aliases.get(domtag)
            if alias:
                t = alias
        return t

    def _apply_undef_meta_policy(self, name: str, is_xml_tag: bool = False) -> None:
        pol = self.config.undef_metas
        if pol == UNDEF_ERROR:
            raise ValueError(
                f"tag '{name}' is not a defined MetaName and UndefinedMetaTags == error"
            )
        if pol == UNDEF_IGNORE:
            self.ignore_content += 1  # parser.c:470-476
        elif pol in (UNDEF_AUTO, UNDEF_AUTOALL):
            self.extra_metanames[name] = MetaName(name)
            if pol == UNDEF_AUTOALL and not self.prop_defined(name):
                self.extra_properties[name] = Property(name)
        elif pol == UNDEF_INDEX and is_xml_tag:
            # default: any defined-or-undefined XML tag resets ignore
            # (parser.c:708-717)
            if self.ignore_content:
                self.ignore_content = 0

    def _apply_undef_attr_policy(self, mfa: str, val_lower: str) -> None:
        pol = self.config.undef_attrs
        if pol == UNDEF_ERROR:
            raise ValueError(
                f"XML attr metaname '{mfa}' undefined and UndefinedXMLAttributes == error"
            )
        if pol in (UNDEF_AUTO, UNDEF_AUTOALL):
            self.extra_metanames[mfa] = MetaName(mfa)
            if pol == UNDEF_AUTOALL and not self.prop_defined(mfa):
                self.extra_properties[mfa] = Property(mfa)
        elif pol == UNDEF_INDEX:
            # index attr value under current context (parser.c:636-643)
            prev = self.bump_word
            self.bump_word = True
            self.buffer_characters(val_lower)
            self.bump_word = prev

    # -- open/close (reference: parser.c:1095-1250) ---------------------------
    def open_tag(
        self,
        tag: str,
        attrs: list[tuple[str, str]] | None,
        prefix: str | None = None,
    ) -> None:
        baked = self.bake_tag(tag, attrs, prefix)
        if baked is None:
            # HTML <meta name content> handled recursively; raw tag still
            # tracked on domstack (parser.c:1132-1134)
            if self._fast_ctx:
                self.domstack.append(tag)
            else:
                self._push(self.domstack, tag, tag, ".")
            return
        if self._fast_ctx:
            # no dotted definition/alias can exist (eligibility gate):
            # the flattened DOM path can never match, so skip building
            # its context string and the four dom_ctx dict probes; the
            # per-doc overlays are provably empty here (no auto policy),
            # so probe the config dicts directly
            cfg = self.config
            self.domstack.append(tag)
            if baked in cfg.properties:
                self.add_stack_to_prop_buf(None)
                self._clear_prop_buf()
                self._push(self.propstack, tag, baked, "/")
            if baked in cfg.metanames:
                head = self.metastack[-1]
                self.flush_buffer(head.baked, head.context)
                self._push(self.metastack, tag, baked, "/")
            return
        self._push(self.domstack, tag, baked, ".")
        dom_ctx = self.domstack[-1].context

        if self.prop_defined(baked) or self.prop_defined(dom_ctx):
            self.add_stack_to_prop_buf(None)  # dump to open props (parser.c:1152)
            self._clear_prop_buf()
            push_baked = dom_ctx if self.prop_defined(dom_ctx) else baked
            self._push(self.propstack, tag, push_baked, "/")

        if self.meta_defined(baked) or self.meta_defined(dom_ctx):
            head = self.metastack[-1]
            self.flush_buffer(head.baked, head.context)
            # NB: the reference checks the *properties* hash here too
            # (parser.c:1181-1186) — replicated verbatim
            push_baked = dom_ctx if self.prop_defined(dom_ctx) else baked
            self._push(self.metastack, tag, push_baked, "/")

    def close_tag(self, tag: str, prefix: str | None = None) -> None:
        baked = self.bake_tag(tag, None, prefix)
        if baked is None:
            return
        # inlined _pop_on_match (hot: every end tag; the roots are kept,
        # reference parser.c:3075-3080)
        ps = self.propstack
        if ps[-1].raw == tag and len(ps) > 1:
            st = ps.pop()
            self.add_stack_to_prop_buf(st.baked)
            self._clear_prop_buf()
        ms = self.metastack
        if ms[-1].raw == tag and len(ms) > 1:
            st = ms.pop()
            self.flush_buffer(st.baked, st.context)
        if self.domstack:
            self.domstack.pop()

    # -- comments (reference: parser.c:1321-1388) ------------------------------
    def comment(self, text: str) -> None:
        t = text.strip(_WS)
        if not t:
            return
        if t.lower().startswith("swishcommand"):
            t = t[len("swishcommand") :].strip(_WS)
            cmd_found = True
        else:
            cmd_found = False
        if t.lower() == "noindex":
            self.ignore_content += 1
            return
        if t.lower() == "index":
            if self.ignore_content > 0:
                self.ignore_content -= 1
            return
        if cmd_found:
            return
        self.bump_word = True  # parser.c:1380-1381

    # -- document drivers ------------------------------------------------------
    def end_document(self) -> None:
        # reference: parser.c:831-846
        self.flush_buffer(DEFAULT_METANAME, DEFAULT_METANAME)

    def consume(self, events) -> None:
        # hot loop: bind the bound methods once, not per event
        buffer_characters = self.buffer_characters
        open_tag = self.open_tag
        close_tag = self.close_tag
        comment = self.comment
        for ev in events:
            k = ev[0]
            if k == "text":
                buffer_characters(ev[1])
            elif k == "start":
                open_tag(ev[1], ev[2], ev[3])
            elif k == "end":
                close_tag(ev[1], ev[2])
            elif k == "comment":
                comment(ev[1])


def parse_document(
    doc_id: str,
    spans: list,
    parser: str | None = None,
    mime: str | None = None,
    config: SwishConfig | None = None,
    include_resolver=None,
    error: str | None = None,
) -> dict:
    """Parse one interleaved (text|media) span document.

    ``spans`` elements are mappings/tuples with fields
    (kind, text, media_ref, offset). Markup documents usually arrive as
    a single text span carrying the full markup; pre-split documents
    with interleaved media spans are concatenated in offset order, media
    spans becoming media events at their interleave points.

    Returns the extracted row dict. ``include_resolver`` (optional)
    maps an XInclude href to resolved (text, parser) for P10 support.
    """
    cfg = config or default_config()
    if parser is None:
        parser = cfg.parser_for_mime(mime) if mime else _guess_parser(doc_id, cfg)
    parser = (parser or "HTML").upper()

    if error:
        # ingest-level failure (e.g. undecodable bytes): the reference
        # aborts the whole document parse (parser.c:2505 error path), so
        # no spans — not even the TXT title-from-path — are emitted.
        return {
            "doc_id": doc_id,
            "spans": [],
            "metanames": {},
            "properties": {},
            "nwords": 0,
            "parser": parser,
            "error": error,
        }

    state = parse_to_state(doc_id, spans, parser, cfg, include_resolver)

    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": r, "order": o}
            for (k, t, r, o) in state.spans
        ],
        "metanames": state.metanames,
        "properties": state.properties,
        "nwords": state.nwords,
        "parser": parser,
        "error": state.error,
    }


def parse_to_state(
    doc_id: str,
    spans: list,
    parser: str,
    cfg: SwishConfig,
    include_resolver=None,
    keep_token_meta: bool = False,
) -> DocState:
    """Core parse returning the raw DocState (span tuples, not dicts) —
    the Arrow fast path builds columnar output from this directly."""
    # TXTW/HTMLW/XMLW: a WHOLE (unsegmented) document routed through the
    # megadoc single-pass router (operators/megadoc.py) — plain TXT/HTML/
    # XML semantics, but the doc_id carries the router's 3-field \x02
    # tail (stripped here so TXT title-from-path and XInclude href
    # resolution see the real id; the tail stays on the OUTPUT doc_id
    # for the uniform downstream strip).
    if parser in ("TXTW", "HTMLW", "XMLW"):
        if "\x02" in doc_id:
            doc_id = doc_id.rsplit("\x02", 3)[0]
        parser = parser[:-1]
    state = DocState(cfg, is_html=parser.startswith("H"), uri=doc_id)
    state.keep_token_meta = keep_token_meta

    try:
        if parser.startswith("T") or parser == "PDF":
            # TXT path: concatenate text, media spans become media
            # markers. PDF rows arrive with text already recovered by
            # functions/pdf.py at ingest (opt-in application/pdf→PDF
            # mapping) and get full TXT semantics incl. title-from-path.
            state._push(state.metastack, DEFAULT_METANAME, DEFAULT_METANAME, "/")
            for sp in spans:
                kind, text, ref = _span_fields(sp)
                if kind == "media":
                    state.bump_word = True
                    state.add_media(ref)
                else:
                    state.buffer_characters(text)
            state.flush_buffer(DEFAULT_METANAME, DEFAULT_METANAME)
            # TXTSEG: mega-doc segment — TXT semantics without the
            # title-from-path tail (added once at reassembly; megadoc.py)
            if state.uri and parser != "TXTSEG":
                state._push(state.metastack, TITLE_METANAME, TITLE_METANAME, "/")
                state.buffer_characters(state.uri)
                state.flush_buffer(TITLE_METANAME, TITLE_METANAME)
        else:
            # HTMLSEG: one mega-doc HTML segment (operators/megadoc.py).
            # The doc_id tail carries (idx, seed, nseg); seed=1 means the
            # unsegmented parse had a non-empty meta buffer at this cut,
            # so the segment's first buffered text must pay the pending
            # word-boundary bumper exactly where the single-pass parse
            # would have inserted it (buffer_characters bumper rule) —
            # priming meta_len makes that happen locally, which keeps
            # every local position = global position − Σ prior end_pos.
            if parser in ("HTMLSEG", "XMLSEG") and "\x02" in doc_id:
                try:
                    if int(doc_id.rsplit("\x02", 2)[1]):
                        state.meta_len = 1
                except (ValueError, IndexError):
                    pass
            scanner = html_events if state.is_html else xml_events
            # libxml2 never delivers characters OUTSIDE the root element
            # (before it, after its close, or trailing a recovered bogus
            # close at depth 0) — e.g. the newline between <?xml?> and
            # <root> is not a SAX characters() event, so it must not
            # seed the buffer with a pre-root bump (verified against a
            # compiled reference binary: '<?xml?>\n<doc>hello' tokenizes
            # hello at pos 1, not 2). Whole-doc XML parses track element
            # depth across spans; XMLSEG segments other than the first
            # sit at global depth > 0, so no filtering there.
            xml_depth: list[int] | None = None
            if not state.is_html:
                # [depth, phase, ext_dtd] — phase tracks prolog/root/
                # fatal (see _consume_markup); ext_dtd flips when an
                # external-id DOCTYPE is seen (invalid entity refs
                # downgrade from fatal wound to benign skip). A doc's
                # FIRST segment keeps the phase cell (it contains the
                # prolog; the cut scanner refuses docs with depth-0
                # text or extra top-level content, so a multi-segment
                # seg 0 can never trip the extra-content rule); later
                # segments sit at global depth > 0 and skip the gates.
                xml_depth = [0, 0, 0]
                if parser == "XMLSEG" and "\x02" in doc_id:
                    try:
                        if int(doc_id.rsplit("\x02", 3)[1]):
                            xml_depth = None  # mid-doc segment
                    except (ValueError, IndexError):
                        pass
            for sp in spans:
                kind, text, ref = _span_fields(sp)
                if kind == "media":
                    state.bump_word = True
                    state.add_media(ref)
                else:
                    _consume_markup(
                        state, scanner, text, include_resolver, xml_depth
                    )
            state.end_document()
            if parser in ("HTMLSEG", "XMLSEG"):
                # end position rides a reserved metaname so the fixed
                # extraction schema carries it to the reassembly stage
                state.metanames[SEG_INFO_KEY] = str(state.pos)
    except ValueError as e:
        state.error = str(e)
    return state


_NON_ASCII_RE = re.compile(r"[^\x00-\x7f]")
def _wounded_text(raw: str) -> str:
    """Post-fatal text delivery (libxml2 2.13, no recovery), mapped
    empirically: ALL reference tokens disappear (valid ones too — the
    entity machinery is dead) and DELIMIT runs like markup does; each
    run is delivered only up to its first non-ASCII byte; malformed
    refs consume the same bytes as at wound time ('&#zz;' → 'zz;'
    survives)."""
    out = []
    pos = 0
    n = len(raw)
    while pos < n:
        i = raw.find("&", pos)
        run = raw[pos:] if i < 0 else raw[pos:i]
        if run:
            if run.isascii():
                out.append(run)
            else:
                out.append(run[: _NON_ASCII_RE.search(run).start()])
        if i < 0:
            break
        m = _ENT_RE.match(raw, i)
        pos = m.end() if m else i + _bad_ref_consumed(raw, i)
    return "".join(out)


_XINCLUDE_NS_URIS = frozenset(
    (
        "http://www.w3.org/2001/XInclude",
        "http://www.w3.org/2003/XInclude",  # the OLD_NS the reference accepts
    )
)


def _consume_markup(
    state: DocState,
    scanner,
    text: str,
    include_resolver,
    xml_depth: list[int] | None = None,
) -> None:
    """Event loop with XInclude expansion (reference: parser.c:919-951).

    An ``<xi:include href=...>`` element whose prefix is bound to either
    XInclude namespace triggers ``process_xinclude`` semantics
    (parser.c:990-1079): flush the parent buffer, parse the referenced
    document as a *fresh* child document (``parse="text"`` forces the
    TXT parser), then merge child tokens/metanames/properties into the
    parent with renumbered positions (parser.c:963-988).

    ``xml_depth`` (whole-doc XML parses): a 1-element element-depth
    counter shared across a doc's spans; text events at depth 0 are
    dropped — libxml2 fires no characters() callback outside the root
    element, so pre-root/post-root whitespace must not touch the buffer.
    The same gate drops MISMATCHED end tags: libxml2's recovering XML
    parser emits only an "Opening and ending tag mismatch" warning and
    NO endElement callback for a close that does not match the open
    element (verified with a compiled reference binary on badxml.xml —
    its SAX trace shows three open_tag calls and zero close_tag calls
    around the mismatches), so a bogus close must not bake a bump.
    Segmented XML parses keep the permissive behavior: a segment
    legitimately closes elements opened in earlier segments.

    ``xml_depth[1]`` is the well-formedness phase (whole-doc only),
    mirroring libxml2's fatal handling verified against the binary:
    0 = prolog (only whitespace/comments/PIs seen), 1 = root element
    seen, 2 = skip everything, 3 = wounded (see below). Non-whitespace
    TEXT in the prolog ("Start tag expected" — 'pre <root>x</root>')
    kills the ENTIRE document: libxml2 delivers no callbacks at all, so
    the reference indexes nothing. A SECOND top-level element ("Extra
    content at the end of the document" — '<root>x</root><extra>y'
    '</extra>') ends delivery at the root's close: the extra element is
    never seen.

    Phase 3 — WOUNDED — is libxml2's post-TAG_NAME_MISMATCH state,
    mapped empirically against the compiled binary (probes q1-q16,
    libxml2 2.13 without XML_PARSE_RECOVER): the first close tag that
    does not match the open element pops ONE element silently, and from
    then on startElement/endElement callbacks NEVER fire again while
    the internal parser keeps tracking depth (every later close pops
    one element silently, opens push); characters() KEEPS streaming
    into the buffer at the wound-time context until the internal stack
    empties, after which nothing more is delivered. The residual buffer
    then flushes at end-of-document under swishdefault (myendDocument,
    parser.c:832-846) — so '<title><p></b>word</title>' indexes word
    under swishdefault, with NO swishtitle buffer or property.
    """
    follow = state.config.follow_xinclude and include_resolver is not None
    if not follow and xml_depth is None:
        # HTML/segment path with no XInclude: plain dispatch, no
        # depth/stack/namespace bookkeeping — take the tight loop
        state.consume(scanner(text))
        return
    ns_bindings: dict[str, str] = {}
    open_stack: list[str] | None = [] if xml_depth is not None else None
    phased = xml_depth is not None and len(xml_depth) > 1
    for ev in scanner(text):
        k = ev[0]
        if phased and xml_depth[1] == 2:
            continue  # fatal prolog text / extra content: nothing more
        if phased and xml_depth[1] == 3:
            # wounded: element callbacks are gone; depth-track silently.
            # Text arrives as LITERAL bytes with entity/charref
            # expansions removed, each run (markup- or entity-
            # delimited) truncated at its first NON-ASCII byte, and
            # CDATA blocks (raw=None) dropped — all verified against
            # the binary: 'x&amp;y' → 'xy'; 'a Σ b<q/>c d' → 'a c d'
            if k == "start":
                xml_depth[0] += 1
            elif k == "end":
                xml_depth[0] -= 1
                if xml_depth[0] <= 0:
                    xml_depth[1] = 2
            elif k == "text":
                raw = ev[2] if len(ev) > 2 else ev[1]
                if raw is not None:
                    t = _wounded_text(raw)
                    if t:
                        # empty-after-truncation delivers NO callback:
                        # no bumper, no bump_word reset
                        state.buffer_characters(t)
            # comment callbacks are suppressed too: a post-wound
            # SwishCommand noindex comment has no effect (verified —
            # the binary keeps indexing after it)
            continue
        if k == "text":
            if xml_depth is not None and xml_depth[0] == 0:
                if phased and xml_depth[1] == 0 and ev[1].strip():
                    # non-whitespace before the root element: libxml2
                    # fatals and the whole doc yields nothing
                    xml_depth[1] = 2
                continue
            if phased and WOUND_SENTINEL in ev[1]:
                # invalid byte in the source encoding (decode-level
                # marker, sources.files._decode): libxml2 fatals at
                # the byte — text before it delivers, the REST OF THIS
                # RUN drops entirely (probes m4/m5/t1), and the parse
                # is wounded from there
                i = ev[1].find(WOUND_SENTINEL)
                if i:
                    state.buffer_characters(ev[1][:i])
                xml_depth[1] = 3
                continue
            if phased and len(ev) > 2 and ev[2] is not None and "&" in ev[2]:
                # an undefined entity / malformed or out-of-range
                # charref in content is FATAL: text before it delivers
                # normally, the ref's bytes are consumed, and the parse
                # is wounded from that point (probes e8-e10, f1-f7).
                # A bare or internal-subset-only DOCTYPE changes
                # NOTHING (six wound shapes probed token-identical;
                # the libxml2 message downgrades error → warning but
                # the SAX wound is the same). An EXTERNAL-id DOCTYPE
                # (SYSTEM/PUBLIC) is different: the unloadable DTD
                # might define the entity, so every invalid ref is a
                # BENIGN SKIP — same byte consumption, parse continues,
                # elements/CDATA/non-ASCII all deliver normally
                # (probes r1-r8, s1-s13; mismatched closes still wound)
                bad = _first_invalid_ref(ev[2])
                if bad is not None:
                    raw = ev[2]
                    if xml_depth[2]:
                        # the DTD might define a WELL-FORMED `&name;`
                        # (and only that shape — `&#zz;`, bare `&`,
                        # `&name`-no-semicolon and out-of-range
                        # numerics wound even here, probed s6-s8/
                        # s12-s13): skip such refs until a truly
                        # malformed one appears
                        while bad is not None and _WF_NAMED_REF_RE.match(
                            raw, bad[0]
                        ):
                            i, consumed = bad
                            if i:
                                state.buffer_characters(
                                    xml_unescape(raw[:i])
                                )
                            raw = raw[i + consumed :]
                            bad = _first_invalid_ref(raw)
                        if bad is None:
                            if raw:
                                state.buffer_characters(xml_unescape(raw))
                            continue
                    i, consumed = bad
                    if i:
                        state.buffer_characters(xml_unescape(raw[:i]))
                    xml_depth[1] = 3
                    rest = _wounded_text(raw[i + consumed :])
                    if rest:
                        state.buffer_characters(rest)
                    continue
            state.buffer_characters(ev[1])
        elif k == "start":
            if phased and len(ev) > 6 and (ev[6] > 1 or not xml_depth[2]):
                # invalid ref in an ATTRIBUTE value: the parse wounds
                # AT this start tag — no callbacks for the element,
                # silent depth push, wound-mode delivery from here
                # (probes x1-x7/z1-z7; an external-id DTD rescues only
                # well-formed `&name;` refs — badness 1 — in which
                # case the scanner already stripped them and we fall
                # through to a normal start)
                xml_depth[1] = 3
                # always push: a self-closing tag's SYNTHETIC end event
                # (and a real close later) pops it back in wound mode
                xml_depth[0] += 1
                continue
            if xml_depth is not None:
                if phased:
                    if xml_depth[1] == 0:
                        xml_depth[1] = 1
                    elif xml_depth[0] == 0:
                        # second top-level element = extra content
                        xml_depth[1] = 2
                        continue
                xml_depth[0] += 1
            if open_stack is not None:
                # qname as written (prefix restored) — libxml2 matches
                # end tags against the full name
                open_stack.append(
                    (ev[3] + ":" + ev[1]) if ev[3] else ev[1]
                )
            if follow:
                # prefix→uri bindings ride the event's nsdecls slot
                # (xml_events separates them from attrs, as libxml2's
                # SAX2 layer does); html_events has no such slot
                if len(ev) > 5:
                    for p, u in ev[5]:
                        ns_bindings[p] = u
                if (
                    ev[1] == "include"
                    and ev[3]
                    and ns_bindings.get(ev[3]) in _XINCLUDE_NS_URIS
                ):
                    _process_xinclude(state, ev[2] or [], include_resolver)
            state.open_tag(ev[1], ev[2], ev[3])
        elif k == "end":
            if open_stack is not None:
                qname = (ev[2] + ":" + ev[1]) if ev[2] else ev[1]
                if not open_stack or open_stack[-1] != qname:
                    # mismatched close: libxml2 pops its top element
                    # SILENTLY (no endElement callback) — and the
                    # TAG_NAME_MISMATCH fatal wounds the parse: no
                    # element callback fires again (phase 3 above)
                    if open_stack:
                        open_stack.pop()
                        if xml_depth is not None and xml_depth[0] > 0:
                            xml_depth[0] -= 1
                    if phased:
                        xml_depth[1] = 2 if xml_depth[0] <= 0 else 3
                    continue
                open_stack.pop()
            if xml_depth is not None and xml_depth[0] > 0:
                xml_depth[0] -= 1
            state.close_tag(ev[1], ev[2])
        elif k == "comment":
            state.comment(ev[1])
        elif k == "dtd":
            # external-id DOCTYPE seen: benign-skip entity recovery
            if xml_depth is not None and len(xml_depth) > 2:
                xml_depth[2] = 1
        elif k == "wound":
            # scanner-detected fatal (double-hyphen comment): same
            # phase-3 wound as a mismatched close — works pre-root too
            # ('<!-- x -- y --><root>a<title>t</title>b' indexes the
            # merged 'atb', probe e1)
            if phased:
                xml_depth[1] = 3


def _process_xinclude(state: DocState, attrs, include_resolver) -> None:
    href = next((v for k, v in attrs if k.lower() == "href"), None)
    parse_mode = next((v for k, v in attrs if k.lower() == "parse"), "xml")
    if not href:
        return
    head = state.metastack[-1]
    state.flush_buffer(head.baked, head.context)  # parser.c:1040-1043
    resolved = include_resolver(href, state.uri)
    if resolved is None:
        return  # missing file: skipped with a warning (parser.c:1052-1054)
    child_uri, child_text, child_parser = resolved
    # cycle guard: the reference would recurse into the filesystem until
    # it blew the stack on a self-include; bounded data can't be allowed
    # to do that to an executor. In-flight URIs are tracked on the
    # resolver (sequential per-document parse, so a plain set suffices).
    active = getattr(include_resolver, "_active", None)
    if active is None:
        active = set()
        try:
            include_resolver._active = active
        except AttributeError:
            return
    if child_uri == state.uri or child_uri in active or len(active) >= 8:
        return
    if parse_mode == "text":
        child_parser = "TXT"  # parser.c:1056-1059
    active.add(state.uri)
    try:
        child = parse_to_state(
            child_uri,
            [{"kind": "text", "text": child_text, "media_ref": "", "offset": 0}],
            child_parser,
            state.config,
            include_resolver=include_resolver,
            keep_token_meta=state.keep_token_meta,
        )
    finally:
        active.discard(state.uri)
    if child.error:
        return  # failed child parse: skipped like a missing file
    # merge (xinclude_handler, parser.c:963-988): child tokens appended
    # with fresh parent positions; nwords summed; named buffers concat'd.
    # Each child token KEEPS its own metaname/context — the reference
    # merge copies the token's shared MetaName pointer, so a TXT child's
    # title-from-path tokens stay under swishtitle in the parent's
    # postings (verified live: SWISH_DEBUG=4 over xinclude.xml).
    mi = 0
    child_refs = dict(child.s_refs)
    for ci, (kind, text) in enumerate(zip(child.s_kindc, child.s_text)):
        if not kind:  # word
            state.pos += 1
            state.nwords += 1
            state.s_kindc.append(0)
            state.s_text.append(text)
            state.s_ord.append(state.pos)
            if state.keep_token_meta:
                state.token_meta.append(child.token_meta[mi])
                mi += 1
        else:
            state.s_refs.append((len(state.s_kindc), child_refs.get(ci, "")))
            state.s_kindc.append(1)
            state.s_text.append("")
            state.s_ord.append(state.pos + 1)
    for name, val in child.metanames.items():
        if state.meta_defined(name):
            state._nb_add(state.metanames, name, val, cleanwsp=False)
    for name, val in child.properties.items():
        if state.prop_defined(name):
            state._nb_add(state.properties, name, val, cleanwsp=False)


def make_include_resolver(include_map: dict):
    """Resolver over a resolved-path-keyed map (the Spark-side XInclude
    join collects referenced docs into this map; the reference resolves
    hrefs against the parent URI's directory, parser.c:1005-1027).

    Values may be ``(text, parser)`` tuples (driver-side maps) or
    ``{"text":…, "parser":…}`` mappings (the per-row ``includes`` map
    column produced by ``operators.xinclude.with_includes``).
    """
    import posixpath

    def resolver(href: str, parent_uri: str):
        if href.startswith("/"):
            key = href
        else:
            key = posixpath.normpath(posixpath.join(posixpath.dirname(parent_uri), href))
        hit = include_map.get(key)
        if hit is None:
            return None
        if isinstance(hit, dict):
            return key, hit.get("text") or "", hit.get("parser")
        text, parser = hit
        return key, text, parser

    return resolver


def _span_fields(sp) -> tuple[str, str, str]:
    if type(sp) is tuple and len(sp) == 3:
        # the Arrow kernel's row_spans yields exact (kind, text, ref)
        # tuples — skip the attribute probing (hot: once per span)
        kind, text, ref = sp
        return kind or "text", text or "", ref or ""
    if isinstance(sp, dict):
        return sp.get("kind") or "text", sp.get("text") or "", sp.get("media_ref") or ""
    # pyspark Row / tuple
    kind = getattr(sp, "kind", None) or (sp[0] if len(sp) > 0 else "text")
    text = getattr(sp, "text", None) or (sp[1] if len(sp) > 1 else "")
    ref = getattr(sp, "media_ref", None) or (sp[2] if len(sp) > 2 else "")
    return kind or "text", text or "", ref or ""


def _guess_parser(doc_id: str, cfg: SwishConfig) -> str:
    # reference: docinfo.c:202-258 (ext → mime → parser)
    ext = doc_id.rsplit(".", 1)[-1].lower() if "." in doc_id else ""
    return cfg.parser_for_mime(cfg.mime_for_ext(ext))
