"""Extraction configuration.

Mirrors the reference's ``swish_Config`` (reference:
src/libswish3/libswish3.h:284-312) as an immutable-ish Python dataclass
that the Spark driver resolves once and broadcasts to executors.

Defaults replicate ``swish_config_set_default`` (reference:
src/libswish3/config.c:268-373) and ``swish_config_flags_init``
(config.c:189-194).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field, replace

# --- constants (reference: src/libswish3/libswish3.h) ---------------------
DEFAULT_METANAME = "swishdefault"  # libswish3.h:83
TITLE_METANAME = "swishtitle"  # libswish3.h:84
PROP_TITLE = "swishtitle"  # libswish3.h:111
PROP_DESCRIPTION = "swishdescription"  # libswish3.h:114
TOKENPOS_BUMPER = "\x03"  # libswish3.h:119
DOT = "."  # libswish3.h:120 (domstack joiner)
DOM_CHAR = "/"  # libswish3.h:122 (meta/prop stack joiner)
DOM_STR = "/"  # libswish3.h:123 (propstack sentinel)
XMLNS_CHAR = ":"  # libswish3.h:124
MAX_WORD_LEN = 256  # libswish3.h:42
MIN_WORD_LEN = 1  # libswish3.h:43
TITLE_TAG = "title"  # libswish3.h:85
BODY_TAG = "body"  # libswish3.h:86
CLASS_ATTRIBUTES = "XMLClassAttributes"  # libswish3.h:57
DEFAULT_ENCODING = "UTF-8"  # libswish3.h:192
LATIN1_ENCODING = "ISO8859-1"  # libswish3.h:193
MAX_FILE_SIZE = 100_000_000  # libswish3.h:177 — skew guard at scale

# Undefined-tag policies (reference: libswish3.h:155-168)
UNDEF_INDEX = "index"  # default for UndefinedMetaTags
UNDEF_ERROR = "error"
UNDEF_IGNORE = "ignore"
UNDEF_AUTO = "auto"
UNDEF_AUTOALL = "autoall"
UNDEF_DISABLE = "disable"  # default for UndefinedXMLAttributes

PROP_STRING = 1  # libswish3.h:102-104
PROP_DATE = 2
PROP_INT = 3


@dataclass(frozen=True)
class MetaName:
    """reference: libswish3.h:336-343."""

    name: str
    id: int = 0
    bias: int = 0
    alias_for: str | None = None


@dataclass(frozen=True)
class Property:
    """reference: libswish3.h:345-358."""

    name: str
    id: int = 0
    ignore_case: bool = True
    type: int = PROP_STRING
    verbatim: bool = False
    alias_for: str | None = None
    max: int = 0
    sort: bool = True
    presort: bool = True
    sort_length: int = 0


# The reference's complete 152-pair default ext→MIME table
# (reference: src/libswish3/mime_types.c:35-200, SWISH_MIME_TABLE);
# unknown extensions fall back to ``text/plain`` exactly like
# ``swish_mime_get_type`` does (mime_types.c:236-251).
_REFERENCE_MIME_TABLE: dict[str, str] = {
    "ai": "application/postscript",
    "aif": "audio/x-aiff",
    "aifc": "audio/x-aiff",
    "aiff": "audio/x-aiff",
    "asc": "text/plain",
    "au": "audio/basic",
    "avi": "video/x-msvideo",
    "bcpio": "application/x-bcpio",
    "bin": "application/octet-stream",
    "bmp": "image/bmp",
    "cdf": "application/x-netcdf",
    "cgm": "image/cgm",
    "class": "application/octet-stream",
    "cpio": "application/x-cpio",
    "cpt": "application/mac-compactpro",
    "csh": "application/x-csh",
    "css": "text/css",
    "dcr": "application/x-director",
    "dir": "application/x-director",
    "djv": "image/vnd.djvu",
    "djvu": "image/vnd.djvu",
    "dll": "application/octet-stream",
    "dmg": "application/octet-stream",
    "dms": "application/octet-stream",
    "doc": "application/msword",
    "dtd": "application/xml-dtd",
    "dvi": "application/x-dvi",
    "dxr": "application/x-director",
    "eps": "application/postscript",
    "etx": "text/x-setext",
    "exe": "application/octet-stream",
    "ez": "application/andrew-inset",
    "gif": "image/gif",
    "gram": "application/srgs",
    "grxml": "application/srgs+xml",
    "gtar": "application/x-gtar",
    "gz": "application/x-gzip",
    "hdf": "application/x-hdf",
    "hqx": "application/mac-binhex40",
    "htm": "text/html",
    "html": "text/html",
    "ice": "x-conference/x-cooltalk",
    "ico": "image/x-icon",
    "ics": "text/calendar",
    "ief": "image/ief",
    "ifb": "text/calendar",
    "iges": "model/iges",
    "igs": "model/iges",
    "jpe": "image/jpeg",
    "jpeg": "image/jpeg",
    "jpg": "image/jpeg",
    "js": "application/x-javascript",
    "kar": "audio/midi",
    "latex": "application/x-latex",
    "lha": "application/octet-stream",
    "lzh": "application/octet-stream",
    "m3u": "audio/x-mpegurl",
    "m4u": "video/vnd.mpegurl",
    "man": "application/x-troff-man",
    "mathml": "application/mathml+xml",
    "me": "application/x-troff-me",
    "mesh": "model/mesh",
    "mid": "audio/midi",
    "midi": "audio/midi",
    "mif": "application/vnd.mif",
    "mov": "video/quicktime",
    "movie": "video/x-sgi-movie",
    "mp2": "audio/mpeg",
    "mp3": "audio/mpeg",
    "mpe": "video/mpeg",
    "mpeg": "video/mpeg",
    "mpg": "video/mpeg",
    "mpga": "audio/mpeg",
    "ms": "application/x-troff-ms",
    "msh": "model/mesh",
    "mxu": "video/vnd.mpegurl",
    "nc": "application/x-netcdf",
    "oda": "application/oda",
    "ogg": "application/ogg",
    "pbm": "image/x-portable-bitmap",
    "pdb": "chemical/x-pdb",
    "pdf": "application/pdf",
    "pgm": "image/x-portable-graymap",
    "pgn": "application/x-chess-pgn",
    "png": "image/png",
    "pnm": "image/x-portable-anymap",
    "ppm": "image/x-portable-pixmap",
    "ppt": "application/vnd.ms-powerpoint",
    "ps": "application/postscript",
    "qt": "video/quicktime",
    "ra": "audio/x-pn-realaudio",
    "ram": "audio/x-pn-realaudio",
    "ras": "image/x-cmu-raster",
    "rdf": "application/rdf+xml",
    "rgb": "image/x-rgb",
    "rm": "application/vnd.rn-realmedia",
    "roff": "application/x-troff",
    "rtf": "text/rtf",
    "rtx": "text/richtext",
    "sgm": "text/sgml",
    "sgml": "text/sgml",
    "sh": "application/x-sh",
    "shar": "application/x-shar",
    "silo": "model/mesh",
    "sit": "application/x-stuffit",
    "skd": "application/x-koan",
    "skm": "application/x-koan",
    "skp": "application/x-koan",
    "skt": "application/x-koan",
    "smi": "application/smil",
    "smil": "application/smil",
    "snd": "audio/basic",
    "so": "application/octet-stream",
    "spl": "application/x-futuresplash",
    "src": "application/x-wais-source",
    "sv4cpio": "application/x-sv4cpio",
    "sv4crc": "application/x-sv4crc",
    "svg": "image/svg+xml",
    "swf": "application/x-shockwave-flash",
    "t": "application/x-troff",
    "tar": "application/x-tar",
    "tcl": "application/x-tcl",
    "tex": "application/x-tex",
    "texi": "application/x-texinfo",
    "texinfo": "application/x-texinfo",
    "tif": "image/tiff",
    "tiff": "image/tiff",
    "tr": "application/x-troff",
    "tsv": "text/tab-separated-values",
    "txt": "text/plain",
    "ustar": "application/x-ustar",
    "vcd": "application/x-cdlink",
    "vrml": "model/vrml",
    "vxml": "application/voicexml+xml",
    "wav": "audio/x-wav",
    "wbmp": "image/vnd.wap.wbmp",
    "wbxml": "application/vnd.wap.wbxml",
    "wml": "text/vnd.wap.wml",
    "wmlc": "application/vnd.wap.wmlc",
    "wmls": "text/vnd.wap.wmlscript",
    "wmlsc": "application/vnd.wap.wmlscriptc",
    "wrl": "model/vrml",
    "xbm": "image/x-xbitmap",
    "xht": "application/xhtml+xml",
    "xhtml": "application/xhtml+xml",
    "xls": "application/vnd.ms-excel",
    "xml": "application/xml",  # w3 standard is application/xml now
    "xpm": "image/x-xpixmap",
    "xsl": "application/xml",
    "xslt": "application/xslt+xml",
    "xul": "application/vnd.mozilla.xul+xml",
    "xwd": "image/x-xwindowdump",
    "xyz": "chemical/x-xyz",
    "zip": "application/zip",
}

# Modern additions not in the 2000s-era reference table (kept separate so
# the reference-parity test can assert the table above byte-for-byte).
_EXTRA_MIMES: dict[str, str] = {
    "json": "application/json",
    "csv": "text/csv",
    "md": "text/plain",
    "mp4": "video/mp4",
    "text": "text/plain",
    "c": "text/plain",
    "h": "text/plain",
    "pl": "text/plain",
    "py": "text/plain",
}


def _default_mimes() -> dict[str, str]:
    """Extension -> MIME map: the reference's full 152-pair table plus
    modern extras; unknown extensions fall back to ``text/plain``."""
    return {**_EXTRA_MIMES, **_REFERENCE_MIME_TABLE}


@dataclass(frozen=True)
class SwishConfig:
    """Broadcastable extraction config.

    Field-for-field analogue of ``swish_Config`` + ``swish_ConfigFlags``
    (reference: libswish3.h:284-312). Frozen so it is safe to broadcast.
    """

    metanames: dict[str, MetaName] = field(default_factory=dict)
    properties: dict[str, Property] = field(default_factory=dict)
    tag_aliases: dict[str, str] = field(default_factory=dict)
    parsers: dict[str, str] = field(default_factory=dict)
    mimes: dict[str, str] = field(default_factory=dict)
    stringlists: dict[str, tuple[str, ...]] = field(default_factory=dict)
    index: dict[str, str] = field(default_factory=dict)
    # prefix → uri declarations so namespaced metanames (swish:color,
    # foo:name — reference: 002-header.t, test_configs/xmlns.xml)
    # round-trip through config_to_xml
    xmlns: dict[str, str] = field(default_factory=dict)
    # flags (reference: config.c:189-194)
    tokenize: bool = True
    cascade_meta_context: bool = False
    ignore_xmlns: bool = True
    follow_xinclude: bool = True
    undef_metas: str = UNDEF_INDEX
    undef_attrs: str = UNDEF_DISABLE
    default_encoding: str = DEFAULT_ENCODING
    # T10 pluggable tokenizer (reference: analyzer->tokenizer fn ptr
    # libswish3.h:411-412; Perl binding token regex 3.pm:102-133):
    # token_regex serializes in the broadcast config; tokenizer is a
    # registry name resolved on the executor (tokenizer.resolve_tokenizer)
    tokenizer: str = "default"
    token_regex: str | None = None

    # -- lookups -----------------------------------------------------------
    def mime_for_ext(self, ext: str) -> str:
        # reference: mime_types.c:236-251 (fallback text/plain)
        return self.mimes.get(ext.lower(), "text/plain")

    def parser_for_mime(self, mime: str | None) -> str:
        # reference: mime_types.c:253-273 + config.c:341-351
        if mime:
            p = self.parsers.get(mime.lower())
            if p:
                return p
        return self.parsers.get("default", "HTML")

    def with_overrides(self, **kw) -> "SwishConfig":
        return replace(self, **kw)


def default_config(**overrides) -> SwishConfig:
    """The reference's default config (reference: config.c:268-373)."""
    metanames = {
        DEFAULT_METANAME: MetaName(DEFAULT_METANAME, id=0),
        TITLE_METANAME: MetaName(TITLE_METANAME, id=1),
    }
    properties = {
        PROP_DESCRIPTION: Property(PROP_DESCRIPTION, id=2, sort=False),
        PROP_TITLE: Property(PROP_TITLE, id=1),
    }
    parsers = {
        "text/plain": "TXT",
        "application/xml": "XML",
        "text/xml": "XML",
        "text/html": "HTML",
        "default": "HTML",
    }
    tag_aliases = {
        TITLE_TAG: TITLE_METANAME,  # config.c:366-368
        BODY_TAG: PROP_DESCRIPTION,  # config.c:369-371
    }
    cfg = SwishConfig(
        metanames=metanames,
        properties=properties,
        tag_aliases=tag_aliases,
        parsers=parsers,
        mimes=_default_mimes(),
        index={"Format": "Native", "Name": "index.swish"},
    )
    if overrides:
        cfg = cfg.with_overrides(**overrides)
    return cfg


# ---------------------------------------------------------------------------
# Config file loader ("DDL" surface). Reads the swish.xml-format config
# (reference: src/libswish3/header.c:616-793) into a SwishConfig.
# ---------------------------------------------------------------------------

_FLAG_KEYS = {
    "tokenize": "tokenize",
    "cascademetacontext": "cascade_meta_context",
    "ignorexmlnamespaces": "ignore_xmlns",
    "followxinclude": "follow_xinclude",
}


def _to_bool(s: str) -> bool:
    return s.strip().lower() in ("1", "yes", "true", "on")


def load_config_xml(
    text: str,
    base: SwishConfig | None = None,
    _resolver=None,
    _depth: int = 0,
) -> SwishConfig:
    """Parse a ``<swish>`` config document and merge over ``base``.

    Sections handled per reference header.c: MetaNames (header.c:325-355,
    text children = aliases header.c:275-323), PropertyNames
    (header.c:474-541), Parsers, MIME, TagAlias, XMLClassAttributes
    (header.c:795-828), flag elements (header.c:196-273) and
    IncludeConfigFile recursion (header.c:689-716) via ``_resolver``.
    """
    if _depth > 8:
        raise ValueError("IncludeConfigFile recursion too deep")
    cfg = base or default_config()

    # Parse with namespace capture: ElementTree expands prefixed tags to
    # '{uri}local'; the reference keeps config names AS WRITTEN
    # ('swish:color', 'foo:name' — 002-header.t), so map uris back to
    # their declared prefixes.
    import io

    uri2prefix: dict[str, str] = {}
    root = None
    for ev, payload in ET.iterparse(io.StringIO(text), events=("start-ns", "start")):
        if ev == "start-ns":
            prefix, uri = payload
            uri2prefix.setdefault(uri, prefix)
        elif root is None:
            root = payload

    def _name(tag: str) -> str:
        # '{uri}local' → 'prefix:local' (or bare local if undeclared)
        if tag.startswith("{"):
            uri, local = tag[1:].split("}", 1)
            prefix = uri2prefix.get(uri)
            return f"{prefix}:{local}" if prefix else local
        return tag

    def _local(tag: str) -> str:
        # section names match on the local part (<swish:MetaNames> ==
        # <MetaNames>); member names keep their prefix
        return _name(tag).split(":")[-1]

    metanames = dict(cfg.metanames)
    properties = dict(cfg.properties)
    aliases = dict(cfg.tag_aliases)
    parsers = dict(cfg.parsers)
    mimes = dict(cfg.mimes)
    stringlists = dict(cfg.stringlists)
    xmlns = dict(cfg.xmlns)
    xmlns.update({p: u for u, p in uri2prefix.items() if p})
    flags: dict[str, object] = {}

    def _next_id(table) -> int:
        # reference: runtime ids come from max_meta_id/max_prop_id
        # counters (metaname.c:41-59), never from table size — a
        # len()-based default could collide with an explicit id
        return max((v.id for v in table.values()), default=-1) + 1

    # id-uniqueness within this header read (reference: header.c:503-510
    # croaks via the per-read meta_ids/prop_ids hashes; defaults outside
    # the file are not in scope, so <foo id="1"/> may shadow a default)
    seen_meta_ids: dict[int, str] = {}
    seen_prop_ids: dict[int, str] = {}

    def _check_id(seen: dict[int, str], kind: str, table, name: str, id_: int) -> None:
        if name in table and table[name].id == id_:
            # re-declaration of an existing entry with its existing id
            # (a config_to_xml round trip re-states the defaults) claims
            # nothing new — the reference's check scope is likewise
            # limited to explicit ids within one read (header.c:339-348)
            return
        if id_ in seen:
            raise ValueError(
                f"duplicate id {id_} on {kind} {name} "
                f"(already assigned to {seen[id_]})"
            )
        seen[id_] = name

    for node in root:
        tag = _local(node.tag).lower()
        if tag == "metanames":
            for m in node:
                name = _name(m.tag).lower()
                a = m.attrib
                mid = int(a.get("id", _next_id(metanames)))
                _check_id(seen_meta_ids, "MetaName", metanames, name, mid)
                metanames[name] = MetaName(
                    name,
                    id=mid,
                    bias=int(a.get("bias", 0)),
                    alias_for=(a.get("alias_for") or "").lower() or None,
                )
                # text children are aliases for this metaname
                if m.text and m.text.strip():
                    for al in m.text.split():
                        aliases[al.lower()] = name
        elif tag == "propertynames":
            for p in node:
                name = _name(p.tag).lower()
                a = p.attrib
                pid = int(a.get("id", _next_id(properties)))
                _check_id(seen_prop_ids, "PropertyName", properties, name, pid)
                properties[name] = Property(
                    name,
                    id=pid,
                    ignore_case=_to_bool(a.get("ignore_case", "1")),
                    type={"string": PROP_STRING, "date": PROP_DATE, "int": PROP_INT}.get(
                        a.get("type", "string").lower(), PROP_STRING
                    ),
                    verbatim=_to_bool(a.get("verbatim", "0")),
                    alias_for=(a.get("alias_for") or "").lower() or None,
                    max=int(a.get("max", 0)),
                    sort=_to_bool(a.get("sort", "1")),
                    presort=_to_bool(a.get("presort", "1")),
                    sort_length=int(a.get("sort_length", 0)),
                )
                if p.text and p.text.strip():
                    for al in p.text.split():
                        aliases[al.lower()] = name
        elif tag == "tagalias":
            for t in node:
                target = _name(t.tag).lower()
                if t.text:
                    for al in t.text.split():
                        aliases[al.lower()] = target
        elif tag == "parsers":
            for t in node:
                if t.text:
                    for mime in t.text.split():
                        parsers[mime.lower()] = _local(t.tag).upper()
        elif tag == "mime":
            for t in node:
                if t.text:
                    mimes[_name(t.tag).lower()] = t.text.strip()
        elif tag == "xmlclassattributes":
            # repeated elements accumulate (header.c:795-828 stringlist merge)
            vals = stringlists.get(CLASS_ATTRIBUTES, ()) + tuple(
                (node.text or "").split()
            )
            stringlists[CLASS_ATTRIBUTES] = vals
        elif tag == "undefinedmetatags":
            flags["undef_metas"] = (node.text or UNDEF_INDEX).strip().lower()
        elif tag == "undefinedxmlattributes":
            flags["undef_attrs"] = (node.text or UNDEF_DISABLE).strip().lower()
        elif tag == "tokenizername":
            flags["tokenizer"] = (node.text or "default").strip()
        elif tag == "tokenregex":
            flags["token_regex"] = (node.text or "").strip() or None
        elif tag in _FLAG_KEYS:
            flags[_FLAG_KEYS[tag]] = _to_bool(node.text or "")
        elif tag == "includeconfigfile":
            if _resolver is not None and node.text:
                sub = _resolver(node.text.strip())
                if sub is not None:
                    # the reference merges the include into the SAME
                    # config object mid-read (header.c:689-716), so
                    # parse it against the ACCUMULATED state: a stale
                    # base both dropped the include's flag directives
                    # (Tokenize, UndefinedMetaTags, TokenizerName, …)
                    # and re-issued auto ids already assigned by the
                    # parent (two metanames silently sharing an id)
                    interim = cfg.with_overrides(
                        metanames=metanames,
                        properties=properties,
                        tag_aliases=aliases,
                        parsers=parsers,
                        mimes=mimes,
                        stringlists=stringlists,
                        xmlns=xmlns,
                        **flags,
                    )
                    inner = load_config_xml(sub, interim, _resolver, _depth + 1)
                    metanames = dict(inner.metanames)
                    properties = dict(inner.properties)
                    aliases = dict(inner.tag_aliases)
                    parsers = dict(inner.parsers)
                    mimes = dict(inner.mimes)
                    stringlists = dict(inner.stringlists)
                    xmlns = dict(inner.xmlns)
                    # any attr the include changed relative to its base
                    # was explicitly declared inside it — inherit it
                    for attr in (
                        *_FLAG_KEYS.values(),
                        "undef_metas",
                        "undef_attrs",
                        "tokenizer",
                        "token_regex",
                    ):
                        if getattr(inner, attr) != getattr(interim, attr):
                            flags[attr] = getattr(inner, attr)

    validate_config_names(metanames, properties, aliases)
    return cfg.with_overrides(
        metanames=metanames,
        properties=properties,
        tag_aliases=aliases,
        parsers=parsers,
        mimes=mimes,
        stringlists=stringlists,
        xmlns=xmlns,
        **flags,
    )


def config_to_xml(cfg: SwishConfig) -> str:
    """Serialize a config back to swish.xml form (reference:
    header.c:1386+ swish_header_write). Round-trips through
    ``load_config_xml``."""
    from xml.sax.saxutils import escape

    decls = "".join(
        f' xmlns:{p}="{escape(u)}"' for p, u in sorted(cfg.xmlns.items())
    )
    parts = [f"<swish{decls}>"]
    parts.append(" <MetaNames>")
    for name, m in sorted(cfg.metanames.items()):
        attrs = f' bias="{m.bias}" id="{m.id}"'
        if m.alias_for:
            attrs += f' alias_for="{escape(m.alias_for)}"'
        parts.append(f"  <{name}{attrs} />")
    parts.append(" </MetaNames>")
    parts.append(" <PropertyNames>")
    for name, p in sorted(cfg.properties.items()):
        attrs = (
            f' id="{p.id}" ignore_case="{int(p.ignore_case)}"'
            f' verbatim="{int(p.verbatim)}" sort="{int(p.sort)}" max="{p.max}"'
            f' presort="{int(p.presort)}" sort_length="{p.sort_length}"'
            f' type="{ {PROP_STRING: "string", PROP_DATE: "date", PROP_INT: "int"}[p.type] }"'
        )
        if p.alias_for:
            attrs += f' alias_for="{escape(p.alias_for)}"'
        parts.append(f"  <{name}{attrs} />")
    parts.append(" </PropertyNames>")
    parts.append(" <TagAlias>")
    targets: dict[str, list[str]] = {}
    for alias, target in sorted(cfg.tag_aliases.items()):
        targets.setdefault(target, []).append(alias)
    for target, aliases in sorted(targets.items()):
        parts.append(f"  <{target}>{escape(' '.join(aliases))}</{target}>")
    parts.append(" </TagAlias>")
    parts.append(" <Parsers>")
    by_parser: dict[str, list[str]] = {}
    for mime, parser in sorted(cfg.parsers.items()):
        by_parser.setdefault(parser, []).append(mime)
    for parser, mimes in sorted(by_parser.items()):
        parts.append(f"  <{parser}>{escape(' '.join(mimes))}</{parser}>")
    parts.append(" </Parsers>")
    if cfg.stringlists.get(CLASS_ATTRIBUTES):
        vals = escape(" ".join(cfg.stringlists[CLASS_ATTRIBUTES]))
        parts.append(f" <XMLClassAttributes>{vals}</XMLClassAttributes>")
    parts.append(f" <Tokenize>{int(cfg.tokenize)}</Tokenize>")
    if cfg.tokenizer and cfg.tokenizer != "default":
        parts.append(f" <TokenizerName>{escape(cfg.tokenizer)}</TokenizerName>")
    if cfg.token_regex:
        parts.append(f" <TokenRegex>{escape(cfg.token_regex)}</TokenRegex>")
    parts.append(
        f" <CascadeMetaContext>{int(cfg.cascade_meta_context)}</CascadeMetaContext>"
    )
    parts.append(
        f" <IgnoreXMLNameSpaces>{int(cfg.ignore_xmlns)}</IgnoreXMLNameSpaces>"
    )
    parts.append(f" <FollowXInclude>{int(cfg.follow_xinclude)}</FollowXInclude>")
    parts.append(f" <UndefinedMetaTags>{cfg.undef_metas}</UndefinedMetaTags>")
    parts.append(
        f" <UndefinedXMLAttributes>{cfg.undef_attrs}</UndefinedXMLAttributes>"
    )
    parts.append("</swish>")
    return "\n".join(parts)


def validate_config_names(metanames, properties, aliases) -> None:
    """Alias/id integrity (reference: header.c:1003 test_alias_fors)."""
    for m in metanames.values():
        if m.alias_for and m.alias_for not in metanames:
            raise ValueError(f"metaname {m.name} alias_for {m.alias_for} undefined")
    for p in properties.values():
        if p.alias_for and p.alias_for not in properties:
            raise ValueError(f"property {p.name} alias_for {p.alias_for} undefined")


def validate_unique_ids(metanames, properties) -> None:
    """Id uniqueness within each kind (reference:
    swish_config_test_unique_ids libswish3.h:628; duplicate-id croak at
    header.c:503-510)."""
    for kind, table in (("MetaName", metanames), ("PropertyName", properties)):
        seen: dict[int, str] = {}
        for v in table.values():
            if v.id in seen:
                raise ValueError(
                    f"duplicate id {v.id} on {kind} {v.name} "
                    f"(already assigned to {seen[v.id]})"
                )
            seen[v.id] = v.name
