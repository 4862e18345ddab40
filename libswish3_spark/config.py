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


def _default_mimes() -> dict[str, str]:
    """Extension -> MIME map.

    Subset of the reference's 152-pair table (reference:
    src/libswish3/mime_types.c:35-234) covering common document types;
    unknown extensions fall back to ``text/plain`` exactly like
    ``swish_mime_get_type`` does (mime_types.c:236-251).
    """
    return {
        "html": "text/html",
        "htm": "text/html",
        "xhtml": "application/xhtml+xml",
        "xml": "text/xml",
        "txt": "text/plain",
        "text": "text/plain",
        "json": "application/json",
        "csv": "text/csv",
        "md": "text/plain",
        "pdf": "application/pdf",
        "gz": "application/x-gzip",
        "jpg": "image/jpeg",
        "jpeg": "image/jpeg",
        "png": "image/png",
        "gif": "image/gif",
        "mp3": "audio/mpeg",
        "mp4": "video/mp4",
        "wav": "audio/x-wav",
        "doc": "application/msword",
        "xls": "application/vnd.ms-excel",
        "ps": "application/postscript",
        "rtf": "application/rtf",
        "tar": "application/x-tar",
        "zip": "application/zip",
        "c": "text/plain",
        "h": "text/plain",
        "pl": "text/plain",
        "py": "text/plain",
    }


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
    # flags (reference: config.c:189-194)
    tokenize: bool = True
    cascade_meta_context: bool = False
    ignore_xmlns: bool = True
    follow_xinclude: bool = True
    undef_metas: str = UNDEF_INDEX
    undef_attrs: str = UNDEF_DISABLE
    default_encoding: str = DEFAULT_ENCODING

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
    root = ET.fromstring(text)
    metanames = dict(cfg.metanames)
    properties = dict(cfg.properties)
    aliases = dict(cfg.tag_aliases)
    parsers = dict(cfg.parsers)
    mimes = dict(cfg.mimes)
    stringlists = dict(cfg.stringlists)
    flags: dict[str, object] = {}

    for node in root:
        tag = node.tag.lower()
        if tag == "metanames":
            for m in node:
                name = m.tag.lower()
                a = m.attrib
                metanames[name] = MetaName(
                    name,
                    id=int(a.get("id", len(metanames))),
                    bias=int(a.get("bias", 0)),
                    alias_for=a.get("alias_for"),
                )
                # text children are aliases for this metaname
                if m.text and m.text.strip():
                    for al in m.text.split():
                        aliases[al.lower()] = name
        elif tag == "propertynames":
            for p in node:
                name = p.tag.lower()
                a = p.attrib
                properties[name] = Property(
                    name,
                    id=int(a.get("id", len(properties) + 1)),
                    ignore_case=_to_bool(a.get("ignore_case", "1")),
                    type={"string": PROP_STRING, "date": PROP_DATE, "int": PROP_INT}.get(
                        a.get("type", "string").lower(), PROP_STRING
                    ),
                    verbatim=_to_bool(a.get("verbatim", "0")),
                    alias_for=a.get("alias_for"),
                    max=int(a.get("max", 0)),
                    sort=_to_bool(a.get("sort", "1")),
                )
                if p.text and p.text.strip():
                    for al in p.text.split():
                        aliases[al.lower()] = name
        elif tag == "tagalias":
            for t in node:
                target = t.tag.lower()
                if t.text:
                    for al in t.text.split():
                        aliases[al.lower()] = target
        elif tag == "parsers":
            for t in node:
                if t.text:
                    for mime in t.text.split():
                        parsers[mime.lower()] = t.tag.upper()
        elif tag == "mime":
            for t in node:
                if t.text:
                    mimes[t.tag.lower()] = t.text.strip()
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
        elif tag in _FLAG_KEYS:
            flags[_FLAG_KEYS[tag]] = _to_bool(node.text or "")
        elif tag == "includeconfigfile":
            if _resolver is not None and node.text:
                sub = _resolver(node.text.strip())
                if sub is not None:
                    inner = load_config_xml(sub, cfg, _resolver, _depth + 1)
                    metanames.update(inner.metanames)
                    properties.update(inner.properties)
                    aliases.update(inner.tag_aliases)
                    parsers.update(inner.parsers)
                    mimes.update(inner.mimes)
                    stringlists.update(inner.stringlists)

    validate_config_names(metanames, properties, aliases)
    return cfg.with_overrides(
        metanames=metanames,
        properties=properties,
        tag_aliases=aliases,
        parsers=parsers,
        mimes=mimes,
        stringlists=stringlists,
        **flags,
    )


def config_to_xml(cfg: SwishConfig) -> str:
    """Serialize a config back to swish.xml form (reference:
    header.c:1386+ swish_header_write). Round-trips through
    ``load_config_xml``."""
    from xml.sax.saxutils import escape

    parts = ["<swish>"]
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
