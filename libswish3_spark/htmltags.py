"""HTML tag classification tables.

The reference asks libxml2 (``htmlTagLookup``) whether an element is
inline to decide word-boundary bumping (reference:
src/libswish3/parser.c:399-424): non-inline (block) elements set
``bump_word = TRUE`` so tokens never match across block boundaries;
inline elements do not break words. ``br`` and ``img`` always bump
(parser.c:388-397).

These sets reproduce the HTML 4 classification that libxml2's
``html40ElementTable`` encodes (inline = the %inline/%special/%fontstyle
/%phrase content sets of the public HTML 4.01 DTD). Unknown tags leave
``bump_word`` unchanged (parser.c:404-406: no table entry → no change).
"""

# HTML 4.01 inline elements (isinline=1 in libxml2's table)
INLINE_TAGS = frozenset(
    """
    a abbr acronym applet b basefont bdo big br button cite code dfn em
    font i iframe img input ins del kbd label map object q s samp script
    select small span strike strong sub sup textarea tt u var
    """.split()
)

# All known HTML 4 elements (presence in libxml2's table); tags absent
# here are "unknown" and leave bump_word untouched.
KNOWN_TAGS = INLINE_TAGS | frozenset(
    """
    address area base blockquote body caption center col colgroup dd dir
    div dl dt fieldset form frame frameset h1 h2 h3 h4 h5 h6 head hr html
    isindex legend li link menu meta noframes noscript ol optgroup option
    p param pre style table tbody td tfoot th thead title tr ul
    """.split()
)

# HTML 4 EMPTY content model — fire start+end immediately, never stacked.
VOID_TAGS = frozenset(
    "area base basefont br col frame hr img input isindex link meta param".split()
)

# Raw-text elements: content is character data, no tag parsing inside.
RAWTEXT_TAGS = frozenset(("script", "style"))

# libxml2 htmlEndPriority: an end tag cannot force-close an open
# element of higher priority (default 100).
END_PRIORITY = {
    "div": 150,
    "td": 160,
    # th/tr at td's level and the table sections just above — derived
    # from a 30-pair empirical ignore/pop matrix vs the binary (each
    # pair first checked against AUTO_CLOSE so the intermediate really
    # was on the stack): '</caption>' cannot pop an open <th>,
    # '</td>' cannot pop a <thead>, '</tbody>' cannot pop a <table>,
    # while '</tr>' pops a <th> and '</tbody>' pops a <thead>.
    "th": 160,
    "tr": 160,
    "tbody": 165,
    "thead": 165,
    "tfoot": 165,
    "table": 170,
    "head": 180,
    "body": 190,
    "html": 200,
}

# Implied end tags: opening key closes any open element in its value set
# while it sits on top of the stack (libxml2 htmlCheckAutoClose pair
# table). Extracted EMPIRICALLY from a compiled reference binary: every
# (open A, then B) pair of known tags was traced with SWISH_DEBUG=8 and
# B gets A in its set iff the binary fired close(A) before open(B)
# (tests/test_reference_live_parity drives the same binary). The body/
# frameset entries model htmlCheckImplied head-closure, which the pair
# probe cannot see (head is auto-opened).
AUTO_CLOSE: dict[str, frozenset] = {
    "a": frozenset(("a",)),
    "address": frozenset(("p", "ul",)),
    "blockquote": frozenset(("p",)),
    "body": frozenset(("head", "style", "title",)),
    "caption": frozenset(("p",)),
    "center": frozenset(("b", "font", "i", "p",)),
    "col": frozenset(("caption", "p",)),
    "colgroup": frozenset(("caption", "colgroup", "p",)),
    "dd": frozenset(("address", "dir", "dt", "menu", "p", "pre",)),
    "dir": frozenset(("p",)),
    "div": frozenset(("p",)),
    "dl": frozenset(("address", "dir", "dt", "menu", "p", "pre",)),
    "dt": frozenset(("address", "dd", "dir", "menu", "p", "pre",)),
    "fieldset": frozenset(("a", "h1", "h2", "h3", "h4", "h5", "h6", "legend", "p", "pre",)),
    "form": frozenset(("address", "dir", "dl", "form", "h1", "h2", "h3", "h4", "h5", "h6", "menu", "ol", "p", "pre", "ul",)),
    "frameset": frozenset(("p", "title",)),
    "h1": frozenset(("p",)),
    "h2": frozenset(("p",)),
    "h3": frozenset(("p",)),
    "h4": frozenset(("p",)),
    "h5": frozenset(("p",)),
    "h6": frozenset(("p",)),
    "hr": frozenset(("p",)),
    "li": frozenset(("address", "dl", "h1", "h2", "h3", "h4", "h5", "h6", "li", "p", "pre",)),
    "menu": frozenset(("p", "ul",)),
    "ol": frozenset(("p", "ul",)),
    "optgroup": frozenset(("option",)),
    "option": frozenset(("option",)),
    "p": frozenset(("b", "big", "h1", "h2", "h3", "h4", "h5", "h6", "i", "p", "s", "small", "strike", "tt", "u",)),
    "pre": frozenset(("p", "ul",)),
    "table": frozenset(("a", "h1", "h2", "h3", "h4", "h5", "h6", "p", "pre",)),
    "tbody": frozenset(("caption", "colgroup", "p", "tbody", "td", "tfoot", "th", "thead", "tr",)),
    "td": frozenset(("a", "b", "font", "i", "p", "span", "td", "th", "u",)),
    "tfoot": frozenset(("caption", "colgroup", "p", "tbody", "td", "th", "thead", "tr",)),
    "th": frozenset(("a", "b", "font", "i", "p", "span", "td", "th", "u",)),
    "thead": frozenset(("caption", "colgroup",)),
    "title": frozenset(("p",)),
    "tr": frozenset(("caption", "colgroup", "p", "td", "th", "tr",)),
    "ul": frozenset(("address", "dir", "menu", "ol", "p", "pre",)),
}

# table-internal elements: libxml2's HTML4-era tables do not treat
# these as body-content starters, so inside an (implied) <head> they
# NEST there instead of forcing the head→body transition (probed:
# '<meta …><td>word' keeps word OUT of body/swishdescription, while
# p/div/h1/table force body). Unknown tags behave the same way.
TABLE_INTERNAL = frozenset(
    ("td", "th", "tr", "tbody", "thead", "tfoot", "caption",
     "colgroup", "col")
)
