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

# Implied end tags: opening key closes any open element in its value set
# (libxml2 htmlAutoClose / htmlCheckImplied equivalents, trimmed to the
# rules that affect text bucketing).
_P_CLOSERS = frozenset(
    """
    address blockquote center dir div dl fieldset form h1 h2 h3 h4 h5 h6
    hr isindex menu noframes ol p pre table ul li dt dd
    """.split()
)
AUTO_CLOSE: dict[str, frozenset] = {
    **{t: frozenset(("p",)) for t in _P_CLOSERS},
    "li": frozenset(("li", "p")),
    "dt": frozenset(("dt", "dd", "p")),
    "dd": frozenset(("dt", "dd", "p")),
    "td": frozenset(("td", "th")),
    "th": frozenset(("td", "th")),
    "tr": frozenset(("tr", "td", "th")),
    "option": frozenset(("option",)),
    "optgroup": frozenset(("option", "optgroup")),
    "body": frozenset(("head", "title", "style")),
    "frameset": frozenset(("head", "title")),
}
