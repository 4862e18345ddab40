"""Unicode word-character classes for the tokenizer.

The reference classifies characters with glibc ``isw*`` functions
(reference: src/libswish3/tokenizer.c:83-101): a character is *ignored*
(token boundary) when it is NUL, whitespace, a control, or punctuation —
except ``'`` and ``_`` which are explicitly word characters
(tokenizer.c:88-94). glibc's wide classes map onto Unicode general
categories: space≈Z*, cntrl≈C*, punct≈P*∪S* (glibc marks symbols as
punct). We therefore define

    word char  :=  category ∉ {Z*, C*, P*, S*}  ∪  {"'", "_"}

and compile one big character-class regex once per Python worker
process. The reference's own test suite tolerates libc drift in these
classes (reference: src/t/001-wordcount.t:63-79), so exact-glibc parity
is not required — but the class must be *documented and stable*, which
this module is.

The ASCII fast path (reference: tokenizer.c:590-604 dispatch,
tokenizer.c:145-173 precomputed 128-entry tables) reduces to the class
``[a-z0-9'_]`` after lowercasing.
"""

from __future__ import annotations

import re
import sys

# ASCII fast path: after str.lower(), word chars are exactly these
# (C-locale isalnum ∪ {' _}; reference: tokenizer.c:104-137).
ASCII_WORD_RUN = re.compile(r"[a-z0-9'_]+")

_IGNORE_MAJOR = frozenset("ZCPS")
_ALWAYS_WORD = frozenset("'_")

_word_run_re: re.Pattern | None = None


def _build_word_run_re() -> re.Pattern:
    """Build ``[<word chars>]+`` from Unicode general categories.

    One pass over the code space at first use (~0.5 s), cached per
    process — the Spark Python workers are reused, so this is paid once
    per executor core, mirroring the reference's one-time table build
    (tokenizer.c:145-173).
    """
    import unicodedata

    parts: list[str] = []
    start: int | None = None
    prev = -2
    # skip surrogate range entirely (invalid in Python str operations)
    for cp in range(sys.maxunicode + 1):
        if 0xD800 <= cp <= 0xDFFF:
            is_word = False
        else:
            ch = chr(cp)
            cat = unicodedata.category(ch)
            is_word = cat[0] not in _IGNORE_MAJOR or ch in _ALWAYS_WORD
        if is_word:
            if start is None:
                start = cp
            prev = cp
        else:
            if start is not None:
                parts.append(_range(start, prev))
                start = None
    if start is not None:
        parts.append(_range(start, prev))
    return re.compile("[" + "".join(parts) + "]+")


def _range(a: int, b: int) -> str:
    esc = lambda c: re.escape(chr(c))
    if a == b:
        return esc(a)
    if b == a + 1:
        return esc(a) + esc(b)
    return f"{esc(a)}-{esc(b)}"


def word_run_re() -> re.Pattern:
    """The Unicode word-run regex, built lazily and cached."""
    global _word_run_re
    if _word_run_re is None:
        _word_run_re = _build_word_run_re()
    return _word_run_re
