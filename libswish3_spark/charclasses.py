"""Unicode word-character classes for the tokenizer.

The reference classifies characters with glibc ``isw*`` functions
(reference: src/libswish3/tokenizer.c:83-101): a character is *ignored*
(token boundary) when it is NUL, whitespace, a control, or punctuation —
except ``'`` and ``_`` which are explicitly word characters
(tokenizer.c:88-94). glibc's wide ``punct`` class in UTF-8 locales is
"printable and not alnum", so the reference's word class reduces to
**glibc alnum**, which we verified token-stream-for-token-stream against
a compiled reference binary (``reference_bench.py`` builds it; round-5
live-parity session).

Two table sources, in preference order:

1. **glibc itself** (ctypes ``iswalnum`` snapshot under a UTF-8
   ``LC_CTYPE``): byte-exact parity with the reference binary on the
   same host. glibc alnum = Unicode Alphabetic ∪ decimal digits — it
   keeps L*, Nd, Nl AND the Other_Alphabetic combining marks (Indic
   matras U+093E/093F, Thai vowel signs U+0E31/0E34, Arabic harakat,
   Hebrew points) while dropping non-alphabetic marks (European
   combining accents U+0301/030A, virama U+094D, Thai TONE marks
   U+0E48-0E4B), enclosing marks, and No (², ³, fractions) — all of
   which are iswpunct=1, i.e. token boundaries. Only codepoints whose
   Unicode category is L*/M*/N* are probed (alnum ⊆ Alphabetic ∪ Nd ⊆
   those majors), which keeps the snapshot fast.

2. **Category fallback** (no glibc / no UTF-8 locale):
   ``category ∈ {L*, Mc, Nd, Nl} ∪ {"'", "_"}`` — the closest
   category-level cut to glibc's table (every probed Mc is glibc-alpha;
   the observed live-compare divergences were all Mn/No). Residual
   fallback-only drift: Other_Alphabetic *Mn* (Thai/Indic vowel signs,
   Arabic harakat) become boundaries — inside the class drift the
   reference's own suite tolerates (src/t/001-wordcount.t:63-79,
   "depends on the glibc implementation").

Cluster note: executors must share one table source (homogeneous
containers do); the source chosen is exposed as ``WORD_TABLE_SOURCE``
so a deployment can assert it.

The ASCII fast path (reference: tokenizer.c:590-604 dispatch,
tokenizer.c:145-173 precomputed 128-entry tables) reduces to the class
``[a-z0-9'_]`` after lowercasing and is identical under both sources.
"""

from __future__ import annotations

import re
import sys

# ASCII fast path: after str.lower(), word chars are exactly these
# (C-locale isalnum ∪ {' _}; reference: tokenizer.c:104-137).
ASCII_WORD_RUN = re.compile(r"[a-z0-9'_]+")

_FALLBACK_CATS = frozenset(("Mc", "Nd", "Nl"))  # beyond all of L*
_ALWAYS_WORD = frozenset("'_")

_word_run_re: re.Pattern | None = None
WORD_TABLE_SOURCE: str | None = None  # "glibc" | "categories" once built


def _glibc_alnum():
    """Return ``iswalnum`` under a UTF-8 LC_CTYPE, or None.

    The snapshot loop (in ``_build_word_run_re``) runs entirely under
    the switched locale; the caller restores the previous LC_CTYPE when
    done via the returned restore callable.
    """
    try:
        import ctypes
        import ctypes.util
        import locale

        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6")
        old = locale.setlocale(locale.LC_CTYPE)
        for name in ("C.UTF-8", "C.utf8", "en_US.UTF-8"):
            try:
                locale.setlocale(locale.LC_CTYPE, name)
                break
            except locale.Error:
                continue
        else:
            return None, None
        fn = libc.iswalnum
        fn.argtypes = [ctypes.c_uint32]  # Linux wchar_t is UCS-4
        fn.restype = ctypes.c_int

        def restore():
            import locale as _l

            _l.setlocale(_l.LC_CTYPE, old)

        return fn, restore
    except Exception:
        return None, None


def _build_word_run_re() -> re.Pattern:
    """Build ``[<word chars>]+`` once per process.

    One pass over the code space at first use (~0.5 s), cached per
    process — the Spark Python workers are reused, so this is paid once
    per executor core, mirroring the reference's one-time table build
    (tokenizer.c:145-173).
    """
    import unicodedata

    global WORD_TABLE_SOURCE
    alnum, restore = _glibc_alnum()
    WORD_TABLE_SOURCE = "glibc" if alnum is not None else "categories"

    parts: list[str] = []
    start: int | None = None
    prev = -2
    try:
        for cp in range(sys.maxunicode + 1):
            if 0xD800 <= cp <= 0xDFFF:  # surrogates: invalid in str ops
                is_word = False
            else:
                ch = chr(cp)
                cat = unicodedata.category(ch)
                if ch in _ALWAYS_WORD:
                    is_word = True
                elif cat[0] not in "LMN":
                    # glibc alnum ⊆ Alphabetic ∪ Nd ⊆ L*/M*/N* majors
                    is_word = False
                elif alnum is not None:
                    is_word = bool(alnum(cp))
                else:
                    is_word = cat[0] == "L" or cat in _FALLBACK_CATS
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
    finally:
        if restore is not None:
            restore()
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
