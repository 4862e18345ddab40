"""UTF-8-aware word tokenizer with exact reference position semantics.

Re-expresses ``swish_tokenize`` / ``swish_tokenize_ascii`` /
``swish_tokenize_utf8`` (reference: src/libswish3/tokenizer.c:590-970)
as regex scans over whole text segments instead of a per-character C
loop:

* the buffer is lowercased first (tokenizer.c:624-625);
* tokens are maximal runs of word characters (see ``charclasses``);
* each run is edge-stripped of ignorable start/end characters — among
  run characters only ``'`` and ``_`` are strippable, since they are
  word chars *inside* a token but punct at its edges
  (tokenizer.c:181-317);
* runs longer than ``maxwordlen`` = 256 are force-split
  (tokenizer.c:718-743 utf8 byte-based / 872-905 ascii char-based);
* every emitted token gets ``pos = ++tl.pos`` (tokenizer.c:387) and
  every TOKENPOS_BUMPER byte (``\\x03``) in the stream also increments
  ``pos`` — the word-boundary-across-tags gap (tokenizer.c:693-697 et
  al.);
* tokens shorter than ``minwordlen`` = 1 after strip are dropped with
  no position increment (tokenizer.c:680-689).
"""

from __future__ import annotations

import re

from libswish3_spark.charclasses import ASCII_WORD_RUN, word_run_re
from libswish3_spark.config import MAX_WORD_LEN, MIN_WORD_LEN, TOKENPOS_BUMPER

_BUMPER = TOKENPOS_BUMPER
_EDGE_STRIP = "'_"

# towlower parity (tokenizer.c:624-625 lowercases per character via
# towlower): Python's str.lower() is context-sensitive where towlower
# cannot be — final-position Σ lowers to ς (towlower: always σ) and İ
# expands to i+U+0307 (towlower: plain i). Pre-mapping these two BEFORE
# .lower() makes the whole pipeline match per-char towlower exactly
# (verified against a compiled reference binary: towlower(U+03A3)=σ,
# towlower(U+0130)=i); an original ς in the text correctly stays ς in
# both engines. Applied only on the non-ASCII path — zero hot-path cost.
_TOWLOWER_FIX = str.maketrans({0x3A3: "σ", 0x130: "i"})


def _split_maxlen_ascii(run: str, maxlen: int) -> list[str]:
    # reference: tokenizer.c:872-905 — append char, force end at >= maxlen
    return [run[i : i + maxlen] for i in range(0, len(run), maxlen)]


def _split_maxlen_utf8(run: str, maxlen: int) -> list[str]:
    """Byte-based split replicating tokenizer.c:718-743.

    A char whose bytes would push the token past ``maxlen`` is *dropped*
    (the C code ``continue``s without appending); the token force-ends
    when it reaches exactly ``maxlen`` bytes.
    """
    out: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for ch in run:
        blen = len(ch.encode("utf-8"))
        if cur_len and cur_len + blen > maxlen:
            # skip this char entirely (reference keeps inside_token=1)
            continue
        if blen > maxlen:
            continue
        cur.append(ch)
        cur_len += blen
        if cur_len >= maxlen:
            out.append("".join(cur))
            cur = []
            cur_len = 0
    if cur:
        out.append("".join(cur))
    return out


def split_tokens(segment: str) -> list[str]:
    """Tokenize one bumper-free text segment. Returns final token values."""
    is_ascii = segment.isascii()
    if is_ascii:
        low = segment.lower()
        runs = ASCII_WORD_RUN.findall(low)
        splitter = _split_maxlen_ascii
    else:
        low = segment.translate(_TOWLOWER_FIX).lower()
        runs = word_run_re().findall(low)
        splitter = _split_maxlen_utf8
    if not runs:
        return runs
    # fast path (vast majority of text): nothing to edge-strip and no run
    # long enough to hit the 256-byte cap — the runs ARE the tokens
    if "'" not in low and "_" not in low:
        # char limit under which no run can exceed the 256-BYTE cap:
        # ascii is 1 byte/char, non-ascii at most 4 — checking the whole
        # segment length first skips the per-run max() on typical text
        lim = MAX_WORD_LEN if is_ascii else MAX_WORD_LEN // 4
        if len(low) <= lim or max(map(len, runs)) <= lim:
            return runs
    out: list[str] = []
    for run in runs:
        if len(run) > MAX_WORD_LEN // 4 and (
            len(run) > MAX_WORD_LEN or len(run.encode("utf-8")) > MAX_WORD_LEN
        ):
            pieces = splitter(run, MAX_WORD_LEN)
        else:
            pieces = (run,)
        for tok in pieces:
            tok = tok.strip(_EDGE_STRIP)
            if len(tok) >= MIN_WORD_LEN:
                out.append(tok)
    return out


def tokenize_with_positions(
    text: str, pos: int, meta: str = "swishdefault", context: str = "swishdefault"
) -> tuple[list[tuple[str, int, str, str]], int]:
    """Tokenize ``text`` (which may contain ``\\x03`` bumper bytes).

    Returns ``([(value, pos, meta, context), ...], new_pos)``. Token
    positions and bumper gaps exactly follow tokenizer.c:387,693-697:
    each token takes ``++pos``; each bumper byte takes one ``pos``
    increment wherever it occurs in the stream.
    """
    out: list[tuple[str, int, str, str]] = []
    if not text:
        return out, pos
    segments = text.split(_BUMPER)
    last = len(segments) - 1
    for i, seg in enumerate(segments):
        if seg:
            for tok in split_tokens(seg):
                pos += 1
                out.append((tok, pos, meta, context))
        if i != last:
            pos += 1  # the bumper byte's own position gap
    return out, pos


def count_tokens(text: str) -> int:
    """Fast count-only variant (no position bookkeeping)."""
    n = 0
    for seg in text.split(_BUMPER):
        if seg:
            n += len(split_tokens(seg))
    return n


def count_positions(text: str) -> int:
    """End-position advance of ``text``: emitted tokens + bumper gaps.

    Exactly ``tokenize_with_positions(text, 0)[1]`` without building a
    token per match: the megadoc segmentation kernel needs only each
    segment's position span (the offset prefix-sum), and counting via
    ``finditer`` (no substring allocation) costs a fraction of the full
    tokenize that extraction will run anyway — this is what keeps
    segmentation from tokenizing every byte twice.
    """
    if not text:
        return 0
    n = text.count(_BUMPER)
    for seg in text.split(_BUMPER):
        if not seg:
            continue
        low = seg.lower()
        if low.isascii() and "'" not in low and "_" not in low:
            # no edge-strip candidates: every run emits ceil(len/256)
            # tokens (ascii force-split, tokenizer.c:872-905)
            for m in ASCII_WORD_RUN.finditer(low):
                run_len = m.end() - m.start()
                if run_len <= MAX_WORD_LEN:
                    n += 1
                else:
                    n += (run_len + MAX_WORD_LEN - 1) // MAX_WORD_LEN
        else:
            n += len(split_tokens(seg))
    return n


# ---------------------------------------------------------------------------
# Pluggable tokenizer registry (T10).
#
# The reference exposes fn-ptr hooks ``analyzer->tokenizer`` /
# ``->stemmer`` (libswish3.h:411-412) and the Perl binding a settable
# token regex (bindings/perl/lib/SWISH/3.pm:102-133, default
# ``\w+(?:[\x{2019}']\w+)*``). Spark-side: a tokenizer is any
# ``segment:str -> list[str]`` callable. Two ways to select one per run:
#
# * ``SwishConfig.token_regex`` — a regex pattern; serializes inside the
#   broadcast config, so it works on any executor with no extra setup
#   (the Perl-binding path).
# * ``SwishConfig.tokenizer`` — a registry name; the module registering
#   it must be importable on executors (standard --py-files practice),
#   mirroring the fn-ptr hook.
# ---------------------------------------------------------------------------

PERL_BINDING_TOKEN_REGEX = r"\w+(?:[’']\w+)*"  # 3.pm:128-130

def count_positions_with(text: str, tokenizer) -> int:
    """``count_positions`` generalized to a pluggable tokenizer: emitted
    tokens plus one position per bumper byte. Used by the megadoc
    segmentation kernel when a non-default tokenizer is configured —
    the precomputed segment offsets must count with the SAME tokenizer
    the extraction pass will run, or global positions silently drift."""
    segs = text.split(_BUMPER)
    n = len(segs) - 1  # each bumper byte takes one position gap
    for seg in segs:
        if seg:
            n += len(tokenizer(seg))
    return n


_TOKENIZER_REGISTRY: dict = {"default": split_tokens}


def register_tokenizer(name: str, fn) -> None:
    """Register a named tokenizer (segment → token list)."""
    _TOKENIZER_REGISTRY[name] = fn


def make_regex_tokenizer(pattern: str):
    """Tokenizer from a findall regex over the lowercased segment."""
    rx = re.compile(pattern)

    def fn(segment: str) -> list[str]:
        return rx.findall(segment.lower())

    return fn


def resolve_tokenizer(config):
    """config → tokenizer callable (token_regex wins over the registry
    name; unknown names raise — a silent default would mask a missing
    --py-files module on the executor)."""
    pattern = getattr(config, "token_regex", None)
    if pattern:
        return make_regex_tokenizer(pattern)
    name = getattr(config, "tokenizer", "default") or "default"
    if name not in _TOKENIZER_REGISTRY:
        raise KeyError(
            f"tokenizer '{name}' not registered (register_tokenizer on "
            "the executor, or use config.token_regex)"
        )
    return _TOKENIZER_REGISTRY[name]


# Convenience: a token pattern string usable by *both* Spark SQL
# (Java regex) and DuckDB (RE2) for ASCII-only corpora — used by the
# oracle-checked queries so the two engines tokenize identically.
ASCII_TOKEN_PATTERN_SQL = "[a-z0-9'_]+"

