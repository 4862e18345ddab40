"""Text analysis: tokenization, language ID, quality scoring,
fingerprinting — all as JVM-side column expressions (T9 analogues that
never leave whole-stage codegen).

The ASCII token pattern matches the engine's tokenizer on ASCII corpora
(see ``tokenizer.ASCII_TOKEN_PATTERN_SQL``) and is deliberately
expressible in both Spark SQL (Java regex) and DuckDB (RE2) so every
operator here has an independent oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TOKEN_PATTERN = "[a-z0-9'_]+"

# tiny marker-word sets for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "la", "y", "los"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens(col) -> Column:
    """Lowercased ASCII token array (vectorized, JVM-side)."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0)


def token_count(col) -> Column:
    return F.size(tokens(col))


def _isin_filter(words: tuple[str, ...]):
    # single-arg lambda factory: Spark higher-order fns dispatch on arity,
    # so default-arg closures would be mis-called with (element, index)
    return lambda t: t.isin(*words)


def stopword_count(tok_col) -> Column:
    return F.size(F.filter(tok_col, _isin_filter(STOPWORDS)))


def lang_scores(tok_col) -> dict[str, Column]:
    return {
        lang: F.size(F.filter(tok_col, _isin_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def quality_features(text_col) -> dict[str, Column]:
    """Length/punct/stopword features for quality filtering.

    Ratios are returned as integer basis points (×10000) so results are
    float-free and hash-stable across engines.
    """
    tok = tokens(text_col)
    n_tok = F.size(tok)
    n_char = F.length(text_col)
    n_alpha = F.length(F.regexp_replace(text_col, "[^A-Za-z]", ""))
    n_stop = stopword_count(tok)
    return {
        "n_chars": n_char.cast("long"),
        "n_tokens": n_tok.cast("long"),
        # floor() in both engines: CAST(double AS BIGINT) rounds in DuckDB
        # but truncates in Spark — floor is the portable choice
        "alpha_bp": F.when(n_char > 0, F.floor(n_alpha * 10000 / n_char).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("alpha_bp"),
        "stopword_bp": F.when(n_tok > 0, F.floor(n_stop * 10000 / n_tok).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("stopword_bp"),
    }


def fingerprint(text_col) -> Column:
    """Deterministic document fingerprint (md5 of lowercased text)."""
    return F.md5(F.lower(text_col))


def bpe_ish_token_count(text_col) -> Column:
    """Sub-word-ish token estimate: words + digit runs + punct islands.

    A cheap proxy for BPE token counting (billing/packing estimates at
    corpus scale) that stays in codegen.
    """
    return F.size(
        F.regexp_extract_all(
            F.lower(text_col), F.lit("[a-z]{1,4}|[0-9]+|[^a-z0-9\\s]"), 0
        )
    )
