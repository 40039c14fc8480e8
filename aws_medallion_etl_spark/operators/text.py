"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference extensions (SURVEY.md §7.2 M7): token counting,
quality scoring, document fingerprinting, and a heuristic language
identifier — all pure ``pyspark.sql.functions`` column expressions, so
every operator stays inside whole-stage codegen (no Python in the hot
path) and scales to 100 TB as a narrow, shuffle-free projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered stopword profiles for the heuristic language identifier.
# First profile wins ties, so order is part of the contract.
LANG_PROFILES: list[tuple[str, str]] = [
    ("en", r"\b(the|of|and|to|a|in)\b"),
    ("es", r"\b(el|la|de|que|los|las)\b"),
    ("de", r"\b(der|die|das|und|ist|nicht)\b"),
    ("fr", r"\b(le|les|des|est|une|dans)\b"),
    ("zh", r"[一-鿿]"),
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: Column | str) -> Column:
    """Whitespace token count (``size(split(trim(text), '\\s+'))``)."""
    return F.size(F.split(F.trim(_c(col)), r"\s+"))


def char_count(col: Column | str) -> Column:
    return F.length(_c(col))


def avg_word_length(col: Column | str, ndigits: int = 4) -> Column:
    """Mean token length: (chars - spaces) / tokens."""
    c = _c(col)
    non_space = F.length(F.regexp_replace(c, r"\s", ""))
    return F.round(non_space / token_count(c), ndigits)


def stopword_ratio(
    col: Column | str, pattern: str = r"\b(the|a|of|and|to)\b", ndigits: int = 4
) -> Column:
    """Stopword hits per token — a cheap fluency signal."""
    c = _c(col)
    return F.round(F.regexp_count(c, F.lit(pattern)) / token_count(c), ndigits)


def punctuation_ratio(col: Column | str, ndigits: int = 4) -> Column:
    """Non-alphanumeric, non-space chars per char."""
    c = _c(col)
    punct = F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", ""))
    return F.round(punct / F.length(c), ndigits)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized text.

    Whitespace runs collapse to single spaces and the text is
    lower-cased + trimmed first, so trivially-reformatted copies map to
    the same fingerprint (exact-dedup key).
    """
    norm = F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " ")
    return F.md5(norm)


def language_id(
    col: Column | str,
    profiles: list[tuple[str, str]] | None = None,
    out_unknown: str = "und",
) -> Column:
    """Heuristic language ID: argmax of stopword-profile hit counts.

    A chained ``when`` over ``regexp_count`` scores — first profile in
    the list wins ties (deterministic). Rows with zero hits across all
    profiles get ``out_unknown``. This is the classic n-gram/function-
    word heuristic; swap profiles for real corpora.
    """
    c = _c(col)
    profiles = profiles or LANG_PROFILES
    scores = {lang: F.regexp_count(c, F.lit(pat)) for lang, pat in profiles}
    best = F.greatest(*scores.values()) if len(scores) > 1 else next(iter(scores.values()))
    expr = F.when(best == 0, F.lit(out_unknown))
    for lang, _ in profiles:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit(out_unknown))
