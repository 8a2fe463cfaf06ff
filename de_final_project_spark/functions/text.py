"""Text-analysis column expressions for the documents table.

Training-data-pipeline text ops (token counting, quality ratios, language
scoring, fingerprints) as pure built-in expressions — JVM-side, codegen'd,
no Python UDFs — so they run at full scan speed over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram-free language heuristic
# and stopword-ratio quality signal. Deliberately small and deterministic.
STOPWORDS_EN = [
    "the", "a", "and", "of", "to", "in", "is", "for", "on", "with",
]


def tokens(text_col: Column | str) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text_col: Column | str) -> Column:
    return F.size(tokens(text_col)).cast("long")


def stopword_count(text_col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Number of tokens that are stopwords (lowercased exact match)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    toks = tokens(text_col)
    return F.size(
        F.filter(toks, lambda t: F.array_contains(sw, F.lower(t)))
    ).cast("long")


def total_token_chars(text_col: Column | str) -> Column:
    """Sum of token lengths (exact integer -> safe for cross-engine compare)."""
    return F.aggregate(
        tokens(text_col), F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )


def fingerprint(text_col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized
    (lowercased, whitespace-collapsed) text. Exact-dup detection key."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))
