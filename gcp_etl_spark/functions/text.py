"""Text analysis building blocks for the documents table.

All pure ``pyspark.sql.functions`` column expressions — they stay
inside whole-stage codegen, so they scale to 100 TB of text without a
Python boundary. (SURVEY.md §2B "text analysis"; the reference itself
has no text ops — NS extension.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English stopword set used by quality scoring and language
# heuristics. Deterministic and mirrored in oracle SQL where needed.
STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")


def normalize_text(col: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical form used for
    fingerprinting and exact dedup."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokenization → array<string> (empty strings removed)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda x: x != F.lit(""))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Stable across engines (DuckDB md5 produces identical hex)."""
    return F.md5(normalize_text(col))


def quality_features(text: Column) -> dict[str, Column]:
    """Per-document quality features: token count, mean token length,
    alphabetic ratio, stopword ratio. Returns named column expressions.
    """
    toks = tokens(text)
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(F.lower(text), r"[^a-z]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    return {
        "n_tokens": n_tokens,
        "avg_token_len": F.length(F.regexp_replace(text, r"\s+", "")) / n_tokens,
        "alpha_ratio": n_alpha / F.length(text),
        "stopword_ratio": n_stop / n_tokens,
    }
