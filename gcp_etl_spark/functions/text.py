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


ROLLING_MOD = 2_147_483_647  # 2^31-1: products stay < 2^36 << 2^63 (ANSI-safe)


def rolling_hash(col: Column) -> Column:
    """Polynomial rolling hash of the normalized text (base 31, mod
    2^31-1) — the classic content fingerprint, computed as a codegen'd
    fold over the character codes. Seeded by the first character so it
    mirrors DuckDB's seedless list_reduce exactly; empty text → 0."""
    codes = F.transform(F.split(normalize_text(col), ""), lambda ch: F.ascii(ch))
    n = F.size(codes)
    folded = F.aggregate(
        F.slice(codes, 2, F.greatest(n - 1, F.lit(0))),
        F.get(codes, 0).cast("long"),
        lambda acc, x: (acc * 31 + x) % ROLLING_MOD,
    )
    return F.when(n > 0, folded).otherwise(F.lit(0)).cast("long")
