"""Scalar-function corpus and text-analysis helpers (all JVM-side
built-ins; no Python row loops)."""

from gcp_etl_spark.functions.text import (
    fingerprint,
    normalize_text,
    quality_features,
    tokens,
)

__all__ = ["tokens", "normalize_text", "fingerprint", "quality_features"]
