"""LLM-data-pipeline operators: dedup, similarity search, multimodal.

North-star extensions (SURVEY.md §2B) — none exist in the reference.
Every operator here is designed around one rule: no O(n²) stage and no
driver-side materialization, so the same plan runs at 100 TB.
"""

from gcp_etl_spark.llm.dedup import (
    exact_dedup,
    minhash_near_duplicates,
    minhash_signatures,
    simhash_near_duplicates,
)
from gcp_etl_spark.llm.similarity import cosine_topk

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_near_duplicates",
    "simhash_near_duplicates",
    "cosine_topk",
]
