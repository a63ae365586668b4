"""Invariant tests for the training-data-prep queries (chunking,
decontamination, repetition scoring) beyond the DuckDB oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_etl_spark.queries.llm_prep import (
    _CHUNK_S,
    _CHUNK_W,
    decontaminate_ngram_overlap,
    text_chunk_overlap,
    text_repetition_ratio,
)
from gcp_etl_spark.tables import t
from tests.conftest import SF_SMALL


def test_chunk_geometry_covers_every_token(spark):
    """Chunk windows tile each document: stride * (n_chunks - 1) +
    last-chunk width >= n_tokens, every chunk is full-width except
    possibly the last, and chunk indexes are dense from 0."""
    chunks = text_chunk_overlap(spark, SF_SMALL)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.max("chunk_idx").alias("max_idx"),
        F.min("chunk_idx").alias("min_idx"),
        F.max("n_chunk_toks").alias("max_w"),
        # every chunk narrower than full width must be the LAST chunk:
        # min index among short chunks (if any) must equal max_idx
        F.min(
            F.when(F.col("n_chunk_toks") < _CHUNK_W, F.col("chunk_idx"))
        ).alias("short_idx"),
    )
    bad = per_doc.filter(
        (F.col("min_idx") != 0)
        | (F.col("max_idx") != F.col("n_chunks") - 1)
        | (F.col("max_w") > _CHUNK_W)
        | (F.col("short_idx").isNotNull() & (F.col("short_idx") != F.col("max_idx")))
    )
    assert bad.count() == 0

    docs = t(spark, SF_SMALL, "documents").select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.trim(F.lower("text")), " "),
                lambda x: x != F.lit(""),
            )
        ).alias("n_toks"),
    )
    cover = per_doc.join(docs, "doc_id").filter(
        (F.col("n_chunks") - 1) * _CHUNK_S + _CHUNK_W < F.col("n_toks")
    )
    assert cover.count() == 0


def test_decontaminate_never_flags_eval_docs(spark):
    flagged = decontaminate_ngram_overlap(spark, SF_SMALL)
    assert flagged.filter(F.col("doc_id") % 37 == 0).count() == 0
    rng = flagged.filter(
        (F.col("overlap_ratio") < 0.2) | (F.col("overlap_ratio") > 1.0)
    )
    assert rng.count() == 0


def test_repetition_ratios_bounded(spark):
    rep = text_repetition_ratio(spark, SF_SMALL)
    bad = rep.filter(
        (F.col("dup_gram_ratio") < 0)
        | (F.col("dup_gram_ratio") > 1)
        | (F.col("top_gram_frac") <= 0)
        | (F.col("top_gram_frac") > 1)
        | (F.col("n_distinct") > F.col("n_grams"))
    )
    assert bad.count() == 0
