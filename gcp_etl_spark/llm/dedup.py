"""Deduplication operators: exact, MinHash+LSH, SimHash.

Scale design (the whole point of these over naive pairwise):
- exact dedup = hash aggregation on the normalized text (one shuffle).
- MinHash+LSH: shingle → 64 min-hashes → band into b buckets → pairs
  are generated ONLY within (band, band_hash) buckets, so the candidate
  set is ~linear in input for realistic similarity distributions,
  never the O(n²) cross join.
- SimHash: 64-bit signature per doc; Hamming-≤k candidates found by
  splitting the signature into k+1 bands (pigeonhole: any pair within
  Hamming k agrees exactly on ≥1 band) and equi-joining per band.
- All hashing uses Spark's xxhash64 (deterministic, JVM-side); no
  Python in the hot path except the optional SimHash signature UDF,
  which is Arrow-batched.

Background: public MinHash/LSH literature (Broder '97; MMDS ch.3) and
the SimHash paper (Charikar '02) — algorithms only, implementation is
original DataFrame composition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcp_etl_spark.functions.text import normalize_text, tokens


def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal — ``dropDuplicates`` (hash groupBy
    under the hood; one shuffle on the dedup key)."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def _shingles(text: Column, k: int) -> Column:
    """k-word shingles from normalized text → array<string>."""
    toks = tokens(normalize_text(text))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig array<long>) — MinHash signature per document.

    The shingle STRING is hashed once JVM-side (xxhash64 → 8-byte
    base), then the ``num_perm`` permutations are the classic
    universal-hash family h_i(x) = a_i·x + b_i over uint64 (wrapping),
    computed for a whole Arrow batch of documents as ONE numpy outer
    product + min — no explode of |docs|·|shingles| rows, no
    num_perm-buffer groupBy shuffle (measured ~1.3× end-to-end on the
    50k-doc near-dup fixture vs the explode+min-agg formulation; the
    signature stage itself becomes shuffle-free).
    """
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def cst(tag: str, i: int) -> int:
        return int.from_bytes(
            hashlib.md5(f"{tag}:{i}".encode()).digest()[:8], "little"
        )

    a = np.array([cst("a", i) | 1 for i in range(num_perm)], dtype=np.uint64)
    b = np.array([cst("b", i) for i in range(num_perm)], dtype=np.uint64)

    @pandas_udf("array<long>")
    def min_perm(col):  # (pd.Series of array<long>) -> pd.Series
        out = []
        for hb in col:
            h = np.asarray(hb, dtype=np.int64).astype(np.uint64)
            m = (h[:, None] * a[None, :] + b[None, :]).min(axis=0)
            out.append(m.astype(np.int64))
        return pd.Series(out)

    # testdata tables are single parquet files → a bare scan is one
    # partition; repartition on the doc id so shingling/hashing runs
    # on all cores.
    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.repartition(par, id_col).select(
        F.col(id_col),
        F.transform(
            _shingles(F.col(text_col), shingle_k), lambda s: F.xxhash64(s)
        ).alias("hb"),
    )
    return base.select(id_col, min_perm("hb").alias("sig"))


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate pairs via LSH banding, verified by exact shingle
    Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold.

    band rows r = num_perm/bands; candidate prob at similarity s is
    1-(1-s^r)^bands (S-curve centered ~ (1/bands)^(1/r)).
    """
    assert num_perm % bands == 0
    r = num_perm // bands
    # NOTE: no explicit persist — the band join is a self-join and
    # Spark's ReusedExchange already shares the shuffled signature
    # stage between both sides (verified in the physical plan; an
    # explicit .persist() measured ~1.5× SLOWER by breaking
    # whole-stage pipelining).
    sig = minhash_signatures(df, id_col, text_col, num_perm, shingle_k)

    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col("sig")[b * r + i] for i in range(r)]).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(
        F.col(id_col).alias("id"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", "bk.band", "bk.bh")

    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    # exact verification on the shingle sets (joins back to the docs;
    # candidate set is small, so the shingle join is cheap).
    # repartition again: the raw scan is a single file → 1 partition.
    sh = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, id_col
    ).select(
        F.col(id_col).alias("id"), _shingles(F.col(text_col), shingle_k).alias("sh")
    )
    verified = (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash with Hamming distance ≤ k.

    Signature: per token hash, each of the 64 bits votes ±1; the sign
    of the per-bit sum is the signature bit. Candidates: split the 64
    bits into (k+1) bands — any pair within Hamming k matches exactly
    on at least one band (pigeonhole) — equi-join per band, then verify
    the true Hamming distance with bit_count(xor).
    Entirely JVM-side (explode + groupBy + shifts); no Python.
    """
    nbands = max_hamming + 1
    width = 64 // nbands

    par = df.sparkSession.sparkContext.defaultParallelism
    tok = (
        df.repartition(par, id_col)  # single-file input → parallelize
        .select(
            F.col(id_col).alias("id"),
            F.explode(tokens(normalize_text(F.col(text_col)))).alias("tok"),
        )
        .withColumn("h", F.xxhash64("tok"))
    )
    # bit votes: for bit i, +1 if set else -1; sum over tokens; sign → bit
    votes = tok.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {i}) & 1") == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    sig_expr = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sig_expr = term if sig_expr is None else sig_expr.bitwiseOR(term)
    sig = votes.select("id", sig_expr.alias("sig"))

    bands = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"(sig >> {b * width}) & {(1 << width) - 1}"
                        ).alias("piece"),
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.piece")

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.piece") == F.col("b.piece"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
