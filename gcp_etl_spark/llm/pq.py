"""Product-quantization (PQ) approximate nearest neighbor.

Third scale path beside LSH (`llm/similarity.py`) and IVF
(`llm/ivf.py`), covering the axis the other two don't: MEMORY. Each
d-dim float vector is compressed to ``m`` one-byte codes (one per
d/m-dim subspace, ``k_codes`` <= 256 centroids each) — 64 float32
values (256 B) become 8 bytes, so the searchable index for 10^12
vectors is ~8 TB instead of ~256 TB of raw floats.

Scoring uses ADC (asymmetric distance computation): per query,
precompute an ``m x k_codes`` lookup table of subspace inner
products; a corpus vector's approximate score is then the sum of m
byte-indexed table entries — query-time never touches a float
vector. A shortlist of ``rerank`` candidates per query is re-scored
with exact cosine (the standard two-stage retrieve -> rerank shape).

100 TB design:
- the codebook tensor is k_codes x d floats total — ships once in
  the udf closure (broadcast-shaped, like the IVF centroid probe);
- a prebuilt index streams (id, codes) only (``pq_encode`` is the
  index-build operator); ``pq_topk`` over raw vectors fuses encode +
  ADC into ONE partition pass so the corpus crosses the Python
  boundary once. Either way per-PARTITION top-``rerank`` pruning
  inside mapInPandas bounds the shuffle to #partitions x #queries x
  rerank tiny rows (a correct superset of the global top — pruning
  per partition can never drop a global top-R candidate);
- only the <= #queries x rerank shortlist rows ever rejoin the float
  vectors for the exact rerank.

Approximate by design -> rows-only driver check; recall vs the exact
operator is pytest-asserted (tests/test_llm.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcp_etl_spark.llm.similarity import cosine


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k_codes: int = 16,
    train_sample: int = 4096,
    seed: int = 42,
    iters: int = 15,
) -> np.ndarray:
    """Fit per-subspace codebooks on a BOUNDED deterministic sample
    (same rationale as `ivf_assign`: quantizer quality saturates at a
    few hundred samples per centroid; full-corpus training passes are
    a non-starter at scale). Returns ndarray [m, k_codes, d//m].

    Vectors are L2-normalized before training so ADC inner products
    approximate cosine directly. Plain seeded Lloyd iterations in
    numpy (`llm/kmeans.py`) — the sample is small by construction, so
    driver-local k-means beats spinning up MLlib jobs per subspace."""
    pdf = (
        corpus.select(F.col(id_col).alias("__id"),
                      F.col(vec_col).cast("array<double>").alias("__v"))
        .orderBy("__id")
        .limit(train_sample)
        .toPandas()
    )
    from gcp_etl_spark.llm.kmeans import lloyd

    X = _normalize(np.vstack(pdf["__v"].to_numpy()))
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    books = np.empty((m, k_codes, ds))
    for s in range(m):
        books[s] = lloyd(
            X[:, s * ds:(s + 1) * ds], k_codes, seed=seed + s, iters=iters
        )
    return books


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: np.ndarray,
) -> DataFrame:
    """(id, codes array<smallint>) — nearest sub-centroid per subspace,
    one numpy pass per Arrow batch; codebooks ride the udf closure."""
    from pyspark.sql.pandas.functions import pandas_udf

    B = codebooks.astype(np.float64)  # m x k x ds
    m, _, ds = B.shape
    b2 = (B * B).sum(axis=2)  # m x k

    @pandas_udf("array<smallint>")
    def encode(col):  # (pd.Series) -> pd.Series
        import pandas as pd

        X = _normalize(np.asarray(
            [np.asarray(v, dtype=np.float64) for v in col]))
        out = np.empty((X.shape[0], m), dtype=np.int16)
        for s in range(m):
            sub = X[:, s * ds:(s + 1) * ds]
            dist = -2.0 * (sub @ B[s].T) + b2[s]
            out[:, s] = dist.argmin(axis=1)
        return pd.Series(list(out))

    return df.select(
        F.col(id_col).alias("n_id"), encode(F.col(vec_col).cast("array<double>")).alias("codes")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    k_codes: int = 16,
    rerank: int | None = None,
    seed: int = 42,
    max_queries: int = 1024,
) -> DataFrame:
    """Approximate top-k cosine via PQ/ADC with exact rerank.
    Returns (q_id, n_id, cos, rn) — same shape as `cosine_topk`.

    ADC ships the whole query-side LUT (nq x m x k_codes floats) in
    the task closure, so the query set MUST be driver-bounded — this
    is a many-corpus-few-queries operator by construction. The
    ``max_queries`` guard turns an accidental corpus-sized ``queries``
    input into an immediate error instead of a driver OOM; raise it
    deliberately if you really want a larger probe batch."""
    rerank = rerank if rerank is not None else 4 * k
    books = pq_train(corpus, id_col, vec_col, m, k_codes, seed=seed)

    # limit(max_queries + 1) bounds the collect itself (one TakeOrdered,
    # no extra count job) while still detecting an oversized input
    qpdf = (
        queries.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).cast("array<double>").alias("q_vec"))
        .orderBy("q_id")
        .limit(max_queries + 1)
        .toPandas()
    )
    if len(qpdf) > max_queries:
        raise ValueError(
            f"pq_topk queries side has > max_queries={max_queries} rows; "
            "ADC broadcasts a per-query LUT, so the query set must be "
            "small (pass a higher max_queries only if that is intended)"
        )
    q_ids = qpdf["q_id"].to_numpy()
    Q = _normalize(np.vstack(qpdf["q_vec"].to_numpy()))
    ds = books.shape[2]
    # LUT[q, s, c] = <q_sub_s, codebook[s][c]> : the entire query-side
    # state ADC needs — nq x m x k_codes floats, closure-shipped
    lut = np.stack(
        [Q[:, s * ds:(s + 1) * ds] @ books[s].T for s in range(books.shape[0])],
        axis=1,
    )
    nq = len(q_ids)
    r = rerank
    # encode + ADC fused in ONE partition pass (r12): the corpus used
    # to cross the Python boundary twice — embeddings -> ArrowEval
    # (pq_encode) -> codes back to the JVM -> MapInPandas (ADC). The
    # codes were consumed by exactly one operator, so the fused pass
    # encodes each Arrow batch and scores it in place; only the tiny
    # per-partition top-r rows return to the JVM. Per-row math is
    # identical (same codebook argmin, same LUT gathers, same subspace
    # sum order), so the output is bit-for-bit the two-pass result.
    B = books.astype(np.float64)  # m x k x ds
    b2 = (B * B).sum(axis=2)  # m x k

    def partition_topr(batches):
        import pandas as pd

        ids: list[np.ndarray] = []
        scores: list[np.ndarray] = []
        for pdf in batches:
            X = _normalize(np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]))
            nb = X.shape[0]
            C = np.empty((nb, m), dtype=np.int64)  # B x m
            for sub in range(m):
                part = X[:, sub * ds:(sub + 1) * ds]
                dist = -2.0 * (part @ B[sub].T) + b2[sub]
                C[:, sub] = dist.argmin(axis=1)
            s = np.zeros((nq, nb))
            for sub in range(m):
                s += lut[:, sub, C[:, sub]]
            ids.append(pdf["n_id"].to_numpy())
            scores.append(s)
        if not ids:
            return
        nid = np.concatenate(ids)
        sc = np.concatenate(scores, axis=1)  # nq x N_part
        take = min(r, sc.shape[1])
        top = np.argpartition(-sc, take - 1, axis=1)[:, :take]
        yield pd.DataFrame({
            "q_id": np.repeat(q_ids, take),
            "n_id": nid[top].ravel(),
            "adc": np.take_along_axis(sc, top, axis=1).ravel(),
        })

    cand = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).mapInPandas(
        partition_topr, "q_id long, n_id long, adc double"
    ).filter(F.col("q_id") != F.col("n_id"))
    wr = Window.partitionBy("q_id").orderBy(F.col("adc").desc(), F.col("n_id").asc())
    shortlist = cand.withColumn("rr", F.row_number().over(wr)).filter(
        F.col("rr") <= rerank
    )

    c = corpus.select(F.col(id_col).alias("n_id"),
                      F.col(vec_col).cast("array<double>").alias("n_vec"))
    q = queries.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).cast("array<double>").alias("q_vec"))
    exact = (
        shortlist.join(c, "n_id")
        .join(F.broadcast(q), "q_id")
        .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", F.round("cos", 4).alias("cos"), "rn")
    )
