"""Round-6 operator additions (SURVEY.md §2G — the full table lives
there; 32 registered queries in this module).

Families, in registration order: data selection (DSIR importance
weights, temperature mixture sampling, weighted reservoir sample,
deterministic global training order); classifier lifecycle (GD logreg
trainer, calibration bins, PR threshold sweep, Cohen's kappa,
streaming live-calibration); ANN (IVF-PQ rerank, hard negatives,
partition-pruned IVF probe, matryoshka truncation eval, bitext margin
mining); tokenization (BPE trainer / decode / vocab export /
round-trip identity, padding-waste planner); corpus operations
(snapshot diff, shard planner, leakage-free split, sampled dup-rate
estimate, KMV distinct-overlap sketch, DP-noised counts, FK integrity
audit, the fused 5-stage curation pipeline); streaming duals (PSI-
style latency quantiles, incremental MinHash dedup); multimodal
(audio resample transcode); text (FIM transform, mixed-language flag).

Cross-engine determinism policy (registry docstring): every
order-dependent double sum is either decimal-summed (exact,
order-free) or rounded at >= 8 dp before feeding the next stage;
every seeded draw is the md5 hash uniform, identical integer
arithmetic in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.queries.r5_ops import _merges_sql
from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t
from gcp_etl_spark.operators.barrier import barrier

# ---------------------------------------------------------------- DSIR

_DSIR_BUCKETS = 256
_DSIR_TARGET_LANG = "en"


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents
    ), grams AS (
      SELECT doc_id, lang, ws[i+1] || ' ' || ws[i+2] AS g
      FROM toks, unnest(range(len(ws) - 1)) AS u(i)
      WHERE len(ws) >= 2
    ), bkt AS (
      SELECT doc_id, lang,
             CAST(CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT) AS BIGINT)
               % {_DSIR_BUCKETS} AS bucket
      FROM grams
    ), doc_cnt AS (
      SELECT doc_id, bucket, count(*) AS cnt FROM bkt GROUP BY 1, 2
    ), src AS (
      SELECT bucket, count(*) AS cs FROM bkt GROUP BY 1
    ), tgt AS (
      SELECT bucket, count(*) AS ct
      FROM bkt WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY 1
    ), tots AS (
      SELECT (SELECT count(*) FROM bkt) AS ns,
             (SELECT count(*) FROM bkt
              WHERE lang = '{_DSIR_TARGET_LANG}') AS nt
    ), terms AS (
      SELECT s.bucket,
             CAST(round(ln(
                 ((COALESCE(tg.ct, 0) + 1.0) / (tots.nt + {_DSIR_BUCKETS}))
               / ((s.cs + 1.0) / (tots.ns + {_DSIR_BUCKETS}))
             ), 9) AS DECIMAL(18,9)) AS term
      FROM src s LEFT JOIN tgt tg USING (bucket) CROSS JOIN tots
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           round(CAST(sum(CAST(cnt AS DECIMAL(9,0)) * term) AS DOUBLE), 6)
             AS weight
    FROM doc_cnt JOIN terms USING (bucket)
    GROUP BY doc_id
    ORDER BY weight DESC, doc_id
    LIMIT 50
    """,
    tags=("llm", "data-selection", "dsir", "text"),
)
def dsir_importance_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", public): score every
    raw document by how much its hashed-n-gram profile looks like the
    TARGET distribution — weight(doc) = Σ_b cnt_b · ln(p_target(b) /
    p_raw(b)) over 256 hashed-bigram buckets with Laplace
    smoothing. Target here: the ``lang = 'en'`` slice; raw: the whole
    corpus. Top-50 docs by weight are the importance-resampling picks.

    Determinism: the bucket log-ratio is rounded to 9 dp and summed as
    DECIMAL (exact, order-free), so per-doc weights are identical in
    both engines regardless of partitioning.

    Scale: documents stream once into (doc_id, bucket) counts; the two
    bucket distributions are 256-row relations (broadcast);
    the per-doc weight is a map-side-combinable hash agg. Nothing
    driver-side, no shuffle carries text."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    grams = d.select(
        "doc_id", "lang", toks.alias("toks")
    ).select(
        "doc_id",
        "lang",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> concat(toks[i], ' ', toks[i+1]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    bkt = grams.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long")
            % _DSIR_BUCKETS
        ).alias("bucket"),
    )
    doc_cnt = bkt.groupBy("doc_id", "bucket").agg(F.count("*").alias("cnt"))
    src = bkt.groupBy("bucket").agg(F.count("*").alias("cs"))
    tgt = (
        bkt.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("bucket")
        .agg(F.count("*").alias("ct"))
    )
    tots = bkt.agg(
        F.count("*").alias("ns"),
        F.count(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, 1)
        ).alias("nt"),
    )
    ratio = (
        (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
        / (F.col("nt") + _DSIR_BUCKETS)
    ) / ((F.col("cs") + 1.0) / (F.col("ns") + _DSIR_BUCKETS))
    terms = (
        src.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "bucket",
            # (18,9) x (9,0) multiply stays within precision 38 so the
            # product keeps scale 9 EXACTLY on both engines — at
            # (28,9) x bigint Spark's precision-loss rule truncated the
            # product scale to 6dp and the weights drifted ~1e-6
            F.round(F.log(ratio), 9).cast("decimal(18,9)").alias("term"),
        )
    )
    return (
        doc_cnt.join(F.broadcast(terms), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(
                    F.col("cnt").cast("decimal(9,0)") * F.col("term")
                ).cast("double"),
                6,
            ).alias("weight"),
        )
        .orderBy(F.col("weight").desc(), "doc_id")
        .limit(50)
    )


# -------------------------------------------- temperature mix sampling

# alpha = 0.5 → p_s ∝ sqrt(n_s) (the mT5 / XLM-R temperature value)
_TEMP_SAMPLE_N = 300


@query(
    "mix_temperature_sampling",
    oracle=f"""
    WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
    c2 AS (
      SELECT source, n,
             CAST(round(sqrt(CAST(n AS DOUBLE)), 9) AS DECIMAL(28,9)) AS sq
      FROM cnt
    ), tot AS (SELECT sum(sq) AS den FROM c2),
    q AS (
      SELECT source,
             CAST(floor({_TEMP_SAMPLE_N}
               * (CAST(sq AS DOUBLE) / CAST(den AS DOUBLE))) AS BIGINT)
               AS quota,
             round(CAST(sq AS DOUBLE) / CAST(den AS DOUBLE), 6) AS share
      FROM c2 CROSS JOIN tot
    ), ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS pick_rank
      FROM documents
    )
    SELECT r.source, r.doc_id, r.pick_rank, q.quota, q.share
    FROM ranked r JOIN q USING (source)
    WHERE r.pick_rank <= q.quota
    """,
    tags=("llm", "mixture", "sampling"),
)
def mix_temperature_sampling(spark, sf_dir):
    """TEMPERATURE-SCALED source sampling (the mT5/XLM-R alpha-
    sampling scheme, public): draw a 300-doc mixture with
    per-source probability p_s ∝ n_s^0.5 — upweights small sources
    relative to proportional sampling without letting any source
    dominate. The actual picks are DETERMINISTIC: per-source
    md5(doc_id) hash order (a reproducible uniform permutation), first
    ``quota = floor(N·p_s)`` docs win.

    Determinism: per-source sqrt(n) is rounded to 9 dp and
    decimal-summed, so the denominator (and hence every quota) is
    exact and order-free in both engines; sqrt itself is IEEE
    correctly-rounded everywhere.

    Scale: the mixture algebra is a |sources|-row relation; the picks
    are one window over (source) in hash order — a single shuffle of
    (source, doc_id, hash), never text. The complement of
    ``corpus_mix_rebalance`` (which plans weights; this one executes a
    draw)."""
    d = t(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(F.count("*").alias("n"))
    c2 = cnt.select(
        "source",
        F.round(F.sqrt(F.col("n").cast("double")), 9)
        .cast("decimal(28,9)")
        .alias("sq"),
    )
    tot = c2.agg(F.sum("sq").alias("den"))
    share = F.col("sq").cast("double") / F.col("den").cast("double")
    q = c2.crossJoin(F.broadcast(tot)).select(
        "source",
        F.floor(F.lit(_TEMP_SAMPLE_N) * share).cast("long").alias("quota"),
        F.round(share, 6).alias("share"),
    )
    ranked = d.select(
        "source",
        "doc_id",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        )
        .cast("long")
        .alias("pick_rank"),
    )
    return (
        ranked.join(F.broadcast(q), "source")
        .filter(F.col("pick_rank") <= F.col("quota"))
        .select("source", "doc_id", "pick_rank", "quota", "share")
    )


# ------------------------------------- distributed logistic regression

_GD_LR = 0.5
_GD_ITERS = 3


def _gd_oracle_sql() -> str:
    """Unrolled GD recurrence as chained CTEs — generated from the
    SAME constants the Spark side iterates with, so the two engines
    can never drift."""
    p = "1.0/(1.0 + exp(-(w0 + w1*x1 + w2*x2)))"
    ctes = [
        """f AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y,
             value / 100.0 AS x1,
             hour(ts) / 24.0 AS x2
      FROM events
    )""",
        "it0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)",
    ]
    for i in range(1, _GD_ITERS + 1):
        ctes.append(
            f"""it{i} AS (
      SELECT round(max(w0) - {_GD_LR} * avg(({p} - y)), 8) AS w0,
             round(max(w1) - {_GD_LR} * avg(x1 * ({p} - y)), 8) AS w1,
             round(max(w2) - {_GD_LR} * avg(x2 * ({p} - y)), 8) AS w2
      FROM f CROSS JOIN it{i - 1}
    )"""
        )
    return f"""
    WITH {', '.join(ctes)}
    SELECT max(w0) AS w0, max(w1) AS w1, max(w2) AS w2,
           round(avg(CASE WHEN ({p} >= 0.5 AND y = 1.0)
                            OR ({p} < 0.5 AND y = 0.0)
                     THEN 1.0 ELSE 0.0 END), 6) AS train_accuracy,
           count(*) AS n_rows
    FROM f CROSS JOIN it{_GD_ITERS}
    """


def _logreg_feats(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.select(
        F.when(F.col("event_type") == "purchase", 1.0)
        .otherwise(0.0)
        .alias("y"),
        (F.col("value") / 100.0).alias("x1"),
        (F.hour("ts") / 24.0).alias("x2"),
    )


def _sigmoid(w):
    z = (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


@query(
    "train_quality_logreg",
    oracle=_gd_oracle_sql(),
    tags=("llm", "classifier", "ml", "iterative"),
)
def train_quality_logreg(spark, sf_dir):
    """Distributed QUALITY-CLASSIFIER training: full-batch gradient
    descent for logistic regression (predict ``event_type =
    'purchase'`` from value and hour-of-day), 3 full-batch iterations
    at lr 0.5 — the fastText/logreg quality-filter trainer every
    LLM data pipeline runs, expressed as pure aggregates: one pass per
    iteration computing the exact batch gradient Σ x·(σ(w·x) − y)/N
    via map-side-combinable avg()s; the only driver state is the
    3-double weight vector (the legitimate bounded-state iterative
    pattern, same as k-means).

    Determinism: each iteration's weights are rounded to 8 dp INSIDE
    the SQL aggregate on both engines, so engine-order double
    summation (abs diff ~1e-13 per gradient) can never propagate; the
    DuckDB oracle replays the identical recurrence as unrolled CTEs
    generated from the same constants.

    Scale: 3 scans × one hash agg each, no shuffle wider
    than the 3-double partials; at 100 TB you'd cache the projected
    features once and each iteration is a single map-reduce."""
    feats = _logreg_feats(spark, sf_dir)
    w = (0.0, 0.0, 0.0)
    for _ in range(_GD_ITERS):
        p = _sigmoid(w)
        row = feats.agg(
            F.round(
                F.lit(w[0]) - _GD_LR * F.avg(p - F.col("y")), 8
            ).alias("w0"),
            F.round(
                F.lit(w[1]) - _GD_LR * F.avg(F.col("x1") * (p - F.col("y"))),
                8,
            ).alias("w1"),
            F.round(
                F.lit(w[2]) - _GD_LR * F.avg(F.col("x2") * (p - F.col("y"))),
                8,
            ).alias("w2"),
        ).first()
        w = (row["w0"], row["w1"], row["w2"])
    p = _sigmoid(w)
    correct = F.when(
        ((p >= 0.5) & (F.col("y") == 1.0))
        | ((p < 0.5) & (F.col("y") == 0.0)),
        1.0,
    ).otherwise(0.0)
    return feats.agg(
        F.lit(w[0]).alias("w0"),
        F.lit(w[1]).alias("w1"),
        F.lit(w[2]).alias("w2"),
        F.round(F.avg(correct), 6).alias("train_accuracy"),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------- IVF-PQ + rerank

_IVFPQ_K = 5
_IVFPQ_SHORTLIST = 20
_IVFPQ_NPROBE = 2
_IVFPQ_CENTROIDS = 8
_IVFPQ_M = 8
_IVFPQ_CODES = 16
_IVFPQ_QUERY_MOD = 50


@query(
    "ann_ivf_pq_rerank",
    # rows-only by design (two stacked approximations: IVF probe
    # recall + PQ quantization); recall vs the exact operator is
    # pinned by tests/test_r6.py::test_ivf_pq_rerank_recall, top-k
    # determinism by test_ivf_pq_rerank_deterministic.
    oracle=None,
    tags=("llm", "ann", "ivf", "pq", "approx"),
)
def ann_ivf_pq_rerank(spark, sf_dir):
    """The full FAISS-style IVF-PQ pipeline (Jégou et al. 2011,
    public), composed from the engine's own primitives: IVF coarse
    quantizer restricts each query to its ``nprobe`` inverted lists
    (llm/ivf.py), PQ/ADC scores ONLY those lists from 8-byte codes
    (llm/pq.py codebooks), the ADC top-20 shortlist is
    reranked with EXACT cosine, and the top-5 survive.

    vs the standalone paths: ``ann_topk_ivf`` scores probed lists with
    full vectors; ``ann_topk_pq`` ADC-scans the whole corpus. This
    composition is the one that holds at 10^9+ vectors: candidates ≈
    |corpus|·nprobe/n_centroids, each scored from codes (16× smaller
    than vectors), full vectors touched only for shortlist·|queries|
    rows.

    Scale: the ADC scoring is a per-pair vectorized Pandas UDF whose
    closure carries only the codebooks (m·k·d/m floats) — no per-query
    LUT broadcast, so the query side is NOT driver-bounded (unlike
    ``pq_topk``'s documented max_queries guard)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    from gcp_etl_spark.llm.ivf import _nearest_centroids, ivf_assign
    from gcp_etl_spark.llm.pq import _normalize, pq_encode, pq_train
    from gcp_etl_spark.llm.similarity import cosine

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % _IVFPQ_QUERY_MOD == 0)

    assigned, centers = ivf_assign(
        emb, "vec_id", "embedding", n_centroids=_IVFPQ_CENTROIDS
    )
    books = pq_train(
        emb, "vec_id", "embedding", m=_IVFPQ_M, k_codes=_IVFPQ_CODES
    )
    codes = pq_encode(emb, "vec_id", "embedding", books)
    inv = assigned.select(
        F.col("vec_id").alias("n_id"), "centroid_id"
    ).join(codes, "n_id")

    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("q_vec"),
    ).withColumn(
        "centroid_id",
        F.explode(
            _nearest_centroids(F.col("q_vec"), centers, _IVFPQ_NPROBE)
        ),
    )

    B = books.astype(np.float64)  # m x k x ds
    m, _, ds = B.shape

    @pandas_udf("double")
    def adc(qv, cs):  # (pd.Series, pd.Series) -> pd.Series
        Q = _normalize(
            np.asarray([np.asarray(v, dtype=np.float64) for v in qv])
        )
        C = np.vstack(cs.to_numpy()).astype(np.int64)  # batch x m
        s = np.zeros(len(C))
        for sub in range(m):
            s += np.einsum(
                "ij,ij->i",
                Q[:, sub * ds : (sub + 1) * ds],
                B[sub][C[:, sub]],
            )
        return pd.Series(s)

    cand = inv.join(F.broadcast(q), "centroid_id").filter(
        F.col("q_id") != F.col("n_id")
    )
    scored = cand.withColumn("adc", adc(F.col("q_vec"), F.col("codes")))
    ws = Window.partitionBy("q_id").orderBy(
        F.col("adc").desc(), F.col("n_id").asc()
    )
    shortlist = (
        scored.withColumn("rr", F.row_number().over(ws))
        .filter(F.col("rr") <= _IVFPQ_SHORTLIST)
        .select("q_id", "n_id", "q_vec")
    )
    nvec = emb.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").cast("array<double>").alias("n_vec"),
    )
    exact = shortlist.join(nvec, "n_id").withColumn(
        "cos", cosine(F.col("q_vec"), F.col("n_vec"))
    )
    wk = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("n_id").asc()
    )
    return (
        exact.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _IVFPQ_K)
        .select("q_id", "n_id", F.round("cos", 4).alias("cos"), "rn")
    )


# --------------------------------------------- hard-negative mining

_HN_K = 5
_HN_QUERY_MOD = 25
# bounded probe collect per chunk (the embedding_distance_histogram
# contract): 4096 probes x d dims x 8 B regardless of corpus size
_HN_PROBE_CHUNK = 4096


@query(
    "ann_hard_negatives",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, label AS q_label,
             CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id % {_HN_QUERY_MOD} = 0
    ), c AS (
      SELECT vec_id AS n_id, label AS n_label,
             CAST(embedding AS DOUBLE[]) AS nv
      FROM embeddings
    ), scored AS (
      SELECT q_id, n_id, n_label,
             round(list_dot_product(qv, nv)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(nv, nv))), 4) AS cos
      FROM q JOIN c ON q_id <> n_id AND q_label <> n_label
    ), ranked AS (
      SELECT q_id, n_id, n_label, cos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, n_id) AS rn
      FROM scored
    )
    SELECT q_id, n_id, n_label, cos, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {_HN_K}
    """,
    tags=("llm", "ann", "contrastive", "embeddings"),
)
def ann_hard_negatives(spark, sf_dir):
    """HARD-NEGATIVE MINING for contrastive training (the DPR/
    Contriever recipe, public): for each query vector, the top-k most
    cosine-similar corpus vectors with a DIFFERENT label — the
    near-miss negatives that make an embedding model actually learn
    the decision boundary. Ranking compares the ROUNDED cosine on both
    engines so the k-th-place boundary is identical.

    Scale: probe chunks × streamed corpus (corpus never shuffles);
    the per-query top-k window runs on |queries|·|corpus| scored pairs
    — at 10^9 vectors the same expression rides the IVF candidate
    stream (``ann_ivf_pq_rerank``) instead of the full scan.

    r13 (guide §4.2, the r12 embedding_distance_histogram pattern):
    the old broadcast-cross-join evaluated the interpreted per-pair
    ``cosine`` (aggregate/zip_with, ~13 µs/pair) over every scored
    pair — 160k pairs ≈ 2 s of the query's 2.6-2.7 s. One numpy
    matmul per Arrow batch now scores a whole (batch × probe-chunk)
    block; ROUNDING STAYS IN SPARK (F.round is HALF_UP, np.round is
    half-even) on the raw double, and the matmul-vs-sequential
    summation reorder is bounded ~1e-15 while the nearest raw cosine
    sits 1.1e-9 from a 4-dp rounding edge at sf0.1 — outputs verified
    row-identical against the interpreted form at all three SFs.
    Probes are collected in vec_id-range chunks of ≤ _HN_PROBE_CHUNK
    rows (the histogram's bounded-collect contract: a range of
    MOD·CAP consecutive ids holds ≤ CAP multiples of MOD), so driver
    and closure stay O(CAP·d) at any corpus size; per-chunk partial
    top-k would also ride the same union. Measured 2.6-2.7 s →
    ~0.5 s isolated."""
    import numpy as np

    e = t(spark, sf_dir, "embeddings")
    stride = _HN_QUERY_MOD * _HN_PROBE_CHUNK
    max_id = e.agg(F.max("vec_id")).first()[0]
    c = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("label").alias("n_label"),
        F.col("embedding").cast("array<double>").alias("nv"),
    )
    parts = []
    for k in range(0 if max_id is None else max_id // stride + 1):
        qpdf = (
            e.filter(
                (F.col("vec_id") % _HN_QUERY_MOD == 0)
                & F.col("vec_id").between(
                    k * stride, (k + 1) * stride - 1
                )
            )
            .select(
                F.col("vec_id").alias("q_id"),
                F.col("label").alias("q_label"),
                F.col("embedding").cast("array<double>").alias("qv"),
            )
            .orderBy("q_id")
            .toPandas()
        )
        if qpdf.empty:
            continue
        q_ids = qpdf["q_id"].to_numpy()
        q_lab = qpdf["q_label"].to_numpy()
        Q = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in qpdf["qv"]]
        )
        Qn = np.sqrt((Q * Q).sum(axis=1))

        def score(batches, Q=Q, Qn=Qn, q_ids=q_ids, q_lab=q_lab):
            import pandas as pd

            for pdf in batches:
                X = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["nv"]]
                )
                nid = pdf["n_id"].to_numpy()
                nlab = pdf["n_label"].to_numpy()
                cos = (X @ Q.T) / (
                    np.sqrt((X * X).sum(axis=1))[:, None] * Qn[None, :]
                )
                keep = (nid[:, None] != q_ids[None, :]) & (
                    nlab[:, None] != q_lab[None, :]
                )
                # PARTIAL TOP-K (guide §2.3 aggregate before you
                # shuffle; the sf1.0 probe found the full pair stream
                # — 16M rows at 10x — dominating the query through
                # Arrow + the ranking window): a row outside its
                # batch's top-k for a probe, under the SAME
                # (rounded-cos desc) order the final window uses, is
                # dominated by >= k batch-mates and cannot reach the
                # global top-k. Keep rows at or above the k-th
                # largest rounded cosine per probe — a SUPERSET of
                # the batch top-k (all threshold ties kept, so the
                # window's n_id tie-break still sees every
                # contender); the window then ranks survivors
                # exactly as before.
                r4 = np.floor(cos * 1e4 + 0.5) / 1e4
                r4 = np.where(keep, r4, -np.inf)
                if r4.shape[0] > _HN_K:
                    th = -np.partition(-r4, _HN_K - 1, axis=0)[
                        _HN_K - 1, :
                    ]
                    keep &= r4 >= th[None, :]
                r, cix = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "q_id": q_ids[cix],
                        "n_id": nid[r],
                        "n_label": nlab[r],
                        "cos_raw": cos[r, cix],
                    }
                )

        parts.append(
            c.mapInPandas(
                score, "q_id long, n_id long, n_label int, cos_raw double"
            )
        )
    if not parts:
        raw = c.select(
            F.lit(0).cast("long").alias("q_id"),
            F.col("n_id"),
            F.col("n_label"),
            F.lit(0.0).alias("cos_raw"),
        ).limit(0)
    else:
        raw = parts[0]
        for p in parts[1:]:
            raw = raw.unionAll(p)
    scored = raw.select(
        "q_id", "n_id", "n_label", F.round("cos_raw", 4).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "n_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _HN_K)
        .select("q_id", "n_id", "n_label", "cos", "rn")
    )


# --------------------------------------- quality-score calibration


@query(
    "quality_calibration_bins",
    oracle=_gd_oracle_sql().replace(
        """
    SELECT max(w0) AS w0, max(w1) AS w1, max(w2) AS w2,
           round(avg(CASE WHEN (1.0/(1.0 + exp(-(w0 + w1*x1 + w2*x2))) >= 0.5 AND y = 1.0)
                            OR (1.0/(1.0 + exp(-(w0 + w1*x1 + w2*x2))) < 0.5 AND y = 0.0)
                     THEN 1.0 ELSE 0.0 END), 6) AS train_accuracy,
           count(*) AS n_rows
    FROM f CROSS JOIN it3
    """,
        """
    SELECT CAST(least(floor(1.0/(1.0 + exp(-(w0 + w1*x1 + w2*x2))) * 10), 9)
                AS BIGINT) AS bin,
           count(*) AS n,
           round(avg(1.0/(1.0 + exp(-(w0 + w1*x1 + w2*x2)))), 6)
             AS mean_predicted,
           round(avg(y), 6) AS actual_rate
    FROM f CROSS JOIN it3
    GROUP BY 1 ORDER BY 1
    """,
    ),
    tags=("llm", "classifier", "calibration", "ml"),
)
def quality_calibration_bins(spark, sf_dir):
    """CALIBRATION (reliability diagram) of the trained quality
    classifier: score every row with the GD-trained weights
    (``train_quality_logreg``'s exact recurrence), decile-bin the
    predicted probability, and compare mean predicted vs actual
    positive rate per bin — the check that turns a classifier score
    into a usable sampling weight (a mis-calibrated filter silently
    skews the training mixture).

    Scale: the training passes are ``train_quality_logreg``'s; the
    scoring pass is a pure map + one 10-group hash agg."""
    feats = _logreg_feats(spark, sf_dir)
    w = (0.0, 0.0, 0.0)
    for _ in range(_GD_ITERS):
        p = _sigmoid(w)
        row = feats.agg(
            F.round(
                F.lit(w[0]) - _GD_LR * F.avg(p - F.col("y")), 8
            ).alias("w0"),
            F.round(
                F.lit(w[1]) - _GD_LR * F.avg(F.col("x1") * (p - F.col("y"))),
                8,
            ).alias("w1"),
            F.round(
                F.lit(w[2]) - _GD_LR * F.avg(F.col("x2") * (p - F.col("y"))),
                8,
            ).alias("w2"),
        ).first()
        w = (row["w0"], row["w1"], row["w2"])
    p = _sigmoid(w)
    return (
        feats.select(
            F.least(F.floor(p * 10), F.lit(9)).cast("long").alias("bin"),
            p.alias("p"),
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("p"), 6).alias("mean_predicted"),
            F.round(F.avg("y"), 6).alias("actual_rate"),
        )
        .orderBy("bin")
    )


# ------------------------------------------------ BPE tokenizer train

_BPE_TRAIN_N = 10


@query(
    "bpe_train_merges",
    # rows-only by design: the merge list is the fixpoint of an
    # iterative argmax recurrence no single SQL statement expresses
    # (each rank's pair counts depend on the previous rank's merge
    # application). Pinned EXACTLY (merge-for-merge, count-for-count)
    # against a pure-Python reference trainer on the same corpus by
    # tests/test_r6.py::test_bpe_train_matches_reference.
    oracle=None,
    tags=("llm", "tokenizer", "bpe", "iterative"),
)
def bpe_train_merges(spark, sf_dir):
    """Distributed BPE tokenizer TRAINING over the documents corpus:
    collapse to the distinct-word vocabulary (freq-weighted), then
    learn 10 merge rules by iterated highest-count adjacent-pair
    selection (count desc, left, right tiebreak) — completing the
    tokenizer story next to ``text_bpe_merge_stats`` (one round of
    pair counts) and ``bpe_encode_tokens`` (apply a shipped merge
    table). Output: (rank, left, right, pair_count).

    Scale: see functions/bpe.py::train_merges — the corpus is scanned
    ONCE into the vocab; every training iteration runs over the
    vocabulary relation (corpus^0.5 by Heaps' law) with one hash agg
    + one bounded TakeOrdered + one map. r7: trained with batch=8 in
    EXACT mode — multiple provably-safe merges commit per driver
    round-trip (rank-prefix, strict count dominance), result
    bit-identical to the sequential trainer; real-vocabulary training
    additionally offers exact=False (documented order-relaxed
    batching, ~batch× fewer round-trips)."""
    from gcp_etl_spark.functions.bpe import train_merges

    d = t(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    merges = train_merges(vocab, n_merges=_BPE_TRAIN_N, batch=8)
    return spark.createDataFrame(
        [
            (i, left, right, cnt)
            for i, (left, right, cnt) in enumerate(merges)
        ],
        "rank long, left string, right string, pair_count long",
    )


# ------------------------------------ streaming calibration monitor


def _score_w():
    from gcp_etl_spark.streaming.windows import SCORE_W

    return SCORE_W


@query(
    "stream_score_calibration",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 day', ts) AS w_start,
           count(*) AS n,
           round(avg(1.0/(1.0 + exp(-({_score_w()[0]}
                 + {_score_w()[1]} * (value / 100.0)
                 + {_score_w()[2]} * (hour(ts) / 24.0))))), 6)
             AS mean_predicted,
           round(avg(CASE WHEN event_type = 'purchase'
                     THEN 1.0 ELSE 0.0 END), 6) AS actual_rate
    FROM events GROUP BY 1
    """,
    tags=("streaming", "window", "classifier", "calibration"),
)
def stream_score_calibration(spark, sf_dir):
    """Batch dual of the streaming LIVE-CALIBRATION monitor
    (``streaming/windows.py::score_calibration_windows``): per
    tumbling day-window, mean predicted probability of a SHIPPED
    logistic quality model vs the actual positive rate. Streaming
    execution (watermark, state bounded by windows × nothing) is
    pinned by tests/test_streaming.py::
    test_stream_score_calibration_equals_batch; this dual lets DuckDB
    value-verify the windowing + scoring algebra exactly
    (epoch-aligned F.window ≡ time_bucket)."""
    from gcp_etl_spark.streaming.windows import score_calibration_windows

    return score_calibration_windows(t(spark, sf_dir, "events"))


# --------------------------------- partition-pruned IVF index probe


@query(
    "ann_ivf_partitioned_probe",
    # rows-only by design (kmeans centroid assignment is not
    # SQL-expressible); pinned by tests/test_r6.py::
    # test_ivf_partitioned_probe_prunes_and_matches — partition
    # pruning asserted IN THE PLAN and results proven equal to the
    # unpartitioned IVF path.
    oracle=None,
    tags=("llm", "ann", "ivf", "io", "partition-pruning"),
)
def ann_ivf_partitioned_probe(spark, sf_dir):
    """IVF index PERSISTENCE + partition-pruned probing — the 100 TB
    serving layout executed for real, not just claimed: the assigned
    corpus is WRITTEN ``partitionBy(centroid_id)``, and a probe reads
    back ONLY the inverted-list directories its queries hash to
    (static partition pruning at the parquet scan: nprobe/n_centroids
    of the index bytes are touched, the rest never leave disk).

    Scale: the index write is one shuffle-free partitioned sink; the
    probe list is |centroids|-bounded (collected from an 8-row
    distinct); scoring is broadcast queries × pruned scan, top-k per
    query via window."""
    # the build / probe / prune / score stages are the shared serving
    # operators in streaming/ann_stream.py, so this batch query, the
    # r7 stream_ann_probe dual, and the foreachBatch sink are the same
    # algebra by construction
    from gcp_etl_spark.scratch import scratch_dir
    from gcp_etl_spark.streaming.ann_stream import (
        build_partitioned_index,
        probe_relation,
        probe_topk,
        prune_index,
    )

    emb = t(spark, sf_dir, "embeddings")
    idx, centers = build_partitioned_index(
        emb, scratch_dir("ivf_idx"), n_centroids=8
    )
    q = probe_relation(
        emb.filter(F.col("vec_id") % 50 == 0), centers, nprobe=2
    )
    return probe_topk(prune_index(idx, q), q, k=5)


# ------------------------------------------- corpus snapshot diff


@query(
    "corpus_snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT doc_id, md5(text) AS fp FROM documents
    ), v2 AS (
      -- simulated next snapshot: every 10th doc dropped, every 7th
      -- (surviving) doc re-crawled with changed content, the rest
      -- byte-identical — both engines derive v2 from the same rule
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN md5('recrawled:' || text)
                  ELSE md5(text) END AS fp
      FROM documents WHERE doc_id % 10 <> 0
    )
    SELECT CASE
             WHEN v1.doc_id IS NULL THEN 'added'
             WHEN v2.doc_id IS NULL THEN 'removed'
             WHEN v1.fp <> v2.fp THEN 'modified'
             ELSE 'unchanged'
           END AS change,
           count(*) AS n_docs,
           CAST(min(COALESCE(v1.doc_id, v2.doc_id)) AS BIGINT)
             AS min_doc_id,
           CAST(max(COALESCE(v1.doc_id, v2.doc_id)) AS BIGINT)
             AS max_doc_id
    FROM v1 FULL OUTER JOIN v2 USING (doc_id)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("llm", "versioning", "dedup", "incremental"),
)
def corpus_snapshot_diff(spark, sf_dir):
    """CORPUS SNAPSHOT DIFF — the incremental-ingestion audit every
    versioned training corpus runs between crawls: full-outer join of
    two snapshots on doc_id, classify each doc added / removed /
    modified (content fingerprint changed) / unchanged, and report
    per-class counts. The second snapshot is simulated from the same
    deterministic rule on both engines (every 10th doc dropped, every
    7th survivor re-crawled).

    Scale: only (doc_id, 32-byte fingerprint) ever shuffles — text is
    fingerprinted in the scan stage and dropped; the full-outer join
    is one co-partitioned shuffle on doc_id; the classification is a
    4-group hash agg. At 100 TB both snapshots would be bucketed by
    doc_id and the join becomes shuffle-free."""
    d = t(spark, sf_dir, "documents")
    v1 = d.select("doc_id", F.md5("text").alias("fp"))
    v2 = d.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.md5(F.concat(F.lit("recrawled:"), F.col("text"))),
        )
        .otherwise(F.md5("text"))
        .alias("fp"),
    )
    j = v1.withColumnRenamed("fp", "fp1").join(
        v2.withColumnRenamed("fp", "fp2"), "doc_id", "full_outer"
    )
    change = (
        F.when(F.col("fp1").isNull(), "added")
        .when(F.col("fp2").isNull(), "removed")
        .when(F.col("fp1") != F.col("fp2"), "modified")
        .otherwise("unchanged")
    )
    return (
        j.select("doc_id", change.alias("change"))
        .groupBy("change")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
        .orderBy("change")
    )


# --------------------------------------------- output shard planner

_SHARDS = 64


@query(
    "corpus_shard_plan",
    oracle=f"""
    WITH s AS (
      SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) AS BIGINT) % {_SHARDS} AS shard,
             n_chars
      FROM documents
    ), tot AS (SELECT count(*) AS n FROM documents)
    SELECT shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           round(count(*) * 1.0 * {_SHARDS} / (SELECT n FROM tot), 4)
             AS balance_ratio
    FROM s GROUP BY shard ORDER BY shard
    """,
    tags=("llm", "sharding", "io-planning"),
)
def corpus_shard_plan(spark, sf_dir):
    """OUTPUT SHARD PLAN for tokenizer/training-data export: assign
    every doc to one of 64 shards by content-independent id hash
    (md5 — stable across re-crawls, unlike hash(text)) and report
    per-shard doc count, byte mass, largest doc, and balance ratio
    (shard share × shards; 1.0 = perfectly even). The skew audit run
    BEFORE a 100 TB export burns cluster-days writing hot shards.

    Scale: one map (hash) + one 64-group hash agg; the payload
    column never moves — only (shard, n_chars) pairs shuffle as
    map-side partials."""
    d = t(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % _SHARDS
    )
    tot = d.agg(F.count("*").alias("n"))
    return (
        d.select(shard.alias("shard"), "n_chars")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "total_chars",
            "max_chars",
            F.round(
                F.col("n_docs") * 1.0 * _SHARDS / F.col("n"), 4
            ).alias("balance_ratio"),
        )
        .orderBy("shard")
    )


# ------------------------------------------ fill-in-middle transform


@query(
    "prep_fim_transform",
    oracle="""
    WITH spans AS (
      SELECT doc_id,
             length(text) AS n,
             CAST(floor(length(text) / 3) AS BIGINT) AS cut1,
             CAST(floor(length(text) * 2 / 3) AS BIGINT) AS cut2
      FROM documents
    ), parts AS (
      SELECT s.doc_id, s.n, s.cut1, s.cut2,
             substr(d.text, 1, CAST(s.cut1 AS INT)) AS prefix,
             substr(d.text, CAST(s.cut1 AS INT) + 1,
                    CAST(s.cut2 - s.cut1 AS INT)) AS middle,
             substr(d.text, CAST(s.cut2 AS INT) + 1) AS suffix
      FROM spans s JOIN documents d USING (doc_id)
    )
    SELECT doc_id,
           CAST(length(prefix) AS BIGINT) AS n_prefix,
           CAST(length(middle) AS BIGINT) AS n_middle,
           CAST(length(suffix) AS BIGINT) AS n_suffix,
           md5('<PRE>' || prefix || '<SUF>' || suffix
               || '<MID>' || middle) AS fim_fp,
           (prefix || middle || suffix = (SELECT text FROM documents x
                                          WHERE x.doc_id = parts.doc_id))
             AS roundtrip_ok
    FROM parts
    """,
    tags=("llm", "prep", "fim", "text"),
)
def prep_fim_transform(spark, sf_dir):
    """FILL-IN-THE-MIDDLE transform (Bavarian et al. 2022, public) —
    the code-LLM prep step that teaches infilling: split each document
    into prefix / middle / suffix at the 1/3 and 2/3 CHARACTER
    boundaries and re-serialize in PSM order with sentinel markers.
    Output carries the span lengths, the md5 of the PSM serialization
    (both engines build the identical string), and a lossless
    round-trip check (prefix||middle||suffix == original).

    Character (not byte) offsets on both engines, so multibyte text
    (the zh slice) splits identically. Scale: a pure map — three
    substrings + one hash per row, fused into the scan stage; no
    shuffle at all."""
    d = t(spark, sf_dir, "documents")
    n = F.length("text")
    cut1 = F.floor(n / 3).cast("long")
    cut2 = F.floor(n * 2 / 3).cast("long")
    parts = d.select(
        "doc_id",
        "text",
        F.expr("substr(text, 1, CAST(floor(length(text) / 3) AS INT))")
        .alias("prefix"),
        F.expr(
            "substr(text, CAST(floor(length(text) / 3) AS INT) + 1,"
            " CAST(floor(length(text) * 2 / 3)"
            " - floor(length(text) / 3) AS INT))"
        ).alias("middle"),
        F.expr(
            "substr(text, CAST(floor(length(text) * 2 / 3) AS INT) + 1)"
        ).alias("suffix"),
    )
    return parts.select(
        "doc_id",
        F.length("prefix").cast("long").alias("n_prefix"),
        F.length("middle").cast("long").alias("n_middle"),
        F.length("suffix").cast("long").alias("n_suffix"),
        F.md5(
            F.concat(
                F.lit("<PRE>"), F.col("prefix"),
                F.lit("<SUF>"), F.col("suffix"),
                F.lit("<MID>"), F.col("middle"),
            )
        ).alias("fim_fp"),
        (
            F.concat("prefix", "middle", "suffix") == F.col("text")
        ).alias("roundtrip_ok"),
    )


# ------------------------------------------- audio resample (codec)


@query(
    "multimodal_audio_resample",
    # decimate-by-2 resample of the REAL PCM WAV payloads: kept
    # samples are the even indices of the generator formula
    # sample[i] = ((37*id + 13i) % 4096) - 2048, so the oracle
    # recomputes the decimated signal exactly; the Spark side goes
    # decode -> decimate -> RE-ENCODE (rate/2 WAV) -> decode, so a
    # hash match proves the full resample transcode round-trip
    oracle="""
    WITH ids AS (SELECT 2 * i + 1 AS media_id FROM generate_series(0, 31) t(i)),
    s AS (
      SELECT ids.media_id,
             ((37 * ids.media_id + 13 * (2 * g.i)) % 4096) - 2048 AS amp
      FROM ids, generate_series(0, 1023) g(i)
    )
    SELECT media_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(4000 AS BIGINT) AS rate_out,
           CAST(sum(amp) AS BIGINT) AS amp_sum,
           CAST(min(amp) AS BIGINT) AS amp_min,
           CAST(max(amp) AS BIGINT) AS amp_max
    FROM s GROUP BY media_id
    """,
    tags=("llm", "multimodal", "codec", "audio"),
)
def multimodal_audio_resample(spark, sf_dir):
    """REAL audio RESAMPLE (decimate-by-2, 8 kHz → 4 kHz), verified
    through a full transcode round-trip: decode each RIFF/WAV payload
    (stdlib ``wave``) inside mapInPandas, keep every 2nd sample,
    re-encode a valid 4 kHz WAV, decode THAT, and aggregate the int16
    amplitudes — the oracle recomputes the decimated generator signal.
    The audio-prep primitive for sample-rate normalization before
    feature extraction (speech corpora ship at mixed rates).

    Scale: decode/transcode stays inside the task (mapInPandas);
    only 6 aggregate numbers per clip leave it."""
    from collections.abc import Iterator

    import pandas as pd

    from gcp_etl_spark.llm import codecs
    from gcp_etl_spark.llm.multimodal import synthesize_codec_media

    media = synthesize_codec_media(spark, n=64).filter(
        F.col("mime") == "audio/wav"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "n_samples": [], "rate_out": [],
                "amp_sum": [], "amp_min": [], "amp_max": [],
            }
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples, rate = codecs.wav_decode(bytes(b))
                except Exception:  # noqa: BLE001 - undecodable: no row
                    continue
                down = samples[::2]
                re_encoded = codecs.wav_encode(down, rate=rate // 2)
                back, rate2 = codecs.wav_decode(re_encoded)
                out["media_id"].append(int(mid))
                out["n_samples"].append(len(back))
                out["rate_out"].append(int(rate2))
                out["amp_sum"].append(int(back.astype("int64").sum()))
                out["amp_min"].append(int(back.min()))
                out["amp_max"].append(int(back.max()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches,
        "media_id long, n_samples long, rate_out long, "
        "amp_sum long, amp_min long, amp_max long",
    )


# ------------------------------------------ mixed-language detector


@query(
    "text_mixed_language_flag",
    oracle="""
    WITH halves AS (
      SELECT doc_id, lang,
             substr(text, 1, CAST(floor(length(text) / 2) AS INT)) AS h1,
             substr(text, CAST(floor(length(text) / 2) AS INT) + 1) AS h2
      FROM documents WHERE length(text) >= 2
    ), scored AS (
      SELECT doc_id, lang,
             length(regexp_replace(h1, '[ -~]', '', 'g')) * 1.0
               / length(h1) AS r1,
             length(regexp_replace(h2, '[ -~]', '', 'g')) * 1.0
               / length(h2) AS r2
      FROM halves
    )
    SELECT doc_id, lang,
           round(r1, 4) AS nonascii_head,
           round(r2, 4) AS nonascii_tail,
           (abs(r1 - r2) > 0.3) AS is_mixed
    FROM scored
    """,
    tags=("llm", "text", "langid", "quality"),
)
def text_mixed_language_flag(spark, sf_dir):
    """MIXED-LANGUAGE / mid-document script-switch detector: compare
    the non-ASCII character ratio of each document's head half vs tail
    half — a large gap means the document switches script mid-way
    (concatenated crawl pages, bilingual boilerplate), which poisons
    both language-ID routing and language-balanced sampling. The
    script-ratio signal is the same one the langid heuristic family
    uses, applied per-half.

    Scale: pure map (two substrings + two regex strips per row, fused
    into the scan); no shuffle."""
    d = t(spark, sf_dir, "documents").filter(F.length("text") >= 2)
    h1 = F.expr(
        "substr(text, 1, CAST(floor(length(text) / 2) AS INT))"
    )
    h2 = F.expr(
        "substr(text, CAST(floor(length(text) / 2) AS INT) + 1)"
    )
    r1 = (
        F.length(F.regexp_replace(h1, "[ -~]", "")) * 1.0 / F.length(h1)
    )
    r2 = (
        F.length(F.regexp_replace(h2, "[ -~]", "")) * 1.0 / F.length(h2)
    )
    return d.select(
        "doc_id",
        "lang",
        F.round(r1, 4).alias("nonascii_head"),
        F.round(r2, 4).alias("nonascii_tail"),
        (F.abs(r1 - r2) > 0.3).alias("is_mixed"),
    )


# ------------------------------------- BPE vocabulary + round-trip


def _bpe_vocab(spark, sf_dir):
    """(token, id, merge_rank, is_base) — the exported tokenizer
    vocabulary: corpus base characters (ids 0..n_base-1 in character
    order) followed by the merge-table outputs (id = n_base + rank).
    The base-id row_number window is unpartitioned but ALPHABET-
    bounded (distinct characters of the corpus — ≤ Unicode, ~24 here),
    the one case where a global window is scale-safe by construction."""
    from pyspark.sql import Window

    from gcp_etl_spark.functions.bpe import DEFAULT_MERGES
    from gcp_etl_spark.functions.text import normalize_text

    d = t(spark, sf_dir, "documents")
    chars = (
        d.select(
            F.explode(
                F.split(
                    F.regexp_replace(normalize_text(F.col("text")), " ", ""),
                    "",
                )
            ).alias("token")
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    base = chars.select(
        "token",
        (F.row_number().over(Window.orderBy("token")) - 1)
        .cast("long")
        .alias("id"),
        F.lit(-1).cast("long").alias("merge_rank"),
        F.lit(True).alias("is_base"),
    )
    n_base = chars.agg(F.count("*").alias("__nb"))
    merges = spark.createDataFrame(
        [(x + y, i) for i, (x, y) in enumerate(DEFAULT_MERGES)],
        "token string, merge_rank long",
    )
    merged = (
        merges.crossJoin(F.broadcast(n_base))
        .select(
            "token",
            (F.col("__nb") + F.col("merge_rank")).cast("long").alias("id"),
            "merge_rank",
            F.lit(False).alias("is_base"),
        )
    )
    return base.unionByName(merged)


@query(
    "bpe_vocab_export",
    oracle=f"""
    WITH chars AS (
      SELECT DISTINCT unnest(string_split(regexp_replace(
               regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
               ' ', '', 'g'), '')) AS token
      FROM documents
    ), base AS (
      SELECT token,
             CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS id,
             CAST(-1 AS BIGINT) AS merge_rank, true AS is_base
      FROM chars WHERE token <> ''
    )
    SELECT token, id, merge_rank, is_base FROM base
    UNION ALL
    SELECT m.x || m.y AS token,
           (SELECT count(*) FROM base) + m.rank AS id,
           CAST(m.rank AS BIGINT) AS merge_rank, false AS is_base
    FROM {_merges_sql()}
    ORDER BY id
    """,
    tags=("llm", "tokenizer", "bpe"),
)
def bpe_vocab_export(spark, sf_dir):
    """TOKENIZER VOCABULARY EXPORT — the (token, id, merge_rank,
    is_base) relation every serving system needs next to the merge
    table: base characters first (ids in character order), merge
    outputs after (id = n_base + rank). With this relation BPE
    encode/decode compose into an exact identity
    (bpe_roundtrip_identity).

    Scale: the base alphabet is a DISTINCT over corpus characters
    (map-side-combinable, alphabet-bounded result); the merge table is
    a shipped literal. Output is vocabulary-sized — nothing
    corpus-sized shuffles."""
    return _bpe_vocab(spark, sf_dir).orderBy("id")


@query(
    "bpe_roundtrip_identity",
    oracle=f"""
    WITH RECURSIVE words AS (
      SELECT DISTINCT w FROM (
        SELECT unnest(string_split(regexp_replace(trim(lower(text)),
               '\\s+', ' ', 'g'), ' ')) AS w
        FROM documents
      ) WHERE w <> ''
    ), enc AS (
      SELECT w, string_split(w, '') AS syms, 0 AS step FROM words
      UNION ALL
      SELECT w,
             syms[1:mi-1] || [syms[mi] || syms[mi+1]] || syms[mi+2:],
             step + 1
      FROM (
        SELECT e.w AS w, e.syms AS syms, e.step AS step,
               min_by(CAST(t.i AS INT), m.rank * 1000000 + t.i) AS mi
        FROM enc e,
             unnest(range(1, len(e.syms))) t(i)
             JOIN {_merges_sql()}
               ON e.syms[t.i] = m.x AND e.syms[t.i + 1] = m.y
        GROUP BY e.w, e.syms, e.step
      )
    ), final AS (
      SELECT w, syms FROM enc
      QUALIFY row_number() OVER (PARTITION BY w ORDER BY step DESC) = 1
    )
    SELECT w, CAST(len(syms) AS BIGINT) AS n_tokens,
           (array_to_string(syms, '') = w) AS roundtrip_ok
    FROM final ORDER BY w
    """,
    tags=("llm", "tokenizer", "bpe"),
)
def bpe_roundtrip_identity(spark, sf_dir):
    """BPE ROUND-TRIP IDENTITY — encode each distinct corpus word,
    map every token to its id through the exported vocabulary
    (bpe_vocab_export), decode the id sequence back through the same
    relation, and assert decode(encode(w)) == w. An inner join does
    the id mapping, so a single token missing from the export (or an
    id collision) breaks the reconstruction and flips roundtrip_ok —
    this is the integrity gate that encode, decode, and the exported
    vocab all agree.

    The DuckDB oracle independently replays the merge recurrence
    (recursive CTE, min_by (rank, position) per step) for n_tokens
    and asserts the concatenation identity on its own side.

    Scale: the fold runs once per DISTINCT word (vocab ~ corpus^0.5);
    the only shuffle is the per-word (pos, token) regroup — corpus
    text never shuffles."""
    from gcp_etl_spark.functions.bpe import decode_tokens, encode_tokens_pos
    from gcp_etl_spark.functions.text import normalize_text

    d = t(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(
                F.split(normalize_text(F.col("text")), " ")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    vocab = _bpe_vocab(spark, sf_dir).select("token", "id")
    tok = encode_tokens_pos(words)
    ids = tok.join(F.broadcast(vocab), "token").select("w", "pos", "id")
    dec = decode_tokens(ids, vocab)
    return dec.select(
        "w",
        "n_tokens",
        (F.col("decoded") == F.col("w")).alias("roundtrip_ok"),
    ).orderBy("w")


# ------------------------------- streaming latency-quantile monitor


@query(
    "stream_latency_quantiles",
    # percentile_approx run in its EXACT regime (accuracy >= rows per
    # window) == nearest-rank quantile_disc — the agg_approx_quantile
    # policy; the approximate regime is tolerance-asserted in
    # tests/test_streaming.py alongside the equality test
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts) AS w_start,
           quantile_disc(value, 0.5)  AS p50_latency,
           quantile_disc(value, 0.95) AS p95_latency,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("streaming", "window", "approx", "events"),
)
def stream_latency_quantiles(spark, sf_dir):
    """STREAMING WINDOWED QUANTILES dual — p50/p95 of events.value per
    daily tumbling window via percentile_approx, the canonical
    always-on latency monitor next to stream_psi_drift. The GK sketch
    is a mergeable aggregation buffer, so the quantile runs INSIDE the
    watermarked streaming groupBy (state = one fixed-size sketch per
    in-watermark window); streaming-vs-batch equality is asserted in
    tests/test_streaming.py::test_stream_latency_quantiles_equals_batch.

    Here the batch dual runs at accuracy >= window row count, where
    GK provably collapses to exact nearest-rank — value-checked
    against DuckDB quantile_disc."""
    from gcp_etl_spark.streaming.windows import latency_quantiles_windowed

    e = t(spark, sf_dir, "events")
    return latency_quantiles_windowed(e).orderBy("w_start")


# --------------------------------- streaming incremental minhash dedup


@query("stream_dedup_minhash", oracle=None, tags=("streaming", "llm", "dedup", "lsh"))
def stream_dedup_minhash(spark, sf_dir):
    """STREAMING MINHASH DEDUP dual — the dedup family's streaming
    member (r5 VERDICT ask #5): each arriving micro-batch is deduped
    against the accumulated corpus through a persistent signature +
    bucket store (streaming/dedup_stream.py, foreachBatch, epoch-
    partitioned parquet state, replay-idempotent). This registered
    batch dual is llm/dedup.py::minhash_estimate_pairs — LSH banded
    candidates scored by signature-estimated Jaccard — which the
    streamed union of per-epoch pair sets equals EXACTLY for any
    batching (tests/test_streaming.py::
    test_stream_dedup_minhash_equals_batch; replay idempotence in
    test_stream_dedup_minhash_replay_idempotent).

    No SQL oracle by design (LSH banding + MD5-seeded permutations are
    not reasonably SQL-replicable — same policy as dedup_minhash);
    correctness is pinned by the streaming-equality + replay pytests
    and the family's recall tests.

    100 TB: per-epoch cost is O(|batch| + matched buckets); corpus
    text is hashed once at arrival, after which only 512 B signatures
    and 24 B bucket rows participate. Scoring payload is fixed-width —
    document size never rides a shuffle."""
    from gcp_etl_spark.llm.dedup import minhash_estimate_pairs

    d = t(spark, sf_dir, "documents")
    # one-shot query shape: lazy plan, no eager materialization pass,
    # signature blocks ContextCleaner-freed when the plan is dropped
    return minhash_estimate_pairs(
        d, id_col="doc_id", text_col="text", threshold=0.7,
        materialize=False,
    ).orderBy("id_a", "id_b")


# ------------------------------------------- weighted reservoir sample

_ES_K = 50


@query(
    "sample_weighted_reservoir",
    oracle=f"""
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS weight,
           round(
             ln(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS UBIGINT) / 4294967296.0) / n_chars, 9
           ) AS es_key
    FROM documents
    ORDER BY es_key DESC, doc_id
    LIMIT {_ES_K}
    """,
    tags=("llm", "sampling", "prep"),
)
def sample_weighted_reservoir(spark, sf_dir):
    """WEIGHTED reservoir sample without replacement (Efraimidis &
    Spirakis 2006, public): each row gets key u^(1/w) for a uniform u
    and weight w (here n_chars — longer docs proportionally likelier);
    the k largest keys ARE a weighted sample without replacement. We
    rank by the monotone-equivalent ln(u)/w (descending), which avoids
    pow() and keeps both engines on a single libm call.

    Determinism: u is the md5-hash uniform (first 8 hex digits /
    2^32) — the engine's standard seeded-draw construction (same as
    DSIR's bucket hash and the bootstrap's Poisson draw), identical
    integer arithmetic in both engines; ln of the same double divided
    by the same integer is bit-stable across libm implementations at
    the 9 dp contract.

    Scale: the canonical ONE-PASS distributed sample — orderBy+limit
    compiles to TakeOrderedAndProject (per-partition top-k, driver
    merges k·partitions rows); no shuffle ever carries the corpus, no
    per-row state beyond the k-row heap. This is how you draw a
    quality-weighted training subset from 100 TB without a sort."""
    d = t(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long") / F.lit(4294967296.0)
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            F.round(F.log(u) / F.col("n_chars"), 9).alias("es_key"),
        )
        .orderBy(F.desc("es_key"), "doc_id")
        .limit(_ES_K)
    )


# ---------------------------------------------------- Cohen's kappa


@query(
    "stats_cohens_kappa",
    oracle="""
    WITH flags AS (
      SELECT o.o_orderkey,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ra,
             CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS rb
      FROM orders o
      LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem
                 WHERE l_returnflag = 'R') r
        ON r.l_orderkey = o.o_orderkey
    ),
    c AS (
      SELECT count(*) AS n,
             sum(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS n11,
             sum(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END) AS n00,
             sum(ra) AS na1, sum(rb) AS nb1
      FROM flags
    )
    SELECT CAST(n AS BIGINT) AS n_items,
           round((n11 + n00) / CAST(n AS DOUBLE), 6) AS po,
           round((na1 * nb1 + (n - na1) * (n - nb1))
                 / CAST(n AS DOUBLE) / n, 6) AS pe,
           round(((n11 + n00) / CAST(n AS DOUBLE)
                  - (na1 * nb1 + (n - na1) * (n - nb1))
                    / CAST(n AS DOUBLE) / n)
                 / (1 - (na1 * nb1 + (n - na1) * (n - nb1))
                        / CAST(n AS DOUBLE) / n), 6) AS kappa
    FROM c
    """,
    tags=("stats", "agreement", "classification"),
)
def stats_cohens_kappa(spark, sf_dir):
    """COHEN'S KAPPA — chance-corrected agreement between two binary
    "raters" over the same items: here, per order, rater A says
    "finished" (o_orderstatus = 'F') and rater B says "has a returned
    line" (any lineitem with l_returnflag = 'R'). kappa = (po - pe) /
    (1 - pe) with po the observed agreement and pe the agreement
    expected from the raters' marginals. The standard label-quality /
    annotator-consistency gate before training on labeled data.

    Determinism: all four cell counts are exact longs; po/pe/kappa are
    a fixed expression tree over those longs — identical doubles in
    both engines, rounded 6 dp.

    Scale: rater B is a map-side-combinable DISTINCT on the filtered
    lineitem (returned orderkeys only), one equi-join on the orders
    key, then a single 4-cell aggregate — the 2x2 confusion matrix is
    the only thing that leaves the executors."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
        .withColumn("rb", F.lit(1))
    )
    flags = o.join(
        returned, o.o_orderkey == returned.l_orderkey, "left"
    ).select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("ra"),
        F.coalesce(F.col("rb"), F.lit(0)).alias("rb"),
    )
    c = flags.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when((F.col("ra") == 1) & (F.col("rb") == 1), 1).otherwise(0)
        ).alias("n11"),
        F.sum(
            F.when((F.col("ra") == 0) & (F.col("rb") == 0), 1).otherwise(0)
        ).alias("n00"),
        F.sum("ra").alias("na1"),
        F.sum("rb").alias("nb1"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) / n
    pe = (
        F.col("na1") * F.col("nb1")
        + (F.col("n") - F.col("na1")) * (F.col("n") - F.col("nb1"))
    ) / n / F.col("n")
    return c.select(
        F.col("n").cast("long").alias("n_items"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (F.lit(1) - pe), 6).alias("kappa"),
    )


# ------------------------------------------ leakage-free group split

_SPLIT_TRAIN = 0.8
_SPLIT_VAL = 0.9


@query(
    "prep_leakage_split",
    oracle=f"""
    WITH RECURSIVE w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    sh AS (SELECT DISTINCT doc_id,
                  ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS g
           FROM w, unnest(range(len(ws)-2)) AS t(i)),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(n, m) AS (
      SELECT u, u FROM edges
      UNION
      SELECT r.n, e.v FROM reach r JOIN edges e ON r.m = e.u
    ),
    lab AS (SELECT n AS node, min(m) AS comp FROM reach GROUP BY n),
    grouped AS (
      SELECT d.doc_id, COALESCE(lab.comp, d.doc_id) AS grp
      FROM documents d LEFT JOIN lab ON lab.node = d.doc_id
    ),
    assigned AS (
      SELECT doc_id, grp,
             CAST(('0x' || substr(md5(CAST(grp AS VARCHAR)), 1, 8))
                  AS UBIGINT) / 4294967296.0 AS u
      FROM grouped
    )
    SELECT CASE WHEN u < {_SPLIT_TRAIN} THEN 'train'
                WHEN u < {_SPLIT_VAL} THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM assigned
    GROUP BY 1 ORDER BY 1
    """,
    tags=("llm", "prep", "split", "dedup", "cluster"),
)
def prep_leakage_split(spark, sf_dir):
    """LEAKAGE-FREE train/val/test split: near-duplicate documents must
    never straddle a split boundary (a val doc with a train near-dup
    inflates eval — the contamination mode decontamination can't
    catch because it's WITHIN the corpus). Groups = connected
    components over the exact trigram-Jaccard >= 0.5 edges (the
    survivorship graph); singletons are their own group. Each GROUP —
    not each doc — draws one md5-hash uniform and lands wholly in
    train (<0.8), val (<0.9) or test. Returned relation: per-split
    group and doc counts (the assignment itself is (doc_id, split) —
    aggregate kept small for the gate; every member of a group shares
    its split by construction).

    Determinism: the group id is the component min-label (exact), the
    draw is the engine-standard md5 uniform on the group id — same
    integer arithmetic both engines.

    Scale: edges come from the df-capped postings join, components
    from the distributed min-label loop (both scale-proven members of
    the dedup family); the split draw is one hash per GROUP and the
    output is 3 rows. No stage sees the corpus text after shingling."""
    from gcp_etl_spark.llm.cluster import connected_components
    from gcp_etl_spark.queries.llm_ops import _ngram_jaccard_pairs

    pairs = _ngram_jaccard_pairs(spark, sf_dir, df_cap=None)
    cc = connected_components(pairs, src="id_a", dst="id_b")
    d = t(spark, sf_dir, "documents").select("doc_id")
    grouped = d.join(cc, d.doc_id == cc.node, "left").select(
        "doc_id", F.coalesce(F.col("comp"), F.col("doc_id")).alias("grp")
    )
    u = F.conv(
        F.substring(F.md5(F.col("grp").cast("string")), 1, 8), 16, 10
    ).cast("long") / F.lit(4294967296.0)
    assigned = grouped.withColumn(
        "split",
        F.when(u < _SPLIT_TRAIN, "train")
        .when(u < _SPLIT_VAL, "val")
        .otherwise("test"),
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.countDistinct("grp").alias("n_groups"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("split")
    )


# ------------------------------------------------- DP-noised counts

_DP_EPSILON = 1.0


@query(
    "agg_dp_noisy_counts",
    oracle=f"""
    WITH c AS (
      SELECT source, count(*) AS cnt FROM documents GROUP BY source
    ),
    u AS (
      SELECT source, cnt,
             CAST(('0x' || substr(md5(source), 1, 8)) AS UBIGINT)
               / 4294967296.0 - 0.5 AS s
      FROM c
    )
    SELECT source,
           CAST(cnt AS BIGINT) AS true_count,
           round(cnt - sign(s) * ln(1 - 2 * abs(s)) / {_DP_EPSILON}, 4)
             AS noisy_count
    FROM u ORDER BY source
    """,
    tags=("privacy", "aggregate", "dp"),
)
def agg_dp_noisy_counts(spark, sf_dir):
    """LAPLACE-MECHANISM count release (epsilon = 1, sensitivity 1 for
    a per-source count): noisy = count + Lap(1/eps), with the Laplace
    draw materialized by inverse CDF — noise = -sign(u - 0.5) *
    ln(1 - 2|u - 0.5|) / eps over a uniform u. The aggregate a
    data-clearing pipeline publishes instead of raw per-source counts.

    HONESTY NOTE: the uniform here is the engine's DETERMINISTIC md5
    hash draw (so the relation is testable and replay-stable); a real
    DP release must use fresh cryptographic randomness — this query
    demonstrates the sensitivity/epsilon algebra and the exact
    inverse-CDF transform, not a privacy guarantee. true_count is
    returned alongside for the correctness gate; a production release
    would drop it.

    Scale: one map-side-combinable count per source; the noise term is
    one hash + one log on the |sources|-row aggregate. Nothing else
    moves."""
    d = t(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count("*").alias("cnt"))
    s = (
        F.conv(F.substring(F.md5("source"), 1, 8), 16, 10).cast("long")
        / F.lit(4294967296.0)
        - 0.5
    )
    return c.select(
        "source",
        F.col("cnt").cast("long").alias("true_count"),
        F.round(
            F.col("cnt")
            - F.signum(s) * F.log(F.lit(1) - 2 * F.abs(s)) / _DP_EPSILON,
            4,
        ).alias("noisy_count"),
    ).orderBy("source")


# -------------------------------------------- global training order

_ORDER_SHARDS = 8


@query(
    "prep_training_order",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents
    ),
    rn AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY hx, doc_id) - 1 AS r
      FROM h
    )
    SELECT doc_id,
           CAST(r % {_ORDER_SHARDS} AS BIGINT) AS shard,
           CAST(r // {_ORDER_SHARDS} AS BIGINT) AS pos
    FROM rn ORDER BY shard, pos
    """,
    tags=("llm", "prep", "ordering"),
)
def prep_training_order(spark, sf_dir):
    """DETERMINISTIC GLOBAL SHUFFLE for training order: every epoch-0
    data loader wants the corpus in a seeded random permutation,
    striped across shards so concurrent readers never overlap. Order =
    md5(doc_id) (a keyed permutation — change the key, change the
    epoch), rank = the engine's two-pass range-partitioned global row
    number (operators/quantiles.global_row_number — NO single-
    partition window), shard/pos = round-robin stripe of the rank.

    Determinism: md5 hex strings compare identically in both engines;
    doc_id tiebreak makes the permutation total.

    Scale: the rank is the zipWithIndex algebra — one range exchange
    on the hash + per-partition offsets — and the stripe arithmetic is
    a map. This is exactly how you materialize a shuffled 100 TB
    training manifest without ever sorting into one reducer."""
    from gcp_etl_spark.operators.quantiles import global_row_number

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("hx")
    )
    rn = global_row_number(d, order_cols=["hx", "doc_id"], rn_col="rn")
    return (
        rn.select(
            "doc_id",
            ((F.col("rn") - 1) % _ORDER_SHARDS).cast("long").alias("shard"),
            ((F.col("rn") - 1) / _ORDER_SHARDS).cast("long").alias("pos"),
        )
        .orderBy("shard", "pos")
    )


# --------------------------------------------- bitext margin mining

_BT_K = 4
_BT_MARGIN = 1.0


def _bitext_pair_stage(spark, sf_dir):
    """The PRE-BARRIER bitext pair relation: broadcast(tgt) x streamed
    src, 6-dp cosine per cross pair. Shared by ``mine_bitext_margin``
    and the broadcast-shape assertion in
    tests/test_scale_strategies.py (r12 ADVICE: the test's hand-built
    copy of this subtree could silently drift from the query — if the
    query ever dropped the F.broadcast hint, the test's own copy would
    still pass)."""
    from gcp_etl_spark.llm.similarity import cosine

    e = t(spark, sf_dir, "embeddings")
    s = e.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("sid"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    tt = e.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("tid"),
        F.col("embedding").cast("array<double>").alias("w"),
    )
    return s.crossJoin(F.broadcast(tt)).select(
        "sid",
        "tid",
        F.round(cosine(F.col("v"), F.col("w")), 6).alias("cos"),
    )


@query(
    "mine_bitext_margin",
    oracle=f"""
    WITH s AS (
      SELECT vec_id AS sid, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE label = 0
    ),
    tt AS (
      SELECT vec_id AS tid, CAST(embedding AS DOUBLE[]) AS w
      FROM embeddings WHERE label = 1
    ),
    p AS (
      SELECT sid, tid,
             round(list_dot_product(v, w)
                   / (sqrt(list_dot_product(v, v))
                      * sqrt(list_dot_product(w, w))), 6) AS cos
      FROM s CROSS JOIN tt
    ),
    ks AS (
      SELECT sid, avg(cos) AS knn FROM (
        SELECT sid, cos, row_number() OVER (
          PARTITION BY sid ORDER BY cos DESC, tid) AS rn FROM p
      ) WHERE rn <= {_BT_K} GROUP BY sid
    ),
    kt AS (
      SELECT tid, avg(cos) AS knn FROM (
        SELECT tid, cos, row_number() OVER (
          PARTITION BY tid ORDER BY cos DESC, sid) AS rn FROM p
      ) WHERE rn <= {_BT_K} GROUP BY tid
    ),
    m AS (
      SELECT p.sid, p.tid, p.cos,
             p.cos / ((ks.knn + kt.knn) / 2) AS margin
      FROM p JOIN ks USING (sid) JOIN kt USING (tid)
    ),
    best AS (
      SELECT sid, tid, cos, margin, row_number() OVER (
        PARTITION BY sid ORDER BY margin DESC, tid) AS rn
      FROM m
    )
    SELECT sid, tid, cos, round(margin, 6) AS margin
    FROM best WHERE rn = 1 AND margin >= {_BT_MARGIN}
    ORDER BY sid
    """,
    tags=("llm", "embedding", "mining", "bitext"),
)
def mine_bitext_margin(spark, sf_dir):
    """MARGIN-BASED BITEXT MINING (Artetxe & Schwenk 2019, the LASER /
    CCMatrix parallel-corpus miner, public): across two embedding
    spaces (here label 0 = "source language", label 1 = "target"),
    score every cross pair by the RATIO margin — cos(x, y) divided by
    the mean of the two endpoints' average top-k neighbor cosines —
    and keep each source's best-margin target when the margin clears
    1.0. Raw cosine over-selects hubs (vectors close to everything);
    the margin normalizes by local density, which is why every public
    mined-bitext pipeline uses it.

    Determinism: cosine is rounded to 6 dp FIRST (both engines then
    window/avg/divide identical doubles); ties break on neighbor id.

    Scale: the pair relation is broadcast(tgt) x streamed src — at
    100 TB the same margin algebra rides the ANN candidate stream
    (IVF/LSH shortlists) instead of the dense cross join; the k-NN
    means are |src|- and |tgt|-bounded window aggregates."""
    # lazy barrier (r12 resume, guide §1.2): p — the cross join
    # evaluating the interpreted higher-order cosine per pair — feeds
    # both k-NN mean branches AND the margin join; without the barrier
    # the pair pipeline re-expanded into all three consumers (12
    # parquet scans, 3 cosine evaluations of every pair in one plan)
    p = _bitext_pair_stage(spark, sf_dir).transform(barrier)
    ws = Window.partitionBy("sid").orderBy(F.desc("cos"), "tid")
    wt = Window.partitionBy("tid").orderBy(F.desc("cos"), "sid")
    ks = (
        p.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= _BT_K)
        .groupBy("sid")
        .agg(F.avg("cos").alias("ks"))
    )
    kt = (
        p.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= _BT_K)
        .groupBy("tid")
        .agg(F.avg("cos").alias("kt"))
    )
    m = (
        p.join(ks, "sid")
        .join(kt, "tid")
        .withColumn(
            "margin", F.col("cos") / ((F.col("ks") + F.col("kt")) / 2)
        )
    )
    wbest = Window.partitionBy("sid").orderBy(F.desc("margin"), "tid")
    return (
        m.withColumn("rn", F.row_number().over(wbest))
        .filter((F.col("rn") == 1) & (F.col("margin") >= _BT_MARGIN))
        .select("sid", "tid", "cos", F.round("margin", 6).alias("margin"))
        .orderBy("sid")
    )


# -------------------------------------------- PR threshold sweep


@query(
    "eval_pr_curve",
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             round(1.0 / (1.0 + exp(-({_score_w()[0]}
                   + {_score_w()[1]} * (value / 100.0)
                   + {_score_w()[2]} * (hour(ts) / 24.0)))), 6) AS score
      FROM events
    ),
    thr AS (SELECT unnest([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS thr),
    cells AS (
      SELECT thr,
             sum(CASE WHEN score >= thr AND y = 1 THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN score >= thr AND y = 0 THEN 1 ELSE 0 END) AS fp,
             sum(y) AS pos
      FROM scored CROSS JOIN thr GROUP BY thr
    )
    SELECT CAST(thr AS DOUBLE) AS thr,
           CAST(tp + fp AS BIGINT) AS n_flagged,
           round(CASE WHEN tp + fp = 0 THEN 0.0
                      ELSE tp / CAST(tp + fp AS DOUBLE) END, 6)
             AS precision,
           round(tp / CAST(pos AS DOUBLE), 6) AS recall
    FROM cells ORDER BY thr
    """,
    tags=("stats", "classifier", "evaluation"),
)
def eval_pr_curve(spark, sf_dir):
    """PRECISION-RECALL THRESHOLD SWEEP for the shipped quality
    classifier (same logistic weights the calibration monitor scores
    with): at each of 9 operating thresholds, how many rows the filter
    would flag and at what precision/recall — the curve a pipeline
    owner reads to pick the quality-filter cut before a training run.

    Determinism: the sigmoid is rounded to 6 dp before the threshold
    compare (both engines gate identical doubles); counts are exact
    longs; the final ratios divide identical longs.

    Scale: ONE pass — the x9 threshold fan-out happens via a broadcast
    literal explode and collapses map-side (9 running cells per task);
    the shuffle carries 9 rows x partitions. No per-threshold rescans,
    which is the difference between a 9x and a 1x cost at 100 TB."""
    w = _score_w()
    e = t(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
        F.round(
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        F.lit(w[0])
                        + F.lit(w[1]) * (F.col("value") / 100.0)
                        + F.lit(w[2]) * (F.hour("ts") / 24.0)
                    )
                )
            ),
            6,
        ).alias("score"),
    )
    thr = F.explode(
        F.array(*[F.lit(round(x / 10, 2)) for x in range(1, 10)])
    ).alias("thr")
    cells = (
        scored.select("y", "score", thr)
        .groupBy("thr")
        .agg(
            F.sum(
                F.when((F.col("score") >= F.col("thr")) & (F.col("y") == 1), 1)
                .otherwise(0)
            ).alias("tp"),
            F.sum(
                F.when((F.col("score") >= F.col("thr")) & (F.col("y") == 0), 1)
                .otherwise(0)
            ).alias("fp"),
            F.sum("y").alias("pos"),
        )
    )
    return cells.select(
        F.round("thr", 2).alias("thr"),
        (F.col("tp") + F.col("fp")).cast("long").alias("n_flagged"),
        F.round(
            F.when(F.col("tp") + F.col("fp") == 0, 0.0).otherwise(
                F.col("tp") / (F.col("tp") + F.col("fp")).cast("double")
            ),
            6,
        ).alias("precision"),
        F.round(F.col("tp") / F.col("pos").cast("double"), 6).alias(
            "recall"
        ),
    ).orderBy("thr")


# ------------------------------------------ sampled dup-rate estimate

_DUPEST_P = 0.25


@query(
    "dedup_rate_estimate",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, md5(text) AS h,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) / 4294967296.0 < {_DUPEST_P} AS in_sample
      FROM documents
    )
    SELECT CAST(count(*) FILTER (in_sample) AS BIGINT) AS sample_n,
           CAST(count(DISTINCT h) FILTER (in_sample) AS BIGINT)
             AS sample_distinct,
           round(1.0 - count(DISTINCT h) FILTER (in_sample)
                       / CAST(count(*) FILTER (in_sample) AS DOUBLE), 6)
             AS sample_dup_rate,
           CAST(count(*) AS BIGINT) AS full_n,
           CAST(count(DISTINCT h) AS BIGINT) AS full_distinct,
           round(1.0 - count(DISTINCT h)
                       / CAST(count(*) AS DOUBLE), 6) AS full_dup_rate
    FROM hashed
    """,
    tags=("llm", "dedup", "sampling", "estimate"),
)
def dedup_rate_estimate(spark, sf_dir):
    """SAMPLED EXACT-DUP RATE ESTIMATE — the cheap pre-flight before
    committing a full dedup pass: hash-sample 25% of doc ids
    (deterministic md5 draw), measure the exact-duplicate rate inside
    the sample (1 - distinct/total over content digests), and report
    it next to the full-corpus truth the gate verifies against. The
    sampled rate UNDERSTATES the true rate (a dup pair survives
    sampling with probability p^2) — that bias is the documented
    contract, and the full columns exist here so the gate can check
    both; a production run computes only the sample side.

    Scale: the sample side touches p*n digests; content never
    shuffles (md5 digests do), and both distinct-counts are map-side
    partial aggregations. One scan serves both estimates."""
    d = t(spark, sf_dir, "documents")
    in_sample = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        / F.lit(4294967296.0)
        < _DUPEST_P
    )
    hashed = d.select(F.md5("text").alias("h"), in_sample.alias("in_sample"))
    return hashed.agg(
        F.count(F.when(F.col("in_sample"), 1)).alias("sample_n"),
        F.countDistinct(F.when(F.col("in_sample"), F.col("h"))).alias(
            "sample_distinct"
        ),
        F.round(
            F.lit(1.0)
            - F.countDistinct(F.when(F.col("in_sample"), F.col("h")))
            / F.count(F.when(F.col("in_sample"), 1)).cast("double"),
            6,
        ).alias("sample_dup_rate"),
        F.count("*").alias("full_n"),
        F.countDistinct("h").alias("full_distinct"),
        F.round(
            F.lit(1.0) - F.countDistinct("h") / F.count("*").cast("double"),
            6,
        ).alias("full_dup_rate"),
    )


# ------------------------------------------------ join-key skew report

_SKEW_KEYS = ("l_orderkey", "l_partkey", "l_suppkey")


@query(
    "diag_skew_report",
    oracle=f"""
    WITH u AS (
      SELECT 'l_orderkey' AS key_col, l_orderkey AS k FROM lineitem
      UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
      UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
    ),
    c AS (SELECT key_col, k, count(*) AS cnt FROM u GROUP BY 1, 2)
    SELECT key_col,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS total_rows,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           round(max(cnt) / avg(cnt), 6) AS skew_factor,
           quantile_cont(cnt, 0.5) AS p50_cnt,
           quantile_cont(cnt, 0.99) AS p99_cnt
    FROM c GROUP BY key_col ORDER BY key_col
    """,
    tags=("diagnostics", "skew", "scale", "quantiles"),
)
def diag_skew_report(spark, sf_dir):
    """JOIN-KEY SKEW REPORT — the diagnostic you run BEFORE deciding to
    salt: per candidate join key of the fact table, the key-count
    distribution (distinct keys, hottest key, max/mean skew factor,
    exact p50/p99 per-key counts). A skew_factor near 1 says hash
    partitioning balances; p99 << max says one pathological key —
    salt exactly that one (the scale_ops salted-join pattern); a heavy
    p99 tail says bump shuffle partitions / rely on AQE skew-join.

    Scale shape: ONE scan of the fact table fans out via a struct-
    array explode (x|keys|, map-side), collapses to (key_col, key)
    counts with partial aggregation, and the distribution stats run on
    the count relation: max/avg as a grouped agg, the percentiles
    through the engine-standard two-pass range-partitioned
    exact_quantiles (never a single-reducer value map). Nothing
    driver-side at any corpus size."""
    from gcp_etl_spark.operators.quantiles import exact_quantiles

    li = t(spark, sf_dir, "lineitem")
    u = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("key_col"),
                        F.col(c).cast("long").alias("k"),
                    )
                    for c in _SKEW_KEYS
                ]
            )
        ).alias("e")
    ).select("e.key_col", "e.k")
    # lazy localCheckpoint (r12, guide §1.2): the (key_col, key) count
    # relation feeds BOTH the distribution stats and the quantile
    # branch — without the barrier each branch re-ran the full
    # scan → explode → count fan-out (the fact pipeline executed
    # twice); with it the fan-out runs once and both branches read the
    # materialized, distinct-keys-sized counts.
    c = (
        u.groupBy("key_col", "k")
        .agg(F.count("*").alias("cnt"))
        .transform(barrier)
    )
    aggs = c.groupBy("key_col").agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.max("cnt") / F.avg("cnt"), 6).alias("skew_factor"),
    )
    q = exact_quantiles(
        c,
        "cnt",
        {"p50_cnt": 0.5, "p99_cnt": 0.99},
        group_cols=["key_col"],
        # pinned rank path: the quantile input is the per-KEY count
        # relation — distinct-key-sized, i.e. unbounded at scale, so
        # the adaptive gate's aggregate path is never right here; the
        # rank path's internal checkpoint also keeps the fact table at
        # ONE visible scan (plan contract pinned in
        # tests/test_scale_strategies.py)
        strategy="rank",
    )
    return aggs.join(q, "key_col").orderBy("key_col")


# --------------------------------------- matryoshka truncation eval

_MRL_DIMS = 16
_MRL_K = 5
_MRL_NQ = 8


@query(
    "ann_matryoshka_eval",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {_MRL_NQ}
    ),
    c AS (
      SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv
      FROM embeddings
    ),
    p AS (
      SELECT q_id, n_id,
             round(list_dot_product(qv, nv)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(nv, nv))), 6) AS cos_full,
             round(list_dot_product(qv[1:{_MRL_DIMS}], nv[1:{_MRL_DIMS}])
                   / (sqrt(list_dot_product(qv[1:{_MRL_DIMS}],
                                            qv[1:{_MRL_DIMS}]))
                      * sqrt(list_dot_product(nv[1:{_MRL_DIMS}],
                                              nv[1:{_MRL_DIMS}]))), 6)
               AS cos_trunc
      FROM q JOIN c ON q_id <> n_id
    ),
    fullk AS (
      SELECT q_id, n_id FROM (
        SELECT q_id, n_id, row_number() OVER (
          PARTITION BY q_id ORDER BY cos_full DESC, n_id) AS rn FROM p
      ) WHERE rn <= {_MRL_K}
    ),
    trunck AS (
      SELECT q_id, n_id FROM (
        SELECT q_id, n_id, row_number() OVER (
          PARTITION BY q_id ORDER BY cos_trunc DESC, n_id) AS rn FROM p
      ) WHERE rn <= {_MRL_K}
    )
    SELECT f.q_id,
           CAST(count(tr.n_id) AS BIGINT) AS overlap,
           round(count(tr.n_id) / {_MRL_K}.0, 6) AS recall_at_k
    FROM fullk f LEFT JOIN trunck tr
      ON tr.q_id = f.q_id AND tr.n_id = f.n_id
    GROUP BY f.q_id ORDER BY f.q_id
    """,
    tags=("llm", "ann", "embedding", "evaluation"),
)
def ann_matryoshka_eval(spark, sf_dir):
    """MATRYOSHKA TRUNCATION EVAL (Kusupati et al. 2022, MRL, public):
    can the index store only the first {16} dims? Per probe, exact
    top-k under the FULL cosine vs top-k under the truncated-prefix
    cosine, reported as recall@k of the truncated ranking — the
    measurement that justifies (or vetoes) a 4x index-size cut before
    you build the IVF/PQ index on truncated vectors.

    Determinism: both cosines round to 6 dp before ranking; ties break
    on neighbor id; recall is a count ratio of exact longs.

    Scale: ONE broadcast(probes) x corpus stream computes both scores
    per pair (the truncated dot is a prefix slice of the same array —
    no second scan); the two rankings are |probes|-partitioned window
    top-ks over the scored relation. At 100 TB the same dual-score
    expression rides the ANN candidate stream."""
    from gcp_etl_spark.llm.similarity import cosine

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _MRL_NQ).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").cast("array<double>").alias("nv"),
    )
    p = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos_full"),
            F.round(
                cosine(
                    F.slice(F.col("qv"), 1, _MRL_DIMS),
                    F.slice(F.col("nv"), 1, _MRL_DIMS),
                ),
                6,
            ).alias("cos_trunc"),
        )
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("cos_full"), "n_id")
    wt = Window.partitionBy("q_id").orderBy(F.desc("cos_trunc"), "n_id")
    fullk = (
        p.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= _MRL_K)
        .select("q_id", "n_id")
    )
    trunck = (
        p.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= _MRL_K)
        .select("q_id", F.col("n_id").alias("t_id"))
    )
    joined = fullk.join(
        trunck,
        (fullk.q_id == trunck.q_id) & (fullk.n_id == trunck.t_id),
        "left",
    ).select(fullk.q_id.alias("qq"), "t_id")
    return (
        joined.groupBy("qq")
        .agg(
            F.count("t_id").alias("overlap"),
            F.round(F.count("t_id") / F.lit(float(_MRL_K)), 6).alias(
                "recall_at_k"
            ),
        )
        .select(F.col("qq").alias("q_id"), "overlap", "recall_at_k")
        .orderBy("q_id")
    )


# -------------------------------------------- KMV distinct-overlap

_KMV_K = 64
_KMV_SRC_A = "src0"
_KMV_SRC_B = "src1"


def _kmv_grams_sql() -> str:
    return f"""
    w AS (
      SELECT source,
             list_filter(string_split(lower(text), ' '),
                         x -> x <> '') AS ws
      FROM documents WHERE source IN ('{_KMV_SRC_A}', '{_KMV_SRC_B}')
    ),
    g AS (
      SELECT DISTINCT source, ws[i+1] || ' ' || ws[i+2] AS g
      FROM w, unnest(range(len(ws) - 1)) AS t(i)
    ),
    h AS (
      SELECT source, g,
             CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT)
               / 4294967296.0 AS h
      FROM g
    ),
    akmv AS (SELECT h FROM h WHERE source = '{_KMV_SRC_A}'
             ORDER BY h, g LIMIT {_KMV_K}),
    bkmv AS (SELECT h FROM h WHERE source = '{_KMV_SRC_B}'
             ORDER BY h, g LIMIT {_KMV_K}),
    ukmv AS (
      SELECT h FROM (SELECT h FROM akmv UNION SELECT h FROM bkmv)
      ORDER BY h LIMIT {_KMV_K}
    )
    """


@query(
    "sketch_kmv_overlap",
    oracle=f"""
    WITH {_kmv_grams_sql()},
    theta AS (SELECT max(h) AS th, count(*) AS ku FROM ukmv),
    rho AS (
      SELECT count(*) AS both FROM ukmv u
      WHERE EXISTS (SELECT 1 FROM akmv a WHERE a.h = u.h)
        AND EXISTS (SELECT 1 FROM bkmv b WHERE b.h = u.h)
    ),
    exact AS (
      SELECT count(DISTINCT g) AS xu,
             count(DISTINCT CASE WHEN na > 0 AND nb > 0 THEN g END) AS xi
      FROM (
        SELECT g,
               count(CASE WHEN source = '{_KMV_SRC_A}' THEN 1 END) AS na,
               count(CASE WHEN source = '{_KMV_SRC_B}' THEN 1 END) AS nb
        FROM h GROUP BY g
      )
    )
    SELECT {_KMV_K} AS k,
           round((theta.ku - 1) / theta.th, 6) AS est_union,
           CAST(exact.xu AS BIGINT) AS exact_union,
           round(rho.both * 1.0 / theta.ku
                 * ((theta.ku - 1) / theta.th), 6) AS est_intersection,
           CAST(exact.xi AS BIGINT) AS exact_intersection
    FROM theta, rho, exact
    """,
    tags=("sketch", "dedup", "distinct", "scale"),
)
def sketch_kmv_overlap(spark, sf_dir):
    """KMV (k-minimum-values / bottom-k) DISTINCT-OVERLAP sketch
    (Bar-Yossef et al. 2002; the Theta-sketch set algebra, public):
    estimate the distinct-bigram union and intersection of two corpus
    sources from k=64 hash values per side. est_union = (k-1)/theta
    with theta the k-th smallest hash of the merged sketch; the
    intersection rides the union sketch — a merged value is in A iff
    it is in A's sketch (valid because theta <= each side's own
    threshold), so est_inter = (matching fraction) x est_union. The
    exact truths are computed alongside for the gate; a production
    run ships ONLY the sketches.

    Determinism: the hash is the engine-standard md5 uniform; both
    engines pick the same k values (h then gram tiebreak) and the
    estimates divide identical doubles.

    Scale: THE point of the sketch — each side reduces to k doubles
    via per-partition top-k (TakeOrdered; corpus never shuffles), the
    merge is k+k values, and cross-SOURCE overlap across a 100 TB
    corpus becomes an O(k) postprocess. The exactness columns are the
    test-scale luxury the sketch exists to avoid."""
    d = t(spark, sf_dir, "documents").filter(
        F.col("source").isin(_KMV_SRC_A, _KMV_SRC_B)
    )
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    grams = (
        d.select("source", toks.alias("ws"))
        .select(
            "source",
            F.explode(
                F.when(
                    F.size("ws") >= 2,
                    F.expr(
                        "transform(sequence(0, size(ws) - 2),"
                        " i -> concat(ws[i], ' ', ws[i+1]))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("g"),
        )
        .distinct()
    )
    h = grams.select(
        "source",
        "g",
        (
            F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long")
            / F.lit(4294967296.0)
        ).alias("h"),
    )
    akmv = (
        h.filter(F.col("source") == _KMV_SRC_A)
        .orderBy("h", "g")
        .limit(_KMV_K)
        .select("h")
    )
    bkmv = (
        h.filter(F.col("source") == _KMV_SRC_B)
        .orderBy("h", "g")
        .limit(_KMV_K)
        .select("h")
    )
    ukmv = (
        akmv.unionByName(bkmv).distinct().orderBy("h").limit(_KMV_K)
    )
    theta = ukmv.agg(
        F.max("h").alias("th"), F.count("*").alias("ku")
    )
    both = (
        ukmv.join(akmv, "h", "left_semi")
        .join(bkmv, "h", "left_semi")
        .agg(F.count("*").alias("both"))
    )
    exact = (
        h.groupBy("g")
        .agg(
            F.count(F.when(F.col("source") == _KMV_SRC_A, 1)).alias("na"),
            F.count(F.when(F.col("source") == _KMV_SRC_B, 1)).alias("nb"),
        )
        .agg(
            F.count("*").alias("xu"),
            F.count(
                F.when((F.col("na") > 0) & (F.col("nb") > 0), 1)
            ).alias("xi"),
        )
    )
    return (
        theta.crossJoin(both)
        .crossJoin(exact)
        .select(
            F.lit(_KMV_K).cast("int").alias("k"),
            F.round((F.col("ku") - 1) / F.col("th"), 6).alias("est_union"),
            F.col("xu").cast("long").alias("exact_union"),
            F.round(
                F.col("both") / F.col("ku") * ((F.col("ku") - 1) / F.col("th")),
                6,
            ).alias("est_intersection"),
            F.col("xi").cast("long").alias("exact_intersection"),
        )
    )


# ------------------------------------------ referential-integrity audit


@query(
    "quality_fk_audit",
    oracle="""
    SELECT 'customer.c_nationkey->nation' AS fk,
           CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    ORDER BY fk
    """,
    tags=("quality", "audit", "join", "integrity"),
)
def quality_fk_audit(spark, sf_dir):
    """REFERENTIAL-INTEGRITY AUDIT — the load-gate report a warehouse
    runs after every ingest (the reference's count-gate generalized
    from row counts to key integrity): for each declared FK edge, how
    many child rows dangle (no matching parent). All four TPC-H-ish
    edges in one relation; a nonzero orphan count is the signal to
    quarantine the batch before queries silently drop rows in inner
    joins.

    Scale: each edge is ONE left-anti join on its key — parent sides
    are dimension-sized (AQE broadcasts them) or co-shuffled fact keys;
    counts collapse map-side. No row data beyond the join key moves."""
    edges = [
        (
            "customer.c_nationkey->nation",
            t(spark, sf_dir, "customer"),
            "c_nationkey",
            t(spark, sf_dir, "nation"),
            "n_nationkey",
        ),
        (
            "lineitem.l_orderkey->orders",
            t(spark, sf_dir, "lineitem"),
            "l_orderkey",
            t(spark, sf_dir, "orders"),
            "o_orderkey",
        ),
        (
            "lineitem.l_partkey->part",
            t(spark, sf_dir, "lineitem"),
            "l_partkey",
            t(spark, sf_dir, "part"),
            "p_partkey",
        ),
        (
            "orders.o_custkey->customer",
            t(spark, sf_dir, "orders"),
            "o_custkey",
            t(spark, sf_dir, "customer"),
            "c_custkey",
        ),
    ]
    out = None
    for name, child, ck, parent, pk in edges:
        rows = child.select(F.col(ck).alias("__k"))
        orphans = rows.join(
            parent.select(F.col(pk).alias("__k")), "__k", "left_anti"
        )
        rel = rows.agg(F.count("*").alias("n_rows")).crossJoin(
            orphans.agg(F.count("*").alias("n_orphans"))
        ).select(F.lit(name).alias("fk"), "n_rows", "n_orphans")
        out = rel if out is None else out.unionByName(rel)
    return out.orderBy("fk")


# ------------------------------------------- packing padding waste

_PAD_LENGTHS = (128, 256, 512, 1024)


@query(
    "pack_padding_waste",
    oracle=f"""
    WITH toks AS (
      SELECT len(list_filter(string_split(trim(lower(text)), ' '),
                             x -> x <> '')) AS n_toks
      FROM documents
    ),
    l AS (SELECT unnest([{", ".join(str(x) for x in _PAD_LENGTHS)}]) AS seq_len)
    SELECT seq_len,
           CAST(sum(n_toks) AS BIGINT) AS real_tokens,
           CAST(sum(ceil(n_toks * 1.0 / seq_len) * seq_len) AS BIGINT)
             AS padded_tokens,
           round(1.0 - sum(n_toks)
                 / CAST(sum(ceil(n_toks * 1.0 / seq_len) * seq_len)
                        AS DOUBLE), 6) AS waste_frac
    FROM toks CROSS JOIN l
    GROUP BY seq_len ORDER BY seq_len
    """,
    tags=("llm", "prep", "packing", "planning"),
)
def pack_padding_waste(spark, sf_dir):
    """PADDING-WASTE PLANNER — pick the training sequence length
    BEFORE materializing packed shards: for each candidate seq_len,
    the fraction of padded-batch tokens that would be padding if every
    document were chunk-padded to seq_len multiples (no cross-doc
    packing). Read next to ``pack_sequences_budget`` (which measures
    the greedy-packing alternative): the gap between this table's
    waste and the packer's residuals is the payoff that justifies the
    packing shuffle at 100 TB.

    Scale: ONE scan computes token counts; the x|lengths| fan-out is a
    broadcast literal cross join collapsed map-side into 4 running
    sums — same single-pass sweep shape as the PR curve."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.size(
            F.filter(
                F.split(F.trim(F.lower("text")), " "), lambda x: x != ""
            )
        ).alias("n_toks")
    )
    lens = F.explode(
        F.array(*[F.lit(x) for x in _PAD_LENGTHS])
    ).alias("seq_len")
    return (
        toks.select("n_toks", lens)
        .groupBy("seq_len")
        .agg(
            F.sum("n_toks").alias("real_tokens"),
            F.sum(
                F.ceil(F.col("n_toks") / F.col("seq_len")) * F.col("seq_len")
            ).alias("padded_tokens"),
            F.round(
                F.lit(1.0)
                - F.sum("n_toks")
                / F.sum(
                    F.ceil(F.col("n_toks") / F.col("seq_len"))
                    * F.col("seq_len")
                ).cast("double"),
                6,
            ).alias("waste_frac"),
        )
        .orderBy("seq_len")
    )


# --------------------------------------- curation pipeline, end-to-end

_CUR_MIN_CHARS = 50
_CUR_MAX_CHARS = 400
_CUR_BUDGET = 512


@query(
    "pipeline_curation_e2e",
    oracle=f"""
    WITH dedup AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    kept AS (
      SELECT d.doc_id, d.lang, d.text
      FROM documents d JOIN dedup USING (doc_id)
      WHERE d.n_chars BETWEEN {_CUR_MIN_CHARS} AND {_CUR_MAX_CHARS}
    ),
    split AS (
      SELECT doc_id, lang, text,
             CASE WHEN u < {_SPLIT_TRAIN} THEN 'train'
                  WHEN u < {_SPLIT_VAL} THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT *,
               CAST(('0x' || substr(md5(md5(text)), 1, 8)) AS UBIGINT)
                 / 4294967296.0 AS u
        FROM kept
      )
    ),
    toks AS (
      SELECT split, lang, doc_id,
             len(list_filter(string_split(trim(lower(text)), ' '),
                             x -> x <> '')) AS n_toks
      FROM split
    ),
    runs AS (
      SELECT split, lang, n_toks,
             sum(n_toks) OVER (PARTITION BY split, lang ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_toks
               AS cum_before
      FROM toks
    )
    SELECT split, lang,
           CAST(cum_before // {_CUR_BUDGET} AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens
    FROM runs
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    tags=("llm", "pipeline", "e2e", "dedup", "prep", "packing"),
)
def pipeline_curation_e2e(spark, sf_dir):
    """THE CURATION PIPELINE, COMPOSED — raw corpus to packed training
    manifest in one declarative plan, every stage an operator this
    engine already ships individually:

      1. EXACT DEDUP — min-doc_id survivor per content digest (text
         never shuffles, digests do);
      2. QUALITY FILTER — length gate ({_CUR_MIN_CHARS}..{_CUR_MAX_CHARS}
         chars; stands in for the composite score, same pushdown shape);
      3. LEAKAGE-SAFE SPLIT — one md5 uniform per CONTENT digest (exact
         dups share a draw by construction), 80/10/10;
      4. TOKEN COUNT + GREEDY PACKING — running-sum bin assignment per
         (split, lang) at a {_CUR_BUDGET}-token budget;
      5. MANIFEST — per (split, lang, bin) doc/token masses, the
         relation a training job reads to schedule shards.

    The value of registering the COMPOSITION: Catalyst fuses the five
    stages into one plan (the dedup agg, the filter pushed to the scan,
    the split as a map, packing as a window over already-grouped
    partitions) — proving the operators compose without materialization
    barriers. The oracle replays the identical five-stage SQL.

    Scale: stages 1-3 are hash-agg/map shapes; stage 4's window
    partitions by (split, lang) — bounded groups at any corpus size
    (the pack_sequences_budget contract). Nothing driver-side."""
    d = t(spark, sf_dir, "documents")
    h = d.select(
        "doc_id", "lang", "text", "n_chars", F.md5("text").alias("h")
    )
    dedup = h.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    kept = (
        h.join(dedup, ["h", "doc_id"])
        .filter(F.col("n_chars").between(_CUR_MIN_CHARS, _CUR_MAX_CHARS))
    )
    u = F.conv(F.substring(F.md5("h"), 1, 8), 16, 10).cast("long") / F.lit(
        4294967296.0
    )
    split = kept.select(
        "doc_id",
        "lang",
        "text",
        F.when(u < _SPLIT_TRAIN, "train")
        .when(u < _SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )
    toks = split.select(
        "split",
        "lang",
        "doc_id",
        F.size(
            F.filter(
                F.split(F.trim(F.lower("text")), " "), lambda x: x != ""
            )
        ).alias("n_toks"),
    )
    w = (
        Window.partitionBy("split", "lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = toks.withColumn(
        "cum_before", F.sum("n_toks").over(w) - F.col("n_toks")
    )
    return (
        runs.select(
            "split",
            "lang",
            F.floor(F.col("cum_before") / _CUR_BUDGET).alias("bin"),
            "n_toks",
        )
        .groupBy("split", "lang", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
        .orderBy("split", "lang", "bin")
    )


# ------------------------------------- streaming curation manifest


@query(
    "stream_curation_manifest",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, text, n_chars, md5(text) AS h FROM documents
    ),
    surv AS (SELECT h, min(doc_id) AS doc_id FROM h GROUP BY h),
    kept AS (
      SELECT hh.h, hh.lang, hh.text FROM h hh
      JOIN surv USING (h, doc_id)
      WHERE hh.n_chars BETWEEN {_CUR_MIN_CHARS} AND {_CUR_MAX_CHARS}
    ),
    assigned AS (
      SELECT lang,
             CASE WHEN u < {_SPLIT_TRAIN} THEN 'train'
                  WHEN u < {_SPLIT_VAL} THEN 'val'
                  ELSE 'test' END AS split,
             len(list_filter(string_split(trim(lower(text)), ' '),
                             x -> x <> '')) AS n_toks
      FROM (
        SELECT *,
               CAST(('0x' || substr(md5(h), 1, 8)) AS UBIGINT)
                 / 4294967296.0 AS u
        FROM kept
      )
    )
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("streaming", "llm", "pipeline", "dedup", "prep"),
)
def stream_curation_manifest(spark, sf_dir):
    """STREAMING CURATION dual — the always-on ingestion half of
    ``pipeline_curation_e2e``: each arriving micro-batch is exact-
    deduped, quality-gated, token-counted and split-assigned through a
    persistent digest store (streaming/curation.py, foreachBatch,
    epoch-partitioned parquet, replay-idempotent), and the manifest is
    the min-doc_id-per-digest view of that store. Because survivors
    key on the CONTENT digest (dedup, split draw) and min-id resolves
    at read, the end-of-stream manifest equals this batch relation for
    ANY batching of the stream (tests/test_streaming.py::
    test_stream_curation_equals_batch; replay idempotence alongside).

    This registered batch dual runs the identical per-batch algebra
    (``curate_batch``) over the full table and aggregates — fully
    value-verified by the five-stage SQL oracle.

    100 TB: per-epoch cost is O(|batch|) maps plus a digest append;
    the manifest aggregation touches ~60 B rows, never text."""
    from gcp_etl_spark.streaming.curation import curate_batch

    d = t(spark, sf_dir, "documents")
    cur = curate_batch(d, _CUR_MIN_CHARS, _CUR_MAX_CHARS)
    return (
        cur.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
        .orderBy("split", "lang")
    )


# ----------------------------------------------- one-way ANOVA


@query(
    "stats_anova_oneway",
    oracle="""
    WITH g AS (
      SELECT event_type,
             count(*) AS n_g,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s_g,
             CAST(sum(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS q_g
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT count(*) AS k, sum(n_g) AS n, sum(s_g) AS s, sum(q_g) AS q,
             sum(s_g * s_g / n_g) AS sg2
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           CAST(n AS BIGINT) AS n_rows,
           round(sg2 - s * s / n, 4) AS ss_between,
           round(q - sg2, 4) AS ss_within,
           round(((sg2 - s * s / n) / (k - 1))
                 / ((q - sg2) / (n - k)), 6) AS f_stat
    FROM tot
    """,
    tags=("stats", "anova", "hypothesis-test"),
)
def stats_anova_oneway(spark, sf_dir):
    """ONE-WAY ANOVA F-statistic: does mean(value) differ across event
    types? F = (SSB/(k-1)) / (SSW/(n-k)) with the textbook sum-of-
    squares decomposition computed entirely from per-group sufficient
    statistics — count, Σx, Σx² — so the corpus is scanned ONCE and
    everything after the first agg is a k-row relation. The third
    member of the engine's hypothesis-test family next to the KS and
    Mann-Whitney statistics.

    Determinism: Σx and Σx² accumulate as DECIMALS (the value column's
    2-dp money convention — exact, order-free); the sum-of-squares
    algebra then runs over identical doubles in both engines, rounded
    4/6 dp.

    Scale: ONE map-side-combinable aggregate per group; the F algebra
    lives on k rows. Nothing else moves."""
    e = t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    g = e.groupBy("event_type").agg(
        F.count("*").alias("n_g"),
        F.sum(dec).cast("double").alias("s_g"),
        F.sum(dec * dec).cast("double").alias("q_g"),
    )
    tot = g.agg(
        F.count("*").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum(F.col("s_g") * F.col("s_g") / F.col("n_g")).alias("sg2"),
    )
    ssb = F.col("sg2") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("sg2")
    return tot.select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("n").cast("long").alias("n_rows"),
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6
        ).alias("f_stat"),
    )


# --------------------------------------------- IVF nprobe sweep

_NPROBE_GRID = (1, 2, 4, 8)
_NPROBE_K = 5
_NPROBE_NQ = 10


@query(
    "ann_ivf_nprobe_sweep",
    # rows-only by design (the k-means coarse quantizer is not
    # SQL-expressible — same policy as every IVF member); the curve's
    # CONTRACT is pinned by tests/test_r6.py::
    # test_ivf_nprobe_sweep_monotone_and_exact_at_full: recall@5 is
    # non-decreasing in nprobe and EXACTLY 1.0 at nprobe = n_centroids
    # (probing every list IS brute force).
    oracle=None,
    tags=("llm", "ann", "ivf", "evaluation"),
)
def ann_ivf_nprobe_sweep(spark, sf_dir):
    """IVF OPERATING CURVE — recall@k vs nprobe, the measurement that
    picks the index's speed/recall operating point (the retrieval
    sibling of eval_pr_curve's threshold sweep): for each probe count
    in {1,2,4,8 = all lists}, run the IVF top-k for the same probes
    and report mean overlap with the EXACT brute-force top-k. The
    candidate volume scales ~ |corpus| x nprobe / n_centroids, so this
    table IS the cost-for-recall menu an operator reads before fixing
    nprobe fleet-wide.

    Scale: each sweep point is one IVF probe plan (inverted lists
    joined via broadcast probes, never a full scan beyond the
    nprobe = n_centroids anchor row); the exact baseline is computed
    ONCE. All rankings use 4-dp-rounded cosine + id tiebreaks, so the
    curve is deterministic run-to-run."""
    from gcp_etl_spark.llm.ivf import cosine_topk_ivf, ivf_assign
    from gcp_etl_spark.llm.similarity import cosine_topk

    emb = t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _NPROBE_NQ)
    # NOTE (r12 resume): the exact baseline feeds one left_semi join
    # per sweep point (4× re-expansion in the plan) — a barrier here
    # was MEASURED SLOWER (+0.5 s interleaved A/B, with or without a
    # broadcast hint on the 50-row result): the barrier serializes the
    # baseline's materialization in front of the first sweep point,
    # where the re-expanded copies overlapped on idle cores (the
    # train_uni lesson, quality_ccnet_buckets).
    exact = cosine_topk(emb, probes, k=_NPROBE_K).select(
        "q_id", F.col("n_id").alias("x_id")
    )
    # ONE quantizer fit shared by every sweep point (optimization r12,
    # guide §1.2: the sweep varies nprobe only — the old per-point
    # cosine_topk_ivf call refit the identical seeded quantizer 4
    # times, 4 corpus toPandas samples + 4 Lloyd fits for one curve);
    # prefit reuse is the refine-curve convention (llm/ivf.py).
    # The shared ASSIGNMENT is also identical across points (same
    # centers; only nprobe differs downstream), so the corpus-wide
    # nearest-centroid pandas-UDF pass materializes once behind a
    # barrier instead of re-running per point (guide §4).
    assigned, centers = ivf_assign(emb, "vec_id", "embedding", n_centroids=8)
    prefit = (assigned.transform(barrier), centers)
    out = None
    for np_ in _NPROBE_GRID:
        approx = cosine_topk_ivf(
            emb, probes, k=_NPROBE_K, n_centroids=8, nprobe=np_,
            prefit=prefit,
        ).select("q_id", "n_id")
        hits = exact.join(
            approx,
            (exact.q_id == approx.q_id) & (exact.x_id == approx.n_id),
            "left_semi",
        )
        rel = hits.agg(
            (F.count("*") / F.lit(float(_NPROBE_K * _NPROBE_NQ))).alias(
                "recall_at_k"
            )
        ).select(
            F.lit(np_).cast("int").alias("nprobe"),
            F.round("recall_at_k", 4).alias("recall_at_k"),
        )
        out = rel if out is None else out.unionByName(rel)
    return out.orderBy("nprobe")


# ------------------------------------------ compression-ratio quality


@query(
    "quality_compression_ratio",
    # rows-only by design: the signal IS zlib's DEFLATE output length,
    # which SQL cannot replay. Pinned by tests/test_r6.py::
    # test_compression_ratio_orders_repetitive_below_diverse —
    # deterministic (zlib level 6 is a pure function of the bytes),
    # planted repetitive text must score below diverse text, and the
    # ratio bounds hold corpus-wide.
    oracle=None,
    tags=("llm", "quality", "text", "filter"),
)
def quality_compression_ratio(spark, sf_dir):
    """COMPRESSION-RATIO quality signal (the Gopher / RefinedWeb
    boilerplate filter, public): highly compressible text (ratio near
    0) is repetitive boilerplate, incompressible text (ratio near or
    above 1) is noise/random — natural prose sits in between, and
    production pipelines drop both tails. Emits per-doc
    deflate_len/raw_len plus the corpus deciles a threshold picker
    reads. zlib at the default level inside mapInPandas — one Arrow
    batch in, two ints per doc out; the text never leaves its scan
    task, which is what makes this a linear single-pass filter at
    100 TB (same shape as the codec ops).

    Output: 20 extreme docs (10 most / 10 least compressible,
    deterministic doc_id tiebreaks) so the gate sees rows, with the
    ratio rounded 6 dp."""
    import pandas as pd

    d = t(spark, sf_dir, "documents")

    def score(it):
        import zlib

        for pdf in it:
            raw = pdf["text"].str.encode("utf-8")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_len": raw.str.len(),
                    "deflate_len": raw.map(lambda b: len(zlib.compress(b))),
                }
            )

    scored = d.select("doc_id", "text").mapInPandas(
        score, "doc_id long, raw_len long, deflate_len long"
    )
    ranked = scored.select(
        "doc_id",
        "raw_len",
        "deflate_len",
        F.round(F.col("deflate_len") / F.col("raw_len"), 6).alias("ratio"),
    )
    low = ranked.orderBy("ratio", "doc_id").limit(10)
    high = ranked.orderBy(F.desc("ratio"), F.desc("doc_id")).limit(10)
    return low.unionByName(high).orderBy("ratio", "doc_id")


# ----------------------------------------------- weighted median


@query(
    "agg_weighted_median",
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS flag, l_extendedprice AS v,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT flag, v, w,
             sum(w) OVER (PARTITION BY flag ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(w) OVER (PARTITION BY flag) AS tot
      FROM g
    )
    SELECT flag,
           CAST(min(CASE WHEN cum * 2 >= tot THEN v END)
                AS DOUBLE) AS weighted_median,
           CAST(max(tot) AS DOUBLE) AS total_weight
    FROM c GROUP BY flag ORDER BY flag
    """,
    tags=("aggregate", "quantiles", "weighted"),
)
def agg_weighted_median(spark, sf_dir):
    """EXACT WEIGHTED MEDIAN per group — the aggregate neither engine
    ships natively: the smallest value whose cumulative weight reaches
    half the group's total (here: price weighted by quantity — "the
    price at which half the shipped units cost less"). The discrete
    lower-median definition makes ties and boundaries engine-exact:
    weights pre-aggregate per DISTINCT value (decimal, order-free), the
    running total is a window over that collapsed relation, and the
    median is a conditional min — no interpolation, no float sums.

    Scale: routed through the engine-standard two-pass range-
    partitioned WEIGHTED quantile operator
    (operators/quantiles.exact_weighted_quantiles): distinct values
    collapse map-side, weights accumulate as decimals across range
    partitions with broadcast prefix offsets, and the threshold
    compare is integer-exact — no per-group single-partition
    cumulative window at any distinct-value cardinality."""
    from gcp_etl_spark.operators.quantiles import exact_weighted_quantiles

    li = t(spark, sf_dir, "lineitem")
    # include_total: the per-group total weight comes from the
    # operator's own threshold relation — ONE lineitem scan (the r6
    # verdict flagged the previous second full-table aggregate + join)
    med = exact_weighted_quantiles(
        li,
        "l_extendedprice",
        F.col("l_quantity").cast("decimal(18,2)"),
        {"weighted_median": 0.5},
        group_cols=["l_returnflag"],
        include_total=True,
    ).withColumnRenamed("l_returnflag", "flag")
    return med.select(
        "flag",
        "weighted_median",
        F.col("total_weight").cast("double").alias("total_weight"),
    ).orderBy("flag")


# ------------------------------------------ Wilcoxon signed-rank


@query(
    "stats_wilcoxon_signed_rank",
    oracle="""
    WITH halves AS (
      SELECT user_id,
             CAST(sum(CASE WHEN day(ts) % 2 = 1
                      THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
               / count(CASE WHEN day(ts) % 2 = 1 THEN 1 END) AS m_odd,
             CAST(sum(CASE WHEN day(ts) % 2 = 0
                      THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
               / count(CASE WHEN day(ts) % 2 = 0 THEN 1 END) AS m_even
      FROM events GROUP BY user_id
      HAVING count(CASE WHEN day(ts) % 2 = 1 THEN 1 END) > 0
         AND count(CASE WHEN day(ts) % 2 = 0 THEN 1 END) > 0
    ),
    diffs AS (
      SELECT user_id, m_odd - m_even AS d, abs(m_odd - m_even) AS ad
      FROM halves WHERE m_odd <> m_even
    ),
    ranked AS (
      SELECT d,
             rank() OVER (ORDER BY ad)
               + (count(*) OVER (PARTITION BY ad) - 1) / 2.0 AS r
      FROM diffs
    ),
    s AS (
      SELECT count(*) AS n,
             sum(CASE WHEN d > 0 THEN r ELSE 0 END) AS w_plus,
             sum(CASE WHEN d < 0 THEN r ELSE 0 END) AS w_minus
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           round(w_plus, 2) AS w_plus,
           round(w_minus, 2) AS w_minus,
           round((w_plus - n * (n + 1) / 4.0)
                 / sqrt(n * (n + 1) * (2 * n + 1) / 24.0), 6) AS z
    FROM s
    """,
    tags=("stats", "hypothesis-test", "ranks"),
)
def stats_wilcoxon_signed_rank(spark, sf_dir):
    """WILCOXON SIGNED-RANK test — the paired nonparametric member
    completing the hypothesis-test family (KS, Mann-Whitney, ANOVA):
    per user, does mean(value) differ between odd and even days of the
    month (a deterministic within-subject pairing)? Zero diffs drop
    (standard), |diff| ties take AVERAGE ranks (rank() + (tie_count -
    1)/2 — the textbook mid-rank), and the normal-approximation z
    accompanies W+/W-.

    Determinism: half-means divide decimal-exact sums by exact counts;
    the rank relation orders identical doubles; rank arithmetic is
    integer until the final divisions.

    Scale: one grouped pass builds per-user half-means (map-side
    combinable); ranking runs on the |users|-row diff relation through
    the engine-standard two-pass range-partitioned global row number
    (operators/quantiles.py) — no single-partition rank window at any
    population size."""
    e = t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    odd = F.dayofmonth("ts") % 2 == 1
    halves = (
        e.groupBy("user_id")
        .agg(
            (
                F.sum(F.when(odd, dec)).cast("double")
                / F.count(F.when(odd, 1))
            ).alias("m_odd"),
            (
                F.sum(F.when(~odd, dec)).cast("double")
                / F.count(F.when(~odd, 1))
            ).alias("m_even"),
            F.count(F.when(odd, 1)).alias("n_o"),
            F.count(F.when(~odd, 1)).alias("n_e"),
        )
        .filter((F.col("n_o") > 0) & (F.col("n_e") > 0))
    )
    diffs = halves.select(
        (F.col("m_odd") - F.col("m_even")).alias("d"),
        F.abs(F.col("m_odd") - F.col("m_even")).alias("ad"),
    ).filter(F.col("d") != 0)
    # average ranks WITHOUT a single-partition rank window: the
    # two-pass range-partitioned row number gives a total order over
    # (ad, d); per-|d| tie group, avg rank = min(rn) + (count-1)/2 —
    # identical to rank() + (ties-1)/2 since rank() IS the group's min
    # row number. Same engine-standard shape as the percentile sweep.
    from gcp_etl_spark.operators.quantiles import global_row_number

    rn = global_row_number(diffs, order_cols=["ad", "d"], rn_col="rn")
    tie = rn.groupBy("ad").agg(
        F.min("rn").alias("min_rn"), F.count("*").alias("ties")
    )
    ranked = rn.join(tie, "ad").select(
        "d",
        (F.col("min_rn") + (F.col("ties") - 1) / 2.0).alias("r"),
    )
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("r")).otherwise(0.0)).alias(
            "w_plus"
        ),
        F.sum(F.when(F.col("d") < 0, F.col("r")).otherwise(0.0)).alias(
            "w_minus"
        ),
    )
    n = F.col("n")
    return s.select(
        n.cast("long").alias("n_pairs"),
        F.round("w_plus", 2).alias("w_plus"),
        F.round("w_minus", 2).alias("w_minus"),
        F.round(
            (F.col("w_plus") - n * (n + 1) / 4.0)
            / F.sqrt(n * (n + 1) * (2 * n + 1) / 24.0),
            6,
        ).alias("z"),
    )


@query(
    "agg_weighted_quantiles",
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS flag, l_extendedprice AS v,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT flag, v, w,
             sum(w) OVER (PARTITION BY flag ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(w) OVER (PARTITION BY flag) AS tot
      FROM g
    )
    SELECT flag,
           CAST(min(CASE WHEN cum * 10000 >= 2500 * tot THEN v END)
                AS DOUBLE) AS wq25,
           CAST(min(CASE WHEN cum * 10000 >= 5000 * tot THEN v END)
                AS DOUBLE) AS wq50,
           CAST(min(CASE WHEN cum * 10000 >= 9900 * tot THEN v END)
                AS DOUBLE) AS wq99
    FROM c GROUP BY flag ORDER BY flag
    """,
    tags=("aggregate", "quantiles", "weighted", "scale"),
)
def agg_weighted_quantiles(spark, sf_dir):
    """WEIGHTED QUANTILE SWEEP (p25/p50/p99 of price, weighted by
    shipped quantity) through the two-pass range-partitioned weighted-
    quantile operator — one operator call returns all three order
    statistics per group, the weighted generalization of the engine's
    exact-percentile standard. The DuckDB oracle replays the identical
    integer-exact threshold rule (cum x 10000 >= p10k x total) over a
    cumulative window, which is sound for the oracle's test-scale data
    while the Spark side keeps the shape that survives 1e9 distinct
    values (range exchange + decimal prefix offsets, no per-group
    single-partition window)."""
    from gcp_etl_spark.operators.quantiles import exact_weighted_quantiles

    li = t(spark, sf_dir, "lineitem")
    return (
        exact_weighted_quantiles(
            li,
            "l_extendedprice",
            F.col("l_quantity").cast("decimal(18,2)"),
            {"wq25": 0.25, "wq50": 0.5, "wq99": 0.99},
            group_cols=["l_returnflag"],
        )
        .withColumnRenamed("l_returnflag", "flag")
        .orderBy("flag")
    )
