"""Round-7 operator additions (SURVEY.md §2H).

Opens with the round-6 verdict asks executed as first-class queries:
two-phase connected components (Kiveris large-star/small-star) as a
hash-verified clustering arm, ANN-shortlisted bitext mining (the dense
cross join demoted to oracle foil), batched BPE merge learning, and the
streaming ANN probe dual. Later sections widen the training-data
surface.

Cross-engine determinism policy: identical to r5/r6 (decimal sums or
>=6 dp rounding before any cross-engine compare; md5-hash uniforms for
every seeded draw).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t
from gcp_etl_spark.operators.barrier import barrier

# ------------------------------------------------ two-phase components

_CC_EXACT_ORACLE = """
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
    lab AS (SELECT n AS node, min(m) AS comp FROM reach GROUP BY n)
    SELECT comp, count(*) AS n_docs FROM lab GROUP BY comp
"""


@query(
    "dedup_cluster_twophase",
    oracle=_CC_EXACT_ORACLE,
    tags=("llm", "dedup", "cluster", "scale"),
)
def dedup_cluster_twophase(spark, sf_dir):
    """Near-dup clusters over the exact trigram-Jaccard pair graph,
    computed by LARGE-STAR/SMALL-STAR alternation (Kiveris et al. 2014
    "Connected Components in MapReduce and Beyond", public) — the
    O(log n)-round distributed components algorithm, against the same
    recursive-transitive-closure oracle as ``dedup_cluster_exact``
    (min-label arm), so the two-phase ALGEBRA itself is hash-verified
    end-to-end, not just pytest-asserted.

    Scale: each phase is one groupBy(min) + one equi-join on the edge
    relation; unlike min-label propagation (O(diameter) rounds, the
    registered default — near-dup graphs are short-diameter), the
    star operations re-point whole chains at their neighborhood
    minimum each round, so an adversarial diameter-n path converges in
    O(log n) rounds (pinned: tests/test_r7.py, 255-hop chain, <=12
    rounds). This is the escape hatch the r6 verdict asked to make
    real (llm/cluster.py was citing the paper without implementing
    it)."""
    from gcp_etl_spark.llm.cluster import connected_components
    from gcp_etl_spark.queries.llm_ops import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir)
    cc = connected_components(
        pairs, src="id_a", dst="id_b", algorithm="two-phase"
    )
    return cc.groupBy("comp").agg(F.count("*").alias("n_docs"))


# --------------------------------------------- ANN-shortlisted bitext

_BT_ANN_K = 4          # top-k for the density normalizers (same as dense)
_BT_ANN_MARGIN = 1.0
_BT_ANN_NPROBE = 3


def _bt_ann_centroids(n: int) -> int:
    """Coarse-quantizer size for the bitext candidate stream: ~sqrt(n)
    keeps per-cell lists ~sqrt(n) so the candidate relation is
    O(n^1.5 * nprobe / n) = sub-quadratic; capped so the driver-local
    Lloyd fit stays trivial."""
    return min(256, max(8, int(n ** 0.5)))


def mine_bitext_margin_ann_df(
    emb, k: int = _BT_ANN_K, nprobe: int = _BT_ANN_NPROBE,
    margin_floor: float = _BT_ANN_MARGIN,
):
    """The composed ANN plan over an embeddings relation with columns
    (vec_id, label, embedding): label 0 = source side, 1 = target."""
    import numpy as np

    from gcp_etl_spark.llm.ivf import _nearest_centroids
    from gcp_etl_spark.llm.kmeans import lloyd
    from gcp_etl_spark.llm.similarity import cosine

    u = emb.filter(F.col("label").isin(0, 1)).select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    n = u.count()
    # quantizer fit: bounded HASH-SPREAD sample (smallest-id sampling
    # would collapse onto one region of a grown corpus), driver-local
    # seeded Lloyd — same policy as llm/ivf.ivf_assign
    pdf = (
        u.select("vec_id", "v")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(4096)
        .toPandas()
    )
    centers = lloyd(
        np.vstack(pdf["v"].to_numpy()), _bt_ann_centroids(n), seed=42,
        iters=10,
    )
    src = u.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("sid"), F.col("v").alias("sv")
    ).withColumn(
        "cid", F.explode(_nearest_centroids(F.col("sv"), centers, nprobe))
    )
    tgt = u.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("tid"), F.col("v").alias("tv")
    ).withColumn(
        "cid", _nearest_centroids(F.col("tv"), centers, 1)[0]
    )
    # candidate stream: equi-join on the coarse cell — a (sid, tid)
    # pair appears at most once (tgt owns ONE cell), so no dedup pass
    # lazy localCheckpoint (r12 resume, guide §1.2/§4): p — the
    # cell-local candidate stream whose build runs the nearest-centroid
    # pandas UDF on BOTH sides plus the interpreted cosine per pair —
    # feeds both k-NN mean branches AND the margin join; without the
    # barrier all of it re-ran three times (18 Python nodes in one
    # plan). Same fix as the dense foil.
    p = src.join(tgt, "cid").select(
        "sid", "tid",
        F.round(cosine(F.col("sv"), F.col("tv")), 6).alias("cos"),
    ).transform(barrier)
    ws = Window.partitionBy("sid").orderBy(F.desc("cos"), "tid")
    wt = Window.partitionBy("tid").orderBy(F.desc("cos"), "sid")
    ks = (
        p.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= k)
        .groupBy("sid").agg(F.avg("cos").alias("ks"))
    )
    kt = (
        p.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= k)
        .groupBy("tid").agg(F.avg("cos").alias("kt"))
    )
    m = (
        p.join(ks, "sid").join(kt, "tid")
        .withColumn("margin", F.col("cos") / ((F.col("ks") + F.col("kt")) / 2))
    )
    wbest = Window.partitionBy("sid").orderBy(F.desc("margin"), "tid")
    return (
        m.withColumn("rn", F.row_number().over(wbest))
        .filter((F.col("rn") == 1) & (F.col("margin") >= margin_floor))
        .select("sid", "tid", "cos", F.round("margin", 6).alias("margin"))
        .orderBy("sid")
    )


@query(
    "mine_bitext_margin_ann",
    # rows-only by design (the k-means coarse quantizer is not SQL-
    # expressible). Pinned by tests/test_r7.py: (a) >=90% pick
    # agreement with the dense-cross-join variant on an ALIGNED
    # bitext-style fixture (paired vectors, the geometry the miner
    # exists for), (b) measured agreement floor on the near-random
    # testdata fixture, (c) a plan test asserting the pair stage is an
    # equi-join — no BroadcastNestedLoopJoin/CartesianProduct over two
    # unbounded sides.
    oracle=None,
    tags=("llm", "embedding", "mining", "bitext", "ann", "scale"),
)
def mine_bitext_margin_ann(spark, sf_dir):
    """MARGIN-BASED BITEXT MINING ON THE ANN CANDIDATE STREAM — the
    100 TB plan the r6 verdict asked to make real (its dense twin
    ``mine_bitext_margin`` stays registered as the oracle foil, the
    ``window_range_frame``/``_bucketed`` pairing): a shared coarse
    quantizer (driver-local seeded Lloyd over a hash-spread sample,
    ~sqrt(n) centroids) assigns the target side to inverted lists and
    the source side probes its ``nprobe`` nearest cells, so the pair
    relation is the CELL-LOCAL candidate stream (~n^1.5·nprobe/n per
    side-pair) instead of the dense |src|x|tgt| cross join — the one
    quadratic pair relation the r6 corpus had left. The Artetxe &
    Schwenk ratio-margin algebra (top-k density normalizers, best-
    margin pick per source) runs unchanged over the candidates, with
    the k-NN means computed over the shortlist exactly as every public
    CCMatrix-style miner does at scale.

    Determinism: same 6-dp cosine rounding and (margin, tid) tiebreak
    as the dense variant; the quantizer sample is hash-ordered with a
    vec_id tiebreak and Lloyd is seeded."""
    e = t(spark, sf_dir, "embeddings")
    return mine_bitext_margin_ann_df(e)


# ----------------------------------------------- streaming ANN probe


@query(
    "stream_ann_probe",
    # rows-only by design (k-means quantizer). The STREAMING side is
    # pinned by tests/test_r7.py::test_stream_ann_probe_equals_batch
    # (per-micro-batch results union == this batch relation, with
    # partition pruning asserted in every micro-batch's executed plan)
    # and ::test_stream_ann_probe_replay_idempotent.
    oracle=None,
    tags=("streaming", "llm", "ann", "ivf", "partition-pruning"),
)
def stream_ann_probe(spark, sf_dir):
    """STREAMING TOP-K ANN SERVING dual (r6 verdict ask #7): the
    partitioned IVF index was persisted and probed in batch only —
    this completes the serving story. Micro-batches of query vectors
    arrive via foreachBatch (streaming/ann_stream.py), each batch
    collects its |centroids|-bounded probe list, reads ONLY those
    inverted-list directories (static partition pruning per
    micro-batch), scores through the SAME probe_topk used here, and
    appends epoch-partitioned, replay-idempotent results.

    This registered batch dual: build the partitioned index from the
    embeddings corpus, probe it with every query vector the stream
    would deliver (vec_id % 37 == 0), return the per-query top-5 —
    the relation the streamed epochs union to exactly, however the
    stream is batched (each query vector is scored independently
    against the static index, so the dual holds for ANY batching)."""
    from gcp_etl_spark.scratch import scratch_dir
    from gcp_etl_spark.streaming.ann_stream import (
        build_partitioned_index,
        probe_relation,
        probe_topk,
        prune_index,
    )

    emb = t(spark, sf_dir, "embeddings")
    idx, centers = build_partitioned_index(
        emb, scratch_dir("ann_serve_idx"), n_centroids=8
    )
    q = probe_relation(
        emb.filter(F.col("vec_id") % 37 == 0), centers, nprobe=2
    )
    return probe_topk(prune_index(idx, q), q, k=5).orderBy("q_id", "rn")


# ------------------------------------------------------ BM25 retrieval

_BM25_TERMS = ("join", "scan", "filter")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents
    ),
    stats AS (
      SELECT count(*) AS n, sum(len(ws)) AS total_dl FROM d
    ),
    tf AS (
      SELECT doc_id, w, count(*) AS tf
      FROM (SELECT doc_id, unnest(ws) AS w FROM d)
      WHERE w IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}', '{_BM25_TERMS[2]}')
      GROUP BY 1, 2
    ),
    df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
    dl AS (SELECT doc_id, len(ws) AS dl FROM d),
    scored AS (
      SELECT tf.doc_id,
             sum(
               ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.dl
                    / (CAST(stats.total_dl AS DOUBLE) / stats.n)))
             ) AS score
      FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY 1
    )
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored ORDER BY bm25 DESC, doc_id LIMIT {_BM25_TOPK}
    """,
    tags=("text", "retrieval", "ranking"),
)
def text_bm25_topk(spark, sf_dir):
    """BM25 RANKED RETRIEVAL (Robertson/Spärck Jones; the Lucene
    ln(1 + (N-df+0.5)/(df+0.5)) idf variant, public) for a fixed term
    set over the documents corpus: per-document score summed over
    query terms with k1=1.2, b=0.75 length normalization; top-20 by
    (score desc, doc_id). Completes the retrieval story next to
    ``text_tfidf_topk`` — BM25 is what every lexical retriever
    actually ships.

    Determinism: tf/df/dl/N are exact integers in both engines, avgdl
    is one integer division in double, each term's score is the same
    closed-form double expression, and the 3-term sum is order-benign
    at 6 dp rounding (3 terms, same magnitudes — verified by the
    oracle gate).

    Scale: one corpus scan → (doc, term) tf relation (the IN-list
    prunes the explode map-side); df is a 3-row broadcast; dl rides
    the same scan. The score join is broadcast-tiny on one side; the
    top-20 is a TakeOrdered, no global sort."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias(
            "ws"
        ),
    )
    stats = d.agg(
        F.count("*").alias("n"), F.sum(F.size("ws")).alias("total_dl")
    )
    tf = (
        d.select("doc_id", F.explode("ws").alias("w"))
        .filter(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("w").agg(F.count("*").alias("df"))
    dl = d.select("doc_id", F.size("ws").alias("dl"))
    avgdl = F.col("total_dl").cast("double") / F.col("n")
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = idf * F.col("tf") * (_BM25_K1 + 1.0) / (
        F.col("tf")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / avgdl)
    )
    scored = (
        tf.join(F.broadcast(df_), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), "doc_id").limit(_BM25_TOPK)


# ---------------------------------------------- held-out perplexity

_PPL_HELDOUT_SRC = "src0"
_PPL_TOPK = 10


@query(
    "text_perplexity_heldout",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents
    ),
    train_uni AS (
      SELECT ws[i+1] AS w1, count(*) AS c1
      FROM d, unnest(range(len(ws))) AS t(i)
      WHERE source <> '{_PPL_HELDOUT_SRC}' GROUP BY 1
    ),
    train_bi AS (
      SELECT ws[i+1] AS w1, ws[i+2] AS w2, count(*) AS c2
      FROM d, unnest(range(len(ws) - 1)) AS t(i)
      WHERE source <> '{_PPL_HELDOUT_SRC}' GROUP BY 1, 2
    ),
    v AS (SELECT count(*) AS v FROM train_uni),
    held AS (
      SELECT doc_id, ws[i+1] AS w1, ws[i+2] AS w2
      FROM d, unnest(range(len(ws) - 1)) AS t(i)
      WHERE source = '{_PPL_HELDOUT_SRC}'
    ),
    lp AS (
      SELECT h.doc_id,
             CAST(round(
               ln((coalesce(b.c2, 0) + 1.0)
                  / (coalesce(u.c1, 0) + v.v)), 8) AS DECIMAL(18,8)
             ) AS logp
      FROM held h
      LEFT JOIN train_bi b ON h.w1 = b.w1 AND h.w2 = b.w2
      LEFT JOIN train_uni u ON h.w1 = u.w1
      CROSS JOIN v
    )
    SELECT doc_id, count(*) AS n_bigrams,
           round(exp(-CAST(sum(logp) AS DOUBLE) / count(*)), 4) AS ppl
    FROM lp GROUP BY doc_id
    ORDER BY ppl DESC, doc_id LIMIT {_PPL_TOPK}
    """,
    tags=("text", "language-model", "quality"),
)
def text_perplexity_heldout(spark, sf_dir):
    """HELD-OUT BIGRAM PERPLEXITY — the classic LM-based quality
    filter (CCNet/KenLM practice, public): train an add-one-smoothed
    bigram model on every source EXCEPT the held-out one, score each
    held-out document by exp(-mean log p(w2|w1)), and surface the
    ``{_PPL_TOPK}`` most-perplexing documents (the outlier/garbage
    candidates a curation pipeline reviews first).

    Determinism: counts and the vocabulary size are exact integers;
    each bigram's log-probability is ONE libm call rounded to 8 dp and
    summed as DECIMAL (order-free — the repo's standard policy for
    order-dependent double sums), so both engines divide identical
    numerators.

    Scale: train counts are two hash aggs over the train split (pair
    space vocabulary-bounded); held-out bigrams join them on bounded
    keys (broadcast-able at real vocabulary sizes); document text
    never rides a shuffle after the explode collapses map-side."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias(
            "ws"
        ),
    )
    bigrams = F.expr(
        "transform(sequence(0, size(ws) - 2),"
        " i -> struct(ws[i] AS w1, ws[i+1] AS w2))"
    )
    uni = F.explode("ws").alias("w1")
    train = d.filter(F.col("source") != _PPL_HELDOUT_SRC)
    train_uni = train.select(uni).groupBy("w1").agg(
        F.count("*").alias("c1")
    )
    train_bi = (
        train.filter(F.size("ws") >= 2)
        .select(F.explode(bigrams).alias("b"))
        .groupBy("b.w1", "b.w2")
        .agg(F.count("*").alias("c2"))
    )
    v = train_uni.agg(F.count("*").alias("v"))
    held = (
        d.filter(
            (F.col("source") == _PPL_HELDOUT_SRC) & (F.size("ws") >= 2)
        )
        .select("doc_id", F.explode(bigrams).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )
    logp = F.round(
        F.log(
            (F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
        ),
        8,
    ).cast("decimal(18,8)")
    lp = (
        held.join(train_bi, ["w1", "w2"], "left")
        .join(F.broadcast(train_uni), "w1", "left")
        .crossJoin(F.broadcast(v))
        .select("doc_id", logp.alias("logp"))
    )
    return (
        lp.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.exp(-(F.sum("logp").cast("double")) / F.count("*")), 4
            ).alias("ppl"),
        )
        .orderBy(F.desc("ppl"), "doc_id")
        .limit(_PPL_TOPK)
    )


# ------------------------------------------- Jaro-Winkler fuzzy join

_JW_SRC_A = "src0"
_JW_SRC_B = "src1"
_JW_THRESHOLD = 0.9
_JW_PREFIX_LEN = 12


def _jw_udf():
    """Vectorized Jaro-Winkler (textbook algorithm: match window
    max(|a|,|b|)/2-1, transpositions halved, Winkler prefix boost
    p=0.1 over the first 4 chars applied only when jaro > 0.7 — the
    exact semantics DuckDB's jaro_winkler_similarity implements,
    probe-verified including the no-boost-below-0.7 branch). Pure
    Python per pair but Arrow-batched; strings here are bounded
    (12-char blocking keys), and at production scale this is the
    documented slow path a C extension would replace — the PLAN
    (blocked equi-join, no cross product) is the scale claim."""
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def jaro(s1: str, s2: str) -> float:
        if s1 == s2:
            return 1.0
        l1, l2 = len(s1), len(s2)
        if not l1 or not l2:
            return 0.0
        md = max(l1, l2) // 2 - 1
        m1 = [False] * l1
        m2 = [False] * l2
        matches = 0
        for i, c in enumerate(s1):
            lo, hi = max(0, i - md), min(l2, i + md + 1)
            for j in range(lo, hi):
                if not m2[j] and s2[j] == c:
                    m1[i] = m2[j] = True
                    matches += 1
                    break
        if not matches:
            return 0.0
        tr = 0
        k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    tr += 1
                k += 1
        tr //= 2
        return (
            matches / l1 + matches / l2 + (matches - tr) / matches
        ) / 3

    @pandas_udf("double")
    def jw(a, b):  # (pd.Series, pd.Series) -> pd.Series
        out = []
        for s1, s2 in zip(a, b):
            j = jaro(s1, s2)
            if j > 0.7:
                pre = 0
                for c1, c2 in zip(s1[:4], s2[:4]):
                    if c1 != c2:
                        break
                    pre += 1
                j = j + pre * 0.1 * (1.0 - j)
            out.append(j)
        return pd.Series(out)

    return jw


@query(
    "fuzzy_jaro_winkler_join",
    oracle=f"""
    WITH a AS (
      SELECT doc_id, substr(lower(text), 1, {_JW_PREFIX_LEN}) AS k
      FROM documents WHERE source = '{_JW_SRC_A}'
    ),
    b AS (
      SELECT doc_id, substr(lower(text), 1, {_JW_PREFIX_LEN}) AS k
      FROM documents WHERE source = '{_JW_SRC_B}'
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(jaro_winkler_similarity(a.k, b.k), 6) AS jw
    FROM a JOIN b ON substr(a.k, 1, 1) = substr(b.k, 1, 1)
    WHERE round(jaro_winkler_similarity(a.k, b.k), 6) >= {_JW_THRESHOLD}
    ORDER BY id_a, id_b
    """,
    tags=("text", "fuzzy", "entity-resolution", "udf"),
)
def fuzzy_jaro_winkler_join(spark, sf_dir):
    """JARO-WINKLER FUZZY JOIN — the entity-resolution string matcher
    (record linkage's standard scorer) as a BLOCKED join: cross-source
    12-char key prefixes are candidate-paired only within a first-
    character block (an equi-join — never a cross product), scored by
    a vectorized Jaro-Winkler pandas UDF, and kept at >= {_JW_THRESHOLD}.
    Hash-verified against DuckDB's native jaro_winkler_similarity —
    the UDF replicates its exact semantics (probe-verified incl. the
    no-boost-below-0.7-jaro branch), so this is a cross-engine test of
    a nontrivial string metric, not just of the join shape.

    Scale: blocking bounds candidates to Σ_block |A_b|·|B_b| (the
    standard record-linkage trade); scoring ships only the bounded
    keys through Arrow. A skewed block is a salting candidate like any
    hot join key (operators/skew.py)."""
    jw = _jw_udf()
    d = t(spark, sf_dir, "documents")
    key = F.substring(F.lower("text"), 1, _JW_PREFIX_LEN)
    a = d.filter(F.col("source") == _JW_SRC_A).select(
        F.col("doc_id").alias("id_a"), key.alias("ka")
    )
    b = d.filter(F.col("source") == _JW_SRC_B).select(
        F.col("doc_id").alias("id_b"), key.alias("kb")
    )
    pairs = a.join(
        b, F.substring("ka", 1, 1) == F.substring("kb", 1, 1)
    ).withColumn("jw", F.round(jw(F.col("ka"), F.col("kb")), 6))
    return (
        pairs.filter(F.col("jw") >= _JW_THRESHOLD)
        .select("id_a", "id_b", "jw")
        .orderBy("id_a", "id_b")
    )


# ------------------------------------------------- winsorized stats


@query(
    "agg_winsorized_stats",
    oracle="""
    WITH q AS (
      SELECT event_type,
             round(quantile_cont(value, 0.05), 6) AS p05,
             round(quantile_cont(value, 0.95), 6) AS p95
      FROM events GROUP BY 1
    ),
    c AS (
      SELECT e.event_type,
             CAST(round(least(greatest(e.value, q.p05), q.p95), 6)
                  AS DECIMAL(18,6)) AS clipped
      FROM events e JOIN q USING (event_type)
    )
    SELECT c.event_type, count(*) AS n,
           any_value(q.p05) AS p05, any_value(q.p95) AS p95,
           round(CAST(sum(clipped) AS DOUBLE) / count(*), 6)
             AS winsorized_mean
    FROM c JOIN q ON c.event_type = q.event_type
    GROUP BY 1
    """,
    tags=("aggregate", "robust-stats", "quantiles"),
)
def agg_winsorized_stats(spark, sf_dir):
    """WINSORIZED MEAN per group (clip to [p05, p95], then average) —
    the robust location estimate feature pipelines use when trimming
    would change row counts. Composes the engine-standard two-pass
    range-partitioned exact quantile operator for the clip bounds.

    Determinism: bounds are rounded to 6 dp BEFORE clipping (both
    engines clip against identical doubles), the clipped value is
    rounded and summed as DECIMAL (order-free), and only the final
    mean divides in double.

    Scale: one quantile pass (two range exchanges inside the
    operator), bounds broadcast back, one decimal hash agg — the
    clipped values never sort."""
    from gcp_etl_spark.operators.quantiles import exact_quantiles

    e = t(spark, sf_dir, "events").select("event_type", "value")
    q = exact_quantiles(
        e, "value", {"p05": 0.05, "p95": 0.95}, group_cols=["event_type"]
    ).select(
        "event_type",
        F.round("p05", 6).alias("p05"),
        F.round("p95", 6).alias("p95"),
    )
    clipped = F.round(
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")), 6
    ).cast("decimal(18,6)")
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.any_value("p05").alias("p05"),
            F.any_value("p95").alias("p95"),
            F.round(
                F.sum(clipped).cast("double") / F.count("*"), 6
            ).alias("winsorized_mean"),
        )
    )


# ------------------------------------------ snapshot stats drift


@query(
    "dq_snapshot_stats_drift",
    oracle="""
    WITH v1 AS (
      SELECT source, lang, n_chars FROM documents
    ),
    v2 AS (
      -- simulated next snapshot, same rule as corpus_snapshot_diff:
      -- every 10th doc dropped, every 7th survivor re-crawled with a
      -- 10-char prefix added
      SELECT source, lang,
             CASE WHEN doc_id % 7 = 0 THEN n_chars + 10
                  ELSE n_chars END AS n_chars
      FROM documents WHERE doc_id % 10 <> 0
    ),
    s1 AS (
      SELECT source, count(*) AS n1, sum(n_chars) AS chars1,
             count(DISTINCT lang) AS langs1
      FROM v1 GROUP BY 1
    ),
    s2 AS (
      SELECT source, count(*) AS n2, sum(n_chars) AS chars2,
             count(DISTINCT lang) AS langs2
      FROM v2 GROUP BY 1
    )
    SELECT source,
           n1 AS n_v1, n2 AS n_v2,
           round((n2 - n1) * 100.0 / n1, 4) AS row_delta_pct,
           round(CAST(chars1 AS DOUBLE) / n1, 6) AS avg_chars_v1,
           round(CAST(chars2 AS DOUBLE) / n2, 6) AS avg_chars_v2,
           langs1 AS n_langs_v1, langs2 AS n_langs_v2
    FROM s1 JOIN s2 USING (source) ORDER BY source
    """,
    tags=("data-quality", "drift", "profiling"),
)
def dq_snapshot_stats_drift(spark, sf_dir):
    """COLUMN-LEVEL SNAPSHOT DRIFT REPORT — the per-source statistical
    diff a pipeline owner reads before promoting a new crawl
    (row-count delta, mean document length, language cardinality),
    complementing ``corpus_snapshot_diff`` (which diffs row IDENTITY
    by fingerprint, not distribution). Both engines derive snapshot v2
    from the same rule, so the report is hash-verified end-to-end.

    Determinism: counts and char sums are exact integers; the only
    doubles are final divisions. Scale: two scans of the snapshot pair
    (columnar — only 3 columns read), two hash aggs on the bounded
    source key, broadcast join of two #sources-row relations."""
    d = t(spark, sf_dir, "documents")
    v1 = d.select("source", "lang", "n_chars")
    v2 = d.filter(F.col("doc_id") % 10 != 0).select(
        "source",
        "lang",
        F.when(F.col("doc_id") % 7 == 0, F.col("n_chars") + 10)
        .otherwise(F.col("n_chars"))
        .alias("n_chars"),
    )

    def stats(df, sfx):
        return df.groupBy("source").agg(
            F.count("*").alias(f"n{sfx}"),
            F.sum("n_chars").alias(f"chars{sfx}"),
            F.countDistinct("lang").alias(f"langs{sfx}"),
        )

    s1, s2 = stats(v1, "1"), stats(v2, "2")
    return (
        s1.join(s2, "source")
        .select(
            "source",
            F.col("n1").alias("n_v1"),
            F.col("n2").alias("n_v2"),
            F.round(
                (F.col("n2") - F.col("n1")) * 100.0 / F.col("n1"), 4
            ).alias("row_delta_pct"),
            F.round(
                F.col("chars1").cast("double") / F.col("n1"), 6
            ).alias("avg_chars_v1"),
            F.round(
                F.col("chars2").cast("double") / F.col("n2"), 6
            ).alias("avg_chars_v2"),
            F.col("langs1").alias("n_langs_v1"),
            F.col("langs2").alias("n_langs_v2"),
        )
        .orderBy("source")
    )


# --------------------------------------------- stratified group k-fold

_KFOLD_K = 5


@query(
    "prep_stratified_kfold",
    oracle=f"""
    WITH r AS (
      SELECT lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT lang, CAST((rn - 1) % {_KFOLD_K} AS INT) AS fold,
           count(*) AS n_docs
    FROM r GROUP BY 1, 2 ORDER BY lang, fold
    """,
    tags=("llm", "prep", "sampling", "cross-validation"),
)
def prep_stratified_kfold(spark, sf_dir):
    """STRATIFIED K-FOLD ASSIGNMENT — deterministic 5-fold cross-
    validation splits balanced WITHIN each stratum (language): rows
    rank by a seeded hash inside their stratum and fold = rank mod k,
    so every (lang, fold) cell is exactly ±1 of stratum/k — the
    guarantee hash-bucketing alone (``sample_stratified``) cannot give.

    Determinism: the in-stratum order is the md5 hex STRING of doc_id
    (lexicographic, identical in both engines) with doc_id tiebreak.

    Scale: in-stratum ranks route through the engine's two-pass
    range-partitioned global row number (operators/quantiles.py) —
    bounded stratum count, unbounded rows per stratum, no
    single-partition window."""
    from gcp_etl_spark.operators.quantiles import global_row_number

    d = t(spark, sf_dir, "documents").select(
        "lang", F.md5(F.col("doc_id").cast("string")).alias("h"), "doc_id"
    )
    ranked = global_row_number(
        d, order_cols=["h", "doc_id"], part_cols=["lang"], rn_col="rn"
    )
    return (
        ranked.select(
            "lang",
            ((F.col("rn") - 1) % _KFOLD_K).cast("int").alias("fold"),
        )
        .groupBy("lang", "fold")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "fold")
    )


# -------------------------------------------- streaming KMV distinct

_KMVD_K = 64


@query(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) / 4294967296.0 AS h
      FROM events
    ),
    bk AS (SELECT h FROM h ORDER BY h LIMIT {_KMVD_K}),
    s AS (SELECT count(*) AS k_used, max(h) AS kth FROM bk)
    SELECT k_used,
           round(kth, 9) AS kth_hash,
           round(CASE WHEN k_used < {_KMVD_K}
                      THEN CAST(k_used AS DOUBLE)
                      ELSE ({_KMVD_K} - 1) / kth END, 4) AS est_distinct
    FROM s
    """,
    tags=("sketch", "distinct-count", "streaming-dual"),
)
def sketch_kmv_distinct(spark, sf_dir):
    """KMV (bottom-k) DISTINCT-COUNT SKETCH of event users — the
    single-set companion to ``sketch_kmv_overlap``, registered as the
    batch dual of the STREAMING sketch (streaming/kmv_stream.py): KMV
    is exactly mergeable (global bottom-k == bottom-k of per-epoch
    bottom-k's), so the streamed per-micro-batch sketches merge to
    THIS relation bit-for-bit however the stream is batched — pinned
    by tests/test_r7.py::test_stream_kmv_equals_batch + the replay-
    idempotence twin.

    Determinism: the hash is the engine-standard md5 uniform; the
    estimator (k-1)/h_k divides identical doubles.

    Scale: the corpus reduces to k=64 doubles via per-partition
    TakeOrdered — distinct users never shuffle; per-epoch streaming
    state is ~512 B."""
    from gcp_etl_spark.streaming.kmv_stream import kmv_bottom_k, kmv_estimate

    e = t(spark, sf_dir, "events")
    return kmv_estimate(kmv_bottom_k(e, "user_id", _KMVD_K), _KMVD_K)


# ------------------------------------------------- Gopher quality rules

# thresholds adapted to the synthetic corpus's ~30-90-word documents;
# the RULE STRUCTURE is Rae et al. 2021 (Gopher, public) Appendix A
_GOPHER_MIN_WORDS = 20
_GOPHER_MAX_WORDS = 500
_GOPHER_MIN_MEAN_WLEN = 3.0
_GOPHER_MAX_MEAN_WLEN = 10.0
_GOPHER_MAX_NONALPHA = 0.2
_GOPHER_STOPWORDS = ("the", "a", "value", "table")
_GOPHER_MIN_STOPHITS = 2


@query(
    "quality_gopher_rules",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents
    ),
    m AS (
      SELECT doc_id, source,
             len(ws) AS n_words,
             CAST(len(list_filter(ws, w -> NOT regexp_matches(w, '^[a-z]+$')))
                  AS DOUBLE) / len(ws) AS nonalpha_ratio,
             CAST(list_sum(list_transform(ws, w -> strlen(w))) AS DOUBLE)
               / len(ws) AS mean_wlen,
             len(list_filter(ws, w -> w IN
                 ('{_GOPHER_STOPWORDS[0]}', '{_GOPHER_STOPWORDS[1]}',
                  '{_GOPHER_STOPWORDS[2]}', '{_GOPHER_STOPWORDS[3]}')))
               AS stop_hits
      FROM d WHERE len(ws) > 0
    ),
    f AS (
      SELECT source,
             CASE WHEN n_words < {_GOPHER_MIN_WORDS}
                    OR n_words > {_GOPHER_MAX_WORDS} THEN 1 ELSE 0 END
               AS fail_words,
             CASE WHEN mean_wlen < {_GOPHER_MIN_MEAN_WLEN}
                    OR mean_wlen > {_GOPHER_MAX_MEAN_WLEN} THEN 1 ELSE 0 END
               AS fail_wlen,
             CASE WHEN nonalpha_ratio > {_GOPHER_MAX_NONALPHA} THEN 1
                  ELSE 0 END AS fail_symbols,
             CASE WHEN stop_hits < {_GOPHER_MIN_STOPHITS} THEN 1 ELSE 0 END
               AS fail_stop
      FROM m
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(fail_words) AS BIGINT) AS n_fail_word_count,
           CAST(sum(fail_wlen) AS BIGINT) AS n_fail_mean_word_len,
           CAST(sum(fail_symbols) AS BIGINT) AS n_fail_symbol_ratio,
           CAST(sum(fail_stop) AS BIGINT) AS n_fail_stopwords,
           CAST(sum(CASE WHEN fail_words + fail_wlen + fail_symbols
                    + fail_stop = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           round(sum(CASE WHEN fail_words + fail_wlen + fail_symbols
                          + fail_stop = 0 THEN 1 ELSE 0 END)
                 * 100.0 / count(*), 4) AS pass_pct
    FROM f GROUP BY source ORDER BY source
    """,
    tags=("llm", "quality", "filter", "text"),
)
def quality_gopher_rules(spark, sf_dir):
    """GOPHER QUALITY-FILTER RULES (Rae et al. 2021 Appendix A,
    public; thresholds adapted to the synthetic corpus, structure
    verbatim): per document — word-count bounds, mean-word-length
    bounds, non-alphabetic word ratio cap, minimum stop-word hits —
    reported as a per-source audit (failure counts per rule + overall
    pass rate), the table a curation run reviews before applying the
    gate. Complements the shipped logreg quality classifier with the
    rule-based filter every public corpus pipeline starts from.

    Determinism: all rule inputs are exact integers or single-division
    doubles compared against literal thresholds; counts are integers.

    Scale: one corpus scan; every per-doc metric is a map-side array
    expression (no explode — list aggregates run inside the row), one
    hash agg on the bounded source key."""
    ws = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "source", ws.alias("ws"))
        .filter(F.size("ws") > 0)
    )
    n_words = F.size("ws")
    nonalpha = F.size(
        F.filter("ws", lambda w: ~w.rlike("^[a-z]+$"))
    ).cast("double") / n_words
    mean_wlen = (
        F.aggregate(
            F.transform("ws", lambda w: F.length(w)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("double")
        / n_words
    )
    stop_hits = F.size(
        F.filter("ws", lambda w: w.isin(*_GOPHER_STOPWORDS))
    )
    m = d.select(
        "source",
        (
            (n_words < _GOPHER_MIN_WORDS) | (n_words > _GOPHER_MAX_WORDS)
        ).cast("int").alias("fail_words"),
        (
            (mean_wlen < _GOPHER_MIN_MEAN_WLEN)
            | (mean_wlen > _GOPHER_MAX_MEAN_WLEN)
        ).cast("int").alias("fail_wlen"),
        (nonalpha > _GOPHER_MAX_NONALPHA).cast("int").alias("fail_symbols"),
        (stop_hits < _GOPHER_MIN_STOPHITS).cast("int").alias("fail_stop"),
    )
    all_pass = (
        F.col("fail_words") + F.col("fail_wlen") + F.col("fail_symbols")
        + F.col("fail_stop")
        == 0
    ).cast("int")
    return (
        m.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("fail_words").alias("n_fail_word_count"),
            F.sum("fail_wlen").alias("n_fail_mean_word_len"),
            F.sum("fail_symbols").alias("n_fail_symbol_ratio"),
            F.sum("fail_stop").alias("n_fail_stopwords"),
            F.sum(all_pass).alias("n_pass"),
            F.round(F.sum(all_pass) * 100.0 / F.count("*"), 4).alias(
                "pass_pct"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------- CCNet perplexity buckets


@query(
    "quality_ccnet_buckets",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents
    ),
    train_uni AS (
      SELECT ws[i+1] AS w1, count(*) AS c1
      FROM d, unnest(range(len(ws))) AS t(i)
      WHERE source <> '{_PPL_HELDOUT_SRC}' GROUP BY 1
    ),
    train_bi AS (
      SELECT ws[i+1] AS w1, ws[i+2] AS w2, count(*) AS c2
      FROM d, unnest(range(len(ws) - 1)) AS t(i)
      WHERE source <> '{_PPL_HELDOUT_SRC}' GROUP BY 1, 2
    ),
    v AS (SELECT count(*) AS v FROM train_uni),
    scored_b AS (
      SELECT h.doc_id, h.source,
             CAST(round(
               ln((coalesce(b.c2, 0) + 1.0)
                  / (coalesce(u.c1, 0) + v.v)), 8) AS DECIMAL(18,8)
             ) AS logp
      FROM (SELECT doc_id, source, ws[i+1] AS w1, ws[i+2] AS w2
            FROM d, unnest(range(len(ws) - 1)) AS t(i)) h
      LEFT JOIN train_bi b ON h.w1 = b.w1 AND h.w2 = b.w2
      LEFT JOIN train_uni u ON h.w1 = u.w1
      CROSS JOIN v
    ),
    ppl AS (
      SELECT doc_id, source,
             round(exp(-CAST(sum(logp) AS DOUBLE) / count(*)), 4) AS ppl
      FROM scored_b GROUP BY 1, 2
    ),
    cuts AS (
      SELECT round(quantile_cont(ppl, 1.0/3), 6) AS c1,
             round(quantile_cont(ppl, 2.0/3), 6) AS c2
      FROM ppl
    )
    SELECT source,
           CASE WHEN ppl <= c1 THEN 'head'
                WHEN ppl <= c2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           count(*) AS n_docs,
           round(min(ppl), 4) AS min_ppl,
           round(max(ppl), 4) AS max_ppl
    FROM ppl CROSS JOIN cuts
    GROUP BY 1, 2 ORDER BY source, bucket
    """,
    tags=("llm", "quality", "language-model", "curation"),
)
def quality_ccnet_buckets(spark, sf_dir):
    """CCNET HEAD/MIDDLE/TAIL BUCKETS (Wenzek et al. 2020, public):
    score EVERY document's bigram perplexity under the LM trained on
    the non-held-out sources, cut the corpus at the global perplexity
    terciles, and report per-(source, bucket) counts — the exact
    partitioning CCNet ships to let consumers trade quality against
    volume (train on head, sample middle, drop tail).

    Determinism: the per-bigram log-prob policy is shared with
    ``text_perplexity_heldout`` (8 dp round → decimal sum); tercile
    cuts are exact interpolated quantiles rounded at 6 dp before the
    bucket compare, so both engines bucket identical doubles.

    Scale: LM counts are vocabulary-bounded hash aggs; scoring joins
    on bounded keys; the tercile cut is ONE two-pass range-partitioned
    quantile over the per-doc ppl relation (never a single-reducer
    percentile); bucketing is a broadcast of two doubles."""
    from gcp_etl_spark.operators.quantiles import exact_quantiles, prefer_agg

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias(
            "ws"
        ),
    )
    bigrams = F.expr(
        "transform(sequence(0, size(ws) - 2),"
        " i -> struct(ws[i] AS w1, ws[i+1] AS w2))"
    )
    train = d.filter(F.col("source") != _PPL_HELDOUT_SRC)
    # NOTE (r12): train_uni also feeds the vocabulary count — a
    # re-expansion — but a barrier here was MEASURED SLOWER (+2 s
    # interleaved A/B): the broadcast side of the scoring join then
    # waits on a serial materialization job, where the re-expanded
    # explode+groupBy overlapped with the stream side on idle cores
    train_uni = train.select(F.explode("ws").alias("w1")).groupBy("w1").agg(
        F.count("*").alias("c1")
    )
    train_bi = (
        train.filter(F.size("ws") >= 2)
        .select(F.explode(bigrams).alias("b"))
        .groupBy("b.w1", "b.w2")
        .agg(F.count("*").alias("c2"))
    )
    v = train_uni.agg(F.count("*").alias("v"))
    held = (
        d.filter(F.size("ws") >= 2)
        .select("doc_id", "source", F.explode(bigrams).alias("b"))
        .select("doc_id", "source", "b.w1", "b.w2")
    )
    logp = F.round(
        F.log(
            (F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
        ),
        8,
    ).cast("decimal(18,8)")
    ppl = (
        held.join(train_bi, ["w1", "w2"], "left")
        .join(F.broadcast(train_uni), "w1", "left")
        .crossJoin(F.broadcast(v))
        .select("doc_id", "source", logp.alias("logp"))
        .groupBy("doc_id", "source")
        .agg(
            F.round(
                F.exp(-(F.sum("logp").cast("double")) / F.count("*")), 4
            ).alias("ppl")
        )
    )
    # decide the tercile-cut strategy while Catalyst stats are still
    # attached, THEN cut lineage (r12, guide §1.2): ppl — the whole
    # scan -> bigram explode -> LM joins -> per-doc agg pipeline —
    # feeds the quantile cut AND the final bucketing pass; without the
    # barrier the optimizer re-expanded it into every consumer (16
    # documents scans / 16 Generates in one plan). The gate fires
    # before the barrier so the choice stays scale-adaptive (rank at
    # 100 TB estimates).
    strat = "agg" if prefer_agg(ppl.select(F.col("ppl").cast("double"))) else "rank"
    ppl = ppl.transform(barrier)
    cuts = exact_quantiles(
        ppl, "ppl", {"c1": 1.0 / 3, "c2": 2.0 / 3}, strategy=strat
    ).select(
        F.round("c1", 6).alias("c1"), F.round("c2", 6).alias("c2")
    )
    bucket = (
        F.when(F.col("ppl") <= F.col("c1"), "head")
        .when(F.col("ppl") <= F.col("c2"), "middle")
        .otherwise("tail")
    )
    return (
        ppl.crossJoin(F.broadcast(cuts))
        .select("source", bucket.alias("bucket"), "ppl")
        .groupBy("source", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.min("ppl"), 4).alias("min_ppl"),
            F.round(F.max("ppl"), 4).alias("max_ppl"),
        )
        .orderBy("source", "bucket")
    )


# ------------------------------------------- epoch-resume loader order

_RESUME_EPOCH = 2
_RESUME_OFFSET = 100
_RESUME_TAKE = 20


@query(
    "prep_epoch_resume_order",
    oracle=f"""
    WITH r AS (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY md5('{_RESUME_EPOCH}:' || CAST(doc_id AS VARCHAR)),
                        doc_id
             ) AS pos
      FROM documents
    )
    SELECT pos, doc_id FROM r
    WHERE pos > {_RESUME_OFFSET} AND pos <= {_RESUME_OFFSET} + {_RESUME_TAKE}
    ORDER BY pos
    """,
    tags=("llm", "prep", "training", "determinism"),
)
def prep_epoch_resume_order(spark, sf_dir):
    """EPOCH-SEEDED RESUME SLICE — the data-loader contract a training
    run needs after a crash: each epoch defines a deterministic global
    permutation (rank by md5 of ``epoch:doc_id``), and resuming from
    step K means serving ranks K+1..K+take of THAT epoch's order, not
    re-shuffling. Completes ``prep_training_order`` (epoch-less global
    order) with the per-epoch reseed + offset semantics.

    Determinism: the permutation key is an md5 hex string compared
    lexicographically — byte-identical in both engines — with doc_id
    tiebreak.

    Scale: ranks come from the two-pass range-partitioned global row
    number; the resume slice is a broadcast-range filter on the rank
    (at 100 TB the loader would ADDITIONALLY range-prune the rank
    relation by partition bounds — same algebra)."""
    from gcp_etl_spark.operators.quantiles import global_row_number

    d = t(spark, sf_dir, "documents").select(
        F.md5(
            F.concat(
                F.lit(f"{_RESUME_EPOCH}:"), F.col("doc_id").cast("string")
            )
        ).alias("h"),
        "doc_id",
    )
    ranked = global_row_number(
        d, order_cols=["h", "doc_id"], rn_col="pos"
    )
    return (
        ranked.filter(
            (F.col("pos") > _RESUME_OFFSET)
            & (F.col("pos") <= _RESUME_OFFSET + _RESUME_TAKE)
        )
        .select("pos", "doc_id")
        .orderBy("pos")
    )


# ---------------------------------------------- KS two-sample test

_KS_A = "view"
_KS_B = "purchase"


@query(
    "stats_ks_two_sample",
    oracle=f"""
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
    ),
    dv AS (
      SELECT value, sum(a) AS ca, sum(b) AS cb FROM s GROUP BY value
    ),
    n AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM dv),
    c AS (
      SELECT sum(ca) OVER (ORDER BY value) AS cuma,
             sum(cb) OVER (ORDER BY value) AS cumb
      FROM dv
    ),
    d AS (
      SELECT max(abs(cuma * n.nb - cumb * n.na)) AS dnum
      FROM c CROSS JOIN n
    )
    SELECT CAST(n.na AS BIGINT) AS n_a, CAST(n.nb AS BIGINT) AS n_b,
           round(CAST(dnum AS DOUBLE) / (n.na * n.nb), 9) AS ks_d,
           round(least(1.0,
                 2 * exp(-2.0 * (CAST(dnum AS DOUBLE) / (n.na * n.nb))
                             * (CAST(dnum AS DOUBLE) / (n.na * n.nb))
                             * n.na * n.nb / (n.na + n.nb))), 6)
             AS p_asymptotic
    FROM d CROSS JOIN n
    """,
    tags=("stats", "hypothesis-test", "distribution"),
)
def stats_ks_two_sample(spark, sf_dir):
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV TEST (distribution equality of
    ``value`` between two event types): D = sup|F_a - F_b| over the
    pooled ECDF, with the one-term asymptotic p-value
    2·exp(-2D²·n_a·n_b/(n_a+n_b)). The distribution-free companion to
    the rank tests (Mann-Whitney, Wilcoxon) already in the suite.

    INTEGER-EXACT D: both ECDFs are cumulative COUNTS over the sorted
    distinct values, and the supremum is computed on the integer
    cross-normalized gap |cum_a·n_b − cum_b·n_a| — division happens
    once, on the final maximum, so the statistic is bit-identical
    cross-engine with zero float-boundary ambiguity.

    Scale: collapses to one row per DISTINCT value (map-side), then
    the engine-standard two-pass range-partitioned cumulative sum
    (in-partition cumsum + broadcast prefix offsets) — never a
    single-partition window over unbounded distinct values; the
    supremum is a plain max agg."""
    from gcp_etl_spark.operators.quantiles import range_prefix_sums

    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_KS_A, _KS_B)
    )
    dv = e.groupBy("value").agg(
        F.sum((F.col("event_type") == _KS_A).cast("long")).alias("ca"),
        F.sum((F.col("event_type") == _KS_B).cast("long")).alias("cb"),
    )
    # shared two-pass cumulative-sum primitive (both ECDFs in one call)
    cum, psums = range_prefix_sums(dv, ["value"], ["ca", "cb"])
    n = psums.agg(
        F.sum("ca_psum").alias("na"), F.sum("cb_psum").alias("nb")
    )
    # decimal(38,0) for the cross-normalized products: at >~3e9 rows
    # per side cum·n exceeds int64 (the DuckDB oracle computes these
    # in 128-bit HUGEINT) — decimal keeps the Spark side integer-exact
    # to the oracle's width instead of ANSI-erroring at scale
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    d = cum.crossJoin(F.broadcast(n)).agg(
        F.max(
            F.abs(
                dec("ca_cum") * dec("nb") - dec("cb_cum") * dec("na")
            )
        ).alias("dnum"),
        F.any_value("na").alias("na"),
        F.any_value("nb").alias("nb"),
    )
    ks = F.col("dnum").cast("double") / (F.col("na") * F.col("nb"))
    return d.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(ks, 9).alias("ks_d"),
        F.round(
            # clamp: the one-term asymptotic series exceeds 1 for
            # small D (review finding) — a probability caps at 1
            F.least(
                F.lit(1.0),
                2
                * F.exp(
                    -2.0 * ks * ks * F.col("na") * F.col("nb")
                    / (F.col("na") + F.col("nb"))
                ),
            ),
            6,
        ).alias("p_asymptotic"),
    )


# ----------------------------------------------- Benford digit audit


@query(
    "dq_benford_first_digit",
    oracle="""
    WITH cents AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value > 0
    ),
    digit AS (
      -- sub-cent amounts (cents = 0) carry no leading digit at the
      -- cents granularity this audit runs at; excluded in both engines
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS d
      FROM cents WHERE c >= 1
    ),
    obs AS (SELECT d, count(*) AS n FROM digit GROUP BY d),
    tot AS (SELECT sum(n) AS total FROM obs)
    SELECT d AS digit, CAST(n AS BIGINT) AS n_obs,
           round(CAST(n AS DOUBLE) / total, 6) AS obs_share,
           round(log10(1.0 + 1.0 / d), 6) AS benford_share,
           round(power(CAST(n AS DOUBLE) / total - log10(1.0 + 1.0 / d), 2)
                 / log10(1.0 + 1.0 / d) * total, 6) AS chi2_term
    FROM obs CROSS JOIN tot ORDER BY digit
    """,
    tags=("data-quality", "audit", "stats"),
)
def dq_benford_first_digit(spark, sf_dir):
    """BENFORD'S LAW FIRST-DIGIT AUDIT — the classic anomaly screen
    for fabricated or truncated numeric columns: observed
    first-significant-digit shares of ``value`` against log10(1+1/d),
    with per-digit chi-square contributions (sum them for the test
    statistic). A pipeline runs this over ingested monetary/metric
    columns as a cheap data-forensics gate.

    Determinism: digits come from the exact cents integer; shares and
    the Benford reference are single-expression doubles rounded at 6
    dp. Scale: one scan, a 9-row hash agg, a broadcast total."""
    cents = (
        t(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .select(F.round(F.col("value") * 100).cast("long").alias("c"))
        # sub-cent amounts round to 0 cents: no leading digit at this
        # granularity (review finding — digit 0 would emit NULL shares)
        .filter(F.col("c") >= 1)
        .select(
            F.col("c").cast("string").substr(1, 1).cast("int").alias("d")
        )
    )
    obs = cents.groupBy("d").agg(F.count("*").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    share = F.col("n").cast("double") / F.col("total")
    benford = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"),
            F.col("n").alias("n_obs"),
            F.round(share, 6).alias("obs_share"),
            F.round(benford, 6).alias("benford_share"),
            F.round(
                F.pow(share - benford, 2) / benford * F.col("total"), 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# --------------------------------------------------- QQ decile table


@query(
    "stats_qq_deciles",
    oracle=f"""
    WITH idx AS (SELECT unnest(range(1, 10)) AS i),
    qa AS (
      SELECT quantile_cont(value,
               [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
      FROM events WHERE event_type = '{_KS_A}'
    ),
    qb AS (
      SELECT quantile_cont(value,
               [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
      FROM events WHERE event_type = '{_KS_B}'
    )
    SELECT CAST(i / 10.0 AS DOUBLE) AS p,
           round(qa.qs[CAST(i AS INT)], 6) AS q_a,
           round(qb.qs[CAST(i AS INT)], 6) AS q_b,
           round(qb.qs[CAST(i AS INT)] - qa.qs[CAST(i AS INT)], 6) AS gap
    FROM idx CROSS JOIN qa CROSS JOIN qb ORDER BY p
    """,
    tags=("stats", "distribution", "quantiles"),
)
def stats_qq_deciles(spark, sf_dir):
    """QUANTILE-QUANTILE DECILE TABLE between two event types — the
    numeric backbone of a Q-Q plot (where the distributions diverge,
    and by how much at each decile), complementing the KS test's
    single-number answer with the location-by-location picture.

    Scale: BOTH decile sweeps run in ONE grouped call of the two-pass
    range-partitioned exact quantile operator (event_type is the group
    key — one exchange serves both sides, nine probabilities amortize
    it); the pivot join is 9×9 rows."""
    from gcp_etl_spark.operators.quantiles import exact_quantiles

    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_KS_A, _KS_B)
    )
    probs = {f"d{int(p*10)}": round(p, 1) for p in
             (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)}
    q = exact_quantiles(
        e, "value", probs, group_cols=["event_type"]
    )

    def side(tp, out):
        pairs = F.array(
            *[
                F.struct(
                    F.lit(p).alias("p"),
                    F.round(F.col(name), 6).alias(out),
                )
                for name, p in probs.items()
            ]
        )
        return (
            q.filter(F.col("event_type") == tp)
            .select(F.explode(pairs).alias("e"))
            .select("e.p", f"e.{out}")
        )

    qa, qb = side(_KS_A, "q_a"), side(_KS_B, "q_b")
    return (
        qa.join(qb, "p")
        .select(
            "p", "q_a", "q_b",
            F.round(F.col("q_b") - F.col("q_a"), 6).alias("gap"),
        )
        .orderBy("p")
    )


# ------------------------------------- bloom-prefiltered decontamination

_BLOOM_EVAL_SRC = "src0"
_BLOOM_N = 5  # n-gram width
_BLOOM_TOPK = 20


@query(
    "decontaminate_bloom_verified",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id, source,
             ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' '
               || ws[i+4] || ' ' || ws[i+5] AS g
      FROM d, unnest(range(len(ws) - {_BLOOM_N - 1})) AS t(i)
    ),
    ev AS (SELECT DISTINCT g FROM g WHERE source = '{_BLOOM_EVAL_SRC}'),
    hits AS (
      SELECT c.doc_id, count(*) AS n_contaminated_ngrams
      FROM g c JOIN ev ON c.g = ev.g
      WHERE c.source <> '{_BLOOM_EVAL_SRC}'
      GROUP BY 1
    )
    SELECT doc_id, CAST(n_contaminated_ngrams AS BIGINT)
             AS n_contaminated_ngrams
    FROM hits
    ORDER BY n_contaminated_ngrams DESC, doc_id LIMIT {_BLOOM_TOPK}
    """,
    tags=("llm", "decontamination", "bloom", "scale"),
)
def decontaminate_bloom_verified(spark, sf_dir):
    """BLOOM-PREFILTERED DECONTAMINATION (the Lee et al. / eval-leak
    audit pattern at its production shape): the eval set's distinct
    {_BLOOM_N}-grams build a deterministic broadcast Bloom filter
    (operators/bloom.py, 1% fpp); the training corpus's n-grams probe
    it Arrow-batched, and only the survivors (a ~1%-inflated superset
    of true matches) reach the EXACT verification join — whose output
    therefore equals the exact-join result bit-for-bit (no false
    negatives), which is what lets a DuckDB oracle gate a sketch-
    accelerated plan. Reports the {_BLOOM_TOPK} most-contaminated
    training documents.

    Scale: the filter is fixed-size (m ≈ 9.6 bits/member at 1% fpp)
    versus broadcasting the full n-gram set (~8+ bytes/member hashed,
    more as strings); the exact join then runs on ~1% of the corpus
    n-grams instead of all of them — the same trade Spark's runtime
    bloom join makes, here as an explicit reusable operator."""
    from gcp_etl_spark.operators.bloom import (
        bloom_parameters,
        build_bloom,
        might_contain_udf,
    )

    # r13 sf1.0 scaling probe (t8/t32 = 1.10): the single-file corpus
    # scan gives the tokenize + 5-gram explode 1-2 partitions, so gram
    # construction ran nearly serially before the distinct's exchange;
    # spread it first (guide §2.5 — repartition immediately after the
    # read; defaultParallelism keeps it scale-adaptive)
    d = (
        t(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            "source",
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias(
                "ws"
            ),
        )
    )
    grams = F.expr(
        f"transform(sequence(0, size(ws) - {_BLOOM_N}),"
        " i -> concat_ws(' ', slice(ws, i + 1, " + str(_BLOOM_N) + ")))"
    )
    # checkpoint the tokenized n-gram relation ONCE: its consumers
    # (eval count, bloom build, candidate probe, verify join) would
    # otherwise each re-run the corpus tokenize+explode+distinct
    # (review finding: four corpus-scale passes where one will do)
    g = (
        d.filter(F.size("ws") >= _BLOOM_N)
        .select("doc_id", "source", F.explode(grams).alias("g"))
        .distinct()
        .transform(barrier)
    )
    ev = (
        g.filter(F.col("source") == _BLOOM_EVAL_SRC)
        .select("g")
        .distinct()
        .transform(barrier)
    )
    n_eval = ev.count()
    m, k = bloom_parameters(n_eval, fpp=0.01)
    bits = build_bloom(ev, "g", m, k)
    probe = might_contain_udf(bits, k)
    corpus = g.filter(F.col("source") != _BLOOM_EVAL_SRC)
    candidates = corpus.filter(probe(F.col("g")))
    verified = candidates.join(ev, "g")  # removes bloom false positives
    return (
        verified.groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_ngrams"))
        .orderBy(F.desc("n_contaminated_ngrams"), "doc_id")
        .limit(_BLOOM_TOPK)
    )


# ------------------------------------------ multi-touch attribution

_ATTR_WINDOW_MIN = 60


@query(
    "analytics_multitouch_attribution",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id, ts, CAST(value AS DECIMAL(18,2)) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT p.event_id AS pid, p.v, e.event_type
      FROM p JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type <> 'purchase'
       AND e.ts >= p.ts - INTERVAL {_ATTR_WINDOW_MIN} MINUTE
       AND e.ts < p.ts
    ),
    credit AS (
      SELECT event_type,
             CAST(round(CAST(v AS DOUBLE)
                        / count(*) OVER (PARTITION BY pid), 6)
                  AS DECIMAL(18,6)) AS c
      FROM touch
    )
    SELECT event_type,
           count(*) AS n_touches,
           round(CAST(sum(c) AS DOUBLE), 4) AS attributed_value
    FROM credit GROUP BY event_type ORDER BY event_type
    """,
    tags=("analytics", "attribution", "interval-join", "events"),
)
def analytics_multitouch_attribution(spark, sf_dir):
    """LINEAR MULTI-TOUCH ATTRIBUTION: each purchase's value splits
    equally across every non-purchase touch by the same user in the
    preceding {_ATTR_WINDOW_MIN} minutes; report credited value per
    touch type — the marketing-analytics workhorse between last-touch
    (one window) and Shapley (combinatorial).

    Determinism: per-touch credit is value/k rounded at 6 dp (both
    engines divide identical doubles by identical integer counts) and
    summed as DECIMAL.

    Scale: the touch relation is an EQUI-join on user_id with a range
    predicate — the interval-join shape (operators/interval_join.py):
    the join key bounds the pair space, the time band prunes within
    user. The per-purchase touch count is a window over the (already
    joined) touch relation keyed by purchase id."""
    e = t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puid"),
        F.col("ts").alias("pts"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    touch = p.join(
        e,
        (F.col("user_id") == F.col("puid"))
        & (F.col("event_type") != "purchase")
        & (F.col("ts") >= F.col("pts") - F.expr(
            f"INTERVAL {_ATTR_WINDOW_MIN} MINUTES"))
        & (F.col("ts") < F.col("pts")),
    ).select("pid", "v", "event_type")
    w = Window.partitionBy("pid")
    credit = touch.select(
        "event_type",
        F.round(
            F.col("v").cast("double") / F.count("*").over(w), 6
        ).cast("decimal(18,6)").alias("c"),
    )
    return (
        credit.groupBy("event_type")
        .agg(
            F.count("*").alias("n_touches"),
            F.round(F.sum("c").cast("double"), 4).alias(
                "attributed_value"
            ),
        )
        .orderBy("event_type")
    )


# ------------------------------------------ distinct n-gram diversity


@query(
    "text_distinct_ngram_ratio",
    oracle="""
    WITH d AS (
      SELECT source,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents
    ),
    uni AS (
      SELECT source, count(*) AS n1, count(DISTINCT w) AS d1
      FROM (SELECT source, unnest(ws) AS w FROM d) GROUP BY 1
    ),
    bi AS (
      SELECT source, count(*) AS n2,
             count(DISTINCT ws[i+1] || ' ' || ws[i+2]) AS d2
      FROM d, unnest(range(len(ws) - 1)) AS t(i) GROUP BY 1
    ),
    tri AS (
      SELECT source, count(*) AS n3,
             count(DISTINCT ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
               AS d3
      FROM d, unnest(range(len(ws) - 2)) AS t(i) GROUP BY 1
    )
    SELECT source,
           round(CAST(d1 AS DOUBLE) / n1, 6) AS distinct_1,
           round(CAST(d2 AS DOUBLE) / n2, 6) AS distinct_2,
           round(CAST(d3 AS DOUBLE) / n3, 6) AS distinct_3
    FROM uni JOIN bi USING (source) JOIN tri USING (source)
    ORDER BY source
    """,
    tags=("text", "diversity", "quality"),
)
def text_distinct_ngram_ratio(spark, sf_dir):
    """DISTINCT-N DIVERSITY RATIOS per source (distinct-1/2/3 — the
    standard text-degeneration diagnostic): the share of unique
    uni/bi/trigrams among all emitted, low values flagging repetitive
    or templated sources before they enter a training mix.

    Determinism: pure integer counts, one final division each.
    Scale: three hash aggs over exploded n-grams (counts shuffle, text
    doesn't); distinct counts are per-source exact aggregates."""
    # NOTE (r12 resume): a barrier on the tokenized corpus was tried
    # and MEASURED SLOWER (1.03-1.17 -> 1.23-1.40 s A/B) — the three
    # n-gram branches overlap on idle cores and the tokenize is cheap
    # next to the explodes; reverted.
    d = t(spark, sf_dir, "documents").select(
        "source",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias(
            "ws"
        ),
    )

    def ng(n, cn, dn):
        if n == 1:
            ex = d.select("source", F.explode("ws").alias("g"))
        else:
            ex = d.filter(F.size("ws") >= n).select(
                "source",
                F.explode(
                    F.expr(
                        f"transform(sequence(0, size(ws) - {n}),"
                        f" i -> concat_ws(' ', slice(ws, i + 1, {n})))"
                    )
                ).alias("g"),
            )
        return ex.groupBy("source").agg(
            F.count("*").alias(cn), F.countDistinct("g").alias(dn)
        )

    uni, bi, tri = ng(1, "n1", "d1"), ng(2, "n2", "d2"), ng(3, "n3", "d3")
    return (
        uni.join(bi, "source")
        .join(tri, "source")
        .select(
            "source",
            F.round(F.col("d1").cast("double") / F.col("n1"), 6).alias(
                "distinct_1"
            ),
            F.round(F.col("d2").cast("double") / F.col("n2"), 6).alias(
                "distinct_2"
            ),
            F.round(F.col("d3").cast("double") / F.col("n3"), 6).alias(
                "distinct_3"
            ),
        )
        .orderBy("source")
    )


# ------------------------------------------------------- Gini index


@query(
    "analytics_gini_index",
    oracle="""
    WITH r AS (
      SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS i
      FROM events
    ),
    s AS (
      SELECT event_type, count(*) AS n,
             sum(v) AS sv, sum(CAST(i AS DECIMAL(18,0)) * v) AS siv
      FROM r GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(CAST(2 * siv AS DOUBLE) / (n * CAST(sv AS DOUBLE))
                 - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
    FROM s ORDER BY event_type
    """,
    tags=("analytics", "inequality", "ranks"),
)
def analytics_gini_index(spark, sf_dir):
    """GINI COEFFICIENT of ``value`` per event type — the inequality/
    concentration measure (revenue concentration, token-budget skew)
    via the rank formula G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over
    ascending ranks.

    Determinism: ranks are integers from a total order with event_id
    tiebreak; Σx and Σ(i·x) accumulate as DECIMAL (exact at 2 dp ×
    bigint rank); the two divisions happen once at the end.

    Scale: ranks come from the engine-standard two-pass range-
    partitioned global row number (bounded group count, unbounded rows
    per group — never a single-partition window); the sums are one
    map-side-combinable hash agg."""
    from gcp_etl_spark.operators.quantiles import global_row_number

    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
        "event_id",
    )
    ranked = global_row_number(
        e, order_cols=["v", "event_id"], part_cols=["event_type"],
        rn_col="i",
    )
    s = ranked.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("i").cast("decimal(18,0)") * F.col("v")).alias("siv"),
    )
    return s.select(
        "event_type",
        F.col("n"),
        F.round(
            (2 * F.col("siv")).cast("double")
            / (F.col("n") * F.col("sv").cast("double"))
            - (F.col("n") + 1).cast("double") / F.col("n"),
            6,
        ).alias("gini"),
    ).orderBy("event_type")


# ---------------------------------------------- boilerplate prefixes

_BP_PREFIX_TOKENS = 8
_BP_TOPK = 3


@query(
    "text_boilerplate_prefixes",
    oracle=f"""
    WITH d AS (
      SELECT source,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents
    ),
    p AS (
      SELECT source,
             array_to_string(ws[1:{_BP_PREFIX_TOKENS}], ' ') AS prefix
      FROM d WHERE len(ws) >= {_BP_PREFIX_TOKENS}
    ),
    c AS (
      SELECT source, prefix, count(*) AS n_docs,
             count(*) OVER (PARTITION BY source) AS n_src_rows
      FROM p GROUP BY source, prefix
    ),
    tot AS (SELECT source, count(*) AS n_src FROM p GROUP BY 1),
    r AS (
      SELECT c.source, prefix, n_docs, tot.n_src,
             row_number() OVER (PARTITION BY c.source
                                ORDER BY n_docs DESC, prefix) AS rk
      FROM c JOIN tot ON c.source = tot.source
    )
    SELECT source, CAST(rk AS INT) AS rank, prefix,
           CAST(n_docs AS BIGINT) AS n_docs,
           round(CAST(n_docs AS DOUBLE) / n_src, 6) AS share
    FROM r WHERE rk <= {_BP_TOPK}
    ORDER BY source, rank
    """,
    tags=("text", "boilerplate", "curation"),
)
def text_boilerplate_prefixes(spark, sf_dir):
    """BOILERPLATE PREFIX DETECTOR (the C4/RefinedWeb prep step that
    finds templated headers before stripping them): per source, the
    {_BP_TOPK} most frequent {_BP_PREFIX_TOKENS}-token document
    prefixes with their document share — a high share flags a
    template/scraper artifact the curation pipeline should strip or
    downweight.

    Scale: the prefix is a bounded in-row slice (text never explodes);
    one hash agg on (source, prefix), a bounded per-source top-k
    window over the AGGREGATED relation (|distinct prefixes| rows, not
    documents)."""
    d = t(spark, sf_dir, "documents").select(
        "source",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias(
            "ws"
        ),
    ).filter(F.size("ws") >= _BP_PREFIX_TOKENS)
    p = d.select(
        "source",
        F.concat_ws(
            " ", F.slice("ws", 1, _BP_PREFIX_TOKENS)
        ).alias("prefix"),
    )
    c = p.groupBy("source", "prefix").agg(F.count("*").alias("n_docs"))
    tot = p.groupBy("source").agg(F.count("*").alias("n_src"))
    w = Window.partitionBy("source").orderBy(F.desc("n_docs"), "prefix")
    return (
        c.join(F.broadcast(tot), "source")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BP_TOPK)
        .select(
            "source",
            F.col("rank").cast("int").alias("rank"),
            "prefix",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("n_src"), 6
            ).alias("share"),
        )
        .orderBy("source", "rank")
    )


# ------------------------------------------------ Pareto 80/20 point

_PARETO_TARGET = 0.8


@query(
    "analytics_pareto_8020",
    oracle=f"""
    WITH c AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT rev,
             row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk,
             sum(rev) OVER (ORDER BY rev DESC, o_custkey) AS cum
      FROM c
    ),
    tot AS (SELECT count(*) AS n, sum(rev) AS total FROM c),
    hit AS (
      SELECT min(rk) AS k FROM r CROSS JOIN tot
      WHERE cum * 10 >= total * {int(_PARETO_TARGET * 10)}
    )
    SELECT CAST(tot.n AS BIGINT) AS n_customers,
           CAST(hit.k AS BIGINT) AS n_top_customers,
           round(CAST(hit.k AS DOUBLE) / tot.n, 6) AS top_share,
           CAST({_PARETO_TARGET} AS DOUBLE) AS revenue_share
    FROM hit CROSS JOIN tot
    """,
    tags=("analytics", "concentration", "ranks"),
)
def analytics_pareto_8020(spark, sf_dir):
    """PARETO CONCENTRATION POINT: the smallest number of customers
    whose (descending) cumulative revenue reaches 80% of the total —
    the "how top-heavy is revenue" number next to the Gini index's
    integral view.

    Determinism: revenue pre-aggregates as DECIMAL per customer; the
    threshold compare is integer-exact (cum×10 ≥ total×8 in decimal);
    ranks break ties on customer key.

    Scale: per-customer revenue is one hash agg; the descending
    cumulative sum routes through the shared range-partitioned prefix
    primitive (ordering on the NEGATED revenue — the exchange orders
    ascending); the answer is a broadcast-threshold min."""
    from gcp_etl_spark.operators.quantiles import range_prefix_sums

    o = t(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    # descending order = ascending on the negated key (+custkey tiebreak)
    work = c.select(
        "o_custkey", "rev", (-F.col("rev")).alias("__negrev"),
        F.lit(1).cast("long").alias("__one"),
    )
    cum, psums = range_prefix_sums(
        work, ["__negrev", "o_custkey"], ["rev", "__one"]
    )
    tot = psums.agg(
        F.sum("__one_psum").alias("n"), F.sum("rev_psum").alias("total")
    )
    hit = (
        cum.crossJoin(F.broadcast(tot))
        .filter(
            F.col("rev_cum") * 10
            >= F.col("total") * int(_PARETO_TARGET * 10)
        )
        .agg(F.min("__one_cum").alias("k"))
    )
    return hit.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n_customers"),
        F.col("k").alias("n_top_customers"),
        F.round(F.col("k").cast("double") / F.col("n"), 6).alias(
            "top_share"
        ),
        F.lit(float(_PARETO_TARGET)).alias("revenue_share"),
    )


# --------------------------------------------------- per-user peak rate

_PEAK_WINDOW_MIN = 5


@query(
    "events_peak_rate",
    oracle=f"""
    WITH w AS (
      SELECT user_id,
             count(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN {_PEAK_WINDOW_MIN * 60 * 1000000} PRECEDING
                     AND CURRENT ROW
             ) AS cnt
      FROM events
    )
    SELECT user_id, CAST(max(cnt) AS BIGINT) AS peak_5min
    FROM w GROUP BY user_id
    ORDER BY peak_5min DESC, user_id LIMIT 20
    """,
    tags=("analytics", "rate", "window", "events"),
)
def events_peak_rate(spark, sf_dir):
    """PER-USER PEAK EVENT RATE: the maximum number of events any
    trailing {_PEAK_WINDOW_MIN}-minute window contains, per user —
    burst detection for rate limiting / abuse review, reported as the
    top-20 burstiest users.

    Determinism: the trailing window is a numeric RANGE frame over
    exact epoch microseconds (identical integer bounds both engines).

    Scale: one per-user window over a time-RANGE frame (single
    shuffle on user_id; frames never materialize — Spark's range
    frame slides two pointers), one hash agg, TakeOrdered top-20."""
    from gcp_etl_spark.queries.temporal_ops import _us

    e = t(spark, sf_dir, "events")
    us = _us(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-_PEAK_WINDOW_MIN * 60 * 1_000_000, 0)
    )
    return (
        e.select("user_id", F.count("*").over(w).alias("cnt"))
        .groupBy("user_id")
        .agg(F.max("cnt").alias("peak_5min"))
        .orderBy(F.desc("peak_5min"), "user_id")
        .limit(20)
    )


# ----------------------------------------------- Luhn checksum audit


@query(
    "pii_luhn_validate",
    oracle="""
    WITH cand AS (
      -- deterministic 16-digit candidate per event: the zero-padded
      -- concatenation both engines derive identically
      SELECT event_id,
             lpad(CAST(user_id AS VARCHAR), 8, '0')
               || lpad(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR),
                       8, '0') AS digits
      FROM events
      WHERE value > 0 AND round(value * 100) < 100000000 AND user_id >= 0
    ),
    luhn AS (
      SELECT event_id, digits,
             list_sum(
               list_transform(range(1, 17), i ->
                 CASE WHEN i % 2 = 1
                      THEN CAST(substr(digits, 17 - i, 1) AS INT)
                      ELSE CASE
                        WHEN CAST(substr(digits, 17 - i, 1) AS INT) * 2 > 9
                        THEN CAST(substr(digits, 17 - i, 1) AS INT) * 2 - 9
                        ELSE CAST(substr(digits, 17 - i, 1) AS INT) * 2
                      END END)
             ) AS s
      FROM cand
    )
    SELECT count(*) AS n_candidates,
           CAST(sum(CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_luhn_valid,
           round(sum(CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END) * 100.0
                 / count(*), 4) AS valid_pct
    FROM luhn
    """,
    tags=("privacy", "pii", "audit"),
)
def pii_luhn_validate(spark, sf_dir):
    """LUHN CHECKSUM VALIDATION — the second stage of credit-card PII
    scanning (regex finds 16-digit candidates, the Luhn mod-10 check
    rejects the ~90% that are coincidental digit runs, cutting the
    redaction false-positive rate 10x). The fixture has no real card
    numbers, so candidates are deterministic 16-digit strings derived
    identically in both engines; the CHECK — double every second digit
    from the right, subtract 9 above 9, sum mod 10 — is the real
    algorithm, exercised digit-for-digit.

    Scale: pure map over candidate strings (the digit fold is an
    in-row array transform, no explode), one global count agg."""
    e = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    cand = e.filter(
        (F.col("value") > 0)
        & (cents < 100000000)
        & (F.col("user_id") >= 0)
    ).select(
        F.concat(
            F.lpad(F.col("user_id").cast("string"), 8, "0"),
            F.lpad(cents.cast("string"), 8, "0"),
        ).alias("digits")
    )
    # i = 1..16 counted from the RIGHT; odd positions keep the digit,
    # even positions double-and-subtract-9-above-9 (Luhn, public)
    s = F.aggregate(
        F.expr(
            "transform(sequence(1, 16), i -> CASE WHEN i % 2 = 1"
            " THEN CAST(substring(digits, 17 - i, 1) AS INT)"
            " ELSE CASE WHEN CAST(substring(digits, 17 - i, 1) AS INT)"
            "   * 2 > 9"
            " THEN CAST(substring(digits, 17 - i, 1) AS INT) * 2 - 9"
            " ELSE CAST(substring(digits, 17 - i, 1) AS INT) * 2"
            " END END)"
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    valid = (s % 10 == 0).cast("long")
    return cand.agg(
        F.count("*").alias("n_candidates"),
        F.sum(valid).alias("n_luhn_valid"),
        F.round(F.sum(valid) * 100.0 / F.count("*"), 4).alias(
            "valid_pct"
        ),
    )


# ------------------------------------------- MMR diversified top-k

_MMR_PROBE = 17          # query vector id
_MMR_SHORTLIST = 40
_MMR_K = 10
_MMR_LAMBDA = 0.7


@query(
    "ann_mmr_rerank",
    # rows-only by design: MMR's greedy argmax recurrence (each pick
    # depends on max-similarity to all previous picks) is not a single
    # SQL statement. Pinned exactly against a pure-numpy replay in
    # tests/test_r7.py::test_mmr_matches_numpy_reference.
    oracle=None,
    tags=("llm", "ann", "retrieval", "diversity"),
)
def ann_mmr_rerank(spark, sf_dir):
    """MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein
    1998, public — the standard retrieval diversifier): from the
    probe's cosine top-{_MMR_SHORTLIST} shortlist, greedily pick
    {_MMR_K} items maximizing λ·rel(d) − (1−λ)·max_sim(d, picked) —
    relevance traded against redundancy, λ={_MMR_LAMBDA}.

    Scale split (how every production reranker runs): the SHORTLIST is
    the distributed part — one broadcast-probe cosine pass over the
    corpus, TakeOrdered top-{_MMR_SHORTLIST} — and the MMR recurrence
    then operates on the k²-bounded candidate set ({_MMR_SHORTLIST}²
    pairwise sims, a {_MMR_SHORTLIST}-row collect), which is
    serving-side math by construction, not a driver-loop smell: its
    input is bounded by the shortlist size whatever the corpus is.

    Determinism: cosines round at 6 dp before the greedy recurrence;
    ties break on vec_id ascending (both pinned in the numpy replay
    pytest)."""
    from gcp_etl_spark.llm.similarity import cosine

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    probe = emb.filter(F.col("vec_id") == _MMR_PROBE).select(
        F.col("v").alias("qv")
    )
    shortlist = (
        emb.filter(F.col("vec_id") != _MMR_PROBE)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id", "v",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("rel"),
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(_MMR_SHORTLIST)
    )
    cand = shortlist.collect()  # bounded: _MMR_SHORTLIST rows
    import numpy as np

    ids = [r["vec_id"] for r in cand]
    rel = np.array([r["rel"] for r in cand])
    M = np.array([r["v"] for r in cand], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = np.round(Mn @ Mn.T, 6)  # pairwise cosine, 6 dp like rel
    picked: list[int] = []
    out_rows = []
    for rank in range(min(_MMR_K, len(ids))):
        best_i, best_score = -1, None
        for i in range(len(ids)):
            if i in picked:
                continue
            div = max((S[i][j] for j in picked), default=0.0)
            score = _MMR_LAMBDA * rel[i] - (1 - _MMR_LAMBDA) * div
            if (
                best_score is None
                or score > best_score
                or (score == best_score and ids[i] < ids[best_i])
            ):
                best_i, best_score = i, score
        picked.append(best_i)
        out_rows.append(
            (
                rank + 1,
                int(ids[best_i]),
                float(rel[best_i]),
                round(float(best_score), 6),
            )
        )
    return spark.createDataFrame(
        out_rows, "rank int, vec_id long, rel double, mmr_score double"
    )
