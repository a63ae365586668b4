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
    p = src.join(tgt, "cid").select(
        "sid", "tid",
        F.round(cosine(F.col("sv"), F.col("tv")), 6).alias("cos"),
    )
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
    from gcp_etl_spark.llm.ivf import _nearest_centroids, ivf_assign
    from gcp_etl_spark.scratch import scratch_dir
    from gcp_etl_spark.streaming.ann_stream import probe_topk

    emb = t(spark, sf_dir, "embeddings")
    assigned, centers = ivf_assign(emb, "vec_id", "embedding",
                                   n_centroids=8)
    d = scratch_dir("ann_serve_idx")
    assigned.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").cast("array<double>").alias("n_vec"),
        "centroid_id",
    ).write.partitionBy("centroid_id").mode("overwrite").parquet(d)
    idx = spark.read.parquet(d)

    q = emb.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("q_vec"),
    ).withColumn(
        "centroid_id",
        F.explode(_nearest_centroids(F.col("q_vec"), centers, 2)),
    )
    probes = sorted(
        r["centroid_id"]
        for r in q.select("centroid_id").distinct().collect()
    )
    pruned = idx.filter(F.col("centroid_id").isin(probes))
    return probe_topk(pruned, q, k=5).orderBy("q_id", "rn")
