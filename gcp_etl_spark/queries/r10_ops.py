"""Round-10 operators (r9 verdict asks #2-#5): distributed Lloyd
k-means as a first-class hash-verified query, unigram-LM tokenizer
training via EM, the MinHash banding operating curve, and managed-store
MERGE schema evolution.

Exactness conventions follow the r9_ops house rules: bounded iterative
state rounds to a fixed number of decimals INSIDE each iteration's
aggregate on both engines (the r6 logistic-GD contract), counts stay
BIGINT, and final doubles round 6dp.

No reference counterpart (the reference's query surface is
k8s/submit/etl-on-gcp-vinicius-campos.py:22-92 — SELECT * LIMIT 100
plus two counts); these extend the declared training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t

# ------------------------------------ distributed Lloyd k-means (ask #2)

_KM_K = 8
_KM_ITERS = 3
_KM_D = 64
_KM_DP = 8  # per-iteration centroid rounding, the GD-trainer contract


def _kmeans_oracle_sql() -> str:
    """Unrolled Lloyd recurrence as chained CTEs — generated from the
    SAME constants the Spark side iterates with (the r6 logistic-GD
    oracle pattern), so the two engines can never drift: seeded init =
    the k smallest-id vectors rounded {_KM_DP}dp, assignment =
    squared-L2 argmin with centroid-id tiebreak, update = per-dimension
    avg rounded {_KM_DP}dp, emptied cluster keeps its previous center
    (LEFT JOIN + coalesce)."""
    ctes = [
        "f AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        f"""it0 AS (
      SELECT row_number() OVER (ORDER BY id) - 1 AS cid,
             list_transform(v, x -> round(x, {_KM_DP})) AS c
      FROM (SELECT id, v FROM f ORDER BY id LIMIT {_KM_K})
    )""",
    ]
    for i in range(1, _KM_ITERS + 1):
        ctes.append(
            f"""a{i} AS (
      SELECT id, v, cid FROM (
        SELECT f.id, f.v, c.cid,
               row_number() OVER (PARTITION BY f.id ORDER BY
                 list_inner_product(c.c, c.c)
                 - 2 * list_inner_product(f.v, c.c), c.cid) AS rn
        FROM f CROSS JOIN it{i - 1} c) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""it{i} AS (
      SELECT p.cid, coalesce(n.c, p.c) AS c
      FROM it{i - 1} p LEFT JOIN (
        SELECT cid, list(m ORDER BY j) AS c FROM (
          SELECT cid, j, round(avg(x), {_KM_DP}) AS m FROM (
            SELECT cid, unnest(v) AS x,
                   unnest(range(1, {_KM_D + 1})) AS j FROM a{i}
          ) GROUP BY cid, j) GROUP BY cid) n ON p.cid = n.cid
    )"""
        )
    n = _KM_ITERS
    ctes.append(
        f"""afin AS (
      SELECT id, v, cid FROM (
        SELECT f.id, f.v, c.cid,
               row_number() OVER (PARTITION BY f.id ORDER BY
                 list_inner_product(c.c, c.c)
                 - 2 * list_inner_product(f.v, c.c), c.cid) AS rn
        FROM f CROSS JOIN it{n} c) WHERE rn = 1
    )"""
    )
    return f"""
    WITH {', '.join(ctes)}
    SELECT a.cid,
           CAST(count(*) AS BIGINT) AS n_points,
           round(c.c[1], 6) AS c0, round(c.c[2], 6) AS c1,
           round(c.c[3], 6) AS c2, round(c.c[4], 6) AS c3,
           round(sqrt(list_inner_product(c.c, c.c)), 6) AS center_norm,
           round(sum(list_inner_product(a.v, a.v)
                     - 2 * list_inner_product(a.v, c.c)
                     + list_inner_product(c.c, c.c)), 6) AS inertia
    FROM afin a JOIN it{n} c ON a.cid = c.cid
    GROUP BY a.cid, c.c
    """


def _seq_dot(x, y):
    """Sequential-fold dot product of two array<double> columns — the
    same left-to-right summation order as DuckDB's
    ``list_inner_product``, so the per-row inertia operands are
    bitwise-comparable before the final rounded sum."""
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )


@query(
    "train_kmeans_lloyd",
    oracle=_kmeans_oracle_sql(),
    tags=("llm", "ml", "clustering", "iterative", "embeddings"),
)
def train_kmeans_lloyd(spark, sf_dir):
    """DISTRIBUTED LLOYD K-MEANS (r9 verdict ask #2), hash-verified:
    k={_KM_K} centroids over the 64-dim embedding corpus, {_KM_ITERS}
    full-corpus iterations, deterministic init (the k smallest-id
    vectors). Per iteration: assignment is ONE broadcast-shaped numpy
    matmul per Arrow batch (centers ride the udf closure — plan O(1)
    in k, llm/kmeans.py::nearest_center_col), the centroid update is
    ONE map-side-combinable hash agg ({_KM_D} avg() aggregates per
    centroid, no explode), and the only driver state is the k x d
    centroid matrix — the legitimate bounded-state iterative pattern
    (same as the logistic-GD trainer, queries/r6_ops.py).

    Determinism: every centroid coordinate rounds to {_KM_DP}dp INSIDE
    the per-iteration aggregate on BOTH engines, so summation-order
    noise (~1e-13) can never propagate across iterations; the DuckDB
    oracle replays the identical recurrence as unrolled CTEs generated
    from the same constants, and tests/test_r10.py re-derives the full
    recurrence step-for-step in NumPy (independent of both engines).

    Output: per-cluster size, first-4 center coordinates, center norm,
    and exact within-cluster inertia (ip-form ||v||^2 - 2 v.c + ||c||^2
    with sequential-fold dot products matching list_inner_product).

    Scale: {_KM_ITERS} scans x one hash agg each; nothing shuffles
    wider than k x d partial sums. At 100 TB: cache the vector column
    once, each iteration is a single map-reduce — this operator is
    also wired as the full-corpus refinement behind the IVF coarse
    quantizer (llm/ivf.py::ivf_assign refine_iters), removing the
    driver-side-sample dependency from the ANN paths."""
    import numpy as np  # noqa: PLC0415

    from gcp_etl_spark.llm.kmeans import lloyd_distributed

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    C, assigned = lloyd_distributed(
        emb, vec_col="embedding", k=_KM_K, iters=_KM_ITERS, d=_KM_D
    )
    centers = spark.createDataFrame(
        [(int(j), [float(x) for x in C[j]]) for j in range(_KM_K)],
        "cid int, c array<double>",
    )
    v = F.col("embedding").cast("array<double>")
    joined = assigned.join(F.broadcast(centers), "cid").select(
        "cid",
        "c",
        (
            _seq_dot(v, v)
            - 2.0 * _seq_dot(v, F.col("c"))
            + _seq_dot(F.col("c"), F.col("c"))
        ).alias("sq"),
    )
    return joined.groupBy(
        F.col("cid").cast("long").alias("cid"), "c"
    ).agg(
        F.count("*").cast("long").alias("n_points"),
        F.round(F.first(F.col("c")[0]), 6).alias("c0"),
        F.round(F.first(F.col("c")[1]), 6).alias("c1"),
        F.round(F.first(F.col("c")[2]), 6).alias("c2"),
        F.round(F.first(F.col("c")[3]), 6).alias("c3"),
        F.round(F.sqrt(F.first(_seq_dot(F.col("c"), F.col("c")))), 6).alias(
            "center_norm"
        ),
        F.round(F.sum("sq"), 6).alias("inertia"),
    ).drop("c")


@query(
    "ann_cosine_topk_ivf_refined",
    # rows-only by design (clustering + probe are approximate); recall
    # vs the exact operator and full-corpus inertia monotonicity of
    # the refinement are pinned in tests/test_r10.py
    oracle=None,
    tags=("llm", "similarity", "ann", "ivf", "iterative"),
)
def ann_cosine_topk_ivf_refined(spark, sf_dir):
    """IVF approximate top-k with FULL-CORPUS quantizer refinement
    (r9 verdict ask #2's wiring): the driver-side sample seeds the
    coarse quantizer exactly as ``ann_cosine_topk_ivf``, then 2
    distributed Lloyd iterations (assignment matmul + centroid
    hash-agg per pass, llm/kmeans.py::lloyd_distributed) refine the
    centers against EVERY corpus vector — so no ANN path depends
    solely on what fit in the driver. Lloyd monotonicity guarantees
    the refined quantizer's within-list variance never exceeds the
    sample-only one's (pinned in tests); tighter lists mean the same
    nprobe probes recover at-least-comparable candidates at 1000x the
    corpus, where a 4096-row sample is a vanishing fraction."""
    from gcp_etl_spark.llm.ivf import cosine_topk_ivf

    emb = t(spark, sf_dir, "embeddings")
    return cosine_topk_ivf(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        k=5,
        n_centroids=8,
        nprobe=3,
        refine_iters=2,
    )


# --------------------------- unigram-LM tokenizer EM training (ask #3)

_ULM_ITERS = 2
_ULM_MAXLEN = 4
_ULM_TOPK = 30


def _doc_vocab(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


@query(
    "train_unigram_lm",
    # rows-only by design: the piece table is the fixpoint of an EM
    # recurrence (forward-backward lattice per word) no single SQL
    # statement expresses — same gate family as bpe_train_merges.
    # Pinned EM-step-for-EM-step against a pure-Python reference on
    # the same corpus by tests/test_r10.py (r9 verdict ask #3).
    oracle=None,
    tags=("llm", "tokenizer", "unigram", "em", "iterative"),
)
def train_unigram_lm(spark, sf_dir):
    """UNIGRAM-LM (SentencePiece-style) TOKENIZER TRAINING via EM
    (Kudo 2018, public) — the second tokenizer family next to BPE:
    seed = all substrings <= {_ULM_MAXLEN} chars above a frequency
    floor plus full char coverage; then {_ULM_ITERS} EM iterations
    where the E-step is a per-distinct-word forward-backward lattice
    fold (mapInPandas over the vocab relation, piece table in the
    closure — the BPE-trainer shape) and the M-step is ONE hash agg +
    a driver-side renormalize over 6dp-rounded expected counts (the
    engine-noise determinism boundary). Output: the top-{_ULM_TOPK}
    pieces by final probability.

    Scale: corpus scanned once into the distinct-word vocab (Heaps'
    law bounded); each EM iteration is one mapInPandas pass + one
    bounded hash agg; driver state = the piece table only."""
    from gcp_etl_spark.functions.unigram_lm import em_train

    vocab = _doc_vocab(spark, sf_dir)
    probs = em_train(
        vocab, iters=_ULM_ITERS, max_len=_ULM_MAXLEN
    )
    top = sorted(probs.items(), key=lambda kv: (-kv[1], kv[0]))[:_ULM_TOPK]
    return spark.createDataFrame(
        [
            (i + 1, p, len(p), round(pr, 8))
            for i, (p, pr) in enumerate(top)
        ],
        "rank int, piece string, piece_len int, prob double",
    )


@query(
    "unigram_fertility_roundtrip",
    # rows-only by design (depends on the EM-trained piece table —
    # see train_unigram_lm); fertility and the zero-violation
    # round-trip are value-pinned vs the pure-Python reference in
    # tests/test_r10.py, matching functions/bpe.py's gate family.
    oracle=None,
    tags=("llm", "tokenizer", "unigram", "quality"),
)
def unigram_fertility_roundtrip(spark, sf_dir):
    """UNIGRAM TOKENIZER QUALITY TWIN (r9 verdict ask #3's second
    half): Viterbi-segment every distinct corpus word with the
    EM-trained piece table and report the metrics a tokenizer
    deployment gates on — corpus FERTILITY (freq-weighted tokens per
    word: the single best throughput/quality proxy for a tokenizer at
    100 TB), round-trip integrity (concat(pieces) == word for EVERY
    word — violations must be 0: unigram pieces are substrings, so a
    nonzero count means a broken lattice), mean piece length, and the
    share of single-character fallback tokens (high = the learned
    inventory is failing to cover the corpus)."""
    from gcp_etl_spark.functions.unigram_lm import em_train, segment_words

    vocab = _doc_vocab(spark, sf_dir)
    probs = em_train(vocab, iters=_ULM_ITERS, max_len=_ULM_MAXLEN)
    seg = segment_words(vocab, probs, max_len=_ULM_MAXLEN)
    return seg.agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("freq").cast("long").alias("corpus_words"),
        F.sum(F.col("freq") * F.col("n_tokens")).cast("long").alias(
            "corpus_tokens"
        ),
        F.round(
            F.sum(F.col("freq") * F.col("n_tokens"))
            / F.sum("freq").cast("double"),
            6,
        ).alias("fertility"),
        F.sum(
            F.when(F.concat_ws("", F.col("toks")) != F.col("w"), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("roundtrip_violations"),
        F.round(
            F.avg(F.length("w") / F.col("n_tokens").cast("double")), 6
        ).alias("mean_piece_len"),
        F.round(
            F.sum(
                F.size(F.filter(F.col("toks"), lambda x: F.length(x) == 1))
                * F.col("freq")
            )
            / F.sum(F.col("freq") * F.col("n_tokens")).cast("double"),
            6,
        ).alias("char_fallback_share"),
    )


# --------------------- MinHash banding operating curve (ask #4)


@query(
    "dedup_minhash_banding_curve",
    # rows-only by design (xxhash64-based signatures are not
    # replayable in DuckDB — the whole minhash family's policy); the
    # curve's CONTRACT is pinned by tests/test_r10.py: candidate sets
    # are nested so recall is non-decreasing in bands, and the
    # bands=32 end of the curve clears the 0.9 recall-vs-exact floor
    # the shipped default already meets.
    oracle=None,
    tags=("llm", "dedup", "minhash", "lsh", "evaluation"),
)
def dedup_minhash_banding_curve(spark, sf_dir):
    """MinHash BANDING OPERATING CURVE (r9 verdict ask #4): measured
    precision/recall of the LSH candidate stage vs exact-Jaccard
    truth at every (bands, rows) split of one fixed 64-component
    signature — bands in {4, 8, 16, 32}, threshold 0.7. The engine
    ships bands=16; this query is the evidence for that default and
    the knob a 100 TB operator turns when the corpus' similarity
    distribution shifts (each row carries the theoretical S-curve
    midpoint s_half = (1/b)^(1/r) next to the measured rates).
    See llm/dedup.py::banding_operating_curve for the scale shape.

    Evaluation slice: doc_id < 1250 (the dfcap pattern) — the curve is
    an ESTIMATOR read off a fixed sample, per-pair unbiased, so a
    bounded slice measures the same operating points; the bands=32 end
    deliberately floods weak candidates (that is what the curve shows)
    and must not scale its flood with the corpus in the per-round
    bench."""
    from gcp_etl_spark.llm.dedup import banding_operating_curve

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1250)
    return banding_operating_curve(
        d, "doc_id", "text", threshold=0.7, num_perm=64,
        bands_list=(4, 8, 16, 32),
    )


# ---------------- managed-store MERGE schema evolution (ask #5)


@query(
    "io_merge_schema_evolution",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 10 < 8
    ), cdc AS (
      SELECT o_orderkey, o_custkey, o_totalprice + 500.0 AS o_totalprice,
             'web' AS channel
      FROM orders WHERE o_orderkey % 10 IN (0, 5)
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice, 'store'
      FROM orders WHERE o_orderkey % 10 = 8
    ), merged AS (
      SELECT coalesce(c.o_orderkey, b.o_orderkey) AS k,
             CASE WHEN c.o_orderkey IS NOT NULL
                  THEN c.o_totalprice ELSE b.o_totalprice END AS price,
             c.channel AS channel
      FROM base b FULL OUTER JOIN cdc c ON b.o_orderkey = c.o_orderkey
    )
    SELECT k % 97 AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(k) AS BIGINT) AS sum_key,
           CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(count(channel) AS BIGINT) AS n_channel,
           CAST(count(*) FILTER (channel = 'web') AS BIGINT) AS n_web,
           CAST(count(*) - count(channel) AS BIGINT) AS n_backfilled
    FROM merged GROUP BY 1
    """,
    tags=("io", "manifest", "merge", "schema-evolution", "dml"),
)
def io_merge_schema_evolution(spark, sf_dir):
    """MERGE WITH SCHEMA EVOLUTION on the managed store (r9 verdict
    ask #5): generation 0 is a 3-column orders slice (key%10 < 8); the
    CDC batch carries a NEW ``channel`` column — updates for keys
    %10 ∈ {0,5} (price +500, channel 'web') and inserts for the
    previously-absent %10 = 8 (channel 'store'). With
    ``schema_evolution=True`` the new column WIDENS the target:
    surviving generation-0 rows read back with typed NULL backfill
    (the Delta ``mergeSchema`` semantic), CDC rows carry their values.
    The query reads the POST-MERGE active generation off disk and
    checksums per key-bucket — counts, key/cents sums, non-null
    channel count, per-value count, and the BACKFILLED (null) count,
    so a dropped survivor, a lost new column, or a mis-filled null
    shifts a bucket hash. The oracle reconstructs the evolved MERGE
    as base FULL OUTER JOIN cdc with the CDC side winning.

    The commit itself goes through the optimistic CAS path
    (``check_conflict=True`` — write_managed re-checks the generation
    this merge read under the manifest lock; the two-writer loser
    raises GenerationConflictError and cleans up, pinned in
    tests/test_r10.py).

    Scale: identical to io_merge_upsert — one broadcast-keys anti
    join, target never shuffles; the evolved projection is per-row
    column arithmetic, no extra pass."""
    from gcp_etl_spark import io
    from gcp_etl_spark.scratch import scratch_dir

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k10 = F.col("o_orderkey") % 10
    d = scratch_dir("io_merge_evo", fresh=True)
    io.write_managed(orders.filter(k10 < 8), d)
    cdc = (
        orders.filter(k10.isin(0, 5))
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") + 500.0).alias("o_totalprice"),
            F.lit("web").alias("channel"),
        )
        .unionByName(
            orders.filter(k10 == 8).select(
                "o_orderkey",
                "o_custkey",
                "o_totalprice",
                F.lit("store").alias("channel"),
            )
        )
    )
    io.merge_managed(
        spark, d, cdc, ["o_orderkey"], schema_evolution=True
    )
    out = io.read_managed(spark, d)
    return out.groupBy((F.col("o_orderkey") % 97).alias("bucket")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("sum_cents"),
        F.count("channel").cast("long").alias("n_channel"),
        F.count(F.when(F.col("channel") == "web", 1))
        .cast("long")
        .alias("n_web"),
        (F.count("*") - F.count("channel"))
        .cast("long")
        .alias("n_backfilled"),
    )


# ----------------- banded edit-distance near-dup join (r10 extra)

_ED_MAX = 8  # edit-distance threshold; also the EXACT length band


@query(
    "dedup_edit_distance_banded",
    oracle=f"""
    WITH caps AS (SELECT doc_id, text FROM documents WHERE doc_id < 800)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
           CAST(length(a.text) AS BIGINT) AS len_a,
           CAST(length(b.text) AS BIGINT) AS len_b
    FROM caps a JOIN caps b
      ON a.doc_id < b.doc_id
     AND abs(length(a.text) - length(b.text)) <= {_ED_MAX}
    WHERE levenshtein(a.text, b.text) <= {_ED_MAX}
    ORDER BY id_a, id_b
    """,
    tags=("llm", "dedup", "edit-distance", "documents"),
)
def dedup_edit_distance_banded(spark, sf_dir):
    """EDIT-DISTANCE NEAR-DUP JOIN with a PROVABLY-EXACT length band:
    levenshtein(a,b) <= {_ED_MAX} implies |len(a) − len(b)| <= {_ED_MAX}
    (each edit changes length by at most 1), so banding by length
    prunes with ZERO false negatives — the third exact near-dup
    operator next to prefix filtering (token-set Jaccard) and the
    capped gram joins, covering the character-typo regime MinHash
    shingles under-detect.

    Scale shape: the band is an EQUI-join on length buckets of width
    {_ED_MAX + 1} — the probe side emits its bucket, the build side
    emits bucket−1/bucket/bucket+1, so the pair lands in EXACTLY ONE
    bucket (band < bucket width) and Spark plans a hash join, never
    the theta-join BroadcastNestedLoop a raw |lenA − lenB| predicate
    would force. Candidates then verify with one JVM levenshtein per
    pair (at deployment use the 3-arg thresholded variant for
    early-exit; DuckDB lacks it, so the oracle runs the 2-arg form —
    same integer). When length alone under-prunes (clustered lengths),
    the escalation is PartEnum chunk blocking: distance <= d means the
    two strings share one of d+1 aligned chunks verbatim. Evaluation
    slice doc_id < 800 (the dfcap pattern) bounds the verify stage in
    the per-round bench."""
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 800)
        .select("doc_id", "text", F.length("text").alias("ln"))
    )
    w = _ED_MAX + 1
    a = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("text").alias("ta"),
        F.col("ln").alias("len_a"),
        F.floor(F.col("ln") / w).alias("bkt"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("text").alias("tb"),
        F.col("ln").alias("len_b"),
        F.explode(
            F.array(
                F.floor(F.col("ln") / w) - 1,
                F.floor(F.col("ln") / w),
                F.floor(F.col("ln") / w) + 1,
            )
        ).alias("bkt"),
    )
    pairs = a.join(b, "bkt").filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= _ED_MAX)
    )
    return (
        pairs.withColumn("dist", F.levenshtein("ta", "tb"))
        .filter(F.col("dist") <= _ED_MAX)
        .select(
            "id_a",
            "id_b",
            F.col("dist").cast("long").alias("dist"),
            F.col("len_a").cast("long").alias("len_a"),
            F.col("len_b").cast("long").alias("len_b"),
        )
        .orderBy("id_a", "id_b")
    )
