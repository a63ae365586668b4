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
           round(CAST(sum(CAST(list_inner_product(a.v, a.v)
                     - 2 * list_inner_product(a.v, c.c)
                     + list_inner_product(c.c, c.c)
                     AS DECIMAL(38,12))) AS DOUBLE), 6) AS inertia
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
        # per-term DECIMAL(38,12) cast before summing (the
        # stats_variance_ratio convention) so Spark partial-agg vs
        # DuckDB sequential summation order cannot move the sum across
        # a 6dp rounding boundary
        F.round(
            F.sum(F.col("sq").cast("decimal(38,12)")).cast("double"), 6
        ).alias("inertia"),
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
    would force. Banded candidates then pass a SECOND lossless prune
    before the O(len²) DP: the character-histogram lower bound
    ceil(Σ_c |count_a(c) − count_c(c)| / 2) <= levenshtein(a, b)
    (a substitution moves two histogram slots by 1, an indel moves
    one), with per-doc histograms computed ONCE (O(alphabet·len) per
    doc) and the per-pair check O(alphabet) — on this corpus it kills
    ~99.8% of banded candidates and took the full-plan bench record
    from 19.8 s to the low single digits. Chars outside the fixed
    a-z/space/digit alphabet are simply ignored, which only WEAKENS
    the bound (never prunes a true pair). Survivors verify with one
    JVM levenshtein per pair (at deployment use the 3-arg thresholded
    variant for early-exit; DuckDB lacks it, so the oracle runs the
    2-arg form over the PLAIN banded join — the oracle needs no
    pruning to agree, both prunes being provably lossless). When
    length alone under-prunes, the further escalation is PartEnum
    chunk blocking: distance <= d means the two strings share one of
    d+1 aligned chunks verbatim. Evaluation slice doc_id < 800 (the
    dfcap pattern) bounds the verify stage in the per-round bench."""
    alphabet = "abcdefghijklmnopqrstuvwxyz 0123456789"
    # per-doc char histogram over a FIXED literal alphabet: one
    # O(|alphabet|·len) pass per doc, reused by every pair
    chars_lit = ",".join(alphabet)
    hist = F.expr(
        f"transform(split('{chars_lit}', ','), "
        "c -> size(split(text, c)) - 1)"
    )
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 800)
        .select(
            "doc_id",
            "text",
            F.length("text").alias("ln"),
            hist.alias("h"),
        )
    )
    w = _ED_MAX + 1
    a = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("text").alias("ta"),
        F.col("ln").alias("len_a"),
        F.col("h").alias("ha"),
        F.floor(F.col("ln") / w).alias("bkt"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("text").alias("tb"),
        F.col("ln").alias("len_b"),
        F.col("h").alias("hb"),
        F.explode(
            F.array(
                F.floor(F.col("ln") / w) - 1,
                F.floor(F.col("ln") / w),
                F.floor(F.col("ln") / w) + 1,
            )
        ).alias("bkt"),
    )
    bag_bound = F.aggregate(
        F.zip_with("ha", "hb", lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, e: acc + e,
    )
    pairs = a.join(b, "bkt").filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= _ED_MAX)
        & (bag_bound <= 2 * _ED_MAX)
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


# -------------------- Croston intermittent-demand forecast (r10 extra)

_CR_ALPHA = "0.1"  # SES smoothing constant, shared literal


@query(
    "analytics_croston",
    oracle=f"""
    WITH RECURSIVE nz AS (
      SELECT o_orderdate::DATE AS d, CAST(sum(l_quantity) AS BIGINT) AS q
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_partkey % 97 = 0
      GROUP BY 1
    ), gaps AS (
      SELECT d, q,
             CAST(coalesce(date_diff('day', lag(d) OVER (ORDER BY d), d),
                           1) AS BIGINT) AS g
      FROM nz
    ), arrs AS (
      SELECT count(*) AS n,
             list(q ORDER BY d) AS qa,
             list(g ORDER BY d) AS ga
      FROM gaps
    ), cr AS (
      SELECT 1 AS t, CAST(qa[1] AS DOUBLE) AS z,
             CAST(ga[1] AS DOUBLE) AS p, n, qa, ga
      FROM arrs
      UNION ALL
      SELECT t + 1,
             -- CAST the BIGINT element to DOUBLE FIRST so DuckDB runs
             -- the same double*double multiply as Spark's
             -- 0.1D * element_at(qa, i) — a DECIMAL*BIGINT product
             -- (exact, one rounding) can differ by 1 ulp per step
             {_CR_ALPHA} * CAST(qa[t + 1] AS DOUBLE) + (1 - {_CR_ALPHA}) * z,
             {_CR_ALPHA} * CAST(ga[t + 1] AS DOUBLE) + (1 - {_CR_ALPHA}) * p,
             n, qa, ga
      FROM cr WHERE t + 1 <= n
    ), fin AS (SELECT * FROM cr WHERE t = n),
    cal AS (
      SELECT count(DISTINCT o_orderdate::DATE) AS days FROM orders
    )
    SELECT CAST(n AS BIGINT) AS n_demands,
           CAST(list_sum(qa) AS BIGINT) AS total_demand,
           round(1.0 - n * 1.0 / days, 6) AS intermittency,
           round(z, 6) AS z_hat,
           round(p, 6) AS p_hat,
           round(z / p, 6) AS croston_forecast,
           round((1 - {_CR_ALPHA} / 2) * z / p, 6) AS sba_forecast
    FROM fin, cal
    """,
    tags=("analytics", "forecast", "time-series", "intermittent"),
)
def analytics_croston(spark, sf_dir):
    """CROSTON'S METHOD for INTERMITTENT demand (Croston 1972, with
    the Syntetos-Boylan SBA bias correction) — the forecasting model
    for series that are mostly zeros, where SES/Holt-Winters smear
    demand into every period: the slice l_partkey % 97 = 0 is ~77%
    zero days at fixture scale. Two coupled SES recurrences run ONLY
    over the nonzero-demand events: z (demand size) and p (inter-
    arrival gap), both with alpha={_CR_ALPHA}; forecast per period =
    z/p, SBA = (1 - alpha/2) z/p.

    Cross-engine exactness (the analytics_holt_winters contract): the
    inputs are exact BIGINTs (summed quantities, day gaps), Spark runs
    the recurrence as ONE F.aggregate fold over the zipped arrays, the
    oracle replays it as a recursive CTE — same IEEE expression tree
    step for step, so the final (z, p) state is bit-identical before
    the 6dp rounding.

    Scale: the fact join collapses to the calendar-bounded nonzero
    relation (<= |days| rows at any corpus size); the fold is
    O(|nonzero days|) on one row — sequential by nature, structurally
    safe because the series is calendar-bounded."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    from pyspark.sql import Window as W

    nz = (
        li.filter(F.col("l_partkey") % 97 == 0)
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum("l_quantity").cast("long").alias("q"))
    )
    gaps = nz.select(
        "d",
        "q",
        F.coalesce(
            F.datediff(F.col("d"), F.lag("d").over(W.orderBy("d"))),
            F.lit(1),
        )
        .cast("long")
        .alias("g"),
    )
    arrs = gaps.agg(
        F.count("*").alias("n"),
        F.expr(
            "transform(array_sort(collect_list(struct(d, q))), x -> x.q)"
        ).alias("qa"),
        F.expr(
            "transform(array_sort(collect_list(struct(d, g))), x -> x.g)"
        ).alias("ga"),
    )
    a = _CR_ALPHA
    fold = arrs.select(
        "n",
        "qa",
        F.expr(
            f"""aggregate(
              IF(n >= 2, sequence(2, CAST(n AS INT)), array()),
              named_struct('z', CAST(element_at(qa, 1) AS DOUBLE),
                           'p', CAST(element_at(ga, 1) AS DOUBLE)),
              (st, i) -> named_struct(
                'z', {a}D * element_at(qa, i) + (1 - {a}D) * st.z,
                'p', {a}D * element_at(ga, i) + (1 - {a}D) * st.p))"""
        ).alias("st"),
    )
    days = o.agg(
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("days")
    )
    return fold.crossJoin(F.broadcast(days)).select(
        F.col("n").cast("long").alias("n_demands"),
        F.expr("aggregate(qa, 0L, (acc, x) -> acc + x)")
        .cast("long")
        .alias("total_demand"),
        F.round(1.0 - F.col("n") * 1.0 / F.col("days"), 6).alias(
            "intermittency"
        ),
        F.round(F.col("st.z"), 6).alias("z_hat"),
        F.round(F.col("st.p"), 6).alias("p_hat"),
        F.round(F.col("st.z") / F.col("st.p"), 6).alias("croston_forecast"),
        F.round(
            (1 - F.lit(float(a)) / 2) * F.col("st.z") / F.col("st.p"), 6
        ).alias("sba_forecast"),
    )


# ------------------- Cook's distance / leverage audit (r10 extra)


@query(
    "stats_cooks_distance",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate::DATE AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), xy AS (
      SELECT d, cents,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS x
      FROM daily
    ), m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS syc,
             CAST(sum(CAST(cents AS DECIMAL(38,0))
                      * CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS syyc,
             CAST(sum(CAST(x AS DECIMAL(38,0))
                      * CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS sxyc
      FROM xy
    ), der AS (
      SELECT n, sx / n AS xbar, sxx - sx * sx / n AS sxx_c,
             (sxyc - sx * syc / n) / 100.0 AS sxy_c,
             (syyc - syc * syc / n) / 10000.0 AS syy_c,
             syc / n / 100.0 AS ybar
      FROM m
    ), fit AS (
      SELECT n, xbar, sxx_c, ybar,
             sxy_c / sxx_c AS b,
             (syy_c - sxy_c * sxy_c / sxx_c) / (n - 2) AS s2
      FROM der
    )
    SELECT d AS day, x, cents,
           round(cents / 100.0 - ((ybar - b * xbar) + b * x), 6) AS resid,
           round(1.0 / n + (x - xbar) * (x - xbar) / sxx_c, 6) AS leverage,
           round((cents / 100.0 - ((ybar - b * xbar) + b * x))
                 * (cents / 100.0 - ((ybar - b * xbar) + b * x))
                 * (1.0 / n + (x - xbar) * (x - xbar) / sxx_c)
                 / (2 * s2
                    * (1 - (1.0 / n + (x - xbar) * (x - xbar) / sxx_c))
                    * (1 - (1.0 / n + (x - xbar) * (x - xbar) / sxx_c))),
                 6) AS cook_d
    FROM xy CROSS JOIN fit
    ORDER BY (cents / 100.0 - ((ybar - b * xbar) + b * x))
             * (cents / 100.0 - ((ybar - b * xbar) + b * x))
             * (1.0 / n + (x - xbar) * (x - xbar) / sxx_c)
             / (2 * s2
                * (1 - (1.0 / n + (x - xbar) * (x - xbar) / sxx_c))
                * (1 - (1.0 / n + (x - xbar) * (x - xbar) / sxx_c)))
             DESC, day
    LIMIT 10
    """,
    tags=("stats", "regression", "diagnostics", "orders"),
)
def stats_cooks_distance(spark, sf_dir):
    """COOK'S DISTANCE + LEVERAGE regression diagnostics: fit daily
    revenue on the day index (simple OLS over the calendar-bounded
    daily relation) and rank the 10 most INFLUENTIAL days —
    D_i = e_i^2 h_i / (p s^2 (1-h_i)^2) with h_i = 1/n + (x_i-x̄)^2/Sxx,
    p = 2 — the standard audit for 'which days are dragging the trend
    line', i.e. the days a forecasting pipeline should investigate
    before trusting the fit (complements analytics_theil_sen, which
    ROBUSTIFIES against them instead of naming them).

    Exactness: all moments accumulate as DECIMAL(38,0) from exact
    BIGINT cents and integer day indices (summation-order-proof), the
    derived scalars and per-row e/h/D are the SAME IEEE expression
    tree on both engines from those identical operands, so even the
    ORDER BY on the unrounded D is cross-engine stable; final values
    round 6dp, ties broken by day.

    Scale: facts collapse to the daily relation (<= |days| rows at any
    corpus size); one moment pass + one broadcast of 6 scalars; TopK
    via TakeOrdered."""
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    xy = daily.select(
        "day",
        "cents",
        F.row_number().over(W.orderBy("day")).cast("long").alias("x"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = xy.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum(dec("cents")).cast("double").alias("syc"),
        F.sum(dec("cents") * dec("cents")).cast("double").alias("syyc"),
        F.sum(dec("x") * dec("cents")).cast("double").alias("sxyc"),
    )
    der = m.select(
        "n",
        (F.col("sx") / F.col("n")).alias("xbar"),
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")).alias(
            "sxx_c"
        ),
        (
            (F.col("sxyc") - F.col("sx") * F.col("syc") / F.col("n")) / 100.0
        ).alias("sxy_c"),
        (
            (F.col("syyc") - F.col("syc") * F.col("syc") / F.col("n"))
            / 10000.0
        ).alias("syy_c"),
        (F.col("syc") / F.col("n") / 100.0).alias("ybar"),
    )
    fit = der.select(
        "n",
        "xbar",
        "sxx_c",
        "ybar",
        (F.col("sxy_c") / F.col("sxx_c")).alias("b"),
        (
            (F.col("syy_c") - F.col("sxy_c") * F.col("sxy_c") / F.col("sxx_c"))
            / (F.col("n") - 2)
        ).alias("s2"),
    )
    j = xy.crossJoin(F.broadcast(fit))
    e = F.col("cents") / 100.0 - (
        (F.col("ybar") - F.col("b") * F.col("xbar"))
        + F.col("b") * F.col("x")
    )
    h = 1.0 / F.col("n") + (F.col("x") - F.col("xbar")) * (
        F.col("x") - F.col("xbar")
    ) / F.col("sxx_c")
    dcook = (
        e * e * h / (2 * F.col("s2") * (1 - h) * (1 - h))
    )
    return (
        j.select(
            "day",
            "x",
            "cents",
            F.round(e, 6).alias("resid"),
            F.round(h, 6).alias("leverage"),
            F.round(dcook, 6).alias("cook_d"),
            dcook.alias("_ord"),
        )
        .orderBy(F.col("_ord").desc(), "day")
        .limit(10)
        .drop("_ord")
    )


# ------------- Benjamini-Hochberg FDR over group z-tests (r10 extra)

_BH_Q = 0.10  # FDR level


def _inv_norm(p: float) -> float:
    """Inverse standard-normal CDF (Acklam 2003 rational approximation,
    public; |rel err| < 1.15e-9) in pure Python — evaluated at BUILD
    time so the BH critical values embed as repr-exact double literals
    in BOTH engines: no erf/exp ever runs inside either engine, which
    is how the whole stats battery avoids cross-libm ulp drift."""
    a = (-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00)
    import math as _m

    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = _m.sqrt(-2 * _m.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
                * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > phigh:
        q = _m.sqrt(-2 * _m.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
                 * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
            * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


def _bh_crit_literals(m: int = 25, q: float = _BH_Q) -> list[float]:
    """Two-sided BH step-up critical |z| per rank i (1-based):
    z_crit(i) = invPhi(1 - i*q/(2m))."""
    return [_inv_norm(1.0 - (i * q) / (2.0 * m)) for i in range(1, m + 1)]


def _bh_oracle_sql() -> str:
    crits = _bh_crit_literals()
    vals = ", ".join(f"({i + 1}, {c!r})" for i, c in enumerate(crits))
    return f"""
    WITH g AS (
      SELECT c_nationkey AS nation,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                  AS DOUBLE) AS sc,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)
                      * CAST(round(c_acctbal * 100) AS BIGINT))
                  AS DOUBLE) AS sc2
      FROM customer GROUP BY 1
    ), tot AS (
      SELECT sum(n) AS nn, sum(sc) AS ssc, sum(sc2) AS ssc2 FROM g
    ), z AS (
      SELECT nation, n,
             abs((sc / n - ssc / nn) * sqrt(n)
                 / sqrt(ssc2 / nn - (ssc / nn) * (ssc / nn))) AS az
      FROM g CROSS JOIN tot
    ), crit(i, zc) AS (VALUES {vals}),
    ranked AS (
      SELECT nation, n, az,
             row_number() OVER (ORDER BY az DESC, nation) AS i
      FROM z
    ), marked AS (
      SELECT r.*, c.zc, CASE WHEN r.az >= c.zc THEN r.i ELSE 0 END AS hit
      FROM ranked r JOIN crit c ON c.i = r.i
    ), k AS (SELECT max(hit) AS k FROM marked)
    SELECT nation, CAST(n AS BIGINT) AS n_customers,
           CAST(i AS BIGINT) AS rank_desc,
           round(az, 6) AS abs_z,
           round(CAST(zc AS DOUBLE), 6) AS z_crit,
           (i <= k) AS rejected
    FROM marked CROSS JOIN k
    ORDER BY rank_desc
    """


@query(
    "stats_bh_fdr",
    oracle=_bh_oracle_sql(),
    tags=("stats", "multiple-testing", "fdr", "customer"),
)
def stats_bh_fdr(spark, sf_dir):
    """BENJAMINI-HOCHBERG FDR control (q={_BH_Q}) across the 25
    per-nation one-sample z-tests of mean account balance vs the
    global mean — the MULTIPLE-TESTING layer the engine's 60+ test
    battery previously lacked: run one test per group and BH decides
    WHICH rejections survive at a controlled false-discovery rate
    (step-up: reject the k groups of largest |z| where k = max i with
    p_(i) <= i q/m).

    NO SPECIAL FUNCTIONS IN EITHER ENGINE: the step-up condition
    p_(i) <= i q/m is equivalent to |z|_(i) >= invPhi(1 - i q/(2m)),
    and those m critical values are computed at BUILD time in pure
    Python (Acklam's rational inverse-normal, public) and embedded as
    repr-exact double literals in both the Spark plan and the oracle
    VALUES list — the spectral-weekly shared-literal pattern, so
    cross-libm erf drift is structurally impossible. z statistics come
    from DECIMAL-exact cents moments; ORDER on unrounded |z| is
    bit-stable across engines.

    Under this synthetic fixture the GLOBAL NULL IS TRUE (balances
    are IID across nations), so the correct output is zero rejections
    at every scale — asserted literally by the pytest pin, which also
    pins the step-up mechanism on a synthetic z-vector where k must
    be 6 (tests/test_r10.py).

    Scale: one grouped moment pass over the facts, then all BH logic
    on the 25-row group dim."""
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    g = t(spark, sf_dir, "customer").groupBy(
        F.col("c_nationkey").alias("nation")
    ).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(cents.cast("decimal(38,0)")).cast("double").alias("sc"),
        F.sum(
            (cents.cast("decimal(38,0)") * cents.cast("decimal(38,0)"))
        )
        .cast("double")
        .alias("sc2"),
    )
    tot = g.agg(
        F.sum("n").alias("nn"),
        F.sum("sc").alias("ssc"),
        F.sum("sc2").alias("ssc2"),
    )
    z = g.crossJoin(F.broadcast(tot)).select(
        "nation",
        "n",
        (
            F.abs(
                (F.col("sc") / F.col("n") - F.col("ssc") / F.col("nn"))
                * F.sqrt(F.col("n"))
                / F.sqrt(
                    F.col("ssc2") / F.col("nn")
                    - (F.col("ssc") / F.col("nn"))
                    * (F.col("ssc") / F.col("nn"))
                )
            )
        ).alias("az"),
    )
    crits = _bh_crit_literals()
    spark_sess = z.sparkSession
    crit = spark_sess.createDataFrame(
        [(i + 1, c) for i, c in enumerate(crits)], "i int, zc double"
    )
    from pyspark.sql import Window as W

    ranked = z.select(
        "nation",
        "n",
        "az",
        F.row_number()
        .over(W.orderBy(F.col("az").desc(), "nation"))
        .alias("i"),
    )
    marked = ranked.join(F.broadcast(crit), "i").select(
        "nation",
        "n",
        "az",
        "i",
        "zc",
        F.when(F.col("az") >= F.col("zc"), F.col("i"))
        .otherwise(0)
        .alias("hit"),
    )
    k = marked.agg(F.max("hit").alias("k"))
    return (
        marked.crossJoin(F.broadcast(k))
        .select(
            "nation",
            F.col("n").cast("long").alias("n_customers"),
            F.col("i").cast("long").alias("rank_desc"),
            F.round("az", 6).alias("abs_z"),
            F.round("zc", 6).alias("z_crit"),
            (F.col("i") <= F.col("k")).alias("rejected"),
        )
        .orderBy("rank_desc")
    )


# ------------------- split-conformal prediction intervals (r10 extra)

_CONF_ALPHA = 0.1  # target miscoverage


@query(
    "ml_split_conformal",
    oracle=f"""
    WITH lab AS (
      SELECT o_orderkey AS k, o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey % 4 AS fold
      FROM orders
    ), model AS (  -- group-mean regressor fit on the train folds
      SELECT grp, sum(cents) * 1.0 / count(*) AS yhat
      FROM lab WHERE fold IN (0, 2) GROUP BY grp
    ), cal AS (
      SELECT abs(l.cents - m.yhat) AS r
      FROM lab l JOIN model m USING (grp) WHERE l.fold = 1
    ), ncal AS (SELECT count(*) AS nc FROM cal),
    qhat AS (  -- the ceil((n+1)(1-alpha))-th smallest abs residual
      SELECT r AS q FROM (
        SELECT r, row_number() OVER (ORDER BY r) AS rn FROM cal
      ) CROSS JOIN ncal
      WHERE rn = least(CAST(ceil((nc + 1) * (1 - {_CONF_ALPHA}))
                            AS BIGINT), nc)
    ), test AS (
      SELECT abs(l.cents - m.yhat) <= q AS covered
      FROM lab l JOIN model m USING (grp) CROSS JOIN qhat
      WHERE l.fold = 3
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM lab
            WHERE fold IN (0, 2)) AS n_train,
           (SELECT CAST(nc AS BIGINT) FROM ncal) AS n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           (SELECT round(q, 6) FROM qhat) AS qhat_cents,
           round(count(*) FILTER (covered) * 1.0 / count(*), 6)
             AS coverage,
           (SELECT round(2 * q / 100.0, 6) FROM qhat)
             AS interval_width
    FROM test
    """,
    tags=("ml", "conformal", "uncertainty", "orders"),
)
def ml_split_conformal(spark, sf_dir):
    """SPLIT-CONFORMAL PREDICTION INTERVALS (Vovk et al.; Lei et al.
    2018, public) — distribution-free uncertainty for ANY regressor,
    the calibration layer a training pipeline puts behind its quality
    models: fit on the train folds (o_orderkey%4 in (0,2); the model
    here is the deterministic group-mean regressor over order
    priority), take the ceil((n+1)(1-alpha))-th smallest absolute
    residual on the CALIBRATION fold (%4=1) as q-hat, and the interval
    yhat +/- q-hat then covers a fresh point with probability
    >= 1-alpha = {1 - _CONF_ALPHA} by exchangeability alone — verified
    here as measured coverage on the held-out test fold (%4=3).

    Exactness: labels are exact BIGINT cents; yhat = sum/count from
    exact sums (identical division both engines); q-hat is an EXACT
    ORDER STATISTIC (row_number over the residual, both engines sort
    the same bit-identical doubles), so every output is deterministic;
    the coverage ratio rounds 6dp. The pytest pin recomputes coverage
    and the >= 1-alpha guarantee from the raw parquet.

    Scale: one grouped fit (group dim broadcast back), one
    rank-for-order-statistic on the calibration fold — WIRED through
    operators.global_row_number's two-pass range-partitioned rank
    (range exchange + in-partition windows + broadcast prefix
    offsets; no single-partition WindowExec), one membership test on
    the test fold."""
    lab = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % 4).alias("fold"),
    )
    model = (
        lab.filter(F.col("fold").isin(0, 2))
        .groupBy("grp")
        .agg(
            (F.sum("cents") * 1.0 / F.count("*")).alias("yhat"),
        )
    )
    n_train = lab.filter(F.col("fold").isin(0, 2)).count()
    cal = (
        lab.filter(F.col("fold") == 1)
        .join(F.broadcast(model), "grp")
        .select(F.abs(F.col("cents") - F.col("yhat")).alias("r"))
    )
    # q-hat = exact order statistic via the TWO-PASS RANGE-PARTITIONED
    # rank (r10 verdict ask #2): the calibration fold is
    # corpus-proportional, so an unpartitioned row_number() window
    # would move ALL of it to ONE partition — global_row_number ranks
    # it with a range exchange + in-partition windows + broadcast
    # prefix offsets instead (no single-partition Exchange anywhere;
    # plan pinned in tests/test_r10.py::test_conformal_rank_plan).
    from gcp_etl_spark.operators.quantiles import global_row_number

    nc = cal.count()
    import math as _m

    pos = min(int(_m.ceil((nc + 1) * (1 - _CONF_ALPHA))), nc)
    qrow = (
        global_row_number(cal, ["r"], rn_col="rn")
        .filter(F.col("rn") == pos)
        .collect()  # the 1-row order statistic, cardinality-bounded
    )
    qhat = float(qrow[0]["r"])
    test = (
        lab.filter(F.col("fold") == 3)
        .join(F.broadcast(model), "grp")
        .select(
            (F.abs(F.col("cents") - F.col("yhat")) <= qhat).alias(
                "covered"
            )
        )
    )
    return test.agg(
        F.lit(n_train).cast("long").alias("n_train"),
        F.lit(nc).cast("long").alias("n_cal"),
        F.count("*").cast("long").alias("n_test"),
        F.round(F.lit(qhat), 6).alias("qhat_cents"),
        F.round(
            F.sum(F.when(F.col("covered"), 1).otherwise(0))
            * 1.0
            / F.count("*"),
            6,
        ).alias("coverage"),
        F.round(F.lit(2 * qhat / 100.0), 6).alias("interval_width"),
    )


# ------------------- SimHash radius operating curve (r10 extra)


@query(
    "dedup_simhash_radius_curve",
    # rows-only by design (blake2b-hash signatures not replayable in
    # DuckDB — the simhash family's policy); the curve's CONTRACT is
    # pinned in tests/test_r10.py: verified pairs nested/monotone in
    # radius and the banding provably lossless (banded == brute-force
    # all-pairs hamming at fixture scale).
    oracle=None,
    tags=("llm", "dedup", "simhash", "evaluation"),
)
def dedup_simhash_radius_curve(spark, sf_dir):
    """SimHash HAMMING-RADIUS OPERATING CURVE — the SimHash sibling of
    dedup_minhash_banding_curve (r9 verdict ask #4's pattern applied
    to the second near-dup family): one fixed 64-bit signature
    relation swept over radii {1,2,3,5}; each row reports the
    pigeonhole band-stage candidate count next to the exact verified
    pair count, i.e. exactly how much verify work a looser radius
    buys. The engine ships radius 3 (dedup_simhash); this curve is
    that default's evidence. See llm/dedup.py::simhash_radius_curve
    for the scale shape (signatures once + one band join per radius).
    Evaluation slice doc_id < 1250 (the dfcap pattern)."""
    from gcp_etl_spark.llm.dedup import simhash_radius_curve

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1250)
    return simhash_radius_curve(d, "doc_id", "text", radii=(1, 2, 3, 5))


# -------------- Jonckheere-Terpstra ordered-alternative test (r10)


@query(
    "stats_jonckheere_terpstra",
    oracle="""
    WITH cells AS (
      SELECT CAST(l_linenumber AS BIGINT) AS g,
             CAST(l_quantity AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2
    ), sizes AS (
      SELECT g, sum(n) AS ng FROM cells GROUP BY g
    ), tot AS (
      SELECT CAST(sum(ng) AS DOUBLE) AS nn,
             CAST(sum(CAST(ng AS DECIMAL(38,0))
                      * CAST(ng AS DECIMAL(38,0))) AS DOUBLE) AS sn2,
             CAST(sum(CAST(ng AS DECIMAL(38,0))
                      * CAST(ng AS DECIMAL(38,0))
                      * CAST(2 * ng + 3 AS DECIMAL(38,0)))
                  AS DOUBLE) AS sn23
      FROM sizes
    ), j2 AS (
      SELECT CAST(sum(CAST(a.n AS DECIMAL(38,0))
                      * CAST(b.n AS DECIMAL(38,0))
                      * (CASE WHEN a.v < b.v THEN 2
                              WHEN a.v = b.v THEN 1
                              ELSE 0 END)) AS DOUBLE) AS twoj
      FROM cells a JOIN cells b ON a.g < b.g
    )
    SELECT CAST(nn AS BIGINT) AS n_rows,
           round(twoj / 2, 1) AS j_stat,
           round((nn * nn - sn2) / 4, 1) AS j_mean,
           round((twoj / 2 - (nn * nn - sn2) / 4)
                 / sqrt((nn * nn * (2 * nn + 3) - sn23) / 72), 6) AS z
    FROM j2 CROSS JOIN tot
    """,
    tags=("stats", "nonparametric", "trend", "lineitem"),
)
def stats_jonckheere_terpstra(spark, sf_dir):
    """JONCKHEERE-TERPSTRA ordered-alternative test (Jonckheere 1954,
    public): does l_quantity trend UP across the ORDERED groups
    l_linenumber 1..7? J = sum over group pairs g<h of the Mann-Whitney
    count #(a<b) + ties/2 — strictly more powerful than Kruskal-Wallis
    when the alternative is monotone, which is exactly the 'does the
    metric drift along an ordinal dimension' question a pipeline DQ
    layer asks.

    Exactness (the stats_ops grid convention): the fact table collapses
    FIRST to the (group, value) cell grid — bounded by 7 x 50 = 350
    cells at ANY corpus size — and all pair algebra runs on the grid
    with DECIMAL(38,0) products (2J stays an exact integer; the
    variance terms exceed BIGINT at 10x so they accumulate as decimals
    too). z uses the standard no-tie variance (documented upward bias
    under ties — the tie-corrected term subtracts <1% on this grid);
    numerator and denominator are identical IEEE trees on both engines.

    Scale: one hash agg to the grid; the pair join is grid x grid,
    constant in the data."""
    cells = (
        t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_linenumber").cast("long").alias("g"),
            F.col("l_quantity").cast("long").alias("v"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    sizes = cells.groupBy("g").agg(F.sum("n").alias("ng"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = sizes.agg(
        F.sum("ng").cast("double").alias("nn"),
        F.sum(dec(F.col("ng")) * dec(F.col("ng")))
        .cast("double")
        .alias("sn2"),
        F.sum(
            dec(F.col("ng"))
            * dec(F.col("ng"))
            * dec(2 * F.col("ng") + 3)
        )
        .cast("double")
        .alias("sn23"),
    )
    a = cells.alias("a")
    b = cells.alias("b")
    j2 = (
        a.join(b, F.col("a.g") < F.col("b.g"))
        .select(
            (
                dec(F.col("a.n"))
                * dec(F.col("b.n"))
                * F.when(F.col("a.v") < F.col("b.v"), 2)
                .when(F.col("a.v") == F.col("b.v"), 1)
                .otherwise(0)
            ).alias("term")
        )
        .agg(F.sum("term").cast("double").alias("twoj"))
    )
    return j2.crossJoin(F.broadcast(tot)).select(
        F.col("nn").cast("long").alias("n_rows"),
        F.round(F.col("twoj") / 2, 1).alias("j_stat"),
        F.round(
            (F.col("nn") * F.col("nn") - F.col("sn2")) / 4, 1
        ).alias("j_mean"),
        F.round(
            (
                F.col("twoj") / 2
                - (F.col("nn") * F.col("nn") - F.col("sn2")) / 4
            )
            / F.sqrt(
                (
                    F.col("nn") * F.col("nn") * (2 * F.col("nn") + 3)
                    - F.col("sn23")
                )
                / 72
            ),
            6,
        ).alias("z"),
    )


# -------------- STL-lite seasonal decomposition (r10 extra)


@query(
    "analytics_stl_decompose",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate::DATE AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), seq AS (
      SELECT d, cents,
             sum(cents) OVER (ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             count(*) OVER (ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w,
             date_diff('day', DATE '1970-01-01', d) % 7 AS dow
      FROM daily
    ), fullw AS (
      SELECT d, dow, 7 * cents AS y7, s7 AS t7, 7 * cents - s7 AS det7
      FROM seq WHERE w = 7
    ), sdow AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(det7) AS DOUBLE) / count(*) AS s7m
      FROM fullw GROUP BY dow
    ), base AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(y7) AS DOUBLE) AS sy,
             CAST(sum(t7) AS DOUBLE) AS st
      FROM fullw
    ), smean AS (
      SELECT CAST(sum(CAST(nd * s7m AS DECIMAL(38,6))) AS DOUBLE)
               / max(b.n) AS sm
      FROM sdow CROSS JOIN base b
    ), vars AS (
      SELECT
        CAST(sum(CAST((f.y7 - b.sy / b.n) * (f.y7 - b.sy / b.n)
                      AS DECIMAL(38,6))) AS DOUBLE) AS vy,
        CAST(sum(CAST((f.t7 - b.st / b.n) * (f.t7 - b.st / b.n)
                      AS DECIMAL(38,6))) AS DOUBLE) AS vt,
        CAST(sum(CAST((s.s7m - m.sm) * (s.s7m - m.sm)
                      AS DECIMAL(38,6))) AS DOUBLE) AS vs,
        CAST(sum(CAST((f.det7 - s.s7m) * (f.det7 - s.s7m)
                      AS DECIMAL(38,6))) AS DOUBLE) AS vr
      FROM fullw f JOIN sdow s ON s.dow = f.dow
      CROSS JOIN base b CROSS JOIN smean m
    )
    SELECT s.dow, s.nd AS n_days,
           round(s.s7m / 7, 4) AS seasonal_cents,
           round(v.vt / v.vy, 6) AS trend_share,
           round(v.vs / v.vy, 6) AS seasonal_share,
           round(v.vr / v.vy, 6) AS remainder_share
    FROM sdow s CROSS JOIN vars v
    ORDER BY s.dow
    """,
    tags=("analytics", "time-series", "decomposition", "orders"),
)
def analytics_stl_decompose(spark, sf_dir):
    """STL-LITE ADDITIVE DECOMPOSITION of the daily-revenue series:
    trend = centered 7-day moving average (full windows only),
    seasonal = per-weekday mean of the detrended series, remainder =
    what's left — reporting the per-weekday seasonal effects AND the
    variance decomposition (trend/seasonal/remainder share of total
    variance), the one-look 'is this series trend-, season-, or
    noise-dominated' diagnostic that decides which forecasting family
    (holt_trend / holt_winters / croston) applies.

    Exactness: the detrended series is kept 7-SCALED so it stays an
    exact BIGINT (7y - sum7 — the window_range_frame prefix-difference
    trick applied to decomposition); weekday uses the engine-portable
    epoch-day % 7 (Spark dayofweek is 1-based Sunday, DuckDB 0-based —
    neither is used); every squared deviation is per-term
    DECIMAL(38,6)-cast before summing (the stats_variance_ratio
    convention), so summation order cannot move the shares. Weekday
    means divide exact integers by exact counts — identical IEEE
    division. Shares need not sum to 1 (components correlate — that
    correlation IS part of the diagnostic).

    Scale: facts collapse to the calendar-bounded daily relation; one
    7-row window pass + two tiny grouped aggs."""
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    win = W.orderBy("d").rowsBetween(-3, 3)
    seq = daily.select(
        "d",
        "cents",
        F.sum("cents").over(win).alias("s7"),
        F.count("*").over(win).alias("w"),
        (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) % 7).alias(
            "dow"
        ),
    )
    fullw = seq.filter(F.col("w") == 7).select(
        "d",
        "dow",
        (7 * F.col("cents")).alias("y7"),
        F.col("s7").alias("t7"),
        (7 * F.col("cents") - F.col("s7")).alias("det7"),
    )
    sdow = fullw.groupBy("dow").agg(
        F.count("*").cast("long").alias("nd"),
        (F.sum("det7").cast("double") / F.count("*")).alias("s7m"),
    )
    base = fullw.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("y7").cast("double").alias("sy"),
        F.sum("t7").cast("double").alias("st"),
    )
    dec6 = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    smean = (
        sdow.crossJoin(F.broadcast(base))
        .agg(
            (
                F.sum(dec6(F.col("nd") * F.col("s7m"))).cast("double")
                / F.max("n")
            ).alias("sm")
        )
    )
    joined = (
        fullw.join(F.broadcast(sdow), "dow")
        .crossJoin(F.broadcast(base))
        .crossJoin(F.broadcast(smean))
    )
    vars_ = joined.agg(
        F.sum(
            dec6(
                (F.col("y7") - F.col("sy") / F.col("n"))
                * (F.col("y7") - F.col("sy") / F.col("n"))
            )
        )
        .cast("double")
        .alias("vy"),
        F.sum(
            dec6(
                (F.col("t7") - F.col("st") / F.col("n"))
                * (F.col("t7") - F.col("st") / F.col("n"))
            )
        )
        .cast("double")
        .alias("vt"),
        F.sum(
            dec6(
                (F.col("s7m") - F.col("sm")) * (F.col("s7m") - F.col("sm"))
            )
        )
        .cast("double")
        .alias("vs"),
        F.sum(
            dec6(
                (F.col("det7") - F.col("s7m"))
                * (F.col("det7") - F.col("s7m"))
            )
        )
        .cast("double")
        .alias("vr"),
    )
    return (
        sdow.crossJoin(F.broadcast(vars_))
        .select(
            F.col("dow").cast("long").alias("dow"),
            F.col("nd").alias("n_days"),
            F.round(F.col("s7m") / 7, 4).alias("seasonal_cents"),
            F.round(F.col("vt") / F.col("vy"), 6).alias("trend_share"),
            F.round(F.col("vs") / F.col("vy"), 6).alias("seasonal_share"),
            F.round(F.col("vr") / F.col("vy"), 6).alias("remainder_share"),
        )
        .orderBy("dow")
    )


# -------------- Breusch-Pagan heteroskedasticity test (r10 extra)


@query(
    "stats_breusch_pagan",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate::DATE AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), xy AS (
      SELECT cents, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS x
      FROM daily
    ), m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS syc,
             CAST(sum(CAST(x AS DECIMAL(38,0))
                      * CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS sxyc
      FROM xy
    ), fit AS (
      SELECT n, sx, sxx,
             ((sxyc - sx * syc / n) / 100.0)
               / (sxx - sx * sx / n) AS b,
             (syc / n / 100.0)
               - ((sxyc - sx * syc / n) / 100.0)
                 / (sxx - sx * sx / n) * (sx / n) AS a
      FROM m
    ), resid AS (
      SELECT x,
             (cents / 100.0 - (a + b * x))
               * (cents / 100.0 - (a + b * x)) AS e2
      FROM xy CROSS JOIN fit
    ), aux AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(e2 AS DECIMAL(38,6))) AS DOUBLE) AS se2,
             CAST(sum(CAST(x * e2 AS DECIMAL(38,6))) AS DOUBLE) AS sxe2,
             CAST(sum(CAST(e2 * e2 AS DECIMAL(38,6))) AS DOUBLE) AS se4
      FROM resid
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round((sxe2 - sx * se2 / n) * (sxe2 - sx * se2 / n)
                 / ((sxx - sx * sx / n) * (se4 - se2 * se2 / n)), 6)
             AS r2_aux,
           round(n * (sxe2 - sx * se2 / n) * (sxe2 - sx * se2 / n)
                 / ((sxx - sx * sx / n) * (se4 - se2 * se2 / n)), 6)
             AS lm_stat,
           (n * (sxe2 - sx * se2 / n) * (sxe2 - sx * se2 / n)
            / ((sxx - sx * sx / n) * (se4 - se2 * se2 / n))
            > 3.841458820694124) AS heteroskedastic_5pct
    FROM aux
    """,
    tags=("stats", "regression", "diagnostics", "orders"),
)
def stats_breusch_pagan(spark, sf_dir):
    """BREUSCH-PAGAN heteroskedasticity test (Koenker's studentized
    form, public): after fitting the daily-revenue trend line, regress
    the SQUARED residuals on the day index — LM = n R²_aux is chi²(1)
    under homoskedasticity; a significant LM means the variance itself
    trends, which invalidates the OLS standard errors every downstream
    interval (conformal widths, control-chart limits) would otherwise
    assume constant. Completes the regression-diagnostics pair with
    stats_cooks_distance (influence) on the same fit.

    Exactness: first-stage moments are DECIMAL(38,0) over exact
    BIGINTs; residuals come from identical IEEE trees; the aux-stage
    sums (e², x e², e⁴) are per-term DECIMAL(38,6)-cast before summing
    (the stats convention — e⁴ also exceeds double-safe integer range,
    and per-term casting makes order irrelevant). The chi²₁ 5%
    critical value 3.8414588… is a shared repr-exact literal (the BH
    pattern — no special functions in-engine).

    Scale: facts collapse to the daily relation; two moment passes."""
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    xy = daily.select(
        "cents",
        F.row_number().over(W.orderBy("d")).cast("long").alias("x"),
    )
    dec0 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dec6 = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    m = xy.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec0(F.col("x"))).cast("double").alias("sx"),
        F.sum(dec0(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.sum(dec0(F.col("cents"))).cast("double").alias("syc"),
        F.sum(dec0(F.col("x")) * dec0(F.col("cents")))
        .cast("double")
        .alias("sxyc"),
    )
    fit = m.select(
        "n",
        "sx",
        "sxx",
        (
            ((F.col("sxyc") - F.col("sx") * F.col("syc") / F.col("n")) / 100.0)
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("b"),
        (
            (F.col("syc") / F.col("n") / 100.0)
            - ((F.col("sxyc") - F.col("sx") * F.col("syc") / F.col("n")) / 100.0)
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            * (F.col("sx") / F.col("n"))
        ).alias("a"),
    )
    e = F.col("cents") / 100.0 - (F.col("a") + F.col("b") * F.col("x"))
    resid = xy.crossJoin(F.broadcast(fit)).select(
        "x", (e * e).alias("e2")
    )
    aux = resid.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec0(F.col("x"))).cast("double").alias("sx"),
        F.sum(dec0(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.sum(dec6(F.col("e2"))).cast("double").alias("se2"),
        F.sum(dec6(F.col("x") * F.col("e2"))).cast("double").alias("sxe2"),
        F.sum(dec6(F.col("e2") * F.col("e2"))).cast("double").alias("se4"),
    )
    num = (F.col("sxe2") - F.col("sx") * F.col("se2") / F.col("n")) * (
        F.col("sxe2") - F.col("sx") * F.col("se2") / F.col("n")
    )
    den = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) * (
        F.col("se4") - F.col("se2") * F.col("se2") / F.col("n")
    )
    return aux.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(num / den, 6).alias("r2_aux"),
        F.round(F.col("n") * num / den, 6).alias("lm_stat"),
        (F.col("n") * num / den > 3.841458820694124).alias(
            "heteroskedastic_5pct"
        ),
    )


# ------------- streaming BH-FDR multi-group drift monitor (r10)


def _fdr_drift_oracle_sql() -> str:
    crits = _bh_crit_literals(m=5, q=_BH_Q)
    vals = ", ".join(f"({i + 1}, {c!r})" for i, c in enumerate(crits))
    return f"""
    WITH f AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS w_start,
             event_type AS g,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), ref AS (
      SELECT g, CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                  / count(*) AS mu,
             sqrt(CAST(sum(CAST(cents AS DECIMAL(38,0))
                           * CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                    / count(*)
                  - (CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                       / count(*))
                    * (CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                         / count(*))) AS sd
      FROM f GROUP BY g
    ), wm AS (
      SELECT w_start, g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS sc
      FROM f GROUP BY 1, 2
    ), z AS (
      SELECT w.w_start, w.g, w.n,
             abs((w.sc / w.n - r.mu) * sqrt(CAST(w.n AS DOUBLE)) / r.sd)
               AS az
      FROM wm w JOIN ref r ON r.g = w.g
    ), crit(i, zc) AS (VALUES {vals}),
    ranked AS (
      SELECT w_start, g, n, az,
             row_number() OVER (PARTITION BY w_start
                                ORDER BY az DESC, g) AS i
      FROM z
    ), marked AS (
      SELECT r.*, CASE WHEN r.az >= CAST(c.zc AS DOUBLE)
                       THEN r.i ELSE 0 END AS hit
      FROM ranked r JOIN crit c ON c.i = r.i
    ), kk AS (
      SELECT w_start, max(hit) AS k FROM marked GROUP BY w_start
    )
    SELECT m.w_start, m.g, CAST(m.n AS BIGINT) AS n_events,
           round(m.az, 6) AS abs_z,
           CAST(m.i AS BIGINT) AS rank_desc,
           (m.i <= kk.k) AS drifted
    FROM marked m JOIN kk USING (w_start)
    ORDER BY m.w_start, m.g
    """


@query(
    "stream_fdr_drift",
    oracle=_fdr_drift_oracle_sql(),
    tags=("streaming", "drift", "fdr", "multiple-testing", "events"),
)
def stream_fdr_drift(spark, sf_dir):
    """STREAMING BH-FDR MULTI-GROUP DRIFT MONITOR — the multiple-
    testing upgrade of the drift family (psi / G-test / Wasserstein
    monitors watch ONE statistic; a segmented dashboard watches m and
    needs FDR control or it pages 'alpha x m' false alarms by
    design): per tumbling day-window, one z-test per event_type of
    windowed mean value vs the static per-type reference profile,
    then the Benjamini-Hochberg step-up WITHIN the window decides
    which drifts survive at q={_BH_Q}. Critical |z| values are
    Acklam literals (no in-engine erf — the stats_bh_fdr contract).

    Stream-safety: the windowed per-group moment agg
    (streaming/windows.py::group_moment_windows — exact DECIMAL sums,
    additive, batching-invariance pinned by the split-and-merge
    pytest) is the ONLY stateful stage; the z/BH algebra is a
    projection plus an m-row per-window sort. The reference profile
    is a static broadcast, exactly like psi_drift's.

    Under this IID fixture the per-window null is TRUE, so windows
    reject nothing or noise-rarely — the pytest pins batching
    invariance and the BH mechanics, not a fake drift."""
    from gcp_etl_spark.streaming.windows import (
        fdr_drift,
        group_moment_windows,
    )

    e = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    ref = e.groupBy(F.col("event_type").alias("g")).agg(
        (
            F.sum(cents.cast("decimal(38,0)")).cast("double") / F.count("*")
        ).alias("mu"),
        F.sqrt(
            F.sum(
                cents.cast("decimal(38,0)") * cents.cast("decimal(38,0)")
            ).cast("double")
            / F.count("*")
            - (
                F.sum(cents.cast("decimal(38,0)")).cast("double")
                / F.count("*")
            )
            * (
                F.sum(cents.cast("decimal(38,0)")).cast("double")
                / F.count("*")
            )
        ).alias("sd"),
    )
    crits = _bh_crit_literals(m=5, q=_BH_Q)
    crit = spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(crits)], "i int, zc double"
    )
    wm = group_moment_windows(e, watermark=None).select(
        "w_start", "g", "n", "sc"
    )
    return fdr_drift(wm, ref, crit).orderBy("w_start", "g")


# ------------------- log-log price elasticity (r10 extra)


@query(
    "analytics_price_elasticity",
    oracle="""
    WITH pp AS (  -- per-part mean unit price and total demand
      SELECT l_partkey AS pk,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE)
               / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS price,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS demand
      FROM lineitem GROUP BY 1
    ), lg AS (
      SELECT CAST(ln(price) AS DECIMAL(38,18)) AS lx,
             CAST(ln(demand) AS DECIMAL(38,18)) AS ly
      FROM pp
    ), lgd AS (
      SELECT CAST(lx AS DOUBLE) AS x, CAST(ly AS DOUBLE) AS y FROM lg
    ), m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
      FROM lgd
    )
    SELECT CAST(n AS BIGINT) AS n_parts,
           round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)
             AS elasticity,
           round((sxy - sx * sy / n) * (sxy - sx * sy / n)
                 / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
             AS r2
    FROM m
    """,
    tags=("analytics", "economics", "regression", "lineitem"),
)
def analytics_price_elasticity(spark, sf_dir):
    """LOG-LOG PRICE ELASTICITY OF DEMAND: regress ln(total quantity)
    on ln(mean unit price) across parts — the slope IS the elasticity
    (percent demand change per percent price change), the canonical
    pricing-analytics regression. Unit price per part = exact cents
    extendedprice sum / exact quantity sum (identical division).

    ln() IS a libm call that can differ by an ulp between the JVM and
    DuckDB, so each log value is cast DECIMAL(38,18) IMMEDIATELY (the
    analytics_theil_index convention — the cast absorbs sub-ulp
    drift) then brought back to double, so both engines multiply
    bit-identical operands; every moment term (x, y, xy, x², y²) is
    per-term DECIMAL(38,12)-cast before summing, making summation
    order irrelevant too (a decimal×decimal product would overflow
    DuckDB's 38-digit cap — the double-multiply-then-cast shape is
    the overflow-safe equivalent).

    Scale: facts collapse to the part dim (one hash agg); the
    regression is one moment pass over parts."""
    li = t(spark, sf_dir, "lineitem")
    pp = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(
                F.round(F.col("l_extendedprice") * 100)
                .cast("long")
                .cast("decimal(38,0)")
            ).cast("double")
            / F.sum(F.col("l_quantity").cast("long").cast("decimal(38,0)"))
            .cast("double")
        ).alias("price"),
        F.sum(F.col("l_quantity").cast("long").cast("decimal(38,0)"))
        .cast("double")
        .alias("demand"),
    )
    lg = pp.select(
        F.log(F.col("price"))
        .cast("decimal(38,18)")
        .cast("double")
        .alias("x"),
        F.log(F.col("demand"))
        .cast("decimal(38,18)")
        .cast("double")
        .alias("y"),
    )
    dec12 = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    m = lg.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec12(F.col("x"))).cast("double").alias("sx"),
        F.sum(dec12(F.col("y"))).cast("double").alias("sy"),
        F.sum(dec12(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
        F.sum(dec12(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.sum(dec12(F.col("y") * F.col("y"))).cast("double").alias("syy"),
    )
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    syy_c = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    return m.select(
        F.col("n").cast("long").alias("n_parts"),
        F.round(sxy_c / sxx_c, 6).alias("elasticity"),
        F.round(sxy_c * sxy_c / (sxx_c * syy_c), 6).alias("r2"),
    )


# ------------- Mondrian (group-conditional) conformal (r10 extra)


@query(
    "ml_conformal_mondrian",
    oracle=f"""
    WITH lab AS (
      SELECT o_orderkey AS k, o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey % 4 AS fold
      FROM orders
    ), model AS (
      SELECT grp, sum(cents) * 1.0 / count(*) AS yhat
      FROM lab WHERE fold IN (0, 2) GROUP BY grp
    ), cal AS (
      SELECT l.grp, abs(l.cents - m.yhat) AS r
      FROM lab l JOIN model m USING (grp) WHERE l.fold = 1
    ), qg AS (  -- PER-GROUP ceil((n_g+1)(1-alpha))-th smallest residual
      SELECT grp, r AS q FROM (
        SELECT grp, r,
               row_number() OVER (PARTITION BY grp ORDER BY r) AS rn,
               count(*) OVER (PARTITION BY grp) AS nc
        FROM cal
      ) WHERE rn = least(CAST(ceil((nc + 1) * (1 - {_CONF_ALPHA}))
                              AS BIGINT), nc)
    ), test AS (
      SELECT l.grp, abs(l.cents - m.yhat) <= q.q AS covered
      FROM lab l JOIN model m USING (grp) JOIN qg q USING (grp)
      WHERE l.fold = 3
    )
    SELECT t.grp,
           CAST(count(*) AS BIGINT) AS n_test,
           round(max(q.q), 6) AS qhat_cents,
           round(count(*) FILTER (covered) * 1.0 / count(*), 6)
             AS coverage
    FROM test t JOIN qg q ON q.grp = t.grp
    GROUP BY t.grp
    ORDER BY t.grp
    """,
    tags=("ml", "conformal", "uncertainty", "orders"),
)
def ml_conformal_mondrian(spark, sf_dir):
    """MONDRIAN (GROUP-CONDITIONAL) CONFORMAL INTERVALS — the upgrade
    of ml_split_conformal that every segmented deployment actually
    needs: marginal conformal guarantees 1-alpha coverage ON AVERAGE,
    which can hide a badly-undercovered segment behind an
    overcovered one; calibrating q-hat PER GROUP (per order priority)
    restores the 1-alpha guarantee WITHIN every group
    (exchangeability within group is all it needs — Vovk's Mondrian
    taxonomy, public). Output: per-group q-hat and measured held-out
    coverage, the table an ML-ops reviewer reads before shipping
    per-segment intervals.

    Exactness: identical to ml_split_conformal (exact cents labels,
    exact sum/count model, per-group EXACT ORDER-STATISTIC q-hat —
    both engines rank the same bit-identical doubles; the value at a
    given rank is tie-order-independent).

    Scale: the per-group rank is WIRED through
    operators.global_row_number's two-pass range-partitioned rank
    (per-group row counts are a separate map-side-combinable agg, so
    no task ever holds a whole group); everything else is broadcast
    joins against the group dim."""
    lab = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % 4).alias("fold"),
    )
    model = (
        lab.filter(F.col("fold").isin(0, 2))
        .groupBy("grp")
        .agg((F.sum("cents") * 1.0 / F.count("*")).alias("yhat"))
    )
    cal = (
        lab.filter(F.col("fold") == 1)
        .join(F.broadcast(model), "grp")
        .select("grp", F.abs(F.col("cents") - F.col("yhat")).alias("r"))
    )
    # per-group q-hat via the TWO-PASS RANGE-PARTITIONED rank (r10
    # verdict ask #2): a partitioned row_number() window puts n/|groups|
    # rows on one partition — unbounded in corpus size at 5 priority
    # groups. global_row_number range-exchanges on (grp, r) instead, so
    # every task holds only its range slice; per-group sizes come from
    # a plain map-side-combinable count, and the rank-equality filter
    # picks each group's order statistic (plan pinned in
    # tests/test_r10.py::test_conformal_rank_plan).
    from gcp_etl_spark.operators.quantiles import global_row_number

    ncs = cal.groupBy("grp").agg(F.count("*").alias("nc"))
    qg = (
        global_row_number(cal, ["r"], ["grp"], rn_col="rn")
        .join(F.broadcast(ncs), "grp")
        .filter(
            F.col("rn")
            == F.least(
                F.ceil((F.col("nc") + 1) * (1 - _CONF_ALPHA)).cast("long"),
                F.col("nc"),
            )
        )
        .select("grp", F.col("r").alias("q"))
    )
    test = (
        lab.filter(F.col("fold") == 3)
        .join(F.broadcast(model), "grp")
        .join(F.broadcast(qg), "grp")
        .select(
            "grp",
            "q",
            (F.abs(F.col("cents") - F.col("yhat")) <= F.col("q")).alias(
                "covered"
            ),
        )
    )
    return (
        test.groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.round(F.max("q"), 6).alias("qhat_cents"),
            F.round(
                F.sum(F.when(F.col("covered"), 1).otherwise(0))
                * 1.0
                / F.count("*"),
                6,
            ).alias("coverage"),
        )
        .orderBy("grp")
    )
