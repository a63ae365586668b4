"""Round-12 operators (r11 verdict asks): the streaming windowed KLL
quantile monitor (ask #7 — the sketch-tier sibling of
stream_quantile_monitor's exact bucket-CDF) plus this round's new
analytics/pipeline surface.

Exactness conventions follow the house rules (per-term DECIMAL casts
before cross-engine sums, counts stay BIGINT, final doubles round 6dp,
integer-exact rational crossing tests for quantile thresholds).

No reference counterpart (the reference's query surface is
k8s/submit/etl-on-gcp-vinicius-campos.py:22-92 — SELECT * LIMIT 100
plus two counts); these extend the declared training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t
from gcp_etl_spark.operators.barrier import barrier

# --------- streaming windowed KLL quantile monitor (r11 ask #7)

_KLL_PROBS = {"p50_est": 0.50, "p90_est": 0.90, "p99_est": 0.99}


@query(
    "stream_kll_window_quantiles",
    # rows-only by design: sketch survivors depend on partitioning, so
    # no engine-independent SQL oracle exists. Pinned instead in
    # tests/test_r12.py: per-window rank error <= 2% vs exact sorted
    # ranks, per-window total weight == exact row count (mass),
    # streaming-vs-batch bit-equality over the same epoch splits,
    # batching-invariance of mass + error class, replay idempotence.
    oracle=None,
    tags=("streaming", "quantiles", "sketch", "kll", "events"),
)
def stream_kll_window_quantiles(spark, sf_dir):
    """STREAMING WINDOWED KLL QUANTILE MONITOR (batch-mode execution
    of the streaming/kll_stream.py stage, the stream_quantile_monitor
    convention): per tumbling day-window, p50/p90/p99 ESTIMATES of the
    raw event value from per-(window, partition) KLL compactor stacks.

    The exact bucket-CDF monitor (stream_quantile_monitor) needs a
    bounded integer bucket grid; this sketch tier handles
    unbounded-precision values at bounded memory and is the one a 100
    TB latency dashboard actually runs: raw values NEVER shuffle (each
    scan task folds its rows into per-window stacks and emits <=
    k*levels survivors), the union of emissions across tasks or
    micro-batches IS the merged sketch, and the estimate is one
    cumulative window PARTITIONED BY w_start with integer-exact
    rational crossing tests (cum*den >= num*W in longs).

    Scale: sketch relation is #tasks * |windows| * k * levels rows —
    set by the sketch parameters and window policy, not the data; the
    streaming dual persists the identical rows per epoch and merges by
    union (tests pin equality). Sibling tiers: agg_kll_quantile_sketch
    (unwindowed), operators/quantiles.py (exact two-pass)."""
    from gcp_etl_spark.streaming.kll_stream import window_sketches
    from gcp_etl_spark.operators.kll import (
        windowed_quantiles_from_sketch,
    )

    e = t(spark, sf_dir, "events")
    sk = window_sketches(e, "ts", "value", k=256, window="1 day")
    est = windowed_quantiles_from_sketch(sk, "w_start", _KLL_PROBS)
    return est.select(
        "w_start",
        "weighted_n",
        F.round("p50_est", 6).alias("p50_est"),
        F.round("p90_est", 6).alias("p90_est"),
        F.round("p99_est", 6).alias("p99_est"),
    ).orderBy("w_start")


# --------------- rendezvous (HRW) resharding movement (r12)

_HRW_FROM = 8
_HRW_TO = 9


def _hrw_combined(key, s: int):
    """Deterministic 32-bit md5 score for (key, shard), packed with
    the shard id in the low 4 bits so argmax == plain max of one long
    (ties — p ~ 2^-32 per pair — break toward the higher shard id,
    identically in both engines)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(key.cast("string"), F.lit(f":{s}"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        * 16
        + s
    )


@query(
    "scale_rendezvous_resharding",
    oracle=f"""
    WITH scored AS (
      SELECT d.doc_id,
             greatest({", ".join(
                 "(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':"
                 + str(s) + "'), 1, 8))::BIGINT * 16 + " + str(s) + ")"
                 for s in range(_HRW_FROM)
             )}) % 16 AS shard_from,
             greatest({", ".join(
                 "(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':"
                 + str(s) + "'), 1, 8))::BIGINT * 16 + " + str(s) + ")"
                 for s in range(_HRW_TO)
             )}) % 16 AS shard_to
      FROM documents d
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (shard_from <> shard_to) AS BIGINT)
             AS hrw_moved,
           round(CAST(count(*) FILTER (shard_from <> shard_to)
                 AS DOUBLE) / count(*), 6) AS hrw_moved_frac,
           CAST(count(*) FILTER (doc_id % {_HRW_FROM}
                 <> doc_id % {_HRW_TO}) AS BIGINT) AS mod_moved,
           round(CAST(count(*) FILTER (doc_id % {_HRW_FROM}
                 <> doc_id % {_HRW_TO}) AS DOUBLE) / count(*), 6)
             AS mod_moved_frac
    FROM scored
    """,
    tags=("scale", "sharding", "hashing", "documents"),
)
def scale_rendezvous_resharding(spark, sf_dir):
    """RENDEZVOUS (highest-random-weight) SHARD ASSIGNMENT and the
    data-movement cost of growing the shard count 8 -> 9, next to the
    naive mod-N baseline. HRW (Thaler-Ravishankar 1996, public) moves
    only the keys whose NEW shard wins the per-key score tournament —
    expected 1/9 of the corpus — while mod-N remaps ~8/9 of all keys.
    At 100 TB this is THE resharding decision: the output prices it
    (hrw_moved_frac ~0.11 vs mod_moved_frac ~0.89).

    Exactness: the per-(key, shard) score is the engine-standard md5
    32-bit integer, packed with the shard id in the low 4 bits so the
    argmax is a plain integer ``greatest`` — no floats anywhere.

    Scale: one narrow projection per document (9 md5 calls JVM-side in
    the scan task), one count aggregate; nothing shuffles but the
    final partial counts."""
    d = t(spark, sf_dir, "documents").select("doc_id")
    key = F.col("doc_id")
    scored = d.select(
        "doc_id",
        (
            F.greatest(*[_hrw_combined(key, s) for s in range(_HRW_FROM)])
            % 16
        ).alias("shard_from"),
        (
            F.greatest(*[_hrw_combined(key, s) for s in range(_HRW_TO)])
            % 16
        ).alias("shard_to"),
    )
    moved = F.col("shard_from") != F.col("shard_to")
    mod_moved = (F.col("doc_id") % _HRW_FROM) != (
        F.col("doc_id") % _HRW_TO
    )
    return scored.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_if(moved).cast("long").alias("hrw_moved"),
        F.round(
            F.count_if(moved).cast("double") / F.count("*"), 6
        ).alias("hrw_moved_frac"),
        F.count_if(mod_moved).cast("long").alias("mod_moved"),
        F.round(
            F.count_if(mod_moved).cast("double") / F.count("*"), 6
        ).alias("mod_moved_frac"),
    )


# --------------- reciprocal rank fusion (r12)

_RRF_K = 60
_RRF_TERM_A = "data"
_RRF_TERM_B = "model"


def _rrf_tf(term: str):
    """Exact integer term frequency via length arithmetic (JVM-side,
    no regex): occurrences = (len - len(text with term removed)) /
    len(term)."""
    return (
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(term)))
        )
        / len(term)
    ).cast("long")


@query(
    "eval_rank_fusion_rrf",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, n_chars,
             CAST((length(text) - length(replace(text, '{_RRF_TERM_A}',
               ''))) / {len(_RRF_TERM_A)} AS BIGINT) AS tf_a,
             CAST((length(text) - length(replace(text, '{_RRF_TERM_B}',
               ''))) / {len(_RRF_TERM_B)} AS BIGINT) AS tf_b
      FROM documents
    ), ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY
               CAST(tf_a AS DOUBLE) / (tf_a + 1.2 + 0.001 * n_chars)
               DESC, doc_id) AS rank_a,
             row_number() OVER (ORDER BY
               CAST(tf_b AS DOUBLE) / (tf_b + 1.2 + 0.001 * n_chars)
               DESC, doc_id) AS rank_b
      FROM scored
    )
    SELECT doc_id, CAST(rank_a AS BIGINT) AS rank_a,
           CAST(rank_b AS BIGINT) AS rank_b,
           round(1.0 / ({_RRF_K} + rank_a)
                 + 1.0 / ({_RRF_K} + rank_b), 9) AS rrf_score
    FROM ranked
    ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
    tags=("eval", "ranking", "retrieval", "fusion", "documents"),
)
def eval_rank_fusion_rrf(spark, sf_dir):
    """RECIPROCAL RANK FUSION (Cormack-Clarke-Buettcher 2009, public)
    — the standard zero-training hybrid-retrieval combiner: fuse two
    independent rankings of the corpus (here a BM25-lite lexical score
    for two different terms; in production, lexical vs embedding ANN)
    by summing 1/(k + rank) with k=60, and return the fused top-10.
    RRF needs only RANKS, never comparable scores, which is exactly
    why retrieval stacks use it to merge heterogeneous scorers.

    Exactness: term frequencies are exact integers from length
    arithmetic; the BM25-lite score is one identical IEEE expression
    from integers in both engines; ranks are integers; the fused score
    is a sum of two exact reciprocals, rounded 9dp and used as the
    ORDER BY with doc_id tiebreak.

    Scale: each ranking is the two-pass range-partitioned global rank
    (operators.quantiles.global_row_number — never a single-partition
    window over the corpus); the fusion is a co-keyed join on doc_id;
    top-10 is TakeOrderedAndProject."""
    from gcp_etl_spark.operators.quantiles import global_row_number

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        _rrf_tf(_RRF_TERM_A).alias("tf_a"),
        _rrf_tf(_RRF_TERM_B).alias("tf_b"),
    )

    def _score(tf):
        return tf.cast("double") / (
            tf + F.lit(1.2) + F.lit(0.001) * F.col("n_chars")
        )

    base = d.select(
        "doc_id",
        (-_score(F.col("tf_a"))).alias("neg_a"),
        (-_score(F.col("tf_b"))).alias("neg_b"),
    ).transform(barrier)  # both rankings read the same scan
    ra = global_row_number(
        base.select("doc_id", "neg_a"), ["neg_a", "doc_id"], rn_col="rank_a"
    ).select("doc_id", "rank_a")
    rb = global_row_number(
        base.select("doc_id", "neg_b"), ["neg_b", "doc_id"], rn_col="rank_b"
    ).select("doc_id", "rank_b")
    fused = ra.join(rb, "doc_id").select(
        "doc_id",
        F.col("rank_a").cast("long").alias("rank_a"),
        F.col("rank_b").cast("long").alias("rank_b"),
        F.round(
            1.0 / (_RRF_K + F.col("rank_a"))
            + 1.0 / (_RRF_K + F.col("rank_b")),
            9,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(10)


# --------------- sample-ratio-mismatch guardrail (r12)


@query(
    "analytics_srm_check",
    oracle="""
    WITH arms AS (
      SELECT user_id % 2 AS arm FROM (
        SELECT DISTINCT user_id FROM events
      )
    ), cnt AS (
      SELECT CAST(count(*) FILTER (arm = 0) AS BIGINT) AS n_a,
             CAST(count(*) FILTER (arm = 1) AS BIGINT) AS n_b
      FROM arms
    )
    SELECT n_a, n_b,
           round(CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b)
                 / (n_a + n_b), 6) AS chi2,
           (CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b) / (n_a + n_b)
            > 3.841458820694124) AS srm_flag
    FROM cnt
    """,
    tags=("analytics", "experimentation", "quality", "events"),
)
def analytics_srm_check(spark, sf_dir):
    """SAMPLE-RATIO-MISMATCH GUARDRAIL — the first check every
    experimentation platform runs before reading a single metric: are
    the arm sizes consistent with the declared 50/50 split? Chi-square
    with expected (n_a+n_b)/2 per arm simplifies EXACTLY to
    (n_a-n_b)^2/(n_a+n_b) — one integer-difference square over the
    total, compared against the chi2(1) 5% critical value (the shared
    repr-exact literal 3.841458820694124, the r10 convention). An SRM
    flag means the assignment or logging pipeline is broken and every
    downstream test on this experiment is void.

    Exactness: integers until the single final division; both engines
    evaluate the identical IEEE expression.

    Scale: distinct-users is one hash aggregate; everything after is
    a 1-row fold."""
    e = t(spark, sf_dir, "events").select("user_id").distinct()
    cnt = e.select((F.col("user_id") % 2).alias("arm")).agg(
        F.count_if(F.col("arm") == 0).cast("long").alias("n_a"),
        F.count_if(F.col("arm") == 1).cast("long").alias("n_b"),
    )
    diff = (F.col("n_a") - F.col("n_b")).cast("double")
    chi2 = diff * (F.col("n_a") - F.col("n_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    return cnt.select(
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841458820694124).alias("srm_flag"),
    )


# --------------- unbiased pass@k estimator (r12)

_PK_K = 4
_PK_THRESH = 100.0


@query(
    "eval_pass_at_k",
    oracle=f"""
    WITH per_task AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (value > {_PK_THRESH}) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ), est AS (
      SELECT n, c,
             CAST(round(CAST(c AS DOUBLE) / n, 12)
                  AS DECIMAL(38,12)) AS p1,
             CAST(round(CASE WHEN n - c >= {_PK_K} THEN
               1.0 - ((((CAST(n - c AS DOUBLE) / n)
                        * (CAST(n - c - 1 AS DOUBLE) / (n - 1)))
                        * (CAST(n - c - 2 AS DOUBLE) / (n - 2)))
                        * (CAST(n - c - 3 AS DOUBLE) / (n - 3)))
               ELSE 1.0 END, 12) AS DECIMAL(38,12)) AS pk
      FROM per_task WHERE n >= {_PK_K}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_tasks,
           CAST({_PK_K} AS BIGINT) AS k,
           round(CAST(sum(p1) AS DOUBLE) / count(*), 6) AS pass_at_1,
           round(CAST(sum(pk) AS DOUBLE) / count(*), 6)
             AS pass_at_{_PK_K}
    FROM est
    """,
    tags=("eval", "llm", "estimator", "events"),
)
def eval_pass_at_k(spark, sf_dir):
    """UNBIASED pass@k (Chen et al. 2021, "Evaluating Large Language
    Models Trained on Code", public) — THE coding-eval metric: a task
    with n sampled attempts and c successes contributes
    1 - C(n-c, k)/C(n, k), the unbiased probability that a random
    k-subset of the attempts contains a success (naive "best of first
    k" is biased when n > k). Tasks here are users, attempts their
    events, success value > {_PK_THRESH}; k = {_PK_K}.

    Exactness: the binomial ratio is the telescoped product
    prod_i (n-c-i)/(n-i) with an explicit left-fold parenthesization
    mirrored in both engines (integers in, identical IEEE ops);
    per-task values round 12dp into DECIMAL(38,12) before the
    cross-engine sum (the house exact-sum policy); n-c < k means
    C(n-c,k) = 0, i.e. pass = 1, handled by the same guard both
    sides; n < k tasks are excluded (the estimator is undefined).

    Scale: one hash aggregate per task, then a 1-row fold — the
    estimator is embarrassingly aggregative at any corpus size."""
    e = t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.count_if(F.col("value") > _PK_THRESH).cast("long").alias("c"),
    ).filter(F.col("n") >= _PK_K)
    n, c = F.col("n"), F.col("c")
    prod = (n - c).cast("double") / n
    for i in range(1, _PK_K):
        prod = prod * ((n - c - i).cast("double") / (n - i))
    pk = F.when(n - c >= _PK_K, 1.0 - prod).otherwise(F.lit(1.0))
    est = e.select(
        F.round(c.cast("double") / n, 12)
        .cast("decimal(38,12)")
        .alias("p1"),
        F.round(pk, 12).cast("decimal(38,12)").alias("pk"),
    )
    return est.agg(
        F.count("*").cast("long").alias("n_tasks"),
        F.lit(_PK_K).cast("long").alias("k"),
        F.round(F.sum("p1").cast("double") / F.count("*"), 6).alias(
            "pass_at_1"
        ),
        F.round(F.sum("pk").cast("double") / F.count("*"), 6).alias(
            f"pass_at_{_PK_K}"
        ),
    )


# --------------- frequent brand triples (r12)

_FT_MINSUP = 10  # non-vacuous at every test scale (154 rows sf0.001)


@query(
    "basket_frequent_triples",
    oracle=f"""
    WITH ib AS (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), triples AS (
      SELECT i1.b AS brand1, i2.b AS brand2, i3.b AS brand3,
             CAST(count(*) AS BIGINT) AS support
      FROM ib i1
      JOIN ib i2 ON i1.o = i2.o AND i1.b < i2.b
      JOIN ib i3 ON i2.o = i3.o AND i2.b < i3.b
      GROUP BY 1, 2, 3 HAVING count(*) >= {_FT_MINSUP}
    ), nb AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_baskets
              FROM ib)
    SELECT brand1, brand2, brand3, support,
           round(CAST(support AS DOUBLE) / n_baskets, 6)
             AS support_frac
    FROM triples CROSS JOIN nb
    ORDER BY support DESC, brand1, brand2, brand3 LIMIT 10
    """,
    tags=("analytics", "basket", "itemsets", "lineitem"),
)
def basket_frequent_triples(spark, sf_dir):
    """FREQUENT 3-ITEMSETS at brand granularity — the level-3 Apriori
    step behind market-basket mining (Agrawal-Srikant 1994, public),
    the big sibling of basket_cooccurrence's pairs: distinct
    (order, brand) pairs, two co-keyed self-joins with a strict
    ordering (each basket emits each triple exactly once), support
    count with a min-support gate, top-10 by support.

    Exactness: all integers until one final support fraction.

    Scale: the Apriori structure is what survives 100 TB — items per
    basket are bounded (order lines), so per-basket combinations are
    bounded; both self-joins are co-partitioned on the basket key
    (one shuffle each, no broadcast of the corpus); the item
    dimension (part -> brand) is a broadcast. The min-support gate is
    applied in the aggregate, not driver-side."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # lazy localCheckpoint (r12 resume, guide §1.2): ib feeds all three
    # self-join legs and the basket count — without the barrier the
    # join + distinct re-expanded into all four consumers (16 parquet
    # scans in one plan); the self-joins stay co-partitioned on o (the
    # docstring's scale design), so no strategy depends on the stats
    # the barrier drops
    ib = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
        .transform(barrier)
    )
    i1, i2, i3 = ib.alias("i1"), ib.alias("i2"), ib.alias("i3")
    triples = (
        i1.join(
            i2,
            (F.col("i1.o") == F.col("i2.o"))
            & (F.col("i1.b") < F.col("i2.b")),
        )
        .join(
            i3,
            (F.col("i2.o") == F.col("i3.o"))
            & (F.col("i2.b") < F.col("i3.b")),
        )
        .groupBy(
            F.col("i1.b").alias("brand1"),
            F.col("i2.b").alias("brand2"),
            F.col("i3.b").alias("brand3"),
        )
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= _FT_MINSUP)
    )
    nb = ib.agg(F.count_distinct("o").cast("long").alias("n_baskets"))
    return (
        triples.crossJoin(F.broadcast(nb))
        .select(
            "brand1",
            "brand2",
            "brand3",
            "support",
            F.round(
                F.col("support").cast("double") / F.col("n_baskets"), 6
            ).alias("support_frac"),
        )
        .orderBy(F.col("support").desc(), "brand1", "brand2", "brand3")
        .limit(10)
    )


# --------------- sequential probability ratio test (r12)

# repr-exact shared literals (the house convention for irrational
# constants): ln(p1/p0), ln((1-p1)/(1-p0)) for H0 p=0.7 vs H1 p=0.8,
# and the Wald boundary ln((1-b)/a) = ln(19) at alpha = beta = 0.05
_SPRT_LA_F = 0.13353139262452277
_SPRT_LB_F = -0.4054651081081643
_SPRT_BOUND_F = 2.9444389791664403
# oracle-side spellings: DuckDB parses a bare decimal literal as
# DECIMAL, so the SQL wraps each in an explicit DOUBLE cast
_SPRT_LA = f"CAST({_SPRT_LA_F!r} AS DOUBLE)"
_SPRT_LB = f"CAST({_SPRT_LB_F!r} AS DOUBLE)"
_SPRT_BOUND = f"CAST({_SPRT_BOUND_F!r} AS DOUBLE)"
_SPRT_THRESH = 100.0


@query(
    "stats_sprt_sequential",
    oracle=f"""
    WITH ord AS (
      SELECT ts, event_id,
             CASE WHEN value > {_SPRT_THRESH} THEN 1 ELSE 0 END AS x
      FROM events
    ), cum AS (
      SELECT row_number() OVER (ORDER BY ts, event_id) AS tt,
             sum(x) OVER (ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS s
      FROM ord
    ), llr AS (
      SELECT tt,
             ({_SPRT_LA} * s) + ({_SPRT_LB} * (tt - s)) AS l
      FROM cum
    ), hit AS (
      SELECT min(tt) AS n_dec FROM llr
      WHERE l >= {_SPRT_BOUND} OR l <= -{_SPRT_BOUND}
    ), fin AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(x) AS BIGINT) AS sx
      FROM ord
    )
    SELECT fin.n_total,
           COALESCE(CAST(hit.n_dec AS BIGINT), -1) AS n_at_decision,
           CASE WHEN hit.n_dec IS NULL THEN 'continue'
                WHEN (SELECT l FROM llr WHERE tt = hit.n_dec)
                     >= {_SPRT_BOUND} THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           round(COALESCE(
             (SELECT l FROM llr WHERE tt = hit.n_dec), 0.0), 6)
             AS llr_at_decision,
           round(({_SPRT_LA} * fin.sx)
                 + ({_SPRT_LB} * (fin.n_total - fin.sx)), 6)
             AS llr_final
    FROM fin CROSS JOIN hit
    """,
    tags=("stats", "sequential", "experimentation", "events"),
)
def stats_sprt_sequential(spark, sf_dir):
    """WALD'S SEQUENTIAL PROBABILITY RATIO TEST (Wald 1945, public) —
    the always-valid early-stopping test every experimentation
    platform reinvents: walk the cumulative log-likelihood ratio of
    H1 (p=0.8) vs H0 (p=0.7) over the event stream in (ts, event_id)
    order, stop the first time it exits [-ln(19), ln(19)]
    (alpha = beta = 0.05). Reports the decision, the sample size at
    decision (the whole point of SPRT: expected n is far below the
    fixed-horizon test's), and the end-of-stream LLR.

    Exactness: the LLR at row t is a closed form of two INTEGERS
    (successes s, index t) times shared repr-exact literals —
    (la*s) + (lb*(t-s)) with identical parenthesization both engines;
    no accumulation of doubles anywhere, so the crossing set is
    bit-identical.

    Scale: the cumulative integers come from range_prefix_sums (the
    two-pass range-partitioned prefix primitive — never a
    single-partition window over the stream); the crossing is a
    filter + min_by fold. The stream version is the same algebra over
    per-epoch additive (s, t) state."""
    from gcp_etl_spark.operators.quantiles import range_prefix_sums

    la, lb, bound = _SPRT_LA_F, _SPRT_LB_F, _SPRT_BOUND_F
    e = t(spark, sf_dir, "events").select(
        "ts",
        "event_id",
        (F.col("value") > _SPRT_THRESH).cast("long").alias("x"),
        F.lit(1).cast("long").alias("one"),
    )
    cum, _ = range_prefix_sums(e, ["ts", "event_id"], ["x", "one"])
    llr = cum.select(
        F.col("one_cum").alias("tt"),
        (
            (F.lit(la) * F.col("x_cum"))
            + (F.lit(lb) * (F.col("one_cum") - F.col("x_cum")))
        ).alias("l"),
    )
    hit = llr.filter(
        (F.col("l") >= bound) | (F.col("l") <= -bound)
    ).agg(
        F.min("tt").alias("n_dec"),
        F.min_by("l", "tt").alias("l_dec"),
    )
    fin = e.agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum("x").cast("long").alias("sx"),
    )
    return fin.crossJoin(F.broadcast(hit)).select(
        "n_total",
        F.coalesce(F.col("n_dec"), F.lit(-1)).cast("long").alias(
            "n_at_decision"
        ),
        F.when(F.col("n_dec").isNull(), "continue")
        .when(F.col("l_dec") >= bound, "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
        F.round(F.coalesce(F.col("l_dec"), F.lit(0.0)), 6).alias(
            "llr_at_decision"
        ),
        F.round(
            (F.lit(la) * F.col("sx"))
            + (F.lit(lb) * (F.col("n_total") - F.col("sx"))),
            6,
        ).alias("llr_final"),
    )


# --------------- iterative proportional fitting / raking (r12)

_IPF_ITERS = 3


def _ipf_oracle() -> str:
    """Unrolled IPF oracle (the adstock unrolled-recurrence
    precedent): each iteration scales rows to the region target, then
    columns to the priority target; weights live in DECIMAL(38,12)
    (exact margin sums), scale factors in DOUBLE from identical
    operands, products rounded 12dp back into DECIMAL."""
    prev = "cells"
    steps = []
    for it in range(_IPF_ITERS):
        for dim, key in (("r", "region"), ("c", "pri")):
            cur = f"it{it}{dim}"
            steps.append(f"""
    {cur} AS (
      SELECT region, pri,
             CAST(round(CAST(w AS DOUBLE)
               * (tgt / CAST(sum(w) OVER (PARTITION BY {key})
                        AS DOUBLE)), 12) AS DECIMAL(38,12)) AS w,
             tgt
      FROM {prev}
    )""")
            prev = cur
    return f"""
    WITH raw AS (
      SELECT r.r_name AS region, o.o_orderpriority AS pri
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ), cells0 AS (
      SELECT region, pri,
             CAST(CAST(count(*) AS BIGINT) AS DECIMAL(38,12)) AS w
      FROM raw GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(sum(w) AS DOUBLE) / 5.0 AS tgt FROM cells0
    ), cells AS (
      SELECT region, pri, w, tgt FROM cells0 CROSS JOIN tot
    ),{",".join(steps)}
    SELECT region, pri, round(CAST(w AS DOUBLE), 6) AS weight
    FROM {prev} ORDER BY region, pri
    """


@query(
    "analytics_ipf_raking",
    oracle=_ipf_oracle(),
    tags=("analytics", "survey", "weighting", "orders"),
)
def analytics_ipf_raking(spark, sf_dir):
    """ITERATIVE PROPORTIONAL FITTING (Deming-Stephan 1940 raking,
    public) — the survey-weighting / contingency-calibration
    workhorse: scale the region x order-priority count matrix so BOTH
    margins match uniform targets (total/5 per region and per
    priority), alternating row and column scalings for
    3 iterations. The output weights are what a 100 TB label
    shop multiplies into its sampling to de-bias a skewed panel.

    Exactness: weights live in DECIMAL(38,12) so every margin sum is
    exact; each scale factor is one DOUBLE ratio of bit-identical
    operands; products round 12dp back into DECIMAL — both engines
    walk the identical state sequence (the Bradley-Terry/adstock
    per-iteration-rounding convention).

    Scale: the data touches one 3-broadcast-join scan + one count
    aggregate; ALL iterations run on the bounded 25-cell grid (window
    partitions are the 5-value margins — never single-partition,
    never data-sized)."""
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    raw = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("o_orderpriority").alias("pri"),
        )
    )
    cells = raw.groupBy("region", "pri").agg(
        F.count("*").cast("long").cast("decimal(38,12)").alias("w")
    )
    tot = cells.agg(
        (F.sum("w").cast("double") / 5.0).alias("tgt")
    )
    cur = cells.crossJoin(F.broadcast(tot)).transform(barrier)  # freeze the data-sized part; iterations run on 25 rows
    for _ in range(_IPF_ITERS):
        for key in ("region", "pri"):
            cur = cur.select(
                "region",
                "pri",
                F.round(
                    F.col("w").cast("double")
                    * (
                        F.col("tgt")
                        / F.sum("w")
                        .over(W.partitionBy(key))
                        .cast("double")
                    ),
                    12,
                )
                .cast("decimal(38,12)")
                .alias("w"),
                "tgt",
            )
    return cur.select(
        "region",
        "pri",
        F.round(F.col("w").cast("double"), 6).alias("weight"),
    ).orderBy("region", "pri")


# --------------- Bradley-Terry strength ratings (r12)

_BT_ITERS = 3


def _bt_oracle() -> str:
    """Unrolled minorize-maximize iterations (Hunter 2004, public) on
    the bounded event-type grid; per-term and per-state 12dp rounding
    into DECIMAL(38,12) keeps both engines on the identical state
    sequence (the IPF convention)."""
    prev = "it0"
    steps = []
    for it in range(1, _BT_ITERS + 1):
        cur = f"it{it}"
        steps.append(f"""
    {cur} AS (
      SELECT w.et,
             CAST(round(CAST(w.wins AS DOUBLE) / CAST(sum(
               CAST(round(o.m / (CAST(pa.p AS DOUBLE)
                                 + CAST(pb.p AS DOUBLE)), 12)
                    AS DECIMAL(38,12))) AS DOUBLE), 12)
                  AS DECIMAL(38,12)) AS p
      FROM wins w
      JOIN opp o ON o.a = w.et
      JOIN {prev} pa ON pa.et = o.a
      JOIN {prev} pb ON pb.et = o.b
      GROUP BY w.et, w.wins
    )""")
        prev = cur
    return f"""
    WITH seq AS (
      SELECT event_type, value,
             lag(event_type) OVER w AS pt,
             lag(value) OVER w AS pv
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), matches AS (
      SELECT least(pt, event_type) AS i,
             greatest(pt, event_type) AS j,
             CASE WHEN value > pv THEN event_type
                  WHEN value < pv THEN pt
                  ELSE least(pt, event_type) END AS winner
      FROM seq WHERE pt IS NOT NULL AND pt <> event_type
    ), pairs AS (
      SELECT i, j, CAST(count(*) AS BIGINT) AS m
      FROM matches GROUP BY 1, 2
    ), opp AS (
      SELECT i AS a, j AS b, m FROM pairs
      UNION ALL
      SELECT j AS a, i AS b, m FROM pairs
    ), wins AS (
      SELECT ty.et, CAST(coalesce(wc.wins, 0) AS BIGINT) AS wins
      FROM (SELECT DISTINCT event_type AS et FROM events) ty
      LEFT JOIN (SELECT winner AS et, count(*) AS wins
                 FROM matches GROUP BY 1) wc USING (et)
    ), it0 AS (
      SELECT et, CAST(1.0 AS DECIMAL(38,12)) AS p FROM wins
    ),{",".join(steps)}
    , tot AS (SELECT CAST(sum(p) AS DOUBLE) AS s FROM {prev})
    SELECT f.et AS event_type, w.wins,
           (SELECT CAST(sum(m) AS BIGINT) FROM opp WHERE a = f.et)
             AS n_matches,
           round(CAST(f.p AS DOUBLE) / tot.s, 6) AS bt_strength
    FROM {prev} f JOIN wins w ON w.et = f.et CROSS JOIN tot
    ORDER BY bt_strength DESC, event_type
    """


@query(
    "analytics_bradley_terry",
    oracle=_bt_oracle(),
    tags=("analytics", "ranking", "pairwise", "events"),
)
def analytics_bradley_terry(spark, sf_dir):
    """BRADLEY-TERRY PAIRWISE STRENGTH RATINGS (Bradley-Terry 1952;
    MM algorithm Hunter 2004, public) — the model behind every LLM
    arena leaderboard: matches are consecutive same-user events of
    different types (winner = the larger value, ties to the
    lexicographically smaller type), and 3 minorize-maximize updates
    p_i <- W_i / sum_j m_ij/(p_i+p_j) fit the strengths, normalized to
    sum 1. Order-free by construction — unlike Elo, whose sequential
    update depends on match ORDER and therefore cannot be computed
    distributively; BT-MM is the batch dual a 100 TB preference
    pipeline actually fits.

    Exactness: match/win counts are integers; each MM term and each
    new state rounds 12dp into DECIMAL(38,12) before the exact
    denominator sum (the IPF/adstock state-sequence convention).

    Scale: one lag window partitioned by user builds the matches; the
    MM loop runs entirely on the bounded |types|^2 grid (25 rows) via
    broadcast self-joins — iteration cost is independent of the
    corpus."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        "value",
        F.lag("event_type").over(w).alias("pt"),
        F.lag("value").over(w).alias("pv"),
    )
    matches = seq.filter(
        F.col("pt").isNotNull() & (F.col("pt") != F.col("event_type"))
    ).select(
        F.least("pt", "event_type").alias("i"),
        F.greatest("pt", "event_type").alias("j"),
        F.when(F.col("value") > F.col("pv"), F.col("event_type"))
        .when(F.col("value") < F.col("pv"), F.col("pt"))
        .otherwise(F.least("pt", "event_type"))
        .alias("winner"),
    ).transform(barrier)  # one pass builds pairs AND wins
    pairs = matches.groupBy("i", "j").agg(
        F.count("*").cast("long").alias("m")
    )
    # lazy checkpoint: opp is referenced by every MM iteration plus the
    # n_matches agg — without the cut, each reference re-aggregates the
    # match relation (4 full passes) and the plan re-expands the subtree
    opp = pairs.select(
        F.col("i").alias("a"), F.col("j").alias("b"), "m"
    ).unionByName(
        pairs.select(F.col("j").alias("a"), F.col("i").alias("b"), "m")
    ).transform(barrier)
    types = e.select(F.col("event_type").alias("et")).distinct()
    wc = matches.groupBy(F.col("winner").alias("et")).agg(
        F.count("*").alias("wc")
    )
    # same cut for wins (read by p0, every iteration's numerator, and
    # the final join): |types| rows, materialized once
    wins = types.join(wc, "et", "left").select(
        "et", F.coalesce("wc", F.lit(0)).cast("long").alias("wins")
    ).transform(barrier)
    p = wins.select(
        "et", F.lit(1.0).cast("decimal(38,12)").alias("p")
    )
    for _ in range(_BT_ITERS):
        pa = p.select(F.col("et").alias("a"), F.col("p").alias("p_a"))
        pb = p.select(F.col("et").alias("b"), F.col("p").alias("p_b"))
        denom = (
            opp.join(F.broadcast(pa), "a")
            .join(F.broadcast(pb), "b")
            .select(
                F.col("a").alias("et"),
                F.round(
                    F.col("m")
                    / (
                        F.col("p_a").cast("double")
                        + F.col("p_b").cast("double")
                    ),
                    12,
                )
                .cast("decimal(38,12)")
                .alias("term"),
            )
            .groupBy("et")
            .agg(F.sum("term").alias("den"))
        )
        # checkpoint the |types|-row state each iteration: p_{k} is
        # referenced TWICE by p_{k+1} (pa and pb), so the un-cut plan
        # doubled per iteration (explain: 306 Exchanges / 62 scans for
        # 3 iterations; planning dominated the query's wall time)
        p = wins.join(denom, "et").select(
            "et",
            F.round(
                F.col("wins").cast("double")
                / F.col("den").cast("double"),
                12,
            )
            .cast("decimal(38,12)")
            .alias("p"),
        ).transform(barrier)
    tot = p.agg(F.sum("p").cast("double").alias("s"))
    n_match = opp.groupBy(F.col("a").alias("et")).agg(
        F.sum("m").cast("long").alias("n_matches")
    )
    return (
        p.join(wins, "et")
        .join(n_match, "et")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("et").alias("event_type"),
            "wins",
            "n_matches",
            F.round(F.col("p").cast("double") / F.col("s"), 6).alias(
                "bt_strength"
            ),
        )
        .orderBy(F.col("bt_strength").desc(), "event_type")
    )


# --------------- corpus BLEU-2 components (r12)


@query(
    "eval_bleu_lite",
    oracle="""
    WITH pairs AS (
      SELECT c.doc_id AS pair_id, c.text AS cand, r.text AS ref
      FROM documents c JOIN documents r ON r.doc_id = c.doc_id - 1
      WHERE c.doc_id % 2 = 1
    ), ctok AS (
      SELECT pair_id, unnest(string_split(cand, ' ')) AS tok,
             generate_subscripts(string_split(cand, ' '), 1) AS ord
      FROM pairs
    ), rtok AS (
      SELECT pair_id, unnest(string_split(ref, ' ')) AS tok,
             generate_subscripts(string_split(ref, ' '), 1) AS ord
      FROM pairs
    ), cg AS (
      SELECT pair_id, 1 AS n, tok AS gram, count(*) AS cnt
      FROM ctok GROUP BY 1, 3
      UNION ALL
      SELECT pair_id, 2, gram, count(*) FROM (
        SELECT pair_id,
               tok || ' ' || lead(tok) OVER
                 (PARTITION BY pair_id ORDER BY ord) AS gram
        FROM ctok) WHERE gram IS NOT NULL GROUP BY 1, 3
    ), rg AS (
      SELECT pair_id, 1 AS n, tok AS gram, count(*) AS cnt
      FROM rtok GROUP BY 1, 3
      UNION ALL
      SELECT pair_id, 2, gram, count(*) FROM (
        SELECT pair_id,
               tok || ' ' || lead(tok) OVER
                 (PARTITION BY pair_id ORDER BY ord) AS gram
        FROM rtok) WHERE gram IS NOT NULL GROUP BY 1, 3
    ), clipped AS (
      SELECT cg.n,
             CAST(sum(least(cg.cnt, coalesce(rg.cnt, 0))) AS BIGINT)
               AS clip,
             CAST(sum(cg.cnt) AS BIGINT) AS tot
      FROM cg LEFT JOIN rg
        ON rg.pair_id = cg.pair_id AND rg.n = cg.n
           AND rg.gram = cg.gram
      GROUP BY cg.n
    ), lens AS (
      SELECT CAST(sum(len(string_split(cand, ' '))) AS BIGINT) AS c_len,
             CAST(sum(len(string_split(ref, ' '))) AS BIGINT) AS r_len
      FROM pairs
    )
    SELECT
      (SELECT clip FROM clipped WHERE n = 1) AS clip1,
      (SELECT tot FROM clipped WHERE n = 1) AS tot1,
      (SELECT clip FROM clipped WHERE n = 2) AS clip2,
      (SELECT tot FROM clipped WHERE n = 2) AS tot2,
      lens.c_len, lens.r_len,
      round(sqrt(
        (CAST((SELECT clip FROM clipped WHERE n = 1) AS DOUBLE)
         / (SELECT tot FROM clipped WHERE n = 1))
        * (CAST((SELECT clip FROM clipped WHERE n = 2) AS DOUBLE)
           / (SELECT tot FROM clipped WHERE n = 2))), 6)
        AS bleu2_precision,
      round(least(CAST(0 AS DOUBLE),
        1.0 - CAST(lens.r_len AS DOUBLE) / lens.c_len), 6)
        AS bp_exponent
    FROM lens
    """,
    tags=("eval", "text", "mt", "documents"),
)
def eval_bleu_lite(spark, sf_dir):
    """CORPUS BLEU-2 COMPONENTS (Papineni et al. 2002, public) — the
    MT/generation eval staple, computed WITHOUT in-engine libm:
    candidate/reference pairs are adjacent documents (doc 2k+1
    evaluated against doc 2k), modified n-gram precision (n = 1, 2)
    uses per-pair CLIPPED counts, and the output is the exactly-
    computable decomposition — corpus clip/total counts, the geometric
    mean sqrt(p1*p2) (IEEE sqrt is correctly rounded, so cross-engine
    exact from identical operands, unlike exp/log), and the brevity-
    penalty EXPONENT min(0, 1 - r/c); BLEU-2 itself is
    exp(bp_exponent) * bleu2_precision, one libm call the CONSUMER
    applies (the repr-literal convention: never data-dependent libm
    inside the hash-verified surface).

    Exactness: clipped counts are integers from a co-keyed LEFT join;
    precisions are integer ratios; sqrt correctly rounded; one final
    round(6).

    Scale: tokens/grams shuffle as (pair, gram) digests — never whole
    texts; the clip join is co-partitioned on (pair, n, gram); corpus
    sums are one aggregate."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    cand = docs.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("pair_id"), F.col("text").alias("cand")
    )
    ref = docs.select(
        (F.col("doc_id") + 1).alias("pair_id"),
        F.col("text").alias("ref"),
    ).filter((F.col("pair_id")) % 2 == 1)
    # lazy localCheckpoint (r12 resume, guide §1.2): pairs feeds both
    # gram sides and the length aggregate, and each side's token
    # explode feeds its unigram AND bigram branches — without the
    # barriers the doc self-join + posexplode re-expanded into every
    # consumer (28 parquet scans in one plan); with them the pair join
    # runs once and each side tokenizes once
    pairs = cand.join(ref, "pair_id").transform(barrier)

    def grams(col, side):
        toks = pairs.select(
            "pair_id", F.posexplode(F.split(F.col(col), " ")).alias(
                "ord", "tok"
            )
        ).transform(barrier)
        uni = toks.groupBy(
            "pair_id", F.lit(1).alias("n"), F.col("tok").alias("gram")
        ).agg(F.count("*").alias(f"cnt_{side}"))
        from pyspark.sql import Window as W

        w = W.partitionBy("pair_id").orderBy("ord")
        bi = (
            toks.select(
                "pair_id",
                F.concat_ws(
                    " ", "tok", F.lead("tok").over(w)
                ).alias("gram"),
                F.lead("tok").over(w).alias("nxt"),
            )
            .filter(F.col("nxt").isNotNull())
            .groupBy("pair_id", F.lit(2).alias("n"), "gram")
            .agg(F.count("*").alias(f"cnt_{side}"))
        )
        return uni.unionByName(bi)

    cg = grams("cand", "c")
    rg = grams("ref", "r")
    clipped = (
        cg.join(rg, ["pair_id", "n", "gram"], "left")
        .groupBy("n")
        .agg(
            F.sum(
                F.least(F.col("cnt_c"), F.coalesce("cnt_r", F.lit(0)))
            )
            .cast("long")
            .alias("clip"),
            F.sum("cnt_c").cast("long").alias("tot"),
        )
    )
    c1 = clipped.filter(F.col("n") == 1).select(
        F.col("clip").alias("clip1"), F.col("tot").alias("tot1")
    )
    c2 = clipped.filter(F.col("n") == 2).select(
        F.col("clip").alias("clip2"), F.col("tot").alias("tot2")
    )
    lens = pairs.agg(
        F.sum(F.size(F.split("cand", " "))).cast("long").alias("c_len"),
        F.sum(F.size(F.split("ref", " "))).cast("long").alias("r_len"),
    )
    return (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(lens))
        .select(
            "clip1",
            "tot1",
            "clip2",
            "tot2",
            "c_len",
            "r_len",
            F.round(
                F.sqrt(
                    (F.col("clip1").cast("double") / F.col("tot1"))
                    * (F.col("clip2").cast("double") / F.col("tot2"))
                ),
                6,
            ).alias("bleu2_precision"),
            F.round(
                F.least(
                    F.lit(0.0),
                    1.0 - F.col("r_len").cast("double") / F.col("c_len"),
                ),
                6,
            ).alias("bp_exponent"),
        )
    )


# --------------- token-budget apportionment (r12)

_TB_BUDGET = 1_000_000


@query(
    "prep_token_budget_allocation",
    oracle=f"""
    WITH sizes AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS sz
      FROM documents GROUP BY source
    ), wts AS (
      SELECT source, sz,
             CAST(round(sqrt(CAST(sz AS DOUBLE)), 6)
                  AS DECIMAL(38,6)) AS w
      FROM sizes
    ), quotas AS (
      SELECT source, sz,
             {_TB_BUDGET} * (CAST(w AS DOUBLE)
               / CAST(sum(w) OVER () AS DOUBLE)) AS quota
      FROM wts
    ), based AS (
      SELECT source, sz, quota,
             CAST(floor(quota) AS BIGINT) AS base,
             quota - floor(quota) AS rem
      FROM quotas
    ), ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, source) AS rr,
             {_TB_BUDGET} - sum(base) OVER () AS leftover
      FROM based
    )
    SELECT source, sz AS corpus_chars,
           round(quota, 6) AS quota,
           CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens
    FROM ranked ORDER BY source
    """,
    tags=("llm", "prep", "mixing", "apportionment", "documents"),
)
def prep_token_budget_allocation(spark, sf_dir):
    """TOKEN-BUDGET APPORTIONMENT across corpus sources by the
    largest-remainder (Hamilton) method — the exact-integer version of
    the sqrt-proportional mixing rule training-data pipelines use
    (sample each source ~ sqrt(size) to flatten the head): quotas =
    budget * sqrt(size)/sum, floors, then the leftover tokens go to
    the largest fractional remainders. Hamilton is the apportionment
    that sums EXACTLY to the budget — the property a downstream
    sampler needs, and what naive per-source rounding violates.

    Exactness: sqrt is IEEE correctly-rounded (cross-engine exact from
    identical integer operands); weights round 6dp into DECIMAL(38,6)
    so the weight SUM is exact; quotas/floors/remainders are then
    identical IEEE ops; the remainder ranking has a source tiebreak.

    Scale: one grouped sum over documents; everything after runs on
    the bounded source grid (the OVER () windows span |sources| rows,
    never data)."""
    from pyspark.sql import Window as W

    sizes = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("sz"))
    )
    wts = sizes.select(
        "source",
        "sz",
        F.round(F.sqrt(F.col("sz").cast("double")), 6)
        .cast("decimal(38,6)")
        .alias("w"),
    )
    # bounded |sources| relation: the unpartitioned windows below are
    # data-independent (the documented bounded-window convention)
    quotas = wts.select(
        "source",
        "sz",
        (
            F.lit(_TB_BUDGET)
            * (
                F.col("w").cast("double")
                / F.sum("w").over(W.partitionBy()).cast("double")
            )
        ).alias("quota"),
    )
    based = quotas.select(
        "source",
        "sz",
        "quota",
        F.floor("quota").cast("long").alias("base"),
        (F.col("quota") - F.floor("quota")).alias("rem"),
    )
    ranked = based.select(
        "*",
        F.row_number()
        .over(W.partitionBy().orderBy(F.col("rem").desc(), "source"))
        .alias("rr"),
        (F.lit(_TB_BUDGET) - F.sum("base").over(W.partitionBy())).alias(
            "leftover"
        ),
    )
    return ranked.select(
        "source",
        F.col("sz").alias("corpus_chars"),
        F.round("quota", 6).alias("quota"),
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_tokens"),
    ).orderBy("source")


# --------------- Krippendorff's alpha (r12)


@query(
    "prep_krippendorff_alpha",
    oracle="""
    WITH ratings AS (
      SELECT item, user_id, event_type AS label FROM (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS item, user_id,
               event_type,
               row_number() OVER (PARTITION BY date_trunc('day', ts),
                 user_id ORDER BY ts, event_id) AS rn
        FROM events) WHERE rn = 1
    ), per_item AS (
      SELECT item, CAST(sum(cnt) AS BIGINT) AS m,
             CAST(sum(cnt) * (sum(cnt) - 1) AS BIGINT) AS pairs_all,
             CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS pairs_agree
      FROM (SELECT item, label, count(*) AS cnt
            FROM ratings GROUP BY 1, 2)
      GROUP BY item HAVING sum(cnt) >= 2
    ), do_sum AS (
      SELECT CAST(sum(m) AS BIGINT) AS n_total,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(round(
               CAST(pairs_all - pairs_agree AS DOUBLE) / (m - 1), 12)
               AS DECIMAL(38,12))) AS DOUBLE) AS do_raw
      FROM per_item
    ), label_tot AS (
      SELECT CAST(sum(cnt * cnt) AS BIGINT) AS sum_sq,
             CAST(sum(cnt) AS BIGINT) AS n
      FROM (
        SELECT r.label, count(*) AS cnt
        FROM ratings r JOIN per_item p USING (item)
        GROUP BY r.label
      )
    )
    SELECT d.n_items, d.n_total,
           round(d.do_raw / d.n_total, 6) AS d_observed,
           round(CAST(l.n * l.n - l.sum_sq AS DOUBLE)
                 / (l.n * (l.n - 1)), 6) AS d_expected,
           round(1.0 - (d.do_raw / d.n_total)
                 / (CAST(l.n * l.n - l.sum_sq AS DOUBLE)
                    / (l.n * (l.n - 1))), 6) AS alpha
    FROM do_sum d CROSS JOIN label_tot l
    """,
    tags=("prep", "labeling", "agreement", "events"),
)
def prep_krippendorff_alpha(spark, sf_dir):
    """KRIPPENDORFF'S ALPHA (nominal data; Krippendorff 1970/2004,
    public) — the inter-annotator agreement coefficient labeling
    pipelines gate on (more general than Fleiss' kappa: arbitrary
    incomplete rater-item designs): items are days, raters are users,
    a user's label for a day is their FIRST event type that day.
    alpha = 1 - D_o/D_e with the observed disagreement averaged over
    the pairable values and the expected disagreement from the pooled
    label marginals.

    Exactness: per-item disagreeing-pair counts are pure integers
    (m(m-1) - sum c(c-1)); the per-item /(m-1) ratio rounds 12dp into
    DECIMAL(38,12) before the cross-engine sum (the house policy);
    D_e is one ratio of integers; single-rater items drop per the
    definition, identically both sides (HAVING >= 2).

    Scale: two hash aggregates (ratings, per-item counts) + one
    5-label marginal; no window over the corpus anywhere."""
    r = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.to_date(F.date_trunc("day", "ts")).alias("item"),
            "user_id",
        )
        .agg(
            F.min_by(
                "event_type", F.struct("ts", "event_id")
            ).alias("label")
        )
    ).transform(barrier)  # feeds per-item AND marginals
    per_label = r.groupBy("item", "label").agg(
        F.count("*").alias("cnt")
    )
    per_item = (
        per_label.groupBy("item")
        .agg(
            F.sum("cnt").cast("long").alias("m"),
            F.sum(F.col("cnt") * (F.col("cnt") - 1))
            .cast("long")
            .alias("pairs_agree"),
        )
        .filter(F.col("m") >= 2)
        .select(
            "item",
            "m",
            (F.col("m") * (F.col("m") - 1)).alias("pairs_all"),
            "pairs_agree",
        )
    ).transform(barrier)  # feeds do_sum AND the marginal join
    do_sum = per_item.agg(
        F.sum("m").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n_items"),
        F.sum(
            F.round(
                (F.col("pairs_all") - F.col("pairs_agree")).cast(
                    "double"
                )
                / (F.col("m") - 1),
                12,
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("do_raw"),
    )
    label_tot = (
        r.join(per_item.select("item"), "item")
        .groupBy("label")
        .agg(F.count("*").alias("cnt"))
        .agg(
            F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias(
                "sum_sq"
            ),
            F.sum("cnt").cast("long").alias("n"),
        )
    )
    d_obs = F.col("do_raw") / F.col("n_total")
    d_exp = (F.col("n") * F.col("n") - F.col("sum_sq")).cast(
        "double"
    ) / (F.col("n") * (F.col("n") - 1))
    return do_sum.crossJoin(F.broadcast(label_tot)).select(
        "n_items",
        "n_total",
        F.round(d_obs, 6).alias("d_observed"),
        F.round(d_exp, 6).alias("d_expected"),
        F.round(1.0 - d_obs / d_exp, 6).alias("alpha"),
    )


# --------------- mean reciprocal rank (r12)


@query(
    "eval_mrr",
    oracle="""
    WITH item AS (
      SELECT o_orderpriority AS grp, l_partkey % 50 AS item,
             CAST(sum(round(l_extendedprice * 100)) AS BIGINT) AS cents,
             CAST(sum(l_quantity) AS BIGINT) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), graded AS (
      SELECT grp, item, cents,
             least(3, (4 * qty) // max(qty) OVER (PARTITION BY grp))
               AS rel
      FROM item
    ), ranked AS (
      SELECT grp, rel,
             row_number() OVER (PARTITION BY grp
               ORDER BY cents DESC, item) AS rnk
      FROM graded
    )
    SELECT grp, CAST(min(rnk) FILTER (rel >= 2) AS BIGINT)
             AS first_rel_rank,
           round(1.0 / min(rnk) FILTER (rel >= 2), 6)
             AS reciprocal_rank
    FROM ranked GROUP BY grp ORDER BY grp
    """,
    tags=("eval", "ranking", "retrieval", "lineitem"),
)
def eval_mrr(spark, sf_dir):
    """RECIPROCAL RANK per query group (the MRR family member beside
    eval_ndcg_at_k / eval_average_precision, same bounded grid): per
    order priority, rank the 50 part buckets by exact revenue cents
    and report the rank of the first RELEVANT item (integer grade
    >= 2, the NDCG grade scheme) and its reciprocal. Emitting the
    per-group rows instead of the cross-group mean keeps the surface
    all-integer-plus-one-division (no double accumulation) — the
    consumer's MRR is the mean of the last column.

    Scale: facts collapse to the bounded (priority x item) grid in one
    hash agg; the ranking windows span <= 50-row groups."""
    from pyspark.sql import Window as W

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    item = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_orderpriority").alias("grp"),
            (F.col("l_partkey") % 50).alias("item"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100))
            .cast("long")
            .alias("cents"),
            F.sum("l_quantity").cast("long").alias("qty"),
        )
    )
    wg = W.partitionBy("grp")
    graded = item.select(
        "grp",
        "item",
        "cents",
        F.least(
            F.lit(3).cast("long"),
            F.expr("(4 * qty) div (max(qty) over (partition by grp))"),
        ).alias("rel"),
    )
    ranked = graded.select(
        "grp",
        "rel",
        F.row_number()
        .over(wg.orderBy(F.col("cents").desc(), "item"))
        .alias("rnk"),
    )
    first = (
        ranked.filter(F.col("rel") >= 2)
        .groupBy("grp")
        .agg(F.min("rnk").cast("long").alias("first_rel_rank"))
    )
    return first.select(
        "grp",
        "first_rel_rank",
        F.round(1.0 / F.col("first_rel_rank"), 6).alias(
            "reciprocal_rank"
        ),
    ).orderBy("grp")


# --------------- off-policy evaluation: IPS / SNIPS (r12)

_OPE_TARGET = "click"
_OPE_RWD = 150.0


@query(
    "analytics_ips_offpolicy",
    oracle=f"""
    WITH logs AS (
      SELECT user_id % 10 AS ctx, event_type AS act,
             CASE WHEN value > {_OPE_RWD} THEN 1 ELSE 0 END AS r,
             event_id % 2 AS fold
      FROM events
    ), prop AS (
      -- cross-fit: propensities from fold 0, evaluation on fold 1
      SELECT ctx, act, CAST(count(*) AS BIGINT) AS c_ax,
             CAST(sum(count(*)) OVER (PARTITION BY ctx) AS BIGINT)
               AS c_x
      FROM logs WHERE fold = 0 GROUP BY ctx, act
    ), weighted AS (
      SELECT l.r,
             CASE WHEN l.act = '{_OPE_TARGET}'
                  THEN CAST(p.c_x AS DOUBLE) / p.c_ax
                  ELSE 0.0 END AS w
      FROM logs l JOIN prop p ON p.ctx = l.ctx AND p.act = l.act
      WHERE l.fold = 1
    ), sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(r * w, 12) AS DECIMAL(38,12)))
                  AS DOUBLE) AS srw,
             CAST(sum(CAST(round(w, 12) AS DECIMAL(38,12)))
                  AS DOUBLE) AS sw
      FROM weighted
    )
    SELECT n,
           round(srw / n, 6) AS ips_value,
           round(srw / sw, 6) AS snips_value,
           round(sw / n, 6) AS mean_weight
    FROM sums
    """,
    tags=("analytics", "bandit", "off-policy", "events"),
)
def analytics_ips_offpolicy(spark, sf_dir):
    """OFF-POLICY EVALUATION via inverse-propensity scoring (Horvitz-
    Thompson 1952; SNIPS per Swaminathan-Joachims 2015, public) — how
    a preference/recommendation pipeline prices a NEW policy from
    logged interactions WITHOUT deploying it: here the deterministic
    target policy "always {_OPE_TARGET}", logged propensities are the
    empirical per-context action rates, reward is value > {_OPE_RWD}.
    IPS = mean(r·w) is unbiased but high-variance; SNIPS = Σrw/Σw
    trades a vanishing bias for variance (the estimator every
    production OPE stack reports next to IPS); mean_weight ~ 1 is the
    standard diagnostic that the propensity model is calibrated.
    Propensities are CROSS-FIT (estimated on the even-event fold,
    applied to the odd fold) — self-fitted propensities make
    sum(w) == n hold by construction, degenerating SNIPS to IPS and
    blinding the mean_weight diagnostic. Actions unsupported in the
    fit fold drop from the evaluation (inner join), identically in
    both engines.

    Exactness: propensity weights are ratios of exact integers
    (c_x/c_ax — one IEEE division per row, identical both engines);
    per-row r·w and w round 12dp into DECIMAL(38,12) before the
    cross-engine sums.

    Scale: one grouped count builds the propensity table (bounded
    |ctx|x|actions| grid, broadcast back); the weighted pass is one
    scan + one fold — no window over the corpus."""
    from pyspark.sql import Window as W

    logs = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("ctx"),
        F.col("event_type").alias("act"),
        (F.col("value") > _OPE_RWD).cast("int").alias("r"),
        (F.col("event_id") % 2).alias("fold"),
    )
    # cross-fit: propensities from fold 0, evaluation on fold 1 (the
    # self-fitted variant makes SNIPS degenerate to IPS — sum(w) == n
    # by construction — and hides propensity miscalibration)
    prop = logs.filter(F.col("fold") == 0).groupBy("ctx", "act").agg(
        F.count("*").cast("long").alias("c_ax")
    ).select(
        "ctx",
        "act",
        "c_ax",
        F.sum("c_ax").over(W.partitionBy("ctx")).cast("long").alias(
            "c_x"
        ),
    )
    weighted = (
        logs.filter(F.col("fold") == 1)
        .join(F.broadcast(prop), ["ctx", "act"])
    ).select(
        "r",
        F.when(
            F.col("act") == _OPE_TARGET,
            F.col("c_x").cast("double") / F.col("c_ax"),
        )
        .otherwise(F.lit(0.0))
        .alias("w"),
    )
    sums = weighted.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.round(F.col("r") * F.col("w"), 12).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("srw"),
        F.sum(F.round(F.col("w"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("sw"),
    )
    return sums.select(
        "n",
        F.round(F.col("srw") / F.col("n"), 6).alias("ips_value"),
        F.round(F.col("srw") / F.col("sw"), 6).alias("snips_value"),
        F.round(F.col("sw") / F.col("n"), 6).alias("mean_weight"),
    )


# --------------- delta-method CI for a ratio metric (r12)

_DM_Z = 1.959963984540054  # z_{0.975}, shared repr-exact literal


@query(
    "stats_delta_method_ratio_ci",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS x,
             CAST(CAST(sum(CAST(round(value * 100) AS BIGINT))
                  AS BIGINT) AS BIGINT) AS y_cents
      FROM events GROUP BY user_id
    ), mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y_cents) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y_cents * y_cents) AS HUGEINT) AS syy,
             CAST(sum(x * y_cents) AS BIGINT) AS sxy
      FROM per_user
    )
    SELECT n,
           round((CAST(sy AS DOUBLE) / sx) / 100.0, 6) AS ratio,
           round(sqrt(greatest(CAST(0 AS DOUBLE),
             ((CAST(syy AS DOUBLE) / n
                 - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
              - 2.0 * (CAST(sy AS DOUBLE) / sx)
                * (CAST(sxy AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n)
                     * (CAST(sy AS DOUBLE) / n))
              + (CAST(sy AS DOUBLE) / sx) * (CAST(sy AS DOUBLE) / sx)
                * (CAST(sxx AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n)
                     * (CAST(sx AS DOUBLE) / n)))
             / (n * (CAST(sx AS DOUBLE) / n)
                  * (CAST(sx AS DOUBLE) / n)))) / 100.0, 6) AS se,
           round(((CAST(sy AS DOUBLE) / sx)
             - CAST({_DM_Z!r} AS DOUBLE) * sqrt(greatest(
                 CAST(0 AS DOUBLE),
             ((CAST(syy AS DOUBLE) / n
                 - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
              - 2.0 * (CAST(sy AS DOUBLE) / sx)
                * (CAST(sxy AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n)
                     * (CAST(sy AS DOUBLE) / n))
              + (CAST(sy AS DOUBLE) / sx) * (CAST(sy AS DOUBLE) / sx)
                * (CAST(sxx AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n)
                     * (CAST(sx AS DOUBLE) / n)))
             / (n * (CAST(sx AS DOUBLE) / n)
                  * (CAST(sx AS DOUBLE) / n))))) / 100.0, 6)
             AS ci_lo,
           round(((CAST(sy AS DOUBLE) / sx)
             + CAST({_DM_Z!r} AS DOUBLE) * sqrt(greatest(
                 CAST(0 AS DOUBLE),
             ((CAST(syy AS DOUBLE) / n
                 - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
              - 2.0 * (CAST(sy AS DOUBLE) / sx)
                * (CAST(sxy AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n)
                     * (CAST(sy AS DOUBLE) / n))
              + (CAST(sy AS DOUBLE) / sx) * (CAST(sy AS DOUBLE) / sx)
                * (CAST(sxx AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n)
                     * (CAST(sx AS DOUBLE) / n)))
             / (n * (CAST(sx AS DOUBLE) / n)
                  * (CAST(sx AS DOUBLE) / n))))) / 100.0, 6)
             AS ci_hi
    FROM mom
    """,
    tags=("stats", "experimentation", "ratio-metric", "events"),
)
def stats_delta_method_ratio_ci(spark, sf_dir):
    """DELTA-METHOD CONFIDENCE INTERVAL for a RATIO METRIC (Fieller/
    delta method, public; the Deng et al. 2017 "ratio metrics in A/B
    tests" recipe) — revenue-per-event with users as the randomization
    unit: R = Σy/Σx over per-user totals, Var(R) ≈ (σ_y² − 2Rσ_xy +
    R²σ_x²)/(n·μ_x²). The per-user aggregation is what makes the CI
    honest under within-user correlation — the naive per-event CI is
    the classic A/B-testing mistake this operator exists to prevent.

    Exactness: per-user (x, y) are exact integers (events, cents); all
    five moments are exact integer sums; the variance expression is
    ONE identical IEEE tree both engines (explicit parenthesization),
    guarded nonnegative; sqrt correctly rounded; z is the shared
    repr-exact literal.

    Scale: one per-user hash agg, one 5-moment fold — nothing else."""
    per_user = t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").cast("long").alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y_cents"),
    )
    mom = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y_cents").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(
            F.col("y_cents").cast("decimal(38,0)")
            * F.col("y_cents").cast("decimal(38,0)")
        ).alias("syy"),
        F.sum(F.col("x") * F.col("y_cents")).cast("long").alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    ratio = sy / F.col("sx")
    var_y = syy / n - (sy / n) * (sy / n)
    cov = sxy / n - (sx / n) * (sy / n)
    var_x = sxx / n - (sx / n) * (sx / n)
    se = F.sqrt(
        F.greatest(
            F.lit(0.0),
            (var_y - 2.0 * ratio * cov + ratio * ratio * var_x)
            / (n * (sx / n) * (sx / n)),
        )
    )
    return mom.select(
        "n",
        F.round(ratio / 100.0, 6).alias("ratio"),
        F.round(se / 100.0, 6).alias("se"),
        F.round((ratio - _DM_Z * se) / 100.0, 6).alias("ci_lo"),
        F.round((ratio + _DM_Z * se) / 100.0, 6).alias("ci_hi"),
    )


# --------------- rich-club coefficient (r12)

_RC_K = 12


@query(
    "graph_rich_club",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT
        least(l_orderkey % 300, l_partkey % 300) AS u,
        greatest(l_orderkey % 300, l_partkey % 300) AS v
      FROM lineitem
      WHERE l_orderkey % 300 <> l_partkey % 300
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e
      ) GROUP BY node
    ), rich AS (
      SELECT node FROM deg WHERE d > {_RC_K}
    ), nr AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rich FROM rich
    ), er AS (
      SELECT CAST(count(*) AS BIGINT) AS e_rich
      FROM e JOIN rich r1 ON r1.node = e.u
             JOIN rich r2 ON r2.node = e.v
    )
    SELECT {_RC_K} AS k, nr.n_rich, er.e_rich,
           round(CAST(2 * er.e_rich AS DOUBLE)
                 / (nr.n_rich * (nr.n_rich - 1)), 6) AS phi
    FROM nr CROSS JOIN er
    """,
    tags=("graph", "topology", "lineitem"),
)
def graph_rich_club(spark, sf_dir):
    """RICH-CLUB COEFFICIENT phi(k) (Zhou-Mondragon 2004, public) —
    the density of the subgraph induced by nodes of degree > k:
    phi = 2·E_rich / (N_rich(N_rich−1)). A rising phi(k) means hubs
    preferentially interconnect — the topology that decides whether
    the high-degree end of a 100 TB graph can be broadcast (a small
    dense rich club fits one executor) or must be salted.

    Exactness: degrees, the k-filter, and both counts are exact
    integers; one final density division.

    Scale: degrees are one hash agg; the rich set (small by
    definition) broadcasts into the induced-edge join; the edge
    relation is bounded by the node-grid cap."""
    from gcp_etl_spark.queries.graph_ops import _edges

    e = _edges(spark, sf_dir).transform(barrier)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    rich = deg.filter(F.col("d") > _RC_K).select("node")
    nr = rich.agg(F.count("*").cast("long").alias("n_rich"))
    er = (
        e.join(
            F.broadcast(rich.select(F.col("node").alias("u"))), "u"
        )
        .join(F.broadcast(rich.select(F.col("node").alias("v"))), "v")
        .agg(F.count("*").cast("long").alias("e_rich"))
    )
    return nr.crossJoin(F.broadcast(er)).select(
        F.lit(_RC_K).cast("int").alias("k"),
        "n_rich",
        "e_rich",
        F.round(
            (2 * F.col("e_rich")).cast("double")
            / (F.col("n_rich") * (F.col("n_rich") - 1)),
            6,
        ).alias("phi"),
    )


# ------------- Markov removal-effect attribution (r12 flagship)

_MK_CH = ("click", "error", "signup", "view")  # removable channels
_MK_DESTS = ("click", "error", "purchase", "signup", "view", "END")
_MK_ORIGS = ("START", "click", "error", "signup", "view")
_MK_K = 80  # value-iteration steps; absorbing mass ~0.2/step =>
#             residual < 1e-7 at 80, far inside the 6dp output


def _mk_oracle() -> str:
    """Recursive-CTE value iteration over the bounded transition grid
    (the adstock unrolled-recurrence precedent, with the per-iteration
    12dp state rounding of the IPF/BT convention)."""
    # 30 conditional-aggregate transition probabilities p_{oi}_{di}
    pcols = []
    for oi, o in enumerate(_MK_ORIGS):
        for di, d in enumerate(_MK_DESTS):
            pcols.append(
                f"coalesce(CAST(sum(CASE WHEN orig = '{o}' AND dest = "
                f"'{d}' THEN 1 ELSE 0 END) AS DOUBLE) / "
                f"nullif(sum(CASE WHEN orig = '{o}' THEN 1 ELSE 0 END),"
                f" 0), 0.0) AS p_{oi}_{di}"
            )

    def val(di: int, prefix: str = "it.") -> str:
        d = _MK_DESTS[di]
        if d == "purchase":
            return "1.0"
        if d == "END":
            return "0.0"
        vcol = f"{prefix}v_{d}"
        return f"(CASE WHEN it.scen = '{d}' THEN 0.0 ELSE {vcol} END)"

    def dot(oi: int) -> str:
        return " + ".join(
            f"pm.p_{oi}_{di} * {val(di)}"
            for di in range(len(_MK_DESTS))
        )

    upd = []
    for ch in _MK_CH:
        oi = _MK_ORIGS.index(ch)
        upd.append(
            f"CASE WHEN it.scen = '{ch}' THEN 0.0 "
            f"ELSE round({dot(oi)}, 12) END AS v_{ch}"
        )
    return f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, event_type AS cur,
             lag(event_type) OVER w AS prev,
             (row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) = 1) AS is_last
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), trans AS (
      SELECT 'START' AS orig, cur AS dest FROM seq WHERE prev IS NULL
      UNION ALL
      SELECT prev, cur FROM seq
      WHERE prev IS NOT NULL AND prev <> 'purchase'
      UNION ALL
      SELECT cur, 'END' FROM seq WHERE is_last AND cur <> 'purchase'
    ), pm AS (
      SELECT {", ".join(pcols)} FROM trans
    ), scen AS (
      SELECT unnest(['(full)', {", ".join(f"'{c}'" for c in _MK_CH)}])
        AS scen
    ), it(k, scen, {", ".join(f"v_{c}" for c in _MK_CH)}) AS (
      SELECT 0, scen,
             {", ".join("CAST(0.0 AS DOUBLE)" for _ in _MK_CH)}
      FROM scen
      UNION ALL
      SELECT it.k + 1, it.scen, {", ".join(upd)}
      FROM it, pm WHERE it.k < {_MK_K}
    ), conv AS (
      SELECT it.scen,
             round({dot(0)}, 12) AS p_conv
      FROM it, pm WHERE it.k = {_MK_K}
    ), full_p AS (
      SELECT p_conv AS pf FROM conv WHERE scen = '(full)'
    ), re AS (
      SELECT c.scen AS channel,
             round(c.p_conv, 6) AS p_removed,
             round(f.pf, 6) AS p_full,
             CAST(round(greatest(0.0, 1.0 - c.p_conv / f.pf), 12)
                  AS DECIMAL(38,12)) AS re
      FROM conv c CROSS JOIN full_p f WHERE c.scen <> '(full)'
    )
    SELECT channel, p_full, p_removed,
           round(CAST(re AS DOUBLE), 6) AS removal_effect,
           round(CAST(re AS DOUBLE)
                 / CAST(sum(re) OVER () AS DOUBLE), 6)
             AS attribution_share
    FROM re ORDER BY channel
    """


@query(
    "analytics_markov_removal_effect",
    oracle=_mk_oracle(),
    tags=("analytics", "attribution", "markov", "events"),
)
def analytics_markov_removal_effect(spark, sf_dir):
    """MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. 2014, public)
    — the data-driven attribution model beside the positional
    (analytics_multitouch_attribution) and game-theoretic
    (analytics_shapley_attribution) members: user journeys become a
    first-order Markov chain over touch states with purchase absorbing
    at value 1 and journey-end absorbing at 0; a channel's credit is
    its REMOVAL EFFECT 1 - P(conv | channel removed)/P(conv),
    normalized into shares. Removal pins the channel's value to zero —
    exactly redirecting its inbound mass to the loss state. Journeys
    re-enter after a conversion from the next transition onward
    (transitions OUT of purchase are dropped; no fresh START row) —
    the documented simplification both engines share.

    Exactness: transition probabilities are ratios of exact integers;
    conversion probabilities come from {_MK_K} VALUE-ITERATION steps
    over the bounded 5x6 grid with 12dp state rounding per step (the
    IPF/BT identical-state-sequence convention) — Spark folds ONE
    F.aggregate expression per scenario row, the oracle walks the
    same recurrence as a recursive CTE; residual < 1e-7 at the output
    precision.

    Scale: ONE lag window partitioned by user builds transitions; the
    grid collapses to a 30-entry map in a single aggregate; all 5
    scenario folds run on 5 rows — iteration cost independent of the
    corpus, the property that separates this from simulating journeys."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # is_last via rn == count over the SAME ascending spec: the old
    # descending row_number forced a second full sort of the events
    # relation inside the window stage (guide §2.4: operations keyed
    # the same way share one exchange — and here one SORT); (ts,
    # event_id) is unique per user so "first by desc" == "rn == n"
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lag("event_type").over(w).alias("prev"),
        (
            F.row_number().over(w)
            == F.count("*").over(W.partitionBy("user_id"))
        ).alias("is_last"),
    ).transform(barrier)  # three union branches, one window
    trans = (
        seq.filter(F.col("prev").isNull())
        .select(F.lit("START").alias("orig"), F.col("cur").alias("dest"))
        .unionByName(
            seq.filter(
                F.col("prev").isNotNull() & (F.col("prev") != "purchase")
            ).select(
                F.col("prev").alias("orig"), F.col("cur").alias("dest")
            )
        )
        .unionByName(
            seq.filter(F.col("is_last") & (F.col("cur") != "purchase"))
            .select(F.col("cur").alias("orig"), F.lit("END").alias("dest"))
        )
    )
    oi = F.when(F.col("orig") == "START", 0)
    for i, o in enumerate(_MK_ORIGS[1:], start=1):
        oi = oi.when(F.col("orig") == o, i)
    di = F.when(F.col("dest") == _MK_DESTS[0], 0)
    for i, d in enumerate(_MK_DESTS[1:], start=1):
        di = di.when(F.col("dest") == d, i)
    cnt = trans.groupBy("orig", "dest").agg(
        F.count("*").cast("long").alias("c")
    )
    probs = cnt.select(
        (oi * 6 + di).alias("slot"),
        (
            F.col("c").cast("double")
            / F.sum("c").over(W.partitionBy("orig"))
        ).alias("p"),
    )
    pm = probs.agg(
        F.map_from_arrays(
            F.collect_list("slot"), F.collect_list("p")
        ).alias("P")
    )
    scen = spark.createDataFrame(
        [("(full)",)] + [(c,) for c in _MK_CH], "scen string"
    )
    grid = scen.crossJoin(F.broadcast(pm))

    # map keys are the raw slot ints (0-based); element_at on maps is
    # BY KEY, so no 1-based shift
    def pk(r, d):
        return F.coalesce(
            F.element_at(F.col("P"), F.lit(r * 6 + d)), F.lit(0.0)
        )

    acc_idx = {"click": 1, "error": 2, "signup": 3, "view": 4}

    def val(d_i, acc):
        d = _MK_DESTS[d_i]
        if d == "purchase":
            return F.lit(1.0)
        if d == "END":
            return F.lit(0.0)
        return F.when(F.col("scen") == d, 0.0).otherwise(
            F.element_at(acc, acc_idx[d])
        )

    def dot(orig_row, acc):
        expr = None
        for d_i in range(len(_MK_DESTS)):
            term = pk(orig_row, d_i) * val(d_i, acc)
            expr = term if expr is None else expr + term
        return expr

    def step(acc, _x):
        parts = []
        for ch in _MK_CH:
            orig_row = _MK_ORIGS.index(ch)
            parts.append(
                F.when(F.col("scen") == ch, 0.0).otherwise(
                    F.round(dot(orig_row, acc), 12)
                )
            )
        return F.array(*parts)

    v = F.aggregate(
        F.sequence(F.lit(1), F.lit(_MK_K)),
        F.array(*[F.lit(0.0) for _ in _MK_CH]),
        step,
    )
    conv = grid.select(
        "scen", F.round(dot(0, v), 12).alias("p_conv")
    )
    full_p = conv.filter(F.col("scen") == "(full)").select(
        F.col("p_conv").alias("pf")
    )
    re = (
        conv.filter(F.col("scen") != "(full)")
        .crossJoin(F.broadcast(full_p))
        .select(
            F.col("scen").alias("channel"),
            F.round("p_conv", 6).alias("p_removed"),
            F.round("pf", 6).alias("p_full"),
            F.round(
                F.greatest(
                    F.lit(0.0), 1.0 - F.col("p_conv") / F.col("pf")
                ),
                12,
            )
            .cast("decimal(38,12)")
            .alias("re"),
        )
    )
    return re.select(
        "channel",
        "p_full",
        "p_removed",
        F.round(F.col("re").cast("double"), 6).alias("removal_effect"),
        F.round(
            F.col("re").cast("double")
            / F.sum("re").over(W.partitionBy()).cast("double"),
            6,
        ).alias("attribution_share"),
    ).orderBy("channel")


# --------------- newsvendor critical-fractile decision (r12)

_NV_CU = 3  # underage cost per unit (lost margin)
_NV_CO = 1  # overage cost per unit (holding/salvage loss)


@query(
    "analytics_newsvendor",
    oracle=f"""
    WITH demand AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS q
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), n AS (
      SELECT CAST(count(*) AS BIGINT) AS days FROM demand
    ), pick AS (
      -- critical fractile cu/(cu+co): smallest demand level whose
      -- ECDF reaches it — integer-exact cross-multiplied crossing
      -- (the window_bucket_quantiles convention)
      SELECT min(q) AS q_star FROM (
        SELECT q, count(*) OVER (ORDER BY q) AS cum,
               (SELECT days FROM n) AS days
        FROM demand
      ) WHERE cum * {_NV_CU + _NV_CO} >= {_NV_CU} * days
    )
    SELECT n.days,
           CAST(round(CAST({_NV_CU} AS DOUBLE)
                / ({_NV_CU} + {_NV_CO}), 6) AS DOUBLE)
             AS critical_fractile,
           pick.q_star AS order_qty,
           CAST(sum(greatest(d2.q - pick.q_star, 0)) AS BIGINT)
             AS total_underage_units,
           CAST(sum(greatest(pick.q_star - d2.q, 0)) AS BIGINT)
             AS total_overage_units,
           round(CAST({_NV_CU} * sum(greatest(d2.q - pick.q_star, 0))
                 + {_NV_CO} * sum(greatest(pick.q_star - d2.q, 0))
                 AS DOUBLE) / n.days, 6) AS mean_daily_cost
    FROM demand d2 CROSS JOIN pick CROSS JOIN n
    GROUP BY n.days, pick.q_star
    """,
    tags=("analytics", "inventory", "decision", "events"),
)
def analytics_newsvendor(spark, sf_dir):
    """NEWSVENDOR CRITICAL-FRACTILE STOCKING DECISION (Arrow-Harris-
    Marschak 1951, public) — the canonical inventory/capacity decision
    under demand uncertainty, and the textbook consumer of an exact
    quantile: with underage cost {_NV_CU} and overage cost {_NV_CO},
    the optimal order quantity is the demand distribution's
    cu/(cu+co) = 0.75 quantile. Demand is daily purchase counts; the
    quantile is the smallest demand whose ECDF crosses the fractile,
    tested with the integer cross-multiplied crossing (no float
    threshold); the realized cost of the decision is priced back over
    the same days in exact unit counts.

    Exactness: demands, cumulative counts, and unit totals are exact
    integers; the crossing test is cross-multiplied; two final
    divisions.

    Scale: the demand relation is calendar-bounded (~days); its
    cumulative window is over that bounded grid. The only data-sized
    stage is the per-day count aggregate."""
    from pyspark.sql import Window as W

    demand = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .agg(F.count("*").cast("long").alias("q"))
    ).transform(barrier)  # bounded grid, three consumers
    n = demand.agg(F.count("*").cast("long").alias("days"))
    # cumulative over the calendar-bounded demand grid (bounded-window
    # convention: benign warning filtered at the logging layer)
    cum = demand.crossJoin(F.broadcast(n)).select(
        "q",
        "days",
        F.count("*").over(W.orderBy("q")).alias("cum"),
    )
    pick = cum.filter(
        F.col("cum") * (_NV_CU + _NV_CO) >= _NV_CU * F.col("days")
    ).agg(F.min("q").alias("q_star"))
    priced = demand.crossJoin(F.broadcast(pick)).crossJoin(
        F.broadcast(n)
    )
    return priced.groupBy("days", "q_star").agg(
        F.round(
            F.lit(float(_NV_CU)) / (_NV_CU + _NV_CO), 6
        ).alias("critical_fractile"),
        F.sum(F.greatest(F.col("q") - F.col("q_star"), F.lit(0)))
        .cast("long")
        .alias("total_underage_units"),
        F.sum(F.greatest(F.col("q_star") - F.col("q"), F.lit(0)))
        .cast("long")
        .alias("total_overage_units"),
        F.round(
            (
                _NV_CU
                * F.sum(
                    F.greatest(F.col("q") - F.col("q_star"), F.lit(0))
                )
                + _NV_CO
                * F.sum(
                    F.greatest(F.col("q_star") - F.col("q"), F.lit(0))
                )
            ).cast("double")
            / F.col("days"),
            6,
        ).alias("mean_daily_cost"),
    ).select(
        "days",
        "critical_fractile",
        F.col("q_star").alias("order_qty"),
        "total_underage_units",
        "total_overage_units",
        "mean_daily_cost",
    )
