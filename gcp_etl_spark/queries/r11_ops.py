"""Round-11 operators (r10 verdict asks): the IVF refine-vs-recall
operating curve (ask #8's registered evidence for the default ANN
build-path decision) plus this round's new analytics surface.

Exactness conventions follow the house rules (per-term DECIMAL casts
before cross-engine sums, counts stay BIGINT, final doubles round 6dp).

No reference counterpart (the reference's query surface is
k8s/submit/etl-on-gcp-vinicius-campos.py:22-92 — SELECT * LIMIT 100
plus two counts); these extend the declared training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t
from gcp_etl_spark.operators.barrier import barrier

# ------------------ IVF refine-vs-recall operating curve (r10 ask #8)

_RF_GRID = (0, 1, 2)
_RF_K = 5
_RF_NQ = 10


def _sq_l2(x, y):
    """Sequential-fold squared L2 distance of two array<double> cols
    (same left-to-right order both for determinism and for the NumPy
    pin)."""
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )


@query(
    "ann_ivf_refine_recall_curve",
    # rows-only by design (k-means quantizer + xx-seeded sampling are
    # not SQL-expressible — the IVF family's policy). The curve's
    # CONTRACT is pinned in tests/test_r11.py: full-corpus inertia is
    # NON-INCREASING in refine_iters (Lloyd monotonicity — the property
    # that makes refinement worth paying for), recall stays in [0,1],
    # and the refine_iters=0 row reproduces the sample-only default.
    oracle=None,
    tags=("llm", "ann", "ivf", "evaluation", "iterative"),
)
def ann_ivf_refine_recall_curve(spark, sf_dir):
    """IVF REFINEMENT OPERATING CURVE — recall@k AND full-corpus
    quantizer inertia vs refine_iters in {0,1,2} (r10 verdict ask #8:
    the registered evidence behind the default ANN build path, the
    refinement sibling of ann_ivf_nprobe_sweep's probe curve). Each
    grid row fits the quantizer ONCE (sample seed + r distributed
    Lloyd passes), then reports (a) the mean within-list squared-L2
    inertia over EVERY corpus vector and (b) mean recall@{_RF_K}
    against the exact brute-force top-k for the same {_RF_NQ} probes
    at nprobe=3.

    THE DEFAULT DECISION THIS TABLE RECORDS: at fixture scale the
    4096-vector sample IS the corpus, so refinement buys inertia but
    little recall — sample-only (refine_iters=0) stays the default
    build for small corpora. At 100 TB the sample is a vanishing
    fraction and each refinement pass is one broadcast-matmul
    assignment + one kxd hash agg over data that is being scanned for
    list assignment anyway — the guidance flips to refine_iters>=1,
    wired and hash-pinned via train_kmeans_lloyd /
    ann_cosine_topk_ivf_refined. An operator reads this curve at
    THEIR scale before fixing the build flag fleet-wide.

    Scale: the exact baseline is computed once; each grid point adds
    r full-corpus Lloyd passes (bounded kxd driver state) and one
    probe plan. Inertia sums per-term DECIMAL(38,12) (the
    train_kmeans_lloyd convention) so the recorded curve is
    summation-order-deterministic."""
    import numpy as np

    from gcp_etl_spark.llm.ivf import _nearest_centroids, cosine_topk_ivf
    from gcp_etl_spark.llm.kmeans import lloyd, lloyd_distributed
    from gcp_etl_spark.llm.similarity import cosine_topk

    # NOT checkpointed: the repeated embeddings scans are pruned
    # columnar reads; the cost is the per-grid-point Lloyd/inertia
    # CPU (measured — materializing bought nothing). ~13 s warm at
    # sf0.1, the operating-curve luxury class (banding curve's tier).
    emb = t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _RF_NQ)
    # the exact baseline is |probes| x k rows but feeds one left_semi
    # join PER GRID POINT — without the barrier the broadcast-NLJ
    # brute-force top-k re-ran 3x (r12, guide §1.2)
    exact = cosine_topk(emb, probes, k=_RF_K).select(
        "q_id", F.col("n_id").alias("x_id")
    ).transform(barrier)
    n_pairs = float(_RF_K * _RF_NQ)
    # PROGRESSIVE quantizer fit (optimization r12, guide §1.2 "don't
    # compute things you throw away"): grid point r's centers are one
    # distributed Lloyd pass on top of grid point r-1's — value-
    # identical to three independent ivf_assign(refine_iters=r) fits
    # because a pass is a pure deterministic function of the rounded
    # centers (round_dp=8 inside the aggregate; re-rounding an already
    # rounded matrix is the identity) and the seeded sample fit is
    # deterministic. The sample is fit ONCE and the corpus is scanned
    # for refinement twice instead of 3 sample fits + 3 passes.
    pdf = (
        emb.select(
            F.col("vec_id").alias("__id"),
            F.col("embedding").cast("array<double>").alias("__v"),
        )
        .orderBy("__id")
        .limit(4096)
        .toPandas()
    )
    centers = lloyd(
        np.vstack(pdf["__v"].to_numpy()), 8, seed=42, iters=10
    )
    out = None
    prev_r = 0
    for r in _RF_GRID:
        if r > prev_r:
            centers, _ = lloyd_distributed(
                emb.select("vec_id", "embedding"),
                vec_col="embedding",
                k=8,
                iters=r - prev_r,
                d=centers.shape[1],
                init=centers,
            )
        prev_r = r
        # one assignment pass per grid point: the relation feeds BOTH
        # the inertia aggregate and the prefit probe — without the
        # barrier each consumer re-ran the pandas-UDF nearest-centroid
        # scan (2 Python crossings of the corpus per grid point)
        assigned = emb.withColumn(
            "centroid_id",
            _nearest_centroids(
                F.col("embedding").cast("array<double>"), centers, 1
            )[0],
        ).transform(barrier)
        cdf = spark.createDataFrame(
            [(int(j), [float(x) for x in centers[j]])
             for j in range(centers.shape[0])],
            "centroid_id int, c array<double>",
        )
        inertia = (
            assigned.join(F.broadcast(cdf), "centroid_id")
            .select(
                _sq_l2(
                    F.col("embedding").cast("array<double>"), F.col("c")
                )
                .cast("decimal(38,12)")
                .alias("sq")
            )
            .agg(
                (F.sum("sq").cast("double") / F.count("*")).alias("mi")
            )
        )
        approx = cosine_topk_ivf(
            emb,
            probes,
            k=_RF_K,
            n_centroids=8,
            nprobe=3,
            prefit=(assigned, centers),
        ).select("q_id", "n_id")
        hits = exact.join(
            approx,
            (exact.q_id == approx.q_id) & (exact.x_id == approx.n_id),
            "left_semi",
        )
        rel = (
            hits.agg((F.count("*") / F.lit(n_pairs)).alias("recall"))
            .crossJoin(inertia)  # two 1-row aggregates
            .select(
                F.lit(r).cast("int").alias("refine_iters"),
                F.round("recall", 4).alias("recall_at_k"),
                F.round("mi", 6).alias("mean_inertia"),
            )
        )
        out = rel if out is None else out.unionByName(rel)
    return out.orderBy("refine_iters")


# ----------------------------- NDCG@k ranking evaluation (r11 extra)

_NDCG_K = 10

# 1/log2(rank+1) for ranks 1..10 as repr-exact literals shared
# VERBATIM by both engines (the spectral-weekly / BH-FDR pattern: no
# in-engine libm, so no cross-engine log ulp divergence is possible)
_NDCG_W = {
    1: "1.0", 2: "0.6309297535714575", 3: "0.5",
    4: "0.43067655807339306", 5: "0.38685280723454163",
    6: "0.3562071871080222", 7: "0.3333333333333333",
    8: "0.31546487678572877", 9: "0.3010299956639812",
    10: "0.2890648263178879",
}


def _ndcg_w_case(rank_col: str) -> str:
    """Shared CASE expression mapping rank -> discount weight."""
    arms = " ".join(
        f"WHEN {r} THEN {w}D" for r, w in _NDCG_W.items()
    )
    return f"CASE {rank_col} {arms} ELSE 0.0D END"


def _ndcg_w_case_duck(rank_col: str) -> str:
    arms = " ".join(f"WHEN {r} THEN {w}" for r, w in _NDCG_W.items())
    return f"CASE {rank_col} {arms} ELSE 0.0 END"


@query(
    "eval_ndcg_at_k",
    oracle=f"""
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
                                ORDER BY cents DESC, item) AS rk,
             row_number() OVER (PARTITION BY grp
                                ORDER BY rel DESC, cents DESC, item)
               AS ideal_rk
      FROM graded
    ), dcg AS (
      SELECT grp,
             CAST(sum(CAST((pow(2, rel) - 1)
                           * ({_ndcg_w_case_duck('rk')})
                           AS DECIMAL(38,12)))
                  FILTER (rk <= {_NDCG_K}) AS DOUBLE) AS dcg,
             CAST(sum(CAST((pow(2, rel) - 1)
                           * ({_ndcg_w_case_duck('ideal_rk')})
                           AS DECIMAL(38,12)))
                  FILTER (ideal_rk <= {_NDCG_K}) AS DOUBLE) AS idcg
      FROM ranked GROUP BY grp
    )
    SELECT grp, round(dcg, 6) AS dcg_at_k, round(idcg, 6) AS idcg_at_k,
           round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 6)
             AS ndcg_at_k
    FROM dcg ORDER BY grp
    """,
    tags=("eval", "ranking", "analytics"),
)
def eval_ndcg_at_k(spark, sf_dir):
    """NDCG@{_NDCG_K} (Jarvelin & Kekalainen 2002, public) — THE
    ranking-evaluation metric every retrieval/recommendation pipeline
    publishes, here hash-verified end-to-end: per order priority, the
    "predicted" ranking orders the 50 part buckets by exact revenue
    cents; graded relevance is the exact-integer quantity grade
    least(3, (4*qty) DIV max_qty) — integer division, no FP boundary
    anywhere in the labels. DCG discounts are the ONLY irrational
    constants, embedded as repr-exact 1/log2(rank+1) literals in a
    CASE shared by both engines (no in-engine libm); gains 2^rel - 1
    on integer rel are exact small powers. Per-term DECIMAL(38,12)
    casts make the 10-term sums summation-order-proof; NDCG divides
    bitwise-identical doubles.

    Scale: facts collapse to the bounded (priority x item) grid in one
    hash agg; rankings are windows over <= 50-row groups (group dim,
    never corpus-sized); everything after is arithmetic on the grid.
    At 100 TB the grid is unchanged — only the first agg scans more."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

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
        (F.lit(4) * F.col("qty")).alias("q4"),
        F.max("qty").over(wg).alias("maxq"),
    ).select(
        "grp",
        "item",
        "cents",
        F.least(F.lit(3).cast("long"), F.expr("q4 div maxq")).alias(
            "rel"
        ),
    )
    ranked = graded.select(
        "grp",
        "rel",
        F.row_number()
        .over(wg.orderBy(F.col("cents").desc(), F.col("item")))
        .alias("rk"),
        F.row_number()
        .over(
            wg.orderBy(
                F.col("rel").desc(), F.col("cents").desc(), F.col("item")
            )
        )
        .alias("ideal_rk"),
    )
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1
    term = lambda rkcol: (  # noqa: E731
        (gain * F.expr(_ndcg_w_case(rkcol))).cast("decimal(38,12)")
    )
    dcg = ranked.groupBy("grp").agg(
        F.sum(F.when(F.col("rk") <= _NDCG_K, term("rk")))
        .cast("double")
        .alias("dcg"),
        F.sum(F.when(F.col("ideal_rk") <= _NDCG_K, term("ideal_rk")))
        .cast("double")
        .alias("idcg"),
    )
    return dcg.select(
        "grp",
        F.round("dcg", 6).alias("dcg_at_k"),
        F.round("idcg", 6).alias("idcg_at_k"),
        F.round(
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("ndcg_at_k"),
    ).orderBy("grp")


# ------------------------------ Chow structural-break test (r11 extra)


@query(
    "stats_chow_test",
    oracle="""
    WITH d AS (
      SELECT CAST(epoch_ms(o_orderdate::DATE) / 86400000 AS BIGINT)
               AS x,
             CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), sp AS (
      SELECT (min(x) + max(x)) // 2 AS cut FROM d
    ), seg AS (
      SELECT CASE WHEN x <= cut THEN 0 ELSE 1 END AS s, x, y
      FROM d CROSS JOIN sp
    ), m AS (
      SELECT s,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy
      FROM seg GROUP BY s
    ), rss AS (
      SELECT s, n,
             (syy - sy * sy / n)
             - (sxy - sx * sy / n) * (sxy - sx * sy / n)
               / (sxx - sx * sx / n) AS r
      FROM m
    ), pooled AS (
      SELECT CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy
      FROM seg, (SELECT 1 AS n) _dummy
    ), prss AS (
      SELECT n,
             (syy - sy * sy / n)
             - (sxy - sx * sy / n) * (sxy - sx * sy / n)
               / (sxx - sx * sx / n) AS rp
      FROM pooled
    )
    , slopes AS (
      SELECT s, (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b FROM m
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM rss WHERE s = 0) AS n1,
           (SELECT CAST(n AS BIGINT) FROM rss WHERE s = 1) AS n2,
           round((SELECT b FROM slopes WHERE s = 0), 6) AS slope_pre,
           round((SELECT b FROM slopes WHERE s = 1), 6) AS slope_post,
           round(
             (((SELECT rp FROM prss) - (SELECT sum(r) FROM rss)) / 2)
             / ((SELECT sum(r) FROM rss)
                / ((SELECT n FROM prss) - 4)), 6) AS chow_f
    """,
    tags=("stats", "regression", "time-series", "changepoint"),
)
def stats_chow_test(spark, sf_dir):
    """CHOW TEST for a STRUCTURAL BREAK (Chow 1960, public) — does the
    daily-revenue-vs-time OLS line change at the calendar midpoint?
    F = ((RSS_pooled - RSS1 - RSS2) / k) / ((RSS1 + RSS2) / (n - 2k)),
    k = 2 parameters per segment. The changepoint screen a pipeline
    runs before trusting one global trend model.

    Exactness: x = exact epoch day, y = exact revenue cents, the cut
    is INTEGER midpoint arithmetic; every moment sums DECIMAL(38,0)
    (all-integer products, exact); each RSS is the same closed-form
    IEEE tree in both engines, so the F ratio divides bit-identical
    doubles. The emitted columns stay at ROUNDABLE magnitudes (per-
    segment slopes in cents/day and the F ratio, 6dp) — raw RSS at
    ~1e17 cents^2 is where DuckDB's multiply-divide round() loses bits
    that Spark's BigDecimal round keeps, so huge magnitudes are never
    rounded cross-engine (measured 1-ulp divergence, r11).

    Scale: facts collapse to the calendar-bounded daily relation in
    one hash agg; both segment and pooled moments are one grouped agg
    each over <= |days| rows. Nothing downstream scales with corpus."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(
        (
            (
                F.unix_timestamp(F.col("o_orderdate").cast("date"))
                / 86400
            ).cast("long")
        ).alias("x")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100))
        .cast("long")
        .alias("y")
    )
    cut = d.agg(
        ((F.min("x") + F.max("x")) / 2).cast("long").alias("cut")
    )
    seg = d.crossJoin(F.broadcast(cut)).select(
        F.when(F.col("x") <= F.col("cut"), 0).otherwise(1).alias("s"),
        "x",
        "y",
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    def moments(df, keys):
        return df.groupBy(*keys).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(dec(F.col("x"))).cast("double").alias("sx"),
            F.sum(dec(F.col("y"))).cast("double").alias("sy"),
            F.sum(dec(F.col("x") * F.col("y")))
            .cast("double")
            .alias("sxy"),
            F.sum(dec(F.col("x") * F.col("x")))
            .cast("double")
            .alias("sxx"),
            F.sum(dec(F.col("y") * F.col("y")))
            .cast("double")
            .alias("syy"),
        )

    rss_expr = (
        F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    ) - (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) * (
        F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    ) / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))

    slope_expr = (
        F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    ) / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
    per = moments(seg, ["s"]).select(
        "s", "n", rss_expr.alias("r"), slope_expr.alias("b")
    )
    pooled = moments(seg, []).select(
        "n", rss_expr.alias("rp")
    )
    split = per.agg(
        F.min(F.when(F.col("s") == 0, F.col("n"))).alias("n1"),
        F.min(F.when(F.col("s") == 1, F.col("n"))).alias("n2"),
        F.min(F.when(F.col("s") == 0, F.col("b"))).alias("b0"),
        F.min(F.when(F.col("s") == 1, F.col("b"))).alias("b1"),
        F.sum("r").alias("rs"),
    )
    return split.crossJoin(F.broadcast(pooled)).select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round("b0", 6).alias("slope_pre"),
        F.round("b1", 6).alias("slope_post"),
        F.round(
            ((F.col("rp") - F.col("rs")) / 2)
            / (F.col("rs") / (F.col("n") - 4)),
            6,
        ).alias("chow_f"),
    )


# --------------------------------- partial correlation (r11 extra)


@query(
    "stats_partial_correlation",
    oracle="""
    WITH v AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
             CAST(round(l_discount * 100) AS BIGINT) AS z
      FROM lineitem
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(sum(CAST(z AS DECIMAL(38,0))) AS DOUBLE) AS sz,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * z) AS DOUBLE) AS sxz,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * z) AS DOUBLE) AS syz,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy,
             CAST(sum(CAST(z AS DECIMAL(38,0)) * z) AS DOUBLE) AS szz
      FROM v
    ), r AS (
      SELECT n,
        (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))
          AS rxy,
        (n*sxz - sx*sz) / (sqrt(n*sxx - sx*sx) * sqrt(n*szz - sz*sz))
          AS rxz,
        (n*syz - sy*sz) / (sqrt(n*syy - sy*sy) * sqrt(n*szz - sz*sz))
          AS ryz
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(rxy, 6) AS r_xy,
           round(rxz, 6) AS r_xz,
           round(ryz, 6) AS r_yz,
           round((rxy - rxz * ryz)
                 / (sqrt(1 - rxz * rxz) * sqrt(1 - ryz * ryz)), 6)
             AS r_xy_given_z
    FROM r
    """,
    tags=("stats", "correlation"),
)
def stats_partial_correlation(spark, sf_dir):
    """PARTIAL CORRELATION r_xy.z (first-order, public closed form) —
    the correlation between quantity and price with the discount's
    influence REMOVED: r_xy.z = (r_xy - r_xz r_zy) /
    sqrt((1-r_xz^2)(1-r_zy^2)). The confounder screen an analyst runs
    before reading a raw correlation as signal.

    Exactness: all three variables are exact BIGINTs (quantity,
    price cents, discount percent); the nine cross-moments sum in
    DECIMAL(38,0) (integer products — exact, summation-order-free);
    the three Pearson r's and the partial r are the same IEEE tree on
    both engines (sqrt of identical doubles), rounded 6dp at the end.

    Scale: ONE map-side-combinable hash agg over the fact table —
    nine sums and a count; everything downstream is 1-row arithmetic."""
    li = t(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        F.round(F.col("l_discount") * 100).cast("long").alias("z"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = v.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("z")).cast("double").alias("sz"),
        F.sum(dec("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(dec("x") * F.col("z")).cast("double").alias("sxz"),
        F.sum(dec("y") * F.col("z")).cast("double").alias("syz"),
        F.sum(dec("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(dec("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(dec("z") * F.col("z")).cast("double").alias("szz"),
    )
    n = F.col("n")

    def pear(sab, sa, sb, saa, sbb):
        return (n * F.col(sab) - F.col(sa) * F.col(sb)) / (
            F.sqrt(n * F.col(saa) - F.col(sa) * F.col(sa))
            * F.sqrt(n * F.col(sbb) - F.col(sb) * F.col(sb))
        )

    r = m.select(
        "n",
        pear("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        pear("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        pear("syz", "sy", "sz", "syy", "szz").alias("ryz"),
    )
    return r.select(
        F.col("n").cast("long").alias("n"),
        F.round("rxy", 6).alias("r_xy"),
        F.round("rxz", 6).alias("r_xz"),
        F.round("ryz", 6).alias("r_yz"),
        F.round(
            (F.col("rxy") - F.col("rxz") * F.col("ryz"))
            / (
                F.sqrt(1 - F.col("rxz") * F.col("rxz"))
                * F.sqrt(1 - F.col("ryz") * F.col("ryz"))
            ),
            6,
        ).alias("r_xy_given_z"),
    )


# ------------------------- Kaplan-Meier product-limit (r11 extra)


@query(
    "analytics_kaplan_meier",
    oracle="""
    WITH base AS (
      SELECT greatest(date_diff('day', o.o_orderdate::DATE,
                                min(l.l_shipdate)::DATE), 0) // 7
               AS t,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus
    ), agg AS (
      -- week buckets TRUNCATED at 52: the grid is <= 53 rows BY
      -- CONSTRUCTION at any corpus/calendar size; durations beyond
      -- the truncation stay in the at-risk totals (correct KM on
      -- the restricted horizon)
      SELECT CAST(least(t, 52) AS BIGINT) AS t,
             CAST(sum(ev) AS BIGINT) AS d,
             CAST(count(*) - sum(ev) AS BIGINT) AS c
      FROM base GROUP BY 1
    ), arrs AS (
      SELECT list(t ORDER BY t) AS ts, list(d ORDER BY t) AS ds,
             list(c ORDER BY t) AS cs,
             CAST(count(*) AS INT) AS m,
             (SELECT count(*) FROM base) AS total
      FROM agg
    ), km AS (
      SELECT unnest(range(1, m + 1)) AS i, ts, ds, cs, total FROM arrs
    )
    SELECT CAST(ts[i] AS BIGINT) AS t,
           CAST(total - list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(range(1, i), j -> ds[j] + cs[j])),
                  (a, x) -> a + x) AS BIGINT) AS n_risk,
           CAST(ds[i] AS BIGINT) AS d_events,
           round(list_reduce(
             list_prepend(CAST(1.0 AS DOUBLE),
               list_transform(range(1, i + 1),
                 j -> 1.0 - CAST(ds[j] AS DOUBLE)
                      / (total - list_reduce(
                           list_prepend(CAST(0 AS BIGINT),
                             list_transform(range(1, j),
                                            q -> ds[q] + cs[q])),
                           (a, x) -> a + x)))),
             (acc, f) -> acc * f), 6) AS km_survival
    FROM km
    WHERE ds[i] > 0
    ORDER BY t
    """,
    tags=("analytics", "survival", "time-series"),
)
def analytics_kaplan_meier(spark, sf_dir):
    """KAPLAN-MEIER PRODUCT-LIMIT survival estimator (Kaplan & Meier
    1958, public) with RIGHT CENSORING — the nonparametric
    time-to-event curve behind every retention/churn analysis:
    duration = WEEKS from order placement to first shipment
    (clamped at 0 — the synthetic fixture contains ship-before-order
    rows, and clamping also removes the floor-vs-truncate integer-
    division ambiguity that negative durations would expose),
    truncated at week 52 (the grid is <= 53 rows BY CONSTRUCTION —
    r11 lesson: day-granularity durations were 3593 distinct values
    at sf0.01, exploding the O(m^2) folds); an order with status 'F'
    is an observed event, anything else is censored at its duration. S(t) = prod_{t_i <= t} (1 - d_i / n_i) over
    event times, n_i = at-risk count (duration >= t_i). The additive
    cousin (Nelson-Aalen cumulative hazard) is already registered;
    KM is the multiplicative estimator a survival readout quotes.

    Exactness (the ACF/Durbin-Levinson nested-fold contract): the
    truncated week grid is constant-bounded, so
    both engines materialize the SAME sorted (t, d, c) arrays and run
    SEQUENTIAL left folds — Spark aggregate() over array slices,
    DuckDB list_reduce with a prepended init — multiplying identical
    IEEE factors (1 - d/n from exact BIGINTs) in identical order;
    at-risk counts are pure integer prefix sums. 6dp round at the end.

    Scale: facts collapse to per-order rows (one hash agg), then to
    the bounded duration grid (second hash agg); the O(m^2) prefix
    folds run on m <= 53 — constant, corpus-independent."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    base = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus")
        .agg(F.min("l_shipdate").alias("ship"))
        .select(
            F.least(
                F.expr(
                    "greatest(datediff(CAST(ship AS DATE),"
                    " CAST(o_orderdate AS DATE)), 0) div 7"
                ),
                F.lit(52),
            )
            .cast("long")
            .alias("t"),
            F.when(F.col("o_orderstatus") == "F", 1)
            .otherwise(0)
            .alias("ev"),
        )
    )
    agg = base.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d"),
        (F.count("*") - F.sum("ev")).cast("long").alias("c"),
    )
    arrs = agg.agg(
        F.expr("array_sort(collect_list(struct(t, d, c)))").alias("a"),
        F.count("*").cast("int").alias("m"),
        F.sum(F.col("d") + F.col("c")).cast("long").alias("total"),
    )
    km = arrs.select(
        "a",
        "total",
        F.explode(F.expr("sequence(1, m)")).alias("i"),
    )
    # at-risk(i) = total - sum_{j<i}(d_j + c_j); survival(i) =
    # fold of (1 - d_j / n_j) over j = 1..i — both as sequential
    # aggregate() folds over the same sorted array both engines built
    nrisk_j = (
        "(total - aggregate(slice(a, 1, CAST(j - 1 AS INT)), 0L,"
        " (s, e) -> s + e.d + e.c))"
    )
    return km.select(
        F.expr("a[i - 1].t").cast("long").alias("t"),
        F.expr(
            "total - aggregate(slice(a, 1, CAST(i - 1 AS INT)), 0L,"
            " (s, e) -> s + e.d + e.c)"
        )
        .cast("long")
        .alias("n_risk"),
        F.expr("a[i - 1].d").cast("long").alias("d_events"),
        F.round(
            F.expr(
                f"""aggregate(sequence(1, CAST(i AS INT)), 1.0D,
                  (acc, j) -> acc * (1.0D - CAST(a[j - 1].d AS DOUBLE)
                                     / {nrisk_j}))"""
            ),
            6,
        ).alias("km_survival"),
    ).filter(F.expr("a[i - 1].d > 0")).orderBy("t")


# ------------------- corpus-level repeated-line removal (r11 extra)

_LINE_DF_CAP = 3  # a line present in >= this many distinct docs is
                  # boilerplate (the C4 "three or more" rule's shape)


@query(
    "dedup_lines_corpus",
    oracle=f"""
    WITH lines AS (
      SELECT doc_id, source, trim(ln) AS ln
      FROM (SELECT doc_id, source,
                   unnest(string_split(text, '. ')) AS ln
            FROM documents)
      WHERE trim(ln) <> ''
    ), keyed AS (
      SELECT doc_id, source, md5(ln) AS h,
             CAST(length(ln) AS BIGINT) AS chars
      FROM lines
    ), df AS (
      SELECT h, count(DISTINCT doc_id) AS df FROM keyed GROUP BY h
    )
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (df >= {_LINE_DF_CAP}) AS BIGINT)
             AS n_removed,
           round(1.0 - CAST(sum(chars) FILTER (df >= {_LINE_DF_CAP})
                            AS DOUBLE)
                       / sum(chars), 6) AS retained_char_frac
    FROM keyed JOIN df USING (h)
    GROUP BY source ORDER BY source
    """,
    tags=("llm", "dedup", "curation", "text"),
)
def dedup_lines_corpus(spark, sf_dir):
    """CORPUS-LEVEL REPEATED-LINE REMOVAL (the C4 / RefinedWeb
    boilerplate rule, public: a line occurring in >= {_LINE_DF_CAP}
    distinct documents is template/boilerplate and is dropped
    CORPUS-WIDE, not per-document) — the line-granularity member of
    the dedup family between exact-doc (dedup_cluster_exact) and
    substring (dedup_substring_tokens). Sentences stand in for lines
    on this fixture ('. ' split). Output: per-source audit — line
    volume, lines removed, retained character fraction.

    Scale (the digests-shuffle-not-text house rule): every line
    immediately collapses to its md5 DIGEST + length; the document
    frequency agg and the join shuffle 16-byte digests, never line
    text. Counts are exact BIGINTs; the retained fraction divides
    exact integers (identical IEEE division), rounded 6dp. md5 is
    bit-identical across engines, so the whole query is
    hash-verified — no approximate hashing anywhere.

    At 100 TB: one digest hash agg (map-side combinable) + one
    broadcast-or-shuffle join on digests; text stays in its scan
    task. The df >= k filter is the same screen C4 applied at web
    scale."""
    d = t(spark, sf_dir, "documents")
    lines = (
        d.select(
            "doc_id",
            "source",
            F.explode(F.split(F.col("text"), "\\. ")).alias("ln"),
        )
        .select("doc_id", "source", F.trim(F.col("ln")).alias("ln"))
        .filter(F.col("ln") != "")
    )
    keyed = lines.select(
        "doc_id",
        "source",
        F.md5(F.col("ln")).alias("h"),
        F.length(F.col("ln")).cast("long").alias("chars"),
    )
    df = keyed.groupBy("h").agg(
        F.countDistinct("doc_id").alias("df")
    )
    rem = F.col("df") >= _LINE_DF_CAP
    return (
        keyed.join(df, "h")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(rem, 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.round(
                1.0
                - F.sum(F.when(rem, F.col("chars"))).cast("double")
                / F.sum("chars"),
                6,
            ).alias("retained_char_frac"),
        )
        .orderBy("source")
    )


# ---------------- content-defined chunking dedup ratio (r11 extra)

_CDC_W = 8        # rolling window chars
_CDC_MASK = 64    # boundary when windowed hash % mask == 0 (~64-char
                  # expected chunk length)
_CDC_P = 2147483647  # the portable 31-bit modulus (text_rolling_hash)

# 31^j for j = 0..w-1 — small integer constants shared by both engines
_CDC_POWS = [31 ** j for j in range(_CDC_W)]


@query(
    "dedup_cdc_chunks",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, source,
             regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS s
      FROM documents
    ), codes AS (
      SELECT doc_id, source, s, length(s) AS n,
             list_transform(string_split(s, ''), c -> ascii(c)) AS a
      FROM norm WHERE length(s) >= {_CDC_W}
    ), bnds AS (
      SELECT doc_id, source, s, n,
             list_filter(range({_CDC_W}, n + 1), i ->
               (({' + '.join(f'CAST(a[i - {j}] AS BIGINT) * {_CDC_POWS[j]}'
                             for j in range(_CDC_W))})
                % {_CDC_P}) % {_CDC_MASK} = 0) AS bs
      FROM codes
    ), chunks AS (
      SELECT doc_id, source, unnest(
               list_transform(range(1, len(full_bs)), k ->
                 substring(s, full_bs[k] + 1,
                           full_bs[k + 1] - full_bs[k]))) AS chunk
      FROM (SELECT doc_id, source, s,
                   list_prepend(0, list_append(bs, n)) AS full_bs
            FROM bnds)
      WHERE TRUE
    ), keyed AS (
      SELECT source, md5(chunk) AS h,
             CAST(length(chunk) AS BIGINT) AS chars
      FROM chunks WHERE length(chunk) > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
           round(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 6)
             AS dedup_ratio,
           round(CAST(sum(chars) AS DOUBLE) / count(*), 6)
             AS avg_chunk_chars
    FROM keyed GROUP BY source ORDER BY source
    """,
    tags=("llm", "dedup", "storage", "chunking"),
)
def dedup_cdc_chunks(spark, sf_dir):
    """CONTENT-DEFINED CHUNKING dedup ratio (the rolling-hash boundary
    scheme behind dedup storage systems — LBFS/Rabin family, public):
    a chunk boundary falls wherever the windowed polynomial hash of
    the last {_CDC_W} chars is ≡ 0 mod {_CDC_MASK} (expected chunk
    ~{_CDC_MASK} chars). Because boundaries depend only on LOCAL
    content, an insertion re-chunks only its neighborhood — which is
    why chunk-level dedup (count distinct chunk digests) finds shared
    substrings that whole-doc hashing misses. Output: per-source
    chunk volume, distinct chunks, dedup ratio, mean chunk length —
    the storage-savings table a corpus-dedup operator reads.

    Exactness: the windowed hash is the engine's portable base-31
    integer polynomial (text_rolling_hash / hashed_feature_cross
    convention — builtin hash() differs between engines, explicit
    arithmetic does not); all terms bounded by 8 * 1114111 * 31^7 <
    2^63, so both engines compute identical BIGINTs; chunks collapse
    to md5 digests (bit-identical); ratios divide exact integers,
    6dp. Whole query hash-verified.

    Scale: the per-char work is O({_CDC_W} * len) inside the scan
    task (JVM codegen transform, no UDF); only (digest, length) pairs
    shuffle — the digests-shuffle-not-text rule; the per-source agg
    is map-side combinable. At 100 TB this is one linear pass."""
    d = t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    hash_terms = " + ".join(
        f"CAST(a[i - {j} - 1] AS BIGINT) * {_CDC_POWS[j]}L"
        for j in range(_CDC_W)
    )
    chunks = (
        d.repartition(par)  # single-file scan; per-char fold is heavy
        .select(
            "doc_id",
            "source",
            F.expr(
                r"regexp_replace(trim(lower(text)), '\\s+', ' ')"
            ).alias("s"),
        )
        .filter(F.length("s") >= _CDC_W)
        .select(
            "doc_id",
            "source",
            "s",
            F.expr("transform(split(s, ''), c -> ascii(c))").alias("a"),
            F.length("s").alias("n"),
        )
        .select(
            "doc_id",
            "source",
            "s",
            F.expr(
                f"""concat(array(0),
                     filter(sequence({_CDC_W}, n), i ->
                       ((({hash_terms}) % {_CDC_P}) % {_CDC_MASK}) = 0),
                     array(n))"""
            ).alias("full_bs"),
        )
        .select(
            "source",
            F.explode(
                F.expr(
                    """transform(sequence(1, size(full_bs) - 1), k ->
                         substring(s, full_bs[k - 1] + 1,
                                   full_bs[k] - full_bs[k - 1]))"""
                )
            ).alias("chunk"),
        )
        .filter(F.length("chunk") > 0)
    )
    keyed = chunks.select(
        "source",
        F.md5(F.col("chunk")).alias("h"),
        F.length("chunk").cast("long").alias("chars"),
    )
    return (
        keyed.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.countDistinct("h").cast("long").alias("n_distinct"),
            F.round(
                1.0 - F.countDistinct("h").cast("double") / F.count("*"),
                6,
            ).alias("dedup_ratio"),
            F.round(
                F.sum("chars").cast("double") / F.count("*"), 6
            ).alias("avg_chunk_chars"),
        )
        .orderBy("source")
    )


# --------------------- Newey-West HAC standard error (r11 extra)


@query(
    "analytics_newey_west",
    oracle="""
    WITH d AS (
      SELECT CAST(epoch_ms(o_orderdate::DATE) / 86400000 AS BIGINT)
               AS x,
             CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx
      FROM d
    ), fit AS (
      SELECT n, sx / n AS mx, sy / n AS my,
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b,
             sxx - sx * sx / n AS sxx_c
      FROM m
    ), r AS (
      SELECT x, (x - mx) * ((y - my) - b * (x - mx)) AS u,
             n, b, sxx_c
      FROM d CROSS JOIN fit
    ), lagged AS (
      SELECT u, lag(u) OVER (ORDER BY x) AS ul, n, b, sxx_c FROM r
    ), s AS (
      SELECT max(n) AS n, max(b) AS b, max(sxx_c) AS sxx_c,
             CAST(sum(CAST(u * u AS DECIMAL(38,6))) AS DOUBLE) AS s0,
             CAST(sum(CAST(u * ul AS DECIMAL(38,6))) AS DOUBLE) AS s1
      FROM lagged
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(b, 6) AS slope_cents_per_day,
           round(sqrt(s0 / (sxx_c * sxx_c)), 6) AS se_white,
           round(sqrt((s0 + 2 * 0.5 * s1) / (sxx_c * sxx_c)), 6)
             AS se_hac_lag1,
           round(sqrt((s0 + 2 * 0.5 * s1) / (sxx_c * sxx_c))
                 / sqrt(s0 / (sxx_c * sxx_c)), 6) AS hac_inflation
    FROM s
    """,
    tags=("stats", "regression", "time-series"),
)
def analytics_newey_west(spark, sf_dir):
    """NEWEY-WEST HAC STANDARD ERROR (Newey & West 1987, public) for
    the daily-revenue trend slope, lag-1 Bartlett kernel (weight
    1 - 1/(L+1) = 0.5): autocorrelated daily residuals make the
    classical OLS standard error a lie — the HAC estimator corrects
    it, and the hac_inflation column is the factor by which naive
    trend inference was overconfident. Variance of b =
    (S0 + 2*0.5*S1) / Sxx_c^2 with S_l = sum_t u_t u_{t-l},
    u_t = x_c,t * e_t (the score series).

    Exactness: integer inputs (epoch day, revenue cents); the OLS
    moments sum DECIMAL(38,0) (exact); b / means are identical IEEE
    doubles, hence each u_t is bit-identical cross-engine; the score
    products u_t*u_t and u_t*u_{t-1} are per-term DECIMAL(38,6)-cast
    before summing so Spark partial-agg order cannot move S0/S1 (the
    stats_variance_ratio convention). 6dp rounds at the end.

    Scale: facts collapse to the calendar-bounded daily relation; the
    lag window orders <= |days| rows; two moment aggs end it."""
    o = t(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    d = o.groupBy(
        (
            (
                F.unix_timestamp(F.col("o_orderdate").cast("date"))
                / 86400
            ).cast("long")
        ).alias("x")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100))
        .cast("long")
        .alias("y")
    )
    dec0 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec0(F.col("x"))).cast("double").alias("sx"),
        F.sum(dec0(F.col("y"))).cast("double").alias("sy"),
        F.sum(dec0(F.col("x")) * F.col("y"))
        .cast("double")
        .alias("sxy"),
        F.sum(dec0(F.col("x")) * F.col("x"))
        .cast("double")
        .alias("sxx"),
    )
    fit = m.select(
        "n",
        (F.col("sx") / F.col("n")).alias("mx"),
        (F.col("sy") / F.col("n")).alias("my"),
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("b"),
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")).alias(
            "sxx_c"
        ),
    )
    r = d.crossJoin(F.broadcast(fit)).select(
        "x",
        (
            (F.col("x") - F.col("mx"))
            * (
                (F.col("y") - F.col("my"))
                - F.col("b") * (F.col("x") - F.col("mx"))
            )
        ).alias("u"),
        "n",
        "b",
        "sxx_c",
    )
    # lag over the calendar-bounded daily relation (<= |days| rows)
    lagged = r.select(
        "u",
        F.lag("u").over(W.orderBy("x")).alias("ul"),
        "n",
        "b",
        "sxx_c",
    )
    dec6 = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    s = lagged.agg(
        F.max("n").alias("n"),
        F.max("b").alias("b"),
        F.max("sxx_c").alias("sxx_c"),
        F.sum(dec6(F.col("u") * F.col("u"))).cast("double").alias("s0"),
        F.sum(dec6(F.col("u") * F.col("ul")))
        .cast("double")
        .alias("s1"),
    )
    var_w = F.col("s0") / (F.col("sxx_c") * F.col("sxx_c"))
    var_h = (F.col("s0") + 2 * 0.5 * F.col("s1")) / (
        F.col("sxx_c") * F.col("sxx_c")
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round("b", 6).alias("slope_cents_per_day"),
        F.round(F.sqrt(var_w), 6).alias("se_white"),
        F.round(F.sqrt(var_h), 6).alias("se_hac_lag1"),
        F.round(F.sqrt(var_h) / F.sqrt(var_w), 6).alias(
            "hac_inflation"
        ),
    )


# ------------------------- AIC/BIC model comparison (r11 extra)


@query(
    "stats_aic_model_compare",
    oracle="""
    WITH d AS (
      SELECT CAST(epoch_ms(o_orderdate::DATE) / 86400000 AS BIGINT)
               AS x1,
             CAST(epoch_ms(o_orderdate::DATE) / 86400000 AS BIGINT) % 7
               AS x2,
             CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS y
      FROM orders GROUP BY 1, 2
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(sum(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) AS s2,
             CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x1 AS DECIMAL(38,0)) * x1) AS DOUBLE) AS s11,
             CAST(sum(CAST(x2 AS DECIMAL(38,0)) * x2) AS DOUBLE) AS s22,
             CAST(sum(CAST(x1 AS DECIMAL(38,0)) * x2) AS DOUBLE) AS s12,
             CAST(sum(CAST(x1 AS DECIMAL(38,0)) * y) AS DOUBLE) AS s1y,
             CAST(sum(CAST(x2 AS DECIMAL(38,0)) * y) AS DOUBLE) AS s2y,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
      FROM d
    ), c AS (  -- centered sums
      SELECT n,
             s11 - s1 * s1 / n AS a11, s12 - s1 * s2 / n AS a12,
             s22 - s2 * s2 / n AS a22, s1y - s1 * sy / n AS b1,
             s2y - s2 * sy / n AS b2, syy - sy * sy / n AS tss
      FROM m
    ), f AS (
      SELECT n, tss,
             tss - b1 * b1 / a11 AS rss1,
             tss - (b1 * (a22 * b1 - a12 * b2)
                    + b2 * (a11 * b2 - a12 * b1))
                   / (a11 * a22 - a12 * a12) AS rss2
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(1.0 - rss1 / tss, 6) AS r2_m1,
           round(1.0 - rss2 / tss, 6) AS r2_m2,
           round(n * CAST(CAST(ln(rss1 / n) AS DECIMAL(38,12))
                          AS DOUBLE) + 2 * 2, 4) AS aic_m1,
           round(n * CAST(CAST(ln(rss2 / n) AS DECIMAL(38,12))
                          AS DOUBLE) + 2 * 3, 4) AS aic_m2,
           round(n * CAST(CAST(ln(rss1 / n) AS DECIMAL(38,12))
                          AS DOUBLE)
                 + 2 * CAST(CAST(ln(CAST(n AS DOUBLE))
                                 AS DECIMAL(38,12)) AS DOUBLE), 4)
             AS bic_m1,
           round(n * CAST(CAST(ln(rss2 / n) AS DECIMAL(38,12))
                          AS DOUBLE)
                 + 3 * CAST(CAST(ln(CAST(n AS DOUBLE))
                                 AS DECIMAL(38,12)) AS DOUBLE), 4)
             AS bic_m2
    FROM f
    """,
    tags=("stats", "regression", "model-selection"),
)
def stats_aic_model_compare(spark, sf_dir):
    """AIC / BIC MODEL COMPARISON (Akaike 1974; Schwarz 1978, public)
    between the 1-feature trend model (daily revenue ~ day) and the
    2-feature trend+weekday model (~ day + day%7), both fit closed-
    form from centered moment sums (Cramer's rule for the 2x2 —
    the analytics_granger_lite pattern). The model-selection readout
    (penalized fit: AIC = n ln(RSS/n) + 2k, BIC swaps 2 for ln n) a
    pipeline consults before adding a seasonal term.

    Exactness: all-integer moment sums in DECIMAL(38,0); RSS/R^2 from
    identical IEEE trees; each ln() result is DECIMAL(38,12)-cast
    before re-entering arithmetic (the analytics_theil_index rule —
    absorbs JVM-vs-DuckDB libm last-ulp divergence); AIC/BIC round
    4dp (magnitude ~1e4), R^2 6dp.

    Scale: one hash agg over the calendar-bounded daily relation,
    then 1-row arithmetic."""
    o = t(spark, sf_dir, "orders")
    day = (
        F.unix_timestamp(F.col("o_orderdate").cast("date")) / 86400
    ).cast("long")
    d = o.groupBy(
        day.alias("x1"), (day % 7).alias("x2")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100))
        .cast("long")
        .alias("y")
    )
    dec0 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec0(F.col("x1"))).cast("double").alias("s1"),
        F.sum(dec0(F.col("x2"))).cast("double").alias("s2"),
        F.sum(dec0(F.col("y"))).cast("double").alias("sy"),
        F.sum(dec0(F.col("x1")) * F.col("x1")).cast("double").alias("s11"),
        F.sum(dec0(F.col("x2")) * F.col("x2")).cast("double").alias("s22"),
        F.sum(dec0(F.col("x1")) * F.col("x2")).cast("double").alias("s12"),
        F.sum(dec0(F.col("x1")) * F.col("y")).cast("double").alias("s1y"),
        F.sum(dec0(F.col("x2")) * F.col("y")).cast("double").alias("s2y"),
        F.sum(dec0(F.col("y")) * F.col("y")).cast("double").alias("syy"),
    )
    n = F.col("n")
    c = m.select(
        "n",
        (F.col("s11") - F.col("s1") * F.col("s1") / n).alias("a11"),
        (F.col("s12") - F.col("s1") * F.col("s2") / n).alias("a12"),
        (F.col("s22") - F.col("s2") * F.col("s2") / n).alias("a22"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / n).alias("b1"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / n).alias("b2"),
        (F.col("syy") - F.col("sy") * F.col("sy") / n).alias("tss"),
    )
    f = c.select(
        "n",
        "tss",
        (F.col("tss") - F.col("b1") * F.col("b1") / F.col("a11")).alias(
            "rss1"
        ),
        (
            F.col("tss")
            - (
                F.col("b1")
                * (F.col("a22") * F.col("b1") - F.col("a12") * F.col("b2"))
                + F.col("b2")
                * (F.col("a11") * F.col("b2") - F.col("a12") * F.col("b1"))
            )
            / (
                F.col("a11") * F.col("a22")
                - F.col("a12") * F.col("a12")
            )
        ).alias("rss2"),
    )
    ln12 = lambda col: (  # noqa: E731 - theil_index libm-absorb rule
        F.log(col).cast("decimal(38,12)").cast("double")
    )
    return f.select(
        F.col("n").cast("long").alias("n"),
        F.round(1.0 - F.col("rss1") / F.col("tss"), 6).alias("r2_m1"),
        F.round(1.0 - F.col("rss2") / F.col("tss"), 6).alias("r2_m2"),
        F.round(n * ln12(F.col("rss1") / n) + 2 * 2, 4).alias("aic_m1"),
        F.round(n * ln12(F.col("rss2") / n) + 2 * 3, 4).alias("aic_m2"),
        F.round(
            n * ln12(F.col("rss1") / n) + 2 * ln12(n.cast("double")), 4
        ).alias("bic_m1"),
        F.round(
            n * ln12(F.col("rss2") / n) + 3 * ln12(n.cast("double")), 4
        ).alias("bic_m2"),
    )


# ----------------------- average precision / MAP eval (r11 extra)


@query(
    "eval_average_precision",
    oracle="""
    WITH item AS (
      SELECT o_orderpriority AS grp, l_partkey % 50 AS item,
             CAST(sum(round(l_extendedprice * 100)) AS BIGINT) AS cents,
             CAST(sum(l_quantity) AS BIGINT) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), graded AS (
      SELECT grp, item, cents,
             CASE WHEN (4 * qty) // max(qty) OVER (PARTITION BY grp)
                       >= 2 THEN 1 ELSE 0 END AS rel
      FROM item
    ), ranked AS (
      SELECT grp, rel,
             row_number() OVER (PARTITION BY grp
                                ORDER BY cents DESC, item) AS rk,
             sum(rel) OVER (PARTITION BY grp
                            ORDER BY cents DESC, item) AS cum_rel
      FROM graded
    )
    SELECT grp,
           CAST(sum(rel) AS BIGINT) AS n_relevant,
           round(CAST(sum(CAST(CASE WHEN rel = 1
                       THEN CAST(cum_rel AS DOUBLE) / rk
                       ELSE 0.0 END AS DECIMAL(38,12))) AS DOUBLE)
                 / sum(rel), 6) AS average_precision
    FROM ranked GROUP BY grp ORDER BY grp
    """,
    tags=("eval", "ranking", "analytics"),
)
def eval_average_precision(spark, sf_dir):
    """AVERAGE PRECISION (AP, the area under the precision-recall
    steps; per-group rows = the MAP table) — the binary-relevance
    companion of eval_ndcg_at_k over the same (priority x item)
    ranking: relevant = top-half quantity grade ((4*qty) DIV maxq
    >= 2, exact integer rule), predicted order = revenue cents desc.
    AP = mean over relevant items of precision@their-rank.

    Exactness: relevance and cumulative-relevant counts are exact
    integers; each precision@k = cum_rel/rk divides exact BIGINTs
    (identical IEEE); the per-item terms are DECIMAL(38,12)-cast
    before the sum (order-proof); final division by the exact
    relevant count rounds 6dp.

    Scale: identical shape to eval_ndcg_at_k — one corpus hash agg to
    the bounded grid, windows over <= 50-row groups."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

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
        (F.lit(4) * F.col("qty")).alias("q4"),
        F.max("qty").over(wg).alias("maxq"),
    ).select(
        "grp",
        "item",
        "cents",
        F.when(F.expr("q4 div maxq") >= 2, 1).otherwise(0).alias("rel"),
    )
    wo = wg.orderBy(F.col("cents").desc(), F.col("item"))
    ranked = graded.select(
        "grp",
        "rel",
        F.row_number().over(wo).alias("rk"),
        F.sum("rel").over(wo).alias("cum_rel"),
    )
    return (
        ranked.groupBy("grp")
        .agg(
            F.sum("rel").cast("long").alias("n_relevant"),
            F.round(
                F.sum(
                    F.when(
                        F.col("rel") == 1,
                        (
                            F.col("cum_rel").cast("double") / F.col("rk")
                        ).cast("decimal(38,12)"),
                    ).otherwise(F.lit(0.0).cast("decimal(38,12)"))
                ).cast("double")
                / F.sum("rel"),
                6,
            ).alias("average_precision"),
        )
        .orderBy("grp")
    )


# ----------------------- as-of join with tolerance (r11 extra)

_ASOF_TOL_US = 600 * 1_000_000  # 10-minute tolerance, microseconds


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH c AS (
      SELECT user_id, epoch_us(ts) AS cus FROM events
      WHERE event_type = 'click'
    ), v AS (
      SELECT user_id, epoch_us(ts) AS vus FROM events
      WHERE event_type = 'view'
    ), j AS (
      SELECT c.user_id, c.cus, v.vus
      FROM c ASOF LEFT JOIN v
        ON c.user_id = v.user_id AND v.vus <= c.cus
    )
    SELECT CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(count(*) FILTER (vus IS NOT NULL
                 AND cus - vus <= {_ASOF_TOL_US}) AS BIGINT)
             AS n_matched,
           CAST(count(*) FILTER (vus IS NOT NULL
                 AND cus - vus > {_ASOF_TOL_US}) AS BIGINT)
             AS n_tolerance_missed,
           CAST(count(*) FILTER (vus IS NULL) AS BIGINT) AS n_no_prior,
           round(CAST(sum(cus - vus)
                      FILTER (vus IS NOT NULL
                              AND cus - vus <= {_ASOF_TOL_US})
                      AS DOUBLE)
                 / count(*) FILTER (vus IS NOT NULL
                                    AND cus - vus <= {_ASOF_TOL_US})
                 / 1000000.0, 6) AS avg_gap_s
    FROM j
    """,
    tags=("joins", "asof", "events", "temporal"),
)
def join_asof_tolerance(spark, sf_dir):
    """AS-OF JOIN WITH TOLERANCE (the kdb/pandas ``merge_asof
    tolerance=`` semantic): each click matches the user's LATEST view
    at-or-before it, but only counts as attributed when the gap is
    within 10 minutes — the attribution-window rule every
    click-attribution pipeline enforces. Reported: matched /
    tolerance-missed (a prior view exists but is stale) / no-prior
    counts and the mean attributed gap.

    Spark implementation (no native ASOF): the union-tag pattern —
    views and clicks interleave in ONE per-user event-time window and
    ``last_value(view_ts, ignorenulls)`` carries the latest view
    forward; ties cannot occur (event timestamps are strictly
    increasing per user in this table). The oracle uses DuckDB's
    NATIVE ASOF LEFT JOIN — two entirely different algorithms, one
    hash-verified answer. Gaps are exact epoch-microsecond BIGINTs;
    the mean divides exact integers (DECIMAL sum), rounded 6dp.

    Scale: one hash shuffle on user_id, one ordered window per user
    (state = one timestamp), one aggregate — the streaming dual is
    stream-static enrich. Never a range join, never an explode."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    tagged = e.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("event_type").alias("et"),
        F.when(
            F.col("event_type") == "view",
            F.unix_micros(F.col("ts").cast("timestamp")),
        ).alias("vus"),
    )
    # views sort BEFORE clicks at equal timestamps ('click' < 'view'
    # lexically, so order by et DESC puts view first) — moot here
    # (per-user timestamps are unique) but pinned for determinism
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("us"), F.col("et").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    j = (
        tagged.select(
            "user_id",
            "us",
            "et",
            F.last("vus", ignorenulls=True).over(w).alias("last_vus"),
        )
        .filter(F.col("et") == "click")
        .select("us", "last_vus")
    )
    matched = F.col("last_vus").isNotNull() & (
        F.col("us") - F.col("last_vus") <= _ASOF_TOL_US
    )
    stale = F.col("last_vus").isNotNull() & (
        F.col("us") - F.col("last_vus") > _ASOF_TOL_US
    )
    return j.agg(
        F.count("*").cast("long").alias("n_clicks"),
        F.sum(F.when(matched, 1).otherwise(0))
        .cast("long")
        .alias("n_matched"),
        F.sum(F.when(stale, 1).otherwise(0))
        .cast("long")
        .alias("n_tolerance_missed"),
        F.sum(F.when(F.col("last_vus").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_no_prior"),
        F.round(
            F.sum(
                F.when(
                    matched,
                    (F.col("us") - F.col("last_vus")).cast(
                        "decimal(38,0)"
                    ),
                )
            ).cast("double")
            / F.sum(F.when(matched, 1))
            / 1000000.0,
            6,
        ).alias("avg_gap_s"),
    )


# -------------------- KLL quantile sketch deciles (r11 extra)


@query(
    "agg_kll_quantile_sketch",
    # rows-only by design: the compactor stack's survivors depend on
    # partitioning, which SQL cannot replay. The accuracy CONTRACT is
    # pinned in tests/test_r11.py: every decile estimate within 2% of
    # the exact rank (k=256), weighted_n == exact row count (the
    # sketch never loses or invents mass), and fixed partitioning =>
    # bit-identical sketch (the deterministic sweep variant).
    oracle=None,
    tags=("aggregates", "sketch", "quantiles", "mergeable"),
)
def agg_kll_quantile_sketch(spark, sf_dir):
    """KLL-STYLE QUANTILE SKETCH deciles of l_extendedprice
    (operators/kll.py — deterministic sweep-compaction variant,
    k=256): the ONE-PASS bounded-memory tier of the quantile family,
    below exact ``percentile`` (single-reducer value map) and the
    two-pass exact rank (operators/quantiles.py). Emits each decile
    estimate next to the sketch-size telemetry (surviving rows,
    total weighted mass) — the space-for-accuracy receipt.

    Scale: per-partition compactor stacks inside mapInPandas (numpy
    sorts in the scan task; RAW VALUES NEVER SHUFFLE — only the
    <= k*levels survivors per partition); the union of partition
    sketches IS the merged sketch (KLL merge = concat + compact, and
    compaction is deferred losslessly to the estimate step); the
    estimate is one ordered window over the bounded sketch relation.
    Mergeable by construction => identical shape for streaming
    micro-batches and a 1000-way executor tree."""
    from gcp_etl_spark.operators.kll import kll_quantiles

    li = t(spark, sf_dir, "lineitem")
    probs = {f"q{10 * i}": i / 10 for i in range(1, 10)}
    return kll_quantiles(
        li, "l_extendedprice", probs, k=256
    ).orderBy("qname")


# ---------------------- Hosmer-Lemeshow calibration (r11 extra)

_HL_BINS = 10


@query(
    "stats_hosmer_lemeshow",
    oracle=f"""
    WITH scored AS (
      SELECT ((event_id * 2654435761) % 1000) / 1000.0 AS p,
             CASE WHEN value * (1 + ((event_id * 2654435761) % 1000)
                               / 1000.0) > 60 THEN 1 ELSE 0 END AS y
      FROM events
    ), binned AS (
      SELECT least(CAST(floor(p * {_HL_BINS}) AS BIGINT),
                   {_HL_BINS - 1}) AS g, p, y
      FROM scored
    ), per AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS o,
             CAST(sum(CAST(p AS DECIMAL(38,12))) AS DOUBLE) AS e
      FROM binned GROUP BY g
    )
    SELECT CAST(sum(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_bins,
           round(CAST(sum(CAST(
             (o - e) * (o - e) / (e * (1 - e / n))
             AS DECIMAL(38,12))) AS DOUBLE), 6) AS hl_statistic
    FROM per
    """,
    tags=("stats", "calibration", "ml"),
)
def stats_hosmer_lemeshow(spark, sf_dir):
    """HOSMER-LEMESHOW goodness-of-calibration statistic (Hosmer &
    Lemeshow 1980, public) — THE classical check that a probability
    model's predictions match observed frequencies, chi-square-
    distributed with n_bins - 2 df under calibration: HL =
    sum_g (O_g - E_g)^2 / (E_g (1 - E_g/n_g)) over {_HL_BINS}
    probability deciles. The decision-grade sibling of the Brier
    decomposition (same Knuth-hash rational forecasts, so every p is
    an EXACT multiple of 1/1000 — no libm anywhere in the labels).

    Exactness: O_g are exact BIGINTs; E_g sums exact rationals via
    DECIMAL(38,12); each bin's chi-square term is the same IEEE tree
    both engines then DECIMAL-cast before the final 10-term sum. 6dp.

    Scale: one hash agg to the {_HL_BINS}-row bin grid; everything
    after is constant-size arithmetic."""
    e = t(spark, sf_dir, "events")
    p = ((F.col("event_id") * 2654435761) % 1000) / 1000.0
    scored = e.select(
        p.alias("p"),
        F.when(F.col("value") * (1 + p) > 60, 1).otherwise(0).alias("y"),
    )
    binned = scored.select(
        F.least(
            F.floor(F.col("p") * _HL_BINS).cast("long"),
            F.lit(_HL_BINS - 1),
        ).alias("g"),
        "p",
        "y",
    )
    per = binned.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("o"),
        F.sum(F.col("p").cast("decimal(38,12)"))
        .cast("double")
        .alias("e"),
    )
    term = (
        (F.col("o") - F.col("e"))
        * (F.col("o") - F.col("e"))
        / (F.col("e") * (1 - F.col("e") / F.col("n")))
    ).cast("decimal(38,12)")
    return per.agg(
        F.sum("n").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_bins"),
        F.round(F.sum(term).cast("double"), 6).alias("hl_statistic"),
    )


# ------------------ rolling-origin forecast backtest (r11 extra)

_BT_HORIZON = 56  # evaluated days (the rolling-origin window)


@query(
    "analytics_rolling_origin_backtest",
    oracle=f"""
    WITH d AS (
      SELECT CAST(epoch_ms(o_orderdate::DATE) / 86400000 AS BIGINT)
               AS x,
             CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), lagged AS (
      SELECT x, y,
             lag(y, 1) OVER (ORDER BY x) AS naive,
             lag(y, 7) OVER (ORDER BY x) AS snaive,
             max(x) OVER () AS mx
      FROM d
    ), ev AS (
      SELECT y, naive, snaive FROM lagged
      WHERE x > mx - {_BT_HORIZON} AND snaive IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_eval,
           round(CAST(sum(CAST(abs(y - naive) AS DECIMAL(38,0)))
                      AS DOUBLE) / count(*) / 100.0, 6) AS mae_naive,
           round(CAST(sum(CAST(abs(y - snaive) AS DECIMAL(38,0)))
                      AS DOUBLE) / count(*) / 100.0, 6)
             AS mae_seasonal_naive,
           round(sqrt(CAST(sum(CAST((y - snaive) * (y - snaive)
                                    AS DECIMAL(38,0))) AS DOUBLE)
                      / count(*)) / 100.0, 6) AS rmse_seasonal_naive,
           round(1.0 - CAST(sum(CAST(abs(y - snaive) AS DECIMAL(38,0)))
                            AS DOUBLE)
                     / CAST(sum(CAST(abs(y - naive) AS DECIMAL(38,0)))
                            AS DOUBLE), 6) AS skill_vs_naive
    FROM ev
    """,
    tags=("analytics", "forecast", "time-series", "evaluation"),
)
def analytics_rolling_origin_backtest(spark, sf_dir):
    """ROLLING-ORIGIN FORECAST BACKTEST (the time-series
    cross-validation protocol, Hyndman's evaluation canon, public):
    every day in the final {_BT_HORIZON}-day window is a fresh
    origin; the 1-step seasonal-naive forecaster (y-hat_t = y_(t-7))
    is scored against the naive baseline (y-hat_t = y_(t-1)) with
    MAE / RMSE and the skill score 1 - MAE_model/MAE_baseline — the
    go/no-go table every forecasting deployment publishes before
    replacing the incumbent. (The trainable forecasters — SES,
    Holt-Winters, Croston — are registered separately; this is the
    EVALUATION harness around any of them, on the cheapest pair.)

    Exactness: daily cents are exact BIGINTs; the lag windows run
    over the calendar-bounded daily relation; absolute/squared errors
    are exact integers summed in DECIMAL(38,0); the final divisions
    and sqrt act on identical doubles, reported in dollars, 6dp.

    Scale: one hash agg collapses facts to days; two lag windows and
    one aggregate end it — corpus size only affects the first agg."""
    o = t(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    d = o.groupBy(
        (
            (
                F.unix_timestamp(F.col("o_orderdate").cast("date"))
                / 86400
            ).cast("long")
        ).alias("x")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100))
        .cast("long")
        .alias("y")
    )
    w = W.orderBy("x")
    lagged = d.select(
        "x",
        "y",
        F.lag("y", 1).over(w).alias("naive"),
        F.lag("y", 7).over(w).alias("snaive"),
        # max over the SAME bounded ordered window (full frame) — no
        # separate aggregate branch needed
        F.max("x")
        .over(w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("mx"),
    )
    ev = lagged.filter(
        (F.col("x") > F.col("mx") - _BT_HORIZON)
        & F.col("snaive").isNotNull()
    )
    dec0 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    mae_n = (
        F.sum(dec0(F.abs(F.col("y") - F.col("naive"))))
        .cast("double")
    )
    mae_s = (
        F.sum(dec0(F.abs(F.col("y") - F.col("snaive"))))
        .cast("double")
    )
    return ev.agg(
        F.count("*").cast("long").alias("n_eval"),
        F.round(mae_n / F.count("*") / 100.0, 6).alias("mae_naive"),
        F.round(mae_s / F.count("*") / 100.0, 6).alias(
            "mae_seasonal_naive"
        ),
        F.round(
            F.sqrt(
                F.sum(
                    dec0(
                        (F.col("y") - F.col("snaive"))
                        * (F.col("y") - F.col("snaive"))
                    )
                ).cast("double")
                / F.count("*")
            )
            / 100.0,
            6,
        ).alias("rmse_seasonal_naive"),
        F.round(1.0 - mae_s / mae_n, 6).alias("skill_vs_naive"),
    )


# ---------------- streaming windowed quantile monitor (r11 extra)


@query(
    "stream_quantile_monitor",
    oracle="""
    WITH win AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS w_start,
             CAST(floor(value) AS BIGINT) AS b, count(*) AS n
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT w_start, b,
             sum(n) OVER (PARTITION BY w_start ORDER BY b) AS cum,
             sum(n) OVER (PARTITION BY w_start) AS N
      FROM win
    )
    SELECT w_start,
           CAST(max(N) AS BIGINT) AS n_window,
           -- integer-exact crossing tests: cum*den >= num*N is
           -- ceil(num*N/den) <= cum without any float product
           CAST(min(b) FILTER (cum * 2 >= 1 * N) AS BIGINT)
             AS p50_bucket,
           CAST(min(b) FILTER (cum * 10 >= 9 * N) AS BIGINT)
             AS p90_bucket,
           CAST(min(b) FILTER (cum * 100 >= 99 * N) AS BIGINT)
             AS p99_bucket
    FROM cum GROUP BY w_start ORDER BY w_start
    """,
    tags=("streaming", "quantiles", "monitoring", "events"),
)
def stream_quantile_monitor(spark, sf_dir):
    """STREAMING WINDOWED QUANTILE MONITOR — per tumbling day-window,
    the p50/p90/p99 of the event value as integer BUCKET-CDF crossing
    points (smallest floor(value) bucket whose cumulative count
    reaches ceil(q*N)): the latency/value-dashboard member of the
    drift family (PSI sees reshuffled mass, W1 sees moved mass, this
    sees the headline percentiles every SLO dashboard plots).

    Streaming shape (the psi/w1 convention): the additive windowed
    bucket count (streaming/windows.py::w1_binned_counts) is the ONLY
    stateful stage — counts merge across micro-batches, so the
    monitor is batching-invariant (pinned in tests/test_r11.py by
    split-and-merge); the CDF crossing runs per window partition over
    the already-aggregated grid. Unlike a partition-dependent sketch,
    bucket quantiles are EXACT integers — the streaming quantile path
    stays hash-verified end to end.

    Scale: state is |windows-in-watermark| x |buckets|; the per-window
    fold touches only the bounded bucket grid. The unbounded-accuracy
    batch sibling is agg_kll_quantile_sketch / operators.quantiles."""
    from gcp_etl_spark.streaming.windows import (
        w1_binned_counts,
        window_bucket_quantiles,
    )

    e = t(spark, sf_dir, "events")
    win = w1_binned_counts(e, watermark=None)
    return window_bucket_quantiles(
        win, {"p50_bucket": 0.50, "p90_bucket": 0.90, "p99_bucket": 0.99}
    ).orderBy("w_start")


# ------------- MATCH_RECOGNIZE-style sequence patterns (r11 extra)

_MR_PATTERN = "v+c+p"  # view+ click+ purchase — the conversion motif


@query(
    "events_match_recognize",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             string_agg(left(event_type, 1), '' ORDER BY ts) AS s
      FROM events GROUP BY user_id
    ), hits AS (
      SELECT user_id, length(s) AS seq_len,
             len(regexp_extract_all(s, '{_MR_PATTERN}')) AS n_matches
      FROM seq
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n_matches) AS BIGINT) AS total_matches,
           CAST(count(*) FILTER (n_matches > 0) AS BIGINT)
             AS users_with_match,
           round(CAST(sum(n_matches) AS DOUBLE) / count(*), 6)
             AS matches_per_user,
           CAST(max(n_matches) AS BIGINT) AS max_matches
    FROM hits
    """,
    tags=("events", "sequence", "funnel", "analytics"),
)
def events_match_recognize(spark, sf_dir):
    """MATCH_RECOGNIZE-style EVENT-SEQUENCE PATTERN COUNTING (the SQL
    standard's row-pattern matching, emulated — Spark has no
    MATCH_RECOGNIZE): each user's event history collapses to an
    ordered initial-letter string (signup/view/click/purchase/error →
    s/v/c/p/e) and the conversion motif ``{_MR_PATTERN}`` (one-or-more
    views, then clicks, then a purchase) is counted as LEFTMOST
    NON-OVERLAPPING regex matches — exactly MATCH_RECOGNIZE's
    AFTER MATCH SKIP PAST LAST ROW semantics, because both engines'
    regex engines scan leftmost-first and resume past each match.

    Exactness: per-user timestamps are unique (pinned fixture
    property), so the ordered string is deterministic; both engines
    run the same greedy regex on the same string; all outputs are
    exact integers except the 6dp mean.

    Scale: ONE hash shuffle on user_id; each user's history collapses
    to a string inside its group (bounded by per-user event count —
    the sessionize/top-paths regime); the regex runs once per user,
    JVM-side. No joins, no explode, no Python."""
    e = t(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.expr(
            "concat_ws('', transform("
            "array_sort(collect_list(struct(ts, event_type))),"
            " x -> substring(x.event_type, 1, 1)))"
        ).alias("s")
    )
    hits = seq.select(
        F.size(
            F.expr(f"regexp_extract_all(s, '{_MR_PATTERN}', 0)")
        ).alias("n_matches")
    )
    return hits.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("n_matches").cast("long").alias("total_matches"),
        F.sum(F.when(F.col("n_matches") > 0, 1).otherwise(0))
        .cast("long")
        .alias("users_with_match"),
        F.round(
            F.sum("n_matches").cast("double") / F.count("*"), 6
        ).alias("matches_per_user"),
        F.max("n_matches").cast("long").alias("max_matches"),
    )


# --------------------------- two-way ANOVA (r11 extra)


@query(
    "stats_two_way_anova",
    oracle="""
    WITH cell AS (
      SELECT o_orderpriority AS a,
             CAST(epoch_ms(o_orderdate::DATE) / 86400000 AS BIGINT) % 7
               AS b,
             CAST(round(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
    ), g AS (  -- the 5x7 cell grid: counts + exact sums
      SELECT a, b, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS s,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS ss
      FROM cell GROUP BY a, b
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n, sum(s) AS s, sum(ss) AS ss
      FROM g
    ), am AS (SELECT a, sum(n) AS n, sum(s) AS s FROM g GROUP BY a),
    bm AS (SELECT b, sum(n) AS n, sum(s) AS s FROM g GROUP BY b),
    ssq AS (
      SELECT (SELECT ss - s * s / n FROM tot) AS sst,
             (SELECT sum(s * s / n) - (SELECT s * s / n FROM tot)
              FROM am) AS ssa,
             (SELECT sum(s * s / n) - (SELECT s * s / n FROM tot)
              FROM bm) AS ssb,
             (SELECT sum(s * s / n) FROM g)
               - (SELECT sum(s * s / n) FROM am)
               - (SELECT sum(s * s / n) FROM bm)
               + (SELECT s * s / n FROM tot) AS ssab,
             (SELECT ss FROM tot) - (SELECT sum(s * s / n) FROM g)
               AS ssw,
             (SELECT n FROM tot) AS n,
             (SELECT count(*) FROM am) AS ka,
             (SELECT count(*) FROM bm) AS kb
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(ssa / sst, 6) AS eta2_priority,
           round(ssb / sst, 6) AS eta2_weekday,
           round(ssab / sst, 6) AS eta2_interaction,
           round((ssa / (ka - 1)) / (ssw / (n - ka * kb)), 6)
             AS f_priority,
           round((ssb / (kb - 1)) / (ssw / (n - ka * kb)), 6)
             AS f_weekday,
           round((ssab / ((ka - 1) * (kb - 1)))
                 / (ssw / (n - ka * kb)), 6) AS f_interaction
    FROM ssq
    """,
    tags=("stats", "anova", "hypothesis-test"),
)
def stats_two_way_anova(spark, sf_dir):
    """TWO-WAY ANOVA with interaction (unweighted cell-means sums of
    squares on the balanced-ish 5x7 grid; Fisher, public) — does
    order value depend on priority, weekday, or their INTERACTION?
    The one-way ANOVA family member every experiment readout with two
    crossed factors needs; eta^2 columns give effect sizes next to
    the F ratios.

    Exactness: y is exact cents; cell/margin/total sums are
    DECIMAL(38,0)-exact; every SS is sums-of-(s^2/n) algebra on
    identical doubles — no means materialized, no subtraction of
    near-equal rounded values; 6dp at the end.

    Scale: one hash agg to the 35-cell grid; margins and totals fold
    the GRID (never the facts); the rest is 1-row arithmetic."""
    o = t(spark, sf_dir, "orders")
    day = (
        F.unix_timestamp(F.col("o_orderdate").cast("date")) / 86400
    ).cast("long")
    cell = o.select(
        F.col("o_orderpriority").alias("a"),
        (day % 7).alias("b"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    dec0 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = cell.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec0(F.col("y"))).cast("double").alias("s"),
        F.sum(dec0(F.col("y")) * F.col("y")).cast("double").alias("ss"),
    )
    sq = lambda s, n: F.col(s) * F.col(s) / F.col(n)  # noqa: E731
    tot = g.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
    ).select("n", "ss", sq("s", "n").alias("cm"))
    am = (
        g.groupBy("a")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        .agg(
            F.sum(sq("s", "n")).alias("sa"),
            F.count("*").cast("long").alias("ka"),
        )
    )
    bm = (
        g.groupBy("b")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        .agg(
            F.sum(sq("s", "n")).alias("sb"),
            F.count("*").cast("long").alias("kb"),
        )
    )
    gm = g.agg(F.sum(sq("s", "n")).alias("sg"))
    j = (
        tot.crossJoin(F.broadcast(am))
        .crossJoin(F.broadcast(bm))
        .crossJoin(F.broadcast(gm))
    )
    ssa = F.col("sa") - F.col("cm")
    ssb = F.col("sb") - F.col("cm")
    ssab = F.col("sg") - F.col("sa") - F.col("sb") + F.col("cm")
    ssw = F.col("ss") - F.col("sg")
    sst = F.col("ss") - F.col("cm")
    dfw = F.col("n") - F.col("ka") * F.col("kb")
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.round(ssa / sst, 6).alias("eta2_priority"),
        F.round(ssb / sst, 6).alias("eta2_weekday"),
        F.round(ssab / sst, 6).alias("eta2_interaction"),
        F.round((ssa / (F.col("ka") - 1)) / (ssw / dfw), 6).alias(
            "f_priority"
        ),
        F.round((ssb / (F.col("kb") - 1)) / (ssw / dfw), 6).alias(
            "f_weekday"
        ),
        F.round(
            (ssab / ((F.col("ka") - 1) * (F.col("kb") - 1)))
            / (ssw / dfw),
            6,
        ).alias("f_interaction"),
    )


# ------------------ two-proportion power analysis (r11 extra)

# Phi^-1(0.975) and Phi^-1(0.8) as repr-exact shared literals (the
# BH-FDR pattern: quantiles computed at BUILD time, never in-engine)
_PW_Z_A = "1.9599639845400536"  # alpha = 0.05 two-sided
_PW_Z_B = "0.8416212335729144"  # power = 0.80
_PW_MDE = "0.02"                # +2pp absolute minimum detectable effect


@query(
    "stats_power_two_proportion",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority AS grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT)
               AS k
      FROM orders GROUP BY 1
    ), p AS (
      SELECT grp, n, k,
             CAST(k AS DOUBLE) / n AS p1,
             CAST(k AS DOUBLE) / n + {_PW_MDE} AS p2
      FROM base
    )
    SELECT grp, CAST(n AS BIGINT) AS n_observed,
           round(p1, 6) AS baseline_rate,
           CAST(ceil(
             pow({_PW_Z_A} * sqrt(2 * ((p1 + p2) / 2)
                                  * (1 - (p1 + p2) / 2))
                 + {_PW_Z_B} * sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2)
             / (({_PW_MDE}) * ({_PW_MDE}))) AS BIGINT)
             AS n_per_arm,
           CAST(ceil(
             pow({_PW_Z_A} * sqrt(2 * ((p1 + p2) / 2)
                                  * (1 - (p1 + p2) / 2))
                 + {_PW_Z_B} * sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2)
             / (({_PW_MDE}) * ({_PW_MDE}))) * 2 AS BIGINT)
             AS n_total
    FROM p ORDER BY grp
    """,
    tags=("stats", "experiment", "power-analysis"),
)
def stats_power_two_proportion(spark, sf_dir):
    """TWO-PROPORTION SAMPLE-SIZE / POWER TABLE (the classical normal-
    approximation formula, Fleiss, public): per order priority, the
    per-arm n needed to detect a +{_PW_MDE} absolute lift over the
    observed completion rate at alpha=0.05 (two-sided) with 80% power
    — the table every A/B experiment plan starts from, next to the
    segment's observed volume. n = (z_a sqrt(2 p-bar q-bar) +
    z_b sqrt(p1 q1 + p2 q2))^2 / (p2 - p1)^2.

    Exactness: the z quantiles are repr-exact BUILD-TIME literals
    shared verbatim by both engines (the stats_bh_fdr rule — no
    in-engine inverse-normal anywhere); p1 divides exact BIGINTs, so
    the whole formula is the same IEEE tree; ceil() of that identical
    double is identical. 6dp on the rate only.

    Scale: one grouped count over the facts; the formula runs on the
    5-row group dim."""
    o = t(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("k"),
    )
    p1 = F.col("k").cast("double") / F.col("n")
    p2 = p1 + float(_PW_MDE)
    pbar = (p1 + p2) / 2
    za, zb, mde = float(_PW_Z_A), float(_PW_Z_B), float(_PW_MDE)
    num = F.pow(
        za * F.sqrt(2 * pbar * (1 - pbar))
        + zb * F.sqrt(p1 * (1 - p1) + p2 * (1 - p2)),
        F.lit(2),
    )
    n_arm = F.ceil(num / (mde * mde)).cast("long")
    return base.select(
        "grp",
        F.col("n").cast("long").alias("n_observed"),
        F.round(p1, 6).alias("baseline_rate"),
        n_arm.alias("n_per_arm"),
        (n_arm * 2).cast("long").alias("n_total"),
    ).orderBy("grp")


# ---------------------- geometric adstock carryover (r11 extra)

_AD_LAMBDA = "0.7"  # daily carryover decay, shared literal


@query(
    "analytics_adstock_carryover",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT CAST(epoch_ms(o_orderdate::DATE) / 86400000 AS BIGINT)
               AS x,
             CAST(count(*) AS BIGINT) AS imp,
             CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), arrs AS (
      SELECT count(*) AS m,
             list(imp ORDER BY x) AS xs,
             list(rev ORDER BY x) AS ys
      FROM d
    ), ad AS (
      SELECT 1 AS i, CAST(xs[1] AS DOUBLE) AS a, m, xs, ys FROM arrs
      UNION ALL
      SELECT i + 1,
             CAST(xs[i + 1] AS DOUBLE) + {_AD_LAMBDA} * a,
             m, xs, ys
      FROM ad WHERE i + 1 <= m
    ), pairs AS (  -- adstock_t vs NEXT-day revenue
      SELECT a AS u, CAST(ys[i + 1] AS DOUBLE) AS v FROM ad WHERE i < m
    ), mm AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(u AS DECIMAL(38,9))) AS DOUBLE) AS su,
             CAST(sum(CAST(v AS DECIMAL(38,9))) AS DOUBLE) AS sv,
             CAST(sum(CAST(u * v AS DECIMAL(38,9))) AS DOUBLE) AS suv,
             CAST(sum(CAST(u * u AS DECIMAL(38,9))) AS DOUBLE) AS suu,
             CAST(sum(CAST(v * v AS DECIMAL(38,9))) AS DOUBLE) AS svv
      FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round((SELECT a FROM ad WHERE i = m), 6) AS final_adstock,
           round((suv - su * sv / n)
                 / (sqrt(suu - su * su / n) * sqrt(svv - sv * sv / n)),
                 6) AS corr_adstock_nextday_rev
    FROM mm
    """,
    tags=("analytics", "marketing", "time-series"),
)
def analytics_adstock_carryover(spark, sf_dir):
    """GEOMETRIC ADSTOCK carryover (the marketing-mix-model transform,
    Broadbent's adstock, public): adstock_t = imp_t + {_AD_LAMBDA} *
    adstock_(t-1) over the daily order-count series — exposure decays
    but accumulates — then the Pearson correlation of the adstocked
    series with NEXT-day revenue, the basic carryover-effect readout
    an MMM starts from.

    Exactness (the Croston/Holt-Winters fold contract): exact BIGINT
    daily inputs; Spark runs the recurrence as ONE F.aggregate fold
    with an array accumulator over the sorted array, the oracle
    replays it as a recursive CTE — identical IEEE steps, so every
    adstock value is bit-identical; the correlation moments are
    per-term DECIMAL(38,9)-cast (adstock <= imp/(1-lambda), so
    products stay well inside the cap). 6dp at the end.

    Scale: facts collapse to the calendar-bounded daily relation; the
    fold is O(|days|) on one row; moments are one agg over |days|-1
    exploded pairs."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(
        (
            (
                F.unix_timestamp(F.col("o_orderdate").cast("date"))
                / 86400
            ).cast("long")
        ).alias("x")
    ).agg(
        F.count("*").cast("long").alias("imp"),
        F.sum(F.round(F.col("o_totalprice") * 100))
        .cast("long")
        .alias("rev"),
    )
    arrs = d.agg(
        F.count("*").cast("int").alias("m"),
        F.expr(
            "transform(array_sort(collect_list(struct(x, imp))),"
            " e -> e.imp)"
        ).alias("xs"),
        F.expr(
            "transform(array_sort(collect_list(struct(x, rev))),"
            " e -> e.rev)"
        ).alias("ys"),
    )
    lam = _AD_LAMBDA
    ad = arrs.select(
        "m",
        "ys",
        F.expr(
            f"""aggregate(slice(xs, 2, m - 1),
              array(CAST(element_at(xs, 1) AS DOUBLE)),
              (acc, e) -> concat(acc,
                array(CAST(e AS DOUBLE)
                      + {lam}D * element_at(acc, -1))))"""
        ).alias("a"),
    )
    pairs = ad.select(
        F.explode(
            F.expr(
                """transform(sequence(1, m - 1), i ->
                     struct(element_at(a, i) AS u,
                            CAST(element_at(ys, i + 1) AS DOUBLE)
                              AS v))"""
            )
        ).alias("p"),
        F.expr("element_at(a, -1)").alias("fin"),
    ).select(F.col("p.u").alias("u"), F.col("p.v").alias("v"), "fin")
    dec9 = lambda c: c.cast("decimal(38,9)")  # noqa: E731
    mm = pairs.agg(
        F.count("*").cast("long").alias("n"),
        F.max("fin").alias("fin"),
        F.sum(dec9(F.col("u"))).cast("double").alias("su"),
        F.sum(dec9(F.col("v"))).cast("double").alias("sv"),
        F.sum(dec9(F.col("u") * F.col("v"))).cast("double").alias("suv"),
        F.sum(dec9(F.col("u") * F.col("u"))).cast("double").alias("suu"),
        F.sum(dec9(F.col("v") * F.col("v"))).cast("double").alias("svv"),
    )
    n = F.col("n")
    return mm.select(
        n.cast("long").alias("n_days"),
        F.round("fin", 6).alias("final_adstock"),
        F.round(
            (F.col("suv") - F.col("su") * F.col("sv") / n)
            / (
                F.sqrt(F.col("suu") - F.col("su") * F.col("su") / n)
                * F.sqrt(F.col("svv") - F.col("sv") * F.col("sv") / n)
            ),
            6,
        ).alias("corr_adstock_nextday_rev"),
    )


# ------------------- Shapley channel attribution (r11 extra)


def _shap_sql(i: str, j: str, k: str) -> str:
    """3-player Shapley value for channel ``i`` from the subset-rate
    columns r_, r_c.., named r_<sorted subset letters> — shared
    VERBATIM by both engines."""
    s = lambda *cs: "r_" + "".join(sorted(cs))  # noqa: E731
    return (
        f"((1.0 / 3) * ({s(i)} - r_) "
        f"+ (1.0 / 6) * ({s(i, j)} - {s(j)}) "
        f"+ (1.0 / 6) * ({s(i, k)} - {s(k)}) "
        f"+ (1.0 / 3) * ({s(i, j, k)} - {s(j, k)}))"
    )


@query(
    "analytics_shapley_attribution",
    oracle=f"""
    WITH firstp AS (
      SELECT user_id, min(ts) AS pts FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ), exposure AS (
      SELECT e.user_id,
             CASE WHEN f.user_id IS NOT NULL THEN 1 ELSE 0 END AS conv,
             string_agg(DISTINCT left(e.event_type, 1), ''
                        ORDER BY left(e.event_type, 1)) AS sub
      FROM events e
      LEFT JOIN firstp f ON f.user_id = e.user_id
      WHERE e.event_type IN ('click', 'signup', 'view')
        AND (f.user_id IS NULL OR e.ts < f.pts)
      GROUP BY e.user_id, CASE WHEN f.user_id IS NOT NULL
                               THEN 1 ELSE 0 END
    ), rates AS (
      SELECT sub, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(conv) AS DOUBLE) / count(*) AS r
      FROM exposure GROUP BY sub
    ), wide AS (
      SELECT coalesce(max(CASE WHEN sub = '' THEN r END), 0.0) AS r_,
             coalesce(max(CASE WHEN sub = 'c' THEN r END), 0.0) AS r_c,
             coalesce(max(CASE WHEN sub = 's' THEN r END), 0.0) AS r_s,
             coalesce(max(CASE WHEN sub = 'v' THEN r END), 0.0) AS r_v,
             coalesce(max(CASE WHEN sub = 'cs' THEN r END), 0.0)
               AS r_cs,
             coalesce(max(CASE WHEN sub = 'cv' THEN r END), 0.0)
               AS r_cv,
             coalesce(max(CASE WHEN sub = 'sv' THEN r END), 0.0)
               AS r_sv,
             coalesce(max(CASE WHEN sub = 'csv' THEN r END), 0.0)
               AS r_csv
      FROM rates
    )
    SELECT channel, round(shapley, 6) AS shapley
    FROM (
      SELECT 'click' AS channel, {_shap_sql('c', 's', 'v')} AS shapley
        FROM wide
      UNION ALL
      SELECT 'signup', {_shap_sql('s', 'c', 'v')} FROM wide
      UNION ALL
      SELECT 'view', {_shap_sql('v', 'c', 's')} FROM wide
    ) ORDER BY channel
    """,
    tags=("analytics", "attribution", "events", "marketing"),
)
def analytics_shapley_attribution(spark, sf_dir):
    """SHAPLEY-VALUE CHANNEL ATTRIBUTION (Shapley 1953; the
    data-driven attribution model, public): the characteristic
    function v(S) is the CONVERSION RATE of users whose pre-purchase
    exposure set is exactly S ⊆ {{click, signup, view}}; each
    channel's Shapley value averages its marginal contribution over
    all orderings — the fairness-axiom alternative to last-touch
    (analytics_multitouch_attribution's rule-based models). 3-player
    closed form with weights 1/3, 1/6 as shared expressions.

    Exactness: exposure sets are exact (events strictly before the
    user's first purchase); subset rates divide exact BIGINTs; the
    Shapley combination is one shared expression tree evaluated on
    the 8-subset wide row — identical IEEE on both engines; 6dp.

    Scale: one hash shuffle on user_id builds exposure sets
    (per-user state = 3 booleans); rates collapse to <= 8 rows;
    everything after is constant-size. The 2^k subset grid caps k —
    the documented regime is few marketing channels (k <= ~10), not
    arbitrary sets."""
    e = t(spark, sf_dir, "events")
    firstp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    exposure = (
        e.filter(F.col("event_type").isin("click", "signup", "view"))
        .join(firstp, "user_id", "left")
        .filter(F.col("pts").isNull() | (F.col("ts") < F.col("pts")))
        .groupBy(
            "user_id",
            F.when(F.col("pts").isNotNull(), 1).otherwise(0).alias(
                "conv"
            ),
        )
        .agg(
            F.expr(
                "concat_ws('', array_sort(collect_set("
                "substring(event_type, 1, 1))))"
            ).alias("sub")
        )
    )
    rates = exposure.groupBy("sub").agg(
        (F.sum("conv").cast("double") / F.count("*")).alias("r")
    )
    wide = rates.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("sub") == sub, F.col("r"))),
                F.lit(0.0),
            ).alias(f"r_{sub}")
            for sub in ("", "c", "s", "v", "cs", "cv", "sv", "csv")
        ]
    )
    rows = None
    for ch, args in (
        ("click", ("c", "s", "v")),
        ("signup", ("s", "c", "v")),
        ("view", ("v", "c", "s")),
    ):
        one = wide.select(
            F.lit(ch).alias("channel"),
            F.round(F.expr(_shap_sql(*args)), 6).alias("shapley"),
        )
        rows = one if rows is None else rows.unionByName(one)
    return rows.orderBy("channel")


# ---------------- expected calibration error (r11 extra)

_ECE_BINS = 10


@query(
    "eval_calibration_ece",
    oracle=f"""
    WITH scored AS (
      SELECT ((event_id * 2654435761) % 1000) / 1000.0 AS p,
             CASE WHEN value * (1 + ((event_id * 2654435761) % 1000)
                               / 1000.0) > 60 THEN 1 ELSE 0 END AS y
      FROM events
    ), binned AS (
      SELECT least(CAST(floor(p * {_ECE_BINS}) AS BIGINT),
                   {_ECE_BINS - 1}) AS g, p, y
      FROM scored
    ), per AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(p AS DECIMAL(38,12))) AS DOUBLE) AS sp,
             CAST(sum(y) AS BIGINT) AS sy
      FROM binned GROUP BY g
    ), tot AS (SELECT sum(n) AS nn FROM per)
    SELECT CAST(nn AS BIGINT) AS n,
           round(CAST(sum(CAST(
                   abs(CAST(sy AS DOUBLE) / n - sp / n) * n
                   AS DECIMAL(38,12))) AS DOUBLE) / nn, 6) AS ece,
           round(max(abs(CAST(sy AS DOUBLE) / n - sp / n)), 6) AS mce
    FROM per CROSS JOIN tot
    GROUP BY nn
    """,
    tags=("eval", "calibration", "ml"),
)
def eval_calibration_ece(spark, sf_dir):
    """EXPECTED + MAXIMUM CALIBRATION ERROR (ECE/MCE, Naeini et al.
    2015 / Guo et al. 2017, public) — the calibration headline every
    modern model card quotes: over {_ECE_BINS} confidence bins,
    ECE = sum_g (n_g/N) |acc_g - conf_g| and MCE = max_g of the same
    gap. Completes the calibration family (Brier decomposition =
    the proper-score view, Hosmer-Lemeshow = the test view, this =
    the reported-metric view) on the SAME exact-rational Knuth-hash
    forecasts, so all three are mutually consistent.

    Exactness: accuracies divide exact BIGINTs; confidences divide a
    DECIMAL(38,12)-exact rational sum; each bin's weighted gap is
    DECIMAL-cast before the 10-term sum; 6dp.

    Scale: one hash agg to the bin grid; constant-size arithmetic."""
    e = t(spark, sf_dir, "events")
    p = ((F.col("event_id") * 2654435761) % 1000) / 1000.0
    scored = e.select(
        p.alias("p"),
        F.when(F.col("value") * (1 + p) > 60, 1).otherwise(0).alias("y"),
    )
    per = (
        scored.select(
            F.least(
                F.floor(F.col("p") * _ECE_BINS).cast("long"),
                F.lit(_ECE_BINS - 1),
            ).alias("g"),
            "p",
            "y",
        )
        .groupBy("g")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("p").cast("decimal(38,12)"))
            .cast("double")
            .alias("sp"),
            F.sum("y").cast("long").alias("sy"),
        )
    )
    gap = F.abs(
        F.col("sy").cast("double") / F.col("n")
        - F.col("sp") / F.col("n")
    )
    return per.agg(
        F.sum("n").cast("long").alias("n"),
        F.round(
            F.sum((gap * F.col("n")).cast("decimal(38,12)")).cast(
                "double"
            )
            / F.sum("n"),
            6,
        ).alias("ece"),
        F.round(F.max(gap), 6).alias("mce"),
    )


# ------------- negative-binomial overdispersion fit (r11 extra)


@query(
    "stats_negative_binomial_fit",
    oracle="""
    WITH d AS (
      SELECT CAST(count(*) AS BIGINT) AS y
      FROM orders
      GROUP BY CAST(epoch_ms(o_orderdate::DATE) / 86400000 AS BIGINT)
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS s,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS ss
      FROM d
    ), mv AS (
      SELECT n, s / n AS mu,
             (ss - s * s / n) / (n - 1) AS var
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(mu, 6) AS mean_daily,
           round(var, 6) AS var_daily,
           round(var / mu, 6) AS dispersion_index,
           round(CASE WHEN var > mu THEN mu * mu / (var - mu)
                      ELSE NULL END, 6) AS nb_r,
           round(CASE WHEN var > mu THEN mu / var
                      ELSE NULL END, 6) AS nb_p
    FROM mv
    """,
    tags=("stats", "count-model", "time-series"),
)
def stats_negative_binomial_fit(spark, sf_dir):
    """NEGATIVE-BINOMIAL METHOD-OF-MOMENTS FIT for the daily order
    count (the standard overdispersed-count model, public): a Poisson
    assumption demands var == mean; the dispersion index var/mu says
    how wrong that is, and when var > mu the NB(r, p) moment match is
    r = mu^2/(var - mu), p = mu/var — the parameters a demand model /
    anomaly threshold is built from. NULL r/p when the data is UNDER-
    dispersed (NB does not exist there; the NULL is the answer).

    Exactness: counts are exact; the two moments sum in
    DECIMAL(38,0); mean/variance/r/p are identical IEEE trees, 6dp.

    Scale: one count-per-day hash agg, one moment agg, 1-row math."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(
        (
            (
                F.unix_timestamp(F.col("o_orderdate").cast("date"))
                / 86400
            ).cast("long")
        ).alias("day")
    ).agg(F.count("*").cast("long").alias("y"))
    dec0 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec0(F.col("y"))).cast("double").alias("s"),
        F.sum(dec0(F.col("y")) * F.col("y")).cast("double").alias("ss"),
    )
    mu = F.col("s") / F.col("n")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(mu, 6).alias("mean_daily"),
        F.round(var, 6).alias("var_daily"),
        F.round(var / mu, 6).alias("dispersion_index"),
        F.round(
            F.when(var > mu, mu * mu / (var - mu)), 6
        ).alias("nb_r"),
        F.round(F.when(var > mu, mu / var), 6).alias("nb_p"),
    )


# ---------------- Kendall's W judge concordance (r11 extra)


@query(
    "stats_kendalls_w",
    oracle="""
    WITH cell AS (
      SELECT r.r_name AS judge, p.p_partkey % 10 AS item,
             CAST(sum(round(l.l_extendedprice * 100)) AS BIGINT)
               AS cents
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT judge, item,
             row_number() OVER (PARTITION BY judge
                                ORDER BY cents DESC, item) AS rk
      FROM cell
    ), sums AS (
      SELECT item, CAST(sum(rk) AS BIGINT) AS ri,
             (SELECT count(DISTINCT judge) FROM ranked) AS k,
             (SELECT count(DISTINCT item) FROM ranked) AS n
      FROM ranked GROUP BY item
    ), s AS (
      SELECT max(k) AS k, max(n) AS n,
             CAST(sum((2 * ri - k * (n + 1))
                      * (2 * ri - k * (n + 1))) AS BIGINT) AS s4
      FROM sums
    )
    SELECT CAST(k AS BIGINT) AS n_judges, CAST(n AS BIGINT) AS n_items,
           round(3.0 * s4 / (k * k * (CAST(n AS DOUBLE) * n * n - n)),
                 6) AS kendalls_w
    FROM s
    """,
    tags=("stats", "agreement", "ranking"),
)
def stats_kendalls_w(spark, sf_dir):
    """KENDALL'S COEFFICIENT OF CONCORDANCE W (Kendall & Babington
    Smith 1939, public) — agreement among k independent RANKERS of
    the same n items, the statistic an LLM-judge ensemble or a panel
    of quality raters is audited with: each region 'judge' ranks the
    10 part buckets by revenue; W = 12 S / (k^2 (n^3 - n)) with S the
    variance of rank sums around k(n+1)/2. W = 1 means identical
    rankings, W = 0 no agreement.

    Exactness: ranks are exact integers (deterministic cents-desc,
    item tiebreak); S is computed on 4S = sum (2 R_i - k(n+1))^2 —
    ALL-INTEGER (doubling clears the k(n+1)/2 half-integer), so the
    only FP op is the final division, identical both engines. 6dp.

    Scale: facts collapse to the k x n grid in one agg; ranking
    windows run over n-row judge groups (group dim); the rest is
    constant-size."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    n_ = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    from pyspark.sql import Window as W

    cell = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n_, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("judge"),
            (F.col("p_partkey") % 10).alias("item"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100))
            .cast("long")
            .alias("cents")
        )
    )
    ranked = cell.select(
        "judge",
        "item",
        F.row_number()
        .over(
            W.partitionBy("judge").orderBy(
                F.col("cents").desc(), F.col("item")
            )
        )
        .alias("rk"),
    )
    kn = ranked.agg(
        F.countDistinct("judge").alias("k"),
        F.countDistinct("item").alias("n"),
    )
    sums = (
        ranked.groupBy("item")
        .agg(F.sum("rk").cast("long").alias("ri"))
        .crossJoin(F.broadcast(kn))
    )
    dev = 2 * F.col("ri") - F.col("k") * (F.col("n") + 1)
    agg = sums.agg(
        F.max("k").alias("k"),
        F.max("n").alias("n"),
        F.sum(dev * dev).cast("long").alias("s4"),
    )
    return agg.select(
        F.col("k").cast("long").alias("n_judges"),
        F.col("n").cast("long").alias("n_items"),
        F.round(
            3.0
            * F.col("s4")
            / (
                F.col("k")
                * F.col("k")
                * (
                    F.col("n").cast("double") * F.col("n") * F.col("n")
                    - F.col("n")
                )
            ),
            6,
        ).alias("kendalls_w"),
    )


# -------------- matched-pairs promo uplift (asof-on-value) (r11 extra)


@query(
    "analytics_uplift_matched_pairs",
    oracle="""
    WITH tr AS (  -- "treated": discounted line items
      SELECT l_partkey % 40 AS bucket,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
             CAST(l_quantity AS BIGINT) AS qty,
             l_orderkey * 10 + l_linenumber AS rid
      FROM lineitem WHERE l_discount >= 0.05
    ), co AS (   -- control pool: undiscounted, ONE row per
                 -- (bucket, price) with min-qty tiebreak so the
                 -- at-price match is deterministic in both engines
      SELECT l_partkey % 40 AS bucket,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
             CAST(min(l_quantity) AS BIGINT) AS qty
      FROM lineitem WHERE l_discount = 0
      GROUP BY 1, 2
    ), m AS (    -- nearest control at-or-below the treated price
      SELECT tr.bucket, tr.qty AS t_qty, co.qty AS c_qty,
             tr.price - co.price AS gap
      FROM tr ASOF LEFT JOIN co
        ON tr.bucket = co.bucket AND co.price <= tr.price
    )
    SELECT CAST(count(*) AS BIGINT) AS n_treated,
           CAST(count(*) FILTER (c_qty IS NOT NULL) AS BIGINT)
             AS n_matched,
           round(CAST(sum(CAST(t_qty - c_qty AS DECIMAL(38,0)))
                      FILTER (c_qty IS NOT NULL) AS DOUBLE)
                 / count(*) FILTER (c_qty IS NOT NULL), 6)
             AS att_qty_uplift,
           round(CAST(sum(CAST(gap AS DECIMAL(38,0)))
                      FILTER (c_qty IS NOT NULL) AS DOUBLE)
                 / count(*) FILTER (c_qty IS NOT NULL) / 100.0, 6)
             AS avg_match_gap_dollars
    FROM m
    """,
    tags=("analytics", "causal", "matching", "joins"),
)
def analytics_uplift_matched_pairs(spark, sf_dir):
    """MATCHED-PAIRS UPLIFT (nearest-neighbor matching on a
    continuous covariate — the observational-causal ATT estimator,
    Rubin matching, public): every DISCOUNTED line item (treated) is
    matched to the nearest UNDISCOUNTED item (control) in its part
    bucket with price at-or-below its own, and the average treated-
    minus-control quantity gap estimates the discount's uplift on
    quantity, price-confounding removed by the match.

    The matching is an AS-OF JOIN ON THE VALUE AXIS — the same
    union-tag per-group ordered window as join_asof_tolerance, but
    ordered by PRICE instead of time (one algorithm, two axes); ties
    on price resolve to the control row (tag order), matching
    DuckDB's native ASOF `<=` semantics. A treated item cheaper than
    every control stays unmatched (counted, excluded from the ATT —
    the standard common-support rule). Controls collapse to ONE row
    per (bucket, price) with a min-quantity tiebreak BEFORE matching,
    so equal-price control ties cannot make the match
    engine-dependent.

    Exactness: prices/quantities exact integers; per-match gaps sum
    in DECIMAL(38,0); the two means divide exact integers. 6dp.

    Scale: one hash shuffle on (bucket), one ordered window per
    bucket carrying a single (price, qty) of state — never a range
    join, never an explode; the oracle's native ASOF proves the
    semantics."""
    from pyspark.sql import Window as W

    li = t(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_partkey") % 40).alias("bucket"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("price"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.col("l_discount").alias("disc"),
    )
    treated = base.filter(F.col("disc") >= 0.05).select(
        "bucket",
        "price",
        "qty",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("c_qty_raw"),
        F.lit(None).cast("long").alias("c_price_raw"),
    )
    # one control row per (bucket, price), min-qty tiebreak — makes
    # the at-price match deterministic (several raw controls can
    # share a price with different quantities)
    controls = (
        base.filter(F.col("disc") == 0)
        .groupBy("bucket", "price")
        .agg(F.min("qty").alias("qty"))
        .select(
            "bucket",
            "price",
            "qty",
            F.lit(0).alias("tag"),  # controls sort BEFORE treated ties
            F.col("qty").alias("c_qty_raw"),
            F.col("price").alias("c_price_raw"),
        )
    )
    tagged = treated.unionByName(controls)
    w = (
        W.partitionBy("bucket")
        .orderBy(F.col("price"), F.col("tag"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    m = (
        tagged.select(
            "bucket",
            "price",
            "qty",
            "tag",
            F.last("c_qty_raw", ignorenulls=True).over(w).alias("c_qty"),
            F.last("c_price_raw", ignorenulls=True)
            .over(w)
            .alias("c_price"),
        )
        .filter(F.col("tag") == 1)
    )
    matched = F.col("c_qty").isNotNull()
    dec0 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return m.agg(
        F.count("*").cast("long").alias("n_treated"),
        F.sum(F.when(matched, 1).otherwise(0))
        .cast("long")
        .alias("n_matched"),
        F.round(
            F.sum(F.when(matched, dec0(F.col("qty") - F.col("c_qty"))))
            .cast("double")
            / F.sum(F.when(matched, 1)),
            6,
        ).alias("att_qty_uplift"),
        F.round(
            F.sum(
                F.when(matched, dec0(F.col("price") - F.col("c_price")))
            ).cast("double")
            / F.sum(F.when(matched, 1))
            / 100.0,
            6,
        ).alias("avg_match_gap_dollars"),
    )


# ------------- fixed-effect meta-analysis of correlations (r11 extra)


@query(
    "stats_meta_fixed_effect",
    oracle="""
    WITH v AS (
      SELECT l_suppkey % 25 AS g,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ), m AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
      FROM v GROUP BY g HAVING count(*) >= 4
    ), rz AS (
      SELECT g, n,
             CAST(CAST(0.5 * ln((1 + r) / (1 - r)) AS DECIMAL(38,12))
                  AS DOUBLE) AS z,
             n - 3 AS w
      FROM (
        SELECT g, n,
               (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx)
                                  * sqrt(n*syy - sy*sy)) AS r
        FROM m)
    ), pool AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(w * z AS DECIMAL(38,12))) AS DOUBLE) AS swz,
             CAST(sum(CAST(w AS DECIMAL(38,0))) AS DOUBLE) AS sw,
             CAST(sum(CAST(w * z * z AS DECIMAL(38,12))) AS DOUBLE)
               AS swzz
      FROM rz
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           round((exp(2 * swz / sw) - 1)
                 / (exp(2 * swz / sw) + 1), 6) AS pooled_r,
           round(swzz - swz * swz / sw, 6) AS cochran_q,
           round(greatest(0.0, 1.0 - (k - 1)
                                / (swzz - swz * swz / sw)), 6)
             AS i_squared
    FROM pool
    """,
    tags=("stats", "meta-analysis", "correlation"),
)
def stats_meta_fixed_effect(spark, sf_dir):
    """FIXED-EFFECT META-ANALYSIS of per-segment correlations
    (Fisher-z pooling + Cochran's Q heterogeneity + Higgins' I^2,
    public): each supplier segment contributes r(quantity, price)
    transformed to z = atanh(r) with weight n-3 (the inverse of
    var(z)); the pooled z back-transforms to the combined r, Q =
    sum w (z - z-bar)^2 tests whether segments share one effect, and
    I^2 = 1 - (k-1)/Q is the share of variance from real
    heterogeneity — the meta-analytic layer over any per-segment
    statistic battery.

    Exactness: per-group moments are DECIMAL(38,0)-exact; each
    atanh(r) (as 0.5 ln((1+r)/(1-r)) — identical tree) is
    DECIMAL(38,12)-cast to absorb libm ulps (the theil_index rule);
    weighted sums are per-term DECIMAL-cast; the back-transform
    tanh runs as the exp identity on identical doubles. 6dp.

    Scale: one grouped moment agg over the facts (25 groups), then
    group-dim arithmetic."""
    li = t(spark, sf_dir, "lineitem")
    v = li.select(
        (F.col("l_suppkey") % 25).alias("g"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    dec0 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = (
        v.groupBy("g")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(dec0(F.col("x"))).cast("double").alias("sx"),
            F.sum(dec0(F.col("y"))).cast("double").alias("sy"),
            F.sum(dec0(F.col("x")) * F.col("y"))
            .cast("double")
            .alias("sxy"),
            F.sum(dec0(F.col("x")) * F.col("x"))
            .cast("double")
            .alias("sxx"),
            F.sum(dec0(F.col("y")) * F.col("y"))
            .cast("double")
            .alias("syy"),
        )
        .filter(F.col("n") >= 4)
    )
    n = F.col("n")
    r = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    rz = m.select(
        "n",
        (0.5 * F.log((1 + r) / (1 - r)))
        .cast("decimal(38,12)")
        .cast("double")
        .alias("z"),
        (n - 3).alias("w"),
    )
    dec12 = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    pool = rz.agg(
        F.count("*").cast("long").alias("k"),
        F.sum(dec12(F.col("w") * F.col("z"))).cast("double").alias("swz"),
        F.sum(dec0(F.col("w"))).cast("double").alias("sw"),
        F.sum(dec12(F.col("w") * F.col("z") * F.col("z")))
        .cast("double")
        .alias("swzz"),
    )
    zbar2 = 2 * F.col("swz") / F.col("sw")
    q = F.col("swzz") - F.col("swz") * F.col("swz") / F.col("sw")
    return pool.select(
        F.col("k").cast("long").alias("k_groups"),
        F.round(
            (F.exp(zbar2) - 1) / (F.exp(zbar2) + 1), 6
        ).alias("pooled_r"),
        F.round(q, 6).alias("cochran_q"),
        F.round(
            F.greatest(F.lit(0.0), 1.0 - (F.col("k") - 1) / q), 6
        ).alias("i_squared"),
    )


# -------------- length-bucket batching waste curve (r11 extra)

_LB_BATCH = 16          # sequences per batch
_LB_BUCKETS = (1, 8, 64)  # bucketing policies swept


@query(
    "prep_length_bucket_batching",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS len FROM documents
    ), pol AS (
      SELECT unnest([{', '.join(str(b) for b in _LB_BUCKETS)}])
        AS n_buckets
    ), bucketed AS (
      SELECT p.n_buckets, d.len,
             ntile(p.n_buckets) OVER (PARTITION BY p.n_buckets
                                      ORDER BY d.len, d.doc_id) AS bkt,
             row_number() OVER (PARTITION BY p.n_buckets
                                ORDER BY d.len, d.doc_id) AS rn
      FROM docs d CROSS JOIN pol p
    ), batched AS (
      -- batch on the PER-BUCKET rank (native row_number inside the
      -- bucket — independent of the Spark side's closed-form offset),
      -- so no batch straddles a bucket boundary
      SELECT n_buckets, bkt,
             (row_number() OVER (PARTITION BY n_buckets, bkt
                                 ORDER BY rn) - 1)
               // {_LB_BATCH} AS batch, len
      FROM bucketed
    ), per_batch AS (
      SELECT n_buckets, bkt, batch,
             CAST(count(*) AS BIGINT) AS bsz,
             CAST(max(len) AS BIGINT) AS mx,
             CAST(sum(len) AS BIGINT) AS s
      FROM batched GROUP BY 1, 2, 3
    )
    SELECT n_buckets,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(bsz * mx) AS BIGINT) AS padded_tokens,
           CAST(sum(s) AS BIGINT) AS real_tokens,
           round(1.0 - CAST(sum(s) AS DOUBLE) / sum(bsz * mx), 6)
             AS padding_waste
    FROM per_batch GROUP BY n_buckets ORDER BY n_buckets
    """,
    tags=("llm", "prep", "batching", "packing"),
)
def prep_length_bucket_batching(spark, sf_dir):
    """LENGTH-BUCKET BATCHING WASTE CURVE — the policy sweep behind
    every training dataloader's bucketing knob: sequences are grouped
    into {_LB_BUCKETS} length buckets (ntile over the global length
    order), batched {_LB_BATCH} at a time within each bucket, and
    each batch pads to its own max length; padding waste =
    1 - real/padded. One bucket = naive global batching (worst); more
    buckets = tighter batches (the dynamic-batching limit). The curve
    prices the knob next to the sequence-PACKING alternative
    (pack_sequences_budget / pack_padding_waste — packing eliminates
    padding by concatenation, bucketing merely reduces it; a team
    picks by whether their attention kernel allows packing).

    Exactness: ntile/row_number over deterministic (len, doc_id)
    order; all token counts exact BIGINTs; one division. Batch ids
    come from the PER-BUCKET rank (r11 ADVICE: the old global-rank
    formula let a 16-row chunk straddle a bucket boundary, splitting
    it into two partial batches and mispricing the curve) — Spark
    derives it closed-form from the ntile algebra (rank minus the
    bucket's start offset), the oracle from a native row_number inside
    the bucket, so the two derivations stay independent. Assumes
    N >= max(buckets) (documents is never that small; the closed form
    still guards its divisor so an N < buckets corner nulls rather
    than divides by zero).

    Scale: the global rank is WIRED through
    operators.global_row_number's two-pass range-partitioned shape
    (no single-partition WindowExec anywhere — the conformal-family
    lesson), materialized once and shared by all three policy grid
    points; bucket ids come from the closed-form ntile of (rank, N).
    Only the (len, rank) projection replicates per policy — lengths,
    never text."""
    from gcp_etl_spark.operators.quantiles import global_row_number

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("len")
    )
    # GLOBAL rank via the two-pass range-partitioned primitive (never
    # a single-partition WindowExec over the corpus — the conformal
    # lesson), materialized once for all three policy grid points;
    # ntile is then the CLOSED FORM of (rank, N): the first N%b
    # buckets take ceil(N/b) rows, the rest floor(N/b) — identical to
    # both engines' native ntile definition (oracle keeps native
    # ntile as the independent check).
    ranked = global_row_number(d, ["len", "doc_id"], rn_col="rn")
    ranked = ranked.transform(barrier)
    ncnt = ranked.agg(F.count("*").alias("N"))
    out = None
    for b in _LB_BUCKETS:
        q = F.floor(F.col("N") / b).cast("long")
        r = (F.col("N") % b).cast("long")
        big = r * (q + 1)  # rows covered by the size-(q+1) buckets
        bucketed = ranked.crossJoin(F.broadcast(ncnt)).select(
            "len",
            "rn",
            "N",  # start-offset below still needs N via q/r/big
            F.when(
                F.col("rn") <= big,
                F.ceil(F.col("rn") / (q + 1)),
            )
            .otherwise(
                # greatest() guards the N < b corner (q = 0): that
                # branch is never TAKEN there (big = N covers all
                # rows) but the divisor must still be nonzero
                r + F.ceil((F.col("rn") - big) / F.greatest(q, F.lit(1)))
            )
            .cast("int")
            .alias("bkt"),
        )
        # per-bucket rank = rn - (bucket start offset), closed-form
        # from the same ntile algebra: bucket i starts at (i-1)(q+1)
        # for the first r buckets, r(q+1) + (i-1-r)q after
        start = F.when(
            F.col("bkt") <= r,
            (F.col("bkt") - 1) * (q + 1),
        ).otherwise(big + (F.col("bkt") - 1 - r) * q)
        per_batch = (
            bucketed.select(
                "len",
                "bkt",
                ((F.col("rn") - start - 1) / _LB_BATCH)
                .cast("long")
                .alias("batch"),
            )
            .groupBy("bkt", "batch")
            .agg(
                F.count("*").cast("long").alias("bsz"),
                F.max("len").alias("mx"),
                F.sum("len").alias("s"),
            )
        )
        rel = per_batch.agg(
            F.lit(b).cast("int").alias("n_buckets"),
            F.count("*").cast("long").alias("n_batches"),
            F.sum(F.col("bsz") * F.col("mx"))
            .cast("long")
            .alias("padded_tokens"),
            F.sum("s").cast("long").alias("real_tokens"),
            F.round(
                1.0
                - F.sum("s").cast("double")
                / F.sum(F.col("bsz") * F.col("mx")),
                6,
            ).alias("padding_waste"),
        )
        out = rel if out is None else out.unionByName(rel)
    return out.orderBy("n_buckets")
