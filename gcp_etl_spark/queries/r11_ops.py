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
    from gcp_etl_spark.llm.ivf import cosine_topk_ivf, ivf_assign
    from gcp_etl_spark.llm.similarity import cosine_topk

    emb = t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _RF_NQ)
    exact = cosine_topk(emb, probes, k=_RF_K).select(
        "q_id", F.col("n_id").alias("x_id")
    )
    n_pairs = float(_RF_K * _RF_NQ)
    out = None
    for r in _RF_GRID:
        assigned, centers = ivf_assign(
            emb, "vec_id", "embedding", n_centroids=8, refine_iters=r
        )
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
