"""Statistical inference & robust-estimation operators (round-4 batch).

Classic analyst/DS statistics re-expressed as distributed DataFrame
plans, each with a full DuckDB oracle. The recurring scale shape:
reduce the fact table to a CALENDAR-BOUNDED daily aggregate first
(days don't grow with corpus size — at 100 TB the daily relation is
the same few thousand rows), then run the statistic's algebra over
that constant-size relation; windows over it are the documented-benign
global-window case. Rank-based tests over per-entity relations use the
two-pass range-partitioned global rank (``global_row_number_twopass``
pattern, sets_sorts.py) — never a single-partition sort.

All NS extensions — the reference has no statistics surface
(SURVEY.md §2A, its only aggregate is count:
``k8s/dags/etl-gcp-vinicius-campos.py:119-127``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.operators.quantiles import exact_quantiles
from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t
from gcp_etl_spark.operators.barrier import barrier


def _orders_daily(spark, sf_dir):
    """(day, x epoch-day index, n_orders, revenue) — calendar-bounded."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("revenue"),
        )
        .withColumn("x", F.datediff("d", F.lit("1970-01-01")).cast("double"))
    )


@query(
    "analytics_spearman",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             count(*) AS n_orders, sum(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    ), rk AS (
      SELECT rank() OVER (ORDER BY n_orders)
               + (count(*) OVER (PARTITION BY n_orders) - 1) / 2.0 AS rx,
             rank() OVER (ORDER BY revenue)
               + (count(*) OVER (PARTITION BY revenue) - 1) / 2.0 AS ry
      FROM daily
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(
             (count(*) * sum(rx * ry) - sum(rx) * sum(ry)) /
             sqrt((count(*) * sum(rx * rx) - sum(rx) * sum(rx)) *
                  (count(*) * sum(ry * ry) - sum(ry) * sum(ry))),
             6) AS rho
    FROM rk
    """,
    tags=("stats", "correlation", "orders"),
)
def analytics_spearman(spark, sf_dir):
    """SPEARMAN rank correlation between daily order count and daily
    revenue: mid-rank (average-rank) assignment for ties — rank() min
    rank plus (tie-group size - 1)/2 — then Pearson over the ranks via
    raw power sums (engine-portable algebra, no stddev built-ins).

    Scale: the fact scan reduces to a calendar-bounded daily relation
    before any window; the rank windows run over that constant-size
    aggregate (the documented-benign global-window case — days don't
    grow at 100 TB)."""
    daily = _orders_daily(spark, sf_dir)
    rx = (
        F.rank().over(Window.orderBy("n_orders"))
        + (F.count("*").over(Window.partitionBy("n_orders")) - 1) / 2.0
    ).alias("rx")
    ry = (
        F.rank().over(Window.orderBy("revenue"))
        + (F.count("*").over(Window.partitionBy("revenue")) - 1) / 2.0
    ).alias("ry")
    rk = daily.select(rx, ry)
    n = F.count("*")
    num = n * F.sum(F.col("rx") * F.col("ry")) - F.sum("rx") * F.sum("ry")
    den = F.sqrt(
        (n * F.sum(F.col("rx") * F.col("rx")) - F.sum("rx") * F.sum("rx"))
        * (n * F.sum(F.col("ry") * F.col("ry")) - F.sum("ry") * F.sum("ry"))
    )
    return rk.agg(
        n.cast("long").alias("n_days"), F.round(num / den, 6).alias("rho")
    )


@query(
    "analytics_kendall_tau",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, sum(value) AS v
      FROM events GROUP BY 1
    ), pairs AS (
      SELECT CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS s
      FROM daily a JOIN daily b ON a.d < b.d
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(count(*) FILTER (s = 1) AS BIGINT) AS concordant,
           CAST(count(*) FILTER (s = -1) AS BIGINT) AS discordant,
           round((count(*) FILTER (s = 1) - count(*) FILTER (s = -1))
                 * 1.0 / count(*), 6) AS tau
    FROM pairs
    """,
    tags=("stats", "correlation", "events"),
)
def analytics_kendall_tau(spark, sf_dir):
    """KENDALL tau-a of the daily event-value series against time:
    with the x axis strictly increasing (days), every ordered day pair
    is concordant iff the value rose — C(n,2) pair enumeration over
    the calendar-bounded daily aggregate (30 days -> 435 pairs; the
    pair join NEVER touches the raw events fact table).

    tau-a (no tie correction in the denominator) is the declared
    statistic; value ties count in neither C nor D — identical algebra
    on both engines over double sums."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum("value").alias("v")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    s = (
        F.when(F.col("b.v") > F.col("a.v"), 1)
        .when(F.col("b.v") < F.col("a.v"), -1)
        .otherwise(0)
    ).alias("s")
    pairs = a.join(b, F.col("a.d") < F.col("b.d")).select(s)
    conc = F.count(F.when(F.col("s") == 1, 1))
    disc = F.count(F.when(F.col("s") == -1, 1))
    n_days = daily.count()
    return pairs.agg(
        F.lit(n_days).cast("long").alias("n_days"),
        conc.cast("long").alias("concordant"),
        disc.cast("long").alias("discordant"),
        F.round((conc - disc) * 1.0 / F.count("*"), 6).alias("tau"),
    )


# theil_sen single-task slope-median gate: C(4096,2) slopes ≈ 8.4M
# doubles ≈ 67 MB task memory; calendar-bounded day counts sit far
# below it (module-level so the path-equality test can force the
# distributed side on the small fixtures)
_TS_NUMPY_MAX_DAYS = 4096


@query(
    "analytics_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               * 1.0 AS x,
             sum(o_totalprice) AS y
      FROM orders GROUP BY 1, 2
    ), slopes AS (
      SELECT (b.y - a.y) / (b.x - a.x) AS m
      FROM daily a JOIN daily b ON a.x < b.x
    ), med AS (
      SELECT quantile_cont(m, 0.5) AS m FROM slopes
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           round((SELECT m FROM med), 6) AS slope_per_day,
           round(quantile_cont(daily.y - (SELECT m FROM med) * daily.x, 0.5),
                 4) AS intercept
    FROM daily
    """,
    tags=("stats", "robust", "regression", "orders"),
)
def analytics_theil_sen(spark, sf_dir):
    """THEIL-SEN robust trend of daily revenue: the median of all
    C(n,2) pairwise slopes (29.4% breakdown point vs OLS's 0), with
    the companion median-residual intercept.

    Scale: the slope-pair join is over the calendar-bounded daily
    relation (~2.4k days -> ~2.9M slope pairs — distributed join,
    never touching fact-table cardinality). The slope median is EXACT
    but NOT Spark's ``percentile`` aggregate (whose final merge builds
    a single-reducer value->count map — measured 9.2 s on 2.9M
    distinct doubles). Below the size gate the C(n,2) slope set is
    generated and selected in ONE vectorized task (r13, guide §4.2 /
    §1.2 first-principles: the input is ~2.4k calendar-bounded daily
    rows ≈ 20 KB, so a distributed nested-loop join + range exchange +
    two ranking windows + broadcast join — 17 jobs — was pure
    orchestration overhead around ~30 ms of numpy; measured 3.7-5.0 s
    → the whole query ~1 s). np.partition picks the two middle ranks
    exactly; slopes are the same per-pair IEEE double ops on the same
    Spark-aggregated daily values, so the selected median is
    bit-identical to the distributed path (equality pinned in
    tests/test_r13_opt.py). Above the gate (C(n,2)·8 B past ~130 MB
    task memory — never at calendar-bounded day counts, but the gate
    keeps the 100 TB path principled) the r12 range-partitioned
    two-pass global rank runs unchanged. Interpolated-median semantics
    (mean of the two middles for even n) match DuckDB
    ``quantile_cont`` exactly on both paths."""
    daily = _orders_daily(spark, sf_dir).select(
        "x", F.col("revenue").alias("y")
    )
    n_days = daily.count()
    n_pairs = n_days * (n_days - 1) // 2
    lo, hi = (n_pairs + 1) // 2, n_pairs // 2 + 1
    if n_days <= _TS_NUMPY_MAX_DAYS:
        def slope_median(batches):
            import numpy as np
            import pandas as pd

            xs, ys = [], []
            for pdf in batches:
                xs.append(pdf["x"].to_numpy(np.float64))
                ys.append(pdf["y"].to_numpy(np.float64))
            x = np.concatenate(xs) if xs else np.empty(0)
            y = np.concatenate(ys) if ys else np.empty(0)
            o = np.argsort(x)
            x, y = x[o], y[o]
            iu, ju = np.triu_indices(x.size, k=1)
            m = (y[ju] - y[iu]) / (x[ju] - x[iu])
            if not m.size:
                yield pd.DataFrame({"m": [np.nan]})
                return
            part = np.partition(m, [lo - 1, hi - 1])
            yield pd.DataFrame(
                {"m": [(part[lo - 1] + part[hi - 1]) / 2.0]}
            )

        m_med = daily.coalesce(1).mapInPandas(slope_median, "m double")
    else:
        a = daily.alias("a")
        b = daily.alias("b")
        slopes = a.join(b, F.col("a.x") < F.col("b.x")).select(
            (
                (F.col("b.y") - F.col("a.y"))
                / (F.col("b.x") - F.col("a.x"))
            ).alias("m")
        )
        # lazy checkpoint BELOW the range exchange: repartitionByRange's
        # boundary-SAMPLING job executes its child once and the exchange
        # executes it again — uncut, the slope-pair nested-loop join ran
        # twice per query (guide §1.2: remove redundant passes)
        slopes = slopes.transform(barrier)
        parts = slopes.repartitionByRange(32, "m").withColumn(
            "pid", F.spark_partition_id()
        )
        local = parts.withColumn(
            "lrn",
            F.row_number().over(Window.partitionBy("pid").orderBy("m")),
        )
        counts = local.groupBy("pid").agg(F.count("*").alias("n"))
        prior = Window.orderBy("pid").rowsBetween(
            Window.unboundedPreceding, Window.currentRow - 1
        )
        offs = counts.select(
            "pid", F.coalesce(F.sum("n").over(prior), F.lit(0)).alias("off")
        )
        m_med = (
            local.join(F.broadcast(offs), "pid")
            .filter((F.col("lrn") + F.col("off")).isin(lo, hi))
            .agg(F.avg("m").alias("m"))
        )
    return (
        daily.crossJoin(F.broadcast(m_med))
        .agg(
            F.lit(n_days).cast("long").alias("n_days"),
            F.round(F.first("m"), 6).alias("slope_per_day"),
            F.round(
                F.expr("percentile(y - m * x, 0.5)"), 4
            ).alias("intercept"),
        )
    )


@query(
    "analytics_mann_whitney",
    oracle="""
    WITH pc AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey AS k,
             avg(o.o_totalprice) AS v
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
      GROUP BY 1, 2
    ), rk AS (
      SELECT seg, v, row_number() OVER (ORDER BY v, k) AS rn FROM pc
    ), ar AS (
      SELECT seg, avg(rn) OVER (PARTITION BY v) AS r FROM rk
    ), s AS (
      SELECT sum(r) FILTER (seg = 'BUILDING') AS r1,
             count(*) FILTER (seg = 'BUILDING') AS n1,
             count(*) FILTER (seg = 'MACHINERY') AS n2
      FROM ar
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(r1 - n1 * (n1 + 1) / 2.0, 1) AS u1,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0), 4) AS z
    FROM s
    """,
    tags=("stats", "hypothesis-test", "orders", "scale-pattern"),
)
def analytics_mann_whitney(spark, sf_dir):
    """MANN-WHITNEY U test: do BUILDING customers place larger average
    orders than MACHINERY customers? Mid-ranks over the pooled
    per-customer averages, U1 from the rank sum, normal-approximation
    z (no tie correction — the ranked variable is a continuous double).

    Scale: global ranks come from the TWO-PASS range-partitioned rank
    (sets_sorts.global_row_number_twopass pattern) — range-exchange +
    per-partition row_number + broadcast prefix offsets — NOT a
    single-partition ORDER BY window; mid-ranks then come from a
    per-value group average. Works unchanged at 10^9 customers."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    pc = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o.o_custkey == c.c_custkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("o_custkey").alias("k")
        )
        .agg(F.avg("o_totalprice").alias("v"))
    )
    # two-pass scale-safe global row_number over (v, k)
    parts = pc.repartitionByRange(32, "v", "k").withColumn(
        "pid", F.spark_partition_id()
    )
    local = parts.withColumn(
        "local_rn",
        F.row_number().over(Window.partitionBy("pid").orderBy("v", "k")),
    )
    counts = local.groupBy("pid").agg(F.count("*").alias("n"))
    prior = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = counts.select(
        "pid", F.coalesce(F.sum("n").over(prior), F.lit(0)).alias("offset")
    )
    rk = local.join(F.broadcast(offsets), "pid").select(
        "seg", "v", (F.col("local_rn") + F.col("offset")).alias("rn")
    )
    ar = rk.select(
        "seg", F.avg("rn").over(Window.partitionBy("v")).alias("r")
    )
    r1 = F.sum(F.when(F.col("seg") == "BUILDING", F.col("r")))
    n1 = F.count(F.when(F.col("seg") == "BUILDING", 1))
    n2 = F.count(F.when(F.col("seg") == "MACHINERY", 1))
    u1 = r1 - n1 * (n1 + 1) / 2.0
    z = (u1 - n1 * n2 / 2.0) / F.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
    return ar.agg(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        F.round(u1, 1).alias("u1"),
        F.round(z, 4).alias("z"),
    )


@query(
    "analytics_runs_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, sum(value) AS v FROM events GROUP BY 1
    ), med AS (
      SELECT quantile_cont(v, 0.5) AS m FROM daily
    ), signs AS (
      SELECT d, CASE WHEN v > (SELECT m FROM med) THEN 1 ELSE -1 END AS s
      FROM daily WHERE v <> (SELECT m FROM med)
    ), runs AS (
      SELECT s, CASE WHEN lag(s) OVER (ORDER BY d) IS DISTINCT FROM s
                THEN 1 ELSE 0 END AS new_run
      FROM signs
    ), agg AS (
      SELECT sum(new_run) AS r,
             count(*) FILTER (s = 1) AS n1,
             count(*) FILTER (s = -1) AS n2
      FROM runs
    )
    SELECT CAST(r AS BIGINT) AS n_runs, CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           round((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))),
                 4) AS z
    FROM agg
    """,
    tags=("stats", "hypothesis-test", "events"),
)
def analytics_runs_test(spark, sf_dir):
    """WALD-WOLFOWITZ runs test for randomness of the daily event-value
    series around its median: sign each day (above/below, equals
    dropped), count maximal same-sign runs via a lag transition flag,
    and compare to the expected run count under exchangeability with
    the normal approximation z.

    Scale: one fact-table reduction to the calendar-bounded daily
    relation; the lag window runs over that constant-size aggregate."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum("value").alias("v")
    )
    med = daily.agg(F.expr("percentile(v, 0.5)").alias("m"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("v") != F.col("m"))
        .select(
            "d", F.when(F.col("v") > F.col("m"), 1).otherwise(-1).alias("s")
        )
    )
    w = Window.orderBy("d")
    runs = signs.select(
        "s",
        F.when(
            ~F.lag("s").over(w).eqNullSafe(F.col("s")), 1
        ).otherwise(0).alias("new_run"),
    )
    r = F.sum("new_run").cast("double")
    n1 = F.count(F.when(F.col("s") == 1, 1)).cast("double")
    n2 = F.count(F.when(F.col("s") == -1, 1)).cast("double")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    sig = F.sqrt(
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    return runs.agg(
        r.cast("long").alias("n_runs"),
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        F.round((r - mu) / sig, 4).alias("z"),
    )


@query(
    "analytics_cramers_v",
    oracle="""
    WITH obs AS (
      SELECT c_nationkey AS r, c_mktsegment AS c, count(*) AS o
      FROM customer GROUP BY 1, 2
    ), tot AS (
      SELECT sum(o) AS n,
             count(DISTINCT r) AS nr, count(DISTINCT c) AS nc
      FROM obs
    ), exp AS (
      SELECT o.o,
             rs.s * cs.s * 1.0 / (SELECT n FROM tot) AS e
      FROM obs o
      JOIN (SELECT r, sum(o) AS s FROM obs GROUP BY 1) rs ON rs.r = o.r
      JOIN (SELECT c, sum(o) AS s FROM obs GROUP BY 1) cs ON cs.c = o.c
    )
    SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n,
           round(sum((o - e) * (o - e) / e), 4) AS chi2,
           round(sqrt(sum((o - e) * (o - e) / e)
                 / ((SELECT n FROM tot)
                    * (least((SELECT nr FROM tot), (SELECT nc FROM tot)) - 1))),
                 6) AS cramers_v
    FROM exp
    """,
    tags=("stats", "association", "customer"),
)
def analytics_cramers_v(spark, sf_dir):
    """CRAMER'S V association between customer nation and market
    segment: chi-square over the 25x5 contingency table, normalized by
    n*(min(r,c)-1). Expected counts from the marginal product.

    Scale: one groupBy reduces the fact table to a cardinality-bounded
    contingency relation (|nations| x |segments|); the chi-square
    algebra runs over that tiny table with broadcast marginals —
    nothing downstream of the first aggregation scales with rows."""
    c = t(spark, sf_dir, "customer")
    obs = c.groupBy(
        F.col("c_nationkey").alias("r"), F.col("c_mktsegment").alias("c")
    ).agg(F.count("*").alias("o"))
    tot = obs.agg(
        F.sum("o").alias("n"),
        F.countDistinct("r").alias("nr"),
        F.countDistinct("c").alias("nc"),
    )
    rs = obs.groupBy("r").agg(F.sum("o").alias("rsum"))
    cs = obs.groupBy("c").agg(F.sum("o").alias("csum"))
    ex = (
        obs.join(F.broadcast(rs), "r")
        .join(F.broadcast(cs), "c")
        .crossJoin(F.broadcast(tot))
        .withColumn("e", F.col("rsum") * F.col("csum") * 1.0 / F.col("n"))
    )
    chi2 = F.sum((F.col("o") - F.col("e")) ** 2 / F.col("e"))
    return ex.agg(
        F.first("n").cast("long").alias("n"),
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / (F.first("n") * (F.least(F.first("nr"), F.first("nc")) - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@query(
    "analytics_herfindahl",
    oracle="""
    WITH seg AS (
      SELECT c.c_mktsegment AS seg, sum(o.o_totalprice) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ), tot AS (SELECT sum(rev) AS tr, count(*) AS k FROM seg)
    SELECT CAST((SELECT k FROM tot) AS BIGINT) AS n_segments,
           round(sum((rev / (SELECT tr FROM tot))
                     * (rev / (SELECT tr FROM tot))), 6) AS hhi,
           round((sum((rev / (SELECT tr FROM tot))
                      * (rev / (SELECT tr FROM tot)))
                  - 1.0 / (SELECT k FROM tot))
                 / (1 - 1.0 / (SELECT k FROM tot)), 6) AS hhi_normalized
    FROM seg
    """,
    tags=("stats", "concentration", "orders"),
)
def analytics_herfindahl(spark, sf_dir):
    """HERFINDAHL-HIRSCHMAN concentration index of revenue across
    market segments: sum of squared revenue shares, plus the
    k-normalized variant ((H - 1/k)/(1 - 1/k)) that is 0 for a
    perfectly even split and 1 for a monopoly segment.

    Scale: broadcast-joined dimension, one groupBy to a k-row share
    relation — the index algebra is O(k)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    tot = seg.agg(F.sum("rev").alias("tr"), F.count("*").alias("k"))
    sh = seg.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("rev") / F.col("tr")
    )
    hhi = F.sum(F.col("share") * F.col("share"))
    k = F.first("k")
    return sh.agg(
        k.cast("long").alias("n_segments"),
        F.round(hhi, 6).alias("hhi"),
        F.round((hhi - 1.0 / k) / (1 - 1.0 / k), 6).alias("hhi_normalized"),
    )


@query(
    "analytics_jensen_shannon",
    oracle="""
    WITH lab AS (
      SELECT event_type,
             CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
                  THEN 'weekend' ELSE 'weekday' END AS grp
      FROM events
    ), cnt AS (
      SELECT event_type, grp, count(*) AS c FROM lab GROUP BY 1, 2
    ), p AS (
      SELECT event_type,
             sum(c) FILTER (grp = 'weekday') * 1.0
               / (SELECT sum(c) FROM cnt WHERE grp = 'weekday') AS p,
             sum(c) FILTER (grp = 'weekend') * 1.0
               / (SELECT sum(c) FROM cnt WHERE grp = 'weekend') AS q
      FROM cnt GROUP BY 1
    ), terms AS (
      SELECT coalesce(p, 0) AS p, coalesce(q, 0) AS q,
             (coalesce(p, 0) + coalesce(q, 0)) / 2 AS m
      FROM p
    )
    SELECT round(sum(CASE WHEN p > 0 THEN 0.5 * p * ln(p / m) ELSE 0 END)
               + sum(CASE WHEN q > 0 THEN 0.5 * q * ln(q / m) ELSE 0 END),
               6) AS js_divergence,
           CAST(count(*) AS BIGINT) AS n_types
    FROM terms
    """,
    tags=("stats", "divergence", "events"),
)
def analytics_jensen_shannon(spark, sf_dir):
    """JENSEN-SHANNON divergence between the weekday and weekend
    event-type distributions — the symmetric, bounded [0, ln 2]
    drift measure (0.5*KL(P||M) + 0.5*KL(Q||M), M the mixture).
    Zero-probability types contribute 0 from their missing side
    (coalesce to 0, guarded ln).

    Scale: one groupBy to the |event_types| x 2 count relation;
    everything after is O(#types). The dual of analytics' KL drift
    monitor, with symmetric/bounded semantics."""
    e = t(spark, sf_dir, "events")
    grp = F.when(
        F.dayofweek(F.to_date("ts")).isin(1, 7), "weekend"
    ).otherwise("weekday")
    cnt = e.groupBy("event_type", grp.alias("grp")).agg(
        F.count("*").alias("c")
    )
    tot = cnt.groupBy("grp").agg(F.sum("c").alias("tc"))
    dist = (
        cnt.join(F.broadcast(tot), "grp")
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("grp") == "weekday", F.col("c") / F.col("tc")
                    )
                ),
                F.lit(0.0),
            ).alias("p"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("grp") == "weekend", F.col("c") / F.col("tc")
                    )
                ),
                F.lit(0.0),
            ).alias("q"),
        )
        .withColumn("m", (F.col("p") + F.col("q")) / 2)
    )
    js = F.sum(
        F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / F.col("m"))).otherwise(0.0)
    ) + F.sum(
        F.when(F.col("q") > 0, 0.5 * F.col("q") * F.log(F.col("q") / F.col("m"))).otherwise(0.0)
    )
    return dist.agg(
        F.round(js, 6).alias("js_divergence"),
        F.count("*").cast("long").alias("n_types"),
    )


@query(
    "analytics_paired_ttest",
    oracle="""
    WITH mid AS (
      SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) / 2 AS m FROM events
    ), halves AS (
      SELECT user_id,
             avg(value) FILTER (epoch_us(ts) <  (SELECT m FROM mid)) AS v1,
             avg(value) FILTER (epoch_us(ts) >= (SELECT m FROM mid)) AS v2
      FROM events GROUP BY 1
    ), d AS (
      SELECT v2 - v1 AS d FROM halves WHERE v1 IS NOT NULL AND v2 IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(avg(d), 6) AS mean_diff,
           round(avg(d) / (sqrt((sum(d * d) - count(*) * avg(d) * avg(d))
                                / (count(*) - 1))
                           / sqrt(count(*))), 4) AS t_stat
    FROM d
    """,
    tags=("stats", "hypothesis-test", "events"),
)
def analytics_paired_ttest(spark, sf_dir):
    """PAIRED t-test: per-user mean event value in the first vs second
    half of the observation window (users active in both halves form
    the pairs); t = mean(d) / (s_d / sqrt(n)) with the sample standard
    deviation computed from raw power sums (engine-portable — no
    Welford-vs-sum-of-squares backend divergence).

    Scale: two conditional aggregates in ONE groupBy pass over events
    (no self-join of halves); the t algebra is a second tiny
    aggregation over per-user rows."""
    # ts is TIMESTAMP_NTZ; session TZ is UTC so the cast is identity
    e = t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    mid = e.agg(
        ((F.min("us") + F.max("us")) / 2).alias("m")
    )
    halves = (
        e.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.avg(
                F.when(F.col("us") < F.col("m"), F.col("value"))
            ).alias("v1"),
            F.avg(
                F.when(F.col("us") >= F.col("m"), F.col("value"))
            ).alias("v2"),
        )
    )
    d = halves.filter(
        F.col("v1").isNotNull() & F.col("v2").isNotNull()
    ).select((F.col("v2") - F.col("v1")).alias("d"))
    n = F.count("*")
    mean = F.avg("d")
    sd = F.sqrt((F.sum(F.col("d") * F.col("d")) - n * mean * mean) / (n - 1))
    return d.agg(
        n.cast("long").alias("n_users"),
        F.round(mean, 6).alias("mean_diff"),
        F.round(mean / (sd / F.sqrt(n)), 4).alias("t_stat"),
    )


@query(
    "analytics_forecast_pi",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               * 1.0 AS x,
             sum(o_totalprice) AS y
      FROM orders GROUP BY 1
    ), s AS (
      SELECT count(*) AS n, avg(x) AS mx, avg(y) AS my,
             sum(x * y) AS sxy, sum(x * x) AS sxx_r, sum(y * y) AS syy_r,
             max(x) AS xmax
      FROM daily
    ), fit AS (
      SELECT n, mx, my, xmax,
             (sxy - n * mx * my) / (sxx_r - n * mx * mx) AS b,
             sxx_r - n * mx * mx AS sxx,
             (syy_r - n * my * my)
               - (sxy - n * mx * my) * (sxy - n * mx * my)
                 / (sxx_r - n * mx * mx) AS sse
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(b, 4) AS slope,
           round(my + b * (xmax + 1 - mx), 2) AS forecast_next,
           round(1.96 * sqrt(sse / (n - 2))
                 * sqrt(1 + 1.0 / n
                        + (xmax + 1 - mx) * (xmax + 1 - mx) / sxx), 2)
             AS pi_halfwidth
    FROM fit
    """,
    tags=("stats", "regression", "forecast", "orders"),
)
def analytics_forecast_pi(spark, sf_dir):
    """One-step-ahead OLS FORECAST of daily revenue with a 95%
    PREDICTION interval: fit y = a + bx on the daily series, predict
    x_max + 1, and report the half-width 1.96 * s_e *
    sqrt(1 + 1/n + (x0 - mean_x)^2 / Sxx) — the textbook new-
    observation interval (wider than the mean-response CI).

    Scale: the whole fit is ONE aggregation pass over the calendar-
    bounded daily relation — closed-form sums, no iteration, no
    driver-side math."""
    daily = _orders_daily(spark, sf_dir).select(
        "x", F.col("revenue").alias("y")
    )
    s = daily.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_r"),
        F.sum(F.col("y") * F.col("y")).alias("syy_r"),
        F.max("x").alias("xmax"),
    )
    b = (F.col("sxy") - F.col("n") * F.col("mx") * F.col("my")) / (
        F.col("sxx_r") - F.col("n") * F.col("mx") * F.col("mx")
    )
    sxx = F.col("sxx_r") - F.col("n") * F.col("mx") * F.col("mx")
    sse = (F.col("syy_r") - F.col("n") * F.col("my") * F.col("my")) - (
        (F.col("sxy") - F.col("n") * F.col("mx") * F.col("my")) ** 2 / sxx
    )
    x0 = F.col("xmax") + 1 - F.col("mx")
    return s.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(b, 4).alias("slope"),
        F.round(F.col("my") + b * x0, 2).alias("forecast_next"),
        F.round(
            1.96
            * F.sqrt(sse / (F.col("n") - 2))
            * F.sqrt(1 + 1.0 / F.col("n") + x0 * x0 / sxx),
            2,
        ).alias("pi_halfwidth"),
    )


@query(
    "analytics_heaps_law",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(
               regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS w
      FROM documents
    ), firsts AS (
      SELECT w, min(doc_id) AS fd FROM words WHERE w <> '' GROUP BY 1
    ), tokcum AS (
      SELECT doc_id,
             sum(cnt) OVER (ORDER BY doc_id) AS toks
      FROM (SELECT doc_id, count(*) AS cnt FROM words WHERE w <> ''
            GROUP BY 1)
    ), voccum AS (
      SELECT fd AS doc_id, count(*) AS nv FROM firsts GROUP BY 1
    ), chk AS (
      SELECT t.doc_id, t.toks,
             sum(coalesce(v.nv, 0)) OVER (ORDER BY t.doc_id) AS vocab
      FROM tokcum t LEFT JOIN voccum v ON v.doc_id = t.doc_id
    ), pts AS (
      SELECT ln(toks * 1.0) AS lx, ln(vocab * 1.0) AS ly
      FROM chk WHERE doc_id % 20 = 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_checkpoints,
           round((count(*) * sum(lx * ly) - sum(lx) * sum(ly))
                 / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)), 4) AS beta,
           round(exp((sum(ly) - (count(*) * sum(lx * ly) - sum(lx) * sum(ly))
                      / (count(*) * sum(lx * lx) - sum(lx) * sum(lx))
                      * sum(lx)) / count(*)), 2) AS k_coef,
           CAST((SELECT max(vocab) FROM chk) AS BIGINT) AS vocab_final
    FROM pts
    """,
    tags=("stats", "text", "documents"),
)
def analytics_heaps_law(spark, sf_dir):
    """HEAPS' LAW fit V(N) = K * N^beta for vocabulary growth over the
    corpus read in doc_id order: each word contributes to the vocab
    curve at its FIRST-occurrence document (min doc_id per word — one
    groupBy, no ordered scan of the corpus), cumulative token and
    vocab counts at every 20th document form the checkpoints, and
    (K, beta) come from closed-form log-log least squares.

    Scale: token counts and first-occurrence docs are plain
    aggregations; the cumulative windows run over the per-DOC count
    relation (bounded by #docs, tiny vs token volume). The companion
    of text_zipf_fit (frequency law) on the growth axis."""
    par = spark.sparkContext.defaultParallelism
    d = t(spark, sf_dir, "documents").repartition(par)
    # single-file doc scan -> 2 input splits; fan out to every core
    words = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(
                    F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "),
                    " ",
                ),
                lambda w: w != F.lit(""),
            )
        ).alias("w"),
    )
    firsts = words.groupBy("w").agg(F.min("doc_id").alias("fd"))
    percnt = words.groupBy("doc_id").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("doc_id")
    tokcum = percnt.select(
        "doc_id", F.sum("cnt").over(wcum).alias("toks")
    )
    voccum = firsts.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count("*").alias("nv")
    )
    chk = tokcum.join(voccum, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.sum(F.coalesce(F.col("nv"), F.lit(0))).over(wcum).alias("vocab"),
    )
    vocab_final = chk.agg(F.max("vocab")).first()[0]
    pts = chk.filter(F.col("doc_id") % 20 == 0).select(
        F.log(F.col("toks") * 1.0).alias("lx"),
        F.log(F.col("vocab") * 1.0).alias("ly"),
    )
    n = F.count("*")
    slope = (n * F.sum(F.col("lx") * F.col("ly")) - F.sum("lx") * F.sum("ly")) / (
        n * F.sum(F.col("lx") * F.col("lx")) - F.sum("lx") * F.sum("lx")
    )
    return pts.agg(
        n.cast("long").alias("n_checkpoints"),
        F.round(slope, 4).alias("beta"),
        F.round(
            F.exp((F.sum("ly") - slope * F.sum("lx")) / n), 2
        ).alias("k_coef"),
        F.lit(vocab_final).cast("long").alias("vocab_final"),
    )


@query(
    "agg_central_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag AS flag, count(*) AS n, avg(l_extendedprice) AS mu,
             sum(l_extendedprice) AS s1,
             sum(l_extendedprice * l_extendedprice) AS s2,
             sum(l_extendedprice * l_extendedprice * l_extendedprice) AS s3,
             sum(l_extendedprice * l_extendedprice * l_extendedprice
                 * l_extendedprice) AS s4
      FROM lineitem GROUP BY 1
    ), m AS (
      SELECT flag, n, mu,
             s2 / n - mu * mu AS m2,
             s3 / n - 3 * mu * s2 / n + 2 * mu * mu * mu AS m3,
             s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n
               - 3 * mu * mu * mu * mu AS m4
      FROM s
    )
    SELECT flag, CAST(n AS BIGINT) AS n,
           round(mu, 4) AS mean,
           round(sqrt(m2), 4) AS pop_std,
           round(m3 / (m2 * sqrt(m2)), 6) AS skewness_g1,
           round(m4 / (m2 * m2) - 3, 6) AS kurtosis_excess
    FROM m ORDER BY flag
    """,
    tags=("agg", "stats", "lineitem"),
)
def agg_central_moments(spark, sf_dir):
    """Population SKEWNESS (g1 = m3/m2^1.5) and EXCESS KURTOSIS
    (m4/m2^2 - 3) per return flag, computed from raw power sums so the
    algebra is identical on both engines (built-in skewness/kurtosis
    differ between engines in sample-vs-population convention — this
    pins ONE exact definition).

    Scale: a single map-side-combining hash aggregate producing four
    power sums per group; the moment algebra is per-group scalar
    math."""
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    s = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count("*").cast("double").alias("n"),
        F.avg(x).alias("mu"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    mu = F.col("mu")
    n = F.col("n")
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * F.col("s2") / n + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4 * mu * F.col("s3") / n
        + 6 * mu * mu * F.col("s2") / n
        - 3 * mu * mu * mu * mu
    )
    return s.select(
        "flag",
        n.cast("long").alias("n"),
        F.round(mu, 4).alias("mean"),
        F.round(F.sqrt(m2), 4).alias("pop_std"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness_g1"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("kurtosis_excess"),
    ).orderBy("flag")


@query(
    "agg_ols_loglog_elasticity",
    oracle="""
    WITH pts AS (
      SELECT l_returnflag AS flag,
             ln(l_extendedprice / l_quantity) AS x,
             ln(l_quantity) AS y
      FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0
    ), s AS (
      SELECT flag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pts GROUP BY 1
    )
    SELECT flag, CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS elasticity,
           round(pow(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s ORDER BY flag
    """,
    tags=("stats", "regression", "lineitem"),
)
def agg_ols_loglog_elasticity(spark, sf_dir):
    """PRICE ELASTICITY per return flag: OLS slope of ln(quantity) on
    ln(unit price) — the log-log specification whose slope IS the
    elasticity — plus R² from the same power sums. Pure closed-form
    sums; no ML library, no iteration.

    Scale: one map-side-combining aggregate producing six sums per
    group; the regression algebra is per-group scalar math (the
    2-feature generalization lives in agg_ols_two_feature)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    x = F.log(F.col("l_extendedprice") / F.col("l_quantity"))
    y = F.log(F.col("l_quantity"))
    s = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "flag",
        F.col("n").cast("long").alias("n"),
        F.round(num / vx, 6).alias("elasticity"),
        F.round(num ** 2 / (vx * vy), 6).alias("r2"),
    ).orderBy("flag")


@query(
    "analytics_robust_means",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, o.o_totalprice AS v
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), q AS (
      SELECT seg, quantile_cont(v, 0.05) AS p05, quantile_cont(v, 0.95) AS p95
      FROM j GROUP BY 1
    )
    SELECT j.seg, CAST(count(*) AS BIGINT) AS n,
           round(avg(j.v), 4) AS mean,
           round(avg(CASE WHEN j.v < q.p05 THEN q.p05
                          WHEN j.v > q.p95 THEN q.p95 ELSE j.v END), 4)
             AS winsorized_mean,
           round(avg(j.v) FILTER (j.v >= q.p05 AND j.v <= q.p95), 4)
             AS trimmed_mean
    FROM j JOIN q ON q.seg = j.seg
    GROUP BY 1 ORDER BY 1
    """,
    tags=("stats", "robust", "orders"),
)
def analytics_robust_means(spark, sf_dir):
    """WINSORIZED and TRIMMED means (5%/95%) of order totals per
    market segment beside the raw mean — the standard
    outlier-robust location estimates (winsorize clamps the tails to
    the fences; trim drops them).

    Scale: pass 1 computes per-group exact 5th/95th percentiles via
    ``operators.exact_quantiles`` (two-pass range-partitioned rank —
    never the ``percentile`` aggregate's single-reducer value map over
    the unbounded order totals); the bounded per-group fence relation
    broadcasts into pass 2's conditional aggregate. Pass 2 reads the
    operator's ``return_values`` checkpoint (the (seg, v) relation the
    quantile pass already materialized) instead of re-running the
    scan + broadcast join — o_totalprice is NOT NULL (TPC-H), so the
    operator's null filter drops no rows and the counts are
    unchanged."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("v")
    )
    q, vals = exact_quantiles(
        j, "v", {"p05": 0.05, "p95": 0.95}, group_cols=["seg"],
        return_values=True,
    )
    vals = vals.withColumnRenamed("__v", "v")
    clamped = (
        F.when(F.col("v") < F.col("p05"), F.col("p05"))
        .when(F.col("v") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("v"))
    )
    return (
        vals.join(F.broadcast(q), "seg")
        .groupBy("seg")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("v"), 4).alias("mean"),
            F.round(F.avg(clamped), 4).alias("winsorized_mean"),
            F.round(
                F.avg(
                    F.when(
                        (F.col("v") >= F.col("p05"))
                        & (F.col("v") <= F.col("p95")),
                        F.col("v"),
                    )
                ),
                4,
            ).alias("trimmed_mean"),
        )
        .orderBy("seg")
    )


@query(
    "analytics_iqr_outliers",
    oracle="""
    WITH q AS (
      SELECT event_type, quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY 1
    )
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
           round(max(q.q3 - q.q1), 4) AS iqr,
           CAST(count(*) FILTER (
             e.value < q.q1 - 1.5 * (q.q3 - q.q1)
             OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)) AS BIGINT)
             AS n_outliers,
           round(count(*) FILTER (
             e.value < q.q1 - 1.5 * (q.q3 - q.q1)
             OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)) * 1.0 / count(*), 6)
             AS outlier_rate
    FROM events e JOIN q USING (event_type)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("stats", "outliers", "dq", "events"),
)
def analytics_iqr_outliers(spark, sf_dir):
    """TUKEY IQR fence outlier rate per event type: values beyond
    [Q1 - 1.5*IQR, Q3 + 1.5*IQR] — the boxplot rule, the third point
    in the outlier-detector design space next to anomaly_zscore
    (parametric) and anomaly_mad_robust (median-based).

    Scale: per-group exact quartiles in pass 1 via
    ``operators.exact_quantiles`` (two-pass rank, no single-reducer
    value map), bounded fence relation broadcast, conditional count in
    pass 2 — same two-scan shape as analytics_robust_means."""
    e = t(spark, sf_dir, "events")
    q = exact_quantiles(
        e, "value", {"q1": 0.25, "q3": 0.75}, group_cols=["event_type"]
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("value") < F.col("q1") - 1.5 * iqr) | (
        F.col("value") > F.col("q3") + 1.5 * iqr
    )
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.max(iqr), 4).alias("iqr"),
            F.count(F.when(is_out, 1)).cast("long").alias("n_outliers"),
            F.round(
                F.count(F.when(is_out, 1)) * 1.0 / F.count("*"), 6
            ).alias("outlier_rate"),
        )
        .orderBy("event_type")
    )


@query(
    "analytics_decile_lift",
    oracle="""
    WITH per_user AS (
      SELECT user_id, sum(value) AS v FROM events GROUP BY 1
    ), ranked AS (
      SELECT v, ntile(10) OVER (ORDER BY v DESC, user_id) AS decile
      FROM per_user
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
           round(sum(v), 4) AS total_value,
           round(sum(v) / (SELECT sum(v) FROM per_user), 6) AS share,
           round((sum(v) / count(*))
                 / ((SELECT sum(v) FROM per_user)
                    / (SELECT count(*) FROM per_user)), 4) AS lift
    FROM ranked GROUP BY 1 ORDER BY 1
    """,
    tags=("stats", "analytics", "events"),
)
def analytics_decile_lift(spark, sf_dir):
    """DECILE LIFT table: users ranked by total event value into
    deciles (ntile over the per-user aggregate, deterministic
    (v, user_id) order); per-decile share of total value and lift vs
    the global per-user average — the model-free targeting baseline
    every campaign/churn model is judged against ('top decile carries
    4x average').

    Scale: the window runs over the PER-USER aggregate (entity-
    bounded, far smaller than events); at extreme user counts swap
    ntile for the two-pass percentile-threshold bucketing
    (analytics_robust_means shape) at the cost of exact equal-size
    deciles."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.sum("value").alias("v"))
    tot = per_user.agg(
        F.sum("v").alias("tv"), F.count("*").alias("tn")
    )
    ranked = per_user.select(
        "v",
        F.ntile(10)
        .over(Window.orderBy(F.desc("v"), F.asc("user_id")))
        .alias("decile"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy(F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.round(F.sum("v"), 4).alias("total_value"),
            F.round(F.sum("v") / F.first("tv"), 6).alias("share"),
            F.round(
                (F.sum("v") / F.count("*"))
                / (F.first("tv") / F.first("tn")),
                4,
            ).alias("lift"),
        )
        .orderBy("decile")
    )


@query(
    "analytics_markov_entropy",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), trans AS (
      SELECT prev AS s, event_type AS tgt, count(*) AS c
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ), row_tot AS (
      SELECT s, sum(c) AS cs FROM trans GROUP BY 1
    ), tot AS (SELECT sum(c) AS n FROM trans)
    SELECT t.s AS state,
           CAST(r.cs AS BIGINT) AS n_transitions,
           round(r.cs * 1.0 / (SELECT n FROM tot), 6) AS pi,
           round(-sum((t.c * 1.0 / r.cs) * ln(t.c * 1.0 / r.cs)), 6)
             AS h_conditional,
           round(-sum((t.c * 1.0 / (SELECT n FROM tot))
                      * ln(t.c * 1.0 / r.cs)), 6) AS h_contribution
    FROM trans t JOIN row_tot r ON r.s = t.s
    GROUP BY t.s, r.cs ORDER BY 1
    """,
    tags=("stats", "entropy", "events"),
)
def analytics_markov_entropy(spark, sf_dir):
    """ENTROPY RATE of the empirical event-type Markov chain: per
    state, the stationary weight pi (empirical), the conditional
    next-state entropy H(next | state), and its contribution
    pi_i * H_i to the chain's entropy rate — the predictability
    decomposition of user behavior (which states make the journey
    deterministic vs chaotic). Companion to event_transition_matrix,
    which emits the raw probabilities this query summarizes.

    Scale: the lag window partitions per user (parallel); transition
    counts are a |types|^2-bounded aggregate and all entropy algebra
    runs there."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    trans = seq.groupBy(
        F.col("prev").alias("s"), F.col("event_type").alias("tgt")
    ).agg(F.count("*").alias("c"))
    row_tot = trans.groupBy("s").agg(F.sum("c").alias("cs"))
    tot = trans.agg(F.sum("c").alias("n"))
    j = trans.join(F.broadcast(row_tot), "s").crossJoin(F.broadcast(tot))
    p_cond = F.col("c") * 1.0 / F.col("cs")
    return (
        j.groupBy("s", "cs")
        .agg(
            F.round(F.first("cs") * 1.0 / F.first("n"), 6).alias("pi"),
            F.round(-F.sum(p_cond * F.log(p_cond)), 6).alias(
                "h_conditional"
            ),
            F.round(
                -F.sum(
                    (F.col("c") * 1.0 / F.col("n")) * F.log(p_cond)
                ),
                6,
            ).alias("h_contribution"),
        )
        .select(
            F.col("s").alias("state"),
            F.col("cs").cast("long").alias("n_transitions"),
            "pi",
            "h_conditional",
            "h_contribution",
        )
        .orderBy("state")
    )


@query(
    "analytics_diff_in_diff",
    oracle="""
    WITH mid AS (
      SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) / 2 AS m FROM events
    ), treated AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ), cells AS (
      SELECT CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS treated,
             CASE WHEN epoch_us(e.ts) >= (SELECT m FROM mid)
                  THEN 1 ELSE 0 END AS post,
             e.value
      FROM events e LEFT JOIN treated t ON t.user_id = e.user_id
      WHERE e.event_type <> 'purchase'
    ), m2 AS (
      SELECT treated, post, avg(value) AS mu, count(*) AS n
      FROM cells GROUP BY 1, 2
    )
    SELECT
      CAST(sum(n) AS BIGINT) AS n_obs,
      round(max(CASE WHEN treated = 1 AND post = 1 THEN mu END), 6) AS t_post,
      round(max(CASE WHEN treated = 1 AND post = 0 THEN mu END), 6) AS t_pre,
      round(max(CASE WHEN treated = 0 AND post = 1 THEN mu END), 6) AS c_post,
      round(max(CASE WHEN treated = 0 AND post = 0 THEN mu END), 6) AS c_pre,
      round((max(CASE WHEN treated = 1 AND post = 1 THEN mu END)
             - max(CASE WHEN treated = 1 AND post = 0 THEN mu END))
            - (max(CASE WHEN treated = 0 AND post = 1 THEN mu END)
               - max(CASE WHEN treated = 0 AND post = 0 THEN mu END)), 6)
        AS did_estimate
    FROM m2
    """,
    tags=("stats", "experimentation", "events"),
)
def analytics_diff_in_diff(spark, sf_dir):
    """DIFFERENCE-IN-DIFFERENCES: purchasers (ever) as the treated
    group, the window midpoint as the intervention, non-purchase
    event values as the outcome — DiD = (T_post - T_pre) -
    (C_post - C_pre), the parallel-trends causal estimate that a
    naive post-only comparison gets wrong whenever groups differ at
    baseline.

    Scale: treated flags come from a distinct-user relation joined
    hash-led (broadcast at dimension scale); the whole 2x2 design
    collapses in ONE aggregation pass."""
    e = t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    mid = e.agg(((F.min("us") + F.max("us")) / 2).alias("m"))
    treated = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("is_t", F.lit(1))
    )
    cells = (
        e.filter(F.col("event_type") != "purchase")
        .join(F.broadcast(treated), "user_id", "left")
        .crossJoin(F.broadcast(mid))
        .select(
            F.coalesce(F.col("is_t"), F.lit(0)).alias("treated"),
            F.when(F.col("us") >= F.col("m"), 1).otherwise(0).alias("post"),
            "value",
        )
    )
    m2 = cells.groupBy("treated", "post").agg(
        F.avg("value").alias("mu"), F.count("*").alias("n")
    )

    def cell(tr, po):
        return F.max(
            F.when(
                (F.col("treated") == tr) & (F.col("post") == po), F.col("mu")
            )
        )

    return m2.agg(
        F.sum("n").cast("long").alias("n_obs"),
        F.round(cell(1, 1), 6).alias("t_post"),
        F.round(cell(1, 0), 6).alias("t_pre"),
        F.round(cell(0, 1), 6).alias("c_post"),
        F.round(cell(0, 0), 6).alias("c_pre"),
        F.round(
            (cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0)), 6
        ).alias("did_estimate"),
    )


@query(
    "analytics_cuped",
    oracle="""
    WITH mid AS (
      SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) / 2 AS m FROM events
    ), per_user AS (
      SELECT user_id,
             avg(value) FILTER (epoch_us(ts) <  (SELECT m FROM mid)) AS pre,
             avg(value) FILTER (epoch_us(ts) >= (SELECT m FROM mid)) AS post
      FROM events GROUP BY 1
    ), both_ AS (
      SELECT pre, post FROM per_user
      WHERE pre IS NOT NULL AND post IS NOT NULL
    ), s AS (
      SELECT count(*) AS n, avg(pre) AS mp, avg(post) AS mq,
             sum(pre * post) AS spq, sum(pre * pre) AS spp,
             sum(post * post) AS sqq
      FROM both_
    ), fit AS (
      SELECT n, mp, mq,
             (spq - n * mp * mq) / (spp - n * mp * mp) AS theta,
             (sqq - n * mq * mq) / n AS var_post,
             (spq - n * mp * mq) * (spq - n * mp * mq)
               / ((spp - n * mp * mp) * (sqq - n * mq * mq)) AS rho2
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(theta, 6) AS theta,
           round(var_post, 6) AS var_raw,
           round(var_post * (1 - rho2), 6) AS var_cuped,
           round(rho2, 6) AS variance_reduction
    FROM fit
    """,
    tags=("stats", "experimentation", "events"),
)
def analytics_cuped(spark, sf_dir):
    """CUPED variance reduction (Deng et al., controlled experiments
    Using Pre-Experiment Data): theta = cov(pre, post) / var(pre) from
    per-user pre/post-midpoint means; the adjusted metric
    post - theta*(pre - mean_pre) has variance var_post * (1 - rho^2) —
    reported as the achievable variance-reduction fraction (how much
    smaller an A/B test this telemetry affords). All from one pass of
    power sums — the experimentation-platform companion to
    ab_test_proportions.

    Scale: single per-user conditional aggregate + one moment pass."""
    e = t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    mid = e.agg(((F.min("us") + F.max("us")) / 2).alias("m"))
    per_user = (
        e.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.avg(F.when(F.col("us") < F.col("m"), F.col("value"))).alias(
                "pre"
            ),
            F.avg(F.when(F.col("us") >= F.col("m"), F.col("value"))).alias(
                "post"
            ),
        )
        .filter(F.col("pre").isNotNull() & F.col("post").isNotNull())
    )
    s = per_user.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("pre").alias("mp"),
        F.avg("post").alias("mq"),
        F.sum(F.col("pre") * F.col("post")).alias("spq"),
        F.sum(F.col("pre") * F.col("pre")).alias("spp"),
        F.sum(F.col("post") * F.col("post")).alias("sqq"),
    )
    cov = F.col("spq") - F.col("n") * F.col("mp") * F.col("mq")
    vp = F.col("spp") - F.col("n") * F.col("mp") * F.col("mp")
    vq = F.col("sqq") - F.col("n") * F.col("mq") * F.col("mq")
    theta = cov / vp
    rho2 = cov * cov / (vp * vq)
    return s.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(theta, 6).alias("theta"),
        F.round(vq / F.col("n"), 6).alias("var_raw"),
        F.round((vq / F.col("n")) * (1 - rho2), 6).alias("var_cuped"),
        F.round(rho2, 6).alias("variance_reduction"),
    )


@query(
    "stat_crosstab_exact",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nation,
           CAST(count(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS BIGINT)
             AS automobile,
           CAST(count(*) FILTER (c_mktsegment = 'BUILDING') AS BIGINT)
             AS building,
           CAST(count(*) FILTER (c_mktsegment = 'FURNITURE') AS BIGINT)
             AS furniture,
           CAST(count(*) FILTER (c_mktsegment = 'HOUSEHOLD') AS BIGINT)
             AS household,
           CAST(count(*) FILTER (c_mktsegment = 'MACHINERY') AS BIGINT)
             AS machinery
    FROM customer GROUP BY 1 ORDER BY 1
    """,
    tags=("stats", "crosstab", "customer"),
)
def stat_crosstab_exact(spark, sf_dir):
    """EXACT contingency crosstab via ``df.stat.crosstab`` — the
    DataFrameStatFunctions entry point (SURVEY §2B scalar/stat
    surface), normalized to typed columns: nation x segment counts,
    zero-filled. crosstab returns string keys and value-derived column
    names; the projection pins both to a stable lowercase schema so
    the oracle's FILTER pivot matches column-for-column.

    Scale: crosstab is one groupBy(a, b) count + a driver-side pivot
    of the (|a| x |b|)-bounded result — dimension-sized, fine
    whenever the category product is (nations x segments here)."""
    c = t(spark, sf_dir, "customer")
    ct = c.stat.crosstab("c_nationkey", "c_mktsegment")
    return (
        ct.select(
            F.col("c_nationkey_c_mktsegment").cast("long").alias("nation"),
            F.col("AUTOMOBILE").alias("automobile"),
            F.col("BUILDING").alias("building"),
            F.col("FURNITURE").alias("furniture"),
            F.col("HOUSEHOLD").alias("household"),
            F.col("MACHINERY").alias("machinery"),
        )
        .orderBy("nation")
    )


@query(
    "analytics_stl_lite",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS y
      FROM orders GROUP BY 1
    ), trend AS (
      SELECT d, y, avg(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                                AND 3 FOLLOWING) AS tr
      FROM daily
    ), seas AS (
      SELECT d, y, tr,
             avg(y - tr) OVER (PARTITION BY dayofweek(d)) AS s
      FROM trend
    )
    SELECT CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           round(max(s), 4) AS seasonal,
           round(avg(abs(y - tr - s)), 4) AS mean_abs_residual
    FROM seas GROUP BY 1 ORDER BY 1
    """,
    tags=("stats", "timeseries", "orders"),
)
def analytics_stl_lite(spark, sf_dir):
    """STL-LITE seasonal decomposition of daily revenue: centered
    7-day moving-average TREND, day-of-week mean-of-detrended
    SEASONAL, and the residual magnitude per weekday — the one-pass
    relational approximation of STL (no loess, no iteration) that
    answers 'is the weekly cycle real and how big is what's left'.

    Scale: both windows run over the calendar-bounded daily relation;
    the weekday partition has 7 groups of ~n_days/7 rows each."""
    daily = t(spark, sf_dir, "orders").groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(F.sum("o_totalprice").alias("y"))
    wtr = Window.orderBy("d").rowsBetween(-3, 3)
    trend = daily.select("d", "y", F.avg("y").over(wtr).alias("tr"))
    dow = F.dayofweek("d")
    seas = trend.withColumn(
        "s", F.avg(F.col("y") - F.col("tr")).over(Window.partitionBy(dow))
    )
    return (
        seas.groupBy(dow.cast("long").alias("dow"))
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.round(F.max("s"), 4).alias("seasonal"),
            F.round(
                F.avg(F.abs(F.col("y") - F.col("tr") - F.col("s"))), 4
            ).alias("mean_abs_residual"),
        )
        .orderBy("dow")
    )


@query(
    "analytics_weighted_metric_trap",
    oracle="""
    WITH li AS (
      SELECT l_returnflag AS flag, l_quantity AS q,
             l_extendedprice / l_quantity AS unit_price
      FROM lineitem WHERE l_quantity > 0
    )
    SELECT flag, CAST(count(*) AS BIGINT) AS n,
           round(avg(unit_price), 4) AS avg_of_ratios,
           round(sum(unit_price * q) / sum(q), 4)
             AS qty_weighted_ratio,
           round(sum(unit_price * q) / sum(q) - avg(unit_price), 4)
             AS weighting_gap
    FROM li GROUP BY 1 ORDER BY 1
    """,
    tags=("stats", "dq", "lineitem"),
)
def analytics_weighted_metric_trap(spark, sf_dir):
    """The WEIGHTED-METRIC TRAP made visible: per flag, the naive
    average of per-line unit prices vs the quantity-weighted average
    (ratio of sums), plus their gap — the aggregation-design bug class
    (avg-of-ratios treats a 1-unit line and a 50-unit line as equal
    evidence) that silently skews every dashboard it touches. A
    nonzero gap quantifies how much the metric definition matters on
    THIS data.

    Scale: one map-side-combining aggregate; both definitions ride the
    same pass."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    up = F.col("l_extendedprice") / F.col("l_quantity")
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg(up), 4).alias("avg_of_ratios"),
            F.round(
                F.sum(up * F.col("l_quantity")) / F.sum("l_quantity"), 4
            ).alias("qty_weighted_ratio"),
            F.round(
                F.sum(up * F.col("l_quantity")) / F.sum("l_quantity")
                - F.avg(up),
                4,
            ).alias("weighting_gap"),
        )
        .orderBy("flag")
    )


@query(
    "dq_value_drift_psi",
    oracle="""
    WITH mid AS (
      SELECT quantile_cont(epoch_us(o_orderdate), 0.5) AS m FROM orders
    ), lab AS (
      SELECT o_totalprice AS v,
             CASE WHEN epoch_us(o_orderdate) <= (SELECT m FROM mid)
                  THEN 'ref' ELSE 'tgt' END AS half
      FROM orders
    ), q AS (
      SELECT unnest(quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5,
                                      0.6, 0.7, 0.8, 0.9])) AS thr
      FROM lab WHERE half = 'ref'
    ), binned AS (
      SELECT half,
             1 + (SELECT count(*) FROM q WHERE q.thr < lab.v) AS bin
      FROM lab
    ), cnt AS (
      SELECT bin,
             count(*) FILTER (half = 'ref') AS nr,
             count(*) FILTER (half = 'tgt') AS nt
      FROM binned GROUP BY 1
    ), tot AS (
      SELECT sum(nr) AS tr, sum(nt) AS tt FROM cnt
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           round(nr * 1.0 / (SELECT tr FROM tot), 6) AS p_ref,
           round(nt * 1.0 / (SELECT tt FROM tot), 6) AS p_tgt,
           round((nt * 1.0 / (SELECT tt FROM tot)
                  - nr * 1.0 / (SELECT tr FROM tot))
                 * ln((nt * 1.0 / (SELECT tt FROM tot))
                      / (nr * 1.0 / (SELECT tr FROM tot))), 6)
             AS psi_contribution
    FROM cnt ORDER BY bin
    """,
    tags=("dq", "drift", "orders"),
)
def dq_value_drift_psi(spark, sf_dir):
    """POPULATION STABILITY INDEX: order totals in the later half of
    history vs reference deciles fit on the earlier half — the ML-ops
    drift metric (PSI > 0.2 = retrain). Reference-decile bin edges come
    from exact interpolated quantiles of the reference half; both
    halves are bucketed against the SAME nine thresholds and each bin
    contributes (p_t - p_r)·ln(p_t/p_r).

    Scale: the nine reference deciles come from
    ``operators.exact_quantiles`` (two-pass rank over the unbounded
    order totals — not the single-reducer ``percentile`` map); the
    median-date split stays a plain ``percentile`` because its input
    is calendar-bounded. The 9-row threshold relation broadcasts into
    a single bucketing pass (count of thresholds below v == bin index
    — no CASE ladder to keep in sync); everything after is a 10-row
    rollup."""
    from gcp_etl_spark.operators.quantiles import prefer_agg

    o = t(spark, sf_dir, "orders").withColumn(
        "us", F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    )
    mid = o.agg(F.expr("percentile(us, 0.5)").alias("m"))
    lab = o.crossJoin(F.broadcast(mid)).select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("us") <= F.col("m"), "ref").otherwise("tgt").alias(
            "half"
        ),
    )
    # decide the quantile strategy on the PLANNED relation (Catalyst
    # stats are still attached here), THEN cut lineage: without the
    # barrier the scan -> median -> label subtree re-expanded into
    # every consumer (16 orders scans / 6 percentile aggs in one plan
    # — r12, guide §1.2); a checkpointed RDD carries no size estimate,
    # so the strategy gate must fire before the barrier to stay
    # scale-adaptive (agg here, two-pass rank at 100 TB estimates)
    ref = lab.filter(F.col("half") == "ref")
    strat = "agg" if prefer_agg(ref.select(F.col("v").cast("double"))) else "rank"
    lab = lab.transform(barrier)
    q = exact_quantiles(
        lab.filter(F.col("half") == "ref"),
        "v",
        {f"t{i}": i / 10 for i in range(1, 10)},
        strategy=strat,
    )
    thr = F.array(*[F.col(f"t{i}") for i in range(1, 10)])
    binned = lab.crossJoin(F.broadcast(q)).select(
        "half",
        (
            1 + F.size(F.filter(thr, lambda x: x < F.col("v")))
        ).alias("bin"),
    )
    cnt = binned.groupBy("bin").agg(
        F.count(F.when(F.col("half") == "ref", 1)).alias("nr"),
        F.count(F.when(F.col("half") == "tgt", 1)).alias("nt"),
    ).transform(barrier)  # <=10 rows; feeds tot AND the final join
    tot = cnt.agg(F.sum("nr").alias("tr"), F.sum("nt").alias("tt"))
    j = cnt.crossJoin(F.broadcast(tot))
    p_ref = F.col("nr") * 1.0 / F.col("tr")
    p_tgt = F.col("nt") * 1.0 / F.col("tt")
    return j.select(
        F.col("bin").cast("long").alias("bin"),
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_tgt, 6).alias("p_tgt"),
        F.round((p_tgt - p_ref) * F.log(p_tgt / p_ref), 6).alias(
            "psi_contribution"
        ),
    ).orderBy("bin")


@query(
    "events_dau_wau_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), days AS (SELECT DISTINCT d FROM ud),
    dau AS (
      SELECT d, count(*) AS dau FROM ud GROUP BY 1
    ), wau AS (
      SELECT days.d, count(DISTINCT ud.user_id) AS wau
      FROM days JOIN ud
        ON ud.d <= days.d AND ud.d > days.d - INTERVAL 7 DAY
      GROUP BY 1
    )
    SELECT dau.d AS day, CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           round(dau.dau * 1.0 / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    ORDER BY day
    """,
    tags=("analytics", "engagement", "events"),
)
def events_dau_wau_stickiness(spark, sf_dir):
    """DAU / trailing-7-day WAU / stickiness (DAU÷WAU) per day — the
    engagement headline triple. The trailing-window DISTINCT cannot
    ride a window function (count distinct over RANGE isn't
    supported); the standard relational shape: the deduped (user, day)
    relation joined to the calendar on the 7-day band, then distinct
    per anchor day.

    Scale: (user, day) is the bounded activity grid (entity x
    calendar); the band join replicates it at most 7x — the same
    bounded-replication argument as join_interval_banded."""
    e = t(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    days = ud.select("d").distinct()
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    a = days.select(F.col("d").alias("anchor"))
    wau = (
        ud.join(
            F.broadcast(a),
            (F.col("d") <= F.col("anchor"))
            & (F.col("d") > F.date_sub(F.col("anchor"), 7)),
        )
        .groupBy("anchor")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.d == wau.anchor)
        .select(
            F.col("d").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(F.col("dau") * 1.0 / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


@query(
    "analytics_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS y
      FROM orders GROUP BY 1
    ), mean_ AS (SELECT avg(y) AS mu FROM daily),
    cum AS (
      SELECT d,
             sum(y - (SELECT mu FROM mean_)) OVER (ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS c
      FROM daily
    ), dd AS (
      SELECT d, c,
             max(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS peak
      FROM cum
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(max(peak - c), 2) AS max_drawdown,
           CAST(max_by(d, peak - c) AS DATE) AS trough_day,
           round(max(peak), 2) AS max_peak
    FROM dd
    """,
    tags=("stats", "timeseries", "orders"),
)
def analytics_max_drawdown(spark, sf_dir):
    """MAXIMUM DRAWDOWN of the demeaned cumulative revenue series (the
    'performance vs expectation' curve: cumsum of daily revenue minus
    the mean day): largest peak-to-trough fall plus the trough date —
    the risk metric answering 'how far below the best run-rate did we
    slip, and when'. One running sum and one running max — both over
    the calendar-bounded daily relation.

    max_by tie-break: both engines pick the argmax of the SAME exact
    double expression; ties are measure-zero on real revenue."""
    daily = t(spark, sf_dir, "orders").groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(F.sum("o_totalprice").alias("y"))
    mu = daily.agg(F.avg("y").alias("mu"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.crossJoin(F.broadcast(mu)).select(
        "d", F.sum(F.col("y") - F.col("mu")).over(w).alias("c")
    )
    dd = cum.select("d", "c", F.max("c").over(w).alias("peak"))
    gap = F.col("peak") - F.col("c")
    return dd.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(F.max(gap), 2).alias("max_drawdown"),
        F.expr("max_by(d, peak - c)").alias("trough_day"),
        F.round(F.max("peak"), 2).alias("max_peak"),
    )


@query(
    "analytics_hhi_trend",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
             c.c_mktsegment AS seg, sum(o.o_totalprice) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT mon, sum(rev) AS tr, count(*) AS k FROM m GROUP BY 1
    )
    SELECT CAST(m.mon AS DATE) AS month,
           CAST(max(tot.k) AS BIGINT) AS n_segments,
           round(sum((m.rev / tot.tr) * (m.rev / tot.tr)), 6) AS hhi
    FROM m JOIN tot ON tot.mon = m.mon
    GROUP BY 1 ORDER BY 1
    """,
    tags=("stats", "concentration", "orders"),
)
def analytics_hhi_trend(spark, sf_dir):
    """CONCENTRATION TREND: monthly Herfindahl index of revenue across
    market segments — the temporal extension of analytics_herfindahl
    that shows whether revenue is concentrating (HHI rising) or
    diversifying over the business's history.

    Scale: one broadcast-dim join + (month x segment)-bounded
    aggregate; per-month share algebra on that tiny relation."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    m = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.date_trunc("month", F.to_date("o_orderdate")).cast("date").alias("mon"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    tot = m.groupBy("mon").agg(
        F.sum("rev").alias("tr"), F.count("*").alias("k")
    )
    share = F.col("rev") / F.col("tr")
    return (
        m.join(tot, "mon")
        .groupBy(F.col("mon").alias("month"))
        .agg(
            F.max("k").cast("long").alias("n_segments"),
            F.round(F.sum(share * share), 6).alias("hhi"),
        )
        .orderBy("month")
    )
