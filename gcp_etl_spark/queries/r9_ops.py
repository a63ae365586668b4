"""Round-9 operators: the remaining classical-stats battery gaps
(Friedman / Cochran's Q / Cliff's delta / Jarque-Bera / Grubbs / Tukey
fences / Durbin-Watson / Ljung-Box / Page-Hinkley / Bartlett / McNemar
/ Welch), graph label propagation + HITS, and LLM-curation ops
(Kneser-Ney bigram LM, mixture weights, curriculum phases).

Exactness conventions (the kruskal/skew-kurt house rules):
- rank statistics accumulate DOUBLED mid-ranks as integers;
- moment statistics accumulate exact DECIMAL power sums, cast to
  double only for the final closed-form statistic, rounded 6dp;
- libm terms inside a sum are cast to DECIMAL per-term so the sum is
  order-free (the text_bigram_lm trick);
- time-series statistics run on the CALENDAR-BOUNDED daily relation
  (≤ |days| rows at any corpus size), so their single-partition
  windows are structurally safe.

No reference counterpart (the reference's query surface is
k8s/submit/etl-on-gcp-vinicius-campos.py:22-92 — SELECT * LIMIT 100
plus two counts); these extend the declared analytics/LLM surface.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t
from gcp_etl_spark.operators.barrier import barrier

# --------------------------------------------------- Friedman test

_FR_BLOCKS = 30  # user_id % blocks = the repeated-measures subject


@query(
    "stats_friedman_test",
    oracle=f"""
    WITH k AS (SELECT count(DISTINCT event_type) AS k FROM events),
    cell AS (
      SELECT user_id % {_FR_BLOCKS} AS blk, event_type AS trt,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ), full_blk AS (
      SELECT blk FROM cell GROUP BY blk
      HAVING count(*) = (SELECT k FROM k)
    ), ranked AS (
      SELECT c.blk, c.trt, c.cnt,
             rank() OVER (PARTITION BY c.blk ORDER BY c.cnt) AS r,
             count(*) OVER (PARTITION BY c.blk, c.cnt) AS tie
      FROM cell c JOIN full_blk USING (blk)
    ), rs AS (
      SELECT trt, sum(2 * r + tie - 1) AS r2_j FROM ranked GROUP BY trt
    ), ties AS (
      SELECT blk, cnt, count(*) AS tt FROM ranked GROUP BY 1, 2
    ), agg AS (
      SELECT (SELECT count(*) FROM full_blk) AS b,
             (SELECT k FROM k) AS k,
             (SELECT sum(r2_j * r2_j) FROM rs) AS sr2,
             (SELECT sum(tt * tt * tt - tt) FROM ties) AS tsum
    )
    SELECT CAST(b AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k,
           round(3.0 / (b * k * (k + 1.0)) * sr2 - 3.0 * b * (k + 1),
                 6) AS chi2_f,
           round((3.0 / (b * k * (k + 1.0)) * sr2 - 3.0 * b * (k + 1))
                 / (1.0 - CAST(tsum AS DOUBLE)
                          / (b * k * (CAST(k AS DOUBLE) * k - 1))),
                 6) AS chi2_f_tie_corrected
    FROM agg
    """,
    tags=("stats", "hypothesis-test", "rank", "events"),
)
def stats_friedman_test(spark, sf_dir):
    """FRIEDMAN TEST (rank two-way ANOVA for repeated measures): b
    subject blocks (user_id buckets) × k treatments (event types),
    response = per-cell event count, mid-ranked WITHIN each block;
    χ²_F = 12/(bk(k+1))·Σ R_j² − 3b(k+1), plus the standard tie
    correction 1 − Σ(t³−t)/(bk(k²−1)). Only COMPLETE blocks (all k
    treatments present) enter, computed identically in both engines.

    INTEGER-EXACT RANK SUMS: within a block, 2·midrank = 2·rank_min +
    ties − 1 is an integer, so Σ_j R_j² uses exact longs via the
    doubled-rank identity Σ(2R_j)² = 4·Σ R_j² (the kruskal convention);
    floats appear only in the final statistic.

    Scale: block cells are a bounded hash agg; the within-block rank
    window partitions by block with exactly k rows per partition —
    parallelism = #blocks, no global sort."""
    e = t(spark, sf_dir, "events")
    cell = e.groupBy(
        (F.col("user_id") % _FR_BLOCKS).alias("blk"),
        F.col("event_type").alias("trt"),
    ).agg(F.count("*").alias("cnt"))
    k1 = e.agg(F.countDistinct("event_type").alias("k"))
    full_blk = (
        cell.groupBy("blk")
        .agg(F.count("*").alias("nt"))
        .crossJoin(F.broadcast(k1))
        .filter(F.col("nt") == F.col("k"))
        .select("blk")
    )
    ranked = cell.join(F.broadcast(full_blk), "blk").select(
        "blk",
        "trt",
        "cnt",
        F.rank().over(Window.partitionBy("blk").orderBy("cnt")).alias("r"),
        F.count("*")
        .over(Window.partitionBy("blk", "cnt"))
        .alias("tie"),
    )
    rs = ranked.groupBy("trt").agg(
        F.sum(2 * F.col("r") + F.col("tie") - 1).alias("r2_j")
    )
    ties = ranked.groupBy("blk", "cnt").agg(F.count("*").alias("tt"))
    b1 = full_blk.agg(F.count("*").alias("b"))
    sr2 = rs.agg(F.sum(F.col("r2_j") * F.col("r2_j")).alias("sr2"))
    tsum = ties.agg(
        F.sum(
            F.col("tt") * F.col("tt") * F.col("tt") - F.col("tt")
        ).alias("tsum")
    )
    agg = (
        b1.crossJoin(F.broadcast(k1))
        .crossJoin(F.broadcast(sr2))
        .crossJoin(F.broadcast(tsum))
    )
    bb, kk = F.col("b"), F.col("k")
    raw = (
        F.lit(3.0) / (bb * kk * (kk + F.lit(1.0))) * F.col("sr2")
        - F.lit(3.0) * bb * (kk + 1)
    )
    corr = raw / (
        F.lit(1.0)
        - F.col("tsum").cast("double")
        / (bb * kk * (kk.cast("double") * kk - 1))
    )
    return agg.select(
        bb.cast("long").alias("n_blocks"),
        kk.cast("long").alias("k"),
        F.round(raw, 6).alias("chi2_f"),
        F.round(corr, 6).alias("chi2_f_tie_corrected"),
    )


# --------------------------------------------------- Cochran's Q

_CQ_BLOCKS = 40
_CQ_THRESH = 49.0  # ~median of value, so the first-event flag is ~Bernoulli(.5)


@query(
    "stats_cochran_q",
    oracle=f"""
    WITH k AS (SELECT count(DISTINCT event_type) AS k FROM events),
    cell AS (
      SELECT user_id % {_CQ_BLOCKS} AS blk, event_type AS trt,
             CASE WHEN arg_min(value, event_id) > {_CQ_THRESH}
                  THEN 1 ELSE 0 END AS x
      FROM events GROUP BY 1, 2
    ), full_blk AS (
      SELECT blk FROM cell GROUP BY blk
      HAVING count(*) = (SELECT k FROM k)
    ), kept AS (
      SELECT c.* FROM cell c JOIN full_blk USING (blk)
    ), col_tot AS (SELECT trt, sum(x) AS cj FROM kept GROUP BY trt),
    row_tot AS (SELECT blk, sum(x) AS ri FROM kept GROUP BY blk),
    agg AS (
      SELECT (SELECT k FROM k) AS k,
             (SELECT count(*) FROM full_blk) AS b,
             (SELECT sum(cj) FROM col_tot) AS n,
             (SELECT sum(cj * cj) FROM col_tot) AS sc2,
             (SELECT sum(ri) FROM row_tot) AS sr,
             (SELECT sum(ri * ri) FROM row_tot) AS sr2
    )
    SELECT CAST(b AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k,
           CAST(n AS BIGINT) AS n_success,
           round(CAST(k - 1 AS DOUBLE) * (k * sc2 - CAST(n AS DOUBLE) * n)
                 / (k * sr - sr2), 6) AS q
    FROM agg
    """,
    tags=("stats", "hypothesis-test", "binary", "events"),
)
def stats_cochran_q(spark, sf_dir):
    """COCHRAN'S Q (k-treatment extension of McNemar for binary
    repeated measures): per (user-block, event-type) the binary
    response is "the cell's FIRST event is over the value threshold"
    (a fixed-size property — see the inline note); Q = (k−1)·
    (k·ΣC_j² − N²) / (k·ΣR_i − ΣR_i²) over complete blocks. Every
    accumulator is an integer — the single float is the final ratio.

    Scale: two bounded hash aggs (column totals over k treatments, row
    totals over b blocks) after one map-side cell aggregation; nothing
    driver-bound."""
    e = t(spark, sf_dir, "events")
    cell = e.groupBy(
        (F.col("user_id") % _CQ_BLOCKS).alias("blk"),
        F.col("event_type").alias("trt"),
    ).agg(
        # x = "first event (min event_id) over the threshold": a
        # FIXED-SIZE property of the cell, so it stays ~Bernoulli(.5)
        # as cells grow with corpus size — any max/avg/majority flag
        # CONCENTRATES with cell size and degenerates Q's denominator
        # to zero at larger scale factors (observed at sf0.01)
        F.when(
            F.min(F.struct("event_id", "value")).getField("value")
            > _CQ_THRESH,
            1,
        )
        .otherwise(0)
        .alias("x")
    )
    k1 = e.agg(F.countDistinct("event_type").alias("k"))
    full_blk = (
        cell.groupBy("blk")
        .agg(F.count("*").alias("nt"))
        .crossJoin(F.broadcast(k1))
        .filter(F.col("nt") == F.col("k"))
        .select("blk")
    )
    kept = cell.join(F.broadcast(full_blk), "blk")
    col_tot = kept.groupBy("trt").agg(F.sum("x").alias("cj"))
    row_tot = kept.groupBy("blk").agg(F.sum("x").alias("ri"))
    agg = (
        k1.crossJoin(
            F.broadcast(full_blk.agg(F.count("*").alias("b")))
        )
        .crossJoin(
            F.broadcast(
                col_tot.agg(
                    F.sum("cj").alias("n"),
                    F.sum(F.col("cj") * F.col("cj")).alias("sc2"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                row_tot.agg(
                    F.sum("ri").alias("sr"),
                    F.sum(F.col("ri") * F.col("ri")).alias("sr2"),
                )
            )
        )
    )
    kk = F.col("k")
    q = (
        (kk - 1).cast("double")
        * (kk * F.col("sc2") - F.col("n").cast("double") * F.col("n"))
        / (kk * F.col("sr") - F.col("sr2"))
    )
    return agg.select(
        F.col("b").cast("long").alias("n_blocks"),
        kk.cast("long").alias("k"),
        F.col("n").cast("long").alias("n_success"),
        F.round(q, 6).alias("q"),
    )


# --------------------------------------------------- Cliff's delta

_CD_A, _CD_B = "click", "view"


@query(
    "stats_cliffs_delta",
    oracle=f"""
    WITH g AS (
      SELECT value,
             count(*) FILTER (event_type = '{_CD_A}') AS c1,
             count(*) FILTER (event_type = '{_CD_B}') AS c2
      FROM events WHERE event_type IN ('{_CD_A}', '{_CD_B}')
      GROUP BY value
    ), cum AS (
      SELECT value, c1, c2,
             sum(c1) OVER (ORDER BY value) AS s1,
             sum(c2) OVER (ORDER BY value) AS s2
      FROM g
    ), agg AS (
      SELECT sum(c1 * (s2 - c2)) AS gt, sum(c2 * (s1 - c1)) AS lt,
             sum(c1) AS n1, sum(c2) AS n2
      FROM cum
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(gt AS BIGINT) AS n_greater, CAST(lt AS BIGINT) AS n_less,
           round((gt - lt) / (1.0 * n1 * n2), 6) AS cliffs_delta
    FROM agg
    """,
    tags=("stats", "effect-size", "rank", "events"),
)
def stats_cliffs_delta(spark, sf_dir):
    """CLIFF'S DELTA (ordinal effect size, the robust companion to the
    suite's Mann-Whitney): δ = (#{x>y} − #{x<y}) / (n₁n₂) between two
    event-type groups — WITHOUT materializing the n₁×n₂ pair matrix.
    Pairs are counted analytically from the DISTINCT-VALUE relation:
    #{x>y} = Σ_v c₁(v)·cum₂(v⁻), an integer fold over one cumulative
    pass (the engine's range_prefix_sums primitive carries both
    groups' counts in a single exchange).

    Scale: |distinct values| rows after a map-side collapse; the
    cumulative sums ride the standard two-pass range exchange — the
    naive pairwise definition would be 10¹⁸ pairs at 10⁹ rows/group."""
    from gcp_etl_spark.operators.quantiles import range_prefix_sums

    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_CD_A, _CD_B)
    )
    g = e.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == _CD_A, 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == _CD_B, 1)).alias("c2"),
    )
    cum, _ = range_prefix_sums(g, ["value"], ["c1", "c2"])
    agg = cum.agg(
        F.sum(
            F.col("c1") * (F.col("c2_cum") - F.col("c2"))
        ).alias("gt"),
        F.sum(
            F.col("c2") * (F.col("c1_cum") - F.col("c1"))
        ).alias("lt"),
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
    )
    return agg.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("gt").cast("long").alias("n_greater"),
        F.col("lt").cast("long").alias("n_less"),
        F.round(
            (F.col("gt") - F.col("lt"))
            / (F.lit(1.0) * F.col("n1") * F.col("n2")),
            6,
        ).alias("cliffs_delta"),
    )


# ------------------------------------------- Jarque-Bera normality

def _moment_sums(df, col):
    """Exact decimal power sums S1..S4 of a 2dp-valued double column
    (the agg_skew_kurt convention: v, v², v³, v⁴ are exact at
    2/4/6/8 dp and below the decimal widths, so the double→decimal
    casts are lossless in both engines)."""
    v = F.col(col)
    return [
        F.count("*").cast("double").alias("n"),
        F.sum(v.cast("decimal(18,2)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(28,4)")).cast("double").alias("s2"),
        F.sum((v * v * v).cast("decimal(32,6)")).cast("double").alias("s3"),
        F.sum(
            (v * v * v * v).cast("decimal(38,8)")
        ).cast("double").alias("s4"),
    ]


_JB_MOMENTS_SQL = """
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS s2,
             CAST(sum(CAST(value * value * value AS DECIMAL(32,6)))
                  AS DOUBLE) AS s3,
             CAST(sum(CAST(value * value * value * value AS DECIMAL(38,8)))
                  AS DOUBLE) AS s4
      FROM events
"""


@query(
    "stats_jarque_bera",
    oracle=f"""
    WITH m AS ({_JB_MOMENTS_SQL}),
    c AS (
      SELECT n,
             (s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3))
               / pow(s2 / n - pow(s1 / n, 2), 1.5) AS skew,
             (s4 / n - 4 * (s1 / n) * (s3 / n)
              + 6 * pow(s1 / n, 2) * (s2 / n) - 3 * pow(s1 / n, 4))
               / pow(s2 / n - pow(s1 / n, 2), 2) - 3 AS ekurt
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(skew, 6) AS skew, round(ekurt, 6) AS excess_kurt,
           round(n / 6.0 * (skew * skew + ekurt * ekurt / 4.0), 4) AS jb
    FROM c
    """,
    tags=("stats", "hypothesis-test", "normality", "events"),
)
def stats_jarque_bera(spark, sf_dir):
    """JARQUE-BERA normality test: JB = n/6·(S² + K²/4) from population
    skewness S and excess kurtosis K. Moments come from exact DECIMAL
    power sums (one map-side-combinable aggregate; the agg_skew_kurt
    moment algebra) so the statistic is identical cross-engine up to
    the final IEEE arithmetic, rounded.

    Scale: ONE aggregation pass, four decimal accumulators — no second
    scan for the mean, no per-row deviation materialization."""
    e = t(spark, sf_dir, "events")
    m = e.agg(*_moment_sums(e, "value"))
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mean = s1 / n
    m2 = s2 / n - mean * mean
    skew = (
        s3 / n - 3 * mean * (s2 / n) + 2 * F.pow(mean, 3)
    ) / F.pow(m2, 1.5)
    ekurt = (
        s4 / n
        - 4 * mean * (s3 / n)
        + 6 * F.pow(mean, 2) * (s2 / n)
        - 3 * F.pow(mean, 4)
    ) / F.pow(m2, 2) - 3
    return m.select(
        n.cast("long").alias("n"),
        F.round(skew, 6).alias("skew"),
        F.round(ekurt, 6).alias("excess_kurt"),
        F.round(n / 6.0 * (skew * skew + ekurt * ekurt / 4.0), 4).alias(
            "jb"
        ),
    )


# --------------------------------------------------- Grubbs statistic


@query(
    "stats_grubbs_max_outlier",
    oracle="""
    WITH m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS s2
      FROM events
    ), c AS (
      SELECT n, s1 / n AS mu,
             sqrt((s2 - s1 * s1 / n) / (n - 1)) AS s
      FROM m
    ), dev AS (
      SELECT e.value, abs(e.value - c.mu) AS d, c.n, c.mu, c.s
      FROM events e CROSS JOIN c
    ), mx AS (SELECT max(d) AS dmax FROM dev)
    SELECT CAST(max(n) AS BIGINT) AS n,
           round(max(dmax) / max(s), 6) AS g,
           min(value) AS outlier_value
    FROM dev CROSS JOIN mx WHERE d = dmax
    """,
    tags=("stats", "outlier", "events"),
)
def stats_grubbs_max_outlier(spark, sf_dir):
    """GRUBBS' statistic G = max|x − x̄| / s (sample s): the classical
    single-outlier screen. Mean and s come from exact decimal sums, so
    the per-row deviation |x − x̄| is the same double everywhere and
    the argmax row is engine-independent; ties on the max deviation
    resolve to the smallest value.

    Scale: one moment pass + one max pass over the scan — the
    deviation never shuffles (the 1-row stats relation is broadcast),
    and the argmax filter is a map-side compare against two broadcast
    scalars."""
    e = t(spark, sf_dir, "events")
    v = F.col("value")
    m = e.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(v.cast("decimal(18,2)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(28,4)")).cast("double").alias("s2"),
    )
    c = m.select(
        "n",
        (F.col("s1") / F.col("n")).alias("mu"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("s"),
    )
    dev = e.select("value").crossJoin(F.broadcast(c)).select(
        "value", F.abs(v - F.col("mu")).alias("d"), "n", "s"
    )
    mx = dev.agg(F.max("d").alias("dmax"))
    return (
        dev.crossJoin(F.broadcast(mx))
        .filter(F.col("d") == F.col("dmax"))
        .agg(
            F.max("n").cast("long").alias("n"),
            F.round(F.max("dmax") / F.max("s"), 6).alias("g"),
            F.min("value").alias("outlier_value"),
        )
    )


# --------------------------------------------------- Tukey fences


@query(
    "anomaly_tukey_fences",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           round(max(q.q1), 6) AS q1, round(max(q.q3), 6) AS q3,
           CAST(count(*) FILTER (
             e.value < q.q1 - 1.5 * (q.q3 - q.q1)
             OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)) AS BIGINT)
             AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type
    """,
    tags=("stats", "outlier", "quantile", "events"),
)
def anomaly_tukey_fences(spark, sf_dir):
    """TUKEY FENCES outlier screen per event type: flag values outside
    [Q1 − 1.5·IQR, Q3 + 1.5·IQR]. Quartiles come from the engine's
    two-pass range-partitioned ``exact_quantiles`` (quantile_cont
    semantics, identical to the DuckDB oracle) — never the
    single-reducer percentile aggregate; the fence compare is a
    map-side filter against the broadcast per-group quartile relation.

    Scale: bounded group count (event types) with unbounded values per
    group — exactly exact_quantiles' intended regime; the outlier
    count pass re-scans the source once with the fences broadcast."""
    from gcp_etl_spark.operators.quantiles import exact_quantiles

    e = t(spark, sf_dir, "events").select("event_type", "value")
    q = exact_quantiles(
        e, "value", {"q1": 0.25, "q3": 0.75}, group_cols=["event_type"]
    )
    iqr = F.col("q3") - F.col("q1")
    j = e.join(F.broadcast(q), "event_type")
    out = (
        F.col("value") < F.col("q1") - 1.5 * iqr
    ) | (F.col("value") > F.col("q3") + 1.5 * iqr)
    return j.groupBy("event_type").agg(
        F.round(F.max("q1"), 6).alias("q1"),
        F.round(F.max("q3"), 6).alias("q3"),
        F.count(F.when(out, 1)).cast("long").alias("n_outliers"),
        F.count("*").cast("long").alias("n"),
    )


# ---------------------------------- calendar-daily time-series tests
#
# All three share the CALENDAR-BOUNDED daily-revenue series (<= |days|
# rows at ANY corpus size — 2,399 days in the fixture, ~3k for a
# decade of data), so the single-partition windows over the series are
# structurally safe; the heavy work is the map-side-combinable daily
# aggregation underneath. y is integer CENTS (round(price*100) —
# exact, the io_merge_upsert convention), so every prefix/lag operand
# is engine-identical.

_DAILY_SQL = """
      SELECT CAST(o_orderdate AS DATE) AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1
"""


def _daily(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
    )
    return d.select(
        "day",
        "y",
        F.row_number().over(Window.orderBy("day")).alias("t"),
    )


@query(
    "stats_durbin_watson",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    idx AS (
      SELECT day, y, row_number() OVER (ORDER BY day) AS t FROM daily
    ), s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(t AS HUGEINT)) AS DOUBLE) AS st,
             CAST(sum(CAST(t AS HUGEINT) * t) AS DOUBLE) AS st2,
             CAST(sum(CAST(t AS HUGEINT) * y) AS DOUBLE) AS sty,
             CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy
      FROM idx
    ), fit AS (
      SELECT n, st, sy,
             (n * sty - st * sy) / (n * st2 - st * st) AS b
      FROM s
    ), res AS (
      SELECT t,
             y - (sy - b * st) / n - b * t AS e,
             lag(y - (sy - b * st) / n - b * t)
               OVER (ORDER BY t) AS e_prev
      FROM idx CROSS JOIN fit
    )
    SELECT CAST((SELECT n FROM s) AS BIGINT) AS n_days,
           round((SELECT b FROM fit), 6) AS slope_cents_per_day,
           round(CAST((SELECT sum(CAST((e - e_prev) * (e - e_prev)
                                       AS DECIMAL(38,6)))
                       FROM res WHERE e_prev IS NOT NULL) AS DOUBLE)
                 / CAST((SELECT sum(CAST(e * e AS DECIMAL(38,6)))
                         FROM res) AS DOUBLE), 6) AS dw
    """,
    tags=("stats", "time-series", "autocorrelation", "orders"),
)
def stats_durbin_watson(spark, sf_dir):
    """DURBIN-WATSON test for lag-1 autocorrelation in the residuals of
    the daily-revenue trend regression: fit y_t = a + b·t by closed-form
    OLS (slope/intercept from exact integer sums Σt, Σt², Σty, Σy —
    cast to double once), then DW = Σ(e_t − e_{t−1})² / Σe_t². Each
    squared residual term is cast to DECIMAL before summing so the two
    sums are order-free (the text_bigram_lm per-term trick); residual
    operands are bit-identical cross-engine because a and b are.

    Scale: the only unbounded work is the daily aggregation (map-side
    combinable); the OLS sums, the lag window, and the two residual
    sums all run on the calendar-bounded series."""
    idx = _daily(spark, sf_dir)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = idx.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec(F.col("t"))).cast("double").alias("st"),
        F.sum(dec(F.col("t")) * F.col("t")).cast("double").alias("st2"),
        F.sum(dec(F.col("t")) * F.col("y")).cast("double").alias("sty"),
        F.sum(dec(F.col("y"))).cast("double").alias("sy"),
    )
    fit = s.select(
        "n",
        "st",
        "sy",
        (
            (F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
            / (F.col("n") * F.col("st2") - F.col("st") * F.col("st"))
        ).alias("b"),
    )
    e = (
        F.col("y")
        - (F.col("sy") - F.col("b") * F.col("st")) / F.col("n")
        - F.col("b") * F.col("t")
    )
    res = idx.crossJoin(F.broadcast(fit)).select(
        "n",
        "b",
        e.alias("e"),
        F.lag(e).over(Window.orderBy("t")).alias("e_prev"),
    )
    d6 = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    return res.agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(F.max("b"), 6).alias("slope_cents_per_day"),
        F.round(
            F.sum(
                F.when(
                    F.col("e_prev").isNotNull(),
                    d6(
                        (F.col("e") - F.col("e_prev"))
                        * (F.col("e") - F.col("e_prev"))
                    ),
                )
            ).cast("double")
            / F.sum(d6(F.col("e") * F.col("e"))).cast("double"),
            6,
        ).alias("dw"),
    )


_LB_LAGS = 5


@query(
    "stats_ljung_box",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    idx AS (
      SELECT y, row_number() OVER (ORDER BY day) AS t FROM daily
    ), s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy
      FROM idx
    ), d AS (
      SELECT t, y - (SELECT sy / n FROM s) AS dy FROM idx
    ), den AS (
      SELECT CAST(sum(CAST(dy * dy AS DECIMAL(38,6))) AS DOUBLE) AS s0
      FROM d
    ), rk AS (
      SELECT k.k AS lag,
             CAST(sum(CAST(a.dy * b.dy AS DECIMAL(38,6))) AS DOUBLE)
               / (SELECT s0 FROM den) AS r
      FROM (SELECT unnest(range(1, {_LB_LAGS + 1})) AS k) k,
           d a JOIN d b ON b.t = a.t + k.k
      GROUP BY 1
    )
    SELECT CAST((SELECT n FROM s) AS BIGINT) AS n_days,
           round(max(CASE WHEN lag = 1 THEN r END), 6) AS r1,
           round(max(CASE WHEN lag = 2 THEN r END), 6) AS r2,
           round(max(CASE WHEN lag = 3 THEN r END), 6) AS r3,
           round((SELECT n FROM s) * ((SELECT n FROM s) + 2)
                 * sum(r * r / ((SELECT n FROM s) - lag)), 4) AS q_lb
    FROM rk
    """,
    tags=("stats", "time-series", "autocorrelation", "orders"),
)
def stats_ljung_box(spark, sf_dir):
    """LJUNG-BOX portmanteau test on the daily-revenue series: sample
    autocorrelations r_k for lags 1..{L} (ACF denominator convention —
    one variance normalizer), Q = n(n+2)·Σ r_k²/(n−k). Lagged products
    come from an explode(1..{L}) + shifted equi-join on the day index
    — one plan for all lags, not {L} window passes; per-term DECIMAL
    casts make every sum order-free.

    Scale: the lag join is on the bounded daily relation; the
    unbounded scan feeds one map-side daily aggregation."""
    idx = _daily(spark, sf_dir)
    s = idx.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("sy"),
    )
    d = idx.crossJoin(F.broadcast(s)).select(
        "t", "n", (F.col("y") - F.col("sy") / F.col("n")).alias("dy")
    )
    d6 = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    den = d.agg(
        F.sum(d6(F.col("dy") * F.col("dy"))).cast("double").alias("s0")
    )
    lags = d.select(
        F.col("t"),
        F.col("dy").alias("dy_a"),
        F.explode(
            F.array(*[F.lit(k) for k in range(1, _LB_LAGS + 1)])
        ).alias("lag"),
    )
    b = d.select(F.col("t").alias("tb"), F.col("dy").alias("dy_b"))
    rk = (
        lags.join(b, F.col("tb") == F.col("t") + F.col("lag"))
        .groupBy("lag")
        .agg(F.sum(d6(F.col("dy_a") * F.col("dy_b"))).alias("sk"))
        .crossJoin(F.broadcast(den))
        .select("lag", (F.col("sk").cast("double") / F.col("s0")).alias("r"))
    )
    n1 = s.select("n")
    rk2 = rk.crossJoin(F.broadcast(n1)).withColumn(
        "term", F.col("r") * F.col("r") / (F.col("n") - F.col("lag"))
    )
    return rk2.agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(F.max(F.when(F.col("lag") == 1, F.col("r"))), 6).alias("r1"),
        F.round(F.max(F.when(F.col("lag") == 2, F.col("r"))), 6).alias("r2"),
        F.round(F.max(F.when(F.col("lag") == 3, F.col("r"))), 6).alias("r3"),
        F.round(
            F.max("n") * (F.max("n") + 2) * F.sum("term"), 4
        ).alias("q_lb"),
    )


@query(
    "analytics_page_hinkley",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    idx AS (
      SELECT day, y, row_number() OVER (ORDER BY day) AS t FROM daily
    ), s AS (
      SELECT count(*) AS n, sum(CAST(y AS HUGEINT)) AS sy FROM idx
    ), m AS (
      SELECT t, day,
             (SELECT n FROM s)
               * sum(CAST(y AS HUGEINT)) OVER (ORDER BY t)
               - CAST(t AS HUGEINT) * (SELECT sy FROM s) AS mt
      FROM idx
    ), r AS (
      SELECT t, day, mt, min(mt) OVER (ORDER BY t) AS mmin FROM m
    ), mx AS (SELECT max(mt - mmin) AS phs FROM r)
    SELECT CAST((SELECT n FROM s) AS BIGINT) AS n_days,
           round(CAST((SELECT phs FROM mx) AS DOUBLE)
                 / ((SELECT n FROM s) * 100.0), 4) AS ph_stat,
           min(day) AS detect_day
    FROM r WHERE mt - mmin = (SELECT phs FROM mx)
    """,
    tags=("stats", "time-series", "drift", "orders"),
)
def analytics_page_hinkley(spark, sf_dir):
    """PAGE-HINKLEY upward-drift statistic on daily revenue: PH =
    max_t (m_t − min_{i≤t} m_i) with m_t = Σ_{i≤t}(y_i − ȳ). Scaled by
    n to stay INTEGER-EXACT end to end: M_t = n·CumY_t − t·ΣY is an
    exact integer, the running min and the max-gap are integer
    comparisons, and the single division by n·100 (back to currency
    units) happens once at the end — so the argmax day (the change
    point PH detects) is engine-exact, not a float tie.

    Scale: cumulative sum + running min are single-partition windows
    over the calendar-bounded series; everything upstream is the
    map-side daily aggregation."""
    idx = _daily(spark, sf_dir)
    s = idx.agg(
        F.count("*").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    m = idx.crossJoin(F.broadcast(s)).select(
        "t",
        "day",
        "n",
        (
            F.col("n") * F.sum(F.col("y").cast("decimal(38,0)")).over(w_cum)
            - F.col("t") * F.col("sy")
        ).alias("mt"),
    )
    r = m.select(
        "t",
        "day",
        "n",
        "mt",
        F.min("mt").over(w_cum).alias("mmin"),
    )
    mx = r.agg(F.max(F.col("mt") - F.col("mmin")).alias("phs"))
    return (
        r.crossJoin(F.broadcast(mx))
        .filter(F.col("mt") - F.col("mmin") == F.col("phs"))
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.round(
                F.max("phs").cast("double")
                / (F.max("n") * F.lit(100.0)),
                4,
            ).alias("ph_stat"),
            F.min("day").alias("detect_day"),
        )
    )


# --------------------------------------------------- Bartlett's test


@query(
    "stats_bartlett",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS ni,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS s2
      FROM events GROUP BY 1
    ), v AS (
      SELECT event_type, ni, (s2 - s1 * s1 / ni) / (ni - 1) AS si2 FROM g
    ), a AS (
      SELECT CAST(sum(ni) AS DOUBLE) AS nn, count(*) AS k,
             sum(CAST((ni - 1) * ln(si2) AS DECIMAL(28,12))) AS sl,
             sum(CAST((ni - 1) * si2 AS DECIMAL(28,8))) AS spnum,
             sum(CAST(1.0 / (ni - 1) AS DECIMAL(28,20))) AS sinv
      FROM v
    )
    SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           round(((nn - k) * ln(CAST(spnum AS DOUBLE) / (nn - k))
                  - CAST(sl AS DOUBLE))
                 / (1 + (CAST(sinv AS DOUBLE) - 1.0 / (nn - k))
                        / (3.0 * (k - 1))), 6) AS t_bartlett
    FROM a
    """,
    tags=("stats", "hypothesis-test", "variance", "events"),
)
def stats_bartlett(spark, sf_dir):
    """BARTLETT'S TEST for variance homogeneity across the k event
    types (the parametric sibling of the suite's Levene/Brown-
    Forsythe): T = [(N−k)·ln(s_p²) − Σ(n_i−1)·ln(s_i²)] / C with the
    standard correction C. Per-group variances come from exact decimal
    sums; each ln term is one libm op on engine-identical operands,
    cast to DECIMAL before the k-term fold so the sums are order-free.

    Scale: one grouped moment pass (bounded k), then a k-row fold."""
    e = t(spark, sf_dir, "events")
    v0 = F.col("value")
    g = e.groupBy("event_type").agg(
        F.count("*").cast("double").alias("ni"),
        F.sum(v0.cast("decimal(18,2)")).cast("double").alias("s1"),
        F.sum((v0 * v0).cast("decimal(28,4)")).cast("double").alias("s2"),
    )
    v = g.select(
        "event_type",
        "ni",
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("ni"))
            / (F.col("ni") - 1)
        ).alias("si2"),
    )
    a = v.agg(
        F.sum("ni").cast("double").alias("nn"),
        F.count("*").alias("k"),
        F.sum(
            ((F.col("ni") - 1) * F.log(F.col("si2"))).cast(
                "decimal(28,12)"
            )
        ).alias("sl"),
        F.sum(
            ((F.col("ni") - 1) * F.col("si2")).cast("decimal(28,8)")
        ).alias("spnum"),
        F.sum(
            (F.lit(1.0) / (F.col("ni") - 1)).cast("decimal(28,20)")
        ).alias("sinv"),
    )
    nn, kk = F.col("nn"), F.col("k")
    tstat = (
        (nn - kk) * F.log(F.col("spnum").cast("double") / (nn - kk))
        - F.col("sl").cast("double")
    ) / (
        1
        + (F.col("sinv").cast("double") - F.lit(1.0) / (nn - kk))
        / (F.lit(3.0) * (kk - 1))
    )
    return a.select(
        nn.cast("long").alias("n"),
        kk.cast("long").alias("k"),
        F.round(tstat, 6).alias("t_bartlett"),
    )


# --------------------------------------------------- McNemar's test

_MN_URGENT = ("1-URGENT", "2-HIGH")


@query(
    "stats_mcnemar",
    oracle=f"""
    WITH flags AS (
      SELECT o_custkey,
             max(CASE WHEN o_orderkey % 2 = 0
                       AND o_orderpriority IN {_MN_URGENT}
                      THEN 1 ELSE 0 END) AS x0,
             max(CASE WHEN o_orderkey % 2 = 1
                       AND o_orderpriority IN {_MN_URGENT}
                      THEN 1 ELSE 0 END) AS x1,
             count(*) FILTER (o_orderkey % 2 = 0) AS n0,
             count(*) FILTER (o_orderkey % 2 = 1) AS n1
      FROM orders GROUP BY 1
    ), paired AS (SELECT * FROM flags WHERE n0 > 0 AND n1 > 0),
    c AS (
      SELECT count(*) AS n,
             sum(CASE WHEN x0 = 1 AND x1 = 0 THEN 1 ELSE 0 END) AS b,
             sum(CASE WHEN x0 = 0 AND x1 = 1 THEN 1 ELSE 0 END) AS c
      FROM paired
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(b AS BIGINT) AS b, CAST(c AS BIGINT) AS c,
           round((b - c) * (b - c) / (1.0 * (b + c)), 6) AS chi2,
           round((abs(b - c) - 1) * (abs(b - c) - 1)
                 / (1.0 * (b + c)), 6) AS chi2_cc
    FROM c
    """,
    tags=("stats", "hypothesis-test", "paired", "orders"),
)
def stats_mcnemar(spark, sf_dir):
    """McNEMAR'S TEST for paired binary outcomes: per customer, two
    pseudo-conditions (even/odd order keys) each yield a binary
    "placed an urgent order" flag; the test uses only the DISCORDANT
    counts b = #(1→0), c = #(0→1): χ² = (b−c)²/(b+c), plus the
    Edwards continuity correction. Every accumulator is an integer.

    Scale: one grouped flag pass (map-side combinable conditional
    maxes) + a 1-row fold — the pair matrix is never materialized."""
    o = t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin(*_MN_URGENT)
    even = F.col("o_orderkey") % 2 == 0
    flags = o.groupBy("o_custkey").agg(
        F.max(F.when(even & urgent, 1).otherwise(0)).alias("x0"),
        F.max(F.when(~even & urgent, 1).otherwise(0)).alias("x1"),
        F.count(F.when(even, 1)).alias("n0"),
        F.count(F.when(~even, 1)).alias("n1"),
    )
    paired = flags.filter((F.col("n0") > 0) & (F.col("n1") > 0))
    c = paired.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when((F.col("x0") == 1) & (F.col("x1") == 0), 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("x0") == 0) & (F.col("x1") == 1), 1).otherwise(0)
        ).alias("c"),
    )
    b_, c_ = F.col("b"), F.col("c")
    return c.select(
        F.col("n").cast("long").alias("n_pairs"),
        b_.cast("long").alias("b"),
        c_.cast("long").alias("c"),
        F.round(
            (b_ - c_) * (b_ - c_) / (F.lit(1.0) * (b_ + c_)), 6
        ).alias("chi2"),
        F.round(
            (F.abs(b_ - c_) - 1)
            * (F.abs(b_ - c_) - 1)
            / (F.lit(1.0) * (b_ + c_)),
            6,
        ).alias("chi2_cc"),
    )


# --------------------------------------------------- Welch's t-test

_WT_A, _WT_B = "purchase", "click"


@query(
    "stats_welch_ttest",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS s2
      FROM events WHERE event_type IN ('{_WT_A}', '{_WT_B}')
      GROUP BY 1
    ), v AS (
      SELECT event_type, n, s1 / n AS mu,
             (s2 - s1 * s1 / n) / (n - 1) AS s2v
      FROM g
    ), w AS (
      SELECT max(CASE WHEN event_type = '{_WT_A}' THEN n END) AS n1,
             max(CASE WHEN event_type = '{_WT_A}' THEN mu END) AS m1,
             max(CASE WHEN event_type = '{_WT_A}' THEN s2v END) AS v1,
             max(CASE WHEN event_type = '{_WT_B}' THEN n END) AS n2,
             max(CASE WHEN event_type = '{_WT_B}' THEN mu END) AS m2,
             max(CASE WHEN event_type = '{_WT_B}' THEN s2v END) AS v2
      FROM v
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_welch,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1)
                    + pow(v2 / n2, 2) / (n2 - 1)), 4) AS df_ws
    FROM w
    """,
    tags=("stats", "hypothesis-test", "two-sample", "events"),
)
def stats_welch_ttest(spark, sf_dir):
    """WELCH'S t-TEST (unequal-variance two-sample mean comparison —
    the parametric twin of the suite's Mann-Whitney) between two event
    types, with the Welch-Satterthwaite degrees of freedom. Means and
    sample variances come from exact decimal sums; the statistic is
    identical IEEE arithmetic both sides, rounded.

    Scale: ONE grouped moment pass over the filtered scan; the final
    statistic is a 1-row pivot fold."""
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_WT_A, _WT_B)
    )
    v0 = F.col("value")
    g = e.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(v0.cast("decimal(18,2)")).cast("double").alias("s1"),
        F.sum((v0 * v0).cast("decimal(28,4)")).cast("double").alias("s2"),
    )
    v = g.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mu"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("s2v"),
    )
    pick = lambda et, c: F.max(  # noqa: E731
        F.when(F.col("event_type") == et, F.col(c))
    )
    w = v.agg(
        pick(_WT_A, "n").alias("n1"),
        pick(_WT_A, "mu").alias("m1"),
        pick(_WT_A, "s2v").alias("v1"),
        pick(_WT_B, "n").alias("n2"),
        pick(_WT_B, "mu").alias("m2"),
        pick(_WT_B, "s2v").alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return w.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias(
            "t_welch"
        ),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
            ),
            4,
        ).alias("df_ws"),
    )


# --------------------------------------------- label propagation

_LP_NODES = 300
_LP_ROUNDS = 4  # FIXED round count in BOTH engines (k-core convention:
                # synchronous LPA may oscillate, so equality comes from
                # replaying the identical deterministic recurrence, not
                # from convergence)


@query(
    "graph_label_propagation",
    oracle=f"""
    WITH RECURSIVE e0 AS (
      SELECT DISTINCT
        least(l_orderkey % {_LP_NODES}, l_partkey % {_LP_NODES}) AS u,
        greatest(l_orderkey % {_LP_NODES}, l_partkey % {_LP_NODES}) AS v
      FROM lineitem
      WHERE l_orderkey % {_LP_NODES} <> l_partkey % {_LP_NODES}
    ), e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
    lab AS (
      SELECT 0 AS i, u AS n, u AS lbl FROM (SELECT DISTINCT u FROM e)
      UNION ALL
      SELECT i + 1, n, nl FROM (
        SELECT i, n, nl,
               row_number() OVER (PARTITION BY i, n
                                  ORDER BY cnt DESC, nl) AS rn
        FROM (
          SELECT l.i AS i, e.u AS n, l.lbl AS nl,
                 count(*) OVER (PARTITION BY l.i, e.u, l.lbl) AS cnt
          FROM lab l JOIN e ON e.v = l.n
          WHERE l.i < {_LP_ROUNDS}
        )
      ) WHERE rn = 1
    )
    SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(n) AS BIGINT) AS min_node
    FROM lab WHERE i = {_LP_ROUNDS} GROUP BY lbl
    """,
    tags=("graph", "iterative", "community"),
)
def graph_label_propagation(spark, sf_dir):
    """SYNCHRONOUS LABEL PROPAGATION community detection (Raghavan et
    al. 2007) with a fully DETERMINISTIC update — new label = the most
    frequent label among neighbors, ties broken by SMALLEST label — so
    both engines replay the identical recurrence for a fixed
    {ROUNDS}-round schedule and the community histogram is hash-equal
    (the graph_k_core fixed-round convention; vanilla LPA's random
    tie-breaking would be unverifiable).

    Spark shape per round: one equi-join (neighbor labels), one hash
    agg (label counts per node), one argmax via struct-max (count,
    −label) — no windows, no sorts; lineage cut by a lazy
    localCheckpoint per round. The DuckDB oracle nests the same argmax
    as window count + row_number inside the recursive term.

    Scale: each round shuffles O(|E|) label tuples with map-side
    partial counts; state is O(|V|)."""
    li = t(spark, sf_dir, "lineitem")
    a = (F.col("l_orderkey") % _LP_NODES).alias("a")
    b = (F.col("l_partkey") % _LP_NODES).alias("b")
    e0 = (
        li.select(a, b)
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    sym = (
        e0.unionByName(
            e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .coalesce(4)
        .transform(barrier)
    )
    lab = (
        sym.select(F.col("u").alias("n"))
        .distinct()
        .select("n", F.col("n").alias("lbl"))
        .transform(barrier)
    )
    for _ in range(_LP_ROUNDS):
        nb = sym.join(
            lab.withColumnRenamed("n", "__v"), F.col("v") == F.col("__v")
        ).select(F.col("u").alias("n"), "lbl")
        cnt = nb.groupBy("n", "lbl").agg(F.count("*").alias("cnt"))
        lab = (
            cnt.groupBy("n")
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt"), (-F.col("lbl")).alias("neg")
                    )
                ).alias("m")
            )
            .select("n", (-F.col("m.neg")).alias("lbl"))
            .transform(barrier)
        )
    return lab.groupBy(F.col("lbl").alias("community")).agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.min("n").cast("long").alias("min_node"),
    )


# --------------------------------------------------------------- HITS

_HITS_S = 100   # hub side: suppliers mod
_HITS_P = 150   # authority side: parts mod
_HITS_ROUNDS = 4  # fixed double-steps (h -> a -> h), both engines


@query(
    "graph_hits",
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT DISTINCT l_suppkey % {_HITS_S} AS s,
                      l_partkey % {_HITS_P} AS p
      FROM lineitem
    ), hs AS (
      SELECT 0 AS i, s, CAST(1.0 AS DOUBLE) AS h
      FROM (SELECT DISTINCT s FROM e)
      UNION ALL
      SELECT hs.i + 1, e2.s, sum(hs.h)
      FROM hs JOIN e e1 ON e1.s = hs.s JOIN e e2 ON e2.p = e1.p
      WHERE hs.i < {_HITS_ROUNDS}
      GROUP BY 1, 2
    ), hfin AS (SELECT s, h FROM hs WHERE i = {_HITS_ROUNDS}),
    afin AS (
      SELECT e.p, sum(hfin.h) AS av
      FROM e JOIN hfin ON hfin.s = e.s GROUP BY e.p
    )
    SELECT kind, node, score FROM (
      SELECT 'hub' AS kind, CAST(s AS BIGINT) AS node,
             round(h / (SELECT sum(h) FROM hfin), 6) AS score
      FROM hfin
      UNION ALL
      SELECT 'authority', CAST(p AS BIGINT),
             round(av / (SELECT sum(av) FROM afin), 6)
      FROM afin
    )
    """,
    tags=("graph", "iterative", "hits", "bipartite"),
)
def graph_hits(spark, sf_dir):
    """HITS hubs-and-authorities (Kleinberg 1999) on the natural
    supplier→part bipartite graph: a = Aᵀh, h = A a for {ROUNDS} fixed
    double-steps, L1-normalized ONCE at output. Deferring the
    normalization keeps every intermediate an exact sum-of-products of
    the all-ones start (value growth ≤ (d_s·d_p)^rounds ≈ 1e13, far
    inside double range), so cross-engine drift is summation-order
    ulps only — absorbed by 6dp rounding on the normalized scores (the
    pagerank-oracle convention). The DuckDB recursion folds each
    double-step as a single two-hop join (Σ_{{p∈N(s)}} Σ_{{s'∈N(p)}});
    Spark materializes the authority pass explicitly — identical
    algebra, different plan freedom.

    Scale: per round one O(|E|) shuffle each way with map-side partial
    sums; node state is O(|V|); lazy localCheckpoints cut lineage."""
    li = t(spark, sf_dir, "lineitem")
    e = (
        li.select(
            (F.col("l_suppkey") % _HITS_S).alias("s"),
            (F.col("l_partkey") % _HITS_P).alias("p"),
        )
        .distinct()
        .coalesce(4)
        .transform(barrier)
    )
    h = (
        e.select("s")
        .distinct()
        .select("s", F.lit(1.0).alias("h"))
        .transform(barrier)
    )
    for _ in range(_HITS_ROUNDS):
        a_vec = (
            e.join(h, "s")
            .groupBy("p")
            .agg(F.sum("h").alias("av"))
        )
        h = (
            e.join(a_vec, "p")
            .groupBy("s")
            .agg(F.sum("av").alias("h"))
            .transform(barrier)
        )
    a_fin = e.join(h, "s").groupBy("p").agg(F.sum("h").alias("av"))
    h_tot = h.agg(F.sum("h").alias("tot"))
    a_tot = a_fin.agg(F.sum("av").alias("tot"))
    hubs = h.crossJoin(F.broadcast(h_tot)).select(
        F.lit("hub").alias("kind"),
        F.col("s").cast("long").alias("node"),
        F.round(F.col("h") / F.col("tot"), 6).alias("score"),
    )
    auths = a_fin.crossJoin(F.broadcast(a_tot)).select(
        F.lit("authority").alias("kind"),
        F.col("p").cast("long").alias("node"),
        F.round(F.col("av") / F.col("tot"), 6).alias("score"),
    )
    return hubs.unionByName(auths)


# --------------------------------------- Kneser-Ney bigram LM

_KN_D = 0.75  # fixed absolute discount (Kneser-Ney 1995 / Chen-Goodman)
_KN_TOP = 30


@query(
    "text_kneser_ney_bigram",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), idx AS (
      SELECT doc_id, i AS pos, ws[i+1] AS word
      FROM toks, unnest(range(len(ws))) AS t(i)
    ), bg AS (
      SELECT doc_id,
             lag(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
             word AS w2
      FROM idx
    ), bgn AS (SELECT w1, w2 FROM bg WHERE w1 IS NOT NULL),
    cb AS (SELECT w1, w2, count(*) AS c12 FROM bgn GROUP BY 1, 2),
    cu AS (
      SELECT w1, sum(c12) AS c1, count(*) AS n1f FROM cb GROUP BY w1
    ), cc AS (SELECT w2, count(*) AS n1b FROM cb GROUP BY w2),
    tt AS (SELECT count(*) AS bity FROM cb)
    SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
           round((c12 - {_KN_D}) / c1
                 + ({_KN_D} * n1f / c1) * (CAST(n1b AS DOUBLE) / bity),
                 6) AS p_kn
    FROM cb JOIN cu USING (w1) JOIN cc USING (w2) CROSS JOIN tt
    ORDER BY c12 DESC, w1, w2 LIMIT {_KN_TOP}
    """,
    tags=("text", "lm", "llm-prep", "documents"),
)
def text_kneser_ney_bigram(spark, sf_dir):
    """INTERPOLATED KNESER-NEY bigram probabilities (fixed absolute
    discount D = {D}) — the LM smoothing actually used for data-quality
    perplexity filters, vs text_bigram_lm's add-one baseline:
    P(w₂|w₁) = (c₁₂ − D)/c₁ + D·N₁₊(w₁·)/c₁ · N₁₊(·w₂)/|bigram types|,
    where the continuation counts N₁₊ make the unigram backoff measure
    "how many contexts" rather than "how many tokens" (the KN insight).
    Reported for the top-{TOP} bigrams by INTEGER count (total order
    with word tiebreaks — no float ordering), probability rounded 6dp
    from all-integer inputs, so the hash pins the full count algebra.

    Scale: everything is a grouped count over the bigram relation
    (map-side combinable); the final top-{TOP} is a TakeOrdered — no
    global sort. c₁ is derived from the bigram table (Σ_w₂ c₁₂), never
    a second corpus pass."""
    par = spark.sparkContext.defaultParallelism
    docs = t(spark, sf_dir, "documents").repartition(par)
    idx = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bgn = idx.select(
        F.lag("word").over(w).alias("w1"), F.col("word").alias("w2")
    ).filter(F.col("w1").isNotNull())
    cb = bgn.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    cu = cb.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1f")
    )
    cc = cb.groupBy("w2").agg(F.count("*").alias("n1b"))
    tt = cb.agg(F.count("*").alias("bity"))
    p = (
        (F.col("c12") - _KN_D) / F.col("c1")
        + (_KN_D * F.col("n1f") / F.col("c1"))
        * (F.col("n1b").cast("double") / F.col("bity"))
    )
    return (
        cb.join(cu, "w1")
        .join(cc, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.round(p, 6).alias("p_kn"),
        )
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(_KN_TOP)
    )


# ------------------------------------------- mixture weights

_MX_TAU = 0.7  # sampling temperature (multilingual-LM convention)


@query(
    "curation_mixture_weights",
    oracle=f"""
    WITH tk AS (
      SELECT lang, sum(len(string_split(lower(text), ' '))) AS toks
      FROM documents GROUP BY lang
    ), tot AS (SELECT sum(toks) AS tt FROM tk),
    pw AS (
      SELECT lang, toks,
             pow(CAST(toks AS DOUBLE) / tt, {_MX_TAU}) AS pt
      FROM tk CROSS JOIN tot
    ), z AS (SELECT sum(CAST(pt AS DECIMAL(28,18))) AS zz FROM pw)
    SELECT lang, CAST(toks AS BIGINT) AS n_tokens,
           round(CAST(toks AS DOUBLE)
                 / (SELECT tt FROM tot), 6) AS p_natural,
           round(pt / CAST((SELECT zz FROM z) AS DOUBLE), 6) AS w_sample,
           round(pt / CAST((SELECT zz FROM z) AS DOUBLE)
                 * (SELECT tt FROM tot) / toks, 6) AS epochs_at_budget
    FROM pw
    """,
    tags=("llm", "curation", "mixture", "documents"),
)
def curation_mixture_weights(spark, sf_dir):
    """TRAINING-MIXTURE WEIGHTS by temperature sampling (the
    multilingual-LM upsampling rule, τ = {TAU}): per language,
    w_i = p_i^τ / Σ_j p_j^τ over natural token shares p_i, plus the
    implied per-language epoch count at a one-corpus token budget
    (w_i·T / tok_i > 1 ⇒ that language repeats — the practical
    overfitting signal mixture designers watch). Token counts are
    integers; each pow term is one libm op on identical rationals,
    cast to DECIMAL before the k-term normalizer fold (order-free).

    Scale: one map-side token-count aggregation over the corpus; the
    mixture algebra runs on the |langs|-row relation."""
    d = t(spark, sf_dir, "documents")
    tk = d.groupBy("lang").agg(
        F.sum(F.size(F.split(F.lower("text"), " "))).alias("toks")
    )
    tot = tk.agg(F.sum("toks").alias("tt"))
    pw = tk.crossJoin(F.broadcast(tot)).select(
        "lang",
        "toks",
        "tt",
        F.pow(F.col("toks").cast("double") / F.col("tt"), _MX_TAU).alias(
            "pt"
        ),
    )
    z = pw.agg(
        F.sum(F.col("pt").cast("decimal(28,18)")).alias("zz")
    )
    j = pw.crossJoin(F.broadcast(z))
    w = F.col("pt") / F.col("zz").cast("double")
    return j.select(
        "lang",
        F.col("toks").cast("long").alias("n_tokens"),
        F.round(F.col("toks").cast("double") / F.col("tt"), 6).alias(
            "p_natural"
        ),
        F.round(w, 6).alias("w_sample"),
        F.round(w * F.col("tt") / F.col("toks"), 6).alias(
            "epochs_at_budget"
        ),
    )


# --------------------------------------- curriculum phase assignment

_CUR_PHASES = 3


@query(
    "curation_curriculum_phases",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, len(string_split(lower(text), ' ')) AS n_words
      FROM documents
    ), r AS (
      SELECT doc_id, n_words,
             row_number() OVER (ORDER BY n_words, doc_id) AS rn,
             count(*) OVER () AS n
      FROM d
    )
    SELECT CAST(floor((rn - 1) * {_CUR_PHASES} * 1.0 / n) + 1 AS BIGINT) AS phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_words) AS BIGINT) AS min_words,
           CAST(max(n_words) AS BIGINT) AS max_words,
           CAST(sum(n_words) AS BIGINT) AS total_words
    FROM r GROUP BY 1
    """,
    tags=("llm", "curation", "curriculum", "documents"),
)
def curation_curriculum_phases(spark, sf_dir):
    """CURRICULUM PHASE ASSIGNMENT: order the corpus by a difficulty
    proxy (document length in words — short-to-long curriculum) and
    split it into {PHASES} equal-population phases by GLOBAL RANK,
    phase = ⌊(rank−1)·{PHASES}/n⌋ + 1 — the integer-exact equivalent of
    NTILE that the engine can compute WITHOUT a single-partition
    window: ranks come from the two-pass range-partitioned
    ``global_row_number`` (range exchange → in-partition row_number →
    broadcast prefix offsets), so phase assignment scales to any
    corpus. Tie-break (n_words, doc_id) makes the order total, hence
    the assignment engine-exact.

    Scale: one range exchange + one bounded offset broadcast; the
    DuckDB oracle uses the window-function formulation of the same
    rank — equal by construction."""
    from gcp_etl_spark.operators.quantiles import global_row_number

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).alias("n_words"),
    )
    n1 = d.agg(F.count("*").alias("n"))
    r = global_row_number(d, ["n_words", "doc_id"], rn_col="rn")
    phase = (
        F.floor((F.col("rn") - 1) * _CUR_PHASES / F.col("n")).cast("long")
        + 1
    )
    return (
        r.crossJoin(F.broadcast(n1))
        .groupBy(phase.alias("phase"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("n_words").cast("long").alias("min_words"),
            F.max("n_words").cast("long").alias("max_words"),
            F.sum("n_words").cast("long").alias("total_words"),
        )
    )


# ------------------------------------ perceptual-hash image dedup

_PH_PAIRS = 24   # 48 images: ids 2s / 2s+1 share a content seed
_PH_HAM = 3      # report pairs with hamming <= 3
_PH_BANDS = 4    # 4 x 16-bit bands: pigeonhole-EXACT for hamming <= 3


@query(
    "multimodal_phash_dedup",
    oracle=f"""
    WITH ids AS (
      SELECT i AS media_id, i // 2 AS s, i % 2 AS nz
      FROM generate_series(0, {2 * _PH_PAIRS - 1}) t(i)
    ), px AS (
      SELECT media_id, y.y // 3 AS by, x.x // 3 AS bx,
             (13 * s + 7 * x.x + 11 * y.y + 17 * c.c
              + CASE WHEN nz = 1 AND (x.x + y.y) % 5 = 0
                     THEN 40 ELSE 0 END) % 256 AS v
      FROM ids,
           generate_series(0, 23) x(x),
           generate_series(0, 23) y(y),
           generate_series(0, 2) c(c)
    ), blk AS (
      SELECT media_id, by, bx, sum(v) AS bsum FROM px GROUP BY 1, 2, 3
    ), tot AS (
      SELECT media_id, sum(bsum) AS tsum FROM blk GROUP BY 1
    ), bits AS (
      SELECT b.media_id, 8 * by + bx AS bit,
             CASE WHEN b.bsum * 64 > t.tsum THEN 1 ELSE 0 END AS onb
      FROM blk b JOIN tot t USING (media_id)
    ), h AS (
      SELECT media_id,
             sum(CASE WHEN onb = 1 AND bit < 32
                      THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS lo,
             sum(CASE WHEN onb = 1 AND bit >= 32
                      THEN CAST(1 AS BIGINT) << (bit - 32)
                      ELSE 0 END) AS hi
      FROM bits GROUP BY 1
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.lo, b.lo))
                + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming,
           (a.media_id // 2 = b.media_id // 2) AS same_seed
    FROM h a JOIN h b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
          <= {_PH_HAM}
    """,
    tags=("llm", "multimodal", "dedup", "lsh", "codec"),
)
def multimodal_phash_dedup(spark, sf_dir):
    """PERCEPTUAL-HASH IMAGE NEAR-DUP DETECTION over the REAL PNG
    path: decode → integer 64-bit average-hash (aHash: 8×8 block sums
    vs the global mean, channel-sum grayscale — every compare integer,
    llm/multimodal.py::average_hash) → {BANDS}×16-bit BAND BLOCKING →
    in-bucket xor/bit_count hamming ≤ {HAM} — the simhash/minhash
    banding algebra applied to image content. Banding is
    pigeonhole-EXACT here: hamming ≤ {HAM} < {BANDS} bands forces at
    least one identical band, so the blocked join provably returns the
    BRUTE-FORCE answer — and the oracle IS the brute-force all-pairs
    scan, replaying decode + hash from the pixel generator formula
    (nudged near-dup corpus: llm/multimodal.py::
    synthesize_neardup_images). A missed pair is a hash mismatch, and
    the fixture is constructed non-vacuous (measured: true pairs land
    hamming 2-6, several cross-seed pairs ≤ {HAM}).

    Scale: pixels never shuffle (decode + hash inside mapInPandas);
    |images|×{BANDS} band keys shuffle; per-bucket fanout is bounded
    by band-collision density exactly as in dedup_simhash."""
    from gcp_etl_spark.llm.multimodal import (
        average_hash,
        synthesize_neardup_images,
    )

    media = synthesize_neardup_images(spark, n_pairs=_PH_PAIRS)
    h = average_hash(media).transform(barrier)
    band = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("bi"),
                    (
                        F.shiftright(
                            F.col("hash_lo" if i < 2 else "hash_hi"),
                            16 * (i % 2),
                        )
                        % 65536
                    ).alias("bv"),
                )
                for i in range(_PH_BANDS)
            ]
        )
    ).alias("b")
    bands = h.select(
        F.col("media_id"), "hash_lo", "hash_hi", band
    ).select("media_id", "hash_lo", "hash_hi", "b.bi", "b.bv")
    other = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("hash_lo").alias("lo_b"),
        F.col("hash_hi").alias("hi_b"),
        "bi",
        "bv",
    )
    ham = F.bit_count(
        F.col("hash_lo").bitwiseXOR(F.col("lo_b"))
    ) + F.bit_count(F.col("hash_hi").bitwiseXOR(F.col("hi_b")))
    return (
        bands.join(other, ["bi", "bv"])
        .filter(F.col("media_id") < F.col("id_b"))
        .select(
            F.col("media_id").alias("id_a"),
            "id_b",
            ham.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= _PH_HAM)
        .distinct()
        .withColumn(
            "same_seed",
            (F.col("id_a") / 2).cast("long")
            == (F.col("id_b") / 2).cast("long"),
        )
    )


# --------------------------------------------------- G-test

_GT_THRESH = 49.0


@query(
    "stats_g_test",
    oracle=f"""
    WITH cells AS (
      SELECT event_type AS r,
             CASE WHEN value > {_GT_THRESH} THEN 1 ELSE 0 END AS c,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT r, c, o,
             sum(o) OVER (PARTITION BY r) AS rt,
             sum(o) OVER (PARTITION BY c) AS ct,
             sum(o) OVER () AS n
      FROM cells
    ), g AS (
      SELECT count(DISTINCT r) AS nr, count(DISTINCT c) AS nc,
             max(n) AS n,
             sum(CAST(2.0 * o * ln(CAST(o AS DOUBLE) * n / (rt * ct))
                      AS DECIMAL(28,12))) AS gsum
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
           round(CAST(gsum AS DOUBLE), 6) AS g
    FROM g
    """,
    tags=("stats", "hypothesis-test", "contingency", "events"),
)
def stats_g_test(spark, sf_dir):
    """G-TEST (log-likelihood-ratio contingency test, the
    information-theoretic twin of the suite's χ²): G = 2·Σ O·ln(O·N /
    (row·col)) over the event-type × value-threshold table. Each ln
    term is one libm op on identical integer-derived rationals, cast
    to DECIMAL before the cell fold (order-free); all marginals are
    integers.

    Scale: one map-side cell aggregation (k×2 cells), window marginals
    on the bounded cell relation."""
    e = t(spark, sf_dir, "events")
    cells = e.groupBy(
        F.col("event_type").alias("r"),
        F.when(F.col("value") > _GT_THRESH, 1).otherwise(0).alias("c"),
    ).agg(F.count("*").alias("o"))
    m = cells.select(
        "r",
        "c",
        "o",
        F.sum("o").over(Window.partitionBy("r")).alias("rt"),
        F.sum("o").over(Window.partitionBy("c")).alias("ct"),
        F.sum("o").over(
            Window.partitionBy()
        ).alias("n"),
    )
    g = m.agg(
        F.countDistinct("r").alias("nr"),
        F.countDistinct("c").alias("nc"),
        F.max("n").alias("n"),
        F.sum(
            (
                F.lit(2.0)
                * F.col("o")
                * F.log(
                    F.col("o").cast("double")
                    * F.col("n")
                    / (F.col("rt") * F.col("ct"))
                )
            ).cast("decimal(28,12)")
        ).alias("gsum"),
    )
    return g.select(
        F.col("n").cast("long").alias("n"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        F.round(F.col("gsum").cast("double"), 6).alias("g"),
    )


# --------------------------------------------------- Fleiss' kappa

_FK_RATINGS = 5  # fixed ratings per item (Fleiss requires constant n)


@query(
    "stats_fleiss_kappa",
    oracle=f"""
    WITH ranked AS (
      SELECT o_custkey AS item, o_orderpriority AS cat,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderkey) AS rn
      FROM orders
    ), kept AS (
      SELECT item, cat FROM ranked WHERE rn <= {_FK_RATINGS}
        AND item IN (SELECT item FROM ranked GROUP BY item
                     HAVING count(*) >= {_FK_RATINGS})
    ), nij AS (
      SELECT item, cat, count(*) AS nij FROM kept GROUP BY 1, 2
    ), pi AS (
      SELECT item, sum(nij * nij) - {_FK_RATINGS} AS pnum FROM nij
      GROUP BY item
    ), pj AS (
      SELECT cat, sum(nij) AS cj FROM nij GROUP BY cat
    ), agg AS (
      SELECT (SELECT count(*) FROM pi) AS n_items,
             (SELECT sum(pnum) FROM pi) AS pbar_num,
             (SELECT sum(CAST(cj AS HUGEINT) * cj) FROM pj) AS pe_num
    )
    SELECT CAST(n_items AS BIGINT) AS n_items,
           round(CAST(pbar_num AS DOUBLE)
                 / (n_items * {_FK_RATINGS} * ({_FK_RATINGS} - 1)), 6)
             AS p_bar,
           round(CAST(pe_num AS DOUBLE)
                 / pow(CAST(n_items AS DOUBLE) * {_FK_RATINGS}, 2), 6)
             AS p_e,
           round((CAST(pbar_num AS DOUBLE)
                  / (n_items * {_FK_RATINGS} * ({_FK_RATINGS} - 1))
                  - CAST(pe_num AS DOUBLE)
                    / pow(CAST(n_items AS DOUBLE) * {_FK_RATINGS}, 2))
                 / (1 - CAST(pe_num AS DOUBLE)
                        / pow(CAST(n_items AS DOUBLE) * {_FK_RATINGS}, 2)),
                 6) AS kappa
    FROM agg
    """,
    tags=("stats", "agreement", "orders"),
)
def stats_fleiss_kappa(spark, sf_dir):
    """FLEISS' KAPPA (multi-rater categorical agreement, generalizing
    the suite's Cohen's kappa beyond two raters): each customer is an
    "item" whose first {N} orders (by order key — deterministic) are
    the {N} "ratings", category = order priority. κ = (P̄ − P_e)/(1 −
    P_e) with P_i = (Σ_j n_ij² − n)/(n(n−1)) and P_e = Σ_j p_j². Every
    accumulator is an integer (HUGEINT/decimal for Σc_j²); floats are
    the three final ratios.

    Scale: the first-{N} pick is a per-entity bounded window (rows per
    partition = orders per customer); everything after is grouped
    integer counts."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    ranked = o.select(
        F.col("o_custkey").alias("item"),
        F.col("o_orderpriority").alias("cat"),
        F.row_number().over(w).alias("rn"),
    )
    eligible = (
        ranked.groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= _FK_RATINGS)
        .select("item")
    )
    kept = ranked.filter(F.col("rn") <= _FK_RATINGS).join(
        eligible, "item"
    )
    nij = kept.groupBy("item", "cat").agg(F.count("*").alias("nij"))
    pi = nij.groupBy("item").agg(
        (F.sum(F.col("nij") * F.col("nij")) - _FK_RATINGS).alias("pnum")
    )
    pj = nij.groupBy("cat").agg(F.sum("nij").alias("cj"))
    agg = (
        pi.agg(
            F.count("*").alias("n_items"),
            F.sum("pnum").alias("pbar_num"),
        )
        .crossJoin(
            F.broadcast(
                pj.agg(
                    F.sum(
                        F.col("cj").cast("decimal(38,0)") * F.col("cj")
                    ).alias("pe_num")
                )
            )
        )
    )
    ni = F.col("n_items")
    p_bar = F.col("pbar_num").cast("double") / (
        ni * _FK_RATINGS * (_FK_RATINGS - 1)
    )
    p_e = F.col("pe_num").cast("double") / F.pow(
        ni.cast("double") * _FK_RATINGS, 2
    )
    return agg.select(
        ni.cast("long").alias("n_items"),
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_e"),
        F.round((p_bar - p_e) / (1 - p_e), 6).alias("kappa"),
    )


# --------------------------------------------------- Mood's median test


@query(
    "stats_mood_median",
    oracle="""
    WITH med AS (
      SELECT quantile_cont(value, 0.5) AS gm FROM events
    ), cells AS (
      SELECT event_type,
             CAST(count(*) FILTER (value > (SELECT gm FROM med))
                  AS BIGINT) AS above,
             CAST(count(*) FILTER (value <= (SELECT gm FROM med))
                  AS BIGINT) AS at_or_below
      FROM events GROUP BY 1
    ), m AS (
      SELECT sum(above) AS ta, sum(at_or_below) AS tb,
             sum(above) + sum(at_or_below) AS n
      FROM cells
    )
    SELECT c.event_type, c.above, c.at_or_below,
           round((SELECT gm FROM med), 6) AS grand_median,
           round(pow(c.above - (c.above + c.at_or_below)
                               * CAST(m.ta AS DOUBLE) / m.n, 2)
                 / ((c.above + c.at_or_below) * CAST(m.ta AS DOUBLE) / m.n)
                 + pow(c.at_or_below - (c.above + c.at_or_below)
                                       * CAST(m.tb AS DOUBLE) / m.n, 2)
                 / ((c.above + c.at_or_below)
                    * CAST(m.tb AS DOUBLE) / m.n), 6) AS chi2_contrib
    FROM cells c CROSS JOIN m
    """,
    tags=("stats", "hypothesis-test", "median", "events"),
)
def stats_mood_median(spark, sf_dir):
    """MOOD'S MEDIAN TEST: classify every observation against the
    GRAND median (computed by the engine's two-pass exact_quantiles,
    quantile_cont semantics), then the per-group above/at-or-below
    table with each group's χ² contribution — the k-group
    nonparametric location screen that, unlike Kruskal-Wallis, is
    robust to outliers in the tails.

    Scale: one exact-quantile pass (range-partitioned), one broadcast
    scalar compare, one k×2 hash agg. Counts are integers; the grand
    median is the identical interpolated double in both engines."""
    from gcp_etl_spark.operators.quantiles import exact_quantiles

    e = t(spark, sf_dir, "events").select("event_type", "value")
    med = exact_quantiles(e, "value", {"gm": 0.5})
    cells = (
        e.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("value") > F.col("gm"), 1))
            .cast("long")
            .alias("above"),
            F.count(F.when(F.col("value") <= F.col("gm"), 1))
            .cast("long")
            .alias("at_or_below"),
            F.round(F.max("gm"), 6).alias("grand_median"),
        )
    )
    m = cells.agg(
        F.sum("above").alias("ta"),
        F.sum("at_or_below").alias("tb"),
        (F.sum("above") + F.sum("at_or_below")).alias("n"),
    )
    j = cells.crossJoin(F.broadcast(m))
    ni = F.col("above") + F.col("at_or_below")
    ea = ni * F.col("ta").cast("double") / F.col("n")
    eb = ni * F.col("tb").cast("double") / F.col("n")
    return j.select(
        "event_type",
        "above",
        "at_or_below",
        "grand_median",
        F.round(
            F.pow(F.col("above") - ea, 2) / ea
            + F.pow(F.col("at_or_below") - eb, 2) / eb,
            6,
        ).alias("chi2_contrib"),
    )


# ------------------------------------------- EWMA control chart

_EW_LAMBDA = 0.2   # EWMA smoothing
_EW_WINDOW = 60    # truncated-kernel length ((1-λ)^60 ≈ 1.5e-6)
_EW_SIGMA = 2.5    # control limit in global-σ units


@query(
    "anomaly_ewma_control",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    idx AS (
      SELECT day, y, row_number() OVER (ORDER BY day) AS t FROM daily
    ), s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS s2
      FROM idx
    ), sig AS (
      SELECT n, sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd FROM s
    ), z AS (
      SELECT a.t, a.day, a.y,
             sum(CAST({_EW_LAMBDA} * pow(1 - {_EW_LAMBDA}, j.j) * b.y
                      AS DECIMAL(38,10))) AS zt_num,
             sum(CAST({_EW_LAMBDA} * pow(1 - {_EW_LAMBDA}, j.j)
                      AS DECIMAL(38,20))) AS zt_den
      FROM idx a
      JOIN (SELECT unnest(range(1, {_EW_WINDOW + 1})) AS j) j ON TRUE
      JOIN idx b ON b.t = a.t - j.j
      GROUP BY 1, 2, 3
    ), flags AS (
      SELECT t, day, y,
             CAST(zt_num AS DOUBLE) / CAST(zt_den AS DOUBLE) AS z_prev
      FROM z WHERE t > {_EW_WINDOW}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days_tested,
           CAST(count(*) FILTER (
             abs(y - z_prev) > {_EW_SIGMA} * (SELECT sd FROM sig))
             AS BIGINT) AS n_flagged,
           min(CASE WHEN abs(y - z_prev)
                         > {_EW_SIGMA} * (SELECT sd FROM sig)
                    THEN day END) AS first_flag_day,
           max(CASE WHEN abs(y - z_prev)
                         > {_EW_SIGMA} * (SELECT sd FROM sig)
                    THEN day END) AS last_flag_day
    FROM flags
    """,
    tags=("stats", "time-series", "control-chart", "orders"),
)
def anomaly_ewma_control(spark, sf_dir):
    """EWMA CONTROL CHART on daily revenue: each day is tested against
    the exponentially weighted moving average of the PRIOR {W} days
    (λ = {L}, truncated kernel — (1−λ)^{W} ≈ 1.5e-6, and the
    truncation is part of the DEFINED statistic so both engines replay
    it exactly rather than approximating an infinite recursion);
    flag when |y_t − z_{{t−1}}| > {S}·σ̂. Kernel weights are identical
    libm pow values on literal operands; weighted terms are cast to
    DECIMAL so the per-day sums are order-free; σ̂ comes from exact
    integer sums. The truncated-kernel formulation REPLACES the
    sequential EWMA recursion (unparallelizable, and the untruncated
    closed form needs (1/(1−λ))^t — overflow at t≈2400) with one
    explode+shifted-join — embarrassingly parallel at any length.

    Scale: |days|×{W} joined rows — calendar-bounded; the corpus-size
    work is the daily aggregation."""
    idx = _daily(spark, sf_dir)
    s = idx.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("s2"),
    )
    sig = s.select(
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sd")
    )
    a = idx.select(
        "t",
        "day",
        "y",
        F.explode(
            F.array(*[F.lit(j) for j in range(1, _EW_WINDOW + 1)])
        ).alias("j"),
    )
    b = idx.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    wgt = _EW_LAMBDA * F.pow(F.lit(1 - _EW_LAMBDA), F.col("j"))
    z = (
        a.join(b, F.col("tb") == F.col("t") - F.col("j"))
        .groupBy("t", "day", "y")
        .agg(
            F.sum((wgt * F.col("yb")).cast("decimal(38,10)")).alias(
                "zt_num"
            ),
            F.sum(wgt.cast("decimal(38,20)")).alias("zt_den"),
        )
        .filter(F.col("t") > _EW_WINDOW)
        .select(
            "t",
            "day",
            "y",
            (
                F.col("zt_num").cast("double")
                / F.col("zt_den").cast("double")
            ).alias("z_prev"),
        )
    )
    flag = F.abs(F.col("y") - F.col("z_prev")) > _EW_SIGMA * F.col("sd")
    return z.crossJoin(F.broadcast(sig)).agg(
        F.count("*").cast("long").alias("n_days_tested"),
        F.count(F.when(flag, 1)).cast("long").alias("n_flagged"),
        F.min(F.when(flag, F.col("day"))).alias("first_flag_day"),
        F.max(F.when(flag, F.col("day"))).alias("last_flag_day"),
    )


# --------------------------------------- Theil's U (uncertainty coeff)


@query(
    "stats_theil_u",
    oracle="""
    WITH cells AS (
      SELECT c_mktsegment AS xs, o_orderpriority AS ys, count(*) AS n
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY 1, 2
    ), tot AS (SELECT sum(n) AS nn FROM cells),
    hy AS (
      SELECT -sum(CAST((CAST(cy AS DOUBLE) / nn)
                       * ln(CAST(cy AS DOUBLE) / nn)
                       AS DECIMAL(28,18))) AS h_y
      FROM (SELECT ys, sum(n) AS cy FROM cells GROUP BY ys)
      CROSS JOIN tot
    ), hyx AS (
      SELECT -sum(CAST((CAST(n AS DOUBLE) / nn)
                       * ln(CAST(n AS DOUBLE) / cx)
                       AS DECIMAL(28,18))) AS h_y_x
      FROM cells
      JOIN (SELECT xs, sum(n) AS cx FROM cells GROUP BY xs) USING (xs)
      CROSS JOIN tot
    )
    SELECT round(CAST(h_y AS DOUBLE), 6) AS h_y,
           round(CAST(h_y_x AS DOUBLE), 6) AS h_y_given_x,
           round((CAST(h_y AS DOUBLE) - CAST(h_y_x AS DOUBLE))
                 / CAST(h_y AS DOUBLE), 6) AS theil_u
    FROM hy CROSS JOIN hyx
    """,
    tags=("stats", "association", "entropy", "orders"),
)
def stats_theil_u(spark, sf_dir):
    """THEIL'S U (uncertainty coefficient U(priority | segment)): the
    ASYMMETRIC categorical-association measure — how much knowing the
    customer segment reduces the entropy of order priority, U =
    (H(Y) − H(Y|X)) / H(Y). Complements the suite's symmetric
    Cramér's V. Probabilities are integer-count rationals; each ln
    term is cast to DECIMAL before the fold (order-free).

    Scale: one join + one cell hash agg (bounded |segments|×
    |priorities| cells); entropies fold the cell relation."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    cells = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("xs"),
            F.col("o_orderpriority").alias("ys"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = cells.agg(F.sum("n").alias("nn"))
    cy = cells.groupBy("ys").agg(F.sum("n").alias("cy"))
    h_y = (
        cy.crossJoin(F.broadcast(tot))
        .agg(
            (
                -F.sum(
                    (
                        (F.col("cy").cast("double") / F.col("nn"))
                        * F.log(F.col("cy").cast("double") / F.col("nn"))
                    ).cast("decimal(28,18)")
                )
            ).alias("h_y")
        )
    )
    cx = cells.groupBy("xs").agg(F.sum("n").alias("cx"))
    h_y_x = (
        cells.join(cx, "xs")
        .crossJoin(F.broadcast(tot))
        .agg(
            (
                -F.sum(
                    (
                        (F.col("n").cast("double") / F.col("nn"))
                        * F.log(F.col("n").cast("double") / F.col("cx"))
                    ).cast("decimal(28,18)")
                )
            ).alias("h_y_x")
        )
    )
    j = h_y.crossJoin(F.broadcast(h_y_x))
    return j.select(
        F.round(F.col("h_y").cast("double"), 6).alias("h_y"),
        F.round(F.col("h_y_x").cast("double"), 6).alias("h_y_given_x"),
        F.round(
            (F.col("h_y").cast("double") - F.col("h_y_x").cast("double"))
            / F.col("h_y").cast("double"),
            6,
        ).alias("theil_u"),
    )


# ----------------------------------------------- jackknife variance


@query(
    "stats_jackknife_ratio",
    oracle="""
    WITH s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) AS sy,
             CAST(sum(CAST(o_orderkey % 97 + 1 AS BIGINT)) AS DOUBLE) AS sx
      FROM orders
    ), loo AS (
      SELECT (s.sy - round(o_totalprice * 100))
             / (s.sx - (o_orderkey % 97 + 1)) AS ri,
             s.sy / s.sx AS r, s.n
      FROM orders CROSS JOIN s
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           round(max(r), 6) AS ratio,
           round((max(n) - 1) / max(n)
                 * CAST(sum(CAST((ri - r) * (ri - r) AS DECIMAL(38,20)))
                        AS DOUBLE), 6) AS var_jack,
           round(sqrt((max(n) - 1) / max(n)
                 * CAST(sum(CAST((ri - r) * (ri - r) AS DECIMAL(38,20)))
                        AS DOUBLE)), 6) AS se_jack
    FROM loo
    """,
    tags=("stats", "resampling", "variance", "orders"),
)
def stats_jackknife_ratio(spark, sf_dir):
    """DISTRIBUTED DELETE-1 JACKKNIFE for a NON-LINEAR statistic (the
    ratio estimator R = Σy/Σx): each row's leave-one-out replicate
    R_(i) = (Σy − y_i)/(Σx − x_i) is computed map-side from the two
    broadcast totals — n replicates WITHOUT n passes, the trick that
    makes jackknife variance a one-scan operation at any scale.
    Var_jack = (n−1)/n · Σ(R_(i) − R)²; squared deviations are cast to
    DECIMAL per term (order-free sum). y = integer cents, x = a
    positive integer covariate, so every replicate is the same IEEE
    division of exact integers in both engines.

    Scale: one moment pass + one map-side replicate pass; nothing
    shuffles but two scalar rows."""
    o = t(spark, sf_dir, "orders")
    ycents = F.round(F.col("o_totalprice") * 100).cast("long")
    xcov = (F.col("o_orderkey") % 97 + 1).cast("long")
    s = o.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(ycents).cast("double").alias("sy"),
        F.sum(xcov).cast("double").alias("sx"),
    )
    loo = o.crossJoin(F.broadcast(s)).select(
        (
            (F.col("sy") - F.round(F.col("o_totalprice") * 100))
            / (F.col("sx") - (F.col("o_orderkey") % 97 + 1))
        ).alias("ri"),
        (F.col("sy") / F.col("sx")).alias("r"),
        "n",
    )
    d20 = lambda c: c.cast("decimal(38,20)")  # noqa: E731
    var = (
        (F.max("n") - 1)
        / F.max("n")
        * F.sum(
            d20((F.col("ri") - F.col("r")) * (F.col("ri") - F.col("r")))
        ).cast("double")
    )
    return loo.agg(
        F.max("n").cast("long").alias("n"),
        F.round(F.max("r"), 6).alias("ratio"),
        F.round(var, 6).alias("var_jack"),
        F.round(F.sqrt(var), 6).alias("se_jack"),
    )


# ------------------------------------- one-sample GOF vs uniform(0,500)

_GOF_M = 500.0  # literal reference domain: events.value ⊂ (0, 490.02]


@query(
    "stats_ks_uniform_gof",
    oracle=f"""
    WITH r AS (
      SELECT value,
             row_number() OVER (ORDER BY value, event_id) AS i,
             count(*) OVER () AS n
      FROM events
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           round(max(greatest(
             CAST(i AS DOUBLE) / n - value / {_GOF_M},
             value / {_GOF_M} - (CAST(i AS DOUBLE) - 1) / n)), 6) AS d
    FROM r
    """,
    tags=("stats", "gof", "events"),
)
def stats_ks_uniform_gof(spark, sf_dir):
    """ONE-SAMPLE KOLMOGOROV-SMIRNOV goodness-of-fit against
    U(0, {M}): D = max_i max(i/n − F₀(x_(i)), F₀(x_(i)) − (i−1)/n).
    The sorted index i comes from the engine's two-pass
    ``global_row_number`` (total order (value, event_id) — ties broken
    deterministically, so both engines walk the identical ECDF), never
    a single-partition sort. F₀ is a literal-scale division.

    Scale: one range exchange + a max fold — the one-sample twin of
    the suite's two-sample KS."""
    from gcp_etl_spark.operators.quantiles import global_row_number

    e = t(spark, sf_dir, "events").select("value", "event_id")
    r = global_row_number(e, ["value", "event_id"], rn_col="i")
    n1 = r.agg(F.count("*").alias("n"))
    j = r.crossJoin(F.broadcast(n1))
    d = F.greatest(
        F.col("i").cast("double") / F.col("n")
        - F.col("value") / _GOF_M,
        F.col("value") / _GOF_M
        - (F.col("i").cast("double") - 1) / F.col("n"),
    )
    return j.agg(
        F.max("n").cast("long").alias("n"),
        F.round(F.max(d), 6).alias("d"),
    )


@query(
    "stats_cramer_von_mises",
    oracle=f"""
    WITH r AS (
      SELECT value,
             row_number() OVER (ORDER BY value, event_id) AS i,
             count(*) OVER () AS n
      FROM events
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           round(1.0 / (12 * max(n))
                 + CAST(sum(CAST(pow(value / {_GOF_M}
                                     - (2.0 * i - 1) / (2 * n), 2)
                                 AS DECIMAL(38,20))) AS DOUBLE), 6)
             AS w2
    FROM r
    """,
    tags=("stats", "gof", "events"),
)
def stats_cramer_von_mises(spark, sf_dir):
    """CRAMÉR-VON MISES one-sample statistic vs U(0, {M}): W² =
    1/(12n) + Σᵢ (F₀(x_(i)) − (2i−1)/(2n))². Sorted positions from the
    two-pass global rank; each squared term cast to DECIMAL so the
    order of the fold cannot move the sum (the house per-term rule).

    Scale: identical shape to the one-sample KS — range exchange +
    one fold."""
    from gcp_etl_spark.operators.quantiles import global_row_number

    e = t(spark, sf_dir, "events").select("value", "event_id")
    r = global_row_number(e, ["value", "event_id"], rn_col="i")
    n1 = r.agg(F.count("*").alias("n"))
    j = r.crossJoin(F.broadcast(n1))
    term = F.pow(
        F.col("value") / _GOF_M
        - (2.0 * F.col("i") - 1) / (2 * F.col("n")),
        2,
    ).cast("decimal(38,20)")
    return j.agg(
        F.max("n").cast("long").alias("n"),
        F.round(
            F.lit(1.0) / (12 * F.max("n"))
            + F.sum(term).cast("double"),
            6,
        ).alias("w2"),
    )


@query(
    "stats_anderson_darling",
    oracle=f"""
    WITH r AS (
      SELECT value,
             row_number() OVER (ORDER BY value, event_id) AS i,
             count(*) OVER () AS n
      FROM events
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           round(-CAST(max(n) AS DOUBLE)
                 - CAST(sum(CAST(
                     ((2.0 * i - 1) * ln(value / {_GOF_M})
                      + (2.0 * (n - i) + 1) * ln(1 - value / {_GOF_M}))
                     AS DECIMAL(38,18))) AS DOUBLE) / max(n), 6) AS a2
    FROM r
    """,
    tags=("stats", "gof", "events"),
)
def stats_anderson_darling(spark, sf_dir):
    """ANDERSON-DARLING one-sample statistic vs U(0, {M}) in the
    single-pass form A² = −n − (1/n)·Σᵢ[(2i−1)·ln F₀(x_(i)) +
    (2(n−i)+1)·ln(1−F₀(x_(i)))] — algebraically equal to the textbook
    pairing of x_(i) with x_(n+1−i) but needing NO reversed-rank
    self-join. F₀ < 1 everywhere by the literal domain choice
    ({M} > max value), so both logs are defined; each term is one libm
    ln on identical operands, cast to DECIMAL before the fold.

    Scale: the GOF-family shape — two-pass global rank + one fold.
    AD weights the tails 1/(F(1−F)) — the member of the family that
    catches tail departures KS/CvM miss."""
    from gcp_etl_spark.operators.quantiles import global_row_number

    e = t(spark, sf_dir, "events").select("value", "event_id")
    r = global_row_number(e, ["value", "event_id"], rn_col="i")
    n1 = r.agg(F.count("*").alias("n"))
    j = r.crossJoin(F.broadcast(n1))
    f0 = F.col("value") / _GOF_M
    term = (
        (2.0 * F.col("i") - 1) * F.log(f0)
        + (2.0 * (F.col("n") - F.col("i")) + 1) * F.log(1 - f0)
    ).cast("decimal(38,18)")
    return j.agg(
        F.max("n").cast("long").alias("n"),
        F.round(
            -F.max("n").cast("double")
            - F.sum(term).cast("double") / F.max("n"),
            6,
        ).alias("a2"),
    )


# ------------------------------------------- intraclass correlation


@query(
    "stats_icc_oneway",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS ni,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS s2
      FROM events GROUP BY 1
    ), a AS (
      SELECT count(*) AS gk,
             CAST(sum(ni) AS DOUBLE) AS nn,
             sum(CAST(s1 * s1 / ni AS DECIMAL(38,12))) AS ssb_part,
             CAST(sum(CAST(s1 AS DECIMAL(28,8))) AS DOUBLE) AS st1,
             CAST(sum(CAST(s2 AS DECIMAL(38,8))) AS DOUBLE) AS st2,
             sum(CAST(ni * ni AS DECIMAL(38,4))) AS sn2
      FROM g
    ), m AS (
      SELECT gk, nn,
             (CAST(ssb_part AS DOUBLE) - st1 * st1 / nn) / (gk - 1) AS msb,
             (st2 - CAST(ssb_part AS DOUBLE)) / (nn - gk) AS msw,
             (nn - CAST(sn2 AS DOUBLE) / nn) / (gk - 1) AS k0
      FROM a
    )
    SELECT CAST(gk AS BIGINT) AS n_groups, CAST(nn AS BIGINT) AS n,
           round(msb, 6) AS msb, round(msw, 6) AS msw,
           round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc1
    FROM m
    """,
    tags=("stats", "agreement", "anova", "events"),
)
def stats_icc_oneway(spark, sf_dir):
    """INTRACLASS CORRELATION ICC(1) (one-way random effects, unequal
    group sizes): MSB/MSW from the one-way ANOVA decomposition with
    k₀ = (N − Σnᵢ²/N)/(g−1) as the effective group size; ICC =
    (MSB − MSW)/(MSB + (k₀−1)·MSW) — the reliability twin of the
    suite's ANOVA. Group moments are exact decimal sums; Σ s₁ᵢ²/nᵢ
    terms are cast to DECIMAL before the g-term fold.

    Scale: one grouped moment pass (bounded g), then a g-row fold."""
    e = t(spark, sf_dir, "events")
    v0 = F.col("value")
    g = e.groupBy("event_type").agg(
        F.count("*").cast("double").alias("ni"),
        F.sum(v0.cast("decimal(18,2)")).cast("double").alias("s1"),
        F.sum((v0 * v0).cast("decimal(28,4)")).cast("double").alias("s2"),
    )
    a = g.agg(
        F.count("*").alias("gk"),
        F.sum("ni").cast("double").alias("nn"),
        F.sum(
            (F.col("s1") * F.col("s1") / F.col("ni")).cast(
                "decimal(38,12)"
            )
        ).alias("ssb_part"),
        F.sum(F.col("s1").cast("decimal(28,8)")).cast("double").alias(
            "st1"
        ),
        F.sum(F.col("s2").cast("decimal(38,8)")).cast("double").alias(
            "st2"
        ),
        F.sum((F.col("ni") * F.col("ni")).cast("decimal(38,4)")).alias(
            "sn2"
        ),
    )
    m = a.select(
        "gk",
        "nn",
        (
            (F.col("ssb_part").cast("double") - F.col("st1") * F.col("st1") / F.col("nn"))
            / (F.col("gk") - 1)
        ).alias("msb"),
        (
            (F.col("st2") - F.col("ssb_part").cast("double"))
            / (F.col("nn") - F.col("gk"))
        ).alias("msw"),
        (
            (F.col("nn") - F.col("sn2").cast("double") / F.col("nn"))
            / (F.col("gk") - 1)
        ).alias("k0"),
    )
    return m.select(
        F.col("gk").cast("long").alias("n_groups"),
        F.col("nn").cast("long").alias("n"),
        F.round(F.col("msb"), 6).alias("msb"),
        F.round(F.col("msw"), 6).alias("msw"),
        F.round(
            (F.col("msb") - F.col("msw"))
            / (F.col("msb") + (F.col("k0") - 1) * F.col("msw")),
            6,
        ).alias("icc1"),
    )


# ------------------------------------- lagged cross-correlation

_XC_LAGS = 3
_XC_URGENT = ("1-URGENT", "2-HIGH")


@query(
    "analytics_crosscorr_lagged",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y,
             sum(CASE WHEN o_orderpriority IN {_XC_URGENT}
                      THEN CAST(round(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS x
      FROM orders GROUP BY 1
    ), idx AS (
      SELECT x, y, row_number() OVER (ORDER BY day) AS t FROM daily
    ), s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy
      FROM idx
    ), d AS (
      SELECT t, x - (SELECT sx / n FROM s) AS dx,
             y - (SELECT sy / n FROM s) AS dy
      FROM idx
    ), den AS (
      SELECT CAST(sum(CAST(dx * dx AS DECIMAL(38,6))) AS DOUBLE) AS vx,
             CAST(sum(CAST(dy * dy AS DECIMAL(38,6))) AS DOUBLE) AS vy
      FROM d
    )
    SELECT k.k AS lag,
           round(CAST(sum(CAST(a.dx * b.dy AS DECIMAL(38,6))) AS DOUBLE)
                 / sqrt((SELECT vx FROM den) * (SELECT vy FROM den)),
                 6) AS r_xy
    FROM (SELECT unnest(range(-{_XC_LAGS}, {_XC_LAGS + 1})) AS k) k,
         d a JOIN d b ON b.t = a.t + k.k
    GROUP BY 1
    """,
    tags=("stats", "time-series", "cross-correlation", "orders"),
)
def analytics_crosscorr_lagged(spark, sf_dir):
    """LAGGED CROSS-CORRELATION between two daily series (urgent-order
    revenue x vs total revenue y): r_xy(k) for k ∈ [−{L}, {L}] — does
    one series LEAD the other? One explode + shifted equi-join
    computes every lag in a single plan (the Ljung-Box shape); the
    normalizer uses full-series variances so r is comparable across
    lags. Deviation products are cast to DECIMAL per term; the input
    series are integer cents.

    Scale: the lag join runs on the calendar-bounded daily relation;
    the corpus-size work is one map-side daily aggregation."""
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(cents).alias("y"),
        F.sum(
            F.when(
                F.col("o_orderpriority").isin(*_XC_URGENT), cents
            ).otherwise(F.lit(0))
        ).alias("x"),
    )
    idx = daily.select(
        "x", "y", F.row_number().over(Window.orderBy("day")).alias("t")
    )
    s = idx.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("sy"),
    )
    d = idx.crossJoin(F.broadcast(s)).select(
        "t",
        (F.col("x") - F.col("sx") / F.col("n")).alias("dx"),
        (F.col("y") - F.col("sy") / F.col("n")).alias("dy"),
    )
    d6 = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    den = d.agg(
        F.sum(d6(F.col("dx") * F.col("dx"))).cast("double").alias("vx"),
        F.sum(d6(F.col("dy") * F.col("dy"))).cast("double").alias("vy"),
    )
    a = d.select(
        "t",
        F.col("dx").alias("dx_a"),
        F.explode(
            F.array(
                *[
                    F.lit(k).cast("long")
                    for k in range(-_XC_LAGS, _XC_LAGS + 1)
                ]
            )
        ).alias("lag"),
    )
    b = d.select(F.col("t").alias("tb"), F.col("dy").alias("dy_b"))
    return (
        a.join(b, F.col("tb") == F.col("t") + F.col("lag"))
        .groupBy("lag")
        .agg(F.sum(d6(F.col("dx_a") * F.col("dy_b"))).alias("sxy"))
        .crossJoin(F.broadcast(den))
        .select(
            "lag",
            F.round(
                F.col("sxy").cast("double")
                / F.sqrt(F.col("vx") * F.col("vy")),
                6,
            ).alias("r_xy"),
        )
    )


# ------------------------------------------- systematic sampling

_SYS_K = 17  # take every 17th row of the keyed total order


@query(
    "sample_systematic",
    oracle=f"""
    WITH r AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority,
             row_number() OVER (ORDER BY o_orderkey) AS rn
      FROM orders
    ), pick AS (
      SELECT * FROM r WHERE rn % {_SYS_K} = 1
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents_sum
    FROM pick GROUP BY 1
    """,
    tags=("sampling", "scale", "orders"),
)
def sample_systematic(spark, sf_dir):
    """SYSTEMATIC SAMPLING — every {K}-th row of the keyed total order
    (the survey-sampling design that guarantees even coverage of an
    ordered frame, complementing the suite's hash/stratified/weighted/
    reservoir samplers). Global positions come from the two-pass
    ``global_row_number`` (range exchange + broadcast prefix offsets),
    NEVER a single-partition window, so the selection is deterministic
    and engine-exact at any scale; the sample is verified by per-class
    keyed checksums.

    Scale: one range exchange; selection is a map-side modulo
    filter."""
    from gcp_etl_spark.operators.quantiles import global_row_number

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    r = global_row_number(o, ["o_orderkey"], rn_col="rn")
    pick = r.filter(F.col("rn") % _SYS_K == 1)
    return pick.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents_sum"),
    )
