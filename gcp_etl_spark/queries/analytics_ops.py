"""Product/behavioral analytics over the events stream + TF-IDF text
ranking — classic warehouse workloads (funnels, cohort retention,
term relevance) composed from core operators, each with a full DuckDB
oracle. All NS extensions (the reference has no aggregations beyond
count, SURVEY.md §2A).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.operators.quantiles import exact_quantiles
from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t
from gcp_etl_spark.operators.barrier import barrier


@query(
    "funnel_3step",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT 'view' AS stage, count(*) AS n_users FROM v
    UNION ALL SELECT 'view>click', count(*) FROM c
    UNION ALL SELECT 'view>click>purchase', count(*) FROM p
    """,
    tags=("analytics", "funnel", "events"),
)
def funnel_3step(spark, sf_dir):
    """Ordered conversion funnel (first view -> first later click ->
    first later purchase): per-user min-timestamp chain. Each stage
    joins the (tiny) per-user survivor table back to events — the
    survivor side shrinks monotonically and broadcasts; events is
    scanned, never shuffled whole."""
    e = t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df, name):
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(v, "view")
        .unionByName(stage(c, "view>click"))
        .unionByName(stage(p, "view>click>purchase"))
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH firstact AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP)
               AS cohort_week
      FROM events GROUP BY 1
    ), act AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(floor(date_diff('day', f.cohort_week,
                                  CAST(date_trunc('day', e.ts) AS TIMESTAMP))
                        / 7) AS INT) AS week_offset
      FROM events e JOIN firstact f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, count(*) AS n_users
    FROM act GROUP BY 1, 2
    """,
    tags=("analytics", "retention", "events"),
)
def retention_cohorts(spark, sf_dir):
    """Weekly cohort retention: cohort = week of first activity,
    counted distinct-active per week offset. One agg for cohorts
    (broadcast back), one distinct + agg for the matrix."""
    e = t(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("timestamp_ntz").alias("cohort_week")
    )
    act = (
        e.join(F.broadcast(first), "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.to_date("ts"), F.to_date("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_users")
    )


@query(
    "text_tfidf_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), df_t AS (
      SELECT term, count(DISTINCT doc_id) AS dfreq FROM toks GROUP BY 1
    ), n AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln((n.n_docs + 1.0) / (df_t.dfreq + 1.0)), 4)
               AS tfidf
      FROM tf JOIN df_t USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf
    FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rk
      FROM scored
    )
    WHERE rk <= 3 AND doc_id % 20 = 0
    """,
    tags=("llm", "text", "tfidf"),
)
def text_tfidf_topk(spark, sf_dir):
    """TF-IDF term relevance, top-3 terms per doc (subset): token
    explode -> (doc, term) hash agg -> doc-frequency agg -> smoothed
    idf join -> per-doc window top-k. The doc-frequency table is
    vocabulary-sized (zipf-small vs corpus) and broadcasts; the only
    big shuffle is the (doc, term) agg, which partial-aggregates
    map-side. ln() is libm-identical on both engines; score rounded
    4dp, term tiebreak makes the top-k total-ordered."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("dfreq")
    )
    n_docs = d.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("dfreq") + 1.0)),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") <= 3) & (F.col("doc_id") % 20 == 0))
        .select("doc_id", "term", "tfidf")
    )


@query(
    "gaps_islands",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    r AS (
      SELECT user_id, day,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER) AS rn
      FROM d
    ),
    isl AS (
      SELECT user_id, day - rn AS anchor, count(*) AS len
      FROM r GROUP BY user_id, day - rn
    )
    SELECT user_id,
           count(*) AS n_islands,
           max(len) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM isl GROUP BY user_id
    ORDER BY longest_streak DESC, user_id
    LIMIT 20
    """,
    tags=("analytics", "window", "gaps-islands", "events"),
)
def gaps_islands(spark, sf_dir):
    """Gaps-and-islands (consecutive-day activity streaks) via the
    classic day-minus-row_number anchor: within a user, consecutive
    days share ``day - rn``, so one hash agg per (user, anchor) yields
    island lengths with no self-join. The window partitions by
    user_id (high cardinality — full parallelism at any scale) and the
    per-user distinct-day state is bounded by the calendar. Output is
    the top-20 longest streaks, totally ordered (user_id tiebreak)."""
    e = t(spark, sf_dir, "events")
    d = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    r = d.withColumn("rn", F.row_number().over(w).cast("int"))
    isl = r.groupBy(
        "user_id", F.date_sub("day", F.col("rn")).alias("anchor")
    ).agg(F.count("*").alias("len"))
    return (
        isl.groupBy("user_id")
        .agg(
            F.count("*").alias("n_islands"),
            F.max("len").alias("longest_streak"),
            F.sum("len").alias("active_days"),
        )
        .orderBy(F.desc("longest_streak"), "user_id")
        .limit(20)
    )


@query(
    "anomaly_zscore",
    oracle="""
    WITH s AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
      FROM events GROUP BY 1
    )
    SELECT e.event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN abs((e.value - s.mu) / s.sd) > 3
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(max(abs((e.value - s.mu) / s.sd)), 2) AS max_z
    FROM events e JOIN s ON e.event_type = s.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    tags=("analytics", "anomaly", "events"),
)
def anomaly_zscore(spark, sf_dir):
    """Per-group z-score outlier detection: one grouped agg for
    (mu, sd), broadcast the per-group stats back onto the stream, flag
    |z| > 3. Two scans of the fact, zero fact-side shuffles beyond the
    final per-type agg — the stats table is group-cardinality-sized and
    always broadcasts. mu/sd are generic-real accumulations (engine
    summation order differs by ulps), so the only rounded output is
    max_z at 2dp; the |z|>3 threshold sits on a continuous distribution
    where an ulp cannot flip membership."""
    e = t(spark, sf_dir, "events")
    s = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.col("sd"))
    return (
        e.join(F.broadcast(s), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(z > 3, 1).otherwise(0)).alias("n_outliers"),
            F.round(F.max(z), 2).alias("max_z"),
        )
        .orderBy("event_type")
    )


@query(
    "skyline_pareto",
    oracle="""
    SELECT x.p_partkey, x.p_retailprice, x.p_size
    FROM part x
    WHERE NOT EXISTS (
      SELECT 1 FROM part y
      WHERE y.p_retailprice <= x.p_retailprice
        AND y.p_size >= x.p_size
        AND (y.p_retailprice < x.p_retailprice OR y.p_size > x.p_size)
    )
    ORDER BY x.p_retailprice, x.p_partkey
    """,
    tags=("analytics", "skyline", "window"),
)
def skyline_pareto(spark, sf_dir):
    """2-D skyline (Pareto frontier: minimize price, maximize size)
    WITHOUT the quadratic NOT-EXISTS self-join the oracle runs: a part
    is on the frontier iff its size equals the max size at its price
    AND strictly exceeds the max size over all cheaper prices. That is
    one hash agg to per-price maxima (output bounded by |distinct
    price|, shuffle is on the price key) followed by a running-max
    window over the TINY aggregated table, then a broadcast join back.
    O(n) + O(p log p) vs the oracle's O(n^2). The single-partition
    window is over per-price maxima only; at 100 TB the agg output is
    still ~|distinct price| rows — if even that overflowed one task,
    compute bucket-local skylines first and merge (same algebra,
    associative)."""
    p = t(spark, sf_dir, "part")
    pp = p.groupBy("p_retailprice").agg(F.max("p_size").alias("msize"))
    w = (
        Window.orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky = pp.withColumn("best_cheaper", F.max("msize").over(w)).filter(
        F.col("best_cheaper").isNull()
        | (F.col("msize") > F.col("best_cheaper"))
    )
    return (
        p.join(F.broadcast(sky), "p_retailprice")
        .filter(F.col("p_size") == F.col("msize"))
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


@query(
    "locf_gap_fill",
    oracle="""
    WITH obs AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      FROM events WHERE user_id < 40
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY 1
    ),
    spine AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1,
             INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    )
    SELECT s.user_id, s.day,
           o.day_value AS observed,
           last_value(o.day_value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM spine s LEFT JOIN obs o
      ON s.user_id = o.user_id AND s.day = o.day
    ORDER BY s.user_id, s.day
    """,
    tags=("analytics", "timeseries", "gap-fill", "window"),
)
def locf_gap_fill(spark, sf_dir):
    """Calendar gap-filling with last-observation-carried-forward:
    per-user day spine (sequence() between observed bounds — generated
    executor-side, never a driver loop), left join of observations,
    then last_value(ignoreNulls) forward fill. The spine explode is
    bounded by the calendar span, the fill window partitions by
    user_id (full parallelism). This is the batch dual of what a
    streaming state store does for sensor/metric feeds; the per-day
    observed aggregate uses the exact decimal-sum policy so join-key
    alignment is bit-stable."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    obs = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("day_value")
    )
    bounds = obs.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(obs, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.col("day_value").alias("observed"),
            F.last("day_value", ignorenulls=True).over(w).alias("filled"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "ewma_per_user",
    # DuckDB 1.0.0's list_reduce returns batch-layout-dependent
    # results over full-table scans (caught red-handed on integer folds
    # in running_balance_clamped's first draft and on string folds in
    # scalar_array_sort_comparator), so the oracle folds through a
    # recursive CTE instead — same element order, same IEEE expression,
    # one recursion step per sequence position.
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS i,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ),
    rec(user_id, i, n, acc) AS (
      SELECT user_id, i, n, value FROM seq WHERE i = 1
      UNION ALL
      SELECT s.user_id, s.i, s.n, 0.25 * s.value + 0.75 * r.acc
      FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1
    ),
    lastv AS (SELECT user_id, value AS last_value FROM seq WHERE i = n)
    SELECT r.user_id, CAST(r.n AS BIGINT) AS n_events,
           l.last_value, r.acc AS ewma_value
    FROM rec r JOIN lastv l ON l.user_id = r.user_id
    WHERE r.i = r.n
    """,
    tags=("analytics", "timeseries", "fold"),
)
def ewma_per_user(spark, sf_dir):
    """EWMA (alpha = 0.25) over each user's event-value series — a
    linear recurrence no Spark window frame expresses (sliding frames
    re-aggregate; EWMA needs ordered foldLeft). Realized as a
    higher-order ``aggregate`` fold over the per-key ordered series;
    both engines fold in the identical (ts, event_id) order with the
    identical IEEE expression, so the doubles match bit-exactly and no
    rounding policy is needed.

    Scale shape: one hash agg keyed by user (map-side combinable
    collect), fold runs inside the map stage after it. The per-KEY
    series must fit an executor (fine for per-user event streams);
    unbounded keys move to the applyInPandasWithState operator in
    streaming/windows.py, which carries the same recurrence as
    incremental state."""
    e = t(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(ts, event_id, value))),"
            " s -> s.value)"
        ).alias("vals"),
        F.count("*").alias("n_events"),
    )
    return seq.select(
        "user_id",
        "n_events",
        F.element_at("vals", -1).alias("last_value"),
        F.expr(
            "aggregate(slice(vals, 2, size(vals) - 1),"
            " element_at(vals, 1),"
            " (acc, x) -> 0.25d * x + 0.75d * acc)"
        ).alias("ewma_value"),
    )


@query(
    "window_ratio_to_report",
    oracle="""
    WITH rev AS (
      SELECT n_name,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS nation_rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, nation_rev,
           round(nation_rev / sum(nation_rev) OVER (), 6) AS share
    FROM rev
    """,
    tags=("window", "analytics", "share"),
)
def window_ratio_to_report(spark, sf_dir):
    """Ratio-to-report: each nation's share of global revenue via an
    empty-frame window sum — the percent-of-total BI staple. The
    global denominator is a window over the 25-row AGGREGATE (not the
    fact table), so the 'global' window costs nothing at any scale;
    numerators are exact decimal sums, the one share division rounds
    at 6dp."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("nation_rev")
        )
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        "nation_rev",
        F.round(F.col("nation_rev") / F.sum("nation_rev").over(w), 6).alias(
            "share"
        ),
    )


@query(
    "metric_cumulative_uniques",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d
      FROM events GROUP BY user_id
    ),
    daily AS (SELECT d, count(*) AS new_users FROM first_seen GROUP BY d)
    SELECT d, CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY d
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM daily
    """,
    tags=("analytics", "window", "distinct"),
)
def metric_cumulative_uniques(spark, sf_dir):
    """Cumulative unique users per day — the growth-accounting metric.
    A naive running COUNT(DISTINCT) over an expanding window re-scans
    every prefix; the scalable identity is dedup-then-cumsum: each
    user contributes on their FIRST day only (one hash agg keyed by
    user), then a running sum over the tiny daily series. The window
    runs over #days rows, not #events."""
    e = t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d")
    )
    daily = first_seen.groupBy("d").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "d",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


@query(
    "ab_test_proportions",
    oracle="""
    WITH assign AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) >= 4
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(converted) AS BIGINT) AS n_converted,
             sum(converted) / CAST(count(*) AS DOUBLE) AS rate
      FROM assign GROUP BY variant
    ),
    wide AS (
      SELECT max(CASE WHEN variant = 0 THEN n_users END) AS n0,
             max(CASE WHEN variant = 0 THEN n_converted END) AS c0,
             max(CASE WHEN variant = 1 THEN n_users END) AS n1,
             max(CASE WHEN variant = 1 THEN n_converted END) AS c1
      FROM arms
    )
    SELECT n0, c0, n1, c1,
           round(c0 / CAST(n0 AS DOUBLE), 6) AS rate0,
           round(c1 / CAST(n1 AS DOUBLE), 6) AS rate1,
           round(
             (c1 / CAST(n1 AS DOUBLE) - c0 / CAST(n0 AS DOUBLE))
             / nullif(sqrt(((c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                    * (1 - (c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 / n0 + 1.0 / n1)), 0),
             4) AS z_score
    FROM wide
    """,
    tags=("analytics", "stats", "experiment"),
)
def ab_test_proportions(spark, sf_dir):
    """Two-proportion z-test for an A/B experiment: deterministic
    variant assignment (user_id parity), per-user conversion
    (>= 4 purchase events; 'any purchase' is degenerate on this
    fixture — every user has one), pooled-variance z on the rate
    difference (nullif-guarded against zero variance) — the
    experimentation readout computed entirely in aggregates (two hash
    aggs + a 2-row pivot; the z arithmetic runs on 4 scalars).
    Rounding at 4dp absorbs sqrt/division ulps."""
    e = t(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 4,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "converted"
    )
    arms = assign.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0") / F.col("n0").cast("double")
    p1 = F.col("c1") / F.col("n1").cast("double")
    pool = (F.col("c0") + F.col("c1")) / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    z = (p1 - p0) / F.nullif(
        F.sqrt(
            pool * (1 - pool) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
        ),
        F.lit(0.0),
    )
    return wide.select(
        "n0", "c0", "n1", "c1",
        F.round(p0, 6).alias("rate0"),
        F.round(p1, 6).alias("rate1"),
        F.round(z, 4).alias("z_score"),
    )


@query(
    "basket_cooccurrence",
    oracle="""
    WITH lines AS (
      SELECT DISTINCT l_orderkey, p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM lines),
    pairs AS (
      SELECT a.p_type AS type_a, b.p_type AS type_b,
             count(*) AS n_together
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
      GROUP BY 1, 2
    ),
    singles AS (
      SELECT p_type, count(*) AS n_orders_with
      FROM lines GROUP BY 1
    )
    SELECT type_a, type_b,
           CAST(n_together AS BIGINT) AS n_together,
           round(n_together / CAST(n.n AS DOUBLE), 6) AS support,
           round(n_together / CAST(sa.n_orders_with AS DOUBLE), 6)
             AS confidence_a_to_b
    FROM pairs
    JOIN singles sa ON sa.p_type = type_a, n_orders n
    ORDER BY n_together DESC, type_a, type_b
    LIMIT 20
    """,
    tags=("analytics", "join", "basket"),
)
def basket_cooccurrence(spark, sf_dir):
    """Market-basket co-occurrence (association-rules support +
    confidence): distinct (order, item-type) pairs self-joined per
    order with canonical type_a < type_b — pair fan-out is C(types-
    in-order, 2), bounded by basket width, never corpus-quadratic.
    Support/confidence are int/int divisions rounded at 6dp; the
    global order count rides as a broadcast 1-row aggregate, not a
    driver-side count."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    # lazy localCheckpoint (r12, guide §1.2): lines feeds the order
    # count, both self-join sides, and the per-type singles — without
    # the barrier the optimizer re-expanded the join + distinct into
    # all four consumers (16 parquet scans in one plan); downstream
    # joins keep their explicit broadcast hints, so no strategy
    # depends on the stats the barrier drops
    lines = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_type")
        .distinct()
        .transform(barrier)
    )
    n_orders = lines.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    a = lines.alias("a")
    b = lines.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_type") < F.col("b.p_type")),
        )
        .groupBy(
            F.col("a.p_type").alias("type_a"),
            F.col("b.p_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_together"))
    )
    singles = lines.groupBy(F.col("p_type").alias("type_a")).agg(
        F.count("*").alias("n_orders_with")
    )
    return (
        pairs.join(F.broadcast(singles), "type_a")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "type_a",
            "type_b",
            "n_together",
            F.round(
                F.col("n_together") / F.col("n_orders").cast("double"), 6
            ).alias("support"),
            F.round(
                F.col("n_together") / F.col("n_orders_with").cast("double"),
                6,
            ).alias("confidence_a_to_b"),
        )
        .orderBy(F.desc("n_together"), "type_a", "type_b")
        .limit(20)
    )


@query(
    "rfm_scoring",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey)
                AS INT) AS r_quartile,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey)
                AS INT) AS f_quartile,
           CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey)
                AS INT) AS m_quartile,
           CAST(frequency AS BIGINT) AS frequency,
           monetary
    FROM base
    """,
    tags=("analytics", "window", "scoring"),
)
def rfm_scoring(spark, sf_dir):
    """RFM customer scoring: recency / frequency / monetary quartiles
    via three ntile windows over the per-customer AGGREGATE (windows
    run over #customers rows, the fact table is reduced first; each
    ORDER BY carries the custkey tiebreaker so quartile boundaries
    are total-ordered and cross-engine stable). Monetary is the exact
    decimal sum."""
    o = t(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    wr = Window.orderBy(F.desc("last_order"), "o_custkey")
    wf = Window.orderBy(F.desc("frequency"), "o_custkey")
    wm = Window.orderBy(F.desc("monetary"), "o_custkey")
    return base.select(
        "o_custkey",
        F.ntile(4).over(wr).alias("r_quartile"),
        F.ntile(4).over(wf).alias("f_quartile"),
        F.ntile(4).over(wm).alias("m_quartile"),
        "frequency",
        "monetary",
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    outdeg AS (SELECT prev_type, sum(n) AS total FROM trans GROUP BY 1)
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
           round(n / CAST(total AS DOUBLE), 6) AS p_transition
    FROM trans JOIN outdeg USING (prev_type)
    """,
    tags=("analytics", "sequence", "markov"),
)
def event_transition_matrix(spark, sf_dir):
    """First-order event-transition matrix (the Markov/Sankey input):
    lag(event_type) per user in event-time order -> transition counts
    -> row-normalized probabilities. One window pass over the events
    plus two tiny aggs (the matrix is #types^2 whatever the corpus
    size); probabilities are int/int divisions rounded at 6dp."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    outdeg = trans.groupBy("prev_type").agg(F.sum("n").alias("total"))
    return trans.join(F.broadcast(outdeg), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("total").cast("double"), 6).alias(
            "p_transition"
        ),
    )


@query(
    "running_balance_clamped",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) * CASE
               WHEN event_type = 'purchase' THEN -1 ELSE 1 END AS delta
      FROM events
    ),
    runs AS (
      SELECT user_id, delta,
             sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS prefix
      FROM d
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(delta) - least(CAST(0 AS BIGINT), min(prefix))
                AS BIGINT) AS final_balance_cents
    FROM runs GROUP BY user_id
    """,
    tags=("analytics", "window", "recurrence"),
)
def running_balance_clamped(spark, sf_dir):
    """Floor-clamped running balance — balance(t) = max(0, balance +
    delta) — looks like a non-associative fold, but the clamp has a
    prefix-sum CLOSED FORM (the reflection identity):
    final = S_n - min(0, min_k S_k). That turns the sequential
    recurrence into one running-sum window + one hash agg — fully
    parallel, integer-exact, no per-key fold at all (and no DuckDB
    list_reduce, whose fold is batch-layout-buggy in 1.0.0 — see
    scalar_array_sort_comparator). Recurrences WITHOUT a closed form
    take the applyInPandasWithState operator instead."""
    e = t(spark, sf_dir, "events")
    delta = (
        F.round(F.col("value") * 100).cast("long")
        * F.when(F.col("event_type") == "purchase", -1).otherwise(1)
    )
    d = e.select("user_id", "ts", "event_id", delta.alias("delta"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = d.withColumn("prefix", F.sum("delta").over(w))
    return runs.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (
            F.sum("delta")
            - F.least(F.lit(0).cast("long"), F.min("prefix"))
        ).alias("final_balance_cents"),
    )


@query(
    "histogram_equi_depth",
    oracle="""
    WITH ranked AS (
      SELECT o_totalprice,
             ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
    FROM ranked GROUP BY bucket
    """,
    tags=("analytics", "histogram", "window"),
)
def histogram_equi_depth(spark, sf_dir):
    """Equi-DEPTH histogram (quantile buckets: equal row counts,
    data-driven boundaries) via a total-ordered ntile — the
    complement of `histogram_fixed_bins`' equi-width bins and the
    statistic a cost optimizer keeps per column. The orderkey
    tiebreaker makes bucket assignment of duplicate prices
    deterministic cross-engine."""
    o = t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(8).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@query(
    "resample_linear_interpolate",
    oracle="""
    WITH obs AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      FROM events WHERE user_id < 40 GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY 1
    ),
    spine AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1,
             INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    ctx AS (
      SELECT s.user_id, s.day, o.day_value AS observed,
             last_value(o.day_value IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN o.day_value IS NOT NULL THEN s.day END
                        IGNORE NULLS) OVER wp AS pd,
             first_value(o.day_value IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN o.day_value IS NOT NULL THEN s.day END
                         IGNORE NULLS) OVER wn AS nd
      FROM spine s LEFT JOIN obs o
        ON s.user_id = o.user_id AND s.day = o.day
      WINDOW wp AS (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day, observed,
           round(CASE
             WHEN observed IS NOT NULL THEN observed
             ELSE pv + (nv - pv) * date_diff('day', pd, day)
                       / date_diff('day', pd, nd)
           END, 6) AS interpolated
    FROM ctx
    ORDER BY user_id, day
    """,
    tags=("analytics", "timeseries", "resample", "window"),
)
def resample_linear_interpolate(spark, sf_dir):
    """Calendar resampling with LINEAR interpolation between the
    surrounding observations — the numeric companion of
    `locf_gap_fill` (sensor/metric feeds where a step function is
    wrong). Same per-user day spine; gap values are
    pv + (nv-pv) * (t-tp)/(tn-tp) from the nearest non-null neighbors
    on each side, found with two ignore-nulls windows (one forward,
    one backward) over the spine join — O(n) per partition, no
    self-join of the spine against observations. Identical IEEE
    expression on both engines -> hash-verified."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    obs = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("day_value")
    )
    bounds = obs.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_value").isNotNull(), F.col("day"))
    ctx = (
        spine.join(obs, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.col("day_value").alias("observed"),
            F.last("day_value", ignorenulls=True).over(wp).alias("pv"),
            F.last(obs_day, ignorenulls=True).over(wp).alias("pd"),
            F.first("day_value", ignorenulls=True).over(wn).alias("nv"),
            F.first(obs_day, ignorenulls=True).over(wn).alias("nd"),
        )
    )
    interp = F.when(F.col("observed").isNotNull(), F.col("observed")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * F.datediff("day", "pd")
        / F.datediff("nd", "pd")
    )
    return ctx.select(
        "user_id",
        "day",
        "observed",
        F.round(interp, 6).alias("interpolated"),
    ).orderBy("user_id", "day")


@query(
    "period_over_period",
    oracle="""
    WITH monthly AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY month
    )
    SELECT month, revenue,
           (revenue - lag(revenue, 1) OVER m) / lag(revenue, 1) OVER m
             AS mom_pct,
           (revenue - lag(revenue, 12) OVER m) / lag(revenue, 12) OVER m
             AS yoy_pct
    FROM monthly
    WINDOW m AS (ORDER BY month)
    """,
    tags=("analytics", "window", "orders", "exact-decimal"),
)
def period_over_period(spark, sf_dir):
    """Period-over-period BI staple: monthly revenue with
    month-over-month and year-over-year percent change (lag 1 / lag 12
    over the month series; NULL where no prior period exists).

    Scale: the global window runs over the MONTH AGGREGATE — bounded
    by the calendar (≤ a few thousand rows at any data scale), so the
    single-partition window costs nothing; the fact table sees one
    hash agg. Revenue is an exact decimal sum; the pct quotients are
    single IEEE divisions of identical operands — emitted unrounded.
    """
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    m = Window.orderBy("month")
    rev = F.col("revenue")
    mom = F.lag("revenue", 1).over(m)
    yoy = F.lag("revenue", 12).over(m)
    return monthly.select(
        "month",
        "revenue",
        ((rev - mom) / mom).alias("mom_pct"),
        ((rev - yoy) / yoy).alias("yoy_pct"),
    )


@query(
    "pattern_v_shape",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             lag(value, 2) OVER w AS v2,
             lag(value, 1) OVER w AS v1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           count(*) AS n_points,
           count(*) FILTER (WHERE v2 > v1 AND value > v1) AS n_vshapes
    FROM seq GROUP BY user_id
    HAVING count(*) FILTER (WHERE v2 > v1 AND value > v1) > 0
    """,
    tags=("analytics", "pattern", "window", "events"),
)
def pattern_v_shape(spark, sf_dir):
    """Sequence-pattern detection (MATCH_RECOGNIZE-lite): count strict
    local minima (down-then-up, a V) in each user's value sequence —
    the lag-composition form of row-pattern matching that covers most
    fixed-length patterns without a state machine.

    Scale: one per-user window pass + one hash agg on the same key;
    fixed-length patterns need exactly pattern_len-1 lag columns, all
    in a single WindowExec. (Variable-length patterns are the
    documented escape to ``applyInPandasWithState``.)
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "value",
        F.lag("value", 2).over(w).alias("v2"),
        F.lag("value", 1).over(w).alias("v1"),
    )
    is_v = (F.col("v2") > F.col("v1")) & (F.col("value") > F.col("v1"))
    return (
        seq.groupBy("user_id")
        .agg(
            F.count("*").alias("n_points"),
            F.count(F.when(is_v, 1)).alias("n_vshapes"),
        )
        .filter(F.col("n_vshapes") > 0)
    )


@query(
    "analytics_acf1",
    oracle="""
    WITH seq AS (
      SELECT user_id, value AS x,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
      FROM events
    ), m AS (
      SELECT user_id,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(18,4))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2)))
                  AS DOUBLE) AS sxx,
             CAST(sum(CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2)))
                  AS DOUBLE) AS syy
      FROM seq WHERE y IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             AS acf1
    FROM m
    WHERE n >= 20 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    """,
    tags=("analytics", "timeseries", "stats", "events"),
)
def analytics_acf1(spark, sf_dir):
    """Per-user lag-1 autocorrelation of the event value series — the
    first ACF coefficient, the building block of seasonality / trend
    diagnostics. Pairs (x_t, x_{t-1}) via one lag window, then the
    exact-decimal Pearson moment construction of ``agg_corr``
    (aggregates.py): per-row products are single IEEE ops on 2-dp
    operands, sums are exact decimals, so the final round(…, 6) is
    bit-stable across engines.

    Scale: one shuffle on user_id serves both the lag window and the
    moment aggregation (same key); higher lags are additional lag
    columns in the SAME WindowExec, not extra passes.
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("value").alias("x"),
        F.lag("value").over(w).alias("y"),
    ).filter(F.col("y").isNotNull())
    dx = F.col("x").cast("decimal(18,2)")
    dy = F.col("y").cast("decimal(18,2)")
    m = seq.groupBy("user_id").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(18,4)"))
        .cast("double")
        .alias("sxy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
    )
    var_x = m["n"] * m["sxx"] - m["sx"] * m["sx"]
    var_y = m["n"] * m["syy"] - m["sy"] * m["sy"]
    acf = (m["n"] * m["sxy"] - m["sx"] * m["sy"]) / (
        F.sqrt(var_x) * F.sqrt(var_y)
    )
    return (
        m.filter((m["n"] >= 20) & (var_x > 0) & (var_y > 0))
        .select(
            "user_id",
            m["n"].cast("long").alias("n_pairs"),
            F.round(acf, 6).alias("acf1"),
        )
    )


@query(
    "analytics_benford",
    oracle="""
    WITH d AS (
      SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                    1, 1) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), g AS (
      SELECT digit, count(*) AS n FROM d GROUP BY digit
    )
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6)
             AS pct,
           round(log10(1 + 1.0 / CAST(digit AS INTEGER)), 6)
             AS benford_expected
    FROM g
    """,
    tags=("analytics", "profiling", "orders"),
)
def analytics_benford(spark, sf_dir):
    """Benford's-law first-digit profile of order totals: observed
    first-significant-digit frequency vs the expected log10(1 + 1/d)
    distribution — a standard fraud / synthetic-data screen. The digit
    is extracted through an exact decimal(18,2) → string cast (both
    engines render plain notation), never via float log10 whose floor
    could flip at power-of-ten boundaries.

    Scale: full scan → 9-group hash agg (map-side partial), then a
    window over the 9-row aggregate — constant-size state regardless
    of input scale.
    """
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = (
        F.col("o_totalprice")
        .cast("decimal(18,2)")
        .cast("string")
        .substr(1, 1)
        .alias("digit")
    )
    g = o.select(digit).groupBy("digit").agg(F.count("*").alias("n"))
    tot = F.sum("n").over(Window.partitionBy())
    return g.select(
        "digit",
        "n",
        F.round(F.col("n") / tot.cast("double"), 6).alias("pct"),
        F.round(
            F.log10(F.lit(1) + F.lit(1.0) / F.col("digit").cast("int")), 6
        ).alias("benford_expected"),
    )


@query(
    "analytics_cusum_changepoint",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, ts,
             CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS prefix,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS k,
             CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id) AS DOUBLE)
               / CAST(count(*) OVER (PARTITION BY user_id) AS DOUBLE) AS mu
      FROM events
    ), c AS (
      SELECT user_id, event_id, abs(prefix - k * mu) AS a
      FROM s
    ), r AS (
      SELECT user_id, event_id, a,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY a DESC, event_id) AS rn
      FROM c
    )
    SELECT user_id, event_id AS cp_event_id, round(a, 6) AS max_abs_cusum
    FROM r WHERE rn = 1
    """,
    tags=("analytics", "timeseries", "changepoint", "events"),
)
def analytics_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point detection: for each user, the event where the
    cumulative deviation from the user's mean value peaks — the argmax
    of |Σ(x_i − μ)|, the classic single-changepoint statistic.

    FP determinism without casting noisy doubles: the running deviation
    sum is algebraically rewritten as prefix_k − k·μ, where prefix_k is
    an EXACT decimal running sum of the 2-dp values and k·μ is one IEEE
    multiply of bit-identical operands — no intermediate double→decimal
    rounding anywhere.

    Scale: every window (prefix sum, row count, partition total) shares
    the user_id shuffle — one exchange, one sort, three window frames
    in the same WindowExec chain; the argmax is a fourth frame on the
    same key.
    """
    e = t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = Window.partitionBy("user_id")
    dec = F.col("value").cast("decimal(18,2)")
    s = e.select(
        "user_id",
        "event_id",
        F.sum(dec)
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("prefix"),
        F.row_number().over(wo).cast("double").alias("k"),
        (F.sum(dec).over(wp).cast("double") / F.count("*").over(wp).cast("double")).alias(
            "mu"
        ),
    )
    c = s.select(
        "user_id",
        "event_id",
        F.abs(F.col("prefix") - F.col("k") * F.col("mu")).alias("a"),
    )
    wr = Window.partitionBy("user_id").orderBy(F.desc("a"), "event_id")
    return (
        c.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("cp_event_id"),
            F.round("a", 6).alias("max_abs_cusum"),
        )
    )


@query(
    "analytics_auc",
    oracle="""
    WITH g AS (
      SELECT value,
             count(*) FILTER (WHERE event_type = 'purchase') AS np,
             count(*) FILTER (WHERE event_type <> 'purchase') AS nn
      FROM events GROUP BY value
    ), c AS (
      SELECT np, nn,
             CAST(coalesce(sum(nn) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS DOUBLE) AS cum_nn
      FROM g
    )
    SELECT CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(nn) AS BIGINT) AS n_neg,
           round(sum(np * (cum_nn + 0.5 * nn))
                 / (CAST(sum(np) AS DOUBLE) * CAST(sum(nn) AS DOUBLE)), 6)
             AS auc
    FROM c
    """,
    tags=("analytics", "ml-eval", "events"),
)
def analytics_auc(spark, sf_dir):
    """ROC AUC of ``value`` as a score for the 'purchase' label, via
    the Mann-Whitney U identity with PROPER tie handling: AUC =
    Σ_v np(v)·(#neg below v + ½·#neg at v) / (N⁺·N⁻) — equivalent to
    average-rank ties, no arbitrary tie-break needed.

    Scale: the global-order window runs over the DISTINCT-score
    relation (2-dp scores → bounded cardinality), not the event rows —
    the row-level work is one hash aggregation. Every addend is an
    exact multiple of 0.5 below 2^53, so the double sum is
    order-independent and cross-engine exact.
    """
    e = t(spark, sf_dir, "events")
    g = e.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("np"),
        F.count(F.when(F.col("event_type") != "purchase", 1)).alias("nn"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    c = g.select(
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(w), F.lit(0)).cast("double").alias("cum_nn"),
    )
    num = F.sum(F.col("np") * (F.col("cum_nn") + 0.5 * F.col("nn")))
    return c.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.round(
            num
            / (F.sum("np").cast("double") * F.sum("nn").cast("double")),
            6,
        ).alias("auc"),
    )


@query(
    "analytics_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
             sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
             sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
               PARTITION BY l_returnflag) AS tot_w
      FROM lineitem
    ), f AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey,
                                         l_linenumber) AS rn
      FROM w WHERE 2 * cum_w >= tot_w
    )
    SELECT l_returnflag, l_extendedprice AS weighted_median_price
    FROM f WHERE rn = 1
    """,
    tags=("analytics", "stats", "lineitem"),
)
def analytics_weighted_median(spark, sf_dir):
    """Quantity-weighted median price per return flag: the smallest
    price whose cumulative weight reaches half the group total — the
    lower weighted median, picked by exact decimal comparison
    (2·cum ≥ total), so no float boundary can flip the selected row.

    Scale: one shuffle on l_returnflag serves the running-weight
    window, the partition-total frame, and the final pick; the
    selected-row filter is a residual predicate, not a second pass.
    At extreme group widths the escape is the two-pass
    ``global_row_number_twopass`` algebra per group.
    """
    li = t(spark, sf_dir, "lineitem")
    order_cols = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    wo = (
        Window.partitionBy("l_returnflag")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("l_returnflag")
    dec = F.col("l_quantity").cast("decimal(18,2)")
    w = li.select(
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        F.sum(dec).over(wo).alias("cum_w"),
        F.sum(dec).over(wp).alias("tot_w"),
    )
    wr = Window.partitionBy("l_returnflag").orderBy(*order_cols)
    return (
        w.filter(2 * F.col("cum_w") >= F.col("tot_w"))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_extendedprice").alias("weighted_median_price"),
        )
    )


@query(
    "analytics_seasonality_index",
    oracle="""
    WITH m AS (
      SELECT CAST(month(o_orderdate) AS INT) AS mon,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
             count(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT mon, n, CAST(rev AS DOUBLE) AS revenue,
           round(CAST(rev AS DOUBLE) * 12 / CAST(sum(rev) OVER () AS DOUBLE),
                 6) AS seasonal_index
    FROM m
    """,
    tags=("analytics", "timeseries", "orders"),
)
def analytics_seasonality_index(spark, sf_dir):
    """Month-of-year seasonality index: each calendar month's revenue
    relative to the uniform monthly share (index 1.0 = no seasonality).
    Revenue stays an exact decimal through BOTH the per-month sum and
    the 12-row window total, so the final double ratio is bit-stable.

    Scale: full scan → 12-group hash agg; the window runs over 12
    rows. Constant-size state at any input scale.
    """
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.month("o_orderdate").cast("int").alias("mon")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        F.count("*").alias("n"),
    )
    tot = F.sum("rev").over(Window.partitionBy())
    return m.select(
        "mon",
        "n",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") * 12 / tot.cast("double"), 6
        ).alias("seasonal_index"),
    )


@query(
    "analytics_ks_test",
    oracle="""
    WITH g AS (
      SELECT value,
             count(*) FILTER (WHERE event_type = 'click') AS na,
             count(*) FILTER (WHERE event_type = 'purchase') AS nb
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY value
    ), c AS (
      SELECT value,
             CAST(sum(na) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / CAST((SELECT sum(na) FROM g) AS DOUBLE) AS fa,
             CAST(sum(nb) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / CAST((SELECT sum(nb) FROM g) AS DOUBLE) AS fb
      FROM g
    ), r AS (
      SELECT value, abs(fa - fb) AS d,
             row_number() OVER (ORDER BY abs(fa - fb) DESC, value) AS rn
      FROM c
    )
    SELECT CAST((SELECT sum(na) FROM g) AS BIGINT) AS n_a,
           CAST((SELECT sum(nb) FROM g) AS BIGINT) AS n_b,
           value AS ks_at_value, round(d, 6) AS ks_stat
    FROM r WHERE rn = 1
    """,
    tags=("analytics", "stats", "drift", "events"),
)
def analytics_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic between the click and
    purchase value distributions: max |F_a(x) − F_b(x)| plus the value
    where the gap peaks — the standard nonparametric drift detector,
    complementing the KL (``text_source_divergence``) and PSI-style
    checks.

    FP determinism: cumulative counts are exact integers; each CDF
    ratio, difference, and abs is one IEEE op on identical operands,
    and the argmax tie-breaks on value.

    Scale: the CDF window runs over the DISTINCT-value relation (2-dp
    values → bounded), not events; the row-level work is one hash agg.
    """
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    g = e.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("na"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("nb"),
    )
    wc = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy()
    c = g.select(
        "value",
        (
            F.sum("na").over(wc).cast("double")
            / F.sum("na").over(wt).cast("double")
        ).alias("fa"),
        (
            F.sum("nb").over(wc).cast("double")
            / F.sum("nb").over(wt).cast("double")
        ).alias("fb"),
        F.sum("na").over(wt).alias("tot_a"),
        F.sum("nb").over(wt).alias("tot_b"),
    )
    d = F.abs(F.col("fa") - F.col("fb"))
    wr = Window.orderBy(F.desc("d"), "value")
    return (
        c.withColumn("d", d)
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            F.col("tot_a").cast("long").alias("n_a"),
            F.col("tot_b").cast("long").alias("n_b"),
            F.col("value").alias("ks_at_value"),
            F.round("d", 6).alias("ks_stat"),
        )
    )


@query(
    "analytics_chi_square",
    oracle="""
    WITH o AS (
      SELECT event_type AS et, CAST(dayofweek(ts) AS INT) AS dow,
             count(*) AS obs
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT et, dow, obs,
             sum(obs) OVER (PARTITION BY et) AS row_tot,
             sum(obs) OVER (PARTITION BY dow) AS col_tot,
             sum(obs) OVER () AS n
      FROM o
    ), term AS (
      SELECT n,
             CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
               / CAST(n AS DOUBLE) AS e,
             CAST(obs AS DOUBLE) AS od
      FROM m
    )
    SELECT CAST(max(n) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(CAST(sum(CAST((od - e) * (od - e) / e AS DECIMAL(18,10)))
                      AS DOUBLE), 6) AS chi2
    FROM term
    """,
    tags=("analytics", "stats", "events"),
)
def analytics_chi_square(spark, sf_dir):
    """Chi-square independence statistic for event_type × day-of-week:
    Σ (observed − expected)² / expected over the contingency table —
    the classic categorical-association screen (compare to the
    critical value for (r−1)(c−1) dof offline).

    FP determinism: the contingency table is exact integers; expected
    counts and each cell term are fixed IEEE op chains, and terms are
    cast to decimal(18,10) so the final sum is order-independent.

    Scale: one hash agg to the (types × 7)-cell table, then windows
    over that constant-size relation.
    """
    e = t(spark, sf_dir, "events")
    o = e.groupBy(
        F.col("event_type").alias("et"),
        F.dayofweek("ts").cast("int").alias("dow"),
    ).agg(F.count("*").alias("obs"))
    m = o.select(
        "obs",
        F.sum("obs").over(Window.partitionBy("et")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("dow")).alias("col_tot"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    exp = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n").cast("double")
    )
    od = F.col("obs").cast("double")
    term = ((od - exp) * (od - exp) / exp).cast("decimal(18,10)")
    return m.select("n", term.alias("term")).agg(
        F.max("n").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_cells"),
        F.round(F.sum("term").cast("double"), 6).alias("chi2"),
    )


@query(
    "analytics_gini",
    oracle="""
    WITH r AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_custkey
    ), k AS (
      SELECT rev,
             CAST(row_number() OVER (ORDER BY rev, o_custkey) AS BIGINT) AS i
      FROM r
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(rev) AS DOUBLE) AS total_revenue,
           round(CAST(2 * sum(i * rev) - (count(*) + 1) * sum(rev) AS DOUBLE)
                 / CAST(count(*) * sum(rev) AS DOUBLE), 6) AS gini
    FROM k
    """,
    tags=("analytics", "stats", "orders"),
)
def analytics_gini(spark, sf_dir):
    """Gini coefficient of customer revenue concentration — the
    inequality summary behind "top x% of customers drive y% of
    revenue" (Lorenz) dashboards: G = (2·Σ i·x_(i) − (n+1)·Σx) /
    (n·Σx) with revenues ranked ascending, custkey tie-break.

    FP determinism: rank·revenue products and all sums stay exact
    decimal/integer until two final double casts and one division.

    Scale: the ranked relation is per-customer (aggregated, not raw
    orders); at extreme customer counts the global rank swaps to the
    two-pass ``global_row_number_twopass`` algebra — the Gini sums
    themselves are plain map-side-combining aggregates either way.
    """
    o = t(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    k = r.select(
        "rev",
        F.row_number()
        .over(Window.orderBy("rev", "o_custkey"))
        .cast("long")
        .alias("i"),
    )
    n = F.count("*")
    srev = F.sum("rev")
    sirev = F.sum(F.col("i") * F.col("rev"))
    return k.agg(
        n.cast("long").alias("n_customers"),
        srev.cast("double").alias("total_revenue"),
        F.round(
            (2 * sirev - (n + 1) * srev).cast("double")
            / (n * srev).cast("double"),
            6,
        ).alias("gini"),
    )


@query(
    "profile_entropy",
    oracle="""
    WITH u AS (
      SELECT 'events.event_type' AS col_name, event_type AS v FROM events
      UNION ALL
      SELECT 'documents.lang', lang FROM documents
      UNION ALL
      SELECT 'documents.source', source FROM documents
    ), c AS (
      SELECT col_name, v, count(*) AS cnt FROM u GROUP BY 1, 2
    ), p AS (
      SELECT col_name, cnt,
             CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY col_name)
                                        AS DOUBLE) AS pr,
             count(*) OVER (PARTITION BY col_name) AS k
      FROM c
    )
    SELECT col_name, CAST(max(k) AS BIGINT) AS n_categories,
           round(CAST(sum(CAST(-pr * ln(pr) AS DECIMAL(18,12))) AS DOUBLE),
                 6) AS entropy,
           round(CAST(sum(CAST(-pr * ln(pr) AS DECIMAL(18,12))) AS DOUBLE)
                 / ln(CAST(max(k) AS DOUBLE)), 6) AS norm_entropy
    FROM p GROUP BY col_name
    """,
    tags=("analytics", "profiling", "events", "documents"),
)
def profile_entropy(spark, sf_dir):
    """Shannon entropy profile of categorical columns (event_type,
    document lang/source): H = −Σ p·ln p plus the 0-1 normalized
    H/ln(k) — the data-profiling signal for skewed / near-constant
    columns that should become partition keys or be dropped.

    FP determinism: probabilities are exact-count ratios; each −p·ln p
    term is cast to decimal(18,12) so per-column sums are
    order-independent.

    Scale: one union of column scans → hash agg to (column, category)
    cardinality, then constant-size windows per column.
    """
    e = t(spark, sf_dir, "events").select(
        F.lit("events.event_type").alias("col_name"),
        F.col("event_type").alias("v"),
    )
    docs = t(spark, sf_dir, "documents")
    u = e.unionByName(
        docs.select(
            F.lit("documents.lang").alias("col_name"), F.col("lang").alias("v")
        )
    ).unionByName(
        docs.select(
            F.lit("documents.source").alias("col_name"),
            F.col("source").alias("v"),
        )
    )
    c = u.groupBy("col_name", "v").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("col_name")
    p = c.select(
        "col_name",
        (F.col("cnt").cast("double") / F.sum("cnt").over(w).cast("double")).alias(
            "pr"
        ),
        F.count("*").over(w).alias("k"),
    )
    term = (-F.col("pr") * F.log("pr")).cast("decimal(18,12)")
    h = F.sum(term).cast("double")
    return p.select("col_name", "k", term.alias("term")).groupBy("col_name").agg(
        F.max("k").cast("long").alias("n_categories"),
        F.round(F.sum("term").cast("double"), 6).alias("entropy"),
        F.round(
            F.sum("term").cast("double") / F.log(F.max("k").cast("double")), 6
        ).alias("norm_entropy"),
    )


@query(
    "analytics_cohort_ltv",
    oracle="""
    WITH first AS (
      SELECT o_custkey,
             min(CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT))
               AS cohort_m
      FROM orders GROUP BY o_custkey
    ), rev AS (
      SELECT f.cohort_m,
             CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS INT)
               - f.cohort_m AS offset_m,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    ), size_ AS (
      SELECT cohort_m, count(*) AS n_cust FROM first GROUP BY 1
    )
    SELECT r.cohort_m, r.offset_m, s.n_cust,
           CAST(r.rev AS DOUBLE) AS revenue,
           round(CAST(sum(r.rev) OVER (PARTITION BY r.cohort_m
                   ORDER BY r.offset_m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / CAST(s.n_cust AS DOUBLE), 6)
             AS cum_ltv_per_customer
    FROM rev r JOIN size_ s ON r.cohort_m = s.cohort_m
    """,
    tags=("analytics", "cohort", "orders"),
)
def analytics_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curve: customers grouped by first-order
    month, revenue tracked by month offset since acquisition, and the
    running cumulative LTV per cohort customer — the standard
    retention-economics readout (complements ``cohort_retention``,
    which tracks activity, not value).

    FP determinism: month indices are integer arithmetic; revenue
    stays exact decimal through the per-cell sums AND the cumulative
    window; the single division per row is IEEE on identical operands.

    Scale: first-order months via one agg on custkey; the join back is
    on the same key (no extra shuffle under AQE reuse); the cumulative
    window partitions by cohort over the bounded (cohort × offset)
    grid.
    """
    o = t(spark, sf_dir, "orders")
    mcol = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("int")
    first = o.groupBy("o_custkey").agg(F.min(mcol).alias("cohort_m"))
    rev = (
        o.join(first, "o_custkey")
        .groupBy("cohort_m", (mcol - F.col("cohort_m")).alias("offset_m"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    size = first.groupBy("cohort_m").agg(F.count("*").alias("n_cust"))
    wc = (
        Window.partitionBy("cohort_m")
        .orderBy("offset_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.join(size, "cohort_m")
        .select(
            "cohort_m",
            "offset_m",
            "n_cust",
            F.col("rev").cast("double").alias("revenue"),
            F.round(
                F.sum("rev").over(wc).cast("double")
                / F.col("n_cust").cast("double"),
                6,
            ).alias("cum_ltv_per_customer"),
        )
    )


@query(
    "analytics_calibration",
    oracle="""
    WITH g AS (
      SELECT value, count(*) AS c,
             count(*) FILTER (WHERE event_type = 'purchase') AS cp
      FROM events GROUP BY value
    ), cum AS (
      SELECT value, c, cp,
             coalesce(sum(c) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_excl,
             sum(c) OVER () AS n
      FROM g
    ), b AS (
      SELECT least(9, CAST(floor(10.0 * cum_excl / n) AS INT)) + 1 AS bin,
             value, c, cp
      FROM cum
    )
    SELECT CAST(bin AS INTEGER) AS bin, CAST(sum(c) AS BIGINT) AS n_rows,
           round(CAST(sum(CAST(value AS DECIMAL(18,2)) * c) AS DOUBLE)
                 / CAST(sum(c) AS DOUBLE), 6) AS avg_score,
           round(CAST(sum(cp) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
             AS purchase_rate
    FROM b GROUP BY bin
    """,
    tags=("analytics", "ml-eval", "events"),
)
def analytics_calibration(spark, sf_dir):
    """Calibration / reliability curve for ``value`` as a purchase
    score: equal-frequency decile bins, each reporting mean score vs
    observed purchase rate — read alongside ``analytics_auc`` (AUC
    ranks, calibration checks the probabilities themselves).

    Scale: bins derive from the DISTINCT-score relation's cumulative
    counts (bounded, 2-dp scores) — never an ntile over raw rows — so
    the row-level work is one hash agg; ties share a bin by
    construction. All ratios are exact-count/exact-decimal quotients.
    """
    e = t(spark, sf_dir, "events")
    g = e.groupBy("value").agg(
        F.count("*").alias("c"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("cp"),
    )
    wc = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.partitionBy()
    cum = g.select(
        "value",
        "c",
        "cp",
        F.coalesce(F.sum("c").over(wc), F.lit(0)).alias("cum_excl"),
        F.sum("c").over(wt).alias("n"),
    )
    bin_ = (
        F.least(
            F.lit(9),
            F.floor(10.0 * F.col("cum_excl") / F.col("n")).cast("int"),
        )
        + 1
    ).alias("bin")
    return (
        cum.select(bin_, "value", "c", "cp")
        .groupBy("bin")
        .agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)") * F.col("c"))
                .cast("double")
                / F.sum("c").cast("double"),
                6,
            ).alias("avg_score"),
            F.round(
                F.sum("cp").cast("double") / F.sum("c").cast("double"), 6
            ).alias("purchase_rate"),
        )
    )


@query(
    "analytics_abc_pareto",
    oracle="""
    WITH r AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
               AS rev
      FROM lineitem GROUP BY l_partkey
    ), c AS (
      SELECT rev,
             sum(rev) OVER (ORDER BY rev DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(rev) OVER () AS tot
      FROM r
    ), k AS (
      SELECT CASE
               WHEN CAST(cum AS DOUBLE) <= 0.80 * CAST(tot AS DOUBLE)
                 THEN 'A'
               WHEN CAST(cum AS DOUBLE) <= 0.95 * CAST(tot AS DOUBLE)
                 THEN 'B'
               ELSE 'C' END AS abc_class,
             rev, tot
      FROM c
    )
    SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev) AS DOUBLE) AS class_revenue,
           round(CAST(sum(rev) AS DOUBLE) / CAST(max(tot) AS DOUBLE), 6)
             AS revenue_share
    FROM k GROUP BY abc_class
    """,
    tags=("analytics", "pareto", "lineitem"),
)
def analytics_abc_pareto(spark, sf_dir):
    """ABC / Pareto classification of parts by revenue contribution
    (A = first 80% of cumulative revenue, B = next 15%, C = tail) —
    the inventory-management standard for "which SKUs matter".

    FP determinism: revenue and its cumulative stay exact decimal; the
    class boundaries compare two IEEE products of identical operands
    (a tie at exactly 0.80 of total revenue is a measure-zero event on
    money data).

    Scale: ranking runs over the per-part AGGREGATE (bounded by part
    count, not lineitem rows); at extreme part counts the cumulative
    switches to the two-pass prefix-offset algebra
    (``global_row_number_twopass``).
    """
    li = t(spark, sf_dir, "lineitem")
    r = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("rev")
    )
    wc = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy()
    c = r.select(
        "rev",
        F.sum("rev").over(wc).alias("cum"),
        F.sum("rev").over(wt).alias("tot"),
    )
    cls = (
        F.when(
            F.col("cum").cast("double") <= 0.80 * F.col("tot").cast("double"),
            "A",
        )
        .when(
            F.col("cum").cast("double") <= 0.95 * F.col("tot").cast("double"),
            "B",
        )
        .otherwise("C")
    )
    return (
        c.select(cls.alias("abc_class"), "rev", "tot")
        .groupBy("abc_class")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("rev").cast("double").alias("class_revenue"),
            F.round(
                F.sum("rev").cast("double") / F.max("tot").cast("double"), 6
            ).alias("revenue_share"),
        )
    )


@query(
    "analytics_new_vs_returning",
    oracle="""
    WITH f AS (
      SELECT o_custkey,
             min(CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT))
               AS first_m
      FROM orders GROUP BY 1
    ), act AS (
      SELECT DISTINCT
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT) AS m,
             o_custkey
      FROM orders
    )
    SELECT act.m, CAST(count(*) AS BIGINT) AS n_active,
           CAST(count(*) FILTER (WHERE f.first_m = act.m) AS BIGINT)
             AS n_new,
           CAST(count(*) FILTER (WHERE f.first_m < act.m) AS BIGINT)
             AS n_returning
    FROM act JOIN f ON act.o_custkey = f.o_custkey
    GROUP BY act.m
    """,
    tags=("analytics", "cohort", "orders"),
)
def analytics_new_vs_returning(spark, sf_dir):
    """Monthly active customers decomposed into new vs returning —
    the growth-accounting counterpart of ``analytics_cohort_ltv``
    (same first-order anchor, activity instead of value).

    Scale: both the first-month anchor and the distinct activity grid
    aggregate on o_custkey — the join is same-key (no extra exchange
    under AQE reuse); everything else is exact integer counting.
    """
    o = t(spark, sf_dir, "orders")
    mcol = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("int")
    f = o.groupBy("o_custkey").agg(F.min(mcol).alias("first_m"))
    act = o.select(mcol.alias("m"), "o_custkey").distinct()
    return (
        act.join(f, "o_custkey")
        .groupBy("m")
        .agg(
            F.count("*").cast("long").alias("n_active"),
            F.count(F.when(F.col("first_m") == F.col("m"), 1))
            .cast("long")
            .alias("n_new"),
            F.count(F.when(F.col("first_m") < F.col("m"), 1))
            .cast("long")
            .alias("n_returning"),
        )
    )


@query(
    "funnel_time_bound",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
       AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL '1 hour'
      WHERE e.event_type = 'click' GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
       AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL '24 hours'
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT 'view' AS stage, count(*) AS n_users FROM v
    UNION ALL SELECT 'view>click(1h)', count(*) FROM c
    UNION ALL SELECT 'view>click(1h)>purchase(24h)', count(*) FROM p
    """,
    tags=("analytics", "funnel", "events"),
)
def funnel_time_bound(spark, sf_dir):
    """Conversion funnel with per-step time budgets (click within 1 h
    of first view, purchase within 24 h of that click) — the
    attribution-window variant of ``funnel_3step``; the unbounded
    funnel overcounts conversions that took weeks.

    Scale: same shape as the unbounded funnel — each stage is one
    min-aggregate on user_id joined back on the same key with the
    window bound as a residual predicate; no new shuffle keys.
    """
    e = t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.lit("view").alias("stage"), F.count("*").alias("n_users"))
        .unionByName(
            c.agg(
                F.lit("view>click(1h)").alias("stage"),
                F.count("*").alias("n_users"),
            )
        )
        .unionByName(
            p.agg(
                F.lit("view>click(1h)>purchase(24h)").alias("stage"),
                F.count("*").alias("n_users"),
            )
        )
    )


@query(
    "pattern_rising_runs",
    oracle="""
    WITH s AS (
      SELECT user_id, value, ts, event_id,
             CASE WHEN lag(value) OVER w IS NULL
                    OR value <= lag(value) OVER w THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM s
    ), lens AS (
      SELECT user_id, run_id, count(*) AS len
      FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(len) AS BIGINT) AS longest_run
    FROM lens WHERE len >= 3 GROUP BY user_id
    """,
    tags=("analytics", "pattern", "gaps-islands", "events"),
)
def pattern_rising_runs(spark, sf_dir):
    """Variable-length pattern matching via the islands algebra:
    maximal strictly-increasing runs of ``value`` per user, reporting
    users with runs of length >= 3 — the unbounded-repetition
    (``A B+ C``-style) case ``pattern_v_shape``'s fixed-lag
    composition cannot express; run boundaries become a running sum of
    break flags, turning the state machine into two window passes.

    Scale: both windows and the run aggregation share the user_id
    shuffle — one exchange end to end.
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.when(
            F.lag("value").over(w).isNull()
            | (F.col("value") <= F.lag("value").over(w)),
            1,
        )
        .otherwise(0)
        .alias("brk")
    )
    runs = e.select("user_id", "ts", "event_id", brk).select(
        "user_id",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_id"),
    )
    lens = runs.groupBy("user_id", "run_id").agg(F.count("*").alias("len"))
    return (
        lens.filter(F.col("len") >= 3)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_runs"),
            F.max("len").cast("long").alias("longest_run"),
        )
    )


@query(
    "analytics_holt_trend",
    # recursive-CTE fold (list_reduce is batch-layout-buggy in DuckDB
    # 1.0.0 — see ewma_per_user); identical expression trees keep the
    # doubles bit-exact with Spark's aggregate() fold
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS i,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ),
    rec(user_id, i, n, l, b) AS (
      SELECT s2.user_id, 2, s2.n, s2.value, s2.value - s1.value
      FROM seq s1 JOIN seq s2
        ON s1.user_id = s2.user_id AND s1.i = 1 AND s2.i = 2
      UNION ALL
      SELECT s.user_id, s.i, s.n,
             0.5 * s.value + 0.5 * (r.l + r.b),
             0.25 * ((0.5 * s.value + 0.5 * (r.l + r.b)) - r.l)
               + 0.75 * r.b
      FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           l AS level, b AS trend, l + b AS forecast_next
    FROM rec WHERE i = n
    """,
    tags=("analytics", "timeseries", "fold", "events"),
)
def analytics_holt_trend(spark, sf_dir):
    """Holt double-exponential smoothing (level + trend, α=0.5 β=0.25)
    per user with a one-step-ahead forecast — the trend-aware upgrade
    of ``ewma_per_user``; a TWO-state linear recurrence no window
    frame expresses. Realized as a higher-order ``aggregate`` fold
    with a struct accumulator over the per-key ordered series; both
    engines fold in the identical order with identical IEEE
    expression trees, so the doubles match bit-exactly (no rounding).

    Scale shape: identical to the EWMA fold — one hash agg keyed by
    user, fold inside the map stage; unbounded keys escape to the
    ``applyInPandasWithState`` recurrence operator.
    """
    e = t(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(ts, event_id, value))),"
            " s -> s.value)"
        ).alias("vals"),
        F.count("*").alias("n_events"),
    )
    acc = F.expr(
        "aggregate(slice(vals, 3, size(vals) - 2),"
        " named_struct('l', element_at(vals, 2),"
        "              'b', element_at(vals, 2) - element_at(vals, 1)),"
        " (acc, x) -> named_struct("
        "   'l', 0.5d * x + 0.5d * (acc.l + acc.b),"
        "   'b', 0.25d * ((0.5d * x + 0.5d * (acc.l + acc.b)) - acc.l)"
        "        + 0.75d * acc.b))"
    )
    return (
        seq.filter(F.col("n_events") >= 2)
        .select("user_id", "n_events", acc.alias("acc"))
        .select(
            "user_id",
            "n_events",
            F.col("acc.l").alias("level"),
            F.col("acc.b").alias("trend"),
            (F.col("acc.l") + F.col("acc.b")).alias("forecast_next"),
        )
    )


@query(
    "analytics_seasonal_zscore",
    oracle="""
    WITH m AS (
      SELECT o_orderkey, o_totalprice,
             CAST(month(o_orderdate) AS INT) AS mon
      FROM orders
    ), mm AS (
      SELECT mon,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS mu_m
      FROM m GROUP BY mon
    ), r AS (
      SELECT m.o_orderkey, m.o_totalprice - mm.mu_m AS resid
      FROM m JOIN mm ON m.mon = mm.mon
    ), s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(resid AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(resid * resid AS DECIMAL(24,6))) AS DOUBLE) AS sxx
      FROM r
    ), z AS (
      SELECT o_orderkey,
             resid / sqrt((s.sxx - s.sx * s.sx / s.n) / (s.n - 1)) AS zval
      FROM r, s
    )
    SELECT o_orderkey, round(zval, 6) AS seasonal_z
    FROM z ORDER BY abs(zval) DESC, o_orderkey LIMIT 100
    """,
    tags=("analytics", "anomaly", "orders"),
)
def analytics_seasonal_zscore(spark, sf_dir):
    """Seasonally-adjusted anomaly detection: z-score of each order
    total against its calendar-month mean — deseasonalizing first
    stops December-sized orders from flagging as anomalies the way a
    raw z-score (``zscore_outliers``) would. Top-100 by |z|,
    deterministic tie-break.

    FP determinism: month means are exact-decimal/count quotients;
    residuals are single IEEE subtractions; the residual variance uses
    the exact-decimal moment policy (resid rounds to decimal(18,6) —
    1e-12 from a 6-dp boundary never flips on money data); the final
    divide and round are IEEE on identical operands.

    Scale: the 12-row month means broadcast back; the variance is one
    more scalar aggregate broadcast into the scoring pass; top-100 is
    TakeOrderedAndProject.
    """
    o = t(spark, sf_dir, "orders")
    m = o.select(
        "o_orderkey",
        "o_totalprice",
        F.month("o_orderdate").cast("int").alias("mon"),
    )
    mm = m.groupBy("mon").agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*").cast("double")
        ).alias("mu_m")
    )
    r = m.join(F.broadcast(mm), "mon").select(
        "o_orderkey", (F.col("o_totalprice") - F.col("mu_m")).alias("resid")
    )
    s = r.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("resid").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum((F.col("resid") * F.col("resid")).cast("decimal(24,6)"))
        .cast("double")
        .alias("sxx"),
    )
    z = r.crossJoin(F.broadcast(s)).select(
        "o_orderkey",
        (
            F.col("resid")
            / F.sqrt(
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                / (F.col("n") - 1)
            )
        ).alias("zval"),
    )
    return (
        z.orderBy(F.abs(F.col("zval")).desc(), "o_orderkey")
        .limit(100)
        .select("o_orderkey", F.round("zval", 6).alias("seasonal_z"))
    )


@query(
    "analytics_mutual_information",
    oracle="""
    WITH c AS (
      SELECT lang, source, count(*) AS c_xy
      FROM documents GROUP BY 1, 2
    ), m AS (
      SELECT c_xy,
             sum(c_xy) OVER (PARTITION BY lang)   AS c_x,
             sum(c_xy) OVER (PARTITION BY source) AS c_y,
             sum(c_xy) OVER ()                    AS n
      FROM c
    )
    SELECT CAST(max(n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(CAST(sum(CAST(
             (CAST(c_xy AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(c_xy AS DOUBLE) * CAST(n AS DOUBLE)
                  / (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE)))
             AS DECIMAL(18,12))) AS DOUBLE), 6) AS mi_nats
    FROM m
    """,
    tags=("analytics", "stats", "documents"),
)
def analytics_mutual_information(spark, sf_dir):
    """Mutual information I(lang; source) over the documents corpus —
    the feature-association screen a data-mixture designer runs to see
    whether two partitioning dimensions are redundant (high MI) or
    independent (MI ~ 0) before choosing stratification keys:
    I = Σ p(x,y)·ln(p(x,y) / (p(x)p(y))) over the contingency table.

    FP determinism: cell counts are exact integers (< 2^53, exact in
    double); each cell term is a fixed IEEE op chain mirrored
    operand-for-operand in the oracle, then cast to decimal(18,12) so
    the final sum is order-independent; 6dp rounding absorbs ln ulps.

    Scale: one hash agg to the |langs|×|sources| contingency table
    (map-side combinable — raw rows never shuffle), then windows over
    that constant-size relation. Identical shape at 100 TB.
    """
    d = t(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count("*").alias("c_xy"))
    m = c.select(
        "c_xy",
        F.sum("c_xy").over(Window.partitionBy("lang")).alias("c_x"),
        F.sum("c_xy").over(Window.partitionBy("source")).alias("c_y"),
        F.sum("c_xy").over(Window.partitionBy()).alias("n"),
    )
    cd = F.col("c_xy").cast("double")
    nd = F.col("n").cast("double")
    term = (cd / nd) * F.log(
        cd * nd / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
    )
    return m.select("n", term.cast("decimal(18,12)").alias("term")).agg(
        F.max("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_cells"),
        F.round(F.sum("term").cast("double"), 6).alias("mi_nats"),
    )


@query(
    "analytics_attribution_utouch",
    oracle="""
    WITH p AS (
      SELECT user_id, min(ts) AS tp
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), pv AS (
      SELECT p.user_id, p.tp, e.value AS conv_value
      FROM p JOIN events e
        ON e.user_id = p.user_id AND e.ts = p.tp
       AND e.event_type = 'purchase'
    ), touch AS (
      SELECT e.user_id, e.event_type, pv.conv_value,
             row_number() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts, e.event_id) AS r,
             count(*)  OVER (PARTITION BY e.user_id) AS n
      FROM events e JOIN pv ON e.user_id = pv.user_id AND e.ts < pv.tp
      WHERE e.event_type IN ('view', 'click')
    ), credit AS (
      SELECT event_type,
             CAST(conv_value * (CASE
               WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
               WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
               WHEN r = 1 OR r = n THEN CAST(0.4 AS DOUBLE)
               ELSE CAST(0.2 AS DOUBLE) / (n - 2) END) AS DECIMAL(18,10)) AS c
      FROM touch
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           round(CAST(sum(c) AS DOUBLE), 4) AS credited_value
    FROM credit GROUP BY event_type
    """,
    tags=("analytics", "attribution", "events"),
)
def analytics_attribution_utouch(spark, sf_dir):
    """U-SHAPED (position-based) multi-touch attribution: each user's
    first purchase value is credited across their pre-purchase
    view/click touchpoints — 40% to the first touch, 40% to the last,
    the remaining 20% split evenly over the middle touches (degenerate
    cases: 1 touch → 100%, 2 touches → 50/50) — the standard
    position-based model marketing warehouses run nightly.

    FP determinism: the weight is a CASE over exact integers (0.2 /
    (n−2) is one IEEE division), credit = value·weight is one
    multiply, and each credit is cast to decimal(18,10) so the
    per-channel sums are order-independent; 4dp rounding absorbs the
    final-cast ulp.

    Scale: conversions are one min-agg on user_id; touches join on
    the same user key with the time bound as a residual predicate (no
    new shuffle key); ranking windows partition per user. Every stage
    is user-keyed — co-partitioned end-to-end, skew bounded by events
    per user.
    """
    e = t(spark, sf_dir, "events")
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    pv = (
        e.filter(F.col("event_type") == "purchase")
        .join(p, "user_id")
        .filter(F.col("ts") == F.col("tp"))
        .select("user_id", "tp", F.col("value").alias("conv_value"))
    )
    wu = Window.partitionBy("user_id")
    touch = (
        e.filter(F.col("event_type").isin("view", "click"))
        .join(pv, "user_id")
        .filter(F.col("ts") < F.col("tp"))
        .select(
            "user_id",
            "event_type",
            "conv_value",
            F.row_number().over(wu.orderBy("ts", "event_id")).alias("r"),
            F.count("*").over(wu).alias("n"),
        )
    )
    weight = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("r") == 1) | (F.col("r") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    credit = (F.col("conv_value") * weight).cast("decimal(18,10)")
    return (
        touch.select("event_type", credit.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.round(F.sum("c").cast("double"), 4).alias("credited_value"),
        )
    )


@query(
    "analytics_lttb_downsample",
    oracle="""
    WITH pts AS (
      SELECT user_id, event_id, value, epoch_us(ts) AS x,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS r
      FROM events
    ), bk AS (
      SELECT user_id, event_id, value, x, r,
             CAST((r - 1) // 10 AS BIGINT) AS b
      FROM pts
    ), bs AS (
      SELECT user_id, b,
             CAST(sum(x) AS DOUBLE) / count(*) AS mx,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS my
      FROM bk GROUP BY 1, 2
    ), nb AS (
      SELECT user_id, b,
             lag(mx)  OVER w AS px, lag(my)  OVER w AS py,
             lead(mx) OVER w AS nx, lead(my) OVER w AS ny
      FROM bs
      WINDOW w AS (PARTITION BY user_id ORDER BY b)
    ), scored AS (
      SELECT k.user_id, k.b, k.event_id, k.value, k.r,
             CASE WHEN n.px IS NOT NULL AND n.nx IS NOT NULL
                  THEN abs((n.px - n.nx) * (CAST(k.value AS DOUBLE) - n.py)
                           - (n.px - CAST(k.x AS DOUBLE)) * (n.ny - n.py))
                  ELSE CAST(0.0 AS DOUBLE) END AS score,
             (n.px IS NOT NULL AND n.nx IS NOT NULL) AS interior,
             n.nx IS NULL AS is_last
      FROM bk k JOIN nb n ON k.user_id = n.user_id AND k.b = n.b
    ), ranked AS (
      SELECT user_id, b, event_id, value, score,
             row_number() OVER (
               PARTITION BY user_id, b
               ORDER BY CASE WHEN interior THEN -score
                             ELSE CAST(0.0 AS DOUBLE) END,
                        CASE WHEN is_last AND NOT interior THEN -r
                             ELSE r END) AS pick
      FROM scored
    )
    SELECT user_id, CAST(b AS BIGINT) AS bucket, event_id, value
    FROM ranked WHERE pick = 1
    """,
    tags=("analytics", "timeseries", "events"),
)
def analytics_lttb_downsample(spark, sf_dir):
    """Largest-Triangle time-series downsampling (the LTTB family,
    bucketed-anchor variant): split each user's event series into
    10-point buckets and keep, per bucket, the point forming the
    LARGEST TRIANGLE with the neighboring buckets' mean points — the
    standard lossy downsample that preserves visual extrema far
    better than striding or averaging. Boundary buckets keep their
    first (leading) / last (trailing) point, as canonical LTTB pins
    the series endpoints.

    Unlike sequential LTTB (each choice depends on the previous one),
    the bucket-MEAN anchor variant is embarrassingly parallel — a
    groupBy + lag/lead + one ranking window, all partitioned by the
    series key.

    FP determinism: bucket means are exact-integer / exact-decimal
    sums cast once to double and the area is one fixed IEEE chain,
    but engines may still differ in the final ulp (~1e-16 relative) —
    far below any real ranking gap, so the SELECTION is stable and
    only the chosen points (exact ints + raw parquet doubles) are
    emitted; the raw score stays internal.

    Scale: series-key partitioning end-to-end (one shuffle on
    user_id serves ranking, bucket stats and selection); bucket stats
    are a 10×-reduced relation. At 100 TB × billions of series this
    is the shape you want — no global state, skew bounded by points
    per series.
    """
    e = t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = e.select(
        "user_id",
        "event_id",
        "value",
        F.unix_micros(F.to_utc_timestamp("ts", "UTC")).alias("x"),
        F.row_number().over(wu).alias("r"),
    )
    bk = pts.withColumn(
        "b", F.floor((F.col("r") - 1) / 10).cast("long")
    )
    bs = bk.groupBy("user_id", "b").agg(
        (F.sum("x").cast("double") / F.count("*")).alias("mx"),
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("my"),
    )
    wb = Window.partitionBy("user_id").orderBy("b")
    nb = bs.select(
        "user_id",
        "b",
        F.lag("mx").over(wb).alias("px"),
        F.lag("my").over(wb).alias("py"),
        F.lead("mx").over(wb).alias("nx"),
        F.lead("my").over(wb).alias("ny"),
    )
    k = bk.join(nb, ["user_id", "b"])
    interior = F.col("px").isNotNull() & F.col("nx").isNotNull()
    area = F.abs(
        (F.col("px") - F.col("nx"))
        * (F.col("value").cast("double") - F.col("py"))
        - (F.col("px") - F.col("x").cast("double"))
        * (F.col("ny") - F.col("py"))
    )
    scored = k.select(
        "user_id",
        "b",
        "event_id",
        "value",
        "r",
        F.when(interior, area).otherwise(F.lit(0.0)).alias("score"),
        interior.alias("interior"),
        F.col("nx").isNull().alias("is_last"),
    )
    pick = F.row_number().over(
        Window.partitionBy("user_id", "b").orderBy(
            F.when(F.col("interior"), -F.col("score")).otherwise(F.lit(0.0)),
            F.when(
                F.col("is_last") & ~F.col("interior"), -F.col("r")
            ).otherwise(F.col("r")),
        )
    )
    return (
        scored.withColumn("pick", pick)
        .filter(F.col("pick") == 1)
        .select(
            "user_id",
            F.col("b").cast("long").alias("bucket"),
            "event_id",
            "value",
        )
    )


@query(
    "analytics_survival_km",
    oracle="""
    WITH g AS (SELECT max(ts) AS tmax FROM events),
    u AS (
      SELECT user_id, min(ts) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS te
      FROM events GROUP BY 1
    ), durs AS (
      SELECT user_id,
             CAST(date_diff('day', t0, coalesce(te, g.tmax)) AS BIGINT)
               AS dur,
             (te IS NOT NULL) AS ev
      FROM u, g
    ), agg AS (
      SELECT dur,
             count(*) FILTER (WHERE ev) AS d,
             count(*) AS leaving
      FROM durs GROUP BY dur
    ), risk AS (
      SELECT dur, d,
             sum(leaving) OVER () -
               coalesce(sum(leaving) OVER (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
      FROM agg
    ), terms AS (
      SELECT dur, d, n_at_risk,
             CAST(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE))
                  AS DECIMAL(18,12)) AS lnterm
      FROM risk WHERE d > 0 AND d < n_at_risk
    )
    SELECT dur AS day, CAST(d AS BIGINT) AS d_events,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           round(exp(CAST(sum(lnterm) OVER (ORDER BY dur) AS DOUBLE)), 6)
             AS survival
    FROM terms
    """,
    tags=("analytics", "survival", "events"),
)
def analytics_survival_km(spark, sf_dir):
    """KAPLAN-MEIER survival curve for time-to-first-purchase with
    right-censoring — the survival-analysis estimator behind churn
    and conversion-latency dashboards: users who never purchase are
    censored at the corpus end; at each event day t,
    S(t) = Π_{t_i <= t} (1 − d_i / n_i) with d_i purchases and n_i
    users still at risk. Days with d = n (everyone at risk converts)
    would zero the curve and are the curve's terminal point; the
    standard product skips them, as here (d < n_at_risk guard).

    FP determinism: d/n is int/int (exact doubles), each ln term is
    cast to decimal(18,12) so the PREFIX sums are exact regardless of
    how either engine's windowed sum associates, and the single
    exp + 6dp round at the end absorbs the last-ulp.

    Scale: one user-level min-agg (user-keyed shuffle), then ALL
    remaining relations are per-distinct-duration — bounded by the
    observation window in days, not the corpus; the global-order
    windows run over that tiny relation.
    """
    e = t(spark, sf_dir, "events")
    g = e.agg(F.max("ts").alias("tmax"))
    u = e.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "te"
        ),
    )
    durs = u.crossJoin(F.broadcast(g)).select(
        F.datediff(
            F.coalesce(F.col("te"), F.col("tmax")).cast("date"),
            F.col("t0").cast("date"),
        )
        .cast("long")
        .alias("dur"),
        F.col("te").isNotNull().alias("ev"),
    )
    agg = durs.groupBy("dur").agg(
        F.count(F.when(F.col("ev"), 1)).alias("d"),
        F.count("*").alias("leaving"),
    )
    wprev = (
        Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    risk = agg.select(
        "dur",
        "d",
        (
            F.sum("leaving").over(wall)
            - F.coalesce(F.sum("leaving").over(wprev), F.lit(0))
        ).alias("n_at_risk"),
    )
    terms = risk.filter(
        (F.col("d") > 0) & (F.col("d") < F.col("n_at_risk"))
    ).select(
        "dur",
        "d",
        "n_at_risk",
        F.log(
            F.lit(1.0) - F.col("d").cast("double") / F.col("n_at_risk").cast("double")
        )
        .cast("decimal(18,12)")
        .alias("lnterm"),
    )
    return terms.select(
        F.col("dur").alias("day"),
        F.col("d").cast("long").alias("d_events"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.round(
            F.exp(F.sum("lnterm").over(Window.orderBy("dur")).cast("double")),
            6,
        ).alias("survival"),
    )


@query(
    "retention_triangle",
    oracle="""
    WITH first_m AS (
      SELECT user_id, min(date_trunc('month', CAST(ts AS DATE))) AS cohort
      FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort,
             date_diff('month', f.cohort,
                       date_trunc('month', CAST(e.ts AS DATE))) AS age
      FROM events e JOIN first_m f ON f.user_id = e.user_id
    ), size_ AS (
      SELECT cohort, count(*) AS n0 FROM first_m GROUP BY 1
    )
    SELECT CAST(a.cohort AS DATE) AS cohort_month,
           CAST(max(s.n0) AS BIGINT) AS cohort_size,
           round(count(DISTINCT a.user_id) FILTER (a.age = 0)
                 * 1.0 / max(s.n0), 4) AS m0,
           round(count(DISTINCT a.user_id) FILTER (a.age = 1)
                 * 1.0 / max(s.n0), 4) AS m1,
           round(count(DISTINCT a.user_id) FILTER (a.age = 2)
                 * 1.0 / max(s.n0), 4) AS m2,
           round(count(DISTINCT a.user_id) FILTER (a.age = 3)
                 * 1.0 / max(s.n0), 4) AS m3
    FROM activity a JOIN size_ s ON s.cohort = a.cohort
    GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "retention", "events"),
)
def retention_triangle(spark, sf_dir):
    """RETENTION TRIANGLE, pivoted: per acquisition cohort (first-
    activity month), the share of the cohort active at age 0..3
    months as columns — the BI artifact retention_cohorts' long format
    feeds; the pivot makes the diagonal readable (each cohort's curve
    on one row). Conditional distinct counts per age bucket — no
    pivot() call, so the column set is schema-stable.

    Scale: first-month anchors and the distinct (user, age) activity
    grid are entity-bounded; everything aggregates on cohort."""
    e = t(spark, sf_dir, "events")
    mon = F.date_trunc("month", F.to_date("ts")).cast("date")
    first_m = e.groupBy("user_id").agg(F.min(mon).alias("cohort"))
    activity = (
        e.join(F.broadcast(first_m), "user_id")
        .select(
            "user_id",
            "cohort",
            F.months_between(mon, F.col("cohort")).cast("int").alias("age"),
        )
        .distinct()
    )
    size = first_m.groupBy("cohort").agg(F.count("*").alias("n0"))

    def share(age):
        return F.round(
            F.countDistinct(
                F.when(F.col("age") == age, F.col("user_id"))
            )
            * 1.0
            / F.max("n0"),
            4,
        )

    return (
        activity.join(F.broadcast(size), "cohort")
        .groupBy(F.col("cohort").alias("cohort_month"))
        .agg(
            F.max("n0").cast("long").alias("cohort_size"),
            share(0).alias("m0"),
            share(1).alias("m1"),
            share(2).alias("m2"),
            share(3).alias("m3"),
        )
        .orderBy("cohort_month")
    )


@query(
    "events_decay_engagement",
    oracle="""
    WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events),
    scored AS (
      SELECT user_id,
             value * exp(-0.1 * ((SELECT m FROM mx) - epoch_us(ts))
                         / 86400000000.0) AS w
      FROM events
    ), per_user AS (
      SELECT user_id, sum(w) AS score, count(*) AS n FROM scored GROUP BY 1
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           round(score, 4) AS decay_score
    FROM per_user
    ORDER BY decay_score DESC, user_id LIMIT 100
    """,
    tags=("analytics", "engagement", "events"),
)
def events_decay_engagement(spark, sf_dir):
    """EXPONENTIAL TIME-DECAY engagement score: each event contributes
    value·e^(−0.1·age_days) against the corpus watermark (half-life ≈
    7 days) — the recency-weighted activity ranking behind churn-risk
    and re-engagement lists, where a purchase yesterday outweighs ten
    from last month. Top-100 users, deterministic tie-break.

    Scale: one broadcast watermark + one per-user aggregate; exp() is
    per-row IEEE on identical doubles in both engines, summed per user
    then rounded — no cross-partition order sensitivity at 4 dp on
    bounded per-user event counts."""
    e = t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    mx = e.agg(F.max("us").alias("m"))
    w = F.col("value") * F.exp(
        -0.1 * (F.col("m") - F.col("us")) / 86400000000.0
    )
    return (
        e.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(w), 4).alias("decay_score"),
        )
        .orderBy(F.desc("decay_score"), "user_id")
        .limit(100)
    )


@query(
    "lineitem_abc_xyz",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey AS p, sum(l_extendedprice) AS rev,
             avg(l_quantity) AS mq,
             sqrt(greatest(sum(l_quantity * l_quantity) / count(*)
                  - avg(l_quantity) * avg(l_quantity), 0)) AS sq
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT p, rev, sq / mq AS cv,
             sum(rev) OVER (ORDER BY rev DESC, p
                            ROWS UNBOUNDED PRECEDING)
               / sum(rev) OVER () AS cum_share
      FROM per_part
    ), classed AS (
      SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
                  WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc,
             CASE WHEN cv <= 0.5 THEN 'X'
                  WHEN cv <= 1.0 THEN 'Y' ELSE 'Z' END AS xyz,
             rev
      FROM ranked
    )
    SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(rev), 2) AS revenue
    FROM classed GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("analytics", "inventory", "lineitem"),
)
def lineitem_abc_xyz(spark, sf_dir):
    """ABC×XYZ inventory classification matrix: parts classed by
    cumulative revenue share (A ≤80%, B ≤95%, C rest — the Pareto
    axis) and by demand variability (coefficient of variation of
    quantity: X steady ≤0.5, Y ≤1.0, Z erratic) — the 9-cell planning
    matrix ('AX: automate, CZ: make-to-order'). Population CV from
    power sums (engine-portable).

    Scale: per-part aggregate first (fact rows collapse to |parts|);
    the cumulative-share window runs over that bounded relation —
    same altitude as analytics_abc_pareto, which classifies the one
    axis this query crosses with variability."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    per_part = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.sum("l_extendedprice").alias("rev"),
        F.avg(q).alias("mq"),
        F.sqrt(
            F.greatest(
                F.sum(q * q) / F.count("*") - F.avg(q) * F.avg(q),
                F.lit(0.0),
            )
        ).alias("sq"),
    )
    wcum = Window.orderBy(F.desc("rev"), "p").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = per_part.select(
        "p",
        "rev",
        (F.col("sq") / F.col("mq")).alias("cv"),
        (
            F.sum("rev").over(wcum)
            / F.sum("rev").over(Window.partitionBy())
        ).alias("cum_share"),
    )
    abc = (
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    xyz = (
        F.when(F.col("cv") <= 0.5, "X")
        .when(F.col("cv") <= 1.0, "Y")
        .otherwise("Z")
    )
    return (
        ranked.groupBy(abc.alias("abc"), xyz.alias("xyz"))
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
        .orderBy("abc", "xyz")
    )


@query(
    "events_user_entropy",
    oracle="""
    WITH cnt AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT user_id, sum(c) AS n FROM cnt GROUP BY 1
    ), ent AS (
      SELECT cnt.user_id,
             max(tot.n) AS n_events,
             -sum((c * 1.0 / tot.n) * ln(c * 1.0 / tot.n)) AS h
      FROM cnt JOIN tot ON tot.user_id = cnt.user_id
      GROUP BY 1
    )
    SELECT CASE WHEN h < 0.5 THEN 'a_low'
                WHEN h < 1.0 THEN 'b_mid'
                WHEN h < 1.5 THEN 'c_high' ELSE 'd_very_high' END
             AS entropy_band,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(h), 6) AS avg_entropy,
           round(avg(n_events), 4) AS avg_events
    FROM ent GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "engagement", "events"),
)
def events_user_entropy(spark, sf_dir):
    """BEHAVIORAL DIVERSITY per user: Shannon entropy of each user's
    event-type distribution, banded into a population histogram — the
    single-metric split between one-track users (H~0: only views) and
    explorers (H near ln|types|), the feature every engagement model
    reinvents. Companion to analytics_markov_entropy (which measures
    ORDER predictability; this measures MIX diversity).

    Scale: one (user, type) aggregate, per-user entropy over its
    bounded type set, 4-row band rollup."""
    e = t(spark, sf_dir, "events")
    cnt = e.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c") * 1.0 / F.col("n")
    ent = (
        cnt.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("n").alias("n_events"),
            (-F.sum(p * F.log(p))).alias("h"),
        )
    )
    band = (
        F.when(F.col("h") < 0.5, "a_low")
        .when(F.col("h") < 1.0, "b_mid")
        .when(F.col("h") < 1.5, "c_high")
        .otherwise("d_very_high")
    )
    return (
        ent.groupBy(band.alias("entropy_band"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.round(F.avg("h"), 6).alias("avg_entropy"),
            F.round(F.avg("n_events"), 4).alias("avg_events"),
        )
        .orderBy("entropy_band")
    )


@query(
    "orders_sla_ship_lag",
    oracle="""
    WITH first_ship AS (
      SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS ship_d
      FROM lineitem GROUP BY 1
    )
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(date_diff('day', CAST(o.o_orderdate AS DATE),
                               f.ship_d)), 4) AS avg_lag_days,
           round(count(*) FILTER (
             date_diff('day', CAST(o.o_orderdate AS DATE), f.ship_d) <= 30)
             * 1.0 / count(*), 6) AS pct_within_30d,
           CAST(max(date_diff('day', CAST(o.o_orderdate AS DATE),
                              f.ship_d)) AS BIGINT) AS worst_lag_days
    FROM orders o JOIN first_ship f ON f.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "sla", "orders", "lineitem"),
)
def orders_sla_ship_lag(spark, sf_dir):
    """ORDER-TO-FIRST-SHIP SLA by priority: lag from order date to the
    earliest line shipment, with the 30-day attainment rate and the
    worst case — the operational query that shows whether '1-URGENT'
    actually ships faster than '5-LOW' (the priority system's
    integrity check).

    Scale: lineitem reduces to a per-order min BEFORE the join (the
    pre-aggregate-then-join shape — never join raw lines to orders
    for a per-order metric); then one equi-join on the order key and
    a |priorities|-row rollup."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("ship_d")
    )
    j = o.join(first_ship, o.o_orderkey == first_ship.l_orderkey)
    lag = F.datediff(F.col("ship_d"), F.to_date("o_orderdate"))
    return (
        j.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.avg(lag), 4).alias("avg_lag_days"),
            F.round(
                F.count(F.when(lag <= 30, 1)) * 1.0 / F.count("*"), 6
            ).alias("pct_within_30d"),
            F.max(lag).cast("long").alias("worst_lag_days"),
        )
        .orderBy("priority")
    )


@query(
    "dq_calendar_gaps",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
    ), span AS (
      SELECT min(d) AS lo, max(d) AS hi FROM days
    ), spine AS (
      SELECT unnest(generate_series((SELECT lo FROM span),
                                    (SELECT hi FROM span),
                                    INTERVAL 1 DAY))::DATE AS d
    ), missing AS (
      SELECT s.d FROM spine s LEFT JOIN days ON days.d = s.d
      WHERE days.d IS NULL
    ), runs AS (
      SELECT d, d - CAST(row_number() OVER (ORDER BY d) AS INT) AS isl
      FROM missing
    )
    SELECT CAST((SELECT count(*) FROM spine) AS BIGINT) AS span_days,
           CAST((SELECT count(*) FROM days) AS BIGINT) AS present_days,
           CAST((SELECT count(*) FROM missing) AS BIGINT) AS missing_days,
           CAST(coalesce(max(run_len), 0) AS BIGINT) AS longest_gap
    FROM (SELECT isl, count(*) AS run_len FROM runs GROUP BY 1)
    """,
    tags=("dq", "temporal", "orders"),
)
def dq_calendar_gaps(spark, sf_dir):
    """CALENDAR COMPLETENESS audit: generate the full day spine over
    the observed span, anti-join the days that actually have orders,
    and report missing-day count plus the LONGEST consecutive gap
    (gaps-and-islands over the missing set) — the silent-pipeline-
    outage detector (one missing Tuesday is noise; nine consecutive
    missing days is an incident).

    Scale: the spine is calendar-bounded (sequence + explode — never
    a row per fact); present-days is one distinct; islands algebra on
    the missing relation."""
    o = t(spark, sf_dir, "orders")
    days = o.select(F.to_date("o_orderdate").alias("d")).distinct()
    span = days.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = span.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    missing = spine.join(days, "d", "left_anti")
    isl = (
        F.datediff(F.col("d"), F.lit("1970-01-01"))
        - F.row_number().over(Window.orderBy("d"))
    ).alias("isl")
    runs = missing.select("d", isl)
    run_lens = runs.groupBy("isl").agg(F.count("*").alias("run_len"))
    span_days = spine.count()
    present_days = days.count()
    missing_days = span_days - present_days
    return run_lens.agg(
        F.lit(span_days).cast("long").alias("span_days"),
        F.lit(present_days).cast("long").alias("present_days"),
        F.lit(missing_days).cast("long").alias("missing_days"),
        F.coalesce(F.max("run_len"), F.lit(0))
        .cast("long")
        .alias("longest_gap"),
    )


@query(
    "part_brand_share_shift",
    oracle="""
    WITH mid AS (
      SELECT quantile_cont(epoch_us(l_shipdate), 0.5) AS m FROM lineitem
    ), rev AS (
      SELECT p.p_brand AS brand,
             CASE WHEN epoch_us(l.l_shipdate) <= (SELECT m FROM mid)
                  THEN 'h1' ELSE 'h2' END AS half,
             sum(l.l_extendedprice) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT half, sum(rev) AS tr FROM rev GROUP BY 1
    ), shares AS (
      SELECT r.brand,
             sum(CASE WHEN r.half = 'h1' THEN r.rev / t.tr END) AS s1,
             sum(CASE WHEN r.half = 'h2' THEN r.rev / t.tr END) AS s2
      FROM rev r JOIN tot t ON t.half = r.half
      GROUP BY 1
    )
    SELECT brand,
           round(coalesce(s1, 0), 6) AS share_h1,
           round(coalesce(s2, 0), 6) AS share_h2,
           round(coalesce(s2, 0) - coalesce(s1, 0), 6) AS share_shift
    FROM shares
    ORDER BY abs(round(coalesce(s2, 0) - coalesce(s1, 0), 6)) DESC, brand
    LIMIT 15
    """,
    tags=("analytics", "market-share", "lineitem"),
)
def part_brand_share_shift(spark, sf_dir):
    """BRAND MARKET-SHARE SHIFT: revenue share per brand in the first
    vs second half of shipping history (median split), top-15 movers
    by absolute shift — the competitive-dynamics report ('who is
    winning share, not just growing with the market' — a brand can
    grow revenue while losing share in a faster-growing market).

    Scale: broadcast part dim; (brand x 2)-bounded aggregate; share
    algebra and the top-15 on that tiny relation."""
    li = t(spark, sf_dir, "lineitem").withColumn(
        "us", F.unix_micros(F.col("l_shipdate").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    mid = li.agg(F.expr("percentile(us, 0.5)").alias("m"))
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .crossJoin(F.broadcast(mid))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.when(F.col("us") <= F.col("m"), "h1")
            .otherwise("h2")
            .alias("half"),
        )
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    tot = rev.groupBy("half").agg(F.sum("rev").alias("tr"))
    shares = (
        rev.join(F.broadcast(tot), "half")
        .groupBy("brand")
        .agg(
            F.sum(
                F.when(F.col("half") == "h1", F.col("rev") / F.col("tr"))
            ).alias("s1"),
            F.sum(
                F.when(F.col("half") == "h2", F.col("rev") / F.col("tr"))
            ).alias("s2"),
        )
    )
    s1 = F.coalesce(F.col("s1"), F.lit(0.0))
    s2 = F.coalesce(F.col("s2"), F.lit(0.0))
    return (
        shares.select(
            "brand",
            F.round(s1, 6).alias("share_h1"),
            F.round(s2, 6).alias("share_h2"),
            F.round(s2 - s1, 6).alias("share_shift"),
        )
        .orderBy(F.abs(F.col("share_shift")).desc(), "brand")
        .limit(15)
    )


@query(
    "orders_reorder_interval",
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             date_diff('day',
               lag(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS gap
      FROM orders
    ), per_cust AS (
      SELECT o_custkey, count(*) AS n_gaps,
             quantile_cont(gap, 0.5) AS med_gap
      FROM seq WHERE gap IS NOT NULL GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           round(quantile_cont(med_gap, 0.25), 4) AS p25_median_gap,
           round(quantile_cont(med_gap, 0.5), 4) AS p50_median_gap,
           round(quantile_cont(med_gap, 0.75), 4) AS p75_median_gap,
           round(avg(med_gap), 4) AS mean_median_gap
    FROM per_cust WHERE n_gaps >= 3
    """,
    tags=("analytics", "cadence", "orders"),
)
def orders_reorder_interval(spark, sf_dir):
    """REORDER CADENCE: per-customer median days between consecutive
    orders (lag gaps), summarized as quartiles over customers with at
    least 3 gaps — the replenishment-cycle metric behind 'when is this
    customer overdue' alerts (a customer at 2x their own median gap is
    the churn trigger, not a global threshold).

    Scale: the lag window partitions per customer; per-customer
    medians are over each customer's own bounded order history (the
    ``percentile`` aggregate is the right tool THERE — unbounded
    groups, bounded values per group). The corpus rollup sees one row
    per customer — unbounded-distinct medians — so its quartiles come
    from ``operators.exact_quantiles`` (two-pass rank), never a
    single-reducer value map."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"),
            F.lag(F.to_date("o_orderdate")).over(w),
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    per_cust = seq.groupBy("o_custkey").agg(
        F.count("*").alias("n_gaps"),
        F.expr("percentile(gap, 0.5)").alias("med_gap"),
    ).filter(F.col("n_gaps") >= 3)
    q = exact_quantiles(
        per_cust, "med_gap", {"__p25": 0.25, "__p50": 0.5, "__p75": 0.75}
    )
    return (
        per_cust.agg(
            F.count("*").cast("long").alias("n_customers"),
            F.round(F.avg("med_gap"), 4).alias("mean_median_gap"),
        )
        .crossJoin(F.broadcast(q))
        .select(
            "n_customers",
            F.round(F.col("__p25"), 4).alias("p25_median_gap"),
            F.round(F.col("__p50"), 4).alias("p50_median_gap"),
            F.round(F.col("__p75"), 4).alias("p75_median_gap"),
            "mean_median_gap",
        )
    )


@query(
    "events_hourly_circular",
    oracle="""
    WITH h AS (
      SELECT event_type, hour(ts) AS hr, count(*) AS n
      FROM events GROUP BY 1, 2
    ), vec AS (
      SELECT event_type,
             sum(n) AS total,
             sum(n * cos(2 * pi() * hr / 24)) AS cx,
             sum(n * sin(2 * pi() * hr / 24)) AS cy,
             max_by(hr, n * 100 + (24 - hr)) AS peak_hour
      FROM h GROUP BY 1
    )
    SELECT event_type, CAST(total AS BIGINT) AS n_events,
           CAST(peak_hour AS BIGINT) AS peak_hour,
           round((atan2(cy, cx) * 24 / (2 * pi()) + 24) % 24, 4)
             AS circular_mean_hour,
           round(sqrt(cx * cx + cy * cy) / total, 6) AS concentration
    FROM vec ORDER BY event_type
    """,
    tags=("analytics", "circular-stats", "events"),
)
def events_hourly_circular(spark, sf_dir):
    """CIRCULAR hour-of-day statistics per event type: the circular
    MEAN hour (atan2 of the summed unit vectors — a linear average
    would put midnight-centered activity at noon) and the resultant
    length R in [0,1] (1 = all events at one hour, 0 = uniform over
    the day), plus the modal peak hour — the time-of-day profile
    behind send-time optimization and anomaly windows, done with the
    correct (circular) algebra.

    Ties on peak hour break deterministically (max_by key
    n*100 + (24 - hr): higher count, then EARLIER hour — identical
    integer algebra on both engines).

    Scale: one (type x 24)-bounded aggregate; all trigonometry on
    that tiny relation."""
    e = t(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.hour("ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    two_pi = 2 * 3.141592653589793
    vec = h.groupBy("event_type").agg(
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.cos(F.lit(two_pi) * F.col("hr") / 24)).alias(
            "cx"
        ),
        F.sum(F.col("n") * F.sin(F.lit(two_pi) * F.col("hr") / 24)).alias(
            "cy"
        ),
        F.expr("max_by(hr, n * 100 + (24 - hr))").alias("peak_hour"),
    )
    mean_hr = (
        F.atan2(F.col("cy"), F.col("cx")) * 24 / F.lit(two_pi) + 24
    ) % 24
    return vec.select(
        "event_type",
        F.col("total").cast("long").alias("n_events"),
        F.col("peak_hour").cast("long").alias("peak_hour"),
        F.round(mean_hr, 4).alias("circular_mean_hour"),
        F.round(
            F.sqrt(F.col("cx") ** 2 + F.col("cy") ** 2) / F.col("total"), 6
        ).alias("concentration"),
    ).orderBy("event_type")


@query(
    "supplier_balance_outliers",
    oracle="""
    WITH s AS (
      SELECT s_nationkey AS nation, count(*) AS n, avg(s_acctbal) AS mu,
             sum(s_acctbal * s_acctbal) AS ss
      FROM supplier GROUP BY 1
    ), z AS (
      SELECT sp.s_suppkey, sp.s_nationkey AS nation, sp.s_acctbal,
             (sp.s_acctbal - s.mu)
               / sqrt(greatest(s.ss / s.n - s.mu * s.mu, 1e-12)) AS z
      FROM supplier sp JOIN s ON s.nation = sp.s_nationkey
      WHERE s.n >= 5
    )
    SELECT s_suppkey, CAST(nation AS BIGINT) AS nation,
           round(s_acctbal, 2) AS acctbal, round(z, 4) AS z
    FROM z WHERE abs(z) >= 2
    ORDER BY abs(round(z, 4)) DESC, s_suppkey LIMIT 20
    """,
    tags=("analytics", "outliers", "supplier"),
)
def supplier_balance_outliers(spark, sf_dir):
    """PEER-GROUP z-score outliers: suppliers whose balance deviates
    >= 2 sigma from their OWN nation's distribution (population sigma
    from power sums; nations with < 5 suppliers excluded — no stable
    baseline). The peer-relative framing is the point: a balance
    that's ordinary globally can be wildly anomalous for its market.

    Scale: per-nation moments in one pass, broadcast back; top-20 is
    TakeOrderedAndProject on the rounded key (order aligned
    cross-engine)."""
    sp = t(spark, sf_dir, "supplier")
    s = sp.groupBy(F.col("s_nationkey").alias("nation")).agg(
        F.count("*").alias("n"),
        F.avg("s_acctbal").alias("mu"),
        F.sum(F.col("s_acctbal") * F.col("s_acctbal")).alias("ss"),
    ).filter(F.col("n") >= 5)
    sigma = F.sqrt(
        F.greatest(
            F.col("ss") / F.col("n") - F.col("mu") * F.col("mu"),
            F.lit(1e-12),
        )
    )
    z = (F.col("s_acctbal") - F.col("mu")) / sigma
    return (
        sp.join(F.broadcast(s), sp.s_nationkey == s.nation)
        .select(
            "s_suppkey",
            F.col("nation").cast("long").alias("nation"),
            F.round("s_acctbal", 2).alias("acctbal"),
            F.round(z, 4).alias("z"),
        )
        .filter(F.abs(F.col("z")) >= 2)
        .orderBy(F.abs(F.col("z")).desc(), "s_suppkey")
        .limit(20)
    )


@query(
    "event_transition_lift",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), trans AS (
      SELECT prev AS src, event_type AS dst, count(*) AS c
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ), row_tot AS (SELECT src, sum(c) AS cs FROM trans GROUP BY 1),
    dst_tot AS (SELECT dst, sum(c) AS cd FROM trans GROUP BY 1),
    tot AS (SELECT sum(c) AS n FROM trans)
    SELECT t.src, t.dst, CAST(t.c AS BIGINT) AS n_transitions,
           round((t.c * 1.0 / r.cs)
                 / (d.cd * 1.0 / (SELECT n FROM tot)), 4) AS lift
    FROM trans t
    JOIN row_tot r ON r.src = t.src
    JOIN dst_tot d ON d.dst = t.dst
    ORDER BY t.src, t.dst
    """,
    tags=("analytics", "markov", "events"),
)
def event_transition_lift(spark, sf_dir):
    """TRANSITION LIFT: P(next=j | current=i) / P(j) — the transition
    matrix normalized by the destination's base rate, so a cell > 1
    means the step is genuinely sequential structure rather than just
    'j is common everywhere' (the independence-baseline correction
    event_transition_matrix's raw probabilities don't make).

    Scale: user-keyed lag window, |types|^2-bounded count relation,
    broadcast marginals."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    trans = seq.groupBy(
        F.col("prev").alias("src"), F.col("event_type").alias("dst")
    ).agg(F.count("*").alias("c"))
    row_tot = trans.groupBy("src").agg(F.sum("c").alias("cs"))
    dst_tot = trans.groupBy("dst").agg(F.sum("c").alias("cd"))
    tot = trans.agg(F.sum("c").alias("n"))
    return (
        trans.join(F.broadcast(row_tot), "src")
        .join(F.broadcast(dst_tot), "dst")
        .crossJoin(F.broadcast(tot))
        .select(
            "src",
            "dst",
            F.col("c").cast("long").alias("n_transitions"),
            F.round(
                (F.col("c") * 1.0 / F.col("cs"))
                / (F.col("cd") * 1.0 / F.col("n")),
                4,
            ).alias("lift"),
        )
        .orderBy("src", "dst")
    )


@query(
    "records_broken_days",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS y
      FROM orders GROUP BY 1
    ), runmax AS (
      SELECT d, y,
             max(y) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_record
      FROM daily
    )
    SELECT d AS day, round(y, 2) AS revenue,
           round(prev_record, 2) AS prev_record,
           round(y - prev_record, 2) AS margin
    FROM runmax WHERE y > prev_record
    ORDER BY day
    """,
    tags=("analytics", "timeseries", "orders"),
)
def records_broken_days(spark, sf_dir):
    """RECORD-BREAKING DAYS: days whose revenue exceeded every prior
    day — the all-time-high tracker (its frequency decays like 1/n on
    a stationary series, so a late cluster of records IS the growth
    signal; the margin column says by how much). Exclusive running
    max via a 1-PRECEDING frame; the first day never counts (no prior
    record to beat).

    Scale: one window over the calendar-bounded daily relation."""
    daily = t(spark, sf_dir, "orders").groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(F.sum("o_totalprice").alias("y"))
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    runmax = daily.select(
        "d", "y", F.max("y").over(w).alias("prev_record")
    )
    return (
        runmax.filter(F.col("y") > F.col("prev_record"))
        .select(
            F.col("d").alias("day"),
            F.round("y", 2).alias("revenue"),
            F.round("prev_record", 2).alias("prev_record"),
            F.round(F.col("y") - F.col("prev_record"), 2).alias("margin"),
        )
        .orderBy("day")
    )


@query(
    "analytics_pareto_8020_customers",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, sum(o_totalprice) AS rev FROM orders GROUP BY 1
    ), ranked AS (
      SELECT rev,
             sum(rev) OVER (ORDER BY rev DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(rev) OVER () AS tot,
             row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk,
             count(*) OVER () AS n
      FROM per_cust
    )
    SELECT CAST(max(n) AS BIGINT) AS n_customers,
           CAST(min(CASE WHEN cum >= 0.8 * tot THEN rk END) AS BIGINT)
             AS customers_for_80pct,
           round(min(CASE WHEN cum >= 0.8 * tot THEN rk END)
                 * 1.0 / max(n), 6) AS share_of_customers,
           round(max(CASE WHEN rk <= ceil(0.2 * n) THEN cum / tot END), 6)
             AS rev_share_of_top20pct
    FROM ranked
    """,
    tags=("analytics", "pareto", "orders"),
)
def analytics_pareto_8020_customers(spark, sf_dir):
    """THE 80/20 CHECK on customers: how many customers (count and
    share) produce 80% of revenue, and what revenue share the top 20%
    of customers actually hold — the two numbers behind every 'key
    account' program, measured instead of assumed. Both picks are
    conditional aggregates over the ranked relation (cum is monotone
    in rank, so max-where-rk<=ceil(0.2n) IS the boundary value).

    Scale: cumulative windows over the per-CUSTOMER aggregate
    (entity-bounded — the same altitude as analytics_gini; the
    two-pass rank swap applies at extreme cardinality)."""
    o = t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    wseq = Window.orderBy(F.desc("rev"), "o_custkey")
    ranked = per.select(
        "rev",
        F.sum("rev")
        .over(wseq.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("rev").over(Window.partitionBy()).alias("tot"),
        F.row_number().over(wseq).alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    k80 = F.min(
        F.when(F.col("cum") >= 0.8 * F.col("tot"), F.col("rk"))
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_customers"),
        k80.cast("long").alias("customers_for_80pct"),
        F.round(k80 * 1.0 / F.max("n"), 6).alias("share_of_customers"),
        F.round(
            F.max(
                F.when(
                    F.col("rk") <= F.ceil(0.2 * F.col("n")),
                    F.col("cum") / F.col("tot"),
                )
            ),
            6,
        ).alias("rev_share_of_top20pct"),
    )


@query(
    "part_price_realization",
    oracle="""
    WITH traded AS (
      SELECT l_partkey, sum(l_extendedprice) AS ext, sum(l_quantity) AS q
      FROM lineitem GROUP BY 1
    )
    SELECT p.p_type AS part_type,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(avg(p.p_retailprice), 4) AS avg_list_price,
           round(sum(t.ext) / sum(t.q), 4) AS realized_unit_price,
           round((sum(t.ext) / sum(t.q)) / avg(p.p_retailprice), 6)
             AS realization_ratio
    FROM part p JOIN traded t ON t.l_partkey = p.p_partkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "pricing", "part", "lineitem"),
)
def part_price_realization(spark, sf_dir):
    """PRICE REALIZATION by part type: list (retail) price vs the
    street price actually realized in trades (quantity-weighted
    extended price) — the pricing-power report; a realization ratio
    drifting below 1 is margin leaking through discounts faster than
    the list book admits.

    Scale: lineitem pre-aggregates to per-part sums BEFORE joining the
    part dim (never join raw lines for a per-part metric); the type
    rollup runs on the |parts|-bounded join."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select(
        "p_partkey", "p_type", "p_retailprice"
    )
    traded = li.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("ext"),
        F.sum("l_quantity").alias("q"),
    )
    j = p.join(traded, p.p_partkey == traded.l_partkey)
    realized = F.sum("ext") / F.sum("q")
    return (
        j.groupBy(F.col("p_type").alias("part_type"))
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_list_price"),
            F.round(realized, 4).alias("realized_unit_price"),
            F.round(realized / F.avg("p_retailprice"), 6).alias(
                "realization_ratio"
            ),
        )
        .orderBy("part_type")
    )


@query(
    "customer_value_trajectory",
    oracle="""
    WITH seq AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey,
             row_number() OVER (PARTITION BY o.o_custkey
                                ORDER BY o.o_orderdate, o.o_orderkey)
               * 1.0 AS x,
             o.o_totalprice AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), fit AS (
      SELECT seg, o_custkey, count(*) AS n,
             (count(*) * sum(x * y) - sum(x) * sum(y))
               / (count(*) * sum(x * x) - sum(x) * sum(x)) AS slope
      FROM seq GROUP BY 1, 2 HAVING count(*) >= 5
    )
    SELECT seg, CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(slope), 4) AS avg_slope,
           round(count(*) FILTER (slope > 0) * 1.0 / count(*), 6)
             AS pct_growing
    FROM fit GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "regression", "orders"),
)
def customer_value_trajectory(spark, sf_dir):
    """CUSTOMER VALUE TRAJECTORY: per-customer OLS slope of order
    value over order SEQUENCE (1st, 2nd, ... order), rolled up per
    segment as mean slope and the share of growing customers — the
    expansion-vs-contraction read ('are accounts deepening?') that
    aggregate revenue growth hides (new logos can mask shrinking
    cohorts). Customers with < 5 orders excluded (no stable fit).

    Scale: the sequence index is a per-customer window (parallel by
    key); each customer's regression is closed-form power sums inside
    ONE hash aggregate — a million tiny regressions without a single
    ML-library call."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        "o_custkey",
        (F.row_number().over(w) * 1.0).alias("x"),
        F.col("o_totalprice").alias("y"),
    )
    n = F.count("*")
    slope = (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")) / (
        n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")
    )
    fit = (
        seq.groupBy("seg", "o_custkey")
        .agg(n.alias("n"), slope.alias("slope"))
        .filter(F.col("n") >= 5)
    )
    return (
        fit.groupBy("seg")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.round(F.avg("slope"), 4).alias("avg_slope"),
            F.round(
                F.count(F.when(F.col("slope") > 0, 1)) * 1.0 / F.count("*"),
                6,
            ).alias("pct_growing"),
        )
        .orderBy("seg")
    )


@query(
    "lineitem_return_drivers",
    oracle="""
    SELECT CASE WHEN l_discount < 0.03 THEN 'a_low'
                WHEN l_discount < 0.07 THEN 'b_mid' ELSE 'c_high' END
             AS discount_band,
           CASE WHEN l_quantity < 17 THEN 'a_small'
                WHEN l_quantity < 34 THEN 'b_medium' ELSE 'c_large' END
             AS qty_band,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(count(*) FILTER (l_returnflag = 'R') * 1.0 / count(*), 6)
             AS return_rate,
           round(sum(CASE WHEN l_returnflag = 'R'
                     THEN l_extendedprice END), 2) AS returned_value
    FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("analytics", "returns", "lineitem"),
)
def lineitem_return_drivers(spark, sf_dir):
    """RETURN-RATE DRIVER table: return incidence by discount band x
    quantity band — the 2-factor screen that separates 'deep discounts
    attract returns' from 'bulk orders return more' before anyone
    fits a model. 9 cells with rates and returned value.

    Scale: pure per-row banding expressions, one 9-group aggregate."""
    li = t(spark, sf_dir, "lineitem")
    disc = (
        F.when(F.col("l_discount") < 0.03, "a_low")
        .when(F.col("l_discount") < 0.07, "b_mid")
        .otherwise("c_high")
    )
    qty = (
        F.when(F.col("l_quantity") < 17, "a_small")
        .when(F.col("l_quantity") < 34, "b_medium")
        .otherwise("c_large")
    )
    ret = F.col("l_returnflag") == "R"
    return (
        li.groupBy(disc.alias("discount_band"), qty.alias("qty_band"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.round(
                F.count(F.when(ret, 1)) * 1.0 / F.count("*"), 6
            ).alias("return_rate"),
            F.round(
                F.sum(F.when(ret, F.col("l_extendedprice"))), 2
            ).alias("returned_value"),
        )
        .orderBy("discount_band", "qty_band")
    )


@query(
    "events_weekday_hour_heatmap",
    oracle="""
    SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hr,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("analytics", "heatmap", "events"),
)
def events_weekday_hour_heatmap(spark, sf_dir):
    """WEEKDAY x HOUR activity heatmap feed: event count and value in
    each of the 168 weekly cells — the load-shape artifact behind
    capacity planning, send windows, and on-call staffing (and the
    denominator surface for any 'activity at 3am Tuesday is weird'
    rule). DuckDB's 0-based dayofweek is shifted to Spark's 1-based
    convention in the oracle.

    Scale: one 168-group map-side-combining aggregate."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.dayofweek(F.to_date("ts")).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hr"),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("dow", "hr")
    )


@query(
    "orders_priority_mix_by_year",
    oracle="""
    WITH y AS (
      SELECT year(CAST(o_orderdate AS DATE)) AS yr, o_orderpriority AS pri,
             count(*) AS n
      FROM orders GROUP BY 1, 2
    ), tot AS (SELECT yr, sum(n) AS tn FROM y GROUP BY 1)
    SELECT y.yr AS year, y.pri AS priority,
           CAST(y.n AS BIGINT) AS n_orders,
           round(y.n * 1.0 / t.tn, 6) AS share
    FROM y JOIN tot t ON t.yr = y.yr
    ORDER BY 1, 2
    """,
    tags=("analytics", "mix-drift", "orders"),
)
def orders_priority_mix_by_year(spark, sf_dir):
    """PRIORITY MIX drift: the share of each order priority per year —
    the categorical composition monitor (a creeping '1-URGENT' share
    is either a customer-behavior shift or a form-default change, and
    either way every SLA downstream moves). The categorical sibling of
    dq_value_drift_psi's numeric drift.

    Scale: one (year x priority)-bounded aggregate + share join."""
    o = t(spark, sf_dir, "orders")
    y = o.groupBy(
        F.year(F.to_date("o_orderdate")).cast("long").alias("year"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").alias("n"))
    tot = y.groupBy("year").agg(F.sum("n").alias("tn"))
    return (
        y.join(F.broadcast(tot), "year")
        .select(
            "year",
            "priority",
            F.col("n").cast("long").alias("n_orders"),
            F.round(F.col("n") * 1.0 / F.col("tn"), 6).alias("share"),
        )
        .orderBy("year", "priority")
    )


@query(
    "customers_overdue_alert",
    oracle="""
    WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS today FROM orders),
    seq AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             date_diff('day',
               lag(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS gap
      FROM orders
    ), per_cust AS (
      SELECT o_custkey, max(d) AS last_d,
             count(gap) AS n_gaps, quantile_cont(gap, 0.5) AS med_gap
      FROM seq GROUP BY 1 HAVING count(gap) >= 5
    )
    SELECT o_custkey,
           CAST(date_diff('day', last_d, (SELECT today FROM mx)) AS BIGINT)
             AS days_since_last,
           round(med_gap, 1) AS median_gap,
           round(date_diff('day', last_d, (SELECT today FROM mx))
                 / med_gap, 4) AS overdue_factor
    FROM per_cust
    WHERE date_diff('day', last_d, (SELECT today FROM mx)) > 2 * med_gap
    ORDER BY overdue_factor DESC, o_custkey LIMIT 25
    """,
    tags=("analytics", "cadence", "alerting", "orders"),
)
def customers_overdue_alert(spark, sf_dir):
    """OVERDUE-CUSTOMER alert feed: customers silent for more than 2x
    their OWN median reorder gap (orders_reorder_interval
    operationalized) — each account judged against its personal
    baseline rather than a global threshold, ranked by how many of
    their own cycles they've missed. The churn-intervention list, as
    one query.

    Scale: the lag window and per-customer medians partition by key;
    the watermark broadcasts; top-25 is TakeOrderedAndProject."""
    o = t(spark, sf_dir, "orders")
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("today"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.datediff(
            F.to_date("o_orderdate"),
            F.lag(F.to_date("o_orderdate")).over(w),
        ).alias("gap"),
    )
    per = (
        seq.groupBy("o_custkey")
        .agg(
            F.max("d").alias("last_d"),
            F.count("gap").alias("n_gaps"),
            F.expr("percentile(gap, 0.5)").alias("med_gap"),
        )
        .filter(F.col("n_gaps") >= 5)
    )
    j = per.crossJoin(F.broadcast(mx))
    since = F.datediff(F.col("today"), F.col("last_d"))
    return (
        j.filter(since > 2 * F.col("med_gap"))
        .select(
            "o_custkey",
            since.cast("long").alias("days_since_last"),
            F.round("med_gap", 1).alias("median_gap"),
            F.round(since / F.col("med_gap"), 4).alias("overdue_factor"),
        )
        .orderBy(F.desc("overdue_factor"), "o_custkey")
        .limit(25)
    )


@query(
    "nation_trade_matrix",
    oracle="""
    WITH flows AS (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS volume,
             count(*) AS n_lines
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    SELECT supp_nation, cust_nation,
           CAST(n_lines AS BIGINT) AS n_lines,
           round(volume, 2) AS volume
    FROM flows
    ORDER BY round(volume, 2) DESC, supp_nation, cust_nation LIMIT 20
    """,
    tags=("analytics", "join", "star", "lineitem"),
)
def nation_trade_matrix(spark, sf_dir):
    """CROSS-NATION TRADE FLOW matrix: discounted revenue by
    (supplier nation → customer nation), top-20 corridors — the full
    generalization of TPC-H Q7's two-nation slice (Sankey-diagram
    feed for 'who supplies whom'). Five-table star join with both
    nation lookups broadcast.

    Scale: the fact table joins supplier/nation dims broadcast;
    orders→customer resolves the demand side on the order key; the
    (25 x 25)-bounded flow matrix aggregates map-side. Ordering on
    the ROUNDED volume keeps the top-20 cut identical cross-engine."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ns = n.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    flows = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("snk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("cnk"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("volume"),
        )
    )
    return flows.orderBy(
        F.desc("volume"), "supp_nation", "cust_nation"
    ).limit(20).select("supp_nation", "cust_nation", "n_lines", "volume")
