"""Temporal / interval analytics — SCD2 point-in-time lookup, interval
concurrency (sweep-line), gap sessionization, time-weighted averages,
and robust (MAD) outlier detection.

NS extensions (the reference's only temporal logic is Airflow schedule
metadata, SURVEY.md §1.4); these are the standard warehouse temporal
workloads a reference user would run next. Every query has a full
DuckDB oracle.

Scale notes are per-query; the sweep-line concurrency query is the
flagship here — it demonstrates the two-pass prefix-difference pattern
(per-bucket local running sum + tiny cross-bucket offset relation)
that replaces a single-partition global window at 100 TB, the same
shape as ``operators/range_frame.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.operators.quantiles import exact_quantiles
from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t

SESSION_GAP_SEC = 1800  # 30 min, strict >


def _us(col):
    """TZ-independent epoch microseconds for a TIMESTAMP_NTZ column:
    interpret the wall-clock value as UTC (matches DuckDB epoch_us on
    naive timestamps), regardless of session timezone."""
    return F.unix_micros(F.to_utc_timestamp(col, "UTC"))


@query(
    "scd2_point_in_time",
    oracle="""
    WITH dim AS (
      SELECT user_id, value AS attr, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS version_no
      FROM events WHERE event_type = 'purchase'
    ),
    hits AS (
      SELECT d.version_no, d.attr
      FROM events e
      JOIN dim d ON e.user_id = d.user_id
                AND e.ts >= d.valid_from
                AND (d.valid_to IS NULL OR e.ts < d.valid_to)
      WHERE e.event_type = 'click'
    )
    SELECT version_no, count(*) AS n_clicks,
           CAST(sum(CAST(attr AS DECIMAL(18,2))) AS DOUBLE) AS sum_attr
    FROM hits GROUP BY version_no
    """,
    tags=("temporal", "scd2", "join", "events"),
)
def scd2_point_in_time(spark, sf_dir):
    """SCD2 point-in-time lookup: purchases form per-user dimension
    versions (valid_from = ts, valid_to = next purchase ts, half-open);
    each click joins to the version valid at its event time.

    Scale: the join is EQUI on user_id with the validity range as a
    residual predicate — Catalyst plans a sort-merge join on user_id
    and per-user version counts are small, so the residual scan is
    bounded. No cross product, no global sort. Versioning itself is a
    per-user window (lag/lead), partition-parallel.
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("value").alias("attr"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.row_number().over(w).cast("long").alias("version_no"),
        )
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    hits = clicks.join(dim, "user_id").filter(
        (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
    )
    return hits.groupBy("version_no").agg(
        F.count("*").alias("n_clicks"),
        F.sum(F.col("attr").cast("decimal(18,2)")).cast("double").alias("sum_attr"),
    )


@query(
    "interval_max_concurrency",
    oracle="""
    WITH deltas AS (
      SELECT o_orderdate AS ts, 1 AS delta FROM orders
      UNION ALL
      SELECT o_orderdate + INTERVAL 30 DAY, -1 FROM orders
    ),
    running AS (
      SELECT strftime(ts, '%Y-%m') AS month,
             sum(delta) OVER (ORDER BY ts, delta
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS open_now
      FROM deltas
    )
    SELECT month, CAST(max(open_now) AS BIGINT) AS peak_open
    FROM running GROUP BY month
    """,
    tags=("temporal", "sweepline", "window", "orders"),
)
def interval_max_concurrency(spark, sf_dir):
    """Peak concurrent open orders per month (order open for 30 days):
    classic interval sweep-line as +1/-1 deltas with a running sum.

    Scale: the naive shape is a GLOBAL ordered window — one partition,
    one task, dead at 100 TB. This implementation is the two-pass
    prefix-difference form: (1) in-month running sum, partitioned by
    month (parallel across months); (2) cross-month offsets from a
    months×1 aggregate (tiny — bounded by the calendar, not the data)
    cumulated on a single partition of a few hundred rows. Identical
    result to the oracle's global window, proven by the hash gate.

    Tie policy: ends sort before starts at the same timestamp
    (ORDER BY ts, delta) — intervals are half-open [start, end). With
    equal (ts, delta) rows the running-sum MULTISET per month is
    order-invariant, so max() is deterministic.
    """
    o = t(spark, sf_dir, "orders")
    starts = o.select(F.col("o_orderdate").alias("ts"), F.lit(1).alias("delta"))
    ends = o.select(
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("ts"),
        F.lit(-1).alias("delta"),
    )
    deltas = starts.unionAll(ends).withColumn(
        "month", F.date_format("ts", "yyyy-MM")
    )
    in_month = Window.partitionBy("month").orderBy("ts", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = deltas.withColumn("local_run", F.sum("delta").over(in_month))
    month_tot = deltas.groupBy("month").agg(F.sum("delta").alias("month_delta"))
    prior = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = month_tot.select(
        "month",
        F.coalesce(F.sum("month_delta").over(prior), F.lit(0)).alias("offset"),
    )
    return (
        local.join(F.broadcast(offsets), "month")
        .groupBy("month")
        .agg(F.max(F.col("local_run") + F.col("offset")).alias("peak_open"))
    )


@query(
    "interval_max_concurrency_global",
    oracle="""
    WITH deltas AS (
      SELECT o_orderdate AS ts, 1 AS delta FROM orders
      UNION ALL
      SELECT o_orderdate + INTERVAL 30 DAY, -1 FROM orders
    ),
    running AS (
      SELECT strftime(ts, '%Y-%m') AS month,
             sum(delta) OVER (ORDER BY ts, delta
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS open_now
      FROM deltas
    )
    SELECT month, CAST(max(open_now) AS BIGINT) AS peak_open
    FROM running GROUP BY month
    """,
    tags=("temporal", "sweepline", "window", "orders", "naive-baseline"),
)
def interval_max_concurrency_global(spark, sf_dir):
    """Naive sweep-line baseline: the textbook single global ordered
    window (one partition, one task). Registered deliberately as the
    foil for ``interval_max_concurrency`` — identical oracle, and the
    scale bench (``tools/bench_scale.py``) records this variant's
    scaling exponent against the two-pass prefix-difference form the
    way ``window_range_frame``/``_bucketed`` are paired."""
    o = t(spark, sf_dir, "orders")
    starts = o.select(F.col("o_orderdate").alias("ts"), F.lit(1).alias("delta"))
    ends = o.select(
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("ts"),
        F.lit(-1).alias("delta"),
    )
    deltas = starts.unionAll(ends)
    glob = Window.orderBy("ts", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        deltas.select(
            F.date_format("ts", "yyyy-MM").alias("month"),
            F.sum("delta").over(glob).alias("open_now"),
        )
        .groupBy("month")
        .agg(F.max("open_now").alias("peak_open"))
    )


@query(
    "sessionize_gap30",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts)
                    - lag(epoch_us(ts)) OVER w > {SESSION_GAP_SEC} * 1000000
                  OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS session_no
      FROM flagged
    ),
    per_sess AS (
      SELECT user_id, session_no, count(*) AS n_events,
             (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000
               AS duration_sec
      FROM sess GROUP BY 1, 2
    )
    SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           max(n_events) AS max_session_events,
           CAST(sum(duration_sec) AS BIGINT) AS active_sec
    FROM per_sess GROUP BY user_id
    """,
    tags=("temporal", "sessionize", "window", "events"),
)
def sessionize_gap30(spark, sf_dir):
    """Batch sessionization: a session breaks when the gap to the
    previous event of the same user exceeds 30 minutes (strict).
    Output: per-user session count / event totals / longest session /
    total active seconds.

    Scale: everything is partitioned by user_id — two window passes
    and two hash aggs over the same partitioning; AQE coalesces the
    single shuffle. Timestamps compared in TZ-free epoch micros
    (``unix_micros`` / ``epoch_us``) so session-TZ never shifts a
    boundary. (Streaming dual: ``stream_session`` via
    ``session_window``.)
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = _us(F.col("ts"))
    gap_us = us - F.lag(us).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        F.when(
            gap_us.isNull() | (gap_us > SESSION_GAP_SEC * 1_000_000), 1
        ).otherwise(0).alias("new_sess"),
    )
    run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = flagged.withColumn("session_no", F.sum("new_sess").over(run))
    per_sess = sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        (
            (F.max(_us(F.col("ts"))) - F.min(_us(F.col("ts"))))
            / F.lit(1_000_000)
        ).cast("long").alias("duration_sec"),
    )
    return per_sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
        F.sum("duration_sec").alias("active_sec"),
    )


@query(
    "time_weighted_avg",
    oracle="""
    WITH spans AS (
      SELECT user_id, value,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
               - epoch_us(ts) AS dt_us
      FROM events
    )
    SELECT user_id,
           round(CAST(sum(CAST(value AS DECIMAL(18,2)) * dt_us)
                        AS DOUBLE)
                 / CAST(sum(dt_us) AS DOUBLE), 6) AS twa_value
    FROM spans WHERE dt_us IS NOT NULL AND dt_us > 0
    GROUP BY user_id
    """,
    tags=("temporal", "window", "events", "exact-decimal"),
)
def time_weighted_avg(spark, sf_dir):
    """Per-user time-weighted average of ``value`` under sample-and-
    hold semantics (a reading holds until the next event): Σ value·Δt
    / Σ Δt over consecutive-event spans.

    Cross-engine FP determinism: value is a 2-dp quantity — the
    numerator is summed as DECIMAL (value·Δt_us is exact at scale 2),
    the denominator as BIGINT, and only the final division runs in
    double (see ``_exact.py`` policy). Scale: one per-user window +
    one hash agg on the same key — a single shuffle.
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = _us(F.col("ts"))
    spans = e.select(
        "user_id",
        "value",
        (F.lead(us).over(w) - us).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
    num = F.sum(F.col("value").cast("decimal(18,2)") * F.col("dt_us")).cast(
        "double"
    )
    den = F.sum("dt_us").cast("double")
    return spans.groupBy("user_id").agg(
        F.round(num / den, 6).alias("twa_value")
    )


@query(
    "anomaly_mad_robust",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ),
    mad AS (
      SELECT e.event_type, median(abs(e.value - m.med)) AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT e.event_type,
           count(*) AS n,
           round(any_value(m.med), 6) AS med,
           round(any_value(d.mad), 6) AS mad,
           count(*) FILTER (
             WHERE 0.6745 * abs(e.value - m.med) / d.mad > 3.5
           ) AS n_outliers
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    GROUP BY e.event_type
    """,
    tags=("temporal", "robust-stats", "agg", "events"),
)
def anomaly_mad_robust(spark, sf_dir):
    """Robust outlier detection with the modified z-score
    (Iglewicz–Hoaglin): per event_type median, MAD, and the count of
    points with 0.6745·|x−med|/MAD > 3.5. Unlike ``anomaly_zscore``
    (mean/stddev), median/MAD survive the outliers they detect.

    Determinism: both engines compute the interpolated median of the
    same 2-dp doubles — (a+b)/2 of representable values is one IEEE
    op, identical everywhere; downstream |x−med| and the threshold
    compare reuse those exact operands.

    Scale: both exact medians come from ``operators.exact_quantiles``
    (two-pass range-partitioned rank) — the values are
    unbounded-distinct doubles per type, exactly the regime where the
    ``median``/``percentile`` aggregate's single-reducer value map
    fails; the tiny per-type stats broadcast back and events shuffles
    only on the range exchange.

    FUSION (r7, verdict ask #8): the median pass checkpoints its
    projected (event_type, value) relation (``return_values=True``),
    and BOTH the MAD pass and the final outlier aggregate read those
    checkpointed rows — the plan scans events ONCE where the r6 shape
    paid three source scans (events.value is non-null by the testdata
    schema, so the NULL-filtered relation is row-identical).
    """
    e = t(spark, sf_dir, "events").select("event_type", "value")
    med, vals = exact_quantiles(
        e, "value", {"med": 0.5}, group_cols=["event_type"],
        return_values=True,
    )
    base = vals.select("event_type", F.col("__v").alias("value"))
    with_med = base.join(F.broadcast(med), "event_type")
    mad = exact_quantiles(
        with_med.select(
            "event_type", F.abs(F.col("value") - F.col("med")).alias("dev")
        ),
        "dev",
        {"mad": 0.5},
        group_cols=["event_type"],
    )
    scored = with_med.join(F.broadcast(mad), "event_type")
    is_out = (
        F.lit(0.6745) * F.abs(F.col("value") - F.col("med")) / F.col("mad")
        > 3.5
    )
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.any_value("med"), 6).alias("med"),
        F.round(F.any_value("mad"), 6).alias("mad"),
        F.count(F.when(is_out, 1)).alias("n_outliers"),
    )


@query(
    "analytics_top_paths",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts)
                    - lag(epoch_us(ts)) OVER w > {SESSION_GAP_SEC} * 1000000
                  OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS sid
      FROM flagged
    ), rn AS (
      SELECT user_id, sid, event_type,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS r
      FROM sess
    ), paths AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY r) AS path
      FROM rn WHERE r <= 5 GROUP BY 1, 2
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
    tags=("analytics", "session", "events"),
)
def analytics_top_paths(spark, sf_dir):
    """User-journey path mining: the top-20 most common session
    OPENINGS (first 5 event types, in order, '>'-joined) across
    30-min-gap sessions — the "what do users actually do" query
    behind navigation-flow sankeys and journey dashboards.

    Composition: gap-sessionization (same algebra as
    ``sessionize_gap30``: epoch-micros lag flag → running-sum session
    ids) → per-session ordered prefix (row_number ≤ 5) → ordered
    string fold → path frequency. The fold is order-pinned on both
    engines (Spark: array_sort of (r, type) structs then join;
    DuckDB: string_agg ORDER BY r), so paths are deterministic.

    Scale: ONE user-keyed shuffle serves the lag flag, session ids
    and the per-session prefix windows (co-partitioned cascade);
    per-path counts map-side combine; TakeOrdered top-20. Session
    state never materializes beyond 5-element prefixes.
    """
    e = t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = _us(F.col("ts")) - F.lag(_us(F.col("ts"))).over(wu)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            gap_us.isNull() | (gap_us > SESSION_GAP_SEC * 1_000_000), 1
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.withColumn("sid", F.sum("new_sess").over(wu))
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    rn = sess.select(
        "user_id",
        "sid",
        "event_type",
        F.row_number().over(ws).alias("r"),
    ).filter(F.col("r") <= 5)
    paths = rn.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("r").alias("r"), F.col("event_type").alias("et"))
                    )
                ),
                lambda s: s["et"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


@query(
    "scd2_build_from_changelog",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts FROM seq
      WHERE prev IS NULL OR prev <> event_type
    ), versioned AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS version
      FROM changes
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_versions,
           CAST(max(version) AS BIGINT) AS last_version,
           CAST(count(*) FILTER (valid_to IS NULL) AS BIGINT) AS n_current,
           round(avg(epoch_us(valid_to) - epoch_us(valid_from))
                 / 3600000000.0, 4) AS avg_version_hours
    FROM versioned GROUP BY 1
    HAVING count(*) >= 5 ORDER BY user_id
    """,
    tags=("temporal", "scd2", "cdc", "events"),
)
def scd2_build_from_changelog(spark, sf_dir):
    """BUILD an SCD2 history FROM a raw change stream — the inverse of
    scd2_point_in_time (which queries an existing history): collapse
    consecutive repeats of each user's state (lag-compare), then
    derive [valid_from, valid_to) intervals with lead and version
    numbers — the standard CDC-to-dimension materialization. Emits
    per-user history stats for users with >= 5 versions (exactly one
    open current row each, by construction).

    Scale: both windows partition by user key (parallel across users,
    one shuffle); no self-join — the lead window IS the interval
    closure."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev"),
    )
    changes = seq.filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    wv = Window.partitionBy("user_id").orderBy("ts")
    versioned = changes.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wv).alias("valid_to"),
        F.row_number().over(wv).alias("version"),
    )
    span_h = (
        F.unix_micros(F.col("valid_to").cast("timestamp"))
        - F.unix_micros(F.col("valid_from").cast("timestamp"))
    ) / 3600000000.0
    return (
        versioned.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_versions"),
            F.max("version").cast("long").alias("last_version"),
            F.count(F.when(F.col("valid_to").isNull(), 1))
            .cast("long")
            .alias("n_current"),
            F.round(F.avg(span_h), 4).alias("avg_version_hours"),
        )
        .filter(F.col("n_versions") >= 5)
        .orderBy("user_id")
    )
