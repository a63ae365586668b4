"""Batch-checkable duals of the streaming operators
(SURVEY.md §2B "Streaming surface").

Each query runs the SAME function the streaming tests run over a
``readStream`` source (gcp_etl_spark.streaming.windows) — here on the
batch DataFrame, so the DuckDB oracle can check the windowing
semantics exactly. Streaming execution (watermarks, output modes,
state) is smoke-tested in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)
from gcp_etl_spark.tables import t


@query(
    "stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def stream_tumbling(spark, sf_dir):
    """Tumbling 10-minute windows per event type (epoch-aligned —
    identical to DuckDB time_bucket)."""
    return tumbling_agg(t(spark, sf_dir, "events"))


@query(
    "stream_sliding",
    oracle="""
    WITH buckets AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value
      FROM events
    )
    SELECT w_start, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(value) AS avg_value
    FROM buckets GROUP BY w_start
    """,
    tags=("streaming", "window"),
)
def stream_sliding(spark, sf_dir):
    """Sliding windows (10 min width / 5 min slide): every event lands
    in exactly two windows — the oracle materializes both buckets."""
    return sliding_agg(t(spark, sf_dir, "events"))


@query(
    "stream_session",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id, min(ts) AS s_start, count(*) AS n_events,
           max(ts) AS last_ts,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM numbered GROUP BY user_id, session_no
    """,
    tags=("streaming", "window", "session"),
)
def stream_session(spark, sf_dir):
    """Gap-based session windows (30 min) per user — Spark
    session_window vs the classic gaps-and-islands SQL."""
    return session_agg(t(spark, sf_dir, "events"))


@query(
    "stream_dedup_keys",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup_keys(spark, sf_dir):
    """Stateful-dedup dual: first event per (user, type). Batch uses
    an explicit earliest-wins rule so the result is deterministic
    (streaming arrival order == event-time order in the fixture)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@query(
    "stream_dedup_exact_ids",
    # event_id is unique in the fixture, so the arbitrary-pick hazard
    # of dedup-by-id is moot and the operator must be the identity —
    # which the oracle checks value-for-value (the interesting
    # duplicate-carrying path is stream_dedup_keys' row_number form).
    oracle="""
    SELECT user_id, event_type, event_id, ts, value, props FROM events
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup_exact_ids(spark, sf_dir):
    """dropDuplicates on event_id — the streaming watermarked-dedup
    operator run in batch mode. Value-checked: ids are unique in the
    fixture, so dedup must pass every row through untouched."""
    return stream_dedup(t(spark, sf_dir, "events"), keys=("event_id",))


@query(
    "stream_join_attribution",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           v.user_id AS v_user
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 60 MINUTE
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
    tags=("streaming", "join"),
)
def stream_join_attribution(spark, sf_dir):
    """Batch dual of the watermarked stream-stream interval join
    (streaming/windows.py::view_purchase_join — real streaming
    execution asserted in tests/test_streaming.py): view->purchase
    attribution within 60 minutes per user."""
    from gcp_etl_spark.streaming.windows import view_purchase_join

    e = t(spark, sf_dir, "events")
    return view_purchase_join(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "purchase"),
    )


@query(
    "stream_join_unattributed",
    oracle="""
    SELECT v.event_id AS view_id, v.user_id AS v_user
    FROM events v
    WHERE v.event_type = 'view'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = v.user_id
          AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 60 MINUTE
      )
    ORDER BY view_id
    """,
    tags=("streaming", "join", "outer"),
)
def stream_join_unattributed(spark, sf_dir):
    """Batch dual of the watermarked LEFT OUTER stream-stream join:
    views with NO purchase in the attribution window (the null-
    emission side — in streaming, these rows emit exactly when the
    watermark proves no future purchase can match; subset/equality vs
    batch asserted in tests/test_streaming.py). The oracle states the
    same set as NOT EXISTS."""
    from gcp_etl_spark.streaming.windows import view_purchase_join

    e = t(spark, sf_dir, "events")
    return (
        view_purchase_join(
            e.filter(F.col("event_type") == "view"),
            e.filter(F.col("event_type") == "purchase"),
            how="left_outer",
        )
        .filter(F.col("purchase_id").isNull())
        .select("view_id", "v_user")
        .orderBy("view_id")
    )


@query(
    "stream_topk_types",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start, event_type,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT w_start, event_type, n_events, sum_value, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY w_start ORDER BY n_events DESC, event_type) AS rk
      FROM b
    ) WHERE rk <= 3
    """,
    tags=("streaming", "window", "topk"),
)
def stream_topk_types(spark, sf_dir):
    """Trending-now: top-3 event types per tumbling 10-minute window —
    the streaming leaderboard shape. The windowed count is the
    stream-safe aggregation (``tumbling_agg``); the rank runs over the
    aggregated relation (per micro-batch via foreachBatch in a live
    stream — see ``rank_topk``); the DuckDB oracle is the identical
    time_bucket + QUALIFY-style rank.
    """
    from gcp_etl_spark.streaming.windows import rank_topk, tumbling_agg

    return rank_topk(tumbling_agg(t(spark, sf_dir, "events")), k=3).select(
        "w_start", "event_type", "n_events", "sum_value", "rk"
    )


@query(
    "stream_static_enrich",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', e.ts) AS w_start,
           c.c_mktsegment AS segment,
           count(*) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    tags=("streaming", "join", "window"),
)
def stream_static_enrich(spark, sf_dir):
    """Stream-static enrichment: the event stream joins the bounded
    customer dimension (broadcast, re-resolved per micro-batch — no
    join state, no dim watermark), then windowed counts/sums per
    market segment. The batch dual is the identical plan; real
    readStream equality is asserted in tests/test_streaming.py.
    """
    from gcp_etl_spark.streaming.windows import static_enriched_agg

    return static_enriched_agg(
        t(spark, sf_dir, "events"), t(spark, sf_dir, "customer")
    )


@query(
    "stream_gtest_drift",
    oracle="""
    WITH cells AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS w_start,
             event_type AS r,
             CASE WHEN value > 49.0 THEN 1 ELSE 0 END AS c,
             count(*) AS n
      FROM events GROUP BY 1, 2, 3
    ), m AS (
      SELECT w_start, r, c, n,
             sum(n) OVER (PARTITION BY w_start, r) AS rt,
             sum(n) OVER (PARTITION BY w_start, c) AS ct,
             sum(n) OVER (PARTITION BY w_start) AS nn
      FROM cells
    )
    SELECT w_start, CAST(sum(n) AS BIGINT) AS n,
           CAST((count(DISTINCT r) - 1) * (count(DISTINCT c) - 1)
                AS BIGINT) AS dof,
           round(CAST(sum(CAST(2.0 * n
                               * ln(CAST(n AS DOUBLE) * nn / (rt * ct))
                               AS DECIMAL(28,12))) AS DOUBLE), 6) AS g
    FROM m GROUP BY w_start
    """,
    tags=("streaming", "dq", "drift", "stats", "events"),
)
def stream_gtest_drift(spark, sf_dir):
    """STREAMING INDEPENDENCE-DRIFT monitor — the always-on windowed
    version of stats_g_test: per daily tumbling window, the G
    statistic of the event-type × value-threshold contingency table.
    The windowed cell count (``gtest_cells``) is the only stateful
    streaming stage (counts merge — batching-invariant by
    construction); marginals + the decimal-cast log-likelihood fold
    run per micro-batch via foreachBatch (``gtest_drift``, the
    psi_drift pattern). Streaming-vs-batch equality is asserted in
    tests/test_streaming.py; here the batch dual is value-checked
    against DuckDB.

    Scale: state = (windows in watermark) × |types| × 2 cells; the
    read-time fold runs on that bounded relation."""
    from gcp_etl_spark.streaming.windows import gtest_cells, gtest_drift

    return gtest_drift(gtest_cells(t(spark, sf_dir, "events")))
