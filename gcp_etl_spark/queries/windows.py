"""Window functions (SURVEY.md §2B "Window functions").

Determinism contract: row_number/ntile/lag/lead windows use a TOTAL
order (unique tiebreaker appended); rank/dense_rank windows may order
by tie-prone expressions (their outputs are tie-stable).
Scale: a window shuffles once on its partition keys; frames evaluate
within-partition. Skewed partition keys (a single hot user) are the
one hazard — mitigated by AQE and, for associative frame aggs, by a
two-level pre-aggregation pattern documented in the module tests.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t

R = lambda c, n=4: F.round(c, n)  # noqa: E731


@query(
    "window_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(row_number() OVER w_total AS INT) AS rn,
           CAST(ntile(4)     OVER w_total AS INT) AS quartile,
           CAST(rank()       OVER w_tier  AS INT) AS price_rank,
           CAST(dense_rank() OVER w_tier  AS INT) AS price_dense_rank
    FROM orders
    WINDOW
      w_total AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
      w_tier  AS (PARTITION BY o_custkey ORDER BY floor(o_totalprice / 50000) DESC)
    """,
    tags=("window", "rank"),
)
def window_rank(spark, sf_dir):
    """Ranking functions: row_number/ntile on a total order;
    rank/dense_rank on a coarse (tie-rich) order."""
    o = t(spark, sf_dir, "orders")
    w_total = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_tier = Window.partitionBy("o_custkey").orderBy(
        F.floor(F.col("o_totalprice") / 50000).desc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w_total).alias("rn"),
        F.ntile(4).over(w_total).alias("quartile"),
        F.rank().over(w_tier).alias("price_rank"),
        F.dense_rank().over(w_tier).alias("price_dense_rank"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER w AS first_value_seen,
           value - coalesce(lag(value) OVER w, value) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "analytic"),
)
def window_lag_lead(spark, sf_dir):
    """lag/lead/first_value per user ordered by event time."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value_seen"),
        (F.col("value") - F.coalesce(F.lag("value").over(w), F.col("value"))).alias(
            "delta"
        ),
    )


@query(
    "window_running",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS running_spend,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 / count(*) OVER w AS running_avg,
           CAST(count(*) OVER w AS BIGINT) AS n_so_far
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame"),
)
def window_running(spark, sf_dir):
    """Cumulative (rows-frame) aggregates per customer (exact-decimal
    running sum — see _exact.py)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dspend = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        dspend.alias("running_spend"),
        (dspend / F.count("*").over(w)).alias("running_avg"),
        F.count("*").over(w).alias("n_so_far"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(count(*) OVER w AS BIGINT)    AS n_within_5k,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS sum_within_5k
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame", "range"),
)
def window_range_frame(spark, sf_dir):
    """RANGE frame on a numeric order key (value-based neighborhood —
    deterministic even with ties).

    DELIBERATE SKEW STRESSOR: PARTITION BY o_orderstatus has 3
    distinct values, so this shape caps window parallelism at 3
    tasks — kept as-is to exercise that regime. The 100 TB path is
    `window_range_frame_bucketed` below (identical semantics,
    parallelism = 3 x #value-buckets via operators/range_frame.py)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-5000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count("*").over(w).alias("n_within_5k"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
        .alias("sum_within_5k"),
    )


@query(
    "window_range_frame_bucketed",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(count(*) OVER w AS BIGINT)    AS n_within_5k,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS sum_within_5k
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame", "range", "scale"),
)
def window_range_frame_bucketed(spark, sf_dir):
    """Same RANGE-frame semantics as `window_range_frame` (identical
    oracle), evaluated through the prefix-difference operator: frame
    sums/counts become cum(<=v) - cum(<v-w) out of one two-level
    parallel prefix scan (cumulative per (status, value-bucket) +
    broadcast bucket offsets). O(n log n) vs Spark's native
    O(rows x frame-rows) sliding-frame re-aggregation, parallelism
    3 x #buckets — the plan that survives 100 TB. The replication
    variant (`bucketed_range_frame`) remains the path for
    non-invertible frame aggs (min/max/collect)."""
    from gcp_etl_spark.operators.range_frame import prefix_range_frame

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    frames = prefix_range_frame(
        o,
        value_col="o_totalprice",
        width=5000,
        bucket_width=20000,
        part_cols=("o_orderstatus",),
        sum_cols={
            "n_within_5k": F.lit(1),
            "__sum_dec": F.col("o_totalprice").cast("decimal(18,2)"),
        },
    )
    return o.join(frames, ["o_orderstatus", "o_totalprice"]).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "n_within_5k",
        F.col("__sum_dec").cast("double").alias("sum_within_5k"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 / count(*) OVER w AS moving_avg_4,
           min(value) OVER w AS moving_min_4,
           max(value) OVER w AS moving_max_4
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame"),
)
def window_moving_avg(spark, sf_dir):
    """Moving 4-row stats per user (time-series smoothing shape)."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("moving_avg_4"),
        F.min("value").over(w).alias("moving_min_4"),
        F.max("value").over(w).alias("moving_max_4"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY floor(o_totalprice / 10000))
    """,
    tags=("window", "distribution"),
)
def window_distribution(spark, sf_dir):
    """Distribution functions percent_rank/cume_dist — tie-stable
    (value-based), ordered on a coarse tier so ties are exercised.
    Outputs are exact rationals (rank/count) computed identically by
    both engines — raw doubles, no rounding."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.floor(F.col("o_totalprice") / 10000)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "window_nth_offset",
    oracle="""
    SELECT o_orderkey, o_custkey,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           lag(o_totalprice, 2, -1.0)  OVER wnf AS lag2_or_default,
           lead(o_totalprice, 3)       OVER wnf AS lead3,
           last_value(o_totalprice)    OVER w_full AS final_price
    FROM orders
    WINDOW
      w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      wnf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "analytic"),
)
def window_nth_offset(spark, sf_dir):
    """nth_value, lag with offset+default, multi-step lead, and
    last_value over the full-partition frame (the one that needs an
    explicit frame to not silently mean 'current row')."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # lag/lead reject explicit frames in Spark -> unframed twin window
    wnf = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.lag("o_totalprice", 2, -1.0).over(wnf).alias("lag2_or_default"),
        F.lead("o_totalprice", 3).over(wnf).alias("lead3"),
        F.last("o_totalprice").over(w_full).alias("final_price"),
    )


@query(
    "window_frame_distinct_count",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ) AS INT) AS distinct_types_4
    FROM events
    """,
    tags=("window", "frame", "distinct"),
)
def window_frame_distinct_count(spark, sf_dir):
    """DISTINCT aggregate over a sliding frame — an operator Spark
    REJECTS natively ('Distinct window functions are not supported')
    but DuckDB runs directly, so the engine must compose it:
    collect_list over the frame -> array_distinct -> size, all
    JVM-side. Frame state is bounded by the 4-row frame, so the
    composition scales exactly like any other sliding frame."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(
            F.array_distinct(F.collect_list("event_type").over(w))
        ).alias("distinct_types_4"),
    )


@query(
    "window_time_range_frame",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id,
             CAST(epoch(ts) AS BIGINT) AS sec, value
      FROM events
    )
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_prev_hour,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
             AS cents_prev_hour
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame", "range", "time"),
)
def window_time_range_frame(spark, sf_dir):
    """TIME-based RANGE frame: per user, events and exact cents in the
    trailing hour of EVENT TIME (not row count) — the rate-limiter /
    rolling-exposure shape. Ordering on epoch seconds makes the frame
    identical on both engines including timestamp ties (RANGE frames
    are tie-inclusive by value, so no tiebreaker is needed — or
    allowed). The epoch conversion is pure wall-clock arithmetic —
    ``timestampdiff(SECOND, epoch, ts)`` over the TIMESTAMP_NTZ
    column — independent of the session timezone (``unix_timestamp``
    re-interprets NTZ under the session TZ and could diverge from
    DuckDB's TZ-free ``epoch()`` near DST transitions on a non-UTC
    session). Money rides as integer cents, exact under any
    accumulation order."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
        )
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_prev_hour"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .over(w)
        .alias("cents_prev_hour"),
    )


@query(
    "window_exclude_current_row",
    oracle="""
    WITH scored AS (
      SELECT o_orderkey, o_custkey,
             count(*) OVER peers AS n_peers,
             CASE WHEN count(*) OVER peers > 1 THEN
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                      PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING
                      EXCLUDE CURRENT ROW) AS DOUBLE)
               / (count(*) OVER peers - 1)
             END AS peer_avg
      FROM orders
      WINDOW peers AS (PARTITION BY o_custkey)
    )
    SELECT o_orderkey, o_custkey, n_peers, round(peer_avg, 6) AS peer_avg
    FROM scored WHERE o_orderkey % 50 = 0
    """,
    tags=("window", "frame-exclude", "orders", "exact-decimal"),
)
def window_exclude_current_row(spark, sf_dir):
    """EXCLUDE CURRENT ROW frame semantics, which Spark's window API
    has no syntax for: each order vs the average of the customer's
    OTHER orders (peer-comparison score). Emulated algebraically —
    (partition decimal sum − own value) / (partition count − 1) — which
    is the textbook rewrite for any invertible aggregate; the oracle
    runs DuckDB's NATIVE ``EXCLUDE CURRENT ROW`` frame to prove the
    rewrite exact (decimal sums keep subtraction order-safe).

    Scale: two unbounded-frame window functions over the same
    partitioning — one shuffle on o_custkey, no join, no second scan.
    """
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    dec_sum = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    n = F.count("*").over(w)
    peer_avg = (
        (dec_sum - F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
        / (n - 1)
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            n.alias("n_peers"),
            F.round(F.when(n > 1, peer_avg), 6).alias("peer_avg"),
        )
        .filter(F.col("o_orderkey") % 50 == 0)
    )


@query(
    "window_groups_frame",
    oracle="""
    WITH dr AS (
      SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity,
             dense_rank() OVER (PARTITION BY l_suppkey
                                ORDER BY l_shipdate) AS grp
      FROM lineitem
    ),
    g AS (
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
               PARTITION BY l_suppkey ORDER BY grp
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
             ) AS DOUBLE) AS qty_3day_groups
      FROM dr
    )
    SELECT l_orderkey, l_linenumber, l_suppkey, qty_3day_groups
    FROM g WHERE l_orderkey % 50 = 0
    """,
    tags=("window", "groups-frame", "lineitem", "exact-decimal"),
)
def window_groups_frame(spark, sf_dir):
    """GROUPS-mode window frame (peer-group offsets), absent from
    Spark's API: per supplier, each line item carries the quantity sum
    of its ship-date peer group plus the two preceding DISTINCT ship
    dates. Emulated by the standard two-level rewrite — aggregate per
    (key, order-value) group, run a ROWS frame over the per-group
    relation (one row per group makes ROWS ≡ GROUPS), and join the
    frame value back to detail rows on the group key. The oracle uses the
    independent dense_rank + integer-RANGE identity (RANGE over the
    dense group index ≡ GROUPS; DuckDB 1.0 has no GROUPS mode).

    Scale: the per-group relation is |distinct (suppkey, date)| — far
    smaller than the fact table; both the window and the join-back
    share the suppkey hash partitioning, so it's one detail shuffle +
    one small-side shuffle.
    """
    li = t(spark, sf_dir, "lineitem")
    per_group = (
        li.groupBy("l_suppkey", "l_shipdate")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("g_qty"))
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate")
        .rowsBetween(-2, Window.currentRow)
    )
    framed = per_group.withColumn(
        "qty_3day_groups", F.sum("g_qty").over(w).cast("double")
    ).select("l_suppkey", "l_shipdate", "qty_3day_groups")
    return (
        li.filter(F.col("l_orderkey") % 50 == 0)
        .join(framed, ["l_suppkey", "l_shipdate"])
        .select("l_orderkey", "l_linenumber", "l_suppkey", "qty_3day_groups")
    )


@query(
    "window_rolling_median",
    oracle="""
    WITH m AS (
      SELECT o_orderkey,
             median(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
             ) AS roll_median
      FROM orders
    )
    SELECT o_orderkey, roll_median FROM m WHERE o_orderkey % 50 = 0
    """,
    tags=("window", "frame", "median", "orders"),
)
def window_rolling_median(spark, sf_dir):
    """Rolling median over a 5-row trailing frame — a NON-invertible
    frame aggregate Spark's window API cannot express natively.
    Composed as collect_list over the frame → array_sort → interpolated
    middle pick ((arr[⌈n/2⌉] + arr[⌊n/2⌋+1]) / 2, 1-based), matching
    DuckDB's native windowed ``median`` bit-for-bit: the operands are
    the same 2-dp doubles and the even-count average is one IEEE op.

    Scale: per-partition frame materialization is O(frame) per row —
    fine for small frames (5 here); for wide frames the two-heap
    streaming median via applyInPandas is the documented escape hatch.
    One shuffle on o_custkey.
    """
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("o_totalprice").over(w))
    n = F.size(arr)
    lower = F.element_at(arr, F.floor((n + 1) / 2).cast("int"))
    upper = F.element_at(arr, (F.floor(n / 2) + 1).cast("int"))
    return (
        o.select(
            "o_orderkey", ((lower + upper) / 2).alias("roll_median")
        )
        .filter(F.col("o_orderkey") % 50 == 0)
    )


@query(
    "window_rolling_median_wide",
    oracle="""
    WITH m AS (
      SELECT o_orderkey,
             median(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 100 PRECEDING AND CURRENT ROW
             ) AS roll_median
      FROM orders
    )
    SELECT o_orderkey, roll_median FROM m WHERE o_orderkey % 50 = 0
    """,
    tags=("window", "frame", "median", "pandas-udf", "orders"),
)
def window_rolling_median_wide(spark, sf_dir):
    """WIDE-frame rolling median (101 rows) — the documented escape
    hatch from ``window_rolling_median``: at this frame width the
    collect_list-per-row plan materializes O(rows x frame) state, so
    the operator drops to ONE applyInPandas per partition key running
    pandas' O(n log frame) skip-list rolling median. Hash-verified
    against DuckDB's native windowed median: both interpolate the even
    middle as one IEEE average of the same 2-dp doubles.

    Scale: one shuffle on o_custkey; per-group state is the group
    itself (bounded by orders-per-customer); Arrow transfers batch
    the groups.
    """
    import pandas as pd  # noqa: PLC0415

    o = (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .repartition("o_custkey")
        .sortWithinPartitions("o_custkey", "o_orderdate", "o_orderkey")
    )

    # mapInPandas (one vectorized groupby-rolling per Arrow batch)
    # instead of applyInPandas: per-GROUP Python calls cost more than
    # the median math when groups are small and numerous. Groups can
    # straddle Arrow batch boundaries inside a partition, so the last
    # (possibly incomplete) group of each batch is carried forward.
    def roll(batches):
        def compute(pdf: "pd.DataFrame") -> "pd.DataFrame":
            med = (
                pdf.groupby("o_custkey", sort=False)["o_totalprice"]
                .rolling(window=101, min_periods=1)
                .median()
            )
            return pd.DataFrame(
                {
                    "o_orderkey": pdf["o_orderkey"].to_numpy(),
                    "roll_median": med.to_numpy(),
                }
            )

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_key = pdf["o_custkey"].iloc[-1]
            mask = pdf["o_custkey"] == last_key
            carry = pdf[mask]
            cur = pdf[~mask]
            if len(cur):
                yield compute(cur)
        if carry is not None and len(carry):
            yield compute(carry)

    return o.mapInPandas(roll, "o_orderkey long, roll_median double").filter(
        F.col("o_orderkey") % 50 == 0
    )
