"""Batch/stream dual windowed aggregations over the events table.

Each operator is written ONCE against the DataFrame API and accepts
either a batch DataFrame or a streaming DataFrame (``readStream``) —
``F.window`` / ``F.session_window`` / ``dropDuplicates`` behave
identically; only triggers/output-mode differ at the sink. Tests run
the same function both ways and assert equality
(SURVEY.md §2B "streaming surface"); the DuckDB oracle checks the
batch result.

Watermark notes (100 TB stream): callers pass ``watermark`` so state
for windows older than (max event time - delay) is dropped — without
it a grouped-window stream's state grows without bound. Late rows
beyond the watermark are discarded, which is the documented
append-mode semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if not (watermark and df.isStreaming):
        return df
    # event-time watermarks require the (session-tz) TimestampType;
    # batch keeps TIMESTAMP_NTZ for oracle/schema parity, so cast only
    # on the streaming path (value-preserving under the UTC session)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark)


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "10 minutes",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Tumbling-window count/sum — epoch-aligned windows identical to
    DuckDB ``time_bucket``."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width).alias("w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            # exact-decimal sum: cross-engine deterministic (queries/_exact.py)
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(F.col("w.start").alias("w_start"), *keys, "n_events", "sum_value")
    )


def sliding_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Sliding-window aggregate: each event contributes to
    width/slide overlapping windows."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n_events", "avg_value")
    )


def session_agg(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key: str = "user_id",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Session windows (gap-based): a session starts at its first event
    and extends while successive events arrive within ``gap``.

    Output start/last_ts/count — NOT Spark's session end (= last+gap),
    so the batch result equals the classic gaps-and-islands SQL.
    """
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(
            F.count("*").alias("n_events"),
            F.max(ts_col).alias("last_ts"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(key, F.col("w.start").alias("s_start"), "n_events", "last_ts", "sum_value")
    )


def stream_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Stateful dedup: first row per key wins.

    Streaming: ``dropDuplicatesWithinWatermark`` bounds the key state
    to the watermark horizon (at 100 TB/day an unbounded exact-dedup
    state is impossible — the watermark IS the design decision).
    Batch: plain ``dropDuplicates`` (same first-wins semantics).
    """
    if events.isStreaming and watermark:
        return _maybe_watermark(events, ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))


def stateful_running_totals(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
):
    """Custom stateful streaming operator via applyInPandasWithState:
    per-key running event count + exact value total (int cents),
    emitted once per micro-batch.

    This is the escape hatch for operators Spark's built-in stateful
    primitives can't express (SURVEY §2B "custom stateful operators").
    State is a 2-tuple per key — bounded by |keys|, not |events|; the
    watermark lets the state store GC idle keys via timeout.

    Batch fallback: a plain groupBy aggregate with identical output.
    """
    import pandas as pd  # noqa: F401

    if not events.isStreaming:
        return events.groupBy(key).agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.round(F.col("value") * 100).cast("long")
            ).alias("total_cents"),
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key_tuple, pdf_iter, state):
        import numpy as np

        (n, total) = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += int(np.round(pdf["value"].to_numpy() * 100).astype("int64").sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key_tuple[0]], "n_events": [n], "total_cents": [total]}
        )

    return (
        _maybe_watermark(events, ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, total_cents long",
            stateStructType="n long, total long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def view_purchase_join(
    views: DataFrame,
    purchases: DataFrame,
    gap: str = "60 minutes",
    watermark: str | None = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join: pair each view with the same user's
    purchases inside ``(view.ts, view.ts + gap]`` — the attribution
    join. Both sides carry watermarks so the join state (buffered rows
    awaiting matches) is bounded by watermark + gap; without them a
    stream-stream join's state grows forever. The same function runs
    in batch (watermark is a streaming-only no-op) for the equality
    test / oracle."""
    v = _maybe_watermark(views, "ts", watermark).select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    p = _maybe_watermark(purchases, "ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    joined = v.join(
        p,
        F.expr(
            f"v_user = p_user AND p_ts > v_ts "
            f"AND p_ts <= v_ts + INTERVAL {gap}"
        ),
        how,
    )
    # left_outer adds the null-emission path: an unmatched view emits
    # (view, NULL) only once the watermark passes v_ts + gap — i.e.
    # once no future purchase could still match. State stays bounded
    # exactly as in the inner case; rows buffered past watermark+gap
    # are evicted with a null emission instead of silently.
    return joined.select("view_id", "purchase_id", "v_user")


def rank_topk(win_counts: DataFrame, k: int = 3) -> DataFrame:
    """Top-k keys per window over a windowed-count relation
    (``tumbling_agg`` output): rank by count desc, key tie-break.

    Streaming deployment note: ranking cannot ride an unfinished
    streaming aggregation in append mode — the documented pattern is
    aggregate IN the stream (update/complete to a sink), then apply
    this rank per micro-batch via ``foreachBatch`` or over the
    materialized sink table. Batch pipelines just compose directly.
    The rank window partitions by window start, so its shuffle is on
    the already-aggregated (bounded) relation, never the raw stream.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("w_start").orderBy(
        F.desc("n_events"), "event_type"
    )
    return (
        win_counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def static_enriched_agg(
    events: DataFrame,
    dim: DataFrame,
    ts_col: str = "ts",
    width: str = "10 minutes",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """STREAM-STATIC join + windowed aggregate: the streaming side
    joins a bounded dimension (here customer segment keyed by user
    id), then aggregates per (window, segment).

    Streaming semantics: the static side is (re)resolved per
    micro-batch and broadcast when small — no state is kept for it, no
    watermark needed on the dim; only the windowed aggregation holds
    state. This is the canonical enrich-then-aggregate stream
    topology; the batch dual runs the identical plan minus triggers.
    """
    df = _maybe_watermark(events, ts_col, watermark)
    enriched = df.join(
        F.broadcast(
            dim.select(
                F.col("c_custkey").alias("user_id"),
                F.col("c_mktsegment").alias("segment"),
            )
        ),
        "user_id",
    )
    return (
        enriched.groupBy(F.window(ts_col, width).alias("w"), "segment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(F.col("w.start").alias("w_start"), "segment", "n_events", "sum_value")
    )


def latency_quantiles_windowed(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 day",
    accuracy: int = 1_000_000,
    watermark: str | None = "2 days",
) -> DataFrame:
    """(w_start, p50_latency, p95_latency, n_events) — approximate
    percentiles inside a watermarked tumbling window: the always-on
    latency-SLO monitor next to PSI drift. ``percentile_approx``
    (Greenwald-Khanna) is a mergeable sketch, so it runs INSIDE the
    streaming aggregation — state per window is one fixed-size sketch,
    never the raw values, which is the only viable shape for a p95
    over a 100 TB/day stream.

    At ``accuracy`` >= rows-per-window the sketch retains every value
    and is provably exact (nearest-rank), which is how the batch dual
    is value-checked against DuckDB's quantile_disc; production keeps
    the default accuracy and trades that exactness for O(accuracy)
    state (the agg_approx_quantile policy)."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width).alias("w"))
        .agg(
            F.percentile_approx("value", 0.5, accuracy).alias("p50_latency"),
            F.percentile_approx("value", 0.95, accuracy).alias("p95_latency"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "p50_latency",
            "p95_latency",
            "n_events",
        )
    )


# Fixed PSI bin edges for events.value — in deployment these ship with
# the job (fitted offline on the reference corpus), exactly like a
# pretrained tokenizer's merge table. 6 bins over the observed range.
PSI_EDGES: tuple[float, ...] = (5.0, 15.0, 35.0, 70.0, 115.0)


def value_bin(col, edges: tuple[float, ...] = PSI_EDGES):
    """1-based bin index against fixed edges: count of edges below the
    value + 1 (no CASE ladder to keep in sync with the oracle)."""
    thr = F.array(*[F.lit(float(e)) for e in edges])
    return 1 + F.size(F.filter(thr, lambda x: x < col))


def psi_binned_counts(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 day",
    edges: tuple[float, ...] = PSI_EDGES,
    watermark: str | None = "2 days",
) -> DataFrame:
    """(w_start, bin, n) tumbling-window bin counts — the stream-safe
    half of PSI drift monitoring: one windowed grouped count, state
    bounded by (windows inside watermark) x |bins|."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(
            F.window(ts_col, width).alias("w"),
            value_bin(F.col("value"), edges).alias("bin"),
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "bin", "n")
    )


def psi_drift(win_counts: DataFrame, ref_profile: DataFrame) -> DataFrame:
    """Per-(window, bin) PSI contributions of windowed bin counts vs a
    STATIC reference profile ``(bin, p_ref)``.

    The share-of-window normalization needs the window total — a second
    aggregation over the already-aggregated stream, so in a live stream
    this stage runs per micro-batch via foreachBatch (the ``rank_topk``
    pattern); the windowed count (``psi_binned_counts``) is the only
    stateful stage. Batch runs the identical plan directly.

    Bins absent from a window emit no row (no zero-smoothing): the
    reference profile covers every bin the corpus produces, so p_ref >
    0 wherever a target row exists and the log is always defined.

    The window total is a partitioned window sum over the (already
    aggregated, |windows| x |bins|-sized) relation — not a self-join,
    which Spark cannot resolve against a memory-sink view and which
    would cost an extra shuffle.
    """
    from pyspark.sql import Window

    wn = F.sum("n").over(Window.partitionBy("w_start"))
    p_tgt = F.col("n") / wn
    return (
        win_counts
        .join(F.broadcast(ref_profile), "bin")
        .select(
            "w_start",
            F.col("bin").cast("long").alias("bin"),
            F.round(p_tgt, 6).alias("p_tgt"),
            F.round(F.col("p_ref"), 6).alias("p_ref"),
            F.round(
                (p_tgt - F.col("p_ref")) * F.log(p_tgt / F.col("p_ref")), 6
            ).alias("psi_contribution"),
        )
    )


# Deployment-shipped quality-classifier weights (the shape
# train_quality_logreg's recurrence produces): a live stream SCORES
# with fixed weights — it never trains — so they ship as literals,
# exactly like PSI_EDGES above and the BPE merge table.
SCORE_W: tuple[float, float, float] = (-1.25, 0.2, 0.5)


def score_calibration_windows(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 day",
    weights: tuple[float, float, float] = SCORE_W,
    watermark: str | None = "2 days",
) -> DataFrame:
    """(w_start, n, mean_predicted, actual_rate) — tumbling-window LIVE
    CALIBRATION monitor of a shipped logistic model: per window, the
    mean predicted probability vs the actual positive rate. A widening
    gap is model drift — the always-on sibling of the batch
    ``quality_calibration_bins`` reliability diagram.

    Stream-safe by construction: ONE windowed aggregation (state =
    windows inside the watermark), the scoring expression is a pure
    map fused into the same stage. Works identically on a batch frame
    (the oracle dual) and a ``readStream`` source."""
    w0, w1, w2 = weights
    df = _maybe_watermark(events, ts_col, watermark)
    z = (
        F.lit(w0)
        + F.lit(w1) * (F.col("value") / 100.0)
        + F.lit(w2) * (F.hour(ts_col) / 24.0)
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    return (
        df.groupBy(F.window(ts_col, width).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(p), 6).alias("mean_predicted"),
            F.round(F.avg(y), 6).alias("actual_rate"),
        )
        .select(F.col("w.start").alias("w_start"), "n",
                "mean_predicted", "actual_rate")
    )


# Fixed split threshold for the independence monitor's value flag —
# ships with the job like PSI_EDGES (fitted offline ≈ corpus median).
GTEST_THRESH = 49.0


def gtest_cells(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 day",
    thresh: float = GTEST_THRESH,
    watermark: str | None = "2 days",
) -> DataFrame:
    """(w_start, r, c, n) tumbling-window contingency cells (event
    type × value-over-threshold flag) — the stream-safe half of the
    G-test independence monitor: one windowed grouped count, state
    bounded by (windows inside watermark) × |types| × 2, and COUNTS
    MERGE, so the stage is batching-invariant by construction."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(
            F.window(ts_col, width).alias("w"),
            F.col("event_type").alias("r"),
            F.when(F.col("value") > thresh, 1).otherwise(0).alias("c"),
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "r", "c", "n")
    )


def gtest_drift(win_cells: DataFrame) -> DataFrame:
    """Per-window G statistic (log-likelihood-ratio independence test)
    over windowed contingency cells: G_w = 2·Σ_cells n·ln(n·N_w /
    (row_w·col_w)). Marginals are window sums over the already-
    aggregated |windows|×|types|×2 relation, and the fold runs per
    micro-batch via foreachBatch (the psi_drift pattern) — the
    windowed cell count is the only stateful stage. Each ln term is
    cast to DECIMAL so the per-window fold is order-free (the
    stats_g_test convention); a G_w spiking over time = the
    value/type association is drifting."""
    from pyspark.sql import Window as W

    rt = F.sum("n").over(W.partitionBy("w_start", "r"))
    ct = F.sum("n").over(W.partitionBy("w_start", "c"))
    nn = F.sum("n").over(W.partitionBy("w_start"))
    term = (
        F.lit(2.0)
        * F.col("n")
        * F.log(F.col("n").cast("double") * nn / (rt * ct))
    ).cast("decimal(28,12)")
    enriched = win_cells.select("w_start", "r", "c", "n", term.alias("g_term"))
    return (
        enriched.groupBy("w_start")
        .agg(
            F.sum("n").cast("long").alias("n"),
            (
                (F.countDistinct("r") - 1) * (F.countDistinct("c") - 1)
            ).cast("long").alias("dof"),
            F.round(F.sum("g_term").cast("double"), 6).alias("g"),
        )
    )


def w1_binned_counts(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 day",
    watermark: str | None = "2 days",
) -> DataFrame:
    """(w_start, b, n) tumbling-window INTEGER-bucket counts for
    Wasserstein-1 drift — same stream-safe shape as
    ``psi_binned_counts`` (one windowed grouped count, additive and
    therefore batching-invariant), but over the ordered floor(value)
    support so downstream distances are metric, not just
    distributional."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(
            F.window(ts_col, width).alias("w"),
            F.floor("value").cast("long").alias("b"),
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "b", "n")
    )


def w1_drift(win_counts: DataFrame, ref_counts: DataFrame) -> DataFrame:
    """Per-window exact Wasserstein-1 distance between the window's
    value distribution and a STATIC reference profile ``(b, n_ref)``
    over the ordered integer-bucket support:
    W₁ = Σ_b |cumW·N_R − cumR·N_W|·Δb / (N_W·N_R).

    The CDF difference stays an INTEGER the whole way (the
    stats_wasserstein_1d identity), so the per-window fold is
    order-free; the only stateful stage upstream is the additive
    windowed count. The per-window support is the UNION of the
    reference buckets and that window's observed buckets (r9 ADVICE:
    a left join from the reference grid silently dropped window mass
    in buckets outside the historic support — understating drift
    exactly when values move beyond it, the case a drift monitor most
    needs to flag); buckets missing from either side zero-fill, and
    since every reference bucket appears in every window's grid the
    per-window Σn_ref is still the full reference mass."""
    from pyspark.sql import Window

    wins = win_counts.select("w_start").distinct()
    support = (
        wins.crossJoin(F.broadcast(ref_counts.select("b")))
        .unionByName(win_counts.select("w_start", "b"))
        .distinct()
    )
    j = (
        support.join(win_counts, ["w_start", "b"], "left")
        .join(F.broadcast(ref_counts), ["b"], "left")
        .select(
            "w_start",
            "b",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
        )
    )
    wcum = Window.partitionBy("w_start").orderBy("b")
    cum = j.select(
        "w_start",
        "b",
        F.sum("n").over(wcum).alias("cw"),
        F.sum("n_ref").over(wcum).alias("cr"),
        F.lead("b").over(wcum).alias("b_next"),
        F.sum("n").over(Window.partitionBy("w_start")).alias("nw"),
        F.sum("n_ref").over(Window.partitionBy("w_start")).alias("nr"),
    )
    return (
        cum.filter(F.col("b_next").isNotNull())
        .groupBy("w_start", "nw", "nr")
        .agg(
            F.sum(
                F.abs(
                    F.col("cw") * F.col("nr") - F.col("cr") * F.col("nw")
                )
                * (F.col("b_next") - F.col("b"))
            ).alias("num")
        )
        .select(
            "w_start",
            F.col("nw").cast("long").alias("n_window"),
            F.round(
                F.col("num").cast("double")
                / (F.col("nw").cast("double") * F.col("nr")),
                6,
            ).alias("w1_drift"),
        )
    )


def group_moment_windows(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    width: str = "1 day",
    watermark: str | None = "2 days",
) -> DataFrame:
    """(w_start, g, n, sc, sc2) tumbling-window per-group moments of
    the integer-cents value — the stream-safe half of the FDR drift
    monitor: ONE windowed grouped agg, all sums exact (BIGINT /
    DECIMAL(38,0)), additive and therefore batching-invariant."""
    df = _maybe_watermark(events, ts_col, watermark)
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        df.groupBy(
            F.window(ts_col, width).alias("w"),
            F.col(group_col).alias("g"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(cents.cast("decimal(38,0)")).alias("sc"),
            F.sum(
                cents.cast("decimal(38,0)") * cents.cast("decimal(38,0)")
            ).alias("sc2"),
        )
        .select(F.col("w.start").alias("w_start"), "g", "n", "sc", "sc2")
    )


def fdr_drift(
    win_moments: DataFrame,
    ref_profile: DataFrame,
    crit: DataFrame,
) -> DataFrame:
    """Per-window BENJAMINI-HOCHBERG-corrected multi-group drift: each
    window runs one z-test per group (windowed mean vs the static
    reference mean, scaled by the reference sd), then the BH step-up
    WITHIN the window decides which groups' drifts survive at the
    controlled FDR — the multiple-testing guard every per-segment
    drift dashboard needs once it watches more than one segment (a
    10%-FDR alert page with 50 segments would otherwise cry wolf
    five times a day by design).

    ``ref_profile``: (g, mu, sd) static per-group reference (exact
    cents moments); ``crit``: (i, zc) the BH critical |z| ladder,
    invPhi(1 - i q / 2m) literals computed driver-side (no in-engine
    erf — the stats_bh_fdr contract). Stream-safe: the windowed
    moment agg upstream is the ONLY stateful stage; the z/BH algebra
    is a per-window projection + a tiny m-row window sort."""
    from pyspark.sql import Window as W

    z = win_moments.join(F.broadcast(ref_profile), "g").select(
        "w_start",
        "g",
        "n",
        F.abs(
            (F.col("sc").cast("double") / F.col("n") - F.col("mu"))
            * F.sqrt(F.col("n").cast("double"))
            / F.col("sd")
        ).alias("az"),
    )
    ranked = z.select(
        "w_start",
        "g",
        "n",
        "az",
        F.row_number()
        .over(W.partitionBy("w_start").orderBy(F.col("az").desc(), "g"))
        .alias("i"),
    )
    marked = ranked.join(F.broadcast(crit), "i").select(
        "w_start",
        "g",
        "n",
        "az",
        "i",
        F.when(F.col("az") >= F.col("zc"), F.col("i"))
        .otherwise(0)
        .alias("hit"),
    )
    k = marked.groupBy("w_start").agg(F.max("hit").alias("k"))
    return marked.join(k, "w_start").select(
        "w_start",
        "g",
        F.col("n").cast("long").alias("n_events"),
        F.round("az", 6).alias("abs_z"),
        F.col("i").cast("long").alias("rank_desc"),
        (F.col("i") <= F.col("k")).alias("drifted"),
    )


def window_bucket_quantiles(
    win_counts: DataFrame, probs: dict[str, float]
) -> DataFrame:
    """Per-window BUCKET-CDF quantile estimates from the additive
    (w_start, b, n) windowed integer-bucket counts (the
    psi/w1_binned_counts state — counts merge across micro-batches,
    so the monitor is batching-invariant by the same argument):
    quantile(q) = the smallest bucket whose inclusive cumulative count
    reaches ceil(q * N). Everything is INTEGER — each probability is
    taken as the exact rational its decimal literal denotes (0.99 =
    99/100 via Fraction-of-str) and the crossing test is the
    cross-multiplied ``cum * den >= num * N`` (equivalent to
    ``cum >= ceil(num*N/den)`` for positive integers), so no
    float product whose ulp could shift the reported bucket ever
    appears (r11 ADVICE) and both engines agree exactly — the
    streaming quantile monitor stays hash-verifiable, unlike a
    sketch whose survivors depend on partitioning."""
    from fractions import Fraction

    from pyspark.sql import Window

    w = Window.partitionBy("w_start").orderBy("b")
    cum = win_counts.select(
        "w_start",
        "b",
        F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("n").over(Window.partitionBy("w_start")).alias("N"),
    )
    aggs = [F.max("N").cast("long").alias("n_window")]
    for name, p in sorted(probs.items(), key=lambda kv: kv[1]):
        frac = Fraction(str(p))  # the DECIMAL the caller wrote, exact
        aggs.append(
            F.min(
                F.when(
                    F.col("cum").cast("long") * F.lit(frac.denominator)
                    >= F.lit(frac.numerator) * F.col("N").cast("long"),
                    F.col("b"),
                )
            )
            .cast("long")
            .alias(name)
        )
    return cum.groupBy("w_start").agg(*aggs)
