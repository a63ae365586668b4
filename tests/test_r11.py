"""Round-11 pins: contracts for the r11 operators, each independent of
the DuckDB oracle (the rows-only queries' correctness evidence)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _run(spark, name):
    from gcp_etl_spark.queries import load_all

    return load_all()[name].fn(spark, SF_SMALL)


def test_ivf_refine_curve_inertia_monotone_and_recall_bounded(spark):
    """r10 verdict ask #8: the refine operating curve's contract —
    (a) one row per grid point, (b) full-corpus mean inertia is
    NON-INCREASING in refine_iters (Lloyd monotonicity: every
    distributed pass reassigns-then-recenters, neither step can raise
    the objective — this is the property that justifies paying for
    refinement at 100 TB), (c) recall@k in [0,1], and (d) the
    refine_iters=0 row is the sample-only default build, so the curve
    directly prices the default-vs-refined decision."""
    rows = {
        r["refine_iters"]: r
        for r in _run(spark, "ann_ivf_refine_recall_curve").collect()
    }
    assert set(rows) == {0, 1, 2}
    inertias = [rows[r]["mean_inertia"] for r in (0, 1, 2)]
    # 6dp-rounded values: allow equality (converged), never an increase
    assert inertias[0] >= inertias[1] >= inertias[2], inertias
    for r in (0, 1, 2):
        assert 0.0 <= rows[r]["recall_at_k"] <= 1.0, rows[r]


def test_kll_sketch_rank_error_mass_and_determinism(spark):
    """The KLL sketch's contract (operators/kll.py): (a) MASS — the
    summed 2^level weights equal the exact row count (compaction
    halves a buffer but doubles its weight; nothing is lost or
    invented); (b) ACCURACY — every decile estimate's true rank is
    within 2% of the target rank at k=256 (the empirical gate for the
    deterministic sweep variant); (c) DETERMINISM — same data + same
    partitioning => identical estimates (the property the driver
    contract needs, and what the sweep derandomization buys)."""
    import numpy as np
    import pandas as pd

    vals = pd.read_parquet(
        f"{SF_SMALL}/lineitem.parquet", columns=["l_extendedprice"]
    )["l_extendedprice"].to_numpy()
    vals_sorted = np.sort(vals)
    n = len(vals)

    rows = {
        r["qname"]: r
        for r in _run(spark, "agg_kll_quantile_sketch").collect()
    }
    assert rows["q50"]["weighted_n"] == n
    for i in range(1, 10):
        est = rows[f"q{10 * i}"]["est"]
        true_rank = np.searchsorted(vals_sorted, est, side="right") / n
        assert abs(true_rank - i / 10) <= 0.02, (
            i, est, true_rank,
        )

    again = {
        r["qname"]: r["est"]
        for r in _run(spark, "agg_kll_quantile_sketch").collect()
    }
    assert again == {q: r["est"] for q, r in rows.items()}


def test_stream_quantile_monitor_batching_invariant(spark):
    """The monitor's only stateful stage is the additive windowed
    bucket count, so ANY micro-batch split must produce the same
    result: split the events corpus in half by event_id parity, build
    each half's windowed counts, MERGE by addition (what the
    streaming state store does across micro-batches), and assert the
    quantile fold over merged counts equals the single-batch run."""
    from pyspark.sql import functions as F

    from gcp_etl_spark.streaming.windows import (
        w1_binned_counts,
        window_bucket_quantiles,
    )
    from gcp_etl_spark.tables import t as tbl

    probs = {"p50_bucket": 0.5, "p90_bucket": 0.9, "p99_bucket": 0.99}
    e = tbl(spark, SF_SMALL, "events")
    whole = {
        r["w_start"]: (r["p50_bucket"], r["p90_bucket"], r["p99_bucket"])
        for r in window_bucket_quantiles(
            w1_binned_counts(e, watermark=None), probs
        ).collect()
    }
    halves = [
        w1_binned_counts(
            e.filter(F.col("event_id") % 2 == i), watermark=None
        )
        for i in (0, 1)
    ]
    merged = (
        halves[0]
        .unionByName(halves[1])
        .groupBy("w_start", "b")
        .agg(F.sum("n").alias("n"))
    )
    again = {
        r["w_start"]: (r["p50_bucket"], r["p90_bucket"], r["p99_bucket"])
        for r in window_bucket_quantiles(merged, probs).collect()
    }
    assert whole == again and len(whole) > 1
