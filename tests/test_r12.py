"""Round-12 pins: contracts for the r12 operators, each independent of
the DuckDB oracle (the rows-only queries' correctness evidence).

The streaming windowed KLL monitor (r11 verdict ask #7) pins the three
properties the module doc claims, in their honest strengths:
- EXACT under any batching: per-window total weight == exact count
  (compaction is mass-preserving);
- ERROR-CLASS under any batching: every estimate's true rank within
  2% of target at k=256 (the agg_kll_quantile_sketch gate);
- BIT-EXACT vs the batch engine running the documented merge law over
  the same per-epoch splits (union of per-epoch sketches).
"""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMALL

_PROBS = {"p50_est": 0.50, "p90_est": 0.90, "p99_est": 0.99}


def _run(spark, name):
    from gcp_etl_spark.queries import load_all

    return load_all()[name].fn(spark, SF_SMALL)


def _events_value_stream_dir(spark, tmp_path, n_files=3):
    """Split the events table into n_files parquet files (one
    micro-batch each under maxFilesPerTrigger=1), ordered by event_id
    so the split is deterministic."""
    from gcp_etl_spark.tables import t as tbl

    e = tbl(spark, SF_SMALL, "events").select("event_id", "ts", "value")
    qdir = str(tmp_path / "estream")
    rows = e.orderBy("event_id").collect()
    per = max(1, len(rows) // n_files)
    for i in range(n_files):
        chunk = (
            rows[i * per:(i + 1) * per]
            if i < n_files - 1
            else rows[(n_files - 1) * per:]
        )
        if chunk:
            spark.createDataFrame(chunk, e.schema).coalesce(1).write.mode(
                "append"
            ).parquet(qdir)
    return qdir, e.schema


def _exact_window_values(spark):
    """Per-window sorted raw values from the static events table (the
    oracle-independent exact baseline)."""
    from pyspark.sql import functions as F

    from gcp_etl_spark.tables import t as tbl

    e = (
        tbl(spark, SF_SMALL, "events")
        .select(
            F.window("ts", "1 day").getField("start").alias("w_start"),
            "value",
        )
        .toPandas()
    )
    return {
        w: np.sort(grp["value"].to_numpy())
        for w, grp in e.groupby("w_start")
    }


def _run_stream(spark, tmp_path, qdir, schema, store_name):
    from gcp_etl_spark.streaming.kll_stream import kll_sink

    store = str(tmp_path / store_name)
    sink = kll_sink(store, "ts", "value", k=256)
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir)
        .writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation", str(tmp_path / (store_name + "_ckpt"))
        )
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return store


def _assert_estimates_within_rank_error(est_rows, exact, tol=0.02):
    for r in est_rows:
        arr = exact[r["w_start"]]
        n = len(arr)
        assert r["weighted_n"] == n, (r["w_start"], r["weighted_n"], n)
        for col, p in _PROBS.items():
            true_rank = np.searchsorted(arr, r[col], side="right") / n
            # small windows: 2% of n under one rank — allow one row
            assert abs(true_rank - p) <= max(tol, 1.5 / n), (
                r["w_start"], col, r[col], true_rank,
            )


def test_stream_kll_equals_batch_merge_and_rank_error(spark, tmp_path):
    """KLL mergeability made executable (the kmv_stream pattern): the
    streaming store's merged per-window estimates must equal the batch
    engine running the documented merge law — union of per-epoch
    windowed sketches over the SAME splits — bit-for-bit; and every
    estimate must sit within the 2% rank-error gate vs the exact
    per-window sorted values."""
    from gcp_etl_spark.operators.kll import (
        windowed_quantiles_from_sketch,
    )
    from gcp_etl_spark.streaming.kll_stream import (
        read_merged_quantiles,
        window_sketches,
    )

    qdir, schema = _events_value_stream_dir(spark, tmp_path, n_files=3)
    store = _run_stream(spark, tmp_path, qdir, schema, "kll")

    got = sorted(
        map(tuple, read_merged_quantiles(spark, store, _PROBS).collect())
    )

    # batch side: the SAME per-file splits through the same sketch
    # builder, merged by union (the merge law)
    import glob as _glob

    merged = None
    for f in sorted(_glob.glob(qdir + "/part-*.parquet")):
        sk = window_sketches(
            spark.read.schema(schema).parquet(f), "ts", "value", k=256
        )
        merged = sk if merged is None else merged.unionByName(sk)
    want = sorted(
        map(
            tuple,
            windowed_quantiles_from_sketch(
                merged, "w_start", _PROBS
            ).collect(),
        )
    )
    assert got == want

    est_rows = read_merged_quantiles(spark, store, _PROBS).collect()
    _assert_estimates_within_rank_error(est_rows, _exact_window_values(spark))


def test_stream_kll_batching_invariant_mass_and_error(spark, tmp_path):
    """Batching invariance in its honest strengths: under a DIFFERENT
    micro-batch split (7 files vs 3), the per-window total weight is
    IDENTICAL (mass is exactly batching-invariant — compaction halves
    a buffer but doubles its weight) and every estimate stays inside
    the same rank-error gate (the error CLASS is invariant; the
    surviving values themselves may differ, which is why this tier is
    rows-only while the bucket monitor stays hash-verified)."""
    from gcp_etl_spark.streaming.kll_stream import read_merged_quantiles

    exact = _exact_window_values(spark)
    qdir, schema = _events_value_stream_dir(spark, tmp_path, n_files=7)
    store = _run_stream(spark, tmp_path, qdir, schema, "kll7")
    est_rows = read_merged_quantiles(spark, store, _PROBS).collect()
    assert len(est_rows) == len(exact)
    _assert_estimates_within_rank_error(est_rows, exact)


def test_stream_kll_replay_idempotent(spark, tmp_path):
    """The exactly-once contract (dedup_stream/kmv convention): a
    replayed epoch overwrites its own ``epoch=<id>`` directory, so
    re-running epoch 0's sink on the same micro-batch leaves the
    merged estimates unchanged."""
    import glob as _glob

    from gcp_etl_spark.streaming.kll_stream import (
        kll_sink,
        read_merged_quantiles,
    )

    qdir, schema = _events_value_stream_dir(spark, tmp_path, n_files=3)
    store = _run_stream(spark, tmp_path, qdir, schema, "kllr")
    before = sorted(
        map(tuple, read_merged_quantiles(spark, store, _PROBS).collect())
    )
    first_file = sorted(_glob.glob(qdir + "/part-*.parquet"))[0]
    kll_sink(store, "ts", "value", k=256)(
        spark.read.schema(schema).parquet(first_file), 0
    )
    after = sorted(
        map(tuple, read_merged_quantiles(spark, store, _PROBS).collect())
    )
    assert before == after


def test_stream_kll_batch_query_matches_monitor_windows(spark):
    """The registered batch-mode query (stream_kll_window_quantiles)
    must see exactly the windows the exact bucket monitor sees, with
    exact per-window mass, and its estimates must pass the rank gate —
    the sketch tier and the exact tier describe the same stream."""
    rows = _run(spark, "stream_kll_window_quantiles").collect()
    exact = _exact_window_values(spark)
    assert {r["w_start"] for r in rows} == set(exact)
    _assert_estimates_within_rank_error(rows, exact)
