"""Streaming windowed KLL quantile sketch — the sketch-tier sibling of
``stream_quantile_monitor``'s exact bucket-CDF (r11 verdict ask #7).

The bucket monitor is exact but needs a bounded integer bucket grid;
this one handles unbounded-precision values at bounded memory by
riding the KLL sketch's mergeability (operators/kll.py module doc:
sketch(A) ∪ sketch(B) is in sketch(A ∪ B)'s error class, and deferring
compaction to the read side is lossless). That makes the streaming
dual the same shape as streaming/kmv_stream.py:

- foreachBatch: each micro-batch folds its rows into per-(event-time
  window, partition) compactor stacks INSIDE the scan task (raw values
  never shuffle) and persists the surviving (w_start, level, v) rows
  under ``epoch=<id>`` — replay-idempotent overwrite, the
  dedup_stream/kmv exactly-once contract.
- read side: the union of all epochs' sketch rows IS the merged
  per-window sketch; estimates come from ONE cumulative window
  partitioned by w_start (never single-partition) with integer-exact
  rational crossing tests.

What is and is not invariant (pinned in tests/test_r12.py):
- the merged TOTAL WEIGHT per window equals the exact row count under
  ANY batching (compaction is mass-preserving — exact invariant);
- the estimates' rank-error class (<= ~2% at k=256) holds under any
  batching (error-class invariant);
- the surviving values themselves DEPEND on the batching (a sketch is
  not a CRDT on values, only on error class) — so streaming-vs-batch
  EQUALITY is pinned against the batch engine running the documented
  merge law over the same per-epoch splits, which is bit-identical.

Scale: per-epoch state is <= |windows| * k * levels rows (a few KB);
the merge reads #epochs of those. At 1000 executors the per-window
sketch relation is ~#tasks * k * levels rows; re-sketch the sketch if
even that offends (the operator composes with itself).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_etl_spark.operators.kll import (
    windowed_partition_sketches,
    windowed_quantiles_from_sketch,
)


def window_sketches(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    k: int = 256,
    window: str = "1 day",
) -> DataFrame:
    """(w_start, level, v) KLL sketch rows for one relation: tumbling
    event-time windows, one stack per (window, physical partition)."""
    win = df.select(
        F.window(F.col(ts_col), window).getField("start").alias(
            "w_start"
        ),
        F.col(value_col).cast("double").alias(value_col),
    )
    return windowed_partition_sketches(win, "w_start", value_col, k)


def kll_sink(
    store_dir: str,
    ts_col: str,
    value_col: str,
    k: int = 256,
    window: str = "1 day",
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function: persist each epoch's
    per-window sketch rows under ``epoch=<id>`` (replay-idempotent
    overwrite — a replayed epoch rewrites its own directory and the
    merged estimate is unchanged)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        window_sketches(batch_df, ts_col, value_col, k, window).write.mode(
            "overwrite"
        ).parquet(os.path.join(store_dir, f"epoch={epoch_id}"))

    return sink


def read_merged_quantiles(
    spark, store_dir: str, probs: dict[str, float]
) -> DataFrame:
    """Merge all epoch sketches (union IS the merge — compaction is
    deferred losslessly to this cumulative window) and emit one row
    per window: (w_start, weighted_n, <one column per prob>)."""
    sk = spark.read.parquet(store_dir).select("w_start", "level", "v")
    return windowed_quantiles_from_sketch(sk, "w_start", probs)
