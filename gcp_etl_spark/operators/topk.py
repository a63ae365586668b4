"""Top-K operators.

Scale design: global top-k uses ``orderBy(...).limit(k)`` which Spark
plans as ``TakeOrderedAndProject`` — per-partition partial top-k on the
executors, then a k-sized merge on the driver; no full sort, no full
shuffle. Per-group top-k uses a ranking window, which shuffles once on
the group key and sorts within partitions only; with AQE skew handling a
hot group splits. Never collect-then-sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. ``order`` must be a total order (include a unique
    tiebreaker column) for deterministic output."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number over a window.

    One shuffle on ``group``; the window sort is within-partition.
    ``order`` must be total (unique tiebreaker) for determinism.
    """
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
