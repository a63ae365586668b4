"""Scale-safe sliding RANGE frames via value-bucketing.

The straightforward ``RANGE BETWEEN w PRECEDING AND CURRENT ROW``
window parallelizes only across PARTITION BY keys. When that key is
low-cardinality (``o_orderstatus`` has 3 values), the whole table
funnels through 3 tasks — a guaranteed straggler at 100 TB.

Trick: sub-partition each logical partition by a coarse value bucket
``floor(value / bucket_width)`` with ``bucket_width >= w``. A frame
``[v - w, v]`` then spans AT MOST the row's own bucket and the one
below it, so replicating every row once into the bucket above
(boundary overlap) makes each (partition, bucket) group
self-contained. Cost: one extra copy of the data through the window
shuffle; gain: parallelism = (#partitions x #buckets) instead of
#partitions. Replication factor is exactly 2 regardless of bucket
count, so bucket_width tunes task size freely.

No reference counterpart (the reference has no window functions) —
this is the engine's 100 TB path for `window_range_frame`-class
queries, per round-1 verdict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HOME = "__rf_home"
_TGT = "__rf_tgt"


def bucketed_range_frame(
    df: DataFrame,
    value_col: str,
    width: float,
    aggs: dict[str, Column],
    part_cols: tuple[str, ...] = (),
    bucket_width: float | None = None,
) -> DataFrame:
    """Evaluate ``agg OVER (PARTITION BY part_cols ORDER BY value_col
    RANGE BETWEEN width PRECEDING AND CURRENT ROW)`` for every entry
    in ``aggs`` (name -> aggregate expression, e.g. ``F.count("*")``),
    with parallelism ``#part_cols-groups x #value-buckets``.

    ``bucket_width`` must be >= ``width`` (default ``4 * width``);
    larger buckets = fewer, bigger tasks.
    """
    bw = float(bucket_width if bucket_width is not None else 4 * width)
    if bw < width:
        raise ValueError(f"bucket_width {bw} must be >= frame width {width}")
    home = F.floor(F.col(value_col).cast("double") / F.lit(bw)).cast("long")
    based = df.withColumn(_HOME, home)
    # each row serves its own bucket AND (as boundary context) the one
    # above; explode-of-array emits both copies from a single scan of
    # the source (a self-union would read the input twice)
    doubled = based.withColumn(
        _TGT, F.explode(F.array(F.col(_HOME), F.col(_HOME) + F.lit(1)))
    )
    w = (
        Window.partitionBy(*part_cols, _TGT)
        .orderBy(value_col)
        .rangeBetween(-width, Window.currentRow)
    )
    out = doubled.select(
        "*", *[expr.over(w).alias(name) for name, expr in aggs.items()]
    )
    # context copies computed partial frames for other rows; drop them
    return out.filter(F.col(_TGT) == F.col(_HOME)).drop(_TGT, _HOME)
