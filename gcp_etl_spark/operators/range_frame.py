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


def prefix_range_frame(
    df: DataFrame,
    value_col: str,
    width: float,
    sum_cols: dict[str, Column],
    part_cols: tuple[str, ...] = (),
    bucket_width: float | None = None,
) -> DataFrame:
    """``sum/count OVER (PARTITION BY part_cols ORDER BY value_col
    RANGE BETWEEN width PRECEDING AND CURRENT ROW)`` for INVERTIBLE
    aggregates only, in O(n log n) — no per-row frame re-scan.

    Spark evaluates a sliding RANGE frame by rebuilding the aggregate
    buffer from scratch at every row (``SlidingWindowFunctionFrame``
    has no retract path), so the replication operator above still pays
    O(rows x frame-rows). For sums and counts the frame is a
    difference of prefixes::

        agg[v-w, v] = cum(<= v) - cum(< v - w)

    Both prefixes come out of ONE sorted cumulative pass over the
    per-value groups unioned with per-value PROBE rows keyed at
    ``v - w`` (probes carry zero weight and sort BEFORE data rows on
    the same key, so their cumulative value is exactly the
    strictly-below prefix). The pass itself is parallelized the
    standard two-level prefix-scan way: cumulative within each
    (partition, value-bucket) group, plus a per-bucket offset computed
    from bucket totals (tiny — #buckets rows — and broadcast back).

    ``sum_cols`` maps output name -> column to sum inside the frame;
    use ``F.lit(1)`` for a frame COUNT. Results keyed by
    ``part_cols + [value_col]`` — join back to the source to attach
    row identity. ``bucket_width`` tunes task size (default
    ``4 * width``; any value > 0 is correct, unlike the replication
    operator it need not be >= width)."""
    bw = float(bucket_width if bucket_width is not None else 4 * width)
    names = list(sum_cols)
    # one row per distinct value: makes the ROWS-cumulative inclusive
    # semantics exact under ties, and shrinks the window input
    grouped = df.groupBy(
        *part_cols, F.col(value_col).cast("double").alias("__v")
    ).agg(*[F.sum(c).alias(f"__g_{n}") for n, c in sum_cols.items()])
    zeros = [F.lit(None).cast(t) for t in
             [grouped.schema[f"__g_{n}"].dataType for n in names]]
    data = grouped.select(
        *part_cols,
        F.col("__v").alias("__key"),
        F.lit(1).alias("__flag"),
        F.col("__v").alias("__origin"),
        *[F.col(f"__g_{n}").alias(f"__w_{n}") for n in names],
    )
    probes = grouped.select(
        *part_cols,
        (F.col("__v") - F.lit(float(width))).alias("__key"),
        F.lit(0).alias("__flag"),
        F.col("__v").alias("__origin"),
        *[z.alias(f"__w_{n}") for z, n in zip(zeros, names)],
    )
    u0 = data.unionByName(probes).withColumn(
        "__bkt", F.floor(F.col("__key") / F.lit(bw)).cast("long")
    )
    # level 1: cumulative within (partition, bucket); probes (flag 0)
    # sort before data (flag 1) on equal keys -> strictly-less prefix
    wloc = (
        Window.partitionBy(*part_cols, "__bkt")
        .orderBy("__key", "__flag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u0.select(
        "*", *[F.sum(f"__w_{n}").over(wloc).alias(f"__loc_{n}") for n in names]
    )
    # level 2: per-bucket totals -> running offset of all lower buckets
    # (#buckets rows per partition group — broadcast back). Grouped over
    # EVERY bucket in the union: a probe-only bucket has a null total
    # (sum skips it in the running offset) but still needs its own
    # offset row, else the join below would zero out its lower buckets.
    wb = (
        Window.partitionBy(*part_cols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = (
        u0.groupBy(*part_cols, "__bkt")
        .agg(*[F.sum(f"__w_{n}").alias(f"__bt_{n}") for n in names])
        .select(
            *part_cols,
            "__bkt",
            *[F.sum(f"__bt_{n}").over(wb).alias(f"__off_{n}") for n in names],
        )
    )
    u = u.join(F.broadcast(boff), [*part_cols, "__bkt"], "left")
    u = u.select(
        "*",
        *[
            (
                F.coalesce(F.col(f"__loc_{n}"), F.lit(0))
                + F.coalesce(F.col(f"__off_{n}"), F.lit(0))
            ).alias(f"__cum_{n}")
            for n in names
        ],
    )
    d_cum = u.filter(F.col("__flag") == 1).select(
        *part_cols,
        "__origin",
        *[F.col(f"__cum_{n}") for n in names],
    )
    p_cum = u.filter(F.col("__flag") == 0).select(
        *part_cols,
        "__origin",
        *[F.col(f"__cum_{n}").alias(f"__lo_{n}") for n in names],
    )
    return d_cum.join(p_cum, [*part_cols, "__origin"]).select(
        *part_cols,
        F.col("__origin").alias(value_col),
        *[
            (F.col(f"__cum_{n}") - F.col(f"__lo_{n}")).alias(n)
            for n in names
        ],
    )
