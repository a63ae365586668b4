"""Scale-safe EXACT quantiles: two-pass range-partitioned global rank.

Spark's exact ``percentile`` aggregate final-merges a value->count map
of every distinct input value on ONE reducer — measured at 9.2 s over
just 2.9M distinct doubles (see ``analytics_theil_sen``), a guaranteed
single-node OOM at 10^9+ distinct values. This module is the engine's
standard replacement, factored from the pattern proven inline in
Theil-Sen / Mann-Whitney / ``global_row_number_twopass``:

1. range-exchange on (group..., value) — sampled, balanced, parallel;
2. ``row_number`` inside each physical partition (parallel local sort);
3. per-partition counts -> broadcast prefix offsets (a #partitions-row
   relation) -> globally contiguous ranks;
4. the target order statistics are picked by RANK EQUALITY against a
   broadcast (#groups x #quantiles x 2)-row threshold relation, and
   linearly interpolated (``quantile_cont`` semantics, identical to
   DuckDB and to Spark's ``percentile``).

No single task ever holds more than its range slice; driver state is
bounded by #partitions x #groups. Intended regime: BOUNDED group count
(segments, event types, sources — or no groups) with UNBOUNDED values
per group. For the inverse regime (unbounded groups, bounded per-group
values — e.g. per-customer medians) the plain ``percentile`` aggregate
is already scale-safe and preferred.

No reference counterpart (the reference computes no quantiles); this
is the 100 TB path mandated by the round-4 verdict for the seven
exact-percentile-over-unbounded-values call sites.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    part_cols: Sequence[str] = (),
    n_parts: int = 32,
    rn_col: str = "rn",
) -> DataFrame:
    """Globally contiguous 1-based row numbers over a total order
    WITHOUT a single-partition window (the zipWithIndex algebra in
    DataFrames). ``part_cols`` (optional, bounded cardinality) gives
    independent numbering per group.

    Correctness holds for ANY contiguous range split: the range
    exchange sorts lexicographically on (part_cols..., order_cols...),
    so each group's rows appear in global order across ascending
    partition ids; in-partition row_number + per-(group, partition)
    prefix offsets equals the global rank.
    """
    pc, oc = list(part_cols), list(order_cols)
    parts = df.repartitionByRange(n_parts, *pc, *oc).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = parts.withColumn(
        "__lrn",
        F.row_number().over(Window.partitionBy(*pc, "__pid").orderBy(*oc)),
    )
    counts = local.groupBy(*pc, "__pid").agg(F.count("*").alias("__n"))
    # bounded relation: #groups x #partitions rows — the tiny-window
    # prefix sum here is the documented-benign case
    prior = (
        Window.partitionBy(*pc)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    offs = counts.select(
        *pc,
        "__pid",
        F.coalesce(F.sum("__n").over(prior), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offs), [*pc, "__pid"])
        .withColumn(rn_col, F.col("__lrn") + F.col("__off"))
        .drop("__pid", "__lrn", "__off")
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str | Column,
    probs: Mapping[str, float],
    group_cols: Sequence[str] = (),
    n_parts: int = 32,
) -> DataFrame:
    """Exact interpolated quantiles (``quantile_cont`` semantics —
    matches DuckDB and Spark ``percentile`` bit-for-bit up to the
    interpolation ulp) computed via the two-pass global rank, never a
    single-reducer value map.

    ``probs`` maps output column name -> probability. Returns one row
    per group (a single row when ``group_cols`` is empty) with columns
    ``(*group_cols, *probs.keys())``, each quantile a double. NULL
    values are excluded (same as the ``percentile`` aggregate); groups
    with no non-null values produce no row.
    """
    gcols = list(group_cols)
    items = sorted(probs.items(), key=lambda kv: kv[1])
    vals = df.select(
        *gcols,
        (F.col(value_col) if isinstance(value_col, str) else value_col)
        .cast("double")
        .alias("__v"),
    ).filter(F.col("__v").isNotNull())

    ranked = global_row_number(
        vals, order_cols=["__v"], part_cols=gcols, n_parts=n_parts,
        rn_col="__rn",
    )
    ns = ranked.groupBy(*gcols).agg(F.count("*").alias("__N"))

    spark = df.sparkSession
    probs_df = spark.createDataFrame(
        [(name, float(p)) for name, p in items], "__qname string, __p double"
    )
    # quantile_cont: h = (N-1)p (0-based); lerp between ranks
    # floor(h)+1 and min(floor(h)+2, N)
    h = (F.col("__N") - 1) * F.col("__p")
    need = ns.crossJoin(F.broadcast(probs_df)).select(
        *gcols,
        "__qname",
        (h - F.floor(h)).alias("__frac"),
        F.floor(h).cast("long").alias("__lo0"),
        F.col("__N"),
    )
    # two lookup rows per (group, prob): the lower and upper order
    # statistics, matched by pure rank EQUALITY (equi-join, broadcast)
    need_long = need.select(
        *gcols,
        "__qname",
        "__frac",
        F.explode(
            F.array(
                F.struct(
                    F.lit("lo").alias("__role"),
                    (F.col("__lo0") + 1).alias("__rn"),
                ),
                F.struct(
                    F.lit("hi").alias("__role"),
                    F.least(F.col("__lo0") + 2, F.col("__N")).alias("__rn"),
                ),
            )
        ).alias("__e"),
    ).select(*gcols, "__qname", "__frac", "__e.__role", "__e.__rn")

    j = ranked.join(F.broadcast(need_long), [*gcols, "__rn"])
    picked = j.groupBy(*gcols, "__qname", "__frac").agg(
        F.min(F.when(F.col("__role") == "lo", F.col("__v"))).alias("__vlo"),
        F.min(F.when(F.col("__role") == "hi", F.col("__v"))).alias("__vhi"),
    )
    q = F.when(F.col("__frac") == 0, F.col("__vlo")).otherwise(
        F.col("__vlo") + F.col("__frac") * (F.col("__vhi") - F.col("__vlo"))
    )
    long = picked.select(*gcols, "__qname", q.alias("__q"))
    return long.groupBy(*gcols).agg(
        *[
            F.min(F.when(F.col("__qname") == name, F.col("__q"))).alias(name)
            for name, _ in items
        ]
    )
