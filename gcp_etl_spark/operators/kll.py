"""Mergeable streaming QUANTILE SKETCH (KLL-style compactor stack,
Karnin-Lang-Liberty 2016, public) — the bounded-memory quantile path
for regimes where even the two-pass exact rank is too expensive: ONE
pass, O(k log(N/k)) space per partition, mergeable by construction
(sketch(A) ∪ sketch(B) compacts to sketch(A ∪ B)'s error class), so
the shape survives any re-partitioning, streaming micro-batches, or a
1000-executor tree merge.

DETERMINISTIC VARIANT: the classical KLL compactor keeps a RANDOM
half of each sorted over-full buffer; this implementation keeps
alternating parities (even indices on one compaction, odd on the
next — the "sweep" derandomization). That trades the probabilistic
guarantee for full reproducibility (same data + same partitioning =>
bit-identical sketch; the driver contract and pytest pins need
determinism), while the alternating offset still cancels the
per-compaction rank bias to first order. The rank-error gate is
pinned EMPIRICALLY in tests/test_r11.py against the exact ranks.

Distribution shape:
  1. ``partition_sketches`` — mapInPandas builds one compactor stack
     per PHYSICAL PARTITION (numpy sorts inside the scan task; raw
     values never shuffle) and emits its surviving (level, value)
     pairs: <= k * levels rows per partition regardless of input size.
  2. The union of partition sketches IS the merged sketch (KLL merge
     = concatenate levels, then compact; compaction only reduces
     size, so deferring it to the estimate step is lossless).
  3. ``quantiles_from_sketch`` — each surviving value carries weight
     2^level; quantile(q) = the value whose weighted CDF crosses q,
     computed with ONE ordered window over the bounded sketch
     relation (#partitions * k * levels rows — data-independent).
At 1000-executor scale the sketch relation is ~1000 * k * levels rows
(a few MB); if even that offends, re-sketch the sketch (the operator
composes with itself) — documented, not needed at fixture scale.

No reference counterpart (the reference computes no quantiles); this
is the sketch-tier companion of operators/quantiles.py's exact path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from gcp_etl_spark.operators.barrier import barrier

_SCHEMA = "level int, v double"


def _compact(buf, parity: int):
    """Sort a buffer, compact the even-length prefix by keeping the
    alternating half (mass-preserving: m items at weight w become m/2
    items at weight 2w), and leave an odd straggler (the max) behind
    at the current level. Returns (kept, leftover, next_parity)."""
    import numpy as np

    arr = np.sort(np.asarray(buf, dtype=np.float64))
    leftover: list[float] = []
    if len(arr) % 2 == 1:
        leftover = [float(arr[-1])]
        arr = arr[:-1]
    return arr[parity::2], leftover, 1 - parity


def _feed(levels, parity, vals, k: int) -> None:
    """Feed one float batch into an existing compactor stack in place
    (``levels``: list per level, ``parity``: alternating-half state per
    level) — the incremental core shared by the batch sketch and the
    per-window streaming sketch (streaming/kll_stream.py)."""
    levels[0].extend(float(x) for x in vals)
    lvl = 0
    while lvl < len(levels) and len(levels[lvl]) > k:
        kept, leftover, parity[lvl] = _compact(levels[lvl], parity[lvl])
        levels[lvl] = leftover
        if lvl + 1 == len(levels):
            levels.append([])
            parity.append(0)
        levels[lvl + 1].extend(kept.tolist())
        lvl += 1


def _sketch_batches(batches, k: int):
    """Feed float batches through a compactor stack; return the final
    levels list (index = level, each a list of floats)."""
    levels: list[list[float]] = [[]]
    parity: list[int] = [0]
    for vals in batches:
        _feed(levels, parity, vals, k)
    return levels


def partition_sketches(
    df: DataFrame, value_col: str, k: int = 256
) -> DataFrame:
    """One KLL compactor stack per physical partition; emits the
    surviving (level, v) rows — <= k * ceil(log2(n_part/k) + 1) rows
    per partition, the ONLY thing that ever leaves the scan task."""

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        levels = _sketch_batches(
            (pdf[value_col].dropna().to_numpy() for pdf in it), k
        )
        out_lv: list[int] = []
        out_v: list[float] = []
        for lv, buf in enumerate(levels):
            out_lv.extend([lv] * len(buf))
            out_v.extend(buf)
        yield pd.DataFrame({"level": out_lv, "v": out_v})

    return df.select(F.col(value_col).alias(value_col)).mapInPandas(
        build, _SCHEMA
    )


def windowed_partition_sketches(
    df: DataFrame, key_col: str, value_col: str, k: int = 256
) -> DataFrame:
    """One KLL compactor stack per (physical partition, key) — the
    keyed sibling of ``partition_sketches`` for windowed monitors:
    raw values still NEVER shuffle (each scan task folds its own rows
    into per-key stacks and emits the survivors), and the union of
    emissions across partitions/micro-batches IS the merged per-key
    sketch. Emits (key, level, v); <= k*levels rows per (partition,
    key). State per task is |keys-in-partition| stacks — bounded by
    the window/watermark policy at streaming scale."""

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stacks: dict = {}
        for pdf in it:
            for key, grp in pdf.groupby(key_col, sort=False):
                vals = grp[value_col].dropna().to_numpy()
                if key not in stacks:
                    stacks[key] = ([[]], [0])
                levels, parity = stacks[key]
                _feed(levels, parity, vals, k)
        out_k: list = []
        out_lv: list[int] = []
        out_v: list[float] = []
        for key, (levels, _p) in stacks.items():
            for lv, buf in enumerate(levels):
                out_k.extend([key] * len(buf))
                out_lv.extend([lv] * len(buf))
                out_v.extend(buf)
        yield pd.DataFrame(
            {key_col: out_k, "level": out_lv, "v": out_v}
        )

    key_field = df.schema[key_col]
    return df.select(key_col, value_col).mapInPandas(
        build,
        f"`{key_col}` {key_field.dataType.simpleString()}, {_SCHEMA}",
    )


def windowed_quantiles_from_sketch(
    sketch: DataFrame, key_col: str, probs: dict[str, float]
) -> DataFrame:
    """Per-key weighted-rank quantile estimates from a keyed (key,
    level, v) sketch relation: one cumulative window PARTITIONED BY
    the key (never single-partition), integer-exact crossing tests
    (probability taken as the exact rational its decimal literal
    denotes; cum*den >= num*W cross-multiplied in longs — the
    window_bucket_quantiles convention), one output row per key with
    a column per requested quantile plus the sketch's total weight."""
    from fractions import Fraction

    from pyspark.sql import Window as W

    w = sketch.select(
        key_col,
        "v",
        F.pow(F.lit(2.0), F.col("level")).cast("long").alias("w"),
    )
    cdf = w.select(
        key_col,
        "v",
        F.sum("w")
        .over(
            W.partitionBy(key_col)
            .orderBy("v")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cw"),
        F.sum("w").over(W.partitionBy(key_col)).alias("W"),
    )
    aggs = [F.max("W").cast("long").alias("weighted_n")]
    for name, p in sorted(probs.items(), key=lambda kv: kv[1]):
        frac = Fraction(str(p))
        aggs.append(
            F.min(
                F.when(
                    F.col("cw") * F.lit(frac.denominator)
                    >= F.lit(frac.numerator) * F.col("W"),
                    F.col("v"),
                )
            ).alias(name)
        )
    return cdf.groupBy(key_col).agg(*aggs)


def quantiles_from_sketch(
    sketch: DataFrame, probs: dict[str, float]
) -> DataFrame:
    """Weighted-rank quantile estimates from the (level, v) relation:
    weight(v) = 2^level; quantile(q) = first value whose inclusive
    weighted CDF reaches q * W. One ordered window over the BOUNDED
    sketch relation (its size is partitions * k * levels — set by the
    sketch parameters, not the data)."""
    from pyspark.sql import Window as W

    w = sketch.select(
        "v", F.pow(F.lit(2.0), F.col("level")).cast("long").alias("w")
    )
    tot = w.agg(F.sum("w").alias("W"))
    # the cumulative window runs UNPARTITIONED over the BOUNDED sketch
    # relation (partitions * k * levels rows — set by the sketch
    # parameters, not the data). Deliberately so: a constant partition
    # key would add a real hash Exchange just to silence a cosmetic
    # WindowExec warning (round-11 regression: exchanges 12 -> 16);
    # the warning is instead filtered at the logging layer in bench /
    # verify / test sessions (session._quiet_benign_warnings).
    cdf = w.select(
        "v",
        F.sum("w")
        .over(
            W.orderBy("v").rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        )
        .alias("cw"),
    )
    spark = sketch.sparkSession
    probs_df = spark.createDataFrame(
        sorted(probs.items(), key=lambda kv: kv[1]),
        "qname string, p double",
    )
    hit = (
        cdf.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(probs_df))
        .filter(F.col("cw") >= F.col("p") * F.col("W"))
        .groupBy("qname")
        .agg(F.min("v").alias("est"))
    )
    return hit


def kll_quantiles(
    df: DataFrame,
    value_col: str,
    probs: dict[str, float],
    k: int = 256,
) -> DataFrame:
    """End-to-end: partition sketches -> union (= merged sketch) ->
    weighted-rank estimates. Returns (qname, est) plus the sketch size
    telemetry columns a capacity planner reads."""
    sk = partition_sketches(df, value_col, k).transform(barrier)  # the size agg and the estimate both read the same sketch
    est = quantiles_from_sketch(sk, probs)
    size = sk.agg(
        F.count("*").cast("long").alias("sketch_rows"),
        F.sum(F.pow(F.lit(2.0), F.col("level")).cast("long"))
        .cast("long")
        .alias("weighted_n"),
    )
    return est.crossJoin(F.broadcast(size))
