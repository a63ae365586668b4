"""Deterministic broadcast Bloom filter for membership prefiltering.

Spark's runtime bloom join builds exactly this structure internally
(BloomFilterAggregate) but does not expose it to SQL/PySpark, and the
driver-side ``DataFrame.stat.bloomFilter`` object cannot be shipped to
executors from Python. This module is the public-algebra equivalent:

- positions come from k independent xxHash64 hashes (seeded by a
  literal index prefix on the value), so the filter is DETERMINISTIC
  and reproducible in any engine with an xxHash implementation;
- the bit array builds DISTRIBUTED (distinct bit positions collected —
  bounded by m bits; an RDD OR-aggregate is the drop-in for filters
  too big to collect positions for) and broadcasts as a numpy bool
  array (~m/8 bytes packed, m bools here for simplicity);
- probing computes the same k positions JVM-side and tests them in
  one vectorized Arrow-batched lookup.

No false negatives by construction, so callers that EXACT-verify the
survivors (the decontamination pattern: bloom prefilter → exact join)
return exactly the exact-join result while shipping a fixed-size
filter instead of the full membership set.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m bits, k hashes) for the target false-positive rate."""
    n = max(1, n_items)
    m = max(8, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _position_cols(col, m: int, k: int):
    """k independent positions: xxHash64 of 'i:value' (the public
    xxHash algorithm, seed 42 — deterministic and replayable in any
    engine with an xxHash implementation), pmod m. r13: was
    md5-via-hex-conv (~1-2 µs/hash interpreted); xxhash64 is a
    codegen'd native expression, and since the filter is internal
    machinery behind an EXACT verification join, the hash family is
    not observable in any query result — build and probe share this
    one definition."""
    return [
        F.pmod(
            F.xxhash64(F.concat(F.lit(f"{i}:"), col)), F.lit(m)
        ).cast("long")
        for i in range(k)
    ]


def build_bloom(
    df: DataFrame, col: str, m: int, k: int, distributed: bool | None = None
) -> np.ndarray:
    """Build the filter; returns a numpy bool[m].

    Two builds, same result (equality pytest-pinned):
    - position-collect (default below ~4M bits): explode every
      member's k positions, distinct (bounded by m rows), collect,
      set bits — all hashing stays JVM-side;
    - ``distributed=True`` (auto above ~4M bits — the r7 verdict's
      "wire it when a caller builds from the large side"): a
      treeAggregate of PACKED per-partition bit arrays (m/8 bytes
      each), OR-merged up the tree — the driver receives one m/8-byte
      array total instead of up-to-m position rows, so filter size,
      not membership cardinality, bounds every transfer."""
    if distributed is None:
        distributed = m > (1 << 22)
    if not distributed:
        # Arrow transfer (guide §6): the position list is up-to-m rows
        # (~110k at the decontamination query's eval-set size); the old
        # row-collect deserialized them one py4j Row at a time
        # (~0.7 s), toPandas moves one Arrow batch
        pos = (
            df.select(
                F.explode(
                    F.array(*_position_cols(F.col(col), m, k))
                ).alias("p")
            )
            .distinct()
            .toPandas()
        )
        bits = np.zeros(m, dtype=bool)
        bits[pos["p"].to_numpy(np.int64)] = True
        return bits

    n_bytes = (m + 7) // 8

    def seq(acc: np.ndarray, row) -> np.ndarray:
        for p in row["ps"]:
            acc[p >> 3] |= 1 << (p & 7)
        return acc

    packed = (
        df.select(F.array(*_position_cols(F.col(col), m, k)).alias("ps"))
        .rdd.treeAggregate(
            np.zeros(n_bytes, dtype=np.uint8), seq, np.bitwise_or
        )
    )
    return np.unpackbits(packed, count=m, bitorder="little").astype(bool)


def might_contain_udf(bits: np.ndarray, k: int):
    """Column function: True when all k positions are set (possible
    member — no false negatives). The bit array rides the UDF closure
    (broadcast-shaped, like the IVF centroid matrix).

    r13 (guide §4.2): the k hash positions are computed JVM-side with
    the SAME ``_position_cols`` expressions the builder uses (codegen'd
    hashing over identical "i:value" text, so positions are identical by
    construction), and only the k-int position array crosses to
    Python, where the membership test is one vectorized
    ``bits[P].all(axis=1)`` per batch. The old form re-hashed every
    value row-at-a-time with hashlib inside the UDF loop — measured
    2.1 s for a 238k-gram probe pass vs ~0.4 s now, same survivors."""
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    m = len(bits)

    @pandas_udf("boolean")
    def probe_positions(pos):  # (pd.Series of int list) -> pd.Series
        if not len(pos):
            return pd.Series(np.zeros(0, dtype=bool))
        P = np.asarray([np.asarray(p, dtype=np.int64) for p in pos])
        return pd.Series(bits[P].all(axis=1))

    def probe(col):
        return probe_positions(F.array(*_position_cols(col, m, k)))

    return probe
