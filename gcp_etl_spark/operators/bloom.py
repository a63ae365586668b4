"""Deterministic broadcast Bloom filter for membership prefiltering.

Spark's runtime bloom join builds exactly this structure internally
(BloomFilterAggregate) but does not expose it to SQL/PySpark, and the
driver-side ``DataFrame.stat.bloomFilter`` object cannot be shipped to
executors from Python. This module is the public-algebra equivalent:

- positions come from k independent md5-derived hashes (seeded by a
  literal index, the engine's standard seeded-hash construction), so
  the filter is DETERMINISTIC and reproducible in any engine;
- the bit array builds DISTRIBUTED (distinct bit positions collected —
  bounded by m bits; an RDD OR-aggregate is the drop-in for filters
  too big to collect positions for) and broadcasts as a numpy bool
  array (~m/8 bytes packed, m bools here for simplicity);
- probing is an Arrow-batched pandas UDF computing the same k md5
  positions per value.

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
    """k independent positions: md5 of 'i:value', first 15 hex digits
    (< 2^60, exact in a long) mod m — replayable in any engine."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), col)), 1, 15),
            16,
            10,
        ).cast("long")
        % m
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
        pos = (
            df.select(
                F.explode(
                    F.array(*_position_cols(F.col(col), m, k))
                ).alias("p")
            )
            .distinct()
            .collect()
        )
        bits = np.zeros(m, dtype=bool)
        bits[[r["p"] for r in pos]] = True
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
    (broadcast-shaped, like the IVF centroid matrix)."""
    import hashlib

    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    m = len(bits)

    @pandas_udf("boolean")
    def probe(col):  # (pd.Series) -> pd.Series
        out = []
        for v in col:
            hit = True
            for i in range(k):
                h = hashlib.md5(f"{i}:{v}".encode()).hexdigest()
                if not bits[int(h[:15], 16) % m]:
                    hit = False
                    break
            out.append(hit)
        return pd.Series(out)

    return probe
