"""Skew-aware join: key salting.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime by splitting oversized sort-merge partitions. Salting is the
explicit fallback for the pathological case AQE can't fix — a single
join key so hot that even a split partition's build side is one task:

  left (skewed fact):  salt = hash(row) % S  → key becomes (k, salt)
  right (dim):         replicated S× → (k, 0..S-1)

The hot key's rows then spread over S tasks. Cost: right side is
written S times into the shuffle — use only for genuinely hot keys
(detect first, salt selectively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys (semantics identical to
    ``left.join(right, on, how)`` for inner/left joins).

    The left salt is derived from xxhash64 of the whole left row —
    deterministic, uniform, no rand(). The right side is exploded
    ``salt`` ways.
    """
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("__salt", salt_col.cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, on + ["__salt"], how)
    return out.drop("__salt")
