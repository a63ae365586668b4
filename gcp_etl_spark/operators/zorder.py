"""Z-order (Morton curve) layout — multi-column data clustering.

Parquet pruning works off per-file/rowgroup min-max stats; sorting by
one column clusters only that column. Interleaving the bits of two
key columns gives a space-filling curve whose sort clusters BOTH
dimensions, so selective filters on either column skip most files —
the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, built here
from plain shift/and/or expressions + repartitionByRange.

All JVM-side integer arithmetic (no UDF); the identical expression is
emitted as SQL for the DuckDB oracle by ``zvalue_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    bit i of c1 lands at 2i+1, bit i of c2 at 2i."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        b1 = F.shiftrightunsigned(c1.cast("long"), i).bitwiseAND(F.lit(1))
        b2 = F.shiftrightunsigned(c2.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(b1, 2 * i + 1)).bitwiseOR(
            F.shiftleft(b2, 2 * i)
        )
    return z


def zvalue_sql(e1: str, e2: str, bits: int = 16) -> str:
    """The same Morton interleave as ANSI SQL (DuckDB oracle arm)."""
    # each term fully parenthesized: DuckDB gives <<, & and | equal
    # precedence (left-associative), unlike C/Spark
    terms = []
    for i in range(bits):
        terms.append(f"(((({e1}) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((({e2}) >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def zorder_by(
    df: DataFrame,
    c1: Column,
    c2: Column,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Re-layout df along the z-curve of (c1, c2): range-partition on
    the z-value (balanced output files) and sort within partitions so
    parquet rowgroup min-max stats are tight on BOTH columns. A
    subsequent partition-pruned write is what you'd persist.
    ``num_partitions`` pins the output file count (otherwise AQE
    sizes it, which at toy scale coalesces to one)."""
    parts = [num_partitions] if num_partitions else []
    return (
        df.withColumn("__z", zvalue(c1, c2, bits))
        .repartitionByRange(*parts, "__z")
        .sortWithinPartitions("__z")
    )
