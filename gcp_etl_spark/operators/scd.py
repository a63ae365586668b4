"""SCD2 / CDC merge — MERGE INTO emulated with stock DataFrame ops.

Spark without Delta/Iceberg (neither jar is in this container, and the
reference pins plain parquet zones) has no transactional MERGE. The
classic emulation (guide: "CDC / SCD2 → anti-join + union + window"):

  1. close current rows whose business key arrives in the batch
     (set valid_to = batch ts, is_current = false)
  2. append the batch rows as new current versions
  3. leave everything else untouched

The whole merge is one broadcast-able join against the (small) change
batch + a union — no shuffle of the untouched majority beyond the
join itself; at 100 TB the dimension table is partitioned by business
key so the join prunes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31 23:59:59"


def scd2_init(snapshot: DataFrame, key: str, ts: Column) -> DataFrame:
    """Bootstrap an SCD2 dimension from a plain snapshot."""
    return snapshot.select(
        "*",
        ts.cast("timestamp_ntz").alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp_ntz").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(dim: DataFrame, batch: DataFrame, key: str, batch_ts: Column) -> DataFrame:
    """Apply a change batch to an SCD2 dimension (upsert semantics:
    every batch row opens a new version; matching current versions are
    closed). ``batch`` carries the same business columns as the
    original snapshot; ``dim`` is a prior scd2_init/scd2_merge output.
    """
    batch_keys = batch.select(F.col(key).alias("__bk")).distinct()
    closed = (
        dim.join(F.broadcast(batch_keys), dim[key] == F.col("__bk"), "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("__bk").isNotNull() & F.col("is_current"),
                batch_ts.cast("timestamp_ntz"),
            ).otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current",
            F.when(F.col("__bk").isNotNull(), F.lit(False)).otherwise(
                F.col("is_current")
            ),
        )
        .drop("__bk")
    )
    opened = batch.select(
        "*",
        batch_ts.cast("timestamp_ntz").alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp_ntz").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(opened)
