"""Streaming top-k ANN serving over a persisted partitioned IVF index.

The batch side (``queries/r6_ops.py::ann_ivf_partitioned_probe``)
writes the assigned corpus ``partitionBy(centroid_id)`` and probes it
with static partition pruning. This module is its STREAMING dual (r6
verdict ask #7): micro-batches of query vectors arrive, each batch
probes ONLY the inverted-list directories its queries hash to, and the
per-query top-k results accumulate in an epoch-partitioned store —
replay-idempotent exactly like the dedup/curation sinks (a replayed
epoch overwrites its own directory).

Scale: per micro-batch cost is |batch| x (nprobe/n_centroids of the
index); the probe list is |centroids|-bounded; queries broadcast into
the pruned scan. Index bytes outside the probed cells never leave disk
— per micro-batch, asserted in tests/test_r7.py by plan inspection
inside the running sink.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcp_etl_spark.llm.ivf import _nearest_centroids
from gcp_etl_spark.llm.similarity import cosine
from gcp_etl_spark.operators.barrier import barrier


def build_partitioned_index(
    emb: DataFrame,
    index_dir: str,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Fit the coarse quantizer, write the assigned corpus
    ``partitionBy(centroid_id)``, read it back. Returns (idx, centers).
    Shared by the batch probe queries and the streaming sink setup so
    the serving layout is built one way everywhere."""
    from gcp_etl_spark.llm.ivf import ivf_assign

    assigned, centers = ivf_assign(emb, id_col, vec_col, n_centroids)
    assigned.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).cast("array<double>").alias("n_vec"),
        "centroid_id",
    ).write.partitionBy("centroid_id").mode("overwrite").parquet(index_dir)
    return emb.sparkSession.read.parquet(index_dir), centers


def probe_relation(
    emb: DataFrame,
    centers,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q_id, q_vec, centroid_id) with one row per probed cell."""
    return emb.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn(
        "centroid_id",
        F.explode(_nearest_centroids(F.col("q_vec"), centers, nprobe)),
    )


def prune_index(idx: DataFrame, q: DataFrame) -> DataFrame:
    """Statically prune the partitioned index to the cells ``q``
    probes: the |centroids|-bounded probe list collects to a literal
    IN-list the parquet scan prunes partition directories with."""
    probes = sorted(
        r["centroid_id"]
        for r in q.select("centroid_id").distinct().collect()
    )
    if not probes:  # empty query set: prune everything
        return idx.filter(F.lit(False))
    return idx.filter(F.col("centroid_id").isin(probes))


def probe_topk(
    idx: DataFrame, q: DataFrame, k: int = 5
) -> DataFrame:
    """Top-k cosine over a (centroid-bounded) candidate relation:
    ``idx`` columns (n_id, n_vec, centroid_id), ``q`` columns
    (q_id, q_vec, centroid_id) — shared by the batch query and the
    streaming sink so both sides score identically."""
    cand = idx.join(F.broadcast(q), "centroid_id").filter(
        F.col("q_id") != F.col("n_id")
    )
    scored = cand.withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", F.round("cos", 4).alias("cos"), "rn")
    )


def ann_probe_sink(
    index_dir: str,
    centers: np.ndarray,
    store_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    plan_probe: list | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function. Results accumulate in
    ``<store_dir>/epoch=<id>`` as (q_id, n_id, cos, rn); read them
    back with ``read_results``. ``plan_probe`` (tests only) receives
    each micro-batch's executed-plan string."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # tiny; the checkpoint freezes the probe set for the epoch
        q = probe_relation(
            batch_df, centers, nprobe, id_col, vec_col
        ).transform(barrier, eager=True)
        if q.limit(1).count() == 0:
            return
        # prune_index: |centroids|-bounded collect -> literal IN-list
        # -> static partition pruning at the parquet scan, per batch
        idx = prune_index(spark.read.parquet(index_dir), q)
        out = probe_topk(idx, q, k)
        if plan_probe is not None:
            plan_probe.append(out._jdf.queryExecution().executedPlan().toString())
        # idempotent per-epoch partition: a replayed epoch overwrites
        # its own directory (same contract as the dedup sink)
        out.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"epoch={epoch_id}")
        )

    return sink


def read_results(spark, store_dir: str) -> DataFrame:
    """All probe results emitted so far: (q_id, n_id, cos, rn)."""
    return spark.read.parquet(store_dir).drop("epoch")
