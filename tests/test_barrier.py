"""Barrier-helper contract (r12 verdict ask #4).

Pins the three properties the centralized lineage barrier
(``operators/barrier.py``) must keep:

1. default (``local``) mode produces the exact localCheckpoint plan the
   fingerprint suite was recorded against;
2. ``reliable`` mode routes through ``DataFrame.checkpoint`` into the
   configured checkpoint directory and computes identical results —
   the one-line switch a cluster deployment flips so an executor loss
   cannot kill a query mid-flight;
3. stats-driven strategy gates fire BEFORE the barrier (the
   dq_value_drift_psi pattern): a checkpointed RDD carries no Catalyst
   size estimate, so deciding after the barrier would freeze the
   local-mode choice into every scale (the r12
   dedup_cluster_twophase lesson — a stats-free barrier flipped a
   broadcast join to SortMergeJoin).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gcp_etl_spark.operators import barrier as barrier_mod
from gcp_etl_spark.operators import quantiles as quantiles_mod
from gcp_etl_spark.operators.barrier import barrier

SF_SMALL = "/root/testdata/sf0.001"


def test_local_mode_is_plan_identical_to_localcheckpoint(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    via_helper = df.transform(barrier)
    direct = df.localCheckpoint(eager=False)
    # both are lazy scans of a checkpoint-tagged logical plan; the
    # simpleString differs only in the RDD identity, so compare the
    # node classes of the analyzed plans
    cls_h = via_helper._jdf.queryExecution().analyzed().getClass().getName()
    cls_d = direct._jdf.queryExecution().analyzed().getClass().getName()
    assert cls_h == cls_d
    assert via_helper.collect() == direct.collect()


def test_reliable_mode_checkpoints_and_matches(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BARRIER", "reliable")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path))
    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    agg = df.groupBy("v").count().transform(barrier, eager=True)
    got = {(r["v"], r["count"]) for r in agg.collect()}
    assert got == {(i, 143 if i < 6 else 142) for i in range(7)}
    # the checkpoint store actually received blocks under tmp_path
    ck_files = [
        p
        for root, _, names in os.walk(tmp_path)
        for p in names
    ]
    assert ck_files, "reliable barrier wrote nothing to the checkpoint dir"


def test_strategy_gate_fires_before_barrier(spark, monkeypatch):
    """dq_value_drift_psi decides its quantile strategy on the PLANNED
    relation, then cuts lineage. Record the call order of
    ``prefer_agg`` (the stats gate) vs ``barrier`` and require the
    gate to fire first — deciding on the post-barrier relation would
    read a stats-free RDD scan and freeze the local-mode answer."""
    from gcp_etl_spark.queries import load_all

    order: list[str] = []
    real_prefer = quantiles_mod.prefer_agg
    real_barrier = barrier_mod.barrier

    def spy_prefer(df, *a, **kw):
        order.append("gate")
        return real_prefer(df, *a, **kw)

    def spy_barrier(df, *a, **kw):
        order.append("barrier")
        return real_barrier(df, *a, **kw)

    monkeypatch.setattr(quantiles_mod, "prefer_agg", spy_prefer)
    # the query modules import ``barrier`` by name at module load, so
    # patch the consuming module's binding, not just the source module
    import gcp_etl_spark.queries.stats_ops as stats_ops

    monkeypatch.setattr(stats_ops, "barrier", spy_barrier)
    load_all()["dq_value_drift_psi"].fn(spark, SF_SMALL)
    assert "gate" in order and "barrier" in order, order
    assert order.index("gate") < order.index("barrier"), order


def test_unknown_mode_falls_back_to_local(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BARRIER", "definitely-not-a-mode")
    df = spark.range(10).transform(barrier)
    assert df.count() == 10


@pytest.fixture(autouse=True)
def _clean_barrier_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BARRIER", raising=False)
