"""Lineage barrier with a deployment-level durability switch.

Every intra-query barrier in the engine routes through :func:`barrier`
(r12 verdict ask #4). The barrier exists to stop Catalyst re-expanding
a shared subtree into each of its consumers (guide §1.2/§3: one plan
with 306 Exchanges / 62 parquet scans was measured before the
bradley_terry barrier landed) and to truncate iterative lineage
(guide §5) — it is a *performance* device, not a persistence one.

Durability modes (``SPARK_GRAFT_BARRIER``):

- ``local`` (default): ``DataFrame.localCheckpoint``. Blocks are
  executor-local and NON-REPLICATED — on a real cluster a lost
  executor makes the RDD unrecoverable mid-query and the query (not
  just the stage) must be resubmitted. That trade is correct for the
  bench (single-node, no executor loss) and for short intra-query
  intermediates, but a 100 TB deployment that cannot afford query
  resubmission should flip the switch.
- ``reliable``: ``DataFrame.checkpoint`` to the configured checkpoint
  directory (``SPARK_GRAFT_CHECKPOINT_DIR``, or a directory already
  set via ``SparkContext.setCheckpointDir``) — survives executor loss
  at the cost of one write+read through the checkpoint store.

Both modes return a DataFrame whose logical plan is a scan of the
checkpointed RDD. Two consequences every call site must respect:

1. **Catalyst stats die at the barrier.** A checkpointed RDD carries
   no size estimate, so any stats-driven decision (broadcast-vs-SMJ,
   agg-vs-rank quantile strategy) must be made on the PLANNED relation
   *before* the barrier is applied — the dq_value_drift_psi pattern
   (queries/stats_ops.py), learned twice in r12 (a stats-free barrier
   flipped dedup_cluster_twophase's broadcast join to SortMergeJoin).
   ``tests/test_plan_hygiene.py`` pins the gate-before-barrier order.
2. **lazy (eager=False) barriers materialize on first action.** The
   block is computed once and reused by every consumer of the same
   physical plan; all barriers here are intra-query (the bench
   unpersists all RDDs between queries, so nothing accumulates).

Call sites use ``df.transform(barrier)`` (lazy, the common case) or
``df.transform(barrier, eager=True)`` so the barrier stays in chained
method position; in ``local`` mode the produced plan is byte-identical
to the previous direct ``localCheckpoint`` calls (plan-fingerprint
suite unchanged).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def barrier(df: DataFrame, eager: bool = False) -> DataFrame:
    """Cut lineage / stop subtree re-expansion; see module docstring.

    ``eager=False`` (default) defers materialization to the first
    action, which then populates the block for every other consumer.
    """
    mode = os.environ.get("SPARK_GRAFT_BARRIER", "local")
    if mode == "reliable":
        ckdir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
        sc = df.sparkSession.sparkContext
        if ckdir and sc.getCheckpointDir() is None:
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
