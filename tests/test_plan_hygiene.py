"""Corpus-wide physical-plan hygiene: every declared query's plan is
built and screened for the anti-patterns that kill 100 TB runs.

- ``CartesianProduct`` (non-broadcast cross product): allowed only for
  queries that DECLARE a cross join.
- ``BatchEvalPython`` (row-at-a-time Python UDF): allowed only for the
  documented API-parity demo / Python UDTF queries — everything else
  must stay JVM-side or Arrow-batched (``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas`` are fine).
- exact ``percentile``/``median`` AGGREGATES: their final merge builds
  a value->count map of every distinct input value on ONE reducer
  (measured: 9.2 s over 2.9M distinct doubles) — allowed only where
  the input's distinct-value count is structurally bounded (calendar
  days, a bounded integer domain, per-entity groups); everything else
  must use ``operators.exact_quantiles`` (two-pass range-partitioned
  rank) or ``approx_percentile`` with a declared tolerance.

Building a plan is cheap (no execution) except for the iterative
queries, which run their loops eagerly — they are exempted here and
covered by their own tests/oracles.
"""

from __future__ import annotations

import contextlib
import io as _io
import re

from gcp_etl_spark.queries import load_all
from tests.conftest import SF_SMALL

# queries whose BUILD executes jobs (iterative localCheckpoint loops,
# pipeline side effects) — plan hygiene for these is asserted by their
# dedicated tests; skipping keeps this sweep cheap
_EAGER_BUILD = {
    "dedup_clusters",
    "dedup_cluster_exact",
    "dedup_semantic",  # connected-components loop (localCheckpoint)
    "graph_pagerank",
    "ref_pipeline_e2e",
    "catalog_insert_overwrite",
    "join_bucketed_smb",
    "ann_cosine_topk_ivf",  # KMeans fit on a bounded sample at build
    "embedding_pca_project",  # driver-side eigensolve on bounded cov at build
    # r6 iterative trainers: GD / merge-learning loops run eagerly at
    # build (bounded driver state); pinned by tests/test_r6.py
    "train_quality_logreg",
    "quality_calibration_bins",
    "bpe_train_merges",
    "ann_ivf_pq_rerank",  # IVF/PQ quantizer fits on bounded samples
    "ann_ivf_partitioned_probe",  # index write + quantizer fit at build
}

# declared cross joins — CartesianProduct is the point
_CROSS_OK = {"join_cross"}

# matches the exact percentile/median aggregates in formatted plans but
# NOT percentile_approx/approx_percentile/percentile_disc
_EXACT_PCT = re.compile(r"(?<![\w.])(?:percentile|median)\(")

# the deliberate row-at-a-time anti-pattern demo and Python UDTFs
_PY_ROW_OK = {
    "udf_python_row",
    "udtf_split_sentences",
    # declared-API demo of the Spark 4 polymorphic (analyze()) UDTF —
    # row-Python by the API's nature, same policy as its siblings
    "udtf_polymorphic_analyze",
}

# exact percentile/median aggregates whose input distinct-value count
# is STRUCTURALLY bounded — the single-reducer value map stays small at
# any corpus size. Every other query must use operators.exact_quantiles
# (r4 verdict ask #1).
_EXACT_PCT_OK = {
    # calendar-bounded inputs (distinct values = days of history)
    "analytics_theil_sen",    # intercept median over the daily relation
    "analytics_runs_test",    # median of daily sums
    "dq_value_drift_psi",     # median-DATE split (decile edges use exact_quantiles)
    "part_brand_share_shift", # median-shipdate split
    # bounded integer domain (l_quantity ∈ 1..50 — ≤50 map entries/group)
    "agg_median",
    # per-entity groups: unbounded GROUP count, bounded values PER group
    # (each customer's own order gaps) — percentile is the right tool here
    "orders_reorder_interval",
    "customers_overdue_alert",
}


def test_no_cartesian_or_python_row_in_declared_plans(spark):
    # pin the 100 TB-regime plans: exact_quantiles' adaptive gate would
    # pick the percentile AGGREGATE at this fixture scale (correctly —
    # the inputs are tiny), but this sweep exists to screen the plans
    # the same queries produce when the gate says "unbounded", so force
    # the rank path module-wide for the build
    import gcp_etl_spark.operators.quantiles as Q

    specs = load_all()
    offenders: list[str] = []
    old_force = Q.FORCE_STRATEGY
    Q.FORCE_STRATEGY = "rank"
    try:
        _sweep(spark, specs, offenders)
    finally:
        Q.FORCE_STRATEGY = old_force
    assert not offenders, "\n".join(offenders)


def _sweep(spark, specs, offenders):
    for name, spec in sorted(specs.items()):
        if name in _EAGER_BUILD:
            continue
        try:
            df = spec.fn(spark, SF_SMALL)
            buf = _io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            offenders.append(f"{name}: plan build failed: {exc}")
            continue
        if "CartesianProduct" in plan and name not in _CROSS_OK:
            offenders.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan and name not in _PY_ROW_OK:
            offenders.append(f"{name}: row-at-a-time BatchEvalPython")
        if (
            _EXACT_PCT.search(plan)
            and name not in _EXACT_PCT_OK
        ):
            offenders.append(
                f"{name}: exact percentile/median aggregate over a "
                "relation not declared cardinality-bounded — use "
                "operators.exact_quantiles"
            )
