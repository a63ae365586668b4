"""Round-10 pins (r9 verdict asks #7 and the new operators): value
gates for queries that were previously rows-only, and step-for-step
reference checks for the round-10 operators — each independent of the
DuckDB oracles, recomputing the claimed definition in NumPy/pure
Python from the raw fixture parquet."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL


def _run(spark, name):
    from gcp_etl_spark.queries import load_all

    return load_all()[name].fn(spark, SF_SMALL)


def test_approx_distinct_within_hll_tolerance(spark):
    """r9 ask #7: agg_approx_distinct was rows-only (approximate, so
    no value hash can match DuckDB's different HLL implementation) —
    but the estimate is still VALUE-GATEABLE against the exact
    distinct count: Spark's approx_count_distinct default rsd is 0.05,
    so a 3-sigma band of 15% is a sound, non-vacuous gate (the HLL
    sketch family already carries a 2% gate at its tuned precision)."""
    exact = (
        pd.read_parquet(
            f"{SF_SMALL}/lineitem.parquet",
            columns=["l_partkey", "l_orderkey"],
        )
        .nunique()
        .to_dict()
    )
    row = _run(spark, "agg_approx_distinct").collect()[0]
    for col, key in (
        ("approx_parts", "l_partkey"),
        ("approx_orders", "l_orderkey"),
    ):
        rel = abs(row[col] - exact[key]) / exact[key]
        assert rel <= 0.15, (col, row[col], exact[key], rel)


def test_pca_eigenvalue_spectrum_matches_numpy(spark):
    """r9 ask #7: embedding_pca_project's geometry pytest checked
    monotone/decorrelated variances but never pinned the SPECTRUM.
    This recomputes the full-corpus covariance eigenvalues in NumPy
    (deterministic fixture — no seed needed) and asserts the query's
    per-component projection variances equal the top eigenvalues,
    which is the defining property of PCA (var along the i-th
    principal axis == i-th eigenvalue)."""
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    M = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in emb["embedding"]]
    )
    evals = np.linalg.eigvalsh(np.cov(M.T))[::-1]  # descending
    rows = (
        _run(spark, "embedding_pca_project")
        .select("pc1", "pc2", "pc3", "pc4")
        .collect()
    )
    P = np.asarray([[r[0], r[1], r[2], r[3]] for r in rows])
    got = np.var(P, axis=0, ddof=1)
    for i in range(4):
        assert math.isclose(got[i], evals[i], rel_tol=1e-4), (
            i,
            got[i],
            evals[i],
        )
    # the projection must capture the top-4 share of total variance
    total = np.var(M, axis=0, ddof=1).sum()
    assert math.isclose(got.sum() / total, evals[:4].sum() / total, rel_tol=1e-4)
