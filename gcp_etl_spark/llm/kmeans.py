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


def lloyd(
    X: np.ndarray, k: int, seed: int = 42, iters: int = 15
) -> np.ndarray:
    """Seeded Lloyd iterations; deterministic re-seed of empty
    clusters. Returns centers [k, dim]."""
    n = X.shape[0]
    rs = np.random.RandomState(seed)
    C = X[rs.permutation(n)[:k]].copy()
    for _ in range(iters):
        # squared-L2 assignment: the per-row ||x||^2 term is
        # assignment-invariant and omitted
        dist = -2.0 * (X @ C.T) + (C * C).sum(axis=1)
        a = dist.argmin(axis=1)
        for j in range(k):
            pts = X[a == j]
            if len(pts):
                C[j] = pts.mean(axis=0)
            else:
                C[j] = X[rs.randint(n)]
    return C
