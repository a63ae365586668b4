"""Graph-operator parity tests: PageRank vs a numpy power iteration on
the identical edge set, and triangle-count internal consistency."""

from __future__ import annotations

import numpy as np
import pytest

from gcp_etl_spark.queries import graph_ops
from tests.conftest import SF_SMALL


def _numpy_pagerank(edges: list[tuple[int, int]]) -> dict[int, float]:
    """Reference power iteration: same symmetrization, damping, and
    iteration count as graph_ops.graph_pagerank, dense numpy."""
    sym = set()
    for u, v in edges:
        sym.add((u, v))
        sym.add((v, u))
    nodes = sorted({u for u, _ in sym})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for u, _ in sym:
        out_deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    d = graph_ops.DAMPING
    for _ in range(graph_ops.PR_ITERS):
        contrib = np.zeros(n)
        for u, v in sym:
            contrib[idx[v]] += r[idx[u]] / out_deg[idx[u]]
        r = (1.0 - d) / n + d * contrib
    return {node: r[i] for node, i in idx.items()}


@pytest.fixture(scope="module")
def edge_list(spark):
    rows = graph_ops._edges(spark, SF_SMALL).collect()
    return [(r["u"], r["v"]) for r in rows]


def test_pagerank_matches_numpy(spark, edge_list):
    got = {
        r["node"]: r["rank"]
        for r in graph_ops.graph_pagerank(spark, SF_SMALL).collect()
    }
    want = _numpy_pagerank(edge_list)
    assert len(got) == 20
    top20 = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    for node, rank in top20:
        assert node in got, f"node {node} missing from Spark top-20"
        assert got[node] == pytest.approx(rank, abs=2e-6)


def test_triangle_count_consistent(spark, duck, edge_list):
    row = graph_ops.graph_triangle_count(spark, SF_SMALL).collect()[0]
    # independent recount in pure python on the same canonical edges
    eset = set(edge_list)
    adj: dict[int, set[int]] = {}
    for u, v in eset:
        adj.setdefault(u, set()).add(v)
    tris = sum(
        1
        for (u, v) in eset
        for w in adj.get(v, ())
        if (u, w) in eset
    )
    assert row["n_edges"] == len(eset)
    assert row["n_triangles"] == tris
