"""Round-7 additions: two-phase connected components, batched BPE
training, ANN-shortlisted bitext mining, streaming ANN probe."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


# ------------------------------------------------------ two-phase CC


def _labels(df):
    return sorted(map(tuple, df.collect()))


def test_two_phase_equals_minlabel_on_mixed_graph(spark):
    """Kiveris two-phase must produce EXACTLY the min-label labeling
    (comp = min reachable id) on a mixed fixture: chains, a clique, a
    star, singleton-self-loop, disconnected islands."""
    from gcp_etl_spark.llm.cluster import connected_components

    edges = [(1, 2), (2, 3), (3, 5), (5, 4), (10, 11), (11, 12),
             (20, 20), (30, 31), (30, 32), (30, 33), (31, 32),
             (40, 41), (41, 42), (42, 40)]
    e = spark.createDataFrame(edges, "src long, dst long")
    ml = _labels(connected_components(e, small_graph_edges=0,
                                      algorithm="min-label"))
    tp_stats: dict = {}
    tp = _labels(connected_components(e, algorithm="two-phase",
                                      stats=tp_stats))
    assert ml == tp
    assert tp_stats["algorithm"] == "two-phase"
    # and both equal the driver union-find fast path
    assert ml == _labels(connected_components(e))


def test_two_phase_random_graph_equals_minlabel(spark):
    """Randomized cross-check (seeded): 300 nodes, 350 random edges."""
    from gcp_etl_spark.llm.cluster import connected_components

    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(350)]
    e = spark.createDataFrame(edges, "src long, dst long")
    ml = _labels(connected_components(e, small_graph_edges=0,
                                      algorithm="min-label"))
    tp = _labels(connected_components(e, algorithm="two-phase"))
    assert ml == tp


def test_two_phase_chain_converges_in_log_rounds(spark):
    """The adversarial case the algorithm exists for: a diameter-255
    path graph. Min-label needs O(diameter) rounds (255 > its default
    max_iter); two-phase must label the whole chain to node 0 within
    O(log n) rounds."""
    from gcp_etl_spark.llm.cluster import connected_components

    n = 256
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    stats: dict = {}
    out = connected_components(e, algorithm="two-phase", stats=stats)
    rows = out.collect()
    assert len(rows) == n
    assert all(r["comp"] == 0 for r in rows)
    assert stats["rounds"] <= 12, (
        f"expected O(log n) rounds on a chain, got {stats['rounds']}"
    )
