"""Round-5 pinning tests: semantic dedup (recall vs brute force, the
documented contract for its rows-only registration), BPE encode
round-trips, and the exact_quantiles operator's parity with the
``percentile`` aggregate it replaces."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gcp_etl_spark.functions.bpe import (
    DEFAULT_MERGES,
    bpe_encode_word,
    encode_vocab,
)
from gcp_etl_spark.llm.semdedup import semantic_dedup_clusters, semantic_pairs
from gcp_etl_spark.operators.quantiles import exact_quantiles
from gcp_etl_spark.tables import t
from tests.conftest import SF_SMALL

THRESHOLD = 0.35


def _brute_force_pairs(spark):
    """All (id_a < id_b) pairs with cosine >= THRESHOLD — the exact
    O(n^2) oracle, fine at sf0.001 (500 vectors)."""
    rows = (
        t(spark, SF_SMALL, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = U @ U.T
    ia, ib = np.triu_indices(len(ids), k=1)
    keep = C[ia, ib] >= THRESHOLD
    return {(int(ids[a]), int(ids[b])) for a, b in zip(ia[keep], ib[keep])}


def test_semantic_pairs_recall_and_exact_precision(spark):
    exact = _brute_force_pairs(spark)
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_pairs(
            t(spark, SF_SMALL, "embeddings"), threshold=THRESHOLD
        ).collect()
    }
    # precision is EXACT by construction: every candidate is re-scored
    # with true cosine before the threshold filter
    assert got <= exact, f"false positives: {sorted(got - exact)[:5]}"
    # recall < 1 is inherent to LSH; 16 tables x 4 planes retains a
    # theta(cos 0.35) pair with p ~ 0.9 — pin well below that so the
    # test is deterministic-stable but a bucketing regression
    # (wrong planes, broken hashing) still fails hard
    recall = len(got) / len(exact)
    assert recall >= 0.6, f"recall {recall:.3f} over {len(exact)} pairs"


def test_semantic_dedup_clusters_shape(spark):
    pairs = semantic_pairs(
        t(spark, SF_SMALL, "embeddings"), threshold=THRESHOLD
    )
    clusters = semantic_dedup_clusters(pairs).collect()
    assert clusters, "near-dup graph at 0.35 is non-empty on the fixture"
    by_id = {r["cluster_id"]: r for r in clusters}
    assert len(by_id) == len(clusters), "cluster_id unique"
    for r in clusters:
        assert r["n_members"] >= 2  # singletons never emit
        assert r["max_cos"] >= THRESHOLD
    # determinism: second run identical (LSH planes are seed-derived)
    again = semantic_dedup_clusters(
        semantic_pairs(t(spark, SF_SMALL, "embeddings"), threshold=THRESHOLD)
    ).collect()
    assert sorted(map(tuple, clusters)) == sorted(map(tuple, again))


def test_semantic_survivor_is_max_degree_member(spark):
    pairs = semantic_pairs(
        t(spark, SF_SMALL, "embeddings"), threshold=THRESHOLD
    ).collect()
    from collections import defaultdict

    deg: dict[int, int] = defaultdict(int)
    adj: dict[int, set[int]] = defaultdict(set)
    for r in pairs:
        deg[r["id_a"]] += 1
        deg[r["id_b"]] += 1
        adj[r["id_a"]].add(r["id_b"])
        adj[r["id_b"]].add(r["id_a"])
    # reference components via BFS
    comp: dict[int, int] = {}
    for start in sorted(adj):
        if start in comp:
            continue
        stack, seen = [start], {start}
        while stack:
            n = stack.pop()
            for m in adj[n]:
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        label = min(seen)
        for n in seen:
            comp[n] = label
    clusters = semantic_dedup_clusters(
        semantic_pairs(t(spark, SF_SMALL, "embeddings"), threshold=THRESHOLD)
    ).collect()
    for r in clusters:
        members = [n for n, c in comp.items() if c == r["cluster_id"]]
        assert r["n_members"] == len(members)
        best = min(members, key=lambda n: (-deg[n], n))
        assert r["keep_id"] == best


def test_bpe_encode_word_known_merges():
    ranks = {p: i for i, p in enumerate(DEFAULT_MERGES)}
    # t+h -> th, th+e -> the
    assert bpe_encode_word("the", ranks) == ["the"]
    # "there": t h e r e -> th e re (t,h rank 0 beats r,e rank 6)
    # -> the re (th,e rank 1) -> there (the,re rank 19)
    assert bpe_encode_word("there", ranks) == ["there"]
    # rank priority over position: in "ath", (t,h) rank 0 wins over
    # (a,t) rank 10 even though (a,t) is leftmost
    assert bpe_encode_word("ath", ranks) == ["a", "th"]
    # leftmost wins on equal rank: "ttht" has one (t,h); "thth" merges
    # left occurrence first, then the right one
    assert bpe_encode_word("thth", ranks) == ["th", "th"]
    # no applicable merge -> characters
    assert bpe_encode_word("xyz", ranks) == ["x", "y", "z"]
    assert bpe_encode_word("x", ranks) == ["x"]


def test_bpe_encode_vocab_weighted_counts(spark):
    words = spark.createDataFrame(
        [("the", 3), ("there", 2), ("xyz", 1)], "w string, freq long"
    )
    got = {
        r["token"]: r["n"]
        for r in encode_vocab(words, DEFAULT_MERGES).collect()
    }
    assert got == {"the": 3, "there": 2, "x": 1, "y": 1, "z": 1}


def test_exact_quantiles_matches_percentile_aggregate(spark):
    o = t(spark, SF_SMALL, "orders")
    mine = exact_quantiles(
        o,
        "o_totalprice",
        {"p25": 0.25, "p50": 0.5, "p90": 0.9, "p0": 0.0, "p100": 1.0},
        group_cols=["o_orderstatus"],
    ).collect()
    ref = {
        r["o_orderstatus"]: r
        for r in o.groupBy("o_orderstatus")
        .agg(
            *[
                F.percentile("o_totalprice", F.lit(p)).alias(n)
                for n, p in [
                    ("p25", 0.25),
                    ("p50", 0.5),
                    ("p90", 0.9),
                    ("p0", 0.0),
                    ("p100", 1.0),
                ]
            ]
        )
        .collect()
    }
    assert len(mine) == len(ref)
    for row in mine:
        want = ref[row["o_orderstatus"]]
        for col in ["p0", "p25", "p50", "p90", "p100"]:
            assert abs(row[col] - want[col]) < 1e-9 * max(1.0, abs(want[col]))


def test_exact_quantiles_ungrouped_single_row(spark):
    o = t(spark, SF_SMALL, "orders")
    got = exact_quantiles(o, "o_totalprice", {"med": 0.5}).collect()
    want = o.agg(F.percentile("o_totalprice", F.lit(0.5)).alias("med")).collect()
    assert len(got) == 1
    assert abs(got[0]["med"] - want[0]["med"]) < 1e-6
