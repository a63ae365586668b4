"""LLM-operator validation: LSH recall vs brute force, sketch
tolerances, multimodal plumbing (SURVEY.md §2B / §7 step 7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_etl_spark.llm.dedup import (
    _shingles,
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from gcp_etl_spark.llm.multimodal import extract_features, synthesize_media
from gcp_etl_spark.llm.similarity import cosine_topk, cosine_topk_lsh
from gcp_etl_spark.tables import t
from tests.conftest import SF_SMALL


def brute_force_jaccard_pairs(spark, docs, threshold, shingle_k=3):
    sh = docs.select(
        F.col("doc_id").alias("id"), _shingles(F.col("text"), shingle_k).alias("sh")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    jac = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).cast(
        "double"
    ) / F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def test_minhash_recall_vs_brute_force(spark):
    docs = t(spark, SF_SMALL, "documents")
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.7
        ).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in brute_force_jaccard_pairs(spark, docs, 0.7).collect()
    }
    assert want, "fixture should contain planted near-duplicates"
    # verification step makes precision exact; banding gives high recall
    assert got.issubset(want)
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"LSH recall {recall:.2f} below 0.9 ({len(want)} pairs)"


def test_minhash_estimate_first_matches_exact_path(spark):
    """estimate_first pre-filters candidates on the fixed-width
    signature (the 100 TB path — shingle arrays stay out of the
    verify shuffles); precision is still exact and the 0.15 margin
    keeps boundary recall, so the planted duplicates survive."""
    docs = t(spark, SF_SMALL, "documents")
    plain = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.7
        ).collect()
    }
    est = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.7, estimate_first=True
        ).collect()
    }
    assert est.issubset(plain)
    assert len(est) >= 0.9 * len(plain), f"{len(est)} vs {len(plain)}"


def test_minhash_incremental_matches_cross_subset_pairs(spark):
    """Incremental (batch vs corpus) dedup must recover the
    cross-subset slice of the brute-force pair set — and nothing
    within either subset."""
    from gcp_etl_spark.llm.dedup import minhash_incremental

    docs = t(spark, SF_SMALL, "documents")
    got = {
        (r["batch_id"], r["corpus_id"])
        for r in minhash_incremental(
            corpus=docs.filter(F.col("doc_id") % 5 != 0),
            batch=docs.filter(F.col("doc_id") % 5 == 0),
            id_col="doc_id",
            text_col="text",
            threshold=0.7,
        ).collect()
    }
    assert all(b % 5 == 0 and c % 5 != 0 for b, c in got)
    want = {
        (a, b) if a % 5 == 0 else (b, a)
        for r in brute_force_jaccard_pairs(spark, docs, 0.7).collect()
        for a, b in [(r["id_a"], r["id_b"])]
        if (a % 5 == 0) != (b % 5 == 0)
    }
    assert want, "fixture should contain cross-subset near-duplicates"
    assert got.issubset(want)
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"incremental recall {recall:.2f} ({len(want)} pairs)"


def test_simhash_pairs_are_near_duplicates(spark):
    docs = t(spark, SF_SMALL, "documents")
    pairs = simhash_near_duplicates(docs, "doc_id", "text", max_hamming=3)
    rows = pairs.collect()
    assert rows, "expected some simhash near-dup pairs in the fixture"
    assert all(r["hamming"] <= 3 for r in rows)
    # symmetric sanity: a pair is reported once with id_a < id_b
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_lsh_ann_recall_vs_exact(spark):
    emb = t(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    dim = len(emb.select("embedding").first()[0])
    exact = cosine_topk(emb, queries, k=5)
    approx = cosine_topk_lsh(emb, queries, dim=dim, k=5, planes=4)
    e = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["n_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # bucketed ANN trades recall for candidate-set size; with 4 planes
    # (16 buckets over 500 vectors) recall should stay useful
    assert recall >= 0.3, f"ANN recall collapsed: {recall:.2f}"


def test_approx_count_distinct_tolerance(spark, duck):
    li = t(spark, SF_SMALL, "lineitem")
    approx = li.agg(
        F.approx_count_distinct("l_partkey").alias("a")
    ).collect()[0]["a"]
    exact = duck.sql("SELECT count(DISTINCT l_partkey) FROM lineitem").fetchone()[0]
    assert abs(approx - exact) / exact < 0.05  # HLL++ default rsd


def test_multimodal_feature_plumbing(spark):
    media = synthesize_media(spark, n=32, payload_bytes=256)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 32
    r = {row["media_id"]: row for row in rows}
    assert r[0]["n_bytes"] == 256
    assert len(r[0]["feature"]) == 8
    assert r[0]["byte_entropy"] > 0.0
    # joinable back to metadata (vector-beside-scalar multimodal shape)
    joined = feats.join(media.select("media_id", "meta"), "media_id")
    assert joined.count() == 32


def test_approx_quantile_tolerance(spark, duck):
    o = t(spark, SF_SMALL, "orders")
    approx = {
        r["o_orderstatus"]: (r["median_approx"], r["p95_approx"])
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 1000).alias("median_approx"),
            F.percentile_approx("o_totalprice", 0.95, 1000).alias("p95_approx"),
        )
        .collect()
    }
    exact = {
        row[0]: (row[1], row[2])
        for row in duck.sql(
            "SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5),"
            " quantile_cont(o_totalprice, 0.95) FROM orders GROUP BY 1"
        ).fetchall()
    }
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) / e < 0.05, f"{k}: approx {a} vs exact {e}"


def test_ivf_ann_recall_vs_exact(spark):
    from gcp_etl_spark.llm.ivf import cosine_topk_ivf

    emb = t(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5)
    approx = cosine_topk_ivf(emb, queries, k=5, n_centroids=8, nprobe=3)
    e = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["n_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # probing 3/8 lists scores ~40% of the corpus; nearest neighbors
    # concentrate in the query's own cell -> recall well above that
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.2f}"
    # results only for the filtered query set (vec_id < 20)
    assert all(q < 20 for q, _ in a)


def test_connected_components_matches_union_find(spark):
    """The CC operator must produce exactly the components a classic
    union-find computes on the same edge list (plus a synthetic
    long-chain graph to exercise multi-round convergence)."""
    from gcp_etl_spark.llm.cluster import connected_components

    docs = t(spark, SF_SMALL, "documents")
    edges = [
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.7
        ).collect()
    ]
    # add a 12-node chain with ids far outside doc range: forces
    # several propagation rounds (diameter 11)
    chain = [(10_000 + i, 10_001 + i) for i in range(11)]
    edges += chain

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}

    got_df = connected_components(
        spark.createDataFrame(edges, "src long, dst long")
    )
    got = {r["node"]: r["comp"] for r in got_df.collect()}
    assert got == want


def test_frame_sampling_counts_and_determinism(spark):
    """16 frames per 4096-byte payload at 256 B/frame; every_k=4 keeps
    frames 0,4,8,12 — counts and checksums must be stable."""
    from gcp_etl_spark.llm.multimodal import sample_frames, synthesize_media

    media = synthesize_media(spark, n=16, payload_bytes=4096)
    frames = sample_frames(media, frame_bytes=256, every_k=4)
    rows = frames.collect()
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 4, 8, 12] for v in per.values())
    assert len(per) == 16
    again = {
        (r["media_id"], r["frame_idx"]): r["frame_crc"]
        for r in sample_frames(media, frame_bytes=256, every_k=4).collect()
    }
    assert {(r["media_id"], r["frame_idx"]): r["frame_crc"] for r in rows} == again


def test_resize_media_metadata_stub(spark):
    from gcp_etl_spark.llm.multimodal import resize_media, synthesize_media

    media = synthesize_media(spark, n=4)
    out = resize_media(media, 224, 224).collect()
    assert all(r["meta"]["target_size"] == "224x224" for r in out)
    assert all(r["meta"]["src"].startswith("synth://") for r in out)


def test_hll_sketch_merge_tolerance(spark):
    """Cross-engine/approximation bound: per-group DataSketches HLL
    estimates and the merged-union global estimate stay within the
    lgK=14 error envelope of exact. The merge ALGEBRA itself is
    asserted as an exact equality below — merging per-group sketches
    is deterministic, so it must reproduce the one-pass whole-table
    sketch estimate bit-for-bit (VERDICT r2 #8)."""
    from gcp_etl_spark.queries.registry import load_all

    q = load_all()["sketch_hll_merge"].fn
    rows = {r["c_mktsegment"]: r for r in q(spark, SF_SMALL).collect()}
    assert "__ALL__" in rows and len(rows) >= 2
    for seg, r in rows.items():
        exact = r["exact_n"]
        assert abs(r["hll_estimate"] - exact) / max(exact, 1) < 0.02, seg
        # merge algebra: union-of-group-sketches == direct sketch, EXACTLY
        assert r["hll_estimate"] == r["hll_direct"], seg


def test_audio_window_geometry_and_coverage(spark):
    """Overlapping binary windows must tile each payload: dense
    indexes, full-width windows except possibly the last, and
    stride * (n-1) + last_width == payload length."""
    from gcp_etl_spark.llm.multimodal import window_samples

    media = synthesize_media(spark, n=8, payload_bytes=1000)
    wins = window_samples(media, win_bytes=256, stride=128).collect()
    by_media = {}
    for r in wins:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media) == 8
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r["win_idx"])
        assert [r["win_idx"] for r in rows] == list(range(len(rows)))
        for r in rows[:-1]:
            assert r["n_win_bytes"] == 256
        last = rows[-1]
        assert 128 * last["win_idx"] + last["n_win_bytes"] == 1000
        assert all(0.0 <= r["mean_level"] <= 255.0 for r in rows)


def test_pq_ann_recall_vs_exact(spark):
    """PQ/ADC shortlist + exact rerank: the rerank stage re-scores the
    top-40 ADC candidates with true cosine, so recall@5 should be
    near-exact on a 500-vector corpus; also pin the output contract
    (same shape as cosine_topk, k rows per query, rn dense 1..k)."""
    from gcp_etl_spark.llm.pq import pq_topk

    emb = t(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5)
    approx = pq_topk(emb, queries, k=5, m=16, k_codes=64, rerank=40)
    rows = approx.collect()
    e = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["n_id"]) for r in rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"PQ recall {recall:.2f} below 0.9"
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r["rn"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_pq_topk_rejects_corpus_sized_query_set(spark):
    """pq_topk ships a per-query ADC LUT in the task closure, so the
    queries side must be driver-bounded: a corpus-sized queries input
    must raise instead of silently collecting everything (round-3
    VERDICT ask). The guard's limit(max+1) also bounds the collect
    that performs the check itself."""
    import pytest

    from gcp_etl_spark.llm.pq import pq_topk

    emb = t(spark, SF_SMALL, "embeddings")
    with pytest.raises(ValueError, match="max_queries"):
        pq_topk(emb, emb, k=5, max_queries=16)
    # the declared probe size still works under the default guard
    out = pq_topk(emb, emb.filter(F.col("vec_id") < 3), k=3)
    assert out.count() > 0


def test_pq_encode_compresses_and_is_deterministic(spark):
    from gcp_etl_spark.llm.pq import pq_encode, pq_train

    emb = t(spark, SF_SMALL, "embeddings")
    books = pq_train(emb, m=8, k_codes=16)
    assert books.shape == (8, 16, 8)
    c1 = pq_encode(emb, "vec_id", "embedding", books).collect()
    c2 = pq_encode(emb, "vec_id", "embedding", books).collect()
    assert sorted(map(str, c1)) == sorted(map(str, c2))
    codes = c1[0]["codes"]
    assert len(codes) == 8 and all(0 <= c < 16 for c in codes)


def test_pca_projection_geometry(spark):
    """The PCA projection must be a genuine orthonormal eigenbasis
    projection: per-component variance equals the eigenvalue order
    (monotone non-increasing), components decorrelate, and the top-8
    explained variance is at least the uniform 8/64 share."""
    import numpy as np

    from gcp_etl_spark.queries import load_all

    rows = (
        load_all()["embedding_pca_project"]
        .fn(spark, SF_SMALL)
        .select("pc1", "pc2", "pc3", "pc4")
        .collect()
    )
    P = np.asarray([[r[0], r[1], r[2], r[3]] for r in rows])
    cov = np.cov(P.T)
    var = np.diag(cov)
    # variances sorted descending (principal order)
    assert all(var[i] >= var[i + 1] - 1e-6 for i in range(3))
    # off-diagonal correlation ~ 0 (decorrelated components)
    off = cov - np.diag(var)
    denom = np.sqrt(np.outer(var, var))
    assert np.abs(off / denom).max() < 1e-6
    # top components carry at least the uniform variance share of the
    # original space
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    M = np.asarray(
        [np.asarray(r[0], dtype=np.float64) for r in emb.select("embedding").collect()]
    )
    total_var = np.var(M, axis=0, ddof=1).sum()
    assert var.sum() >= 4 / 64 * total_var


def test_prefix_filter_join_is_exact(spark):
    """Prefix filtering must be EXACT (zero false negatives AND zero
    false positives after verification): its pair set equals the
    brute-force all-pairs exact-Jaccard join at sf0.001."""
    from pyspark.sql import functions as F

    from gcp_etl_spark.queries import load_all
    from gcp_etl_spark.tables import t

    got = {
        (r["id_a"], r["id_b"])
        for r in load_all()["dedup_prefix_filter"].fn(spark, SF_SMALL).collect()
    }
    from gcp_etl_spark.llm.dedup import _shingles

    d = t(spark, SF_SMALL, "documents")
    toks = d.select(
        "doc_id", F.array_distinct(_shingles(F.col("text"), 3)).alias("ts")
    )
    a = toks.select(F.col("doc_id").alias("id_a"), F.col("ts").alias("ta"))
    b = toks.select(F.col("doc_id").alias("id_b"), F.col("ts").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    jac = inter / (
        F.size("ta").cast("double") + F.size("tb").cast("double") - inter
    )
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(jac >= 0.7)
        .select("id_a", "id_b")
        .collect()
    }
    assert got == brute


def test_dedup_family_leaves_no_session_cache_entries(spark):
    """r6-ADVICE leak contract, widened in r8: NO dedup-family call may
    park a relation in the session CacheManager after it returns (and,
    for the eager path, after its action) — persist-without-unpersist
    there is session-lifetime. Intra-query reuse now rides RDD-level
    lazy localCheckpoints, whose blocks the ContextCleaner frees with
    the plan, so the SQL cache must stay exactly as it started."""
    from gcp_etl_spark.llm.dedup import (
        minhash_estimate_pairs,
        minhash_incremental,
        minhash_near_duplicates,
    )

    cm = spark._jsparkSession.sharedState().cacheManager()
    # earlier tests in the shared session may cache legitimately —
    # the contract under test is "no NEW entries from THESE calls"
    spark.catalog.clearCache()
    assert cm.isEmpty()

    docs = t(spark, SF_SMALL, "documents").limit(120)
    # eager path: cache released before return
    minhash_estimate_pairs(docs, "doc_id", "text", materialize=True).count()
    assert cm.isEmpty()
    # lazy one-shot path: never touches the SQL cache at all
    minhash_estimate_pairs(docs, "doc_id", "text", materialize=False).count()
    assert cm.isEmpty()
    minhash_near_duplicates(docs, "doc_id", "text").count()
    assert cm.isEmpty()
    minhash_incremental(
        corpus=None, batch=None, id_col="doc_id", text_col="text",
        full=docs, batch_pred=lambda i: i % 5 == 0,
    ).count()
    assert cm.isEmpty()


def test_query_corpus_leak_audit_graph_rollup(spark):
    """r8 leak audit extension: the three query-level persists with no
    unpersist (triangle count, pagerank edges/nodes, rollup minute
    grain) are now lazy localCheckpoints — the SQL CacheManager must
    stay empty after each runs in a long-lived session."""
    from gcp_etl_spark.queries import load_all

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()  # see the dedup-family leak test note
    assert cm.isEmpty()
    specs = load_all()
    # graph_adamic_adar: r12 ADVICE found its persisted edge relation
    # leaked for the session's lifetime; the r13 grouped-adjacency
    # rewrite has no persist at all — keep it pinned here
    for name in (
        "graph_triangle_count",
        "graph_pagerank",
        "rollup_multires",
        "graph_adamic_adar",
    ):
        specs[name].fn(spark, SF_SMALL).count()
        assert cm.isEmpty(), f"{name} parked a relation in the CacheManager"


def test_embedding_histogram_probe_chunking_is_exact(spark, monkeypatch):
    """r12 verdict ask #3: the probe side of
    embedding_distance_histogram must reach the driver in BOUNDED
    chunks (the old single toPandas held N/32 vectors). Forcing a tiny
    chunk (2 probes per collect -> 8 chunks over the 500-id fixture)
    must give bit-identical bins to the single-chunk default: the pair
    set is partitioned by probe id range, so integer bin counts add
    associatively."""
    import gcp_etl_spark.queries.llm_ops as llm_ops
    from gcp_etl_spark.queries import load_all

    fn = load_all()["embedding_distance_histogram"].fn
    base = [tuple(r) for r in fn(spark, SF_SMALL).collect()]
    assert base, "histogram unexpectedly empty"
    monkeypatch.setattr(llm_ops, "_EDH_PROBE_CHUNK", 2)
    chunked = [tuple(r) for r in fn(spark, SF_SMALL).collect()]
    assert chunked == base
