"""Unit tests for the custom operators on tiny handmade inputs
(SURVEY.md §5.2 unit layer)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gcp_etl_spark.operators.asof import asof_join, asof_join_grouped
from gcp_etl_spark.operators.topk import top_k, top_k_per_group


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T10:00")),
            (2, "a", _ts("2024-01-01T12:00")),
            (3, "b", _ts("2024-01-01T09:00")),
            (4, "c", _ts("2024-01-01T09:00")),  # key with no right rows
        ],
        "lid long, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T09:30"), 100.0),
            ("a", _ts("2024-01-01T11:00"), 200.0),
            ("b", _ts("2024-01-01T09:00"), 300.0),  # exact tie with left ts
            ("b", _ts("2024-01-01T10:00"), 400.0),  # after left → excluded
        ],
        "k string, rts timestamp, v double",
    )  # note: right `k` collides with left `k` → comes back as k_r
    return left, right


def test_asof_join_backward(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left,
        right,
        left_on=["k"],
        right_on=["k"],
        left_ts="lts",
        right_ts="rts",
        how="left",
    )
    got = {r["lid"]: r["v"] for r in out.collect()}
    # lid 1: latest right ≤ 10:00 is 09:30 → 100
    # lid 2: latest right ≤ 12:00 is 11:00 → 200
    # lid 3: exact-tie 09:00 ≤ 09:00 → 300 (inclusive as-of)
    # lid 4: no right rows → null
    assert got == {1: 100.0, 2: 200.0, 3: 300.0, 4: None}
    assert out.count() == 4  # left join keeps every left row exactly once


def test_asof_join_inner(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left,
        right,
        left_on=["k"],
        right_on=["k"],
        left_ts="lts",
        right_ts="rts",
        how="inner",
    )
    assert {r["lid"] for r in out.collect()} == {1, 2, 3}


def test_asof_join_grouped_matches_window_impl(spark):
    left, right = _asof_fixture(spark)
    a = asof_join(
        left, right, ["k"], ["k"], "lts", "rts", how="left"
    ).select("lid", "v")
    b = asof_join_grouped(
        left.withColumnRenamed("k", "key"),
        right.withColumnRenamed("k", "key"),
        on="key",
        left_ts="lts",
        right_ts="rts",
    ).select("lid", "v")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_top_k_global(spark):
    df = spark.range(100).withColumn("v", F.col("id") % 10)
    out = top_k(df, [F.col("v").desc(), F.col("id").asc()], 3).collect()
    assert [(r["id"], r["v"]) for r in out] == [(9, 9), (19, 9), (29, 9)]


def test_top_k_per_group(spark):
    df = spark.range(100).withColumn("g", F.col("id") % 2)
    out = top_k_per_group(
        df, group=["g"], order=[F.col("id").desc()], k=2
    ).collect()
    got = sorted((r["g"], r["id"], r["rn"]) for r in out)
    assert got == [(0, 96, 2), (0, 98, 1), (1, 97, 2), (1, 99, 1)]


def test_scd2_two_merge_rounds(spark):
    from gcp_etl_spark.operators.scd import scd2_init, scd2_merge

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    dim = scd2_init(snap, "k", F.lit("2024-01-01"))
    # round 1: update k=1, insert k=4
    b1 = spark.createDataFrame([(1, "a2"), (4, "d")], "k long, v string")
    dim = scd2_merge(dim, b1, "k", F.lit("2024-02-01"))
    # round 2: update k=1 again
    b2 = spark.createDataFrame([(1, "a3")], "k long, v string")
    dim = scd2_merge(dim, b2, "k", F.lit("2024-03-01"))

    rows = dim.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    assert len(by_key[1]) == 3                     # three versions of k=1
    current = {r["k"]: r["v"] for r in rows if r["is_current"]}
    assert current == {1: "a3", 2: "b", 3: "c", 4: "d"}
    # closed versions chain correctly: valid_to of v1 == valid_from of v2
    k1 = sorted(by_key[1], key=lambda r: r["valid_from"])
    assert k1[0]["valid_to"] == k1[1]["valid_from"]
    assert k1[1]["valid_to"] == k1[2]["valid_from"]
    assert not k1[0]["is_current"] and not k1[1]["is_current"] and k1[2]["is_current"]


def test_countmin_never_underestimates(spark):
    from gcp_etl_spark.queries.scale_ops import sketch_countmin
    from tests.conftest import SF_SMALL

    rows = sketch_countmin(spark, SF_SMALL).collect()
    assert rows, "sketch produced no probe rows"
    for r in rows:
        assert r["cms_estimate"] >= r["exact_n"], (
            f"CMS underestimated key {r['l_partkey']}: "
            f"{r['cms_estimate']} < {r['exact_n']}"
        )


def test_kmv_sketch_estimates_vocab_jaccard(spark):
    """KMV bottom-k estimate must track the exact vocabulary Jaccard
    within the sketch's error envelope (~1/sqrt(k) + slack; exact when
    the merged vocabulary fits inside k)."""
    from pyspark.sql import functions as F

    from gcp_etl_spark.queries.scale_ops import sketch_kmv_jaccard
    from gcp_etl_spark.tables import t
    from tests.conftest import SF_SMALL

    est = {
        (r["src_a"], r["src_b"]): r["est_jaccard"]
        for r in sketch_kmv_jaccard(spark, SF_SMALL).collect()
    }
    words = (
        t(spark, SF_SMALL, "documents")
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    vocab = {
        r["source"]: set(r["ws"])
        for r in words.groupBy("source")
        .agg(F.collect_set("w").alias("ws"))
        .collect()
    }
    assert est, "no source pairs produced"
    for (sa, sb), e in est.items():
        a, b = vocab[sa], vocab[sb]
        exact = len(a & b) / len(a | b)
        assert abs(e - exact) < 0.15, (sa, sb, e, exact)


def test_misra_gries_decrement_guarantee():
    """When vocabulary exceeds capacity, the MG summary must (a) keep
    every item with frequency > n/(cap+1) and (b) undercount each kept
    item by at most n/(cap+1) — the classic guarantee, exercised on a
    skewed stream WITHOUT Spark (pure fold)."""
    import pandas as pd

    from gcp_etl_spark.queries.scale_ops import _mg_fold

    # stream: 2 heavy hitters + 40 distinct light items, capacity 4
    stream = ["hot1"] * 300 + ["hot2"] * 200 + [f"w{i}" for i in range(40)] * 3
    batches = [
        pd.DataFrame({"word": stream[i : i + 64]})
        for i in range(0, len(stream), 64)
    ]
    out = pd.concat(list(_mg_fold(batches, cap=4)))
    got = dict(zip(out["word"], out["cnt"]))
    n = len(stream)
    err = n / 5  # n / (cap + 1)
    for hot, true in (("hot1", 300), ("hot2", 200)):
        assert hot in got, f"{hot} evicted despite freq > n/(cap+1)"
        assert true - err <= got[hot] <= true, (hot, got[hot], true)
    assert len(got) <= 4


def test_misra_gries_exact_regime():
    """Capacity >= distinct keys -> no decrement ever fires and the
    fold returns EXACT counts (the regime the declared query's oracle
    hash-verifies)."""
    import pandas as pd

    from gcp_etl_spark.queries.scale_ops import _mg_fold

    stream = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    batches = [pd.DataFrame({"word": stream[i::3]}) for i in range(3)]
    out = pd.concat(list(_mg_fold(batches, cap=16)))
    assert dict(zip(out["word"], out["cnt"])) == {"a": 5, "b": 3, "c": 2}


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's defining property: two documents sharing a
    substring of length >= w + k - 1 (= 8 chars here) must share at
    least one selected fingerprint (same gram hash at the position-
    invariant level)."""
    from pyspark.sql import functions as F

    from gcp_etl_spark.queries.text_ops import (
        WINNOW_K,
        WINNOW_POS_BITS,
        WINNOW_POS_CAP,
        WINNOW_W,
        text_winnowing_fingerprint,
    )

    assert WINNOW_K == 5 and WINNOW_W == 4
    # rebuild the selection but emit raw selected hashes per doc
    import gcp_etl_spark.tables as tables

    shared = "zqxjkvwpbyfgm"  # 13 chars >> w+k-1, unusual grams
    # docs 3/4 place the shared substring AFTER gram position 2047 —
    # the regime where the old 11-bit position packing corrupted the
    # decoded hash (h-1) and silently broke the guarantee for >2 KB
    # docs (round-3 ADVICE medium finding)
    filler1 = " ".join(f"w{i:04d}" for i in range(400))  # ~2.4k chars
    filler2 = " ".join(f"v{i:04d}" for i in range(400))
    docs = spark.createDataFrame(
        [
            (1, f"aaa {shared} bbb ccc ddd eee fff"),
            (2, f"ttt uuu vvv {shared} www yyy xxx"),
            (3, f"{filler1} {shared} qqq"),
            (4, f"{filler2} {shared} rrr"),
        ],
        "doc_id long, text string",
    )
    orig = tables.t
    try:
        tables.t = lambda _s, _d, _n: docs  # the query reads documents
        import gcp_etl_spark.queries.text_ops as to

        to_t = to.t
        to.t = tables.t
        try:
            out = text_winnowing_fingerprint(spark, "ignored").collect()
        finally:
            to.t = to_t
    finally:
        tables.t = orig
    # per-doc fingerprint digests exist; the stronger check needs the
    # selected hash sets — recompute them directly
    from pyspark.sql import Window

    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    k, w = WINNOW_K, WINNOW_W
    n_g = F.greatest(F.length("s") - (k - 1), F.lit(0))
    posn = docs.select("doc_id", norm.alias("s")).select(
        "doc_id", "s", F.explode(F.sequence(F.lit(1), n_g)).alias("pos")
    )
    h = F.conv(
        F.substring(F.md5(F.col("s").substr(F.col("pos"), F.lit(k))), 1, 8),
        16,
        10,
    ).cast("long")
    pcap = F.lit(WINNOW_POS_CAP - 1)
    keyed = posn.select(
        "doc_id",
        "pos",
        (h * WINNOW_POS_CAP + (pcap - F.least(F.col("pos"), pcap))).alias(
            "key"
        ),
        F.count("*").over(Window.partitionBy("doc_id")).alias("n"),
    )
    sel = (
        keyed.select(
            "doc_id",
            "pos",
            F.min("key")
            .over(
                Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
            )
            .alias("sk"),
        )
        .filter(F.col("pos") <= F.col("n") - (w - 1))
        .select("doc_id", F.shiftright("sk", WINNOW_POS_BITS).alias("h"))
        .distinct()
        .collect()
    )
    hs = {1: set(), 2: set(), 3: set(), 4: set()}
    for r in sel:
        hs[r["doc_id"]].add(r["h"])
    assert hs[1] & hs[2], "shared 13-char substring yielded no shared fingerprint"
    assert hs[3] & hs[4], (
        "shared substring past gram position 2047 yielded no shared "
        "fingerprint (position-field overflow regression)"
    )
    # the shared grams must decode to the SAME hash in the short docs
    # and the long docs: the overflow bug shifted long-doc hashes by -1
    assert hs[1] & hs[3], "long-doc decoded hashes diverge from short-doc"
    assert len(out) == 4 and all(r["n_selected"] > 0 for r in out)


def test_exact_quantiles_agg_path_equals_rank_path(spark):
    """r8 adaptive strategy: the size-gated percentile-AGGREGATE path
    must equal the two-pass rank path bit-for-bit-ish (1e-9) on a
    fixture with NULL group keys, NULL values, ties, and a 1-row
    group — and the auto gate must pick agg for a tiny relation while
    honoring an explicit rank override."""
    import gcp_etl_spark.operators.quantiles as Q
    from gcp_etl_spark.tables import t
    from tests.conftest import SF_SMALL

    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 9.0),
        ("b", 5.0), ("b", None),
        (None, 3.0), (None, 7.0), (None, 8.0),
        ("c", 4.25),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    probs = {"p25": 0.25, "med": 0.5, "p90": 0.9}

    def rows_of(strategy):
        out = Q.exact_quantiles(
            df, "v", probs, group_cols=["g"], strategy=strategy
        ).collect()
        return {
            r["g"]: (r["p25"], r["med"], r["p90"]) for r in out
        }

    agg, rank = rows_of("agg"), rows_of("rank")
    assert set(agg) == set(rank) == {"a", "b", "c", None}
    for g in agg:
        for x, y in zip(agg[g], rank[g]):
            assert abs(x - y) <= 1e-9, (g, agg[g], rank[g])

    # auto gate needs REAL plan statistics: a createDataFrame relation
    # is LogicalRDD (stats = Long.Max => conservatively rank); a tiny
    # parquet-backed relation estimates small => agg plan. This is the
    # deliberate asymmetry: unknown size must never pick the
    # single-reducer aggregate.
    rdd_backed = Q.exact_quantiles(
        df, "v", probs, group_cols=["g"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in rdd_backed

    pq = t(spark, SF_SMALL, "events").select("event_type", "value")
    auto_plan = Q.exact_quantiles(
        pq, "value", probs, group_cols=["event_type"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "percentile" in auto_plan
    rank_plan = Q.exact_quantiles(
        pq, "value", probs, group_cols=["event_type"], strategy="rank"
    )._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in rank_plan

    # the FORCE_STRATEGY hook (plan-hygiene sweep) overrides auto
    Q.FORCE_STRATEGY = "rank"
    try:
        forced = Q.exact_quantiles(
            pq, "value", probs, group_cols=["event_type"]
        )._jdf.queryExecution().executedPlan().toString()
        assert "percentile" not in forced
    finally:
        Q.FORCE_STRATEGY = None


def test_exact_weighted_quantiles_agg_path_equals_rank_path(spark):
    """optimization r12: the size-gated single-shuffle window path of
    exact_weighted_quantiles must equal the two-pass rank path EXACTLY
    (decimal algebra is order-free on both) on a fixture with value
    ties that merge, a NULL group key, non-positive weights that drop,
    a 1-row group, and include_total."""
    import gcp_etl_spark.operators.quantiles as Q

    rows = [
        ("a", 1.0, 2.0), ("a", 2.0, 1.0), ("a", 2.0, 3.0),
        ("a", 9.0, 1.0),
        ("b", 5.0, 4.0), ("b", 6.0, 0.0), ("b", 7.0, -1.0),
        (None, 3.0, 1.5), (None, 7.0, 1.5),
        ("c", 4.25, 0.25),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    probs = {"p25": 0.25, "med": 0.5, "p90": 0.9}

    def rows_of(strategy):
        out = Q.exact_weighted_quantiles(
            df, "v", "w", probs, group_cols=["g"],
            include_total=True, strategy=strategy,
        ).collect()
        return {
            r["g"]: (r["p25"], r["med"], r["p90"], r["total_weight"])
            for r in out
        }

    agg, rank = rows_of("agg"), rows_of("rank")
    assert agg == rank, (agg, rank)
    assert set(agg) == {"a", "b", "c", None}
    # lower-quantile semantics sanity: group a total=7, med hits cum
    # 2+4=6 >= 3.5 at v=2.0
    assert agg["a"][1] == 2.0 and float(agg["a"][3]) == 7.0

    # ungrouped, no total
    ua = Q.exact_weighted_quantiles(
        df, "v", "w", {"med": 0.5}, strategy="agg"
    ).collect()[0]["med"]
    ur = Q.exact_weighted_quantiles(
        df, "v", "w", {"med": 0.5}, strategy="rank"
    ).collect()[0]["med"]
    assert ua == ur

    # unknown-size (LogicalRDD) input must stay on the rank path — its
    # signature in the visible plan is the __pid physical-partition
    # column (the range exchange itself hides inside the lazy
    # checkpoint's RDD lineage); an explicit agg override has no
    # __pid; the FORCE_STRATEGY sweep hook wins over auto
    def plan_of(**kw):
        return (
            Q.exact_weighted_quantiles(
                df, "v", "w", probs, group_cols=["g"], **kw
            )._jdf.queryExecution().executedPlan().toString()
        )

    assert "__pid" in plan_of()
    assert "__pid" not in plan_of(strategy="agg")
    Q.FORCE_STRATEGY = "rank"
    try:
        assert "__pid" in plan_of(strategy="agg")
    finally:
        Q.FORCE_STRATEGY = None
