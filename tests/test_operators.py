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
