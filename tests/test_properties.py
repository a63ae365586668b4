"""Property-based tests (hypothesis) — SURVEY §5.2 unit layer.

Each property pits an engine operator against an independent
reference implementation (plain join, pandas merge_asof, brute-force
Jaccard) on randomized small inputs. Sizes stay tiny so each example
is a sub-second Spark job; value comes from the adversarial shapes
hypothesis finds (dup keys, empty sides, ties), not volume.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gcp_etl_spark.llm.dedup import minhash_signatures
from gcp_etl_spark.operators.asof import asof_join
from gcp_etl_spark.operators.skew import salted_join

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.lists(st.integers(0, 5), min_size=0, max_size=12)


@SETTINGS
@given(lk=keys, rk=keys, salt=st.integers(2, 5))
def test_salted_join_matches_plain_join(spark, lk, rk, salt):
    left = spark.createDataFrame([(k, i) for i, k in enumerate(lk)], "k long, lv long")
    right = spark.createDataFrame([(k, i) for i, k in enumerate(rk)], "k long, rv long")
    plain = sorted(map(tuple, left.join(right, ["k"]).collect()))
    salted = sorted(map(tuple, salted_join(left, right, ["k"], salt=salt).collect()))
    assert plain == salted


@SETTINGS
@given(
    lts=st.lists(st.integers(0, 50), min_size=1, max_size=8),
    rts=st.lists(st.integers(0, 50), min_size=0, max_size=8),
)
def test_asof_join_matches_pandas_merge_asof(spark, lts, rts):
    base = dt.datetime(2024, 1, 1)
    lrows = [(i, base + dt.timedelta(minutes=m)) for i, m in enumerate(lts)]
    rrows = [
        (base + dt.timedelta(minutes=m), float(i)) for i, m in enumerate(sorted(set(rts)))
    ]
    left = spark.createDataFrame(lrows, "lid long, lts timestamp").withColumn(
        "g", F.lit("k")
    )
    right = spark.createDataFrame(rrows, "rts timestamp, v double").withColumn(
        "g", F.lit("k")
    )
    got = {
        r["lid"]: r["v"]
        for r in asof_join(left, right, ["g"], ["g"], "lts", "rts", how="left").collect()
    }
    lpdf = pd.DataFrame(lrows, columns=["lid", "lts"]).sort_values("lts", kind="mergesort")
    rpdf = pd.DataFrame(rrows, columns=["rts", "v"]).sort_values("rts", kind="mergesort")
    if rpdf.empty:
        expect = {i: None for i, _ in lrows}
    else:
        m = pd.merge_asof(lpdf, rpdf, left_on="lts", right_on="rts", direction="backward")
        expect = {
            int(r.lid): (None if pd.isna(r.v) else float(r.v)) for r in m.itertuples()
        }
    assert got == expect


@SETTINGS
@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=3), min_size=3, max_size=20
    )
)
def test_minhash_identical_docs_have_identical_signatures(spark, words):
    text = " ".join(words)
    df = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    sigs = {r["doc_id"]: r["sig"] for r in
            minhash_signatures(df, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]


@SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="abcdef .", min_size=0, max_size=60),
        min_size=1,
        max_size=6,
    )
)
def test_winnowing_guarantee_random_texts(spark, texts):
    """Winnowing's shared-substring => shared-fingerprint guarantee on
    hypothesis-generated texts: append one common 13-char rare string
    to every doc long enough to fingerprint; all such docs must share
    a decoded hash (exercises the 21-bit position packing on arbitrary
    lengths/whitespace shapes)."""
    import gcp_etl_spark.queries.text_ops as to

    shared = " zqxjvwpbyfgmk"
    docs = spark.createDataFrame(
        [(i, txt + shared) for i, txt in enumerate(texts)],
        "doc_id long, text string",
    )
    orig = to.t
    to.t = lambda _s, _d, _n: docs
    try:
        out = to.text_winnowing_fingerprint(spark, "ignored").collect()
    finally:
        to.t = orig
    by_id = {r["doc_id"]: r for r in out}
    # every doc ends with the 14-char shared suffix >= w+k-1=8, so all
    # fingerprint digests must be nonempty and any two docs whose
    # normalized text is identical must have identical digests
    assert all(r["n_selected"] >= 1 for r in out)
    norm = {}
    for i, txt in enumerate(texts):
        key = " ".join((txt + shared).lower().split())
        norm.setdefault(key, []).append(i)
    for ids in norm.values():
        fps = {by_id[i]["fp"] for i in ids if i in by_id}
        assert len(fps) <= 1, "identical normalized docs got different fps"


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["en", "es"]), st.sampled_from(["web", "book", "code"])),
        min_size=1,
        max_size=40,
    )
)
def test_stratified_sample_exact_quotas(spark, rows):
    """sample_stratified_exact's quota law on random strata shapes:
    every stratum takes exactly ceil(0.1 * n) docs — never 0, never
    more — and re-running yields the identical taken-id fingerprint
    (determinism without rand())."""
    import math

    import gcp_etl_spark.queries.prep_ops as po

    docs = spark.createDataFrame(
        [(i, f"text {i}", lang, src, 10) for i, (lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = po.t
    po.t = lambda _s, _d, _n: docs
    try:
        r1 = po.sample_stratified_exact(spark, "ignored").collect()
        r2 = po.sample_stratified_exact(spark, "ignored").collect()
    finally:
        po.t = orig
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    from collections import Counter

    strata = Counter(rows)
    got = {(r["lang"], r["source"]): r for r in r1}
    assert set(got) == set(strata)
    for k, n in strata.items():
        assert got[k]["n_total"] == n
        assert got[k]["n_taken"] == math.ceil(0.1 * n)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),                      # group
            st.integers(-50, 50),                   # order key
            st.integers(-5, 5),                     # weight a
            st.integers(0, 9),                      # weight b
        ),
        min_size=1,
        max_size=60,
    ),
    n_parts=st.integers(1, 7),
)
def test_range_prefix_sums_matches_pandas(spark, rows, n_parts):
    """PROPERTY: range_prefix_sums (the primitive behind every rank/
    quantile/ECDF operator) equals a pandas groupwise cumsum for any
    data, any group/tie structure, any partition count. Ties on the
    order key alone are order-ambiguous ROW-wise (with negative
    weights even the per-key max of prefix sums is permutation-
    dependent — r7 ADVICE), so a unique row id joins the order key:
    the cumulative is then exactly defined per ROW and compared
    row-by-row, while ties on k still straddle range-partition
    boundaries (the case the offset algebra must survive)."""
    import pandas as pd

    from gcp_etl_spark.operators.quantiles import range_prefix_sums

    rows_id = [(g, k, i, wa, wb) for i, (g, k, wa, wb) in enumerate(rows)]
    df = spark.createDataFrame(
        rows_id, "g int, k int, rid int, wa long, wb long"
    )
    cum, psums = range_prefix_sums(
        df, ["k", "rid"], ["wa", "wb"], part_cols=["g"], n_parts=n_parts
    )
    got = {
        (r["g"], r["rid"]): (r["wa_cum"], r["wb_cum"])
        for r in cum.collect()
    }
    pdf = pd.DataFrame(
        rows_id, columns=["g", "k", "rid", "wa", "wb"]
    ).sort_values(["g", "k", "rid"])
    pdf["ca"] = pdf.groupby("g")["wa"].cumsum()
    pdf["cb"] = pdf.groupby("g")["wb"].cumsum()
    assert len(got) == len(pdf)
    for _, w in pdf.iterrows():
        assert got[(w["g"], w["rid"])] == (w["ca"], w["cb"]), (dict(w), got)
    # totals: per-group partial sums fold to the exact group sums
    tots = {
        r["g"]: (r["ta"], r["tb"])
        for r in psums.groupBy("g")
        .agg(F.sum("wa_psum").alias("ta"), F.sum("wb_psum").alias("tb"))
        .collect()
    }
    gt = pdf.groupby("g").agg(ta=("wa", "sum"), tb=("wb", "sum"))
    for g, (ta, tb) in tots.items():
        assert (ta, tb) == (gt.loc[g]["ta"], gt.loc[g]["tb"])
