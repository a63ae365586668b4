"""Round-11 pins: contracts for the r11 operators, each independent of
the DuckDB oracle (the rows-only queries' correctness evidence)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _run(spark, name):
    from gcp_etl_spark.queries import load_all

    return load_all()[name].fn(spark, SF_SMALL)


def test_ivf_refine_curve_inertia_monotone_and_recall_bounded(spark):
    """r10 verdict ask #8: the refine operating curve's contract —
    (a) one row per grid point, (b) full-corpus mean inertia is
    NON-INCREASING in refine_iters (Lloyd monotonicity: every
    distributed pass reassigns-then-recenters, neither step can raise
    the objective — this is the property that justifies paying for
    refinement at 100 TB), (c) recall@k in [0,1], and (d) the
    refine_iters=0 row is the sample-only default build, so the curve
    directly prices the default-vs-refined decision."""
    rows = {
        r["refine_iters"]: r
        for r in _run(spark, "ann_ivf_refine_recall_curve").collect()
    }
    assert set(rows) == {0, 1, 2}
    inertias = [rows[r]["mean_inertia"] for r in (0, 1, 2)]
    # 6dp-rounded values: allow equality (converged), never an increase
    assert inertias[0] >= inertias[1] >= inertias[2], inertias
    for r in (0, 1, 2):
        assert 0.0 <= rows[r]["recall_at_k"] <= 1.0, rows[r]


def test_kll_sketch_rank_error_mass_and_determinism(spark):
    """The KLL sketch's contract (operators/kll.py): (a) MASS — the
    summed 2^level weights equal the exact row count (compaction
    halves a buffer but doubles its weight; nothing is lost or
    invented); (b) ACCURACY — every decile estimate's true rank is
    within 2% of the target rank at k=256 (the empirical gate for the
    deterministic sweep variant); (c) DETERMINISM — same data + same
    partitioning => identical estimates (the property the driver
    contract needs, and what the sweep derandomization buys)."""
    import numpy as np
    import pandas as pd

    vals = pd.read_parquet(
        f"{SF_SMALL}/lineitem.parquet", columns=["l_extendedprice"]
    )["l_extendedprice"].to_numpy()
    vals_sorted = np.sort(vals)
    n = len(vals)

    rows = {
        r["qname"]: r
        for r in _run(spark, "agg_kll_quantile_sketch").collect()
    }
    assert rows["q50"]["weighted_n"] == n
    for i in range(1, 10):
        est = rows[f"q{10 * i}"]["est"]
        true_rank = np.searchsorted(vals_sorted, est, side="right") / n
        assert abs(true_rank - i / 10) <= 0.02, (
            i, est, true_rank,
        )

    again = {
        r["qname"]: r["est"]
        for r in _run(spark, "agg_kll_quantile_sketch").collect()
    }
    assert again == {q: r["est"] for q, r in rows.items()}


def test_stream_quantile_monitor_batching_invariant(spark):
    """The monitor's only stateful stage is the additive windowed
    bucket count, so ANY micro-batch split must produce the same
    result: split the events corpus in half by event_id parity, build
    each half's windowed counts, MERGE by addition (what the
    streaming state store does across micro-batches), and assert the
    quantile fold over merged counts equals the single-batch run."""
    from pyspark.sql import functions as F

    from gcp_etl_spark.streaming.windows import (
        w1_binned_counts,
        window_bucket_quantiles,
    )
    from gcp_etl_spark.tables import t as tbl

    probs = {"p50_bucket": 0.5, "p90_bucket": 0.9, "p99_bucket": 0.99}
    e = tbl(spark, SF_SMALL, "events")
    whole = {
        r["w_start"]: (r["p50_bucket"], r["p90_bucket"], r["p99_bucket"])
        for r in window_bucket_quantiles(
            w1_binned_counts(e, watermark=None), probs
        ).collect()
    }
    halves = [
        w1_binned_counts(
            e.filter(F.col("event_id") % 2 == i), watermark=None
        )
        for i in (0, 1)
    ]
    merged = (
        halves[0]
        .unionByName(halves[1])
        .groupBy("w_start", "b")
        .agg(F.sum("n").alias("n"))
    )
    again = {
        r["w_start"]: (r["p50_bucket"], r["p90_bucket"], r["p99_bucket"])
        for r in window_bucket_quantiles(merged, probs).collect()
    }
    assert whole == again and len(whole) > 1


def _pd(table, cols=None):
    import pandas as pd

    return pd.read_parquet(f"{SF_SMALL}/{table}.parquet", columns=cols)


def test_kaplan_meier_matches_python_replay(spark):
    """Oracle-independent KM: replay the product-limit estimator in
    pure Python from the raw parquet (durations, censoring, at-risk
    bookkeeping all re-derived) and compare every output row."""
    import math

    import pandas as pd

    li = _pd("lineitem", ["l_orderkey", "l_shipdate"])
    o = _pd(
        "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"]
    )
    first = li.groupby("l_orderkey")["l_shipdate"].min().reset_index()
    j = o.merge(first, left_on="o_orderkey", right_on="l_orderkey")
    dur = (
        (
            pd.to_datetime(j["l_shipdate"]).dt.normalize()
            - pd.to_datetime(j["o_orderdate"]).dt.normalize()
        ).dt.days.clip(lower=0)
        // 7
    ).clip(upper=52)
    ev = (j["o_orderstatus"] == "F").astype(int)
    df = pd.DataFrame({"t": dur, "ev": ev})
    grid = (
        df.groupby("t")
        .agg(d=("ev", "sum"), n=("ev", "size"))
        .sort_index()
    )
    total = len(df)
    rows = {
        r["t"]: r
        for r in _run(spark, "analytics_kaplan_meier").collect()
    }
    s = 1.0
    consumed = 0
    for t_, g in grid.iterrows():
        n_risk = total - consumed
        s *= 1.0 - g["d"] / n_risk
        consumed += g["n"]
        if g["d"] > 0:
            r = rows[t_]
            assert r["n_risk"] == n_risk and r["d_events"] == g["d"]
            assert math.isclose(
                r["km_survival"], round(s, 6), abs_tol=1e-6
            ), (t_, r["km_survival"], s)
    assert set(rows) == {t_ for t_, g in grid.iterrows() if g["d"] > 0}


def test_ndcg_and_ap_match_python(spark):
    """Oracle-independent ranking-eval pins: recompute NDCG@10 and AP
    per priority group in pure Python (independent ranking, gains,
    and discounts) and compare."""
    import math

    li = _pd(
        "lineitem", ["l_orderkey", "l_partkey", "l_extendedprice",
                     "l_quantity"]
    )
    o = _pd("orders", ["o_orderkey", "o_orderpriority"])
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["item"] = j["l_partkey"] % 50
    j["cents"] = (j["l_extendedprice"] * 100).round().astype("int64")
    g = (
        j.groupby(["o_orderpriority", "item"])
        .agg(cents=("cents", "sum"), qty=("l_quantity", "sum"))
        .reset_index()
    )
    ndcg_rows = {
        r["grp"]: r for r in _run(spark, "eval_ndcg_at_k").collect()
    }
    ap_rows = {
        r["grp"]: r
        for r in _run(spark, "eval_average_precision").collect()
    }
    for grp, sub in g.groupby("o_orderpriority"):
        sub = sub.copy()
        maxq = int(sub["qty"].max())
        sub["rel"] = (4 * sub["qty"].astype(int) // maxq).clip(upper=3)
        pred = sub.sort_values(
            ["cents", "item"], ascending=[False, True]
        )
        ideal = sub.sort_values(
            ["rel", "cents", "item"], ascending=[False, False, True]
        )
        w = lambda r: 1.0 / math.log2(r + 1)  # noqa: E731
        dcg = sum(
            (2 ** int(rel) - 1) * w(i + 1)
            for i, rel in enumerate(pred["rel"].head(10))
        )
        idcg = sum(
            (2 ** int(rel) - 1) * w(i + 1)
            for i, rel in enumerate(ideal["rel"].head(10))
        )
        r = ndcg_rows[grp]
        assert math.isclose(r["dcg_at_k"], round(dcg, 6), abs_tol=2e-6)
        assert math.isclose(
            r["ndcg_at_k"], round(dcg / idcg, 6), abs_tol=2e-6
        )
        # AP: binary rel = grade >= 2, full predicted ranking
        rels = (pred["rel"] >= 2).astype(int).tolist()
        hits = 0
        ap = 0.0
        for i, rl in enumerate(rels, start=1):
            if rl:
                hits += 1
                ap += hits / i
        ap /= max(1, sum(rels))
        ra = ap_rows[grp]
        assert ra["n_relevant"] == sum(rels)
        assert math.isclose(
            ra["average_precision"], round(ap, 6), abs_tol=2e-6
        )


def test_chow_and_newey_west_match_numpy(spark):
    """Oracle-independent regression pins: recompute the Chow F and
    the HAC standard errors with numpy lstsq / explicit residual
    algebra (no shared code with either engine)."""
    import math

    import numpy as np
    import pandas as pd

    o = _pd("orders", ["o_orderdate", "o_totalprice"])
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    day = (
        pd.to_datetime(o["o_orderdate"]).dt.normalize()
        - pd.Timestamp("1970-01-01")
    ).dt.days
    d = (
        pd.DataFrame({"x": day, "y": cents})
        .groupby("x")["y"]
        .sum()
        .sort_index()
    )
    x, y = d.index.to_numpy(float), d.to_numpy(float)

    def rss_slope(xs, ys):
        A = np.vstack([xs, np.ones_like(xs)]).T
        coef, res, *_ = np.linalg.lstsq(A, ys, rcond=None)
        pred = A @ coef
        return float(((ys - pred) ** 2).sum()), float(coef[0])

    cut = (x.min() + x.max()) // 2
    r1, b1 = rss_slope(x[x <= cut], y[x <= cut])
    r2, b2 = rss_slope(x[x > cut], y[x > cut])
    rp, _ = rss_slope(x, y)
    n = len(x)
    f = ((rp - r1 - r2) / 2) / ((r1 + r2) / (n - 4))
    row = _run(spark, "stats_chow_test").collect()[0]
    assert row["n1"] == int((x <= cut).sum())
    assert math.isclose(row["slope_pre"], b1, rel_tol=1e-6)
    assert math.isclose(row["slope_post"], b2, rel_tol=1e-6)
    assert math.isclose(row["chow_f"], f, rel_tol=1e-5), (
        row["chow_f"], f,
    )

    # Newey-West lag-1 (Bartlett weight 0.5) on the same series
    xc = x - x.mean()
    b = (xc * (y - y.mean())).sum() / (xc * xc).sum()
    e = (y - y.mean()) - b * xc
    u = xc * e
    s0 = float((u * u).sum())
    s1 = float((u[1:] * u[:-1]).sum())
    sxx = float((xc * xc).sum())
    se_w = math.sqrt(s0 / sxx**2)
    se_h = math.sqrt((s0 + 2 * 0.5 * s1) / sxx**2)
    rw = _run(spark, "analytics_newey_west").collect()[0]
    assert math.isclose(rw["se_white"], se_w, rel_tol=1e-6)
    assert math.isclose(rw["se_hac_lag1"], se_h, rel_tol=1e-6)
    assert math.isclose(
        rw["hac_inflation"], se_h / se_w, rel_tol=1e-6
    )


def test_two_way_anova_matches_numpy(spark):
    """Oracle-independent two-way ANOVA: recompute the unweighted
    sums of squares directly from cell/margin means in pandas."""
    import math

    import pandas as pd

    o = _pd("orders", ["o_orderdate", "o_totalprice", "o_orderpriority"])
    y = (o["o_totalprice"] * 100).round().astype("int64")
    day = (
        pd.to_datetime(o["o_orderdate"]).dt.normalize()
        - pd.Timestamp("1970-01-01")
    ).dt.days
    df = pd.DataFrame(
        {"a": o["o_orderpriority"], "b": day % 7, "y": y.astype(float)}
    )
    n = len(df)
    cm = df["y"].sum() ** 2 / n
    sst = (df["y"] ** 2).sum() - cm
    sa = sum(
        g["y"].sum() ** 2 / len(g) for _, g in df.groupby("a")
    )
    sb = sum(
        g["y"].sum() ** 2 / len(g) for _, g in df.groupby("b")
    )
    sg = sum(
        g["y"].sum() ** 2 / len(g) for _, g in df.groupby(["a", "b"])
    )
    ssa, ssb = sa - cm, sb - cm
    ssab = sg - sa - sb + cm
    ssw = (df["y"] ** 2).sum() - sg
    ka, kb = df["a"].nunique(), df["b"].nunique()
    row = _run(spark, "stats_two_way_anova").collect()[0]
    assert row["n"] == n
    assert math.isclose(row["eta2_priority"], ssa / sst, rel_tol=1e-4)
    assert math.isclose(
        row["f_interaction"],
        (ssab / ((ka - 1) * (kb - 1))) / (ssw / (n - ka * kb)),
        rel_tol=1e-4,
    )


def test_shapley_values_match_python_and_sum_to_efficiency(spark):
    """Oracle-independent Shapley pin: rebuild exposure sets and
    subset conversion rates in pandas, compute the 3-player Shapley
    values independently, AND assert the efficiency axiom —
    the values sum to v(grand coalition) - v(empty) (0-coalesced
    unmeasured subsets exactly as documented)."""
    import math

    import pandas as pd

    e = _pd("events", ["user_id", "ts", "event_type"])
    first_p = (
        e[e["event_type"] == "purchase"]
        .groupby("user_id")["ts"]
        .min()
    )
    ch = e[e["event_type"].isin(["click", "signup", "view"])].copy()
    ch["pts"] = ch["user_id"].map(first_p)
    ch = ch[ch["pts"].isna() | (ch["ts"] < ch["pts"])]
    sub = (
        ch.groupby("user_id")
        .agg(
            s=("event_type", lambda v: "".join(sorted({x[0] for x in v}))),
            conv=("pts", lambda v: int(v.notna().any())),
        )
    )
    rates = sub.groupby("s")["conv"].mean().to_dict()
    v = lambda key: rates.get(key, 0.0)  # noqa: E731

    def shap(i, j, k):
        key = lambda *cs: "".join(sorted(cs))  # noqa: E731
        return (
            (1 / 3) * (v(key(i)) - v(""))
            + (1 / 6) * (v(key(i, j)) - v(key(j)))
            + (1 / 6) * (v(key(i, k)) - v(key(k)))
            + (1 / 3) * (v(key(i, j, k)) - v(key(j, k)))
        )

    want = {
        "click": shap("c", "s", "v"),
        "signup": shap("s", "c", "v"),
        "view": shap("v", "c", "s"),
    }
    got = {
        r["channel"]: r["shapley"]
        for r in _run(spark, "analytics_shapley_attribution").collect()
    }
    for chn, val in want.items():
        assert math.isclose(got[chn], round(val, 6), abs_tol=1e-6), (
            chn, got[chn], val,
        )
    # efficiency axiom (within the 6dp output rounding)
    assert math.isclose(
        sum(got.values()), v("csv") - v(""), abs_tol=3e-6
    )
