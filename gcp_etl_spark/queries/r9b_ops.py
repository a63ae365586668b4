"""Round-9 second batch: effect sizes and ordinal association
(Cohen's d / Hedges' g, Cochran-Armitage trend, Goodman-Kruskal gamma
+ Somers' D, Cronbach's alpha), distribution distance (exact 1-D
Wasserstein), and concentration curves (Lorenz deciles).

Exactness conventions (the r9_ops house rules):
- counts and integer-valued measures accumulate as BIGINTs; money
  accumulates as round(x*100) cents or DECIMAL(18,2) per `_exact.py`;
- closed-form statistics are computed in double from bitwise-identical
  operands on both engines, rounded 6dp at the very end;
- contingency-table statistics reduce the fact table to a tiny cell
  grid FIRST (one hash agg), then do all pair algebra on the grid —
  the grid is bounded by the attribute cardinalities, never the data.

No reference counterpart (the reference's query surface is
k8s/submit/etl-on-gcp-vinicius-campos.py:22-92 — SELECT * LIMIT 100
plus two counts); these extend the declared analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t

# ------------------------------------------------ Cohen's d / Hedges' g


@query(
    "stats_cohens_d",
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS flag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS s1,
             CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6)))
                  AS DOUBLE) AS s2
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
      GROUP BY 1
    ), v AS (
      SELECT flag, n, s1 / n AS mu,
             (s2 - s1 * s1 / n) / (n - 1) AS s2v
      FROM g
    ), w AS (
      SELECT max(CASE WHEN flag = 'A' THEN n END) AS n1,
             max(CASE WHEN flag = 'A' THEN mu END) AS m1,
             max(CASE WHEN flag = 'A' THEN s2v END) AS v1,
             max(CASE WHEN flag = 'R' THEN n END) AS n2,
             max(CASE WHEN flag = 'R' THEN mu END) AS m2,
             max(CASE WHEN flag = 'R' THEN s2v END) AS v2
      FROM v
    )
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_r,
           round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2)
                 / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)),
                 6) AS cohens_d,
           round((m1 - m2)
                 / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
                 * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) AS hedges_g
    FROM w
    """,
    tags=("stats", "effect-size", "lineitem"),
)
def stats_cohens_d(spark, sf_dir):
    """COHEN'S d + HEDGES' g (standardized mean difference — the
    effect size the suite's t-tests report significance WITHOUT):
    pooled-SD d between returned ('R') and alert ('A') line
    quantities, with Hedges' small-sample bias correction
    J = 1 - 3/(4N - 9). Quantities are integral, so the decimal power
    sums are exact; the statistic is identical IEEE arithmetic both
    sides.

    Scale: ONE grouped moment pass over the filtered scan (map-side
    partial aggregation), then a 2-row pivot fold."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
    )
    q = F.col("l_quantity")
    g = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q.cast("decimal(20,6)")).cast("double").alias("s1"),
        F.sum((q * q).cast("decimal(28,6)")).cast("double").alias("s2"),
    )
    v = g.select(
        "flag",
        "n",
        (F.col("s1") / F.col("n")).alias("mu"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("s2v"),
    )
    pick = lambda fl, c: F.max(  # noqa: E731
        F.when(F.col("flag") == fl, F.col(c))
    )
    w = v.agg(
        pick("A", "n").alias("n1"),
        pick("A", "mu").alias("m1"),
        pick("A", "s2v").alias("v1"),
        pick("R", "n").alias("n2"),
        pick("R", "mu").alias("m2"),
        pick("R", "s2v").alias("v2"),
    )
    sp = F.sqrt(
        (
            (F.col("n1") - 1) * F.col("v1")
            + (F.col("n2") - 1) * F.col("v2")
        )
        / (F.col("n1") + F.col("n2") - 2)
    )
    d = (F.col("m1") - F.col("m2")) / sp
    j = 1.0 - 3.0 / (4.0 * (F.col("n1") + F.col("n2")) - 9.0)
    return w.select(
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_r"),
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * j, 6).alias("hedges_g"),
    )


# ------------------------------------------- Cochran-Armitage trend


@query(
    "stats_cochran_armitage_trend",
    oracle="""
    WITH g AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s,
             count(*) AS n,
             sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS r
      FROM orders GROUP BY 1
    ), a AS (
      SELECT sum(n) AS nn, sum(r) AS rr,
             sum(s * r) AS sr, sum(s * n) AS sn,
             sum(s * s * n) AS s2n
      FROM g
    )
    SELECT CAST(nn AS BIGINT) AS n, CAST(rr AS BIGINT) AS n_success,
           round((sr - CAST(sn AS DOUBLE) * rr / nn)
                 / sqrt((CAST(rr AS DOUBLE) / nn)
                        * (1.0 - CAST(rr AS DOUBLE) / nn)
                        * (s2n - CAST(sn AS DOUBLE) * sn / nn)), 6)
             AS z_trend,
           round(pow(sr - CAST(sn AS DOUBLE) * rr / nn, 2)
                 / ((CAST(rr AS DOUBLE) / nn)
                    * (1.0 - CAST(rr AS DOUBLE) / nn)
                    * (s2n - CAST(sn AS DOUBLE) * sn / nn)), 6)
             AS chi2_trend
    FROM a
    """,
    tags=("stats", "hypothesis-test", "trend", "orders"),
)
def stats_cochran_armitage_trend(spark, sf_dir):
    """COCHRAN-ARMITAGE TREND TEST (dose-response for proportions
    across ORDERED groups — what the suite's chi-square cannot see:
    a monotone drift in success rate): dose score = the priority's
    leading digit (1-URGENT .. 5-LOW), success = finished status 'F'.
    T = Σ s·r − (Σ s·n)·R/N, Var = p̄(1−p̄)(Σ s²n − (Σ sn)²/N),
    z = T/√Var. Every accumulator is an exact BIGINT; only the final
    closed form runs in double.

    Scale: one 5-row grouped count pass, then a 1-row fold — the
    standard contingency reduction."""
    o = t(spark, sf_dir, "orders")
    g = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("s")
    ).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
        ).alias("r"),
    )
    a = g.agg(
        F.sum("n").alias("nn"),
        F.sum("r").alias("rr"),
        F.sum(F.col("s") * F.col("r")).alias("sr"),
        F.sum(F.col("s") * F.col("n")).alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n")).alias("s2n"),
    )
    nn = F.col("nn").cast("double")
    pbar = F.col("rr").cast("double") / nn
    tnum = F.col("sr") - F.col("sn").cast("double") * F.col("rr") / nn
    var = (
        pbar
        * (1.0 - pbar)
        * (F.col("s2n") - F.col("sn").cast("double") * F.col("sn") / nn)
    )
    return a.select(
        F.col("nn").cast("long").alias("n"),
        F.col("rr").cast("long").alias("n_success"),
        F.round(tnum / F.sqrt(var), 6).alias("z_trend"),
        F.round(F.pow(tnum, 2) / var, 6).alias("chi2_trend"),
    )


# -------------------------------------------------- Cronbach's alpha


@query(
    "stats_cronbach_alpha",
    oracle="""
    WITH u AS (SELECT count(DISTINCT user_id) AS nu FROM events),
    k AS (SELECT count(DISTINCT event_type) AS k FROM events),
    cell AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    item AS (  -- per-item population variance, zero-filled via sums
      SELECT event_type,
             sum(c) AS s1, sum(c * c) AS s2
      FROM cell GROUP BY 1
    ),
    itemvar AS (
      SELECT sum((s2 - CAST(s1 AS DOUBLE) * s1 / nu) / nu) AS sum_var
      FROM item, u
    ),
    totrow AS (
      SELECT user_id, sum(c) AS tot FROM cell GROUP BY 1
    ),
    totvar AS (
      SELECT (sum(tot * tot)
              - CAST(sum(tot) AS DOUBLE) * sum(tot) / max(nu))
             / max(nu) AS var_total
      FROM totrow, u
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(nu AS BIGINT) AS n_users,
           round(CAST(k AS DOUBLE) / (k - 1)
                 * (1.0 - sum_var / var_total), 6) AS cronbach_alpha
    FROM k, u, itemvar, totvar
    """,
    tags=("stats", "reliability", "events"),
)
def stats_cronbach_alpha(spark, sf_dir):
    """CRONBACH'S ALPHA (internal-consistency reliability — do the k
    per-user activity counters measure one latent engagement trait?):
    items = the k event types, subjects = users, score = per-user
    per-type event count, α = k/(k−1)·(1 − Σ var_item / var_total).

    ZERO-FILL VIA SUMS: a user missing a type scores 0, which
    contributes nothing to Σc or Σc² — so population variances over
    ALL users come straight from the present-cell integer sums and
    the global user count, with no pivot and no dense user × type
    materialization (the thing that would not scale).

    Scale: one (user,type) grouped count (map-side partial), two tiny
    reductions over it, one exact distinct-user count."""
    e = t(spark, sf_dir, "events")
    cell = e.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c")
    )
    u = e.agg(F.countDistinct("user_id").alias("nu"))
    k = e.agg(F.countDistinct("event_type").alias("k"))
    item = cell.groupBy("event_type").agg(
        F.sum("c").alias("s1"), F.sum(F.col("c") * F.col("c")).alias("s2")
    )
    itemvar = item.crossJoin(u).agg(
        F.sum(
            (
                F.col("s2")
                - F.col("s1").cast("double") * F.col("s1") / F.col("nu")
            )
            / F.col("nu")
        ).alias("sum_var")
    )
    totrow = cell.groupBy("user_id").agg(F.sum("c").alias("tot"))
    totvar = totrow.crossJoin(u).agg(
        (
            (
                F.sum(F.col("tot") * F.col("tot"))
                - F.sum("tot").cast("double")
                * F.sum("tot")
                / F.first("nu")
            )
            / F.first("nu")
        ).alias("var_total")
    )
    return (
        k.crossJoin(u)
        .crossJoin(itemvar)
        .crossJoin(totvar)
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("nu").cast("long").alias("n_users"),
            F.round(
                F.col("k").cast("double")
                / (F.col("k") - 1)
                * (1.0 - F.col("sum_var") / F.col("var_total")),
                6,
            ).alias("cronbach_alpha"),
        )
    )


# ------------------------------------------- exact 1-D Wasserstein


@query(
    "stats_wasserstein_1d",
    oracle="""
    WITH v AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cr
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
      GROUP BY 1
    ), tot AS (
      SELECT sum(ca) AS na, sum(cr) AS nr FROM v
    ), cum AS (
      SELECT q,
             sum(ca) OVER (ORDER BY q) AS fa,
             sum(cr) OVER (ORDER BY q) AS fr,
             lead(q) OVER (ORDER BY q) AS q_next
      FROM v
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nr AS BIGINT) AS n_r,
           round(CAST(sum(abs(fa * nr - fr * na) * (q_next - q))
                      AS DOUBLE)
                 / (CAST(na AS DOUBLE) * nr), 6) AS wasserstein_1
    FROM cum, tot
    WHERE q_next IS NOT NULL
    GROUP BY na, nr
    """,
    tags=("stats", "distribution-distance", "lineitem"),
)
def stats_wasserstein_1d(spark, sf_dir):
    """EXACT 1-D WASSERSTEIN (earth mover's) DISTANCE between the
    quantity distributions of returned vs alert line items:
    W₁ = ∫|F_A − F_B| dx over the shared support, evaluated exactly on
    the ≤50-point integer support as Σ |F_A(q)−F_B(q)|·Δq. The CDF
    difference stays an INTEGER the whole way (|cumA·N_R − cumR·N_A|),
    so the sum is order-free; one double division at the very end —
    the distribution-distance companion to the suite's KS (sup-norm)
    and Jensen-Shannon (density) tests, and the metric ANN/semdedup
    drift monitors care about.

    Scale: the fact scan collapses to the value support first (one
    hash agg, map-side partial); the cumulative window runs on ≤50
    support rows — structurally bounded, single partition by design."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
    )
    v = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.sum(
            F.when(F.col("l_returnflag") == "A", 1).otherwise(0)
        ).alias("ca"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("cr"),
    )
    tot = v.agg(F.sum("ca").alias("na"), F.sum("cr").alias("nr"))
    w = Window.orderBy("q")
    cum = v.select(
        "q",
        F.sum("ca").over(w).alias("fa"),
        F.sum("cr").over(w).alias("fr"),
        F.lead("q").over(w).alias("q_next"),
    )
    return (
        cum.filter(F.col("q_next").isNotNull())
        .crossJoin(tot)
        .groupBy("na", "nr")
        .agg(
            F.round(
                F.sum(
                    F.abs(
                        F.col("fa") * F.col("nr")
                        - F.col("fr") * F.col("na")
                    )
                    * (F.col("q_next") - F.col("q"))
                )
                .cast("double")
                / (F.col("na").cast("double") * F.col("nr")),
                6,
            ).alias("wasserstein_1")
        )
        .select(
            F.col("na").cast("long").alias("n_a"),
            F.col("nr").cast("long").alias("n_r"),
            "wasserstein_1",
        )
    )


# ---------------------------------------------------- Lorenz deciles


@query(
    "analytics_lorenz_deciles",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ), d AS (
      SELECT o_custkey, cents,
             ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
      FROM rev
    ), g AS (
      SELECT decile, count(*) AS n_cust, sum(cents) AS dec_cents
      FROM d GROUP BY 1
    )
    SELECT decile, n_cust,
           round(CAST(dec_cents AS DOUBLE)
                 / sum(dec_cents) OVER (), 6) AS rev_share,
           round(CAST(sum(dec_cents) OVER (ORDER BY decile) AS DOUBLE)
                 / sum(dec_cents) OVER (), 6) AS lorenz_cum_share
    FROM g ORDER BY decile
    """,
    tags=("analytics", "concentration", "orders"),
)
def analytics_lorenz_deciles(spark, sf_dir):
    """LORENZ CURVE at decile resolution (the curve behind the suite's
    Gini scalar): customers ranked by total spend (exact cents),
    ntile(10) with a deterministic custkey tie-break, per-decile
    revenue share and cumulative (Lorenz) share. The bottom-heavy
    read: lorenz_cum_share(d) = fraction of all revenue earned by the
    poorest 10·d% of customers.

    Scale: the global ntile ranks the AGGREGATED customer dimension
    (|customers| ≪ |orders|; the fact scan collapses first), the same
    deliberate pattern as analytics_gini — for fact-grained ranking
    use global_row_number_twopass. Cents stay BIGINT until the two
    share divisions."""
    o = t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("cents")
    )
    d = rev.select(
        "o_custkey",
        "cents",
        F.ntile(10).over(Window.orderBy("cents", "o_custkey")).alias(
            "decile"
        ),
    )
    g = d.groupBy("decile").agg(
        F.count("*").alias("n_cust"), F.sum("cents").alias("dec_cents")
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy("decile")
    return g.select(
        F.col("decile").cast("long").alias("decile"),
        "n_cust",
        F.round(
            F.col("dec_cents").cast("double")
            / F.sum("dec_cents").over(wall),
            6,
        ).alias("rev_share"),
        F.round(
            F.sum("dec_cents").over(wcum).cast("double")
            / F.sum("dec_cents").over(wall),
            6,
        ).alias("lorenz_cum_share"),
    ).orderBy("decile")


# ------------------------------------- Goodman-Kruskal gamma / Somers


@query(
    "stats_gamma_somers",
    oracle="""
    WITH lc AS (
      SELECT l_orderkey, count(*) AS n_lines
      FROM lineitem GROUP BY 1
    ), obs AS (
      SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS x,
             lc.n_lines AS y
      FROM orders o JOIN lc ON lc.l_orderkey = o.o_orderkey
    ), cell AS (
      SELECT x, y, count(*) AS n FROM obs GROUP BY 1, 2
    ), pair AS (
      SELECT sum(CASE WHEN b.x > a.x AND b.y > a.y
                      THEN a.n * b.n ELSE 0 END) AS c,
             sum(CASE WHEN b.x > a.x AND b.y < a.y
                      THEN a.n * b.n ELSE 0 END) AS d,
             sum(CASE WHEN b.x > a.x AND b.y = a.y
                      THEN a.n * b.n ELSE 0 END) AS ty
      FROM cell a JOIN cell b
        ON (b.x > a.x) OR (b.x = a.x AND b.y > a.y)
    )
    SELECT CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
           round((c - d) * 1.0 / (c + d), 6) AS gk_gamma,
           round((c - d) * 1.0 / (c + d + ty), 6) AS somers_dyx
    FROM pair
    """,
    tags=("stats", "ordinal-association", "orders", "lineitem"),
)
def stats_gamma_somers(spark, sf_dir):
    """GOODMAN-KRUSKAL GAMMA + SOMERS' D (ordinal association between
    order priority rank and order width in line items — the
    ordinal-ordinal slot next to the suite's Kendall tau, which ranks
    continuous pairs): concordant/discordant pair counts computed on
    the CONTINGENCY GRID, never on row pairs — each unordered cell
    pair is visited once via the (x,y)-lexicographic join predicate,
    contributing n_a·n_b pairs at integer exactness. γ ignores ties;
    Somers' d_yx (y = order width as the dependent) additionally
    charges pairs tied on y only, i.e. differing on x (ty).

    Scale: facts collapse to a ≤ 5×|line-widths| cell grid in one
    hash agg; the grid self-join is |cells|² ≈ tiny and constant in
    the data size — the defining trick of grid-based pair statistics
    (same family as stat_crosstab_exact)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    lc = li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    obs = o.join(lc, o.o_orderkey == lc.l_orderkey).select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("x"),
        F.col("n_lines").alias("y"),
    )
    cell = obs.groupBy("x", "y").agg(F.count("*").alias("n"))
    a = cell.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("n").alias("na")
    )
    b = cell.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("n").alias("nb")
    )
    pair = a.join(
        b,
        (F.col("xb") > F.col("xa"))
        | ((F.col("xb") == F.col("xa")) & (F.col("yb") > F.col("ya"))),
    ).agg(
        F.sum(
            F.when(
                (F.col("xb") > F.col("xa")) & (F.col("yb") > F.col("ya")),
                F.col("na") * F.col("nb"),
            ).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when(
                (F.col("xb") > F.col("xa")) & (F.col("yb") < F.col("ya")),
                F.col("na") * F.col("nb"),
            ).otherwise(0)
        ).alias("d"),
        F.sum(
            F.when(
                (F.col("xb") > F.col("xa")) & (F.col("yb") == F.col("ya")),
                F.col("na") * F.col("nb"),
            ).otherwise(0)
        ).alias("ty"),
    )
    return pair.select(
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.round((F.col("c") - F.col("d")) * 1.0 / (F.col("c") + F.col("d")), 6).alias(
            "gk_gamma"
        ),
        F.round(
            (F.col("c") - F.col("d"))
            * 1.0
            / (F.col("c") + F.col("d") + F.col("ty")),
            6,
        ).alias("somers_dyx"),
    )


# ------------------------------------- binary-segmentation changepoint


@query(
    "analytics_binseg_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ), idx AS (
      SELECT d,
             row_number() OVER (ORDER BY d) AS i,
             sum(cents) OVER (ORDER BY d) AS sl_c,
             count(*) OVER () AS nn,
             sum(cents) OVER () AS ss_c
      FROM daily
    ), gains AS (
      SELECT d, i AS n_left, nn - i AS n_right,
             (sl_c / 100.0) / i AS mean_left,
             (ss_c / 100.0 - sl_c / 100.0) / (nn - i) AS mean_right,
             (sl_c / 100.0) * (sl_c / 100.0) / i
               + (ss_c / 100.0 - sl_c / 100.0)
                 * (ss_c / 100.0 - sl_c / 100.0) / (nn - i)
               - (ss_c / 100.0) * (ss_c / 100.0) / nn AS gain
      FROM idx WHERE i < nn
    )
    SELECT d AS split_date, CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           round(mean_left, 4) AS mean_left,
           round(mean_right, 4) AS mean_right,
           round(gain, 4) AS sse_gain
    FROM gains ORDER BY gain DESC, d LIMIT 1
    """,
    tags=("analytics", "changepoint", "time-series", "orders"),
)
def analytics_binseg_changepoint(spark, sf_dir):
    """BINARY-SEGMENTATION CHANGEPOINT (one step of the classic binseg
    recursion — the offline complement to the suite's sequential CUSUM
    and Page-Hinkley detectors): the split t of the daily-revenue
    series maximizing the SSE reduction
    gain(t) = S_l²/n_l + S_r²/n_r − S²/N (the Σy² terms cancel, so no
    second-moment pass is needed). Deterministic date tie-break.

    EXACTNESS: daily revenue is an exact BIGINT cents sum scaled to
    dollars (exact doubles); every downstream operand is then
    bit-identical on both engines, so the double gains — and the
    argmax ordering over them — agree exactly.

    Scale: the fact scan collapses to the calendar-bounded daily
    relation first; prefix sums + the argmax are windows over ≤|days|
    rows (structurally bounded single partition), and the final pick
    is a TopK(1)."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("cents")
    )
    w = Window.orderBy("d")
    wall = Window.partitionBy()
    idx = daily.select(
        "d",
        F.row_number().over(w).alias("i"),
        F.sum("cents").over(w).alias("sl_c"),
        F.count("*").over(wall).alias("nn"),
        F.sum("cents").over(wall).alias("ss_c"),
    )
    # prefix sums stay exact BIGINT cents (a windowed double sum would
    # differ across engines: DuckDB's segment-tree pairwise order vs
    # Spark's sequential order); dollars appear only in the closed form
    sl = F.col("sl_c") / 100.0
    ss = F.col("ss_c") / 100.0
    g = idx.filter(F.col("i") < F.col("nn")).select(
        "d",
        F.col("i").alias("n_left"),
        (F.col("nn") - F.col("i")).alias("n_right"),
        (sl / F.col("i")).alias("mean_left"),
        ((ss - sl) / (F.col("nn") - F.col("i"))).alias("mean_right"),
        (
            sl * sl / F.col("i")
            + (ss - sl) * (ss - sl) / (F.col("nn") - F.col("i"))
            - ss * ss / F.col("nn")
        ).alias("gain"),
    )
    return (
        g.orderBy(F.desc("gain"), "d")
        .limit(1)
        .select(
            F.col("d").alias("split_date"),
            F.col("n_left").cast("long").alias("n_left"),
            F.col("n_right").cast("long").alias("n_right"),
            F.round("mean_left", 4).alias("mean_left"),
            F.round("mean_right", 4).alias("mean_right"),
            F.round("gain", 4).alias("sse_gain"),
        )
    )


# --------------------------------------- Lo-MacKinlay variance ratio

_VR_Q = 5


@query(
    "stats_variance_ratio",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS x
      FROM orders GROUP BY 1
    ), sc AS (
      SELECT count(*) - 1 AS tt,
             (max_by(x, d) - min_by(x, d)) / (count(*) - 1) AS mu
      FROM daily
    ), lagged AS (
      SELECT x - lag(x, 1) OVER (ORDER BY d) AS d1,
             x - lag(x, {_VR_Q}) OVER (ORDER BY d) AS dq
      FROM daily
    ), sums AS (
      SELECT
        CAST(sum(CAST((d1 - mu) * (d1 - mu) AS DECIMAL(38,6)))
             AS DOUBLE) AS s1,
        CAST(sum(CAST((dq - {_VR_Q} * mu) * (dq - {_VR_Q} * mu)
                      AS DECIMAL(38,6))) AS DOUBLE) AS sq,
        max(tt) AS tt
      FROM lagged, sc
    )
    SELECT CAST(tt + 1 AS BIGINT) AS n_days,
           round((sq / ({_VR_Q} * (tt - {_VR_Q} + 1.0)))
                 / (s1 / tt), 6) AS vr,
           round(((sq / ({_VR_Q} * (tt - {_VR_Q} + 1.0))) / (s1 / tt)
                  - 1.0)
                 / sqrt(2.0 * (2 * {_VR_Q} - 1) * ({_VR_Q} - 1)
                        / (3.0 * {_VR_Q} * tt)), 6) AS z_homosk
    FROM sums
    """,
    tags=("stats", "time-series", "random-walk", "orders"),
)
def stats_variance_ratio(spark, sf_dir):
    """LO-MACKINLAY VARIANCE RATIO TEST (q = 5): is the daily-revenue
    series a random walk? Under H0 the variance of q-day increments is
    q x the 1-day variance, so VR = σ²_q/(q·σ²_1) ≈ 1; the
    homoskedastic z uses the standard asymptotic variance
    2(2q−1)(q−1)/(3qT). Drift μ̂ = (x_T − x_0)/T, the ML estimator.

    EXACTNESS: increments derive from exact cents-scaled doubles, and
    each squared deviation is cast to DECIMAL per-term before summing
    (the text_bigram_lm trick) so the reduction is order-free.

    Scale: fact scan → calendar-bounded daily relation → two lag
    windows and one fold over ≤|days| rows."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            / 100.0
        ).alias("x")
    )
    sc = daily.agg(
        (F.count("*") - 1).alias("tt"),
        (
            (F.max_by("x", "d") - F.min_by("x", "d"))
            / (F.count("*") - 1)
        ).alias("mu"),
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        (F.col("x") - F.lag("x", 1).over(w)).alias("d1"),
        (F.col("x") - F.lag("x", _VR_Q).over(w)).alias("dq"),
    )
    sums = lagged.crossJoin(sc).agg(
        F.sum(
            ((F.col("d1") - F.col("mu")) * (F.col("d1") - F.col("mu"))).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("s1"),
        F.sum(
            (
                (F.col("dq") - _VR_Q * F.col("mu"))
                * (F.col("dq") - _VR_Q * F.col("mu"))
            ).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("sq"),
        F.max("tt").alias("tt"),
    )
    vr = (F.col("sq") / (_VR_Q * (F.col("tt") - _VR_Q + 1.0))) / (
        F.col("s1") / F.col("tt")
    )
    z = (vr - 1.0) / F.sqrt(
        2.0 * (2 * _VR_Q - 1) * (_VR_Q - 1) / (3.0 * _VR_Q * F.col("tt"))
    )
    return sums.select(
        (F.col("tt") + 1).cast("long").alias("n_days"),
        F.round(vr, 6).alias("vr"),
        F.round(z, 6).alias("z_homosk"),
    )


# ------------------------------------------------ Good-Turing spectrum


@query(
    "text_good_turing",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(regexp_replace(trim(lower(text)),
                    '\\s+', ' ', 'g'), ' ')) AS w
      FROM documents
    ), types AS (
      SELECT w, count(*) AS r FROM toks GROUP BY 1
    ), nt AS (
      SELECT sum(r) AS n_tokens FROM types
    ), spec AS (
      SELECT r, count(*) AS n_types FROM types GROUP BY 1
    )
    SELECT s.r, s.n_types,
           round((s.r + 1.0) * s2.n_types / s.n_types, 6) AS r_star,
           round(s.r * s.n_types * 1.0 / nt.n_tokens, 6) AS p_mass
    FROM spec s
    LEFT JOIN spec s2 ON s2.r = s.r + 1
    CROSS JOIN nt
    WHERE s.r <= 10
    ORDER BY s.r
    """,
    tags=("text", "lexicon", "smoothing", "documents"),
)
def text_good_turing(spark, sf_dir):
    """GOOD-TURING FREQUENCY SPECTRUM (the frequency-of-frequencies
    table N_r behind Good-Turing smoothing, Kneser-Ney's ancestor —
    companions: text_zipf_fit fits the rank law, text_hapax_ratio
    reads off N_1): for r ≤ 10, the type count N_r, the smoothed
    count r* = (r+1)·N_{r+1}/N_r, and the probability mass r·N_r/N.
    Row r = 1's p_mass IS the Good-Turing unseen-event estimate
    p₀ = N_1/N. N_{r+1} looks up by exact join (NULL when the
    spectrum has a gap), never by lead() over possibly-missing rows.

    Scale: tokens collapse to the type table in one hash agg (counts
    shuffle, text doesn't), the spectrum is a second tiny agg, and the
    r ≤ 10 output is constant-size."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.split(
                F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "),
                " ",
            )
        ).alias("w")
    )
    types = toks.groupBy("w").agg(F.count("*").alias("r"))
    nt = types.agg(F.sum("r").alias("n_tokens"))
    spec = types.groupBy("r").agg(F.count("*").alias("n_types"))
    s2 = spec.select(
        (F.col("r") - 1).alias("r_join"),
        F.col("n_types").alias("n_types_next"),
    )
    return (
        spec.filter(F.col("r") <= 10)
        .join(s2, F.col("r") == F.col("r_join"), "left")
        .crossJoin(nt)
        .select(
            "r",
            "n_types",
            F.round(
                (F.col("r") + 1.0)
                * F.col("n_types_next")
                / F.col("n_types"),
                6,
            ).alias("r_star"),
            F.round(
                F.col("r") * F.col("n_types") * 1.0 / F.col("n_tokens"), 6
            ).alias("p_mass"),
        )
        .orderBy("r")
    )


# ------------------------------------------------- SoftDeDup weights


@query(
    "dedup_soft_weights",
    oracle="""
    WITH h AS (
      SELECT source,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
               AS k
      FROM documents
    ), c AS (
      SELECT k, count(*) AS cnt FROM h GROUP BY 1
    )
    SELECT h.source,
           count(*) AS n_docs,
           CAST(sum(CAST(1.0 / c.cnt AS DECIMAL(38,18))) AS DOUBLE)
             AS effective_docs,
           round(1.0 - CAST(sum(CAST(1.0 / c.cnt AS DECIMAL(38,18)))
                            AS DOUBLE) / count(*), 6) AS dup_discount
    FROM h JOIN c USING (k)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("llm", "dedup", "weighting", "documents"),
)
def dedup_soft_weights(spark, sf_dir):
    """SOFT DEDUPLICATION WEIGHTS (SoftDeDup: down-weight duplicates
    instead of dropping them — each copy of a content appearing c
    times trains with weight 1/c, so every content contributes unit
    mass and no data is discarded): per source, the effective dataset
    size Σ 1/c and the duplication discount 1 − eff/n. The reweighting
    twin of dedup_exact (which keeps one copy) and dedup_rate_estimate
    (which only measures).

    EXACTNESS: 1/c is one IEEE division (bit-identical both engines);
    each term is cast to DECIMAL(38,18) before summing so the
    reduction is order-free (the per-term-cast house trick).

    Scale: digests shuffle, text doesn't — the md5 collapses each
    payload to 32 bytes before the count join; per-source output is
    |sources| rows."""
    d = t(spark, sf_dir, "documents").select(
        "source",
        F.md5(
            F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
        ).alias("k"),
    )
    c = d.groupBy("k").agg(F.count("*").alias("cnt"))
    eff = F.sum((1.0 / F.col("cnt")).cast("decimal(38,18)")).cast(
        "double"
    )
    return (
        d.join(c, "k")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            eff.alias("effective_docs"),
            F.round(1.0 - eff / F.count("*"), 6).alias("dup_discount"),
        )
        .orderBy("source")
    )


# ---------------------------------------------- point-in-polygon

# Simple star-shaped test polygon (lon, lat vertex ring, non-convex:
# four of the eight vertices pull inward, so ray casting is exercised
# on a shape where bounding-box or convex-hull tests would be wrong).
_PIP_POLY = [
    (-120.0, -60.0),
    (-30.0, -20.0),
    (60.0, -60.0),
    (30.0, 0.0),
    (60.0, 60.0),
    (-30.0, 20.0),
    (-120.0, 60.0),
    (-90.0, 0.0),
]


def _pip_crossings_sql() -> str:
    """ONE ray-casting expression string shared verbatim by BOTH
    engines (the geo_geohash_grid trick): for each polygon edge,
    count a crossing of the horizontal ray from (lon, lat) going
    east, via the classic semi-open rule. Identical IEEE arithmetic
    on identical literals ⇒ bit-identical crossing counts."""
    terms = []
    n = len(_PIP_POLY)
    for i in range(n):
        x1, y1 = _PIP_POLY[i]
        x2, y2 = _PIP_POLY[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({y1} > lat) <> ({y2} > lat)) AND "
            f"(lon < ({x2} - {x1}) * (lat - {y1}) / ({y2} - {y1}) "
            f"+ {x1}) THEN 1 ELSE 0 END)"
        )
    return " + ".join(terms)


@query(
    "geo_point_in_polygon",
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             CAST((event_id * 7919) % 360 - 180 AS DOUBLE) AS lon,
             CAST((event_id * 104729) % 180 - 90 AS DOUBLE) AS lat
      FROM events
    ), hit AS (
      SELECT event_type,
             CASE WHEN ({_pip_crossings_sql()}) % 2 = 1
                  THEN 1 ELSE 0 END AS inside
      FROM pts
    )
    SELECT event_type, count(*) AS n_points,
           CAST(sum(inside) AS BIGINT) AS n_inside,
           round(sum(inside) * 1.0 / count(*), 6) AS inside_share
    FROM hit GROUP BY 1 ORDER BY 1
    """,
    tags=("geo", "spatial", "events"),
)
def geo_point_in_polygon(spark, sf_dir):
    """POINT-IN-POLYGON via ray casting (even-odd rule) against a
    non-convex 8-vertex polygon — the spatial predicate underneath
    geofencing and region rollups, next to the suite's haversine and
    grid-blocking ops. Each point casts an eastward ray; crossings
    count per edge with the classic semi-open rule
    (y1 > lat) ≠ (y2 > lat), so shared vertices are counted once.

    The crossing expression is ONE generated SQL string evaluated
    verbatim by BOTH engines (the geo_geohash_grid convention):
    identical literals + identical IEEE ops ⇒ identical counts, no
    float-drift surface at all.

    Scale: a pure per-row map (no shuffle until the per-type count
    rollup); an 8-edge test is ~24 flops/row, and at 100 TB a real
    multi-polygon layer would broadcast the (small) vertex table and
    run the same per-partition arithmetic."""
    e = t(spark, sf_dir, "events")
    # multiplicative-hash lattice (coprime multipliers) so BOTH axes
    # cover their full range at every fixture scale — the raw ids are
    # near-sequential and would pin one axis to a narrow band
    pts = e.select(
        "event_type",
        ((F.col("event_id") * 7919) % 360 - 180)
        .cast("double")
        .alias("lon"),
        ((F.col("event_id") * 104729) % 180 - 90)
        .cast("double")
        .alias("lat"),
    )
    hit = pts.select(
        "event_type",
        F.when(
            F.expr(f"({_pip_crossings_sql()}) % 2 = 1"), 1
        ).otherwise(0).alias("inside"),
    )
    return (
        hit.groupBy("event_type")
        .agg(
            F.count("*").alias("n_points"),
            F.sum("inside").alias("n_inside"),
            F.round(F.sum("inside") * 1.0 / F.count("*"), 6).alias(
                "inside_share"
            ),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------ link prediction

from gcp_etl_spark.queries.graph_ops import N_NODES, _edges  # noqa: E402


@query(
    "graph_link_prediction",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT
        least(l_orderkey % {N_NODES}, l_partkey % {N_NODES}) AS u,
        greatest(l_orderkey % {N_NODES}, l_partkey % {N_NODES}) AS v
      FROM lineitem
      WHERE l_orderkey % {N_NODES} <> l_partkey % {N_NODES}
    ), adj AS (
      SELECT u AS n, v AS m FROM e UNION ALL SELECT v, u FROM e
    ), deg AS (
      SELECT n, count(*) AS d FROM adj GROUP BY 1
    ), cand AS (
      SELECT a1.n AS u, a2.n AS v, a1.m
      FROM adj a1 JOIN adj a2 ON a1.m = a2.m AND a1.n < a2.n
      WHERE NOT EXISTS (SELECT 1 FROM e
                        WHERE e.u = a1.n AND e.v = a2.n)
    ), sc AS (
      SELECT c.u, c.v, count(*) AS cn,
             CAST(sum(CAST(1.0 / dm.d AS DECIMAL(38,18))) AS DOUBLE)
               AS ra
      FROM cand c JOIN deg dm ON dm.n = c.m
      GROUP BY 1, 2
    )
    SELECT sc.u, sc.v, cn,
           CAST(du.d * dv.d AS BIGINT) AS pa,
           round(ra, 6) AS resource_alloc
    FROM sc JOIN deg du ON du.n = sc.u JOIN deg dv ON dv.n = sc.v
    ORDER BY ra DESC, sc.u, sc.v LIMIT 20
    """,
    tags=("graph", "link-prediction", "lineitem"),
)
def graph_link_prediction(spark, sf_dir):
    """LINK PREDICTION SCORES for NON-adjacent node pairs — the
    candidate side of the graph family (adamic_adar and
    jaccard_neighbors score EXISTING edges; this ranks wedge-connected
    pairs that are NOT yet edges, the actual recommendation task):
    common-neighbor count, preferential attachment deg_u·deg_v, and
    resource allocation Σ_{{m ∈ CN}} 1/deg(m) (Zhou-Lü-Zhang), top-20
    by RA. 1/deg is one IEEE division cast to DECIMAL per-term so the
    sum is order-free.

    Scale: wedges via the adjacency self-join through the shared
    neighbor (bounded by Σ deg(m)², never |V|²); non-edge filtering is
    a LEFT ANTI join; the degree lookups are unhinted equi-joins (AQE
    broadcasts when small); top-20 is TakeOrderedAndProject."""
    # r13: the graph_jaccard_neighbors bit-matrix form (guide §4.2)
    # replaces the wedge self-join + anti-join + degree joins. The
    # residue graph is ≤ N_NODES (=300) nodes BY CONSTRUCTION at any
    # corpus scale, so ONE bounded task builds the 300×300 bit matrix
    # and enumerates the non-adjacent wedge-connected pairs directly
    # (C = A·A > 0 and not A). EXACTNESS of the resource-allocation
    # sum: the r12 form summed per-term cast(1.0/deg(m) AS
    # decimal(38,18)) — an order-free exact decimal sum — so the task
    # does NOT sum floats; it emits per-(pair, common-neighbor-degree)
    # COUNTS (grouping the common neighbors of each pair by their
    # degree value), and Spark aggregates cnt · cast(1.0/dm AS
    # decimal(38,18)) — the identical decimal terms in exact integer
    # multiples. cn/pa are exact ints from the same matrices.
    e = _edges(spark, sf_dir).transform(barrier)
    adj = e.select(
        F.col("u").alias("n"), F.col("v").alias("m")
    ).unionAll(e.select(F.col("v").alias("n"), F.col("u").alias("m")))
    nb = adj.groupBy("n").agg(F.collect_set("m").alias("nm"))
    n_nodes = N_NODES

    def pair_deg_counts(batches):
        import numpy as np
        import pandas as pd

        A = np.zeros((n_nodes, n_nodes), dtype=bool)
        for pdf in batches:
            for n, nm in zip(pdf["n"], pdf["nm"]):
                A[int(n), np.asarray(nm, dtype=np.int64)] = True
        deg = A.sum(axis=1).astype(np.int64)
        C = A.astype(np.int32) @ A.astype(np.int32)
        iu, ju = np.nonzero(np.triu(C > 0, 1) & ~A)
        cols = {
            "cu": [], "cv": [], "du": [], "dv": [], "dm": [], "cnt": []
        }
        for d in np.unique(deg[deg > 0]):
            M = A[:, deg == d].astype(np.int32)
            Cd = M @ M.T
            cnt = Cd[iu, ju]
            keep = cnt > 0
            cols["cu"].append(iu[keep])
            cols["cv"].append(ju[keep])
            cols["du"].append(deg[iu[keep]])
            cols["dv"].append(deg[ju[keep]])
            cols["dm"].append(np.full(keep.sum(), d, dtype=np.int64))
            cols["cnt"].append(cnt[keep].astype(np.int64))
        out = {
            k: (np.concatenate(v) if v else np.empty(0, dtype=np.int64))
            for k, v in cols.items()
        }
        yield pd.DataFrame(
            {k: out[k].astype(np.int64) for k in
             ("cu", "cv", "du", "dv", "dm", "cnt")}
        )

    stats = nb.coalesce(1).mapInPandas(
        pair_deg_counts,
        "cu long, cv long, du long, dv long, dm long, cnt long",
    )
    # decimal widths chosen so cnt·term stays EXACT: term = 1/dm ≤ 1
    # fits decimal(19,18) with the same 18-digit rounding the old
    # decimal(38,18) cast produced, cnt ≤ N_NODES fits decimal(3,0),
    # and (19,18)×(3,0) → decimal(23,18) — under the 38 cap, so Spark
    # does NOT truncate the scale (a (38,18)×long product would be
    # forced to decimal(38,6), silently rounding before the sum)
    sc = stats.groupBy("cu", "cv", "du", "dv").agg(
        F.sum("cnt").alias("cn"),
        F.sum(
            F.col("cnt").cast("decimal(3,0)")
            * (1.0 / F.col("dm")).cast("decimal(19,18)")
        )
        .cast("double")
        .alias("ra"),
    )
    return (
        sc.select(
            F.col("cu").alias("u"),
            F.col("cv").alias("v"),
            "cn",
            (F.col("du") * F.col("dv")).cast("long").alias("pa"),
            F.round("ra", 6).alias("resource_alloc"),
        )
        .orderBy(F.desc("ra"), "u", "v")
        .limit(20)
    )


# ------------------------------------------------ parquet codecs

_IO_CODECS = ("gzip", "snappy", "zstd")


@query(
    "io_parquet_codecs",
    oracle=f"""
    WITH src AS (
      SELECT count(*) AS n_rows,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS price_cents
      FROM lineitem WHERE l_orderkey % 7 = 0
    )
    SELECT codec, n_rows, price_cents
    FROM (VALUES {", ".join(f"('{c}')" for c in sorted(_IO_CODECS))})
         codecs(codec), src
    ORDER BY codec
    """,
    tags=("io", "parquet", "compression", "lineitem"),
)
def io_parquet_codecs(spark, sf_dir):
    """PARQUET COMPRESSION CODEC ROUNDTRIP (gzip / snappy / zstd —
    the three production codecs; zstd is the modern default for cold
    data, snappy for hot): the same lineitem slice is written with
    each codec and read back, and the per-codec row count + exact
    cents checksum must reconstruct the source exactly — proving the
    codec choice never touches values, only bytes.

    Scale: codec is a per-row-group storage property; at 100 TB the
    pick trades scan CPU against storage/IO (zstd ≈ 2-3x smaller,
    snappy ≈ 2x faster decode), and this query is the correctness
    gate for flipping it per-table.

    Cites reference parquet write at
    k8s/submit/etl-on-gcp-vinicius-campos.py:90 (snappy default)."""
    import os

    from gcp_etl_spark.scratch import scratch_dir

    d = scratch_dir("io_codecs", fresh=True)
    src = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select("l_orderkey", "l_extendedprice")
    )
    outs = []
    for codec in sorted(_IO_CODECS):
        path = os.path.join(d, codec)
        src.write.mode("overwrite").option("compression", codec).parquet(
            path
        )
        back = spark.read.parquet(path)
        outs.append(
            back.agg(
                F.count("*").alias("n_rows"),
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                ).alias("price_cents"),
            ).select(F.lit(codec).alias("codec"), "n_rows", "price_cents")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("codec")


# ------------------------------------- VALUES + GROUP/ORDER BY ALL


@query(
    "sql_values_order_by_all",
    oracle="""
    SELECT m.band, o.o_orderstatus AS status, count(*) AS n_orders
    FROM orders o
    JOIN (VALUES ('1', 'high'), ('2', 'high'), ('3', 'mid'),
                 ('4', 'low'), ('5', 'low')) m(pfx, band)
      ON substr(o.o_orderpriority, 1, 1) = m.pfx
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("sql", "modern", "orders"),
)
def sql_values_order_by_all(spark, sf_dir):
    """VALUES inline table + GROUP BY ALL + ORDER BY ALL — three
    modern-SQL conveniences in one statement (the literal API surface
    next to sql_group_by_all): a VALUES-derived priority→band mapping
    joined to the fact table, grouped and ordered by every
    non-aggregate column implicitly. Spark 4 and DuckDB both resolve
    ALL the same way (grouping keys in select order), which this
    query hash-verifies.

    Scale: the inline table is a broadcast by construction; the
    aggregation is one hash agg."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_vob_v")
    return spark.sql(
        """
        SELECT m.band, o.o_orderstatus AS status,
               count(*) AS n_orders
        FROM orders_vob_v o
        JOIN (SELECT * FROM VALUES ('1', 'high'), ('2', 'high'),
                                   ('3', 'mid'), ('4', 'low'),
                                   ('5', 'low') AS v(pfx, band)) m
          ON substr(o.o_orderpriority, 1, 1) = m.pfx
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# --------------------------------------------- Holt-Winters additive

_HW_SPARK_FOLD = """
  aggregate(
    slice(ca, 8, CAST(dd - 7 AS INT)),
    named_struct('l', l0, 'b', b0, 's', s0, 'i', 6),
    (acc, c) -> named_struct(
      'l', 0.3D * (c / 100.0D - element_at(acc.s, (acc.i + 1) % 7 + 1))
           + 0.7D * (acc.l + acc.b),
      'b', 0.1D * ((0.3D * (c / 100.0D
                            - element_at(acc.s, (acc.i + 1) % 7 + 1))
                    + 0.7D * (acc.l + acc.b)) - acc.l) + 0.9D * acc.b,
      's', concat(
             slice(acc.s, 1, (acc.i + 1) % 7),
             array(0.2D * (c / 100.0D
                           - (0.3D * (c / 100.0D
                                      - element_at(acc.s,
                                                   (acc.i + 1) % 7 + 1))
                              + 0.7D * (acc.l + acc.b)))
                   + 0.8D * element_at(acc.s, (acc.i + 1) % 7 + 1)),
             slice(acc.s, (acc.i + 1) % 7 + 2, 7)),
      'i', acc.i + 1))"""


@query(
    "analytics_holt_winters",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ), arrs AS (
      SELECT count(*) AS dd, list(cents ORDER BY d) AS ca FROM daily
    ), base AS (
      SELECT dd, ca,
             list_sum(ca[1:7]) / 700.0 AS l0,
             (list_sum(ca[8:14]) / 700.0
              - list_sum(ca[1:7]) / 700.0) / 7.0 AS b0,
             list_transform(ca[1:7],
                            c -> c / 100.0 - list_sum(ca[1:7]) / 700.0)
               AS s0
      FROM arrs
    ), hw AS (
      SELECT 6 AS t, l0 AS l, b0 AS b, s0 AS s, dd, ca FROM base
      UNION ALL
      SELECT q.t + 1,
             q.lnew,
             0.1 * (q.lnew - q.l) + 0.9 * q.b,
             q.s[:q.slot] || [0.2 * (q.y - q.lnew) + 0.8 * q.sold]
               || q.s[q.slot + 2:],
             q.dd, q.ca
      FROM (
        SELECT hw.*,
               ((hw.t + 1) % 7) AS slot,
               ca[hw.t + 2] / 100.0 AS y,
               hw.s[((hw.t + 1) % 7) + 1] AS sold,
               0.3 * (ca[hw.t + 2] / 100.0
                      - hw.s[((hw.t + 1) % 7) + 1])
                 + 0.7 * (hw.l + hw.b) AS lnew
        FROM hw WHERE hw.t + 1 <= hw.dd - 1
      ) q
    ), fin AS (
      SELECT * FROM hw WHERE t = dd - 1
    )
    SELECT h,
           round(l + h * b + s[CAST((dd - 1 + h) % 7 AS INT) + 1], 6)
             AS forecast
    FROM fin, unnest(range(1, 8)) AS u(h)
    ORDER BY h
    """,
    tags=("analytics", "forecast", "time-series", "orders"),
)
def analytics_holt_winters(spark, sf_dir):
    """HOLT-WINTERS ADDITIVE triple exponential smoothing
    (α=0.3, β=0.1, γ=0.2, weekly season m=7) over the daily-revenue
    series, forecasting the next 7 days ŷ_h = ℓ + h·b + s_{t+h−m} —
    the seasonal upgrade of analytics_holt_trend (level+trend only)
    and the model-based counterpart of analytics_seasonality_index.

    CROSS-ENGINE EXACTNESS OF A 2,000+ STEP RECURRENCE: Spark runs the
    recursion as ONE F.aggregate fold over the cents array (state =
    level, trend, 7 seasonal slots, step index); the oracle runs the
    SAME recurrence as a recursive CTE. Daily inputs are exact BIGINT
    cents scaled by double literals ('D' suffixed on the Spark side —
    a bare 1.0 parses as DECIMAL there), every update is the same IEEE
    expression tree on both engines, so the final state is
    BIT-IDENTICAL after thousands of sequential ops (verified at all
    fixture scales), not merely close.

    Scale: the fact scan collapses to the calendar-bounded daily
    relation (≤ |days| rows at ANY corpus size); the fold is O(|days|)
    on one row — an inherently sequential recurrence, structurally
    safe because the series length is bounded by the calendar, not
    the data."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("cents")
    )
    arr = daily.agg(
        F.count("*").alias("dd"),
        F.expr(
            "transform(array_sort(collect_list(struct(d, cents))),"
            " p -> p.cents)"
        ).alias("ca"),
    )
    base = arr.select(
        "dd",
        "ca",
        F.expr(
            "aggregate(slice(ca, 1, 7), 0L, (a, c) -> a + c) / 700.0D"
        ).alias("l0"),
        F.expr(
            "(aggregate(slice(ca, 8, 7), 0L, (a, c) -> a + c) / 700.0D"
            " - aggregate(slice(ca, 1, 7), 0L, (a, c) -> a + c)"
            " / 700.0D) / 7.0D"
        ).alias("b0"),
    ).withColumn(
        "s0", F.expr("transform(slice(ca, 1, 7), c -> c / 100.0D - l0)")
    )
    fold = base.select("dd", F.expr(_HW_SPARK_FOLD).alias("st"))
    return (
        fold.select(
            F.explode(F.expr("sequence(1L, 7L)")).alias("h"),
            F.col("st.l").alias("l"),
            F.col("st.b").alias("b"),
            F.col("st.s").alias("s"),
            "dd",
        )
        .select(
            "h",
            F.round(
                F.expr(
                    "l + h * b"
                    " + element_at(s, CAST((dd - 1 + h) % 7 AS INT) + 1)"
                ),
                6,
            ).alias("forecast"),
        )
        .orderBy("h")
    )


# ------------------------------------------ isotonic (PAVA) calibration

_ISO_BINS = 20


@query(
    "calibration_isotonic_fit",
    oracle=f"""
    WITH obs AS (
      SELECT CAST(event_id % {_ISO_BINS} AS BIGINT) AS b,
             CASE WHEN value > 100 - 3 * (event_id % {_ISO_BINS})
                  THEN 1 ELSE 0 END AS y
      FROM events
    ), bin AS (
      SELECT b, count(*) AS n, sum(y) AS s FROM obs GROUP BY 1
    ), pre AS (
      SELECT b,
             sum(n) OVER (ORDER BY b) AS cn,
             sum(s) OVER (ORDER BY b) AS cs
      FROM bin
    ), seg AS (  -- weighted avg of bins i..j from prefix sums
      SELECT i.b AS i, j.b AS j,
             CAST(j.cs - coalesce(i0.cs, 0) AS DOUBLE)
               / (j.cn - coalesce(i0.cn, 0)) AS avg_ij
      FROM pre i
      JOIN pre j ON j.b >= i.b
      LEFT JOIN pre i0 ON i0.b = i.b - 1
    ), inner_min AS (  -- for t and i <= t: min over j >= t
      SELECT t.b AS t, s.i, min(s.avg_ij) AS m
      FROM bin t JOIN seg s ON s.i <= t.b AND s.j >= t.b
      GROUP BY 1, 2
    )
    SELECT im.t AS bin, bn.n AS n_obs,
           round(CAST(bn.s AS DOUBLE) / bn.n, 6) AS raw_rate,
           round(max(im.m), 6) AS isotonic_rate
    FROM inner_min im JOIN bin bn ON bn.b = im.t
    GROUP BY 1, 2, 3 ORDER BY 1
    """,
    tags=("analytics", "calibration", "isotonic", "events"),
)
def calibration_isotonic_fit(spark, sf_dir):
    """ISOTONIC REGRESSION (weighted PAVA) of an outcome rate on a
    score bin — the standard probability-calibration step after
    quality_calibration_bins measures miscalibration: the fitted curve
    is the closest MONOTONE non-decreasing rate, computed via the
    exact minimax identity ŷ_t = max_{{i≤t}} min_{{j≥t}} avg(i..j)
    (equivalent to pool-adjacent-violators, but expressible as pure
    joins/windows instead of a sequential merge loop).

    EXACTNESS: segment averages come from BIGINT prefix sums (one
    integer division per (i,j) segment — identical IEEE both
    engines); min/max over them are order-free.

    Scale: facts collapse to {_ISO_BINS} bins first; the (i,j,t)
    minimax join is O(B³) on B = {_ISO_BINS} constant-size rows —
    bounded by the bin count, never the data."""
    e = t(spark, sf_dir, "events")
    obs = e.select(
        (F.col("event_id") % _ISO_BINS).cast("long").alias("b"),
        F.when(
            F.col("value") > 100 - 3 * (F.col("event_id") % _ISO_BINS), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    bins = obs.groupBy("b").agg(
        F.count("*").alias("n"), F.sum("y").alias("s")
    )
    w = Window.orderBy("b")
    pre = bins.select(
        "b",
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
    )
    i = pre.select(
        F.col("b").alias("i"),
        (F.col("b") - 1).alias("i_prev"),
    )
    i0 = pre.select(
        F.col("b").alias("i0b"),
        F.col("cn").alias("cn0"),
        F.col("cs").alias("cs0"),
    )
    j = pre.select(
        F.col("b").alias("j"), F.col("cn").alias("cnj"), F.col("cs").alias("csj")
    )
    seg = (
        i.join(j, F.col("j") >= F.col("i"))
        .join(i0, F.col("i0b") == F.col("i_prev"), "left")
        .select(
            "i",
            "j",
            (
                (F.col("csj") - F.coalesce(F.col("cs0"), F.lit(0))).cast(
                    "double"
                )
                / (F.col("cnj") - F.coalesce(F.col("cn0"), F.lit(0)))
            ).alias("avg_ij"),
        )
    )
    tb = bins.select(
        F.col("b").alias("t"), F.col("n").alias("n_obs"), F.col("s").alias("st")
    )
    inner = (
        tb.join(seg, (F.col("i") <= F.col("t")) & (F.col("j") >= F.col("t")))
        .groupBy("t", "n_obs", "st", "i")
        .agg(F.min("avg_ij").alias("m"))
    )
    return (
        inner.groupBy("t", "n_obs", "st")
        .agg(F.max("m").alias("iso"))
        .select(
            F.col("t").alias("bin"),
            F.col("n_obs"),
            F.round(F.col("st").cast("double") / F.col("n_obs"), 6).alias(
                "raw_rate"
            ),
            F.round("iso", 6).alias("isotonic_rate"),
        )
        .orderBy("bin")
    )


# --------------------------------------------- Bass diffusion model


@query(
    "analytics_bass_diffusion",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, event_type, min(CAST(ts AS DATE)) AS d0
      FROM events GROUP BY 1, 2
    ), adopt AS (
      SELECT d0 AS d, count(*) AS n FROM first_seen GROUP BY 1
    ), cum AS (
      SELECT d, n,
             sum(n) OVER (ORDER BY d) - n AS c
      FROM adopt
    ), m5 AS (
      SELECT count(*) AS nn,
             CAST(sum(c) AS DOUBLE) AS sc,
             CAST(sum(c * c) AS DOUBLE) AS sc2,
             CAST(sum(CAST(c AS DECIMAL(38,0)) * c * c) AS DOUBLE) AS sc3,
             CAST(sum(CAST(c AS DECIMAL(38,0)) * c * c * c) AS DOUBLE)
               AS sc4,
             CAST(sum(n) AS DOUBLE) AS sy,
             CAST(sum(n * c) AS DOUBLE) AS syc,
             CAST(sum(CAST(n AS DECIMAL(38,0)) * c * c) AS DOUBLE) AS syc2
      FROM cum
    ), det AS (
      SELECT nn, sy, syc, syc2, sc, sc2, sc3, sc4,
             nn * (sc2 * sc4 - sc3 * sc3)
               - sc * (sc * sc4 - sc2 * sc3)
               + sc2 * (sc * sc3 - sc2 * sc2) AS dd
      FROM m5
    ), coef AS (
      SELECT
        (sy * (sc2 * sc4 - sc3 * sc3)
         - sc * (syc * sc4 - syc2 * sc3)
         + sc2 * (syc * sc3 - syc2 * sc2)) / dd AS a,
        (nn * (syc * sc4 - syc2 * sc3)
         - sy * (sc * sc4 - sc2 * sc3)
         + sc2 * (sc * syc2 - sc2 * syc)) / dd AS b,
        (nn * (sc2 * syc2 - sc3 * syc)
         - sc * (sc * syc2 - sc2 * syc)
         + sy * (sc * sc3 - sc2 * sc2)) / dd AS c
      FROM det
    )
    SELECT round(a, 6) AS a, round(b, 6) AS b, round(c, 6) AS c,
           round((-b - sqrt(b * b - 4 * a * c)) / (2 * c), 4) AS m_sat,
           round(a / ((-b - sqrt(b * b - 4 * a * c)) / (2 * c)), 6)
             AS p_innov,
           round(-c * ((-b - sqrt(b * b - 4 * a * c)) / (2 * c)), 6)
             AS q_imit
    FROM coef
    """,
    tags=("analytics", "forecast", "diffusion", "events"),
)
def analytics_bass_diffusion(spark, sf_dir):
    """BASS DIFFUSION MODEL fit (Bass 1969, the classic
    new-product-adoption curve): adoption unit = a (user, event_type)
    first touch (per-user capability adoption — plain per-user first
    events all land on day one in this corpus, a singular design);
    regress daily NEW adoptions n_t on cumulative prior adoptions,
    n_t = a + b·C_{t−1} + c·C_{t−1}²
    (discrete-time Bass), by exact 3-parameter OLS — normal equations
    from BIGINT/DECIMAL power sums (C ≤ |users| so C⁴ needs the
    decimal widening), solved by Cramer's rule in double. Implied
    market size m = the positive root of a + bm + cm² = 0, innovation
    p = a/m, imitation q = −c·m — the 'm_sat vs observed users'
    gap is the standard saturation-headroom read.

    Scale: one first-touch aggregation (the retention_cohorts shape)
    collapses facts to the calendar-bounded adoption series; the
    regression is a single fold of 7 exact power sums.

    The adoption window frame (sum OVER ORDER BY minus current row)
    keeps C_{t−1} integer-exact — no double prefix sums (the binseg
    segment-tree lesson)."""
    e = t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id", "event_type").agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    adopt = first_seen.groupBy(F.col("d0").alias("d")).agg(
        F.count("*").alias("n")
    )
    w = Window.orderBy("d")
    cum = adopt.select(
        "d", "n", (F.sum("n").over(w) - F.col("n")).alias("c")
    )
    c = F.col("c")
    n = F.col("n")
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    m5 = cum.agg(
        F.count("*").alias("nn"),
        F.sum(c).cast("double").alias("sc"),
        F.sum(c * c).cast("double").alias("sc2"),
        F.sum(dec(c) * c * c).cast("double").alias("sc3"),
        F.sum(dec(c) * c * c * c).cast("double").alias("sc4"),
        F.sum(n).cast("double").alias("sy"),
        F.sum(n * c).cast("double").alias("syc"),
        F.sum(dec(n) * c * c).cast("double").alias("syc2"),
    )
    nn, sc, sc2, sc3, sc4, sy, syc, syc2 = (
        F.col("nn"),
        F.col("sc"),
        F.col("sc2"),
        F.col("sc3"),
        F.col("sc4"),
        F.col("sy"),
        F.col("syc"),
        F.col("syc2"),
    )
    dd = (
        nn * (sc2 * sc4 - sc3 * sc3)
        - sc * (sc * sc4 - sc2 * sc3)
        + sc2 * (sc * sc3 - sc2 * sc2)
    )
    a = (
        sy * (sc2 * sc4 - sc3 * sc3)
        - sc * (syc * sc4 - syc2 * sc3)
        + sc2 * (syc * sc3 - syc2 * sc2)
    ) / dd
    b = (
        nn * (syc * sc4 - syc2 * sc3)
        - sy * (sc * sc4 - sc2 * sc3)
        + sc2 * (sc * syc2 - sc2 * syc)
    ) / dd
    cc = (
        nn * (sc2 * syc2 - sc3 * syc)
        - sc * (sc * syc2 - sc2 * syc)
        + sy * (sc * sc3 - sc2 * sc2)
    ) / dd
    m_sat = (-b - F.sqrt(b * b - 4 * a * cc)) / (2 * cc)
    return m5.select(
        F.round(a, 6).alias("a"),
        F.round(b, 6).alias("b"),
        F.round(cc, 6).alias("c"),
        F.round(m_sat, 4).alias("m_sat"),
        F.round(a / m_sat, 6).alias("p_innov"),
        F.round(-cc * m_sat, 6).alias("q_imit"),
    )


# ------------------------------------------------------ l-diversity

_LDIV_L = 3


@query(
    "privacy_l_diversity",
    oracle=f"""
    WITH cell AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             count(*) AS group_size,
             count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
               AS l_distinct
      FROM customer GROUP BY 1, 2
    )
    SELECT nation, segment, group_size, l_distinct,
           CASE WHEN l_distinct < {_LDIV_L} THEN 1 ELSE 0 END
             AS violates_l{_LDIV_L}
    FROM cell
    WHERE group_size > 0
    ORDER BY l_distinct, nation, segment
    LIMIT 25
    """,
    tags=("privacy", "anonymity", "customer"),
)
def privacy_l_diversity(spark, sf_dir):
    """l-DIVERSITY AUDIT (Machanavajjhala et al. — the successor
    check to privacy_k_anonymity, which this complements: k-anonymity
    bounds group SIZE, l-diversity bounds the variety of the SENSITIVE
    attribute within each group): per quasi-identifier group
    (nation × market segment), the number of distinct sensitive values
    (account-balance kilobuckets) and whether it falls below l=3 —
    groups where every member shares a balance bucket leak the bucket
    even under k-anonymity.

    Scale: one grouped count-distinct (Spark expands it to a two-level
    aggregate; the QI-group grid is tiny); the worst-25 report is a
    deterministic TopK."""
    c = t(spark, sf_dir, "customer")
    cell = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(
        F.count("*").alias("group_size"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 1000).cast("long")
        ).alias("l_distinct"),
    )
    return (
        cell.filter(F.col("group_size") > 0)
        .select(
            "nation",
            "segment",
            "group_size",
            "l_distinct",
            F.when(F.col("l_distinct") < _LDIV_L, 1)
            .otherwise(0)
            .alias(f"violates_l{_LDIV_L}"),
        )
        .orderBy("l_distinct", "nation", "segment")
        .limit(25)
    )


# --------------------------------------------------- Burrows' delta

_BD_TOPN = 30


@query(
    "text_burrows_delta",
    oracle=f"""
    WITH toks AS (
      SELECT source,
             unnest(string_split(regexp_replace(trim(lower(text)),
                    '\\s+', ' ', 'g'), ' ')) AS w
      FROM documents
    ), top_words AS (
      SELECT w FROM toks GROUP BY w
      ORDER BY count(*) DESC, w LIMIT {_BD_TOPN}
    ), src_tot AS (
      SELECT source, count(*) AS tot FROM toks GROUP BY 1
    ), freq AS (
      SELECT st.source, tw.w,
             coalesce(c.cnt, 0) * 1.0 / st.tot AS f
      FROM src_tot st
      CROSS JOIN top_words tw
      LEFT JOIN (SELECT source, w, count(*) AS cnt
                 FROM toks GROUP BY 1, 2) c
        ON c.source = st.source AND c.w = tw.w
    ), stats AS (
      SELECT w,
             count(*) AS ns,
             CAST(sum(CAST(f AS DECIMAL(38,18))) AS DOUBLE) AS sf,
             CAST(sum(CAST(f * f AS DECIMAL(38,18))) AS DOUBLE) AS sf2
      FROM freq GROUP BY 1
    ), z AS (
      SELECT fr.source, fr.w,
             (fr.f - st.sf / st.ns)
               / sqrt(st.sf2 / st.ns
                      - (st.sf / st.ns) * (st.sf / st.ns)) AS z
      FROM freq fr JOIN stats st ON st.w = fr.w
    )
    SELECT a.source AS src_a, b.source AS src_b,
           round(CAST(sum(CAST(abs(a.z - b.z) AS DECIMAL(38,18)))
                      AS DOUBLE) / {_BD_TOPN}, 6) AS delta
    FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
    GROUP BY 1, 2
    ORDER BY delta, src_a, src_b
    LIMIT 15
    """,
    tags=("text", "stylometry", "documents"),
)
def text_burrows_delta(spark, sf_dir):
    """BURROWS' DELTA (the standard stylometric authorship-attribution
    distance): z-score each source's relative frequency of the corpus
    top-{_BD_TOPN} words against the across-source mean/sd, then
    Δ(a,b) = mean |z_a − z_b|. The 15 most similar source pairs — the
    cross-source cousin of text_source_divergence (which compares
    full distributions, not style markers).

    EXACTNESS: relative frequencies are single int/int divisions;
    every across-source sum (μ, σ, and the |z| distance) casts
    per-term to DECIMAL so reductions are order-free; population σ
    matches the classical delta definition.

    Scale: tokens collapse to (source, word) counts once; the z table
    is |sources| × {_BD_TOPN} rows and the pair join is over the tiny
    source dimension."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.split(
                F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "),
                " ",
            )
        ).alias("w"),
    )
    top_words = (
        toks.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(_BD_TOPN)
        .select("w")
    )
    src_tot = toks.groupBy("source").agg(F.count("*").alias("tot"))
    sw = toks.groupBy("source", "w").agg(F.count("*").alias("cnt"))
    freq = (
        src_tot.crossJoin(top_words)
        .join(sw, ["source", "w"], "left")
        .select(
            "source",
            "w",
            (
                F.coalesce(F.col("cnt"), F.lit(0)) * 1.0 / F.col("tot")
            ).alias("f"),
        )
    )
    stats = freq.groupBy("w").agg(
        F.count("*").alias("ns"),
        F.sum(F.col("f").cast("decimal(38,18)")).cast("double").alias("sf"),
        F.sum((F.col("f") * F.col("f")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sf2"),
    )
    mu = F.col("sf") / F.col("ns")
    sd = F.sqrt(F.col("sf2") / F.col("ns") - mu * mu)
    z = freq.join(stats, "w").select(
        "source", "w", ((F.col("f") - mu) / sd).alias("z")
    )
    a = z.select(
        F.col("source").alias("src_a"), "w", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("src_b"),
        F.col("w").alias("wb"),
        F.col("z").alias("zb"),
    )
    return (
        a.join(
            b,
            (F.col("w") == F.col("wb"))
            & (F.col("src_a") < F.col("src_b")),
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.round(
                F.sum(
                    F.abs(F.col("za") - F.col("zb")).cast("decimal(38,18)")
                ).cast("double")
                / _BD_TOPN,
                6,
            ).alias("delta")
        )
        .orderBy("delta", "src_a", "src_b")
        .limit(15)
    )


# ---------------------------------------------- MATTR lexical diversity

_MATTR_W = 25


@query(
    "text_mattr_diversity",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, source,
             unnest(ws) AS w,
             unnest(range(len(ws))) AS p,
             len(ws) AS L
      FROM (SELECT doc_id, source,
                   string_split(regexp_replace(trim(lower(text)),
                                '\\s+', ' ', 'g'), ' ') AS ws
            FROM documents) d
    ), prv AS (
      SELECT doc_id, source, p, L,
             coalesce(lag(p) OVER (PARTITION BY doc_id, w ORDER BY p),
                      -1) AS prev
      FROM pos
    ), contrib AS (
      SELECT doc_id, source, L,
             greatest(prev + 1, p - {_MATTR_W} + 1, 0) AS a,
             least(p, L - {_MATTR_W}) AS b
      FROM prv WHERE L >= {_MATTR_W}
    ), perdoc AS (
      SELECT doc_id, source,
             sum(CASE WHEN b >= a THEN b - a + 1 ELSE 0 END) * 1.0
               / ((max(L) - {_MATTR_W} + 1) * {_MATTR_W}) AS mattr
      FROM contrib GROUP BY 1, 2
    )
    SELECT source, count(*) AS n_docs,
           round(CAST(sum(CAST(mattr AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*), 6) AS avg_mattr
    FROM perdoc GROUP BY 1 ORDER BY 1
    """,
    tags=("text", "lexical-diversity", "documents"),
)
def text_mattr_diversity(spark, sf_dir):
    """MATTR (moving-average type-token ratio, Covington & McFall —
    the length-independent lexical-diversity measure; plain TTR decays
    with length, which is why text_hapax_ratio can't compare docs):
    mean distinct-type count over every complete {_MATTR_W}-token
    window, / {_MATTR_W}.

    THE INTERVAL-CONTRIBUTION TRICK (no per-window distinct pass):
    token occurrence at position p is the FIRST of its type inside
    window w iff prev_occurrence(p) < w ≤ p, so it adds 1 to exactly
    the windows w ∈ [max(prev+1, p−W+1, 0), min(p, L−W)] — and
    Σ_w distinct(w) is just the sum of those clamped interval lengths.
    One lag window + one sum replaces a per-window count-distinct
    (which would be W× the data); everything stays integer until the
    final two divisions.

    Scale: positions shuffle once on (doc, token) for the lag;
    per-doc then per-source aggregation; per-doc MATTR sums cast
    per-term to DECIMAL so the source average is order-free."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.split(
            F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "), " "
        ).alias("ws"),
    )
    pos = d.select(
        "doc_id",
        "source",
        F.size("ws").alias("L"),
        F.posexplode("ws").alias("p", "w"),
    )
    wlag = Window.partitionBy("doc_id", "w").orderBy("p")
    prv = pos.select(
        "doc_id",
        "source",
        "p",
        "L",
        F.coalesce(F.lag("p").over(wlag), F.lit(-1)).alias("prev"),
    )
    contrib = prv.filter(F.col("L") >= _MATTR_W).select(
        "doc_id",
        "source",
        "L",
        F.greatest(
            F.col("prev") + 1, F.col("p") - _MATTR_W + 1, F.lit(0)
        ).alias("a"),
        F.least(F.col("p"), F.col("L") - _MATTR_W).alias("b"),
    )
    perdoc = contrib.groupBy("doc_id", "source").agg(
        (
            F.sum(
                F.when(
                    F.col("b") >= F.col("a"),
                    F.col("b") - F.col("a") + 1,
                ).otherwise(0)
            )
            * 1.0
            / ((F.max("L") - _MATTR_W + 1) * _MATTR_W)
        ).alias("mattr")
    )
    return (
        perdoc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum(F.col("mattr").cast("decimal(38,18)")).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("avg_mattr"),
        )
        .orderBy("source")
    )


# ------------------------------------------- weekly spectral energy

import math as _math  # noqa: E402
from gcp_etl_spark.operators.barrier import barrier


def _trig_case(k: int, fn) -> str:
    """CASE lookup of cos/sin(2π·k·(t%7)/7) as full-precision double
    literals — ONE string shared verbatim by both engines (repr() is
    the exact shortest round-trip, so both parse the same double)."""
    arms = " ".join(
        f"WHEN {i} THEN CAST({fn(2.0 * _math.pi * k * i / 7.0)!r}"
        " AS DOUBLE)"
        for i in range(7)
    )
    return f"(CASE CAST(t % 7 AS INT) {arms} END)"


_SPEC_TERMS = {
    k: (_trig_case(k, _math.cos), _trig_case(k, _math.sin))
    for k in (1, 2, 3)
}


@query(
    "analytics_spectral_weekly",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ), idx AS (
      SELECT cents / 100.0 AS y,
             row_number() OVER (ORDER BY d) - 1 AS t,
             cents
      FROM daily
    ), sums AS (
      SELECT count(*) AS dd,
             CAST(sum(cents) AS DOUBLE) AS sc,
             CAST(sum(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE)
               AS sc2,
             {", ".join(
                 f'''CAST(sum(CAST({cos_} * y AS DECIMAL(38,6)))
                      AS DOUBLE) AS a{k},
                 CAST(sum(CAST({sin_} * y AS DECIMAL(38,6)))
                      AS DOUBLE) AS b{k}'''
                 for k, (cos_, sin_) in sorted(_SPEC_TERMS.items())
             )}
      FROM idx
    )
    SELECT k,
           round(2.0 * sqrt(a * a + b * b) / dd, 4) AS amplitude,
           round(2.0 * (a * a + b * b)
                 / (dd * ((sc2 - sc * sc / dd) / 10000.0)), 6)
             AS energy_share
    FROM (
      {" UNION ALL ".join(
          f"SELECT CAST({k} AS BIGINT) AS k, a{k} AS a, b{k} AS b,"
          f" dd, sc, sc2 FROM sums"
          for k in sorted(_SPEC_TERMS)
      )}
    ) ORDER BY k
    """,
    tags=("analytics", "time-series", "spectral", "orders"),
)
def analytics_spectral_weekly(spark, sf_dir):
    """WEEKLY-HARMONIC SPECTRAL ENERGY (periodogram probe at the 7-day
    frequency and its 2nd/3rd harmonics — the frequency-domain twin of
    analytics_seasonality_index, and the diagnostic that picks m for
    analytics_holt_winters): a_k = Σ y_t·cos(2πkt/7),
    b_k = Σ y_t·sin(2πkt/7), amplitude 2√(a²+b²)/D and the share of
    centered energy 2(a²+b²)/(D·SS).

    EXACTNESS: the 21 trig constants are repr()-exact double literals
    in a CASE lookup shared VERBATIM by both engines (there are only 7
    phases per harmonic — no per-row libm calls, so no cross-engine
    sin/cos divergence is even possible); every product is cast to
    DECIMAL per-term so the sums are order-free; SS comes from exact
    integer cents power sums.

    Scale: facts collapse to the calendar-bounded daily relation; the
    harmonic sums are one fold (map-side partial) over ≤|days| rows."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("cents")
    )
    idx = daily.select(
        (F.col("cents") / 100.0).alias("y"),
        (F.row_number().over(Window.orderBy("d")) - 1).alias("t"),
        "cents",
    )
    aggs = [
        F.count("*").alias("dd"),
        F.sum("cents").cast("double").alias("sc"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("sc2"),
    ]
    for k, (cos_, sin_) in sorted(_SPEC_TERMS.items()):
        aggs.append(
            F.sum(F.expr(f"CAST({cos_} * y AS DECIMAL(38,6))"))
            .cast("double")
            .alias(f"a{k}")
        )
        aggs.append(
            F.sum(F.expr(f"CAST({sin_} * y AS DECIMAL(38,6))"))
            .cast("double")
            .alias(f"b{k}")
        )
    sums = idx.agg(*aggs)
    parts = []
    for k in sorted(_SPEC_TERMS):
        parts.append(
            sums.select(
                F.lit(k).cast("long").alias("k"),
                F.col(f"a{k}").alias("a"),
                F.col(f"b{k}").alias("b"),
                "dd",
                "sc",
                "sc2",
            )
        )
    un = parts[0]
    for pth in parts[1:]:
        un = un.unionAll(pth)
    ss = (F.col("sc2") - F.col("sc") * F.col("sc") / F.col("dd")) / 10000.0
    return un.select(
        "k",
        F.round(
            2.0 * F.sqrt(F.col("a") * F.col("a") + F.col("b") * F.col("b"))
            / F.col("dd"),
            4,
        ).alias("amplitude"),
        F.round(
            2.0
            * (F.col("a") * F.col("a") + F.col("b") * F.col("b"))
            / (F.col("dd") * ss),
            6,
        ).alias("energy_share"),
    ).orderBy("k")


# ------------------------------------------------- Ansari-Bradley

_AB_A, _AB_B = "purchase", "click"


def _ab_s(x: str, intdiv: str) -> str:
    """Closed-form prefix sum of Ansari-Bradley scores,
    S(x) = Σ_{r<=x} min(r, N+1−r), as pure INTEGER arithmetic
    (``intdiv`` is ``div`` on Spark, ``//`` on DuckDB — the geohash
    convention; every product is even before its halving, so the
    integer divisions are exact). References columns x and nn; mm is
    floor((N+1)/2)."""
    mm = f"(({x}) * 0 + (nn + 1) {intdiv} 2)"  # per-row constant
    sx = f"CASE WHEN ({x}) <= {mm} THEN (({x}) * (({x}) + 1)) {intdiv} 2"
    sm = f"(({mm}) * (({mm}) + 1)) {intdiv} 2"
    tail = (
        f"{sm} + (({x}) - {mm}) * (nn + 1)"
        f" - ((({x}) * (({x}) + 1)) - (({mm}) * (({mm}) + 1))) {intdiv} 2"
    )
    return f"({sx} ELSE {tail} END)"


@query(
    "stats_ansari_bradley",
    oracle=f"""
    WITH f AS (
      SELECT value AS v,
             CASE WHEN event_type = '{_AB_A}' THEN 1 ELSE 0 END AS g1
      FROM events WHERE event_type IN ('{_AB_A}', '{_AB_B}')
    ), byv AS (
      SELECT v, count(*) AS cnt, sum(g1) AS c1 FROM f GROUP BY 1
    ), pos AS (
      SELECT v, cnt, c1,
             sum(cnt) OVER (ORDER BY v) - cnt AS before_,
             sum(cnt) OVER () AS nn,
             sum(c1) OVER () AS n1
      FROM byv
    ), sc AS (
      SELECT v, cnt, c1, nn, n1,
             ({_ab_s("before_ + cnt", "//")}
              - {_ab_s("before_", "//")}) * 1.0 / cnt AS avg_score
      FROM pos
    ), agg AS (
      SELECT max(nn) AS nn, max(n1) AS n1,
             CAST(sum(CAST(c1 * avg_score AS DECIMAL(38,12)))
                  AS DOUBLE) AS a_stat,
             CAST(sum(CAST(cnt * avg_score * avg_score
                           AS DECIMAL(38,12))) AS DOUBLE) AS sa2,
             CAST(sum(CAST(cnt * avg_score AS DECIMAL(38,12)))
                  AS DOUBLE) AS sa1
      FROM sc
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(nn - n1 AS BIGINT) AS n2,
           round(a_stat, 6) AS ab_stat,
           round((a_stat - n1 * (sa1 / nn))
                 / sqrt(n1 * (nn - n1) * 1.0 / (nn - 1)
                        * (sa2 / nn - (sa1 / nn) * (sa1 / nn))), 6)
             AS z
    FROM agg
    """,
    tags=("stats", "hypothesis-test", "dispersion", "events"),
)
def stats_ansari_bradley(spark, sf_dir):
    """ANSARI-BRADLEY TEST (rank test for equal DISPERSION — the
    scale-difference slot next to the suite's location tests
    Mann-Whitney/Mood; Levene/Bartlett are its parametric cousins):
    scores a_r = min(r, N+1−r) pile up at the distribution's flanks,
    so a group with larger spread collects smaller scores. Tied values
    receive the exact AVERAGE of their run's scores via the
    closed-form prefix S(x) = Σ min(r, N+1−r) — integer arithmetic
    (the `div`-vs-`//` shared-expression convention), one division
    per distinct value. z uses the exact finite-sampling moments of a
    tie-averaged linear rank statistic: E[A] = n1·ā,
    Var[A] = n1·n2·σ²_a/(N−1).

    Scale: the fact scan collapses to distinct values first; the rank
    windows run over the value support, not the rows; every sum casts
    per-term to DECIMAL (order-free)."""
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_AB_A, _AB_B)
    )
    byv = e.groupBy(F.col("value").alias("v")).agg(
        F.count("*").alias("cnt"),
        F.sum(
            F.when(F.col("event_type") == _AB_A, 1).otherwise(0)
        ).alias("c1"),
    )
    wv = Window.orderBy("v")
    wall = Window.partitionBy()
    pos = byv.select(
        "v",
        "cnt",
        "c1",
        (F.sum("cnt").over(wv) - F.col("cnt")).alias("before_"),
        F.sum("cnt").over(wall).alias("nn"),
        F.sum("c1").over(wall).alias("n1"),
    )
    sc = pos.select(
        "cnt",
        "c1",
        "nn",
        "n1",
        F.expr(
            f"({_ab_s('before_ + cnt', 'div')}"
            f" - {_ab_s('before_', 'div')}) * 1.0 / cnt"
        ).alias("avg_score"),
    )
    agg = sc.agg(
        F.max("nn").alias("nn"),
        F.max("n1").alias("n1"),
        F.sum(
            (F.col("c1") * F.col("avg_score")).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("a_stat"),
        F.sum(
            (
                F.col("cnt") * F.col("avg_score") * F.col("avg_score")
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("sa2"),
        F.sum(
            (F.col("cnt") * F.col("avg_score")).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("sa1"),
    )
    abar = F.col("sa1") / F.col("nn")
    var = (
        F.col("n1")
        * (F.col("nn") - F.col("n1"))
        * 1.0
        / (F.col("nn") - 1)
        * (F.col("sa2") / F.col("nn") - abar * abar)
    )
    return agg.select(
        F.col("n1").cast("long").alias("n1"),
        (F.col("nn") - F.col("n1")).cast("long").alias("n2"),
        F.round("a_stat", 6).alias("ab_stat"),
        F.round(
            (F.col("a_stat") - F.col("n1") * abar) / F.sqrt(var), 6
        ).alias("z"),
    )


# ----------------------------------- streaming Python DataSource

_SGS_ROWS, _SGS_BATCH, _SGS_PARTS = 2000, 500, 4


@query(
    "io_python_datasource_stream",
    oracle=f"""
    WITH rows_ AS (
      SELECT i AS id,
             (i * 2654435761) % 4294967296 AS h
      FROM unnest(range(0, {_SGS_ROWS})) t(i)
    )
    SELECT CAST((h // 256) % 10 AS BIGINT) AS sensor,
           count(*) AS n,
           CAST(sum(h % 997) AS BIGINT) AS total_metric,
           CAST(min(id) AS BIGINT) AS first_id
    FROM rows_ GROUP BY 1 ORDER BY 1
    """,
    tags=("io", "datasource", "streaming", "spark4"),
)
def io_python_datasource_stream(spark, sf_dir):
    """STREAMING Python DataSource (Spark 4 ``DataSourceStreamReader``
    — the readStream twin of io_python_datasource): the same seeded
    generator exposed as a MICRO-BATCHED source whose ``latestOffset``
    advances {_SGS_BATCH} rows per call, drained here with
    ``processAllAvailable`` — {_SGS_ROWS // _SGS_BATCH} real
    micro-batches, each planned into {_SGS_PARTS} executor-side
    partitions, appended exactly-once to a memory sink. Because the
    rows come from the Knuth formula, the WHOLE streaming path (offset
    bookkeeping → per-batch partition planning → Arrow transfer →
    sink) is hash-verified against DuckDB replaying the algebra — the
    strongest correctness gate the streaming source API can get.

    Scale: partitions(start, end) splits every micro-batch across the
    cluster like any streaming scan; nothing materializes on the
    driver. tests/test_r9b.py pins that >= 2 micro-batches actually
    ran (the offset plateau is real, not one giant batch)."""
    from gcp_etl_spark.sources.synthgen import register

    register(spark)
    sink = "synthgen_stream_sink"
    for q in spark.streams.active:
        if q.name == sink:
            q.stop()
    sdf = (
        spark.readStream.format("synthgen")
        .option("rows", _SGS_ROWS)
        .option("batchRows", _SGS_BATCH)
        .option("numPartitions", _SGS_PARTS)
        .load()
    )
    query_ = (
        sdf.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    try:
        query_.processAllAvailable()
    finally:
        query_.stop()
    return (
        spark.table(sink)
        .groupBy("sensor")
        .agg(
            F.count("*").alias("n"),
            F.sum("metric").cast("long").alias("total_metric"),
            F.min("id").cast("long").alias("first_id"),
        )
        .orderBy("sensor")
    )


# ---------------------------------------------- Mann-Kendall trend


@query(
    "stats_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ), pairs AS (
      SELECT CAST(sum(CASE WHEN b.c > a.c THEN 1
                           WHEN b.c < a.c THEN -1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM daily a JOIN daily b ON b.d > a.d
    ), ties AS (
      SELECT coalesce(sum(tt * (tt - 1) * (2 * tt + 5)), 0) AS tie_adj
      FROM (SELECT count(*) AS tt FROM daily GROUP BY c
            HAVING count(*) > 1)
    ), nn AS (SELECT count(*) AS n FROM daily)
    SELECT n, s,
           round((s - CASE WHEN s > 0 THEN 1
                           WHEN s < 0 THEN -1 ELSE 0 END)
                 / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                         - tie_adj) / 18.0), 6) AS z_mk
    FROM pairs, ties, nn
    """,
    tags=("stats", "hypothesis-test", "trend", "orders"),
)
def stats_mann_kendall(spark, sf_dir):
    """MANN-KENDALL TREND TEST (the standard nonparametric monotone
    trend test — the significance companion to analytics_theil_sen,
    whose slope it decides is real): S = Σ_{i<j} sign(x_j − x_i) over
    the daily-revenue series, tie-corrected variance
    (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18, continuity-corrected z. Every
    accumulator is an exact BIGINT on exact cents.

    Scale: the pair join runs on the CALENDAR-BOUNDED daily relation
    (≤|days|² ≈ 5.8M comparisons at any corpus size — constant, not
    data-scaled); the fact scan collapses first."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("c")
    )
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    pairs = a.join(b, F.col("db") > F.col("da")).agg(
        F.sum(
            F.when(F.col("cb") > F.col("ca"), 1)
            .when(F.col("cb") < F.col("ca"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s")
    )
    ties = (
        daily.groupBy("c")
        .agg(F.count("*").alias("tt"))
        .filter(F.col("tt") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tt")
                    * (F.col("tt") - 1)
                    * (2 * F.col("tt") + 5)
                ),
                F.lit(0),
            ).alias("tie_adj")
        )
    )
    nn = daily.agg(F.count("*").alias("n"))
    cc = (
        F.when(F.col("s") > 0, 1).when(F.col("s") < 0, -1).otherwise(0)
    )
    var = (
        F.col("n").cast("double")
        * (F.col("n") - 1)
        * (2 * F.col("n") + 5)
        - F.col("tie_adj")
    ) / 18.0
    return (
        pairs.crossJoin(ties)
        .crossJoin(nn)
        .select(
            "n",
            "s",
            F.round((F.col("s") - cc) / F.sqrt(var), 6).alias("z_mk"),
        )
    )


# ------------------------------------------------- Granger (lite)


@query(
    "analytics_granger_lite",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
               AS x,
             count(*) AS z
      FROM orders GROUP BY 1
    ), lagged AS (
      SELECT x AS y,
             lag(x) OVER (ORDER BY d) AS xl,
             lag(z) OVER (ORDER BY d) AS zl
      FROM daily
    ), m AS (
      SELECT count(*) AS n,
             CAST(sum(CAST(y  AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(xl AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(zl AS DECIMAL(38,6))) AS DOUBLE) AS sz,
             CAST(sum(CAST(y * y   AS DECIMAL(38,6))) AS DOUBLE) AS syy,
             CAST(sum(CAST(xl * xl AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(zl * zl AS DECIMAL(38,6))) AS DOUBLE) AS szz,
             CAST(sum(CAST(y * xl  AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(y * zl  AS DECIMAL(38,6))) AS DOUBLE) AS szy,
             CAST(sum(CAST(xl * zl AS DECIMAL(38,6))) AS DOUBLE) AS sxz
      FROM lagged WHERE xl IS NOT NULL
    ), c AS (
      SELECT n,
             syy - sy * sy / n AS cyy,
             sxx - sx * sx / n AS cxx,
             szz - sz * sz / n AS czz,
             sxy - sx * sy / n AS cxy,
             szy - sz * sy / n AS czy,
             sxz - sx * sz / n AS cxz
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(cyy - cxy * cxy / cxx, 4) AS rss_restricted,
           round(cyy - (czz * cxy * cxy - 2 * cxz * cxy * czy
                        + cxx * czy * czy)
                       / (cxx * czz - cxz * cxz), 4) AS rss_full,
           round(((cyy - cxy * cxy / cxx)
                  - (cyy - (czz * cxy * cxy - 2 * cxz * cxy * czy
                            + cxx * czy * czy)
                           / (cxx * czz - cxz * cxz)))
                 / ((cyy - (czz * cxy * cxy - 2 * cxz * cxy * czy
                            + cxx * czy * czy)
                           / (cxx * czz - cxz * cxz)) / (n - 3)), 6)
             AS f_granger
    FROM c
    """,
    tags=("analytics", "time-series", "causality", "orders"),
)
def analytics_granger_lite(spark, sf_dir):
    """GRANGER CAUSALITY (lag-1, 'lite'): does yesterday's ORDER COUNT
    improve today's REVENUE forecast beyond yesterday's revenue alone?
    F = (RSS_restricted − RSS_full)/(RSS_full/(n−3)) comparing
    x_t ~ x_{t−1} against x_t ~ x_{t−1} + z_{t−1}, both fit by exact
    closed-form OLS on centered moments (the 2-feature normal
    equations inverted symbolically — the agg_ols_two_feature
    pattern). Per-term decimal casts keep all nine cross-moments
    order-free.

    Scale: facts collapse to the calendar-bounded daily relation; one
    lag window, one nine-sum fold, a 1-row closed form."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            / 100.0
        ).alias("x"),
        F.count("*").alias("z"),
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        F.col("x").alias("y"),
        F.lag("x").over(w).alias("xl"),
        F.lag("z").over(w).alias("zl"),
    ).filter(F.col("xl").isNotNull())
    dsum6 = lambda e: F.sum(e.cast("decimal(38,6)")).cast(  # noqa: E731
        "double"
    )
    y, xl, zl = F.col("y"), F.col("xl"), F.col("zl")
    m = lagged.agg(
        F.count("*").alias("n"),
        dsum6(y).alias("sy"),
        dsum6(xl).alias("sx"),
        dsum6(zl).alias("sz"),
        dsum6(y * y).alias("syy"),
        dsum6(xl * xl).alias("sxx"),
        dsum6(zl * zl).alias("szz"),
        dsum6(y * xl).alias("sxy"),
        dsum6(y * zl).alias("szy"),
        dsum6(xl * zl).alias("sxz"),
    )
    n = F.col("n")
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    czz = F.col("szz") - F.col("sz") * F.col("sz") / n
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    czy = F.col("szy") - F.col("sz") * F.col("sy") / n
    cxz = F.col("sxz") - F.col("sx") * F.col("sz") / n
    rss_r = cyy - cxy * cxy / cxx
    rss_f = cyy - (
        czz * cxy * cxy - 2 * cxz * cxy * czy + cxx * czy * czy
    ) / (cxx * czz - cxz * cxz)
    return m.select(
        n.cast("long").alias("n"),
        F.round(rss_r, 4).alias("rss_restricted"),
        F.round(rss_f, 4).alias("rss_full"),
        F.round((rss_r - rss_f) / (rss_f / (n - 3)), 6).alias(
            "f_granger"
        ),
    )


# --------------------------------------------- Theil index decomposition


@query(
    "analytics_theil_index",
    oracle="""
    WITH cust AS (
      SELECT c.c_nationkey AS nation,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey, c.c_nationkey
    ), tot AS (
      SELECT count(*) AS n, CAST(sum(cents) AS DOUBLE) AS s
      FROM cust
    ), within AS (
      SELECT CAST(sum(CAST((cents / (s / n))
                           * ln(cents / (s / n)) / n
                           AS DECIMAL(38,12))) AS DOUBLE) AS t_total
      FROM cust, tot
    ), grp AS (
      SELECT nation, count(*) AS ng, CAST(sum(cents) AS DOUBLE) AS sg
      FROM cust GROUP BY 1
    ), between_ AS (
      SELECT CAST(sum(CAST((sg / s) * ln((sg / s) / (ng * 1.0 / n))
                           AS DECIMAL(38,12))) AS DOUBLE) AS t_between
      FROM grp, tot
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           round(t_total, 6) AS theil_total,
           round(t_between, 6) AS theil_between,
           round(t_total - t_between, 6) AS theil_within
    FROM within, between_, tot
    """,
    tags=("analytics", "inequality", "orders", "customer"),
)
def analytics_theil_index(spark, sf_dir):
    """THEIL T INEQUALITY INDEX with between/within-nation
    decomposition (the additively-decomposable inequality measure —
    what analytics_gini cannot do: T_total = T_between + Σ w_g T_g
    splits customer-spend inequality into cross-nation and
    within-nation parts): T = (1/n)Σ (x_i/μ)·ln(x_i/μ),
    T_between = Σ (s_g/S)·ln((s_g/S)/(n_g/n)).

    EXACTNESS: spend is exact cents; μ and the ratios are identical
    IEEE operands both engines; each ln() term is cast to
    DECIMAL(38,12) before summing — order-free AND absorbing any
    sub-1e-12 libm ulp disagreement between the JVM's and DuckDB's ln.

    Scale: one grouped sum per customer (facts collapse first), a
    |nations|-row group pass, two folds."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    cust = (
        o.join(c, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", F.col("c_nationkey").alias("nation"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents")
        )
    )
    tot = cust.agg(
        F.count("*").alias("n"), F.sum("cents").cast("double").alias("s")
    )
    mu = F.col("s") / F.col("n")
    within = cust.crossJoin(tot).agg(
        F.sum(
            (
                (F.col("cents") / mu)
                * F.log(F.col("cents") / mu)
                / F.col("n")
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("t_total")
    )
    grp = cust.groupBy("nation").agg(
        F.count("*").alias("ng"), F.sum("cents").cast("double").alias("sg")
    )
    between = grp.crossJoin(tot).agg(
        F.sum(
            (
                (F.col("sg") / F.col("s"))
                * F.log(
                    (F.col("sg") / F.col("s"))
                    / (F.col("ng") * 1.0 / F.col("n"))
                )
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("t_between")
    )
    return (
        within.crossJoin(between)
        .crossJoin(tot)
        .select(
            F.col("n").cast("long").alias("n_customers"),
            F.round("t_total", 6).alias("theil_total"),
            F.round("t_between", 6).alias("theil_between"),
            F.round(F.col("t_total") - F.col("t_between"), 6).alias(
                "theil_within"
            ),
        )
    )


# ------------------------------------------------ Hurst exponent (R/S)

_HURST_SIZES = (8, 16, 32, 64)
# ln(n) for the regression x-axis as repr()-exact shared literals —
# computed once here, parsed identically by both engines
_HURST_LNS = {n: repr(_math.log(n)) for n in _HURST_SIZES}


@query(
    "analytics_hurst_rs",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ), idx AS (
      SELECT c, row_number() OVER (ORDER BY d) - 1 AS i FROM daily
    ), sized AS (
      SELECT s.n, idx.c, idx.i,
             idx.i // s.n AS blk,
             idx.i % s.n AS pos
      FROM idx, (VALUES {", ".join(f"({n})" for n in _HURST_SIZES)})
                s(n)
    ), blkstat AS (
      SELECT n, blk,
             count(*) AS m,
             sum(c) AS s1,
             sum(CAST(c AS DECIMAL(38,0)) * c) AS s2
      FROM sized GROUP BY 1, 2
    ), dev AS (
      SELECT s.n, s.blk,
             s.n * sum(s.c) OVER (PARTITION BY s.n, s.blk
                                  ORDER BY s.pos)
               - (s.pos + 1) * b.s1 AS ndev
      FROM sized s JOIN blkstat b
        ON b.n = s.n AND b.blk = s.blk AND b.m = s.n
    ), rs AS (
      SELECT n, blk,
             (max(ndev) - min(ndev)) * 1.0
               / sqrt(CAST(max_s2n AS DOUBLE)) AS rs_ratio
      FROM (SELECT d.*,
                   b.n * b.s2 - CAST(b.s1 AS DECIMAL(38,0)) * b.s1
                     AS max_s2n
            FROM dev d JOIN blkstat b
              ON b.n = d.n AND b.blk = d.blk)
      GROUP BY n, blk, max_s2n
      HAVING max_s2n > 0
    ), avg_rs AS (
      SELECT n,
             count(*) AS n_blocks,
             CAST(sum(CAST(rs_ratio AS DECIMAL(38,12))) AS DOUBLE)
               / count(*) AS mean_rs
      FROM rs GROUP BY 1
    ), pts AS (
      SELECT CASE n {" ".join(
          f"WHEN {n} THEN CAST({ln} AS DOUBLE)"
          for n, ln in _HURST_LNS.items())} END AS x,
             ln(mean_rs) AS y
      FROM avg_rs
    ), fit AS (
      SELECT count(*) AS k,
             CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT CAST(k AS BIGINT) AS n_sizes,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
             AS hurst
    FROM fit
    """,
    tags=("analytics", "time-series", "long-memory", "orders"),
)
def analytics_hurst_rs(spark, sf_dir):
    """HURST EXPONENT via rescaled-range (R/S) analysis (Hurst 1951 /
    Mandelbrot — long-memory diagnostic: H≈0.5 random walk, H>0.5
    persistent trends, H<0.5 mean reversion; the long-horizon
    companion to stats_variance_ratio's fixed-q test): for block sizes
    n ∈ {_HURST_SIZES}, split the daily-revenue series into full
    blocks, R = range of cumulative deviations from the block mean,
    S = population std; H = slope of ln(mean R/S) on ln(n).

    THE INTEGER-SCALED CUMDEV TRICK: multiplying through by n makes
    every cumulative deviation exact — n·dev_t = n·Σ_{{i≤t}}c_i − t·S1
    (BIGINT cents), and n²S² = n·S2 − S1² (DECIMAL) — so R/S is ONE
    division of exact operands per block; no double prefix sums (the
    binseg segment-tree lesson applies to windowed sums here too).
    ln(n) regression x-coordinates are repr()-exact shared literals;
    runtime ln() terms cast per-term to DECIMAL(38,12), absorbing any
    libm ulp disagreement.

    Scale: everything after the daily collapse is windows over the
    calendar-bounded series × 4 sizes; the regression is a 4-point
    closed form."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("c")
    )
    idx = daily.select(
        "c", (F.row_number().over(Window.orderBy("d")) - 1).alias("i")
    )
    sizes = idx.select(
        F.explode(
            F.array(*[F.lit(nsz) for nsz in _HURST_SIZES])
        ).alias("n"),
        "c",
        "i",
    ).select(
        "n",
        "c",
        "i",
        (F.col("i") / F.col("n")).cast("long").alias("blk"),
        (F.col("i") % F.col("n")).alias("pos"),
    )
    blkstat = sizes.groupBy("n", "blk").agg(
        F.count("*").alias("m"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s2"),
    )
    wcum = Window.partitionBy("n", "blk").orderBy("pos")
    dev = (
        sizes.alias("s")
        .join(
            blkstat.alias("b"),
            (F.col("s.n") == F.col("b.n"))
            & (F.col("s.blk") == F.col("b.blk"))
            & (F.col("b.m") == F.col("s.n")),
        )
        .select(
            F.col("s.n").alias("n"),
            F.col("s.blk").alias("blk"),
            (
                F.col("s.n") * F.sum("s.c").over(
                    Window.partitionBy("s.n", "s.blk").orderBy("s.pos")
                )
                - (F.col("s.pos") + 1) * F.col("b.s1")
            ).alias("ndev"),
            (
                F.col("b.n") * F.col("b.s2")
                - F.col("b.s1").cast("decimal(38,0)") * F.col("b.s1")
            ).alias("s2n"),
        )
    )
    rs = (
        dev.groupBy("n", "blk", "s2n")
        .agg(
            (
                (F.max("ndev") - F.min("ndev"))
                * 1.0
                / F.sqrt(F.col("s2n").cast("double"))
            ).alias("rs_ratio")
        )
        .filter(F.col("s2n") > 0)
    )
    avg_rs = rs.groupBy("n").agg(
        F.count("*").alias("n_blocks"),
        (
            F.sum(F.col("rs_ratio").cast("decimal(38,12)")).cast("double")
            / F.count("*")
        ).alias("mean_rs"),
    )
    xexpr = "CASE n " + " ".join(
        f"WHEN {n} THEN CAST({ln} AS DOUBLE)"
        for n, ln in _HURST_LNS.items()
    ) + " END"
    pts = avg_rs.select(
        F.expr(xexpr).alias("x"), F.log("mean_rs").alias("y")
    )
    d12 = lambda e: F.sum(e.cast("decimal(38,12)")).cast(  # noqa: E731
        "double"
    )
    fit = pts.agg(
        F.count("*").alias("k"),
        d12(F.col("x")).alias("sx"),
        d12(F.col("y")).alias("sy"),
        d12(F.col("x") * F.col("y")).alias("sxy"),
        d12(F.col("x") * F.col("x")).alias("sxx"),
    )
    k = F.col("k")
    return fit.select(
        k.cast("long").alias("n_sizes"),
        F.round(
            (k * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (k * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("hurst"),
    )


# ------------------------------------------- temporal/scalar extras


@query(
    "scalar_temporal_extras",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 3 HOUR AS ts_plus_3h,
           ts + to_minutes(CAST(90 + event_id % 30 AS BIGINT))
             AS ts_plus_dyn,
           CAST(floor(epoch(ts - TIMESTAMP '2024-01-01')
                      / 60.0) AS BIGINT) AS minutes_since_jan1,
           CASE WHEN value < 0 THEN 0
                WHEN value >= 500 THEN 11
                ELSE CAST(floor(value / 50.0) AS BIGINT) + 1
           END AS value_bucket,
           strftime(ts, '%Y-%m-%d %H') AS hour_label,
           CAST(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
                         '%Y-%m-%d %H:%M:%S') AS TIMESTAMP)
             AS ts_roundtrip
    FROM events
    ORDER BY event_id LIMIT 20
    """,
    tags=("scalar", "temporal", "events"),
)
def scalar_temporal_extras(spark, sf_dir):
    """TEMPORAL SCALAR EXTRAS — the remaining literal API surface the
    date/datetime batteries don't touch: ``timestampadd`` (unit
    arithmetic), ``make_dt_interval`` (dynamic per-row intervals),
    ``timestampdiff`` (elapsed minutes since an anchor),
    ``width_bucket`` (equi-width binning as a FUNCTION, vs the
    histogram queries' floor arithmetic), ``to_char`` (datetime →
    string with a format), and a ``try_to_timestamp`` parse of the
    formatted value (the try_* family's datetime member) proving the
    format roundtrips.

    The oracle computes the same VALUES through DuckDB's equivalents
    (INTERVAL arithmetic, epoch differences, floor binning, strftime/
    strptime) — the check is value-level semantics, not shared
    function names; sub-second truncation in the roundtrip column is
    exercised deliberately (to_char second precision).

    Scale: pure per-row projection; TopK(20) output."""
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.expr("timestampadd(HOUR, 3, ts)").alias("ts_plus_3h"),
            F.expr(
                "ts + make_dt_interval(0, 0, 90 + event_id % 30, 0)"
            ).alias("ts_plus_dyn"),
            F.expr(
                "timestampdiff(MINUTE, TIMESTAMP '2024-01-01', ts)"
            ).alias("minutes_since_jan1"),
            F.expr("width_bucket(value, 0, 500, 10)").alias(
                "value_bucket"
            ),
            F.expr("to_char(ts, 'yyyy-MM-dd HH')").alias("hour_label"),
            F.expr(
                "CAST(try_to_timestamp("
                "to_char(ts, 'yyyy-MM-dd HH:mm:ss'),"
                " 'yyyy-MM-dd HH:mm:ss') AS TIMESTAMP_NTZ)"
            ).alias("ts_roundtrip"),
        )
        .orderBy("event_id")
        .limit(20)
    )


# --------------------------------------------- rank normalization


@query(
    "prep_rank_normalize",
    oracle="""
    WITH ranked AS (
      SELECT source,
             (rank() OVER (PARTITION BY source ORDER BY n_chars)
              + (count(*) OVER (PARTITION BY source, n_chars) - 1)
                / 2.0
              - 0.5)
             / count(*) OVER (PARTITION BY source) AS u
      FROM documents
    ), decile AS (
      SELECT source,
             least(CAST(floor(u * 10) AS BIGINT), 9) AS dec_
      FROM ranked
    )
    SELECT source, dec_ AS decile, count(*) AS n_docs
    FROM decile GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("prep", "normalization", "documents"),
)
def prep_rank_normalize(spark, sf_dir):
    """RANK (QUANTILE) NORMALIZATION across sources — the
    distribution-free feature transform (van der Waerden's u without
    the normal quantile): within each source, doc length maps to its
    mid-rank percentile u = (midrank − 0.5)/n, making every source's
    transformed feature uniform-on-[0,1] and hence COMPARABLE across
    sources whose raw length distributions differ (the cross-source
    prerequisite for pooled quality models — the prep twin of
    dq_value_drift_psi, which only MEASURES the incomparability).
    Output: per-source occupancy of the u-deciles — flat ≈ n/10 rows
    per bucket everywhere certifies the transform (ties distort only
    their own bucket).

    EXACTNESS: mid-rank u = (rank_min + (ties−1)/2 − 0.5)/n is two
    exact divisions of integer operands; the decile floor is exact.

    Scale: one rank window per source partition (shuffles on source —
    at 100 TB partition the window by (source, hash-bucket) and
    two-pass merge, the global_row_number_twopass pattern); output is
    |sources|×10 rows."""
    d = t(spark, sf_dir, "documents")
    wsrc = Window.partitionBy("source").orderBy("n_chars")
    wtie = Window.partitionBy("source", "n_chars")
    wall = Window.partitionBy("source")
    ranked = d.select(
        "source",
        (
            (
                F.rank().over(wsrc)
                + (F.count("*").over(wtie) - 1) / 2.0
                - 0.5
            )
            / F.count("*").over(wall)
        ).alias("u"),
    )
    return (
        ranked.select(
            "source",
            F.least(
                F.floor(F.col("u") * 10).cast("long"), F.lit(9)
            ).alias("decile"),
        )
        .groupBy("source", "decile")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "decile")
    )


# ------------------------------------------ Viterbi burst detection

_VB_PEN = 500000  # state-entry penalty, 0.5 nats x 1e6 (integer-scaled)


@query(
    "events_burst_viterbi",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1
    ), arrs AS (
      SELECT count(*) AS dd, list(n ORDER BY d) AS ns,
             sum(n) * 1.0 / count(*) AS lam0
      FROM daily
    ), consts AS (
      SELECT dd, ns, lam0, ln(lam0) AS l0, ln(lam0 * 1.05) AS l1,
             lam0 * 1.05 AS lam1
      FROM arrs
    ), costs AS (
      SELECT dd,
             list_transform(ns, n -> CAST(floor(CAST(1000000 AS DOUBLE)
               * (lam0 - n * l0)) AS BIGINT)) AS c0,
             list_transform(ns, n -> CAST(floor(CAST(1000000 AS DOUBLE)
               * (lam1 - n * l1)) AS BIGINT)) AS c1
      FROM consts
    ), fwd AS (
      SELECT 1 AS t, c0[1] AS v0, c1[1] + {_VB_PEN} AS v1,
             CAST([] AS BIGINT[]) AS bs, dd, c0, c1
      FROM costs
      UNION ALL
      SELECT t + 1,
             least(v0, v1) + c0[t + 1],
             least(v1, v0 + {_VB_PEN}) + c1[t + 1],
             bs || [(CASE WHEN v1 < v0 THEN 1 ELSE 0 END)
                    + 2 * (CASE WHEN v0 + {_VB_PEN} < v1
                           THEN 0 ELSE 1 END)],
             dd, c0, c1
      FROM fwd WHERE t < dd
    ), fin AS (
      SELECT * FROM fwd WHERE t = dd
    ), dec AS (
      SELECT 0 AS i,
             CASE WHEN v1 < v0 THEN 1 ELSE 0 END AS cur,
             [CASE WHEN v1 < v0 THEN 1 ELSE 0 END] AS states,
             list_reverse(bs) AS rbs, dd, least(v0, v1) AS mc
      FROM fin
      UNION ALL
      SELECT i + 1,
             CASE WHEN cur = 0 THEN rbs[i + 1] % 2
                  ELSE rbs[i + 1] // 2 END,
             states || [CASE WHEN cur = 0 THEN rbs[i + 1] % 2
                             ELSE rbs[i + 1] // 2 END],
             rbs, dd, mc
      FROM dec WHERE i < len(rbs)
    ), path AS (
      SELECT list_reverse(states) AS st, dd, mc
      FROM dec WHERE i = len(rbs)
    )
    SELECT CAST(dd AS BIGINT) AS n_days,
           CAST(list_sum(st) AS BIGINT) AS n_burst_days,
           CAST(st[1] + list_sum(list_transform(range(1, len(st)),
                i -> CASE WHEN st[i + 1] = 1 AND st[i] = 0
                     THEN 1 ELSE 0 END)) AS BIGINT) AS n_burst_segments,
           mc AS min_cost_scaled
    FROM path
    """,
    tags=("events", "burst", "hmm", "time-series"),
)
def events_burst_viterbi(spark, sf_dir):
    """BURST DETECTION by exact 2-state Viterbi decoding (the
    Kleinberg burst-model shape: a baseline Poisson rate λ₀ and a
    burst state at 1.05·λ₀, with an entry penalty — the OPTIMAL
    segmentation, where the suite's CUSUM/Page-Hinkley/EWMA detectors
    are sequential heuristics): forward pass minimizes scaled negative
    log-likelihood, backward pass decodes the argmin path; output =
    burst-day count, burst-segment count, and the exact min cost.

    INTEGER-EXACT DYNAMIC PROGRAMMING: every emission cost is
    floor(10⁶·(λ_s − n_t·ln λ_s)) — a BIGINT — so all Viterbi
    comparisons, the transition penalty, and the final min cost are
    pure integer arithmetic; the decoded path CANNOT flip on a
    floating-point tie (the discrete-decision hazard that rules out
    plain double DP cross-engine). Spark runs forward+backward as two
    F.aggregate folds over the daily-count array (the Holt-Winters
    pattern, plus a path-decode second fold); the oracle runs the
    same DP as two recursive CTEs. Verified non-vacuous: the fixture
    decodes real multi-day burst segments at every scale.

    Scale: facts collapse to the calendar-bounded daily series; the
    DP is O(|days|) on one row."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("n")
    )
    arr = (
        daily.agg(
            F.count("*").alias("dd"),
            F.sum("n").alias("nt"),
            F.expr(
                "transform(array_sort(collect_list(struct(d, n))),"
                " p -> p.n)"
            ).alias("ns"),
        )
        .select(
            "dd", "ns", (F.col("nt") * 1.0 / F.col("dd")).alias("lam0")
        )
        .select(
            "dd",
            "ns",
            "lam0",
            F.log("lam0").alias("l0"),
            F.log(F.col("lam0") * 1.05).alias("l1"),
            (F.col("lam0") * 1.05).alias("lam1"),
        )
        .select(
            "dd",
            F.expr(
                "transform(ns, n -> CAST(floor(1000000.0D"
                " * (lam0 - n * l0)) AS BIGINT))"
            ).alias("c0"),
            F.expr(
                "transform(ns, n -> CAST(floor(1000000.0D"
                " * (lam1 - n * l1)) AS BIGINT))"
            ).alias("c1"),
        )
    )
    fwd = arr.select(
        "dd",
        F.expr(
            f"""
      aggregate(
        sequence(2, CAST(dd AS INT)),
        named_struct('v0', element_at(c0, 1),
                     'v1', element_at(c1, 1) + {_VB_PEN}L,
                     'bs', CAST(array() AS ARRAY<INT>)),
        (acc, t) -> named_struct(
          'v0', least(acc.v0, acc.v1) + element_at(c0, t),
          'v1', least(acc.v1, acc.v0 + {_VB_PEN}L) + element_at(c1, t),
          'bs', concat(acc.bs, array(
             (CASE WHEN acc.v1 < acc.v0 THEN 1 ELSE 0 END)
             + 2 * (CASE WHEN acc.v0 + {_VB_PEN}L < acc.v1
                    THEN 0 ELSE 1 END)))))"""
        ).alias("st"),
    )
    dec = fwd.select(
        "dd",
        F.expr(
            """
      aggregate(
        reverse(st.bs),
        named_struct('cur', CASE WHEN st.v1 < st.v0 THEN 1 ELSE 0 END,
                     'states',
                     array(CASE WHEN st.v1 < st.v0 THEN 1 ELSE 0 END)),
        (acc, b) -> named_struct(
          'cur', CAST(CASE WHEN acc.cur = 0 THEN b % 2
                           ELSE b div 2 END AS INT),
          'states', concat(acc.states,
                           array(CAST(CASE WHEN acc.cur = 0 THEN b % 2
                                      ELSE b div 2 END AS INT)))))"""
        ).alias("dc"),
        F.expr("least(st.v0, st.v1)").alias("mc"),
    )
    return dec.select(
        "dd", F.expr("reverse(dc.states)").alias("states"), "mc"
    ).select(
        F.col("dd").cast("long").alias("n_days"),
        F.expr("aggregate(states, 0, (a, s) -> a + s)")
        .cast("long")
        .alias("n_burst_days"),
        F.expr(
            """CAST(states[0] AS INT)
           + aggregate(sequence(1, CAST(size(states) - 1 AS INT)), 0,
               (a, i) -> a + IF(element_at(states, i + 1) = 1
                                AND element_at(states, i) = 0, 1, 0))"""
        )
        .cast("long")
        .alias("n_burst_segments"),
        F.col("mc").alias("min_cost_scaled"),
    )


# ------------------------------------------- boolean aggregate family


@query(
    "agg_boolean_family",
    oracle="""
    SELECT o_orderpriority AS priority,
           count(*) AS n,
           CAST(count(*) FILTER (WHERE o_totalprice > 100000)
                AS BIGINT) AS n_large,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           bool_and(o_orderstatus IN ('F', 'O', 'P')) AS statuses_valid
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    tags=("aggregate", "boolean", "orders"),
)
def agg_boolean_family(spark, sf_dir):
    """BOOLEAN AGGREGATE FAMILY — the literal API surface for
    predicate rollups: ``count_if`` (counting a predicate without a
    CASE), ``bool_and``/``every`` (universal), ``bool_or``/``some``
    (existential) — the idioms data-quality gates compile to (the
    reference's own gate, k8s/dags/etl-gcp-vinicius-campos.py:146-151,
    is a count_if in disguise: rows > 0). every/some are exercised as
    the ANSI synonyms of bool_and/bool_or in the same plan.

    Scale: all four are map-side-partial hash aggregates (AND/OR are
    associative+commutative) — one shuffle of 5-group partials."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n"),
            F.expr("count_if(o_totalprice > 100000)").alias("n_large"),
            F.expr("bool_and(o_totalprice > 1000)").alias("all_over_1k"),
            F.expr("bool_or(o_orderstatus = 'F')").alias("any_finished"),
            F.expr(
                "every(o_orderstatus IN ('F', 'O', 'P'))"
            ).alias("statuses_valid"),
        )
        .orderBy("priority")
    )


# ------------------------------------------------ ACF + PACF (D-L)

_PACF_K = 10


@query(
    "analytics_acf_pacf",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ), arrs AS (
      SELECT count(*) AS dd, sum(c) AS sc, list(c ORDER BY d) AS cs
      FROM daily
    ), ysrel AS (
      SELECT dd,
             list_transform(cs, c -> c / 100.0 - sc / (100.0 * dd)) AS ys
      FROM arrs
    ), rhos AS (
      SELECT list_transform(range(1, {_PACF_K} + 1), k ->
               CAST(list_reduce(list_transform(
                      range(CAST(k AS INT) + 1, CAST(len(ys) AS INT) + 1),
                      t -> CAST(ys[t] * ys[t - k] AS DECIMAL(38,6))),
                    (a, b) -> CAST(a + b AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(list_reduce(list_transform(ys,
                      y -> CAST(y * y AS DECIMAL(38,6))),
                    (a, b) -> CAST(a + b AS DECIMAL(38,6))) AS DOUBLE))
             AS rho
      FROM ysrel
    ), dl AS (
      SELECT 1 AS k, [rho[1]] AS phi, [rho[1]] AS pacf, rho FROM rhos
      UNION ALL
      SELECT k + 1,
             list_transform(phi, (p, j) -> p - q.kk * phi[k + 1 - j])
               || [q.kk],
             pacf || [q.kk],
             rho
      FROM (
        SELECT dl.*,
               (rho[k + 1]
                - list_reduce(list_transform(range(1, k + 1),
                    j2 -> phi[j2] * rho[k + 1 - j2]), (a, b) -> a + b))
               / (1.0 - list_reduce(list_transform(range(1, k + 1),
                    j2 -> phi[j2] * rho[j2]), (a, b) -> a + b)) AS kk
        FROM dl WHERE k < {_PACF_K}
      ) q
    ), fin AS (SELECT * FROM dl WHERE k = {_PACF_K})
    SELECT CAST(t.k AS BIGINT) AS k,
           round(rho[t.k], 6) AS acf,
           round(pacf[t.k], 6) AS pacf
    FROM fin, unnest(range(1, {_PACF_K} + 1)) t(k)
    ORDER BY 1
    """,
    tags=("analytics", "time-series", "autocorrelation", "orders"),
)
def analytics_acf_pacf(spark, sf_dir):
    """ACF + PACF to lag {_PACF_K} via the DURBIN-LEVINSON recursion
    (the Box-Jenkins model-identification table: ACF cutoff → MA
    order, PACF cutoff → AR order — the structured upgrade of
    analytics_acf1 and the input stats_ljung_box tests jointly):
    ρ_k from exact centered products (per-term decimal folds — both
    engines sum SEQUENTIALLY via aggregate()/list_reduce, never a
    pairwise list_sum), then φ_kk by the D-L update
    φ_kk = (ρ_k − Σφ_{{k−1,j}}ρ_{{k−j}})/(1 − Σφ_{{k−1,j}}ρ_j).

    The recursion runs as ONE F.aggregate fold over lag index with
    nested inner-product folds (the Holt-Winters pattern, one level
    deeper: HOFs inside HOFs) against a recursive-CTE oracle —
    bit-identical because every inner sum is the same sequential
    left fold on both engines.

    Scale: facts collapse to the calendar-bounded daily series; the
    K² recursion runs on one row."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("c")
    )
    arr = daily.agg(
        F.count("*").alias("dd"),
        F.sum("c").alias("sc"),
        F.expr(
            "transform(array_sort(collect_list(struct(d, c))), p -> p.c)"
        ).alias("cs"),
    ).select(
        "dd",
        F.expr(
            "transform(cs, c -> c / 100.0D - sc / (100.0D * dd))"
        ).alias("ys"),
    )
    acf = arr.select(
        F.expr(
            f"""
  transform(sequence(1, {_PACF_K}), k ->
    CAST(aggregate(sequence(CAST(k AS INT) + 1, CAST(size(ys) AS INT)),
      CAST(0 AS DECIMAL(38,6)),
      (a, t) -> CAST(a + CAST(element_at(ys, t) * element_at(ys, t - k)
                              AS DECIMAL(38,6)) AS DECIMAL(38,6)))
      AS DOUBLE)
    / CAST(aggregate(ys, CAST(0 AS DECIMAL(38,6)),
        (a, y) -> CAST(a + CAST(y * y AS DECIMAL(38,6))
                       AS DECIMAL(38,6))) AS DOUBLE))"""
        ).alias("rho")
    )
    kk_expr = """(element_at(rho, k)
                - aggregate(sequence(1, k - 1), 0.0D,
                    (s, j2) -> s + element_at(acc.phi, j2)
                                 * element_at(rho, k - j2)))
               / (1.0D - aggregate(sequence(1, k - 1), 0.0D,
                    (s, j2) -> s + element_at(acc.phi, j2)
                                 * element_at(rho, j2)))"""
    dl = acf.select(
        "rho",
        F.expr(
            f"""
  aggregate(
    sequence(2, {_PACF_K}),
    named_struct('phi', array(element_at(rho, 1)),
                 'pacf', array(element_at(rho, 1))),
    (acc, k) -> named_struct(
      'phi', concat(
         transform(acc.phi, (p, j) ->
           p - ({kk_expr}) * element_at(acc.phi, k - 1 - j)),
         array({kk_expr})),
      'pacf', concat(acc.pacf, array({kk_expr}))))"""
        ).alias("dl"),
    )
    return (
        dl.select(
            F.posexplode(
                F.expr(
                    "zip_with(rho, dl.pacf,"
                    " (a, p) -> struct(a AS acf, p AS pacf))"
                )
            ).alias("k0", "v")
        )
        .select(
            (F.col("k0") + 1).cast("long").alias("k"),
            F.round(F.col("v.acf"), 6).alias("acf"),
            F.round(F.col("v.pacf"), 6).alias("pacf"),
        )
        .orderBy("k")
    )


# ------------------------------------------------ gzip text roundtrip


@query(
    "io_text_gzip_roundtrip",
    oracle="""
    SELECT count(*) AS n_lines,
           CAST(sum(length(line)) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN line LIKE '%:A' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flag_a
    FROM (
      SELECT l_orderkey || ':' || l_linenumber || ':' || l_returnflag
               AS line
      FROM lineitem WHERE l_orderkey % 11 = 0
    )
    """,
    tags=("io", "text", "compression", "lineitem"),
)
def io_text_gzip_roundtrip(spark, sf_dir):
    """GZIP-COMPRESSED TEXT roundtrip (the .gz line-file path —
    ingest pipelines meet it constantly; unlike parquet codecs, a
    gzip TEXT file is NOT SPLITTABLE, which is the scale trap this
    query documents): a derived line file is written
    gzip-compressed, read back transparently (Spark decompresses by
    extension), and the line count / char mass / flag tally must
    reconstruct the source exactly.

    Scale note: each .gz file decompresses in ONE task — the write
    side controls parallelism by file count (here the source's
    partitioning), never by split; at 100 TB prefer zstd-parquet or
    uncompressed-splittable text for the hot path and treat .gz as an
    ingest-only format.

    Cites the reference's zip ingest (the same not-splittable
    archive-at-rest shape): k8s/cloud-function/
    airport-cloud-function.zip::main.py:5-31."""
    import os

    from gcp_etl_spark.scratch import scratch_dir

    d = scratch_dir("io_text_gz", fresh=True)
    path = os.path.join(d, "lines")
    src = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 11 == 0)
        .select(
            F.concat_ws(
                ":",
                F.col("l_orderkey"),
                F.col("l_linenumber"),
                F.col("l_returnflag"),
            ).alias("value")
        )
    )
    src.write.mode("overwrite").option("compression", "gzip").text(path)
    back = spark.read.text(path)
    return back.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.sum(
            F.when(F.col("value").endswith(":A"), 1).otherwise(0)
        ).alias("n_flag_a"),
    )


# --------------------------------------------- Goertzel audio energy

_GZ_N = 2048  # samples per clip (the codec fixture's clip length)
_GZ_BINS = (64, 128, 256)  # DFT bin indices probed per clip
# 2cos(2*pi*f/N) as repr()-exact literals shared by both engines
_GZ_COEF = {
    f: repr(2.0 * _math.cos(2.0 * _math.pi * f / _GZ_N))
    for f in _GZ_BINS
}


@query(
    "multimodal_audio_goertzel",
    oracle=f"""
    WITH RECURSIVE clips AS (
      SELECT 2 * i + 1 AS media_id FROM generate_series(0, 31) t(i)
    ), bins(fbin, c) AS (
      VALUES {", ".join(
        f"({f}, CAST({c} AS DOUBLE))" for f, c in _GZ_COEF.items())}
    ), g AS (
      SELECT media_id, fbin, c, 0 AS i,
             CAST(0 AS DOUBLE) AS s1, CAST(0 AS DOUBLE) AS s2
      FROM clips, bins
      UNION ALL
      SELECT media_id, fbin, c, i + 1,
             (((37 * media_id + 13 * i) % 4096) - 2048) + c * s1 - s2,
             s1
      FROM g WHERE i < {_GZ_N}
    )
    SELECT media_id, CAST(fbin AS BIGINT) AS freq_bin,
           round(s1 * s1 + s2 * s2 - c * s1 * s2, 3) AS power
    FROM g WHERE i = {_GZ_N}
    ORDER BY media_id, freq_bin
    """,
    tags=("llm", "multimodal", "audio", "spectral"),
)
def multimodal_audio_goertzel(spark, sf_dir):
    """GOERTZEL SINGLE-BIN DFT ENERGY on REAL decoded audio (the
    frequency-domain feature extractor: tone detection, band energy,
    voice-activity features — the spectral member of the audio family
    next to the time-domain ZCR/windows ops): for each WAV clip and
    each probed bin f, the O(N) Goertzel recurrence
    s₀ = x + 2cos(2πf/N)·s₁ − s₂, power = s₁² + s₂² − c·s₁s₂.

    The Spark side DECODES THE ACTUAL RIFF/WAV BYTES (stdlib parser in
    llm/codecs.py) inside mapInPandas and runs the recurrence in
    Python floats; the oracle regenerates the PCM signal from its
    formula and runs the same recurrence as a recursive CTE — the 2048
    steps are identical IEEE double ops (the 2cos coefficients are
    repr()-exact shared literals), so a hash match proves BOTH the
    codec path and the recurrence, bit-exact.

    Scale: decode + recurrence run inside the scan task (samples never
    shuffle — the multimodal house shape); output is |clips|×|bins|
    rows."""
    import pandas as pd  # noqa: PLC0415

    from gcp_etl_spark.llm.codecs import wav_decode
    from gcp_etl_spark.llm.multimodal import synthesize_codec_media

    media = synthesize_codec_media(spark, n=64).filter(
        F.col("mime") == "audio/wav"
    )
    coefs = {f: float(c) for f, c in _GZ_COEF.items()}

    def batches(it):
        for pdf in it:
            mids, fbins, powers = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, _rate = wav_decode(bytes(payload))
                xs = [float(v) for v in samples]
                for f, c in coefs.items():
                    s1 = s2 = 0.0
                    for x in xs:
                        s0 = x + c * s1 - s2
                        s2 = s1
                        s1 = s0
                    mids.append(int(mid))
                    fbins.append(f)
                    powers.append(
                        round(s1 * s1 + s2 * s2 - c * s1 * s2, 3)
                    )
            yield pd.DataFrame(
                {"media_id": mids, "freq_bin": fbins, "power": powers}
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, "media_id long, freq_bin long, power double"
    ).orderBy("media_id", "freq_bin")


# -------------------------------------------- streaming W1 drift dual


@query(
    "stream_wasserstein_drift",
    oracle="""
    WITH ref AS (
      SELECT CAST(floor(value) AS BIGINT) AS b, count(*) AS n_ref
      FROM events GROUP BY 1
    ), win AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS w_start,
             CAST(floor(value) AS BIGINT) AS b, count(*) AS n
      FROM events GROUP BY 1, 2
    ), grid AS (
      SELECT w.w_start, r.b, r.n_ref, coalesce(win.n, 0) AS n
      FROM (SELECT DISTINCT w_start FROM win) w
      CROSS JOIN ref r
      LEFT JOIN win ON win.w_start = w.w_start AND win.b = r.b
    ), cum AS (
      SELECT w_start, b,
             sum(n) OVER (PARTITION BY w_start ORDER BY b) AS cw,
             sum(n_ref) OVER (PARTITION BY w_start ORDER BY b) AS cr,
             lead(b) OVER (PARTITION BY w_start ORDER BY b) AS b_next,
             sum(n) OVER (PARTITION BY w_start) AS nw,
             sum(n_ref) OVER (PARTITION BY w_start) AS nr
      FROM grid
    )
    SELECT w_start, CAST(nw AS BIGINT) AS n_window,
           round(CAST(sum(abs(cw * nr - cr * nw) * (b_next - b))
                      AS DOUBLE)
                 / (CAST(nw AS DOUBLE) * nr), 6) AS w1_drift
    FROM cum WHERE b_next IS NOT NULL
    GROUP BY w_start, nw, nr
    ORDER BY w_start
    """,
    tags=("streaming", "drift", "wasserstein", "events"),
)
def stream_wasserstein_drift(spark, sf_dir):
    """WINDOWED WASSERSTEIN-1 DRIFT MONITOR (the METRIC member of the
    drift family: PSI and the G-test see reshuffled mass, W₁ also
    sees how FAR it moved along the value axis — a price distribution
    sliding up 10% moves W₁ proportionally while PSI just saturates):
    per tumbling day-window, the exact W₁ between the window's
    floor(value)-bucket distribution and the full-corpus reference
    profile, via the integer CDF-difference identity
    (stats_wasserstein_1d).

    Streaming shape (the psi_drift convention): the additive windowed
    bucket count (streaming/windows.py::w1_binned_counts) is the ONLY
    stateful stage — counts merge across micro-batches, so the monitor
    is batching-invariant (pytest-pinned by splitting the corpus and
    merging); the per-window fold runs per micro-batch via
    foreachBatch in a live stream, identically here in batch.

    Scale: state is |windows-in-watermark| × |buckets|; the fold's
    windows run per w_start partition over the already-aggregated
    grid."""
    from gcp_etl_spark.streaming.windows import (
        w1_binned_counts,
        w1_drift,
    )

    e = t(spark, sf_dir, "events")
    ref = e.groupBy(F.floor("value").cast("long").alias("b")).agg(
        F.count("*").alias("n_ref")
    )
    win = w1_binned_counts(e, watermark=None)
    return w1_drift(win, ref).orderBy("w_start")


# -------------------------------------------- Brier decomposition

_BRIER_BINS = 10


@query(
    "stats_brier_decomposition",
    oracle=f"""
    WITH scored AS (
      SELECT ((event_id * 2654435761) % 1000) / 1000.0 AS p,
             CASE WHEN value * (1 + ((event_id * 2654435761) % 1000)
                               / 1000.0) > 60 THEN 1 ELSE 0 END AS y
      FROM events
    ), binned AS (
      SELECT least(CAST(floor(p * {_BRIER_BINS}) AS BIGINT),
                   {_BRIER_BINS - 1}) AS k,
             p, y
      FROM scored
    ), per_bin AS (
      SELECT k, count(*) AS n,
             CAST(sum(CAST(p AS DECIMAL(38,12))) AS DOUBLE) AS sp,
             sum(y) AS sy
      FROM binned GROUP BY 1
    ), tot AS (
      SELECT sum(n) AS nn, CAST(sum(sy) AS DOUBLE) / sum(n) AS ybar
      FROM per_bin
    ), brier AS (
      SELECT CAST(sum(CAST((p - y) * (p - y) AS DECIMAL(38,12)))
                  AS DOUBLE) AS sq
      FROM binned
    )
    SELECT CAST(nn AS BIGINT) AS n,
           round(sq / nn, 6) AS brier_score,
           round(CAST(sum(CAST(n * (sp / n - CAST(sy AS DOUBLE) / n)
                                 * (sp / n - CAST(sy AS DOUBLE) / n)
                               AS DECIMAL(38,12))) AS DOUBLE) / nn, 6)
             AS reliability,
           round(CAST(sum(CAST(n * (CAST(sy AS DOUBLE) / n - ybar)
                                 * (CAST(sy AS DOUBLE) / n - ybar)
                               AS DECIMAL(38,12))) AS DOUBLE) / nn, 6)
             AS resolution,
           round(ybar * (1 - ybar), 6) AS uncertainty
    FROM per_bin, tot, brier
    GROUP BY nn, sq, ybar
    """,
    tags=("stats", "calibration", "scoring", "events"),
)
def stats_brier_decomposition(spark, sf_dir):
    """MURPHY DECOMPOSITION OF THE BRIER SCORE (reliability −
    resolution + uncertainty ≈ Brier, exactly when forecasts are
    bin-constant — the diagnostic that says WHY a probabilistic
    scorer is bad: miscalibrated (reliability↑) vs uninformative
    (resolution↓); quality_calibration_bins plots the curve, this
    scores it): forecast p is a deterministic Knuth-hash rational
    (NO libm, so every value is exact on both engines), outcome
    y = value·(1+p) > 60 — correlated with p by construction, so
    resolution is non-trivial.

    Scale: one scored scan → {_BRIER_BINS}-bin grouped moments
    (map-side partial) → 1-row fold; per-term decimal casts keep all
    sums order-free."""
    e = t(spark, sf_dir, "events")
    p = ((F.col("event_id") * 2654435761) % 1000) / 1000.0
    scored = e.select(
        p.alias("p"),
        F.when(F.col("value") * (1 + p) > 60, 1).otherwise(0).alias("y"),
    )
    binned = scored.select(
        F.least(
            F.floor(F.col("p") * _BRIER_BINS).cast("long"),
            F.lit(_BRIER_BINS - 1),
        ).alias("k"),
        "p",
        "y",
    )
    per_bin = binned.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum(F.col("p").cast("decimal(38,12)")).cast("double").alias("sp"),
        F.sum("y").alias("sy"),
    )
    tot = per_bin.agg(
        F.sum("n").alias("nn"),
        (F.sum("sy").cast("double") / F.sum("n")).alias("ybar"),
    )
    brier = binned.agg(
        F.sum(
            ((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("sq")
    )
    pk = F.col("sp") / F.col("n")
    yk = F.col("sy").cast("double") / F.col("n")
    return (
        per_bin.crossJoin(tot)
        .crossJoin(brier)
        .groupBy("nn", "sq", "ybar")
        .agg(
            F.round(
                F.sum(
                    (F.col("n") * (pk - yk) * (pk - yk)).cast(
                        "decimal(38,12)"
                    )
                ).cast("double")
                / F.col("nn"),
                6,
            ).alias("reliability"),
            F.round(
                F.sum(
                    (
                        F.col("n")
                        * (yk - F.col("ybar"))
                        * (yk - F.col("ybar"))
                    ).cast("decimal(38,12)")
                ).cast("double")
                / F.col("nn"),
                6,
            ).alias("resolution"),
        )
        .select(
            F.col("nn").cast("long").alias("n"),
            F.round(F.col("sq") / F.col("nn"), 6).alias("brier_score"),
            "reliability",
            "resolution",
            F.round(F.col("ybar") * (1 - F.col("ybar")), 6).alias(
                "uncertainty"
            ),
        )
    )


# ---------------------------------------------- multiclass macro-F1


@query(
    "eval_macro_f1",
    oracle="""
    WITH obs AS (
      SELECT event_type AS actual,
             CASE WHEN value < 10 THEN 'click'
                  WHEN value < 30 THEN 'view'
                  WHEN value < 60 THEN 'scroll'
                  WHEN value < 120 THEN 'signup'
                  ELSE 'purchase' END AS predicted
      FROM events
    ), cm AS (
      SELECT actual, predicted, count(*) AS n FROM obs GROUP BY 1, 2
    ), per_class AS (
      SELECT c.cls,
             coalesce(tp.n, 0) AS tp,
             coalesce(p.np, 0) - coalesce(tp.n, 0) AS fp,
             coalesce(a.na, 0) - coalesce(tp.n, 0) AS fn
      FROM (SELECT DISTINCT actual AS cls FROM obs) c
      LEFT JOIN (SELECT actual, n FROM cm WHERE actual = predicted) tp
        ON tp.actual = c.cls
      LEFT JOIN (SELECT predicted, sum(n) AS np FROM cm GROUP BY 1) p
        ON p.predicted = c.cls
      LEFT JOIN (SELECT actual, sum(n) AS na FROM cm GROUP BY 1) a
        ON a.actual = c.cls
    )
    SELECT cls,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           round(CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                 ELSE 2.0 * tp / (2 * tp + fp + fn) END, 6) AS f1,
           round(CAST((SELECT sum(CASE WHEN 2 * tp + fp + fn = 0
                                  THEN CAST(0.0 AS DECIMAL(38,12))
                                  ELSE CAST(2.0 * tp / (2 * tp + fp + fn)
                                       AS DECIMAL(38,12)) END)
                       FROM per_class) AS DOUBLE)
                 / (SELECT count(*) FROM per_class), 6) AS macro_f1
    FROM per_class ORDER BY cls
    """,
    tags=("eval", "classification", "events"),
)
def eval_macro_f1(spark, sf_dir):
    """MULTICLASS CONFUSION-MATRIX EVALUATION with per-class F1 and
    macro-F1 (the model-eval staple next to the suite's AUC/PR-curve
    binary metrics): a deterministic value-threshold classifier
    predicts the event type; per class TP / FP / FN come off the
    confusion matrix, F1 = 2TP/(2TP+FP+FN), macro-F1 = unweighted
    class mean (each F1 term decimal-cast so the mean is order-free).

    Scale: the fact scan collapses to the |classes|² confusion grid in
    one hash agg; every join after that is on the tiny class
    dimension."""
    e = t(spark, sf_dir, "events")
    pred = (
        F.when(F.col("value") < 10, "click")
        .when(F.col("value") < 30, "view")
        .when(F.col("value") < 60, "scroll")
        .when(F.col("value") < 120, "signup")
        .otherwise("purchase")
    )
    obs = e.select(F.col("event_type").alias("actual"), pred.alias("predicted"))
    cm = obs.groupBy("actual", "predicted").agg(F.count("*").alias("n"))
    classes = obs.select(F.col("actual").alias("cls")).distinct()
    tp = cm.filter(F.col("actual") == F.col("predicted")).select(
        F.col("actual").alias("cls"), F.col("n").alias("tp")
    )
    np_ = cm.groupBy("predicted").agg(F.sum("n").alias("np"))
    na = cm.groupBy("actual").agg(F.sum("n").alias("na"))
    per_class = (
        classes.join(tp, "cls", "left")
        .join(np_, classes.cls == np_.predicted, "left")
        .join(na, classes.cls == na.actual, "left")
        .select(
            "cls",
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
            (
                F.coalesce(F.col("np"), F.lit(0))
                - F.coalesce(F.col("tp"), F.lit(0))
            ).alias("fp"),
            (
                F.coalesce(F.col("na"), F.lit(0))
                - F.coalesce(F.col("tp"), F.lit(0))
            ).alias("fn"),
        )
    )
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, F.lit(0.0)
    ).otherwise(
        2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
    )
    macro = per_class.agg(
        (
            F.sum(f1.cast("decimal(38,12)")).cast("double") / F.count("*")
        ).alias("macro_f1")
    )
    return (
        per_class.crossJoin(F.broadcast(macro))
        .select(
            "cls",
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            F.col("fn").cast("long").alias("fn"),
            F.round(f1, 6).alias("f1"),
            F.round("macro_f1", 6).alias("macro_f1"),
        )
        .orderBy("cls")
    )


# --------------------------------------------------- Tukey HSD (q)


@query(
    "stats_tukey_hsd",
    oracle="""
    WITH g AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE)
               AS s2
      FROM events GROUP BY 1
    ), mse AS (
      SELECT sum(s2 - s1 * s1 / n) / (sum(n) - count(*)) AS mse,
             CAST(sum(n) - count(*) AS BIGINT) AS df_err
      FROM g
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           round(a.s1 / a.n - b.s1 / b.n, 6) AS mean_diff,
           round(abs(a.s1 / a.n - b.s1 / b.n)
                 / sqrt(mse / 2.0 * (1.0 / a.n + 1.0 / b.n)), 6)
             AS q_stat,
           df_err
    FROM g a JOIN g b ON a.event_type < b.event_type, mse
    ORDER BY 1, 2
    """,
    tags=("stats", "post-hoc", "anova", "events"),
)
def stats_tukey_hsd(spark, sf_dir):
    """TUKEY HSD POST-HOC COMPARISONS (the step AFTER
    stats_anova_oneway rejects: WHICH pairs of groups differ?): for
    every event-type pair, the studentized-range statistic
    q = |m_i − m_j| / √(MSE/2 · (1/n_i + 1/n_j)) with the pooled
    within-group MSE (the Tukey-Kramer unequal-n form). q compares
    against the studentized range quantile q_{α,k,df}; the statistic
    and df are emitted, the table lookup is the caller's (no libm
    special functions exist in either engine).

    Scale: one grouped moment pass (k rows) → k² pair join on the
    tiny group dimension; exact decimal power sums throughout."""
    e = t(spark, sf_dir, "events")
    v = F.col("value")
    g = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v.cast("decimal(18,2)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(28,4)")).cast("double").alias("s2"),
    )
    mse = g.agg(
        (
            F.sum(F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.sum("n") - F.count("*"))
        ).alias("mse"),
        (F.sum("n") - F.count("*")).cast("long").alias("df_err"),
    )
    a = g.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
        (F.col("s1") / F.col("n")).alias("ma"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
        (F.col("s1") / F.col("n")).alias("mb"),
    )
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(mse))
        .select(
            "type_a",
            "type_b",
            F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
            F.round(
                F.abs(F.col("ma") - F.col("mb"))
                / F.sqrt(
                    F.col("mse")
                    / 2.0
                    * (1.0 / F.col("na") + 1.0 / F.col("nb"))
                ),
                6,
            ).alias("q_stat"),
            "df_err",
        )
        .orderBy("type_a", "type_b")
    )


# -------------------------------------------- hashed feature crosses

_FC_BUCKETS = 64
_FC_MOD = 2147483647  # Mersenne prime for the rolling segment hash


@query(
    "prep_hashed_feature_cross",
    oracle=f"""
    WITH crossed AS (
      SELECT c_nationkey, c_mktsegment,
             (c_nationkey * 31 + list_reduce(
                list_transform(range(1, length(c_mktsegment) + 1),
                               i -> CAST(ascii(c_mktsegment[i])
                                         AS BIGINT)),
                (h, a) -> (h * 31 + a) % {_FC_MOD}))
             % {_FC_BUCKETS} AS bucket
      FROM customer
    ), per_bucket AS (
      SELECT bucket, count(*) AS n,
             count(DISTINCT (c_nationkey, c_mktsegment)) AS n_crosses
      FROM crossed GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS buckets_used,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(sum(n_crosses) AS BIGINT) AS cross_slots,
           CAST((SELECT count(DISTINCT (c_nationkey, c_mktsegment))
                 FROM customer) AS BIGINT) AS distinct_crosses,
           round(1.0 - count(*) * 1.0
                       / (SELECT count(DISTINCT (c_nationkey,
                                                 c_mktsegment))
                          FROM customer), 6) AS collision_gain,
           CAST(max(n_crosses) AS BIGINT) AS worst_bucket_crosses
    FROM per_bucket
    """,
    tags=("prep", "feature-hashing", "customer"),
)
def prep_hashed_feature_cross(spark, sf_dir):
    """HASHED FEATURE CROSS (the hashing trick for categorical
    crosses — nation × market-segment crossed into {_FC_BUCKETS}
    buckets, the fixed-width embedding-table input large-scale
    recommenders use instead of a vocabulary that grows with the
    data): bucket = (nation·31 + rollhash(segment)) mod {_FC_BUCKETS},
    with bucket occupancy, how many distinct raw crosses share each
    bucket, and the collision rate the width choice costs:
    collision_gain = 1 − buckets_used / distinct_crosses — the share
    of distinct crosses that LOST their own bucket to a collision.
    (An earlier formulation compared distinct_crosses against
    Σ n_crosses over buckets, which are identical by construction —
    bucket is a deterministic function of the cross — so it was
    identically 0; r9 ADVICE. The fixture pin in tests/test_r9b.py
    asserts the fixture really collides: 125 crosses into 64 buckets
    forces collision_gain > 0 by pigeonhole.)

    PORTABLE HASH, DELIBERATELY: builtin hash() differs between
    engines (Spark = Murmur3, DuckDB = its own), so the segment hashes
    via an explicit base-31 ASCII rolling hash both engines compute
    identically — the same engine-portability constraint a real
    feature store faces when training (Spark) and serving (another
    runtime) must bucket identically.

    Scale: pure per-row map + one grouped count; the audit relation is
    ≤ {_FC_BUCKETS} rows."""
    e = t(spark, sf_dir, "customer")
    rollhash = F.expr(
        f"""aggregate(sequence(1, length(c_mktsegment)), 0L,
          (h, i) -> (h * 31 + ascii(substring(c_mktsegment, i, 1)))
                    % {_FC_MOD})"""
    )
    crossed = e.select(
        "c_nationkey",
        "c_mktsegment",
        ((F.col("c_nationkey") * 31 + rollhash) % _FC_BUCKETS).alias(
            "bucket"
        ),
    )
    per_bucket = crossed.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.countDistinct("c_nationkey", "c_mktsegment").alias("n_crosses"),
    )
    tot = crossed.agg(
        F.countDistinct("c_nationkey", "c_mktsegment").alias(
            "distinct_crosses"
        )
    )
    return per_bucket.crossJoin(F.broadcast(tot)).agg(
        F.count("*").cast("long").alias("buckets_used"),
        F.sum("n").cast("long").alias("n_rows"),
        F.sum("n_crosses").cast("long").alias("cross_slots"),
        F.max("distinct_crosses").cast("long").alias("distinct_crosses"),
        F.round(
            1.0 - F.count("*") * 1.0 / F.max("distinct_crosses"),
            6,
        ).alias("collision_gain"),
        F.max("n_crosses").cast("long").alias("worst_bucket_crosses"),
    )
