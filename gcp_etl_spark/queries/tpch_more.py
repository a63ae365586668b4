"""Additional TPC-H-shaped analytics queries — broader join/agg
composition coverage on the star schema (SURVEY.md §2B "Joins" /
"Aggregations"; fixtures FIXTURES.md §2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_etl_spark.queries._exact import dsum_expr
from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("aggregate", "filter", "tpch"),
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: highly-selective conjunctive filter + global
    agg — the pure predicate-pushdown benchmark (no shuffle at all
    beyond the final 1-row combine)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum_expr(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH best AS (
      SELECT s_nationkey, min(s_acctbal) AS min_bal
      FROM supplier GROUP BY s_nationkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name, s.s_acctbal
    FROM supplier s
    JOIN best b ON s.s_nationkey = b.s_nationkey AND s.s_acctbal = b.min_bal
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    tags=("join", "aggregate", "tpch"),
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: min-per-group then join back on the extremum
    (equality on untouched parquet doubles is exact)."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    best = s.groupBy(F.col("s_nationkey").alias("bk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        s.join(
            F.broadcast(best),
            (s.s_nationkey == best.bk) & (s.s_acctbal == best.min_bal),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_name, o_orderkey, o_totalprice, big.total_qty
    FROM orders
    JOIN (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    ) big ON o_orderkey = big.l_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
    tags=("join", "aggregate", "having", "tpch"),
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: pre-aggregated fact (HAVING) joined back to
    its parents — aggregate-before-join keeps the join input small."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "aggregate", "tpch"),
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS with a cross-table predicate → left-semi
    join with the condition inside the join."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size IN (10, 20, 30, 40) AND p_brand <> 'Brand#13'
    GROUP BY p_brand, p_type
    """,
    tags=("join", "distinct", "aggregate", "tpch"),
)
def q16_part_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape: IN-list + inequality filters on a broadcast
    dim, count-distinct over the joined fact."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        F.col("p_size").isin(10, 20, 30, 40) & (F.col("p_brand") != "Brand#13")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("join", "aggregate", "topk", "tpch"),
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: 4-way join on returned items, revenue per
    customer, top-20 (TakeOrdered on the rounded-exact revenue)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    tags=("join", "aggregate", "conditional", "tpch"),
)
def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: conditional counting (CASE inside sum) over a
    fact-fact join."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE) AS promo_share,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
    """,
    tags=("join", "aggregate", "conditional", "tpch"),
)
def q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional-revenue ratio (both legs exact-
    decimal sums -> the double division is bitwise-stable)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01 00:00:00").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_share"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q7_nation_trade",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice, l_discount
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "aggregate", "tpch"),
)
def q7_nation_trade(spark, sf_dir):
    """TPC-H Q7 shape: the same dim joined twice under different roles
    (supplier nation vs customer nation) with a symmetric OR predicate,
    grouped by derived year."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@query(
    "q21_waiting_orders",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
    tags=("join", "semi", "anti", "aggregate", "tpch"),
)
def q21_waiting_orders(spark, sf_dir):
    """TPC-H Q21 shape: EXISTS + NOT EXISTS against the same fact
    (multi-supplier orders where this supplier shipped last) — a
    semi-join and an anti-join with correlated inequality conditions."""
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = t(spark, sf_dir, "lineitem").alias("l1")
    l2 = t(spark, sf_dir, "lineitem").alias("l2")
    l3 = t(spark, sf_dir, "lineitem").alias("l3")
    base = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
    )
    with_other = base.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    not_latest_elsewhere = with_other.join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return not_latest_elsewhere.groupBy("s_name").agg(F.count("*").alias("numwait"))


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
      SELECT substring(c_name, 10, 2) AS cntry, c_acctbal FROM customer
      WHERE substring(c_name, 10, 2) IN ('00', '01', '02', '03')
        AND c_acctbal > (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / count(c_acctbal)
          FROM customer WHERE c_acctbal > 0
        )
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_totalprice > 400000)
    )
    SELECT cntry, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM eligible GROUP BY cntry
    """,
    tags=("join", "anti", "subquery", "aggregate", "tpch"),
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: substring-derived code + IN-list + scalar
    subquery threshold (exact-decimal avg) + NOT EXISTS anti join
    (against big orders so the result is non-empty at every sf)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    cntry = F.substring("c_name", 10, 2)
    pos = c.filter(F.col("c_acctbal") > 0)
    avg_bal = (
        pos.agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("c_acctbal")
            ).alias("t")
        )
    )
    eligible = (
        c.filter(cntry.isin("00", "01", "02", "03"))
        .join(F.broadcast(avg_bal), F.lit(True))
        .filter(F.col("c_acctbal") > F.col("t"))
        .join(
            o.filter(F.col("o_totalprice") > 400000),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
    )
    return eligible.groupBy(cntry.alias("cntry")).agg(
        F.count("*").alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias(
            "totacctbal"
        ),
    )


@query(
    "q2_full_derived_partsupp",
    oracle="""
    WITH ns AS (SELECT count(*) AS n FROM supplier),
    ps AS (
      SELECT p_partkey AS ps_partkey,
             ((p_partkey + j * 7) % (SELECT n FROM ns)) + 1 AS ps_suppkey,
             CAST((p_partkey * 31
                   + (((p_partkey + j * 7) % (SELECT n FROM ns)) + 1) * 17)
                  % 10000 AS DOUBLE) / 100.0 + 1.0 AS ps_supplycost
      FROM part, unnest([0, 1, 2, 3]) AS t(j)
    ),
    eur AS (
      SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost,
             s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    best AS (SELECT ps_partkey, min(ps_supplycost) AS min_cost
             FROM eur GROUP BY 1)
    SELECT e.s_acctbal, e.s_name, e.n_name,
           p.p_partkey, p.p_type, e.ps_supplycost
    FROM eur e
    JOIN best b ON b.ps_partkey = e.ps_partkey
                AND e.ps_supplycost = b.min_cost
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_size BETWEEN 10 AND 15
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey,
             e.ps_supplycost
    LIMIT 100
    """,
    tags=("join", "subquery", "tpch"),
)
def q2_full_derived_partsupp(spark, sf_dir):
    """CANONICAL TPC-H Q2 shape (min-cost supplier per part within a
    region, the decorrelated form of Q2's correlated subquery) over a
    DERIVED partsupp: the fixture ships no partsupp table, so both
    engines synthesize the identical one — 4 suppliers per part by a
    modular formula, supply cost a pure integer-arithmetic function of
    the keys cast to double (identical IEEE values, so the min-cost
    equality join is exact). Upgrades the adapted `q2_min_cost_supplier`
    to the full five-table Q2 plan: derived fact -> broadcast dims ->
    min-per-group -> extremum join-back -> total-order LIMIT.

    Scale notes: supplier count rides in as a broadcast scalar; the
    region filter prunes before the min-agg; the join back on
    (partkey, min cost) is the standard argmin-without-window shape
    whose both sides are the SAME derived relation (exchange reuse)."""
    par_n = spark.sparkContext.defaultParallelism  # noqa: F841
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    ns = s.agg(F.count("*").alias("n"))
    ps = (
        p.select("p_partkey")
        .crossJoin(F.broadcast(ns))
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("j"),
            "n",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("j") * 7) % F.col("n") + 1).alias(
                "ps_suppkey"
            ),
        )
        .withColumn(
            "ps_supplycost",
            (
                (
                    F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17
                ) % 10000
            ).cast("double")
            / 100.0
            + 1.0,
        )
    )
    eur = (
        ps.alias("ps")
        .join(
            F.broadcast(s.alias("sup")),
            F.col("ps.ps_suppkey") == F.col("sup.s_suppkey"),
        )
        .join(
            F.broadcast(n.alias("nat")),
            F.col("sup.s_nationkey") == F.col("nat.n_nationkey"),
        )
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE").alias("reg")),
            F.col("nat.n_regionkey") == F.col("reg.r_regionkey"),
        )
        .select(
            "ps.ps_partkey", "ps.ps_suppkey", "ps.ps_supplycost",
            "sup.s_name", "sup.s_acctbal", "nat.n_name",
        )
    )
    best = eur.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eur.join(
            best,
            (eur.ps_partkey == best.ps_partkey)
            & (eur.ps_supplycost == best.min_cost),
        )
        .drop(best.ps_partkey)
        .join(
            F.broadcast(p.filter(F.col("p_size").between(10, 15))),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .select(
            "s_acctbal", "s_name", "n_name",
            "p_partkey", "p_type", "ps_supplycost",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey",
            "ps_supplycost",
        )
        .limit(100)
    )


# shared derived-partsupp surface (no partsupp fixture): 4 suppliers
# per part via a modular formula; cost/availqty pure integer functions
# of the keys so every derived value is identical on both engines
_PS_SQL = """
    ns AS (SELECT count(*) AS n FROM supplier),
    ps AS (
      SELECT p_partkey AS ps_partkey,
             ((p_partkey + j * 7) % (SELECT n FROM ns)) + 1 AS ps_suppkey,
             ((p_partkey * 31
               + (((p_partkey + j * 7) % (SELECT n FROM ns)) + 1) * 17)
              % 10000) + 100 AS ps_cost_cents,
             ((p_partkey * 37
               + (((p_partkey + j * 7) % (SELECT n FROM ns)) + 1) * 11)
              % 9999) + 1 AS ps_availqty
      FROM part, unnest([0, 1, 2, 3]) AS t(j)
    )
"""


def _derived_partsupp(spark, sf_dir):
    """(ps_partkey, ps_suppkey, ps_cost_cents, ps_availqty) — the
    Spark side of ``_PS_SQL``."""
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    ns = s.groupBy().agg(F.count("*").alias("n"))
    return (
        p.select("p_partkey")
        .crossJoin(F.broadcast(ns))
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("j"),
            "n",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("j") * 7) % F.col("n") + 1).alias(
                "ps_suppkey"
            ),
        )
        .withColumn(
            "ps_cost_cents",
            (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 10000
            + 100,
        )
        .withColumn(
            "ps_availqty",
            (F.col("ps_partkey") * 37 + F.col("ps_suppkey") * 11) % 9999 + 1,
        )
    )


@query(
    "q11_full_derived_partsupp",
    oracle=f"""
    WITH {_PS_SQL},
    natps AS (
      SELECT ps_partkey, ps_cost_cents * ps_availqty AS v
      FROM ps
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
    ),
    agg AS (SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_cents
            FROM natps GROUP BY 1),
    tot AS (SELECT sum(v) AS g FROM natps)
    SELECT ps_partkey, value_cents
    FROM agg, tot
    WHERE value_cents > g * 0.001
    ORDER BY value_cents DESC, ps_partkey
    """,
    tags=("join", "subquery", "having", "tpch"),
)
def q11_full_derived_partsupp(spark, sf_dir):
    """CANONICAL TPC-H Q11 shape (supplier-nation stock value per
    part, kept only above a fraction of the GLOBAL value — the
    scalar-subquery HAVING) over the derived partsupp. Stock values
    are integer cents x integer quantity summed as BIGINT, so the
    aggregate is exact on both engines; only the threshold itself
    (global_sum x 0.001) goes through double, identically."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    ps = _derived_partsupp(spark, sf_dir)
    natps = (
        ps.alias("ps")
        .join(
            F.broadcast(s.alias("sup")),
            F.col("ps.ps_suppkey") == F.col("sup.s_suppkey"),
        )
        .join(
            F.broadcast(
                n.filter(F.col("n_name") == "NATION_3").alias("nat")
            ),
            F.col("sup.s_nationkey") == F.col("nat.n_nationkey"),
        )
        .select(
            "ps.ps_partkey",
            (F.col("ps.ps_cost_cents") * F.col("ps.ps_availqty")).alias("v"),
        )
    )
    agg = natps.groupBy("ps_partkey").agg(F.sum("v").alias("value_cents"))
    tot = natps.agg(F.sum("v").alias("g"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") > F.col("g") * 0.001)
        .select("ps_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "ps_partkey")
    )


@query(
    "q20_full_derived_partsupp",
    oracle=f"""
    WITH {_PS_SQL},
    qty AS (
      SELECT l_partkey, l_suppkey, 0.5 * sum(l_quantity) AS half_qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01'
        AND l_shipdate <  DATE '1996-01-01'
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT ps_suppkey
      FROM ps
      JOIN qty ON qty.l_partkey = ps.ps_partkey
              AND qty.l_suppkey = ps.ps_suppkey
      WHERE ps_partkey % 10 = 3 AND ps_availqty > half_qty
    )
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (SELECT ps_suppkey FROM cand)
      AND n_name = 'NATION_7'
    ORDER BY s_name, s_suppkey
    """,
    tags=("join", "subquery", "semi", "tpch"),
)
def q20_full_derived_partsupp(spark, sf_dir):
    """CANONICAL TPC-H Q20 shape (suppliers with excess stock of
    selected parts, the nested-IN / correlated-sum query) over the
    derived partsupp: the correlated half-of-shipped-quantity
    threshold is pre-aggregated per (part, supplier) and joined —
    the standard decorrelation — then the outer IN becomes a
    left-semi join against the distinct candidate suppliers."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    li = t(spark, sf_dir, "lineitem")
    ps = _derived_partsupp(spark, sf_dir)
    qty = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    )
    cand = (
        ps.filter(F.col("ps_partkey") % 10 == 3)
        .join(
            qty,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        s.join(
            F.broadcast(n.filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(cand, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name", "s_suppkey")
    )


@query(
    "q9_full_derived_partsupp",
    oracle=f"""
    WITH {_PS_SQL},
    joined AS (
      SELECT n_name AS nation,
             CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
               AS rev,
             CAST(ps_cost_cents * l_quantity AS DECIMAL(18,6)) AS cost_c
      FROM lineitem
      JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      WHERE l_partkey % 5 = 0
    )
    SELECT nation, o_year,
           CAST(sum(rev) - sum(cost_c) / 100 AS DOUBLE) AS sum_profit
    FROM joined
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "aggregate", "tpch"),
)
def q9_full_derived_partsupp(spark, sf_dir):
    """CANONICAL TPC-H Q9 shape (product profit per nation per year:
    revenue minus supply cost, which REQUIRES partsupp) over the
    derived partsupp. Profit is summed per the decimal policy
    (_exact.py): revenue in DECIMAL(18,6), supply cost as integer
    cents x quantity in DECIMAL(18,6) scaled at the end — both sums
    exact, the one double cast identical on both engines. Plan: fact
    joins the 4-rows-per-part derived table on the composite key,
    dims broadcast, orders joined for the year only."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 5 == 0)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    ps = _derived_partsupp(spark, sf_dir)
    joined = (
        li.join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)")
            .alias("rev"),
            (F.col("ps_cost_cents") * F.col("l_quantity"))
            .cast("decimal(18,6)")
            .alias("cost_c"),
        )
    )
    return (
        joined.groupBy("nation", "o_year")
        .agg(
            (F.sum("rev") - F.sum("cost_c") / 100)
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )
