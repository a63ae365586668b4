"""Remaining TPC-H query shapes (Q8, Q9, Q11, Q13, Q15, Q17, Q19, Q20)
— completes all 22 TPC-H shapes over the star schema (SURVEY.md §2B
"Joins"/"Aggregations"; fixtures FIXTURES.md §2).

The fixture schema has no ``partsupp`` table, so the three queries that
need supply cost / availability (Q9, Q11, Q20) are adapted the same way
Q2 was: ``p_retailprice`` stands in for unit cost and shipped
``l_quantity`` for availability. The join/aggregation/subquery SHAPE —
what each query exercises in the optimizer — is preserved.

Scale notes (100 TB design): every dim side is broadcast; the fact-fact
paths (Q13's outer join, Q17's per-part average) shuffle once on their
natural key and pre-aggregate before joining back, so the shuffled
payload is the aggregate, not the fact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_etl_spark.queries._exact import dsum_expr
from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev_dec END)
                AS DOUBLE)
           / CAST(sum(rev_dec) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
               AS rev_dec,
             n2.n_name AS supp_nation
      FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("join", "aggregate", "conditional", "tpch"),
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: national market share — 8-way star join (nation twice,
    region once) with a conditional-revenue ratio per order year. Both
    ratio legs are exact-decimal sums, so the double division is
    bitwise-stable (cf. q14). Reference parity: generalizes the SQL
    surface of k8s/submit/etl-on-gcp-vinicius-campos.py:47."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    rev_dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_rkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", rev_dec)
                ).cast("double")
                / F.sum(rev_dec).cast("double")
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
    FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
    tags=("join", "aggregate", "tpch"),
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 (adapted: no partsupp → p_retailprice*l_quantity as the
    cost leg): profit by supplier nation and order year over a LIKE-
    filtered part set. price*(1-disc) is exactly 4dp and price*qty
    exactly 2dp, so the decimal(18,6) per-row cast is exact on both
    engines."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum_expr(profit).alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH pv AS (
      SELECT p_partkey,
             sum(CAST(l_quantity * p_retailprice AS DECIMAL(18,2))) AS vdec
      FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY p_partkey
    )
    SELECT p_partkey, CAST(vdec AS DOUBLE) AS stock_value
    FROM pv
    WHERE CAST(vdec AS DOUBLE) >
          (SELECT CAST(sum(vdec) AS DOUBLE) * 0.001 FROM pv)
    """,
    tags=("join", "aggregate", "subquery", "tpch"),
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 (adapted: shipped l_quantity*p_retailprice as the
    stock-value proxy): per-part value vs a global-fraction scalar
    subquery. Both the per-part value and the grand total are exact
    decimal sums, so the 0.001-fraction threshold is the identical
    double on both engines — no accumulation-order flakiness at the
    comparison boundary."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    pv = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_partkey")
        .agg(
            F.sum(
                (F.col("l_quantity") * F.col("p_retailprice")).cast("decimal(18,2)")
            ).alias("vdec")
        )
    )
    total = pv.agg((F.sum("vdec").cast("double") * 0.001).alias("threshold"))
    return (
        pv.join(F.broadcast(total), F.lit(True))
        .filter(F.col("vdec").cast("double") > F.col("threshold"))
        .select("p_partkey", F.col("vdec").cast("double").alias("stock_value"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("join", "outer", "aggregate", "tpch"),
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: customer order-count distribution — LEFT OUTER join
    with an extra join-side predicate (customers with zero qualifying
    orders must survive as c_count=0), then a second aggregation over
    the first's result."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("join", "aggregate", "subquery", "tpch"),
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: the view-then-max shape — revenue per supplier over a
    quarter, keep the supplier(s) hitting the global max. Revenues are
    exact-decimal sums, so max() and the equality against it compare
    bitwise-identical doubles on both engines."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("best_rev"))
    # no broadcast hint on `revenue`: it is fact-derived (one row per
    # supplier — billions at 100 TB); AQE still auto-broadcasts it when
    # it is actually small, and falls back to SMJ when it is not.
    return (
        s.join(revenue, s.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(best), F.lit(True))
        .filter(F.col("total_revenue") == F.col("best_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / 7.0 AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
    tags=("join", "subquery", "aggregate", "tpch"),
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: correlated per-part average threshold — rewritten as
    aggregate-then-join-back (the per-part avg shuffles once on
    l_partkey and broadcasts as an aggregate, never a fact×fact join).
    l_quantity is integer-valued, so avg() is sum-of-integers/count —
    order-independent and identical on both engines."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    # `per_part` is fact-derived (one row per part — too big to force-
    # broadcast at 100 TB); leave the strategy to AQE, which broadcasts
    # it when small and sort-merge-joins on l_partkey otherwise.
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("join", "filter", "aggregate", "tpch"),
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19: disjunction of conjunctive brand/size/quantity
    predicates spanning both join sides — Catalyst extracts the common
    p_partkey equi-key so it stays a broadcast-hash join with the OR as
    a post-join filter (not a nested-loop)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(
            arm("Brand#1", 15, 1, 21)
            | arm("Brand#2", 25, 10, 30)
            | arm("Brand#3", 35, 20, 40)
        )
        .agg(
            dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q20_potential_promotion",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3',
                     'NATION_4', 'NATION_5')
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100
      )
    """,
    tags=("join", "semi", "subquery", "having", "tpch"),
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 (adapted: shipped quantity stands in for partsupp
    availability): nation-filtered suppliers semi-joined against a
    HAVING-filtered aggregate over a LIKE-selected part set. sum of
    integer-valued quantities is exact, so the HAVING threshold is
    deterministic."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"
        )
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("red_qty"))
        .filter(F.col("red_qty") > 100)
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )
