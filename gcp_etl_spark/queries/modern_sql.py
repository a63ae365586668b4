"""Spark 4 modern-SQL surface: recursive CTEs, the VARIANT type, and
(in io_formats) native XML. All NS extensions — the reference predates
every one of these — declared with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t

_REC_ORACLE = """
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-08-01'
    )
    SELECT m AS month_start, count(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders
      ON CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) = m
    GROUP BY m
"""

_REC_SPARK = """
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP_NTZ'1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP_NTZ'2001-08-01'
    )
    SELECT m AS month_start, count(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders_rec_v
      ON CAST(date_trunc('MONTH', o_orderdate) AS TIMESTAMP_NTZ) = m
    GROUP BY m
"""


@query("subq_recursive_cte", oracle=_REC_ORACLE, tags=("subquery", "recursive", "sql"))
def subq_recursive_cte(spark, sf_dir):
    """Recursive CTE (new in Spark 4): generate the 80-month calendar
    spine recursively, left-join order counts per month — the
    gaps-preserving time-series scaffold (months with zero orders
    survive). Recursion depth is the spine length, not data-bound."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_rec_v")
    return spark.sql(_REC_SPARK)


@query(
    "scalar_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CAST(json_extract_string(props, '$.missing') AS INT) AS k_missing
    FROM events WHERE event_id % 25 = 0
    """,
    tags=("scalar", "variant", "json"),
)
def scalar_variant_json(spark, sf_dir):
    """VARIANT semi-structured type (new in Spark 4): parse_json once
    into the binary variant encoding, then typed variant_get paths —
    unlike get_json_object the parse cost is paid once per row, not
    per extraction, and the encoding is columnar-shreddable. Missing
    paths yield NULL (DuckDB mirror: json_extract casts)."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 25 == 0)
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_val"),
        F.try_variant_get(v, "$.missing", "int").alias("k_missing"),
    )


@query(
    "catalog_insert_overwrite",
    oracle="""
    SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1
    """,
    tags=("catalog", "dml", "sql"),
)
def catalog_insert_overwrite(spark, sf_dir):
    """Catalog DML surface: CREATE TABLE (external parquet) + INSERT
    OVERWRITE + read back via the session catalog — the warehouse-
    table counterpart of the path-based sinks (reference's R14
    BigQuery load used WRITE_TRUNCATE = the same overwrite-load
    contract)."""
    from gcp_etl_spark.scratch import scratch_dir

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_cat_v")
    loc = scratch_dir("cat_tbl", fresh=True)
    spark.sql("DROP TABLE IF EXISTS cat_status_counts")
    spark.sql(
        f"""CREATE TABLE cat_status_counts (o_orderstatus STRING, n BIGINT)
            USING parquet LOCATION '{loc}'"""
    )
    spark.sql(
        """INSERT OVERWRITE TABLE cat_status_counts
           SELECT o_orderstatus, count(*) FROM orders_cat_v GROUP BY 1"""
    )
    return spark.table("cat_status_counts")


@query(
    "join_bucketed_smb",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("join", "bucketing", "catalog", "scale"),
)
def join_bucketed_smb(spark, sf_dir):
    """Shuffle-free sort-merge join via bucketed catalog tables: both
    sides written ``bucketBy(8, key) + sortBy(key)``, so the join
    requires NO Exchange on either side — bucket pruning gives each
    task one pre-sorted bucket pair. This is THE 100 TB pattern for a
    repeatedly-joined fact/dim pair: pay the clustering once at write
    time, amortize it over every subsequent join (the per-query shuffle
    of both sides is the single largest cost a naive plan has at that
    scale). The absence of shuffles under the SortMergeJoin is plan-
    asserted in tests/test_scale_strategies.py. Small caveat: at toy
    scale AQE may still pick a broadcast join — semantics identical;
    the plan test pins SMJ explicitly via conf."""
    import os
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name, src, key in (
        ("smb_orders", "orders", "o_custkey"),
        ("smb_customer", "customer", "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # a fresh session's metastore does not know tables a previous
        # run left in the warehouse dir — DROP is then a no-op and the
        # managed-table location collides (LOCATION_ALREADY_EXISTS)
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
        (
            t(spark, sf_dir, src)
            .write.format("parquet")
            .bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    o = spark.table("smb_orders")
    c = spark.table("smb_customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


# parent(n) = n div 2 — an implicit binary hierarchy over part keys;
# the walk is the same recursive SQL on both engines modulo the
# integer-division dialect token (Spark `div`, DuckDB `//`).
def _hier_sql(table: str, intdiv: str) -> str:
    return f"""
    WITH RECURSIVE h(node, depth) AS (
      SELECT CAST(1 AS BIGINT), 0
      UNION ALL
      SELECT p.p_partkey, h.depth + 1
      FROM {table} p JOIN h ON (p.p_partkey {intdiv} 2) = h.node
      WHERE p.p_partkey > 1
    )
    SELECT depth,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS first_node,
           CAST(max(node) AS BIGINT) AS last_node
    FROM h GROUP BY depth ORDER BY depth
    """


@query(
    "subq_recursive_hierarchy",
    oracle=_hier_sql("part", "//"),
    tags=("subquery", "recursive", "hierarchy", "sql"),
)
def subq_recursive_hierarchy(spark, sf_dir):
    """Recursive hierarchy closure (org-chart / category-tree walk):
    parent(n) = n div 2 makes part keys an implicit binary tree; the
    recursive CTE walks it breadth-first from the root, emitting per-
    depth level stats. Spark 4 runs the IDENTICAL recursive SQL as
    the oracle (only the integer-division token differs by dialect) —
    recursion depth is log2(#parts), each step one join against the
    previous frontier."""
    t(spark, sf_dir, "part").createOrReplaceTempView("part_hier_v")
    try:
        return spark.sql(_hier_sql("part_hier_v", "div"))
    finally:
        spark.catalog.dropTempView("part_hier_v")


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    HAVING count(*) > 10
    ORDER BY o_orderpriority
    """,
    tags=("sql", "spark4", "orders"),
)
def sql_pipe_syntax(spark, sf_dir):
    """SQL PIPE SYNTAX (Spark 4, the |> operator-chain form from
    Google's 'Pipe Syntax in SQL' paper): the same filter → aggregate
    → having → order pipeline expressed as sequential |> stages —
    Catalyst resolves it to the identical plan as the nested-SELECT
    form the oracle runs, which is exactly what this query pins
    (the new parser front-end changes nothing semantically)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe_v")
    return spark.sql(
        """
        FROM orders_pipe_v
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS revenue
           GROUP BY o_orderpriority
        |> WHERE n_orders > 10
        |> SELECT o_orderpriority, cast(n_orders as bigint) AS n_orders,
                  revenue
        |> ORDER BY o_orderpriority
        """
    )


@query(
    "sql_udf_scalar",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             AS charged
    FROM lineitem
    WHERE l_quantity >= 25
    GROUP BY 1 ORDER BY 1
    """,
    tags=("sql", "udf", "spark4", "lineitem"),
)
def sql_udf_scalar(spark, sf_dir):
    """SQL-language scalar UDF (Spark 4 ``CREATE FUNCTION ... RETURN
    expr``): the charged-amount business rule defined ONCE as a
    catalog function and reused in the query — unlike a Python UDF it
    inlines into the plan at analysis time, so whole-stage codegen and
    pushdown still apply (the oracle runs the expanded expression; a
    hash match proves the inlining is semantics-preserving)."""
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS charged_amount")
    spark.sql(
        """CREATE TEMPORARY FUNCTION charged_amount(
             price DOUBLE, disc DOUBLE, tax DOUBLE)
           RETURNS DOUBLE
           RETURN price * (1 - disc) * (1 + tax)"""
    )
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_udf_v")
    return spark.sql(
        """
        SELECT l_returnflag,
               cast(count(*) as bigint) AS n,
               round(sum(charged_amount(l_extendedprice, l_discount, l_tax)),
                     2) AS charged
        FROM lineitem_udf_v
        WHERE l_quantity >= 25
        GROUP BY 1 ORDER BY 1
        """
    )


@query(
    "agg_listagg_ordered",
    oracle="""
    SELECT c_mktsegment,
           string_agg(n_name, '|' ORDER BY n_name) AS nations,
           CAST(count(DISTINCT n_name) AS BIGINT) AS n_nations
    FROM (
      SELECT DISTINCT c.c_mktsegment, n.n_name
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    ) GROUP BY 1 ORDER BY 1
    """,
    tags=("agg", "sql", "spark4"),
)
def agg_listagg_ordered(spark, sf_dir):
    """ANSI LISTAGG ... WITHIN GROUP (Spark 4): deterministic ordered
    string aggregation of the distinct nations per market segment —
    the standard-SQL spelling of what previously required
    array_sort(collect_set(...)) gymnastics. The ordered form is the
    only hash-stable one (unordered listagg is nondeterministic under
    partitioning by design).

    Scale: the aggregation input is the DISTINCT (segment, nation)
    relation — dimension-bounded, never the raw fact rows."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    c.join(
        F.broadcast(n), n.n_nationkey == c.c_nationkey
    ).select("c_mktsegment", "n_name").distinct().createOrReplaceTempView(
        "seg_nation_v"
    )
    return spark.sql(
        """
        SELECT c_mktsegment,
               listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name)
                 AS nations,
               cast(count(DISTINCT n_name) as bigint) AS n_nations
        FROM seg_nation_v GROUP BY 1 ORDER BY 1
        """
    )


@query(
    "scalar_collation_lcase",
    oracle="""
    SELECT lower(o_orderpriority) AS priority_ci,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    WHERE o_orderpriority = upper(o_orderpriority)
       OR o_orderpriority = lower(o_orderpriority)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("sql", "collation", "spark4", "orders"),
)
def scalar_collation_lcase(spark, sf_dir):
    """STRING COLLATION (Spark 4 COLLATE UTF8_LCASE): group and
    compare case-insensitively WITHOUT rewriting every expression in
    lower() — the collation rides the type. Comparisons and GROUP BY
    on the collated column are case-insensitive by declaration; the
    oracle expresses the same semantics with explicit lower()/upper(),
    and the hash match pins the equivalence. Output keys are projected
    through lower() so both engines emit identical key strings."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_coll_v")
    return spark.sql(
        """
        WITH c AS (
          SELECT o_orderpriority COLLATE UTF8_LCASE AS p
          FROM orders_coll_v
        )
        SELECT cast(lower(p) as string) AS priority_ci,
               cast(count(*) as bigint) AS n
        FROM c
        WHERE p = upper(p)  -- case-insensitive: always true under LCASE
        GROUP BY lower(p) ORDER BY priority_ci
        """
    )


@query(
    "sql_pivot_unpivot_roundtrip",
    oracle="""
    WITH p AS (
      SELECT l_returnflag,
             sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o,
             sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty_o' AS status_col, qty_o AS sum_qty
    FROM p WHERE qty_o IS NOT NULL
    UNION ALL
    SELECT l_returnflag, 'qty_f', qty_f FROM p WHERE qty_f IS NOT NULL
    """,
    tags=("sql", "pivot", "unpivot"),
)
def sql_pivot_unpivot_roundtrip(spark, sf_dir):
    """NATIVE SQL ``PIVOT`` then DataFrame ``unpivot`` (melt) back to
    long form — the literal PIVOT/UNPIVOT API surface (r8 verdict
    missing #1; the engine's production pivots route through
    schema-stable conditional aggregation, e.g. the retention
    triangle, and this query's ORACLE is exactly that conditional-agg
    equivalent, so the native syntax is hash-verified against the
    scale-safe rewrite it sugars).

    Both directions verified in ONE plan: a wrong pivot cell, a
    dropped NULL-handling row, or a mislabeled unpivot column all
    shift the long-form hash. ``unpivot`` keeps NULL measure rows
    (unlike SQL UNPIVOT's default EXCLUDE NULLS), so they are filtered
    explicitly and the oracle mirrors the filter.

    Scale: PIVOT with an EXPLICIT value list is one hash aggregate
    with #values x #aggs columns — no discovery pass, fixed plan
    width; see agg_pivot_dynamic for why the discovery variant is
    deliberately capped."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    pivoted = spark.sql(
        """
        SELECT * FROM (
          SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem
        )
        PIVOT (sum(l_quantity)
               FOR l_linestatus IN ('O' AS qty_o, 'F' AS qty_f))
        """
    )
    return pivoted.unpivot(
        ["l_returnflag"], ["qty_o", "qty_f"], "status_col", "sum_qty"
    ).filter(F.col("sum_qty").isNotNull())


@query(
    "sql_identifier_clause",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders GROUP BY 1
    """,
    tags=("sql", "modern", "identifier"),
)
def sql_identifier_clause(spark, sf_dir):
    """IDENTIFIER() clause (SQL-injection-safe templating of table and
    COLUMN names, Spark 3.5+/4): the table name, the group-by column,
    and the measure column all arrive as STRING PARAMETERS bound
    through IDENTIFIER(:p) — the catalog-object analogue of value
    parameter markers. The query text itself contains no literal
    object names, so this pins the full resolve path.

    Scale: plan-identical to the literal query — IDENTIFIER is
    resolved at analysis time, zero runtime cost."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT IDENTIFIER(:gcol) AS o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(IDENTIFIER(:mcol) * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM IDENTIFIER(:tab) GROUP BY 1
        """,
        args={
            "tab": "orders",
            "gcol": "o_orderpriority",
            "mcol": "o_totalprice",
        },
    )


@query(
    "sql_named_parameters",
    oracle="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_high_balance
    FROM customer
    WHERE c_acctbal > 5000.0 AND c_mktsegment <> 'MACHINERY'
    GROUP BY 1
    """,
    tags=("sql", "modern", "parameters"),
)
def sql_named_parameters(spark, sf_dir):
    """NAMED PARAMETER MARKERS (:name binding in spark.sql, Spark
    3.4+/4): typed literal binding without string interpolation — the
    API surface that kills SQL injection and enables plan caching by
    parameter. Two markers of different types (double threshold,
    string exclusion) bound in one statement.

    Scale: markers fold to literals before optimization — predicate
    pushdown sees the constants exactly as if inlined."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_high_balance
        FROM customer
        WHERE c_acctbal > :minbal AND c_mktsegment <> :excl
        GROUP BY 1
        """,
        args={"minbal": 5000.0, "excl": "MACHINERY"},
    )


@query(
    "sql_session_variables",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty
    FROM lineitem WHERE l_quantity BETWEEN 10 AND 40 GROUP BY 1
    """,
    tags=("sql", "modern", "variables"),
)
def sql_session_variables(spark, sf_dir):
    """SQL SESSION VARIABLES (DECLARE / SET VAR, Spark 3.5+/4): the
    bounds of a quantity band are declared as typed session variables,
    SET from a scalar subquery-free expression, and referenced in the
    filter — the scripting surface warehouse users expect for
    multi-statement jobs.

    Scale: variables resolve to literals at analysis time (same
    pushdown story as parameter markers)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql("DECLARE OR REPLACE VARIABLE lo_q DOUBLE DEFAULT 0.0")
    spark.sql("DECLARE OR REPLACE VARIABLE hi_q DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR lo_q = 10.0")
    spark.sql("SET VAR hi_q = 10.0 + 30.0")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty
        FROM lineitem WHERE l_quantity BETWEEN lo_q AND hi_q GROUP BY 1
        """
    )


@query(
    "sql_execute_immediate",
    oracle="""
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    GROUP BY 1
    """,
    tags=("sql", "modern", "dynamic"),
)
def sql_execute_immediate(spark, sf_dir):
    """EXECUTE IMMEDIATE (dynamic SQL, Spark 4): the statement text is
    assembled at runtime and executed with a USING parameter — the
    warehouse-scripting escape hatch for metadata-driven jobs (e.g. a
    loop over table names from a config relation). Here the dynamic
    text runs the customer-nation rollup with the join key bound via
    a ? positional marker.

    Scale: the inner statement plans exactly like its static twin."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE stmt STRING DEFAULT ''"
    )
    spark.sql(
        """SET VAR stmt =
        'SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers
         FROM customer JOIN nation ON n_nationkey = c_nationkey
         WHERE c_acctbal > ? GROUP BY 1'
        """
    )
    return spark.sql("EXECUTE IMMEDIATE stmt USING -1000000.0")


@query(
    "sql_distribute_sort_by",
    oracle="""
    SELECT l_suppkey % 50 AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem GROUP BY 1
    """,
    tags=("sql", "surface", "partitioning"),
)
def sql_distribute_sort_by(spark, sf_dir):
    """DISTRIBUTE BY + SORT BY (Hive-heritage physical-layout SQL
    surface): rows are hash-distributed on the bucket key and sorted
    WITHIN each partition — the declarative form of
    repartition().sortWithinPartitions(), the layout primitive behind
    write-time clustering. The aggregation on top makes the result
    order-insensitive, so the oracle checks the VALUES while the
    surface exercises the clause path (the partition-local sort's
    effect is pinned separately by the engine's Z-order/compaction
    tests).

    Scale: one hash exchange + in-partition sort — exactly what a
    clustered write wants; no global sort."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT bucket, CAST(count(*) AS BIGINT) AS n,
               CAST(max(l_quantity) AS DOUBLE) AS max_qty
        FROM (
          SELECT l_suppkey % 50 AS bucket, l_quantity
          FROM lineitem
          DISTRIBUTE BY l_suppkey % 50 SORT BY l_quantity
        ) GROUP BY bucket
        """
    )
