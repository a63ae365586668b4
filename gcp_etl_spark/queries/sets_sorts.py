"""Set operations, sorts, top-k (SURVEY.md §2B "Set ops" /
"Sorts / limits / top-k").

Scale notes: global top-k compiles to TakeOrderedAndProject (partial
per-partition top-k, k-row merge — no full sort); full sorts use range
partitioning (sampled boundaries) so output stays distributed;
distinct/intersect/except are hash aggregations, one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.operators.topk import top_k, top_k_per_group
from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t


def _big_spenders(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("custkey"))
    )


def _rich_customers(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )


_SET_SQL = {
    "a": "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000",
    "b": "SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000",
}


@query(
    "set_union_all",
    oracle=f"{_SET_SQL['a']} UNION ALL {_SET_SQL['b']}",
    tags=("set",),
)
def set_union_all(spark, sf_dir):
    """UNION ALL (bag union, no dedup shuffle)."""
    return _big_spenders(spark, sf_dir).unionByName(_rich_customers(spark, sf_dir))


@query(
    "set_union_distinct",
    oracle=f"{_SET_SQL['a']} UNION {_SET_SQL['b']}",
    tags=("set",),
)
def set_union_distinct(spark, sf_dir):
    """UNION (distinct) = union + hash dedup."""
    return (
        _big_spenders(spark, sf_dir)
        .unionByName(_rich_customers(spark, sf_dir))
        .distinct()
    )


@query(
    "set_intersect",
    oracle=f"{_SET_SQL['a']} INTERSECT {_SET_SQL['b']}",
    tags=("set",),
)
def set_intersect(spark, sf_dir):
    """INTERSECT (distinct semantics)."""
    return _big_spenders(spark, sf_dir).intersect(_rich_customers(spark, sf_dir))


@query(
    "set_except",
    oracle=f"{_SET_SQL['b']} EXCEPT {_SET_SQL['a']}",
    tags=("set",),
)
def set_except(spark, sf_dir):
    """EXCEPT (distinct): rich customers who never placed a big order."""
    return _rich_customers(spark, sf_dir).subtract(_big_spenders(spark, sf_dir))


@query(
    "set_except_all",
    oracle=f"{_SET_SQL['a']} EXCEPT ALL {_SET_SQL['b']}",
    tags=("set",),
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL (bag semantics — multiplicities subtract)."""
    return _big_spenders(spark, sf_dir).exceptAll(_rich_customers(spark, sf_dir))


@query(
    "sort_nulls_multikey",
    oracle="""
    SELECT nullif(l_returnflag, 'N') AS flag_or_null,
           l_extendedprice, l_orderkey, l_linenumber
    FROM lineitem
    ORDER BY flag_or_null ASC NULLS FIRST, l_extendedprice DESC,
             l_orderkey, l_linenumber
    LIMIT 50
    """,
    tags=("sort",),
)
def sort_nulls_multikey(spark, sf_dir):
    """Multi-key sort with explicit null placement (Spark default is
    nulls-first ASC, DuckDB nulls-last — always say it explicitly)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_or_null"),
            "l_extendedprice",
            "l_orderkey",
            "l_linenumber",
        )
        .orderBy(
            F.col("flag_or_null").asc_nulls_first(),
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(50)
    )


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("sort", "topk"),
)
def topk_global(spark, sf_dir):
    """Global top-k → TakeOrderedAndProject (no full sort)."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return top_k(o, [F.col("o_totalprice").desc(), F.col("o_orderkey")], 20)


@query(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("sort", "topk", "window"),
)
def topk_per_group(spark, sf_dir):
    """Top-3 orders per priority class via ranking window."""
    o = t(spark, sf_dir, "orders")
    return top_k_per_group(
        o,
        group=["o_orderpriority"],
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    ).select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")


@query(
    "distinct_projection",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("set", "distinct"),
)
def distinct_projection(spark, sf_dir):
    """DISTINCT over a projection (hash aggregate, one shuffle)."""
    return t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


_GROUP_BY_ALL = """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
"""


@query("sql_group_by_all", oracle=_GROUP_BY_ALL, tags=("sql", "aggregate", "sort"))
def sql_group_by_all(spark, sf_dir):
    """Modern SQL sugar both engines share: GROUP BY ALL (group on
    every non-aggregate select item) + ORDER BY ALL (total order over
    the output columns) — same plan as the explicit forms."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUP_BY_ALL)


@query(
    "global_row_number_twopass",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey,
             row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    )
    SELECT rn, o_orderkey FROM ranked WHERE rn % 100 = 0
    """,
    tags=("sort", "window", "scale-pattern", "orders"),
)
def global_row_number_twopass(spark, sf_dir):
    """Globally contiguous row numbers over a total order WITHOUT a
    single-partition window: range-partition on the sort key, number
    rows inside each partition in parallel, then add per-partition
    offsets computed from a #partitions-sized count relation (the
    zipWithIndex algebra, expressed in DataFrames).

    Correctness does not depend on where the sampled range boundaries
    fall: the sort key (o_orderdate, o_orderkey) is total and unique,
    so in-partition row_number + prefix-offset equals the global rank
    for ANY contiguous range split. Emits every 100th row to keep the
    gate result bounded.

    Scale: one range-exchange (sampled, balanced), per-partition sort,
    and a bounded (#partitions rows) offset relation broadcast back —
    this is how you assign stable ids to 100 TB; the oracle's global
    ``row_number()`` is the one-task plan it replaces.
    """
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    parts = o.repartitionByRange(32, "o_orderdate", "o_orderkey").withColumn(
        "pid", F.spark_partition_id()
    )
    in_part = Window.partitionBy("pid").orderBy("o_orderdate", "o_orderkey")
    local = parts.withColumn("local_rn", F.row_number().over(in_part))
    counts = local.groupBy("pid").agg(F.count("*").alias("n"))
    prior = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = counts.select(
        "pid", F.coalesce(F.sum("n").over(prior), F.lit(0)).alias("offset")
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .select(
            (F.col("local_rn") + F.col("offset")).alias("rn"), "o_orderkey"
        )
        .filter(F.col("rn") % 100 == 0)
    )
