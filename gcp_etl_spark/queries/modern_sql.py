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
    import tempfile

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_cat_v")
    loc = tempfile.mkdtemp(prefix="cat_tbl_")
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
