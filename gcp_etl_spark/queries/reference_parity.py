"""Queries mirroring the reference's literal surface (SURVEY.md §2A).

The reference's one SQL query is ``SELECT * FROM df LIMIT 100``
(``k8s/submit/pyfiles.zip::my_query.py:1-9``) plus two ``count(*)``
checks (``etl-on-gcp-vinicius-campos.py:27``, DAG ``:144-155``). A bare
LIMIT is order-nondeterministic, so the declared query adds the stable
ORDER BY required by the oracle contract (SURVEY.md §7 traps).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t


@query(
    "ref_select_limit",
    oracle="""
    SELECT * FROM orders ORDER BY o_orderkey LIMIT 100
    """,
    tags=("reference", "projection", "limit"),
)
def ref_select_limit(spark, sf_dir):
    """R8-R10: star projection + LIMIT over a registered view."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    out = spark.sql("SELECT * FROM orders_v ORDER BY o_orderkey LIMIT 100")
    spark.catalog.dropTempView("orders_v")  # R11
    return out


@query(
    "ref_count_gate",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
    tags=("reference", "aggregate"),
)
def ref_count_gate(spark, sf_dir):
    """R4/R15: the count(*) data-quality gate as a query."""
    return t(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


@query(
    "ref_projection_filter",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           round(o_totalprice * 0.9, 4) AS discounted
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice BETWEEN 50000 AND 150000
    """,
    tags=("reference", "projection", "filter"),
)
def ref_projection_filter(spark, sf_dir):
    """R9 generalized: projection + withColumn + compound predicate
    (AND / BETWEEN / comparison)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderstatus") == "F")
            & F.col("o_totalprice").between(50000, 150000)
        )
        .select("o_orderkey", "o_totalprice")
        .withColumn("discounted", F.round(F.col("o_totalprice") * 0.9, 4))
    )


@query(
    "ref_pipeline_e2e",
    # the medallion output is fully deterministic (synthesized landing
    # JSON; the default curated SQL is ORDER BY 1 = coordinates, which
    # is unique per row), so the oracle regenerates the same 100 rows
    # closed-form: landing synthesis + the curated ORDER BY/LIMIT, with
    # the JSON-inferred column types (elevation_ft -> BIGINT).
    oracle="""
    WITH src AS (
      SELECT CAST((i % 359) - 179 AS VARCHAR) || '.5, '
               || CAST((i % 179) - 89 AS VARCHAR) || '.25' AS coordinates,
             CASE WHEN i % 7 = 0 THEN NULL
                  ELSE (i * 13) % 9000 END AS elevation_ft,
             'AP' || lpad(CAST(i AS VARCHAR), 5, '0') AS ident,
             'US' AS iso_country,
             ['small_airport', 'heliport', 'closed'][CAST(i % 3 AS INT) + 1]
               AS type
      FROM range(2000) t(i)
    )
    SELECT * FROM src ORDER BY coordinates LIMIT 100
    """,
    tags=("reference", "pipeline"),
)
def ref_pipeline_e2e(spark, sf_dir):
    """The reference's whole job as one benchmarked unit: landing JSON
    (deterministic airports-shaped synthesis) -> parquet processing ->
    SQL limit -> curated -> serving + count gate (R3-R15). The serving
    table is value-checked against a closed-form regeneration of the
    same 100 rows (see oracle)."""
    import json
    from gcp_etl_spark.scratch import scratch_dir

    from gcp_etl_spark.pipeline import run_medallion

    d = scratch_dir("ref_e2e", fresh=True)
    with open(f"{d}/airports.json", "w") as f:
        for i in range(2000):
            f.write(
                json.dumps(
                    {
                        "ident": f"AP{i:05d}",
                        "type": ["small_airport", "heliport", "closed"][i % 3],
                        "elevation_ft": None if i % 7 == 0 else (i * 13) % 9000,
                        "iso_country": "US",
                        "coordinates": f"{(i % 359) - 179}.5, {(i % 179) - 89}.25",
                    }
                )
                + "\n"
            )
    run_medallion(spark, f"{d}/airports.json", f"{d}/work")
    return spark.table("serving_table")


@query(
    "scd2_merge_history",
    oracle="""
    WITH snap AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer
    ), batch AS (
      SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT c_custkey, c_name, c_acctbal,
           '2024-01-01 00:00:00' AS valid_from,
           CASE WHEN c_custkey % 10 = 0
                THEN '2024-02-01 00:00:00'
                ELSE '9999-12-31 23:59:59' END AS valid_to,
           c_custkey % 10 <> 0 AS is_current
    FROM snap
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal,
           '2024-02-01 00:00:00',
           '9999-12-31 23:59:59', true
    FROM batch
    """,
    tags=("scd2", "merge", "cdc"),
)
def scd2_merge_history(spark, sf_dir):
    """SCD2 MERGE emulation (no Delta in stock Spark): snapshot ->
    change batch (every 10th customer gets a new balance) -> close old
    versions + open new ones. Output is the full version history.

    valid_from/valid_to are emitted as strings: the operator's
    9999-12-31 open-row sentinel overflows pandas' ns-resolution
    timestamps, which the driver canonicalizer uses."""
    from gcp_etl_spark.operators.scd import scd2_init, scd2_merge

    snap = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    dim = scd2_init(snap, "c_custkey", F.lit("2024-01-01 00:00:00"))
    batch = (
        snap.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
    )
    merged = scd2_merge(dim, batch, "c_custkey", F.lit("2024-02-01 00:00:00"))
    return merged.withColumn(
        "valid_from", F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss")
    ).withColumn("valid_to", F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"))


@query(
    "ref_sql_star_hinted",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("reference", "sql", "join", "hint"),
)
def ref_sql_star_hinted(spark, sf_dir):
    """The reference's R8 SQL entry path exercised at full depth: a
    star join + aggregate + total ORDER BY executed as ONE SQL string
    over registered temp views (not the DataFrame API), including
    optimizer BROADCAST hints in SQL-comment syntax — proving hint
    parity between the two entry paths. Views are dropped after (R11).
    The oracle is the identical hint-free SQL (hints change the plan,
    never the result)."""
    names = ["lineitem", "orders", "customer", "nation"]
    for nm in names:
        t(spark, sf_dir, nm).createOrReplaceTempView(f"__sql_{nm}")
    try:
        return spark.sql("""
            SELECT /*+ BROADCAST(c), BROADCAST(n) */ n_name,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                   count(*) AS n_lines
            FROM __sql_lineitem l
            JOIN __sql_orders o   ON l.l_orderkey = o.o_orderkey
            JOIN __sql_customer c ON o.o_custkey = c.c_custkey
            JOIN __sql_nation n   ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
        """)
    finally:
        for nm in names:
            spark.catalog.dropTempView(f"__sql_{nm}")
