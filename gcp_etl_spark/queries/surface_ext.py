"""Fourth coverage tranche: schema-aligned UNION BY NAME, discrete
percentiles, PII masking, and a deterministic MODE aggregate
(SURVEY.md §2B "Set ops" / "Aggregations" / "Scalar functions").

Cross-engine notes:
- ``unionByName(allowMissingColumns=True)`` = DuckDB ``UNION ALL BY
  NAME`` (both fill absent columns with NULL); output re-selected in a
  fixed column order on both sides.
- ``percentile_disc`` returns an actual data value (first value whose
  cume_dist >= p) — exact on both engines, no float-rounding policy
  needed, unlike the interpolated ``percentile``/``quantile_cont`` pair
  in ``agg_median``.
- Spark ``mask()`` defaults (upper→'X', lower→'x', digit→'n') are
  reproduced in DuckDB with three regexp_replace passes (ASCII data).
- MODE: both engines' native ``mode()`` picks an ARBITRARY value on
  frequency ties, so the declared query derives the mode with an
  explicit tiebreak (count DESC, value ASC) via window row_number —
  deterministic and hash-stable on both sides; scale shape is one
  hash-agg shuffle + a tiny per-group window.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t


@query(
    "set_union_by_name",
    oracle="""
    SELECT id, name, bal, nk, src
    FROM (
      SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal,
             'cust' AS src
      FROM customer
      UNION ALL BY NAME
      SELECT s_suppkey AS id, s_name AS name,
             CAST(s_nationkey AS INT) AS nk, 'supp' AS src
      FROM supplier
    )
    """,
    tags=("set", "union", "schema"),
)
def set_union_by_name(spark, sf_dir):
    """Schema-aligned union: columns matched by NAME, absent columns
    null-filled (`unionByName(allowMissingColumns=True)`) — the
    heterogeneous-source append a landing zone needs, vs positional
    UNION ALL which would silently misalign."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.lit("cust").alias("src"),
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").cast("int").alias("nk"),
        F.lit("supp").alias("src"),
    )
    return c.unionByName(s, allowMissingColumns=True).select(
        "id", "name", "bal", "nk", "src"
    )


@query(
    "agg_percentile_disc",
    oracle="""
    SELECT o_orderpriority,
           percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)
             AS p25_price,
           percentile_disc(0.5)  WITHIN GROUP (ORDER BY o_totalprice)
             AS median_disc,
           percentile_disc(0.9)  WITHIN GROUP (ORDER BY o_totalprice)
             AS p90_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("aggregate", "percentile"),
)
def agg_percentile_disc(spark, sf_dir):
    """Discrete percentiles (first value with cume_dist >= p): returns
    REAL data values, so no interpolation and no cross-engine float
    policy — the exact counterpart to agg_median's percentile_cont."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)
                 AS p25_price,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY o_totalprice)
                 AS median_disc,
               percentile_disc(0.9)  WITHIN GROUP (ORDER BY o_totalprice)
                 AS p90_price
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "scalar_mask_redact",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', 'n', 'g')                         AS name_masked,
           regexp_replace(c_name, '[0-9]', '*', 'g')      AS digits_starred,
           CAST(bit_length(c_name) AS INT)                AS name_bits,
           CAST(strlen(c_name) AS INT)                    AS name_bytes
    FROM customer
    """,
    tags=("scalar", "string", "masking"),
)
def scalar_mask_redact(spark, sf_dir):
    """PII redaction surface: Spark's mask() builtin (upper→X, lower→x,
    digit→n), a custom digit mask, and bit/octet lengths. JVM codegen
    throughout — the column-level anonymization pass a training-data
    pipeline runs before export."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("name_masked"),
        F.regexp_replace("c_name", "[0-9]", "*").alias("digits_starred"),
        F.bit_length("c_name").alias("name_bits"),
        F.octet_length("c_name").alias("name_bytes"),
    )


@query(
    "agg_mode",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           cnt AS mode_count
    FROM (
      SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY count(*) DESC, o_orderpriority
             ) AS rn
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    )
    WHERE rn = 1
    """,
    tags=("aggregate", "mode"),
)
def agg_mode(spark, sf_dir):
    """Deterministic MODE: most frequent order priority per status.
    Native mode() exists on both engines but picks an arbitrary value
    on frequency ties, so the declared form derives it with an explicit
    (count DESC, value ASC) tiebreak. Scale shape: one hash-agg shuffle
    to (status, priority) counts, then a window over the tiny grouped
    relation — never a shuffle of raw rows by status alone."""
    o = t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("mode_count"),
        )
    )


@query(
    "scalar_regexp_count_instr",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[aeiou]')) AS INT) AS n_vowels,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT)  AS n_numbers,
           CAST(CASE WHEN regexp_matches(text, '[0-9]')
                     THEN strpos(text, regexp_extract(text, '[0-9]'))
                     ELSE 0 END AS INT)                          AS first_digit_pos
    FROM documents
    """,
    tags=("scalar", "string", "regexp"),
)
def scalar_regexp_count_instr(spark, sf_dir):
    """Spark 3.5 regexp_count / regexp_instr occurrence analytics over
    the documents table (pure codegen map stage; the shape a corpus
    quality filter uses to count pattern hits without exploding
    matches). DuckDB has neither builtin — the oracle derives counts
    via len(regexp_extract_all) and first-hit position via strpos of
    the first extracted match."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("[aeiou]")).alias("n_vowels"),
        F.regexp_count("text", F.lit("[0-9]+")).alias("n_numbers"),
        F.regexp_instr("text", F.lit("[0-9]")).alias("first_digit_pos"),
    )


@query(
    "agg_filter_clause",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_finished,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
             AS n_open,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  FILTER (WHERE o_totalprice > 100000) AS DOUBLE)
             AS big_spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 5
    """,
    tags=("aggregate", "filter", "sql"),
)
def agg_filter_clause(spark, sf_dir):
    """ANSI ``FILTER (WHERE ...)`` conditional aggregation — one scan,
    several differently-filtered aggregates (the fused-scan pattern
    dq_expectations uses, here through the standard SQL syntax, which
    Spark supports in spark.sql). Exact-decimal policy on the
    conditional sum."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("__fc_orders")
    try:
        return spark.sql("""
            SELECT o_custkey,
                   count(*) FILTER (WHERE o_orderstatus = 'F')
                     AS n_finished,
                   count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                          FILTER (WHERE o_totalprice > 100000) AS DOUBLE)
                     AS big_spend
            FROM __fc_orders
            GROUP BY o_custkey
            HAVING count(*) >= 5
        """)
    finally:
        spark.catalog.dropTempView("__fc_orders")


@query(
    "scalar_regexp_backref",
    oracle="""
    SELECT c_custkey, c_name,
           regexp_replace(c_name, '([A-Za-z]+)#(\\d+)', '\\2-\\1')
             AS swapped,
           regexp_replace(c_name, '(\\d)\\d*(\\d)', '\\1**\\2')
             AS squeezed_digits
    FROM customer WHERE c_custkey <= 1500
    """,
    tags=("scalar", "regexp"),
)
def scalar_regexp_backref(spark, sf_dir):
    """Regexp replacement with capture-group BACKREFERENCES — Spark's
    Java syntax uses $1, DuckDB's RE2 uses \\1; same semantics,
    deliberately different dialect strings on the two sides."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1500)
    return c.select(
        "c_custkey",
        "c_name",
        F.regexp_replace(
            "c_name", r"([A-Za-z]+)#(\d+)", r"$2-$1"
        ).alias("swapped"),
        F.regexp_replace(
            "c_name", r"(\d)\d*(\d)", r"$1**$2"
        ).alias("squeezed_digits"),
    )


@query(
    "null_semantics_battery",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_totalprice END AS p,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE o_orderstatus END AS s
      FROM orders
    )
    SELECT
      CAST(count(*) AS BIGINT)                         AS n_rows,
      CAST(count(p) AS BIGINT)                         AS n_p_nonnull,
      CAST(count(DISTINCT s) AS BIGINT)                AS n_s_distinct,
      CAST(sum(CASE WHEN p = p THEN 1 ELSE 0 END)
           AS BIGINT)                                  AS n_self_eq,
      CAST(sum(CASE WHEN p IS NOT DISTINCT FROM p
                    THEN 1 ELSE 0 END) AS BIGINT)      AS n_self_nullsafe,
      CAST(sum(CASE WHEN s IN ('F', 'O') THEN 1
                    ELSE 0 END) AS BIGINT)             AS n_in_list,
      CAST(sum(CASE WHEN s NOT IN ('F', 'O') THEN 1
                    ELSE 0 END) AS BIGINT)             AS n_not_in_list,
      CAST(sum(CASE WHEN coalesce(s, 'X') = 'X' THEN 1
                    ELSE 0 END) AS BIGINT)             AS n_coalesced,
      CAST(min(p) AS DOUBLE)                           AS min_skips_null,
      CAST(count(*) FILTER (WHERE p IS NULL AND s IS NULL)
           AS BIGINT)                                  AS n_both_null
    FROM src
    """,
    tags=("scalar", "null", "conformance"),
)
def null_semantics_battery(spark, sf_dir):
    """SQL NULL-semantics conformance in one scan: NULL = NULL is
    UNKNOWN (self-equality counts only non-null rows) while IS NOT
    DISTINCT FROM is true; NOT IN over a list never matches a NULL
    operand; count(col) vs count(*); aggregates skip NULLs. These are
    the corners engines disagree on — asserting them differentially
    pins the engine to ANSI behavior."""
    o = t(spark, sf_dir, "orders")
    src = o.select(
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("p"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("s"),
    )
    b = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return src.agg(
        F.count("*").alias("n_rows"),
        F.count("p").alias("n_p_nonnull"),
        F.countDistinct("s").alias("n_s_distinct"),
        b(F.col("p") == F.col("p")).alias("n_self_eq"),
        b(F.col("p").eqNullSafe(F.col("p"))).alias("n_self_nullsafe"),
        b(F.col("s").isin("F", "O")).alias("n_in_list"),
        b(~F.col("s").isin("F", "O")).alias("n_not_in_list"),
        b(F.coalesce(F.col("s"), F.lit("X")) == "X").alias("n_coalesced"),
        F.min("p").alias("min_skips_null"),
        F.sum(
            F.when(F.col("p").isNull() & F.col("s").isNull(), 1).otherwise(0)
        ).alias("n_both_null"),
    )
