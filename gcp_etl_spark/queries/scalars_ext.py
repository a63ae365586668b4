"""Extended scalar/aggregate coverage: median, cryptographic hashes,
edit distance, date arithmetic, bitwise ops, null-safe join
(SURVEY.md §2B "Scalar functions" / "Aggregations" / "Joins").

Cross-engine notes follow the `_exact.py` policy: exact-path values
are emitted raw; only percentile interpolation (a libm-free but
formula-dependent path) is rounded to 4dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_etl_spark.operators.quantiles import exact_quantiles
from gcp_etl_spark.queries.registry import query
from gcp_etl_spark.tables import t


@query(
    "agg_median",
    oracle="""
    SELECT l_returnflag,
           round(median(l_quantity), 4) AS med_qty,
           round(median(l_extendedprice), 4) AS med_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate", "percentile"),
)
def agg_median(spark, sf_dir):
    """Exact grouped median (Spark ``median`` = interpolated
    percentile(0.5) = DuckDB ``median``/``quantile_cont``). The two
    engines' interpolation formulas can differ in the last ulp, so the
    output is rounded to 4dp on both sides (established percentile
    policy, cf. agg_stats).

    Scale: the ``median`` AGGREGATE is kept only for l_quantity, whose
    domain is BOUNDED (integers 1..50 — the final-merge value map has
    at most 50 entries per group, safe at any scale); the
    unbounded-distinct l_extendedprice median routes through
    ``operators.exact_quantiles`` (two-pass range-partitioned rank)."""
    li = t(spark, sf_dir, "lineitem")
    med_price = exact_quantiles(
        li, "l_extendedprice", {"__mp": 0.5}, group_cols=["l_returnflag"]
    )
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.median("l_quantity"), 4).alias("med_qty"))
        .join(F.broadcast(med_price), "l_returnflag")
        .select(
            "l_returnflag",
            "med_qty",
            F.round(F.col("__mp"), 4).alias("med_price"),
        )
    )


@query(
    "scalar_hashing",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           to_base64(encode(c_name)) AS name_b64
    FROM customer
    """,
    tags=("scalar", "hash"),
)
def scalar_hashing(spark, sf_dir):
    """Deterministic content hashing — the fingerprint primitives a
    dedup/training-data pipeline keys shards and caches on. md5/sha2
    emit lowercase hex on both engines; base64 of the UTF-8 bytes."""
    c = t(spark, sf_dir, "customer")
    name_bin = F.col("c_name").cast("binary")
    return c.select(
        "c_custkey",
        F.md5(name_bin).alias("name_md5"),
        F.sha2(name_bin, 256).alias("name_sha256"),
        F.base64(name_bin).alias("name_b64"),
    )


@query(
    "scalar_levenshtein",
    oracle="""
    SELECT p_partkey, p_name,
           CAST(levenshtein(p_name, 'red widget') AS INT) AS edit_dist
    FROM part
    WHERE levenshtein(p_name, 'red widget') <= 6
    """,
    tags=("scalar", "string", "similarity"),
)
def scalar_levenshtein(spark, sf_dir):
    """Edit-distance similarity filter (fuzzy string match — the
    cheap, exact cousin of the MinHash near-dup path). Spark returns
    int, DuckDB BIGINT → oracle casts."""
    p = t(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_name"), F.lit("red widget"))
    return p.filter(dist <= 6).select(
        "p_partkey", "p_name", dist.alias("edit_dist")
    )


@query(
    "scalar_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + to_months(3) AS DATE) AS plus3m,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           make_date(CAST(year(o_orderdate) AS INT),
                     CAST(month(o_orderdate) AS INT), 1) AS month_start
    FROM orders
    """,
    tags=("scalar", "datetime"),
)
def scalar_date_arith(spark, sf_dir):
    """Calendar arithmetic: month offset (both engines clamp to
    month-end), ISO week number, and first-of-month reconstruction via
    make_date."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).alias("plus3m"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.make_date(
            F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)
        ).alias("month_start"),
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS key_mask,
           xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS key_xor,
           CAST(l_linenumber << 2 AS INT) AS line_shl
    FROM lineitem
    WHERE l_orderkey & 255 < 8
    """,
    tags=("scalar", "bitwise"),
)
def scalar_bitwise(spark, sf_dir):
    """Bitwise AND/XOR/shift — the building blocks of hash
    partitioning, bloom probes, and bit-packed flags."""
    li = t(spark, sf_dir, "lineitem")
    mask = F.col("l_orderkey").bitwiseAND(F.lit(255))
    return li.filter(mask < 8).select(
        "l_orderkey",
        "l_linenumber",
        mask.alias("key_mask"),
        F.col("l_orderkey")
        .bitwiseXOR(F.col("l_linenumber").cast("long"))
        .alias("key_xor"),
        F.shiftleft(F.col("l_linenumber"), 2).alias("line_shl"),
    )


@query(
    "join_null_safe",
    oracle="""
    SELECT n_name, count(*) AS n_cust
    FROM (SELECT nullif(c_nationkey, 3) AS nk FROM customer) c
    JOIN (SELECT nullif(n_nationkey, 3) AS nk2, n_name FROM nation) n
      ON c.nk IS NOT DISTINCT FROM n.nk2
    GROUP BY n_name
    """,
    tags=("join", "nullsafe"),
)
def join_null_safe(spark, sf_dir):
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM):
    NULL keys pair with NULL keys instead of dropping out. Still a
    hash-joinable key for Spark (EqualNullSafe is a supported
    broadcast-hash key), so the 100 TB plan is identical to a plain
    equi join."""
    c = t(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey"), F.lit(3)).alias("nk")
    )
    n = t(spark, sf_dir, "nation").select(
        F.nullif(F.col("n_nationkey"), F.lit(3)).alias("nk2"), "n_name"
    )
    return (
        c.join(F.broadcast(n), F.col("nk").eqNullSafe(F.col("nk2")))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"))
    )


@query(
    "scalar_greatest_least",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           greatest(l_quantity, l_discount * 100) AS hi,
           least(l_tax, l_discount) AS lo
    FROM lineitem WHERE l_linenumber = 1
    """,
    tags=("scalar", "conditional"),
)
def scalar_greatest_least(spark, sf_dir):
    """greatest/least n-ary comparisons (both engines skip NULL
    operands; operands here are non-null doubles, raw IEEE compare)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("hi"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("lo"),
    )


@query(
    "scalar_sequence_fold",
    oracle="""
    SELECT o_orderkey,
           CAST(len(range(1, o_orderkey % 7 + 2)) AS INT) AS seq_len,
           CAST(list_sum(range(1, o_orderkey % 7 + 2)) AS BIGINT) AS seq_sum
    FROM orders
    """,
    tags=("scalar", "array", "higher-order"),
)
def scalar_sequence_fold(spark, sf_dir):
    """Array generation (sequence) + fold (aggregate lambda) — the
    generate-then-reduce shape behind windowed feature expansion.
    Spark sequence(1,n) is inclusive; the DuckDB range() mirror is
    exclusive, hence n+2 on the oracle's stop bound."""
    o = t(spark, sf_dir, "orders")
    n = F.pmod(F.col("o_orderkey"), F.lit(7)) + 1
    seq = F.sequence(F.lit(1).cast("long"), n)
    return o.select(
        "o_orderkey",
        F.size(seq).alias("seq_len"),
        F.aggregate(
            seq, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("seq_sum"),
    )


@query(
    "window_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'click' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_click_value
    FROM events
    """,
    tags=("window", "nulls"),
)
def window_ignore_nulls(spark, sf_dir):
    """last_value(... IGNORE NULLS) — carry-forward of the most recent
    qualifying observation (gap-fill / LOCF shape). Rows before a
    user's first click are NULL on both engines."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.when(F.col("event_type") == "click", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.last(x, ignorenulls=True).over(w).alias("last_click_value"),
    )


@query(
    "scalar_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           array_to_string(regexp_extract_all(text, '[a-z]{5,}'), ' ')
             AS long_words,
           CAST(len(regexp_extract_all(text, '[a-z]{5,}')) AS INT)
             AS n_long
    FROM documents WHERE doc_id % 10 = 0
    """,
    tags=("scalar", "string", "regex"),
)
def scalar_regexp_extract_all(spark, sf_dir):
    """regexp_extract_all → array<string> (all matches, positional
    order — deterministic on both engines; the pattern avoids
    Java-vs-RE2 dialect divergence). The array is serialized to a
    space-joined string: registry contract forbids bare array output
    columns (driver pandas canonicalizer)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    words = F.regexp_extract_all(F.col("text"), F.lit("[a-z]{5,}"), 0)
    return d.select(
        "doc_id",
        F.array_join(words, " ").alias("long_words"),
        F.size(words).alias("n_long"),
    )


@query(
    "scalar_split_part",
    oracle="""
    SELECT c_custkey,
           split_part(c_name, '#', 1) AS name_prefix,
           split_part(c_name, '#', 2) AS name_suffix
    FROM customer
    """,
    tags=("scalar", "string"),
)
def scalar_split_part(spark, sf_dir):
    """split_part (1-indexed field extraction on both engines) — the
    delimited-identifier parse that generalizes the reference's
    'coordinates' lon/lat-string split
    (k8s/submit/etl-on-gcp-vinicius-campos.py:22-25 inferred schema;
    cf. scalar_struct_coords)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_prefix"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_suffix"),
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    """,
    tags=("setop",),
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL (bag semantics: min of per-side multiplicities —
    completes the set-op family next to intersect/except/except_all)."""
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("k")
    )
    b = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_suppkey").alias("k")
    )
    return a.intersectAll(b)


@query(
    "scalar_try_ansi",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / nullif(o_custkey % 5, 0) AS safe_div,
           TRY_CAST(string_split(o_orderpriority, '-')[1] AS INT)
             AS prio_num,
           TRY_CAST(o_orderstatus AS INT) AS bad_cast
    FROM orders WHERE o_orderkey % 50 = 0
    """,
    tags=("scalar", "ansi", "try"),
)
def scalar_try_ansi(spark, sf_dir):
    """ANSI-mode-safe try_* family (Spark 4 runs ANSI on: plain ops
    THROW on div-by-zero/bad casts — try_divide/try_cast return NULL
    instead, the semantics batch pipelines need to survive dirty
    data). DuckDB mirrors via nullif + TRY_CAST."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 5).alias(
            "safe_div"
        ),
        F.expr(
            "try_cast(split_part(o_orderpriority, '-', 1) AS INT)"
        ).alias("prio_num"),
        F.expr("try_cast(o_orderstatus AS INT)").alias("bad_cast"),
    )


@query(
    "scalar_try_overflow",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             9223372036854775807 - (o_orderkey % 100) AS near_max,
             o_orderkey % 7 AS small
      FROM orders WHERE o_orderkey % 200 = 0
    )
    SELECT o_orderkey,
           CASE WHEN small <= o_orderkey % 100
                THEN near_max + small ELSE NULL END AS add_or_null,
           CASE WHEN small = 0 THEN CAST(0 AS BIGINT)
                WHEN near_max <= 9223372036854775807 / small
                THEN near_max * small
                ELSE NULL END AS mul_or_null,
           CAST(near_max AS DOUBLE) + small AS widened_add
    FROM src
    """,
    tags=("scalar", "ansi", "try", "overflow"),
)
def scalar_try_overflow(spark, sf_dir):
    """BIGINT overflow safety under ANSI mode: plain `+`/`*` THROW on
    overflow; try_add / try_multiply return NULL, and widening to
    double is the lossy-but-total alternative. Inputs are constructed
    at the int64 edge so half the additions overflow; the oracle
    reproduces try-semantics with explicit bound checks (DuckDB has
    no try_add — its native + would raise — so the CASE guards are
    the mirror)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    src = o.select(
        "o_orderkey",
        (F.lit(9223372036854775807) - (F.col("o_orderkey") % 100)).alias(
            "near_max"
        ),
        (F.col("o_orderkey") % 7).alias("small"),
    )
    return src.select(
        "o_orderkey",
        F.try_add(F.col("near_max"), F.col("small")).alias("add_or_null"),
        F.try_multiply(F.col("near_max"), F.col("small")).alias(
            "mul_or_null"
        ),
        (F.col("near_max").cast("double") + F.col("small")).alias(
            "widened_add"
        ),
    )

@query(
    "scalar_bitops",
    oracle="""
    SELECT o_orderkey,
           CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS k_xor,
           CAST(o_orderkey & o_custkey AS BIGINT) AS k_and,
           CAST(o_orderkey | o_custkey AS BIGINT) AS k_or,
           CAST(o_orderkey << 3 AS BIGINT) AS k_shl,
           CAST(o_orderkey >> 2 AS BIGINT) AS k_shr,
           CAST(bit_count(o_orderkey) AS INT) AS k_pop
    FROM orders WHERE o_orderkey % 97 = 0
    """,
    tags=("scalar", "bitwise", "orders"),
)
def scalar_bitops(spark, sf_dir):
    """Row-level bitwise battery (xor/and/or/shifts/popcount) — the
    scalar complement of the bitwise AGGREGATES (``agg_bitwise``);
    the building blocks of hash mixing, bloom probes, and bitmap
    addressing. Pure codegen expressions, no shuffle.
    """
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return o.select(
        "o_orderkey",
        k.bitwiseXOR(c).cast("long").alias("k_xor"),
        k.bitwiseAND(c).cast("long").alias("k_and"),
        k.bitwiseOR(c).cast("long").alias("k_or"),
        F.shiftleft(k, 3).cast("long").alias("k_shl"),
        F.shiftright(k, 2).cast("long").alias("k_shr"),
        F.bit_count(k).cast("int").alias("k_pop"),
    )
