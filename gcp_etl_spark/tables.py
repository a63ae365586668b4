"""Testdata table access.

The driver generates deterministic TPC-H-ish parquet tables
(``/root/repo/TESTDATA.md``). Every declared query loads its inputs
through here so that scans stay plain ``spark.read.parquet`` — Catalyst
then gets predicate pushdown / column pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor: these
# are bounded by the world (regions, nations) or grow ~linearly but stay
# tiny relative to the fact tables, so joins against them should never
# shuffle the fact side.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright. Executor-side fix (no driver
    materialization): read nanos as long (legacy conf) and rebuild the
    microsecond timestamp with integer division — exactly DuckDB's
    ns→us truncation, so the oracle sees identical values.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # cast to NTZ: every other parquet timestamp reads as
            # TIMESTAMP_NTZ in Spark 4, and DuckDB timestamps are
            # naive — keeping one timestamp flavor end-to-end means
            # arrow-level schema compares also agree
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: t(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (reference pattern:
    ``createOrReplaceTempView`` at ``k8s/submit/etl-on-gcp-vinicius-campos.py:42``)."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
