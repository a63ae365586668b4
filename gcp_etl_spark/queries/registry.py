"""Declared-query registry — the DuckDB-oracle correctness surface.

Every operator claimed in SURVEY.md §2 registers here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible)
the equivalent ANSI SQL that DuckDB runs on the same parquet tables.

Contract notes (driver compares row-count + schema + order-insensitive
value hash, see ``/root/repo/__spark_entry__.py``):
- every computed column aliased identically on both sides;
- doubles produced by aggregation are rounded to a fixed number of
  decimals on BOTH sides, so floating-point summation order (which
  differs between engines and between partitionings) cannot flip the
  hash;
- any LIMIT is preceded by a total ORDER BY (unique tiebreaker);
- no bare arrays in output whose element ORDER differs between engines
  (DuckDB's list_intersect is unordered) — emit sizes/scalars instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a declared query. ``oracle=None`` → rows-only check."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


# Newest-round modules first: the round driver samples the HEAD of the
# queries() dict for its ~50-query correctness snapshot, and through
# round 4 it never reached a single round-4 query (r4 verdict ask #4).
# The stable sort in load_all keeps registration order within each
# priority tier, so the established early-registry names keep their
# relative order after the fresh modules.
_MODULE_PRIORITY = [
    "gcp_etl_spark.queries.r12_ops",
    "gcp_etl_spark.queries.r11_ops",
    "gcp_etl_spark.queries.r10_ops",
    "gcp_etl_spark.queries.r9b_ops",
    "gcp_etl_spark.queries.r9_ops",
    "gcp_etl_spark.queries.r8_ops",
    "gcp_etl_spark.queries.r7_ops",
    "gcp_etl_spark.queries.r6_ops",
    "gcp_etl_spark.queries.r5_ops",
    "gcp_etl_spark.queries.stats_ops",
    "gcp_etl_spark.queries.prep_ops",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: registration) and return
    the full registry, newest-round modules first."""
    from gcp_etl_spark.queries import (  # noqa: F401
        aggregates,
        analytics_ops,
        graph_ops,
        io_formats,
        joins,
        llm_ops,
        llm_prep,
        modern_sql,
        prep_ops,
        reference_parity,
        scale_ops,
        scalars,
        scalars_ext,
        scalars_more,
        sets_sorts,
        stats_ops,
        streaming_duals,
        temporal_ops,
        subqueries,
        surface_ext,
        text_ops,
        tpch_full,
        tpch_more,
        udfs,
        windows,
    )
    from gcp_etl_spark.queries import (  # noqa: F401
        r5_ops,
        r6_ops,
        r7_ops,
        r8_ops,
        r9_ops,
        r9b_ops,
        r10_ops,
        r11_ops,
        r12_ops,
    )

    prio = {m: i for i, m in enumerate(_MODULE_PRIORITY)}
    default = len(prio)
    return dict(
        sorted(
            QUERIES.items(),
            key=lambda kv: prio.get(kv[1].fn.__module__, default),
        )
    )
