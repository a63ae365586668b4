"""Declared query corpus (SURVEY.md §2B) with DuckDB oracles."""

from gcp_etl_spark.queries.registry import QUERIES, QuerySpec, load_all, query

__all__ = ["QUERIES", "QuerySpec", "load_all", "query"]
