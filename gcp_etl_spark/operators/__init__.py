"""Relational operator library.

Everything here composes built-in DataFrame ops (Catalyst-optimizable);
no RDDs, no driver-side loops. Custom logic exists only where Spark has
no native operator (as-of join, top-k per group helper).
"""

from gcp_etl_spark.operators.asof import asof_join
from gcp_etl_spark.operators.quantiles import exact_quantiles, global_row_number
from gcp_etl_spark.operators.topk import top_k, top_k_per_group

__all__ = [
    "asof_join",
    "exact_quantiles",
    "global_row_number",
    "top_k",
    "top_k_per_group",
]
