"""Structured Streaming surface — batch/stream dual windowed operators."""

from gcp_etl_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)

__all__ = ["tumbling_agg", "sliding_agg", "session_agg", "stream_dedup"]
