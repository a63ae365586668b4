"""Streaming execution smoke: the SAME operator functions run as a
real Structured Streaming query (file source → memory sink) must equal
their batch results (SURVEY.md §2B streaming surface, §7 step 8)."""

from __future__ import annotations

import pytest

from gcp_etl_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)
from gcp_etl_spark.tables import t
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    # re-write events with µs timestamps (stream source can't read the
    # nanos parquet either); one file = one deterministic micro-batch
    d = tmp_path_factory.mktemp("events_stream")
    ev = t(spark, SF_SMALL, "events")
    ev.coalesce(1).write.mode("overwrite").parquet(str(d / "events"))
    return str(d / "events"), ev.schema


def run_stream(spark, stream_df, mode):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName("stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT * FROM stream_out")


@pytest.mark.parametrize(
    "op,mode",
    [
        (tumbling_agg, "complete"),
        (sliding_agg, "complete"),
        (session_agg, "complete"),
    ],
)
def test_stream_equals_batch(spark, events_stream_dir, op, mode):
    path, schema = events_stream_dir
    batch = op(spark.read.schema(schema).parquet(path))
    stream = op(spark.readStream.schema(schema).parquet(path))
    assert stream.isStreaming
    got = run_stream(spark, stream, mode)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_dedup_watermarked(spark, events_stream_dir):
    path, schema = events_stream_dir
    stream = stream_dedup(spark.readStream.schema(schema).parquet(path))
    assert stream.isStreaming
    got = run_stream(spark, stream, "append")
    # event_id unique in fixture → dedup keeps everything exactly once
    batch_n = spark.read.schema(schema).parquet(path).count()
    assert got.count() == batch_n


def test_watermark_set_on_streams(spark, events_stream_dir):
    """Watermarks must be attached in streaming mode — unbounded state
    is the #1 scale failure for a 100 TB/day stream."""
    import contextlib
    import io

    path, schema = events_stream_dir
    stream = tumbling_agg(spark.readStream.schema(schema).parquet(path))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        stream.explain(extended=True)
    assert "EventTimeWatermark" in buf.getvalue()
