"""Round-13 optimization pins: size-gated fast paths must be
bit-identical to the scale paths they shortcut."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_theil_sen_numpy_path_equals_distributed(spark, monkeypatch):
    """analytics_theil_sen's single-task numpy slope median (taken
    below the _TS_NUMPY_MAX_DAYS gate) must match the distributed
    range-partitioned rank path bit-for-bit: same Spark-aggregated
    daily values in, same per-pair IEEE slope op, exact selection of
    the same two middle ranks."""
    import gcp_etl_spark.queries.stats_ops as stats_ops
    from gcp_etl_spark.queries import load_all

    fn = load_all()["analytics_theil_sen"].fn
    fast = _rows(fn(spark, SF_SMALL))
    monkeypatch.setattr(stats_ops, "_TS_NUMPY_MAX_DAYS", 0)
    slow = _rows(fn(spark, SF_SMALL))
    assert fast == slow and fast, (fast, slow)
