"""Banded interval (range) join — point-in-interval without a nested loop.

Spark executes a raw ``l.ts BETWEEN r.start AND r.end`` join as
BroadcastNestedLoopJoin (or a full SMJ on the range condition) — at
100 TB both are O(points x intervals) disasters. When interval length
is bounded (the overwhelmingly common case: sessions, promo windows,
validity ranges), the classic banding rewrite makes it an equi-join:

  bucket(point)     = floor(days(ts) / W)
  buckets(interval) = floor(days(start)/W) .. floor(days(end)/W)

with ``W >= max interval length`` an interval spans at most 2 buckets,
so each interval is replicated <= 2x, the join runs hash/SMJ on the
bucket key with full AQE/skew support, and an exact BETWEEN filter
removes the false positives inside each bucket. Same shape DuckDB/
Trino emit for range-join optimizations and the bucketing trick the
as-of join (operators/asof.py) rides.

No reference counterpart (the reference has no joins at all) — NS
extension per SURVEY.md §2B joins row "theta / non-equi (range)".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PB = "__ij_pb"
_IB = "__ij_ib"


def _day_bucket(c: Column, width_days: int) -> Column:
    return F.floor(F.unix_date(F.to_date(c)) / F.lit(width_days)).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_days: int,
) -> DataFrame:
    """Inner-join ``points`` to ``intervals`` where
    ``start_ts <= point_ts <= end_ts``.

    ``bucket_days`` must be >= the longest interval in days (else an
    interval would span >2 buckets — still correct, the sequence
    explode covers any span, but replication grows as len/W+1).
    """
    p = points.withColumn(_PB, _day_bucket(F.col(point_ts), bucket_days))
    iv = intervals.withColumn(
        _IB,
        F.explode(
            F.sequence(
                _day_bucket(F.col(start_ts), bucket_days),
                _day_bucket(F.col(end_ts), bucket_days),
            )
        ),
    )
    return (
        p.join(iv, p[_PB] == iv[_IB])
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop(_PB, _IB)
    )
