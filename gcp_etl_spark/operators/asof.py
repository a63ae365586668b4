"""As-of join (nearest event at or before a timestamp).

Spark has no native batch AS OF join (SURVEY.md §2B; DuckDB spells it
``ASOF JOIN``). Implementation: equi-join on the key columns with the
range predicate pushed into the join condition, then keep the latest
right-side row per left row with a ranking window.

Scale design:
- The equi-key component makes this a sort-merge join on ``left_on``,
  NOT a cross/nested-loop join — the range predicate rides along as a
  join condition, so Spark evaluates it during the merge.
- The subsequent window shuffles on the left row id, which is the same
  cardinality as the left input (no blow-up beyond the transient
  match-set). For heavily-skewed keys AQE skew-join splits the merge.
- For the time-series case with sorted inputs per key, an alternative
  ``applyInPandas`` + ``pd.merge_asof`` per key avoids the intermediate
  match-set entirely; provided as ``asof_join_grouped`` for wide-match
  workloads.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: Sequence[str],
    right_on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tiebreak: Sequence[str] = (),
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same key group.

    ``tiebreak``: right-side columns ordered descending after
    ``right_ts`` to make the pick deterministic when several right rows
    share the as-of timestamp.

    Right-side columns whose names collide with left columns are
    returned with an ``_r`` suffix (pd.merge_asof-style).
    """
    collisions = set(left.columns) & set(right.columns)
    if collisions:
        for c in collisions:
            right = right.withColumnRenamed(c, f"{c}_r")
        ren = {c: f"{c}_r" for c in collisions}
        right_on = [ren.get(c, c) for c in right_on]
        right_ts = ren.get(right_ts, right_ts)
        tiebreak = [ren.get(c, c) for c in tiebreak]
    lid = "__asof_lid"
    l = left.withColumn(lid, F.monotonically_increasing_id())
    cond = None
    for lc, rc in zip(left_on, right_on):
        c = l[lc] == right[rc]
        cond = c if cond is None else (cond & c)
    cond = (cond & (right[right_ts] <= l[left_ts])) if cond is not None else (
        right[right_ts] <= l[left_ts]
    )
    joined = l.join(right, cond, "inner")
    order = [F.col(right_ts).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(lid).orderBy(*order)
    best = (
        joined.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .drop("__asof_rn")
    )
    if how == "inner":
        return best.drop(lid)
    # left join: bring back unmatched left rows with nulls
    matched = best.select(lid, *[c for c in right.columns])
    return (
        l.join(matched, on=lid, how="left")
        .drop(lid)
    )


def asof_join_grouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Alternative as-of join via ``applyInPandas`` + ``pd.merge_asof``
    per key group — avoids materializing the range-match set when each
    left row matches many right rows. Arrow-batched (no per-row Python).
    """
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in right.schema.fields
            if f.name not in {on}
        ]
    )
    rcols = [c for c in right.columns if c != on]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        if rpdf.empty:
            for c in rcols:
                lpdf[c] = None
            return lpdf
        rpdf = rpdf.sort_values(right_ts, kind="mergesort")
        return pd.merge_asof(
            lpdf,
            rpdf.drop(columns=[on]),
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
        )

    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(merge, out_schema)
