"""Path-equality pin for agg_ols_two_feature's size-gated moment sums
(r12 optimization): the quantized-long-sum plan taken below
``_OLS_LONG_PATH_BYTES`` must produce BIT-IDENTICAL rows to the
overflow-proof decimal-sum plan taken above it — both accumulate the
same exact per-row decimals, so the only difference allowed is speed.
Sibling of tests/test_operators.py::
test_exact_weighted_quantiles_agg_path_equals_rank_path.
"""

from __future__ import annotations

import gcp_etl_spark.queries.aggregates as A
from tests.conftest import SF_SMALL


def _rows(spark, monkeypatch, gate):
    monkeypatch.setattr(A, "_OLS_LONG_PATH_BYTES", gate)
    from gcp_etl_spark.queries import load_all

    df = load_all()["agg_ols_two_feature"].fn(spark, SF_SMALL)
    return sorted(
        (r.asDict() for r in df.collect()),
        key=lambda d: d["l_returnflag"],
    )


def test_ols_long_path_equals_decimal_path(spark, monkeypatch):
    long_path = _rows(spark, monkeypatch, 1 << 62)  # always long sums
    dec_path = _rows(spark, monkeypatch, 0)  # always decimal sums
    assert long_path == dec_path, (long_path, dec_path)
    assert len(long_path) == 3  # A / N / R return flags
