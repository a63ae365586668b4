"""transformWithStateInPandas (Spark 4 arbitrary stateful streaming).

The successor API to ``applyInPandasWithState`` (which
``streaming/stateful.py`` uses): a ``StatefulProcessor`` class with
typed state handles (ValueState/ListState/MapState), timers, and
initial-state support, running on the RocksDB state store.

ENVIRONMENT GATE (re-probed round 12, 2026-08-16: ``importlib.util.
find_spec('google')`` is still None and ``import google.protobuf``
raises ModuleNotFoundError — the wheel remains absent, skip stands;
exact failure for the next container bump): the ``protobuf``
distribution is ENTIRELY
ABSENT from site-packages (pyenv 3.11.7; ``importlib.util.find_spec
('google')`` is None on the driver), and an end-to-end run crashes the
streaming Python runner with::

    StreamingPythonRunnerInitializationException: ... returned -2.
    Cause: from google.protobuf import descriptor as _descriptor
    ImportError: cannot import name 'descriptor' from
    'google.protobuf' (unknown location)

via ``transform_with_state_driver_worker`` ->
``stateful_processor_api_client`` ->
``pyspark/sql/streaming/proto/StateMessage_pb2.py``, whose generated
header says "Protobuf Python Version: 6.33.0" and calls
``ValidateProtobufRuntimeVersion`` — so the fix is exactly one wheel:
``protobuf==6.33.*`` (same major, >= 6.33.0; pyspark 4.1.2 does not
declare it, it rides the grpcio-status dependency of the ``connect``
extra which is also not installed). No pip in this container per the
build contract. ``available()`` probes the dependency so callers and
tests degrade explicitly instead of crashing the streaming runner; on
a normal Spark 4 deployment the probe passes and the operator runs as
written (the construction mirrors streaming/stateful.py's
running-totals operator, whose batch-equality test pins the same
semantics through the older API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType(), True),
        StructField("total", DoubleType(), True),
        StructField("mx", DoubleType(), True),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
        StructField("max_value", DoubleType(), True),
    ]
)


def available() -> bool:
    """True when the runtime can actually execute transformWithState
    (the protobuf-backed state-server protocol imports cleanly)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:  # noqa: BLE001 - any import failure means unavailable
        return False


def _processor():
    """Build the StatefulProcessor lazily (imports only when used)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        """Per-user running (count, sum, max) — the exact semantics of
        streaming/stateful.py's applyInPandasWithState operator,
        re-expressed on the new API's ValueState handle."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            cnt, total, mx = 0, 0.0, None
            if self._agg.exists():
                cnt, total, mx = self._agg.get()
            for pdf in rows:
                cnt += len(pdf)
                total += float(pdf["value"].sum())
                m = float(pdf["value"].max())
                mx = m if mx is None else max(mx, m)
            self._agg.update((cnt, total, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [cnt],
                    "total_value": [total],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def running_totals_tws(grouped) -> DataFrame:
    """Apply the running-totals processor to a ``GroupedData`` (from
    ``df.groupBy("user_id")`` on a stream with a ``value`` column).
    Caller must set the RocksDB state store provider conf."""
    return grouped.transformWithStateInPandas(
        statefulProcessor=_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
