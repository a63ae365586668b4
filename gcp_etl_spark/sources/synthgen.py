"""Custom PYTHON DATA SOURCE (Spark 4 DataSource API): a deterministic
partitioned synthetic-telemetry generator.

The reference ingests from an external HTTP source into the lake
(``app/src/get_data_kaggle.py`` + R1/R2 in SURVEY.md §2A); the Spark-4
idiom for "teach Spark a new source" is the Python DataSource API —
``pyspark.sql.datasource.DataSource`` — which plugs a pure-Python
reader into the DataFrame scan path with real InputPartition-level
parallelism (each partition's ``read`` runs as its own task on the
executors, Arrow-batched back).

This source generates rows by a seeded integer formula (Knuth
multiplicative hashing), so it is exactly reproducible in ANSI SQL —
the declared query ``io_python_datasource`` is therefore fully
DuckDB-oracle-checked even though the rows never touch disk.

Scale: ``numPartitions`` input partitions each generate a disjoint id
range — the generator parallelizes like a parquet scan; there is no
driver-side row materialization.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

KNUTH = 2654435761  # 2^32 / golden ratio, the classic multiplicative hash


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, pid: int):
        self.start = start
        self.end = end
        self.pid = pid


class SynthGenReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("numPartitions", 8))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _RangePartition(i * per, min((i + 1) * per, self.n_rows), i)
            for i in range(self.n_parts)
            if i * per < self.n_rows
        ]

    def read(self, partition: _RangePartition):
        # runs ON THE EXECUTOR for its id range only
        for i in range(partition.start, partition.end):
            h = (i * KNUTH) % (1 << 32)
            yield (
                i,
                partition.pid,
                h % 997,  # metric: pseudo-random in [0, 997)
                (h >> 8) % 10,  # sensor id in [0, 10)
            )


class SynthGenDataSource(DataSource):
    """spark.read.format("synthgen").option("rows", N) source."""

    @classmethod
    def name(cls) -> str:
        return "synthgen"

    def schema(self) -> str:
        return "id bigint, part int, metric bigint, sensor bigint"

    def reader(self, schema: StructType) -> SynthGenReader:
        return SynthGenReader(schema, self.options)

    def streamReader(self, schema: StructType) -> "SynthGenStreamReader":
        return SynthGenStreamReader(schema, self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    try:
        spark.dataSource.register(SynthGenDataSource)
    except Exception:  # noqa: BLE001 - re-registration raises on some builds
        pass


class SynthGenStreamReader(DataSourceStreamReader):
    """Micro-batched STREAMING reader over the same seeded formula:
    each ``latestOffset`` call advances the available range by
    ``batchRows``, so a ``processAllAvailable`` drain executes
    ceil(rows / batchRows) real micro-batches before the offset
    plateaus at ``rows`` — exercising offset tracking, per-batch
    partition planning, and executor-side reads, while staying exactly
    replayable in SQL (same Knuth formula, same id range).

    OFFSET MONOTONICITY UNDER RESTART (r9 ADVICE): the available
    position starts in driver memory, so a reader restarted from a
    durable checkpoint would otherwise report latestOffset BELOW the
    committed offset — which Spark's microbatch planner rejects
    (offsets must never regress). ``partitions``/``commit`` therefore
    floor ``_avail`` at every offset the engine hands back, so the
    first ``latestOffset`` after recovery resumes from the committed
    position instead of 0."""

    def __init__(self, schema: StructType, options: dict):
        self.total = int(options.get("rows", 2000))
        self.batch = int(options.get("batchRows", 500))
        self.n_parts = int(options.get("numPartitions", 4))
        self._avail = 0

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        self._avail = min(self.total, self._avail + self.batch)
        return {"pos": self._avail}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["pos"]), int(end["pos"])
        # recovery floor: a restarted reader learns the committed
        # position from the engine's replay calls, so latestOffset
        # never regresses below an offset Spark already planned
        self._avail = max(self._avail, e)
        per = -(-(e - s) // self.n_parts)  # ceil
        return [
            _RangePartition(s + i * per, min(s + (i + 1) * per, e), i)
            for i in range(self.n_parts)
            if s + i * per < e
        ]

    def read(self, partition: _RangePartition):
        # identical executor-side formula as the batch reader
        for i in range(partition.start, partition.end):
            h = (i * KNUTH) % (1 << 32)
            yield (i, partition.pid, h % 997, (h >> 8) % 10)

    def commit(self, end: dict) -> None:
        self._avail = max(self._avail, int(end["pos"]))
