"""Custom Python Data Source (PySpark 4 DataSource API).

The reference's long-term extension vision is user-deployed source
operators (README "Future Functionality"; TaskBuilder registry,
operator_task_registry.rs). In PySpark the first-class analog is the
Data Source API: a registered format usable as
``spark.read.format("chqe_synthetic")`` — partition-parallel, schema'd,
and driven entirely by Catalyst like any built-in source.

This synthetic source generates deterministic rows (seeded arithmetic,
no RNG state) split across ``partitions`` input partitions — each
partition generates its own id range, so the source scales linearly
with executors exactly like a real external source would.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 100))
        self.num_partitions = int(options.get("partitions", 4))

    def partitions(self):
        if self.rows <= 0:
            # always at least one (empty) partition — Spark invokes
            # read(None) if the list is empty
            return [_RangePartition(0, 0)]
        per = max(1, -(-self.rows // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            # deterministic, seedless arithmetic — same rows every run
            yield (i, (i * 37 % 1000) / 10.0, f"l{i % 5}")


def _row(i: int):
    # deterministic, seedless arithmetic shared by batch and stream paths
    return (i, (i * 37 % 1000) / 10.0, f"l{i % 5}")


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic rows.

    Offsets are plain row counters, so `readBetweenOffsets` replays any
    committed range bit-for-bit — exactly the replayability contract a
    real offset-tracking source (Kafka, log tail) provides for
    exactly-once sinks. ``batch_rows`` rows arrive per trigger until
    ``max_rows``, then the stream idles (empty batches, same offset).
    """

    def __init__(self, options: dict):
        self.batch_rows = int(options.get("batch_rows", 10))
        self.max_rows = int(options.get("max_rows", 100))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = int(start["offset"])
        hi = min(lo + self.batch_rows, self.max_rows)
        return iter([_row(i) for i in range(lo, hi)]), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(int(start["offset"]), int(end["offset"]))])


class SyntheticDataSource(DataSource):
    """``spark.read.format("chqe_synthetic").option("rows", N).load()``
    or ``spark.readStream.format("chqe_synthetic")`` for the micro-batch
    variant of the same deterministic rows."""

    @classmethod
    def name(cls) -> str:
        return "chqe_synthetic"

    def schema(self) -> str:
        return "id bigint, value double, label string"

    def reader(self, schema) -> SyntheticReader:
        return SyntheticReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticStreamReader:
        return SyntheticStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticDataSource)
