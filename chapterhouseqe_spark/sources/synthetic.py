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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


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


class SyntheticDataSource(DataSource):
    """``spark.read.format("chqe_synthetic").option("rows", N).load()``"""

    @classmethod
    def name(cls) -> str:
        return "chqe_synthetic"

    def schema(self) -> str:
        return "id bigint, value double, label string"

    def reader(self, schema) -> SyntheticReader:
        return SyntheticReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticDataSource)
