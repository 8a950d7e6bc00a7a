"""Custom storage surface (SURVEY.md §2.9: ``implement Storage``,
src/io/Storage.java:27 / StorageFactory.java:41-50) — realized with
Spark's Python DataSource API (pyspark.sql.datasource, Spark ≥4.0).

Two sources ship:

- ``virtual``  — the reference's VIRTUAL input (VirtualStorage.java:43)
  as a first-class registered format: ``spark.read.format("virtual")
  .option("rows", n)`` synthesizes n rows with no backing file,
  partitioned across executors.
- ``textdict`` — a line-oriented dictionary-file reader (one value per
  line -> (value, code) rows, codes 1-based in file order), the custom
  line-format example in the Storage contract.

Registration is per-session: ``register_sources(spark)`` (done by
``cubert_spark.get_session``... no — kept explicit: custom formats are
opt-in, exactly like Cubert's ``USING com.example.Storage``).

Partitioning note: ``virtual`` splits its row range into
``numPartitions`` even slices — generation is executor-side and
embarrassingly parallel; there is no driver materialization, so a
trillion-row virtual input is as cheap as a small one.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class VirtualDataSource(DataSource):
    """``LOAD ... USING VIRTUAL`` — n synthetic rows (id LONG)."""

    @classmethod
    def name(cls) -> str:
        return "virtual"

    def schema(self) -> str:
        return "id long"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _VirtualReader(self.options)


class _VirtualReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 100))
        self.parts = int(options.get("numPartitions", 8))

    def partitions(self):
        step = max(1, self.rows // self.parts)
        out = []
        start = 0
        while start < self.rows:
            out.append(_RangePartition(start, min(start + step, self.rows)))
            start += step
        return out or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i,)


class TextDictDataSource(DataSource):
    """Line-oriented dictionary file -> (value STRING, code INT),
    codes 1-based in file order (GenerateDictionary semantics for a
    hand-authored dictionary file)."""

    @classmethod
    def name(cls) -> str:
        return "textdict"

    def schema(self) -> str:
        return "value string, code int"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _TextDictReader(self.options)


class _TextDictReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("textdict requires a path")

    def read(self, partition):
        # a dictionary file is small by contract (it broadcasts
        # downstream); single-partition read keeps codes stable
        with open(self.path) as f:
            code = 0
            for line in f:
                line = line.rstrip("\n")
                if line:
                    code += 1
                    yield (line, code)


def register_sources(spark) -> None:
    """Register the custom formats on a session (idempotent)."""
    spark.dataSource.register(VirtualDataSource)
    spark.dataSource.register(TextDictDataSource)
