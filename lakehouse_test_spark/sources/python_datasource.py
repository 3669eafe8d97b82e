"""Spark 4 Python DataSource implementing the reference's synthetic
Person producer as a first-class pluggable source (batch + stream).

The declarative ``spark.range`` generators in ``sources/synthetic.py``
are the fast path; this module is the *API-parity* path: the
reference exposes its generator as a source you point jobs at
(PerformanceProducer.java:184-188 produces; consumers just read), and
Spark 4's ``pyspark.sql.datasource`` API is the idiomatic way to ship
that contract — ``spark.read.format("person_gen")`` works in any job
without importing this package's functions.

Scale: ``partitions()`` splits the id space into ``numPartitions``
ranges, so generation parallelizes across executors exactly like
``spark.range`` — each task materializes only its slice, nothing is
driver-resident. The stream reader advances offsets by
``rowsPerBatch`` per microbatch — a bounded, replayable source
(offsets are plain ints, so restart/retry re-reads the same slice:
exactly-once with a deterministic generator).
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

PERSON_SCHEMA = (
    "name string, age int, address string, gender boolean, "
    "score double, ba bigint, key string"
)


def _person_row(i: int) -> tuple:
    """One Person record (PerformanceProducer.java:184-188 formulas)."""
    return (
        "hangc",
        (18 + i) % 100,
        "GuangZhou",
        True,
        math.fmod(59.9 + i, 150.0),
        i,
        str(i),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class PersonReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        if self.n <= 0:  # an empty partition list is rejected by the API
            return [_RangePartition(0, 0)]
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n)) for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _person_row(i)


class PersonStreamReader(DataSourceStreamReader):
    """Microbatch stream over the same id space: offset = next id to
    emit. ``partitions(start, end)`` must cover the WHOLE committed
    range — Spark commits ``end`` regardless of what was returned, so
    clamping here would silently drop rows (found by the 25-row /
    10-per-batch smoke). ``rowsPerBatch`` is therefore the partition
    chunk size (parallelism within a batch), not a rate limit."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))

    def initialOffset(self) -> dict:
        return {"id": 0}

    def latestOffset(self) -> dict:
        return {"id": self.n}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["id"], end["id"]
        step = max(1, self.rows_per_batch)
        return [_RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)] or [
            _RangePartition(lo, hi)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _person_row(i)

    def commit(self, end: dict) -> None:
        pass


class PersonDataSource(DataSource):
    """``spark.read.format("person_gen").option("n", 1000).load()``"""

    @classmethod
    def name(cls) -> str:
        return "person_gen"

    def schema(self) -> str:
        return PERSON_SCHEMA

    def reader(self, schema) -> PersonReader:
        return PersonReader(self.options)

    def streamReader(self, schema) -> PersonStreamReader:
        return PersonStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(PersonDataSource)


from pyspark.sql import functions as F  # noqa: E402

from lakehouse_test_spark.registry import query  # noqa: E402


@query(
    "synthetic_datasource_scan",
    oracle="""
    SELECT 'hangc' AS name,
           CAST((18 + i) % 100 AS INTEGER) AS age,
           'GuangZhou' AS address,
           TRUE AS gender,
           CAST(round(fmod(59.9 + i, 150.0), 6) AS DOUBLE) AS score,
           CAST(i AS BIGINT) AS ba,
           CAST(i AS VARCHAR) AS key
    FROM range(0, 1000) t(i)
    """,
    tags=("source", "synthetic", "datasource"),
)
def synthetic_datasource_scan(spark, sf_dir):
    """The same 1000 Person rows as synthetic_person_gen, but read
    through the pluggable Spark 4 Python DataSource
    (``spark.read.format("person_gen")``) — proving the source API
    path produces byte-identical records to the declarative
    generator; sf_dir unused by design."""
    register(spark)
    return (
        spark.read.format("person_gen")
        .option("n", 1000)
        .option("numPartitions", 8)
        .load()
        .withColumn("score", F.round(F.col("score"), 6))
    )
