"""Deterministic synthetic record generators — the reference's load
generators re-expressed as declarative ``spark.range`` programs
(SURVEY.md §2a ops 18-19).

- Person stream: ``new Person("hangc", (int)(18+cnt)%100, "GuangZhou",
  true, (59.9+cnt)%150, cnt)`` with key=str(cnt)
  (PerformanceProducer.java:184-188).
- Student records: ``("name"+i, i, "payload"+i, "address"+i, i)``
  (UrsaKafkaProducerOnCloud.java:51-56).

Scale: ``spark.range(n)`` partitions the id space across executors —
generation is embarrassingly parallel and shuffle-free at any n;
this is how the 100 TB load harness produces input without a source
system. Both are oracle-checked against DuckDB ``range()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query

DEFAULT_ROWS = 1000


def person_stream(spark: SparkSession, n: int = DEFAULT_ROWS, num_partitions: int | None = None) -> DataFrame:
    """The deterministic Person generator with its message key.

    Cites: PerformanceProducer.java:184-188 (field formulas),
    :188 (key = running count as string).
    """
    rng = spark.range(0, n, numPartitions=num_partitions) if num_partitions else spark.range(n)
    return rng.select(
        F.lit("hangc").alias("name"),
        ((F.lit(18) + F.col("id")) % 100).cast("int").alias("age"),
        F.lit("GuangZhou").alias("address"),
        F.lit(True).alias("gender"),
        ((F.lit(59.9) + F.col("id")) % 150.0).alias("score"),
        F.col("id").alias("ba"),
        F.col("id").cast("string").alias("key"),
    )


def student_records(spark: SparkSession, n: int = DEFAULT_ROWS, num_partitions: int | None = None) -> DataFrame:
    """Indexed Student records (UrsaKafkaProducerOnCloud.java:51-56)."""
    rng = spark.range(0, n, numPartitions=num_partitions) if num_partitions else spark.range(n)
    i = F.col("id")
    return rng.select(
        F.concat(F.lit("name"), i).alias("name"),
        i.cast("int").alias("age"),
        F.concat(F.lit("payload"), i).alias("payload"),
        F.concat(F.lit("address"), i).alias("address"),
        i.alias("number"),
    )


@query(
    "synthetic_person_gen",
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
    tags=("source", "synthetic", "reference"),
)
def synthetic_person_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1000 deterministic Person rows (reference op 18) — generation
    itself is the operator under test; sf_dir unused by design."""
    return person_stream(spark, 1000).withColumn("score", F.round(F.col("score"), 6))


@query(
    "synthetic_student_gen",
    oracle="""
    SELECT concat('name', i) AS name,
           CAST(i AS INTEGER) AS age,
           concat('payload', i) AS payload,
           concat('address', i) AS address,
           CAST(i AS BIGINT) AS number
    FROM range(0, 1000) t(i)
    """,
    tags=("source", "synthetic", "reference"),
)
def synthetic_student_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1000 indexed Student rows (reference Kafka producer op 18)."""
    return student_records(spark, 1000)
