"""Spark 4 Python DataSource (person_gen): batch partitioning,
record parity with the declarative generator, and stream
completeness across multi-chunk offset ranges."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_test_spark.sources.python_datasource import register
from lakehouse_test_spark.sources.synthetic import person_stream


def test_batch_matches_declarative_generator(spark):
    register(spark)
    via_source = (
        spark.read.format("person_gen").option("n", 200).option("numPartitions", 4).load()
    )
    assert via_source.rdd.getNumPartitions() == 4
    declarative = person_stream(spark, 200)
    # custom-source columns are nullable; compare names + types
    assert [(f.name, f.dataType) for f in via_source.schema.fields] == [
        (f.name, f.dataType) for f in declarative.schema.fields
    ]
    assert via_source.exceptAll(declarative).count() == 0
    assert declarative.exceptAll(via_source).count() == 0


def test_stream_covers_full_range_in_chunks(spark):
    """Chunked partitions must cover the whole committed offset range
    (regression: clamping in partitions() dropped rows silently)."""
    register(spark)
    sdf = spark.readStream.format("person_gen").option("n", 57).option("rowsPerBatch", 10).load()
    q = (
        sdf.writeStream.format("memory")
        .queryName("pds_stream_cov")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS c, count(DISTINCT ba) AS d, min(ba) AS lo, max(ba) AS hi "
        "FROM pds_stream_cov"
    ).collect()[0]
    assert (got["c"], got["d"], got["lo"], got["hi"]) == (57, 57, 0, 56)


def test_batch_empty_and_single_row(spark):
    register(spark)
    assert spark.read.format("person_gen").option("n", 0).load().count() == 0
    one = spark.read.format("person_gen").option("n", 1).load().collect()
    assert len(one) == 1 and one[0]["ba"] == 0 and one[0]["age"] == 18
