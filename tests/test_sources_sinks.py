"""Reference-surface tests: CSV ingest (quote handling), synthetic
generators, Avro codec round-trip, writers, metrics counters —
the rows_written == rows_read invariant throughout (SURVEY.md §5).
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from lakehouse_test_spark.metrics import assert_roundtrip, observed_write
from lakehouse_test_spark.schemas import PERSON_AVRO_SCHEMA, STUDENT_AVRO_SCHEMA
from lakehouse_test_spark.sinks.writers import fanout_write, write_table
from lakehouse_test_spark.sources.avro_codec import avro_roundtrip, decode_record, encode_record
from lakehouse_test_spark.sources.csv_ingest import (
    count_lines,
    parse_quoted_csv_line,
    read_amazon_reviews,
)
from lakehouse_test_spark.sources.synthetic import person_stream, student_records

CSV_BODY = (
    '"2","Great product","I loved it, truly"\n'
    '"1","Bad","Broke after a day"\n'
    '"2","Mixed, but ok","Fine; quotes "" inside"\n'
)


def test_read_amazon_reviews_quoted(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    f = d / "reviews.csv"
    f.write_text(CSV_BODY)
    df = read_amazon_reviews(spark, str(f))
    rows = {r.title: r for r in df.collect()}
    # comma inside quotes preserved (reference op 2)
    assert rows["Great product"].text == "I loved it, truly"
    assert "Mixed, but ok" in rows  # comma inside a quoted *field*
    # quotes stripped (op 3); count matches pre-pass (op 4)
    assert rows["Great product"].polarity == "2"
    assert count_lines(spark, str(f)) == df.count() == 3


def test_parse_quoted_csv_line_column(spark):
    df = spark.createDataFrame([('"a","b,c","d"',)], ["line"])
    out = df.select(parse_quoted_csv_line(F.col("line")).alias("f")).head()
    assert list(out.f) == ["a", "b,c", "d"]


def test_person_stream_values(spark):
    """Field formulas match PerformanceProducer.java:184-188."""
    rows = person_stream(spark, 5).orderBy("ba").collect()
    assert [r.age for r in rows] == [18, 19, 20, 21, 22]
    assert rows[0].name == "hangc" and rows[0].address == "GuangZhou" and rows[0].gender
    assert rows[3].key == "3"
    assert abs(rows[2].score - 61.9) < 1e-9


def test_student_records_values(spark):
    r = student_records(spark, 3).orderBy("number").collect()[2]
    assert (r.name, r.age, r.payload, r.address, r.number) == ("name2", 2, "payload2", "address2", 2)


def test_avro_codec_roundtrip_bytes():
    """Pure codec: zigzag varints + UTF-8, per the Avro binary spec
    (the generated encoder Student.java:560-618 writes this format)."""
    types = ["string", "int", "string", "string", "long"]
    rec = ("name7", 7, "payload7", "address7", 7)
    assert decode_record(encode_record(rec, types), types) == rec
    # negative + large values exercise zigzag
    types2 = ["int", "long", "double", "boolean", "string"]
    rec2 = (-1, 2**40, -3.5, True, "héllo")
    assert decode_record(encode_record(rec2, types2), types2) == rec2


def test_avro_roundtrip_dataframe(spark):
    df = student_records(spark, 50)
    back = avro_roundtrip(df, STUDENT_AVRO_SCHEMA)
    assert sorted(back.collect()) == sorted(df.collect())
    p = person_stream(spark, 20).drop("key")
    back_p = avro_roundtrip(p, PERSON_AVRO_SCHEMA)
    assert sorted(back_p.collect()) == sorted(p.collect())


def test_to_avro_arrow_roundtrip(spark):
    """mapInArrow produce path: Arrow-native encode must decode back
    to the source rows via the (pandas) from_avro twin."""
    from pyspark.sql.types import StructType

    from lakehouse_test_spark.sources.avro_codec import from_avro, to_avro_arrow

    df = student_records(spark, 80)
    names = [f["name"] for f in STUDENT_AVRO_SCHEMA["fields"]]
    spark_schema = StructType([df.schema[n] for n in names])
    encoded = to_avro_arrow(df, names, STUDENT_AVRO_SCHEMA)
    assert encoded.schema.simpleString() == "struct<value:binary>"
    back = encoded.select(
        from_avro(F.col("value"), STUDENT_AVRO_SCHEMA, spark_schema).alias("r")
    ).select("r.*")
    assert sorted(back.collect()) == sorted(df.select(*names).collect())


def test_write_table_and_fanout(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sink")
    df = person_stream(spark, 200)
    write_table(df, str(d / "plain"), num_files=2)
    back = spark.read.parquet(str(d / "plain"))
    assert_roundtrip(df.count(), back.count())
    assert len(list((d / "plain").glob("part-*.parquet"))) == 2

    fanout_write(df, str(d / "fanout"), num_shards=4, key_col="key")
    shards = sorted(p.name for p in (d / "fanout").glob("shard=*"))
    assert len(shards) == 4  # op 12: prefix{sep}{i} expansion analog
    back2 = spark.read.parquet(str(d / "fanout"))
    assert back2.count() == 200
    # partition pruning: one shard reads a strict subset
    one = spark.read.parquet(str(d / "fanout")).where(F.col("shard") == 1)
    assert 0 < one.count() < 200


def test_observed_write_counters(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("obs")
    df = person_stream(spark, 123)
    res = observed_write(df, lambda x: x.write.mode("overwrite").parquet(str(d / "t")), key_col="key")
    assert res.rows == 123  # totalSent analog (op 35)
    assert res.null_keys == 0  # failedSent analog
