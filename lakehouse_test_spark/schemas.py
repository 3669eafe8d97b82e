"""Record schemas of the reference harness, as Spark StructTypes.

The reference declares exactly three record schemas (SURVEY.md §1.2)
— Lombok POJOs reflected into Avro or Avro-IDL codegen:

- Person        /root/reference/src/main/java/io/streamnative/lakehouse/Person.java:10-17
- AmazonReview  /root/reference/src/main/java/io/streamnative/lakehouse/AmazonReview.java:10-14
- Student       /root/reference/src/main/resources/avro/Student.avsc:5-11

Flat primitives only (string/int/long/double/boolean). The message
key (PerformanceProducer.java:188) is modeled as an explicit ``key``
string column where relevant.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _schema(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t) for n, t in fields])


PERSON_SCHEMA = _schema(
    ("name", StringType()),
    ("age", IntegerType()),
    ("address", StringType()),
    ("gender", BooleanType()),
    ("score", DoubleType()),
    ("ba", LongType()),
)

AMAZON_REVIEW_SCHEMA = _schema(
    ("polarity", StringType()), ("title", StringType()), ("text", StringType())
)

STUDENT_SCHEMA = _schema(
    ("name", StringType()),
    ("age", IntegerType()),
    ("payload", StringType()),
    ("address", StringType()),
    ("number", LongType()),
)

#: Avro schema JSON for the Student record (mirrors Student.avsc) —
#: used by the pure-Python Avro codec in sources/avro_codec.py.
STUDENT_AVRO_SCHEMA = {
    "type": "record",
    "name": "Student",
    "fields": [
        {"name": "name", "type": "string"},
        {"name": "age", "type": "int"},
        {"name": "payload", "type": "string"},
        {"name": "address", "type": "string"},
        {"name": "number", "type": "long"},
    ],
}

PERSON_AVRO_SCHEMA = {
    "type": "record",
    "name": "Person",
    "fields": [
        {"name": "name", "type": "string"},
        {"name": "age", "type": "int"},
        {"name": "address", "type": "string"},
        {"name": "gender", "type": "boolean"},
        {"name": "score", "type": "double"},
        {"name": "ba", "type": "long"},
    ],
}
