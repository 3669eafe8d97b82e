"""Quoted-CSV file ingest — the reference's AmazonReview path
(SURVEY.md §2a ops 1-4, 17) re-expressed on Spark's CSV source.

The reference hand-rolls quote-aware splitting with a regex
(`AmazonReviewProducer.java:143-147`) and strips quotes per field
(`:149-151`); Spark's CSV reader does both natively (quote/escape
options), distributed over file splits. The positional projection to
the typed record (`:111-118`) becomes a schema application.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.schemas import AMAZON_REVIEW_SCHEMA


def read_amazon_reviews(spark: SparkSession, path: str) -> DataFrame:
    """Scan a polarity/title/text CSV with commas-inside-quotes
    handling (ops 1-3 + 17 in one declarative scan).

    Scale: file splits map to tasks (op 7 analog); multiline=false
    keeps splits byte-range parallel.
    """
    return (
        spark.read.schema(AMAZON_REVIEW_SCHEMA)
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def count_lines(spark: SparkSession, path: str) -> int:
    """Pre-pass row count (op 4, AmazonReviewProducer.java:156-166):
    the reference scans the file once to size a CountDownLatch; here
    it is a distributed count over the text source."""
    return spark.read.text(path).count()


def parse_quoted_csv_line(col):
    """Standalone quote-aware field split (op 2's regex, for when the
    input is a *column* of CSV lines rather than files): split on
    commas outside double quotes, then strip surrounding quotes
    (op 3, `replaceAll("^\\"|\\"$", "")`).
    """
    split = F.split(col, r',(?=(?:[^"]*"[^"]*")*[^"]*$)')
    return F.transform(split, lambda f: F.regexp_replace(f, r'^"|"$', ""))
