"""Round-3 wave R: physical-layout scale surface — static partition
pruning, dynamic partition pruning (DPP), and schema-evolution-on-read.

These are the three storage-layout behaviors a 100 TB deployment
leans on hardest: a date-partitioned fact table must let Spark skip
partitions both when the predicate is literal (static pruning) and
when it only materializes at runtime from a joined dimension (DPP),
and a table whose schema grew over time must still read as one
relation (mergeSchema). Each gate query writes a real partitioned /
multi-batch parquet layout to scratch, reads it back through the
pruning path, and hash-checks the aggregate against DuckDB running
the equivalent logical query on the original table — so a pruning
bug that drops or double-reads a partition fails the value gate,
not just a plan assertion. tests/test_plans.py pins the plan side:
``PartitionFilters`` carries the static predicate and a
``dynamicpruningexpression`` for the DPP query.

Reference parity: the reference's tiered storage reads offloaded
segments selectively by offset position
(src/main/java/io/streamnative/lakehouse/... segment selection);
partition pruning is the lakehouse-native generalization — skip
whole partitions by value, decided statically or at runtime.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dround, dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# One partitioned materialization per (app, sf_dir) — queries in the
# same session share the layout instead of rewriting it per call.
_PART_CACHE: dict[tuple[str, str], str] = {}


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Write events date-partitioned (one directory per event_date,
    30 partitions for the fixture month) and return the path.

    This is the canonical 100 TB fact layout: partition by the
    coarse time key every query filters on, so both static pruning
    and DPP can skip directories before a single row is read.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _PART_CACHE.get(key)
    if path and os.path.isdir(path):
        return path
    path = tempfile.mkdtemp(prefix="lakehouse_part_events_")
    (
        T(spark, sf_dir, "events")
        .withColumn("event_date", F.to_date("ts"))
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(path)
    )
    _PART_CACHE[key] = path
    return path


@query(
    "format_partitioned_pruning",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
    GROUP BY event_type
    """,
    tags=("sources", "partitioning", "scale"),
)
def format_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static partition pruning: scan a date-partitioned events
    layout with a literal one-week predicate and aggregate.

    The predicate lands in ``PartitionFilters`` (pinned in
    tests/test_plans.py), so Spark lists only 7 of the 30 date
    directories — at 100 TB that is the difference between reading
    a week and reading a month. The oracle runs the same filter on
    the unpartitioned original, so a partition dropped or duplicated
    by the layout hop flips the value hash.
    """
    fact = spark.read.parquet(partitioned_events_path(spark, sf_dir))
    return (
        fact.where(
            F.col("event_date").between("2024-01-08", "2024-01-14")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(dsum(F.col("value")), 2).alias("total_value"),
        )
    )


@query(
    "join_dynamic_partition_pruning",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d,
             week(CAST(ts AS DATE)) AS wk
      FROM events
    )
    SELECT e.event_date,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users
    FROM (SELECT CAST(ts AS DATE) AS event_date, user_id FROM events) e
    JOIN dim ON e.event_date = dim.d
    WHERE dim.wk = 2
    GROUP BY e.event_date
    """,
    tags=("join", "partitioning", "scale"),
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact side is date-partitioned,
    the dimension (a derived date→ISO-week calendar) is filtered on a
    NON-key column, and the partitions to read only become known when
    the dim filter runs — Spark broadcasts the surviving dim keys and
    prunes fact directories at runtime (``dynamicpruningexpression``
    in the scan, pinned in tests/test_plans.py).

    This is the canonical star-schema scale pattern: "facts for the
    weeks the dim filter selects" never touches the other 23
    partitions, no manual date arithmetic required. Spark even infers
    the static twin (weekofyear(event_date) = 2) into
    PartitionFilters alongside the DPP subquery — both pruning modes
    on one scan.
    """
    fact = spark.read.parquet(partitioned_events_path(spark, sf_dir))
    dim = (
        T(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .withColumn("wk", F.weekofyear("d"))
    )
    return (
        fact.join(dim.where(F.col("wk") == 2), fact.event_date == dim.d)
        .groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "format_schema_evolution_merge",
    oracle="""
    WITH unioned AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             CAST(NULL AS VARCHAR) AS o_channel
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             CASE WHEN o_orderkey % 3 = 0 THEN 'web' ELSE 'store' END
      FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price,
           count(o_channel) AS n_with_channel,
           count(*) FILTER (WHERE o_channel = 'web') AS n_web
    FROM unioned
    GROUP BY o_orderstatus
    """,
    tags=("sources", "formats", "schema-evolution"),
)
def format_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: batch 1 of a table is written with
    three columns, batch 2 later gains ``o_channel`` — mergeSchema
    reads both vintages as one relation, old rows carrying NULL for
    the new column.

    This is how every long-lived lakehouse table actually looks:
    columns appear over time and historical files are never
    rewritten. The aggregate exercises the NULL semantics of the
    merged column (count(col) skips the pre-evolution rows) and the
    oracle reconstructs the same union logically, so a reader that
    dropped either vintage or mistyped the widened schema fails the
    hash. At 100 TB, mergeSchema=true costs one footer read per file
    — set the union schema explicitly once known (schema-on-read,
    same as format_json_roundtrip).
    """
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="lakehouse_schevo_")
    o.where(F.col("o_orderkey") % 2 == 0).write.mode("overwrite").parquet(
        f"{path}/batch=1"
    )
    (
        o.where(F.col("o_orderkey") % 2 == 1)
        .withColumn(
            "o_channel",
            F.when(F.col("o_orderkey") % 3 == 0, F.lit("web")).otherwise(
                F.lit("store")
            ),
        )
        .write.mode("overwrite")
        .parquet(f"{path}/batch=2")
    )
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dround(dsum(F.col("o_totalprice")), 2).alias("total_price"),
        F.count("o_channel").alias("n_with_channel"),
        F.count(F.when(F.col("o_channel") == "web", 1)).alias("n_web"),
    )
