"""Round-3 wave S: multi-dimensional clustering under the value gate,
robust dispersion statistics, and deterministic per-group reservoirs.

- ``lakehouse_zorder_pruning`` puts the OPTIMIZE ZORDER path under the
  hash gate: the table is rewritten clustered on the Morton key of
  (o_custkey, o_orderkey) and then range-scanned through zone-map file
  skipping on the SECOND dimension — the one a lead-column sort could
  never prune. The aggregate must match DuckDB running the same
  logical filter on the raw parquet, so a clustering bug that drops,
  duplicates, or mis-stats rows fails on values, not just on a plan
  assertion (tests/test_lakehouse.py pins the files-skipped side).
- ``stats_mad_outliers`` is the robust-statistics complement to the
  mean/stddev z-score battery: median absolute deviation per group,
  with the standard 1.4826 consistency constant, flagging |x - med| >
  3·1.4826·MAD. Median parity with DuckDB ``quantile_cont`` is the
  same contract agg_percentiles already pins.
- ``sample_reservoir_per_group`` is fixed-k-per-group sampling the way
  a 100 TB pipeline must do it: rank by a cryptographic hash of the
  key and keep the k smallest — a uniform, REPRODUCIBLE reservoir
  (stable across retries, partitionings, and engines), unlike
  ``rand()``-based reservoirs that cannot be audited after the fact.

Reference parity: the reference has no clustering/statistics surface;
these extend the lakehouse maintenance ops (SURVEY.md §2b) the way
Delta's OPTIMIZE ZORDER extends its commit protocol.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dround, dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "lakehouse_zorder_pruning",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderkey BETWEEN 100 AND 1200
    GROUP BY o_orderstatus
    """,
    tags=("lakehouse", "zorder", "pruning"),
)
def lakehouse_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER round trip under the oracle gate: ingest orders
    in two commits, recluster on the interleaved-bit key of
    (o_custkey, o_orderkey), then range-scan o_orderkey — the
    *non-lead* z dimension — through zone-map file skipping and
    aggregate the survivors. The oracle computes the same rollup on
    the raw parquet, so a hash match proves the rewrite is lossless
    and the zone maps are row-exact.

    Scale: a single-column sort prunes one dimension; the Z-curve
    keeps every listed dimension axis-aligned-compact per file, so a
    100 TB table answers selective scans on ANY clustered column by
    opening O(band) files. The rewrite itself is one bounds agg + one
    exact-percentile cut + one hash shuffle (plans/lakehouse.py:571).
    """
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_zorder_"))
    t.append(o.where(F.col("o_orderkey") % 2 == 0).repartition(2))
    t.append(o.where(F.col("o_orderkey") % 2 == 1).repartition(2))
    t.zorder(["o_custkey", "o_orderkey"], target_partitions=8)
    df, _scanned, _total = t.scan_pruned("o_orderkey", 100, 1200)
    out = df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dround(dsum(F.col("o_totalprice")), 2).alias("total_price"),
    )
    return out.localCheckpoint()


@query(
    "stats_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority, median(o_totalprice) AS med_price
      FROM orders GROUP BY o_orderpriority
    ),
    dev AS (
      SELECT o.o_orderpriority, o.o_totalprice,
             abs(o.o_totalprice - m.med_price) AS adev, m.med_price
      FROM orders o JOIN med m USING (o_orderpriority)
    ),
    mad AS (
      SELECT o_orderpriority, median(adev) AS mad_raw
      FROM dev GROUP BY o_orderpriority
    )
    SELECT d.o_orderpriority,
           count(*) AS n_orders,
           CAST(round(any_value(d.med_price), 4) AS DOUBLE) AS med_price,
           CAST(round(any_value(m.mad_raw) * 1.4826, 4) AS DOUBLE) AS mad_scaled,
           sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad_raw THEN 1 ELSE 0 END)
             AS n_outliers
    FROM dev d JOIN mad m USING (o_orderpriority)
    GROUP BY d.o_orderpriority
    """,
    tags=("stats", "robust", "outliers"),
)
def stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: per
    priority class, med = median(price), MAD = median(|price - med|),
    outlier iff |price - med| > 3·1.4826·MAD (1.4826 makes MAD a
    consistent σ estimator under normality). Unlike the mean/stddev
    z-score (events_anomaly_zscore), a few extreme rows cannot drag
    the threshold — the 50% breakdown point is why curation pipelines
    gate on MAD.

    Scale: two exact-percentile aggregates over bounded groups plus a
    broadcast join of the 5-row statistics back to the fact — the
    fact table never shuffles. At 100 TB swap the exact medians for
    ``approx_percentile`` (same shape, mergeable sketch).
    """
    o = T(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    med = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("med_price")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").withColumn(
        "adev", F.abs(F.col("o_totalprice") - F.col("med_price"))
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_raw")
    )
    out = (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.any_value("med_price"), 4).cast("double").alias("med_price"),
            F.round(F.any_value("mad_raw") * 1.4826, 4)
            .cast("double")
            .alias("mad_scaled"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad_raw"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )
    return out


@query(
    "sample_reservoir_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, rk
    FROM (
      SELECT o_orderpriority, o_orderkey,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
             ) AS rk
      FROM orders
    )
    WHERE rk <= 5
    """,
    tags=("sample", "reservoir"),
)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k reservoir per group: rank rows by the md5
    of their key and keep the 5 smallest per priority class. Hashing
    is a uniform order statistic, so this IS a uniform k-sample — but
    unlike ``rand()`` reservoirs it is reproducible across retries,
    partitionings, and engines (hash-checked against DuckDB computing
    the identical ranks), which is what makes a 100 TB training-data
    sample auditable after the fact.

    Scale: one shuffle on the group key with ``WindowGroupLimit``
    pushing the top-k partially below the exchange — each map task
    forwards at most k rows per group it sees, so shuffle volume is
    O(groups·k·partitions), not O(rows).
    """
    o = T(spark, sf_dir, "orders").select("o_orderpriority", "o_orderkey")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("o_orderpriority", "o_orderkey", "rk")
    )
