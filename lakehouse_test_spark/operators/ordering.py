"""Scalable global ordering primitives.

A bare ``row_number() OVER (ORDER BY ...)`` (no PARTITION BY) plans an
``Exchange SinglePartition`` — Spark funnels the ENTIRE dataset through
one task, the canonical 100 TB scale-killer. The hierarchical
assignment here produces bit-identical positions with no
single-partition stage:

1. range-shuffle the rows on the sort keys (``repartitionByRange``
   keeps key ranges disjoint and assigns ascending ranges to ascending
   partition ids), sort within each partition;
2. tag each row with ``monotonically_increasing_id()`` — consecutive
   per partition in produced (= sorted) order;
3. a TINY per-partition aggregate (one row per shuffle partition)
   yields each partition's row count and min id; cumulative counts in
   partition-id order are the bucket offsets;
4. global position = bucket offset + (id - partition min id) + 1,
   attached by a broadcast join.

Cost: one range shuffle of the data + one partial-aggregated count
shuffle of P rows. Nothing single-partition, nothing driver-sized
(the collected offsets table is bounded by ``spark.sql.shuffle
.partitions``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MID = "__gr_mid"
_PID = "__gr_pid"
_OFF = "__gr_off"
_BASE = "__gr_base"


def global_row_number(
    df: DataFrame,
    keys: Sequence[str | Column],
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``row_number() OVER (ORDER BY *keys)`` without a
    single-partition window.

    ``keys`` MUST be a total order (include a unique tiebreaker such
    as the row's primary key): ties across a range boundary would
    otherwise make partition placement — and hence positions —
    nondeterministic. The output column is LONG (cast as needed).
    """
    part = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else df.repartitionByRange(*keys)
    ).sortWithinPartitions(*keys)
    tagged = part.withColumn(_MID, F.monotonically_increasing_id()).withColumn(
        _PID, F.spark_partition_id()
    )
    # one row per shuffle partition — bounded by construction
    per = (
        tagged.groupBy(_PID)
        .agg(F.min(_MID).alias(_BASE), F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    per.sort(key=lambda r: r[_PID])
    offsets, acc = [], 0
    for r in per:
        offsets.append((r[_PID], r[_BASE], acc))
        acc += r["__n"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offsets, f"{_PID} INT, {_BASE} BIGINT, {_OFF} BIGINT"
    )
    return (
        tagged.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, F.col(_OFF) + (F.col(_MID) - F.col(_BASE)) + F.lit(1))
        .drop(_PID, _MID, _BASE, _OFF)
    )


def block_row_number(df: DataFrame, out_col: str) -> tuple[DataFrame, int]:
    """Unique 1-based row numbers in the frame's EXISTING partition
    layout — NO shuffle, no sort, no single-partition stage. Numbers
    are dense and unique but their assignment order follows partition
    placement (use :func:`global_row_number` when the order must
    match a sort). This is the identity-column/id-backfill primitive:
    cost is one tiny per-partition count aggregate (P rows) plus a
    broadcast join, nothing data-sized.

    Returns ``(df_with_out_col, total_row_count)`` — callers that
    need the count (identity high-water bookkeeping) get it for free
    from the offsets pass instead of a second full scan.
    """
    tagged = df.withColumn(_MID, F.monotonically_increasing_id()).withColumn(
        _PID, F.spark_partition_id()
    )
    per = (
        tagged.groupBy(_PID)
        .agg(F.min(_MID).alias(_BASE), F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    per.sort(key=lambda r: r[_PID])
    offsets, acc = [], 0
    for r in per:
        offsets.append((r[_PID], r[_BASE], acc))
        acc += r["__n"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offsets or [(0, 0, 0)], f"{_PID} INT, {_BASE} BIGINT, {_OFF} BIGINT"
    )
    out = (
        tagged.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, F.col(_OFF) + (F.col(_MID) - F.col(_BASE)) + F.lit(1))
        .drop(_PID, _MID, _BASE, _OFF)
    )
    return out, acc


def global_cumsum(
    df: DataFrame,
    keys: Sequence[str | Column],
    val_cols: str | Sequence[str],
    out_cols: str | Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact INCLUSIVE running sum(s) of ``val_cols`` over the total
    order ``keys`` — ``sum(val) OVER (ORDER BY *keys ROWS UNBOUNDED
    PRECEDING)`` without the Exchange SinglePartition that the bare
    global window plans. Several value columns share ONE range
    shuffle (pass lists).

    Same contract as :func:`global_row_number`: ``keys`` must be a
    total order (include a unique tiebreaker). Shape: one range
    shuffle on the keys, a TINY per-partition sum (P rows, collected)
    whose running total in partition-id order gives each partition's
    exclusive OFFSET, then a pid-partitioned window (every partition
    advances in parallel) adds offset + within-partition cumsum.
    """
    vals = [val_cols] if isinstance(val_cols, str) else list(val_cols)
    outs = [out_cols] if isinstance(out_cols, str) else list(out_cols)
    assert len(vals) == len(outs)
    part = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else df.repartitionByRange(*keys)
    ).sortWithinPartitions(*keys)
    tagged = part.withColumn(_PID, F.spark_partition_id())
    psum = tagged.groupBy(_PID).agg(
        *[F.sum(v).alias(f"__s{i}") for i, v in enumerate(vals)]
    )
    per = psum.collect()
    per.sort(key=lambda r: r[_PID])
    offsets, acc = [], [None] * len(vals)
    for r in per:
        offsets.append((r[_PID], *acc))
        # an all-NULL partition sums to None: it contributes NOTHING
        # to later offsets (never poisons the chain with None + x),
        # while a leading None stays None (SQL: sum over an all-null
        # prefix is NULL, handled at use below)
        acc = [
            a if r[f"__s{i}"] is None
            else (r[f"__s{i}"] if a is None else a + r[f"__s{i}"])
            for i, a in enumerate(acc)
        ]
    spark = df.sparkSession
    # offset dtypes follow the sum dtypes (decimal sums stay exact)
    dts = dict(psum.dtypes)
    off_schema = f"{_PID} INT, " + ", ".join(
        f"{_OFF}{i} {dts[f'__s{i}']}" for i in range(len(vals))
    )
    off_df = spark.createDataFrame(offsets, off_schema)
    from pyspark.sql import Window as _W

    w = (
        _W.partitionBy(_PID)
        .orderBy(*keys)
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    out = tagged.join(F.broadcast(off_df), _PID)
    for i, (v, o) in enumerate(zip(vals, outs)):
        off = F.col(f"{_OFF}{i}")
        within = F.sum(v).over(w)
        zero = F.lit(0).cast(dts[f"__s{i}"])
        # SQL running-sum NULL semantics: NULL only while EVERY value
        # so far (prior partitions + this prefix) is NULL; otherwise
        # nulls on either side contribute zero
        out = out.withColumn(
            o,
            F.when(off.isNull() & within.isNull(), F.lit(None)).otherwise(
                F.coalesce(off, zero) + F.coalesce(within, zero)
            ),
        )
    return out.drop(_PID, *[f"{_OFF}{i}" for i in range(len(vals))])


def ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """Closed-form ``ntile(n)`` bucket for a known exact global
    ``rank`` (1-based) out of ``total`` rows — lets a hierarchical
    rank replace the global-window ntile. Matches SQL ntile exactly:
    the first ``total % n`` buckets get ``ceil(total/n)`` rows, the
    rest ``floor(total/n)``."""
    q = F.floor(total / n)
    rem = total % n
    big = q + 1
    head = rem * big  # rows living in the oversized buckets
    return F.when(
        rank <= head, F.floor((rank - 1) / big) + 1
    ).otherwise(
        # q = 0 implies every row is in the head branch; greatest()
        # only guards the never-taken division against ANSI div-0
        rem + F.floor((rank - head - 1) / F.greatest(q, F.lit(1))) + 1
    )
