"""Writers — the reference's producer knobs mapped to columnar sinks
(SURVEY.md §2a ops 10-16).

| reference knob                                   | here |
|--------------------------------------------------|------|
| batching (op 14, enableBatching)                 | parquet row groups / files-per-partition |
| compression (op 15, -z CompressionType)          | ``compression=`` codec |
| multi-topic fan-out (op 12, prefix{sep}{i})      | ``fanout_write`` shard column + partitionBy |
| producer replication (op 13, producers×topics)   | ``repartition(n)`` parallelism |
| backpressure / at-least-once (ops 16, 25)        | Spark's batch-synchronous commit protocol |
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_table(
    df: DataFrame,
    path: str,
    compression: str = "zstd",
    partition_cols: list[str] | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Plain columnar write with compression + file-count control.

    Scale: ``num_files`` caps output files via repartition (small-file
    avoidance); ``partition_cols`` gives partition pruning to readers.
    """
    out = df.repartition(num_files) if num_files else df
    writer = out.write.mode(mode).option("compression", compression)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def fanout_write(
    df: DataFrame,
    path: str,
    num_shards: int,
    key_col: str,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Multi-topic fan-out (op 12): one logical stream split into
    ``num_shards`` co-writable shards by hashing the message key —
    the `prefix{sep}{i}` topic expansion as a partitioned layout.

    Scale: shard = pmod(hash(key), n) balances skewed keys; readers
    of one shard prune all others (partition pruning).
    """
    (
        df.withColumn("shard", F.pmod(F.hash(F.col(key_col)), F.lit(num_shards)))
        .write.mode(mode)
        .option("compression", compression)
        .partitionBy("shard")
        .parquet(path)
    )
