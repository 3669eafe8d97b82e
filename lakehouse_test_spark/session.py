"""SparkSession factory + fixture-table catalog.

The session is configured for deterministic oracle comparison (UTC
timezone) and for scale (AQE on, skew handling on, partition
coalescing on). On a real cluster the same builder is used with a
cluster master; nothing here is local-mode-specific except defaults.

Reference surface covered here (SURVEY.md §2a):
- op 7 (partition expansion): parquet/Delta-style sources map file
  splits to tasks automatically; ``spark.sql.files.maxPartitionBytes``
  is the oversplit knob.
- op 9 (exclusive partition assignment): inherent in Spark's task
  scheduling.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: fixture tables written by the driver (TESTDATA.md); bare names are
#: also the DuckDB oracle view names.
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _default_local_dir(master: str) -> str | None:
    """Shuffle/spill scratch dir (guide §2.1: shuffle files live on
    the node's LOCAL disks), or None to keep Spark's default.

    SPARK_GRAFT_LOCAL_DIR always wins ("none" keeps Spark's default).
    Without it, RAM-backed /dev/shm is used ONLY for local[...]
    masters: a single-box sandbox run's shuffle volume is bounded by
    the fixture size and tmpfs saves ~0.12 s per exchange at sf0.1.
    On a cluster master the default must stay Spark's: shuffle SPILL
    happens exactly under memory pressure, so defaulting spill into a
    RAM-backed tmpfs at 100 TB is an OOM/ENOSPC machine — production
    points SPARK_GRAFT_LOCAL_DIR (or the cluster manager's
    SPARK_LOCAL_DIRS) at the instance NVMe instead.
    """
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is not None:
        return local_dir
    if master.startswith("local") and os.path.isdir("/dev/shm"):
        return "/dev/shm/spark-local"
    return None


def get_spark(
    app_name: str = "lakehouse_test_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Scale notes: AQE re-plans joins at runtime (broadcast conversion,
    skew-split), partition coalescing keeps small shuffles from
    producing thousands of empty tasks, and the 64 MB advisory size
    targets healthy reduce-partition sizes at any SF.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32

    local_dir = _default_local_dir(master)
    if local_dir and local_dir.lower() != "none":
        os.makedirs(local_dir, exist_ok=True)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # determinism for the DuckDB oracle comparison
        .config("spark.sql.session.timeZone", "UTC")
        # the driver fixtures carry TIMESTAMP(NANOS) (events.ts);
        # Spark has no ns timestamp, so read as long and convert in
        # load_tables().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # scale: adaptive execution end-to-end
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # the driver fixtures are ONE parquet file per table; at the
        # 128m default a whole table scans as a single task. 16m keeps
        # scans parallel across local cores (row groups split fine).
        # On a real cluster with many files per table, raise this back
        # toward 128m-256m to keep task counts sane (see SCALE.md).
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # Arrow for every pandas_udf / toPandas boundary
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource zone-map pruning (lakehouse_datasource
        # consumes pushed filters to skip files via commit-log stats)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # joins: let the planner pick shuffled-hash join when one
        # side is provably much smaller per partition (guide §3.1/§9)
        # — skips the per-partition sort SMJ pays. SMJ remains the
        # plan whenever the size guards don't hold (big-big joins,
        # bucketed layouts), so the spill-safe path is untouched.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # columnar storage for our own sinks
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if local_dir and local_dir.lower() != "none":
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing ns-timestamps to Spark µs.

    ``events.ts`` is TIMESTAMP(NANOS) in the driver parquet; with
    ``nanosAsLong`` it surfaces as a bigint of epoch-nanos which we
    convert (truncating) to TimestampType. All oracle queries bucket
    time at >= 1 s granularity so the truncation is invisible to the
    correctness gate.

    Defensive conf: the driver may hand us a session built without
    our factory — ``nanosAsLong`` is required to read events at all,
    and UTC keeps date bucketing aligned with the DuckDB oracle.
    Both are runtime-settable SQL confs.
    """
    # cache hit first: the conf writes below are 5 JVM RPC roundtrips
    # per call, and query construction calls load_table once per
    # referenced table — a 6-table join paid ~30 RPCs per build for
    # confs that only matter when the parquet is actually (re-)read.
    cached = _TABLE_CACHE.get((os.path.abspath(sf_dir), name))
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the driver fixtures write events.ts as TIMESTAMP(MICROS,
    # isAdjustedToUTC=false); Spark 4 infers that as TIMESTAMP_NTZ by
    # default, which breaks epoch casts/watermarks and diverges from
    # DuckDB's (naive-as-UTC) reading. Read it as instant-typed
    # TimestampType instead — identical values under the UTC session.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # self-tuning parallelism on foreign sessions: AQE coalesces the
    # (often default-200) static shuffle partition count to data size
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) fixture vintage
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":  # defensive: inference raced the conf
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: (abspath(sf_dir), table) -> persisted, core-aligned DataFrame
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def pin_fixture_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Persist the fixture tables core-aligned for steady-state runs.

    The driver fixtures are ONE parquet file with ONE row group per
    table, which Spark cannot split — every cold scan is a single
    task no matter how many cores exist, so a benchmark against them
    measures single-threaded parquet decode, not the engine. A real
    table at any serious scale has thousands of row groups and scans
    fully parallel. Pinning repartitions each table across the cores
    once and persists it (MEMORY_AND_DISK), giving every subsequent
    ``load_table`` the parallelism the production layout provides for
    free. Used by bench.py's warmup (disclosed in its output via
    ``"pinned": true``); the correctness gate does NOT pin, so oracle
    comparisons run the same cold path the driver runs.
    """
    par = spark.sparkContext.defaultParallelism
    for name in tables or TABLE_NAMES:
        key = (os.path.abspath(sf_dir), name)
        if key in _TABLE_CACHE:
            continue
        base = load_table(spark, sf_dir, name)
        # partition count derives from DATA SIZE, capped at the core
        # count — never a core-count constant (guide §2: a partition
        # layout tuned to the cluster width over-splits small inputs;
        # 25-row dims were paying 32 task launches per scan, and more
        # cores made the sf0.1 bench SLOWER). ~50k rows per task keeps
        # codegen'd scans amortized; CPU-dense per-row consumers
        # (shingling, simhash) re-spread themselves — they already
        # guard with a repartition-if-narrower check. At sf≥1 every
        # big table hits the core cap, so cluster behavior is
        # unchanged.
        rows = base.count()
        # text/vector tables carry orders more CPU per row (regex,
        # shingling, array math) than the relational tables — size
        # their tasks by per-row work, not bytes (measured sweet spot
        # ~600 docs/task for the text battery at sf0.1; still capped
        # at the core count, so nothing changes at sf≥1).
        # events is CPU-dense too: its consumers parse JSON per row
        # (get_json_object), which r11's 50k-rows/task starved at
        # sf0.1 (events pinned at 2 partitions → json_agg_by_prop
        # −63% in the r11 driver bench). Measured r12 sweep at sf0.1:
        # json_agg_by_prop 0.27 s at 2 parts → 0.14 s at 16, flat to
        # 32; join_asof flat 2→16 and worse at 32 — so ~6k rows/task
        # (17 parts at sf0.1). Relational tables stay at 50k/task:
        # widening lineitem/orders was re-measured (12→16/24/32) and
        # made the interleaved bench WORSE on every layout tried
        # (sweep in OPTIMIZATION_r12.md) — their per-row work is
        # codegen'd column math, already amortized.
        if name in ("documents", "embeddings"):
            per_task = 600
        elif name == "events":
            per_task = 6_000
        else:
            per_task = 50_000
        parts = max(1, min(par, -(-rows // per_task)))
        df = base.repartition(parts).persist()
        df.count()
        _TABLE_CACHE[key] = df


#: caches created INSIDE a query's plan (e.g. dedup_minhash_lsh's
#: shingle frame, shared by its signature and verify paths). They are
#: legitimate within one execution, but Spark's CacheManager would
#: also serve them to the NEXT execution of the same query — which
#: turns a best-of-N benchmark into a partially-cached measurement.
#: bench.py releases them between timed passes (guide §1: time the
#: full pipeline, not a cache hit); production pipelines that run a
#: query once are unaffected.
_QUERY_CACHES: list[DataFrame] = []


def register_query_cache(df: DataFrame) -> DataFrame:
    """Track a query-local cached frame for release_query_caches()."""
    _QUERY_CACHES.append(df)
    return df


def release_query_caches() -> None:
    """Unpersist every registered query-local cache (bench hygiene —
    the next execution recomputes the full pipeline)."""
    for df in _QUERY_CACHES:
        try:
            df.unpersist()
        except Exception:
            pass
    _QUERY_CACHES.clear()


def unpin_fixture_tables() -> None:
    """Release every pinned fixture table (test hygiene)."""
    for df in _TABLE_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _TABLE_CACHE.clear()


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load all fixture tables as DataFrames keyed by bare name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for spark.sql)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
