"""UDF/UDAF surface (SURVEY.md §2b): Arrow-batched pandas UDFs,
grouped-map applyInPandas, and a custom stateful streaming operator
via applyInPandasWithState.

The hot-path rule: built-ins first (everything in queries_*.py);
Python only where per-group/array-level custom logic genuinely can't
be expressed — and then always Arrow-vectorized, never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT doc_id,
           CAST(round(1.0 / (1.0 + exp(-(CAST(n_chars AS DOUBLE) / 500.0 - 1.0))), 6) AS DOUBLE)
             AS length_score
    FROM documents
    """,
    tags=("udf", "pandas"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches, numpy math): a
    sigmoid length score per document. Oracle-checked — numpy exp and
    SQL exp agree bit-for-bit on the same doubles.

    Scale: Arrow transfer + numpy vectorization ≈ 10-100× faster than
    row-at-a-time Python UDFs; still JVM→Python, so reserve for logic
    built-ins can't express (this one could be — it exists to pin the
    UDF machinery itself).
    """

    @pandas_udf(DoubleType())
    def length_score(n_chars: pd.Series) -> pd.Series:
        import numpy as np

        x = n_chars.astype("float64") / 500.0 - 1.0
        return pd.Series(np.round(1.0 / (1.0 + np.exp(-x)), 6))

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", length_score(F.col("n_chars")).alias("length_score"))


@query(
    "udf_grouped_zscore",
    oracle="""
    WITH stats AS (
      SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sigma, count(*) AS n
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           CAST(round(CASE WHEN s.n > 1 AND s.sigma > 0
                           THEN (e.value - s.mu) / s.sigma ELSE 0.0 END, 4) AS DOUBLE) AS value_z
    FROM events e JOIN stats s ON e.user_id = s.user_id
    """,
    tags=("udf", "pandas", "grouped"),
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user z-score of event values.

    Scale: one shuffle on the group key; each group materializes as a
    pandas frame in a worker (bounded by the largest user — salting
    applies if a user outgrows memory). The oracle recomputes the
    same statistic relationally.
    """
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("value_z", DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf["value"].astype("float64")
        sigma = v.std(ddof=1)
        if len(v) > 1 and sigma > 0:
            z = np.round((v - v.mean()) / sigma, 4)
        else:
            z = pd.Series([0.0] * len(v), index=v.index)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "value_z": z}
        )

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return e.groupBy("user_id").applyInPandas(zscore, schema=schema)


@query("udf_stateful_session_counter", oracle=None, tags=("udf", "streaming", "stateful"))
def udf_stateful_session_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running event counter with a session-style state object,
    drained bounded (AvailableNow).

    This is the escape hatch for operators Spark's built-in stateful
    set (windows/dedup/session_window) can't express — custom state
    schema, custom merge logic, explicit timeout control. Rows-only:
    state internals have no SQL twin; totals are asserted against the
    batch count in tests.
    """
    import uuid

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # ns fixture
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")  # µs fixture
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", "event_id")
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("total_events", LongType()),
            StructField("n_batches", IntegerType()),
        ]
    )
    state_schema = StructType(
        [StructField("count", LongType()), StructField("batches", IntegerType())]
    )

    def count_events(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        count, batches = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            count += len(pdf)
        batches += 1
        state.update((count, batches))
        yield pd.DataFrame(
            {"user_id": [user_id], "total_events": [count], "n_batches": [batches]}
        )

    result = stream.groupBy("user_id").applyInPandasWithState(
        count_events,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per user = final counts
    final = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("total_events").alias("total_events"))
    )
    return final


def _has_protobuf() -> bool:
    """transformWithStateInPandas drives its state-server protocol
    over protobuf; the pip pyspark wheel does not declare it and this
    container cannot install packages. Register the query only where
    the dependency exists (same environment-gate posture as Kafka
    broker connectivity and multimodal codecs)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def udf_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing via transformWithStateInPandas
    (Spark 4's StatefulProcessor API — the successor to
    applyInPandasWithState): per-user ValueState accumulating
    (event count, value sum, max value) across micro-batches.

    vs the old API: typed state handles (Value/List/MapState), timers,
    TTL, and schema evolution of state — this is the operator model
    for production stateful pipelines (RocksDB state store at scale).
    Rows-only when registered; totals are pinned against the batch
    aggregate in tests/test_wave4.py (skipped without protobuf).
    """
    import uuid

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # ns fixture
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")  # µs fixture
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", "value")
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("total_events", LongType()),
            StructField("total_value", DoubleType()),
            StructField("max_value", DoubleType()),
        ]
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("s", DoubleType()),
                        StructField("m", DoubleType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, s, m = (
                self._state.get() if self._state.exists() else (0, 0.0, float("-inf"))
            )
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
                if len(pdf):
                    m = max(m, float(pdf["value"].max()))
            self._state.update((n, s, m))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "total_events": [n],
                    "total_value": [round(s, 2)],
                    "max_value": [m],
                }
            )

        def close(self) -> None:
            pass

    result = stream.groupBy("user_id").transformWithStateInPandas(
        UserTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("total_events").alias("total_events"),
            F.max("total_value").alias("total_value"),
            F.max("max_value").alias("max_value"),
        )
    )


if _has_protobuf():  # environment-gated registration
    query("udf_transform_with_state", oracle=None, tags=("udf", "streaming", "stateful"))(
        udf_transform_with_state
    )


@query(
    "udtf_sentence_explode",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(list_transform(string_split_regex(text, '[.!?]+'), x -> trim(x)),
                         x -> length(x) > 0) AS sents
      FROM documents
    ),
    u AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(sents) + 1),
                                   i -> {'i': i - 1, 'sent': sents[i]})) AS s
      FROM s
    )
    SELECT doc_id,
           CAST(s.i AS INTEGER) AS sent_idx,
           s.sent AS sentence,
           CAST(len(string_split_regex(s.sent, '\s+')) AS INTEGER) AS n_words
    FROM u
    """,
    tags=("udf", "udtf", "text"),
)
def udtf_sentence_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+ user-defined TABLE function) splitting
    each document into sentence rows via LATERAL — the row-expanding
    UDF shape (one input row → N output rows) that scalar/pandas UDFs
    cannot express.

    The splitter deliberately mirrors text_sentence_stats' [.!?]+
    rule so the DuckDB oracle can replay it exactly (strip(' ')
    matches SQL trim semantics). Hash-checked — the only Python UDTF
    in the repo runs under the full oracle gate, not rows-only.

    Scale: UDTFs execute per-partition in a single Python worker pass
    (Arrow-batched rows in, rows out) and compose with LATERAL like
    any generator; output volume is sentence count. For pure
    splitting the codegen path (text_sentence_stats) is cheaper —
    this op exists to cover the API surface where per-row expansion
    logic genuinely needs Python (parsers, tokenizers, decoders).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_words int")
    class SentenceSplit:
        def eval(self, text: str):
            import re

            parts = [p.strip(" ") for p in re.split(r"[.!?]+", text or "")]
            idx = 0
            for p in parts:
                if p:
                    yield idx, p, len(re.split(r"\s+", p))
                    idx += 1

    spark.udtf.register("sentence_split", SentenceSplit)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_words
        FROM documents_udtf d, LATERAL sentence_split(d.text) s
        """
    )
