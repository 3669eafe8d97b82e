"""Round-3 wave P: behavioral bot detection and maximal-marginal-
relevance (MMR) diverse selection."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "events_bot_detection",
    oracle="""
    WITH gaps AS (
      -- floor to whole seconds: the fixture carries fractional
      -- seconds, which Spark's unix_timestamp truncates
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events
    ), stats AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_errors,
             CAST(sum(CAST(gap_s AS DECIMAL(18,6))) AS DOUBLE) AS gap_sum,
             CAST(sum(CAST(gap_s * gap_s AS DECIMAL(28,6))) AS DOUBLE) AS gap_sumsq,
             CAST(count(gap_s) AS BIGINT) AS n_gaps
      FROM gaps GROUP BY user_id
    )
    SELECT user_id, n_events,
           round(CAST(n_errors AS DOUBLE) / n_events, 6) AS error_ratio,
           round(gap_sum / n_gaps, 2) AS mean_gap_s,
           round(sqrt(greatest(gap_sumsq / n_gaps - (gap_sum / n_gaps) * (gap_sum / n_gaps), 0))
                 / (gap_sum / n_gaps), 6) AS gap_cv,
           (n_events >= 10
            AND sqrt(greatest(gap_sumsq / n_gaps - (gap_sum / n_gaps) * (gap_sum / n_gaps), 0))
                / (gap_sum / n_gaps) < 0.3)
             OR CAST(n_errors AS DOUBLE) / n_events > 0.5 AS bot_suspect
    FROM stats WHERE n_gaps >= 3
    """,
    tags=("events", "dq", "anomaly"),
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral bot heuristics per user: inter-event gap statistics
    (mean + coefficient of variation from decimal-exact sum/sumsq),
    error ratio, and a suspect flag for metronome-regular high-volume
    users (CV < 0.3 at ≥10 events — humans are bursty, scripts are
    periodic) or error-spammers — the traffic-quality gate upstream
    of any events-derived training data.

    Scale: one window pass for gaps (shuffle on user), one
    map-combinable moment aggregate; the CV comes from raw moments so
    no second pass. Decimal-cast sums keep both engines bit-equal.
    """
    e = T(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        "event_type",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_s"),
    )
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
        F.sum(F.col("gap_s").cast("decimal(18,6)")).cast("double").alias("gap_sum"),
        F.sum((F.col("gap_s") * F.col("gap_s")).cast("decimal(28,6)"))
        .cast("double")
        .alias("gap_sumsq"),
        F.count("gap_s").cast("bigint").alias("n_gaps"),
    ).where(F.col("n_gaps") >= 3)
    mean_gap = F.col("gap_sum") / F.col("n_gaps")
    cv = (
        F.sqrt(
            F.greatest(
                F.col("gap_sumsq") / F.col("n_gaps") - mean_gap * mean_gap, F.lit(0.0)
            )
        )
        / mean_gap
    )
    err = F.col("n_errors").cast("double") / F.col("n_events")
    return stats.select(
        "user_id",
        "n_events",
        F.round(err, 6).alias("error_ratio"),
        F.round(mean_gap, 2).alias("mean_gap_s"),
        F.round(cv, 6).alias("gap_cv"),
        (((F.col("n_events") >= 10) & (cv < 0.3)) | (err > 0.5)).alias("bot_suspect"),
    )


@query("embedding_mmr_selection", oracle=None, tags=("embedding", "llm", "selection"))
def embedding_mmr_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance selection of 10 exemplars: greedily
    pick the vector maximizing 0.7·relevance − 0.3·max-similarity-to-
    already-selected (relevance = cosine to the corpus centroid) —
    the diverse-subset selector used for training-data curation and
    retrieval reranking (Carbonell & Goldstein). Rows-only gate (the
    greedy argmax chain has selected-set-dependent state that SQL
    can't replay cheaply); exact parity with a numpy reference is
    pinned in tests/test_wave18.py.

    Scale: relevance scoring is one map-side fold over the corpus;
    each greedy round rescans only the CANDIDATE POOL (top-200 by
    relevance — the standard two-stage shape), driver-side on 200
    vectors. At billions of vectors the pool comes from the ANN
    index; the greedy loop cost is unchanged.
    """
    import numpy as np

    e = T(spark, sf_dir, "embeddings")
    flat = e.select(F.posexplode("embedding").alias("pos", "val"))
    cent_rows = (
        flat.groupBy("pos")
        .agg(
            (
                F.sum(F.col("val").cast("double").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
        .orderBy("pos")
        .collect()
    )
    centroid = np.array([r["c"] for r in cent_rows])
    cn = centroid / np.linalg.norm(centroid)
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.lit(cn.tolist()).cast("array<double>"),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding").cast("array<double>"), lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    pool_rows = (
        e.select("vec_id", "embedding", (dot / norm).alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(200)
        .collect()
    )
    ids = [r["vec_id"] for r in pool_rows]
    rel = np.array([r["rel"] for r in pool_rows])
    V = np.array([r["embedding"] for r in pool_rows], dtype=np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    selected: list[int] = []
    out = []
    for rank in range(10):
        if selected:
            maxsim = (V @ V[selected].T).max(axis=1)
        else:
            maxsim = np.zeros(len(ids))
        score = 0.7 * rel - 0.3 * maxsim
        score[selected] = -np.inf
        # deterministic tiebreak: smallest vec_id among max scores
        best = np.lexsort((ids, -score))[0]
        selected.append(int(best))
        out.append(
            (
                rank + 1,
                int(ids[best]),
                round(float(rel[best]), 6),
                round(float(maxsim[best]), 6),
                round(float(score[best]), 6),
            )
        )
    return spark.createDataFrame(
        out, "rank int, vec_id bigint, relevance double, max_sim_selected double, mmr_score double"
    )
