"""Round-12 optimization parity pins.

Every rewrite in an optimization round must keep the declared query's
results identical; these tests pin each r12 rewrite against the exact
expression form it replaced, over the full sf0.001 fixture corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dround, dsum
from lakehouse_test_spark.queries_scalar import events_daily_rollup
from lakehouse_test_spark.session import load_table


def test_events_daily_rollup_two_level_parity(spark, sf_dir):
    """Equivalence proof for the r12 two-level-agg experiment
    (VERDICT r11 item 6, disproved): a manual
    pre-aggregate-by-(day,type,user)-then-roll-up form is
    bit-identical to the query's countDistinct form — counts of
    per-user counts == count(*), count of pre-agg rows ==
    countDistinct(user_id), re-summed per-user decimal sums == the
    direct decimal sum. Spark 4 already PLANS the countDistinct this
    way (no Expand), so the query keeps the declarative form; this
    test pins that the two shapes cannot drift apart."""
    e = load_table(spark, sf_dir, "events")
    pre = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "event_type",
        "user_id",
    ).agg(F.count(F.lit(1)).alias("c"), dsum(F.col("value")).alias("v"))
    two_level = pre.groupBy("day", "event_type").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("n_users"),
        dround(F.sum("v"), 2).alias("total_value"),
    )
    declared = events_daily_rollup(spark, sf_dir)
    assert [(f.name, f.dataType) for f in two_level.schema.fields] == [
        (f.name, f.dataType) for f in declared.schema.fields
    ]
    rows_two_level = sorted(map(tuple, two_level.collect()))
    rows_declared = sorted(map(tuple, declared.collect()))
    assert rows_two_level == rows_declared


def test_lakehouse_gate_dir_swept_immediately(spark, sf_dir):
    """_drain_to_lakehouse must not accumulate gate-table snapshots on
    /dev/shm across drains: the returned frame is detached
    (localCheckpoint) and the gate dir is removed before the drain
    returns — and the detached result must still equal the batch
    twin."""
    import glob

    from lakehouse_test_spark.queries_scalar import events_daily_rollup
    from lakehouse_test_spark.streaming.jobs import streaming_tumbling_counts

    before = set(glob.glob("/dev/shm/lh_stream_gate_*"))
    out = streaming_tumbling_counts(spark, sf_dir)
    after = set(glob.glob("/dev/shm/lh_stream_gate_*"))
    assert after - before == set(), "gate dir leaked past the drain"
    # frame still readable after its files are gone, and correct
    got = sorted(map(tuple, out.select("day", "event_type", "n_events", "total_value").collect()))
    want = sorted(
        map(
            tuple,
            events_daily_rollup(spark, sf_dir)
            .select("day", "event_type", "n_events", "total_value")
            .collect(),
        )
    )
    assert got == want


def test_json_agg_single_key_probe_kept_over_from_json(spark):
    """Documented counterexamples for the deferred get_json_object →
    from_json switch: (1) a QUOTED number ``{"k": "7"}`` is a value
    divergence — the string probe casts it to 7 exactly like the
    oracle's ``CAST(json_extract_string(...) AS INTEGER)``, while
    ``from_json(props,'k int')`` refuses the string field and yields
    NULL; (2) under Spark 4's ANSI mode a non-numeric k RAISES
    (CAST_INVALID_INPUT) through the string probe — again matching
    the oracle's cast — where from_json silently NULLs. Both keep the
    oracle-matching form in json_agg_by_prop (the measured from_json
    gain was ~0.02 s, inside noise)."""
    ok = spark.createDataFrame(
        [('{"k": 5}',), ('{"k": null}',), ("{}",), (None,)],
        "props string",
    )
    a = F.get_json_object("props", "$.k").cast("int")
    b = F.from_json("props", "k int").getField("k")
    got = ok.select(a.alias("gjo"), b.alias("fj")).collect()
    assert all(r.gjo == r.fj for r in got)

    # VALUE divergence: a quoted number parses via the string probe
    # (cast "7" -> 7, like the oracle's json_extract_string) but
    # from_json's typed field refuses the string and yields NULL
    quoted = spark.createDataFrame([('{"k": "7"}',)], "props string")
    assert quoted.select(a.alias("gjo")).collect()[0].gjo == 7
    assert quoted.select(b.alias("fj")).collect()[0].fj is None

    bad = spark.createDataFrame([('{"k": "abc"}',)], "props string")
    # from_json: silent NULL
    assert bad.select(b.alias("fj")).collect()[0].fj is None
    # get_json_object + ANSI cast: loud failure, like the oracle
    with pytest.raises(Exception, match="CAST_INVALID_INPUT"):
        bad.select(a.alias("gjo")).collect()
