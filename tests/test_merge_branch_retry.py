"""merge_branch crash-retry: a crash between linking a branch commit
into main and unlinking the branch copy must not DUPLICATE the commit
on retry (r6 ADVICE)."""
from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from lakehouse_test_spark.plans.lakehouse import LakehouseTable


def _t(spark, tmp_path, name="t"):
    return LakehouseTable(spark, str(tmp_path / name))


def _simulate_partial_ff_crash(t, branch):
    """Link the FIRST branch commit into main (what the crashed
    attempt did) but leave the branch copy in place."""
    p = sorted(t._branch_dir(branch).glob("*.json"))[0]
    os.link(p, t._commit_path(int(p.stem)))


def test_merge_branch_retry_after_partial_fastforward(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.append(spark.range(4).select(F.col("id").alias("v")))
    t.create_branch("wap")
    t.branch_append("wap", spark.range(10, 13).select(F.col("id").alias("v")))
    t.branch_append("wap", spark.range(20, 22).select(F.col("id").alias("v")))
    _simulate_partial_ff_crash(t, "wap")
    # retry merges WITHOUT replaying the already-linked commit
    t.merge_branch("wap")
    snap = t.snapshot()
    assert snap.count() == 4 + 3 + 2  # no duplicates
    vals = sorted(r["v"] for r in snap.collect())
    assert vals == [0, 1, 2, 3, 10, 11, 12, 20, 21]
    # versions are a gap-free chain
    versions = [c.version for c in t.history()]
    assert versions == list(range(len(versions)))


def test_merge_branch_retry_after_main_advanced(spark, tmp_path):
    """Crash left one branch commit in main; main then advanced with
    an unrelated append — the rebase path must skip the merged commit
    and replay only the rest."""
    t = _t(spark, tmp_path)
    t.append(spark.range(4).select(F.col("id").alias("v")))
    t.create_branch("wap")
    t.branch_append("wap", spark.range(10, 13).select(F.col("id").alias("v")))
    t.branch_append("wap", spark.range(20, 22).select(F.col("id").alias("v")))
    _simulate_partial_ff_crash(t, "wap")
    t.append(spark.range(30, 31).select(F.col("id").alias("v")))  # main moves
    t.merge_branch("wap")
    snap = t.snapshot()
    assert snap.count() == 4 + 3 + 2 + 1
    vals = sorted(r["v"] for r in snap.collect())
    assert vals == [0, 1, 2, 3, 10, 11, 12, 20, 21, 30]
