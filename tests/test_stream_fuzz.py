"""End-to-end stream fuzz (round 9 stretch).

Bounded property test: seeded-random commit scripts (appends, DV
deletes, restates, compactions — restates/compactions only in the
BACKLOG, where the snapshot seed must tolerate them) are driven
through REAL streams (real triggers, real checkpoints, restarts
between stages) and the drained feed is multiset-compared against the
native ``read_changes_cdf`` reconstruction. The r6 CDF-type bug and
the r8 chunked-seed duplicates are exactly the class this catches:
both shipped green past hand-driven offset tests and fell to the
first real-engine drain.
"""
from __future__ import annotations

import random
import tempfile

from pyspark.sql import functions as F

from lakehouse_test_spark.plans.lakehouse import LakehouseTable
from lakehouse_test_spark.sources.cdf_datasource import register as register_cdf


def _rows(collected):
    return sorted(
        (r["k"], r["_change_type"], r["_commit_version"]) for r in collected
    )


def _apply_op(spark, t, rng, op, lo):
    """One random commit; returns the next unused key floor."""
    if op == "append":
        n = rng.randint(1, 6)
        df = spark.range(lo, lo + n).select(F.col("id").alias("k"))
        # sometimes a WIDE commit (n files) — exercises the file cap's
        # mid-commit offsets; sometimes a single file
        t.append(df.repartition(n) if rng.random() < 0.4 else df.coalesce(1))
        return lo + n
    if op == "dv":
        t.delete_where_dv(f"k % 7 = {rng.randint(0, 6)}")
        return lo
    if op == "restate":
        t.delete_where(f"k % 5 = {rng.randint(0, 4)}")
        return lo
    t.compact(target_partitions=rng.randint(1, 2))
    return lo


def _drain_available_now(spark, path, ck, out, cap):
    r = (
        spark.readStream.format("lakehouse_cdf")
        .option("path", path)
        .option("startingMode", "snapshot")
    )
    for k, v in (cap or {}).items():
        r = r.option(k, str(v))
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_fuzz_snapshot_seed_exactly_once(spark, tmp_path):
    """5 seeded scripts × {backlog with restates/DVs/compactions} ×
    {uncapped, version-capped, file-capped, both} × a restart between two drain stages: the
    final sink multiset equals seed-at-seedv + changes-after-seedv."""
    register_cdf(spark)
    for seed in range(5):
        rng = random.Random(seed * 7919 + 13)
        t = LakehouseTable(
            spark, str(tmp_path / f"fuzz{seed}" / "t")
        )
        lo = 0
        lo = _apply_op(spark, t, rng, "append", lo)  # v0 is an append
        # backlog: anything goes (seed must tolerate restates)
        for _ in range(rng.randint(2, 4)):
            op = rng.choice(["append", "append", "dv", "restate", "compact"])
            lo = _apply_op(spark, t, rng, op, lo)
        if t.snapshot().count() == 0:
            lo = _apply_op(spark, t, rng, "append", lo)
        work = tempfile.mkdtemp(prefix=f"fuzz_ck_{seed}_")
        ck, out = f"{work}/ck", f"{work}/out"
        cap = rng.choice(
            [
                None,
                {"maxVersionsPerTrigger": rng.randint(1, 2)},
                {"maxFilesPerTrigger": rng.randint(2, 3)},
                {
                    "maxVersionsPerTrigger": 2,
                    "maxFilesPerTrigger": rng.randint(2, 4),
                },
            ]
        )
        _drain_available_now(spark, str(t.path), ck, out, cap)
        seedv = t.latest_version()
        # post-seed tail: only CDF-expressible ops (appends + DVs +
        # compactions; a restate would raise, by contract)
        for _ in range(rng.randint(1, 3)):
            op = rng.choice(["append", "append", "dv", "compact"])
            lo = _apply_op(spark, t, rng, op, lo)
        # restart (same checkpoint) — possibly several capped runs
        for _ in range(16 if cap else 2):
            _drain_available_now(spark, str(t.path), ck, out, cap)
        got = _rows(spark.read.parquet(out).collect())
        want = _rows(
            t.read_changes_cdf(-1, upto_version=seedv)
            .unionByName(t.read_changes_cdf(seedv))
            .collect()
        )
        assert got == want, (
            f"seed {seed} (cap={cap}, seedv={seedv}): stream feed "
            f"diverged from native CDF\n got={got}\nwant={want}"
        )


def test_stream_fuzz_processing_time_live_ops(spark, tmp_path):
    """processingTime variant (the r8 bug's trigger family): 3 seeded
    scripts run a REAL continuous stream while appends/DVs/compactions
    land mid-stream, under a random cap — the drained feed must equal
    seed-at-seedv + changes-after-seedv exactly once."""
    import json
    import time
    from pathlib import Path

    register_cdf(spark)

    def _offsets(ck):
        out = []
        for f in sorted(
            Path(ck, "offsets").glob("[0-9]*"), key=lambda p: int(p.name)
        ):
            try:
                o = json.loads(f.read_text().splitlines()[-1])
                if isinstance(o, str):
                    o = json.loads(o)
                out.append(o)
            except (json.JSONDecodeError, IndexError):
                continue
        return out

    for seed in (101, 202, 303):
        rng = random.Random(seed)
        t = LakehouseTable(spark, str(tmp_path / f"ptfuzz{seed}" / "t"))
        lo = _apply_op(spark, t, rng, "append", 0)
        for _ in range(rng.randint(1, 3)):
            lo = _apply_op(
                spark, t, rng, rng.choice(["append", "dv", "restate"]), lo
            )
        if t.snapshot().count() == 0:
            lo = _apply_op(spark, t, rng, "append", lo)
        work = tempfile.mkdtemp(prefix=f"ptfuzz_{seed}_")
        ck, out = f"{work}/ck", f"{work}/out"
        cap = rng.choice(
            [None, {"maxVersionsPerTrigger": 2}, {"maxFilesPerTrigger": 3}]
        )
        r = (
            spark.readStream.format("lakehouse_cdf")
            .option("path", str(t.path))
            .option("startingMode", "snapshot")
        )
        for k, v in (cap or {}).items():
            r = r.option(k, str(v))
        q = (
            r.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            t0 = time.time()
            while not _offsets(ck) and time.time() - t0 < 60:
                time.sleep(0.2)
            seedv = _offsets(ck)[0]["version"]
            for _ in range(rng.randint(2, 4)):  # live ops mid-stream
                lo = _apply_op(
                    spark, t, rng, rng.choice(["append", "append", "dv", "compact"]), lo
                )
                time.sleep(0.2)
            head = t.latest_version()
            t0 = time.time()
            while time.time() - t0 < 90:
                offs = _offsets(ck)
                done = Path(ck, "commits")
                n_commits = (
                    len(list(done.glob("[0-9]*"))) if done.exists() else 0
                )
                if (
                    offs
                    and offs[-1].get("version", -1) >= head
                    and "files" not in offs[-1]
                    and n_commits >= len(offs)
                ):
                    break
                time.sleep(0.3)
        finally:
            q.stop()
            q.awaitTermination(15)
        got = _rows(spark.read.parquet(out).collect())
        want = _rows(
            t.read_changes_cdf(-1, upto_version=seedv)
            .unionByName(t.read_changes_cdf(seedv))
            .collect()
        )
        assert got == want, (
            f"seed {seed} (cap={cap}): processingTime feed diverged"
        )
