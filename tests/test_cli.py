"""CLI argument handling (reference op 37: JCommander + validator)."""

from __future__ import annotations

import pytest

from lakehouse_test_spark.cli import build_parser, positive_int


def test_positive_int_validator():
    assert positive_int("5") == 5
    for bad in ("0", "-3"):
        with pytest.raises(Exception):
            positive_int(bad)


def test_producer_flags_compression_and_auth(spark, tmp_path, capsys):
    """-z and --auth-token parity with the reference producer CLI:
    the codec must actually reach the written parquet files and the
    token must configure SASL auth."""
    from lakehouse_test_spark.cli import main

    table_dir = tmp_path / "tbl"
    codec_before = spark.conf.get("spark.sql.parquet.compression.codec")
    try:
        rc = main(
            [
                "produce", "--table", str(table_dir), "-m", "50",
                "-z", "gzip", "--auth-token", "tok123",
            ],
            spark=spark,
        )
    finally:
        spark.conf.set("spark.sql.parquet.compression.codec", codec_before)
    out = capsys.readouterr().out
    assert rc == 0
    assert "Compression: gzip" in out
    assert "Auth: token configured (SASL_SSL/PLAIN)" in out
    assert "tok123" not in out, "token must not be echoed"
    data_files = list(table_dir.glob("data/*/part-*.parquet"))
    assert data_files and all(f.name.endswith(".gz.parquet") for f in data_files)


def test_parser_verbs():
    p = build_parser()
    a = p.parse_args(["produce", "--table", "/tmp/t", "-m", "10", "-t", "2", "-p", "3"])
    assert (a.verb, a.num_messages, a.num_shards, a.num_producers) == ("produce", 10, 2, 3)
    a = p.parse_args(["consume", "--table", "/tmp/t", "--since-version", "4"])
    assert a.since_version == 4
    a = p.parse_args(["produce_amazon", "-f", "x.csv", "--table", "/tmp/t"])
    assert a.file == "x.csv"
    with pytest.raises(SystemExit):
        p.parse_args(["produce", "--table", "/tmp/t", "-m", "0"])
    with pytest.raises(SystemExit):
        p.parse_args(["unknown_verb"])


def test_curate_verb_gates_and_commits(spark, tmp_path, capsys):
    """curate must apply the quality gates, dedup exact copies, and
    commit a readable lakehouse table with honest counters."""
    import os

    from lakehouse_test_spark.cli import main
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    sf = tmp_path / "corpus"
    sf.mkdir()
    good = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 2
    rows = [
        (0, good, "en", "s", len(good)),
        (1, good, "en", "s", len(good)),  # exact dup of 0 -> dropped
        (2, "short doc", "en", "s", 9),  # fails length gate
        (3, "a a a a a a a a a a a a a a a a a a a a a a a a a a a a a a a a a a a a a a a a", "en", "s", 79),  # fails ttr
    ]
    spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"]).coalesce(
        1
    ).write.parquet(os.path.join(str(sf), "documents.parquet"))

    out_table = tmp_path / "curated"
    rc = main(
        ["curate", "--sf-dir", str(sf), "--table", str(out_table)], spark=spark
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "Total docs: 4" in out
    assert "Kept docs: 1" in out
    assert "Dropped: 3" in out
    t = LakehouseTable(spark, str(out_table))
    kept = t.snapshot().collect()
    assert len(kept) == 1 and kept[0].doc_id == 0


def test_cli_maintain_verb(spark, tmp_path, capsys):
    """maintain --compact/--vacuum/--restore drive the table's
    maintenance surface end to end."""
    from lakehouse_test_spark.cli import main
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from lakehouse_test_spark.sources.synthetic import person_stream

    path = str(tmp_path / "mt")
    t = LakehouseTable(spark, path)
    t.append(person_stream(spark, 50).repartition(4))
    t.append(person_stream(spark, 30).repartition(4))

    rc = main(["maintain", "--table", path, "--compact", "1", "--vacuum", "1"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "Compacted: 80 rows" in out and "Vacuumed:" in out

    v_before = LakehouseTable(spark, path).latest_version()
    rc = main(["maintain", "--table", path, "--restore", str(v_before)], spark=spark)
    assert rc == 0
    assert LakehouseTable(spark, path).snapshot().count() == 80


def test_cli_export_verb(spark, tmp_path, capsys):
    """export verb writes both interop formats and reports protocol /
    spec / ref counts; the exported logs replay to the table state."""
    from lakehouse_test_spark.cli import main
    from lakehouse_test_spark.plans.delta_export import read_delta_log
    from lakehouse_test_spark.plans.iceberg_export import read_iceberg
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from pyspark.sql import functions as F

    path = str(tmp_path / "exp_tbl")
    t = LakehouseTable(spark, path)
    t.append(spark.range(40).select(F.col("id").alias("k")))
    t.delete_where_dv("k >= 35")

    rc = main(["export", "--table", path, "--format", "both"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "Delta:" in out and "reader 3 / writer 7" in out  # DV features
    assert "Iceberg:" in out and "snapshots" in out
    assert read_delta_log(spark, path).count() == 35
    assert read_iceberg(spark, path).count() == 35


def test_cli_convert_verb(spark, tmp_path, capsys):
    """convert verb adopts a plain parquet dir in place; the table
    reads immediately and scan_pruned uses the harvested zone maps."""
    from lakehouse_test_spark.cli import main
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from pyspark.sql import functions as F

    src = str(tmp_path / "plain")
    spark.range(100).select(F.col("id").alias("k")).repartitionByRange(
        4, "k"
    ).write.parquet(src)
    path = str(tmp_path / "conv_tbl")
    rc = main(["convert", "--src", src, "--table", path, "--stats", "k"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "Converted" in out and "100 rows" in out
    t = LakehouseTable(spark, path)
    assert t.snapshot().count() == 100
    _df, scanned, total = t.scan_pruned("k", 0, 10)
    assert scanned < total


def test_cli_alter_rename_drop_widen(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from lakehouse_test_spark.cli import main
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    path = str(tmp_path / "alter_t")
    t = LakehouseTable(spark, path)
    t.append(
        spark.range(10).select(
            F.col("id").cast("int").alias("k"), F.lit(1).alias("flag")
        )
    )
    assert main(["alter", "--table", path, "--widen", "k:bigint"], spark=spark) == 0
    assert main(["alter", "--table", path, "--drop", "flag"], spark=spark) == 0
    assert main(["alter", "--table", path, "--rename", "k:kk"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "Widened k -> bigint" in out and "Dropped column flag" in out
    snap = LakehouseTable(spark, path).snapshot()
    assert snap.columns == ["kk"] and dict(snap.dtypes)["kk"] == "bigint"


def test_cli_pipe_cdc_pipeline(spark, tmp_path):
    """`cli pipe`: snapshot-seeded, capped CDC from source to sink —
    two invocations (seed, then tail with a DV) leave the sink equal
    to the source's net state, exactly-once across the checkpoint."""
    from pyspark.sql import functions as F

    from lakehouse_test_spark.cli import main
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    src = LakehouseTable(spark, str(tmp_path / "src"))
    for i in range(3):
        src.append(
            spark.range(i * 10, i * 10 + 4).select(F.col("id").alias("k"))
        )
    src.delete_where("k % 10 = 2")  # backlog restate: seed tolerates
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    argv = [
        "pipe", "--source", str(src.path), "--sink", sink,
        "--checkpoint", ck, "--merge-key", "k",
        "--max-versions-per-trigger", "2",
    ]
    assert main(argv, spark=spark) in (0, None)
    got = sorted(r["k"] for r in LakehouseTable(spark, sink).snapshot().collect())
    assert got == sorted(r["k"] for r in src.snapshot().collect())
    # tail: appends + a DV delete, drained by re-running the verb
    src.append(spark.range(100, 103).select(F.col("id").alias("k")))
    src.delete_where_dv("k = 101")
    for _ in range(4):  # capped: multiple runs drain the backlog
        assert main(argv, spark=spark) in (0, None)
    got = sorted(r["k"] for r in LakehouseTable(spark, sink).snapshot().collect())
    want = sorted(r["k"] for r in src.snapshot().collect())
    assert got == want
    assert 101 not in got


def test_cli_pipe_apply_is_distributed_and_version_ordered(spark, tmp_path):
    """Round-10 contract for the pipe verb's apply (r9 verdict #1 +
    ADVICE):

    - the micro-batch is NEVER materialized driver-side — a collect()
      on any DataFrame carrying the feed's meta columns fails the test
      (the multi-file snapshot seed must flow straight into
      sink.merge / delete_keys_dv);
    - changes apply per key in _commit_version order: a key deleted
      then RE-INSERTED inside one drain window ends PRESENT, a key
      inserted then deleted ends ABSENT (the old all-inserts-then-
      all-deletes apply lost the first case);
    - delete keys never ride in SQL text: quote-bearing string keys
      delete correctly (the repr()-interpolated IN(...) was malformed
      for them).
    """
    from unittest import mock

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from lakehouse_test_spark.cli import main
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    src = LakehouseTable(spark, str(tmp_path / "srcq"))
    keys = ["it's", 'a"b', "plain", "victim", "gone"]
    df = spark.createDataFrame([(k, 1) for k in keys], "k string, v int")
    src.append(df.repartition(3))  # v0: multi-file seed
    sink, ck = str(tmp_path / "sinkq"), str(tmp_path / "ckq")
    argv = [
        "pipe", "--source", str(src.path), "--sink", sink,
        "--checkpoint", ck, "--merge-key", "k",
    ]

    real_collect = DataFrame.collect

    def guarded(self):
        if "_change_type" in self.columns:
            raise AssertionError(
                "pipe applied a feed batch via driver-side collect()"
            )
        return real_collect(self)

    with mock.patch.object(DataFrame, "collect", guarded):
        assert main(argv, spark=spark) in (0, None)
    got = {r["k"]: r["v"] for r in LakehouseTable(spark, sink).snapshot().collect()}
    assert got == {k: 1 for k in keys}

    # one drain window carrying, for distinct keys: delete→re-insert
    # ("victim" must end PRESENT), plain delete of a quoted key
    # ("it's" must end ABSENT), and insert→delete ("newbie" absent)
    src.delete_keys_dv(
        spark.createDataFrame([("victim",), ("it's",)], "k string"), "k"
    )  # v1
    src.append(
        spark.createDataFrame([("victim", 2)], "k string, v int").coalesce(1)
    )  # v2
    src.append(
        spark.createDataFrame([("newbie", 9)], "k string, v int").coalesce(1)
    )  # v3
    src.delete_keys_dv(
        spark.createDataFrame([("newbie",)], "k string"), "k"
    )  # v4
    with mock.patch.object(DataFrame, "collect", guarded):
        assert main(argv, spark=spark) in (0, None)
    got = {r["k"]: r["v"] for r in LakehouseTable(spark, sink).snapshot().collect()}
    assert got == {'a"b': 1, "plain": 1, "gone": 1, "victim": 2}
    # exactly-once across the checkpoint: an idle re-run changes nothing
    with mock.patch.object(DataFrame, "collect", guarded):
        assert main(argv, spark=spark) in (0, None)
    got2 = {r["k"]: r["v"] for r in LakehouseTable(spark, sink).snapshot().collect()}
    assert got2 == got


def test_cli_pipe_until_caught_up_drains_backlog(spark, tmp_path, capsys):
    """r10 verdict #2: one `pipe --until-caught-up` invocation drains
    an arbitrarily deep capped backlog (the Python DataSource API pins
    the end offset once per AvailableNow run, so the CLI loops runs —
    each exactly-once — until a run commits no new batch). 30-commit
    backlog at maxVersionsPerTrigger=5 → ≥6 runs, fully drained;
    restart mid-loop stays exactly-once; an idle re-run is one no-op
    run."""
    import re

    from pyspark.sql import functions as F

    from lakehouse_test_spark.cli import main
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    src = LakehouseTable(spark, str(tmp_path / "srcb"))
    src.append(spark.range(5).select(F.col("id").alias("k")))
    sink, ck = str(tmp_path / "sinkb"), str(tmp_path / "ckb")
    base = [
        "pipe", "--source", str(src.path), "--sink", sink,
        "--checkpoint", ck, "--merge-key", "k",
        "--max-versions-per-trigger", "5",
    ]
    assert main(base, spark=spark) in (0, None)  # seed at v0
    capsys.readouterr()
    # 30-commit backlog (one delete in the middle: order must hold)
    for i in range(29):
        src.append(spark.range(100 + i, 101 + i).select(F.col("id").alias("k")))
    src.delete_where_dv("k = 100")  # commit 30 of the backlog
    # mid-loop "crash": a single capped run advances one cap only...
    assert main(base, spark=spark) in (0, None)
    capsys.readouterr()
    # ...and the loop resumes from the checkpoint, exactly-once
    assert main(base + ["--until-caught-up"], spark=spark) in (0, None)
    out = capsys.readouterr().out
    runs = int(re.search(r"over (\d+) run\(s\)", out).group(1))
    assert runs >= 6  # 25 remaining versions / cap 5 + the no-op run
    got = sorted(r["k"] for r in LakehouseTable(spark, sink).snapshot().collect())
    want = sorted(r["k"] for r in src.snapshot().collect())
    assert got == want and 100 not in got
    # idle invocation: exactly one no-op run, nothing re-applied
    assert main(base + ["--until-caught-up"], spark=spark) in (0, None)
    out = capsys.readouterr().out
    assert "over 1 run(s)" in out and "Applied 0 net change row(s)" in out
    got2 = sorted(r["k"] for r in LakehouseTable(spark, sink).snapshot().collect())
    assert got2 == got


def test_cli_pipe_until_caught_up_file_capped_wide_commit(spark, tmp_path, capsys):
    """--until-caught-up under the FILES cap: one WIDE commit (8
    files) at maxFilesPerTrigger=3 splits across runs via files-form
    offsets — the loop keeps draining through the mid-commit offsets
    and one invocation still reaches the head, exactly-once."""
    import re

    from pyspark.sql import functions as F

    from lakehouse_test_spark.cli import main
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    src = LakehouseTable(spark, str(tmp_path / "srcw"))
    src.append(spark.range(4).select(F.col("id").alias("k")))
    sink, ck = str(tmp_path / "sinkw"), str(tmp_path / "ckw")
    base = [
        "pipe", "--source", str(src.path), "--sink", sink,
        "--checkpoint", ck, "--merge-key", "k",
        "--max-files-per-trigger", "3",
    ]
    assert main(base, spark=spark) in (0, None)  # seed
    capsys.readouterr()
    src.append(
        spark.range(100, 140).select(F.col("id").alias("k")).repartition(8)
    )  # ONE wide commit: 8 files > cap
    src.append(spark.range(200, 203).select(F.col("id").alias("k")))
    assert main(base + ["--until-caught-up"], spark=spark) in (0, None)
    out = capsys.readouterr().out
    runs = int(re.search(r"over (\d+) run\(s\)", out).group(1))
    assert runs >= 4  # ceil((8+1 files)/3) capped runs + the no-op
    got = sorted(r["k"] for r in LakehouseTable(spark, sink).snapshot().collect())
    want = sorted(r["k"] for r in src.snapshot().collect())
    assert got == want


def test_delete_keys_dv_api(spark, tmp_path):
    """delete_keys_dv: distributed key-set DV delete — quote-bearing
    and absent keys, dedup of the key frame, no-op on zero matches."""
    from pyspark.sql import functions as F

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    t = LakehouseTable(spark, str(tmp_path / "dkdv"))
    t.append(
        spark.createDataFrame(
            [("it's", 1), ("x", 2), ("y", 3)], "k string, v int"
        )
    )
    t.delete_keys_dv(
        spark.createDataFrame(
            [("it's",), ("it's",), ("absent",)], "k string"
        ),
        "k",
    )
    assert sorted(r["k"] for r in t.snapshot().collect()) == ["x", "y"]
    # zero-match delete commits an empty DV: snapshot unchanged
    t.delete_keys_dv(spark.createDataFrame([("nope",)], "k string"), "k")
    assert sorted(r["k"] for r in t.snapshot().collect()) == ["x", "y"]
