"""Value-level checks for wave E: each operator against an
independent reference implementation (pandas/numpy/brute force) on
controlled fixtures — the oracle gate proves engine parity, these
prove the MATH."""

from __future__ import annotations

import os
import tempfile

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.queries import REGISTRY


def _events_fixture(spark, tmp, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))


def test_ewma_matches_pandas_ewm(spark):
    """The in-plan fold must equal pandas ewm(alpha=0.2, adjust=False)
    — the textbook recursion — on a seeded random series."""
    rng = np.random.default_rng(7)
    rows = []
    for uid in range(5):
        for i in range(40):
            rows.append(
                (
                    uid * 1000 + i,
                    dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i * 60),
                    uid,
                    "e",
                    float(rng.normal(10, 3)),
                    "{}",
                )
            )
    with tempfile.TemporaryDirectory() as tmp:
        _events_fixture(spark, tmp, rows)
        got = {
            r.user_id: r.ewma_value
            for r in REGISTRY["timeseries_ewma_user"].fn(spark, tmp).collect()
        }
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "et", "value", "props"])
    for uid, g in pdf.groupby("user_id"):
        series = g.sort_values(["ts", "event_id"])["value"]
        expect = series.ewm(alpha=0.2, adjust=False).mean().iloc[-1]
        assert got[uid] == pytest.approx(round(expect, 6), abs=1e-6), f"user {uid}"


def test_bitmap_distinct_equals_exact_on_random_ids(spark):
    """Bitmap counting is EXACT: random ids with collisions across
    buckets must match count(distinct) precisely."""
    rng = np.random.default_rng(11)
    rows = [
        (
            int(i),
            dt.datetime(2024, 1, 1),
            int(rng.integers(0, 100000)),
            ["a", "b"][int(rng.integers(0, 2))],
            1.0,
            "{}",
        )
        for i in range(5000)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _events_fixture(spark, tmp, rows)
        got = {
            r.event_type: r.n_distinct_users
            for r in REGISTRY["agg_bitmap_distinct_users"].fn(spark, tmp).collect()
        }
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    for et, g in pdf.groupby("event_type"):
        assert got[et] == g["user_id"].nunique(), et


def test_pareto_frontier_matches_bruteforce(spark, sf_dir):
    """Frontier must equal the O(n²) python reference per type."""
    got = {
        (r.p_type, r.p_partkey)
        for r in REGISTRY["pareto_frontier_parts"].fn(spark, sf_dir).collect()
    }
    import duckdb

    con = duckdb.connect()
    parts = con.sql(
        f"SELECT p_type, p_partkey, p_retailprice, p_size FROM read_parquet('{sf_dir}/part.parquet')"
    ).fetchall()
    by_type: dict = {}
    for t, k, price, size in parts:
        by_type.setdefault(t, []).append((k, price, size))
    expect = set()
    for t, items in by_type.items():
        for k, price, size in items:
            dominated = any(
                qp <= price and qs >= size and (qp < price or qs > size)
                for _, qp, qs in items
            )
            if not dominated:
                expect.add((t, k))
    assert got == expect


def test_kl_divergence_properties(spark):
    """KL(source ‖ corpus) is >= 0, and == 0 when the corpus has a
    single source (p == q identically)."""
    docs = [(i, "alpha beta gamma delta", "en", "only", 22) for i in range(4)]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        rows = REGISTRY["corpus_source_divergence"].fn(spark, tmp).collect()
    assert len(rows) == 1
    assert rows[0].kl_vs_corpus == pytest.approx(0.0, abs=1e-9)


def test_anomaly_zscore_flags_planted_spike(spark):
    """A constant-ish series with one huge spike must flag exactly the
    spike (and nothing in the warmup prefix)."""
    rows = []
    rng = np.random.default_rng(3)
    for i in range(30):
        v = 10.0 + float(rng.normal(0, 0.1))
        if i == 25:
            v = 1000.0
        rows.append(
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i * 60), 1, "e", v, "{}")
        )
    with tempfile.TemporaryDirectory() as tmp:
        _events_fixture(spark, tmp, rows)
        out = REGISTRY["events_anomaly_zscore"].fn(spark, tmp).collect()
    assert len(out) == 1
    assert out[0].n_anomalies == 1


def test_bpe_matches_python_reference(spark):
    """The distributed trainer must reproduce the exact merge sequence
    (including the count-desc, pair-asc tiebreak) of a pure-Python
    Sennrich-style BPE on a controlled corpus."""
    from collections import Counter

    from lakehouse_test_spark.operators.tokens import bpe_train

    texts = [
        "low lower lowest slow slower slowest",
        "new newer newest few fewer fewest",
        "low low lower new new newest",
    ]

    def ref_bpe(texts, num_merges):
        vocab = Counter()
        for t in texts:
            for w in t.split():
                vocab[tuple(w)] += 1
        merges = []
        for step in range(num_merges):
            pc = Counter()
            for syms, f in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += f
            if not pc:
                break
            (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if c < 2:
                break
            merges.append((step, l, r, c))
            nv = Counter()
            for syms, f in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nv[tuple(out)] += f
            vocab = nv
        return merges

    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    stats = {}
    got = bpe_train(docs, num_merges=10, stats=stats)
    assert got == ref_bpe(texts, 10)
    # the batched rounds must actually batch: 10 merges in far fewer
    # Spark round-trips than the one-merge-per-round loop needed
    assert stats["rounds"] <= 4


def test_bpe_batched_rounds_cut_4x(spark, sf_dir):
    """The verdict-r2 criterion: round count ≥4× lower than merges at
    the same vocab on the documents corpus."""
    from lakehouse_test_spark.operators.tokens import bpe_train
    from lakehouse_test_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    stats = {}
    merges = bpe_train(d, num_merges=16, stats=stats)
    assert len(merges) == 16
    assert stats["rounds"] * 4 <= len(merges)


def _ref_bpe_vocab(vocab, num_merges):
    """Pure-Python sequential BPE over a word-frequency dict."""
    from collections import Counter

    vocab = Counter(vocab)
    merges = []
    for step in range(num_merges):
        pc = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((step, l, r, c))
        nv = Counter()
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] += f
        vocab = nv
    return merges


def test_bpe_batch_selector_stress():
    """Randomized adversarial corpora (tiny alphabets force the chain /
    alias / self-pair edge cases): the batched selector driven to
    completion must reproduce the sequential merge order EXACTLY.
    Pure driver-side — no Spark — so this can afford 60 seeds."""
    import random
    from collections import Counter

    from lakehouse_test_spark.operators.tokens import _select_merge_batch

    def batched(vocab, num_merges):
        from lakehouse_test_spark.operators.tokens import _BPE_MAXN

        vocab = Counter(vocab)
        merges = []
        while len(merges) < num_merges:
            ng = Counter()
            for syms, f in vocab.items():
                for n in range(2, _BPE_MAXN + 1):
                    for i in range(len(syms) - n + 1):
                        ng[tuple(syms[i : i + n])] += f
            if max((v for k, v in ng.items() if len(k) == 2), default=0) < 2:
                break
            batch = _select_merge_batch(dict(ng), num_merges - len(merges))
            if not batch:
                break
            for l, r, c in batch:
                merges.append((len(merges), l, r, c))
                nv = Counter()
                for syms, f in vocab.items():
                    out, i = [], 0
                    while i < len(syms):
                        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                            out.append(l + r)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    nv[tuple(out)] += f
                vocab = nv
        return merges

    for seed in range(60):
        random.seed(seed)
        alpha = "abcdef"[: random.randint(2, 5)]
        words = Counter()
        for _ in range(random.randint(5, 60)):
            w = "".join(random.choices(alpha, k=random.randint(1, 8)))
            words[tuple(w)] += random.randint(1, 4)
        for nm in (5, 12, 25):
            assert batched(words, nm) == _ref_bpe_vocab(words, nm), (
                f"seed={seed} nm={nm}"
            )


def test_bpe_encode_matches_python_reference(spark):
    """Token counts from the distributed encode must equal a
    pure-Python application of the same merge table."""
    from lakehouse_test_spark.operators.tokens import bpe_encode_stats, bpe_train

    texts = [
        "low lower lowest slow slower slowest",
        "new newer newest few fewer fewest",
        "low low lower new new newest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(docs, num_merges=8)

    def encode_word(w):
        syms = list(w)
        for _, l, r, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    got = {r.doc_id: r.n_tokens for r in bpe_encode_stats(docs, merges).collect()}
    want = {
        i: sum(encode_word(w) for w in t.split()) for i, t in enumerate(texts)
    }
    assert got == want


def test_bpe_driver_trainer_matches_reference_stress():
    """The incremental pair-index + lazy-heap driver trainer
    (bpe_train_driver) must reproduce the naive sequential reference
    EXACTLY — counts, order, and the (-count, pair) tiebreak — across
    adversarial corpora (tiny alphabets force self-pairs, chains, and
    count-decrement paths where a stale heap would pick wrong)."""
    import random

    from lakehouse_test_spark.operators.tokens import bpe_train_driver

    for seed in range(60):
        rng = random.Random(seed)
        alpha = "ab" if seed % 3 == 0 else "abc"
        rows = [
            (
                [rng.choice(alpha) for _ in range(rng.randint(1, 12))],
                rng.randint(1, 5),
            )
            for _ in range(rng.randint(2, 20))
        ]
        ref = _ref_bpe_vocab(_rows_to_counter(rows), 30)
        got = bpe_train_driver(rows, 30)
        assert got == ref, f"seed {seed}: {got[:5]} != {ref[:5]}"


def _rows_to_counter(rows):
    from collections import Counter

    c = Counter()
    for syms, f in rows:
        c[tuple(syms)] += f
    return c


def test_bpe_driver_path_equals_distributed(spark):
    """bpe_train(driver_threshold=big) must return the identical merge
    table the distributed batched loop returns (same corpus)."""
    from lakehouse_test_spark.operators.tokens import bpe_train

    texts = [
        ("the quick brown fox jumps over the lazy dog",),
        ("the quick brown cat naps under the warm sun",),
        ("lazy dogs and quick cats share the brown barn",),
    ] * 4
    df = spark.createDataFrame(texts, "text string")
    stats_d, stats_s = {}, {}
    via_driver = bpe_train(df, num_merges=24, driver_threshold=10**6, stats=stats_d)
    via_spark = bpe_train(df, num_merges=24, stats=stats_s)
    assert stats_d["driver"] is True and stats_s["driver"] is False
    assert via_driver == via_spark
    # and the no-pretokenize variant agrees with itself across paths
    d2 = bpe_train(df, num_merges=24, pretokenize=False, driver_threshold=10**6)
    s2 = bpe_train(df, num_merges=24, pretokenize=False)
    assert d2 == s2
