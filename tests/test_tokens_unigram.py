"""Unigram-LM tokenizer (operators/tokens.unigram_train): exact parity
against a pure-Python reference, coverage, and the gate query."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from .conftest import SMOKE_SF_DIR


def ref_unigram(texts, max_piece_len=4, seed_size=2000, iters=2):
    """Pure-Python mirror of the documented algorithm: substring-seeded
    inventory (top seed_size by weighted count, plus all chars), then
    EM rounds of longest-preferring Viterbi segmentation over the
    word-frequency vocabulary."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if w:
                vocab[w] += 1

    subs = Counter()
    chars = Counter()
    for w, f in vocab.items():
        for i in range(len(w)):
            for k in range(1, min(max_piece_len, len(w) - i) + 1):
                subs[w[i : i + k]] += f
        for ch in w:
            pass
    for w, f in vocab.items():
        for i in range(len(w)):
            chars[w[i]] += f
    ranked = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    counts = dict(ranked)
    for ch, c in chars.items():
        counts.setdefault(ch, c)
    char_set = set(chars)

    for _ in range(iters):
        total = float(sum(counts.values()))
        logp = {p: math.log(c / total) for p, c in counts.items()}
        new_counts: Counter = Counter()
        for w, f in vocab.items():
            n = len(w)
            best = [float("-inf")] * (n + 1)
            best[0] = 0.0
            back = [0] * (n + 1)
            for i in range(1, n + 1):
                for k in range(min(max_piece_len, i), 0, -1):
                    piece = w[i - k : i]
                    v = logp.get(piece)
                    if v is None:
                        continue
                    s = best[i - k] + v
                    if s > best[i]:
                        best[i] = s
                        back[i] = k
            if best[n] == float("-inf"):
                continue
            i = n
            while i > 0:
                k = back[i]
                new_counts[w[i - k : i]] += f
                i -= k
        counts = dict(new_counts)
        for ch in char_set:
            counts.setdefault(ch, 1)
    total = float(sum(counts.values()))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(p, c, c / total) for p, c in ranked]


TEXTS = [
    "low lower lowest slow slower slowest",
    "new newer newest few fewer fewest",
    "low low lower new new newest",
    "internationalization international nation nationalize",
]


def test_unigram_matches_python_reference(spark):
    from lakehouse_test_spark.operators.tokens import unigram_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = unigram_train(docs, seed_size=500, iters=2)
    want = ref_unigram(TEXTS, seed_size=500, iters=2)
    assert [(p, c) for p, c, _ in got] == [(p, c) for p, c, _ in want]
    for (_, _, gp), (_, _, wp) in zip(got, want):
        assert gp == pytest.approx(wp, abs=1e-12)


def test_unigram_full_coverage_and_mass(spark):
    """Every word must stay segmentable (alphabet floor) and the final
    distribution must be a probability distribution."""
    from lakehouse_test_spark.operators.tokens import unigram_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    pieces = unigram_train(docs, seed_size=50, iters=2)
    probs = [p for _, _, p in pieces]
    assert sum(probs) == pytest.approx(1.0)
    alphabet = {ch for t in TEXTS for w in t.split() for ch in w}
    have = {p for p, _, _ in pieces}
    assert alphabet <= have


def test_unigram_gate_query(spark):
    from lakehouse_test_spark.operators.tokens import tokenizer_unigram_em

    rows = tokenizer_unigram_em(spark, SMOKE_SF_DIR).collect()
    assert 0 < len(rows) <= 30
    assert all(len(r.piece) > 1 for r in rows)
    counts = [r.piece_count for r in rows]
    assert counts == sorted(counts, reverse=True)
