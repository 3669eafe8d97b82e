"""Property and plan tests for the token-level corpus operators
(operators/tokens.py) beyond the oracle gate: determinism of the
mixture sample, contamination flag semantics on a planted case, and
the plan shapes that keep these ops linear at 100 TB.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from lakehouse_test_spark.operators.tokens import (
    contamination_ngram_overlap,
    corpus_mixture_sample,
    dedup_keep_best,
    vocab_topk_terms,
)
from .conftest import SMOKE_SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_mixture_sample_deterministic(spark):
    """Sample membership depends only on doc_id — two runs (and two
    partitionings) must produce identical kept-id hashes."""
    a = {r.source: r.kept_ids_md5 for r in corpus_mixture_sample(spark, SMOKE_SF_DIR).collect()}
    b = {r.source: r.kept_ids_md5 for r in corpus_mixture_sample(spark, SMOKE_SF_DIR).collect()}
    assert a == b
    assert set(a) == {"src0", "src1", "src2", "src3"}


def test_mixture_sample_rates_ordered(spark):
    """Keep-rates 25/50/75/100% must be reflected in kept counts
    relative to per-source totals (src3 keeps everything)."""
    from lakehouse_test_spark.session import load_table

    totals = {
        r.source: r.n
        for r in load_table(spark, SMOKE_SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept = {r.source: r.n_kept for r in corpus_mixture_sample(spark, SMOKE_SF_DIR).collect()}
    assert kept["src3"] == totals["src3"], "src3 rate is 100%"
    fracs = {s: kept[s] / totals[s] for s in kept}
    # generous tolerance at 125-doc-per-source scale
    assert fracs["src0"] < fracs["src2"] <= 1.0


def test_contamination_planted_case(spark):
    """A train doc that IS an eval doc's text must be flagged; a doc
    sharing no 3-grams must not."""
    eval_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (97, eval_text, "en", "src0", len(eval_text)),  # eval member (97 % 97 == 0)
        (1, eval_text, "en", "src0", len(eval_text)),  # exact contamination
        (2, "one two three four five six", "en", "src0", 27),  # clean
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        out = {r.doc_id: r for r in contamination_ngram_overlap(spark, tmp).collect()}
    assert 97 not in out, "eval docs must be excluded from the train output"
    assert out[1].contaminated and out[1].overlap_frac == 1.0
    assert not out[2].contaminated and out[2].n_overlap == 0


def test_vocab_topk_no_global_sort(spark):
    """Top-50 must be TakeOrdered (per-partition top-k + merge), not a
    full sort of the vocabulary."""
    p = _plan(vocab_topk_terms(spark, SMOKE_SF_DIR))
    assert "TakeOrderedAndProject" in p, p


def test_vocab_topk_partial_agg(spark):
    """Term counting must partial-aggregate map-side before the
    shuffle — shuffle volume bounded by |vocab|, not corpus tokens."""
    p = _plan(vocab_topk_terms(spark, SMOKE_SF_DIR))
    assert p.count("HashAggregate") >= 2, p


def test_keep_best_single_shuffle(spark):
    """Canonical-doc selection is one shuffle on the fingerprint."""
    p = _plan(dedup_keep_best(spark, SMOKE_SF_DIR))
    assert p.count("Exchange") == 1, p


def test_keep_best_prefers_longest_then_lowest_id(spark):
    rows = [
        (10, "a b c d e f g h", "en", "s", 1),  # same prefix, longest
        (11, "a b c d e f", "en", "s", 1),
        (12, "a b c d e f g h", "en", "s", 1),  # ties 10 on length
        (13, "q r s t u v", "en", "s", 1),  # singleton
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        out = dedup_keep_best(spark, tmp).collect()
    assert len(out) == 1
    assert out[0].n_dups == 3
    assert out[0].kept_doc_id == 10, "longest doc wins, lowest id breaks ties"
    assert out[0].kept_tokens == 8


def test_pack_sequences_conserves_tokens(spark):
    """Bin packing must conserve tokens: per-source sum over bins ==
    per-source token total, and bin ids start at 0."""
    from lakehouse_test_spark.operators.text import pack_sequences, ws_tokens
    from lakehouse_test_spark.session import load_table

    out = pack_sequences(spark, SMOKE_SF_DIR)
    per_source = {
        r.source: r.total
        for r in out.groupBy("source").agg(F.sum("bin_tokens").alias("total")).collect()
    }
    truth = {
        r.source: r.total
        for r in load_table(spark, SMOKE_SF_DIR, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(ws_tokens(F.col("text")))).alias("total"))
        .collect()
    }
    assert per_source == truth
    assert out.agg(F.min("bin_id")).first()[0] == 0


def test_quantize_error_bounded_by_half_step(spark):
    """int8 symmetric quantization: every element's reconstruction
    error is at most scale/2 (round-to-nearest step), so max_err <=
    scale/2 for every vector."""
    from lakehouse_test_spark.operators.similarity import embedding_quantize_int8

    bad = (
        embedding_quantize_int8(spark, SMOKE_SF_DIR)
        .where(F.col("max_err") > F.col("scale") / 2 + 1e-6)  # 6dp output rounding
        .count()
    )
    assert bad == 0


def test_repetition_ratio_matches_python_reference(spark):
    """Hypothesis: Spark's repetition stats == a direct Python
    computation for arbitrary token sequences (incl. empty and
    1-token docs, the ANSI-mode trap)."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from lakehouse_test_spark.operators.text import text_repetition_ratio

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e"]), max_size=12),
            min_size=1,
            max_size=6,
        )
    )
    def check(docs):
        import os
        import tempfile

        rows = [
            (i, " ".join(toks) if toks else "", "en", "s", 1)
            for i, toks in enumerate(docs)
        ]
        df = spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        )
        with tempfile.TemporaryDirectory() as tmp:
            df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(tmp, "documents.parquet")
            )
            got = {
                r.doc_id: (r.n_bigrams, r.dup_bigram_frac, r.top_bigram_frac)
                for r in text_repetition_ratio(spark, tmp).collect()
            }
        for i, toks in enumerate(docs):
            # ws_tokens splits lowercased text on whitespace; "" -> [""]
            pytoks = (" ".join(toks) if toks else "").lower().split(" ")
            bgs = [
                f"{pytoks[j]} {pytoks[j+1]}" for j in range(len(pytoks) - 1)
            ] if len(pytoks) >= 2 else []
            n = len(bgs)
            dup = 0.0 if n == 0 else 1.0 - len(set(bgs)) / n
            top = 0.0 if n == 0 else Counter(bgs).most_common(1)[0][1] / n
            exp = (n, round(dup, 4), round(top, 4))
            assert got[i] == exp, f"doc {i}: {got[i]} != {exp} ({pytoks})"

    check()


def test_char_entropy_matches_python_reference(spark):
    """Spark's sorted-run entropy == a direct Python computation,
    including empty and single-char docs."""
    import math
    import os
    import tempfile
    from collections import Counter

    from lakehouse_test_spark.operators.text import text_char_entropy

    docs = ["", "a", "ab", "aaaa", "abab", "the quick brown fox", "aA  zz!"]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "documents.parquet")
        )
        got = {
            r.doc_id: (r.n_chars, r.n_distinct_chars, r.char_entropy_bits)
            for r in text_char_entropy(spark, tmp).collect()
        }
    for i, t in enumerate(docs):
        n = len(t)
        counts = Counter(t)
        ent = (
            0.0
            if n == 0
            else -sum((c / n) * math.log2(c / n) for c in counts.values())
        )
        assert got[i] == (n, len(counts), round(ent, 4)), f"doc {i!r}: {got[i]}"
