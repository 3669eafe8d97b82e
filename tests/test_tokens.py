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
