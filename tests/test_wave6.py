"""Wave-D tests: recursive gapfill, streaks, chunking, Gopher gate,
centroids — unit semantics on crafted frames plus plan pins."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_test_spark.queries_wave6 import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    events_activity_streaks,
    sql_recursive_month_gapfill,
    text_chunk_sliding,
    text_gopher_filters,
)


def test_streaks_toy_islands(spark, tmp_path):
    """Known islands: user 1 has runs [1-3] and [5], user 2 has [10]."""
    rows = []
    for d in (1, 2, 3, 5):
        rows.append(Row(event_id=d, ts=datetime.datetime(2024, 1, d), user_id=1,
                        event_type="x", value=1.0, props="{}"))
    # duplicate events on the same day must not inflate streaks
    rows.append(Row(event_id=9, ts=datetime.datetime(2024, 1, 2, 12), user_id=1,
                    event_type="y", value=1.0, props="{}"))
    rows.append(Row(event_id=10, ts=datetime.datetime(2024, 1, 10), user_id=2,
                    event_type="x", value=1.0, props="{}"))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")
    out = {r["user_id"]: r for r in events_activity_streaks(spark, sf).collect()}
    assert out[1]["n_streaks"] == 2
    assert out[1]["max_streak"] == 3
    assert out[1]["active_days"] == 4
    assert out[2] ["n_streaks"] == 1 and out[2]["max_streak"] == 1


def test_chunk_boundaries(spark, tmp_path):
    """1 token -> one short chunk; exactly CHUNK_TOKENS -> one full
    chunk; CHUNK_TOKENS+1 -> two chunks with the tail at stride."""
    docs = [
        Row(doc_id=1, text="a", lang="en", source="s", n_chars=1),
        Row(doc_id=2, text=" ".join(["w"] * CHUNK_TOKENS), lang="en", source="s", n_chars=0),
        Row(doc_id=3, text=" ".join(f"t{i}" for i in range(CHUNK_TOKENS + 1)), lang="en",
            source="s", n_chars=0),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(docs).write.parquet(f"{sf}/documents.parquet")
    out = text_chunk_sliding(spark, sf).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_len"] == 1
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_len"] == CHUNK_TOKENS
    chunks3 = sorted(by_doc[3], key=lambda r: r["chunk_idx"])
    assert [c["chunk_len"] for c in chunks3] == [CHUNK_TOKENS, CHUNK_TOKENS + 1 - CHUNK_STRIDE]
    # overlap: chunk 1 starts at stride, so its md5 differs from chunk 0
    assert chunks3[0]["chunk_md5"] != chunks3[1]["chunk_md5"]


def test_gopher_gate_decisions(spark, tmp_path):
    """A clean English doc passes; word-soup without stopwords, a
    too-short doc, and a symbol-heavy doc are dropped."""
    good = "the quick brown fox and the lazy dog have fun with all of that " * 3
    short = "the cat and the dog"
    nostop = " ".join(f"zz{i}" for i in range(40))
    symbols = "the and of that have with " + "### ... ### ... " * 10
    docs = [
        Row(doc_id=1, text=good, lang="en", source="s", n_chars=len(good)),
        Row(doc_id=2, text=short, lang="en", source="s", n_chars=len(short)),
        Row(doc_id=3, text=nostop, lang="en", source="s", n_chars=len(nostop)),
        Row(doc_id=4, text=symbols, lang="en", source="s", n_chars=len(symbols)),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(docs).write.parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r for r in text_gopher_filters(spark, sf).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["n_words"] < 20
    assert out[3]["keep"] is False and out[3]["stopword_hits"] == 0
    assert out[4]["keep"] is False and out[4]["symbol_word_ratio"] >= 0.1


def test_chunking_and_gopher_no_shuffle(spark, sf_dir):
    """Per-doc transforms must stay map-side: no Exchange at scale."""
    for fn in (text_chunk_sliding, text_gopher_filters):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{fn.__name__} shuffles: {plan}"


def test_recursive_gapfill_dense_months(spark, sf_dir):
    """Every month between min and max appears exactly once, and
    month count equals the calendar span (gapfill contract)."""
    out = sql_recursive_month_gapfill(spark, sf_dir).collect()
    months = sorted(r["month_start"] for r in out)
    assert len(set(months)) == len(months)
    span = (months[-1].year - months[0].year) * 12 + months[-1].month - months[0].month + 1
    assert len(months) == span
    # gapfilled months carry explicit zeros, not nulls
    for r in out:
        assert r["n_orders"] is not None and r["month_revenue"] is not None


def test_streaks_single_exchange(spark, sf_dir):
    """The distinct and the window/aggregates all key on user_id:
    only the initial repartition by user_id should shuffle (plus the
    distinct's partial/final pair), never a join."""
    from lakehouse_test_spark.queries_wave6 import events_activity_streaks

    plan = events_activity_streaks(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    # hashpartitioning on user_id reused: no exchange keyed on (user_id, g)
    assert "hashpartitioning(user_id" in plan
    assert "hashpartitioning(g" not in plan


def test_lateral_topk_decorrelates(spark, sf_dir):
    """Catalyst must rewrite the correlated LATERAL into a join-based
    plan (no per-outer-row re-execution nodes)."""
    from lakehouse_test_spark.queries_wave6 import sql_lateral_topk_per_key

    plan = sql_lateral_topk_per_key(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan
