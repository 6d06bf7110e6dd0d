"""Corpus-level analytics: TF-IDF distinctive terms + source-overlap
matrix (beyond oracle parity: invariants and plan shape)."""

from __future__ import annotations

import pyspark.sql.functions as F

from projectone_spark.functions.dedup import source_overlap
from projectone_spark.functions.text import distinctive_terms


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, "
                                       "source string, text string")


def test_distinctive_terms_scores_and_k(spark):
    df = _docs(spark, [
        (1, "en", "s1", "apple apple banana"),
        (2, "en", "s1", "apple cherry"),
        (3, "fr", "s1", "pomme pomme pomme"),
        (4, "fr", "s1", "banana pomme"),
    ])
    out = distinctive_terms(df, k=2).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == {"en", "fr"}
    assert all(len(v) <= 2 for v in by_lang.values())
    # 'pomme' appears 4x in fr, in 2 of 4 docs: score = 4 * 4 / 2 = 8.0
    fr_terms = {r.term: r for r in by_lang["fr"]}
    assert fr_terms["pomme"].score == 8.0
    assert fr_terms["pomme"].tf == 4 and fr_terms["pomme"].df_docs == 2
    # rank ties break on the term string, so results are deterministic
    en_sorted = sorted(by_lang["en"], key=lambda r: (-r.score, r.term))
    assert [r.term for r in by_lang["en"]] == [r.term for r in en_sorted]


def test_distinctive_terms_input_order_invariant(spark):
    rows = [(i, "en" if i % 2 else "de", "s", f"tok{i % 7} tok{i % 3} common")
            for i in range(40)]
    a = distinctive_terms(_docs(spark, rows), k=3).collect()
    b = distinctive_terms(_docs(spark, rows[::-1]), k=3).collect()
    key = lambda r: (r.lang, r.term)  # noqa: E731
    assert sorted(map(tuple, a), key=str) == sorted(map(tuple, b), key=str)


def test_source_overlap_identical_and_disjoint(spark):
    df = _docs(spark, [
        (1, "en", "a", "the quick brown fox jumps"),
        (2, "en", "b", "the quick brown fox jumps"),   # identical to a
        (3, "en", "c", "zzzz yyyy xxxx wwww vvvv"),    # shares nothing
    ])
    rows = {(r.source_a, r.source_b): r for r in source_overlap(df).collect()}
    assert rows[("a", "b")].jaccard == 1.0
    assert rows[("a", "b")].n_a == rows[("a", "b")].n_b \
        == rows[("a", "b")].n_common
    # disjoint pairs produce NO row (inner join on shared shingles)
    assert ("a", "c") not in rows and ("b", "c") not in rows
    # pairs are unordered & unique: only a<b orientation
    assert all(a < b for a, b in rows)


def test_source_overlap_jaccard_bounds_and_symmetry(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = source_overlap(docs.select("source", "text")).collect()
    assert out, "real corpus sources should share at least one shingle"
    for r in out:
        assert 0.0 < r.jaccard <= 1.0
        assert r.n_common <= min(r.n_a, r.n_b)


def test_corpus_plans_broadcast_small_sides(spark):
    """The scalar doc count (t08) and per-source sizes (d09) must reach
    the join as broadcasts — never a shuffle of the big side against a
    handful of rows."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p1 = distinctive_terms(docs.select("doc_id", "lang", "text")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in p1 or "BroadcastExchange" in p1
    d09 = source_overlap(docs.select("source", "text"))
    d09.collect()  # AQE finalizes exchange reuse at execution
    p2 = d09._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in p2
    # the pair-count and set-size branches must REUSE the one collect_set
    # shuffle — the corpus is scanned and shuffled exactly once (the
    # self-join formulation recomputed the explode three times)
    assert "ReusedExchange" in p2


def test_dedup_token_accounting_invariants(spark):
    from projectone_spark.functions.dedup import dedup_token_accounting

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dedup_token_accounting(
        docs.select("doc_id", "source", "text")).collect()
    assert out
    for r in out:
        assert 0 < r.n_unique <= r.n_docs
        assert 0 < r.unique_tokens <= r.total_tokens
        assert 0.0 <= r.dup_token_ratio < 1.0
    # totals must reconcile with the corpus
    n_total = docs.count()
    assert sum(r.n_docs for r in out) == n_total
