"""Unit tests for the round-4 corpus operators: Gopher rules, cross-doc
n-gram dedup, capped mixture rebalance. (Their DuckDB parity runs in
test_oracle_parity.py; these pin the semantics on crafted rows.)"""

from __future__ import annotations

import pyspark.sql.functions as F

from projectone_spark.functions.dedup import cross_doc_ngram_dedup
from projectone_spark.functions.sampling import mixture_rebalance
from projectone_spark.functions.text import gopher_rules


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_gopher_rules_verdicts(spark):
    good = "the a " + " ".join(f"word{i:02d}" for i in range(48))
    docs = spark.createDataFrame(
        [(1, good),
         (2, "word " * 60),           # one word repeated: top-word rule fails
         (3, "tiny text"),            # too short
         (4, "ab " * 60)],            # mean word length 2 < 3
        "doc_id long, text string")
    got = _rows(gopher_rules(docs, min_distinct_stopwords=2))
    assert got[1]["keep"] is True
    assert got[2]["rule_top_word"] is False and got[2]["top_word_frac"] == 1.0
    assert got[3]["rule_word_count"] is False
    assert got[4]["rule_mean_word_len"] is False
    assert got[4]["mean_word_len"] == 2.0
    # rule columns compose the keep flag exactly
    for r in got.values():
        assert r["keep"] == (r["rule_word_count"] and r["rule_mean_word_len"]
                             and r["rule_stopwords"] and r["rule_top_word"])


def test_gopher_rules_empty_text(spark):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = gopher_rules(docs).collect()[0]
    assert r["n_words"] == 0 and r["mean_word_len"] == 0.0
    assert r["keep"] is False


def test_cross_doc_ngram_dedup_flags_shared_text(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 words
    docs = spark.createDataFrame(
        [(1, shared + " one two three four five six seven eight"),
         (2, shared + " nine ten eleven twelve thirteen fourteen fifteen sixteen"),
         (3, "only unique words appear in this document nothing is shared here at all")],
        "doc_id long, text string")
    got = _rows(cross_doc_ngram_dedup(docs, n=8))
    # docs 1 and 2 share exactly the one 8-gram made of the shared prefix
    assert got[1]["n_shared"] == 1 and got[2]["n_shared"] == 1
    assert got[3]["n_shared"] == 0 and got[3]["keep"] is True
    assert 0 < got[1]["dup_frac"] < 1


def test_cross_doc_ngram_dedup_short_docs_drop(spark):
    docs = spark.createDataFrame(
        [(1, "fewer than eight words here"),
         (2, "one two three four five six seven eight")],
        "doc_id long, text string")
    got = _rows(cross_doc_ngram_dedup(docs, n=8))
    assert 1 not in got          # <8 words → no grams → no row
    assert got[2]["n_grams"] == 1


def test_mixture_rebalance_cap_and_exact_masses(spark):
    # one dominant source (should downsample) and one scarce (cap applies)
    rows = [(i, "big", 100) for i in range(100)] + [(1000, "small", 10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, toks long")
    got = {r["source"]: r for r in mixture_rebalance(df, max_upsample=4.0).collect()}
    assert got["big"]["tokens_in"] == 10_000 and got["small"]["tokens_in"] == 10
    # target = 10010/2 = 5005 → big weight ≈ 0.5005, small capped at 4.0
    assert got["small"]["weight"] == 4.0
    assert abs(got["big"]["weight"] - 0.5005) < 1e-12
    assert got["small"]["n_copies"] == 4        # floor(4.0), frac 0 → no extra
    assert 0 < got["big"]["n_copies"] < 100     # stochastic-rounded downsample


def test_mixture_rebalance_deterministic(spark):
    rows = [(i, f"s{i % 3}", 1 + i % 7) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, toks long")
    a = sorted(map(tuple, mixture_rebalance(df).collect()))
    b = sorted(map(tuple, mixture_rebalance(df.repartition(7)).collect()))
    assert a == b  # stable under re-runs and repartitioning


def test_incremental_lsh_pairs_completes_the_batch_pair_set(spark):
    """base-only pairs ∪ incremental(delta) pairs must equal the full
    batch candidate-pair set — the invariant that makes daily-increment
    dedup sound (no pair lost, no base×base pair recomputed)."""
    from projectone_spark.functions.dedup import (
        incremental_lsh_pairs,
        lsh_candidate_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"shared words {'x' * (i % 3)} tail piece number {i % 4}")
         for i in range(24)],
        "doc_id long, text string")
    base = docs.filter("doc_id % 5 != 0")
    delta = docs.filter("doc_id % 5 = 0")
    full = {(r[0], r[1]) for r in lsh_candidate_pairs(docs).collect()}
    base_only = {(r[0], r[1]) for r in lsh_candidate_pairs(base).collect()}
    inc = {(r[0], r[1]) for r in incremental_lsh_pairs(base, delta).collect()}
    assert base_only | inc == full
    assert base_only & inc == set()


def test_gopher_rules_keep_cols_collision_raises(spark):
    docs = spark.createDataFrame([(1, "hello world", 5)],
                                 "doc_id int, text string, n_words int")
    import pytest

    with pytest.raises(ValueError, match="keep_cols"):
        gopher_rules(docs, keep_cols=["n_words"])  # reserved output name
    with pytest.raises(ValueError, match="keep_cols"):
        gopher_rules(docs, keep_cols=["doc_id"])  # duplicates id_col
    with pytest.raises(ValueError, match="keep_cols"):
        gopher_rules(docs, keep_cols=["text", "text"])  # repeated
