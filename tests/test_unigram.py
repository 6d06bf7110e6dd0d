"""Unigram-LM tokenizer family (functions/text.py): seeding, Viterbi
DP, the hard-EM step, and the one-corpus-scan plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from projectone_spark.functions.text import (
    unigram_lm_em_step,
    unigram_lm_train,
    unigram_seed_pieces,
    unigram_viterbi,
    unigram_word_freqs,
)
from projectone_spark.queries import load
from tests.conftest import SF_DIR


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")


def test_word_freqs_counts_and_caps(spark):
    docs = _docs(spark, ["cat cat dog", "cat superlongword"])
    out = {r["word"]: r["freq"]
           for r in unigram_word_freqs(docs, max_word_len=6).collect()}
    assert out == {"cat": 3, "dog": 1}  # 13-char word dropped by the cap
    with pytest.raises(ValueError, match="max_word_len"):
        unigram_word_freqs(docs, max_word_len=0)


def test_seed_pieces_weighted_substrings(spark):
    docs = _docs(spark, ["ab ab b"])
    pieces = {r["piece"]: (r["count"], r["score_micro"])
              for r in unigram_seed_pieces(
                  unigram_word_freqs(docs)).collect()}
    # ab×2 contributes a, b, ab each twice; b×1 once more on b
    # N = 2 + 3 + 2 = 7
    assert pieces == {"a": (2, 3_500_000), "b": (3, 2_333_333),
                      "ab": (2, 3_500_000)}
    with pytest.raises(ValueError, match="max_piece_len"):
        unigram_seed_pieces(unigram_word_freqs(docs), max_piece_len=0)


def test_viterbi_reconstructs_and_prefers_cheap_pieces(spark):
    # "abab" dominates, so pieces 'ab'/'abab' are cheap; a rare word
    # segments into whatever survives
    docs = _docs(spark, ["abab abab abab abab cd"])
    words = unigram_word_freqs(docs)
    seg = {r["word"]: r for r in
           unigram_viterbi(words, unigram_seed_pieces(words)).collect()}
    for w, r in seg.items():
        assert r["seg"].replace(" ", "") == w
        assert r["n_pieces"] == len(r["seg"].split(" "))
    # the 4-char piece 'abab' exists and a single piece beats any split
    # on the (cost, k) order when its cost is no worse
    assert seg["abab"]["n_pieces"] == 1 and seg["abab"]["seg"] == "abab"


def test_viterbi_tiebreak_prefers_longer_piece(spark):
    # single word 'aa': pieces a (count 2), aa (count 1): N = 3
    # cost(a) = 3e6 // 2 = 1_500_000; path a+a = 3_000_000 with k=2
    # cost(aa) = 3e6 // 1 = 3_000_000 with k=1 → fewer pieces wins the
    # tie on cost, which is also the longer piece
    docs = _docs(spark, ["aa"])
    words = unigram_word_freqs(docs)
    out = unigram_viterbi(words, unigram_seed_pieces(words)).collect()
    assert [(r["seg"], r["n_pieces"], r["cost_micro"])
            for r in out] == [("aa", 1, 3_000_000)]


def test_em_prunes_unused_but_keeps_characters(spark):
    docs = _docs(spark, ["abab abab abab abab"])
    words = unigram_word_freqs(docs)
    seed = unigram_seed_pieces(words)
    model = unigram_lm_em_step(words, seed)
    pieces = {r["piece"] for r in model.collect()}
    # 'abab' won the only segmentation; substrings like 'ba'/'aba'
    # went unused and are pruned — single chars stay unconditionally
    assert "abab" in pieces and "a" in pieces and "b" in pieces
    assert "ba" not in pieces and "aba" not in pieces
    # add-one smoothing: the only used piece has count freq+1 = 5
    counts = {r["piece"]: r["count"] for r in model.collect()}
    assert counts["abab"] == 5 and counts["a"] == 1


def test_train_iterates_and_zero_iters_is_seed(spark):
    docs = _docs(spark, ["xy xy zw"])
    m0 = unigram_lm_train(docs, iters=0)
    m1 = unigram_lm_train(docs, iters=1)
    assert {r["piece"] for r in m1.collect()} \
        <= {r["piece"] for r in m0.collect()}
    with pytest.raises(ValueError, match="iters"):
        unigram_lm_train(docs, iters=-1)


def test_t19_plan_folds_one_corpus_scan(spark):
    """The whole unigram pipeline reads the corpus exactly once: the
    word-frequency fold is checkpointed, so the final segmentation's
    plan shows ZERO parquet scans — only the materialized RDD (the
    p16/t10 discipline)."""
    docs = load(spark, SF_DIR, "documents")
    words = unigram_word_freqs(docs)
    model = unigram_lm_em_step(words, unigram_seed_pieces(words))
    out = unigram_viterbi(words, model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0
    assert "Scan ExistingRDD" in plan
    assert out.count() > 0


def test_viterbi_unseen_char_yields_null_not_garbage(spark):
    """A persisted model applied to unseen data can meet a character
    outside its inventory: the word must come back as an explicit NULL
    (cost/k/seg), never a partial segmentation."""
    words = spark.createDataFrame([("az", 1), ("aa", 2)],
                                  "word string, freq bigint")
    pieces = spark.createDataFrame([("a", 3, 1_000_000)],
                                   "piece string, count bigint,"
                                   " score_micro bigint")
    out = {r["word"]: r for r in unigram_viterbi(words, pieces).collect()}
    assert out["aa"]["seg"] == "a a" and out["aa"]["n_pieces"] == 2
    bad = out["az"]
    assert bad["seg"] is None and bad["n_pieces"] is None \
        and bad["cost_micro"] is None


def test_t20_oov_accounting_and_persisted_depth(spark, tmp_path):
    """The corpus-encode fold: words past the persisted model's
    max_word_len surface as n_oov (never silently dropped), segmented
    words carry count-weighted piece/cost totals, and the apply step
    reads the DP depth from the persisted params — a model saved at
    max_piece_len=2 must segment with 2-char pieces even if the
    caller's session default says otherwise."""
    from projectone_spark.functions.text import (
        bpe_doc_word_counts, unigram_word_freqs_from_counts)
    from projectone_spark.store import TableStore
    from projectone_spark.store.models import load_model, save_model

    docs = _docs(spark, ["aa aa superlongword", "aa"])
    W = 4  # words longer than this are out-of-model
    wf = bpe_doc_word_counts(docs)
    words = unigram_word_freqs_from_counts(wf, W)
    model = unigram_lm_em_step(words, unigram_seed_pieces(words, 2), 2)
    store = TableStore(str(tmp_path / "store"))
    save_model(store, spark, "tok", "unigram_lm", model,
               params={"max_piece_len": 2, "max_word_len": W})
    loaded, meta = load_model(store, spark, "tok", kind="unigram_lm")
    L = int(meta["params"]["max_piece_len"])
    assert L == 2
    seg = unigram_viterbi(words, loaded, L).select(
        "word", "n_pieces", "cost_micro")
    oov = F.when(F.col("n_pieces").isNull(), F.col("__c"))
    out = {r["doc_id"]: r for r in (
        wf.select("doc_id", F.col("__w").alias("word"), "__c")
        .join(seg, "word", "left").groupBy("doc_id")
        .agg(F.sum("__c").alias("n_words"),
             F.coalesce(F.sum(oov), F.lit(0)).alias("n_oov"),
             F.coalesce(F.sum(F.col("__c") * F.col("n_pieces")),
                        F.lit(0)).alias("n_pieces")).collect())}
    # doc 0: 2x"aa" (1 piece each under the trained 2-char model) +
    # 1 oov word; doc 1: 1x"aa"
    assert out[0]["n_words"] == 3 and out[0]["n_oov"] == 1
    assert out[0]["n_pieces"] == 2
    assert out[1]["n_words"] == 1 and out[1]["n_oov"] == 0
    assert out[1]["n_pieces"] == 1


def test_viterbi_zero_candidate_word_yields_null_row(spark):
    """r9 review finding: a word with NO in-model candidate piece
    (every character outside a persisted model's inventory) used to
    vanish from the output entirely (inner piece join); the documented
    contract is an explicit NULL row callers can gate on."""
    words = spark.createDataFrame([("zz", 1), ("aa", 2)],
                                  "word string, freq bigint")
    pieces = spark.createDataFrame([("a", 3, 1_000_000)],
                                   "piece string, count bigint,"
                                   " score_micro bigint")
    out = {r["word"]: r for r in unigram_viterbi(words, pieces).collect()}
    assert set(out) == {"zz", "aa"}  # nothing dropped
    assert out["aa"]["seg"] == "a a"
    z = out["zz"]
    assert z["seg"] is None and z["n_pieces"] is None \
        and z["cost_micro"] is None and z["freq"] == 1
