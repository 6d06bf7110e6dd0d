"""Late-round-6 batch three: BM25 retrieval (t13), binary-Hamming funnel
retrieval (e13), UniMax budget allocation (p13) — hand-computed
arithmetic, the defining paper properties, and equivalence claims."""

import pytest

import pyspark.sql.functions as F

from projectone_spark.functions.embeddings import (
    knn_binary_hamming,
    knn_bruteforce,
    sign_words,
)
from projectone_spark.functions.sampling import unimax_allocation
from projectone_spark.functions.text import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------- t13


def test_bm25_hand_computed(spark):
    # d1 = "a b a", d2 = "a c"; query {a, b}: N=2, T=5, dl1=3, dl2=2,
    # df(a)=2, df(b)=1. With k1=6/5, b=3/4, NUM=44*tf*T*N,
    # DEN=df*(20*tf*T + 6*T + 18*dl*N):
    #   (a,d1): (880e6 + 338) div 676  = 1301775
    #   (b,d1): (440e6 + 119) div 238  = 1848739
    #   (a,d2): (440e6 + 202) div 404  = 1089109
    df = _docs(spark, [(1, "a b a"), (2, "a c")])
    rows = sorted(map(tuple, bm25_topk(df, {"q": ("a", "b")}).collect()))
    assert rows == [
        ("q", 1, 1, 2, 3, 1301775 + 1848739, 3.150514),
        ("q", 2, 2, 1, 2, 1089109, 1.089109),
    ]


def test_bm25_rarer_term_scores_higher(spark):
    # same tf/dl, but 'rare' appears in 1 doc vs 'common' in all: the
    # idf factor must rank the rare-term doc first
    df = _docs(spark, [(1, "rare pad pad"), (2, "common pad pad"),
                       (3, "common x y"), (4, "common u v")])
    rows = {(r["query_id"], r["doc_id"]): r["rank"]
            for r in bm25_topk(df, {"q": ("rare", "common")}).collect()}
    assert rows[("q", 1)] == 1  # rare-term doc outranks every common hit


def test_bm25_length_normalization(spark):
    # equal tf for the same term: the shorter document must score higher
    # (the b-term penalizes dl above avgdl)
    df = _docs(spark, [(1, "t x"), (2, "t x y z w u v p q r")])
    rows = [r["doc_id"] for r in
            bm25_topk(df, {"q": ("t",)}).orderBy("rank").collect()]
    assert rows == [1, 2]


def test_bm25_validation(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="empty"):
        bm25_topk(df, {"q": ()})
    with pytest.raises(ValueError, match="normalized"):
        bm25_topk(df, {"q": ("Upper case",)})
    with pytest.raises(ValueError, match="rationals"):
        bm25_topk(df, {"q": ("a",)}, b=(5, 4))


# ---------------------------------------------------------------- e13


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_sign_words_packing(spark):
    # 40 dims: bit i of word j set iff coord 32*j+i > 0
    vec = [1.0 if i in (0, 3, 33) else -1.0 for i in range(40)]
    df = _vecs(spark, [(1, vec)])
    w = df.select(*[c.alias(f"w{j}") for j, c in
                    enumerate(sign_words(F.col("embedding"), 40))]).first()
    assert (w["w0"], w["w1"]) == (0b1001, 0b10)


def test_binary_hamming_full_shortlist_equals_bruteforce(spark):
    # shortlist >= corpus makes stage 1 a no-op: the funnel must return
    # exactly the brute-force top-k (modulo the extra hamming column)
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)]
    corpus = _vecs(spark, rows)
    queries = corpus.filter(F.col("vec_id") < 3)
    got = sorted(map(tuple, knn_binary_hamming(
        corpus, queries, k=4, shortlist=30, dims=64)
        .select("query_id", "neighbor_id", "score", "rank").collect()))
    exp = sorted(map(tuple, knn_bruteforce(corpus, queries, k=4)
                     .select("query_id", "neighbor_id", "score", "rank")
                     .collect()))
    assert got == exp


def test_binary_hamming_orders_stage_one_by_sign_agreement(spark):
    # q = all-positive; c1 agrees in every sign, c2 flips all 64: the
    # hamming distances must be exactly 0 and 64
    q = [(0, [1.0] * 64)]
    c = [(1, [0.5] * 64), (2, [-0.5] * 64)]
    out = {r["neighbor_id"]: r["hamming"]
           for r in knn_binary_hamming(_vecs(spark, c + q),
                                       _vecs(spark, q), k=2,
                                       shortlist=2, dims=64).collect()}
    assert out == {1: 0, 2: 64}


def test_sign_words_validation(spark):
    with pytest.raises(ValueError, match="positive"):
        sign_words(F.lit(None), 0)


# ---------------------------------------------------------------- p13


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_unimax_hand_computed_mixed(spark):
    # langs a/b/c with 1/2/9 tokens; budget = 2*T = 24, cap = 2 epochs:
    # s = (2, 4, 18); a: 2*3 <= 24 capped; b: 4*2 <= 22 capped;
    # c: 18*1 <= 18 capped -- everything capped, leftover unallocated
    df = _corpus(spark, [(1, "w", "a"), (2, "w w", "b"),
                         (3, "w w w w w w w w w", "c")])
    rows = sorted(map(tuple, unimax_allocation(
        df, budget=(2, 1), cap_epochs=2).collect()))
    assert rows == [("a", 1, 2, True, 2, 2.0), ("b", 2, 4, True, 4, 2.0),
                    ("c", 9, 18, True, 18, 2.0)]


def test_unimax_remainder_distribution(spark):
    # langs (2, 2, 5, 5) tokens, budget = T div 2 = 7, cap = 1: even the
    # smallest cap test fails (2*4 = 8 > 7), so all four are uncapped:
    # base = 7 div 4 = 1, rem = 3 -> first three in (cap_tokens, lang)
    # order get the +1: allocations (2, 2, 2, 1)
    df = _corpus(spark, [(1, "w w", "a"), (2, "w w", "b"),
                         (3, "w w w w w", "c"), (4, "w w w w w", "d")])
    rows = sorted(map(tuple, unimax_allocation(
        df, budget=(1, 2), cap_epochs=1).collect()))
    assert [(r[0], r[3], r[4]) for r in rows] == [
        ("a", False, 2), ("b", False, 2), ("c", False, 2), ("d", False, 1)]


def test_unimax_epoch_rounding_is_half_up(spark):
    # alloc 1 of n 3 -> 333333.33 micro -> rounds to 0.333333; alloc 1
    # of 2 -> exactly 0.5
    df = _corpus(spark, [(1, "w w w", "a"), (2, "w w w", "b")])
    rows = sorted(map(tuple, unimax_allocation(
        df, budget=(1, 3), cap_epochs=1).collect()))
    assert [r[4] for r in rows] == [1, 1]
    assert [r[5] for r in rows] == [0.333333, 0.333333]


def test_unimax_validation(spark):
    df = _corpus(spark, [(1, "w", "a")])
    with pytest.raises(ValueError, match="positive"):
        unimax_allocation(df, budget=(0, 1))
    with pytest.raises(ValueError, match="positive"):
        unimax_allocation(df, cap_epochs=0)
