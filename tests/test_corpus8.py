"""Round-7 batch one: BPE corpus encoding (t14) and the fastText-style
linear classifier (t15) — hand-computed arithmetic, edge cases, and the
one-corpus-scan plan shapes."""

import pytest

import pyspark.sql.functions as F

from projectone_spark.functions.text import (
    bpe_encode,
    bpe_train_merges,
    linear_token_classifier,
)
from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------- t14


def test_bpe_encode_hand_computed(spark):
    # merge (a,b): "ab" -> 1 symbol, "c" stays 1. doc 1 = "ab ab c":
    # n_words=3, n_chars=5, n_bpe=3, compression=(2e6*3+5)//10 = 600000
    df = _docs(spark, [(1, "ab ab c")])
    rows = bpe_encode(df, [("a", "b")]).collect()
    assert [tuple(r) for r in rows] == [(1, 3, 5, 3, 0.6)]


def test_bpe_encode_zero_merges_is_char_count(spark):
    df = _docs(spark, [(1, "hello big world"), (2, "xy")])
    got = {r["doc_id"]: r for r in bpe_encode(df, []).collect()}
    assert got[1]["n_bpe_tokens"] == got[1]["n_chars"] == 13
    assert got[1]["compression"] == 1.0
    assert got[2]["n_bpe_tokens"] == 2


def test_bpe_encode_merge_order_and_chaining(spark):
    # rules learned in order: (a,b) then (ab,c) — the second consumes the
    # first's output symbol; "abc" must encode to ONE token while "acb"
    # (same chars, wrong order) gets none of the merges
    df = _docs(spark, [(1, "abc"), (2, "acb")])
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_encode(df, [("a", "b"), ("ab", "c")]).collect()}
    assert got == {1: 1, 2: 3}


def test_bpe_encode_consecutive_merges_left_to_right(spark):
    # pair (a,a) over "aaaa" -> aa+aa (2), over "aaa" -> aa+a (2): the
    # training-side replace semantics, applied identically at encode time
    df = _docs(spark, [(1, "aaaa"), (2, "aaa")])
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_encode(df, [("a", "a")]).collect()}
    assert got == {1: 2, 2: 2}


def test_bpe_encode_drops_tokenless_docs(spark):
    df = _docs(spark, [(1, "ok"), (2, ""), (3, "!!!")])
    assert {r["doc_id"] for r in bpe_encode(df, []).collect()} == {1}


def test_bpe_encode_rejects_bad_sep_and_huge_tables(spark):
    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="sep"):
        bpe_encode(df, [], sep="a")
    # regex metacharacters would corrupt F.split(sym, sep2) silently
    # ('.' matches anything) or crash it ('(' is a PatternSyntaxException)
    for bad in (".", "(", "|", "*"):
        with pytest.raises(ValueError, match="sep"):
            bpe_encode(df, [], sep=bad)
        with pytest.raises(ValueError, match="sep"):
            bpe_train_merges(df, sep=bad)
    with pytest.raises(ValueError, match="codegen budget"):
        bpe_encode(df, [("a", "b")] * 257)


def test_t14_oracle_survives_pair_exhaustion(spark):
    """When training runs out of pairs before n_merges, the later b{i}
    CTEs are EMPTY — the encode oracle's apply chain must treat an absent
    rule as a no-op level (LEFT JOIN), not vaporize every row (CROSS
    JOIN), and must keep matching the Spark side, which applies only the
    rules that were actually learned."""
    import duckdb

    from projectone_spark.queries.corpus7 import _t14_sql

    docs = [(1, "ab"), (2, "ab ab b")]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in docs)
                + ") t(doc_id, text)")
    exp = sorted(map(tuple, con.execute(_t14_sql()).fetchall()))
    assert exp, "oracle vaporized all rows on pair exhaustion"
    df = _docs(spark, docs)
    rules = bpe_train_merges(df, n_merges=8).collect()
    assert len(rules) < 8  # training genuinely exhausted
    got = sorted(map(tuple, bpe_encode(
        df, [(r["left_sym"], r["right_sym"]) for r in rules]).collect()))
    assert got == exp


def test_bpe_roundtrip_train_then_encode(spark):
    # encoding with the trained rules can only shrink token counts, and
    # every merge that fired at training time fires at encode time too
    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    rules = bpe_train_merges(docs, n_merges=4).collect()
    merges = [(r["left_sym"], r["right_sym"]) for r in rules]
    out = bpe_encode(docs, merges)
    bad = out.filter(F.col("n_bpe_tokens") > F.col("n_chars")).count()
    assert bad == 0
    saved = out.agg(F.sum(F.col("n_chars") - F.col("n_bpe_tokens"))).first()[0]
    assert saved > 0  # the trained rules actually compress the corpus


def test_bpe_encode_computes_corpus_pipeline_once(spark):
    """The encode stage computes the scan→tokenize→explode→count pipeline
    ONCE (the d10 checkpoint discipline): both join inputs read the
    checkpointed (doc, word) counts — two 'Scan ExistingRDD' nodes, ZERO
    parquet scans — and the replace chain never rides a corpus-sized
    relation. (The t10 exchange-reuse fold does not survive here: column
    pruning collapses a count-free vocabulary fold into a plain distinct
    with its own scan.)"""
    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    out = bpe_encode(docs, [("t", "h"), ("th", "e")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert plan.count("Scan parquet") == 0, plan
    assert plan.count("Scan ExistingRDD") == 2, plan


# ---------------------------------------------------------------- t15


def test_linear_classifier_hand_computed(spark):
    # train: d0 (pos, "good good"), d1 (neg, "bad"); apply: d2, d3.
    # cpos/cneg: good 2/0, bad 0/1; npos=2, nneg=1, V=2.
    # w(good) = ((1e6*3) div 1 * 3) div 4 = 2_250_000
    # w(bad)  = ((1e6*1) div 2 * 3) div 4 =   375_000
    # d2 "good bad": dot=2_625_000, n=2, logit=1_312_500,
    #   score=(1_312_500+1e6) div 4 = 578_125 -> pred True
    # d3 "bad bad": dot=750_000, n=2, logit=375_000,
    #   score=1_375_000 div 4 = 343_750 -> pred False
    df = _docs(spark, [(0, "good good"), (1, "bad"),
                       (2, "good bad"), (3, "bad bad")])
    rows = sorted(map(tuple, linear_token_classifier(
        df, label=F.col("doc_id") % 2 == 0,
        train=F.col("doc_id") < 2).collect()))
    assert rows == [(2, 2, 1_312_500, 578_125, True, True),
                    (3, 2, 375_000, 343_750, False, False)]


def test_linear_classifier_clamps_and_oov(spark):
    # hot: cpos=1/cneg=0, cold: cpos=0/cneg=9 -> npos=1, nneg=9, V=2:
    # w(hot) = (2e6 div 1)*(9+2) div (1+2) = 7_333_333 -> the hard
    # sigmoid saturates (logit >= 3e6) and score clamps at 1e6 exactly.
    # "zzz" is out-of-vocabulary: dropped, n_tokens counts in-vocab
    # tokens only.
    df = _docs(spark, [(0, "hot"),
                       (1, "cold cold cold cold cold cold cold cold cold"),
                       (2, "hot zzz")])
    row = linear_token_classifier(
        df, label=F.col("doc_id") == 0, train=F.col("doc_id") < 2) \
        .filter(F.col("doc_id") == 2).first()
    assert row["n_tokens"] == 1  # zzz dropped
    assert row["score_micro"] == 1_000_000
    assert row["pred"] is True


def test_linear_classifier_excludes_train_split(spark):
    df = _docs(spark, [(0, "a"), (1, "b"), (2, "a b")])
    out = linear_token_classifier(
        df, label=F.lit(True), train=F.col("doc_id") < 2)
    assert {r["doc_id"] for r in out.collect()} == {2}


def test_linear_classifier_computes_corpus_pipeline_once(spark):
    """Train-split and apply-split both read the checkpointed (doc, term)
    counts: the split filters push below the aggregate (the flag is a
    grouping column), so without the checkpoint each branch would re-scan
    the corpus. Three consumers (weight table, totals fold via the weight
    table, scoring join) — zero parquet scans."""
    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    out = linear_token_classifier(
        docs, label=F.col("lang") == "en", train=F.col("doc_id") % 7 == 0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert plan.count("Scan parquet") == 0, plan
    assert plan.count("Scan ExistingRDD") >= 2, plan


# ---------------------------------------------------------------- p14


def test_ngram_contamination_hand_computed(spark):
    from projectone_spark.functions.sampling import token_ngram_contamination

    # n=3 for a hand-checkable case. bench holds "a b c d" -> trigrams
    # {a b c, b c d}. doc 1 quotes "a b c" verbatim inside noise (1 of
    # its 4 trigrams dirty); doc 2 shares no trigram; doc 3 is too short
    # for any trigram and must be ABSENT (vacuously clean).
    corpus = spark.createDataFrame(
        [(1, "x a b c y z", "s1"), (2, "a c b d a c", "s1"),
         (3, "a b", "s2")],
        "doc_id bigint, text string, source string")
    bench = spark.createDataFrame([(99, "a b c d", "s9")],
                                  "doc_id bigint, text string, source string")
    rows = sorted(map(tuple, token_ngram_contamination(
        corpus, bench, n=3).collect()))
    assert rows == [(1, "s1", 4, 1, True), (2, "s1", 4, 0, False)]


def test_ngram_contamination_distinct_grams_per_doc(spark):
    from projectone_spark.functions.sampling import token_ngram_contamination

    # the quoted trigram appears TWICE in doc 1 but counts once:
    # grams are distinct per document (the d10 discipline)
    corpus = spark.createDataFrame([(1, "a b c q a b c", "s1")],
                                   "doc_id bigint, text string, source string")
    bench = spark.createDataFrame([(9, "a b c", "s9")],
                                  "doc_id bigint, text string, source string")
    row = token_ngram_contamination(corpus, bench, n=3).first()
    assert (row["n_grams"], row["n_dirty"], row["dirty"]) == (4, 1, True)


def test_ngram_contamination_distinct_across_rows_of_one_doc(spark):
    from projectone_spark.functions.sampling import token_ngram_contamination

    # an appended union can carry the SAME doc_id twice; distinctness is
    # per DOCUMENT (the oracle's contract), not per row
    corpus = spark.createDataFrame(
        [(1, "a b c", "s1"), (1, "a b c", "s1")],
        "doc_id bigint, text string, source string")
    bench = spark.createDataFrame([(9, "a b c", "s9")],
                                  "doc_id bigint, text string, source string")
    rows = token_ngram_contamination(corpus, bench, n=3).collect()
    assert [tuple(r) for r in rows] == [(1, "s1", 1, 1, True)]


def test_ngram_contamination_rejects_bad_n(spark):
    from projectone_spark.functions.sampling import token_ngram_contamination

    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="n must"):
        token_ngram_contamination(df, df, n=0)
