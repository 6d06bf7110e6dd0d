"""Late-round-6 batch two: BPE merge training (t12), DSIR importance
weighting (p12), Matryoshka funnel retrieval (e12) — hand-computed
arithmetic, the defining paper properties, and plan-shape claims."""

import contextlib
import io

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

from projectone_spark.functions.embeddings import knn_bruteforce, knn_matryoshka
from projectone_spark.functions.sampling import dsir_importance
from projectone_spark.functions.text import bpe_train_merges


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------- t12


def test_bpe_textbook_merges(spark):
    # the Sennrich et al. running example shape: 'low'-family words make
    # (l,o) then (lo,w) the first merges; 'new'-family follows
    df = _docs(spark, [(1, "low lower lowest low low"),
                       (2, "new newer newest new")])
    rows = [(r["step"], r["left_sym"], r["right_sym"], r["merged"],
             r["pair_count"]) for r in bpe_train_merges(df, n_merges=4).collect()]
    assert rows[:2] == [(1, "l", "o", "lo", 5), (2, "lo", "w", "low", 5)]
    assert rows[2:] == [(3, "e", "w", "ew", 4), (4, "n", "ew", "new", 4)]


def test_bpe_overlap_merges_left_to_right(spark):
    # 'aaaa': pair (a,a) occurs at 3 positions (overlaps counted, like
    # the reference get_stats); the greedy left-to-right merge fuses
    # non-overlapping occurrences -> 'aa'+'aa', then (aa,aa) merges
    df = _docs(spark, [(1, "aaaa")])
    rows = [(r["step"], r["merged"], r["pair_count"])
            for r in bpe_train_merges(df, n_merges=2).collect()]
    assert rows == [(1, "aa", 3), (2, "aaaa", 1)]


def test_bpe_stops_early_when_out_of_pairs(spark):
    # single-char words have no adjacent pairs at all -> zero merges;
    # 'ab' yields exactly one learnable pair then runs dry
    assert bpe_train_merges(_docs(spark, [(1, "a b a")]), n_merges=5).count() == 0
    rows = bpe_train_merges(_docs(spark, [(1, "ab ab")]), n_merges=5).collect()
    assert [(r["step"], r["merged"]) for r in rows] == [(1, "ab")]


def test_bpe_tie_break_and_types(spark):
    # (a,b) and (c,d) both count 1: the (left, right) ASC tie-break must
    # pick (a,b) first, deterministically
    df = _docs(spark, [(1, "ab cd")])
    out = bpe_train_merges(df, n_merges=1)
    dt = dict(out.dtypes)
    assert dt["step"] == "bigint" and dt["pair_count"] == "bigint"
    assert [r["merged"] for r in out.collect()] == ["ab"]


# ---------------------------------------------------------------- p12


def _ldocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_dsir_hand_computed(spark):
    # target doc 'a b', raw also has 'a c'. c_raw: a=2 b=1 c=1, N_raw=4;
    # c_tgt: a=1 b=1, N_tgt=2.
    # micro(a) = ((1e6*1) div 2) * 4 div 2 = 1_000_000
    # micro(b) = ((1e6*1) div 1) * 4 div 2 = 2_000_000 ; micro(c) = 0
    df = _ldocs(spark, [(1, "a b", "en"), (2, "a c", "fr")])
    got = {r["doc_id"]: r for r in dsir_importance(df).collect()}
    assert got[1]["is_target"] is True and got[2]["is_target"] is False
    assert got[1]["dsir_micro"] == 3_000_000 and got[1]["dsir"] == 1.5
    assert got[2]["dsir_micro"] == 1_000_000 and got[2]["dsir"] == 0.5


def test_dsir_target_docs_outscore_on_average(spark):
    # two disjoint vocabularies: target-domain tokens score >> raw-only
    df = _ldocs(spark, [(i, "alpha beta gamma", "en") for i in range(5)]
                + [(i, "delta epsilon zeta", "fr") for i in range(5, 10)])
    got = dsir_importance(df).collect()
    tgt = [r["dsir"] for r in got if r["is_target"]]
    raw = [r["dsir"] for r in got if not r["is_target"]]
    assert min(tgt) > max(raw)
    assert max(raw) == 0.0  # no target mass on the fr-only vocabulary


def test_dsir_empty_target_is_all_zero_not_error(spark):
    df = _ldocs(spark, [(1, "a b", "fr"), (2, "c d", "de")])
    rows = dsir_importance(df).collect()
    assert {r["dsir_micro"] for r in rows} == {0}


def test_dsir_types_and_single_scan_plan(spark):
    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    out = dsir_importance(docs)
    dt = dict(out.dtypes)
    assert dt["dsir_micro"] == "bigint" and dt["dsir"] == "double"
    out.collect()  # stage reuse is a RUNTIME property under AQE
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan
    final = plan.split("== Initial Plan ==")[0]
    # one corpus scan as a deterministic plan property: the doc-term
    # table is checkpointed (see test_corpus5's bigram twin for why the
    # folds stopped relying on AQE runtime stage reuse), so the
    # vocabulary aggregate and the totals read the materialized RDD
    assert final.count("Scan parquet") == 0, final
    assert "Scan ExistingRDD" in final, final


# ---------------------------------------------------------------- e12


def test_matryoshka_full_shortlist_equals_bruteforce(spark):
    # with the shortlist covering the whole corpus, the funnel's stage-2
    # rerank IS brute force — exact equality, the e08/e09 adjudication
    # pattern applied to MRL retrieval
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    n = emb.count()
    got = sorted(map(tuple, knn_matryoshka(emb, qs, k=5, shortlist=n)
                     .select("query_id", "neighbor_id", "score", "rank")
                     .collect()))
    exp = sorted(map(tuple, knn_bruteforce(emb, qs, k=5)
                     .select("query_id", "neighbor_id", "score", "rank")
                     .collect()))
    assert got == exp


def test_matryoshka_prefix_score_uses_prefix_only(spark):
    # query q = corpus vector 2's PREFIX but an opposite suffix: stage 1
    # must score them as perfectly aligned (pscore 1.0) even though the
    # full-dimension rerank says otherwise
    rows = [(1, [1.0, 0.0, 0.0, 1.0]), (2, [0.0, 1.0, 1.0, 0.0]),
            (3, [0.0, 1.0, -1.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qs = emb.filter(F.col("vec_id") == 3)
    got = {r["neighbor_id"]: r
           for r in knn_matryoshka(emb, qs, k=2, prefix_dims=2,
                                   shortlist=2).collect()}
    assert got[2]["pscore"] == 1.0  # prefixes identical
    assert got[2]["score"] < 0.1    # full vectors nearly orthogonal


def test_matryoshka_plan_broadcasts_queries_no_python(spark):
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        knn_matryoshka(emb, qs).explain("formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan
    tree = plan.split("(1) ")[0]
    # the query side broadcasts; the corpus is never shuffle-joined
    assert "BroadcastNestedLoopJoin" in tree
    assert "SortMergeJoin" not in tree
