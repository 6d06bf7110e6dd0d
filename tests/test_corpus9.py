"""Round-8 operators: the Arrow-batched BPE vocabulary stage (t16), the
classifier calibration sweep (t17), variable-length duplicate-run
detection (d14), and the t15 weight-table materialization — hand-computed
arithmetic, engine equivalence, and plan-shape regressions."""

import pytest

import pyspark.sql.functions as F

from projectone_spark.functions.dedup import duplicate_run_stats
from projectone_spark.functions.text import (
    bpe_doc_word_counts,
    bpe_encode,
    bpe_vocab_encode,
    classifier_calibration,
    linear_token_classifier,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ------------------------------------------------------- t16 arrow engine


def test_arrow_engine_equals_expr_engine(spark):
    df = _docs(spark, [(1, "ab ab c aaaa"), (2, "banana bandana"),
                       (3, "the cat sat on the mat")])
    merges = [("a", "n"), ("a", "b"), ("an", "a"), ("t", "h"), ("aa", "aa")]
    a = sorted(map(tuple, bpe_encode(df, merges, engine="expr").collect()))
    b = sorted(map(tuple, bpe_encode(df, merges, engine="arrow").collect()))
    assert a == b and len(a) == 3


def test_arrow_engine_handles_tokenizer_scale_merges(spark):
    """>256 merges: the expression chain refuses, the arrow stage runs —
    verified against an independent pure-Python replace-chain reference."""
    df = _docs(spark, [(1, "ab ab c aaaa"), (2, "banana bandana")])
    merges = [(chr(97 + i % 26), chr(97 + (i * 7) % 26)) for i in range(300)]
    with pytest.raises(ValueError, match="codegen budget"):
        bpe_encode(df, merges, engine="expr")

    def ref_nsym(word):
        sym = "__" + "__".join(word) + "__"
        for left, right in merges:
            sym = sym.replace(f"_{left}__{right}_", f"_{left}{right}_")
        return len(sym.split("__")) - 2

    expect = []
    for doc_id, text in [(1, "ab ab c aaaa"), (2, "banana bandana")]:
        toks = text.split()
        nw, nc = len(toks), sum(map(len, toks))
        nb = sum(ref_nsym(t) for t in toks)
        expect.append((doc_id, nw, nc, nb,
                       ((2_000_000 * nb + nc) // (2 * nc)) / 1e6))
    got = sorted(map(tuple, bpe_encode(df, merges, engine="arrow").collect()))
    assert got == sorted(expect)


def test_arrow_engine_overlap_semantics_match(spark):
    """Consecutive-occurrence fusion ('aaaa' under (a,a)) must agree
    between Python str.replace and Catalyst replace — the exact case the
    left-to-right non-overlapping contract exists for."""
    df = _docs(spark, [(1, "aaaa aaa aa a")])
    for merges in ([("a", "a")], [("a", "a"), ("aa", "aa")],
                   [("a", "a"), ("aa", "a")]):
        a = bpe_encode(df, merges, engine="expr").collect()
        b = bpe_encode(df, merges, engine="arrow").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], merges


def test_bpe_rejects_malformed_merge_rules(spark):
    df = _docs(spark, [(1, "ab")])
    for bad in [("a_", "b")], [("a", "B")], [("", "b")], [("a\nb", "c")]:
        with pytest.raises(ValueError, match="symbol pairs"):
            bpe_encode(df, bad, engine="arrow")
        with pytest.raises(ValueError, match="symbol pairs"):
            bpe_encode(df, bad, engine="expr")
    with pytest.raises(ValueError, match="unknown bpe engine"):
        bpe_vocab_encode(df.select(F.lit("x").alias("__w")), [], engine="jit")


def test_bpe_vocab_encode_empty_partitions(spark):
    """mapInPandas sees empty Arrow batches for empty partitions — the
    stage must yield empty well-typed frames, not crash."""
    vocab = spark.createDataFrame([("cat",)], "__w string").repartition(8)
    got = bpe_vocab_encode(vocab, [("c", "a")], engine="arrow").collect()
    assert [tuple(r) for r in got] == [("cat", 3, 2)]


def test_arrow_engine_null_words_propagate_like_expr(spark):
    """A NULL word in an external vocabulary frame (the saved-tokenizer
    use case) must null-propagate to a NULL row under BOTH engines —
    not crash the pandas stage on one and yield a row on the other."""
    vocab = spark.createDataFrame([("cat",), (None,), ("ba",)],
                                  "__w string")
    merges = [("c", "a"), ("b", "a")]
    a = sorted(map(tuple, bpe_vocab_encode(
        vocab, merges, engine="arrow").collect()),
        key=lambda t: (t[0] is None, t))
    b = sorted(map(tuple, bpe_vocab_encode(
        vocab, merges, engine="expr").collect()),
        key=lambda t: (t[0] is None, t))
    assert a == b
    assert (None, None, None) in a and ("cat", 3, 2) in a


# ------------------------------------------------------- t17 calibration


def test_calibration_hand_computed(spark):
    scored = spark.createDataFrame(
        [(1_000_000, True), (600_000, True), (400_000, False), (0, False)],
        "score_micro bigint, label boolean")
    got = sorted(map(tuple, classifier_calibration(
        scored, step=500_000).collect()))
    # cutoff, tp, fp, fn, tn, precision, recall, f1
    assert got == [
        (0, 2, 2, 0, 0, 500_000, 1_000_000, 666_666),
        (500_000, 2, 0, 0, 2, 1_000_000, 1_000_000, 1_000_000),
        (1_000_000, 1, 0, 1, 2, 1_000_000, 500_000, 666_666),
    ]


def test_calibration_empty_and_one_sided_inputs(spark):
    empty = spark.createDataFrame([], "score_micro bigint, label boolean")
    rows = classifier_calibration(empty, step=250_000).collect()
    assert len(rows) == 5
    assert all((r["tp"], r["fp"], r["precision_micro"], r["recall_micro"])
               == (0, 0, None, None) for r in rows)
    # all-negative: recall undefined (NULL), precision 0 where fp > 0
    neg = spark.createDataFrame([(700_000, False)],
                                "score_micro bigint, label boolean")
    by_cut = {r["cutoff_micro"]: r for r in
              classifier_calibration(neg, step=500_000).collect()}
    assert by_cut[500_000]["fp"] == 1
    assert by_cut[500_000]["precision_micro"] == 0
    assert by_cut[500_000]["recall_micro"] is None
    assert by_cut[1_000_000]["fp"] == 0
    assert by_cut[1_000_000]["precision_micro"] is None


def test_calibration_negative_scores_never_predicted_positive(spark):
    """Bucketing is FLOOR division: a negative score must sit below
    cutoff 0 (fn/tn), not truncate into bucket 0 and count as predicted
    positive — the exact div-vs-// divergence the DuckDB oracle would
    expose."""
    scored = spark.createDataFrame(
        [(-10_000, True), (-600_000, False), (0, False), (500_000, True)],
        "score_micro bigint, label boolean")
    by_cut = {r["cutoff_micro"]: tuple(r) for r in
              classifier_calibration(scored, step=500_000).collect()}
    # cutoff 0: only the scores >= 0 predicted positive
    assert by_cut[0] == (0, 1, 1, 1, 1, 500_000, 500_000, 500_000)
    assert by_cut[500_000][1:5] == (1, 0, 1, 2)


def test_calibration_rejects_bad_grid(spark):
    scored = spark.createDataFrame([(1, True)],
                                   "score_micro bigint, label boolean")
    for step in (0, -5, 300_000):  # 300k does not divide 1e6
        with pytest.raises(ValueError, match="divisor"):
            classifier_calibration(scored, step=step)


# ------------------------------------------------------- d14 duplicate runs


def test_duplicate_runs_hand_computed(spark):
    df = _docs(spark, [
        (1, "a b c d e"),      # "a b","b c" shared with doc 2 -> run of 2
        (2, "x a b c y"),      # dup at positions 1,2 -> run of 2 (3 tokens)
        (3, "p q"),            # unique gram -> clean
        (4, "m n m n m"),      # self-repeat: every gram occurs twice
    ])
    got = {r["doc_id"]: tuple(r) for r in
           duplicate_run_stats(df, n=2, min_run_tokens=3).collect()}
    #               id  npos ndup nruns maxrun runtok keep
    assert got[1] == (1, 4, 2, 1, 3, 3, False)
    assert got[2] == (2, 4, 2, 1, 3, 3, False)
    assert got[3] == (3, 1, 0, 0, 0, 0, True)
    assert got[4] == (4, 4, 4, 1, 5, 5, False)


def test_duplicate_runs_gap_splits_runs(spark):
    """Two duplicated regions separated by a unique gram must coalesce
    into TWO runs, and a run below min_run_tokens is not flagged."""
    df = _docs(spark, [
        (1, "a b c q1x d e f"),   # runs: pos 0-1 ("a b","b c"), pos 4-5
        (2, "a b c q2x d e f"),
    ])
    got = {r["doc_id"]: r for r in
           duplicate_run_stats(df, n=2, min_run_tokens=3).collect()}
    assert got[1]["n_runs"] == 2 and got[1]["max_run_tokens"] == 3
    assert got[1]["run_tokens"] == 6 and not got[1]["keep"]
    # raise the bar above both runs: nothing flagged, doc kept
    kept = {r["doc_id"]: r for r in
            duplicate_run_stats(df, n=2, min_run_tokens=4).collect()}
    assert kept[1]["n_runs"] == 0 and kept[1]["keep"]
    assert kept[1]["n_dup_positions"] == 4  # dup positions still counted


def test_duplicate_runs_multi_row_ids_deterministic(spark):
    """The p14 multi-row-id contract: an appended union re-listing the
    same text must change NOTHING — per-document (position, gram)
    occurrences are pinned distinct, so gram frequencies don't double
    and the run window never sees tied positions (which would make
    row_number, and every run statistic, nondeterministic)."""
    df = _docs(spark, [
        (1, "a b c d e"), (2, "x a b c y"), (3, "p q"), (4, "m n m n m"),
    ])
    once = sorted(map(tuple, duplicate_run_stats(
        df, n=2, min_run_tokens=3).collect()))
    doubled = sorted(map(tuple, duplicate_run_stats(
        df.union(df), n=2, min_run_tokens=3).collect()))
    assert once == doubled


def test_duplicate_runs_short_docs_absent_and_args(spark):
    df = _docs(spark, [(1, "one"), (2, "")])
    assert duplicate_run_stats(df, n=2, min_run_tokens=2).count() == 0
    with pytest.raises(ValueError, match="min_run_tokens"):
        duplicate_run_stats(df, n=8, min_run_tokens=7)
    with pytest.raises(ValueError, match="n must be"):
        duplicate_run_stats(df, n=0, min_run_tokens=5)


# ----------------------------------------------------- f13 bloom sizing


def test_bloom_m_bits_formula():
    from projectone_spark.functions.sampling import bloom_m_bits

    assert bloom_m_bits(0) == 64
    assert bloom_m_bits(4) == 64
    assert bloom_m_bits(5) == 128          # 80 bits -> next mult of 64
    assert bloom_m_bits(4096) == 65536     # 16 bits/key exactly
    assert bloom_m_bits(100, bits_per_key=1) == 128
    with pytest.raises(ValueError, match="bits_per_key"):
        bloom_m_bits(10, bits_per_key=0)
    with pytest.raises(ValueError, match="n_keys"):
        bloom_m_bits(-1)


def test_sized_bloom_survives_large_benchmark(spark):
    """The f13-at-sf0.1 regression: a fixed 8 KiB bitset saturates once
    the benchmark carries tens of thousands of shingles and a 75%%-
    containment gate then drops EVERYTHING. The sized bloom must keep
    clean documents passing."""
    import random

    from projectone_spark.functions.sampling import (
        bloom_doc_flags, bloom_exact_shingles, bloom_m_bits)

    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(4000)]
    bench = spark.createDataFrame(
        [(i, "eval", " ".join(rng.choice(vocab) for _ in range(120)))
         for i in range(300)], "doc_id bigint, source string, text string")
    clean = spark.createDataFrame(
        [(1000 + i, "web", " ".join(f"z{i}x{j}" for j in range(60)))
         for i in range(10)], "doc_id bigint, source string, text string")
    m = bloom_m_bits(bloom_exact_shingles(bench).count())
    assert m > 65536  # the fixed default would be undersized here
    flags = bloom_doc_flags(clean, bench, m_bits=m)
    import pyspark.sql.functions as F
    kept = flags.filter(4 * F.col("__n_bl") <= 3 * F.col("__n_sh")).count()
    assert kept == 10  # no shared shingles -> everything passes the gate


# ------------------------------------------- t15 weight materialization


def test_classifier_weight_fold_sits_below_scoring_join(spark):
    """r8 refactor (VERDICT item 7): the DECIMAL(38,0) weight expression
    must be folded on the vocabulary side BELOW the scoring join (the
    join ships a finished BIGINT), not recomputed per (doc, term) row
    above it. In the optimized plan's tree rendering a parent prints
    before its children, so the decimal cast appearing only after the
    first Join line proves the fold happens under it."""
    df = _docs(spark, [(i, t) for i, t in enumerate(
        ["the cat", "a dog", "le chat", "der hund"] * 3)])
    out = linear_token_classifier(df, label=F.lit(True),
                                  train=F.col("doc_id") % 2 == 0)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "decimal(38,0)" in plan
    assert plan.index("Join") < plan.index("decimal(38,0)")


def test_bpe_doc_word_counts_schema(spark):
    df = _docs(spark, [(1, "b a a"), (2, "")])
    rows = sorted(map(tuple, bpe_doc_word_counts(df).collect()))
    assert rows == [(1, "a", 2), (1, "b", 1)]


# -------------------------------------------------- d15 run removal


def test_duplicate_run_removal_hand_computed(spark):
    from projectone_spark.functions.dedup import duplicate_run_removal

    df = _docs(spark, [
        (1, "a b c d e"),      # run pos 0-1 -> tokens [0,2] removed
        (2, "x a b c y"),      # run pos 1-2 -> tokens [1,3] removed
        (3, "p q"),            # clean
        (4, "m n m n m"),      # self-repeat covers the whole doc
    ])
    got = {r["doc_id"]: tuple(r) for r in
           duplicate_run_removal(df, n=2, min_run_tokens=3).collect()}
    #               id  ntok nruns removed kept
    assert got[1] == (1, 5, 1, 3, 2)
    assert got[2] == (2, 5, 1, 3, 2)
    assert got[3] == (3, 2, 0, 0, 2)
    assert got[4] == (4, 5, 1, 5, 0)


def test_duplicate_run_removal_merges_overlapping_spans(spark):
    """Two flagged runs whose TOKEN spans overlap (position gap < n)
    must count the union once — the running-max interval merge."""
    from projectone_spark.functions.dedup import duplicate_run_removal

    # doc 1's 3-gram dup positions are {0,1,3,4} (pos 2 unique): islands
    # [0,1] and [3,4], token intervals [0,3] and [3,6] -> union [0,6]
    df = _docs(spark, [
        (1, "a b c d e f g"),
        (2, "a b c d x d e f g"),
    ])
    got = {r["doc_id"]: r for r in
           duplicate_run_removal(df, n=3, min_run_tokens=4).collect()}
    assert got[1]["n_runs"] == 2
    assert got[1]["tokens_removed"] == 7 and got[1]["tokens_kept"] == 0
    # doc 2's intervals [0,3] and [5,8] are disjoint: 8 of 9 removed
    assert got[2]["tokens_removed"] == 8 and got[2]["tokens_kept"] == 1


def test_duplicate_run_removal_consistent_with_stats(spark):
    """n_runs must agree with d14 and the interval UNION can never
    exceed d14's per-run token sum (spans may overlap)."""
    from projectone_spark.functions.dedup import (
        duplicate_run_removal, duplicate_run_stats)

    df = _docs(spark, [(i, t) for i, t in enumerate(
        ["a b c d e", "x a b c y", "m n m n m", "a b c d x d e f g",
         "p q r s t u v w"])])
    stats = {r["doc_id"]: r for r in
             duplicate_run_stats(df, n=2, min_run_tokens=3).collect()}
    rem = {r["doc_id"]: r for r in
           duplicate_run_removal(df, n=2, min_run_tokens=3).collect()}
    assert set(stats) == set(rem)
    for i in stats:
        assert stats[i]["n_runs"] == rem[i]["n_runs"]
        assert rem[i]["tokens_removed"] <= stats[i]["run_tokens"] \
            or stats[i]["n_runs"] == 0
        assert rem[i]["tokens_removed"] + rem[i]["tokens_kept"] \
            == rem[i]["n_tokens"]


# ------------------------------------------------------- t18 ROC-AUC


def test_roc_auc_hand_computed(spark):
    from projectone_spark.functions.text import roc_auc_exact

    scored = spark.createDataFrame(
        [(90, True), (80, False), (80, True), (70, False)],
        "score_micro bigint, label boolean")
    row = roc_auc_exact(scored).collect()[0]
    # pairs: (90>80F), (90>70), (80T=80F ties half), (80T>70) -> U=3.5
    assert tuple(row) == (2, 2, 3, 7, 875_000)


def test_roc_auc_degenerate_classes(spark):
    from projectone_spark.functions.text import roc_auc_exact

    pos_only = spark.createDataFrame([(10, True), (20, True)],
                                     "score_micro bigint, label boolean")
    row = roc_auc_exact(pos_only).collect()[0]
    assert row["auc_micro"] is None and row["n_neg"] == 0
    # perfect separation -> exactly 1.0
    sep = spark.createDataFrame(
        [(100, True), (90, True), (10, False)],
        "score_micro bigint, label boolean")
    assert roc_auc_exact(sep).collect()[0]["auc_micro"] == 1_000_000


# -------------------------------------------- e15 farthest-first seeds


def test_farthest_first_hand_computed(spark):
    from projectone_spark.functions.embeddings import kmeans_farthest_first

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 0.0]), (3, [0.0, 4.0]), (4, [1.0, 1.0])],
        "vec_id bigint, embedding array<float>")
    got = sorted(map(tuple, kmeans_farthest_first(emb, k=3).collect()))
    assert got == [(0, 1, None), (1, 3, 16.0), (2, 2, 9.0)]


def test_farthest_first_ties_and_edges(spark):
    from projectone_spark.functions.embeddings import kmeans_farthest_first

    # equidistant candidates: the lower id wins
    emb = spark.createDataFrame(
        [(1, [0.0]), (2, [2.0]), (3, [-2.0])],
        "vec_id bigint, embedding array<float>")
    got = sorted(map(tuple, kmeans_farthest_first(emb, k=2).collect()))
    assert got == [(0, 1, None), (1, 2, 4.0)]
    # k=1 is just the deterministic start
    assert [tuple(r) for r in
            kmeans_farthest_first(emb, k=1).collect()] == [(0, 1, None)]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        kmeans_farthest_first(emb.filter("vec_id > 99"), k=2)
    with _pytest.raises(ValueError, match="k must be"):
        kmeans_farthest_first(emb, k=0)


def test_bpe_vocab_rejects_hostile_words(spark):
    """External saved-tokenizer vocabularies get the same loud
    precondition as sep/merges: a newline word would silently shift
    every later word's count in the arrow blob, a sep-bearing word
    corrupts the double-separator encoding in BOTH engines."""
    for bad in ("a\nb", "a_b"):
        # one partition → one task: with the 2-row frame spread over
        # several tasks, the raising task's ValueError can lose the
        # job-abort race to a cancelled sibling's CancelledKeyException
        # and the driver-visible message misses the match (seen r12)
        vocab = spark.createDataFrame([(bad,), ("ok",)],
                                      "__w string").coalesce(1)
        with pytest.raises(Exception, match="must not contain"):
            bpe_vocab_encode(vocab, [("o", "k")], engine="arrow").collect()


def test_bpe_vocab_empty_string_matches_expr(spark):
    """'' encodes to zero symbols under BOTH engines (the expr sym for
    '' is just the bare separator pair)."""
    vocab = spark.createDataFrame([("",), ("ab",)], "__w string")
    a = sorted(map(tuple, bpe_vocab_encode(
        vocab, [("a", "b")], engine="arrow").collect()))
    b = sorted(map(tuple, bpe_vocab_encode(
        vocab, [("a", "b")], engine="expr").collect()))
    assert a == b and ("", 0, 0) in a and ("ab", 2, 1) in a


def test_farthest_first_rejects_k_beyond_distinct(spark):
    """Once every remaining point coincides with a chosen seed the
    traversal must refuse, not silently return duplicate seeds."""
    from projectone_spark.functions.embeddings import kmeans_farthest_first

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 0.0])],
        "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_farthest_first(emb, k=3)


def test_winnow_min_shared_floor(spark):
    """MOSS's minimum-match floor: real near-dups share many kept
    fingerprints and survive a small floor; raising the floor above
    their overlap suppresses the pair — and the default floor of 1 is
    the original gate (d13/f12 behavior unchanged)."""
    from projectone_spark.functions.dedup import winnow_fingerprint_pairs

    base = ("the quick brown fox jumps over the lazy dog while the "
            "band plays an unusual tune about distant mountains and "
            "rivers flowing toward the endless sea at dawn")
    df = _docs(spark, [(1, base), (2, base + " extra closing words"),
                       (3, "completely different content about xylophones "
                           "quartz and jigsaw puzzles near the zoo")])
    pairs = winnow_fingerprint_pairs(df).collect()
    assert len(pairs) == 1 and pairs[0]["doc_id_a"] == 1
    shared = pairs[0]["n_shared"]
    assert shared >= 3
    still = winnow_fingerprint_pairs(df, min_shared=shared).collect()
    assert len(still) == 1
    gone = winnow_fingerprint_pairs(df, min_shared=shared + 1).collect()
    assert gone == []


def test_quality_weighted_sample_exact_verdicts(spark):
    """Every keep verdict is the exact integer compare of the md5
    uniform against the score — reproduced here in pure Python — and
    the clamp falls out for free (score<=0 never kept, >=scale always)."""
    import hashlib

    from projectone_spark.functions.sampling import quality_weighted_sample

    rows = [(1, -5), (2, 0), (3, 250_000), (4, 999_999),
            (5, 1_000_000), (6, 2_000_000)]
    scored = spark.createDataFrame(rows, "doc_id bigint, score_micro bigint")
    got = {r["doc_id"]: r["kept"] for r in
           quality_weighted_sample(scored).collect()}
    for i, s in rows:
        u = int(hashlib.md5(f"qws:{i}".encode()).hexdigest()[:8], 16)
        assert got[i] == (u * 1_000_000 < s * 4294967296), (i, s, u)
    assert not got[1] and not got[2]   # clamp low
    assert got[5] and got[6]           # clamp high
    with pytest.raises(ValueError, match="scale"):
        quality_weighted_sample(scored, scale=0)


# ------------------------------------------------------- f14 ablation


def test_f14_matrix_partitions_the_corpus(spark):
    """The 2^3 verdict matrix must PARTITION the tokenized corpus: every
    combination row is distinct, doc and token masses are positive, and
    the totals equal the corpus (docs with >= 1 token outside the
    benchmark split)."""
    from projectone_spark.queries import REGISTRY, queries
    from tests.conftest import SF_DIR

    queries()
    rows = REGISTRY["f14_filter_ablation"].fn(spark, SF_DIR).collect()
    combos = [(r["g_keep"], r["q_keep"], r["c_clean"]) for r in rows]
    assert len(combos) == len(set(combos)) <= 8
    assert all(r["n_docs"] > 0 and r["n_tokens"] > 0 for r in rows)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from projectone_spark.functions.text import tokens
    want = (docs.filter(F.col("doc_id") % 97 != 0)
            .filter(F.size(tokens("text")) > 0).count())
    assert sum(r["n_docs"] for r in rows) == want
    # the quality gate is a median split: the q_keep=True half holds at
    # least as many docs as half the corpus (percentile_disc keeps ties)
    q_true = sum(r["n_docs"] for r in rows if r["q_keep"])
    assert 2 * q_true >= want
