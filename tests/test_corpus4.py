"""Unigram-surprisal quality scoring (t10): hand-computed arithmetic,
exclusion of token-less docs, and the scale-shape plan claims."""

import contextlib
import io

import pyspark.sql.functions as F

from projectone_spark.functions.text import unigram_surprise


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_unigram_surprise_hand_computed(spark):
    # corpus: N=5 tokens, c(a)=2, c(b)=2, c(c)=1
    # micro(a)=micro(b)=2_500_000, micro(c)=5_000_000
    df = _docs(spark, [(1, "a a b"), (2, "b c")])
    got = {r["doc_id"]: r for r in unigram_surprise(df).collect()}
    assert got[1]["n_tokens"] == 3
    assert got[1]["surprise_micro"] == 2 * 2_500_000 + 2_500_000
    assert got[1]["surprise"] == 2.5
    assert got[2]["n_tokens"] == 2
    assert got[2]["surprise_micro"] == 2_500_000 + 5_000_000
    assert got[2]["surprise"] == 3.75


def test_unigram_surprise_rare_tokens_score_higher(spark):
    common = " ".join(["the"] * 20)
    df = _docs(spark, [(1, common), (2, common + " zyzzyva")])
    got = {r["doc_id"]: r["surprise"] for r in unigram_surprise(df).collect()}
    assert got[2] > got[1]


def test_unigram_surprise_drops_tokenless_docs(spark):
    df = _docs(spark, [(1, "a b"), (2, "!!! ???"), (3, "")])
    ids = {r["doc_id"] for r in unigram_surprise(df).collect()}
    assert ids == {1}


def test_unigram_surprise_integer_columns_are_exact_bigints(spark):
    df = _docs(spark, [(1, "x y"), (2, "y z")])
    out = unigram_surprise(df)
    dt = dict(out.dtypes)
    assert dt["n_tokens"] == "bigint"
    assert dt["surprise_micro"] == "bigint"
    assert dt["surprise"] == "double"


def test_unigram_surprise_plan_no_python_no_corpus_broadcast(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        unigram_surprise(docs).explain("formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan
    # the single-row corpus-total is the ONLY hinted broadcast; the
    # vocabulary join is left to AQE (broadcast while it fits, shuffle
    # join at 100 TB vocabularies)
    assert plan.count("ResolvedHint") <= 1


def test_bloom_positions_deterministic_in_range(spark):
    from projectone_spark.functions.sampling import bloom_positions

    df = spark.createDataFrame([("abcde",), ("fghij",)], "s string")
    rows = df.select(*[p.alias(f"p{i}") for i, p in
                       enumerate(bloom_positions("s", 65536, 2))]).collect()
    again = df.select(*[p.alias(f"p{i}") for i, p in
                        enumerate(bloom_positions("s", 65536, 2))]).collect()
    assert rows == again
    for r in rows:
        assert 0 <= r["p0"] < 65536 and 0 <= r["p1"] < 65536


def test_bloom_contamination_no_false_negatives_and_flags_leak(spark):
    from projectone_spark.functions.sampling import bloom_contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog", "ev")],
        "doc_id bigint, text string, source string")
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", "a"),   # leaked
         (2, "zq xv wk jy pf mg bd tn rl cs hx", "a")],             # clean-ish
        "doc_id bigint, text string, source string")
    row = bloom_contamination(corpus, bench).filter("source = 'a'").first()
    assert row["n_false_negatives"] == 0
    assert row["n_docs_exact"] >= 1          # the verbatim copy is caught
    assert row["n_shingles_bloom"] >= row["n_shingles_exact"]  # no neg FPs


def test_bloom_bitset_is_bounded_by_m(spark):
    # the driver-side collect in bloom_contamination is <= m/64 rows no
    # matter the benchmark size; verify the packing math stays in range
    from projectone_spark.functions.sampling import bloom_positions

    import pyspark.sql.functions as F2
    df = spark.range(5000).select(F2.md5(F2.col("id").cast("string")).alias("s"))
    mx = (df.select(F2.explode(F2.array(
              *bloom_positions("s", 4096, 2))).alias("p"))
          .agg(F2.max((F2.col("p") / 64).cast("int")).alias("w")).first()["w"])
    assert mx <= 4096 // 64 - 1


def test_lsh_probe_batch_split_invariance(spark):
    """Folding a corpus through the standing-index probe batch-by-batch
    must accumulate exactly the batch self-join's pair set, for any split
    — the property st13 relies on."""
    import pyspark.sql.functions as F2

    from projectone_spark.functions.dedup import (
        lsh_candidate_pairs,
        lsh_probe_pairs,
        minhash_signatures,
    )

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").limit(120))
    want = sorted(map(tuple, lsh_candidate_pairs(docs).collect()))

    def banded(frame):
        return (minhash_signatures(frame)
                .withColumn("band", F2.substring(F2.col("mh0"), 1, 2)))

    got = []
    base = None
    for i in range(3):  # uneven split: 0/1 vs 2 vs rest
        batch = docs.filter((F2.col("doc_id") % 4) == i) if i < 2 \
            else docs.filter(F2.col("doc_id") % 4 >= 2)
        sigs = banded(batch).localCheckpoint(eager=True)
        if base is None:
            base = spark.createDataFrame([], sigs.schema)
        got.extend(map(tuple, lsh_probe_pairs(base, sigs).collect()))
        base = base.unionByName(sigs)
    assert sorted(got) == want


def test_bloom_rejects_partial_word_m_bits(spark):
    import pytest

    from projectone_spark.functions.sampling import bloom_contamination

    df = _docs(spark, [(1, "abcdefghij")]).withColumn(
        "source", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("a"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_contamination(df, df, m_bits=100)
    with pytest.raises(ValueError, match="n_hashes"):
        bloom_contamination(df, df, n_hashes=0)


def test_assign_cell_rejects_empty_centroids():
    import pytest

    from projectone_spark.functions.embeddings import assign_cell

    with pytest.raises(ValueError, match="at least one centroid"):
        assign_cell(F.col("embedding"), [])


def test_assign_cell_join_rejects_empty_centroids(spark):
    # the broadcast-join twin must fail as loudly as the literal path,
    # not silently drop every row through a 0-row crossJoin
    import pytest

    from projectone_spark.functions.embeddings import assign_cell_join

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, e array<double>")
    with pytest.raises(ValueError, match="at least one centroid"):
        assign_cell_join(df, [], vec_col="e")


def test_curriculum_order_plan_has_no_window(spark):
    """p10's scale claim: binning is scan-side against broadcast
    thresholds — an ntile/rank formulation would put a Window (a total
    order through one reducer) in the plan."""
    import contextlib
    import io

    from projectone_spark.queries import REGISTRY, queries as _q

    _q()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        (REGISTRY["p10_curriculum_order"]
         .fn(spark, "/root/testdata/sf0.001").explain("formatted"))
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "Sort" not in plan  # no global or partial sort anywhere


def test_bloom_bitset_precomputed_equals_inline_build(spark):
    """The train-once bitset path (st14's deploy shape) must produce
    byte-identical per-doc verdicts to the build-inline path."""
    from projectone_spark.functions.sampling import (bloom_bitset,
                                                     bloom_doc_flags)

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", "a"),
         (2, "an entirely different piece of text here now", "a"),
         (3, "the quick brown fox went somewhere else", "b")],
        "doc_id bigint, text string, source string")
    bench = docs.filter("doc_id = 1")
    corpus = docs.filter("doc_id != 1")
    words = bloom_bitset(bench)
    assert len(words) == 65536 // 64 and any(words)
    inline = sorted(map(tuple, bloom_doc_flags(corpus, bench).collect()))
    pre = sorted(map(tuple,
                     bloom_doc_flags(corpus, bench, bitset=words).collect()))
    assert inline == pre


def test_bloom_bitset_validation(spark):
    import pytest as _pytest

    from projectone_spark.functions.sampling import (bloom_bitset,
                                                     bloom_doc_flags)

    docs = spark.createDataFrame([(1, "abcdefgh", "a")],
                                 "doc_id bigint, text string, source string")
    with _pytest.raises(ValueError, match="multiple of 64"):
        bloom_bitset(docs, m_bits=100)
    with _pytest.raises(ValueError, match="bitset has"):
        bloom_doc_flags(docs, docs, bitset=[0] * 10)
