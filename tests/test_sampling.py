"""Dataset-assembly operators: split stability, two-phase quota
equivalence, packing invariants, contamination arithmetic."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from projectone_spark.functions.sampling import (
    contamination_report,
    deterministic_split,
    estimate_tokens,
    md5_bucket,
    pack_sequences,
    quota_sample,
)
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_split_stable_under_repartition(spark):
    """The same doc_id must land in the same split no matter how the data
    is partitioned — that's the whole point of hashing over sampling."""
    docs = _docs(spark).select("doc_id")
    a = {r["doc_id"]: r["split"]
         for r in deterministic_split(docs).collect()}
    b = {r["doc_id"]: r["split"]
         for r in deterministic_split(docs.repartition(17)).collect()}
    assert a == b
    fracs = {s: sum(1 for v in a.values() if v == s) / len(a)
             for s in ("train", "val", "test")}
    assert 0.7 < fracs["train"] < 0.9
    assert fracs["val"] + fracs["test"] == pytest.approx(1 - fracs["train"])


def test_split_percent_validation(spark):
    with pytest.raises(ValueError, match="sum to 100"):
        deterministic_split(_docs(spark), splits=[("a", 50), ("b", 40)])


def test_md5_bucket_range(spark):
    got = (_docs(spark).select(md5_bucket("doc_id", 7).alias("b"))
           .agg(F.min("b"), F.max("b")).first())
    assert 0 <= got[0] and got[1] <= 6


def test_quota_two_phase_matches_one_phase(spark):
    """Two-phase top-k must be row-identical to the naive one-phase window,
    including under adversarial partitioning."""
    docs = _docs(spark).select("doc_id", "lang", "n_chars").repartition(13)
    two = quota_sample(docs, "lang", "n_chars", 25, tie_col="doc_id")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), "doc_id")
    one = (docs.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") <= 25))
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, one.collect()))


def test_quota_ascending(spark):
    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    got = quota_sample(docs, "lang", "n_chars", 3, tie_col="doc_id",
                       ascending=True)
    per_lang_min = {r["lang"]: r["m"] for r in
                    docs.groupBy("lang").agg(F.min("n_chars").alias("m")).collect()}
    for r in got.filter(F.col("rk") == 1).collect():
        assert r["n_chars"] == per_lang_min[r["lang"]]


def test_pack_sequences_invariants(spark):
    """Prefix-sum packing: bins are contiguous in doc order, no bin holds
    target+largest-doc tokens or more, every token lands in exactly one
    bin, and bin 0 exists with indices bounded by total/target."""
    target = 512
    docs = (_docs(spark)
            .select("lang", "doc_id", estimate_tokens("n_chars").alias("toks")))
    packed = pack_sequences(docs, "toks", target, ["lang"], "doc_id").cache()
    stats = (packed.groupBy("lang", "bin")
             .agg(F.sum("toks").alias("tot"), F.max("toks").alias("biggest"))
             .collect())
    for r in stats:
        assert r["tot"] < target + r["biggest"], r
    # conservation: packing reassigns, never drops/duplicates tokens
    assert (packed.agg(F.sum("toks")).first()[0]
            == docs.agg(F.sum("toks")).first()[0])
    per_lang = {r["lang"]: r for r in
                (packed.groupBy("lang")
                 .agg(F.min("bin").alias("lo"), F.max("bin").alias("hi"),
                      F.sum("toks").alias("tot")).collect())}
    for lang, r in per_lang.items():
        assert r["lo"] == 0, lang
        assert r["hi"] <= r["tot"] // target, lang
    # contiguity: within a lang, bin index never decreases in doc order
    rows = sorted(packed.select("lang", "doc_id", "bin").collect(),
                  key=lambda r: (r["lang"], r["doc_id"]))
    prev: dict[str, int] = {}
    for r in rows:
        assert prev.get(r["lang"], 0) <= r["bin"]
        prev[r["lang"]] = r["bin"]
    packed.unpersist()


def test_contamination_extremes(spark):
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "zzz qqq completely disjoint content xyzzy")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["contamination"]
           for r in contamination_report(corpus, bench).collect()}
    assert got[1] == 1.0
    assert got[2] == 0.0


def test_perplexity_buckets_balance_order_and_determinism(spark):
    """CCNet terciles: bucket sizes differ by <= 1 inside each group,
    lower scores land in earlier buckets, assignment survives
    repartitioning (the total-order tie-break), and the label/bucket
    validation is loud."""
    from projectone_spark.functions.sampling import perplexity_buckets

    rows = [(i, "a" if i < 10 else "b", (i * 7) % 10) for i in range(17)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, surprise_micro bigint")
    out = perplexity_buckets(df).collect()
    by = {}
    for r in out:
        by.setdefault((r["source"], r["bucket"]), []).append(
            r["surprise_micro"])
    # group a: 10 rows -> 4/3/3; group b: 7 rows -> 3/2/2
    assert [len(by[("a", s)]) for s in ("head", "middle", "tail")] \
        == [4, 3, 3]
    assert [len(by[("b", s)]) for s in ("head", "middle", "tail")] \
        == [3, 2, 2]
    for src in ("a", "b"):
        assert max(by[(src, "head")]) <= min(by[(src, "middle")]) + 1
        assert max(by[(src, "middle")]) <= min(by[(src, "tail")]) + 1
    again = perplexity_buckets(df.repartition(7)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    with pytest.raises(ValueError, match="one label per bucket"):
        perplexity_buckets(df, n_buckets=4)


def test_int_sqrt_exact_across_range(spark):
    """The ±1 fixup must deliver the exact floor sqrt everywhere the
    float guess can err: perfect squares, square±1, and the top of the
    int64 range where squaring the guess would overflow (the probes
    divide instead)."""
    import math

    from projectone_spark.functions.sampling import int_sqrt

    vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 17, 10**6, 10**6 + 1,
            (1 << 26) ** 2, (1 << 26) ** 2 - 1, (1 << 26) ** 2 + 1,
            4503599627370496, 9007199254740993,  # 2^52, 2^53+1
            9223372036854775807]  # int64 max
    df = spark.createDataFrame([(v,) for v in vals], "m bigint")
    got = {r["m"]: r["s"] for r in
           df.select("m", int_sqrt("m").alias("s")).collect()}
    for v in vals:
        assert got[v] == math.isqrt(v), (v, got[v], math.isqrt(v))


def test_largest_remainder_sums_exactly_and_is_proportional(spark):
    from projectone_spark.functions.sampling import largest_remainder

    df = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "g string, n bigint")
    out = {r["g"]: r["q"] for r in largest_remainder(
        df, "g", "n", "q", 100).collect()}
    # 100/3 -> floors 33 each, 1 leftover to the lowest name
    assert sum(out.values()) == 100 and out == {"a": 34, "b": 33, "c": 33}
    df2 = spark.createDataFrame(
        [("a", 0), ("b", 3), ("c", 1)], "g string, n bigint")
    out2 = {r["g"]: r["q"] for r in largest_remainder(
        df2, "g", "n", "q", 1_000_000).collect()}
    assert sum(out2.values()) == 1_000_000 and out2["a"] == 0
    assert out2["b"] == 750_000 and out2["c"] == 250_000


def test_largest_remainder_zero_total_fails_loudly(spark):
    from projectone_spark.functions.sampling import largest_remainder

    df = spark.createDataFrame([("a", 0), ("b", 0)], "g string, n bigint")
    with pytest.raises(Exception, match="total mass is zero"):
        largest_remainder(df, "g", "n", "q", 100).collect()
