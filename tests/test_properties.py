"""Property-based invariants (hypothesis) for the merge library and CDC.

The SCD2 exactly-one-active-row-per-key invariant is the reference's
hardest correctness property (SURVEY §7.5); here it is checked under
randomized multi-batch histories instead of hand-picked cases.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from projectone_spark.cdc import CdcState, resolve_cdc
from projectone_spark.writers.hashing import ACTIVE, VALID_FROM, VALID_TO
from projectone_spark.writers.merge import scd1_merge, scd2_apply

KEYS = st.integers(min_value=1, max_value=5)
VALS = st.integers(min_value=0, max_value=3)
BATCH = st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=6,
                 unique_by=lambda t: t[0])
SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture,
                                       HealthCheck.too_slow])


def _df(spark, batch):
    return spark.createDataFrame([(k, v) for k, v in batch], "id long, v long")


@given(batches=st.lists(BATCH, min_size=1, max_size=3))
@SLOW
def test_scd2_invariants_under_random_histories(spark, batches):
    ts = ["2024-01-01", "2024-02-01", "2024-03-01"]
    target = None
    seen_keys: set[int] = set()
    for i, batch in enumerate(batches):
        seen_keys |= {k for k, _ in batch}
        target = scd2_apply(_df(spark, batch), target, ["id"],
                            valid_from=F.lit(ts[i]).cast("timestamp"))
    rows = target.collect()

    # exactly one active row per key ever seen, none for unseen keys
    active = [r for r in rows if r[ACTIVE] == "Y"]
    assert sorted(r["id"] for r in active) == sorted(seen_keys)

    # active rows carry each key's LAST written value
    last = {}
    for batch in batches:
        for k, v in batch:
            last[k] = v
    assert {r["id"]: r["v"] for r in active} == last

    # closed rows end exactly where a successor begins (no gaps/overlaps)
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["id"], []).append(r)
    for k, chain in by_key.items():
        chain.sort(key=lambda r: r[VALID_FROM])
        for a, b in zip(chain, chain[1:]):
            assert a[ACTIVE] == "N"
            assert a[VALID_TO] == b[VALID_FROM]
        assert chain[-1][ACTIVE] == "Y"


@given(batch=BATCH)
@SLOW
def test_scd1_idempotent(spark, batch):
    t0 = F.lit("2024-01-01").cast("timestamp")
    t1 = F.lit("2024-02-01").cast("timestamp")
    once = scd1_merge(_df(spark, batch), None, ["id"], now=t0)
    twice = scd1_merge(_df(spark, batch), once, ["id"], now=t1)
    got_once = sorted((r["id"], r["v"], r[VALID_FROM]) for r in once.collect())
    got_twice = sorted((r["id"], r["v"], r[VALID_FROM]) for r in twice.collect())
    assert got_once == got_twice  # unchanged re-apply keeps valid_from too


@given(offsets=st.lists(st.integers(0, 50), min_size=0, max_size=12),
       split=st.integers(0, 50))
@SLOW
def test_cdc_two_runs_partition_the_data(spark, offsets, split):
    """Run 1 over a prefix snapshot + run 2 after more data arrives must
    cover every row exactly once (no loss, no double-read)."""
    first = sorted(set(o for o in offsets if o <= split))
    all_vals = sorted(set(offsets))
    df1 = spark.createDataFrame([(i, o) for i, o in enumerate(first)],
                                "id long, offset long")
    pred1, st1 = resolve_cdc(df1, "offset")
    read1 = {r["offset"] for r in df1.filter(pred1).collect()}
    assert read1 == set(first)

    df2 = spark.createDataFrame([(i, o) for i, o in enumerate(all_vals)],
                                "id long, offset long")
    prev = CdcState.from_json(st1.to_json())
    pred2, _ = resolve_cdc(df2, "offset", prev)
    read2 = {r["offset"] for r in df2.filter(pred2).collect()}
    if first:
        assert read2 == {o for o in all_vals if o > max(first)}
    assert read1 | read2 == set(all_vals)
    assert read1 & read2 == set()


def test_connected_components_known_graph(spark):
    from projectone_spark.functions.dedup import connected_components

    # two chains and an isolated pair: {1-2-3-4}, {10-11}, {20-21-22}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        "doc_id_a long, doc_id_b long")
    got = {r["doc_id"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_connected_components_nonconvergence_raises(spark):
    import pytest

    from projectone_spark.functions.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_id_a long, doc_id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iters=2)
    got = connected_components(chain, max_iters=15).collect()
    assert {r["component"] for r in got} == {0}


MERGE_ROWS = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=6,
                      unique_by=lambda t: t[0])


@given(target=MERGE_ROWS, source=MERGE_ROWS,
       del_thresh=st.integers(min_value=0, max_value=4))
@SLOW
def test_merge_into_matches_python_model(spark, tmp_path_factory, target,
                                         source, del_thresh):
    """merge_into (update + conditional delete + insert) must equal the
    trivially-correct dict model for any (target, source) pair."""
    from projectone_spark.store import TableStore
    from projectone_spark.store.dml import merge_into

    store = TableStore(str(tmp_path_factory.mktemp("mrg")))
    store.overwrite(spark, _df(spark, target or [(999, 0)]), "t")
    if not target:
        from projectone_spark.store.dml import delete_where
        delete_where(store, spark, "t", [("id", "==", 999)])
    merge_into(store, spark, "t", _df(spark, source), ["id"],
               when_matched_update={"v": "source.v + 100"},
               when_matched_delete=f"source.v < {del_thresh}",
               when_not_matched_insert=True)

    model = dict(target)
    for k, v in source:
        if k in model:
            if v < del_thresh:
                del model[k]
            else:
                model[k] = v + 100
        else:
            model[k] = v
    got = {r["id"]: r["v"] for r in store.read(spark, "t").collect()}
    assert got == model


@given(rows=st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=8),
       cut=st.integers(min_value=0, max_value=3))
@SLOW
def test_delete_update_match_filter_model(spark, tmp_path_factory, rows, cut):
    """delete_where + update_where equal plain filter/map models, with
    duplicate ids and arbitrary predicates (multiset semantics)."""
    from collections import Counter

    from projectone_spark.store import TableStore
    from projectone_spark.store.dml import delete_where, update_where

    store = TableStore(str(tmp_path_factory.mktemp("dml")))
    store.overwrite(spark, _df(spark, rows).repartition(3), "t",
                    stats_columns=["v"])
    delete_where(store, spark, "t", [("v", "<", cut)])
    kept = [(k, v) for k, v in rows if not v < cut]
    update_where(store, spark, "t", [("v", ">=", cut)], {"v": "v * 10"})
    expect = Counter((k, v * 10) for k, v in kept)
    got = Counter((r["id"], r["v"]) for r in store.read(spark, "t").collect())
    assert got == expect


# -- r4 corpus operators vs pure-Python models --------------------------------

WORDS = st.lists(st.sampled_from(["the", "a", "data", "spark", "query",
                                  "tablex", "rowset", "batching"]),
                 min_size=0, max_size=30)


def _pynorm(text: str) -> list[str]:
    import re as _re

    norm = _re.sub(r" +", " ", _re.sub(r"[^a-z0-9 ]", " ", text.lower())).strip()
    return norm.split(" ") if norm else []


@given(docs=st.lists(WORDS, min_size=1, max_size=6))
@SLOW
def test_gopher_rules_match_python_model(spark, docs):
    from projectone_spark.functions.text import STOPWORDS, gopher_rules

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    got = {r["doc_id"]: r.asDict()
           for r in gopher_rules(
               spark.createDataFrame(rows, "doc_id long, text string"),
               min_words=3).collect()}
    for i, text in rows:
        toks = _pynorm(text)
        n = len(toks)
        assert got[i]["n_words"] == n
        if n:
            assert got[i]["mean_word_len"] == sum(map(len, toks)) / n
            top = max(toks.count(w) for w in set(toks))
            assert got[i]["top_word_frac"] == top / n
        assert got[i]["n_stopwords"] == len(set(toks) & set(STOPWORDS))


@given(docs=st.lists(WORDS, min_size=1, max_size=5))
@SLOW
def test_cross_doc_ngrams_match_bruteforce(spark, docs):
    from projectone_spark.functions.dedup import cross_doc_ngram_dedup

    n = 3
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    grams = {i: {" ".join(toks[j:j + n])
                 for j in range(len(toks) - n + 1)}
             for i, (_, t) in zip(range(len(rows)), rows)
             for toks in [_pynorm(t)]}
    counts: dict[str, int] = {}
    for gs in grams.values():
        for g in gs:
            counts[g] = counts.get(g, 0) + 1
    got = {r["doc_id"]: r.asDict()
           for r in cross_doc_ngram_dedup(
               spark.createDataFrame(rows, "doc_id long, text string"),
               n=n).collect()}
    for i, gs in grams.items():
        if not gs:
            assert i not in got
            continue
        shared = sum(1 for g in gs if counts[g] > 1)
        assert got[i]["n_grams"] == len(gs)
        assert got[i]["n_shared"] == shared


@given(rows=st.lists(st.tuples(st.integers(0, 500),
                               st.sampled_from(["a", "b", "c"]),
                               st.integers(1, 50)),
                     min_size=2, max_size=25,
                     unique_by=lambda t: t[0]),
       cap=st.sampled_from([1.0, 2.0, 4.0]))
@SLOW
def test_mixture_rebalance_conserves_and_caps(spark, rows, cap):
    from projectone_spark.functions.sampling import mixture_rebalance

    df = spark.createDataFrame(rows, "doc_id long, source string, toks long")
    out = {r["source"]: r
           for r in mixture_rebalance(df, max_upsample=cap).collect()}
    total = sum(t for _, _, t in rows)
    groups = {s for _, s, _ in rows}
    target = total / len(groups)
    for s, r in out.items():
        gtoks = sum(t for _, g, t in rows if g == s)
        gdocs = sum(1 for _, g, t in rows if g == s)
        assert r["n_docs"] == gdocs and r["tokens_in"] == gtoks
        assert r["weight"] == min(cap, target / gtoks)
        # copies bounded by floor(w) and ceil(w) per doc
        import math

        w = r["weight"]
        assert gdocs * math.floor(w) <= r["n_copies"] <= gdocs * math.ceil(w)


# -- round-6 corpus operators -------------------------------------------------

WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "qzx", "wvy"])
DOC = st.lists(WORDS, min_size=1, max_size=6).map(" ".join)


@given(texts=st.lists(DOC, min_size=1, max_size=5),
       k=st.integers(min_value=2, max_value=3))
@SLOW
def test_unigram_surprise_invariant_under_corpus_duplication(spark, texts, k):
    """Duplicating the whole corpus k× must leave every document's score
    untouched: N→kN and c_t→k·c_t cancel even under integer division
    (floor(k·a / k·b) == floor(a/b)) — the property that makes the score
    comparable across corpus snapshots of different sizes."""
    from projectone_spark.functions.text import unigram_surprise

    base = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    dup = spark.createDataFrame(
        [(i + j * 1000, t) for j in range(k)
         for i, t in enumerate(texts)], "doc_id long, text string")
    one = {r["doc_id"]: (r["surprise_micro"], r["n_tokens"])
           for r in unigram_surprise(base).collect()}
    many = {r["doc_id"]: (r["surprise_micro"], r["n_tokens"])
            for r in unigram_surprise(dup).collect()}
    for i in one:
        for j in range(k):
            assert many[i + j * 1000] == one[i]


@given(texts=st.lists(DOC, min_size=1, max_size=5),
       bench_texts=st.lists(DOC, min_size=1, max_size=3))
@SLOW
def test_bloom_never_false_negative_on_random_corpora(spark, texts,
                                                      bench_texts):
    from projectone_spark.functions.sampling import bloom_contamination

    corpus = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string")
    bench = spark.createDataFrame(
        [(1000 + i, t, "ev") for i, t in enumerate(bench_texts)],
        "doc_id long, text string, source string")
    for r in bloom_contamination(corpus, bench, m_bits=256).collect():
        assert r["n_false_negatives"] == 0
        assert r["n_shingles_bloom"] >= r["n_shingles_exact"]


@given(texts=st.lists(DOC, min_size=2, max_size=6),
       split=st.integers(min_value=2, max_value=3))
@SLOW
def test_lsh_probe_accumulation_equals_batch_pairs(spark, texts, split):
    from projectone_spark.functions.dedup import (
        lsh_candidate_pairs,
        lsh_probe_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    want = sorted(map(tuple, lsh_candidate_pairs(docs).collect()))
    got, base = [], None
    for j in range(split):
        sigs = (minhash_signatures(docs.filter(F.col("doc_id") % split == j))
                .withColumn("band", F.substring(F.col("mh0"), 1, 2))
                .localCheckpoint(eager=True))
        if base is None:
            base = spark.createDataFrame([], sigs.schema)
        got.extend(map(tuple, lsh_probe_pairs(base, sigs).collect()))
        base = base.unionByName(sigs)
    assert sorted(got) == want
