"""Round-12 optimization equivalence gates.

Every r12 fast path must be BIT-IDENTICAL to the path it replaces —
these tests pin that contract:

- O3: single-parsed-SQL construction fast paths (``assign_cell`` /
  ``probe_cells`` / ``sq8_pack_words`` string-name forms) against the
  Column-API originals.
- O2: ``multiset_diff_count`` zero-ness against the double-``exceptAll``
  union it replaced.
- O1: manifest-recorded read-back schemas against schema-inference
  reads (plain, partitioned, multi-commit, time travel, restore/clone
  carry-forward, and the evolved-schema fallback).
"""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F
import pytest


def _rand_vecs(spark, n=40, dims=16, seed=11):
    rnd = random.Random(seed)
    rows = [(i, [rnd.uniform(-2.0, 2.0) for _ in range(dims)])
            for i in range(n)]
    # exercise signed zero / exact ties / denormal-ish smalls
    rows.append((n, [0.0] * dims))
    rows.append((n + 1, [-0.0] * dims))
    rows.append((n + 2, [5e-324] * dims))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cents(dims=16, k=6, seed=3):
    rnd = random.Random(seed)
    out = [(i, [rnd.uniform(-1.0, 1.0) for _ in range(dims)])
           for i in range(k)]
    out[2] = (2, out[1][1][:])  # duplicate centroid: exact tie
    return out


def test_assign_cell_string_path_bit_identical(spark):
    from projectone_spark.functions.embeddings import assign_cell

    df = _rand_vecs(spark)
    cents = _cents()
    got = df.select("vec_id",
                    assign_cell("embedding", cents).alias("c")).collect()
    want = df.select("vec_id",
                     assign_cell(F.col("embedding"), cents).alias("c")
                     ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_assign_cell_nonfinite_centroid_falls_back(spark):
    from projectone_spark.functions.embeddings import assign_cell

    df = _rand_vecs(spark, n=10)
    cents = _cents()
    cents[0] = (0, [math.inf] + cents[0][1][1:])
    got = df.select("vec_id",
                    assign_cell("embedding", cents).alias("c")).collect()
    want = df.select("vec_id",
                     assign_cell(F.col("embedding"), cents).alias("c")
                     ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_probe_cells_string_path_bit_identical(spark):
    from projectone_spark.functions.embeddings import probe_cells

    df = _rand_vecs(spark)
    cents = _cents()
    for nprobe in (1, 3, len(cents)):
        got = df.select("vec_id",
                        probe_cells("embedding", cents, nprobe).alias("p")
                        ).collect()
        want = df.select("vec_id",
                         probe_cells(F.col("embedding"), cents, nprobe)
                         .alias("p")).collect()
        # probe ORDER is part of the contract (nearest first)
        assert [(r["vec_id"], list(r["p"])) for r in got] \
            == [(r["vec_id"], list(r["p"])) for r in want]


@pytest.mark.parametrize("dims", [1, 3, 4, 7, 16])
def test_sq8_pack_words_string_path_bit_identical(spark, dims):
    from projectone_spark.functions.embeddings import sq8_pack_words

    rnd = random.Random(5)
    rows = [(i, [rnd.randrange(256) for _ in range(dims)])
            for i in range(20)]
    rows.append((20, [0] * dims))
    rows.append((21, [255] * dims))
    df = spark.createDataFrame(rows, "vec_id long, __code array<int>")
    got = df.select("vec_id", *[w.alias(f"w{j:02d}") for j, w in
                                enumerate(sq8_pack_words("__code", dims))])
    want = df.select("vec_id", *[w.alias(f"w{j:02d}") for j, w in
                                 enumerate(sq8_pack_words(F.col("__code"),
                                                          dims))])
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))


def test_sq8_codes_string_path_bit_identical(spark):
    from projectone_spark.functions.embeddings import sq8_bounds, sq8_codes

    dims = 9
    rnd = random.Random(13)
    rows = [(i, [rnd.uniform(-3.0, 3.0) for _ in range(dims)])
            for i in range(30)]
    rows.append((30, [7.5] * dims))   # constant rows force mx == mn dims
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    const = spark.createDataFrame([(0, [1.0] * dims)],
                                  "vec_id long, embedding array<double>")
    for frame in (df, const):
        bounds = frame.sparkSession.createDataFrame([(1,)], "x int") \
            .crossJoin(sq8_bounds(frame, dims=dims)).drop("x")
        base = frame.crossJoin(F.broadcast(bounds))
        got = base.select("vec_id",
                          sq8_codes("embedding", dims).alias("c")).collect()
        want = base.select("vec_id",
                           sq8_codes(F.col("embedding"), dims).alias("c")
                           ).collect()
        assert [(r["vec_id"], list(r["c"])) for r in got] \
            == [(r["vec_id"], list(r["c"])) for r in want]


def test_multiset_diff_count_matches_exceptall_zeroness(spark):
    from projectone_spark.functions import multiset_diff_count

    a = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, None), (3, "y")], "k int, v string")
    perm = spark.createDataFrame(
        [(3, "y"), (2, None), (1, "x"), (1, "x")], "k int, v string")
    multi = spark.createDataFrame(  # same SET, different multiplicity
        [(1, "x"), (2, None), (3, "y")], "k int, v string")
    nulldiff = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "z"), (3, "y")], "k int, v string")

    def old(x, y):
        return x.exceptAll(y).unionAll(y.exceptAll(x)).count()

    for other in (perm, multi, nulldiff):
        assert (multiset_diff_count(a, other) == 0) == (old(a, other) == 0)
    assert multiset_diff_count(a, perm) == 0
    assert multiset_diff_count(a, multi) > 0
    assert multiset_diff_count(a, nulldiff) > 0
    # column-order normalization: b's columns selected in a's order
    assert multiset_diff_count(a, perm.select("v", "k")) == 0


def test_lloyd_refine_joinless_assignment_bit_identical(spark):
    """The r12 2-exchange Lloyd iteration (vector carried through the
    argmax aggregate) must yield bit-identical centroids to the
    original 3-exchange shape (assign_cell_join + join-back + mean)."""
    from projectone_spark.functions.embeddings import (
        _lloyd_project,
        _lloyd_refine,
        assign_cell_join,
        seed_centroids,
    )

    rnd = random.Random(23)
    rows = [(i, [rnd.uniform(-1.5, 1.5) for _ in range(8)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    v = _lloyd_project(df, "vec_id", "embedding")
    got = _lloyd_refine(v, k=4, iters=3, id_col="vec_id")

    cents = seed_centroids(v, k=4, id_col="vec_id", vec_col="e")
    for _ in range(3):  # the pre-r12 shape, inline
        asg = assign_cell_join(v, cents, id_col="vec_id", vec_col="e")
        cm = (v.join(asg, "vec_id")
              .select("cell_id", F.posexplode("e").alias("pos", "val"))
              .groupBy("cell_id", "pos").agg(F.avg("val").alias("m"))
              .groupBy("cell_id")
              .agg(F.transform(
                  F.array_sort(F.collect_list(F.struct("pos", "m"))),
                  lambda s: s["m"]).alias("ce")))
        cents = sorted((int(r["cell_id"]), [float(x) for x in r["ce"]])
                       for r in cm.collect())
    assert got == cents


def test_bpe_merge_checkpoint_window_invariant(spark, monkeypatch):
    """The r12 replay-window checkpointing in bpe_train_merges must not
    change the learned rules: window 1 (the old every-step behavior)
    and the default window yield identical merge tables."""
    import projectone_spark.functions.text as text

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cats chat that matter"),
         (3, "scatter the chatter"), (4, "that cat that sat")],
        "doc_id long, text string")
    want = text.bpe_train_merges(docs, n_merges=6).collect()
    monkeypatch.setattr(text, "_BPE_CKPT_EVERY", 1)
    got = text.bpe_train_merges(docs, n_merges=6).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def _mk_store(tmp_path):
    from projectone_spark.store import TableStore

    return TableStore(str(tmp_path / "store"))


def test_schema_capture_plain_append_read(spark, tmp_path):
    st = _mk_store(tmp_path)
    df = spark.createDataFrame(
        [(1, 1.5, "a"), (2, float("nan"), None)], "k long, x double, s string")
    st.append(spark, df, "t")
    st.append(spark, df, "t")
    m = st.manifest("t")
    assert set(m.get("schemas", {})) == set(m["dirs"])
    got = st.read(spark, "t")
    # the recorded-schema read must match a from-scratch inference read
    want = spark.read.parquet(*m["dirs"])
    assert got.schema == want.schema
    assert got.count() == 4
    assert sorted(map(tuple, got.select("k", "s").collect())) \
        == sorted(map(tuple, want.select("k", "s").collect()))


def test_schema_capture_partitioned_multicommit(spark, tmp_path):
    st = _mk_store(tmp_path)
    df = spark.createDataFrame(
        [(1, "p0", 2.0), (2, "p1", 3.0)], "k long, part string, x double")
    st.append(spark, df, "t", partition_by=["part"])
    st.append(spark, df.withColumn("k", F.col("k") + 10), "t",
              partition_by=["part"])
    m = st.manifest("t")
    assert set(m.get("schemas", {})) == set(m["dirs"])
    got = st.read(spark, "t")
    want0 = spark.read.option("basePath", m["dirs"][0]).parquet(m["dirs"][0])
    # partition-column type must match partition-value INFERENCE
    assert got.schema["part"].dataType == want0.schema["part"].dataType
    assert got.filter("part = 'p1'").count() == 2
    assert {r["k"] for r in got.collect()} == {1, 2, 11, 12}


def test_schema_capture_survives_restore_and_clone(spark, tmp_path):
    from projectone_spark.store.maintenance import clone, restore

    st = _mk_store(tmp_path)
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    st.append(spark, df, "t")
    v0 = st.manifest("t")["version"]
    st.append(spark, df, "t")
    restore(st, "t", v0)
    m = st.manifest("t")
    assert set(m.get("schemas", {})) == set(m["dirs"])
    assert st.read(spark, "t").count() == 1
    clone(st, "t", "t2")
    m2 = st.manifest("t2")
    assert set(m2.get("schemas", {})) == set(m2["dirs"])
    assert st.read(spark, "t2").count() == 1


def test_schema_capture_time_travel(spark, tmp_path):
    st = _mk_store(tmp_path)
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    st.append(spark, df, "t")
    v0 = st.manifest("t")["version"]
    st.append(spark, df.withColumn("k", F.lit(9).cast("long")), "t")
    old = st.read_version(spark, "t", v0)
    assert old.count() == 1 and old.first()["k"] == 1


def test_read_merged_fast_path_uniform_schemas(spark, tmp_path):
    from projectone_spark.store.maintenance import read_merged

    st = _mk_store(tmp_path)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    st.append(spark, df, "t")
    st.append(spark, df, "t")
    got = read_merged(st, spark, "t")
    want = spark.read.option("mergeSchema", "true") \
        .parquet(*st.manifest("t")["dirs"])
    assert got.schema == want.schema
    assert got.count() == 4


def test_selective_overwrite_uniform_table_records_schema(spark, tmp_path):
    st = _mk_store(tmp_path)
    df = spark.createDataFrame(
        [(1, "p0", 1.0), (2, "p1", 2.0)], "k long, part string, x double")
    st.append(spark, df, "t", partition_by=["part"])
    st.selective_overwrite(
        spark, df.filter("part = 'p0'").withColumn("x", F.col("x") + 10),
        "t", partition_values={"part": ["p0"]})
    m = st.manifest("t")
    # uniform table: the re-linked dir proves uniformity and records
    assert set(m.get("schemas", {})) == set(m["dirs"])
    got = {(r["k"], r["x"]) for r in st.read(spark, "t").collect()}
    assert got == {(1, 11.0), (2, 2.0)}


def test_selective_overwrite_evolved_table_skips_schema_record(spark, tmp_path):
    from projectone_spark.store.maintenance import append_evolve, read_merged

    st = _mk_store(tmp_path)
    df = spark.createDataFrame(
        [(1, "p0"), (2, "p1")], "k long, part string")
    st.append(spark, df, "t", partition_by=["part"])
    append_evolve(st, spark,
                  spark.createDataFrame([(3, "p2", "z")],
                                        "k long, part string, s string"), "t")
    st.selective_overwrite(
        spark, spark.createDataFrame([(9, "p0", "w")],
                                     "k long, part string, s string"),
        "t", partition_values={"part": ["p0"]})
    m = st.manifest("t")
    # mixed-provenance dir on an evolved table: no schema recorded, so
    # read_merged keeps its true footer-merging semantics
    assert m["dirs"][-1] not in (m.get("schemas") or {})
    merged = read_merged(st, spark, "t")
    assert "s" in merged.columns
    # p0 was replaced (k=1 out, k=9 in); p1/p2 survive the re-link
    assert {r["k"] for r in merged.collect()} == {2, 3, 9}


def test_evolved_schemas_fall_back_to_inference(spark, tmp_path):
    from projectone_spark.store.maintenance import append_evolve, read_merged

    st = _mk_store(tmp_path)
    st.append(spark, spark.createDataFrame([(1,)], "k long"), "t")
    append_evolve(st, spark,
                  spark.createDataFrame([(2, "b")], "k long, s string"), "t")
    m = st.manifest("t")
    # two dirs with DIFFERENT recorded schemas: the single-schema fast
    # path must not engage, and the merged read stays correct
    assert len({m["schemas"][d] for d in m["dirs"]}) == 2
    got = read_merged(st, spark, "t")
    assert {tuple(r) for r in got.select("k", "s").collect()} \
        == {(1, None), (2, "b")}


# -- values_frame (bounded local rows as a VALUES LocalRelation) --------------

def test_values_frame_bit_identical_rows_and_types(spark):
    """The VALUES fast path must reproduce createDataFrame's rows and
    column dataTypes exactly (array containsNull may tighten — the
    documented inert difference) across every supported type, including
    the literal edge cases: signed zero, denormals, float extremes,
    escaped quotes/backslashes/newlines, empty arrays, NULLs."""
    from projectone_spark.functions import values_frame

    cases = [
        ([(1, "ab", "cd", "abcd", 7), (2, "x", "y", "xy", 3)],
         "step bigint, l string, r string, m string, c bigint"),
        ([(0, [0.1, -0.0, 5e-324, 1.7976931348623157e308], 1.5),
          (1, [], 0.0), (2, None, None)],
         "cid long, ce array<double>, cnorm double"),
        ([("it's a \\ test\nline",), (None,)], "s string"),
        ([(True,), (False,), (None,)], "b boolean"),
        ([(5, [1.0, 2.5])], "cell int, centroid array<double>"),
    ]
    for rows, ddl in cases:
        a, b = (values_frame(spark, rows, ddl),
                spark.createDataFrame(rows, ddl))
        key = repr  # rows mix None with values; repr gives a total order
        assert sorted(map(tuple, a.collect()), key=key) \
            == sorted(map(tuple, b.collect()), key=key)
        assert [f.name for f in a.schema.fields] \
            == [f.name for f in b.schema.fields]
        assert [f.dataType.simpleString() for f in a.schema.fields] \
            == [f.dataType.simpleString() for f in b.schema.fields]
        # and it really is a LocalRelation: zero-task collects
        assert "LocalTableScan" in \
            a._jdf.queryExecution().executedPlan().toString()


def test_values_frame_falls_back_on_unrenderable(spark):
    """NaN/Inf doubles, bool-valued int columns and unsupported DDL
    types have no exact literal rendering — the helper must fall back
    to createDataFrame (slower, identical rows), never coerce."""
    from projectone_spark.functions import values_frame

    nan = values_frame(spark, [(1, [float("nan")], 1.0)],
                       "cid long, ce array<double>, cnorm double")
    assert "LocalTableScan" not in \
        nan._jdf.queryExecution().executedPlan().toString() \
        or nan.collect()  # plan shape is createDataFrame's
    assert math.isnan(nan.collect()[0]["ce"][0])
    import datetime
    ts = values_frame(spark, [(datetime.datetime(2026, 1, 1),)],
                      "t timestamp")  # unsupported type -> fallback
    assert ts.schema.fields[0].dataType.simpleString() == "timestamp"
    assert ts.collect()[0]["t"] == datetime.datetime(2026, 1, 1)
    with pytest.raises(Exception):
        # bool in a bigint column: createDataFrame rejects it, so the
        # fast path must not silently render it as 1L
        values_frame(spark, [(True,)], "n bigint").collect()


def test_bpe_train_from_counts_bit_identical(spark):
    """Training from the shared (doc, word) counts must learn the exact
    rule table the corpus-scan trainer learns — the word-frequency fold
    is an integer identity (count of occurrences == sum of per-doc
    counts), so every argmax sees identical pair counts."""
    from projectone_spark.functions.text import (
        bpe_doc_word_counts, bpe_train_merges, bpe_train_merges_from_counts)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the cat sat on the mat", "the cat", "a cat ate the hat",
             "aaaa aaa the the the", "mat hat cat bat", ""])],
        "doc_id long, text string")
    want = [tuple(r) for r in
            bpe_train_merges(docs, n_merges=6).collect()]
    got = [tuple(r) for r in
           bpe_train_merges_from_counts(bpe_doc_word_counts(docs),
                                        n_merges=6).collect()]
    assert want == got and len(want) > 0


def test_trained_rules_frame_collects_without_a_job(spark):
    """bpe_train_merges returns its bounded rule table as a VALUES
    LocalRelation — re-collecting it (what every consumer does) must
    run ZERO jobs, where the old 32-slice pickled RDD ran a
    32-Python-task job per action (0.4-3 s each in the bench)."""
    from projectone_spark.functions.text import bpe_train_merges

    docs = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    rules = bpe_train_merges(docs, n_merges=2)
    rules.collect()  # materialize once
    store = spark.sparkContext._jsc.sc().statusStore()
    before = store.jobsList(None).size()
    assert len(rules.collect()) > 0
    assert store.jobsList(None).size() == before


def test_values_frame_size_guard_single_slice(spark):
    """Literal-dense payloads (e.g. 64x64 centroid arrays) must NOT take
    the VALUES path — spark.sql() analyzes eagerly and ~90 KB of double
    literals measured ~3 s of driver parse time (the e20/f15 regression
    caught mid-r12). Past the budget the rows ship as ONE pickled slice:
    same rows, 1 partition, no SQL text."""
    from projectone_spark.functions import values_frame

    rows = [(i, [float(i * 64 + j) * 1e-3 for j in range(64)])
            for i in range(64)]
    ddl = "cell int, centroid array<double>"
    big = values_frame(spark, rows, ddl)
    assert "LocalTableScan" not in \
        big._jdf.queryExecution().executedPlan().toString()
    assert big.rdd.getNumPartitions() == 1
    assert sorted(map(repr, big.collect())) \
        == sorted(map(repr, spark.createDataFrame(rows, ddl).collect()))
