"""Mirror of the driver's correctness gate: every registered query with an
oracle must match DuckDB exactly (columns, row count, normalized values)."""

from __future__ import annotations

import pytest

from projectone_spark.queries import REGISTRY, queries
from tests.conftest import SF_DIR, compare_spark_duckdb

queries()  # force registry load


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(name, spark, duck):
    spec = REGISTRY[name]
    if spec.oracle is None:
        df = spec.fn(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    compare_spark_duckdb(spec.fn(spark, SF_DIR), duck, spec.oracle)


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
