"""Delta passthrough backend.

The real-Delta tests run wherever delta-spark is importable (skip-marked
here — the package is absent in this container); the contract tests always
run and pin the surface the backend must keep.
"""

from __future__ import annotations

import pytest

from projectone_spark.store import delta_backend as db


def test_delta_available_matches_import():
    try:
        import delta  # noqa: F401

        assert db.delta_available()
    except ImportError:
        assert not db.delta_available()


def test_merge_condition_null_safe():
    """Merge keys must match NULL-safely (<=>) — a plain = would duplicate
    null-keyed rows on every merge."""
    cond = db._merge_condition(["id", "region"])
    assert cond == "t.`id` <=> s.`id` AND t.`region` <=> s.`region`"


needs_delta = pytest.mark.skipif(not db.delta_available(),
                                 reason="delta-spark not installed")


@pytest.fixture(scope="module")
def delta_spark():
    """A session with the Delta catalog+extension wired in, the documented
    delta-spark bootstrap."""
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.master("local[4]")
               .appName("delta-backend-tests")
               .config("spark.sql.extensions",
                       "io.delta.sql.DeltaSparkSessionExtension")
               .config("spark.sql.catalog.spark_catalog",
                       "org.apache.spark.sql.delta.catalog.DeltaCatalog"))
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark


@needs_delta
def test_scd1_merge_roundtrip(delta_spark, tmp_path):
    path = str(tmp_path / "t")
    base = delta_spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string")
    db.delta_scd1_merge(delta_spark, path, base, key_cols=["id"])
    upd = delta_spark.createDataFrame(
        [(2, "B"), (3, "c")], "id long, v string")
    db.delta_scd1_merge(delta_spark, path, upd, key_cols=["id"])
    got = sorted((r.id, r.v) for r in
                 delta_spark.read.format("delta").load(path).collect())
    assert got == [(1, "a"), (2, "B"), (3, "c")]


@needs_delta
def test_cdf_reports_merge_changes(delta_spark, tmp_path):
    path = str(tmp_path / "t")
    base = delta_spark.createDataFrame([(1, "a")], "id long, v string")
    db.delta_scd1_merge(delta_spark, path, base, key_cols=["id"])
    v = db.delta_version(delta_spark, path)
    upd = delta_spark.createDataFrame([(1, "A")], "id long, v string")
    db.delta_scd1_merge(delta_spark, path, upd, key_cols=["id"])
    changes = db.delta_read_cdf(delta_spark, path, starting_version=v + 1)
    kinds = {r["_change_type"] for r in changes.collect()}
    assert "update_postimage" in kinds


@needs_delta
def test_unchanged_merge_writes_nothing(delta_spark, tmp_path):
    path = str(tmp_path / "t")
    base = delta_spark.createDataFrame([(1, "a")], "id long, v string")
    db.delta_scd1_merge(delta_spark, path, base, key_cols=["id"])
    v0 = db.delta_version(delta_spark, path)
    db.delta_scd1_merge(delta_spark, path, base, key_cols=["id"])
    # matched rows with identical data hash must NOT rewrite files
    changes = db.delta_read_cdf(delta_spark, path, starting_version=v0 + 1)
    assert changes.filter("_change_type like 'update%'").count() == 0


@needs_delta
def test_writers_route_through_delta_store(delta_spark, tmp_path):
    """write_scd1 — unchanged — commits through DeltaTable when handed a
    DeltaStore: the reference-parity path (write.py:437-520)."""
    import pyspark.sql.functions as F

    from projectone_spark.writers import write_scd1

    store = db.DeltaStore(str(tmp_path / "root"))
    now = F.lit("2024-01-01").cast("timestamp")
    base = delta_spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_scd1(delta_spark, store, base, "t", key_cols=["id"], now=now)
    upd = delta_spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
    write_scd1(delta_spark, store, upd, "t", key_cols=["id"], now=now)
    got = sorted((r.id, r.v) for r in store.read(delta_spark, "t").collect())
    assert got == [(1, "a"), (2, "B"), (3, "c")]
