"""Table-contract tests: create-if-missing, generated/identity/default
columns, last-commit stats."""

from __future__ import annotations

import pytest

from projectone_spark.config.data_objects import Table, TableColumn
from projectone_spark.store import TableStore, create_if_not_exists, last_commit_stats
from projectone_spark.writers.columns import (
    apply_defaults,
    apply_generated_columns,
    apply_identity,
    apply_table_features,
)

SCHEMA = "id long, name string, offset long"
BASE = [(1, "a", 10), (2, "b", 20), (3, "c", 30)]


def _table():
    return Table(
        name="contracted",
        columns=[
            TableColumn(name="id", type="bigint", identity=True),
            TableColumn(name="name", type="string"),
            TableColumn(name="offset", type="bigint", default=0),
            TableColumn(name="offset_sq", type="bigint",
                        generated_expr="offset * offset"),
        ],
        partition_by=[],
        properties={"owner": "etl"},
        comment="contract table")


def test_identity_forces_long_and_excludes_generated():
    assert TableColumn(name="i", type="string", identity=True).type == "bigint"
    with pytest.raises(ValueError):
        TableColumn(name="x", identity=True, generated_expr="1")


def test_create_if_not_exists(spark, tmp_path):
    store = TableStore(str(tmp_path / "store"))
    t = _table()
    assert create_if_not_exists(store, spark, t) == 0
    assert create_if_not_exists(store, spark, t) is None  # idempotent
    df = store.read(spark, "contracted")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["id", "name", "offset",
                                                  "offset_sq"]
    m = store.manifest("contracted")
    assert m["operation"] == "create" and m["properties"] == {"owner": "etl"}


def test_apply_table_features(spark):
    df = spark.createDataFrame([("a", None), ("b", 4)],
                               "name string, offset long")
    out = apply_table_features(df, _table())
    rows = {r["name"]: r for r in out.collect()}
    assert rows["a"]["offset"] == 0 and rows["a"]["offset_sq"] == 0
    assert rows["b"]["offset_sq"] == 16
    ids = [r["id"] for r in rows.values()]
    assert len(set(ids)) == 2 and all(isinstance(i, int) for i in ids)


def test_identity_offsets_past_existing_max(spark):
    df = spark.createDataFrame([("x",)], "name string")
    out = apply_identity(df, "id", start=1, step=5, existing_max=100)
    assert out.collect()[0]["id"] >= 105


def test_generated_and_defaults_standalone(spark):
    df = spark.createDataFrame([(2,)], "v long")
    out = apply_generated_columns(df, {"v2": "v * 10"})
    assert out.collect()[0]["v2"] == 20
    out = apply_defaults(df, {"w": "z"})
    assert out.collect()[0]["w"] == "z"


def test_last_commit_stats(spark, tmp_path):
    store = TableStore(str(tmp_path / "store"))
    store.overwrite(spark, spark.createDataFrame(BASE, SCHEMA), "t")
    stats = last_commit_stats(store, "t")
    assert stats["operation"] == "overwrite" and stats["version"] == 0
    assert stats["num_files"] >= 1 and stats["num_bytes"] > 0


def test_create_table_through_task(spark, tmp_path):
    from projectone_spark.task import SparkTask

    src = str(tmp_path / "src")
    spark.createDataFrame([("a", 2), ("b", 3)], "name string, offset long") \
        .write.parquet(src)
    task = (SparkTask.builder
            .setName("ct")
            .setInput(name="src", path=src, source="parquet")
            .setOutput(name="out", table="contracted", write_type="append",
                       create_table={
                           "name": "contracted",
                           "columns": [
                               {"name": "name", "type": "string"},
                               {"name": "offset", "type": "bigint"},
                               {"name": "offset_sq", "type": "bigint",
                                "generated_expr": "offset * offset"}]})
            .setStateLocation(str(tmp_path / "state"))
            .setStoreLocation(str(tmp_path / "store"))
            .setSession(spark)
            .create())
    task.execute()
    got = TableStore(str(tmp_path / "store")).read(spark, "contracted")
    rows = {r["name"]: r["offset_sq"] for r in got.collect()}
    assert rows == {"a": 4, "b": 9}


def test_sql_over_store_catalog(spark, tmp_path):
    from projectone_spark.config.data_objects import View
    from projectone_spark.store import register_catalog, sql

    store = TableStore(str(tmp_path / "store"))
    store.overwrite(spark, spark.createDataFrame(BASE, SCHEMA), "base_t")
    out = sql(store, spark, "SELECT count(*) AS n FROM base_t")
    assert out.collect()[0]["n"] == 3

    register_catalog(store, spark, ["base_t"],
                     [View(name="big_t", query="SELECT * FROM base_t WHERE offset >= 20")])
    assert spark.sql("SELECT count(*) AS n FROM big_t").collect()[0]["n"] == 2
