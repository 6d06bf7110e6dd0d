"""Write-engine tests mirroring the reference's integration suite
(``projectoneflow/tests/integration_tests/test_batch.py``): the same 6-row
``{id, name, offset}`` fixture, two-run upsert scenarios, and SCD history
assertions (active-subset equality, closed-row chaining)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from projectone_spark.store import TableStore
from projectone_spark.writers import (
    ConstraintViolation,
    check_table_constraints,
    write_append,
    write_overwrite,
    write_scd1,
    write_scd2,
    write_scd3,
    write_selective_overwrite,
)
from projectone_spark.writers.hashing import (
    ACTIVE,
    SCD2_SENTINEL,
    VALID_FROM,
    VALID_TO,
)

BASE = [(1, "a", 10), (2, "b", 20), (3, "c", 30),
        (4, "d", 40), (5, "e", 50), (6, "f", 60)]
SCHEMA = "id long, name string, offset long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _ts(lit):
    return F.lit(lit).cast("timestamp")


# Column literals need a live session — wrap with _ts() at call sites.
T0, T1, T2 = "2024-01-01", "2024-02-01", "2024-03-01"


@pytest.fixture()
def store(tmp_path):
    return TableStore(str(tmp_path / "store"))


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# -- append / overwrite / selective_overwrite -------------------------------

def test_append_accumulates_and_stamps(spark, store):
    v0 = write_append(spark, store, _df(spark, BASE), "t", now=_ts(T0))
    v1 = write_append(spark, store, _df(spark, BASE[:2]), "t", now=_ts(T1))
    assert (v0, v1) == (0, 1)
    got = store.read(spark, "t")
    assert got.count() == 8
    assert VALID_TO in got.columns
    assert got.filter(F.col(VALID_TO).isNull()).count() == 0


def test_append_upsert_ts_columns(spark, store):
    write_append(spark, store, _df(spark, BASE), "t", now=_ts(T0), upsert_ts=True)
    cols = store.read(spark, "t").columns
    assert "__metadata_insert_ts__" in cols and "__metadata_update_ts__" in cols


def test_overwrite_replaces(spark, store):
    write_append(spark, store, _df(spark, BASE), "t", now=_ts(T0))
    write_overwrite(spark, store, _df(spark, BASE[:3]), "t", now=_ts(T1))
    assert store.read(spark, "t").count() == 3


def test_selective_overwrite_partition_values(spark, store):
    df = _df(spark, BASE).withColumn("grp", F.when(F.col("id") <= 3, "x").otherwise("y"))
    write_overwrite(spark, store, df, "t", partition_by=["grp"], now=_ts(T0))
    repl = (_df(spark, [(9, "z", 90)]).withColumn("grp", F.lit("x")))
    write_selective_overwrite(spark, store, repl, "t",
                              partition_values={"grp": ["x"]}, now=_ts(T1))
    got = store.read(spark, "t")
    assert _rows(got.filter("grp = 'x'"), "id") == [(9,)]
    assert _rows(got.filter("grp = 'y'"), "id") == [(4,), (5,), (6,)]


def test_selective_overwrite_replace_where(spark, store):
    write_overwrite(spark, store, _df(spark, BASE), "t", now=_ts(T0))
    repl = _df(spark, [(4, "D", 400)])
    write_selective_overwrite(spark, store, repl, "t",
                              replace_where="offset >= 40", now=_ts(T1))
    got = store.read(spark, "t")
    assert _rows(got, "id", "name") == [(1, "a"), (2, "b"), (3, "c"), (4, "D")]


# -- scd1 -------------------------------------------------------------------

def test_scd1_two_run_upsert(spark, store):
    write_scd1(spark, store, _df(spark, BASE), "t", key_cols=["id"], now=_ts(T0))
    batch2 = _df(spark, [(2, "b", 99), (7, "g", 70)])  # update + insert
    write_scd1(spark, store, batch2, "t", key_cols=["id"], now=_ts(T1))

    got = store.read(spark, "t")
    assert _rows(got, "id", "name", "offset") == sorted(
        [(1, "a", 10), (2, "b", 99), (3, "c", 30), (4, "d", 40),
         (5, "e", 50), (6, "f", 60), (7, "g", 70)])
    # unchanged rows keep their original valid_from; changed/new take T1
    vf = {r["id"]: r[VALID_FROM].isoformat() for r in got.collect()}
    assert vf[1].startswith("2024-01-01") and vf[2].startswith("2024-02-01")
    assert vf[7].startswith("2024-02-01")


def test_scd1_noop_rerun_keeps_valid_from(spark, store):
    write_scd1(spark, store, _df(spark, BASE), "t", key_cols=["id"], now=_ts(T0))
    write_scd1(spark, store, _df(spark, BASE), "t", key_cols=["id"], now=_ts(T1))
    got = store.read(spark, "t")
    assert got.filter(F.col(VALID_FROM) == _ts(T1)).count() == 0


def test_scd1_dedup_on_keys(spark, store):
    dup = _df(spark, [(1, "a", 10), (1, "a", 10), (2, "b", 20)])
    write_scd1(spark, store, dup, "t", key_cols=["id"], now=_ts(T0),
               dedup_on_keys=True)
    assert store.read(spark, "t").count() == 2


# -- scd2 -------------------------------------------------------------------

def test_scd2_history_invariants(spark, store):
    write_scd2(spark, store, _df(spark, BASE), "t", key_cols=["id"],
               valid_from=_ts(T0))
    batch2 = _df(spark, [(2, "b", 99), (7, "g", 70)])
    write_scd2(spark, store, batch2, "t", key_cols=["id"], valid_from=_ts(T1))

    got = store.read(spark, "t")
    assert got.count() == 8  # 6 original + 1 closed-replacement + 1 new key
    active = got.filter(F.col(ACTIVE) == "Y")
    # exactly one active row per key — the reference's hardest invariant
    assert active.groupBy("id").count().filter("count > 1").count() == 0
    assert _rows(active, "id", "offset") == sorted(
        [(1, 10), (2, 99), (3, 30), (4, 40), (5, 50), (6, 60), (7, 70)])
    closed = got.filter(F.col(ACTIVE) == "N").collect()
    assert len(closed) == 1 and closed[0]["id"] == 2
    # closed row chains: valid_to == new version's valid_from
    assert closed[0][VALID_TO].isoformat().startswith("2024-02-01")
    new_active = active.filter("id = 2").collect()[0]
    assert new_active[VALID_FROM].isoformat().startswith("2024-02-01")
    assert new_active[VALID_TO].isoformat().startswith("9999-12-31")


def test_scd2_third_run_extends_chain(spark, store):
    write_scd2(spark, store, _df(spark, BASE), "t", key_cols=["id"], valid_from=_ts(T0))
    write_scd2(spark, store, _df(spark, [(2, "b", 99)]), "t", key_cols=["id"],
               valid_from=_ts(T1))
    write_scd2(spark, store, _df(spark, [(2, "b", 111)]), "t", key_cols=["id"],
               valid_from=_ts(T2))
    got = store.read(spark, "t").filter("id = 2")
    assert got.count() == 3
    chain = sorted((r[VALID_FROM].isoformat()[:10], r[VALID_TO].isoformat()[:10],
                    r[ACTIVE]) for r in got.collect())
    assert chain == [("2024-01-01", "2024-02-01", "N"),
                     ("2024-02-01", "2024-03-01", "N"),
                     ("2024-03-01", "9999-12-31", "Y")]


def test_scd2_active_mapping_and_rename(spark, store):
    write_scd2(spark, store, _df(spark, BASE), "t", key_cols=["id"], valid_from=_ts(T0),
               active_mapping={"Y": "1", "N": "0"},
               rename={ACTIVE: "is_active", VALID_TO: "end_ts"})
    got = store.read(spark, "t")
    assert "is_active" in got.columns and "end_ts" in got.columns
    assert got.filter("is_active = '1'").count() == 6


def test_scd2_rename_roundtrip_second_run(spark, store):
    rename = {ACTIVE: "is_active"}
    write_scd2(spark, store, _df(spark, BASE), "t", key_cols=["id"],
               valid_from=_ts(T0), rename=rename)
    write_scd2(spark, store, _df(spark, [(2, "b", 99)]), "t", key_cols=["id"],
               valid_from=_ts(T1), rename=rename)
    got = store.read(spark, "t")
    assert got.filter("is_active = 'Y' AND id = 2").count() == 1
    assert got.filter("is_active = 'N' AND id = 2").count() == 1


def test_scd2_fix_duplicates_by_key(spark, store):
    # one batch carrying three versions of key 1, where versions 2 and 3
    # have identical data (consecutive dup → dropped, reference
    # write.py:875-960) plus a single-version key 2
    batch = spark.createDataFrame(
        [(1, "a", 10, "2024-01-01 00:00:00"),
         (1, "a", 11, "2024-01-02 00:00:00"),
         (1, "a", 11, "2024-01-03 00:00:00"),
         (2, "b", 20, "2024-01-01 00:00:00")],
        "id long, name string, offset long, event_ts string") \
        .withColumn("event_ts", F.col("event_ts").cast("timestamp"))
    write_scd2(spark, store, batch, "t", key_cols=["id"],
               valid_from="event_ts", fix_duplicates_by_key=True)
    got = store.read(spark, "t")
    k1 = sorted((r["offset"], r[ACTIVE], r[VALID_FROM].isoformat()[:10],
                 r[VALID_TO].isoformat()[:10]) for r in got.filter("id=1").collect())
    assert k1 == [(10, "N", "2024-01-01", "2024-01-02"),
                  (11, "Y", "2024-01-02", "9999-12-31")]
    assert got.filter("id=2").count() == 1


# -- scd3 -------------------------------------------------------------------

def test_scd3_prev_column_lifecycle(spark, store):
    write_scd3(spark, store, _df(spark, BASE), "t", key_cols=["id"],
               tracked_cols=["name"], now=_ts(T0))
    got = store.read(spark, "t")
    assert "prev_name" in got.columns
    assert got.filter(F.col("prev_name").isNotNull()).count() == 0

    # tracked-column change → prev_name takes old value
    write_scd3(spark, store, _df(spark, [(2, "B", 20)]), "t", key_cols=["id"],
               tracked_cols=["name"], now=_ts(T1))
    got = store.read(spark, "t")
    r2 = got.filter("id = 2").collect()[0]
    assert (r2["name"], r2["prev_name"]) == ("B", "b")

    # untracked data change → data updates, prev stays
    write_scd3(spark, store, _df(spark, [(2, "B", 999)]), "t", key_cols=["id"],
               tracked_cols=["name"], now=_ts(T2))
    r2 = store.read(spark, "t").filter("id = 2").collect()[0]
    assert (r2["name"], r2["prev_name"], r2["offset"]) == ("B", "b", 999)


def test_scd3_second_tracked_change_overwrites_prev(spark, store):
    write_scd3(spark, store, _df(spark, BASE), "t", key_cols=["id"],
               tracked_cols=["name"], now=_ts(T0))
    write_scd3(spark, store, _df(spark, [(2, "B", 20)]), "t", key_cols=["id"],
               tracked_cols=["name"], now=_ts(T1))
    write_scd3(spark, store, _df(spark, [(2, "C", 20)]), "t", key_cols=["id"],
               tracked_cols=["name"], now=_ts(T2))
    r2 = store.read(spark, "t").filter("id = 2").collect()[0]
    assert (r2["name"], r2["prev_name"]) == ("C", "B")


# -- constraints + store ----------------------------------------------------

def test_table_constraint(spark, store):
    write_overwrite(spark, store, _df(spark, BASE[:3]), "dim", now=_ts(T0))
    ok = _df(spark, BASE[:2])
    check_table_constraints(spark, store, ok, [("dim", ["id"])])  # no raise
    bad = _df(spark, [(99, "zz", 0)])
    with pytest.raises(ConstraintViolation):
        check_table_constraints(spark, store, bad, [("dim", ["id"])])


def test_store_versioning_and_time_travel(spark, store):
    write_overwrite(spark, store, _df(spark, BASE[:2]), "t", now=_ts(T0))
    write_append(spark, store, _df(spark, BASE[2:4]), "t", now=_ts(T1))
    assert store.version("t") == 1
    assert [m["version"] for m in store.history("t")] == [1, 0]
    assert store.read_version(spark, "t", 0).count() == 2
    assert store.read(spark, "t").count() == 4


def test_append_partition_mismatch_raises(spark, store):
    df = _df(spark, BASE).withColumn("grp", F.lit("x"))
    write_overwrite(spark, store, df, "t", partition_by=["grp"], now=_ts(T0))
    with pytest.raises(ValueError):
        store.append(spark, df, "t", partition_by=["name"])


def test_scd2_history_start_value(spark, store):
    """history_start_tracking_value semantics (reference write.py:849-863):
    brand-new keys open their first history row at the fixed literal;
    changed keys' version-2 rows keep the source valid_from."""
    from projectone_spark.writers import write_scd2

    epoch = _ts("1900-01-01")
    write_scd2(spark, store, _df(spark, BASE[:3]), "t", key_cols=["id"],
               valid_from=_ts(T0), history_start=epoch)
    got = {r["id"]: r[VALID_FROM].isoformat()
           for r in store.read(spark, "t").collect()}
    assert all(v.startswith("1900-01-01") for v in got.values())

    # batch 2: id=2 changes (new version at T1), id=7 is brand new (epoch)
    write_scd2(spark, store, _df(spark, [(2, "b", 99), (7, "g", 70)]), "t",
               key_cols=["id"], valid_from=_ts(T1), history_start=epoch)
    t = store.read(spark, "t")
    active = {r["id"]: r[VALID_FROM].isoformat()
              for r in t.filter(F.col(ACTIVE) == "Y").collect()}
    assert active[7].startswith("1900-01-01")   # new key -> history start
    assert active[2].startswith("2024-02-01")   # new VERSION -> source time
    assert active[1].startswith("1900-01-01")   # untouched
    # exactly one active row per key still holds
    assert t.filter(F.col(ACTIVE) == "Y").count() == 4


def test_task_write_extra_options_knobs(spark, tmp_path):
    """persist_dataset / stage_results / exclude_data_columns /
    use_paritition_column_in_merge flow from the contract into the write."""
    from projectone_spark.config import SparkOutput, WriteOptions
    from projectone_spark.task import SparkTask

    wo = WriteOptions(key_attributes="id",
                      exclude_data_columns="offset",
                      persist_dataset=True, stage_results=True)
    out = SparkOutput(name="o", table="t", write_type="scd1",
                      write_options=wo)
    task = (SparkTask.builder.setName("knobs")
            .setInput(name="src", path="/root/testdata/sf0.001/orders.parquet",
                      source="parquet")
            .setOutput(name="o", table="t", write_type="scd1")
            .setStateLocation(str(tmp_path / "state"))
            .setStoreLocation(str(tmp_path / "s"))
            .setSession(spark).create())
    task._write_output(out, _df(spark, BASE))
    # change ONLY the excluded column: scd1 must see "no data change"
    changed = _df(spark, [(1, "a", 999)])
    task._write_output(out, changed)
    got = {r["id"]: r["offset"]
           for r in task.store.read(spark, "t").collect()}
    assert got[1] == 10  # offset excluded from change detection -> kept
    assert wo.data_attributes == "name"  # computed complement persisted
