"""CDC state-machine tests: the exact boundary semantics of the reference
(``core/sources/delta_source.py:251-333`` / ``file_source.py:814-896``) —
inclusive first run, exclusive-start later runs, read-nothing on no data,
inclusive backfill — plus state persistence round-trips."""

from __future__ import annotations

import datetime as dt

import pytest

from projectone_spark.cdc import (
    CdcState,
    incremental_read,
    load_cdc_state,
    resolve_cdc,
    save_cdc_state,
)
from projectone_spark.store.state import StateStore

SCHEMA = "id long, offset long"


def _df(spark, offsets):
    return spark.createDataFrame([(i, o) for i, o in enumerate(offsets)], SCHEMA)


@pytest.fixture()
def state(tmp_path):
    return StateStore(str(tmp_path / "state"))


def test_first_run_inclusive_min_max(spark):
    df = _df(spark, [10, 20, 30])
    pred, st = resolve_cdc(df, "offset")
    assert df.filter(pred).count() == 3
    assert (st.start_value, st.next_value, st.load_type) == (10, 30, "incremental")


def test_incremental_reads_only_new(spark):
    df = _df(spark, [10, 20, 30, 40, 50])
    prev = CdcState("offset", start_value=10, next_value=30)
    pred, st = resolve_cdc(df, "offset", prev)
    got = sorted(r["offset"] for r in df.filter(pred).collect())
    assert got == [40, 50]  # strictly > prev.next, <= new max
    assert (st.start_value, st.next_value) == (30, 50)


def test_no_new_data_reads_nothing_and_keeps_position(spark):
    df = _df(spark, [10, 20, 30])
    prev = CdcState("offset", start_value=10, next_value=30)
    pred, st = resolve_cdc(df, "offset", prev)
    assert df.filter(pred).count() == 0
    assert st.next_value == 30  # position unchanged


def test_empty_source_first_run(spark):
    df = _df(spark, [])
    pred, st = resolve_cdc(df, "offset")
    assert df.filter(pred).count() == 0
    assert st.start_value is None and st.next_value is None


def test_backfill_inclusive_range(spark):
    df = _df(spark, [10, 20, 30, 40, 50])
    pred, st = resolve_cdc(df, "offset", backfill=(20, 40))
    got = sorted(r["offset"] for r in df.filter(pred).collect())
    assert got == [20, 30, 40]
    assert st.load_type == "backfill"


def test_timestamp_attribute_roundtrip(spark, state):
    rows = [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 2))]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    filtered, st = incremental_read(df, "ts", state, "inp")
    assert filtered.count() == 2
    save_cdc_state(state, "inp", st)
    # state survives JSON persistence with timestamp typing intact
    loaded = load_cdc_state(state, "inp")
    assert loaded.next_value == dt.datetime(2024, 1, 2)

    df2 = spark.createDataFrame(rows + [(3, dt.datetime(2024, 1, 5))],
                                "id long, ts timestamp")
    filtered2, st2 = incremental_read(df2, "ts", state, "inp")
    assert [r["id"] for r in filtered2.collect()] == [3]
    assert st2.next_value == dt.datetime(2024, 1, 5)


def test_two_run_cycle_via_store(spark, state):
    df1 = _df(spark, [10, 20])
    f1, st1 = incremental_read(df1, "offset", state, "inp")
    assert f1.count() == 2
    save_cdc_state(state, "inp", st1)

    df2 = _df(spark, [10, 20, 30])
    f2, st2 = incremental_read(df2, "offset", state, "inp")
    assert [r["offset"] for r in f2.collect()] == [30]
    save_cdc_state(state, "inp", st2)
    # versioned history retained (reference state.py:89-127)
    env = state.get("inp_cdc_value", folder="sources")
    assert env["version"] == 1
    assert state.get_version("inp_cdc_value", 0, folder="sources") is not None


def test_state_store_versioning(state):
    assert state.set("k", {"a": 1}) == 0
    assert state.set("k", {"a": 2}) == 1
    assert state.get_value("k") == {"a": 2}
    assert state.get_version("k", 0)["value"] == {"a": 1}
    assert "k" in state.keys()
