"""Guard: event timestamps must decode to real wall-clock values.

The driver's testdata has already shipped ``events.ts`` in two physical
forms (int64 nanos in round 1, timestamp[us] TIMESTAMP_NTZ from round 2).
A wrong decode (e.g. applying the nanos ``DIV 1000`` to µs data) lands
every event in 1970 and silently corrupts every event-time query. These
tests fail loudly if a future testdata precision change reintroduces that.
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
import pytest

from projectone_spark.queries import load
from tests.conftest import SF_DIR

_ALL_SF_DIRS = sorted(
    d for d in glob.glob("/root/testdata/sf*")
    if os.path.exists(os.path.join(d, "events.parquet"))
) or [SF_DIR]


@pytest.mark.parametrize("sf_dir", _ALL_SF_DIRS)
def test_batch_events_ts_is_modern(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp", (
        "queries.load must normalize events.ts to TIMESTAMP "
        f"(got {dict(ev.dtypes)['ts']})")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    assert lo.year >= 2000, f"min(ts)={lo}: decode landed in the epoch era"
    assert hi.year <= 2100, f"max(ts)={hi}: decode overshot (ns read as µs?)"


def test_stream_events_ts_is_modern(spark):
    from projectone_spark.queries.streaming import _stream_events
    from projectone_spark.streaming import run_to_memory

    ev = _stream_events(spark, SF_DIR)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    got = run_to_memory(
        ev.select(F.year("ts").alias("y")).groupBy().agg(
            F.min("y").alias("lo"), F.max("y").alias("hi")),
        output_mode="complete").first()
    assert got.lo >= 2000 and got.hi <= 2100, (
        f"stream decode produced years [{got.lo}, {got.hi}]")


def test_batch_and_stream_agree(spark):
    """The batch and stream paths must decode ts to identical values."""
    from projectone_spark.queries.streaming import _stream_events
    from projectone_spark.streaming import run_to_memory

    batch = load(spark, SF_DIR, "events").agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"),
        F.count(F.lit(1)).alias("n")).first()
    stream = run_to_memory(
        _stream_events(spark, SF_DIR).groupBy().agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi"),
            F.count(F.lit(1)).alias("n")),
        output_mode="complete").first()
    assert (batch.lo, batch.hi, batch.n) == (stream.lo, stream.hi, stream.n)
