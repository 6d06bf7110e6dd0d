"""Unit tests for the as-of / range join operators."""

from __future__ import annotations

import pyspark.sql.functions as F

from projectone_spark.functions.joins import asof_join, range_join


def _t(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c, t in df.dtypes:
        if c.endswith("ts"):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def test_asof_backward_inclusive(spark):
    left = _t(spark, [("k", "2024-01-01 10:00:00", 1),
                      ("k", "2024-01-01 12:00:00", 2),
                      ("k", "2024-01-01 09:00:00", 3)],
              "key string, lts string, lid long")
    right = _t(spark, [("k", "2024-01-01 10:00:00", "a"),
                       ("k", "2024-01-01 11:00:00", "b")],
               "key string, rts string, tag string")
    out = asof_join(left, right, on=["key"], left_ts="lts", right_ts="rts")
    got = {r["lid"]: r["tag"] for r in out.collect()}
    # 09:00 precedes any right row → NULL; 10:00 matches equal ts (inclusive);
    # 12:00 takes the latest prior (11:00)
    assert got == {3: None, 1: "a", 2: "b"}


def test_asof_tolerance(spark):
    left = _t(spark, [("k", "2024-01-02 00:00:00", 1)],
              "key string, lts string, lid long")
    right = _t(spark, [("k", "2024-01-01 00:00:00", "old")],
               "key string, rts string, tag string")
    near = asof_join(left, right, on=["key"], left_ts="lts", right_ts="rts",
                     tolerance="'2' DAYS")
    far = asof_join(left, right, on=["key"], left_ts="lts", right_ts="rts",
                    tolerance="'1' HOURS")
    assert near.collect()[0]["tag"] == "old"
    assert far.collect()[0]["tag"] is None


def test_asof_keys_do_not_cross(spark):
    left = _t(spark, [("a", "2024-01-01 10:00:00", 1)],
              "key string, lts string, lid long")
    right = _t(spark, [("b", "2024-01-01 09:00:00", "x")],
               "key string, rts string, tag string")
    out = asof_join(left, right, on=["key"], left_ts="lts", right_ts="rts")
    assert out.collect()[0]["tag"] is None


def test_range_join_half_open(spark):
    left = _t(spark, [("k", "2024-01-01 00:00:00"), ("k", "2024-01-03 00:00:00"),
                      ("k", "2024-01-05 00:00:00")],
              "key string, ets string")
    right = _t(spark, [("k", "2024-01-01 00:00:00", "2024-01-05 00:00:00")],
               "key string, lots string, hits string")
    out = range_join(left, right, left_ts="ets", right_lo="lots",
                     right_hi="hits", on=["key"])
    # half-open [lo, hi): 01-01 and 01-03 inside, 01-05 excluded
    assert out.count() == 2
