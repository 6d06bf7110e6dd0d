"""Incremental aggregate maintenance: fold-equals-recompute (exact, decimal
arithmetic), delete handling through the change feed, group retirement at
count zero, and refresh idempotence."""

import pyspark.sql.functions as F
import pytest

from projectone_spark.functions.incremental import (
    agg_view, delta_agg, fold, refresh_agg,
)
from projectone_spark.store import TableStore
from projectone_spark.store.state import StateStore

SF = "/root/testdata/sf0.001"


@pytest.fixture
def store(tmp_path):
    return TableStore(str(tmp_path / "store"))


@pytest.fixture
def state(tmp_path):
    return StateStore(str(tmp_path / "state"))


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def _expected(df):
    return sorted(map(tuple, df.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("s"),
        F.count(F.lit(1)).alias("n")).collect()))


def _got(store, spark):
    return sorted(map(tuple, agg_view(store, spark, "orders_agg")
                      .select("o_custkey", "sum_o_totalprice", "n_rows")
                      .collect()))


def test_fold_after_append_equals_recompute(spark, store, state):
    df = _orders(spark)
    b1 = df.filter("o_orderdate < '1996-01-01'")
    b2 = df.filter("o_orderdate >= '1996-01-01'")
    store.overwrite(spark, b1, "orders")
    v = refresh_agg(store, spark, "orders", "orders_agg",
                    ["o_custkey"], ["o_totalprice"], state)
    assert v == 0
    assert _got(store, spark) == _expected(b1)

    store.append(spark, b2, "orders")
    assert refresh_agg(store, spark, "orders", "orders_agg",
                       ["o_custkey"], ["o_totalprice"], state) == 1
    assert _got(store, spark) == _expected(df)  # exact: decimal, any fold order

    # already current → no-op
    assert refresh_agg(store, spark, "orders", "orders_agg",
                       ["o_custkey"], ["o_totalprice"], state) is None


def test_deletes_and_group_retirement(spark, store, state):
    df = _orders(spark).limit(200).cache()
    keys = [r[0] for r in df.select("o_custkey").distinct().limit(3).collect()]
    store.overwrite(spark, df, "orders")
    refresh_agg(store, spark, "orders", "orders_agg",
                ["o_custkey"], ["o_totalprice"], state)
    # drop every row of three customers via an overwrite commit
    remaining = df.filter(~F.col("o_custkey").isin(keys))
    store.overwrite(spark, remaining, "orders")
    refresh_agg(store, spark, "orders", "orders_agg",
                ["o_custkey"], ["o_totalprice"], state)
    got = _got(store, spark)
    assert got == _expected(remaining)
    assert not any(row[0] in keys for row in got)  # retired groups vanish


def test_update_as_delete_insert_pair(spark, store, state):
    df = _orders(spark).limit(100).cache()
    store.overwrite(spark, df, "orders")
    refresh_agg(store, spark, "orders", "orders_agg",
                ["o_orderstatus"], ["o_totalprice"], state)
    bumped = df.withColumn("o_totalprice", F.col("o_totalprice") + 5.0)
    store.overwrite(spark, bumped, "orders")
    refresh_agg(store, spark, "orders", "orders_agg",
                ["o_orderstatus"], ["o_totalprice"], state)
    assert _got_status(store, spark) == sorted(map(tuple, bumped.groupBy(
        "o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("s"),
        F.count(F.lit(1)).alias("n")).collect()))


def _got_status(store, spark):
    return sorted(map(tuple, agg_view(store, spark, "orders_agg")
                      .select("o_orderstatus", "sum_o_totalprice", "n_rows")
                      .collect()))


def test_delta_agg_is_single_shuffle(spark):
    import contextlib
    import io

    changes = (_orders(spark)
               .withColumn("_change_type", F.lit("insert"))
               .withColumn("_commit_version", F.lit(0)))
    d = delta_agg(changes, ["o_custkey"], ["o_totalprice"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        d.explain("formatted")
    plan = buf.getvalue()
    import re

    # formatted output names each node once in the tree and once in detail
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert "partial_sum" in plan  # map-side combine before the one shuffle


def test_avg_view(spark, store, state):
    df = _orders(spark)
    store.overwrite(spark, df, "orders")
    refresh_agg(store, spark, "orders", "orders_agg",
                ["o_orderstatus"], ["o_totalprice"], state)
    view = agg_view(store, spark, "orders_agg", avg_cols=["o_totalprice"])
    got = {r["o_orderstatus"]: r["avg_o_totalprice"] for r in view.collect()}
    exp = {r["o_orderstatus"]: r["a"] for r in
           df.groupBy("o_orderstatus").agg(F.avg("o_totalprice").alias("a")).collect()}
    for k, v in exp.items():
        assert abs(got[k] - v) < 1e-6


def test_refresh_distinct_sketches(spark, tmp_path):
    """Sketch maintenance folds only new commits and tracks exact distinct
    within HLL error; deletes in the feed are refused."""
    import pyspark.sql.functions as F
    from projectone_spark.functions.incremental import (
        distinct_view, refresh_distinct,
    )
    from projectone_spark.store import TableStore
    from projectone_spark.store.dml import delete_where
    from projectone_spark.store.state import StateStore

    store = TableStore(str(tmp_path / "store"))
    state = StateStore(str(tmp_path / "state"))
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    a = orders.filter(F.col("o_orderkey") % 2 == 0)
    b = orders.exceptAll(a)
    store.overwrite(spark, a, "orders")
    refresh_distinct(store, spark, "orders", "cust_sketch",
                     ["o_orderstatus"], "o_custkey", state)
    store.append(spark, b, "orders")
    assert refresh_distinct(store, spark, "orders", "cust_sketch",
                            ["o_orderstatus"], "o_custkey", state) is not None
    # already current → no-op
    assert refresh_distinct(store, spark, "orders", "cust_sketch",
                            ["o_orderstatus"], "o_custkey", state) is None
    got = {r["o_orderstatus"]: r["approx_distinct"]
           for r in distinct_view(store, spark, "cust_sketch",
                                  ["o_orderstatus"]).collect()}
    exact = {r["o_orderstatus"]: r["n"]
             for r in orders.groupBy("o_orderstatus")
             .agg(F.countDistinct("o_custkey").alias("n")).collect()}
    for k, n in exact.items():
        assert abs(got[k] - n) / n < 0.05, f"{k}: {got[k]} vs exact {n}"
    # a delete commit poisons the feed for sketches
    lo = orders.agg(F.min("o_orderkey")).first()[0]
    delete_where(store, spark, "orders", [("o_orderkey", "==", int(lo))])
    with pytest.raises(ValueError, match="append-only"):
        refresh_distinct(store, spark, "orders", "cust_sketch",
                         ["o_orderstatus"], "o_custkey", state)
