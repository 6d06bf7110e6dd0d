"""Bucketed store tables: correctness (same rows as plain reads) and the
scale claim itself — a join of two co-bucketed tables plans ZERO Exchange.
"""

import contextlib
import io

import pyspark.sql.functions as F
import pytest

from projectone_spark.store import TableStore
from projectone_spark.store.bucketing import read_bucketed, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture
def store(tmp_path):
    return TableStore(str(tmp_path / "store"))


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_roundtrip_and_version(spark, store):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    v = write_bucketed(store, spark, orders, "orders",
                       ["o_custkey"], 8, sort_by=["o_custkey"])
    assert v == 0
    got = read_bucketed(store, spark, "orders")
    assert got.count() == orders.count()
    assert sorted(got.columns) == sorted(orders.columns)


def test_cobucketed_join_has_no_exchange(spark, store):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    write_bucketed(store, spark, orders, "orders", ["o_custkey"], 8,
                   sort_by=["o_custkey"])
    write_bucketed(store, spark, customer, "customer", ["c_custkey"], 8,
                   sort_by=["c_custkey"])
    o = read_bucketed(store, spark, "orders")
    c = read_bucketed(store, spark, "customer")
    # force a non-broadcast join so the bucketing claim is what's tested
    joined = (o.hint("merge")
              .join(c.hint("merge"), o.o_custkey == c.c_custkey)
              .select("o_orderkey", "c_name"))
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: neither side shuffles
    # and the result matches the plain-parquet join
    base = (orders.join(customer, orders.o_custkey == customer.c_custkey)
            .select("o_orderkey", "c_name"))
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, base.collect()))


def test_bucketed_aggregation_has_no_exchange(spark, store):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed(store, spark, orders, "orders", ["o_custkey"], 8)
    o = read_bucketed(store, spark, "orders")
    agg = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    assert "Exchange" not in _plan(agg)
    base = (orders.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("s")))
    got = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("s"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, base.collect()))


def test_reregistration_after_catalog_loss(spark, store):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed(store, spark, orders, "orders", ["o_custkey"], 4)
    m = store.manifest("orders")
    spark.sql(f"DROP TABLE {m['metrics']['catalog_name']}")  # simulate new session
    o = read_bucketed(store, spark, "orders")
    agg = o.groupBy("o_custkey").count()
    assert "Exchange" not in _plan(agg)  # bucket spec recovered from manifest
    assert o.count() == orders.count()
