"""Expectations: single-pass violation counting via Observation, drop
filtering, fail enforcement, NULL-as-violation semantics."""

import pyspark.sql.functions as F
import pytest

from projectone_spark.functions.quality import (
    Expectation, ExpectationViolation, apply_expectations, check,
    expect_and_write,
)

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_warn_counts_without_removing(spark):
    df = _orders(spark)
    exps = [Expectation("price_positive", "o_totalprice > 0"),
            Expectation("status_f", "o_orderstatus = 'F'")]
    observed, obs = apply_expectations(df, exps)
    n = observed.count()
    metrics = check(obs, exps)
    assert n == df.count() == metrics["__rows__"]
    assert metrics["price_positive"] == 0
    assert metrics["status_f"] == df.filter("o_orderstatus <> 'F'").count()


def test_drop_filters_and_counts(spark):
    df = _orders(spark)
    exps = [Expectation("recent", "o_orderdate >= '1996-01-01'", action="drop")]
    observed, obs = apply_expectations(df, exps)
    kept = observed.count()
    metrics = check(obs, exps)
    old = df.filter("o_orderdate < '1996-01-01'").count()
    assert metrics["recent"] == old
    assert kept == df.count() - old


def test_fail_raises_with_counts(spark):
    df = _orders(spark)
    exps = [Expectation("always_ok", "o_totalprice > 0", action="fail"),
            Expectation("doomed", "o_orderstatus = 'F'", action="fail")]
    observed, obs = apply_expectations(df, exps)
    observed.count()
    with pytest.raises(ExpectationViolation) as ei:
        check(obs, exps)
    # only the rule with actual violations appears
    assert "doomed" in ei.value.failures and "always_ok" not in ei.value.failures


def test_null_predicate_is_violation(spark):
    df = spark.createDataFrame([(1, None), (2, 5.0)], "id int, v double")
    exps = [Expectation("v_pos", "v > 0", action="drop")]
    observed, obs = apply_expectations(df, exps)
    rows = observed.collect()
    metrics = check(obs, exps)
    assert [r["id"] for r in rows] == [2]
    assert metrics["v_pos"] == 1  # NULL > 0 is NULL → counted and dropped


def test_expect_and_write_single_pass(spark, tmp_path):
    df = _orders(spark)
    exps = [Expectation("priority_known", "o_orderpriority IS NOT NULL"),
            Expectation("recent", "o_orderdate >= '1993-06-01'", action="drop")]
    out = str(tmp_path / "out")
    metrics = expect_and_write(
        df, exps, lambda clean: clean.write.mode("overwrite").parquet(out))
    written = spark.read.parquet(out)
    assert written.count() == df.count() - metrics["recent"]
    assert written.filter("o_orderdate < '1993-06-01'").count() == 0
