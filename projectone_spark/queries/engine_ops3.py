"""Engine-op queries added in round 4 — registry TAIL (the driver's
adjudication prefix is unaffected; these run in bench and local parity
now and are rotation candidates for later rounds).

Both queries give driver-oracle coverage to write-path features that were
previously pytest-only: referential table constraints and selective
(replaceWhere/partition) overwrite.
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.queries import load, register

_S15_SQL = """
SELECT o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_price
FROM orders o
WHERE o.o_custkey IN (SELECT c_custkey FROM customer)
GROUP BY o.o_orderstatus
"""


@register("s15_table_constraint", _S15_SQL,
          doc="referential pre-write constraint (reference table_constraint, "
              "write.py:1165-1189): orders append to the store only after an "
              "anti-join proves every o_custkey exists in the customer "
              "dimension; a deliberately orphaned probe row is asserted to "
              "RAISE before any write happens, then the valid write lands "
              "and the stored table aggregates per status",
          tags=("store", "write", "constraint"))
def s15_table_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.store import TableStore
    from projectone_spark.writers import (
        ConstraintViolation, check_table_constraints, write_append,
    )

    store = TableStore(tempfile.mkdtemp(prefix="po_s15_"))
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    store.overwrite(spark, cust, "customer")
    orders = (load(spark, sf_dir, "orders")
              .select(F.col("o_custkey").alias("c_custkey"),
                      "o_orderstatus", "o_totalprice"))

    # negative probe: one orphaned key must fail the check BEFORE any write
    bad = orders.limit(1).withColumn("c_custkey", F.lit(-1).cast("bigint"))
    try:
        check_table_constraints(spark, store, orders.unionByName(bad),
                                [("customer", ["c_custkey"])])
    except ConstraintViolation:
        pass
    else:  # pragma: no cover - guards the query's own claim
        raise AssertionError("orphaned key passed the table constraint")

    check_table_constraints(spark, store, orders,
                            [("customer", ["c_custkey"])])
    write_append(spark, store, orders, "orders")
    return (store.read(spark, "orders")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
                 .cast("double").alias("total_price")))


_S16_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(CASE WHEN o_orderstatus = 'O'
                                THEN o_totalprice - 100.0
                                ELSE o_totalprice END
                           AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderstatus
"""


@register("s16_selective_overwrite", _S16_SQL,
          doc="selective overwrite (replaceWhere — declared but never "
              "implemented in the reference, sources.py:85): a status-"
              "partitioned table has ONLY its 'O' partition rewritten with "
              "repriced rows (flat exact delta — no rounding-tie risk); "
              "untouched partitions re-link metadata-only, and the read-"
              "back aggregation proves exactly one partition changed",
          tags=("store", "write", "selective-overwrite"))
def s16_selective_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.store import TableStore
    from projectone_spark.writers import write_selective_overwrite

    store = TableStore(tempfile.mkdtemp(prefix="po_s16_"))
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    store.overwrite(spark, orders, "orders", partition_by=["o_orderstatus"])
    repriced = (orders.filter(F.col("o_orderstatus") == "O")
                .withColumn("o_totalprice", F.col("o_totalprice") - 100.0))
    write_selective_overwrite(
        spark, store, repriced, "orders",
        partition_values={"o_orderstatus": ["O"]},
        partition_by=["o_orderstatus"])
    return (store.read(spark, "orders")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
                 .cast("double").alias("total_price")))
