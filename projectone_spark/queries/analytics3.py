"""Analytics queries added after the r3 registry freeze (tail module —
see engine_ops2's docstring for why order matters). Each broadens a
distinct SQL surface: EXISTS-driven aggregation, multi-dimension volume
joins, and time-RANGE window frames."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from projectone_spark.queries import load, register

_Q34_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


@register("q34_priority_late_orders", _Q34_SQL,
          doc="TPC-H Q4 shape: correlated EXISTS (any line item shipped "
              ">60 days after order) decorrelated to a left-semi join, "
              "then count by priority — the semi join shuffles only "
              "(orderkey, dates) pairs, never lineitem payload",
          tags=("join", "semi", "agg", "subquery"))
def q34_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp")))
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = ((orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAY")))
    return (orders.join(li, cond, "semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


_Q35_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q35_two_nation_volume", _Q35_SQL,
          doc="TPC-H Q7 shape: 6-table join with a symmetric two-nation "
              "disjunction; only the bounded nation dim carries broadcast "
              "hints, fact joins shuffle on their keys, money math on "
              "exact DECIMAL",
          tags=("join", "agg", "broadcast"))
def q35_two_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    vol = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")))
    pair = (((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    return (li.join(supp, li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
            .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("bigint").alias("l_year"))
            .agg(F.round(F.sum(vol), 2).cast("double").alias("revenue")))


_Q36_SQL = """
WITH daily AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS day_spend
  FROM orders
  WHERE o_custkey % 100 = 0
  GROUP BY 1, 2)
SELECT o_custkey, d,
       CAST(day_spend AS DOUBLE) AS day_spend,
       CAST(sum(day_spend) OVER (
             PARTITION BY o_custkey ORDER BY d
             RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS spend_90d
FROM daily
"""


@register("q36_range_interval_frame", _Q36_SQL,
          doc="time-RANGE window frame: per-customer 90-day trailing spend "
              "via RANGE BETWEEN INTERVAL ... PRECEDING — the value-based "
              "frame (distinct from q28's row-based frame); exact DECIMAL "
              "sums so engines agree bit-for-bit",
          tags=("window", "frame", "agg"))
def q36_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    daily = (orders.groupBy("o_custkey",
                            F.col("o_orderdate").cast("date").alias("d"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .alias("day_spend")))
    return daily.select(
        "o_custkey", "d",
        F.col("day_spend").cast("double").alias("day_spend"),
        F.expr("sum(day_spend) OVER (PARTITION BY o_custkey ORDER BY d "
               "RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)")
        .cast("double").alias("spend_90d"))


_Q37_SQL = """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
"""


@register("q37_customer_distribution", _Q37_SQL,
          doc="TPC-H Q13 shape: LEFT OUTER join with an ON-clause filter "
              "(customers with zero qualifying orders keep c_count=0), "
              "then a histogram of the per-customer counts — double "
              "aggregation, the second one tiny",
          tags=("join", "outer", "agg"))
def q37_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") != "1-URGENT")
              .select("o_custkey", "o_orderkey"))
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


_E06_SQL = """
WITH dims AS (
  SELECT u.i AS dim, CAST(u.x AS DOUBLE) AS x
  FROM embeddings e,
       LATERAL (SELECT CAST(generate_subscripts(e.embedding, 1) AS INT) AS i,
                       unnest(e.embedding) AS x) u)
SELECT dim,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(x AS DECIMAL(18,9))), 6) AS DOUBLE) AS sum_x,
       round(min(x), 6) AS lo,
       round(max(x), 6) AS hi
FROM dims
GROUP BY dim
"""


@register("e06_embedding_profile", _E06_SQL,
          doc="embedding-column profiling: per-dimension count/mean/min/max "
              "via posexplode — the drift/health monitor a production "
              "vector pipeline runs over each ingest batch; one explode + "
              "one partial-aggregated groupBy, no UDF",
          tags=("embeddings", "profile", "llm"))
def e06_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(F.posexplode("embedding").alias("pos", "x"))
    # exact DECIMAL sum, not avg(double): float summation order varies with
    # partitioning, so a double mean is not reproducible bit-for-bit
    return (dims.groupBy((F.col("pos") + 1).cast("int").alias("dim"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("x").cast("double")
                               .cast("decimal(18,9)")), 6)
                 .cast("double").alias("sum_x"),
                 F.round(F.min(F.col("x").cast("double")), 6).alias("lo"),
                 F.round(F.max(F.col("x").cast("double")), 6).alias("hi")))
