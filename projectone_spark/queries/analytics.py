"""Core analytics queries: scans, filters, joins, aggregations, windows,
set operations, sorts/limits — the relational operator inventory of
SURVEY.md §2.5-§2.10 exercised as TPC-H-style queries on the driver tables.

Plan notes (verified via .explain("formatted")):
- dimension tables (region/nation/supplier/part, and customer at small SF)
  are broadcast — no shuffle on the probe side;
- filters sit directly on the parquet scans (PushedFilters) and only the
  referenced columns are read (ReadSchema);
- aggregations are partial (map-side) before the exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from projectone_spark.queries import load, register

# ---------------------------------------------------------------------------
# q01: full-scan aggregation (TPC-H Q1 shape). Map-side partial agg, tiny
# 6-group result; at 100 TB this is scan-bound and embarrassingly parallel.
# ---------------------------------------------------------------------------

_Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                   AS sum_qty,
       round(sum(l_extendedprice), 2)                              AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4)                                   AS avg_qty,
       round(avg(l_extendedprice), 4)                              AS avg_price,
       round(avg(l_discount), 4)                                   AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q01_pricing_summary", _Q01_SQL,
          doc="TPC-H Q1 pricing summary: filter + grouped sums/avgs/count",
          tags=("scan", "filter", "agg", "sort"))
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q02: 3-way join + agg + top-k (TPC-H Q3 shape). customer/orders filtered
# before the join (pushdown), lineitem joined on orderkey; top-10 with an
# explicit orderkey tie-break so the LIMIT set is deterministic.
# ---------------------------------------------------------------------------

_Q02_SQL = """
SELECT o.o_orderkey,
       CAST(o.o_orderdate AS DATE)                                  AS order_date,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)        AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@register("q02_top_revenue_orders", _Q02_SQL,
          doc="TPC-H Q3 shape: filtered 3-way join, grouped revenue, top-10",
          tags=("join", "agg", "topk"))
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q03: star join over all dimensions (TPC-H Q5 shape). region/nation/supplier
# broadcast; the only shuffles are the orders⋈lineitem equi-join and the
# final small agg.
# ---------------------------------------------------------------------------

_Q03_SQL = """
SELECT n.n_name                                                     AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)        AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


@register("q03_region_revenue", _Q03_SQL,
          doc="TPC-H Q5 shape: 6-table star join with broadcast dims",
          tags=("join", "broadcast", "agg"))
def q03_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp,
              (supp.s_suppkey == li.l_suppkey) & (supp.s_nationkey == cust.c_nationkey))
        .join(F.broadcast(nation), nation.n_nationkey == supp.s_nationkey)
        .join(F.broadcast(region), region.r_regionkey == nation.n_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


# ---------------------------------------------------------------------------
# q04: pure filter + scalar agg (TPC-H Q6 shape) — fully pushed-down scan.
# ---------------------------------------------------------------------------

_Q04_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*)                                    AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q04_revenue_forecast", _Q04_SQL,
          doc="TPC-H Q6 shape: multi-predicate filter + scalar aggregate",
          tags=("scan", "filter", "agg"))
def q04_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


# ---------------------------------------------------------------------------
# q05: left-semi join (EXISTS) — TPC-H Q4 shape.
# ---------------------------------------------------------------------------

_Q05_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q05_priority_semi_join", _Q05_SQL,
          doc="TPC-H Q4 shape: EXISTS as left-semi join + grouped count",
          tags=("join", "semi", "agg"))
def q05_priority_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q06: anti join (NOT EXISTS) — the reference's table_constraint primitive
# (write.py:1165-1189) generalized to a reportable query.
# ---------------------------------------------------------------------------

_Q06_SQL = """
SELECT c.c_mktsegment, count(*) AS n_customers,
       round(sum(c.c_acctbal), 2) AS total_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@register("q06_customers_without_orders", _Q06_SQL,
          doc="anti join: customers never ordering, per segment (constraint-check shape)",
          tags=("join", "anti", "agg"))
def q06_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q07: ranking window — top-3 orders per customer.
# ---------------------------------------------------------------------------

_Q07_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total_price, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 3
"""


@register("q07_top_orders_per_customer", _Q07_SQL,
          doc="window row_number: top-3 orders per customer",
          tags=("window", "topk"))
def q07_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey",
                F.round("o_totalprice", 2).alias("total_price"), "rn")
    )


# ---------------------------------------------------------------------------
# q08: analytic window — running revenue + previous order gap per customer.
# Mirrors the reference's only window usage (lag/lead/row_number chains in
# the SCD2 duplicate repair, write.py:875-960).
# ---------------------------------------------------------------------------

_Q08_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS running_total,
       lag(o_orderkey) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey)     AS prev_orderkey
FROM orders
"""


@register("q08_customer_running_total", _Q08_SQL,
          doc="analytic window: running sum + lag per customer",
          tags=("window",))
def q08_customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
         .alias("running_total"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


# ---------------------------------------------------------------------------
# q09: ROLLUP grouping sets.
# ---------------------------------------------------------------------------

_Q09_SQL = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


@register("q09_priority_rollup", _Q09_SQL,
          doc="ROLLUP over (priority, status) with count + sum",
          tags=("agg", "rollup"))
def q09_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
    )


# ---------------------------------------------------------------------------
# q10: set operations — INTERSECT then EXCEPT on yearly customer cohorts.
# ---------------------------------------------------------------------------

_Q10_SQL = """
(SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                                         AND o_orderdate <  TIMESTAMP '1996-01-01'
 INTERSECT
 SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                                         AND o_orderdate <  TIMESTAMP '1997-01-01')
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                                        AND o_orderdate <  TIMESTAMP '1998-01-01'
"""


@register("q10_cohort_set_ops", _Q10_SQL,
          doc="INTERSECT/EXCEPT: customers active in 1995∩1996 but churned in 1997",
          tags=("setop",))
def q10_cohort_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")

    def cohort(y0: str, y1: str) -> DataFrame:
        return (orders.filter((F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
                              & (F.col("o_orderdate") < F.lit(y1).cast("timestamp")))
                .select("o_custkey").distinct())

    return (cohort("1995-01-01", "1996-01-01")
            .intersect(cohort("1996-01-01", "1997-01-01"))
            .subtract(cohort("1997-01-01", "1998-01-01")))


# ---------------------------------------------------------------------------
# q11: distinct aggregates.
# ---------------------------------------------------------------------------

_Q11_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey)  AS n_suppliers,
       count(DISTINCT l_partkey)  AS n_parts,
       count(*)                   AS n_items
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("q11_distinct_agg", _Q11_SQL,
          doc="multi distinct-aggregate per group",
          tags=("agg", "distinct"))
def q11_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"),
             F.countDistinct("l_partkey").alias("n_parts"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q12: time-bucketed aggregation over the events table (the batch analogue
# of a tumbling-window streaming agg; the streaming variant lives in
# projectone_spark.streaming).
# ---------------------------------------------------------------------------

_Q12_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*)               AS n_events,
       round(sum(value), 2)   AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


@register("q12_events_hourly", _Q12_SQL,
          doc="tumbling time-bucket aggregation over the events stream table",
          tags=("agg", "time", "events"))
def q12_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"),
             F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# q13: sessionization (gaps-and-islands) — 30-minute inactivity gap, the
# batch analogue of a session_window streaming agg.
# ---------------------------------------------------------------------------

_Q13_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, event_id, ts, value,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       count(*)             AS n_events,
       min(ts)              AS session_start,
       max(ts)              AS session_end,
       round(sum(value), 2) AS session_value
FROM sessions
GROUP BY user_id, session_seq
"""


@register("q13_sessionize", _Q13_SQL,
          doc="sessionization via gaps-and-islands (30-min inactivity gap)",
          tags=("window", "agg", "events"))
def q13_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(prev_ts.isNull()
               | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) > 1800000000), 1)
         .otherwise(0))
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
         .cast("bigint"))
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.round(F.sum("value"), 2).alias("session_value"))
    )
