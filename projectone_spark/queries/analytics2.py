"""Extended analytics coverage: the remaining TPC-H query shapes plus the
operator classes the reference gets "for free" from Spark SQL (SURVEY
§2.5-2.8): disjunctive predicates, correlated-aggregate subqueries, cube +
grouping_id, pivot, exact percentiles, moving-window frames, as-of and
range joins.

Plan notes (verified via .explain("formatted")):
- dimension sides (part, supplier, per-part averages) broadcast under the
  64 MB threshold; fact scans keep PushedFilters for every constant
  predicate;
- the as-of join is the union-merge idiom from
  :mod:`projectone_spark.functions.joins` — one shuffle, no
  broadcast-nested-loop;
- cube/rollup run as a single expand + hash aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from projectone_spark.functions.joins import asof_join, range_join
from projectone_spark.queries import load, register
from projectone_spark.session import scratch_dir

def _rev() -> F.Column:
    """Revenue expression; a function because Column construction needs a
    live SparkContext (import happens before any session exists)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'ECONOMY'
                              THEN l_extendedprice * (1 - l_discount) END)
             / sum(l_extendedprice * (1 - l_discount)), 2) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
"""


@register("q14_promo_revenue", _Q14_SQL,
          doc="TPC-H Q14 shape: broadcast dim join + conditional aggregate ratio",
          tags=("join", "agg"))
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp")))
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(part, li.l_partkey == part.p_partkey)
    promo = F.sum(F.when(F.col("p_type") == "ECONOMY", _rev()))
    return j.agg(F.round(100.0 * promo / F.sum(_rev()), 2).alias("promo_pct"))


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
"""


@register("q15_top_supplier", _Q15_SQL,
          doc="TPC-H Q15 shape: scalar-subquery max without a global sort",
          tags=("join", "agg", "subquery"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    rev = (li.groupBy("l_suppkey")
           .agg(F.round(F.sum(_rev()), 2).alias("total_rev")))
    # scalar max broadcast back — no single-partition global window
    mx = rev.agg(F.max("total_rev").alias("mx"))
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.join(F.broadcast(mx), rev.total_rev == mx.mx)
            .join(sup, rev.l_suppkey == sup.s_suppkey)
            .select("s_suppkey", "s_name", "total_rev"))


_Q16_SQL = """
SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#9' AND p_size BETWEEN 1 AND 15
GROUP BY p_brand, p_size
"""


@register("q16_supplier_variety", _Q16_SQL,
          doc="TPC-H Q16 shape: distinct-count per group with dim predicates",
          tags=("join", "agg", "distinct"))
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9") & F.col("p_size").between(1, 15))
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (li.join(part, li.l_partkey == part.p_partkey)
            .groupBy("p_brand", "p_size")
            .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")))


_Q17_SQL = """
WITH avg_qty AS (
  SELECT l_partkey AS a_partkey, 0.5 * avg(l_quantity) AS half_avg
  FROM lineitem GROUP BY l_partkey)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN avg_qty ON l_partkey = a_partkey
WHERE l_quantity < half_avg
"""


@register("q17_small_quantity_revenue", _Q17_SQL,
          doc="TPC-H Q17 shape: correlated average de-correlated to a self-agg join",
          tags=("join", "agg", "subquery"))
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    avg_qty = (li.groupBy(F.col("l_partkey").alias("a_partkey"))
               .agg((0.5 * F.avg("l_quantity")).alias("half_avg")))
    # avg_qty is a fact-derived aggregate (|part| cardinality — grows with
    # data): no broadcast hint; AQE picks the strategy that fits at runtime
    j = li.join(avg_qty, li.l_partkey == avg_qty.a_partkey)
    return (j.filter(F.col("l_quantity") < F.col("half_avg"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")))


_Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       round(o_totalprice, 2) AS total_price,
       round(sum(l_quantity), 1) AS sum_qty
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
HAVING sum(l_quantity) > 200
"""


@register("q18_large_orders", _Q18_SQL,
          doc="TPC-H Q18 shape: group-filter on a fact join (HAVING over sum)",
          tags=("join", "agg"))
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = (orders.join(li, orders.o_orderkey == li.l_orderkey)
         .join(cust, orders.o_custkey == cust.c_custkey))
    return (j.groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                      "o_totalprice")
            .agg(F.sum("l_quantity").alias("raw_qty"))
            .filter(F.col("raw_qty") > 200)
            .select("c_custkey", "c_name", "o_orderkey",
                    F.col("o_orderdate").cast("date").alias("order_date"),
                    F.round("o_totalprice", 2).alias("total_price"),
                    F.round("raw_qty", 1).alias("sum_qty")))


_Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("q19_disjunctive_predicates", _Q19_SQL,
          doc="TPC-H Q19 shape: OR'd multi-column range predicates over a join",
          tags=("join", "filter"))
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(part, li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 15)
           & q.between(20, 30)))
    return j.filter(pred).agg(F.round(F.sum(_rev()), 2).alias("revenue"))


_Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 100)
"""


@register("q20_bulk_part_suppliers", _Q20_SQL,
          doc="TPC-H Q20 shape: nested grouped-HAVING feeding a semi join",
          tags=("join", "semi", "agg"))
def q20_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
    bulky = (li.groupBy("l_suppkey", "l_partkey")
             .agg(F.sum("l_quantity").alias("q"))
             .filter(F.col("q") > 100)
             .select("l_suppkey"))
    sup = load(spark, sf_dir, "supplier")
    return (sup.join(bulky, sup.s_suppkey == bulky.l_suppkey, "semi")
            .select("s_suppkey", "s_name"))


_Q22_SQL = """
WITH rich AS (
  SELECT * FROM customer
  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0))
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(c_acctbal), 2) AS total_bal
FROM rich
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment
"""


@register("q22_idle_rich_customers", _Q22_SQL,
          doc="TPC-H Q22 shape: scalar-avg filter + anti join + grouped agg",
          tags=("join", "anti", "subquery"))
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("ab")))
    recent = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
              .select("o_custkey"))
    rich = (cust.join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("ab")))
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "anti")
    return (idle.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                 F.round(F.sum("c_acctbal"), 2).alias("total_bal")))


_Q23_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(l_quantity), 1) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("q23_cube_grouping", _Q23_SQL,
          doc="CUBE over (returnflag, linestatus) with grouping_id",
          tags=("agg", "cube"))
def q23_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.grouping_id().cast("bigint").alias("gid"),
                 F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.round(F.sum("l_quantity"), 1).alias("sum_qty")))


_Q24_SQL = """
SELECT o_orderpriority,
       CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS status_o,
       CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS status_f,
       CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS status_p
FROM orders GROUP BY o_orderpriority
"""


@register("q24_status_pivot", _Q24_SQL,
          doc="pivot order status → one count column per status value",
          tags=("agg", "pivot"))
def q24_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # explicit value list: no extra distinct-scan job, stable column order
    piv = (orders.groupBy("o_orderpriority")
           .pivot("o_orderstatus", ["O", "F", "P"])
           .agg(F.count(F.lit(1))))
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("status_o"),
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("status_f"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("status_p"))


_Q25_SQL = """
WITH purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
views AS (
  SELECT user_id, ts AS view_ts, value AS view_value
  FROM events WHERE event_type = 'view')
SELECT event_id, purchases.user_id AS user_id, ts, view_ts, view_value
FROM purchases ASOF LEFT JOIN views
  ON purchases.user_id = views.user_id AND purchases.ts >= views.view_ts
"""


@register("q25_asof_last_view", _Q25_SQL,
          doc="as-of join: each purchase gains the user's latest prior view "
              "(union-merge plan, one shuffle)",
          tags=("join", "asof", "events"))
def q25_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts", "value"))
    views = (ev.filter(F.col("event_type") == "view")
             .select("user_id", F.col("ts").alias("view_ts"),
                     F.col("value").alias("view_value")))
    out = asof_join(purchases, views, on=["user_id"],
                    left_ts="ts", right_ts="view_ts")
    return out.select("event_id", "user_id", "ts", "view_ts", "view_value")


_Q26_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_shipped_30d
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate < o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority
"""


@register("q26_range_join_ship_lag", _Q26_SQL,
          doc="range join: lineitems shipped within 30 days of order placement",
          tags=("join", "range"))
def q26_range_join_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("k"), "l_shipdate"))
    orders = (load(spark, sf_dir, "orders")
              .select(F.col("o_orderkey").alias("k"), "o_orderpriority",
                      F.col("o_orderdate").alias("lo"),
                      (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("hi")))
    j = range_join(li, orders, left_ts="l_shipdate", right_lo="lo",
                   right_hi="hi", on=["k"])
    return (j.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_shipped_30d")))


_Q27_SQL = """
SELECT l_returnflag,
       quantile_disc(l_extendedprice, 0.5) AS median_price,
       quantile_disc(l_extendedprice, 0.9) AS p90_price
FROM lineitem GROUP BY l_returnflag
"""


@register("q27_exact_percentiles", _Q27_SQL,
          doc="exact discrete percentiles (median/p90) per return flag — "
              "discrete avoids cross-engine interpolation ulp drift",
          tags=("agg", "percentile"))
def q27_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
                 .alias("median_price"),
                 F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)")
                 .alias("p90_price")))


_Q28_SQL = """
WITH daily AS (
  SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  GROUP BY 1, 2)
SELECT l_returnflag, d,
       CAST(rev_dec AS DOUBLE) AS day_rev,
       CAST(sum(rev_dec) OVER (PARTITION BY l_returnflag ORDER BY d
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS rev_7d_sum
FROM daily
"""


@register("q28_moving_window_revenue", _Q28_SQL,
          doc="7-row moving window over daily revenue per return flag "
              "(exact decimal arithmetic, no float-rounding ambiguity)",
          tags=("window", "agg"))
def q28_moving_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
    # money math on DECIMAL: sums are exact, so Spark and any other engine
    # produce bit-identical doubles at the end — no round() ties
    rev_dec = (F.col("l_extendedprice").cast("decimal(18,2)")
               * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")))
    daily = (li.groupBy("l_returnflag",
                        F.col("l_shipdate").cast("date").alias("d"))
             .agg(F.sum(rev_dec).alias("rev_dec")))
    w = (Window.partitionBy("l_returnflag").orderBy("d")
         .rowsBetween(-6, Window.currentRow))
    return daily.select(
        "l_returnflag", "d",
        F.col("rev_dec").cast("double").alias("day_rev"),
        F.sum("rev_dec").over(w).cast("double").alias("rev_7d_sum"))


_Q29_SQL = """
SELECT o_orderpriority, 'status_o' AS status, CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, 'status_f' AS status, CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, 'status_p' AS status, CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
"""


@register("q29_unpivot", _Q29_SQL,
          doc="unpivot/melt: wide status counts back to long (priority, status, n)",
          tags=("unpivot",))
def q29_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = q24_status_pivot(spark, sf_dir)
    return wide.unpivot("o_orderpriority",
                        ["status_o", "status_f", "status_p"],
                        "status", "n")


_A01_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
       quantile_disc(value, 0.5) AS median_value,
       TRUE AS sketch_within_bound
FROM events
GROUP BY event_type
"""


@register("a01_approx_sketches", _A01_SQL, bench=True,
          doc="approximate aggregates adjudicated against their exact "
              "twins: HLL distinct (rsd=0.02) and approx median per event "
              "type are computed alongside exact countDistinct and "
              "percentile_disc in ONE aggregation pass; the query ASSERTS "
              "the sketch error bounds in-query (HLL within 5x rsd, "
              "approx median inside the exact interquartile band) and "
              "emits the deterministic exact columns for the oracle — "
              "sketch internals differ across engines, the bounds do not",
          tags=("agg", "approx"))
def a01_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.queries import check

    ev = load(spark, sf_dir, "events")
    both = (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
                 F.percentile_approx("value", 0.5, 1000).alias("approx_median"),
                 F.countDistinct("user_id").alias("n_users_exact"),
                 F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")
                 .alias("median_value"),
                 F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)")
                 .alias("__q1"),
                 F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)")
                 .alias("__q3")))
    # one computation for both the bound check and the returned frame
    # (a frame referenced twice is otherwise re-computed per subtree)
    both = both.localCheckpoint()
    rows = both.collect()  # bounded: one row per event_type
    check(bool(rows), "no event types")
    for r in rows:
        check(abs(r["approx_users"] - r["n_users_exact"])
              <= max(5, 5 * 0.02 * r["n_users_exact"]),
              f"HLL estimate outside 5x rsd: {r}")
        check(r["__q1"] <= r["approx_median"] <= r["__q3"],
              f"approx median outside exact IQR band: {r}")
    return (both.select("event_type", "n_users_exact", "median_value",
                        F.lit(True).alias("sketch_within_bound")))


_Q30_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
"""


@register("q30_grouping_sets", _Q30_SQL, bench=True,
          doc="explicit GROUPING SETS (status / priority / both) in one "
              "pass — one Expand + one aggregation exchange, not three "
              "scans (exact decimal money sums)",
          tags=("agg", "grouping"))
def q30_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("__q30_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                    AS DOUBLE) AS revenue
        FROM __q30_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
    """)


_Q21_SQL = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY),
flagged AS (
  SELECT DISTINCT lt.l_orderkey, lt.l_suppkey
  FROM late lt
  WHERE EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = lt.l_orderkey
                  AND l2.l_suppkey <> lt.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM late l3
                    WHERE l3.l_orderkey = lt.l_orderkey
                      AND l3.l_suppkey <> lt.l_suppkey))
SELECT s.s_name, n.n_name, CAST(count(*) AS BIGINT) AS numwait
FROM flagged f
JOIN supplier s ON s.s_suppkey = f.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY s.s_name, n.n_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@register("q21_waiting_suppliers", _Q21_SQL, bench=True,
          doc="TPC-H Q21 shape (adapted: late = shipped >90d after order "
              "date): sole-blame suppliers on finished multi-supplier "
              "orders via semi + anti self-joins, dims broadcast",
          tags=("join", "semi", "anti", "tpch"))
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    late = (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .filter(F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
            .select("l_orderkey", "l_suppkey"))
    other = li.select(F.col("l_orderkey").alias("k"),
                      F.col("l_suppkey").alias("s"))
    other_late = late.select(F.col("l_orderkey").alias("k"),
                             F.col("l_suppkey").alias("s"))
    flagged = (late
               .join(other, (late.l_orderkey == other.k)
                     & (late.l_suppkey != other.s), "semi")
               .join(other_late, (late.l_orderkey == other_late.k)
                     & (late.l_suppkey != other_late.s), "anti")
               .distinct())
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (flagged
            .join(supplier,
                  flagged.l_suppkey == supplier.s_suppkey)
            .join(F.broadcast(nation),
                  supplier.s_nationkey == nation.n_nationkey)
            .groupBy("s_name", "n_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(100))


_Q31_SQL = """
SELECT event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY 1, 2
"""


@register("q31_variant_json", _Q31_SQL, bench=True,
          doc="semi-structured analytics: events.props parsed with Spark 4 "
              "VARIANT (parse_json + variant_get — binary-encoded, no "
              "per-query string re-parse) and aggregated by extracted field",
          tags=("json", "variant", "events"))
def q31_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = ev.withColumn("__v", F.parse_json("props"))
    k = F.try_variant_get(F.col("__v"), "$.k", "bigint")
    return (v.select("event_type", (k % 10).alias("k_bucket"), k.alias("__k"))
            .groupBy("event_type", "k_bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max("__k").alias("max_k")))


_Q32_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
"""


@register("q32_rank_family", _Q32_SQL, bench=True,
          doc="distribution-rank window family (ntile / percent_rank / "
              "cume_dist) per customer, total-ordered for determinism",
          tags=("window", "rank"))
def q32_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = (Window.partitionBy("o_custkey")
         .orderBy(F.asc("o_totalprice"), F.asc("o_orderkey")))
    return (load(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey",
                    F.ntile(4).over(w).alias("quartile"),
                    F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
                    F.round(F.cume_dist().over(w), 6).alias("cume")))


_Q33_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
    AND e.ts <= v.t1 + INTERVAL 3 DAY
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
    AND e.ts <= c.t2 + INTERVAL 3 DAY
  GROUP BY e.user_id)
SELECT stage, n_users FROM (
  SELECT ' 1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
  UNION ALL
  SELECT ' 2_click', CAST(count(*) AS BIGINT) FROM c
  UNION ALL
  SELECT ' 3_purchase', CAST(count(*) AS BIGINT) FROM p)
"""


@register("q33_event_funnel", _Q33_SQL,
          doc="ordered conversion funnel over the event stream: first view, "
              "first click within 3 days after it, first purchase within "
              "3 days after that — three user-keyed aggregations whose "
              "exchanges reuse one hash partitioning; joins stay on the "
              "user key so no event row ever shuffles twice",
          tags=("events", "funnel", "window"))
def q33_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter((F.col("ts") > F.col("t1"))
                 & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 3 DAY")))
         .groupBy("user_id").agg(F.min("ts").alias("t2")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter((F.col("ts") > F.col("t2"))
                 & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 3 DAY")))
         .groupBy("user_id").agg(F.min("ts").alias("t3")))
    counts = [v.agg(F.count(F.lit(1)).alias("n_users"))
              .select(F.lit(" 1_view").alias("stage"), "n_users"),
              c.agg(F.count(F.lit(1)).alias("n_users"))
              .select(F.lit(" 2_click").alias("stage"), "n_users"),
              p.agg(F.count(F.lit(1)).alias("n_users"))
              .select(F.lit(" 3_purchase").alias("stage"), "n_users")]
    out = counts[0]
    for f in counts[1:]:
        out = out.unionByName(f)
    return out


_A02_SQL = """
SELECT o_orderstatus,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs_exact,
       TRUE AS sketch_within_bound
FROM orders
GROUP BY o_orderstatus
"""


@register("a02_incremental_distinct_sketch", _A02_SQL, bench=True,
          doc="maintained approximate distinct customers per order status "
              "via mergeable HLL sketches, adjudicated against the exact "
              "count: batch 1 sketches half the table, batch 2 sketches "
              "ONLY the appended commit and unions binary sketches per "
              "group — O(delta) refresh with fixed-size state, the only "
              "way distinct folds from a change feed; the query ASSERTS "
              "the maintained estimate lands within 5% of the exact "
              "distinct per group and emits the exact columns for the "
              "oracle",
          tags=("sketch", "incremental", "store", "llm"))
def a02_incremental_distinct_sketch(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    from projectone_spark.functions.incremental import (
        distinct_view, refresh_distinct,
    )
    from projectone_spark.queries import check
    from projectone_spark.store import TableStore
    from projectone_spark.store.state import StateStore

    root = scratch_dir(prefix="pos-hll-")
    st = TableStore(root)
    state = StateStore(root + "_state")
    orders = load(spark, sf_dir, "orders")
    half = orders.filter(F.col("o_orderkey") % 2 == 0)
    st.overwrite(spark, half, "orders")
    refresh_distinct(st, spark, "orders", "sk", ["o_orderstatus"],
                     "o_custkey", state)
    # complement by predicate (o_orderkey unique) — exceptAll would pay a
    # full shuffle-distinct for the same rows
    st.append(spark, orders.filter(F.col("o_orderkey") % 2 == 1), "orders")
    refresh_distinct(st, spark, "orders", "sk", ["o_orderstatus"],
                     "o_custkey", state)
    approx = (distinct_view(st, spark, "sk", ["o_orderstatus"])
              .select("o_orderstatus",
                      F.col("approx_distinct").cast("bigint")
                      .alias("approx")))
    exact = (st.read(spark, "orders")
             .groupBy("o_orderstatus")
             .agg(F.countDistinct("o_custkey").alias("n_custs_exact")))
    both = (exact.join(approx, "o_orderstatus", "left")
            .localCheckpoint())  # one computation: bound check + output
    rows = both.collect()  # bounded: one row per order status (3)
    check(bool(rows), "no order statuses")
    check(all(r["approx"] is not None
              and abs(r["approx"] - r["n_custs_exact"])
              <= 0.05 * r["n_custs_exact"] for r in rows),
          lambda: f"maintained HLL outside 5% of exact: {rows}")
    return both.select("o_orderstatus", "n_custs_exact",
                       F.lit(True).alias("sketch_within_bound"))
