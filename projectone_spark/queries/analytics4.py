"""Round-4 analytics additions (registry tail): the two classic TPC-H
multi-join shapes not yet covered — Q8 market share (conditional share of
a grouped aggregate) and Q9 product profit (6-table join with derived
measure), adapted to this dataset's schema (no partsupp table — the cost
term derives from part.p_retailprice).

Money math follows the repo's midpoint rule: every term is exact
DECIMAL(18,2) arithmetic, sums stay decimal (order-independent), and only
the final value casts to double (exact — the sums fit double's 53-bit
mantissa times the 2-decimal grid)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions import values_frame
from projectone_spark.queries import load, register

_DEC = "DECIMAL(18,2)"

_Q38_SQL = f"""
WITH flat AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS {_DEC})
           * (1 - CAST(l.l_discount AS {_DEC})) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY')
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_2'
                           THEN volume ELSE CAST(0 AS {_DEC}) END)
                  AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM flat GROUP BY o_year
"""


@register("q38_market_share", _Q38_SQL,
          doc="TPC-H Q8 shape: NATION_2 suppliers' share of ECONOMY-part "
              "revenue in the ASIA customer market per year — an 8-table "
              "star with every dimension broadcast and ONE aggregation "
              "exchange; the share divides two exact decimal sums cast "
              "to double (order-independent in both engines)",
          tags=("join", "agg", "star"))
def q38_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                                  "o_orderdate")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey"))
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY").select("p_partkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))

    vol = (F.col("l_extendedprice").cast(_DEC)
           * (F.lit(1) - F.col("l_discount").cast(_DEC)))
    flat = (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(n1), cust.c_nationkey == F.col("c_nk"))
            .join(F.broadcast(region),
                  F.col("n_regionkey") == region.r_regionkey)
            .join(part, li.l_partkey == part.p_partkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(n2), supp.s_nationkey == F.col("s_nk"))
            .select(F.year("o_orderdate").cast("bigint").alias("o_year"),
                    vol.alias("volume"), "supp_nation"))
    zero = F.lit(0).cast(_DEC)
    nat = F.sum(F.when(F.col("supp_nation") == "NATION_2",
                       F.col("volume")).otherwise(zero))
    return (flat.groupBy("o_year")
            .agg(F.round(nat.cast("double")
                         / F.sum("volume").cast("double"), 6)
                 .alias("mkt_share")))


_Q39_SQL = f"""
WITH flat AS (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS {_DEC})
           * (1 - CAST(l.l_discount AS {_DEC}))
         - CAST(p.p_retailprice AS {_DEC}) * CAST(0.05 AS DECIMAL(4,2))
           * CAST(l.l_quantity AS {_DEC}) AS amount
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  WHERE p.p_name LIKE '%widget%')
SELECT nation, o_year,
       CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM flat GROUP BY nation, o_year
"""


@register("q39_product_profit", _Q39_SQL,
          doc="TPC-H Q9 shape (partsupp-free adaptation: the cost term is "
              "5% of p_retailprice per unit): per supplier-nation and "
              "year, profit on parts whose name contains 'widget' — the "
              "LIKE filter prunes the part dimension before it "
              "broadcasts, and the profit expression is exact decimal "
              "arithmetic end-to-end",
          tags=("join", "agg", "star"))
def q39_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity")
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")).select("p_partkey", "p_retailprice")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation"))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")

    amount = (F.col("l_extendedprice").cast(_DEC)
              * (F.lit(1) - F.col("l_discount").cast(_DEC))
              - F.col("p_retailprice").cast(_DEC)
              * F.lit(0.05).cast("decimal(4,2)")
              * F.col("l_quantity").cast(_DEC))
    flat = (li.join(part, li.l_partkey == part.p_partkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nation),
                  supp.s_nationkey == nation.n_nationkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .select("nation",
                    F.year("o_orderdate").cast("bigint").alias("o_year"),
                    amount.alias("amount")))
    return (flat.groupBy("nation", "o_year")
            .agg(F.round(F.sum("amount"), 2).cast("double")
                 .alias("sum_profit")))


_Q40_SQL = f"""
WITH flat AS (
  SELECT c.c_custkey, c.c_name, n.n_name AS nation,
         CAST(l.l_extendedprice AS {_DEC})
           * (1 - CAST(l.l_discount AS {_DEC})) AS volume
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1997-01-01'
    AND o.o_orderdate < TIMESTAMP '1997-07-01')
SELECT c_custkey, c_name, nation,
       CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
FROM flat GROUP BY c_custkey, c_name, nation
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q40_returned_item_customers", _Q40_SQL,
          doc="TPC-H Q10 shape: top-20 customers by lost revenue on "
              "returned items in a half-year window — the returnflag and "
              "date predicates push to the scans, dimensions broadcast, "
              "one aggregation exchange, and the top-20 plans as "
              "TakeOrderedAndProject (no global sort); exact decimal "
              "revenue with an id tie-break",
          tags=("join", "agg", "topk"))
def q40_returned_item_customers(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation"))

    vol = (F.col("l_extendedprice").cast(_DEC)
           * (F.lit(1) - F.col("l_discount").cast(_DEC)))
    flat = (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation),
                  cust.c_nationkey == nation.n_nationkey)
            .select("c_custkey", "c_name", "nation", vol.alias("volume")))
    return (flat.groupBy("c_custkey", "c_name", "nation")
            .agg(F.round(F.sum("volume"), 2).cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            .limit(20))


_Q41_SQL = """
WITH dim(l_returnflag, label) AS (
  VALUES ('F', 'finished'), ('N', 'open'), ('R', 'returned'))
SELECT label,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS revenue
FROM lineitem JOIN dim USING (l_returnflag)
GROUP BY label
"""


@register("q41_skew_salted_pipeline", _Q41_SQL,
          doc="skew-mitigation helpers under an exact oracle: the whole "
              "lineitem fact (3 hot return-flag keys) goes through "
              "salted_join (big side salted per-row, 3-row dim exploded "
              "8x, hot keys spread over 8 reducers) then salted_agg "
              "(per-salt partials, combine) — DECIMAL money sums make "
              "the two-phase fold order-independent, so the salted "
              "result hashes identically to the plain JOIN + GROUP BY",
          tags=("skew", "salt", "join", "agg", "perf"))
def q41_skew_salted_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.skew import salted_agg, salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount")
    dim = values_frame(
        spark, [("F", "finished"), ("N", "open"), ("R", "returned")],
        "l_returnflag string, label string")
    joined = salted_join(li, dim, ["l_returnflag"], n=8)
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    return salted_agg(
        joined, ["label"], 8,
        partial=[F.count(F.lit(1)).alias("__c"), F.sum(rev).alias("__s")],
        final=lambda g: g.agg(
            F.sum("__c").alias("n_items"),
            F.round(F.sum("__s"), 2).cast("double").alias("revenue")))


_Q42_SQL = f"""
WITH dom AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(min(l.l_extendedprice) AS {_DEC}) AS cost
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY l.l_partkey, l.l_suppkey),
best AS (SELECT l_partkey, min(cost) AS min_cost FROM dom GROUP BY l_partkey)
SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, n.n_name AS nation,
       CAST(round(CAST(d.cost AS DOUBLE), 2) AS DOUBLE) AS min_cost,
       CAST(round(CAST(s.s_acctbal AS DOUBLE), 2) AS DOUBLE) AS s_acctbal
FROM dom d
JOIN best b ON d.l_partkey = b.l_partkey AND d.cost = b.min_cost
JOIN part p     ON d.l_partkey = p.p_partkey
JOIN supplier s ON d.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_type = 'ECONOMY'
"""


@register("q42_min_cost_supplier", _Q42_SQL,
          doc="TPC-H Q2 shape (correlated-min supplier selection, adapted "
              "to no-partsupp: a (part, supplier)'s offer price is its "
              "min lineitem extended price): for every ECONOMY part, the "
              "EUROPE suppliers achieving that part's minimum cost — the "
              "correlated scalar subquery becomes a grouped min joined "
              "back on (part, cost), ties kept exactly as Q2 keeps them; "
              "cost is an exact decimal MIN on the 2-decimal grid, so "
              "the equality join never hits a float boundary",
          tags=("join", "agg", "star", "correlated"))
def q42_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    # domain: EUROPE supplier offers; dims broadcast, ONE lineitem shuffle
    dom = (li.join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
                   F.col("l_suppkey") == F.col("s_suppkey"))
           .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
           .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
           .groupBy("l_partkey", "l_suppkey")
           .agg(F.min(F.col("l_extendedprice").cast("decimal(18,2)"))
                .alias("cost")))
    # the correlated min: per-part minimum joined back on (part, cost) —
    # dom is referenced twice, checkpoint so the offer aggregation runs once
    dom = dom.localCheckpoint(eager=False)
    best = dom.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    return (dom.join(best, (dom.l_partkey == best.l_partkey)
                     & (dom.cost == best.min_cost))
            .drop(best.l_partkey)
            .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nat.select(
                F.col("n_nationkey").alias("s_nk"),
                F.col("n_name").alias("nation"))),
                F.col("s_nationkey") == F.col("s_nk"))
            .select("p_partkey", "p_brand", "s_suppkey", "s_name", "nation",
                    F.round(F.col("cost").cast("double"), 2).alias("min_cost"),
                    F.round(F.col("s_acctbal").cast("double"), 2)
                    .alias("s_acctbal")))


_Q43_SQL = f"""
WITH val AS (
  SELECT l.l_partkey,
         CAST(sum(CAST(l.l_extendedprice AS {_DEC})) AS {_DEC}) AS part_value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_2'
  GROUP BY l.l_partkey),
tot AS (SELECT CAST(sum(part_value) AS {_DEC}) AS total_value FROM val)
SELECT v.l_partkey AS p_partkey,
       CAST(v.part_value AS DOUBLE) AS part_value
FROM val v CROSS JOIN tot t
WHERE v.part_value * 1000 > t.total_value
"""


@register("q43_important_stock", _Q43_SQL,
          doc="TPC-H Q11 shape (important stock, adapted to no-partsupp: "
              "a part's held value is its NATION_2-supplied revenue): "
              "parts whose value exceeds 1/1000 of the nation's total — "
              "the HAVING-against-a-scalar-subquery becomes a broadcast "
              "of the one-row total folded from the SAME per-part "
              "aggregate (no second scan), and the threshold compare is "
              "exact decimal `part*1000 > total`, never a float fraction",
          tags=("agg", "having", "star"))
def q43_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = (load(spark, sf_dir, "nation")
           .filter(F.col("n_name") == "NATION_2"))
    val = (li.join(F.broadcast(supp),
                   F.col("l_suppkey") == F.col("s_suppkey"))
           .join(F.broadcast(nat),
                 F.col("s_nationkey") == F.col("n_nationkey"))
           .groupBy("l_partkey")
           .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("decimal(18,2)").alias("part_value")))
    val = val.localCheckpoint(eager=False)  # total folds the same aggregate
    tot = val.agg(F.sum("part_value").cast("decimal(18,2)")
                  .alias("total_value"))
    return (val.crossJoin(F.broadcast(tot))
            .filter(F.col("part_value") * 1000 > F.col("total_value"))
            .select(F.col("l_partkey").alias("p_partkey"),
                    F.col("part_value").cast("double").alias("part_value")))


_Q44_SQL = """
WITH ls AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey),
og AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp,
         CAST(sum(is_late) AS BIGINT) AS n_late
  FROM ls GROUP BY l_orderkey)
SELECT n.n_name AS nation, s.s_suppkey, s.s_name,
       CAST(count(*) AS BIGINT) AS numwait
FROM ls
JOIN og USING (l_orderkey)
JOIN supplier s ON ls.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE ls.is_late = 1 AND og.n_supp >= 2 AND og.n_late = 1
GROUP BY n.n_name, s.s_suppkey, s.s_name
"""


@register("q44_waiting_suppliers", _Q44_SQL,
          doc="TPC-H Q21 shape (suppliers who kept orders waiting, adapted "
              "to no-commitdate: a line is late when it ships more than 60 "
              "days after the order date): per supplier, the finished "
              "multi-supplier orders where that supplier's line was the "
              "ONLY late one — the double-correlated EXISTS / NOT EXISTS "
              "pair becomes two per-group counts (suppliers per order, "
              "late suppliers per order), so the whole query is one "
              "orderkey-copartitioned lineitem-orders join, a "
              "(order, supplier) fold, an order-level fold of the SAME "
              "checkpointed frame, and a join back on orderkey — no "
              "correlated re-scans anywhere",
          tags=("join", "agg", "exists", "star"))
def q44_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # orders scales with the data: shuffle join on orderkey (no broadcast),
    # then the (order, supplier) late fold reuses that partitioning
    late = F.when(F.col("l_shipdate")
                  > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                  1).otherwise(0)
    ls = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
          .groupBy("l_orderkey", "l_suppkey")
          .agg(F.max(late).alias("is_late")))
    # ls feeds both the order-level fold and the final join: checkpoint so
    # the lineitem-orders join runs once
    ls = ls.localCheckpoint(eager=False)
    og = (ls.groupBy("l_orderkey")
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_supp"),
               F.sum("is_late").cast("bigint").alias("n_late")))
    return (ls.join(og, "l_orderkey")
            .filter((F.col("is_late") == 1) & (F.col("n_supp") >= 2)
                    & (F.col("n_late") == 1))
            .join(F.broadcast(supp),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nat),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.col("s_suppkey"), F.col("s_name"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("numwait")))


_Q45_SQL = f"""
WITH pos AS (
  SELECT c.c_custkey, c.c_nationkey,
         CAST(c.c_acctbal AS {_DEC}) AS bal
  FROM customer c
  WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
    AND c.c_acctbal > 0),
avgbal AS (
  SELECT CAST(sum(bal) AS {_DEC}) AS total,
         CAST(count(*) AS BIGINT) AS cnt
  FROM pos)
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(p.bal) AS DOUBLE) AS totacctbal
FROM pos p
CROSS JOIN avgbal a
JOIN nation n ON p.c_nationkey = n.n_nationkey
WHERE p.bal * a.cnt > a.total
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = p.c_custkey
                    AND o.o_orderstatus = 'O')
GROUP BY n.n_name
"""


@register("q45_dormant_customers", _Q45_SQL,
          doc="TPC-H Q22 shape (global-sales-opportunity, adapted: market "
              "segments stand in for phone country codes and 'no open "
              "orders' for 'no orders'): above-average-balance customers "
              "in three segments with no status-'O' order, grouped by "
              "nation — the scalar AVG subquery broadcasts as a one-row "
              "(sum, count) and the compare is exact decimal "
              "bal*cnt > total (never a float average); the NOT EXISTS "
              "is a LEFT ANTI join against the open-orders projection",
          tags=("join", "agg", "anti", "exists"))
def q45_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    open_orders = (load(spark, sf_dir, "orders")
                   .filter(F.col("o_orderstatus") == "O")
                   .select("o_custkey"))
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pos = (cust.filter(F.col("c_mktsegment").isin(
                           "AUTOMOBILE", "BUILDING", "MACHINERY")
                       & (F.col("c_acctbal") > 0))
           .select("c_custkey", "c_nationkey",
                   F.col("c_acctbal").cast("decimal(18,2)").alias("bal")))
    # pos feeds the one-row average and the filtered output: checkpoint so
    # the customer scan runs once
    pos = pos.localCheckpoint(eager=False)
    avgbal = pos.agg(F.sum("bal").cast("decimal(18,2)").alias("total"),
                     F.count(F.lit(1)).cast("bigint").alias("cnt"))
    return (pos.crossJoin(F.broadcast(avgbal))
            .filter(F.col("bal") * F.col("cnt") > F.col("total"))
            .join(open_orders, F.col("c_custkey") == F.col("o_custkey"),
                  "left_anti")
            .join(F.broadcast(nat),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("numcust"),
                 F.sum("bal").cast("double").alias("totacctbal")))
