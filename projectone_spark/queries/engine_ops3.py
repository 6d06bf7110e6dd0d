"""Engine-op queries added in round 4 — registry TAIL (the driver's
adjudication prefix is unaffected; these run in bench and local parity
now and are rotation candidates for later rounds).

These queries give driver-oracle coverage to write-path and maintenance
features that were previously pytest-only: referential table constraints
(s15), selective replaceWhere/partition overwrite (s16), table-contract
generated/default columns (s17), write stats (s18), small-file compaction
(s19), vacuum retention (s20), and zero-copy clone (s21). Each embeds its
own negative/invariant probes (constraint violation raises, vacuumed
version unreadable, clone isolated from source appends, file count drops)
so the oracle match certifies behavior, not just the final projection.
"""

from __future__ import annotations


import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions import values_frame
from projectone_spark.queries import check, load, register
from projectone_spark.session import scratch_dir

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

    store = TableStore(scratch_dir(prefix="po_s15_"))
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

    store = TableStore(scratch_dir(prefix="po_s16_"))
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


_S17_SQL = """
SELECT o_orderkey,
       o_orderstatus,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CASE WHEN o_orderkey % 3 = 0 THEN 'UNSPECIFIED'
            ELSE o_orderpriority END AS priority
FROM orders
WHERE o_orderkey % 7 = 0
"""


@register("s17_table_contract_columns", _S17_SQL,
          doc="table-contract column features (reference Delta column "
              "extras, core/utils/delta.py:12-45): create-if-missing "
              "materializes the declared schema as an empty v0 snapshot, "
              "then an append flows through apply_table_features — "
              "generated column (o_year from the order date) and declared "
              "default (priority backfills NULL) — and the read-back "
              "matches closed-form SQL",
          tags=("store", "write", "contract"))
def s17_table_contract_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.config.data_objects import Table, TableColumn
    from projectone_spark.store import TableStore, create_if_not_exists
    from projectone_spark.writers.columns import apply_table_features

    store = TableStore(scratch_dir(prefix="po_s17_"))
    contract = Table(name="orders_enriched", columns=[
        TableColumn(name="o_orderkey", type="bigint", nullable=False),
        TableColumn(name="o_orderstatus", type="string"),
        TableColumn(name="o_year", type="int",
                    generated_expr="year(o_orderdate)"),
        TableColumn(name="priority", type="string", default="UNSPECIFIED"),
    ])
    created = create_if_not_exists(store, spark, contract)
    check(created == 0 and create_if_not_exists(store, spark, contract) is None)

    src = (load(spark, sf_dir, "orders")
           .filter(F.col("o_orderkey") % 7 == 0)
           .select("o_orderkey", "o_orderstatus", "o_orderdate",
                   # exercise the default: every third key arrives NULL and
                   # must backfill to the declared default
                   F.when(F.col("o_orderkey") % 3 == 0, None)
                   .otherwise(F.col("o_orderpriority")).alias("priority")))
    out = apply_table_features(src, contract).drop("o_orderdate")
    store.append(spark, out, "orders_enriched")
    return store.read(spark, "orders_enriched").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_year").cast("long").alias("o_year"), "priority")


_S18_SQL = """
SELECT 'overwrite' AS op_v0, 'append' AS op_v1, 1 AS version,
       CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows
"""


@register("s18_write_stats", _S18_SQL,
          doc="last-commit write stats (reference get_last_write_stats, "
              "core/utils/delta.py:135-168): manifest-only operation/"
              "version metadata across an overwrite + append cycle, "
              "cross-checked against the stored row count — no Spark job "
              "for the metadata itself",
          tags=("store", "observability"))
def s18_write_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.store import TableStore, last_commit_stats

    store = TableStore(scratch_dir(prefix="po_s18_"))
    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    store.overwrite(spark, orders.filter(F.col("o_orderkey") % 2 == 0),
                    "orders")
    op_v0 = last_commit_stats(store, "orders")["operation"]
    store.append(spark, orders.filter(F.col("o_orderkey") % 2 != 0), "orders")
    stats = last_commit_stats(store, "orders")
    check(stats["num_files"] > 0 and stats["num_bytes"] > 0)
    n_rows = store.read(spark, "orders").count()
    return values_frame(
        spark,
        [(op_v0, stats["operation"], int(stats["version"]), int(n_rows))],
        "op_v0 string, op_v1 string, version int, n_rows bigint")


_S19_SQL = """
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM orders
GROUP BY o_orderstatus
"""


@register("s19_compact_small_files", _S19_SQL,
          doc="small-file compaction (Delta OPTIMIZE bin-packing): 8 tiny "
              "append commits fragment the table, compact() bin-packs the "
              "snapshot into ~target-size files in one rewrite job; the "
              "query asserts the file count dropped and proves the data "
              "survived byte-for-byte via the read-back aggregation",
          tags=("store", "maintenance", "compact"))
def s19_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.store import TableStore
    from projectone_spark.store.maintenance import compact, table_files

    store = TableStore(scratch_dir(prefix="po_s19_"))
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus")
    # 8 fragmented commits: one small file each
    store.overwrite(spark,
                    orders.filter(F.col("o_orderkey") % 8 == 0).coalesce(1),
                    "orders")
    for i in range(1, 8):
        store.append(spark,
                     orders.filter(F.col("o_orderkey") % 8 == i).coalesce(1),
                     "orders")
    before = len(table_files(store, "orders"))
    v = compact(store, spark, "orders", target_file_bytes=256 * 1024 * 1024)
    after = len(table_files(store, "orders"))
    check(v is not None and after < before, (before, after))
    return (store.read(spark, "orders")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.min("o_orderkey").alias("min_key"),
                 F.max("o_orderkey").alias("max_key")))


_S20_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys
FROM orders WHERE o_orderkey % 3 <> 0
"""


@register("s20_vacuum_retention", _S20_SQL,
          doc="VACUUM with a version floor (Delta retention semantics): "
              "three commits, vacuum keeps the newest two — the dropped "
              "version's directories are asserted gone, time travel to it "
              "asserted to now FAIL, while the current snapshot and the "
              "still-retained previous version read intact",
          tags=("store", "maintenance", "vacuum"))
def s20_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.store import TableStore
    from projectone_spark.store.maintenance import vacuum

    store = TableStore(scratch_dir(prefix="po_s20_"))
    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    store.overwrite(spark, orders.filter(F.col("o_orderkey") % 3 == 0),
                    "orders")                                    # v0
    store.overwrite(spark, orders.filter(F.col("o_orderkey") % 3 == 1),
                    "orders")                                    # v1
    store.append(spark, orders.filter(F.col("o_orderkey") % 3 == 2),
                 "orders")                                       # v2
    dropped = vacuum(store, "orders", keep_versions=2)
    check(bool(dropped), "vacuum removed nothing")
    try:
        store.read_version(spark, "orders", 0).count()
    except Exception:
        pass
    else:  # pragma: no cover - guards the retention claim
        raise AssertionError("vacuumed version 0 still readable")
    # the retained previous version must still read
    check(store.read_version(spark, "orders", 1).count() > 0)
    return (store.read(spark, "orders")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct("o_orderkey").alias("n_keys")))


_S21_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_open
FROM orders
"""


@register("s21_zero_copy_clone", _S21_SQL,
          doc="CREATE TABLE CLONE (zero-copy): the clone hard-links the "
              "source snapshot's files — no data copied — and is "
              "INDEPENDENT: a post-clone append to the source is asserted "
              "invisible to the clone, whose read-back matches the "
              "original snapshot exactly",
          tags=("store", "maintenance", "clone"))
def s21_zero_copy_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.store import TableStore
    from projectone_spark.store.maintenance import clone

    store = TableStore(scratch_dir(prefix="po_s21_"))
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus")
    store.overwrite(spark, orders, "orders")
    clone(store, "orders", "orders_clone")
    # divergence probe: the source moves on, the clone must not see it
    store.append(spark, orders.limit(100), "orders")
    n_src = store.read(spark, "orders").count()
    n_clone = store.read(spark, "orders_clone").count()
    check(n_src == n_clone + 100, (n_src, n_clone))
    return (store.read(spark, "orders_clone")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum((F.col("o_orderstatus") == "O").cast("bigint"))
                 .alias("n_open")))


_S22_SQL = """
WITH big AS (
  SELECT o.o_custkey, count(*) AS n, sum(CAST(o.o_totalprice
                                              AS DECIMAL(18,2))) AS t
  FROM orders o GROUP BY o.o_custkey)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(big.n) AS BIGINT) AS n_orders,
       CAST(round(sum(big.t), 2) AS DOUBLE) AS total_price
FROM big JOIN customer c ON c.c_custkey = big.o_custkey
GROUP BY c.c_mktsegment
"""


@register("s22_catalog_sql", _S22_SQL,
          doc="full SQL surface over the store: tables register as catalog "
              "views (reference materializes Schema/Table/View objects, "
              "data_objects.py:99-110), a View CONTRACT defines the "
              "per-customer rollup, and one spark.sql statement joins the "
              "view with a store table — SQL-first users never touch the "
              "DataFrame API",
          tags=("store", "sql", "catalog"))
def s22_catalog_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.config.data_objects import View
    from projectone_spark.store import TableStore, register_catalog

    store = TableStore(scratch_dir(prefix="po_s22_"))
    store.overwrite(spark, load(spark, sf_dir, "orders")
                    .select("o_custkey", "o_totalprice"), "orders")
    store.overwrite(spark, load(spark, sf_dir, "customer")
                    .select("c_custkey", "c_mktsegment"), "customer")
    rollup = View(
        name="customer_rollup",
        query="SELECT o_custkey, count(*) AS n, "
              "sum(CAST(o_totalprice AS DECIMAL(18,2))) AS t "
              "FROM orders GROUP BY o_custkey")
    register_catalog(store, spark, ["orders", "customer"], views=[rollup])
    return spark.sql(
        "SELECT c.c_mktsegment, count(*) AS n_customers, "
        "CAST(sum(r.n) AS BIGINT) AS n_orders, "
        "CAST(round(sum(r.t), 2) AS DOUBLE) AS total_price "
        "FROM customer_rollup r JOIN customer c ON c.c_custkey = r.o_custkey "
        "GROUP BY c.c_mktsegment")


_S23_SQL = """
WITH b AS (SELECT CAST(max(o_custkey) AS BIGINT) // 4 AS ck,
                  CAST(floor(max(o_totalprice)) AS BIGINT) // 4 AS tp
           FROM orders)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS sum_price
FROM orders CROSS JOIN b
WHERE o_custkey <= b.ck AND o_totalprice <= b.tp
GROUP BY o_orderstatus
"""


@register("s23_zorder_skipping", _S23_SQL,
          doc="OPTIMIZE ZORDER BY (Delta's multi-column clustering): the "
              "table is rewritten ordered by the Morton interleave of "
              "(o_custkey, o_totalprice) rank buckets so each file covers "
              "a small hyper-rectangle of the 2-D key space; a "
              "conjunctive 2-D range read then proves file-level pruning "
              "actually fires (candidates strictly below the file count, "
              "and no worse than the unclustered layout's fraction) "
              "while the pruned read's aggregate is oracle-checked for "
              "correctness — skipping is an optimization, never a "
              "correctness filter",
          tags=("store", "skipping", "maintenance", "perf"))
def s23_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.store import TableStore
    from projectone_spark.store.maintenance import zorder_cluster
    from projectone_spark.store.skipping import prune_files, read_where

    store = TableStore(scratch_dir(prefix="po_s23_"))
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    # UNclustered baseline: round-robin layout, every file spans nearly
    # the full key range, so min/max stats prune (almost) nothing
    store.overwrite(spark, orders.repartition(8), "ord",
                    stats_columns=["o_custkey", "o_totalprice"])
    # one bounded driver scalar pair (the CDC-bounds cost class) defines
    # a deterministic 2-D box the oracle mirrors with integer division
    row = orders.agg(F.max("o_custkey"), F.max("o_totalprice")).first()
    preds = [("o_custkey", "<=", int(row[0]) // 4),
             ("o_totalprice", "<=", int(row[1]) // 4)]
    kept0, total0 = prune_files(store.manifest("ord"), preds)

    zorder_cluster(store, spark, "ord", ["o_custkey", "o_totalprice"],
                   target_files=8)
    kept1, total1 = prune_files(store.manifest("ord"), preds)
    check(len(kept1) < total1,
          f"Z-order produced no pruning: {len(kept1)}/{total1} files "
          "survive the 2-D box predicate")
    check(len(kept1) * total0 <= len(kept0) * total1,
          f"Z-order prunes WORSE than the unclustered layout: "
          f"{len(kept1)}/{total1} vs {len(kept0)}/{total0}")

    out = read_where(store, spark, "ord", preds)
    return (out.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")),
                         2).cast("double").alias("sum_price")))
