"""Framework-pipeline queries: the task/DAG orchestration layer run
end-to-end as oracle-checkable queries.

Each query drives a full SparkTask (or a two-task DAG) exactly the way the
reference's integration tests do (``tests/integration_tests/test_batch.py``:
configure → execute → read the target back), so the driver's correctness
gate adjudicates the ENTIRE task lifecycle — input read, secret/window
interpolation, feature pipeline, CDC predicate resolution, execution-fn
binding, writer, store read-back — not just the leaf operators:

- f01: refresh-window (``{{RangeStart}}``) + secret (``{{scope/key}}``)
  interpolation inside the input filter, filter_data + select_columns
  features, a body-mode execution function with extra_arguments
  (reference ``core/task/spark/task.py:136-209``, features
  ``operator/spark_task/input.py:164-287``, execution
  ``core/schemas/execution.py:9-37``).
- f02: two-task DAG with a store-table handoff between tasks (reference
  local runner ``framework/runner/local.py:101-150``: wave scheduling on
  ``depends_on``).
- f03: backfill CDC — the refresh policy's explicit [start, end] becomes
  an inclusive range predicate on the CDC attribute (reference
  ``file_source.py:892-896``, ``delta_source.py:334-343``).
- f04: schema-inference feature — a JSON payload column parsed into a
  typed struct via the registry-schema path (reference
  ``core/utils/spark.py:180-246``).
"""

from __future__ import annotations

import textwrap

from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions import values_frame
from projectone_spark.queries import check, register
from projectone_spark.session import configure, scratch_dir

_F01_SQL = """
SELECT o_custkey, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_totalprice >= 1000.0
  AND (o_custkey % 10) = 3
GROUP BY o_custkey
HAVING count(*) >= 2
"""


@register("f01_task_feature_pipeline", _F01_SQL,
          doc="full SparkTask lifecycle as one query: refresh-window "
              "({{RangeStart}}) and secret ({{flt/min_price}}) "
              "interpolation in the input filter, filter_data + "
              "select_columns features, a body-mode execution function "
              "with extra_arguments, overwrite to the store, read-back",
          tags=("task", "features", "secrets", "framework"))
def f01_task_feature_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.store import TableStore
    from projectone_spark.task import SparkTask

    configure(spark)
    root = scratch_dir(prefix="po_f01_store_")
    body = textwrap.dedent("""
        import pyspark.sql.functions as F
        def revenue_by_cust(src, min_orders=1):
            return (src.groupBy("o_custkey")
                    .agg(F.count(F.lit(1)).alias("n_orders"),
                         F.round(F.sum("o_totalprice"), 2).alias("revenue"))
                    .filter(F.col("n_orders") >= min_orders))
    """)
    task = (SparkTask.builder
            .setName("f01")
            .setInput(name="src", path=f"{sf_dir}/orders.parquet",
                      source="parquet",
                      read_options={"filter": (
                          "o_orderdate >= TIMESTAMP '{{RangeStart}}'"
                          " AND o_totalprice >= {{flt/min_price}}")},
                      features=[
                          {"name": "filter_data",
                           "condition": "(o_custkey % 10) = 3"},
                          {"name": "select_columns",
                           "columns": "o_orderkey, o_custkey, o_totalprice"},
                      ])
            .setExecution(name="revenue_by_cust", body=body,
                          extra_arguments={"min_orders": 2})
            .setOutput(name="out", table="f01_out", write_type="overwrite")
            .setRefreshPolicy(type="backfill", start_value="1997-01-01",
                              end_value="1998-12-31")
            .setSecrets({"flt": {"min_price": "1000.0"}})
            .setStateLocation(scratch_dir(prefix="po_f01_state_"))
            .setStoreLocation(root)
            .setSession(spark)
            .create())
    task.execute()
    return (TableStore(root).read(spark, "f01_out")
            .select("o_custkey", "n_orders", "revenue"))


_F02_SQL = """
WITH la AS (
  SELECT l_orderkey,
         sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  GROUP BY l_orderkey)
SELECT o_orderpriority, count(*) AS n_orders,
       round(sum(rev), 2) AS revenue
FROM orders JOIN la ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


@register("f02_dag_pipeline", _F02_SQL,
          doc="two-task DAG with a store-table handoff: task A aggregates "
              "recent lineitem revenue per order into the store, task B "
              "(depends_on A) joins it to orders and rolls up per "
              "priority; wave-scheduled by PipelineRunner",
          tags=("dag", "task", "framework"))
def f02_dag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.store import TableStore
    from projectone_spark.task import SparkTask
    from projectone_spark.task.dag import PipelineRunner, TaskNode

    configure(spark)
    root = scratch_dir(prefix="po_f02_store_")
    state = scratch_dir(prefix="po_f02_state_")

    body_a = textwrap.dedent("""
        import pyspark.sql.functions as F
        def line_revenue(lines):
            return (lines.groupBy("l_orderkey")
                    .agg(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))).alias("rev")))
    """)
    task_a = (SparkTask.builder
              .setName("f02_lines")
              .setInput(name="lines", path=f"{sf_dir}/lineitem.parquet",
                        source="parquet",
                        read_options={"filter":
                                      "l_shipdate >= TIMESTAMP '1997-01-01'"},
                        features=[{"name": "select_columns",
                                   "columns": "l_orderkey, l_extendedprice,"
                                              " l_discount"}])
              .setExecution(name="line_revenue", body=body_a)
              .setOutput(name="out", table="lines_agg", write_type="overwrite")
              .setStateLocation(state)
              .setStoreLocation(root)
              .setSession(spark)
              .create())

    body_b = textwrap.dedent("""
        import pyspark.sql.functions as F
        def priority_rollup(lines_agg, orders):
            j = orders.join(lines_agg,
                            orders.o_orderkey == lines_agg.l_orderkey)
            return (j.groupBy("o_orderpriority")
                    .agg(F.count(F.lit(1)).alias("n_orders"),
                         F.round(F.sum("rev"), 2).alias("revenue")))
    """)
    task_b = (SparkTask.builder
              .setName("f02_final")
              .setInput(name="lines_agg", path=f"{root}:lines_agg",
                        source="store")
              .setInput(name="orders", path=f"{sf_dir}/orders.parquet",
                        source="parquet",
                        features=[{"name": "select_columns",
                                   "columns": "o_orderkey, o_orderpriority"}])
              .setExecution(name="priority_rollup", body=body_b)
              .setOutput(name="out", table="f02_final", write_type="overwrite")
              .setStateLocation(state)
              .setStoreLocation(root)
              .setSession(spark)
              .create())

    runs = PipelineRunner(spark).run([
        TaskNode("f02_lines", task_a.config),
        TaskNode("f02_final", task_b.config, depends_on=["f02_lines"]),
    ])
    bad = {n: r.error for n, r in runs.items() if r.status != "SUCCESS"}
    if bad:
        raise RuntimeError(f"DAG tasks failed: {bad}")
    return (TableStore(root).read(spark, "f02_final")
            .select("o_orderpriority", "n_orders", "revenue"))


_F03_SQL = """
SELECT event_id, event_type, round(value, 2) AS value
FROM events
WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
  AND ts <= TIMESTAMP '2024-01-21 23:59:59'
"""


@register("f03_cdc_backfill", _F03_SQL,
          doc="backfill CDC through the task lifecycle: the refresh "
              "policy's explicit [start, end] window becomes an inclusive "
              "range predicate on the CDC attribute (reference "
              "file_source.py:892-896), applied before projection",
          tags=("cdc", "task", "framework"))
def f03_cdc_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.store import TableStore
    from projectone_spark.task import SparkTask

    configure(spark)
    root = scratch_dir(prefix="po_f03_store_")
    body = textwrap.dedent("""
        import pyspark.sql.functions as F
        def project(ev):
            return ev.select("event_id", "event_type",
                             F.round("value", 2).alias("value"))
    """)
    task = (SparkTask.builder
            .setName("f03")
            .setInput(name="ev", path=f"{sf_dir}/events.parquet",
                      source="parquet",
                      cdc={"attribute": "ts", "value_type": "timestamp"})
            .setExecution(name="project", body=body)
            .setOutput(name="out", table="f03_out", write_type="append")
            .setRefreshPolicy(type="backfill",
                              start_value="2024-01-08 00:00:00",
                              end_value="2024-01-21 23:59:59")
            .setStateLocation(scratch_dir(prefix="po_f03_state_"))
            .setStoreLocation(root)
            .setSession(spark)
            .create())
    task.execute()
    # the persisted CDC state must record the backfill window (reference
    # persists post-success, task.py:519-544)
    saved = task.state.get_value("ev_cdc_value", folder="sources")
    check(bool(saved) and saved["load_type"] == "backfill", saved)
    return (TableStore(root).read(spark, "f03_out")
            .select("event_id", "event_type", F.col("value").cast("double")))


_F04_SQL = """
SELECT event_id, event_type,
       CAST(props->>'$.k' AS BIGINT) AS k
FROM events
"""


@register("f04_schema_registry_json", _F04_SQL,
          doc="schema-inference feature: the JSON payload column parsed "
              "into a typed struct by the registry-schema path "
              "(from_json with a validated DDL schema), then a struct "
              "field projected out",
          tags=("features", "schema-registry", "task", "framework"))
def f04_schema_registry_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.store import TableStore
    from projectone_spark.task import SparkTask

    configure(spark)
    root = scratch_dir(prefix="po_f04_store_")
    body = textwrap.dedent("""
        import pyspark.sql.functions as F
        def unpack(ev):
            return ev.select("event_id", "event_type",
                             F.col("props_t.k").alias("k"))
    """)
    task = (SparkTask.builder
            .setName("f04")
            .setInput(name="ev", path=f"{sf_dir}/events.parquet",
                      source="parquet",
                      features=[{"name": "schema_inference",
                                 "source_column": "props",
                                 "schema": "k bigint",
                                 "target_column": "props_t"}])
            .setExecution(name="unpack", body=body)
            .setOutput(name="out", table="f04_out", write_type="overwrite")
            .setStateLocation(scratch_dir(prefix="po_f04_state_"))
            .setStoreLocation(root)
            .setSession(spark)
            .create())
    task.execute()
    return (TableStore(root).read(spark, "f04_out")
            .select("event_id", "event_type", "k"))


_F06_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(event_id) AS BIGINT) AS min_id,
       CAST(max(event_id) AS BIGINT) AS max_id
FROM events
GROUP BY event_type
"""


@register("f06_avro_roundtrip", _F06_SQL,
          doc="jar-free Avro codec round trip, distributed end-to-end: "
              "events pack into a record struct, encode to Confluent-wire "
              "Avro binary (magic + schema id + zigzag/varint body) in "
              "one Arrow-batched stage, decode back through the "
              "schema-registry read path in another, and the aggregate "
              "runs on the DECODED fields — the oracle recomputes from "
              "the original table, so any codec corruption breaks the "
              "value hash",
          tags=("features", "avro", "schema-registry", "codec", "llm"))
def f06_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.avro import from_avro_df, to_avro_df
    from projectone_spark.queries import load

    configure(spark)
    schema = {"type": "record", "name": "ev", "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "event_type", "type": ["null", "string"]},
        {"name": "value", "type": "double"}]}
    ev = (load(spark, sf_dir, "events")
          .select(F.struct("event_id", "event_type", "value").alias("rec")))
    enc = to_avro_df(ev, "rec", schema, confluent_wire=True, schema_id=42)
    dec = from_avro_df(enc, "rec", schema, confluent_wire=True)
    return (dec.select("rec.event_id", "rec.event_type")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("event_id").alias("min_id"),
                 F.max("event_id").alias("max_id")))


_V01_SQL = """
SELECT 'kept_' || o_orderstatus AS metric,
       CAST(count(*) AS BIGINT) AS value
FROM orders WHERE o_totalprice >= 50000 GROUP BY o_orderstatus
UNION ALL
SELECT '__rows__', CAST(count(*) AS BIGINT) FROM orders
UNION ALL
SELECT 'low_price', CAST(sum(CASE WHEN o_totalprice >= 50000
                                  THEN 0 ELSE 1 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'status_open', CAST(sum(CASE WHEN o_orderstatus = 'O'
                                    THEN 1 ELSE 0 END) AS BIGINT) FROM orders
"""


@register("v01_row_expectations", _V01_SQL,
          doc="DLT-style row expectations in ONE pass (observe + gate + "
              "write): the drop rule removes low-price orders before the "
              "store write, the warn rule counts open-status rows without "
              "removing them, and the Observation's violation counters — "
              "collected during the write action itself, no second scan — "
              "are emitted as metric rows the oracle recomputes, alongside "
              "the per-status counts of what the store actually received",
          tags=("quality", "expectations", "write", "observability"))
def v01_row_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.quality import (
        Expectation,
        expect_and_write,
    )
    from projectone_spark.queries import load
    from projectone_spark.store import TableStore
    from projectone_spark.writers import write_overwrite

    configure(spark)
    store = TableStore(scratch_dir(prefix="po_v01_"))
    rules = [
        Expectation("low_price", "o_totalprice >= 50000", action="drop"),
        Expectation("status_open", "o_orderstatus <> 'O'", action="warn"),
    ]
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    counts = expect_and_write(
        orders, rules,
        lambda clean: write_overwrite(spark, store, clean, "v01_out"))
    kept = (store.read(spark, "v01_out")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("value"))
            .select(F.concat(F.lit("kept_"), F.col("o_orderstatus"))
                    .alias("metric"), "value"))
    metrics = values_frame(
        spark, [(k, int(v)) for k, v in sorted(counts.items())],
        "metric string, value long")
    return kept.unionByName(metrics)


_F07_SQL = """
SELECT n_regionkey,
       CAST(count(*) AS BIGINT) AS n_nations,
       min(n_name) AS first_nation
FROM nation
GROUP BY n_regionkey
"""


@register("f07_post_task_cleanup", _F07_SQL,
          doc="post_task_execution source cleanup through the task "
              "lifecycle (reference file_source.py:622-672 + "
              "Runtime.atexit): the nation file is staged into scratch, "
              "consumed by the task, written to the store, and the "
              "post-success delete feature removes the consumed source — "
              "deletion asserted in-query, results read back FROM THE "
              "STORE so the aggregate proves the data outlived its "
              "deleted source",
          tags=("task", "cleanup", "features", "framework"))
def f07_post_task_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil

    import pyspark.sql.functions as F

    from projectone_spark.queries import load
    from projectone_spark.store import TableStore
    from projectone_spark.task import SparkTask

    configure(spark)
    staged = scratch_dir(prefix="po_f07_src_")
    shutil.copy(f"{sf_dir}/nation.parquet",
                os.path.join(staged, "nation.parquet"))
    root = scratch_dir(prefix="po_f07_store_")
    task = (SparkTask.builder
            .setName("f07")
            .setInput(name="nation",
                      path=os.path.join(staged, "nation.parquet"),
                      source="parquet",
                      features=[
                          {"name": "select_columns",
                           "columns": "n_nationkey, n_name, n_regionkey"},
                          {"name": "post_task_execution",
                           "operation": "delete",
                           "path": os.path.join(staged, "*.parquet")},
                      ])
            .setOutput(name="out", table="f07_out", write_type="overwrite")
            .setStateLocation(scratch_dir(prefix="po_f07_state_"))
            .setStoreLocation(root)
            .setSession(spark)
            .create())
    task.execute()
    leftover = glob.glob(os.path.join(staged, "*.parquet"))
    check(leftover == [], f"post_task_execution left sources: {leftover}")
    return (TableStore(root).read(spark, "f07_out")
            .groupBy(F.col("n_regionkey").cast("bigint").alias("n_regionkey"))
            .agg(F.count(F.lit(1)).alias("n_nations"),
                 F.min("n_name").alias("first_nation")))


_F08_SQL = """
WITH c AS (
  SELECT o_orderstatus AS s, count(*) AS n FROM orders GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
SELECT 'status_' || s AS name,
       'FAIL' AS severity,
       CAST(n AS BIGINT) AS n
FROM c, t WHERE n * 3 > total
"""


@register("f08_event_handlers", _F08_SQL,
          doc="event bus + webhook notification handler adjudicated on "
              "data-derived events (reference core/event/manager.py:"
              "10-112): per-status order counts become events (FAIL when "
              "the status holds more than its fair third of orders), the "
              "consumer's compiled condition grammar filters them, and "
              "the rows are what the webhook transport actually RECEIVED "
              "— envelope fields, severity routing and condition "
              "evaluation all hash-checked against the recomputed counts",
          tags=("events", "webhook", "framework"))
def f08_event_handlers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    from projectone_spark.events import Event, EventManager, webhook_handler
    from projectone_spark.queries import load

    configure(spark)
    counts = (load(spark, sf_dir, "orders")
              .groupBy("o_orderstatus").count().collect())  # bounded: 3 rows
    total = sum(r["count"] for r in counts)
    received: list[dict] = []

    def transport(url: str, body: bytes, headers=None):
        received.append(json.loads(body))

    bus = EventManager(synchronous=True)
    bus.subscribe("*", webhook_handler(
        "mock://hook", transport,
        condition="severity == 'FAIL' and detail['kind'] in ('status',)"))
    for r in sorted(counts, key=lambda r: r["o_orderstatus"]):
        n = r["count"]
        bus.dispatch(Event(
            f"status_{r['o_orderstatus']}",
            severity="FAIL" if n * 3 > total else "CONTINUE",
            detail={"kind": "status", "n": n}))
    return values_frame(
        spark,
        [(p["name"], p["severity"], int(p["detail"]["n"])) for p in received],
        "name string, severity string, n long")


_F09_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM orders
GROUP BY o_orderstatus
"""


@register("f09_file_path_cdc", _F09_SQL,
          doc="file_path_cdc_feed window semantics end-to-end (reference "
              "file_source.py:727-813): orders split into two staged "
              "files with controlled mtimes; run 1's (0, t1] window "
              "admits only the older file, the persisted watermark makes "
              "run 2's (t1, t2] window admit only the newer one, a third "
              "run raises NoSourceData (all asserted in-query) — the "
              "union of the two disjoint batches must hash-equal the "
              "whole table",
          tags=("cdc", "files", "task", "framework"))
def f09_file_path_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil

    import pyspark.sql.functions as F

    from projectone_spark.queries import load
    from projectone_spark.sources.file_clients import (
        LocalFileClient,
        NoSourceData,
        modified_files_cdc,
        save_file_cdc,
    )
    from projectone_spark.store.state import StateStore

    configure(spark)
    staged = scratch_dir(prefix="po_f09_src_")

    def stage(df, name: str, mtime: float) -> str:
        tmp = os.path.join(staged, f"__tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(staged, f"{name}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (mtime, mtime))
        return dst

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus")
    older = stage(orders.filter(F.col("o_orderkey") % 2 == 0), "a", 100.0)
    newer = stage(orders.filter(F.col("o_orderkey") % 2 == 1), "b", 200.0)

    state = StateStore(scratch_dir(prefix="po_f09_state_"))
    client = LocalFileClient()
    pattern = os.path.join(staged, "*.parquet")
    files1, wm1 = modified_files_cdc(client, pattern, state, "src",
                                     now_epoch=150.0)
    check(files1 == [older], files1)  # (0, 150] admits only mtime=100
    save_file_cdc(state, "src", wm1)
    files2, wm2 = modified_files_cdc(client, pattern, state, "src",
                                     now_epoch=300.0)
    check(files2 == [newer], files2)  # (150, 300] admits only mtime=200
    save_file_cdc(state, "src", wm2)
    try:
        modified_files_cdc(client, pattern, state, "src", now_epoch=400.0)
        raise AssertionError("empty window must raise NoSourceData")
    except NoSourceData:
        pass
    return (spark.read.parquet(*files1, *files2)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.min("o_orderkey").alias("min_key"),
                 F.max("o_orderkey").alias("max_key")))


_F10_SQL = """
SELECT 'orders' AS src, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS measure
FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT 'lineitem' AS src, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS measure
FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-06-01'
"""


@register("f10_stream_multi_output_task", _F10_SQL,
          doc="two-input/two-output STREAM task driven end-to-end: both "
              "inputs stream from parquet directories, one execution "
              "function returns a dict of two DataFrames, each output "
              "runs its own writeStream whose checkpoint DEFAULTS to "
              "{state_location}/checkpoints/{output} (reference "
              "output.py:100-110) — asserted in-query along with the "
              "N-inputs/N-outputs stream validation (reference "
              "task.py:239-266: 2 stream inputs with 3 outputs must be "
              "rejected); the oracle recomputes both written tables from "
              "the source relations",
          tags=("task", "streaming", "framework", "multi-output"))
def f10_stream_multi_output_task(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    import pyspark.sql.functions as F

    from projectone_spark.store import TableStore
    from projectone_spark.task import SparkTask

    configure(spark)
    store_root = scratch_dir(prefix="po_f10_store_")
    state_root = scratch_dir(prefix="po_f10_state_")

    # file streams need a DIRECTORY source + explicit schema: symlink the
    # driver-provided single-file tables into scratch dirs (zero copy)
    def stage(table: str) -> tuple[str, str]:
        d = scratch_dir(prefix=f"po_f10_{table}_")
        os.symlink(f"{sf_dir}/{table}.parquet",
                   os.path.join(d, f"{table}.parquet"))
        ddl = ", ".join(f"{c} {t}"
                        for c, t in spark.read.parquet(
                            f"{sf_dir}/{table}.parquet").dtypes)
        return d, ddl

    orders_dir, orders_ddl = stage("orders")
    items_dir, items_ddl = stage("lineitem")

    body = textwrap.dedent("""
        import pyspark.sql.functions as F
        def split_streams(orders, items):
            return {
                "out_orders": orders.filter(
                    F.col("o_orderpriority") == "1-URGENT"),
                "out_items": items.filter(
                    F.col("l_shipdate")
                    >= F.lit("1997-06-01").cast("timestamp")),
            }
    """)

    def build(n_outputs: int) -> SparkTask:
        b = (SparkTask.builder
             .setName("f10")
             .setInput(name="orders", path=orders_dir, source="parquet",
                       source_extract_type="stream",
                       read_options={"source_schema": orders_ddl})
             .setInput(name="items", path=items_dir, source="parquet",
                       source_extract_type="stream",
                       read_options={"source_schema": items_ddl})
             .setExecution(name="split_streams", body=body)
             .setOutput(name="out_orders", table="f10_orders",
                        write_type="append")
             .setOutput(name="out_items", table="f10_items",
                        write_type="append"))
        if n_outputs == 3:  # deliberately invalid: 2 stream inputs, 3 outs
            b = b.setOutput(name="extra", table="f10_extra",
                            write_type="append")
        return (b.setRefreshPolicy(type="stream")
                .setStateLocation(state_root)
                .setStoreLocation(store_root)
                .setSession(spark)
                .create())

    # the reference's stream-task constraint: #outputs must equal #inputs
    # (or 1) — a 2-in/3-out config must be REJECTED at create time
    try:
        build(3)
    except ValueError:
        pass
    else:
        check(False, "2-in/3-out stream task was not rejected")

    task = build(2)
    results = task.stream_process(timeout_seconds=300)
    check(all(r.status == "success" for r in results),
          lambda: f"stream task step failed: {[r.status for r in results]}")
    # per-output checkpoint defaulting (reference output.py:100-110)
    for out in ("out_orders", "out_items"):
        check(os.path.isdir(os.path.join(state_root, "checkpoints", out)),
              f"missing defaulted checkpoint for {out}")

    store = TableStore(store_root)

    def measure(table: str, label: str, money: str) -> DataFrame:
        return (store.read(spark, table)
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.round(F.sum(F.col(money).cast("decimal(18,2)")), 2)
                     .cast("double").alias("measure"))
                .select(F.lit(label).alias("src"), "n_rows", "measure"))

    return (measure("f10_orders", "orders", "o_totalprice")
            .unionByName(measure("f10_items", "lineitem", "l_extendedprice")))


_V02_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       TRUE AS metrics_consistent
FROM orders
WHERE o_totalprice >= 100000.0
GROUP BY o_orderstatus
"""


@register("v02_stage_metrics_accounting", _V02_SQL,
          doc="the per-stage task-metrics surface adjudicated end-to-end: "
              "a batch task writes filtered orders under observe_stages, "
              "and the query ASSERTS the AppStatusStore snapshot persisted "
              "to state logs accounts for the write exactly — the output "
              "job group's stages sum to outputRecords == the number of "
              "rows the store actually received (which the oracle "
              "recomputes from the source relation), with run time and "
              "task counts present (reference spark_listener.py:99-180)",
          tags=("task", "observability", "framework"))
def v02_stage_metrics_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.store import TableStore
    from projectone_spark.task import SparkTask

    configure(spark)
    store_root = scratch_dir(prefix="po_v02_store_")
    task = (SparkTask.builder
            .setName("v02")
            .setInput(name="src", path=f"{sf_dir}/orders.parquet",
                      source="parquet",
                      read_options={"filter": "o_totalprice >= 100000.0"})
            .setOutput(name="out", table="v02_out", write_type="overwrite")
            .setObserveStages()
            .setStateLocation(scratch_dir(prefix="po_v02_state_"))
            .setStoreLocation(store_root)
            .setSession(spark)
            .create())
    results = task.execute()
    check(all(r.status == "success" for r in results),
          lambda: f"task step failed: {[r.status for r in results]}")

    snap = task.state.get_value("out_stage_metrics")
    check(bool(snap) and snap["group"] == f"output_out_{task.batch_id}",
          "stage-metrics snapshot missing from state logs")
    stages = snap["stages"]
    check(bool(stages), "no stages captured for the output job group")
    check(all(st["status"] == "COMPLETE" and st["numTasks"] > 0
              and st["executorRunTime"] >= 0 for st in stages),
          lambda: f"malformed stage rows: {stages}")

    written = TableStore(store_root).read(spark, "v02_out")
    n_written = written.count()
    out_records = sum(st["outputRecords"] for st in stages)
    check(out_records == n_written,
          f"stage outputRecords {out_records} != rows written {n_written}")

    return (written.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select("o_orderstatus", "n_rows",
                    F.lit(True).alias("metrics_consistent")))
