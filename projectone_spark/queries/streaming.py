"""Streaming queries — Structured Streaming runs over the driver parquet.

Each query builds a real ``readStream`` (file source, availableNow
trigger), runs it to completion, and returns the result as a batch
DataFrame so the DuckDB oracle can hash-compare values. The streaming
plans are the same declarative aggregations a production job would run
unbounded; availableNow just makes them finite (the reference's default
trigger too, ``core/schemas/sources.py:88-110``).
"""

from __future__ import annotations


import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.queries import check, load, register
from projectone_spark.session import scratch_dir
from projectone_spark.streaming import (
    dedup_within_watermark,
    foreach_batch_writer,
    read_stream_parquet,
    run_to_memory,
    session_window_agg,
    stream_wait_close,
    tumbling_window_agg,
    write_stream,
)

#: Raw file schemas of events.parquet. The driver has shipped the ``ts``
#: column both as int64 NANOS (readable only as long under the legacy conf)
#: and as timestamp[us] without timezone (TIMESTAMP_NTZ); _stream_events
#: peeks the parquet footer and picks the matching DDL so a precision change
#: in the testdata can never silently shift event times (see queries.load
#: for the batch twin and tests/test_ts_sanity.py for the guard).
_EVENTS_DDL_NANOS = ("event_id bigint, ts bigint, user_id bigint, "
                     "event_type string, value double, props string")
_EVENTS_DDL_MICROS = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
                      "event_type string, value double, props string")

_ORDERS_DDL = ("o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
               "o_totalprice double, o_orderdate timestamp, o_orderpriority string")


def _events_ts_is_nanos(path: str) -> bool:
    """Peek the parquet footer: True when ``ts`` is raw int64 (legacy nanos)."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        part = next(p for p in sorted(os.listdir(path))
                    if p.endswith(".parquet"))
        path = os.path.join(path, part)
    return str(pq.read_schema(path).field("ts").type) == "int64"


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.session import configure

    configure(spark)
    path = f"{sf_dir}/events.parquet"
    if _events_ts_is_nanos(path):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = read_stream_parquet(spark, path, _EVENTS_DDL_NANOS)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    raw = read_stream_parquet(spark, path, _EVENTS_DDL_MICROS)
    # session tz is UTC: NTZ -> TIMESTAMP cast is value-identical
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


_ST01_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


@register("st01_stream_tumbling", _ST01_SQL,
          doc="streaming tumbling 1h window per event_type (watermark + availableNow)",
          tags=("streaming", "window"))
def st01_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir)
    agg = tumbling_window_agg(
        ev, "ts", "1 hour",
        [F.count(F.lit(1)).alias("n_events"),
         F.round(F.sum("value"), 2).alias("total_value")],
        keys=("event_type",), watermark="2 hours")
    return run_to_memory(agg, output_mode="complete")


_ST02_SQL = """
WITH source AS (
  SELECT o_orderkey, round(o_totalprice, 2) + 1000.0 AS total_price
  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
SELECT o_orderkey, total_price FROM source
UNION ALL
SELECT o_orderkey, round(o_totalprice, 2) AS total_price
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = o.o_orderkey)
"""


@register("st02_stream_scd1_upsert", _ST02_SQL,
          doc="foreachBatch reuse of the batch SCD1 writer on a streamed source",
          tags=("streaming", "scd", "merge"))
def st02_stream_scd1_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed the store with the full snapshot (batch), then stream the
    changed rows through foreachBatch → scd1 — the reference's idiom of
    reusing every batch write type per micro-batch (output.py:195-224)."""
    from projectone_spark.store import TableStore
    from projectone_spark.writers import write_overwrite

    store = TableStore(scratch_dir(prefix="po_st02_"))
    orders = load(spark, sf_dir, "orders")
    seed = orders.select("o_orderkey",
                         F.round("o_totalprice", 2).alias("total_price"))
    write_overwrite(spark, store, seed, "orders_scd1")

    changed = (read_stream_parquet(spark, f"{sf_dir}/orders.parquet", _ORDERS_DDL)
               .filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
               .select("o_orderkey",
                       (F.round(F.col("o_totalprice"), 2) + 1000.0).alias("total_price")))
    # micro-batches are small slices of the source: size the merge shuffle
    # to the batch, not to the session's batch-analytics default
    from projectone_spark.streaming import shuffle_partitions

    with shuffle_partitions(spark, 8):
        q = write_stream(
            changed,
            foreach_batch=foreach_batch_writer(
                spark, store, "orders_scd1", "scd1",
                key_cols=["o_orderkey"],
                now=F.lit("2024-02-01").cast("timestamp")))
        stream_wait_close([q], timeout_seconds=300)
    return store.read(spark, "orders_scd1").select("o_orderkey", "total_price")


_ST03_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid
"""


@register("st03_stream_session_window", _ST03_SQL,
          doc="streaming session windows (30-min gap) per user",
          tags=("streaming", "window", "session"))
def st03_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir)
    agg = session_window_agg(
        ev, "ts", "30 minutes",
        [F.count(F.lit(1)).alias("n_events")],
        keys=("user_id",), watermark="1 hour")
    return run_to_memory(agg, output_mode="complete")


_ST04_SQL = "SELECT DISTINCT user_id, event_type FROM events"


@register("st04_stream_dedup", _ST04_SQL,
          doc="dropDuplicatesWithinWatermark: bounded-state streaming dedup",
          tags=("streaming", "dedup"))
def st04_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir)
    deduped = dedup_within_watermark(
        ev.select("user_id", "event_type", "ts"),
        ["user_id", "event_type"], "ts", "1 hour")
    return run_to_memory(deduped.select("user_id", "event_type"),
                         output_mode="append")


_ST05_SQL = """
WITH slides AS (SELECT unnest(range(0, 4)) * 15 AS off),
w AS (
  SELECT date_trunc('hour', e.ts - INTERVAL (s.off) MINUTE)
           + INTERVAL (s.off) MINUTE AS window_start,
         e.event_type, e.value
  FROM events e CROSS JOIN slides s
  WHERE e.ts >= date_trunc('hour', e.ts - INTERVAL (s.off) MINUTE)
                + INTERVAL (s.off) MINUTE)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM w GROUP BY 1, 2, 3
"""


@register("st05_stream_sliding", _ST05_SQL,
          doc="streaming sliding windows (1h long, 15min slide) per event type",
          tags=("streaming", "window"))
def st05_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.streaming import sliding_window_agg

    ev = _stream_events(spark, sf_dir)
    agg = sliding_window_agg(
        ev, "ts", "1 hour", "15 minutes",
        [F.count(F.lit(1)).alias("n_events")],
        keys=("event_type",), watermark="2 hours")
    return run_to_memory(agg, output_mode="complete")


_ST06_SQL = """
SELECT v.user_id AS user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       v.ts AS view_ts, p.ts AS purchase_ts,
       round(p.value - v.value, 2) AS value_delta
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
"""


@register("st06_stream_interval_join", _ST06_SQL,
          doc="stream-stream watermarked interval join: views joined to the "
              "purchases that follow within 1h; the time-range conjunct + "
              "watermarks bound the buffered join state (append mode)",
          tags=("streaming", "join"))
def st06_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.streaming.joins import interval_join

    views = (_stream_events(spark, sf_dir)
             .filter(F.col("event_type") == "view")
             .select("user_id", F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"),
                     F.col("value").alias("view_value")))
    purchases = (_stream_events(spark, sf_dir)
                 .filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user_id"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts"), "value"))
    joined = interval_join(
        views, purchases.withColumnRenamed("p_user_id", "user_id"),
        on="user_id", left_ts="view_ts", right_ts="purchase_ts",
        within="1 HOUR", watermark="2 hours")
    out = joined.select(
        F.col("l.user_id").alias("user_id"), "view_id", "purchase_id",
        "view_ts", "purchase_ts",
        F.round(F.col("value") - F.col("view_value"), 2).alias("value_delta"))
    return run_to_memory(out, output_mode="append")


_ST07_SQL = """
SELECT o.o_orderkey, c.c_name,
       round(o.o_totalprice, 2) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
"""


@register("st07_stream_static_join", _ST07_SQL,
          doc="stream-static enrichment join: streaming orders join the "
              "batch customer dimension per micro-batch (dimension is "
              "re-read each batch — picks up dim updates; broadcast under "
              "the threshold, no stream state at all)",
          tags=("streaming", "join"))
def st07_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = (read_stream_parquet(spark, f"{sf_dir}/orders.parquet",
                                  _ORDERS_DDL)
              .filter(F.col("o_orderdate")
                      >= F.lit("1997-01-01").cast("timestamp")))
    joined = (orders.join(customer,
                          orders.o_custkey == customer.c_custkey)
              .select("o_orderkey", "c_name",
                      F.round("o_totalprice", 2).alias("total_price")))
    return run_to_memory(joined, output_mode="append")


_ST08_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS revenue
FROM orders
GROUP BY o_orderstatus
"""


@register("st08_stream_from_table", _ST08_SQL,
          doc="the store itself as a streaming source (Delta readStream "
              "parity, Spark 4 Python DataSource): offsets are manifest "
              "versions, each micro-batch plans one partition per file the "
              "commit added, executors read them with pyarrow; two append "
              "commits stream in and aggregate to the same totals as a "
              "batch scan",
          tags=("streaming", "store", "source"))
def st08_stream_from_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.sources.store_stream import stream_from_store
    from projectone_spark.store import TableStore

    orders = load(spark, sf_dir, "orders")
    st = TableStore(scratch_dir(prefix="pos-ssrc-"))
    st.overwrite(spark, orders.filter(F.col("o_orderkey") % 2 == 0)
                 .repartition(4), "orders")
    # the complement by predicate, not exceptAll: same rows (o_orderkey is
    # unique), no wide shuffle-distinct in the timed region
    st.append(spark, orders.filter(F.col("o_orderkey") % 2 == 1)
              .repartition(4), "orders")
    stream = stream_from_store(spark, st, "orders")
    agg = (stream.groupBy("o_orderstatus")
           .agg(F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")), 2)
                .cast("double").alias("revenue")))
    return run_to_memory(agg, output_mode="complete")


_ST09_SQL = """
SELECT CAST(o_orderdate AS DATE) AS order_date,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01'
GROUP BY 1
"""


@register("st09_stream_exactly_once_sink", _ST09_SQL,
          doc="exactly-once streaming sink: micro-batches append to the "
              "store through the txnAppId/txnVersion watermark (committed "
              "atomically with the data), and a deliberate REPLAY of the "
              "whole stream over the same app_id is a no-op — the final "
              "table still equals the batch oracle",
          tags=("streaming", "store", "txn", "sink"))
def st09_stream_exactly_once_sink(spark: SparkSession, sf_dir: str
                                  ) -> DataFrame:
    from projectone_spark.session import configure
    from projectone_spark.store import TableStore
    from projectone_spark.streaming import (
        StreamTrigger, exactly_once_appender, shuffle_partitions,
        stream_wait_close, write_stream,
    )

    configure(spark)  # UTC casts regardless of the caller's session tz
    store = TableStore(scratch_dir(prefix="po_st09_"))
    sel = (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))

    def run_stream() -> None:
        orders = (read_stream_parquet(spark, f"{sf_dir}/orders.parquet",
                                      _ORDERS_DDL, max_files_per_trigger=1)
                  .filter(sel)
                  .select("o_orderkey", "o_orderdate", "o_totalprice"))
        with shuffle_partitions(spark, 8):
            q = write_stream(
                orders, trigger=StreamTrigger(),
                foreach_batch=exactly_once_appender(store, "orders", "st09"))
            stream_wait_close([q], timeout_seconds=300)

    run_stream()
    v_after_first = store.version("orders")
    run_stream()  # full replay, fresh checkpoint: every batch id repeats
    check(store.version("orders") == v_after_first, "replay must be no-op")
    return (store.read(spark, "orders")
            .groupBy(F.col("o_orderdate").cast("date").alias("order_date"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")), 2)
                 .cast("double").alias("revenue")))
