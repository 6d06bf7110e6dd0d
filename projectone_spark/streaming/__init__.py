"""Structured Streaming layer.

Re-expresses the reference's streaming surface (SURVEY §2.11) Spark-first:

- ``StreamTrigger`` — the reference's trigger contract
  (``core/schemas/sources.py:88-110``): ``once`` / ``availableNow``
  (default) / ``processingTime``.
- ``foreach_batch_writer`` — every batch write type (scd1/2/3, append,
  overwrite, selective_overwrite) reused per micro-batch, exactly the
  reference's foreachBatch idiom (``operator/spark_task/output.py:195-224``).
  The micro-batch frame is persisted first because a multi-action SCD write
  would otherwise re-read the (ephemeral) batch source
  (``output.py:163-171``).
- ``write_stream`` — queryName + trigger + checkpointLocation + sink
  (``core/sources/__init__.py:364-381``).
- ``stream_wait_close`` — poll all queries until completion
  (``core/task/spark/task.py:547-556``).

Spark-native extensions the reference lacks (SURVEY §2.11 "absent"):
watermarks, tumbling/sliding windows, session windows, and
within-watermark dedup live in :mod:`projectone_spark.streaming.windows`.

Scale notes: stateful operators (windowed aggs, dedup) shuffle on the
grouping key; watermarks bound state size so a 100 TB/day stream cannot
accumulate unbounded state. Checkpoints are per-output so two sinks of one
task never share offsets.
"""

from __future__ import annotations

import time
import uuid
from collections.abc import Callable, Sequence
from contextlib import contextmanager
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from projectone_spark.store import TableStore
from projectone_spark.writers import WRITERS

from projectone_spark.session import scratch_dir
from projectone_spark.streaming.windows import (  # noqa: F401  (re-export)
    dedup_within_watermark,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


@dataclass
class StreamTrigger:
    """Trigger contract (reference ``StreamTrigger.trigger`` property,
    ``core/schemas/sources.py:88-110``): exactly one mode; availableNow is
    the default, matching the reference."""

    once: bool = False
    available_now: bool = True
    processing_time: str | None = None

    def kwargs(self) -> dict[str, Any]:
        if self.processing_time:
            return {"processingTime": self.processing_time}
        if self.once:
            return {"once": True}
        return {"availableNow": True}


def checkpoint_location(state_location: str, output_name: str) -> str:
    """Per-output checkpoint default (reference ``output.py:100-110``:
    ``{state_location}/checkpoints/{output}``)."""
    return f"{state_location}/checkpoints/{output_name}"


def foreach_batch_writer(spark: SparkSession, store: TableStore, table: str,
                         write_type: str,
                         **writer_kwargs: Any) -> Callable[[DataFrame, int], None]:
    """Adapt a batch writer into a foreachBatch function.

    Reference semantics (``output.py:195-224``): the same scd1/2/3/append/
    overwrite writer functions run per micro-batch with the batch frame
    persisted up-front (``output.py:163-171``).
    """
    writer = WRITERS[write_type]

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            writer(spark, store, batch_df, table, **writer_kwargs)
        finally:
            batch_df.unpersist()

    return _write


def exactly_once_appender(store: TableStore, table: str, app_id: str,
                          **append_kwargs: Any) -> Callable[[DataFrame, int], None]:
    """foreachBatch append that is idempotent under micro-batch replay.

    Structured Streaming guarantees at-least-once delivery to foreachBatch:
    after a crash between sink write and checkpoint commit, the batch is
    re-delivered. The store records the highest (app_id, batch_id) inside
    the SAME atomic manifest commit as the data (Delta's
    ``txnAppId``/``txnVersion`` pattern), so a replayed batch is detected
    and skipped — append + checkpoint become effectively exactly-once.
    """
    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= store.txn_version(table, app_id):
            return
        store.append(batch_df.sparkSession, batch_df, table,
                     txn=(app_id, batch_id), **append_kwargs)

    return _write


def write_stream(df: DataFrame, *,
                 query_name: str | None = None,
                 checkpoint: str | None = None,
                 trigger: StreamTrigger | None = None,
                 output_mode: str = "append",
                 foreach_batch: Callable[[DataFrame, int], None] | None = None,
                 sink_format: str | None = None,
                 path: str | None = None,
                 options: dict[str, str] | None = None) -> StreamingQuery:
    """Start a streaming write (reference ``core/sources/__init__.py:364-381``).

    Exactly one of ``foreach_batch`` / ``sink_format`` selects the sink.
    """
    trigger = trigger or StreamTrigger()
    writer = (df.writeStream
              .queryName(query_name or f"q_{uuid.uuid4().hex[:8]}")
              .outputMode(output_mode)
              .trigger(**trigger.kwargs()))
    writer = writer.option("checkpointLocation",
                           checkpoint or scratch_dir(prefix="po_ckpt_"))
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if foreach_batch is not None:
        return writer.foreachBatch(foreach_batch).start()
    assert sink_format is not None, "need foreach_batch or sink_format"
    writer = writer.format(sink_format)
    if path is not None:
        return writer.start(path)
    return writer.start()


def stream_wait_close(queries: Sequence[StreamingQuery], *,
                      poll_seconds: float = 0.1,
                      timeout_seconds: float | None = None) -> None:
    """Wait for all queries to finish (reference ``stream_wait_close``,
    ``task.py:547-556``), then surface any exception."""
    deadline = (time.monotonic() + timeout_seconds) if timeout_seconds else None
    while any(q.isActive for q in queries):
        if deadline and time.monotonic() > deadline:
            for q in queries:
                q.stop()
            raise TimeoutError("streaming queries did not finish in time")
        time.sleep(poll_seconds)
    for q in queries:
        if q.exception() is not None:
            raise q.exception()


def run_to_memory(df: DataFrame, *, output_mode: str = "complete",
                  trigger: StreamTrigger | None = None,
                  timeout_seconds: float = 300.0,
                  state_partitions: int | None = 8) -> DataFrame:
    """Run a finite (availableNow) stream into a memory sink and return the
    result as a batch DataFrame. The memory sink holds results driver-side,
    so this is a TEST/small-result surface, not a production sink.

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for the
    stream's lifetime (restored after): streaming state-store partition
    count is frozen at the first checkpoint anyway, and every micro-batch
    pays per-partition task + state-commit overhead, so size it to the
    stream's rate — not to the batch-analytics default. Locally 8 halves
    stateful-query wall time; at production rates pick rate-appropriate
    values. Pass None to leave the session setting untouched.
    """
    spark = df.sparkSession
    name = f"mem_{uuid.uuid4().hex[:10]}"
    with shuffle_partitions(spark, state_partitions):
        q = write_stream(df, query_name=name, output_mode=output_mode,
                         trigger=trigger or StreamTrigger(),
                         sink_format="memory")
        stream_wait_close([q], timeout_seconds=timeout_seconds,
                          poll_seconds=0.1)
    return spark.table(name)


def run_to_memory_paced(df: DataFrame, *, total_rows: int,
                        output_mode: str = "complete",
                        timeout_seconds: float = 120.0,
                        state_partitions: int | None = 8
                        ) -> tuple[DataFrame, int]:
    """Drive a stream on a continuous (processingTime=0) trigger until the
    source has admitted ``total_rows`` input rows, then stop; returns the
    memory-sink result and the number of NON-EMPTY micro-batches that ran.

    availableNow serves a ``SimpleDataSourceStreamReader`` as one catch-up
    batch, so a rate-limited source's offset machinery degenerates there;
    this drive loop re-plans every micro-batch from the committed offset,
    exercising real multi-batch offset progression (each batch = one
    watermark window). Only for finite, known-cardinality test/bench
    sources — a production stream has no terminal row count.
    """
    spark = df.sparkSession
    name = f"mem_{uuid.uuid4().hex[:10]}"
    with shuffle_partitions(spark, state_partitions):
        q = write_stream(
            df, query_name=name, output_mode=output_mode,
            trigger=StreamTrigger(processing_time="0 seconds"),
            sink_format="memory")
        try:
            deadline = time.monotonic() + timeout_seconds
            # Accumulate per-batch counts keyed by batchId rather than
            # re-summing recentProgress: Spark caps that buffer at
            # numRecentProgressUpdates (default 100), so on a slow source
            # idle progress events would evict early non-empty batches
            # and the sum would undercount forever.
            batch_rows: dict[int, int] = {}
            while True:
                # progress entries are emitted AFTER a batch commits,
                # so every counted row is already in the sink
                for p in q.recentProgress:
                    batch_rows[p["batchId"]] = p["numInputRows"]
                seen = sum(batch_rows.values())
                if seen >= total_rows:
                    break
                if q.exception() is not None:
                    raise q.exception()
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"stream admitted {seen}/{total_rows} rows within "
                        f"{timeout_seconds}s")
                time.sleep(0.05)
            n_nonempty = sum(1 for n in batch_rows.values() if n > 0)
        finally:
            q.stop()
        stream_wait_close([q], timeout_seconds=30)
    return spark.table(name), n_nonempty


@contextmanager
def shuffle_partitions(spark: SparkSession, n: int | None):
    """Pin ``spark.sql.shuffle.partitions`` for the block (restored after);
    no-op when ``n`` is None. Streams must run to completion INSIDE the
    block — micro-batch planning reads the conf per batch."""
    if n is None:
        yield
        return
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def read_stream_parquet(spark: SparkSession, path: str, schema_ddl: str,
                        *, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source streaming read over parquet (reference stream read,
    ``core/sources/__init__.py:608-648``). File streams require an explicit
    schema and a *directory* source; a single-file path is exposed through
    a symlinked temp directory. ``max_files_per_trigger`` controls
    micro-batch slicing."""
    import os

    if os.path.isfile(path):
        d = scratch_dir(prefix="po_streamsrc_")
        os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
        path = d
    reader = spark.readStream.schema(schema_ddl)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


__all__ = [
    "StreamTrigger", "checkpoint_location", "foreach_batch_writer",
    "exactly_once_appender",
    "write_stream", "stream_wait_close", "run_to_memory",
    "run_to_memory_paced",
    "read_stream_parquet", "tumbling_window_agg", "sliding_window_agg",
    "session_window_agg", "dedup_within_watermark",
]
