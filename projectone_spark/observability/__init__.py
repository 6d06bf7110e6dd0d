"""Observability: job groups, plan capture, streaming metrics.

Mirrors the reference's listener harness
(``core/observability/spark_listener.py``) with the parts Python can
reach natively in Spark 4:

- ``job_group`` — per-output job grouping (``output.py:186-192``) so the
  Spark UI / history server attributes stages to pipeline outputs;
- ``capture_plan`` — the executed logical+physical plan text persisted
  per query (reference dumps ``sparkPlan().toJSON()``,
  ``spark_listener.py:55-97``);
- ``StreamMetricsListener`` — a ``StreamingQueryListener`` persisting
  per-batch progress (numInputRows, batchDuration, processedRowsPerSecond)
  to the task's StateStore logs (``spark_listener.py:374-478``).

Per-stage task metrics (shuffle bytes, spill, GC) live JVM-side; the
scheduler-listener bridge needs a py4j callback server, which this engine
intentionally avoids on the hot path — the history server + job groups
carry that duty at production scale.
"""

from __future__ import annotations

import json
import time
import uuid
from contextlib import contextmanager
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import listener as _listener

from projectone_spark.store.state import StateStore


@contextmanager
def job_group(spark: SparkSession, group: str,
              description: str = "") -> Iterator[None]:
    """Scope Spark jobs under a group id (reference sets
    ``output_{name}`` per output write)."""
    sc = spark.sparkContext
    sc.setJobGroup(group, description or group)
    try:
        yield
    finally:
        sc.setJobGroup("", "")


def capture_plan(df: DataFrame, *, extended: bool = False) -> str:
    """The query's analyzed/physical plan text (driver-side, no action)."""
    mode = "extended" if extended else "formatted"
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def log_plan(state: StateStore, name: str, df: DataFrame) -> int:
    """Persist the plan alongside task state (reference persists plan JSON
    per executed query)."""
    return state.set(f"{name}_plan", {"captured_at": time.time(),
                                      "plan": capture_plan(df)},
                     folder="state")


class StreamMetricsListener(_listener.StreamingQueryListener):
    """Persist streaming progress per micro-batch, keyed by query name."""

    def __init__(self, state: StateStore):
        self.state = state

    def onQueryStarted(self, event: Any) -> None:
        self.state.set(f"stream_{event.name or event.id}_started",
                       {"id": str(event.id), "runId": str(event.runId),
                        "ts": time.time()}, folder="state")

    def onQueryProgress(self, event: Any) -> None:
        p = event.progress
        row = {
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": dict(p.durationMs) if p.durationMs else {},
            "timestamp": p.timestamp,
        }
        self.state.set(f"stream_{p.name or p.id}_progress", row, folder="state")

    def onQueryTerminated(self, event: Any) -> None:
        self.state.set(f"stream_{event.id}_terminated",
                       {"exception": event.exception, "ts": time.time()},
                       folder="state")

    def onQueryIdle(self, event: Any) -> None:  # pragma: no cover
        pass


@contextmanager
def stream_metrics(spark: SparkSession,
                   state: StateStore) -> Iterator[StreamMetricsListener]:
    """Attach/detach the metrics listener around a streaming run."""
    lst = StreamMetricsListener(state)
    spark.streams.addListener(lst)
    try:
        yield lst
    finally:
        spark.streams.removeListener(lst)


def write_event_log(state: StateStore, severity: str, message: str,
                    detail: dict | None = None) -> int:
    """Minimal event record (the reference's event bus severities
    CONTINUE/FAIL/STOP_WH_FAIL, ``core/schemas/event.py:6-104``)."""
    assert severity in ("CONTINUE", "FAIL", "STOP_WH_FAIL")
    return state.set(f"event_{uuid.uuid4().hex[:12]}",
                     {"severity": severity, "message": message,
                      "detail": detail or {}, "ts": time.time()},
                     folder="state")
