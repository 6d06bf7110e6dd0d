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
  to the task's StateStore logs (``spark_listener.py:374-478``);
- ``stage_metrics`` / ``log_stage_metrics`` — the reference's per-stage
  task metrics (run/CPU/GC time, shuffle read/write, spill, peak memory;
  ``spark_listener.py:99-180``), pulled from Spark's in-memory
  ``AppStatusStore`` instead of a py4j-callback-server push listener: same
  numbers, no callback server on the hot path, works with the UI disabled.
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


#: the reference's per-stage task-metric names
#: (``spark_listener.py:99-180``) → the v1.StageData getter carrying the
#: same quantity in Spark's AppStatusStore
_STAGE_METRIC_GETTERS = (
    "numTasks", "numCompleteTasks", "numFailedTasks",
    "executorRunTime", "executorCpuTime",
    "executorDeserializeTime", "resultSerializationTime",
    "jvmGcTime",
    "memoryBytesSpilled", "diskBytesSpilled", "peakExecutionMemory",
    "inputBytes", "inputRecords", "outputBytes", "outputRecords",
    "shuffleReadBytes", "shuffleReadRecords",
    "shuffleWriteBytes", "shuffleWriteRecords",
)


def stage_metrics(spark: SparkSession, *,
                  group: str | None = None,
                  settle_secs: float = 2.0) -> list[dict[str, Any]]:
    """Per-stage task metrics (run/CPU/GC time, shuffle read/write bytes,
    spill, peak memory — the reference's ``onStageCompleted`` payload,
    ``spark_listener.py:99-180``) snapshotted from Spark's in-memory
    ``AppStatusStore``.

    The reference collects these through a py4j-callback-server scheduler
    listener; this engine reads the SAME numbers from the status store the
    Spark UI / REST API is served from — a pull, not a push, so there is
    no callback server on the hot path, it works with ``spark.ui.enabled=
    false``, and a missed poll can never lose a batch (the store retains
    ``spark.ui.retainedStages`` stages, default 1000).

    ``group`` restricts the snapshot to stages of jobs tagged with that
    job group (the per-output ``output_{name}`` tag).

    The status store is fed by Spark's ASYNCHRONOUS listener bus, so a
    snapshot taken right after an action returns can still miss the last
    task/stage-completed events; ``settle_secs`` bounds a short poll that
    waits until the selected stage set is NON-EMPTY, fully
    COMPLETE/FAILED, and stable across two reads separated by a sleep.
    An empty snapshot is treated as NOT settled (the job-start event may
    itself still be queued), so the vacuous ``all([])`` can never end
    the poll early — EXCEPT when the listener bus has provably DRAINED
    (``waitUntilEmpty`` returned) and the group still matches nothing:
    every delivered event is in the store, so the group genuinely never
    ran, and the call settles immediately instead of burning the full
    ``settle_secs`` (callers probing a group that may not have run can
    also just pass ``settle_secs=0``). Other jobs merely EXISTING in the
    store is not enough — that proves past delivery, not that this
    group's job-start event isn't still queued. The drained-and-empty
    early settle assumes a SYNCHRONOUS caller: the group's actions have
    already returned on THIS thread, so their JobStart events were
    posted before the drain check. A job submitted concurrently from
    ANOTHER thread may not have posted its JobStart yet when the bus
    drains — multi-threaded callers should poll again after their
    submitting threads have joined (or pass a positive ``settle_secs``
    and re-read) rather than trust one empty settle.
    """
    import time as _time

    deadline = _time.monotonic() + max(0.0, settle_secs)
    out = _stage_snapshot(spark, group)
    while True:
        legitimately_empty = (
            not out and group is not None
            and _listener_bus_drained(spark, deadline))
        settled = legitimately_empty or (bool(out) and all(
            r["status"] in ("COMPLETE", "FAILED") for r in out))
        if settled:
            _time.sleep(0.05)  # the confirming read must not be
            nxt = _stage_snapshot(spark, group)  # back-to-back
            if nxt == out:
                return out
            out = nxt
        if _time.monotonic() >= deadline:
            return out
        if not settled:
            _time.sleep(0.05)
            out = _stage_snapshot(spark, group)


def _listener_bus_drained(spark: SparkSession, deadline: float) -> bool:
    """True when every event posted to the listener bus so far has been
    delivered to the status store (bounded by the poll's own deadline;
    False on timeout or if the internal API moves)."""
    import time as _time

    budget_ms = max(1, int((deadline - _time.monotonic()) * 1000))
    try:
        spark.sparkContext._jsc.sc().listenerBus() \
            .waitUntilEmpty(min(budget_ms, 2000))  # type: ignore[attr-defined]
        return True
    except Exception:
        return False


def _stage_snapshot(spark: SparkSession,
                    group: str | None) -> list[dict[str, Any]]:
    jstore = spark.sparkContext._jsc.sc().statusStore()  # type: ignore[attr-defined]
    job_of_stage: dict[int, int] = {}
    if group is not None:
        # r12 (guide §1.2): resolve the group's job ids server-side —
        # one py4j call plus one per matching job — instead of walking
        # every retained job (spark.ui.retainedJobs caps it at 1000, so
        # a late-session snapshot paid ~4 py4j round trips per retained
        # job per call). Same AppStatusStore underneath, same rows out.
        tracker = spark.sparkContext.statusTracker()
        for jid in tracker.getJobIdsForGroup(group):
            jinfo = tracker.getJobInfo(jid)
            if jinfo is None:  # evicted from the store mid-snapshot
                continue
            for sid in jinfo.stageIds:
                job_of_stage[int(sid)] = int(jid)
    else:
        jobs = jstore.jobsList(None)
        for i in range(jobs.size()):
            j = jobs.apply(i)
            sids = j.stageIds()
            for k in range(sids.size()):
                sid = sids.apply(k)
                job_of_stage[sid] = j.jobId()
    out: list[dict[str, Any]] = []
    for sid in sorted(job_of_stage):
        try:
            sd = jstore.lastStageAttempt(sid)
        except Exception:  # skipped stage: no attempt data
            continue
        if str(sd.status()) == "SKIPPED":
            # a reused exchange/cached result: no tasks ran, no metrics —
            # the reference's onStageCompleted never fires for these
            continue
        row: dict[str, Any] = {
            "stageId": sid,
            "jobId": job_of_stage[sid],
            "name": sd.name(),
            "status": str(sd.status()),
        }
        for g in _STAGE_METRIC_GETTERS:
            row[g] = getattr(sd, g)()
        sub, comp = sd.submissionTime(), sd.completionTime()
        row["submissionTime"] = str(sub.get()) if sub.isDefined() else None
        row["completionTime"] = str(comp.get()) if comp.isDefined() else None
        out.append(row)
    return out


def log_stage_metrics(state: StateStore, name: str, spark: SparkSession, *,
                      group: str | None = None) -> int:
    """Persist a :func:`stage_metrics` snapshot to the task's StateStore
    logs (the reference persists its listener payload the same way,
    ``spark_listener.py:374-478``)."""
    return state.set(f"{name}_stage_metrics",
                     {"captured_at": time.time(), "group": group,
                      "stages": stage_metrics(spark, group=group)},
                     folder="state")


def write_event_log(state: StateStore, severity: str, message: str,
                    detail: dict | None = None) -> int:
    """Minimal event record (the reference's event bus severities
    CONTINUE/FAIL/STOP_WH_FAIL, ``core/schemas/event.py:6-104``)."""
    assert severity in ("CONTINUE", "FAIL", "STOP_WH_FAIL")
    return state.set(f"event_{uuid.uuid4().hex[:12]}",
                     {"severity": severity, "message": message,
                      "detail": detail or {}, "ts": time.time()},
                     folder="state")
