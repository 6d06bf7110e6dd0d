"""Pipeline DAG runner + contract reference resolution (framework layer).

Re-expresses the reference's local runner (``framework/runner/local.py:23,
101-150, 242-430``): tasks declare ``depends_on``; scheduling is
topological waves; a failed dependency marks all downstream tasks SKIPPED.

Differences from the reference (deliberate): tasks run in THREADS sharing
one SparkSession instead of subprocess-per-task — Spark schedules jobs
from concurrent driver threads onto the same executors (FAIR pool ready),
so a 40-task pipeline keeps the cluster saturated without 40 driver JVMs.
The reference's worker sizing (2/3 of cpus) is kept as the default.

Contract references (``framework/contract/config/__init__.py:28-32``):
``${datasets.<schema>.tables.<t>}``, ``${tasks.<t>}``, and ``${ENV_VAR}``
resolve recursively over the pipeline JSON before task construction.
"""

from __future__ import annotations

import os
import re
import time
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from projectone_spark.config import TaskConfig
from projectone_spark.task import SparkTask


@dataclass
class TaskNode:
    name: str
    config: TaskConfig | None = None
    depends_on: list[str] = field(default_factory=list)
    #: pipeline-of-pipelines (reference ``spark_pipeline_task``,
    #: ``core/schemas/deploy.py:158-183``): a node may BE a nested
    #: pipeline; it runs as one unit and succeeds iff every inner task does
    subtasks: list["TaskNode"] | None = None
    #: "thread" (default — shared session, the scale path) or
    #: "subprocess" — the reference's isolation mode (``local.py:242-430``:
    #: each task a ``python -m ...task.cli run`` child process with its own
    #: session); use it for tasks that must not share JVM/session state
    #: (conflicting spark confs, native-library crashes, memory isolation)
    isolation: str = "thread"

    def __post_init__(self):
        if (self.config is None) == (self.subtasks is None):
            raise ValueError(
                f"task '{self.name}' needs exactly one of config/subtasks")
        if self.isolation not in ("thread", "subprocess"):
            raise ValueError(
                f"task '{self.name}': isolation must be 'thread' or "
                f"'subprocess', got {self.isolation!r}")
        if self.isolation == "subprocess" and self.subtasks is not None:
            raise ValueError(
                f"task '{self.name}': a nested pipeline cannot run as a "
                f"single subprocess — set isolation on its leaf tasks")


@dataclass
class TaskRun:
    name: str
    status: str  # SUCCESS | FAILED | SKIPPED
    error: str | None = None
    start_time: float = 0.0
    end_time: float = 0.0
    children: dict[str, "TaskRun"] | None = None


class CycleError(ValueError):
    pass


def _toposort(nodes: dict[str, TaskNode]) -> None:
    seen: dict[str, int] = {}

    def visit(n: str, stack: tuple[str, ...]) -> None:
        if seen.get(n) == 2:
            return
        if n in stack:
            raise CycleError(f"dependency cycle: {' -> '.join(stack)} -> {n}")
        seen[n] = 1
        for d in nodes[n].depends_on:
            if d not in nodes:
                raise ValueError(f"task '{n}' depends on unknown task '{d}'")
            visit(d, (*stack, n))
        seen[n] = 2

    for name in nodes:
        visit(name, ())


class PipelineRunner:
    """Wave-scheduled DAG execution over a shared SparkSession."""

    def __init__(self, spark: SparkSession | None = None,
                 max_workers: int | None = None):
        self.spark = spark
        self.max_workers = max_workers or max(1, (os.cpu_count() or 3) * 2 // 3)

    def run(self, tasks: list[TaskNode]) -> dict[str, TaskRun]:
        nodes = {t.name: t for t in tasks}
        _toposort(nodes)
        runs: dict[str, TaskRun] = {}
        pending = dict(nodes)
        futures = {}

        def ready(t: TaskNode) -> bool:
            return all(d in runs for d in t.depends_on)

        def deps_ok(t: TaskNode) -> bool:
            return all(runs[d].status == "SUCCESS" for d in t.depends_on)

        def execute(t: TaskNode) -> TaskRun:
            run = TaskRun(t.name, "SUCCESS", start_time=time.time())
            try:
                if t.subtasks is not None:
                    inner = PipelineRunner(self.spark,
                                           self.max_workers).run(t.subtasks)
                    run.children = inner
                    failed = [n for n, r in inner.items()
                              if r.status != "SUCCESS"]
                    if failed:
                        run.status = "FAILED"
                        run.error = f"nested tasks failed: {sorted(failed)}"
                elif t.isolation == "subprocess":
                    _run_subprocess_task(t, run)
                else:
                    SparkTask(t.config, self.spark).execute()
            except Exception as e:  # noqa: BLE001 - recorded, not swallowed
                run.status = "FAILED"
                run.error = f"{type(e).__name__}: {e}"
            run.end_time = time.time()
            return run

        with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
            while pending or futures:
                for name in [n for n, t in pending.items() if ready(t)]:
                    t = pending.pop(name)
                    if not deps_ok(t):
                        # reference: failed dependency → downstream skipped
                        runs[name] = TaskRun(name, "SKIPPED",
                                             error="upstream dependency failed")
                        continue
                    futures[pool.submit(execute, t)] = name
                if futures:
                    done, _ = wait(list(futures), return_when=FIRST_COMPLETED)
                    for f in done:
                        runs[futures.pop(f)] = f.result()
        return runs


def _run_subprocess_task(t: TaskNode, run: "TaskRun") -> None:
    """The reference's isolation mode: the task config round-trips through
    JSON and runs as ``python -m projectone_spark.task.cli run -c <file>``
    in a child process with its own SparkSession (``local.py:242-430``).
    Stdout/stderr are captured into the TaskRun on failure."""
    import json
    import subprocess
    import sys
    import tempfile

    # The serialized config includes TaskConfig.secrets in plaintext, so the
    # file must be 0600 from birth (mkstemp, not mktemp — no TOCTOU window,
    # no world-readable default) and must not outlive the child process.
    fd, cfg_path = tempfile.mkstemp(prefix=f"po_task_{t.name}_",
                                    suffix=".json")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(t.config.model_dump(mode="json"), f)
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env = dict(os.environ)
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, "-m", "projectone_spark.task.cli", "run",
             "-c", cfg_path],
            capture_output=True, text=True, env=env)
    finally:
        try:
            os.unlink(cfg_path)
        except OSError:
            pass
    if proc.returncode != 0:
        run.status = "FAILED"
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-15:]
        run.error = (f"subprocess task exited {proc.returncode}: "
                     + " | ".join(tail))


# -- contract reference resolution ------------------------------------------

_REF = re.compile(r"\$\{([^}]+)\}")


def resolve_references(value: Any, context: dict[str, Any]) -> Any:
    """Resolve ``${dotted.path}`` against ``context`` (nested dicts), then
    ``${ENV_VAR}`` against the environment; whole-string references keep
    the referent's type (a dict reference stays a dict)."""
    if isinstance(value, str):
        whole = _REF.fullmatch(value.strip())
        if whole:
            return _lookup(whole.group(1), context)
        return _REF.sub(lambda m: str(_lookup(m.group(1), context)), value)
    if isinstance(value, dict):
        return {k: resolve_references(v, context) for k, v in value.items()}
    if isinstance(value, list):
        return [resolve_references(v, context) for v in value]
    return value


def _lookup(path: str, context: dict[str, Any]) -> Any:
    cur: Any = context
    for part in path.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            cur = None
            break
    if cur is not None:
        return cur
    if path in os.environ:
        return os.environ[path]
    raise KeyError(f"unresolvable contract reference: ${{{path}}}")


def format_environment_variables(source_object: Any,
                                 local_env: dict[str, Any] | None = None,
                                 global_env: dict[str, Any] | None = None
                                 ) -> Any:
    """Substitute ``${VAR}`` patterns in a contract object from explicit
    variable maps, LOCAL overriding GLOBAL — the framework's environment
    formatting pass (reference
    ``framework/contract/env.format_environment_variables``; pipeline
    contracts carry ``${CATALOG}``-style knobs resolved per deploy target).
    Unlike :func:`resolve_references` this never falls back to the real
    process environment: a deploy formats against its own variable set.
    """
    merged = {**(global_env or {}), **(local_env or {})}

    def fmt(value: Any) -> Any:
        if isinstance(value, str):
            whole = _REF.fullmatch(value.strip())
            if whole and whole.group(1) in merged:
                return merged[whole.group(1)]
            return _REF.sub(
                lambda m: str(merged.get(m.group(1), m.group(0))), value)
        if isinstance(value, dict):
            return {k: fmt(v) for k, v in value.items()}
        if isinstance(value, list):
            return [fmt(v) for v in value]
        return value

    return fmt(source_object)


def load_pipeline(contract: dict[str, Any],
                  *, context: dict[str, Any] | None = None) -> list[TaskNode]:
    """Parse a pipeline contract::

        {"datasets": {...}, "tasks": {name: {"depends_on": [...],
                                             "task": {<TaskConfig json>}}}}

    ``datasets`` (and anything else top-level) is reference context for
    ``${...}`` resolution inside each task config.
    """
    ctx = {**contract, **(context or {})}
    nodes = []
    for name, spec in contract["tasks"].items():
        deps = list(spec.get("depends_on", []))
        if "pipeline" in spec:
            # pipeline-of-pipelines: the value is a nested pipeline
            # contract (usually via ``${pipelines.<name>}``); it becomes
            # one composite node
            sub_contract = resolve_references(spec["pipeline"], ctx)
            nodes.append(TaskNode(name=name, depends_on=deps,
                                  subtasks=load_pipeline(sub_contract,
                                                         context=ctx)))
            continue
        raw = resolve_references(spec.get("task", {}), ctx)
        raw.setdefault("name", name)
        nodes.append(TaskNode(name=name, config=TaskConfig(**raw),
                              depends_on=deps))
    return nodes
