"""CLI entry: run or validate a task/pipeline config from JSON.

Reference surface (``core/task/cli.py:64-94``, ``core/task/spark/cli.py:
124-205``): ``python -m projectone_spark.task.cli run -c task.json``
parses the JSON into the typed config (pydantic errors reported cleanly),
builds the SparkTask, and executes. ``pipeline`` runs a DAG contract via
the wave scheduler; ``validate`` stops after config validation — the
framework's pre-deploy check.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _validate_task(raw: dict):
    from pydantic import ValidationError

    from projectone_spark.config import TaskConfig

    try:
        return TaskConfig(**raw)
    except ValidationError as e:
        for err in e.errors():
            loc = ".".join(str(p) for p in err["loc"])
            print(f"config error at {loc}: {err['msg']}", file=sys.stderr)
        raise SystemExit(2) from None


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="projectone_spark.task")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for cmd in ("run", "validate", "pipeline"):
        p = sub.add_parser(cmd)
        p.add_argument("-c", "--config", required=True,
                       help="task (run/validate) or pipeline contract JSON")
    args = ap.parse_args(argv)
    raw = _load(args.config)

    if args.cmd == "validate":
        _validate_task(raw)
        print("config valid")
        return 0

    if args.cmd == "run":
        from projectone_spark.task import SparkTask

        cfg = _validate_task(raw)
        results = SparkTask(cfg).execute()
        for r in results:
            print(f"{r.name}: {r.status}")
        return 0 if all(r.status == "success" for r in results) else 1

    # pipeline
    from projectone_spark.task.dag import PipelineRunner, load_pipeline

    nodes = load_pipeline(raw)
    runs = PipelineRunner().run(nodes)
    worst = 0
    for name in sorted(runs):
        r = runs[name]
        print(f"{name}: {r.status}" + (f" ({r.error})" if r.error else ""))
        worst = max(worst, 0 if r.status == "SUCCESS" else 1)
    return worst


if __name__ == "__main__":
    raise SystemExit(main())
