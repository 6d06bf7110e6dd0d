"""DAG runner, contract resolution, and observability tests."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from projectone_spark.observability import (
    capture_plan,
    job_group,
    log_plan,
    stream_metrics,
    write_event_log,
)
from projectone_spark.store import TableStore
from projectone_spark.store.state import StateStore
from projectone_spark.task.dag import (
    CycleError,
    PipelineRunner,
    TaskNode,
    load_pipeline,
    resolve_references,
)

SCHEMA = "id long, name string, offset long"
BASE = [(1, "a", 10), (2, "b", 20), (3, "c", 30)]


def _node(name, tmp_path, source_dir, depends_on=(), table=None, body=None):
    from projectone_spark.config import TaskConfig

    cfg = {
        "name": name,
        "inputs": [{"name": "src", "path": source_dir, "source": "parquet"}],
        "outputs": [{"name": "out", "table": table or name,
                     "write_type": "overwrite"}],
        "state_location": str(tmp_path / "state" / name),
        "store_location": str(tmp_path / "store"),
    }
    if body:
        cfg["execution"] = {"name": "fn", "body": body}
    return TaskNode(name=name, config=TaskConfig(**cfg),
                    depends_on=list(depends_on))


@pytest.fixture()
def source_dir(spark, tmp_path):
    d = str(tmp_path / "src")
    spark.createDataFrame(BASE, SCHEMA).write.parquet(d)
    return d


def test_dag_waves_and_dependencies(spark, tmp_path, source_dir):
    # c reads the table b wrote — order matters
    b_body = "def fn(src):\n    return src.limit(2)\n"
    nodes = [
        _node("a", tmp_path, source_dir),
        _node("b", tmp_path, source_dir, body=b_body),
        TaskNode(name="c", config=_node(
            "c", tmp_path,
            f"{tmp_path}/store:b", depends_on=["b"]).config,
            depends_on=["a", "b"]),
    ]
    nodes[2].config.inputs[0].source = "store"
    runs = PipelineRunner(spark).run(nodes)
    assert {n: r.status for n, r in runs.items()} == {
        "a": "SUCCESS", "b": "SUCCESS", "c": "SUCCESS"}
    store = TableStore(str(tmp_path / "store"))
    assert store.read(spark, "c").count() == 2  # saw b's limit(2) output


def test_dag_failure_skips_downstream(spark, tmp_path, source_dir):
    boom = "def fn(src):\n    raise RuntimeError('boom')\n"
    nodes = [
        _node("a", tmp_path, source_dir, body=boom),
        _node("b", tmp_path, source_dir, depends_on=["a"]),
        _node("c", tmp_path, source_dir, depends_on=["b"]),
        _node("d", tmp_path, source_dir),  # independent — still runs
    ]
    runs = PipelineRunner(spark).run(nodes)
    assert runs["a"].status == "FAILED" and "boom" in runs["a"].error
    assert runs["b"].status == "SKIPPED"
    assert runs["c"].status == "SKIPPED"
    assert runs["d"].status == "SUCCESS"


def test_dag_cycle_detection(spark, tmp_path, source_dir):
    nodes = [_node("a", tmp_path, source_dir, depends_on=["b"]),
             _node("b", tmp_path, source_dir, depends_on=["a"])]
    with pytest.raises(CycleError):
        PipelineRunner(spark).run(nodes)


def test_resolve_references_nested(monkeypatch):
    ctx = {"datasets": {"raw": {"tables": {"t1": "cat.raw.t1"}}},
           "tasks": {"x": {"out": "tbl"}}}
    monkeypatch.setenv("MY_ENV", "42")
    cfg = {"path": "${datasets.raw.tables.t1}",
           "mix": "pre-${MY_ENV}-post",
           "ref": "${tasks.x}"}
    out = resolve_references(cfg, ctx)
    assert out == {"path": "cat.raw.t1", "mix": "pre-42-post",
                   "ref": {"out": "tbl"}}
    with pytest.raises(KeyError):
        resolve_references("${nope.nope}", ctx)


def test_load_pipeline_contract(tmp_path, source_dir):
    contract = {
        "datasets": {"raw": {"tables": {"src": source_dir}}},
        "tasks": {
            "t1": {"task": {
                "inputs": [{"name": "src",
                            "path": "${datasets.raw.tables.src}",
                            "source": "parquet"}],
                "outputs": [{"name": "out", "table": "t1"}],
            }},
            "t2": {"depends_on": ["t1"], "task": {
                "inputs": [{"name": "src", "path": source_dir,
                            "source": "parquet"}],
                "outputs": [{"name": "out", "table": "t2"}],
            }},
        },
    }
    nodes = load_pipeline(contract)
    assert [n.name for n in nodes] == ["t1", "t2"]
    assert nodes[0].config.inputs[0].path == source_dir
    assert nodes[1].depends_on == ["t1"]


# -- observability ----------------------------------------------------------

def test_capture_and_log_plan(spark, tmp_path):
    df = spark.range(10).groupBy((F.col("id") % 2).alias("k")).count()
    plan = capture_plan(df)
    assert "HashAggregate" in plan or "Aggregate" in plan
    state = StateStore(str(tmp_path / "state"))
    log_plan(state, "q", df)
    assert "plan" in state.get_value("q_plan")


def test_job_group_scopes(spark):
    with job_group(spark, "output_x", "writing x"):
        spark.range(2).count()  # runs under the group; no exception → pass


def test_event_log_severities(tmp_path):
    state = StateStore(str(tmp_path / "state"))
    write_event_log(state, "CONTINUE", "all good", {"rows": 5})
    with pytest.raises(AssertionError):
        write_event_log(state, "NOT_A_SEVERITY", "x")


def test_stream_metrics_listener(spark, tmp_path):
    state = StateStore(str(tmp_path / "state"))
    src = str(tmp_path / "ev")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(src)
    with stream_metrics(spark, state):
        q = (spark.readStream.schema("id long, s string").parquet(src)
             .writeStream.format("memory").queryName("obs_q")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
    import time

    deadline = time.time() + 30
    while time.time() < deadline:
        keys = [k for k in state.keys() if "progress" in k or "started" in k]
        if keys:
            break
        time.sleep(0.5)
    assert keys, "listener persisted no stream state"


def test_pipeline_of_pipelines(spark, tmp_path, source_dir):
    """A nested pipeline runs as one composite node: downstream tasks wait
    for the WHOLE child pipeline, and a child failure skips them."""
    def task_json(name, body=None):
        cfg = {
            "name": name,
            "inputs": [{"name": "src", "path": source_dir,
                        "source": "parquet"}],
            "outputs": [{"name": "out", "table": name,
                         "write_type": "overwrite"}],
            "state_location": str(tmp_path / "state" / name),
            "store_location": str(tmp_path / "store"),
        }
        if body:
            cfg["execution"] = {"name": "fn", "body": body}
        return cfg

    contract = {
        "pipelines": {
            "child": {"tasks": {
                "c1": {"task": task_json("c1")},
                "c2": {"task": task_json("c2"), "depends_on": ["c1"]},
            }},
        },
        "tasks": {
            "ingest": {"task": task_json("ingest")},
            "nested": {"pipeline": "${pipelines.child}",
                       "depends_on": ["ingest"]},
            "final": {"task": task_json("final"), "depends_on": ["nested"]},
        },
    }
    nodes = load_pipeline(contract)
    runs = PipelineRunner(spark).run(nodes)
    assert {r.status for r in runs.values()} == {"SUCCESS"}
    assert set(runs["nested"].children) == {"c1", "c2"}
    store = TableStore(str(tmp_path / "store"))
    for t in ("ingest", "c1", "c2", "final"):
        assert store.read(spark, t).count() == 3

    # failing child → composite FAILED → downstream SKIPPED
    bad = {
        "pipelines": {"child": {"tasks": {
            "c1": {"task": task_json(
                "c1b", body="def fn(src):\n    raise RuntimeError('boom')")},
        }}},
        "tasks": {
            "nested": {"pipeline": "${pipelines.child}"},
            "final": {"task": task_json("final2"), "depends_on": ["nested"]},
        },
    }
    runs = PipelineRunner(spark).run(load_pipeline(bad))
    assert runs["nested"].status == "FAILED"
    assert "c1" in runs["nested"].error
    assert runs["final"].status == "SKIPPED"


def test_tasknode_validation():
    with pytest.raises(ValueError, match="exactly one"):
        TaskNode(name="x")


def test_format_environment_variables_local_wins():
    """Reference framework/contract/env semantics: ${VAR} patterns format
    from explicit maps with local overriding global; unknown variables pass
    through unchanged; the real process environment is never consulted."""
    from projectone_spark.task.dag import format_environment_variables

    src = {"table": "trade", "schema": "bronze",
           "catalog": "${CATALOG}",
           "location": "${ROOT_FILE_LOCATION}/${CATALOG}",
           "comment": "${COMMENT}",
           "unknown": "${NOT_SET}"}
    got = format_environment_variables(
        src,
        local_env={"CATALOG": "dev", "ROOT_FILE_LOCATION": "testlocation"},
        global_env={"CATALOG": "prod", "COMMENT": "Testing Purposes"})
    assert got["catalog"] == "dev"
    assert got["location"] == "testlocation/dev"
    assert got["comment"] == "Testing Purposes"
    assert got["unknown"] == "${NOT_SET}"
    assert got["table"] == "trade"


def test_format_environment_variables_keeps_types():
    from projectone_spark.task.dag import format_environment_variables

    got = format_environment_variables(
        {"n": 3, "nested": [{"v": "${X}"}], "obj": "${OBJ}"},
        local_env={"X": "x", "OBJ": {"a": 1}})
    assert got["n"] == 3
    assert got["nested"] == [{"v": "x"}]
    assert got["obj"] == {"a": 1}  # whole-string reference keeps the type


def test_subprocess_isolation_task(spark, tmp_path):
    """Reference isolation parity (local.py:242-430): a TaskNode with
    isolation='subprocess' runs as `python -m projectone_spark.task.cli
    run` in a child process with its own session; the written table is
    visible to the parent afterwards, and a failing child marks
    downstream tasks SKIPPED like any other failure."""
    from projectone_spark.store import TableStore
    from projectone_spark.task import SparkTask
    from projectone_spark.task.dag import PipelineRunner, TaskNode

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, 10), (2, 20), (3, 30)],
                          "id long, v long").write.parquet(src)
    ok = (SparkTask.builder
          .setName("sub_ok")
          .setInput(name="src", path=src, source="parquet",
                    read_options={"filter": "v >= 20"})
          .setOutput(name="out", table="t_sub", write_type="overwrite")
          .setStateLocation(str(tmp_path / "state"))
          .setStoreLocation(str(tmp_path / "store"))
          .create())
    bad = (SparkTask.builder
           .setName("sub_bad")
           .setInput(name="src", path=str(tmp_path / "missing"),
                     source="parquet")
           .setOutput(name="out", table="t_bad", write_type="overwrite")
           .setStateLocation(str(tmp_path / "state"))
           .setStoreLocation(str(tmp_path / "store"))
           .create())
    down = (SparkTask.builder
            .setName("downstream")
            .setInput(name="src", path=src, source="parquet")
            .setOutput(name="out", table="t_down", write_type="overwrite")
            .setStateLocation(str(tmp_path / "state"))
            .setStoreLocation(str(tmp_path / "store"))
            .create())
    import glob
    import os
    import tempfile

    cfg_glob = os.path.join(tempfile.gettempdir(), "po_task_*")
    before = set(glob.glob(cfg_glob))
    runs = PipelineRunner(spark).run([
        TaskNode("sub_ok", ok.config, isolation="subprocess"),
        TaskNode("sub_bad", bad.config, isolation="subprocess"),
        TaskNode("downstream", down.config, depends_on=["sub_bad"]),
    ])
    assert runs["sub_ok"].status == "SUCCESS"
    assert runs["sub_bad"].status == "FAILED" and runs["sub_bad"].error
    assert runs["downstream"].status == "SKIPPED"
    got = TableStore(str(tmp_path / "store")).read(spark, "t_sub")
    assert sorted(r["id"] for r in got.collect()) == [2, 3]
    # r5 advice: the serialized config (which may carry plaintext secrets)
    # must not persist in shared temp space after the child exits
    leftovers = sorted(set(glob.glob(cfg_glob)) - before)
    assert leftovers == [], leftovers
