"""SparkTask end-to-end tests: the reference's integration-test shape
(``tests/integration_tests/test_batch.py``) — write a synthetic source, run
the task, read the target back — plus execution-function machinery, feature
pipeline, interpolation, and config validation."""

from __future__ import annotations

import textwrap

import pyspark.sql.functions as F
import pytest

from projectone_spark.config import TaskConfig
from projectone_spark.features import DictSecretManager, interpolate
from projectone_spark.store import TableStore
from projectone_spark.task import SparkTask, task_builder
from projectone_spark.task.execution_fn import (
    ExecutionFunctionError,
    bind_arguments,
    load_function,
    validate_outputs,
)

BASE = [(1, "a", 10), (2, "b", 20), (3, "c", 30),
        (4, "d", 40), (5, "e", 50), (6, "f", 60)]
SCHEMA = "id long, name string, offset long"


@pytest.fixture()
def source_dir(spark, tmp_path):
    d = str(tmp_path / "src")
    spark.createDataFrame(BASE, SCHEMA).write.parquet(d)
    return d


def _base_task(spark, tmp_path, source_dir, **extra):
    b = (SparkTask.builder
         .setName("t1")
         .setInput(name="src", path=source_dir, source="parquet")
         .setOutput(name="out", table="target", write_type="append")
         .setStateLocation(str(tmp_path / "state"))
         .setStoreLocation(str(tmp_path / "store"))
         .setSession(spark))
    return b


def test_identity_passthrough_append(spark, tmp_path, source_dir):
    task = _base_task(spark, tmp_path, source_dir).create()
    results = task.execute()
    assert all(r.status == "success" for r in results)
    got = TableStore(str(tmp_path / "store")).read(spark, "target")
    assert got.count() == 6
    assert "__metadata_valid_to_ts__" in got.columns
    # sink state recorded (reference write-state persistence)
    assert task.state.get_value("out_write", folder="sink")["version"] == 0


def test_execution_body_function(spark, tmp_path, source_dir):
    body = textwrap.dedent("""
        import pyspark.sql.functions as F
        def double_offset(src, factor=2):
            return src.withColumn("offset", F.col("offset") * factor)
    """)
    task = (_base_task(spark, tmp_path, source_dir)
            .setExecution(name="double_offset", body=body,
                          extra_arguments={"factor": 3})
            .create())
    task.execute()
    got = TableStore(str(tmp_path / "store")).read(spark, "target")
    assert sorted(r["offset"] for r in got.collect()) == [30, 60, 90, 120, 150, 180]


def test_input_filter_and_features(spark, tmp_path, source_dir):
    b = (SparkTask.builder
         .setName("t2")
         .setInput(name="src", path=source_dir, source="parquet",
                   read_options={"filter": "offset >= {{Lo}}"},
                   features=[{"name": "select_columns", "columns": "id, offset"}])
         .setOutput(name="out", table="target", write_type="overwrite")
         .setStateLocation(str(tmp_path / "state"))
         .setStoreLocation(str(tmp_path / "store"))
         .setSession(spark))
    task = b.create()
    task._variables = lambda: {"Lo": 40}  # stand-in refresh window variable
    task.execute()
    got = TableStore(str(tmp_path / "store")).read(spark, "target")
    assert got.count() == 3
    assert set(got.columns) == {"id", "offset", "__metadata_valid_to_ts__"}


def test_cdc_two_run_incremental(spark, tmp_path, source_dir):
    def mk():
        return (SparkTask.builder
                .setName("t3")
                .setInput(name="src", path=source_dir, source="parquet",
                          cdc={"attribute": "offset"})
                .setOutput(name="out", table="target", write_type="append")
                .setRefreshPolicy(type="incremental")
                .setStateLocation(str(tmp_path / "state"))
                .setStoreLocation(str(tmp_path / "store"))
                .setSession(spark)
                .create())

    mk().execute()
    store = TableStore(str(tmp_path / "store"))
    assert store.read(spark, "target").count() == 6

    # second run, no new data → appends nothing
    mk().execute()
    assert store.read(spark, "target").count() == 6

    # new rows arrive → only they are read
    spark.createDataFrame([(7, "g", 70)], SCHEMA) \
        .write.mode("append").parquet(source_dir)
    mk().execute()
    got = store.read(spark, "target")
    assert got.count() == 7
    assert got.filter("offset = 70").count() == 1


def test_scd1_write_type_through_task(spark, tmp_path, source_dir):
    def mk(path):
        return (SparkTask.builder
                .setName("t4")
                .setInput(name="src", path=path, source="parquet")
                .setOutput(name="out", table="target", write_type="scd1",
                           write_options={"key_attributes": "id"})
                .setStateLocation(str(tmp_path / "state"))
                .setStoreLocation(str(tmp_path / "store"))
                .setSession(spark)
                .create())

    mk(source_dir).execute()
    d2 = str(tmp_path / "src2")
    spark.createDataFrame([(2, "b", 99), (7, "g", 70)], SCHEMA).write.parquet(d2)
    mk(d2).execute()
    got = TableStore(str(tmp_path / "store")).read(spark, "target")
    assert got.count() == 7
    assert got.filter("id = 2").collect()[0]["offset"] == 99


def test_failed_step_produces_result_envelope(spark, tmp_path, source_dir):
    task = (_base_task(spark, tmp_path, source_dir)
            .setExecution(name="boom", body="def boom(src):\n    raise RuntimeError('x')")
            .create())
    with pytest.raises(RuntimeError):
        task.execute()
    failed = [r for r in task.results if r.status == "failed"]
    assert len(failed) == 1 and "RuntimeError" in failed[0].exception


def test_stream_consistency_validation():
    with pytest.raises(ValueError, match="refresh_policy"):
        TaskConfig(name="bad",
                   inputs=[{"name": "s", "path": "/x", "source_extract_type": "stream"}],
                   outputs=[{"name": "o"}])


def test_observe_stages_rejected_for_stream_tasks():
    # only the batch write path snapshots stage metrics; a stream task
    # asking for them must fail loudly, not silently skip the snapshots
    with pytest.raises(ValueError, match="observe_stages"):
        TaskConfig(name="bad",
                   inputs=[{"name": "s", "path": "/x",
                            "source_extract_type": "stream"}],
                   outputs=[{"name": "o"}],
                   refresh_policy={"type": "stream"},
                   observe_stages=True)


def test_builder_class_access():
    assert isinstance(SparkTask.builder, SparkTask.Builder)
    assert isinstance(task_builder(), SparkTask.Builder)


# -- execution_fn unit tests ------------------------------------------------

def test_load_function_from_file(tmp_path):
    f = tmp_path / "fn.py"
    f.write_text("def t(df):\n    return df\n")
    assert callable(load_function("t", file=str(f)))


def test_load_function_missing_raises():
    with pytest.raises(ExecutionFunctionError):
        load_function("nope", body="x = 1")


def test_bind_arguments_by_name(spark):
    df = spark.range(1)

    def fn(src, factor, opt=5):
        return src

    bound = bind_arguments(fn, {"src": df}, {"factor": 2})
    assert bound == {"src": df, "factor": 2}
    with pytest.raises(ExecutionFunctionError, match="factor"):
        bind_arguments(fn, {"src": df}, {})


def test_validate_outputs(spark):
    df = spark.range(1)
    assert validate_outputs(df, ["a"]) == {"a": df}
    assert validate_outputs({"a": df, "b": df}, ["a", "b"])["b"] is df
    with pytest.raises(ExecutionFunctionError):
        validate_outputs(df, ["a", "b"])
    with pytest.raises(ExecutionFunctionError):
        validate_outputs({"a": 1}, ["a"])


# -- interpolation ----------------------------------------------------------

def test_interpolate_nested_and_secrets():
    secrets = DictSecretManager({"scope": {"pw": "s3cret"}})
    cfg = {"url": "jdbc://{{scope/pw}}@host", "window": ["{{RangeStart}}"],
           "n": 7}
    out = interpolate(cfg, {"RangeStart": "2024-01-01"}, secrets)
    assert out == {"url": "jdbc://s3cret@host", "window": ["2024-01-01"], "n": 7}


def test_interpolate_unresolvable_raises():
    with pytest.raises(KeyError):
        interpolate("{{missing}}", {}, None)


def test_stream_task_scd1_end_to_end(spark, tmp_path, source_dir):
    """Reference test_stream.py shape: stream source → foreachBatch scd1."""
    task = (SparkTask.builder
            .setName("t5")
            .setInput(name="src", path=source_dir, source="parquet",
                      source_extract_type="stream",
                      read_options={"source_schema": SCHEMA})
            .setOutput(name="out", table="target", write_type="scd1",
                       write_options={"key_attributes": "id"})
            .setRefreshPolicy(type="stream")
            .setStateLocation(str(tmp_path / "state"))
            .setStoreLocation(str(tmp_path / "store"))
            .setSession(spark)
            .create())
    results = task.stream_process(timeout_seconds=300)
    assert all(r.status == "success" for r in results)
    got = TableStore(str(tmp_path / "store")).read(spark, "target")
    assert got.count() == 6
    # checkpoint written under the state location (reference default)
    import os

    assert os.path.isdir(str(tmp_path / "state" / "checkpoints" / "out"))


def test_rolling_refresh_window(spark, tmp_path, source_dir):
    """Reference context.get_range_values: run 1 opens the window at
    start_value and closes at now; run 2 opens exactly where run 1 closed
    (persisted pipeline_load_timestamp)."""
    def make():
        return (SparkTask.builder
                .setName("roll")
                .setInput(name="src", path=source_dir, source="parquet")
                .setOutput(name="out", table="t", write_type="overwrite")
                .setStateLocation(str(tmp_path / "state"))
                .setStoreLocation(str(tmp_path / "store"))
                .setRefreshPolicy(type="incremental",
                                  start_value="2024-01-01T00:00:00")
                .setSession(spark).create())

    t1 = make()
    assert all(r.status == "success" for r in t1.execute())
    rp1 = t1.config.refresh_policy
    assert rp1.range_start == "2024-01-01T00:00:00"
    assert rp1.range_end > "2025"  # now, formatted %Y-%m-%dT%H:%M:%S
    saved = t1.state.get_value("pipeline_load_timestamp")
    assert saved["end_date"] == rp1.range_end

    t2 = make()
    assert all(r.status == "success" for r in t2.execute())
    rp2 = t2.config.refresh_policy
    assert rp2.range_start == rp1.range_end  # rolls forward
    assert rp2.range_end >= rp2.range_start


def test_backfill_range_is_explicit(spark, tmp_path, source_dir):
    task = (SparkTask.builder
            .setName("bf")
            .setInput(name="src", path=source_dir, source="parquet")
            .setOutput(name="out", table="t", write_type="overwrite")
            .setStateLocation(str(tmp_path / "state"))
            .setStoreLocation(str(tmp_path / "store"))
            .setRefreshPolicy(type="backfill",
                              start_value="2020-01-01T00:00:00",
                              end_value="2020-06-30T00:00:00")
            .setSession(spark).create())
    assert all(r.status == "success" for r in task.execute())
    rp = task.config.refresh_policy
    assert (rp.range_start, rp.range_end) == ("2020-01-01T00:00:00",
                                              "2020-06-30T00:00:00")


def test_scratch_dirs_share_one_reaped_root():
    """r5 advice: all query/stream scratch lives under ONE process-scoped
    root (registered for atexit removal), so repeated harness runs cannot
    accumulate unbounded /tmp data; each call still gets a fresh dir."""
    import os

    from projectone_spark import session as s

    a = s.scratch_dir("po_probe_a_")
    b = s.scratch_dir("po_probe_b_")
    assert a != b and os.path.isdir(a) and os.path.isdir(b)
    assert os.path.dirname(a) == os.path.dirname(b) == s._SCRATCH_ROOT
    assert os.path.basename(s._SCRATCH_ROOT).startswith("po_scratch_")


def test_stage_metrics_persisted_per_output(spark, tmp_path, source_dir):
    """observe_stages: a batch write persists the reference's per-stage
    task metrics (run/CPU time, shuffle bytes, spill, peak memory —
    spark_listener.py:99-180) to the task's state logs, scoped to the
    output's job group."""
    task = (_base_task(spark, tmp_path, source_dir)
            .setObserveStages()
            .create())
    results = task.execute()
    assert all(r.status == "success" for r in results)

    snap = task.state.get_value("out_stage_metrics")
    assert snap and snap["group"] == f"output_out_{task.batch_id}"
    stages = snap["stages"]
    assert stages, "no stages captured for the output job group"
    required = {"stageId", "jobId", "name", "status", "numTasks",
                "executorRunTime", "executorCpuTime", "jvmGcTime",
                "memoryBytesSpilled", "diskBytesSpilled",
                "peakExecutionMemory", "inputBytes", "inputRecords",
                "outputBytes", "outputRecords", "shuffleReadBytes",
                "shuffleWriteBytes"}
    for st in stages:
        assert required <= set(st)
        assert st["status"] in ("COMPLETE", "FAILED")  # SKIPPED filtered
        assert st["numTasks"] > 0
    assert any(st["status"] == "COMPLETE" for st in stages)
    # the write moved real rows: some stage read the 6-row source
    assert any(st["inputRecords"] > 0 or st["outputRecords"] > 0
               for st in stages)


def test_stage_metrics_group_scoping(spark):
    """stage_metrics(group=...) only reports stages of jobs tagged with
    that job group; other groups' stages stay invisible."""
    from projectone_spark.observability import job_group, stage_metrics

    with job_group(spark, "grp_a"):
        spark.range(100000).selectExpr("id % 5 k", "id v") \
            .groupBy("k").count().collect()
    with job_group(spark, "grp_b"):
        spark.range(1000).count()
    a = stage_metrics(spark, group="grp_a")
    b = stage_metrics(spark, group="grp_b")
    assert a and b
    assert {s["stageId"] for s in a}.isdisjoint({s["stageId"] for s in b})
    # the grouped agg in grp_a shuffled; its metrics must say so
    assert any(s["shuffleReadBytes"] > 0 for s in a)


def test_stage_metrics_unmatched_group_settles_early(spark):
    """A group that matched no jobs must return [] without burning the
    whole settle budget: once the listener bus has provably drained, the
    emptiness is legitimate, not an async-listener race (r6 ADVICE)."""
    import time

    from projectone_spark.observability import stage_metrics

    spark.range(10).count()  # ensure the status store is non-empty
    t0 = time.monotonic()
    out = stage_metrics(spark, group="grp_that_never_ran", settle_secs=30.0)
    dt = time.monotonic() - t0
    assert out == []
    assert dt < 5.0, f"empty-group call burned {dt:.1f}s of settle budget"
