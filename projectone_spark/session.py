"""SparkSession construction with scale-appropriate defaults.

The reference builds its session at ``core/task/spark/task.py:274-278`` with a
plain config map. Here we centralize the configs that matter for a large
cluster (AQE, skew handling, partition sizing, Arrow) so every entry point
(tests, bench, driver harness) gets the same tuned session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for 100 TB-scale behavior: AQE re-plans at runtime
#: (coalesce small partitions, convert to broadcast joins, split skewed
#: partitions); Arrow keeps any pandas exchange vectorized; UTC avoids
#: session-timezone drift between engines.
DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Local runs: keep the shuffle fan-out equal to cores. On a real cluster
    # AQE coalescing makes a high initial number safe; expose via env.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MiB scan splits
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(app_name: str = "projectone_spark", extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    confs = dict(DEFAULT_CONFS)
    if extra_conf:
        confs.update(extra_conf)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


_SCRATCH_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh scratch directory under one process-scoped root that is
    removed at interpreter exit.

    Query functions and tests materialize store tables / checkpoints /
    staging files in scratch space; raw ``tempfile.mkdtemp`` calls leak
    one directory per invocation into /tmp forever (the driver and bench
    harness re-run every query each round). Routing them through a single
    atexit-reaped root bounds the footprint to one process lifetime while
    keeping each invocation's directory fresh (store commit logs must not
    collide across invocations).
    """
    global _SCRATCH_ROOT
    import atexit
    import shutil
    import tempfile

    if _SCRATCH_ROOT is None or not os.path.isdir(_SCRATCH_ROOT):
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="po_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable defaults to an existing session.

    The driver harness constructs its own SparkSession; this applies the
    settings that are safe to change post-start (timezone, AQE, shuffle
    partitions) so query semantics match ``get_spark`` sessions.
    """
    for k, v in DEFAULT_CONFS.items():
        if k.startswith(("spark.sql.",)):
            try:
                spark.conf.set(k, v)
            except Exception:  # pragma: no cover - static confs raise post-start
                pass
    return spark


def release_checkpoint(df) -> None:
    """Free the block-manager storage behind a ``localCheckpoint``-ed
    DataFrame.

    ``DataFrame.unpersist()`` only talks to the SQL cache manager, which
    never registered a local checkpoint (its blocks live at RDD level), so
    it is a silent no-op here — verified against Spark 4.1. Iterative
    operators that re-checkpoint per round (BPE merge training, label
    propagation) would otherwise retain every round's copy for the life of
    the session. This digs the checkpointed RDD out of the plan's
    ``LogicalRDD`` node and unpersists it directly.

    Only call this once nothing will read the frame again: the checkpoint
    truncated its lineage, so the data is unrecoverable afterwards.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:  # pragma: no cover - best-effort release
        pass
