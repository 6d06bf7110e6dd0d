"""Query registry — the driver-facing inventory of implemented operators.

Each entry pairs a Spark DataFrame implementation with (where expressible) a
DuckDB-dialect oracle SQL string computing the identical result on the same
parquet tables. The driver's correctness gate runs both at sf=0.01 and
hash-compares values, so:

- every computed column is aliased identically in both engines,
- doubles are rounded to fixed decimals in both engines,
- orderings that feed a LIMIT carry explicit tie-breaks,
- timestamps are emitted at microsecond precision in both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None for non-SQL-expressible ops
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = True  # include in bench.py timing loop


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = (),
             bench: bool = True):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc,
                                   tags=tags, bench=bench)
        return fn

    return wrap


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Scan one driver-provided parquet table (column pruning/pushdown apply).

    Applies the engine's runtime confs (UTC session timezone, AQE) so results
    are identical no matter which session invokes the query, and handles the
    `events` table's nanosecond timestamps (Spark has no TIMESTAMP(NANOS)
    reader: read ns-as-long, truncate to micros exactly like DuckDB does).
    """
    from projectone_spark.session import configure

    configure(spark)
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            import pyspark.sql.functions as F

            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def _ensure_loaded() -> None:
    """Import all query modules so their @register calls have run."""
    from projectone_spark.queries import (  # noqa: F401
        analytics,
        analytics2,
        dedup,
        embeddings,
        engine_ops,
        multimodal,
        sampling,
        streaming,
        text,
    )


__all__ = ["QuerySpec", "REGISTRY", "register", "load", "queries", "oracle_sql"]
