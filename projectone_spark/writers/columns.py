"""Write-side column features: generated columns, identity columns,
defaults — the reference's Delta column extras
(``core/utils/delta.py:12-45``) re-expressed as pure DataFrame transforms
applied at write time.
"""

from __future__ import annotations

from collections.abc import Mapping

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from projectone_spark.config.data_objects import Table


def apply_generated_columns(df: DataFrame,
                            exprs: Mapping[str, str]) -> DataFrame:
    """``col ← SQL expr over the row`` (reference applies generation
    expressions inside merge inserts, ``write.py:271, 503, 977``)."""
    for name, expr in exprs.items():
        df = df.withColumn(name, F.expr(expr))
    return df


def apply_defaults(df: DataFrame, defaults: Mapping[str, object]) -> DataFrame:
    """Fill NULLs with declared column defaults
    (``delta.feature.allowColumnDefaults`` analogue)."""
    for name, value in defaults.items():
        if name in df.columns:
            df = df.withColumn(name, F.coalesce(F.col(name), F.lit(value)))
        else:
            df = df.withColumn(name, F.lit(value))
    return df


def apply_identity(df: DataFrame, col: str, *, start: int = 1, step: int = 1,
                   existing_max: int | None = None) -> DataFrame:
    """Distributed identity assignment: unique, increasing, step-aligned —
    the same guarantees Delta identity columns give (uniqueness and
    monotonicity, NOT contiguity). ``monotonically_increasing_id`` is
    per-partition monotonic with a 33-bit intra-partition range, so values
    are unique without any shuffle or driver coordination; new batches
    offset past the current table max."""
    base = start if existing_max is None else existing_max + step
    return df.withColumn(
        col, (F.monotonically_increasing_id() * step + F.lit(base)).cast("bigint"))


def apply_table_features(df: DataFrame, table: Table,
                         *, existing_max_identity: int | None = None) -> DataFrame:
    """Apply every declared column feature of a Table contract in order:
    defaults → generated → identity."""
    defaults = {c.name: c.default for c in table.columns if c.default is not None}
    if defaults:
        df = apply_defaults(df, defaults)
    generated = {c.name: c.generated_expr for c in table.columns
                 if c.generated_expr}
    if generated:
        df = apply_generated_columns(df, generated)
    for c in table.columns:
        if c.identity and c.name not in df.columns:
            df = apply_identity(df, c.name, start=c.identity_start,
                                step=c.identity_step,
                                existing_max=existing_max_identity)
    return df
