"""Stream-stream joins — watermarked interval joins between two unbounded
sources.

Absent from the reference (its streaming surface is per-stream foreachBatch
writes, SURVEY §2.11); Spark-native capability the engine exposes
first-class. The time-range conjunct is REQUIRED in append mode: together
with both watermarks it bounds the join state Spark must buffer — without
it state grows unboundedly at 100 TB/day stream rates. State size is
O(rate × (watermark + interval)) per side, independent of stream length.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(left: DataFrame, right: DataFrame, *, on: str,
                  left_ts: str, right_ts: str, within: str,
                  watermark: str, how: str = "inner") -> DataFrame:
    """Join rows of two streams with equal ``on`` keys where ``right_ts``
    falls in [left_ts, left_ts + within]. Both sides get ``watermark`` so
    buffered state is evictable."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}")
           <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)
