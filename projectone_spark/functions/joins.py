"""Join operators Spark lacks as primitives: as-of join and range join.

The reference has no general join operator (SURVEY §2.5) — these are the
Spark-native extensions a time-series/feature pipeline needs.

Scale design — the as-of join is NOT implemented as an inequality join
(which Catalyst would plan as a broadcast-nested-loop: O(|L|·|R|) and a
driver-side broadcast of a possibly-huge right side). Instead it is the
union-merge idiom: tag both sides, union, ONE shuffle on the join keys,
one ordered window pass carrying the latest right-side row forward. Cost
is O((|L|+|R|) log) per partition and scales to arbitrarily large sides,
with AQE free to handle skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(left: DataFrame, right: DataFrame, *,
              on: Sequence[str], left_ts: str, right_ts: str,
              right_cols: Sequence[str] | None = None,
              tolerance: str | None = None) -> DataFrame:
    """Backward-inclusive as-of join: each left row gains the right-side row
    with the greatest ``right_ts <= left_ts`` for the same ``on`` keys
    (pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics; no match →
    NULLs).

    ``right`` must be unique per (on, right_ts) for deterministic results —
    pre-aggregate if needed. ``tolerance`` (an INTERVAL literal, e.g.
    ``'90 days'``) drops matches older than ``left_ts - tolerance``.
    """
    on = list(on)
    right_cols = [c for c in (right_cols or right.columns)
                  if c not in on and c != right_ts]

    r_payload = F.struct(F.col(right_ts).alias(right_ts),
                         *[F.col(c).alias(c) for c in right_cols])
    l_cols = [c for c in left.columns if c not in on]

    tagged_r = right.select(
        *on, F.col(right_ts).alias("__ts"), F.lit(0).alias("__side"),
        r_payload.alias("__r"), *[F.lit(None).alias(c) for c in l_cols])
    tagged_l = left.select(
        *on, F.col(left_ts).alias("__ts"), F.lit(1).alias("__side"),
        F.lit(None).cast(tagged_r.schema["__r"].dataType).alias("__r"), *l_cols)

    w = (Window.partitionBy(*on).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = (tagged_r.unionByName(tagged_l)
               .withColumn("__last_r", F.last("__r", ignorenulls=True).over(w)))

    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        fresh = (F.col("__last_r").isNotNull()
                 & (F.col(f"__last_r.{right_ts}")
                    >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")))
        out = out.withColumn("__last_r", F.when(fresh, F.col("__last_r")))
    return out.select(
        *on, *l_cols,
        F.col(f"__last_r.{right_ts}").alias(right_ts),
        *[F.col(f"__last_r.{c}").alias(c) for c in right_cols])


def range_join(left: DataFrame, right: DataFrame, *,
               left_ts: str, right_lo: str, right_hi: str,
               on: Sequence[str] = (),
               how: str = "inner") -> DataFrame:
    """Interval containment join: left rows matched to right rows whose
    ``[right_lo, right_hi)`` interval contains ``left_ts`` (plus optional
    equi-keys).

    With equi-keys the plan is a normal shuffled equi-join with the range
    as a post-filter. Without keys Catalyst plans broadcast-nested-loop —
    fine when one side is small; at scale, bucket both sides by a
    time-grain key first and join on the bucket.
    """
    cond = (F.col(f"l.{left_ts}") >= F.col(f"r.{right_lo}")) & \
           (F.col(f"l.{left_ts}") < F.col(f"r.{right_hi}"))
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    return left.alias("l").join(right.alias("r"), cond, how)
