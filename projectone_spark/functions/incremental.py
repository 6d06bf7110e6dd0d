"""Incremental aggregate maintenance — fold change-feed deltas into a
maintained aggregate table instead of recomputing it.

The reference re-derives every output from a full read + execution function
each run; its only incrementality is at the INPUT (attribute CDC,
``core/sources/delta_source.py:251-333``). This module extends the same
idea to the OUTPUT side for the distributive aggregates (sum / count, and
avg = sum/count at read time): a maintained table ``G = groupBy(keys).agg``
is updated from the store change feed by

    G' = G  ⊎  Σ_delta (sign · value)        sign = +1 insert / −1 delete

so a refresh scans only the rows the commits added or removed — at 100 TB
this is the difference between an O(table) and an O(delta) job. Groups
whose maintained count reaches zero are dropped, which makes a fold of
(delete old, insert new) pairs equivalent to recomputation.

Min/max are NOT maintainable this way (a delete of the current min forces a
rescan); ``refresh_agg`` rejects them by construction — recompute those, or
keep them approximately with sketches (a01).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.store import TableStore, read_changes
from projectone_spark.store.state import StateStore

_CNT = "__agg_count__"


def delta_agg(changes: DataFrame, keys: Sequence[str],
              sum_cols: Sequence[str]) -> DataFrame:
    """Signed partial aggregate of a change-feed frame (map-side combinable:
    one hash-agg shuffle over the delta only). Sums accumulate in exact
    DECIMAL(38,6) so fold order never changes the result — double sums are
    non-associative and would make fold(full) != recompute(full) by ulps."""
    sign = F.when(F.col("_change_type") == "delete", F.lit(-1)) \
        .otherwise(F.lit(1)).cast("long")
    signed = changes.withColumn("__sign", sign)
    return signed.groupBy(*keys).agg(
        *[F.sum(F.col(c).cast("decimal(38,6)") * F.col("__sign")).alias(f"sum_{c}")
          for c in sum_cols],
        F.sum("__sign").alias(_CNT))


def fold(agg: DataFrame, delta: DataFrame, keys: Sequence[str],
         sum_cols: Sequence[str]) -> DataFrame:
    """agg ⊎ delta: full-outer join on the group keys, component-wise sums,
    zero-count groups dropped."""
    a = agg.alias("a")
    d = delta.alias("d")
    joined = a.join(d, list(keys), "full_outer")
    merged = joined.select(
        *keys,
        *[(F.coalesce(F.col(f"a.sum_{c}"), F.lit(0).cast("decimal(38,6)"))
           + F.coalesce(F.col(f"d.sum_{c}"), F.lit(0).cast("decimal(38,6)")))
          .cast("decimal(38,6)").alias(f"sum_{c}")
          for c in sum_cols],
        (F.coalesce(F.col(f"a.{_CNT}"), F.lit(0))
         + F.coalesce(F.col(f"d.{_CNT}"), F.lit(0))).alias(_CNT))
    return merged.filter(F.col(_CNT) > 0)


def refresh_agg(store: TableStore, spark: SparkSession, source: str,
                target: str, keys: Sequence[str], sum_cols: Sequence[str],
                state: StateStore | None = None) -> int | None:
    """Bring ``target`` (the maintained aggregate of ``source``) up to the
    source's current version by folding only unseen commits.

    First call materializes the aggregate from a full scan; later calls
    read the change feed from the last folded version (append commits =
    new-file scan only) and fold. The folded-through version is tracked in
    ``state`` (key ``{target}_agg_version``, reference-style versioned KV)
    or, by default, a state store beside the table store.

    Returns the new target version, or None when already current.
    """
    state = state or StateStore(store.root + "_state")
    src_version = store.version(source)
    if src_version < 0:
        raise FileNotFoundError(f"source table '{source}' does not exist")
    key = f"{target}_agg_version"
    last = state.get_value(key)
    if last is not None and last >= src_version:
        return None
    if last is None:
        full = store.read(spark, source)
        changes = (full.withColumn("_change_type", F.lit("insert"))
                   .withColumn("_commit_version", F.lit(src_version)))
        new_agg = delta_agg(changes, keys, sum_cols)
    else:
        changes = read_changes(store, spark, source, last + 1, src_version)
        current = store.read(spark, target)
        new_agg = fold(current, delta_agg(changes, keys, sum_cols),
                       keys, sum_cols)
    v = store.overwrite(spark, new_agg, target)
    state.set(key, src_version)
    return v


def agg_view(store: TableStore, spark: SparkSession, target: str,
             avg_cols: Sequence[str] = ()) -> DataFrame:
    """Read a maintained aggregate, deriving avg_<c> = sum_<c>/count on the
    fly and exposing the count under its public name."""
    df = store.read(spark, target)
    for c in avg_cols:
        df = df.withColumn(f"avg_{c}",
                           (F.col(f"sum_{c}") / F.col(_CNT)).cast("double"))
    return df.withColumnRenamed(_CNT, "n_rows")


def refresh_distinct(store: TableStore, spark: SparkSession, source: str,
                     target: str, keys: Sequence[str],
                     distinct_col: str,
                     state: StateStore | None = None,
                     lg_k: int = 12) -> int | None:
    """Maintained approximate DISTINCT count per group via mergeable HLL
    sketches (Spark's DataSketches ``hll_sketch_agg``/``hll_union_agg``).

    Exact distinct cannot be folded from a change feed without keeping the
    full key set; a sketch CAN — each refresh sketches ONLY the new rows
    and unions binary sketches per group, so the refresh cost is O(delta)
    and the state per group is a fixed-size sketch, never the key set.
    This is the standard shape for "distinct users per day over 100 TB,
    updated per commit".

    Sketches cannot subtract: a change feed containing deletes raises (the
    same append-only contract streaming HLL systems have — rebuild or use
    the exact path when rows retire).
    """
    state = state or StateStore(store.root + "_state")
    src_version = store.version(source)
    if src_version < 0:
        raise FileNotFoundError(f"source table '{source}' does not exist")
    key = f"{target}_sketch_version"
    last = state.get_value(key)
    if last is not None and last >= src_version:
        return None
    if last is None:
        changes = store.read(spark, source)
    else:
        feed = read_changes(store, spark, source, last + 1, src_version)
        if feed.filter(F.col("_change_type") == "delete").limit(1).count():
            raise ValueError(
                f"change feed for '{source}' contains deletes; HLL sketches "
                f"are append-only — rebuild the sketch table instead")
        changes = feed
    delta = (changes.groupBy(*keys)
             .agg(F.hll_sketch_agg(distinct_col, F.lit(lg_k))
                  .alias("__sketch")))
    if last is not None:
        current = store.read(spark, target)
        delta = (current.unionByName(delta)
                 .groupBy(*keys)
                 .agg(F.hll_union_agg("__sketch", F.lit(False))
                      .alias("__sketch")))
    v = store.overwrite(spark, delta, target)
    state.set(key, src_version)
    return v


def distinct_view(store: TableStore, spark: SparkSession, target: str,
                  keys: Sequence[str]) -> DataFrame:
    """Per-group approximate distinct counts from the maintained sketch
    table — one estimate expression, no re-scan of the source."""
    return (store.read(spark, target)
            .select(*keys, F.hll_sketch_estimate("__sketch")
                    .alias("approx_distinct")))
