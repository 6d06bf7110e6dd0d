"""Write engine: the reference's write types re-expressed over TableStore.

Write types (reference enum ``core/schemas/sources.py:77-85``):
``append``, ``overwrite``, ``selective_overwrite`` (declared-only in the
reference; implemented here with replaceWhere semantics), ``scd1``,
``scd2``, ``scd3`` plus the pre-write referential ``table_constraint``
check (``core/execution/write.py:1165-1189``).

Metadata stamping matches the reference (FIXTURES.md §2):
- append/overwrite add ``__metadata_valid_to_ts__`` (+ optional
  insert/update ts);
- scd1 adds key/data hash + valid_from;
- scd2 adds active flag + validity interval;
- scd3 adds prev_<col> + column-key hash.
All metadata columns are renameable (``rename_metadata_columns``) and the
scd2 active flag values remappable (``active_record_value_mapping``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from projectone_spark.store import TableStore
from projectone_spark.writers.hashing import (
    ACTIVE,
    DATA_HASH,
    INSERT_TS,
    KEY_HASH,
    SCD2_SENTINEL,
    UPDATE_TS,
    VALID_FROM,
    VALID_TO,
)
from projectone_spark.writers.merge import scd1_merge, scd2_apply, scd3_apply


class ConstraintViolation(Exception):
    """A referential table constraint failed pre-write."""


#: Hard cap on how many distinct partition values a pruned merge/overwrite may
#: collect to the driver. Real partition columns (day, region, tenant) sit far
#: below this; blowing past it means someone pointed pruning at a data column.
MAX_PARTITION_VALUES = 10_000


def _now(now: Column | None) -> Column:
    return now if now is not None else F.current_timestamp()


def rename_metadata_columns(df: DataFrame,
                            mapping: Mapping[str, str] | None) -> DataFrame:
    """Apply the reference's metadata-column rename option
    (``core/schemas/sources.py:151-155``)."""
    if not mapping:
        return df
    for old, new in mapping.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    return df


def _stamp_plain(df: DataFrame, *, now: Column | None,
                 upsert_ts: bool) -> DataFrame:
    out = df.withColumn(VALID_TO, _now(now))
    if upsert_ts:
        out = out.withColumn(INSERT_TS, _now(now)).withColumn(UPDATE_TS, _now(now))
    return out


def write_append(spark: SparkSession, store: TableStore, df: DataFrame,
                 table: str, *, partition_by: Sequence[str] | None = None,
                 now: Column | None = None, upsert_ts: bool = False,
                 rename: Mapping[str, str] | None = None) -> int:
    """Reference append (``write.py:1013-1086``)."""
    out = rename_metadata_columns(_stamp_plain(df, now=now, upsert_ts=upsert_ts), rename)
    return store.append(spark, out, table, partition_by)


def write_overwrite(spark: SparkSession, store: TableStore, df: DataFrame,
                    table: str, *, partition_by: Sequence[str] | None = None,
                    now: Column | None = None, upsert_ts: bool = False,
                    rename: Mapping[str, str] | None = None) -> int:
    """Reference overwrite (``write.py:1089-1162``)."""
    out = rename_metadata_columns(_stamp_plain(df, now=now, upsert_ts=upsert_ts), rename)
    return store.overwrite(spark, out, table, partition_by)


def write_selective_overwrite(spark: SparkSession, store: TableStore,
                              df: DataFrame, table: str, *,
                              replace_where: str | None = None,
                              partition_values: dict[str, list] | None = None,
                              partition_by: Sequence[str] | None = None,
                              now: Column | None = None,
                              rename: Mapping[str, str] | None = None) -> int:
    """replaceWhere overwrite — the write type the reference declares but
    never implemented (``sources.py:85``)."""
    out = rename_metadata_columns(_stamp_plain(df, now=now, upsert_ts=False), rename)
    return store.selective_overwrite(spark, out, table,
                                     replace_where=replace_where,
                                     partition_values=partition_values,
                                     partition_by=partition_by)


def _read_target(spark: SparkSession, store: TableStore, table: str,
                 rename: Mapping[str, str] | None) -> DataFrame | None:
    if not store.exists(table):
        return None
    tgt = store.read(spark, table)
    if rename:  # un-rename so merge logic sees canonical metadata names
        inverse = {v: k for k, v in rename.items()}
        tgt = rename_metadata_columns(tgt, inverse)
    return tgt


def _partition_prune(spark: SparkSession, store: TableStore, df: DataFrame,
                     table: str, *, max_partition_values: int | None = None
                     ) -> tuple[DataFrame | None, dict | None]:
    """Merge-condition partition pruning (reference
    ``use_partition_attributes_in_merge``, SURVEY §4 "Merge join pruning"):
    when the target is partitioned on a column the source carries, only the
    partitions holding source keys participate — the target read is
    partition-filtered, and the commit replaces only those partition
    directories (the rest re-link, metadata-only). At 100 TB this is the
    difference between rewriting a day and rewriting a decade.

    Returns ``(pruned_target, partition_values)`` or ``(full_target, None)``
    when pruning doesn't apply.

    ``max_partition_values`` overrides the :data:`MAX_PARTITION_VALUES` cap
    for legitimately wide writes (e.g. a multi-year hourly backfill) without
    giving up pruning.
    """
    cap = MAX_PARTITION_VALUES if max_partition_values is None \
        else max_partition_values
    m = store.manifest(table)
    if m is None:
        return None, None
    part = [p for p in m["partition_by"] if p in df.columns]
    if not part:
        return store.read(spark, table), None
    # distinct partition values of the source: small by construction
    # (same cardinality class as a partition listing). The collect is capped:
    # a mistyped/high-cardinality partition column must fail fast, not OOM the
    # driver at scale.
    values = {}
    for p in part:
        vals = [r[p] for r in
                df.select(p).distinct().limit(cap + 1).collect()]
        if len(vals) > cap:
            raise ValueError(
                f"partition pruning on {table!r}: source has more than "
                f"{cap} distinct values for partition column "
                f"{p!r} — this is not a partition column; write without "
                f"partition_prune, fix partition_by, or raise "
                f"max_partition_values for a wide backfill")
        if any(v is None for v in vals):
            # NULL can't round-trip through the prune: isin() would silently
            # drop null-partition target rows and the store's col=value
            # directory key has no null spelling — fail loudly instead.
            raise ValueError(
                f"partition pruning on {table!r}: source has NULL values in "
                f"partition column {p!r} — nulls are not valid partition "
                f"prune values; clean the source or write without "
                f"partition_prune")
        values[p] = vals
    tgt = store.read(spark, table)
    for p, vals in values.items():
        tgt = tgt.filter(F.col(p).isin(vals))
    return tgt, values


def write_scd1(spark: SparkSession, store: TableStore, df: DataFrame,
               table: str, *, key_cols: Sequence[str],
               data_cols: Sequence[str] | None = None,
               dedup_on_keys: bool = False, now: Column | None = None,
               partition_by: Sequence[str] | None = None,
               rename: Mapping[str, str] | None = None,
               algo: str = "md5",
               partition_prune: bool = False,
               max_partition_values: int | None = None) -> int:
    if partition_prune:
        target, values = _partition_prune(
            spark, store, df, table,
            max_partition_values=max_partition_values)
        if values is not None:
            if rename and target is not None:
                inverse = {v: k for k, v in rename.items()}
                target = rename_metadata_columns(target, inverse)
            merged = scd1_merge(df, target, key_cols, data_cols=data_cols,
                                dedup_on_keys=dedup_on_keys, now=now, algo=algo)
            return store.selective_overwrite(
                spark, rename_metadata_columns(merged, rename), table,
                partition_values=values)
    target = _read_target(spark, store, table, rename)
    merged = scd1_merge(df, target, key_cols, data_cols=data_cols,
                        dedup_on_keys=dedup_on_keys, now=now, algo=algo)
    return store.overwrite(spark, rename_metadata_columns(merged, rename),
                           table, partition_by)


def write_scd2(spark: SparkSession, store: TableStore, df: DataFrame,
               table: str, *, key_cols: Sequence[str],
               data_cols: Sequence[str] | None = None,
               valid_from: Column | str | None = None,
               sentinel: str = SCD2_SENTINEL,
               dedup_on_keys: bool = False,
               fix_duplicates_by_key: bool = False,
               active_mapping: Mapping[str, str] | None = None,
               partition_by: Sequence[str] | None = None,
               rename: Mapping[str, str] | None = None,
               algo: str = "md5",
               history_start: Column | None = None) -> int:
    """SCD2 write. With ``fix_duplicates_by_key`` + an event-time
    ``valid_from`` column, a multi-version source batch is first compacted
    into a per-key history chain (reference window repair,
    ``write.py:875-960``): all but the newest version insert as closed
    rows, the newest goes through the normal merge."""
    target = _read_target(spark, store, table, rename)
    if fix_duplicates_by_key:
        history, df = scd2_compact(df, key_cols, data_cols=data_cols,
                                   valid_from=valid_from, sentinel=sentinel,
                                   algo=algo)
        merged = scd2_apply(df, target, key_cols, data_cols=data_cols,
                            valid_from=valid_from, sentinel=sentinel,
                            dedup_on_keys=False, algo=algo,
                            history_start=history_start)
        merged = merged.unionByName(history)
    else:
        merged = scd2_apply(df, target, key_cols, data_cols=data_cols,
                            valid_from=valid_from, sentinel=sentinel,
                            dedup_on_keys=dedup_on_keys, algo=algo,
                            history_start=history_start)
    if active_mapping:
        # reference active_record_value_mapping (write.py:617-624)
        expr = F.col(ACTIVE)
        mapped = F.when(expr == "Y", F.lit(active_mapping.get("Y", "Y"))) \
                  .otherwise(F.lit(active_mapping.get("N", "N")))
        merged = merged.withColumn(ACTIVE, mapped)
    return store.overwrite(spark, rename_metadata_columns(merged, rename),
                           table, partition_by)


def scd2_compact(source: DataFrame, key_cols: Sequence[str], *,
                 data_cols: Sequence[str] | None = None,
                 valid_from: Column | str | None = None,
                 sentinel: str = SCD2_SENTINEL,
                 algo: str = "md5") -> tuple[DataFrame, DataFrame]:
    """Split a multi-version source batch into (closed-history, latest).

    Reference semantics (``write.py:875-960``): order versions per key by
    the tracking column, drop consecutive rows whose data hash didn't
    change (lag compare), chain ``valid_to = lead(valid_from)``, and mark
    only the last row per key active. Returns the closed older versions
    (stamped like target history rows) and the bare latest rows (to be
    merged normally).
    """
    from projectone_spark.writers.hashing import with_key_data_hashes
    from projectone_spark.writers.merge import _scd2_data_cols

    vf = valid_from if isinstance(valid_from, Column) else F.col(valid_from)
    data_cols = _scd2_data_cols(source, key_cols, data_cols, valid_from)
    hashed = with_key_data_hashes(source, key_cols, data_cols, algo)
    hashed = hashed.withColumn(VALID_FROM, vf)
    w = Window.partitionBy(KEY_HASH).orderBy(F.asc(VALID_FROM))
    hashed = (hashed
              .withColumn("__prev_hash", F.lag(DATA_HASH).over(w))
              .filter(F.col("__prev_hash").isNull()
                      | (F.col("__prev_hash") != F.col(DATA_HASH)))
              .drop("__prev_hash"))
    w2 = Window.partitionBy(KEY_HASH).orderBy(F.asc(VALID_FROM))
    hashed = (hashed
              .withColumn("__next_from", F.lead(VALID_FROM).over(w2)))
    latest = (hashed.filter(F.col("__next_from").isNull())
              .drop("__next_from", KEY_HASH, DATA_HASH, VALID_FROM))
    history = (hashed.filter(F.col("__next_from").isNotNull())
               .withColumn(VALID_TO, F.col("__next_from"))
               .withColumn(ACTIVE, F.lit("N"))
               .drop("__next_from"))
    return history, latest


def write_scd3(spark: SparkSession, store: TableStore, df: DataFrame,
               table: str, *, key_cols: Sequence[str],
               tracked_cols: Sequence[str],
               data_cols: Sequence[str] | None = None,
               dedup_on_keys: bool = False, now: Column | None = None,
               partition_by: Sequence[str] | None = None,
               rename: Mapping[str, str] | None = None,
               algo: str = "md5") -> int:
    target = _read_target(spark, store, table, rename)
    merged = scd3_apply(df, target, key_cols, tracked_cols, data_cols=data_cols,
                        dedup_on_keys=dedup_on_keys, now=now, algo=algo)
    return store.overwrite(spark, rename_metadata_columns(merged, rename),
                           table, partition_by)


def check_table_constraints(spark: SparkSession, store: TableStore,
                            df: DataFrame,
                            constraints: Sequence[tuple[str, Sequence[str]]]) -> None:
    """Referential pre-write check (reference ``table_constraint``,
    ``write.py:1165-1189``): for each (dependent_table, join_cols), any
    source row with no match in the dependent table raises."""
    for dep_table, cols in constraints:
        dep = store.read(spark, dep_table).select(*cols)
        missing = df.join(dep, list(cols), "anti").limit(1).count()
        if missing:
            raise ConstraintViolation(
                f"rows in source have no match in '{dep_table}' on {list(cols)}")


#: write_type string → writer fn, mirroring the reference enum.
WRITERS = {
    "append": write_append,
    "overwrite": write_overwrite,
    "selective_overwrite": write_selective_overwrite,
    "scd1": write_scd1,
    "scd2": write_scd2,
    "scd3": write_scd3,
}
