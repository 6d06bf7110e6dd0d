"""Pure SCD merge semantics as DataFrame -> DataFrame functions.

Re-expresses the reference's Delta ``MERGE``-based SCD1/2/3 writers
(``core/execution/write.py:320-544`` scd1, ``:547-1010`` scd2, ``:27-317``
scd3) as *pure snapshot transforms*: ``(source, target) -> new_target``.
This is the Spark-first shape — the physical write (Delta MERGE when
available, versioned-parquet swap otherwise) is a separate concern handled
by :mod:`projectone_spark.writers` / :mod:`projectone_spark.store`.

Scale notes:
- every variant is ONE full-outer equi-join on ``__metadata_key_hash__``
  (a single 32-byte/8-byte shuffle key), not per-branch joins — one shuffle
  per merge regardless of how many match-branches the SCD type has;
- change detection compares precomputed row hashes, not N column pairs,
  so the join condition stays a cheap equi-compare (reference rationale:
  ``write.py:103-140``);
- with ``algo="xxhash64"`` the shuffle key is a long instead of a hex string.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from projectone_spark.writers.hashing import (
    ACTIVE,
    COLUMN_KEY_HASH,
    DATA_HASH,
    KEY_HASH,
    SCD2_SENTINEL,
    VALID_FROM,
    VALID_TO,
    data_columns,
    row_hash,
    with_key_data_hashes,
)


def _as_col(value: Column | str | None, default: Column) -> Column:
    if value is None:
        return default
    if isinstance(value, Column):
        return value
    return F.col(value)


def _prep_source(source: DataFrame, key_cols: Sequence[str],
                 data_cols: Sequence[str] | None, dedup_on_keys: bool,
                 algo: str) -> DataFrame:
    src = source
    if dedup_on_keys:
        # reference `deduplicate_onkeys` (write.py:257-259, 488-491, 769-771)
        src = src.dropDuplicates(list(key_cols))
    return with_key_data_hashes(src, key_cols, data_cols, algo)


def scd1_merge(source: DataFrame, target: DataFrame | None,
               key_cols: Sequence[str], *,
               data_cols: Sequence[str] | None = None,
               dedup_on_keys: bool = False,
               now: Column | None = None,
               algo: str = "md5") -> DataFrame:
    """SCD1 upsert: matched-and-changed rows take source values, unmatched
    source rows insert, everything else keeps the target row.

    Output schema: payload + key_hash, data_hash, ``__metadata_valid_from_ts__``.
    ``now`` defaults to ``current_timestamp()``; pass a literal for
    deterministic tests.
    """
    now = _as_col(now, F.current_timestamp())
    src = _prep_source(source, key_cols, data_cols, dedup_on_keys, algo)
    payload = data_columns(src, key_cols)
    out_cols = list(key_cols) + payload + [KEY_HASH, DATA_HASH]

    if target is None or not target.columns:
        return src.select(*out_cols).withColumn(VALID_FROM, now)

    tgt = target
    if KEY_HASH not in tgt.columns:
        tgt = with_key_data_hashes(tgt, key_cols, data_cols, algo)
    if VALID_FROM not in tgt.columns:
        tgt = tgt.withColumn(VALID_FROM, now)

    s = src.alias("s")
    t = tgt.alias("t")
    joined = s.join(t, F.col(f"s.{KEY_HASH}") == F.col(f"t.{KEY_HASH}"), "full_outer")

    matched = F.col(f"s.{KEY_HASH}").isNotNull() & F.col(f"t.{KEY_HASH}").isNotNull()
    changed = matched & (F.col(f"s.{DATA_HASH}") != F.col(f"t.{DATA_HASH}"))
    inserted = F.col(f"t.{KEY_HASH}").isNull()
    take_source = changed | inserted

    cols = [
        F.when(take_source, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in out_cols
    ]
    valid_from = (F.when(take_source, now)
                  .otherwise(F.col(f"t.{VALID_FROM}")).alias(VALID_FROM))
    return joined.select(*cols, valid_from)


def _scd2_data_cols(source: DataFrame, key_cols: Sequence[str],
                    data_cols: Sequence[str] | None,
                    valid_from: Column | str | None) -> Sequence[str] | None:
    """When the validity source is a named column (reference
    ``history_tracking_col``), it defines WHEN a version applies, not WHAT
    changed — exclude it from the default change-detection hash."""
    if data_cols is None and isinstance(valid_from, str):
        return [c for c in data_columns(source, key_cols) if c != valid_from]
    return data_cols


def scd2_apply(source: DataFrame, target: DataFrame | None,
               key_cols: Sequence[str], *,
               data_cols: Sequence[str] | None = None,
               valid_from: Column | str | None = None,
               sentinel: str = SCD2_SENTINEL,
               dedup_on_keys: bool = False,
               algo: str = "md5",
               history_start: Column | None = None) -> DataFrame:
    """SCD2 history build: close changed rows, insert new versions.

    Implements the reference's flag taxonomy (``write.py:799-844``):
    I (new key) → insert active row; UI (key matched, data changed) → close
    the old row (``valid_to = source valid_from``, active 'N') and insert a
    new active row; D (no change) → keep. Closed history rows pass through
    untouched. Exactly one active row per key is preserved (the reference's
    hardest invariant, ``write.py:547-1010``).

    ``valid_from`` is the event-time column/expression on the source
    (reference ``history_tracking_col``); defaults to ``current_timestamp()``.

    ``history_start`` (reference ``history_start_tracking_value[_type]``,
    ``write.py:849-863``): brand-new keys (flag I) open their first history
    row at this fixed literal instead of the source valid_from — initial
    loads then say "valid since epoch", not "valid since the load ran".
    Version-2 rows of existing keys are unaffected.
    """
    vf = _as_col(valid_from, F.current_timestamp())
    sentinel_ts = F.lit(sentinel).cast("timestamp")
    data_cols = _scd2_data_cols(source, key_cols, data_cols, valid_from)
    src = _prep_source(source, key_cols, data_cols, dedup_on_keys, algo)
    src = src.withColumn(VALID_FROM, vf)
    payload = data_columns(src, key_cols)
    payload = [c for c in payload if c != VALID_FROM]
    out_cols = list(key_cols) + payload + [KEY_HASH, DATA_HASH]

    def finalize(df: DataFrame) -> DataFrame:
        return df.select(*out_cols, VALID_FROM, VALID_TO, ACTIVE)

    new_rows_from = (lambda df: df
                     .withColumn(VALID_TO, sentinel_ts)
                     .withColumn(ACTIVE, F.lit("Y")))

    if target is None or not target.columns:
        first = (src.withColumn(VALID_FROM, history_start)
                 if history_start is not None else src)
        return finalize(new_rows_from(first))

    history = target.filter(F.col(ACTIVE) == "N")
    active = target.filter(F.col(ACTIVE) == "Y")

    s = src.alias("s")
    t = active.alias("t")
    joined = s.join(t, F.col(f"s.{KEY_HASH}") == F.col(f"t.{KEY_HASH}"), "full_outer")

    s_present = F.col(f"s.{KEY_HASH}").isNotNull()
    t_present = F.col(f"t.{KEY_HASH}").isNotNull()
    changed = s_present & t_present & (F.col(f"s.{DATA_HASH}") != F.col(f"t.{DATA_HASH}"))
    insert_new = s_present & (~t_present | changed)  # I or the insert half of UI

    # One pass emits up to two rows per joined key via explode of a struct
    # array: the surviving target-side row (closed or unchanged) and the
    # newly inserted source-side row — the Spark-native equivalent of the
    # reference's dual-row unionByName trick (write.py:962-969).
    def side_struct(side: str, valid_from_c: Column, valid_to_c: Column,
                    active_c: Column) -> Column:
        fields = [F.col(f"{side}.{c}").alias(c) for c in out_cols]
        return F.struct(*fields, valid_from_c.alias(VALID_FROM),
                        valid_to_c.alias(VALID_TO), active_c.alias(ACTIVE))

    target_row = F.when(
        t_present,
        side_struct(
            "t",
            F.col(f"t.{VALID_FROM}"),
            F.when(changed, F.col(f"s.{VALID_FROM}")).otherwise(F.col(f"t.{VALID_TO}")),
            F.when(changed, F.lit("N")).otherwise(F.col(f"t.{ACTIVE}")),
        ))
    new_vf = (F.when(~t_present, history_start)
              .otherwise(F.col(f"s.{VALID_FROM}"))
              if history_start is not None else F.col(f"s.{VALID_FROM}"))
    source_row = F.when(
        insert_new,
        side_struct("s", new_vf, sentinel_ts, F.lit("Y")))

    rows = joined.select(
        F.explode(F.filter(F.array(target_row, source_row),
                           lambda x: x.isNotNull())).alias("r"))
    merged = rows.select("r.*")
    return finalize(merged).unionByName(finalize(history))


def scd3_apply(source: DataFrame, target: DataFrame | None,
               key_cols: Sequence[str], tracked_cols: Sequence[str], *,
               data_cols: Sequence[str] | None = None,
               prev_prefix: str = "prev_",
               dedup_on_keys: bool = False,
               now: Column | None = None,
               algo: str = "md5") -> DataFrame:
    """SCD3: current snapshot plus ``prev_<col>`` columns for tracked columns.

    Mirrors the reference's two-clause MERGE (``write.py:278-293``):
    matched & tracked-column-hash changed → ``prev_c = CASE WHEN t.c <> s.c
    THEN t.c END`` and all data columns updated; matched & only untracked
    data changed → data updated, prev columns kept; unmatched source →
    insert with NULL prev; unmatched target → kept.
    """
    now = _as_col(now, F.current_timestamp())
    src = _prep_source(source, key_cols, data_cols, dedup_on_keys, algo)
    src = src.withColumn(COLUMN_KEY_HASH, row_hash(list(tracked_cols), algo))
    payload = [c for c in data_columns(src, key_cols)]
    prev_cols = [f"{prev_prefix}{c}" for c in tracked_cols]
    out_cols = list(key_cols) + payload
    meta = [KEY_HASH, DATA_HASH, COLUMN_KEY_HASH]

    if target is None or not target.columns:
        out = src
        for c in tracked_cols:
            out = out.withColumn(f"{prev_prefix}{c}",
                                 F.lit(None).cast(dict(src.dtypes)[c]))
        return out.select(*out_cols, *prev_cols, *meta).withColumn(VALID_FROM, now)

    tgt = target
    s = src.alias("s")
    t = tgt.alias("t")
    joined = s.join(t, F.col(f"s.{KEY_HASH}") == F.col(f"t.{KEY_HASH}"), "full_outer")

    s_present = F.col(f"s.{KEY_HASH}").isNotNull()
    t_present = F.col(f"t.{KEY_HASH}").isNotNull()
    tracked_changed = (s_present & t_present
                       & (F.col(f"s.{COLUMN_KEY_HASH}") != F.col(f"t.{COLUMN_KEY_HASH}")))
    data_changed = (s_present & t_present
                    & (F.col(f"s.{DATA_HASH}") != F.col(f"t.{DATA_HASH}")))
    inserted = s_present & ~t_present
    take_source = inserted | data_changed | tracked_changed

    cols = [F.when(take_source, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in out_cols + meta]
    prevs = []
    for c in tracked_cols:
        pc = f"{prev_prefix}{c}"
        prevs.append(
            F.when(tracked_changed,
                   F.when(F.col(f"t.{c}") != F.col(f"s.{c}"), F.col(f"t.{c}")))
             .when(t_present, F.col(f"t.{pc}"))
             .otherwise(F.lit(None))
             .alias(pc))
    valid_from = (F.when(take_source, now)
                  .otherwise(F.col(f"t.{VALID_FROM}")).alias(VALID_FROM))
    return joined.select(*cols[:len(out_cols)], *prevs,
                         *cols[len(out_cols):], valid_from)
