"""File-level data skipping for the TableStore — the engine's analogue of
Delta Lake data skipping + OPTIMIZE ZORDER.

The reference relies on Delta for file pruning (its merge conditions add
partition-column conjuncts precisely so Delta can skip files —
``core/execution/write.py:190-213`` and option docs
``core/schemas/sources.py:141-149``). This container has no delta-spark, so
the TableStore records the same metadata Delta would:

- **per-file min/max statistics** for declared ``stats_columns``, read from
  parquet footers at commit time (metadata-only — no data scan; on a real
  cluster the writer tasks would report these in their commit messages, the
  way Delta's ``add`` actions carry ``stats`` JSON);
- **hive partition values** parsed from file paths.

``read_where`` then prunes the file list with interval logic before Spark
ever plans the scan, and applies the full predicate as a residual filter so
results are exact even when a predicate can't be used for pruning.

Scale notes: pruning is O(#files) driver-side metadata work — the same cost
profile as Delta's log replay — and the payoff is proportional to data
clustered-ness, which is what ``optimize`` (Z-order-style multi-column
clustering via bit interleaving) restores after many unordered appends.
"""

from __future__ import annotations

import datetime
import decimal
import os
import urllib.parse
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: comparison operators usable for pruning; anything else is residual-only.
#: "in" takes an iterable literal and prunes via both interval and
#: value-set stats.
_PRUNE_OPS = {"=", "==", "<", "<=", ">", ">=", "in"}


# -- stats collection --------------------------------------------------------

def _norm_stat(v):
    """Normalize a parquet-footer statistic to a JSON-storable value whose
    natural ordering matches the column's ordering (ISO strings for
    date/timestamp — lexicographic == chronological)."""
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    return v


def file_stats(dirs: Sequence[str], columns: Sequence[str]) -> list[dict]:
    """Per-file {path, rows, bytes, min, max} for ``columns``, from parquet
    footers only. A column missing trustworthy stats in any row group is
    dropped from that file's entry (pruning then keeps the file)."""
    import pyarrow.parquet as pq

    out: list[dict] = []
    for d in dirs:
        for dirpath, _, files in os.walk(d):
            for fn in sorted(files):
                if not fn.endswith(".parquet"):
                    continue
                path = os.path.join(dirpath, fn)
                md = pq.ParquetFile(path).metadata
                mins: dict = {}
                maxs: dict = {}
                bad: set[str] = set()
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        name = c.path_in_schema
                        if name not in columns or name in bad:
                            continue
                        st = c.statistics
                        lo = _norm_stat(st.min) if st is not None and st.has_min_max else None
                        hi = _norm_stat(st.max) if st is not None and st.has_min_max else None
                        if lo is None or hi is None:
                            bad.add(name)
                            mins.pop(name, None)
                            maxs.pop(name, None)
                            continue
                        mins[name] = lo if name not in mins else min(mins[name], lo)
                        maxs[name] = hi if name not in maxs else max(maxs[name], hi)
                out.append({"path": path, "rows": md.num_rows,
                            "bytes": os.path.getsize(path),
                            "min": mins, "max": maxs})
    return out


def value_set_stats(path: str, columns: Sequence[str],
                    cap: int = 64) -> dict[str, list]:
    """Per-file DISTINCT VALUE SETS for low-cardinality columns — the
    complement to min/max skipping. A status/category/tenant column is
    useless to interval pruning (every file spans 'A'..'Z') but its
    per-file distinct set is tiny and prunes ``=``/``IN`` predicates
    exactly. Columns whose per-file distinct count exceeds ``cap`` record
    nothing (pruning stays an optimization, never a correctness filter).

    Cost: one bounded single-column read of a file the writer just
    produced — the indexing pass Delta performs inline when collecting
    ``stats`` on write.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    avail = [c for c in columns if c in pf.schema_arrow.names]
    out: dict[str, list] = {}
    if not avail:
        return out
    tbl = pf.read(columns=avail)
    for c in avail:
        uniq = pc.unique(tbl.column(c).combine_chunks())
        if len(uniq) > cap:
            continue
        vals = []
        usable = True
        for v in uniq.to_pylist():
            if v is None:
                continue  # '=' / IN literals never match NULL anyway
            nv = v if isinstance(v, (bool, int, float, str)) else _norm_stat(v)
            if nv is None:
                usable = False
                break
            vals.append(nv)
        if usable:
            out[c] = sorted(vals, key=lambda x: (type(x).__name__, str(x)))
    return out


def add_value_set_stats(store, name: str, columns: Sequence[str],
                        cap: int = 64) -> dict:
    """Enrich the current manifest's file entries with distinct-value sets
    for ``columns`` — an index build, republished atomically via
    ``amend_manifest``. Files already carrying sets for a column are
    skipped, so running this after each commit only reads NEW files."""

    def mutator(m: dict) -> None:
        for f in m.get("files") or []:
            have = f.get("vals") or {}
            need = [c for c in columns if c not in have]
            if not need:
                continue
            have.update(value_set_stats(f["path"], need, cap))
            if have:
                f["vals"] = have
        m["set_columns"] = sorted(
            set(m.get("set_columns") or []) | set(columns))

    return store.amend_manifest(name, mutator)


def _eq_forms(v) -> set:
    """Comparable spellings of a value for conservative set-membership
    checks (numeric widening + date→timestamp padding + temporal→ISO
    string, matching how ``_norm_stat`` stores footer values). A spurious
    extra form can only KEEP a file, never drop one."""
    forms = {v}
    # datetime/date literals must meet the ISO strings value_set_stats
    # stores (via _norm_stat) — without these forms a timestamp predicate
    # "provably excludes" a file that contains the exact value.
    if isinstance(v, datetime.datetime):
        forms.add(v.isoformat(sep=" "))
        forms.add(v.isoformat())
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            forms.add(v.date().isoformat())
        return forms
    if isinstance(v, datetime.date):
        forms.add(v.isoformat())
        forms.add(v.isoformat() + " 00:00:00")
        return forms
    if not isinstance(v, bool):
        try:
            forms.add(float(v))
        except (TypeError, ValueError):
            pass
    if isinstance(v, str) and _DATE_RE.match(v):
        forms.add(v + " 00:00:00")
    if isinstance(v, str) and v.endswith(" 00:00:00"):
        forms.add(v[:-9])
    if isinstance(v, str) and _TS_PREFIX_RE.match(v):
        # Spark truncates a timestamp-precision literal when the column is
        # DATE, so 'd = TIMESTAMP 12:00' can match a date-valued file: the
        # truncated form keeps it (extra forms only ever KEEP files; the
        # residual filter stays the ground truth)
        forms.add(v[:10])
    return forms


#: literal types _eq_forms can provably map onto the stored-value domain
#: (bool/int/float/str after _norm_stat). Anything else → keep the file,
#: mirroring _coerced's keep-on-uncertainty rule.
_SET_PRUNABLE_TYPES = (bool, int, float, str,
                       datetime.datetime, datetime.date, decimal.Decimal)


def _set_excludes(stored_vals: Sequence, val) -> bool:
    """True only when ``val`` PROVABLY is not in the file's value set."""
    if not isinstance(val, _SET_PRUNABLE_TYPES):
        return False  # can't trust the comparison → keep the file
    if isinstance(val, decimal.Decimal):
        val = float(val)
    want = _eq_forms(val)
    return all(not (want & _eq_forms(s)) for s in stored_vals)


def partition_values(path: str) -> dict[str, str]:
    """Hive ``col=value`` components of a file path (unescaped)."""
    out: dict[str, str] = {}
    for part in path.split(os.sep):
        if "=" in part and not part.endswith(".parquet"):
            col, _, val = part.partition("=")
            out[col] = urllib.parse.unquote(val)
    return out


# -- pruning -----------------------------------------------------------------

_DATE_RE = __import__("re").compile(r"^\d{4}-\d{2}-\d{2}$")


def _pad_temporal(a, b):
    """Make a date-only string comparable with a timestamp string the way
    SQL does (DATE 'd' == TIMESTAMP 'd 00:00:00'). Only strings that look
    exactly like ISO dates are padded — plain text is left alone."""
    if isinstance(a, str) and isinstance(b, str) and (" " in a) != (" " in b):
        if _DATE_RE.match(a):
            a = a + " 00:00:00"
        if _DATE_RE.match(b):
            b = b + " 00:00:00"
    return a, b


def _coerced(lo, hi, val, from_partition_path: bool = False):
    """Coerce (lo, hi, val) to one comparable type, or None when the
    comparison can't be trusted (→ caller keeps the file).

    ``from_partition_path`` bounds came from a hive path component, whose
    type Spark INFERS — a numeric-looking directory value is an int column
    to Spark, so '9' must order below '10' numerically there. Footer stats
    of a true string column stay lexicographic (matching Spark's own
    string comparison in the residual filter)."""
    if isinstance(val, bool) or isinstance(lo, bool):
        return None
    if isinstance(val, (int, float)):
        try:
            return float(lo), float(hi), float(val)
        except (TypeError, ValueError):
            return None
    if isinstance(val, str):
        if isinstance(lo, str):
            if from_partition_path:
                try:
                    return float(lo), float(hi), float(val)
                except (TypeError, ValueError):
                    pass  # non-numeric partition value → string semantics
            lo, val1 = _pad_temporal(lo, val)
            hi, val2 = _pad_temporal(hi, val)
            # lo and hi pad independently against the same val; both pads of
            # val are identical because val's shape doesn't change per side
            return lo, hi, val1 if " " in val1 else val2
        try:  # numeric stats vs numeric-looking string literal
            return float(lo), float(hi), float(val)
        except (TypeError, ValueError):
            return None
    return None


def _interval_matches(lo, hi, op: str, val,
                      from_partition_path: bool = False) -> bool:
    """Could a value in [lo, hi] satisfy ``x <op> val``? Conservative:
    uncertain comparisons return True (file kept)."""
    c = _coerced(lo, hi, val, from_partition_path)
    if c is None:
        return True
    lo, hi, val = c
    if op in ("=", "=="):
        return lo <= val <= hi
    if op == "<":
        return lo < val
    if op == "<=":
        return lo <= val
    if op == ">":
        return hi > val
    if op == ">=":
        return hi >= val
    return True


def prune_files(manifest: dict,
                predicates: Sequence[tuple[str, str, object]]) -> tuple[list[dict], int]:
    """Apply conjunctive ``(col, op, literal)`` predicates to the manifest's
    file stats and hive partition paths. Returns (kept_file_entries,
    total_files). Files lacking stats for a predicate column are kept —
    pruning is an optimization, never a correctness filter."""
    predicates = _validate_predicates(predicates)
    files = manifest.get("files") or []
    kept = []
    for f in files:
        parts = partition_values(f["path"])
        keep = True
        for col, op, val in predicates:
            if op not in _PRUNE_OPS:
                continue
            vals_list = (list(val) if op == "in" else [val])
            # temporal literals meet footer stats as the ISO strings
            # _norm_stat stored (lexicographic == chronological), so they
            # participate in interval pruning instead of being kept-on-
            # uncertainty by _coerced
            vals_list = [_norm_stat(v)
                         if isinstance(v, (datetime.datetime, datetime.date))
                         else v for v in vals_list]
            # exact value-set pruning for = / IN where the file carries one
            stored = f.get("vals", {}).get(col)
            if stored is not None and op in ("=", "==", "in"):
                if all(_set_excludes(stored, v) for v in vals_list):
                    keep = False
                    break
                continue  # set says "maybe present" — definitive for =/IN
            if col in parts:
                lo = hi = parts[col]
                from_path = True
            elif col in f.get("min", {}):
                lo, hi = f["min"][col], f["max"][col]
                from_path = False
            else:
                continue
            eff_vals = [_align_temporal(lo, hi, v) for v in vals_list]
            eff_op = "=" if op == "in" else op
            if not any(_interval_matches(lo, hi, eff_op, v, from_path)
                       for v in eff_vals):
                keep = False
                break
        if keep:
            kept.append(f)
    return kept, len(files)


_TS_PREFIX_RE = __import__("re").compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:")


def _align_temporal(lo, hi, v):
    """Align a temporal literal's PRECISION to the file's stats so pruning
    mirrors Spark's own comparison semantics (the residual filter is the
    ground truth):

    - DATE-column stats vs a datetime-precision literal: Spark casts the
      string literal to DATE (truncating the time part), so the literal
      must truncate here too — otherwise ``date_col >= '1995-06-01
      12:00:00'`` lexicographically excludes a min=max=1995-06-01 file
      that Spark's filter MATCHES (silently lost rows).
    - TIMESTAMP-column stats vs a date-only literal: Spark casts the
      string to midnight, so pad '' → ' 00:00:00' (equal-length ISO
      strings keep lexicographic == chronological for every operator).
    """
    if not (isinstance(lo, str) and isinstance(hi, str)
            and isinstance(v, str)):
        return v
    if _DATE_RE.match(lo) and _DATE_RE.match(hi) and _TS_PREFIX_RE.match(v):
        return v[:10]
    if (_TS_PREFIX_RE.match(lo) and _TS_PREFIX_RE.match(hi)
            and _DATE_RE.match(v)):
        return v + " 00:00:00"
    return v


def _validate_predicates(
        predicates: Sequence[tuple[str, str, object]]
) -> list[tuple[str, str, object]]:
    """Reject 'in' values that would silently misbehave — a plain string
    iterates characters, and an empty collection renders ``col IN ()``
    which Spark's parser rejects in the residual filter — and return the
    predicates with every 'in' collection MATERIALIZED to a list: a
    one-shot iterator (generator) would otherwise pass validation, then
    yield nothing downstream and prune every file / render ``IN ()``.
    Callers must use the returned list, not the argument."""
    out: list[tuple[str, str, object]] = []
    for col, op, val in predicates:
        if op != "in":
            out.append((col, op, val))
            continue
        if isinstance(val, (str, bytes)):
            raise ValueError(
                f"'in' predicate on '{col}' got a plain {type(val).__name__}"
                f" — pass a list/tuple/set of values (a string would be"
                f" iterated character by character)")
        try:
            vals = list(val)
        except TypeError:
            raise ValueError(
                f"'in' predicate on '{col}' needs an iterable of values, "
                f"got {type(val).__name__}") from None
        if not vals:
            raise ValueError(
                f"'in' predicate on '{col}' got an empty collection — an "
                f"empty IN list is unsatisfiable and unparseable as SQL; "
                f"filter it out upstream")
        out.append((col, op, vals))
    return out


def _sql_literal(val) -> str:
    if isinstance(val, str):
        return "'" + val.replace("'", "''") + "'"
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, (datetime.datetime, datetime.date)):
        return "'" + val.isoformat(sep=" ") + "'" \
            if isinstance(val, datetime.datetime) \
            else "'" + val.isoformat() + "'"
    if isinstance(val, (int, float)):
        return repr(val)
    raise TypeError(f"unsupported predicate literal {val!r} "
                    f"({type(val).__name__})")


def predicates_to_sql(predicates: Sequence[tuple[str, str, object]]) -> str:
    predicates = _validate_predicates(predicates)
    parts = []
    for col, op, val in predicates:
        if op == "in":
            lits = ", ".join(_sql_literal(v) for v in val)
            parts.append(f"({col} IN ({lits}))")
        else:
            parts.append(f"({col} {'=' if op == '==' else op} {_sql_literal(val)})")
    return " AND ".join(parts)


def read_where(store, spark: SparkSession, name: str,
               predicates: Sequence[tuple[str, str, object]]) -> DataFrame:
    """Read a store table with file-level skipping: files whose min/max (or
    partition path) provably exclude every predicate are never given to
    Spark, and the full predicate still runs as a residual filter.

    Equivalent to a Delta scan with data skipping: the driver consults
    commit metadata, hands Spark only the surviving files, and Catalyst's
    own row-group pushdown takes over from there.
    """
    m = store.manifest(name)
    if m is None:
        raise FileNotFoundError(f"table '{name}' does not exist in {store.root}")
    if not predicates:
        return store.read(spark, name)
    # materialize once up front: a generator-valued 'in' would otherwise be
    # consumed by the residual-SQL render and arrive empty at prune_files
    predicates = _validate_predicates(predicates)
    residual = predicates_to_sql(predicates)
    if not m.get("files"):
        return store.read(spark, name).filter(residual)
    # A commit written without stats_columns recorded no file entries for
    # its directory; those directories MUST be scanned unpruned — a stats
    # gap is never license to drop data.
    covered = {d for d in m["dirs"]
               if any(f["path"].startswith(d + os.sep) for f in m["files"])}
    uncovered = [d for d in m["dirs"] if d not in covered]
    kept, _total = prune_files(m, predicates)
    frames = []
    if m["partition_by"]:
        # group surviving files under their snapshot dir so partition-column
        # discovery (basePath) still works per data directory
        for d in covered:
            paths = [f["path"] for f in kept if f["path"].startswith(d + os.sep)]
            if paths:
                frames.append(spark.read.option("basePath", d).parquet(*paths))
        for d in uncovered:
            frames.append(spark.read.option("basePath", d).parquet(d))
    else:
        paths = [f["path"] for f in kept]
        if paths:
            frames.append(spark.read.parquet(*paths))
        if uncovered:
            frames.append(spark.read.parquet(*uncovered))
    if not frames:
        return store.read(spark, name).filter(residual).limit(0)
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.filter(residual)


def skipping_report(store, name: str,
                    predicates: Sequence[tuple[str, str, object]]) -> dict:
    """Observability: how much a predicate would skip (files/bytes/rows)."""
    m = store.manifest(name) or {}
    kept, total = prune_files(m, predicates)
    files = m.get("files") or []
    return {
        "files_total": total,
        "files_kept": len(kept),
        "bytes_total": sum(f["bytes"] for f in files),
        "bytes_kept": sum(f["bytes"] for f in kept),
        "rows_total": sum(f["rows"] for f in files),
        "rows_kept": sum(f["rows"] for f in kept),
    }


# -- clustering (OPTIMIZE ZORDER analogue) -----------------------------------

def _as_double(col: str, dtype: T.DataType) -> F.Column:
    c = F.col(col)
    if isinstance(dtype, T.TimestampType):
        return F.unix_timestamp(c).cast("double")
    if isinstance(dtype, T.DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    if not isinstance(dtype, T.NumericType):
        # a silent cast-to-null would drop the column from the z-value and
        # the caller would believe it got clustered
        raise TypeError(
            f"zorder column '{col}' has type {dtype.simpleString()}; only "
            f"numeric/date/timestamp columns can be z-ordered (hash or "
            f"dictionary-encode strings upstream)")
    return c.cast("double")


def zorder_column(df: DataFrame, columns: Sequence[str],
                  total_bits: int = 16) -> F.Column:
    """Z-value expression interleaving per-column bucket bits — the same
    space-filling-curve clustering Delta's OPTIMIZE ZORDER uses, built from
    stock expressions (width_bucket + bit ops) so it runs inside
    whole-stage codegen, no UDF.

    Bounds come from one driver-side min/max agg (same cost class as the
    reference's CDC bound resolution, ``delta_source.py:263-308``).
    """
    bits = max(1, total_bits // len(columns))
    n_buckets = 2 ** bits
    aggs = []
    for c in columns:
        d = _as_double(c, df.schema[c].dataType)
        aggs += [F.min(d).alias(f"__lo_{c}"), F.max(d).alias(f"__hi_{c}")]
    row = df.agg(*aggs).first()
    z = F.lit(0).cast("long")
    for i, c in enumerate(columns):
        lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
        if lo is None or hi is None or hi <= lo:
            continue
        d = _as_double(c, df.schema[c].dataType)
        bucket = (F.width_bucket(d, F.lit(float(lo)), F.lit(float(hi)),
                                 F.lit(n_buckets)) - F.lit(1))
        bucket = F.coalesce(F.least(F.greatest(bucket, F.lit(0)),
                                    F.lit(n_buckets - 1)), F.lit(0)).cast("long")
        for b in range(bits):
            # bit b of this column lands at interleaved position
            # b * n_cols + i (column-major round robin, MSB-fair)
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(bucket, b).bitwiseAND(F.lit(1)),
                            b * len(columns) + i))
    return z


def optimize(store, spark: SparkSession, name: str,
             zorder_by: Sequence[str], target_files: int = 8,
             stats_columns: Sequence[str] | None = None) -> int:
    """Rewrite a table clustered on ``zorder_by`` so file min/max ranges
    become narrow and data skipping bites — Delta ``OPTIMIZE ... ZORDER BY``.

    Single column → range-partition + sort (perfectly disjoint ranges);
    multiple columns → interleaved-bit z-value, range-partitioned and
    sorted, giving every column locality. File count is explicit
    (``target_files``) — the knob that controls task granularity and small-
    file pressure at scale.
    """
    m = store.manifest(name)
    if m is None:
        raise FileNotFoundError(f"table '{name}' does not exist")
    part = m["partition_by"]
    df = store.read(spark, name)
    if len(zorder_by) == 1:
        c = zorder_by[0]
        clustered = (df.repartitionByRange(target_files, F.col(c))
                     .sortWithinPartitions(c))
    else:
        z = zorder_column(df, zorder_by)
        clustered = (df.withColumn("__z__", z)
                     .repartitionByRange(target_files, F.col("__z__"))
                     .sortWithinPartitions("__z__")
                     .drop("__z__"))
    cols = list(stats_columns if stats_columns is not None
                else dict.fromkeys([*(m.get("stats_columns") or []),
                                    *zorder_by]))
    # hive partitioning survives the rewrite: clustering orders rows WITHIN
    # each partition directory
    return store.overwrite(spark, clustered, name,
                           partition_by=part or None, stats_columns=cols,
                           _operation="optimize",
                           _expected_base=m["version"])
