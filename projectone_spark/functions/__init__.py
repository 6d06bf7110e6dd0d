"""Beyond-reference function library for large-scale training-data pipelines:
text analysis, deduplication, embedding similarity, multimodal columns.

All hot-path logic is built-in ``pyspark.sql.functions`` expressions (JVM,
whole-stage codegen) — no Python UDFs. Pandas UDFs appear only in the
multimodal decode plumbing where per-cell binary processing is inherent.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def multiset_diff_count(a: DataFrame, b: DataFrame) -> int:
    """0 iff ``a`` and ``b`` are equal as row MULTISETS — the engine's
    equality-proof primitive (streamed-vs-rebuilt index, arrow-vs-expr
    tokenizer stage, pinned-vs-captured search).

    One union + one hash aggregate: each side contributes +1/-1 per row
    and a group whose signed count is non-zero witnesses a multiplicity
    mismatch. Replaces the r11-era double ``exceptAll`` + union + count,
    which evaluated BOTH input subtrees twice (four plan evaluations —
    for an unchecked-pointed rebuild that meant two full rebuild scans)
    and paid four shuffles instead of one (guide §2.4: remove shuffles
    outright). NULL grouping matches ``exceptAll``'s null-safe equality,
    so zero-ness is identical; the non-zero magnitude counts distinct
    mismatched row-values rather than excess rows, which every caller
    only renders into an error message.
    """
    cols = a.columns
    tagged = (a.select(*cols).withColumn("__side", F.lit(1))
              .unionByName(b.select(*cols).withColumn("__side", F.lit(-1))))
    return (tagged.groupBy(*cols)
            .agg(F.sum("__side").alias("__d"))
            .filter(F.col("__d") != 0)
            .count())


# -- bounded local rows as a LocalRelation -----------------------------------

#: DDL types values_frame can render as exact SQL literals. Anything else
#: falls back to createDataFrame (bit-identical rows, just slower).
_VALUES_TYPES = {"bigint", "long", "int", "integer", "double", "string",
                 "boolean", "array<double>"}

#: Rendered-SQL budget for the VALUES fast path. spark.sql() analyzes
#: eagerly, and parse+analysis of literal-dense VALUES text is superlinear
#: in practice: a 64-cell x 64-dim centroid frame (~90 KB of double
#: literals) measured ~3 s of pure driver time — far worse than the
#: 32-slice RDD it replaced (the e20/f15 regression caught mid-r12).
#: Beyond the budget the rows ship as a SINGLE-slice pickled RDD instead:
#: no parse cost, one Python task per action instead of 32 (measured
#: 0.78 s -> 0.38 s per warm collect for the 64x64 frame).
_VALUES_MAX_SQL = 16384


def _split_ddl(ddl: str) -> list[tuple[str, str]] | None:
    """``"a bigint, b array<double>"`` -> ``[("a", "bigint"), ...]``;
    None when a field does not parse or uses an unsupported type."""
    fields: list[tuple[str, str]] = []
    depth, start = 0, 0
    parts: list[str] = []
    for i, ch in enumerate(ddl):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(ddl[start:i])
            start = i + 1
    parts.append(ddl[start:])
    for p in parts:
        bits = p.strip().split(None, 1)
        if len(bits) != 2:
            return None
        name, typ = bits[0].strip("`"), "".join(bits[1].lower().split())
        if typ not in _VALUES_TYPES or not name:
            return None
        fields.append((name, typ))
    return fields


def _render_literal(v: Any, typ: str) -> str | None:
    """Exact SQL literal for ``v`` as ``typ``; None when no exact
    rendering exists (the caller then falls back to createDataFrame)."""
    if v is None:
        return f"CAST(NULL AS {typ.upper()})"
    if isinstance(v, bool) and typ != "boolean":
        # bool is an int subclass; createDataFrame would reject it for a
        # numeric column, so the fast path must not silently coerce
        return None
    if typ in ("bigint", "long"):
        return f"{int(v)}L" if isinstance(v, int) else None
    if typ in ("int", "integer"):
        return f"CAST({int(v)} AS INT)" if isinstance(v, int) else None
    if typ == "double":
        if not isinstance(v, (int, float)):
            return None
        f = float(v)
        # repr() of a finite double round-trips bit-exactly through the
        # SQL parser (the _lit_double_array property); non-finite values
        # have no SQL literal form
        return f"{f!r}D" if math.isfinite(f) else None
    if typ == "string":
        if not isinstance(v, str):
            return None
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if typ == "boolean":
        if not isinstance(v, bool):
            return None
        return "true" if v else "false"
    if typ == "array<double>":
        if not isinstance(v, (list, tuple)):
            return None
        if not v:
            return "CAST(array() AS ARRAY<DOUBLE>)"
        elems = [_render_literal(x, "double") for x in v]
        if any(e is None for e in elems):
            return None
        return "array(" + ",".join(elems) + ")"
    return None


def values_frame(spark: SparkSession, rows: Sequence[Sequence[Any]],
                 ddl: str) -> DataFrame:
    """Bounded driver-side rows as ONE parsed ``VALUES`` inline table —
    a LocalRelation (r12, guide §1.2/§4): collects and broadcast builds
    over it execute driver-side with ZERO Spark jobs and zero
    Python-worker round trips, where ``spark.createDataFrame`` ships the
    same rows as a defaultParallelism-sliced pickled RDD — 32 one-row
    Python tasks per downstream action on a 32-core box, measured at
    0.4–3 s per collect/broadcast in the bench (trained BPE rule tables,
    per-iteration Lloyd centroid frames).

    Use ONLY for bounded model-state rows (trained rules, centroids,
    codebooks, metric summaries) — the SQL text embeds every value.
    Rendering is exact for the supported types (``_VALUES_TYPES``);
    any unsupported type or un-renderable value (non-finite double,
    non-str in a string column) falls back to ``createDataFrame`` with
    identical row semantics. Inline-table columns are non-nullable when
    every row is non-NULL (createDataFrame's are always nullable) —
    callers here feed writes, collects and broadcast joins, where
    nullability tightening is inert.
    """
    fields = _split_ddl(ddl)
    if fields is None or not rows:
        return spark.createDataFrame(rows, ddl)
    rendered_rows: list[str] = []
    budget = _VALUES_MAX_SQL
    for row in rows:
        if len(row) != len(fields):
            return spark.createDataFrame(rows, ddl)
        cells = [_render_literal(v, typ)
                 for v, (_, typ) in zip(row, fields)]
        if any(c is None for c in cells):
            return spark.createDataFrame(rows, ddl)
        rendered = "(" + ",".join(cells) + ")"
        budget -= len(rendered) + 1
        if budget < 0:
            # literal-dense payload: eager parse/analysis of the VALUES
            # text costs more than it saves — ship ONE pickled slice
            # (same rows/verification as createDataFrame, 1 task per
            # action instead of defaultParallelism)
            return spark.createDataFrame(
                spark.sparkContext.parallelize(rows, 1), ddl)
        rendered_rows.append(rendered)
    names = ",".join(f"`{n}`" for n, _ in fields)
    return spark.sql("SELECT * FROM VALUES "
                     + ",".join(rendered_rows) + f" AS __v({names})")
