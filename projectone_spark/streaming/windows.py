"""Event-time windowing + late-data handling.

These are the Spark-native streaming operators the reference lacks
(SURVEY §2.11 "Absent from reference"): watermarks, tumbling/sliding
windows, session windows, within-watermark dedup. All are thin
declarative compositions — Catalyst plans the stateful aggregation; the
watermark bounds state.

Every helper works identically on batch DataFrames (Spark defines
``F.window``/``F.session_window`` for both), which is how the oracle
checks validate the semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if watermark else df


def _flatten(out: DataFrame, window_col: str, start: str, end: str) -> DataFrame:
    """Replace the struct window column with flat start/end timestamps.

    ``groupBy(window, *keys).agg(*aggs)`` puts the window struct first; the
    remaining columns (keys, then aliased aggregates) pass through by name.
    """
    rest = [c for c in out.columns if c != window_col]
    return out.select(F.col(f"{window_col}.start").alias(start),
                      F.col(f"{window_col}.end").alias(end), *rest)


def tumbling_window_agg(df: DataFrame, ts_col: str, duration: str,
                        aggs: Sequence[Column], *,
                        keys: Sequence[str] = (),
                        watermark: str | None = None) -> DataFrame:
    """Non-overlapping event-time windows: one state bucket per
    (window, keys); map-side partial aggregation applies before the
    shuffle, so input volume — not key cardinality — never crosses the
    network."""
    out = (_with_watermark(df, ts_col, watermark)
           .groupBy(F.window(ts_col, duration), *keys).agg(*aggs))
    return _flatten(out, "window", "window_start", "window_end")


def sliding_window_agg(df: DataFrame, ts_col: str, duration: str, slide: str,
                       aggs: Sequence[Column], *,
                       keys: Sequence[str] = (),
                       watermark: str | None = None) -> DataFrame:
    """Overlapping windows: each row lands in duration/slide windows."""
    out = (_with_watermark(df, ts_col, watermark)
           .groupBy(F.window(ts_col, duration, slide), *keys).agg(*aggs))
    return _flatten(out, "window", "window_start", "window_end")


def session_window_agg(df: DataFrame, ts_col: str, gap: str,
                       aggs: Sequence[Column], *,
                       keys: Sequence[str] = (),
                       watermark: str | None = None) -> DataFrame:
    """Dynamic-length sessions: a session closes after ``gap`` of
    inactivity per key. State size is bounded by the watermark."""
    out = (_with_watermark(df, ts_col, watermark)
           .groupBy(F.session_window(ts_col, gap), *keys).agg(*aggs))
    return _flatten(out, "session_window", "session_start", "session_end")


def dedup_within_watermark(df: DataFrame, cols: Sequence[str], ts_col: str,
                           delay: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark``: exact dedup whose state expires
    with the watermark — the streaming analogue of hash-groupBy dedup
    that stays bounded on an infinite stream."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(cols))
