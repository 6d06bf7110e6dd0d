"""Data-quality expectations — declarative row-level checks evaluated
inside the writing job via ``DataFrame.observe``, no second scan.

The reference's only data gate is the referential ``table_constraint``
anti-join (``core/execution/write.py:1165-1189``, ours in
``writers.check_table_constraints``); pipelines also need row-level
predicates ("ship date not in the future", "price positive") with a
per-rule disposition. Modeled on Delta Live Tables expectations:

- ``warn``  — count violations, keep the rows;
- ``drop``  — count violations, filter the rows out;
- ``fail``  — count violations, raise after the action if any.

All counting rides the job's own pass through the data via an
``Observation`` (an accumulator-backed aggregate piggybacked on the
action) — at 100 TB an extra validation scan is a second 100 TB read;
this costs one comparison per row in the stage already running.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: str  # SQL boolean expression; NULL counts as a violation
    action: Literal["warn", "drop", "fail"] = "warn"


class ExpectationViolation(Exception):
    def __init__(self, failures: dict[str, int]):
        self.failures = failures
        super().__init__(f"expectations failed: {failures}")


def apply_expectations(df: DataFrame,
                       expectations: list[Expectation],
                       ) -> tuple[DataFrame, Observation]:
    """Attach violation counters for every expectation and drop rows
    violating ``drop``-mode rules. Returns (df, observation); run an action
    on the returned frame, then call :func:`check` with the observation.

    The observed metrics are per-rule violation counts plus ``__rows__``
    (rows seen pre-drop). Dropping uses the same predicate instance, so a
    row is either counted-and-kept (warn/fail) or counted-and-removed
    (drop) — never silently removed.
    """
    metrics = [F.count(F.lit(1)).alias("__rows__")]
    for e in expectations:
        ok = F.expr(e.predicate)
        metrics.append(
            F.sum(F.when(~F.coalesce(ok, F.lit(False)), 1).otherwise(0))
            .alias(e.name))
    obs = Observation()
    observed = df.observe(obs, *metrics)
    drops = [e for e in expectations if e.action == "drop"]
    for e in drops:
        observed = observed.filter(F.coalesce(F.expr(e.predicate), F.lit(False)))
    return observed, obs


def check(obs: Observation, expectations: list[Expectation]) -> dict[str, int]:
    """Read the observed counts (the action must have completed). Raises
    :class:`ExpectationViolation` if any ``fail``-mode rule was violated;
    returns {rule: violation_count} plus ``__rows__`` otherwise."""
    got = dict(obs.get)
    failures = {e.name: int(got[e.name]) for e in expectations
                if e.action == "fail" and got.get(e.name)}
    if failures:
        raise ExpectationViolation(failures)
    return {k: int(v) for k, v in got.items()}


def expect_and_write(df: DataFrame, expectations: list[Expectation],
                     write_fn) -> dict[str, int]:
    """Convenience: apply expectations, run ``write_fn(clean_df)`` (the
    action), then enforce/report — the single-pass write-with-gates idiom.
    """
    observed, obs = apply_expectations(df, expectations)
    write_fn(observed)
    return check(obs, expectations)
