"""Shared DuckDB-oracle SQL fragments for embedding math.

Lives in its own module (no ``@register`` calls) so query modules that only
need the oracle fragments (``dedup.py``'s d06) can import them without
triggering registration of the e-queries — registry insertion order is
driver-visible (see ``_ensure_loaded``).
"""

from __future__ import annotations

_W_MULT = 2654435761 % 1000003  # deterministic hyperplane constant (=427799)

# double-cast list + sequential dot product, 1-based DuckDB list indexing
_E_DBL = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def _dot(a: str, b: str) -> str:
    return (f"list_aggregate(list_transform(range(1, len({a}) + 1),"
            f" i -> {a}[i] * {b}[i]), 'sum')")


def _norm(a: str) -> str:
    return f"sqrt({_dot(a, a)})"


def _bucket_sql(vec: str, num_bits: int = 8) -> str:
    bit_exprs = []
    for b in range(num_bits):
        weight = (f"CASE WHEN ((i - 1) * {_W_MULT} + {b * 40503 + 17}) % 97 < 48 "
                  f"THEN 1.0 ELSE -1.0 END")
        total = (f"list_aggregate(list_transform(range(1, len({vec}) + 1),"
                 f" i -> {vec}[i] * ({weight})), 'sum')")
        bit_exprs.append(f"CASE WHEN {total} > 0 THEN '1' ELSE '0' END")
    return " || ".join(bit_exprs)
