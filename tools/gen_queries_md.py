"""Regenerate QUERIES.md's registry table from the live registry.

Usage: ``python tools/gen_queries_md.py`` from the repo root. The prose
above the table (rotation policy) is preserved; only the table is
rebuilt. ``tests/test_oracle_parity.py::test_queries_md_in_sync`` fails
when the table is stale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = "| # | query | oracle | tags | what it proves |"


def render_table() -> str:
    from projectone_spark.queries import REGISTRY, queries

    queries()
    rows = [HEADER, "|---|---|---|---|---|"]
    for i, (name, spec) in enumerate(REGISTRY.items(), 1):
        doc = " ".join(spec.doc.split())
        if len(doc) > 155:
            doc = doc[:152] + "..."
        oracle = "✓" if spec.oracle else "rows-only"
        rows.append(f"| {i} | `{name}` | {oracle} | {', '.join(spec.tags)} |"
                    f" {doc} |")
    return "\n".join(rows) + "\n"


def regenerate(path: str = "QUERIES.md") -> bool:
    """Rewrite the table in place; returns True when the file changed."""
    old = open(path, encoding="utf-8").read()
    prose = old.split(HEADER)[0]
    new = prose + render_table()
    if new != old:
        open(path, "w", encoding="utf-8").write(new)
        return True
    return False


if __name__ == "__main__":
    changed = regenerate()
    print("QUERIES.md regenerated" if changed else "QUERIES.md up to date")
