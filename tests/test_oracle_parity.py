"""Mirror of the driver's correctness gate: every registered query with an
oracle must match DuckDB exactly (columns, row count, normalized values)."""

from __future__ import annotations

import pytest

from projectone_spark.queries import REGISTRY, queries
from tests.conftest import SF_DIR, compare_spark_duckdb

queries()  # force registry load


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(name, spark, duck):
    spec = REGISTRY[name]
    if spec.oracle is None:
        df = spec.fn(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    compare_spark_duckdb(spec.fn(spark, SF_DIR), duck, spec.oracle)
