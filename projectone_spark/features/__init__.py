"""Input/output "features": the reference's configurable pre/post steps
(``core/schemas/features.py``, applied in
``core/execution/operator/spark_task/input.py``).

Implemented: filter / drop-columns / select-columns (``features.py:21-38``),
JSON-payload schema application (the registry-driven parse,
``core/utils/spark.py:180-246``), and ``{{...}}`` interpolation of secrets
and refresh-window variables (``core/task/spark/task.py:136-209``).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Mapping
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import DataType, StructType


def filter_data(df: DataFrame, condition: str) -> DataFrame:
    """SQL-string predicate on the input (``features.py:21-26``)."""
    return df.filter(condition)


def drop_columns(df: DataFrame, columns: str | list[str]) -> DataFrame:
    """Comma-list column pruning (``features.py:29-32``)."""
    cols = [c.strip() for c in columns.split(",")] if isinstance(columns, str) else columns
    return df.drop(*cols)


def select_columns(df: DataFrame, columns: str | list[str]) -> DataFrame:
    """Comma-list projection (``features.py:35-38``)."""
    cols = [c.strip() for c in columns.split(",")] if isinstance(columns, str) else columns
    return df.select(*cols)


def parse_ddl(ddl: str) -> DataType:
    """Validate/parse a DDL schema string the way the reference does
    (``_parse_datatype_string``, ``core/schemas/sources.py:114-133``)."""
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(ddl)


def apply_json_schema(df: DataFrame, source_column: str,
                      schema: str | StructType,
                      target_column: str | None = None) -> DataFrame:
    """Parse a JSON payload column into a typed struct column — the
    schema-inference-from-registry feature with an explicit schema
    (``core/utils/spark.py:180-246``)."""
    target = target_column or source_column
    parsed = F.from_json(F.col(source_column).cast("string"),
                         parse_ddl(schema) if isinstance(schema, str) else schema)
    return df.withColumn(target, parsed)


_VAR_PATTERN = re.compile(r"\{\{([^}]+)\}\}")


def interpolate(value: Any, variables: Mapping[str, Any],
                secret_resolver: Callable[[str, str], str] | None = None) -> Any:
    """Resolve ``{{name}}`` and ``{{scope/key}}`` placeholders recursively
    over nested config structures (reference pattern
    ``core/secrets/spark_secret.py:9``, resolution ``task.py:136-209``;
    window variables ``{{RangeStart}}``/``{{RangeEnd}}``)."""
    if isinstance(value, str):
        def repl(m: re.Match) -> str:
            token = m.group(1).strip()
            if token in variables:
                return str(variables[token])
            if "/" in token and secret_resolver is not None:
                scope, key = token.split("/", 1)
                return str(secret_resolver(scope, key))
            raise KeyError(f"unresolvable template variable: {{{{{token}}}}}")

        return _VAR_PATTERN.sub(repl, value)
    if isinstance(value, Mapping):
        return {k: interpolate(v, variables, secret_resolver) for k, v in value.items()}
    if isinstance(value, list):
        return [interpolate(v, variables, secret_resolver) for v in value]
    return value


class DictSecretManager:
    """Secret provider backed by a nested dict (the JSON secret-file mode of
    the reference's ``SparkSecretManager``, ``spark_secret.py:12-49``)."""

    def __init__(self, secrets: Mapping[str, Mapping[str, str]]):
        self._secrets = secrets

    def __call__(self, scope: str, key: str) -> str:
        try:
            return self._secrets[scope][key]
        except KeyError as e:
            raise KeyError(f"secret {scope}/{key} not found") from e


#: feature name → callable(df, **options), reference feature registry shape.
INPUT_FEATURES: dict[str, Callable[..., DataFrame]] = {
    "filter_data": filter_data,
    "drop_columns": drop_columns,
    "select_columns": select_columns,
    "schema_inference": apply_json_schema,
}


def apply_input_features(df: DataFrame, features: list[dict]) -> DataFrame:
    """Run configured features in order; each is {"name": ..., **options}."""
    for feat in features or []:
        opts = {k: v for k, v in feat.items() if k != "name"}
        fn = INPUT_FEATURES[feat["name"]]
        df = fn(df, **opts)
    return df
