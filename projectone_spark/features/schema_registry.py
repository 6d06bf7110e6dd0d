"""Schema-registry-driven payload parsing.

Reference surface (``core/schemas/features.py:73-106`` config;
``core/utils/spark.py:29-111`` JSON-schema → StructType converter,
``:145-246`` registry fetch + from_json/from_avro application): a payload
column (Kafka value, event blob) is parsed with a schema fetched from a
Confluent-style registry — subject ``{topic}-value`` — or supplied inline.

The JSON-schema converter and ``from_json`` path are fully implemented;
``from_avro`` prefers the spark-avro jar and falls back to the
dependency-free decoder in :mod:`projectone_spark.functions.avro` where
the jar is absent. The registry fetch uses an injectable transport (same
pattern as the OData connector) so tests run offline.
"""

from __future__ import annotations

import json
from typing import Any, Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def json_schema_to_spark(schema: dict[str, Any]) -> DataType:
    """JSON-schema → Spark type (reference ``json_schema_to_spark``,
    ``core/utils/spark.py:29-111``): object→Struct, array→Array,
    number→Float, integer→Integer, long/double/boolean as named,
    string(format=date-time)→Timestamp, string(format=date)→Date."""
    t = schema.get("type")
    if t == "object":
        fields = [StructField(name, json_schema_to_spark(sub), True)
                  for name, sub in (schema.get("properties") or {}).items()]
        return StructType(fields)
    if t == "array":
        return ArrayType(json_schema_to_spark(schema.get("items", {})), True)
    if t == "string":
        fmt = schema.get("format")
        if fmt == "date-time":
            return TimestampType()
        if fmt == "date":
            return DateType()
        return StringType()
    if t == "number":
        return FloatType()
    if t == "integer":
        return IntegerType()
    if t == "long":
        return LongType()
    if t == "double":
        return DoubleType()
    if t == "boolean":
        return BooleanType()
    return StringType()


class SchemaRegistryClient:
    """Minimal Confluent-style registry client: GET
    ``/subjects/{subject}/versions/latest`` → {"schema": "<json>"}."""

    def __init__(self, url: str,
                 transport: Callable[[str], bytes] | None = None):
        self.url = url.rstrip("/")
        self._transport = transport or _http_get

    def latest_schema(self, subject: str) -> dict[str, Any]:
        body = self._transport(f"{self.url}/subjects/{subject}/versions/latest")
        return json.loads(json.loads(body)["schema"])


def _http_get(url: str) -> bytes:  # pragma: no cover - needs network
    from urllib.request import urlopen

    with urlopen(url, timeout=30) as resp:
        return resp.read()


def apply_registry_schema(df: DataFrame, source_column: str, *,
                          schema_type: str = "json",
                          json_schema: dict[str, Any] | None = None,
                          registry: SchemaRegistryClient | None = None,
                          subject: str | None = None,
                          target_column: str | None = None) -> DataFrame:
    """Parse ``source_column`` into a typed struct using an inline or
    registry-fetched schema (reference ``core/utils/spark.py:180-246``)."""
    if json_schema is None:
        assert registry is not None and subject is not None, \
            "need json_schema or registry+subject"
        json_schema = registry.latest_schema(subject)
    target = target_column or source_column
    if schema_type == "json":
        spark_schema = json_schema_to_spark(json_schema)
        parsed = F.from_json(F.col(source_column).cast("string"), spark_schema)
        return df.withColumn(target, parsed)
    if schema_type == "avro":
        from pyspark.errors import AnalysisException

        try:
            # the python wrapper imports without the jar; analysis is what
            # fails (AVRO_NOT_LOADED) — withColumn analyzes eagerly, so a
            # missing spark-avro package is caught right here
            from pyspark.sql.avro.functions import from_avro

            return df.withColumn(
                target, from_avro(F.col(source_column), json.dumps(json_schema)))
        except (ImportError, AnalysisException):
            # jar-free twin: same schema, same struct output, Arrow-batched
            from projectone_spark.functions.avro import from_avro_df

            return from_avro_df(df, source_column, json_schema,
                                target_column=target)
    raise ValueError(f"unknown schema_type {schema_type!r}")
