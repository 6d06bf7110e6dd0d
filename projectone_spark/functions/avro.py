"""Dependency-free Avro binary decoding for schema-registry payloads.

Reference surface: ``core/utils/spark.py:145-246`` applies ``from_avro``
to a payload column with a registry-fetched writer schema. That needs the
spark-avro jar; this module provides the same semantics when the jar is
absent — an Avro schema (JSON dict) is compiled to (a) the matching Spark
``StructType`` and (b) a pure-Python binary decoder run as an
Arrow-batched ``mapInPandas`` stage, so payload parsing stays distributed
(one pass over the binary column, no driver collect) on any cluster.

Avro binary is simple enough to decode without a library: zigzag varints
for int/long, little-endian IEEE float/double, length-prefixed
bytes/string, fields in schema order for records, block-encoded
arrays/maps, a varint branch index for unions. Logical types
timestamp-millis/micros → TIMESTAMP and date → DATE are honored; unions
are supported in the registry-payload shape ``["null", T]``.

Confluent wire format (magic 0x00 + 4-byte big-endian schema id + body)
is stripped with ``confluent_wire=True`` — the common Kafka layout.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from datetime import date, datetime, timedelta, timezone
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_EPOCH_DATE = date(1970, 1, 1)
_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


class AvroDecodeError(ValueError):
    """Malformed Avro binary or an unsupported schema shape."""


# ---------------------------------------------------------------------------
# schema → Spark type
# ---------------------------------------------------------------------------

def avro_schema_to_spark(schema: Any) -> DataType:
    """Avro schema (parsed JSON) → Spark type, mirroring spark-avro's
    mapping for the subset a registry payload uses."""
    if isinstance(schema, str):
        prim = {
            "null": StringType(), "boolean": BooleanType(),
            "int": IntegerType(), "long": LongType(),
            "float": FloatType(), "double": DoubleType(),
            "bytes": BinaryType(), "string": StringType(),
        }
        if schema not in prim:
            raise AvroDecodeError(f"unknown avro type {schema!r}")
        return prim[schema]
    if isinstance(schema, list):  # union
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise AvroDecodeError(
                f"only ['null', T] unions are supported, got {schema!r}")
        return avro_schema_to_spark(non_null[0])
    t = schema["type"]
    logical = schema.get("logicalType")
    if t == "long" and logical in ("timestamp-millis", "timestamp-micros"):
        return TimestampType()
    if t == "int" and logical == "date":
        return DateType()
    if t == "record":
        return StructType([
            StructField(f["name"], avro_schema_to_spark(f["type"]), True)
            for f in schema["fields"]])
    if t == "array":
        return ArrayType(avro_schema_to_spark(schema["items"]), True)
    if t == "map":
        return MapType(StringType(), avro_schema_to_spark(schema["values"]), True)
    if t == "enum":
        return StringType()
    if t == "fixed":
        return BinaryType()
    return avro_schema_to_spark(t)  # {"type": "string"} wrapper form


# ---------------------------------------------------------------------------
# binary decoder
# ---------------------------------------------------------------------------

class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise AvroDecodeError("truncated avro binary")
        self.pos += n
        return b

    def zigzag(self) -> int:
        shift, acc = 0, 0
        while True:
            if self.pos >= len(self.buf):
                raise AvroDecodeError("truncated varint")
            byte = self.buf[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)


def _compile(schema: Any) -> Callable[[_Reader], Any]:
    """Compile the schema ONCE into a closure tree — per-value decoding does
    no schema inspection (this runs per row inside executors)."""
    if isinstance(schema, str):
        return _PRIMITIVES[schema]
    if isinstance(schema, list):
        branches = [_compile(s) for s in schema]

        def union(r: _Reader) -> Any:
            idx = r.zigzag()
            if not 0 <= idx < len(branches):
                raise AvroDecodeError(f"union branch {idx} out of range")
            return branches[idx](r)

        return union
    t = schema["type"]
    logical = schema.get("logicalType")
    # tz-AWARE UTC datetimes, deliberately: Arrow carries the instant
    # explicitly, so the decoded value is identical in any
    # spark.sql.session.timeZone. A naive datetime would be re-interpreted
    # as session-LOCAL wall clock by mapInPandas, silently shifting every
    # instant by the tz offset relative to the spark-avro jar path this
    # decoder twins (r4 advice).
    if t == "long" and logical == "timestamp-millis":
        return lambda r: _EPOCH + timedelta(milliseconds=r.zigzag())
    if t == "long" and logical == "timestamp-micros":
        return lambda r: _EPOCH + timedelta(microseconds=r.zigzag())
    if t == "int" and logical == "date":
        return lambda r: _EPOCH_DATE + timedelta(days=r.zigzag())
    if t == "record":
        fields = [(f["name"], _compile(f["type"])) for f in schema["fields"]]

        def record(r: _Reader) -> dict:
            return {name: dec(r) for name, dec in fields}

        return record
    if t == "array":
        item = _compile(schema["items"])

        def array(r: _Reader) -> list:
            out = []
            while True:
                n = r.zigzag()
                if n == 0:
                    return out
                if n < 0:  # block size prefix follows a negative count
                    n = -n
                    r.zigzag()
                for _ in range(n):
                    out.append(item(r))

        return array
    if t == "map":
        val = _compile(schema["values"])

        def avro_map(r: _Reader) -> dict:
            out: dict = {}
            while True:
                n = r.zigzag()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.zigzag()
                for _ in range(n):
                    k = _PRIMITIVES["string"](r)
                    out[k] = val(r)

        return avro_map
    if t == "enum":
        symbols = schema["symbols"]
        return lambda r: symbols[r.zigzag()]
    if t == "fixed":
        size = schema["size"]
        return lambda r: r.read(size)
    return _compile(t)


_PRIMITIVES: dict[str, Callable[[_Reader], Any]] = {
    "null": lambda r: None,
    "boolean": lambda r: r.read(1) == b"\x01",
    "int": lambda r: r.zigzag(),
    "long": lambda r: r.zigzag(),
    "float": lambda r: struct.unpack("<f", r.read(4))[0],
    "double": lambda r: struct.unpack("<d", r.read(8))[0],
    "bytes": lambda r: r.read(r.zigzag()),
    "string": lambda r: r.read(r.zigzag()).decode("utf-8"),
}


def decode_avro(payload: bytes, schema: Any, *,
                confluent_wire: bool = False) -> Any:
    """Decode one Avro binary value (driver-side/test helper; the
    distributed path is :func:`from_avro_df`)."""
    if confluent_wire:
        if len(payload) < 5 or payload[0] != 0:
            raise AvroDecodeError("not Confluent wire format (magic != 0)")
        payload = payload[5:]
    return _compile(schema)(_Reader(payload))


# ---------------------------------------------------------------------------
# DataFrame surface
# ---------------------------------------------------------------------------

def from_avro_df(df: DataFrame, source_column: str, schema: dict, *,
                 target_column: str | None = None,
                 confluent_wire: bool = False) -> DataFrame:
    """Parse a binary Avro column into a typed struct column — the
    jar-free twin of ``pyspark.sql.avro.functions.from_avro`` (reference
    ``core/utils/spark.py:145-246``). Arrow-batched ``mapInPandas``: the
    schema compiles once per task, rows decode in C-speed closures, and
    every other column passes through untouched."""
    import pandas as pd

    spark_type = avro_schema_to_spark(schema)
    target = target_column or source_column
    out_fields = [f for f in df.schema.fields if f.name != target]
    out_schema = StructType(out_fields + [StructField(target, spark_type, True)])
    src_idx = source_column

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _compile(schema)
        skip = 5 if confluent_wire else 0
        for pdf in batches:
            def one(v: Any) -> Any:
                if v is None:
                    return None
                b = bytes(v)
                if skip:
                    if len(b) < 5 or b[0] != 0:
                        raise AvroDecodeError("bad Confluent wire header")
                    b = b[5:]
                return dec(_Reader(b))

            decoded = [one(v) for v in pdf[src_idx]]
            out = pdf[[f.name for f in out_fields]].copy()
            out[target] = decoded
            yield out

    return df.mapInPandas(decode_batches, out_schema)
