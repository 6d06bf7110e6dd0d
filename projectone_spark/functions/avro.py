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


class AvroError(ValueError):
    """Base for codec failures (decode and encode sides)."""


class AvroEncodeError(AvroError):
    """Encode-side failure: a value the schema cannot represent
    faithfully (e.g. an int outside signed 64 bits) — raised at encode
    time instead of letting the decoder read back a different value."""


class AvroDecodeError(AvroError):
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


# ---------------------------------------------------------------------------
# encoding (the sink-side twin of the decoder)
# ---------------------------------------------------------------------------

def _zigzag_encode(n: int, out: bytearray) -> None:
    if not (-(1 << 63) <= n < (1 << 63)):
        # out-of-range ints would encode to a longer varint the decoder
        # reads back as a DIFFERENT value — fail at encode time instead
        raise AvroEncodeError(f"long out of signed 64-bit range: {n}")
    n = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _compile_encoder(schema: Any) -> Callable[[Any, bytearray], None]:
    """Compile an Avro schema to ``fn(value, out_bytearray)`` — the exact
    inverse of :func:`_compile`, covering the same registry-payload
    subset (primitives, records, arrays, maps, ``["null", T]`` unions,
    timestamp/date logical types)."""
    if isinstance(schema, list):  # union — registry shape ["null", T]
        branches = schema
        null_idx = next((i for i, b in enumerate(branches) if b == "null"), None)
        others = [(i, _compile_encoder(b)) for i, b in enumerate(branches)
                  if b != "null"]
        if null_idx is None or len(others) != 1:
            raise AvroEncodeError(f"unsupported union for encoding: {schema}")
        val_idx, val_enc = others[0]

        def union(v: Any, out: bytearray) -> None:
            if v is None:
                _zigzag_encode(null_idx, out)
            else:
                _zigzag_encode(val_idx, out)
                val_enc(v, out)

        return union

    t = schema if isinstance(schema, str) else schema.get("type")
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if t in ("int", "long"):
        if logical in ("timestamp-millis", "timestamp-micros"):
            unit = 1_000 if logical == "timestamp-millis" else 1_000_000

            def ts(v: Any, out: bytearray) -> None:
                if isinstance(v, datetime):
                    base = v if v.tzinfo else v.replace(tzinfo=timezone.utc)
                    v = int((base - _EPOCH).total_seconds() * unit)
                _zigzag_encode(int(v), out)

            return ts
        if logical == "date":
            def d(v: Any, out: bytearray) -> None:
                if isinstance(v, date):
                    v = (v - _EPOCH_DATE).days
                _zigzag_encode(int(v), out)

            return d
        return lambda v, out: _zigzag_encode(int(v), out)
    if t == "boolean":
        return lambda v, out: out.append(1 if v else 0)
    if t == "float":
        return lambda v, out: out.extend(struct.pack("<f", float(v)))
    if t == "double":
        return lambda v, out: out.extend(struct.pack("<d", float(v)))
    if t in ("string", "bytes"):
        def s(v: Any, out: bytearray) -> None:
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            _zigzag_encode(len(b), out)
            out.extend(b)

        return s
    if t == "null":
        return lambda v, out: None
    if t == "enum":
        index = {s: i for i, s in enumerate(schema["symbols"])}

        def enum(v: Any, out: bytearray) -> None:
            _zigzag_encode(index[v], out)

        return enum
    if t == "record":
        fields = [(f["name"], _compile_encoder(f["type"]))
                  for f in schema["fields"]]

        def record(v: Any, out: bytearray) -> None:
            for name, enc in fields:
                enc(v[name], out)

        return record
    if t == "array":
        item = _compile_encoder(schema["items"])

        def arr(v: Any, out: bytearray) -> None:
            items = list(v)
            if items:
                _zigzag_encode(len(items), out)
                for x in items:
                    item(x, out)
            _zigzag_encode(0, out)

        return arr
    if t == "map":
        val = _compile_encoder(schema["values"])

        def m(v: Any, out: bytearray) -> None:
            entries = dict(v)
            if entries:
                _zigzag_encode(len(entries), out)
                for k, x in entries.items():
                    b = k.encode("utf-8")
                    _zigzag_encode(len(b), out)
                    out.extend(b)
                    val(x, out)
            _zigzag_encode(0, out)

        return m
    raise AvroEncodeError(f"unsupported Avro type for encoding: {schema!r}")


def encode_avro(value: Any, schema: Any, *,
                confluent_wire: bool = False, schema_id: int = 0) -> bytes:
    """Encode one value (driver-side/test helper; the distributed path is
    :func:`to_avro_df`)."""
    out = bytearray()
    if confluent_wire:
        out.append(0)
        out.extend(schema_id.to_bytes(4, "big"))
    _compile_encoder(schema)(value, out)
    return bytes(out)


def to_avro_df(df: DataFrame, source_column: str, schema: dict, *,
               target_column: str | None = None,
               confluent_wire: bool = False,
               schema_id: int = 0) -> DataFrame:
    """Encode a struct column to Avro binary — the jar-free twin of
    ``pyspark.sql.avro.functions.to_avro`` and the sink-side mirror of
    :func:`from_avro_df`. Arrow-batched ``mapInPandas``; every other
    column passes through untouched."""
    import pandas as pd

    target = target_column or source_column
    out_fields = [f for f in df.schema.fields if f.name != target]
    out_schema = StructType(out_fields + [StructField(target, BinaryType(), True)])
    header = bytes([0]) + schema_id.to_bytes(4, "big") if confluent_wire else b""

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = _compile_encoder(schema)

        def one(v: Any) -> Any:
            if v is None:
                return None
            out = bytearray(header)
            enc(v, out)
            return bytes(out)

        for pdf in batches:
            encoded = [one(v) for v in pdf[source_column]]
            out = pdf[[f.name for f in out_fields]].copy()
            out[target] = encoded
            yield out

    return df.mapInPandas(encode_batches, out_schema)
