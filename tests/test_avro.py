"""Dependency-free Avro decoding.

The test encoder below writes real Avro binary (zigzag varints, LE
floats, length-prefixed strings, block-coded arrays/maps, union branch
indexes) so the decoder is exercised against the wire format itself, not
against its own inverse assumptions from the same module.
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timezone

import pytest

from projectone_spark.functions.avro import (
    AvroDecodeError,
    avro_schema_to_spark,
    decode_avro,
    from_avro_df,
)


def _zz(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _string(s: str) -> bytes:
    raw = s.encode()
    return _zz(len(raw)) + raw


_SCHEMA = {
    "type": "record", "name": "Event",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "flags", "type": {"type": "array", "items": "int"}},
        {"name": "attrs", "type": {"type": "map", "values": "string"}},
        {"name": "note", "type": ["null", "string"]},
        {"name": "kind", "type": {"type": "enum", "name": "K",
                                  "symbols": ["view", "purchase"]}},
        {"name": "when", "type": {"type": "long",
                                  "logicalType": "timestamp-micros"}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
    ],
}


def _encode(id_: int, name: str, score: float, flags: list[int],
            attrs: dict[str, str], note: str | None, kind_idx: int,
            when_us: int, day_days: int) -> bytes:
    body = _zz(id_) + _string(name) + struct.pack("<d", score)
    body += (_zz(len(flags)) + b"".join(_zz(f) for f in flags) + _zz(0)
             if flags else _zz(0))
    if attrs:
        body += _zz(len(attrs))
        for k, v in attrs.items():
            body += _string(k) + _string(v)
    body += _zz(0)
    body += (_zz(0) if note is None else _zz(1) + _string(note))
    body += _zz(kind_idx) + _zz(when_us) + _zz(day_days)
    return body


_ROW = dict(id_=7, name="click", score=1.5, flags=[1, -2, 3],
            attrs={"a": "x", "b": "y"}, note="hi", kind_idx=1,
            when_us=1_700_000_000_000_000, day_days=19_700)


def test_decode_record_roundtrip():
    got = decode_avro(_encode(**_ROW), _SCHEMA)
    assert got == {
        "id": 7, "name": "click", "score": 1.5, "flags": [1, -2, 3],
        "attrs": {"a": "x", "b": "y"}, "note": "hi", "kind": "purchase",
        "when": datetime(2023, 11, 14, 22, 13, 20, tzinfo=timezone.utc),
        "day": date(2023, 12, 9),
    }  # tz-AWARE UTC: the instant survives any session timezone (r4 advice)


def test_decode_null_union_and_empty_collections():
    got = decode_avro(
        _encode(id_=1, name="", score=0.0, flags=[], attrs={}, note=None,
                kind_idx=0, when_us=0, day_days=0), _SCHEMA)
    assert got["note"] is None and got["flags"] == [] and got["attrs"] == {}
    assert got["when"] == datetime(1970, 1, 1, tzinfo=timezone.utc)


def test_confluent_wire_header():
    body = _encode(**_ROW)
    framed = b"\x00" + (1234).to_bytes(4, "big") + body
    assert decode_avro(framed, _SCHEMA, confluent_wire=True)["id"] == 7
    with pytest.raises(AvroDecodeError, match="magic"):
        decode_avro(b"\x05" + body, _SCHEMA, confluent_wire=True)


def test_truncated_payload_fails_loudly():
    with pytest.raises(AvroDecodeError):
        decode_avro(_encode(**_ROW)[:5], _SCHEMA)


def test_spark_type_mapping():
    t = avro_schema_to_spark(_SCHEMA)
    assert t.simpleString() == (
        "struct<id:bigint,name:string,score:double,flags:array<int>,"
        "attrs:map<string,string>,note:string,kind:string,"
        "when:timestamp,day:date>")


def test_from_avro_df_distributed(spark):
    rows = [(i, b"\x00" + i.to_bytes(4, "big")
             + _encode(id_=i, name=f"e{i}", score=i / 2, flags=[i],
                       attrs={"k": str(i)}, note=None if i % 2 else "n",
                       kind_idx=i % 2, when_us=i * 1_000_000, day_days=i))
            for i in range(50)]
    df = spark.createDataFrame(rows, "seq int, payload binary")
    out = from_avro_df(df, "payload", _SCHEMA, target_column="event",
                       confluent_wire=True)
    assert [f.name for f in out.schema.fields] == ["seq", "payload", "event"]
    got = {r.seq: r.event for r in out.collect()}
    assert len(got) == 50
    assert got[3].asDict() | {} == {
        "id": 3, "name": "e3", "score": 1.5, "flags": [3],
        "attrs": {"k": "3"}, "note": None, "kind": "purchase",
        "when": datetime(1970, 1, 1, 0, 0, 3), "day": date(1970, 1, 4)}


def test_registry_avro_path_uses_fallback(spark):
    """apply_registry_schema(schema_type='avro') must work without the
    spark-avro jar by routing through the pure-Python decoder."""
    from projectone_spark.features.schema_registry import (
        apply_registry_schema,
    )

    df = spark.createDataFrame(
        [(1, _encode(**_ROW))], "k int, v binary")
    out = apply_registry_schema(df, "v", schema_type="avro",
                                json_schema=_SCHEMA, target_column="parsed")
    row = out.select("parsed.id", "parsed.kind").first()
    assert (row[0], row[1]) == (7, "purchase")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:
    _vals = st.fixed_dictionaries({
        "id_": st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
        "name": st.text(max_size=40),
        "score": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "flags": st.lists(st.integers(min_value=-(2 ** 30), max_value=2 ** 30),
                          max_size=8),
        "attrs": st.dictionaries(st.text(min_size=1, max_size=8),
                                 st.text(max_size=12), max_size=5),
        "note": st.none() | st.text(max_size=20),
        "kind_idx": st.integers(min_value=0, max_value=1),
        "when_us": st.integers(min_value=0, max_value=4_102_444_800_000_000),
        "day_days": st.integers(min_value=-100_000, max_value=100_000),
    })

    @settings(max_examples=200, deadline=None)
    @given(_vals)
    def test_decode_roundtrip_property(v):
        """Any value the wire grammar can carry decodes back exactly —
        including negative zigzags, empty/multi-block collections, unicode
        strings, and both union branches."""
        got = decode_avro(_encode(**v), _SCHEMA)
        assert got["id"] == v["id_"]
        assert got["name"] == v["name"]
        assert got["score"] == v["score"]
        assert got["flags"] == v["flags"]
        assert got["attrs"] == v["attrs"]
        assert got["note"] == v["note"]
        assert got["kind"] == ["view", "purchase"][v["kind_idx"]]


def test_from_avro_df_instant_is_session_tz_invariant(spark):
    """r4 advice: the fallback decoder must yield the same INSTANT as the
    spark-avro jar path in any spark.sql.session.timeZone. Decoding to
    naive wall-clock datetimes made mapInPandas re-interpret them as
    session-local, shifting every value by the tz offset."""
    when_us = 1_700_000_000_000_000
    df = spark.createDataFrame(
        [(1, _encode(id_=1, name="x", score=0.0, flags=[], attrs={},
                     note=None, kind_idx=0, when_us=when_us, day_days=0))],
        "k int, v binary")
    import pyspark.sql.functions as F

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            out = from_avro_df(df, "v", _SCHEMA, target_column="e")
            got = out.select(F.unix_micros("e.when")).first()[0]
            assert got == when_us, f"instant shifted in session tz {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_encode_decode_identity():
    """r5 encoder: encode_avro is the exact inverse of decode_avro over
    the registry-payload subset, including the Confluent wire header."""
    from projectone_spark.functions.avro import decode_avro, encode_avro

    row = dict(_ROW)
    expect = decode_avro(_encode(**row), _SCHEMA)
    assert decode_avro(encode_avro(expect, _SCHEMA), _SCHEMA) == expect
    wire = encode_avro(expect, _SCHEMA, confluent_wire=True, schema_id=7)
    assert wire[0] == 0 and int.from_bytes(wire[1:5], "big") == 7
    assert decode_avro(wire, _SCHEMA, confluent_wire=True) == expect


def test_encode_decode_identity_null_union_and_empty_collections():
    from projectone_spark.functions.avro import decode_avro, encode_avro

    v = decode_avro(
        _encode(id_=1, name="", score=0.0, flags=[], attrs={}, note=None,
                kind_idx=0, when_us=0, day_days=0), _SCHEMA)
    assert decode_avro(encode_avro(v, _SCHEMA), _SCHEMA) == v


def test_to_avro_df_roundtrip_distributed(spark):
    """Struct column → avro binary → struct again across mapInPandas
    stages; values survive bit-for-bit including the null union."""
    import pyspark.sql.functions as F

    from projectone_spark.functions.avro import from_avro_df, to_avro_df

    schema = {"type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"}]}
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"n{i}", i / 4) for i in range(50)],
        "id long, name string, score double")
    packed = df.select(F.struct("id", "name", "score").alias("rec"),
                       F.col("id").alias("orig_id"))
    enc = to_avro_df(packed, "rec", schema, confluent_wire=True, schema_id=3)
    assert dict(enc.dtypes)["rec"] == "binary"
    dec = from_avro_df(enc, "rec", schema, confluent_wire=True)
    rows = {r["orig_id"]: r["rec"] for r in dec.collect()}
    assert len(rows) == 50
    for i in range(50):
        assert rows[i]["id"] == i
        assert rows[i]["name"] == (None if i % 3 == 0 else f"n{i}")
        assert rows[i]["score"] == i / 4


def test_encode_long_out_of_int64_range_raises():
    """Out-of-range ints must fail at ENCODE time: a >64-bit zigzag varint
    round-trips through the decoder as a silently different value."""
    from projectone_spark.functions.avro import AvroEncodeError, _compile_encoder

    enc = _compile_encoder("long")
    out = bytearray()
    enc(123, out)  # in-range fine
    for bad in (1 << 63, -(1 << 63) - 1, 1 << 90):
        with pytest.raises(AvroEncodeError):
            enc(bad, bytearray())
