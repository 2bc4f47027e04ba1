"""Property-based roundtrip tests for the pure-Python Avro container
writer/reader (sinks/avro_py.py) — the spec-compliance gate for the
un-gated Avro sink (reference format/avro/AvroFormat.java)."""

import io
from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_storage_cloud_spark.sinks import avro_py as A


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_long_zigzag_roundtrip(n):
    buf = io.BytesIO()
    A.write_long(buf, n)
    buf.seek(0)
    assert A.read_long(buf) == n


_ROW = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=-(2**62), max_value=2**62),
        "name": st.one_of(st.none(), st.text(max_size=40)),
        "score": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "flag": st.booleans(),
        "payload": st.one_of(st.none(), st.binary(max_size=24)),
        "tags": st.lists(st.integers(min_value=-1000, max_value=1000), max_size=5),
        "ts": st.datetimes(
            min_value=datetime(1970, 1, 2), max_value=datetime(2100, 1, 1)
        ).map(lambda d: d.replace(tzinfo=timezone.utc, microsecond=0)),
    }
)

_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "payload", "type": ["null", "bytes"]},
        {"name": "tags", "type": {"type": "array", "items": "int"}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
    ],
}


@settings(max_examples=40, deadline=None)
@given(st.lists(_ROW, max_size=25), st.sampled_from(["null", "deflate"]))
def test_container_roundtrip(tmp_path_factory, rows, codec):
    path = str(tmp_path_factory.mktemp("avro") / "t.avro")
    A.write_container(path, _SCHEMA, rows, codec=codec)
    schema, back = A.read_container(path)
    assert schema == _SCHEMA
    assert back == rows


@settings(max_examples=20, deadline=None)
@given(st.lists(_ROW, min_size=1, max_size=10))
def test_container_rewrite_is_byte_identical(tmp_path_factory, rows):
    d = tmp_path_factory.mktemp("avro_b")
    p1 = str(d / "x.avro")
    A.write_container(p1, _SCHEMA, rows, codec="deflate")
    b1 = open(p1, "rb").read()
    A.write_container(p1, _SCHEMA, rows, codec="deflate")
    assert open(p1, "rb").read() == b1
