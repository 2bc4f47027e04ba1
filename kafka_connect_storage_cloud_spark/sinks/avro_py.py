"""Pure-Python Avro Object Container File writer/reader (Avro 1.12 spec).

Why this exists: the reference's default format is Avro
(format/avro/AvroFormat.java + AvroUtils.java), but vanilla PySpark ships
without the spark-avro datasource and this environment cannot fetch jars.
The Avro spec (binary encoding + object container files) is small and
public, so the sink implements it directly: spec-compliant .avro files any
Avro reader can consume, written DISTRIBUTED on the executors (each task
serializes its own partition's rows — the driver never sees record data).

Supported: null/boolean/int/long/float/double/string/bytes, nullable
unions, timestamp-micros and date logical types, arrays of the above, and
top-level records — the full Connect SinkRecord surface the reference's
AvroFormat handles. Codecs: null and deflate (raw RFC-1951, the spec's
required pair); snappy needs python-snappy and raises if requested.

Determinism/exactly-once: the 16-byte sync marker is md5 of the target
file path and files are named part-<chunk>.avro per partition directory,
so replaying the same input rewrites byte-identical files (the same
idempotent-overwrite contract the parquet path gets from dynamic partition
overwrite).

Scale notes: one task per encoded partition group (repartition on the
partition columns), flush_size chunks inside the task. Paths are written
with local file APIs — object stores go through the spark-avro package
when available (writers.py tries it first) or an S3 fuse/NFS mount.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from datetime import date, datetime, timedelta, timezone

MAGIC = b"Obj\x01"
_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_DT = datetime(1970, 1, 1, tzinfo=timezone.utc)
_MICRO = timedelta(microseconds=1)


# ---------------------------------------------------------------------------
# binary encoding primitives
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _unzigzag(acc)
        shift += 7


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(read_long(buf))


# ---------------------------------------------------------------------------
# Spark schema -> Avro schema
# ---------------------------------------------------------------------------

_PRIMS = {
    "boolean": "boolean",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}


def avro_schema_for(spark_schema, name: str = "record0") -> dict:
    """Translate a Spark StructType into an Avro record schema dict."""
    fields = []
    for f in spark_schema.fields:
        fields.append({"name": f.name, "type": _avro_type(f.dataType, f.nullable)})
    return {"type": "record", "name": name, "fields": fields}


def _avro_type(dt, nullable: bool):
    tn = dt.typeName()
    if tn in _PRIMS:
        t = _PRIMS[tn]
    elif tn.startswith("timestamp"):
        t = {"type": "long", "logicalType": "timestamp-micros"}
    elif tn == "date":
        t = {"type": "int", "logicalType": "date"}
    elif tn == "array":
        t = {"type": "array", "items": _avro_type(dt.elementType, dt.containsNull)}
    else:
        raise NotImplementedError(f"avro_py: unsupported Spark type {tn}")
    return ["null", t] if nullable else t


# ---------------------------------------------------------------------------
# datum encode / decode against the derived schema
# ---------------------------------------------------------------------------


def _encode_datum(buf: io.BytesIO, schema, v) -> None:
    if isinstance(schema, list):  # nullable union ["null", T]
        if v is None:
            write_long(buf, 0)
            return
        write_long(buf, 1)
        _encode_datum(buf, schema[1], v)
        return
    if isinstance(schema, dict) and schema.get("type") == "record":
        for f in schema["fields"]:
            _encode_datum(buf, f["type"], v[f["name"]] if hasattr(v, "__getitem__") else getattr(v, f["name"]))
        return
    if isinstance(schema, dict) and schema.get("type") == "array":
        seq = list(v)
        if seq:
            write_long(buf, len(seq))
            for item in seq:
                _encode_datum(buf, schema["items"], item)
        write_long(buf, 0)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    lt = schema.get("logicalType") if isinstance(schema, dict) else None
    if t == "long":
        if lt == "timestamp-micros" and isinstance(v, datetime):
            # naive datetimes are taken as UTC: every read path in this
            # package normalizes through session.ensure_utc, so collected
            # rows are session-UTC. Integer arithmetic (timedelta division)
            # — float seconds * 1e6 can be off by 1us once seconds*1e6
            # exceeds double precision.
            if v.tzinfo is None:
                v = v.replace(tzinfo=timezone.utc)
            v = (v - _EPOCH_DT) // _MICRO
        write_long(buf, int(v))
    elif t == "int":
        if lt == "date" and isinstance(v, date):
            v = (v - _EPOCH_DATE).days
        write_long(buf, int(v))
    elif t == "string":
        write_bytes(buf, v.encode("utf-8"))
    elif t == "bytes":
        write_bytes(buf, bytes(v))
    elif t == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif t == "double":
        buf.write(struct.pack("<d", float(v)))
    elif t == "float":
        buf.write(struct.pack("<f", float(v)))
    elif t == "null":
        pass
    else:
        raise NotImplementedError(f"avro_py: unsupported avro type {t}")


def _decode_datum(buf: io.BytesIO, schema):
    if isinstance(schema, list):
        return None if read_long(buf) == 0 else _decode_datum(buf, schema[1])
    if isinstance(schema, dict) and schema.get("type") == "record":
        return {f["name"]: _decode_datum(buf, f["type"]) for f in schema["fields"]}
    if isinstance(schema, dict) and schema.get("type") == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_decode_datum(buf, schema["items"]))
    t = schema["type"] if isinstance(schema, dict) else schema
    lt = schema.get("logicalType") if isinstance(schema, dict) else None
    if t == "long":
        v = read_long(buf)
        if lt == "timestamp-micros":
            return datetime.fromtimestamp(v / 1_000_000, tz=timezone.utc)
        return v
    if t == "int":
        v = read_long(buf)
        if lt == "date":
            return date.fromordinal(_EPOCH_DATE.toordinal() + v)
        return v
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "bytes":
        return read_bytes(buf)
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "null":
        return None
    raise NotImplementedError(f"avro_py: unsupported avro type {t}")


# ---------------------------------------------------------------------------
# object container file
# ---------------------------------------------------------------------------


def _sync_marker(path: str) -> bytes:
    import hashlib

    return hashlib.md5(path.encode("utf-8")).digest()


def write_container(path: str, schema: dict, rows, codec: str = "null",
                    level: int = -1) -> int:
    """Write rows (dicts or Spark Rows) as one Avro container file; returns
    the record count."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(
            f"avro_py codec {codec!r} unsupported (null|deflate; snappy needs "
            "python-snappy or the spark-avro package)"
        )
    sync = _sync_marker(path)
    body = io.BytesIO()
    count = 0
    for r in rows:
        _encode_datum(body, schema, r)
        count += 1
    data = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(level if level >= 0 else -1, zlib.DEFLATED, -15)
        data = comp.compress(data) + comp.flush()
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    write_long(out, len(meta))
    for k in sorted(meta):
        write_bytes(out, k.encode())
        write_bytes(out, meta[k])
    write_long(out, 0)
    out.write(sync)
    if count:
        write_long(out, count)
        write_bytes(out, data)
        out.write(sync)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())
    return count


def read_container(path: str):
    """Read one .avro container file -> (schema_dict, list of row dicts)."""
    with open(path, "rb") as fh:
        buf = io.BytesIO(fh.read())
    assert buf.read(4) == MAGIC, f"{path}: not an Avro container file"
    meta = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            read_long(buf)
            n = -n
        for _ in range(n):
            k = read_bytes(buf).decode()
            meta[k] = read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    rows = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = read_long(buf)
        block = read_bytes(buf)
        assert buf.read(16) == sync, f"{path}: sync marker mismatch"
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(count):
            rows.append(_decode_datum(bbuf, schema))
    return schema, rows


def read_avro_dir(root: str):
    """All rows from every part-*.avro under root (recursive), with the
    partition-directory key/values folded back in (hive-style layout)."""
    from urllib.parse import unquote

    out = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in sorted(files):
            if not fn.endswith(".avro"):
                continue
            _schema, rows = read_container(os.path.join(dirpath, fn))
            rel = os.path.relpath(dirpath, root)
            parts = {}
            if rel != ".":
                for seg in rel.split(os.sep):
                    if "=" in seg:
                        k, _, v = seg.partition("=")
                        parts[k] = unquote(v)
            for r in rows:
                r.update(parts)
                out.append(r)
    return out


# Spark escapes these characters in partition directory names
# (org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName)
_ESCAPE = set('"#%\'*/:=?\\\x7f{[]^')


def _escape_path_value(v: str) -> str:
    out = []
    for ch in v:
        if ch in _ESCAPE or ord(ch) < 32:
            out.append("%{:02X}".format(ord(ch)))
        else:
            out.append(ch)
    return "".join(out)


def write_avro_partitioned(df, path: str, partition_cols, codec: str,
                           flush_size: int | None = None,
                           level: int = -1,
                           overwrite_partitions: bool = True) -> None:
    """Distributed hive-layout Avro write: repartition on the partition
    columns, each task serializes its groups into
    path/<col>=<val>/part-<chunk>.avro (flush_size rows per chunk).
    Deterministic naming + pre-cleared partition dirs = replaying the same
    input rewrites identical files (dynamic-partition-overwrite analog)."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(
            f"avro_py codec {codec!r} unsupported (null|deflate; snappy needs "
            "python-snappy or the spark-avro package)"
        )
    part = list(partition_cols)
    payload = [c for c in df.columns if c not in part]
    schema_struct = df.select(*payload).schema
    avro_schema = avro_schema_for(schema_struct)

    if overwrite_partitions:
        # clear exactly the partitions present in this batch (dir list is
        # partition-count sized, never record sized)
        vals = [tuple(r) for r in df.select(*part).distinct().collect()]
        import shutil

        for tup in vals:
            sub = os.path.join(
                path, *[f"{c}={_escape_path_value(str(v))}" for c, v in zip(part, tup)]
            )
            shutil.rmtree(sub, ignore_errors=True)

    chunk = flush_size or 1_000_000

    def write_group(it):
        # input arrives sorted by (part, payload) within the task, so each
        # partition key is one contiguous run: stream it, flushing a
        # container every `chunk` rows and on key change. Executor memory
        # holds at most one chunk — a hot partition key never buffers its
        # whole partition.
        cur_key: tuple | None = None
        buf_rows: list = []
        file_idx = 0

        def flush() -> None:
            nonlocal buf_rows, file_idx
            if not buf_rows:
                return
            sub = os.path.join(
                path,
                *[f"{c}={_escape_path_value(v)}" for c, v in zip(part, cur_key)],
            )
            write_container(
                os.path.join(sub, f"part-{file_idx:05d}.avro"),
                avro_schema,
                (dict(zip(payload, r)) for r in buf_rows),
                codec=codec,
                level=level,
            )
            file_idx += 1
            buf_rows = []

        for row in it:
            key = tuple(str(row[c]) for c in part)
            if key != cur_key:
                flush()
                cur_key, file_idx = key, 0
            buf_rows.append([row[c] for c in payload])
            if len(buf_rows) >= chunk:
                flush()
        flush()

    ordered = df.repartition(*part).sortWithinPartitions(*part, *payload)
    ordered.foreachPartition(write_group)


# ---------------------------------------------------------------------------
# distributed read-back
# ---------------------------------------------------------------------------

_TO_SPARK = {
    "long": "long",
    "int": "int",
    "string": "string",
    "boolean": "boolean",
    "double": "double",
    "float": "float",
    "bytes": "binary",
    "null": "string",
}


def _spark_type_for(avro_type) -> str:
    """Inverse of _avro_type: an Avro field type as a Spark DDL string."""
    if isinstance(avro_type, list):  # nullable union ["null", T]
        inner = [t for t in avro_type if t != "null"]
        return _spark_type_for(inner[0] if inner else "null")
    if isinstance(avro_type, dict):
        lt = avro_type.get("logicalType")
        if lt == "timestamp-micros":
            return "timestamp"
        if lt == "date":
            return "date"
        if avro_type.get("type") == "array":
            return f"array<{_spark_type_for(avro_type['items'])}>"
        return _spark_type_for(avro_type["type"])
    return _TO_SPARK[avro_type]


def spark_ddl_for(avro_schema: dict) -> str:
    """Spark DDL schema string for an Avro record schema."""
    return ", ".join(
        f"{f['name']} {_spark_type_for(f['type'])}" for f in avro_schema["fields"]
    )


def read_avro_distributed(spark, path: str):
    """Distributed read-back of a hive-layout Avro dataset written by
    write_avro_partitioned (or any spec-compliant writer): the file list is
    parallelized and each TASK parses its own containers with the
    pure-Python decoder, so the driver never touches record data. Partition
    directory key/values fold back in as string columns, mirroring Spark's
    partition discovery. The schema comes from the first container's
    header (one small driver-side read)."""
    import glob as _g
    from urllib.parse import unquote

    from ..session import ship_package

    files = sorted(_g.glob(os.path.join(path, "**", "*.avro"), recursive=True))
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    ship_package(spark)
    schema0, _rows = read_container(files[0])
    part_keys = []
    rel = os.path.relpath(os.path.dirname(files[0]), path)
    if rel != ".":
        part_keys = [seg.partition("=")[0] for seg in rel.split(os.sep) if "=" in seg]
    ddl = spark_ddl_for(schema0)
    if part_keys:
        ddl += ", " + ", ".join(f"{k} string" for k in part_keys)
    root = path

    def parse(batches):
        import pandas as pd

        from kafka_connect_storage_cloud_spark.sinks.avro_py import read_container as rc

        for pdf in batches:
            out = []
            for fp in pdf["path"]:
                _schema, rows = rc(fp)
                relp = os.path.relpath(os.path.dirname(fp), root)
                parts = {}
                if relp != ".":
                    for seg in relp.split(os.sep):
                        if "=" in seg:
                            k, _, v = seg.partition("=")
                            parts[k] = unquote(v)
                for r in rows:
                    r.update(parts)
                    out.append(r)
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {f["name"]: [] for f in schema0["fields"]}
            )

    paths = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        min(len(files), 64)
    )
    return paths.mapInPandas(parse, ddl)
