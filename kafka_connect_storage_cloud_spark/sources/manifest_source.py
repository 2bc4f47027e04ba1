"""Custom Python Data Source (Spark 4 pyspark.sql.datasource API) exposing a
landed connector dataset's COMMIT MANIFEST as a first-class readable format:

    spark.read.format("connector_manifest").load(output_path)

Rows are the committed files (file_path, encoded_partition, record_count,
min_offset, max_offset, kafka_partition) parsed from the `_manifest` sidecar
`run_connector` persists — the same metadata the reference tracks internally
(`util/FileRotationTracker.java`, committed-file scanning in
TopicPartitionWriter.findNextAvailableFile). Downstream consumers use it to
tail new files, verify exactly-once invariants, or plan compactions without
listing the object store.

Scale/shape: one InputPartition per manifest shard file — the source reads
manifest-sized data (thousands of rows for millions of records), never the
record payloads. Implemented with the stock API so it runs on any Spark 4
cluster with no JVM code.
"""

from __future__ import annotations

import glob as _glob
import json as _json
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("file_path", StringType()),
        StructField("encoded_partition", StringType()),
        StructField("kafka_partition", IntegerType()),
        StructField("record_count", LongType()),
        StructField("min_offset", LongType()),
        StructField("max_offset", LongType()),
    ]
)

_FILE_KEY_RE = re.compile(r"^(?P<topic>[^/]+)/(?P<enc>.+)/[^/]+\+(?P<part>\d+)\+\d+\.\w+$")


class _ManifestPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ManifestReader(DataSourceReader):
    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("connector_manifest requires a load(path)")

    def partitions(self):
        shards = sorted(_glob.glob(os.path.join(self.root, "_manifest", "*.json")))
        if not shards:
            raise FileNotFoundError(f"no _manifest sidecar under {self.root}")
        return [_ManifestPartition(p) for p in shards]

    def read(self, partition):
        with open(partition.path) as fh:
            for line in fh:
                if not line.strip():
                    continue
                row = _json.loads(line)
                m = _FILE_KEY_RE.match(row["file_path"])
                enc = m.group("enc") if m else None
                part = int(m.group("part")) if m else None
                yield (
                    row["file_path"],
                    enc,
                    part,
                    int(row["record_count"]),
                    int(row["min_offset"]),
                    int(row["max_offset"]),
                )


def _load_manifest_rows(root: str) -> dict:
    """Current manifest as {file_path: full row tuple} (parsed fields
    included). Missing sidecar -> empty (a tailer may start before the
    first commit)."""
    rows = {}
    for shard in sorted(_glob.glob(os.path.join(root, "_manifest", "*.json"))):
        with open(shard) as fh:
            for line in fh:
                if not line.strip():
                    continue
                row = _json.loads(line)
                m = _FILE_KEY_RE.match(row["file_path"])
                rows[row["file_path"]] = (
                    row["file_path"],
                    m.group("enc") if m else None,
                    int(m.group("part")) if m else None,
                    int(row["record_count"]),
                    int(row["min_offset"]),
                    int(row["max_offset"]),
                )
    return rows


def _offset_maxo(v):
    """max_offset from an offset-map value: [record_count, min_offset,
    max_offset] snapshot (current format) or a bare int (legacy)."""
    return int(v[2]) if isinstance(v, (list, tuple)) else int(v)


def _snapshot_row(path: str, vals) -> tuple:
    """Reconstruct a full manifest row from the offset snapshot alone."""
    m = _FILE_KEY_RE.match(path)
    return (
        path,
        m.group("enc") if m else None,
        int(m.group("part")) if m else None,
        int(vals[0]),
        int(vals[1]),
        int(vals[2]),
    )


class ManifestStreamReader(SimpleDataSourceStreamReader):
    """Streaming tailer over the commit manifest: each micro-batch emits the
    files that are NEW or have GROWN (higher max_offset) since the last
    checkpointed offset — landed_files_diff as a live source. The offset is
    the {file_path: [record_count, min_offset, max_offset]} snapshot map
    (manifest-sized, never record-sized). Because the end offset snapshots
    the full row payload, a crash-recovery replay of a committed range is
    reconstructed FROM THE SNAPSHOT, never from the live manifest — so a
    file that grew after the original batch replays with the original
    values and the growth is emitted exactly once, in its own later batch
    (the reference's recovery contract: TopicPartitionWriter resumes from
    committed offsets, not from current object-store state)."""

    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("connector_manifest requires a load(path)")

    def initialOffset(self) -> dict:
        return {"seen": "{}"}

    def read(self, start: dict):
        seen = _json.loads(start.get("seen", "{}"))
        rows = _load_manifest_rows(self.root)
        fresh = [
            r
            for path, r in sorted(rows.items())
            if path not in seen or r[5] > _offset_maxo(seen[path])
        ]
        end = {
            "seen": _json.dumps(
                {p: [r[3], r[4], r[5]] for p, r in sorted(rows.items())}
            )
        }
        return iter(fresh), end

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = _json.loads(start.get("seen", "{}"))
        target = _json.loads(end.get("seen", "{}"))
        out = []
        live = None
        for path, vals in sorted(target.items()):
            if path in seen and _offset_maxo(vals) <= _offset_maxo(seen[path]):
                continue
            if isinstance(vals, (list, tuple)):
                out.append(_snapshot_row(path, vals))
            else:  # legacy bare-int offset: best-effort live read
                if live is None:
                    live = _load_manifest_rows(self.root)
                if path in live:
                    out.append(live[path])
        return iter(out)

    def commit(self, end: dict) -> None:
        pass


class ManifestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "connector_manifest"

    def schema(self) -> StructType:
        return MANIFEST_SCHEMA

    def reader(self, schema) -> ManifestReader:
        return ManifestReader(self.options)

    def simpleStreamReader(self, schema) -> ManifestStreamReader:
        return ManifestStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the format with a session."""
    spark.dataSource.register(ManifestDataSource)
