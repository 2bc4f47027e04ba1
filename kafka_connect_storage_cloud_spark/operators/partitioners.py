"""Partitioners: pure Column expressions that map each record to its encoded
partition path, Spark-first re-expression of the Kafka Connect storage
partitioner hierarchy used by kafka-connect-storage-cloud.

Reference semantics (no code copied):
  - DefaultPartitioner       -> "partition=<kafkaPartition>"
  - FieldPartitioner         -> "<field>=<value>[/<field>=<value>...]"
  - TimeBasedPartitioner     -> path.format, e.g. "'year'=YYYY/'month'=MM/..."
    driven by a timestamp extractor (Record | RecordField | Wallclock)
  - Daily/HourlyPartitioner  -> fixed path formats
  - SchemaPartitioner        -> reference /root/reference/.../util/SchemaPartitioner.java
    (wraps another partitioner, prepends "schema_name=<name>")
  - TombstoneSupportedPartitioner -> .../util/TombstoneSupportedPartitioner.java
    (null-value records routed to a dedicated tombstone partition)
  - DelegatingPartitioner    -> .../util/DelegatingPartitioner.java

Being pure expressions, these run inside whole-stage codegen with zero
shuffle — at 100 TB the partition path costs nothing beyond the scan. The
actual data layout (one directory per encoded partition) is then produced by
the sink's partitionBy, which is the one unavoidable shuffle/sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Timestamp extractors (reference: partitioner.timestamp.extractor config in
# S3SinkConnectorConfig.java; Wallclock | Record | RecordField)
# ---------------------------------------------------------------------------


def record_timestamp(ts_col: str = "ts") -> Column:
    """Record extractor: the record's own (Kafka) timestamp."""
    return F.col(ts_col)


def record_field_timestamp(field: str) -> Column:
    """RecordField extractor: a timestamp taken from a value field."""
    return F.col(field)


def wallclock_timestamp() -> Column:
    """Wallclock extractor — non-deterministic; excluded from oracle checks."""
    return F.current_timestamp()


# ---------------------------------------------------------------------------
# Partitioners
# ---------------------------------------------------------------------------


def default_partitioner(kafka_partition: Column) -> Column:
    """DefaultPartitioner: encodedPartition = 'partition=' + kafkaPartition."""
    return F.concat(F.lit("partition="), kafka_partition.cast("string"))


def field_partitioner(fields: Sequence[str]) -> Column:
    """FieldPartitioner: '<f1>=<v1>/<f2>=<v2>/...' from record value fields."""
    parts = []
    for i, f in enumerate(fields):
        if i:
            parts.append(F.lit("/"))
        parts.append(F.lit(f"{f}="))
        parts.append(F.col(f).cast("string"))
    return F.concat(*parts)


def time_based_partitioner(ts: Column, path_format: str = "year/month/day/hour") -> Column:
    """TimeBasedPartitioner with the connector's default-style path formats.

    Supported granularities compose left-to-right: year, month, day, hour,
    minute. Produces e.g. "year=2026/month=08/day=13/hour=07".
    """
    fmt_map = {
        "year": ("year=", "yyyy"),
        "month": ("month=", "MM"),
        "day": ("day=", "dd"),
        "hour": ("hour=", "HH"),
        "minute": ("minute=", "mm"),
    }
    parts: list[Column] = []
    for i, g in enumerate(path_format.split("/")):
        prefix, fmt = fmt_map[g]
        if i:
            parts.append(F.lit("/"))
        parts.append(F.lit(prefix))
        parts.append(F.date_format(ts, fmt))
    return F.concat(*parts)


def time_based_partitioner_tz(
    ts: Column, timezone: str, path_format: str = "year/month/day/hour"
) -> Column:
    """TimeBasedPartitioner with the connector's `timezone` config: the
    record timestamp (a UTC instant) is rendered in the partition timezone
    (reference: partitioner timezone handling in S3SinkConnectorConfig)."""
    return time_based_partitioner(F.from_utc_timestamp(ts, timezone), path_format)


def daily_partitioner(ts: Column) -> Column:
    """DailyPartitioner: 'year'=YYYY/'month'=MM/'day'=dd."""
    return time_based_partitioner(ts, "year/month/day")


def hourly_partitioner(ts: Column) -> Column:
    """HourlyPartitioner: daily + /'hour'=HH."""
    return time_based_partitioner(ts, "year/month/day/hour")


def schema_partitioner(schema_name: Column, inner: Column) -> Column:
    """SchemaPartitioner (util/SchemaPartitioner.java): prepend
    'schema_name=<name>/' to the delegate partitioner's encoding."""
    return F.concat(F.lit("schema_name="), F.coalesce(schema_name, F.lit("null")), F.lit("/"), inner)


def tombstone_supported_partitioner(
    value: Column, inner: Column, tombstone_partition: str = "tombstone"
) -> Column:
    """TombstoneSupportedPartitioner (util/TombstoneSupportedPartitioner.java):
    records with null value go to the dedicated tombstone partition."""
    return F.when(value.isNull(), F.lit(tombstone_partition)).otherwise(inner)


def generate_partitioned_path(topic: str, encoded_partition: Column, prefix: str = "") -> Column:
    """Partitioner.generatePartitionedPath: '<prefix><topic>/<encodedPartition>'."""
    head = f"{prefix}{topic}/" if topic else prefix
    return F.concat(F.lit(head), encoded_partition)
