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


def _joda_to_java(pattern: str) -> str:
    """Translate the connector's Joda-style path.format pattern to a Java
    DateTimeFormatter pattern (what Spark's date_format takes). Quoted
    literals pass through (both languages quote with single quotes); Joda's
    year-of-era Y becomes Java's y; the shared field letters (M d H m s S)
    and punctuation are identical."""
    out: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "'":
            j = pattern.find("'", i + 1)
            if j == -1:
                raise ValueError(f"unterminated quote in path.format: {pattern!r}")
            out.append(pattern[i : j + 1])
            i = j + 1
        elif c == "Y":
            j = i
            while j < len(pattern) and pattern[j] == "Y":
                j += 1
            out.append("y" * (j - i))
            i = j
        elif c.isalpha() and c not in "yMdHmsS":
            raise ValueError(f"unsupported path.format field {c!r} in {pattern!r}")
        else:
            out.append(c)
            i += 1
    return "".join(out)


def path_format_partitioner(ts: Column, pattern: str) -> Column:
    """TimeBasedPartitioner with the connector's raw `path.format` string,
    e.g. "'year'=YYYY/'month'=MM/'day'=dd/'hour'=HH" (S3SinkConnectorConfig
    path.format). Compiles to ONE date_format expression — still a pure
    projection, zero shuffle."""
    return F.date_format(ts, _joda_to_java(pattern))


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


def schema_partitioner(schema_name: Column, inner: Column, affix: str = "PREFIX") -> Column:
    """SchemaPartitioner (util/SchemaPartitioner.java:61-68) with
    s3.schema.partition.affix.type semantics: PREFIX prepends
    'schema_name=<name>/', SUFFIX appends '/schema_name=<name>', NONE leaves
    the delegate unchanged. A null schema name renders as 'null' (Java
    string concatenation in generateSchemaBasedPath)."""
    if affix == "NONE":
        return inner
    name = F.coalesce(schema_name, F.lit("null"))
    if affix == "SUFFIX":
        return F.concat(inner, F.lit("/schema_name="), name)
    return F.concat(F.lit("schema_name="), name, F.lit("/"), inner)


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


# ---------------------------------------------------------------------------
# Config -> expression glue: give a parsed connector property file the same
# effect it has on the reference (S3SinkConnectorConfig -> Partitioner).
# ---------------------------------------------------------------------------

_GRANULARITIES = {"year", "month", "day", "hour", "minute"}


def timestamp_extractor_expr(cfg) -> Column:
    """partitioner timestamp.extractor -> Column (Wallclock | Record |
    RecordField, reference storage-common TimestampExtractor)."""
    if cfg.timestamp_extractor == "Record":
        return F.col("timestamp")
    if cfg.timestamp_extractor == "RecordField":
        return F.col(cfg.timestamp_field)
    return wallclock_timestamp()


def partitioner_expr(cfg) -> Column:
    """Build the encoded_partition expression a ConnectorConfig asks for —
    the Spark counterpart of the reference's partitioner.class instantiation.
    Expects records in the SinkRecord shape (sources.topic.events_as_topic).
    """
    ts = timestamp_extractor_expr(cfg)
    if cfg.timezone and cfg.timezone != "UTC":
        ts = F.from_utc_timestamp(ts, cfg.timezone)
    if getattr(cfg, "partition_duration_ms", -1) and cfg.partition_duration_ms > 0:
        # partition.duration.ms (storage-common TimeBasedPartitioner
        # advanceIncrement): floor the timestamp to the bucket start so a
        # coarse duration can ride a fine path.format
        dur = cfg.partition_duration_ms
        ts = F.timestamp_millis((F.floor(F.unix_millis(ts) / F.lit(dur)) * F.lit(dur)).cast("bigint"))
    k = cfg.partitioner_class
    if k == "default":
        inner = default_partitioner(F.col("kafka_partition"))
    elif k == "field":
        inner = field_partitioner(cfg.partition_field_name)
    elif k == "daily":
        inner = time_based_partitioner(ts, "year/month/day")
    elif k == "hourly":
        inner = time_based_partitioner(ts, "year/month/day/hour")
    elif k == "time_based":
        pf = cfg.path_format
        if all(seg in _GRANULARITIES for seg in pf.split("/")):
            inner = time_based_partitioner(ts, pf)
        else:
            inner = path_format_partitioner(ts, pf)
    elif k == "schema":
        # schema name stand-in: the header/schema discriminator column
        inner = schema_partitioner(F.col("event_type"), time_based_partitioner(ts, "year/month/day"))
    else:  # pragma: no cover - ConnectorConfig validates partitioner_class
        raise ValueError(f"unknown partitioner.class {k!r}")
    # wrapping order mirrors S3SinkTask.newPartitioner (S3SinkTask.java:216-222):
    # schema affix wraps the delegate, tombstone routing wraps outermost so a
    # null value always lands in the tombstone partition.
    if cfg.schema_affix_type != "NONE" and k != "schema":
        inner = schema_partitioner(F.col("event_type"), inner, cfg.schema_affix_type)
    if cfg.behavior_on_null_values == "write":
        inner = tombstone_supported_partitioner(
            F.col("value"), inner, cfg.tombstone_encoded_partition
        )
    return inner
