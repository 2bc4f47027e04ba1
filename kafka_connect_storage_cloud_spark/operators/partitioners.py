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


# `locale` (storage-common PartitionerConfig): Joda renders path.format TEXT
# fields (month/weekday names) with DateTimeFormat.forPattern(..).withLocale.
# JVM locale data drifts across JDK releases, so instead of delegating to the
# session JVM the engine ships explicit CLDR-abbreviation name tables — the
# rendered path is then deterministic across engines (the DuckDB oracle
# indexes the identical tables) and across cluster JVMs. Weekday arrays are
# Sunday-first to index Spark's dayofweek()/DuckDB's dayofweek()+1 directly.
LOCALES: dict[str, dict[str, list[str]]] = {
    "en_US": {
        "months_short": ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                         "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"],
        "months_full": ["January", "February", "March", "April", "May", "June",
                        "July", "August", "September", "October", "November", "December"],
        "days_short": ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"],
        "days_full": ["Sunday", "Monday", "Tuesday", "Wednesday",
                      "Thursday", "Friday", "Saturday"],
    },
    "fr_FR": {
        "months_short": ["janv.", "févr.", "mars", "avr.", "mai", "juin",
                         "juil.", "août", "sept.", "oct.", "nov.", "déc."],
        "months_full": ["janvier", "février", "mars", "avril", "mai", "juin",
                        "juillet", "août", "septembre", "octobre",
                        "novembre", "décembre"],
        "days_short": ["dim.", "lun.", "mar.", "mer.", "jeu.", "ven.", "sam."],
        "days_full": ["dimanche", "lundi", "mardi", "mercredi",
                      "jeudi", "vendredi", "samedi"],
    },
    "de_DE": {
        "months_short": ["Jan.", "Feb.", "März", "Apr.", "Mai", "Juni",
                         "Juli", "Aug.", "Sept.", "Okt.", "Nov.", "Dez."],
        "months_full": ["Januar", "Februar", "März", "April", "Mai", "Juni",
                        "Juli", "August", "September", "Oktober",
                        "November", "Dezember"],
        "days_short": ["So.", "Mo.", "Di.", "Mi.", "Do.", "Fr.", "Sa."],
        "days_full": ["Sonntag", "Montag", "Dienstag", "Mittwoch",
                      "Donnerstag", "Freitag", "Samstag"],
    },
}


def _name_lookup(ts: Column, names: list[str], index: Column) -> Column:
    return F.element_at(F.array(*[F.lit(n) for n in names]), index)


def path_format_partitioner(ts: Column, pattern: str, locale: str = "en_US") -> Column:
    """TimeBasedPartitioner with the connector's raw `path.format` string,
    e.g. "'year'=YYYY/'month'=MM/'day'=dd/'hour'=HH" (S3SinkConnectorConfig
    path.format). Numeric fields compile to ONE date_format expression; text
    fields (MMM/MMMM month names, EEE/EEEE weekday names) render from the
    `locale` name tables (LOCALES) so the path is engine- and
    JVM-independent. Still a pure projection, zero shuffle."""
    tab = LOCALES[locale.replace("-", "_")]
    pieces: list[Column] = []  # concat-ready columns
    buf: list[str] = []  # pending date_format pattern

    def flush() -> None:
        if buf:
            pieces.append(F.date_format(ts, _joda_to_java("".join(buf))))
            buf.clear()

    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "'":
            j = pattern.find("'", i + 1)
            if j == -1:
                raise ValueError(f"unterminated quote in path.format: {pattern!r}")
            buf.append(pattern[i : j + 1])
            i = j + 1
            continue
        if c in "ME":
            j = i
            while j < len(pattern) and pattern[j] == c:
                j += 1
            n = j - i
            if c == "M" and n >= 3:
                flush()
                key = "months_short" if n == 3 else "months_full"
                pieces.append(_name_lookup(ts, tab[key], F.month(ts)))
                i = j
                continue
            if c == "E":
                flush()
                key = "days_short" if n <= 3 else "days_full"
                pieces.append(_name_lookup(ts, tab[key], F.dayofweek(ts)))
                i = j
                continue
            buf.append(c * n)
            i = j
            continue
        buf.append(c)
        i += 1
    flush()
    return pieces[0] if len(pieces) == 1 else F.concat(*pieces)


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


def schema_partitioner(
    schema_name: Column, inner: Column, affix: str = "PREFIX", delim: str = "/"
) -> Column:
    """SchemaPartitioner (util/SchemaPartitioner.java:61-68) with
    s3.schema.partition.affix.type semantics: PREFIX prepends
    'schema_name=<name><delim>', SUFFIX appends '<delim>schema_name=<name>',
    NONE leaves the delegate unchanged. The affix joins with directory.delim
    exactly as the reference does (SchemaPartitioner.java:40 reads
    DIRECTORY_DELIM_CONFIG). A null schema name renders as 'null' (Java
    string concatenation in generateSchemaBasedPath)."""
    if affix == "NONE":
        return inner
    name = F.coalesce(schema_name, F.lit("null"))
    if affix == "SUFFIX":
        return F.concat(inner, F.lit(f"{delim}schema_name="), name)
    return F.concat(F.lit("schema_name="), name, F.lit(delim), inner)


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
            inner = path_format_partitioner(ts, pf, getattr(cfg, "locale", "en_US"))
    elif k == "schema":
        # schema name stand-in: the header/schema discriminator column
        inner = schema_partitioner(F.col("event_type"), time_based_partitioner(ts, "year/month/day"))
    else:  # pragma: no cover - ConnectorConfig validates partitioner_class
        raise ValueError(f"unknown partitioner.class {k!r}")
    # wrapping order mirrors S3SinkTask.newPartitioner (S3SinkTask.java:216-222):
    # schema affix wraps the delegate, tombstone routing wraps outermost so a
    # null value always lands in the tombstone partition.
    if cfg.schema_affix_type != "NONE" and k != "schema":
        inner = schema_partitioner(
            F.col("event_type"), inner, cfg.schema_affix_type,
            getattr(cfg, "directory_delim", "/"),
        )
    if cfg.behavior_on_null_values == "write":
        inner = tombstone_supported_partitioner(
            F.col("value"), inner, cfg.tombstone_encoded_partition
        )
    return inner
