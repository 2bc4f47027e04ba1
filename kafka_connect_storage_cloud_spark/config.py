"""Connector configuration surface: a typed mirror of the reference's
S3SinkConnectorConfig (S3SinkConnectorConfig.java) with the same keys,
defaults, and validation rules, mapped onto the Spark-first engine.

Only behavior-bearing keys are modeled; pure transport settings (AWS auth,
proxy, SSE, retry backoff) are accepted and carried through as opaque
`extra` entries so existing connector property files parse unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

VALID_BEHAVIOR_ON_NULL = ("ignore", "fail", "write")
VALID_COMPRESSION = ("none", "gzip", "snappy", "zstd")
# Per-compression supported formats. gzip: the reference matrix
# (S3SinkConnectorValidator.COMPRESSION_SUPPORTED_FORMATS — JsonFormat and
# ByteArrayFormat only; columnar formats own their codecs). snappy/zstd
# are a documented repo extension mapped onto the columnar formats' codecs.
_COMPRESSION_SUPPORTED_FORMATS = {
    "gzip": ("json", "bytearray", "csv"),
    "snappy": ("parquet", "avro"),
    "zstd": ("parquet",),
}
VALID_FORMATS = {
    "io.confluent.connect.s3.format.parquet.ParquetFormat": "parquet",
    "io.confluent.connect.s3.format.json.JsonFormat": "json",
    "io.confluent.connect.s3.format.avro.AvroFormat": "avro",
    "io.confluent.connect.s3.format.bytearray.ByteArrayFormat": "bytearray",
    "parquet": "parquet",
    "json": "json",
    "avro": "avro",
    "csv": "csv",
    "bytearray": "bytearray",
}
VALID_PARTITIONERS = (
    "default",
    "field",
    "time_based",
    "daily",
    "hourly",
    "schema",
)
VALID_TS_EXTRACTORS = ("Wallclock", "Record", "RecordField")
VALID_COMPATIBILITY = ("NONE", "BACKWARD", "FORWARD", "FULL")
VALID_AFFIX_TYPES = ("NONE", "PREFIX", "SUFFIX")


@dataclass
class ConnectorConfig:
    """Parsed + validated connector properties."""

    topics: tuple[str, ...] = ("events",)
    format_class: str = "parquet"
    flush_size: int = 1000
    rotate_interval_ms: int = -1
    rotate_schedule_interval_ms: int = -1
    partitioner_class: str = "default"
    partition_field_name: tuple[str, ...] = ()
    path_format: str = "year/month/day/hour"
    timestamp_extractor: str = "Record"
    timestamp_field: str = "ts"
    timezone: str = "UTC"
    compression_type: str = "none"
    behavior_on_null_values: str = "fail"
    store_kafka_keys: bool = False
    store_kafka_headers: bool = False
    schema_compatibility: str = "NONE"
    rotate_file_on_partition_change: bool = True
    schema_affix_type: str = "NONE"
    report_null_to_dlq: bool = True  # report.null.values.to.dlq
    tombstone_encoded_partition: str = "tombstone"
    compression_level: int = -1  # Deflater.DEFAULT_COMPRESSION
    bytearray_extension: str = ".bin"
    bytearray_separator: str = "\n"
    # keys.format.class / headers.format.class: reference defaults both to
    # AvroFormat (S3SinkConnectorConfig.java:223-226); here "" = inherit the
    # value format, because spark-avro is an optional jar in this build and
    # an unloadable default would fail every store.kafka.keys run.
    keys_format_class: str = ""
    headers_format_class: str = ""
    # max.files.scan.limit: bound on the restart-recovery file scan
    # (TopicPartitionWriter.java:376,1025); reference default 100.
    max_files_scan_limit: int = 100
    # max.write.duration.ms: advisory bound on one commit pass (reference
    # default Long.MAX_VALUE = unbounded; -1 here). Spark's unit of commit is
    # the micro-batch/job, so this is parsed+validated and surfaced for the
    # caller's trigger configuration rather than enforced mid-job.
    max_write_duration_ms: int = -1
    # enable.conditional.writes (S3SinkConnectorConfig.java:109, default
    # true): the reference's If-None-Match guard against zombie tasks
    # double-completing a multipart upload (S3OutputStream.java:364). In
    # this engine replays land on IDENTICAL deterministic file keys with
    # dynamic partition overwrite, so a duplicate commit converges instead
    # of corrupting; parsed for property-file compatibility, and the S3A
    # committer supplies the equivalent atomic-complete on real S3.
    enable_conditional_writes: bool = True
    # json.decimal.format (S3SinkConnectorConfig.java; Connect JsonConverter
    # semantics): BASE64 (default) serializes decimals as base64 of the
    # unscaled two's-complement bytes; NUMERIC writes plain numbers.
    json_decimal_format: str = "BASE64"
    # partition.duration.ms (storage-common TimeBasedPartitioner): floor the
    # extracted timestamp to this bucket before path.format renders it.
    partition_duration_ms: int = -1
    # s3.object.tagging (+ .key.value.pairs, s3.object.behavior.on.tagging.
    # error): reference tags every committed object with startOffset /
    # endOffset / recordCount plus extra "k:v" pairs
    # (TopicPartitionWriter.java:1055 tagFile, :261 getS3Tag). Here the tags
    # surface as a map column on the commit manifest (the queryable analog
    # of S3 object tags); malformed extra pairs follow the ignore/fail knob.
    object_tagging: bool = False
    object_tagging_extra: tuple[str, ...] = ()
    behavior_on_tagging_error: str = "ignore"
    # --- file/dir naming (StorageCommonConfig + TopicPartitionWriter) ---
    # topics.dir (TopicPartitionWriter.java:186): prefix above the per-topic
    # dir. Reference default "topics" under the bucket root; this engine's
    # sink root IS the topics dir, so the engine default is "" — the blank
    # branch of the reference's own fileKey() (StringUtils.isNotBlank).
    # Set "topics" to reproduce a reference bucket's keys byte-for-byte.
    topics_dir: str = ""
    # directory.delim / file.delim (TopicPartitionWriter.java:216-217;
    # SchemaPartitioner.java:40 uses directory.delim for affix joins).
    directory_delim: str = "/"
    file_delim: str = "+"
    # filename.offset.zero.pad.width (TopicPartitionWriter.java:219-221
    # builds "%0<w>d"; reference default 10, validated atLeast(0)).
    zero_pad_width: int = 10
    # locale (storage-common PartitionerConfig): renders TimeBasedPartitioner
    # text fields (MMM/EEE month and weekday names) in path.format. Numeric
    # fields are locale-invariant; the engine ships name tables for the
    # locales in operators.partitioners.LOCALES.
    locale: str = "en_US"
    # s3.part.size / s3.part.retries (S3SinkConnectorConfig.java:103-104,
    # :155-156; PartRange validator :1163 — S3's 5 MiB floor). The engine's
    # writers don't upload parts themselves (the S3A committer does), but
    # the size drives multipart_upload_plan's capacity model and both keys
    # validate exactly as the reference does.
    part_size: int = 25 * 1024 * 1024
    part_retries: int = 3
    # partitioner.max.open.files (S3SinkConnectorConfig.java:252-253, default
    # -1 = unlimited): cap on concurrently-open files per topic partition; a
    # record for a NOT-open encoded partition arriving at the cap rotates
    # (commits every open file — TopicPartitionWriter.java:530-541).
    partitioner_max_open_files: int = -1
    extra: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.format_class not in VALID_FORMATS:
            raise ValueError(f"format.class {self.format_class!r} not supported")
        if self.flush_size < 1:
            raise ValueError("flush.size must be >= 1")
        if self.part_size < 5 * 1024 * 1024:
            # reference PartRange: S3's multipart minimum is 5 MiB
            raise ValueError("s3.part.size must be at least 5242880 (5 MiB)")
        if self.part_retries < 0:
            raise ValueError("s3.part.retries must be >= 0")
        if self.partitioner_max_open_files < 1 and self.partitioner_max_open_files != -1:
            # reference defineInternal has no range, but 0/negative caps
            # would deadlock the writer (no file could ever open)
            raise ValueError("partitioner.max.open.files must be >= 1 or -1 (unlimited)")
        if self.partitioner_class not in VALID_PARTITIONERS:
            raise ValueError(f"partitioner.class {self.partitioner_class!r} not supported")
        if self.json_decimal_format not in ("BASE64", "NUMERIC"):
            raise ValueError(
                f"json.decimal.format {self.json_decimal_format!r} not supported"
            )
        if self.partitioner_class == "field" and not self.partition_field_name:
            raise ValueError("partition.field.name required for the field partitioner")
        if self.timestamp_extractor not in VALID_TS_EXTRACTORS:
            raise ValueError(f"timestamp.extractor {self.timestamp_extractor!r} invalid")
        if self.timestamp_extractor == "RecordField" and not self.timestamp_field:
            raise ValueError("timestamp.field required for RecordField extractor")
        if self.compression_type not in VALID_COMPRESSION:
            raise ValueError(f"s3.compression.type {self.compression_type!r} invalid")
        if self.behavior_on_null_values not in VALID_BEHAVIOR_ON_NULL:
            raise ValueError(
                f"behavior.on.null.values {self.behavior_on_null_values!r} invalid"
            )
        if self.schema_compatibility not in VALID_COMPATIBILITY:
            raise ValueError(f"schema.compatibility {self.schema_compatibility!r} invalid")
        if self.schema_affix_type not in VALID_AFFIX_TYPES:
            raise ValueError(
                f"s3.schema.partition.affix.type {self.schema_affix_type!r} invalid"
            )
        if not -1 <= self.compression_level <= 9:
            # reference CompressionLevelValidator: Deflater levels -1..9
            raise ValueError(f"s3.compression.level {self.compression_level} out of range")
        for attr in ("keys_format_class", "headers_format_class"):
            v = getattr(self, attr)
            if v and v not in VALID_FORMATS:
                raise ValueError(f"{attr.replace('_', '.')} {v!r} not supported")
        if self.max_files_scan_limit < 1:
            raise ValueError("max.files.scan.limit must be >= 1")
        if self.behavior_on_null_values == "write" and not self.store_kafka_keys:
            # reference S3SinkConnectorValidator.validateTombstoneWriter:
            # a tombstone has no value, so the record key MUST be stored or
            # the written file carries no information
            raise ValueError(
                "store.kafka.keys=true is mandatory when "
                "behavior.on.null.values=write (tombstone writing)"
            )
        if self.behavior_on_tagging_error not in ("ignore", "fail"):
            raise ValueError(
                f"s3.object.behavior.on.tagging.error {self.behavior_on_tagging_error!r}"
                " invalid (ignore|fail)"
            )
        if self.zero_pad_width < 0:
            # reference ConfigDef atLeast(0) on FILENAME_OFFSET_ZERO_PAD_WIDTH
            raise ValueError("filename.offset.zero.pad.width must be >= 0")
        if not self.directory_delim or not self.file_delim:
            raise ValueError("directory.delim and file.delim must be non-empty")
        from .operators.partitioners import LOCALES

        if self.locale.replace("-", "_") not in LOCALES:
            raise ValueError(
                f"locale {self.locale!r} not in the shipped name tables "
                f"({sorted(LOCALES)})"
            )

    def parsed_extra_tags(self) -> dict[str, str]:
        """Parse s3.object.tagging.key.value.pairs ("k1:v1,k2:v2" list form,
        reference getS3Tag TopicPartitionWriter.java:261 — split on ':' and
        take the FIRST TWO segments, so 'k:v:x' parses as k -> v exactly as
        the reference does). A pair with no value fails or is skipped per
        s3.object.behavior.on.tagging.error (the reference would throw
        ArrayIndexOutOfBounds there; we surface it as the configured
        tagging-error behavior instead)."""
        tags: dict[str, str] = {}
        for pair in self.object_tagging_extra:
            kv = pair.split(":")
            if len(kv) < 2 or not kv[0]:
                if self.behavior_on_tagging_error == "fail":
                    raise ValueError(f"malformed s3 object tag pair {pair!r}")
                continue
            tags[kv[0]] = kv[1]
        return tags

    def validate(self) -> list[str]:
        """Cross-field validation (reference S3SinkConnectorValidator.java):
        returns the full list of reference-style error strings instead of
        raising, mirroring Connect's validate() endpoint which records every
        error. Per-field checks already ran in __post_init__; this covers
        the rules that need several fields at once:

        - compression × format: gzip applies only to JsonFormat/
          ByteArrayFormat (S3SinkConnectorValidator.COMPRESSION_SUPPORTED_
          FORMATS) — parquet/avro manage their own codecs; the repo
          extension maps snappy/zstd onto the columnar formats' codecs.
        - the same matrix for keys.format.class / headers.format.class when
          store.kafka.keys / store.kafka.headers are on.
        - s3.wan.mode and s3.path.style.access.enabled are mutually
          exclusive (validateWanModeAndPathStyleCompatibility) — both are
          transport keys carried in `extra`.
        """
        errors: list[str] = []
        if self.compression_type != "none":
            valid = _COMPRESSION_SUPPORTED_FORMATS.get(self.compression_type, ())
            checks = [("data", self.spark_format)]
            if self.store_kafka_keys:
                checks.append(("keys", self.keys_spark_format))
            if self.store_kafka_headers:
                checks.append(("headers", self.headers_spark_format))
            for role, fmt in checks:
                if fmt not in valid:
                    errors.append(
                        f"Compression Type {self.compression_type} not valid "
                        f"for {role} format class: ( {fmt} )."
                    )
        def _flag(key: str) -> bool:
            return str(self.extra.get(key, "false")).lower() == "true"

        if _flag("s3.wan.mode") and _flag("s3.path.style.access.enabled"):
            errors.append(
                "Both accelerate mode and path style access are being enabled. "
                "These options are mutually exclusive and cannot be enabled "
                "together. Please disable one of them"
            )
        return errors

    @property
    def spark_format(self) -> str:
        return VALID_FORMATS[self.format_class]

    @property
    def naming(self):
        """The FileNaming bundle consumed by operators.rotation."""
        from .operators.rotation import FileNaming

        return FileNaming(
            topics_dir=self.topics_dir,
            dir_delim=self.directory_delim,
            file_delim=self.file_delim,
            zero_pad_width=self.zero_pad_width,
        )

    @property
    def keys_spark_format(self) -> str:
        return VALID_FORMATS[self.keys_format_class] if self.keys_format_class else self.spark_format

    @property
    def headers_spark_format(self) -> str:
        return (
            VALID_FORMATS[self.headers_format_class]
            if self.headers_format_class
            else self.spark_format
        )


_KEY_MAP = {
    "topics": ("topics", lambda v: tuple(s.strip() for s in v.split(","))),
    "format.class": ("format_class", str),
    "flush.size": ("flush_size", int),
    "rotate.interval.ms": ("rotate_interval_ms", int),
    "rotate.schedule.interval.ms": ("rotate_schedule_interval_ms", int),
    "partitioner.class": ("partitioner_class", lambda v: v.rsplit(".", 1)[-1]
        .removesuffix("Partitioner").lower().replace("timebased", "time_based") or "default"),
    "partition.field.name": ("partition_field_name", lambda v: tuple(s.strip() for s in v.split(","))),
    "path.format": ("path_format", str),
    "timestamp.extractor": ("timestamp_extractor", str),
    "timestamp.field": ("timestamp_field", str),
    "timezone": ("timezone", str),
    "s3.compression.type": ("compression_type", str),
    "behavior.on.null.values": ("behavior_on_null_values", str),
    "store.kafka.keys": ("store_kafka_keys", lambda v: str(v).lower() == "true"),
    "store.kafka.headers": ("store_kafka_headers", lambda v: str(v).lower() == "true"),
    "schema.compatibility": ("schema_compatibility", str),
    "rotate.file.on.partition.change": (
        "rotate_file_on_partition_change",
        lambda v: str(v).lower() == "true",
    ),
    "s3.schema.partition.affix.type": ("schema_affix_type", lambda v: str(v).upper()),
    "report.null.values.to.dlq": ("report_null_to_dlq", lambda v: str(v).lower() == "true"),
    "tombstone.encoded.partition": ("tombstone_encoded_partition", str),
    "s3.compression.level": ("compression_level", int),
    "format.bytearray.extension": ("bytearray_extension", str),
    "format.bytearray.separator": ("bytearray_separator", str),
    "keys.format.class": ("keys_format_class", str),
    "headers.format.class": ("headers_format_class", str),
    "max.files.scan.limit": ("max_files_scan_limit", int),
    "max.write.duration.ms": ("max_write_duration_ms", int),
    "enable.conditional.writes": (
        "enable_conditional_writes",
        lambda v: str(v).lower() == "true",
    ),
    "json.decimal.format": ("json_decimal_format", lambda v: str(v).upper()),
    "partition.duration.ms": ("partition_duration_ms", int),
    "s3.object.tagging": ("object_tagging", lambda v: str(v).lower() == "true"),
    "s3.object.tagging.key.value.pairs": (
        "object_tagging_extra",
        lambda v: tuple(s.strip() for s in str(v).split(",") if s.strip()),
    ),
    "s3.object.behavior.on.tagging.error": (
        "behavior_on_tagging_error",
        lambda v: str(v).lower(),
    ),
    "topics.dir": ("topics_dir", str),
    "directory.delim": ("directory_delim", str),
    "file.delim": ("file_delim", str),
    "filename.offset.zero.pad.width": ("zero_pad_width", int),
    "locale": ("locale", lambda v: str(v).replace("-", "_")),
    "s3.part.size": ("part_size", int),
    "s3.part.retries": ("part_retries", int),
    "partitioner.max.open.files": ("partitioner_max_open_files", int),
}


def parse_properties(props: dict[str, str]) -> ConnectorConfig:
    """Parse a Kafka Connect property map (connector JSON / .properties)."""
    kwargs: dict[str, Any] = {}
    extra: dict[str, Any] = {}
    for key, value in props.items():
        if key in _KEY_MAP:
            attr, conv = _KEY_MAP[key]
            kwargs[attr] = conv(value)
        else:
            extra[key] = value
    return ConnectorConfig(extra=extra, **kwargs)
