"""Connector-parity plans: each reference behavior (partitioner, rotation
policy, tombstone routing, record views, exactly-once naming) expressed as a
deterministic query over the events-as-topic adapter, so the DuckDB oracle
can verify the semantics row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..operators import partitioners as P
from ..operators import rotation as R
from ..sources.topic import events_as_topic


def _summarize(records: DataFrame) -> DataFrame:
    """Per encoded-partition summary — the shape the reference's tests assert
    (records per partition path, offset ranges)."""
    return (
        records.groupBy("encoded_partition")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
            F.countDistinct("kafka_partition").alias("n_kafka_partitions"),
        )
        .orderBy("encoded_partition")
    )


def default_partitioner_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    rec = events_as_topic(spark, sf_dir)
    return _summarize(
        rec.withColumn("encoded_partition", P.default_partitioner(F.col("kafka_partition")))
    )


def field_partitioner_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    rec = events_as_topic(spark, sf_dir)
    return _summarize(rec.withColumn("encoded_partition", P.field_partitioner(["event_type"])))


def time_based_partitioner_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    rec = events_as_topic(spark, sf_dir)
    return _summarize(
        rec.withColumn(
            "encoded_partition", P.time_based_partitioner(F.col("timestamp"), "year/month/day/hour")
        )
    )


def daily_partitioner_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    rec = events_as_topic(spark, sf_dir)
    return _summarize(rec.withColumn("encoded_partition", P.daily_partitioner(F.col("timestamp"))))


def hourly_partitioner_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    rec = events_as_topic(spark, sf_dir)
    return _summarize(rec.withColumn("encoded_partition", P.hourly_partitioner(F.col("timestamp"))))


def field_time_partitioner_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DelegatingPartitioner-style composition: field partition, then daily."""
    rec = events_as_topic(spark, sf_dir)
    enc = F.concat(
        P.field_partitioner(["event_type"]), F.lit("/"), P.daily_partitioner(F.col("timestamp"))
    )
    return _summarize(rec.withColumn("encoded_partition", enc))


def schema_partitioner_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SchemaPartitioner analog: the record's 'schema name' is its header
    event_type (stand-in for value schema name), wrapped around daily."""
    rec = events_as_topic(spark, sf_dir)
    enc = P.schema_partitioner(F.col("event_type"), P.daily_partitioner(F.col("timestamp")))
    return _summarize(rec.withColumn("encoded_partition", enc))


def schema_suffix_partitioner_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s3.schema.partition.affix.type=SUFFIX: delegate encoding first, then
    '/schema_name=<name>' (SchemaPartitioner.java generateSchemaBasedPath
    else-branch)."""
    rec = events_as_topic(spark, sf_dir)
    enc = P.schema_partitioner(
        F.col("event_type"), P.daily_partitioner(F.col("timestamp")), affix="SUFFIX"
    )
    return _summarize(rec.withColumn("encoded_partition", enc))


def record_field_extractor_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RecordField timestamp extractor: partition on the `ts` value field
    (vs the Kafka record timestamp) — same data here, but the plan exercises
    the extractor path."""
    rec = events_as_topic(spark, sf_dir)
    return _summarize(
        rec.withColumn(
            "encoded_partition",
            P.time_based_partitioner(P.record_field_timestamp("ts"), "year/month/day"),
        )
    )


def tz_partitioner_plan(
    spark: SparkSession, sf_dir: str, tz: str = "America/New_York"
) -> DataFrame:
    """TimeBasedPartitioner with a non-UTC partition timezone."""
    rec = events_as_topic(spark, sf_dir)
    return _summarize(
        rec.withColumn(
            "encoded_partition",
            P.time_based_partitioner_tz(F.col("timestamp"), tz, "year/month/day"),
        )
    )


def path_format_partitioner_plan(
    spark: SparkSession, sf_dir: str, pattern: str = "'dt'=YYYY-MM-dd/'hr'=HH"
) -> DataFrame:
    """TimeBasedPartitioner driven by a raw connector path.format pattern
    (quoted literals + Joda field letters), exercising the pattern compiler
    rather than the fixed granularity form."""
    rec = events_as_topic(spark, sf_dir)
    return _summarize(
        rec.withColumn(
            "encoded_partition", P.path_format_partitioner(F.col("timestamp"), pattern)
        )
    )


def rotation_stats_plan(spark: SparkSession, sf_dir: str, flush_size: int = 100) -> DataFrame:
    """FileRotationTracker stats over the flush.size assignment."""
    rec = events_as_topic(spark, sf_dir).withColumn(
        "encoded_partition", P.field_partitioner(["event_type"])
    )
    return R.rotation_stats(R.assign_files_flush_size(rec, flush_size)).orderBy(
        "kafka_partition", "encoded_partition"
    )


def rotation_flush_size_plan(spark: SparkSession, sf_dir: str, flush_size: int = 100) -> DataFrame:
    rec = events_as_topic(spark, sf_dir).withColumn(
        "encoded_partition", P.default_partitioner(F.col("kafka_partition"))
    )
    return R.file_manifest(R.assign_files_flush_size(rec, flush_size)).orderBy("file_path")


def rotation_scheduled_plan(
    spark: SparkSession, sf_dir: str, interval_ms: int = 6 * 3600 * 1000
) -> DataFrame:
    rec = events_as_topic(spark, sf_dir).withColumn(
        "encoded_partition", P.field_partitioner(["event_type"])
    )
    return R.file_manifest(R.assign_files_scheduled(rec, interval_ms)).orderBy("file_path")


def rotation_interval_plan(
    spark: SparkSession, sf_dir: str, rotate_interval_ms: int = 12 * 3600 * 1000
) -> DataFrame:
    rec = events_as_topic(spark, sf_dir).withColumn(
        "encoded_partition", P.default_partitioner(F.col("kafka_partition"))
    )
    return R.file_manifest(R.assign_files_rotate_interval(rec, rotate_interval_ms)).orderBy(
        "file_path"
    )


def rotation_partition_change_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Files as maximal contiguous runs of one encoded partition per kafka
    partition (rotate.file.on.partition.change=true)."""
    rec = events_as_topic(spark, sf_dir).withColumn(
        "encoded_partition", P.field_partitioner(["event_type"])
    )
    return R.file_manifest(R.assign_files_partition_change(rec)).orderBy("file_path")


def rotation_interval_partition_change_plan(
    spark: SparkSession, sf_dir: str, rotate_interval_ms: int = 12 * 3600 * 1000
) -> DataFrame:
    """The reference's DEFAULT time-policy combination (r6): rotate.interval.ms
    with rotate.file.on.partition.change left true — rotateOnTime's
    periodicRotation fires on EITHER trigger and every rotation commits all
    open files, resetting the base timestamp
    (TopicPartitionWriter.java:630-667). This is what `run_connector`
    dispatches for a property file that sets only rotate.interval.ms; the
    standalone plan makes that default externally verifiable. Oracle: the
    same one-row-per-step recursive-CTE replay as rotation_interval, with
    the encoded-partition flip folded into the rotate condition."""
    rec = events_as_topic(spark, sf_dir).withColumn(
        "encoded_partition", P.field_partitioner(["event_type"])
    )
    return R.file_manifest(
        R.assign_files_interval_partition_change(rec, rotate_interval_ms)
    ).orderBy("file_path")


def exactly_once_manifest_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay invariance: process the input UNIONed with itself; after
    de-duplicating on the connector's identity (kafka_partition, offset) the
    manifest is identical to single-delivery — the exactly-once guarantee of
    start-offset file naming (S3FileUtils.fileKeyToCommit)."""
    rec = events_as_topic(spark, sf_dir)
    replayed = rec.unionAll(rec).dropDuplicates(["kafka_partition", "offset"])
    assigned = R.assign_files_flush_size(
        replayed.withColumn("encoded_partition", P.default_partitioner(F.col("kafka_partition"))),
        flush_size=100,
    )
    return R.file_manifest(assigned).orderBy("file_path")


def tombstone_routing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """behavior.on.null.values=write: synthesize a deterministic tombstone
    stream (every 50th offset has a null value) and route nulls to the
    tombstone partition (TombstoneSupportedPartitioner semantics)."""
    rec = events_as_topic(spark, sf_dir).withColumn(
        "value", F.when(F.pmod(F.col("offset"), F.lit(50)) == 0, F.lit(None)).otherwise(F.col("value"))
    )
    enc = P.tombstone_supported_partitioner(
        F.col("value"), P.field_partitioner(["event_type"]), "tombstone"
    )
    return _summarize(rec.withColumn("encoded_partition", enc))


def kv_header_views_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RecordViews (format/RecordViews.java): the value / key / headers file
    streams written side by side. One row per (view, encoded_partition) with
    the per-view payload checksum (here: count + distinct payloads)."""
    rec = events_as_topic(spark, sf_dir).withColumn(
        "encoded_partition", P.daily_partitioner(F.col("timestamp"))
    )
    value_view = rec.select(
        F.lit("value").alias("view"), "encoded_partition", F.col("value").alias("payload")
    )
    key_view = rec.select(
        F.lit("keys").alias("view"), "encoded_partition", F.col("key").alias("payload")
    )
    header_view = rec.select(
        F.lit("headers").alias("view"),
        "encoded_partition",
        F.col("headers")["event_type"].alias("payload"),
    )
    return (
        value_view.unionAll(key_view)
        .unionAll(header_view)
        .groupBy("view", "encoded_partition")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.countDistinct("payload").alias("distinct_payloads"),
        )
        .orderBy("view", "encoded_partition")
    )


def duration_partitioner_plan(
    spark: SparkSession, sf_dir: str, duration_ms: int = 6 * 3600 * 1000
) -> DataFrame:
    """TimeBasedPartitioner with partition.duration.ms (storage-common):
    the timestamp floors to the 6h bucket start before the hourly
    path.format renders it — the whole config path through
    partitioner_expr, exactly as a property file drives it."""
    from ..config import parse_properties

    cfg = parse_properties(
        {
            "partitioner.class": "io.confluent.connect.storage.partitioner.TimeBasedPartitioner",
            "path.format": "year/month/day/hour",
            "partition.duration.ms": str(duration_ms),
            "behavior.on.null.values": "ignore",
        }
    )
    rec = events_as_topic(spark, sf_dir)
    return _summarize(rec.withColumn("encoded_partition", P.partitioner_expr(cfg)))


def rotation_schema_change_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rotate on schema change (TopicPartitionWriter.java:473
    shouldChangeSchema): a file never mixes record schema versions. The
    synthetic deployment flips versions in offset bursts (div 256), so
    files are maximal runs of constant (encoded_partition, schema_version)
    per kafka partition; the manifest carries the version each file holds."""
    rec = (
        events_as_topic(spark, sf_dir)
        .withColumn("encoded_partition", P.field_partitioner(["event_type"]))
        .withColumn(
            "schema_version",
            (F.lit(1) + F.pmod(F.floor(F.col("offset") / 256), F.lit(2))).cast("int"),
        )
    )
    assigned = R.assign_files_run_change(
        rec, ["encoded_partition", "schema_version"]
    )
    return (
        assigned.groupBy("file_path", "schema_version")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
        )
        .orderBy("file_path")
    )


ERASURE_MOD = 97  # synthetic deletion list: users with hash % 97 == 0


def erasure_rewrite_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure planner over immutable landed files: given a
    deletion list of record keys, report per file how many records must go
    and whether the file needs a rewrite — the planning pass a GDPR delete
    job runs against the commit manifest before touching any data (files
    are immutable, so deletion means selective rewrite; the compacted-topic
    analog is a tombstone, see log_compaction).

    The deletion list joins the file assignment on the key hash it was
    built from (broadcast — deletion lists are tiny vs the corpus); the
    rollup is one groupBy per file. Only files with hits rewrite:
    untouched files keep their exactly-once names."""
    from ..functions import hashing as H

    rec = events_as_topic(spark, sf_dir).withColumn(
        "encoded_partition", P.field_partitioner(["event_type"])
    )
    assigned = R.assign_files_flush_size(rec, 100)
    doomed = H.h32(F.concat(F.lit("erase:"), F.col("key"))) % ERASURE_MOD == 0
    per_file = assigned.groupBy("file_path").agg(
        F.count(F.lit(1)).alias("record_count"),
        F.sum(doomed.cast("long")).alias("n_erase"),
    )
    return per_file.select(
        "file_path",
        "record_count",
        "n_erase",
        (F.col("n_erase") > 0).alias("needs_rewrite"),
        (F.floor((F.col("n_erase").cast("double") / F.col("record_count").cast("double"))
                 * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("erase_share"),
    ).orderBy("file_path")


def rotation_custom_naming_plan(spark: SparkSession, sf_dir: str, flush_size: int = 100) -> DataFrame:
    """rotation_flush_size at NON-DEFAULT naming config — proves the four
    file/dir naming keys actually steer the committed keys:
    topics.dir=topics (the reference's default bucket prefix,
    TopicPartitionWriter.java:186), file.delim=# (the reference test
    harness's delim, test util FileUtils.TEST_FILE_DELIM),
    filename.offset.zero.pad.width=6 (zeroPadOffsetFormat "%06d",
    TopicPartitionWriter.java:219-221). directory.delim stays '/' so the
    manifest remains readable; the delim-swap class is covered by the
    fixture-pinned layout test (tests/test_naming_config.py)."""
    naming = R.FileNaming(topics_dir="topics", dir_delim="/", file_delim="#", zero_pad_width=6)
    rec = events_as_topic(spark, sf_dir).withColumn(
        "encoded_partition", P.default_partitioner(F.col("kafka_partition"))
    )
    return R.file_manifest(
        R.assign_files_flush_size(rec, flush_size, naming=naming)
    ).orderBy("file_path")


def locale_partitioner_plan(
    spark: SparkSession, sf_dir: str, locale: str = "fr_FR"
) -> DataFrame:
    """TimeBasedPartitioner with a text path.format (MMM month + EEE weekday
    names) rendered in a non-English locale — the storage-common
    PartitionerConfig `locale` key. Names come from the engine's shipped
    LOCALES tables (operators/partitioners.py) so the path is identical on
    every engine and JVM."""
    rec = events_as_topic(spark, sf_dir)
    return _summarize(
        rec.withColumn(
            "encoded_partition",
            P.path_format_partitioner(
                F.col("timestamp"), "'dt'=YYYY/'mois'=MMM/'jour'=EEE", locale
            ),
        )
    )


def schema_compat_rotation_plan(
    spark: SparkSession, sf_dir: str, mode: str = "BACKWARD"
) -> DataFrame:
    """schema.compatibility mode matrix (TopicPartitionWriter.java:471-505 +
    storage-common StorageSchemaCompatibility): same synthetic deployment as
    rotation_schema_change but with a 3-version cycle (1+((offset/256)%3))
    and the mode-aware writer. The manifest shows what each mode does to the
    SAME stream: NONE opens a file per version flip; BACKWARD/FULL rotate
    only on upgrades and project older records up (n_projected counts them);
    FORWARD rotates only on downgrades and projects newer records down."""
    rec = (
        events_as_topic(spark, sf_dir)
        .withColumn("encoded_partition", P.field_partitioner(["event_type"]))
        .withColumn(
            "schema_version",
            (F.lit(1) + F.pmod(F.floor(F.col("offset") / 256), F.lit(3))).cast("int"),
        )
    )
    assigned = R.assign_files_schema_compat(rec, mode)
    return (
        assigned.groupBy("file_path", "projected_version")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.sum(
                (F.col("schema_version") != F.col("projected_version")).cast("long")
            ).alias("n_projected"),
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
        )
        .orderBy("file_path")
    )


def rotation_max_open_files_plan(
    spark: SparkSession, sf_dir: str, max_open_files: int = 3
) -> DataFrame:
    """partitioner.max.open.files=3 over the event_type partitioner (8
    encoded partitions interleave per kafka partition, so the open-set cap
    trips constantly — the worst case the knob exists for). Manifest of
    (epoch, encoded_partition) files named by start offset."""
    rec = events_as_topic(spark, sf_dir).withColumn(
        "encoded_partition", P.field_partitioner(["event_type"])
    )
    return R.file_manifest(
        R.assign_files_max_open(rec, max_open_files)
    ).orderBy("file_path")


# s3.part.size governs how the S3 writer slices a closed file into multipart
# upload parts (reference: S3SinkConnectorConfig.java:103-104, default
# 25 MiB; S3OutputStream buffers part.size bytes then uploadPart()s). The
# plan parameterizes the size; tests/oracles use a 4 KiB part against the
# synthetic topic so multi-part splits actually occur at test scale.
MULTIPART_PART_SIZE_TEST = 4096
MULTIPART_REC_OVERHEAD = 32  # framing overhead per record in the size model


def multipart_upload_plan(
    spark: SparkSession, sf_dir: str, flush_size: int = 100,
    part_size: int = MULTIPART_PART_SIZE_TEST,
) -> DataFrame:
    """Multipart-upload plan for every rotated file: estimated object bytes
    (key + value + per-record framing — a deterministic size model, since
    the real serialized size depends on the format writer), the part count
    at `part_size`, and the final part's size. The capacity-planning view
    an operator reads to size s3.part.size: parts-per-file drives S3
    request volume and the part buffer is the connector's dominant heap
    cost (reference: S3OutputStream part buffer, S3SinkConnectorConfig
    s3.part.size/s3.part.retries).

    Scale: rides the flush-size file assignment (one shuffle on the file
    grouping key); byte sums aggregate map-side per file; the part math is
    pure integer projection on the manifest-sized result."""
    rec = events_as_topic(spark, sf_dir).withColumn(
        "encoded_partition", P.default_partitioner(F.col("kafka_partition"))
    )
    assigned = R.assign_files_flush_size(rec, flush_size)
    rec_bytes = (
        F.coalesce(F.length("key"), F.lit(0))
        + F.coalesce(F.length("value"), F.lit(0))
        + F.lit(MULTIPART_REC_OVERHEAD)
    )
    files = assigned.groupBy("file_path").agg(
        F.count(F.lit(1)).alias("record_count"),
        F.sum(rec_bytes.cast("long")).alias("est_bytes"),
    )
    n_parts = F.expr(f"(est_bytes + {part_size - 1}) div {part_size}")
    return files.select(
        "file_path",
        "record_count",
        "est_bytes",
        n_parts.alias("n_parts"),
        (F.col("est_bytes") - (n_parts - F.lit(1)) * F.lit(part_size)).alias("last_part_bytes"),
        F.lit(part_size).cast("long").alias("part_size"),
    ).orderBy("file_path")


def consumer_lag_report(
    spark: SparkSession, sf_dir: str, flush_size: int = 100
) -> DataFrame:
    """Consumer-group lag as the sink connector reports it: the connector
    commits a partition's offset only when a file CLOSES (flush.size
    reached — reference: TopicPartitionWriter commitFiles after rotation),
    so records sitting in the open partial file are consumed-but-uncommitted
    lag. Per kafka partition: topic end offset, highest committed offset
    (last record of the last FULL file; NULL when nothing has flushed),
    uncommitted record count, and its share — the restart-exposure /
    monitoring view an operator alarms on.

    Scale: one file assignment (single shuffle), file summaries combine
    map-side, and the report is |partitions| rows."""
    rec = events_as_topic(spark, sf_dir).withColumn(
        "encoded_partition", P.default_partitioner(F.col("kafka_partition"))
    )
    return lag_report_from_records(rec, flush_size)


def lag_report_from_records(rec: DataFrame, flush_size: int = 100) -> DataFrame:
    """consumer_lag_report over any SinkRecord-shaped frame carrying
    (kafka_partition, offset, encoded_partition) — shared by the batch
    operator and the streaming lag monitor (streaming.pipeline.
    consumer_lag_stream), so both report identical numbers from identical
    state."""
    assigned = R.assign_files_flush_size(rec, flush_size)
    per_file = assigned.groupBy("kafka_partition", "file_seq").agg(
        F.count(F.lit(1)).alias("n_in_file"),
        F.max("offset").alias("file_end_offset"),
    )
    committed = (
        per_file.where(F.col("n_in_file") == flush_size)
        .groupBy("kafka_partition")
        .agg(F.max("file_end_offset").alias("committed_offset"))
    )
    per_part = rec.groupBy("kafka_partition").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.max("offset").alias("topic_end_offset"),
    )
    joined = per_part.join(committed, "kafka_partition", "left")
    behind = (
        assigned.join(committed, "kafka_partition", "left")
        .where(
            F.col("committed_offset").isNull()
            | (F.col("offset") > F.col("committed_offset"))
        )
        .groupBy("kafka_partition")
        .agg(F.count(F.lit(1)).alias("uncommitted_records"))
    )
    return (
        joined.join(behind, "kafka_partition", "left")
        .select(
            "kafka_partition",
            "n_records",
            "topic_end_offset",
            "committed_offset",
            F.coalesce(F.col("uncommitted_records"), F.lit(0)).alias("uncommitted_records"),
            H.round6(
                F.coalesce(F.col("uncommitted_records"), F.lit(0)).cast("double")
                / F.col("n_records").cast("double")
            ).alias("lag_share"),
        )
        .orderBy("kafka_partition")
    )


def rotation_policy_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rotation-policy comparison: for each rotation policy in its
    canonical configuration (flush.size=100, rotate.schedule.interval 6 h,
    rotate.interval 12 h, rotate-on-partition-change), the file count,
    record volume, and min/avg/max records per file — the one table that
    shows the small-file/latency trade before a connector config is
    chosen (tiny files hurt the object store and downstream scans; huge
    files hurt restart/commit latency).

    Scale: each policy's manifest is its already-verified plan (one
    shuffle each); the matrix is a 6-row aggregate union covering ALL
    shipped rotation policies (r6 adds max_open_files and schema_change —
    the two newest policies are the ones this decision table most needs)."""
    policies = (
        ("flush_size", rotation_flush_size_plan),
        ("scheduled", rotation_scheduled_plan),
        ("interval", rotation_interval_plan),
        ("partition_change", rotation_partition_change_plan),
        ("max_open_files", rotation_max_open_files_plan),
        ("schema_change", rotation_schema_change_plan),
    )
    out = None
    for name, fn in policies:
        agg = fn(spark, sf_dir).agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("record_count").alias("n_records"),
            F.min("record_count").alias("min_records_per_file"),
            F.max("record_count").alias("max_records_per_file"),
            H.round6(
                F.sum("record_count").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_records_per_file"),
        ).select(F.lit(name).alias("policy"), "*")
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("policy")
