"""End-to-end connector runner: the one-call replacement for a deployed
S3 sink connector. Give it the same property map you give the reference
(S3SinkConnectorConfig keys) and it runs the full pipeline:

    source -> partitioner -> rotation/flush -> partitioned format sink

Batch mode processes a bounded record frame; streaming mode wires the same
stages into foreachBatch with a checkpoint (the offset store).

    from kafka_connect_storage_cloud_spark.connector import run_connector
    manifest = run_connector(spark, props, records=..., output_path=...)

The returned manifest (one row per written file: path, record count, offset
range) is what the reference's commit logic tracks internally — exposed here
because it's also the exactly-once replay invariant a test can assert on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import ConnectorConfig, parse_properties
from .operators import rotation as R
from .operators.partitioners import partitioner_expr
from .sinks.writers import SinkConfig, write_kv_header_views, write_partitioned
from .sources.topic import events_as_topic


def _apply_null_behavior(
    records: DataFrame, cfg: ConnectorConfig, dlq_path: str | None = None
) -> DataFrame:
    """behavior.on.null.values (S3SinkConnectorConfig): ignore drops
    tombstones, write keeps them (partitioner routes them), fail raises on
    the first one. With report.null.values.to.dlq (default true) and a
    dlq_path, ignored nulls are written to the dead-letter dataset with an
    error tag instead of vanishing (reference: Connect's errant-record
    reporter, TopicPartitionWriter.java:921)."""
    if cfg.behavior_on_null_values == "ignore":
        if dlq_path is not None and cfg.report_null_to_dlq:
            (
                records.where(F.col("value").isNull())
                .withColumn("dlq_error", F.lit("null record value"))
                .write.mode("overwrite")
                .json(dlq_path)
            )
        return records.where(F.col("value").isNotNull())
    if cfg.behavior_on_null_values == "fail":
        n = records.where(F.col("value").isNull()).limit(1).count()
        if n:
            raise ValueError(
                "null record value with behavior.on.null.values=fail "
                "(reference: connector task failure)"
            )
    return records


def _apply_errors_tolerance(
    records: DataFrame, properties: dict, dlq_path: str | None
) -> DataFrame:
    """Connect runtime error handling (public ConnectorConfig keys
    errors.tolerance / errors.deadletterqueue.*): a record whose non-null
    value fails JSON conversion is a conversion error. tolerance=none kills
    the task (the runtime default); tolerance=all skips the record, landing
    it in the DLQ dataset when errors.deadletterqueue is enabled. The check
    is a pure projection (get_json_object returns null on malformed input),
    so the valid stream costs one codegen'd predicate."""
    tolerance = properties.get("errors.tolerance")
    if not tolerance:
        return records
    malformed = F.col("value").isNotNull() & F.get_json_object(
        F.col("value"), "$"
    ).isNull()
    if tolerance == "none":
        n = records.where(malformed).limit(1).count()
        if n:
            raise ValueError(
                "malformed record value with errors.tolerance=none "
                "(reference: Connect runtime task failure)"
            )
        return records
    if tolerance != "all":
        raise ValueError(f"errors.tolerance must be none|all, got {tolerance!r}")
    use_dlq = properties.get(
        "errors.deadletterqueue.topic.name"
    ) or properties.get("errors.deadletterqueue.enable")
    if dlq_path is not None and use_dlq:
        (
            records.where(malformed)
            .withColumn("dlq_error", F.lit("value conversion failed"))
            .write.mode("overwrite")
            .json(f"{dlq_path}_errors")
        )
    return records.where(~malformed)


def _assign_files(records: DataFrame, cfg: ConnectorConfig, ext: str) -> DataFrame:
    """Pick the rotation policy the config asks for, with the reference's
    dispatch order (TopicPartitionWriter.checkRotationOrAppend):

    - rotate.interval.ms > 0: time rotation, and — because
      rotate.file.on.partition.change defaults TRUE — an encoded-partition
      change ALSO rotates (rotateOnTime's periodicRotation clause,
      TopicPartitionWriter.java:659-667: the partition-change trigger is
      active only when a rotation interval + timestamp extractor are set).
      Tombstone transitions are exempt when tombstone writing is enabled
      (:644-657, behavior.on.null.values=write).
    - rotate.schedule.interval.ms > 0: wall-clock bucket rotation.
    - partitioner.max.open.files > 0: open-file-cap rotation
      (TopicPartitionWriter.java:530-541), COMPOSED with flush.size —
      rotateOnSize (:513-525) still commits all open files when the
      writer's records-since-last-commit reach flush.size (ADVICE r6 #3).
    - else: flush.size chunking (always the capacity backstop)."""
    naming = cfg.naming
    if cfg.rotate_interval_ms > 0:
        if cfg.rotate_file_on_partition_change:
            tomb = (
                cfg.tombstone_encoded_partition
                if cfg.behavior_on_null_values == "write"
                else None
            )
            return R.assign_files_interval_partition_change(
                records,
                cfg.rotate_interval_ms,
                ext=ext,
                naming=naming,
                tombstone_partition=tomb,
            )
        return R.assign_files_rotate_interval(
            records, cfg.rotate_interval_ms, ext=ext, naming=naming
        )
    if cfg.rotate_schedule_interval_ms > 0:
        return R.assign_files_scheduled(
            records, cfg.rotate_schedule_interval_ms, ext=ext, naming=naming
        )
    if cfg.partitioner_max_open_files > 0:
        return R.assign_files_max_open(
            records,
            cfg.partitioner_max_open_files,
            ext=ext,
            naming=naming,
            flush_size=cfg.flush_size,
        )
    return R.assign_files_flush_size(records, cfg.flush_size, ext=ext, naming=naming)


def run_connector(
    spark: SparkSession,
    properties: dict[str, str],
    records: DataFrame | None = None,
    sf_dir: str | None = None,
    output_path: str | None = None,
    dlq_path: str | None = None,
) -> DataFrame:
    """Run the configured pipeline over `records` (or the events-as-topic
    adapter on `sf_dir`). When `output_path` is given the partitioned files
    are actually written with the configured format/compression; the file
    manifest DataFrame is returned either way."""
    cfg = parse_properties(properties)
    problems = cfg.validate()
    if problems:
        # reference behavior: a connector whose validate() records errors
        # never deploys (S3SinkConnectorValidator.validate)
        raise ValueError("invalid connector configuration: " + " | ".join(problems))
    if records is None:
        if sf_dir is None:
            raise ValueError("need records or sf_dir")
        records = events_as_topic(spark, sf_dir)
    if properties.get("transforms"):
        # the Connect runtime applies the SMT chain before the sink task
        # sees records (Connect WorkerSinkTask.convertMessages order)
        from .operators.smt import apply_smt_chain

        records = apply_smt_chain(records, properties)
    records = _apply_errors_tolerance(records, properties, dlq_path)
    records = _apply_null_behavior(records, cfg, dlq_path)
    records = records.withColumn("encoded_partition", partitioner_expr(cfg))
    ext = cfg.spark_format
    assigned = _assign_files(records, cfg, ext)
    if output_path is not None:
        sink = SinkConfig(
            format=cfg.spark_format,
            compression=cfg.compression_type,
            flush_size=cfg.flush_size,
            partition_cols=("encoded_partition",),
            json_decimal_format=cfg.json_decimal_format,
        )
        if cfg.store_kafka_keys or cfg.store_kafka_headers:
            # keys/headers ride as sibling datasets of the value stream
            # (reference KeyValueHeaderRecordWriterProvider)
            write_kv_header_views(
                assigned,
                output_path,
                sink,
                keys_format=cfg.keys_spark_format,
                headers_format=(
                    cfg.headers_spark_format if cfg.headers_format_class else None
                ),
            )
        else:
            payload_cols = [
                c
                for c in ("offset", "key", "value", "timestamp", "encoded_partition")
                if c in assigned.columns
            ]
            write_partitioned(assigned.select(*payload_cols), output_path, sink)
    manifest = R.file_manifest(assigned).orderBy("file_path")
    if cfg.object_tagging:
        # reference tagFile (TopicPartitionWriter.java:1055): every committed
        # object is tagged startOffset/endOffset/recordCount + extra pairs.
        # The manifest map column is the queryable analog of S3 object tags.
        extra = cfg.parsed_extra_tags()
        tag_items = [
            (F.lit("startOffset"), F.col("min_offset").cast("string")),
            (F.lit("endOffset"), F.col("max_offset").cast("string")),
            (F.lit("recordCount"), F.col("record_count").cast("string")),
        ] + [(F.lit(k), F.lit(v)) for k, v in extra.items()]
        manifest = manifest.withColumn(
            "tags", F.create_map(*[c for kv in tag_items for c in kv])
        )
    if output_path is not None:
        # The manifest is consumed twice on this path (the JSON commit record
        # below + the frame returned to the caller), and each evaluation
        # re-runs the full assignment chain over the record batch (measured
        # r9: ~0.65 s per pass at sf0.1 vs 0.07 s from the checkpoint).
        # localCheckpoint holds only the manifest itself — one row per
        # committed file, never the batch — so memory stays bounded by the
        # file count at any scale.
        manifest = manifest.localCheckpoint()
        # persist the commit record next to the data — the queryable analog
        # of the reference's committed-file-name state (what
        # TopicPartitionWriter.findNextAvailableFile scans on restart)
        manifest.coalesce(1).write.mode("overwrite").json(f"{output_path}/_manifest")
    return manifest


def resume_name_re(naming=None) -> str:
    """Regex over a committed file key's basename — the inverse of
    fileKeyToCommit's <topic><fileDelim><partition><fileDelim><offset>.<ext>
    for the configured delims (restart recovery must parse whatever layout
    the connector wrote)."""
    import re as _re

    from .operators.rotation import DEFAULT_NAMING

    naming = naming or DEFAULT_NAMING
    fd, dd = _re.escape(naming.file_delim), _re.escape(naming.dir_delim)
    return rf"([^{dd}{fd}]+){fd}(\d+){fd}(\d+)\.[a-z]+$"


RESUME_NAME_RE = resume_name_re()


def recover_resume_offsets(
    spark: SparkSession,
    output_path: str,
    scan_limit: int | None = None,
    naming=None,
) -> DataFrame:
    """Restart-path recovery (TopicPartitionWriter.java:1023-1050 analog):
    parse the committed manifest's deterministic file names
    (<topic>+<kafkaPartition>+<startOffset>.<ext>) and return, per
    (topic, kafka_partition), the next offset to consume from — the start
    offset of the latest committed file plus its record count. Replaying
    from these offsets rewrites nothing and loses nothing, which is the
    exactly-once resume guarantee. Scales as the manifest (one row per
    file), never the data.

    scan_limit mirrors max.files.scan.limit (TopicPartitionWriter.java:376):
    only the scan_limit most recently-committed files per kafka partition
    (by end offset — offsets interleave across encoded partitions, so
    file-start order is NOT commit order) are examined. The max end offset
    is in that set for any limit >= 1, so bounding the lookback never
    changes the answer — it bounds restart cost on layouts with millions of
    files (pass cfg.max_files_scan_limit; reference default 100)."""
    m = spark.read.json(f"{output_path}/_manifest")
    name_re = resume_name_re(naming)
    parsed = m.select(
        F.regexp_extract("file_path", name_re, 1).alias("topic"),
        F.regexp_extract("file_path", name_re, 2).cast("int").alias("kafka_partition"),
        F.regexp_extract("file_path", name_re, 3).cast("long").alias("start_offset"),
        "record_count",
        "max_offset",
    )
    if scan_limit is not None and scan_limit > 0:
        from pyspark.sql import Window

        w = Window.partitionBy("topic", "kafka_partition").orderBy(
            F.desc("max_offset"), F.desc("start_offset")
        )
        parsed = parsed.withColumn("scan_rank", F.row_number().over(w)).where(
            F.col("scan_rank") <= scan_limit
        )
    return (
        parsed.groupBy("topic", "kafka_partition")
        .agg(
            # offsets interleave across encoded partitions, so the resume
            # point is the max committed END offset over all of a kafka
            # partition's files (not the latest-starting file's end)
            F.max("max_offset").alias("last_committed"),
            F.count(F.lit(1)).alias("n_files"),
        )
        .select(
            "topic",
            "kafka_partition",
            "n_files",
            (F.col("last_committed") + 1).alias("resume_offset"),
        )
        .orderBy("topic", "kafka_partition")
    )
