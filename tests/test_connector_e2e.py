"""End-to-end runner tests: a reference user's property file drives the
whole pipeline (S3SinkTaskTest analog — config in, files out)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_spark.connector import run_connector

PROPS = {
    "topics": "events",
    "format.class": "io.confluent.connect.s3.format.parquet.ParquetFormat",
    "partitioner.class": "io.confluent.connect.storage.partitioner.FieldPartitioner",
    "partition.field.name": "event_type",
    "flush.size": "100",
    "behavior.on.null.values": "ignore",
}


def test_run_connector_writes_partitioned_files(spark, sf_small, tmp_path):
    out = str(tmp_path / "sinkout")
    manifest = run_connector(spark, PROPS, sf_dir=sf_small, output_path=out)
    rows = manifest.collect()
    assert rows and all(r["record_count"] <= 100 for r in rows)
    # written layout matches the partitioner
    dirs = {
        os.path.basename(d)
        for d in glob.glob(f"{out}/*")
        if os.path.isdir(d) and not os.path.basename(d).startswith("_")
    }
    assert dirs and all(d.startswith("encoded_partition=event_type%3D") for d in dirs)
    back = spark.read.parquet(out)
    total = sum(r["record_count"] for r in rows)
    assert back.count() == total


def test_run_connector_replay_is_idempotent(spark, sf_small, tmp_path):
    out = str(tmp_path / "replay")
    m1 = run_connector(spark, PROPS, sf_dir=sf_small, output_path=out).collect()
    n1 = spark.read.parquet(out).count()
    m2 = run_connector(spark, PROPS, sf_dir=sf_small, output_path=out).collect()
    assert spark.read.parquet(out).count() == n1
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]


def test_run_connector_null_behavior_fail(spark, sf_small):
    from kafka_connect_storage_cloud_spark.sources.topic import events_as_topic

    props = dict(PROPS, **{"behavior.on.null.values": "fail"})
    rec = events_as_topic(spark, sf_small).withColumn(
        "value", F.when(F.col("offset") % 50 == 0, None).otherwise(F.col("value"))
    )
    with pytest.raises(ValueError, match="behavior.on.null.values=fail"):
        run_connector(spark, props, records=rec)


def test_run_connector_rotate_interval_policy(spark, sf_small):
    props = dict(
        PROPS,
        **{
            "rotate.interval.ms": str(6 * 3600 * 1000),
            "partitioner.class": "io.confluent.connect.storage.partitioner.DefaultPartitioner",
        },
    )
    manifest = run_connector(spark, props, sf_dir=sf_small)
    rows = manifest.collect()
    assert rows
    # interval rotation, not flush-size: some file may exceed flush.size
    assert all(r["min_offset"] <= r["max_offset"] for r in rows)


def test_run_connector_kv_header_sidecars(spark, sf_small, tmp_path):
    out = str(tmp_path / "kv")
    props = dict(PROPS, **{"store.kafka.keys": "true", "store.kafka.headers": "true"})
    run_connector(spark, props, sf_dir=sf_small, output_path=out)
    n_values = spark.read.parquet(f"{out}/values").count()
    assert spark.read.parquet(f"{out}/keys").count() == n_values
    assert spark.read.parquet(f"{out}/headers").count() == n_values


def test_recover_resume_offsets_round_trip(spark, sf_small, tmp_path):
    """Restart recovery: resume offsets parsed from the committed manifest
    equal max(offset)+1 per kafka partition, and a resumed run (records
    filtered to >= resume) finds nothing left to write."""
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.connector import recover_resume_offsets
    from kafka_connect_storage_cloud_spark.sources.topic import events_as_topic

    out = str(tmp_path / "resume")
    run_connector(spark, PROPS, sf_dir=sf_small, output_path=out)
    resume = recover_resume_offsets(spark, out)
    rows = {r["kafka_partition"]: r["resume_offset"] for r in resume.collect()}
    rec = events_as_topic(spark, sf_small)
    expected = {
        r["kafka_partition"]: r["mx"] + 1
        for r in rec.groupBy("kafka_partition").agg(F.max("offset").alias("mx")).collect()
    }
    assert rows == expected
    # nothing beyond the resume point: a restarted source has no new records
    resume_map = F.create_map(
        *[x for kp, off in rows.items() for x in (F.lit(kp), F.lit(off))]
    )
    remaining = rec.where(F.col("offset") >= resume_map[F.col("kafka_partition")])
    assert remaining.count() == 0


def test_null_records_to_dlq(spark, sf_small, tmp_path):
    """behavior.on.null.values=ignore + report.null.values.to.dlq: dropped
    tombstones land in the dead-letter dataset, tagged; main output has none;
    DLQ + main = input."""
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.sources.topic import events_as_topic

    props = dict(PROPS)
    props["behavior.on.null.values"] = "ignore"
    out = str(tmp_path / "main")
    dlq = str(tmp_path / "dlq")
    rec = events_as_topic(spark, sf_small).withColumn(
        "value", F.when(F.col("offset") % 50 == 0, None).otherwise(F.col("value"))
    )
    manifest = run_connector(spark, props, records=rec, output_path=out, dlq_path=dlq)
    n_null = rec.where(F.col("value").isNull()).count()
    n_all = rec.count()
    assert n_null > 0
    dead = spark.read.json(dlq)
    assert dead.count() == n_null
    assert dead.select("dlq_error").distinct().first()[0] == "null record value"
    written = sum(r["record_count"] for r in manifest.collect())
    assert written == n_all - n_null


def test_keys_format_class_overrides_sidecar_format(spark, sf_small, tmp_path):
    """keys.format.class (S3SinkConnectorConfig.java:223): the key sidecar
    can use a different format than the value stream."""
    out = str(tmp_path / "kvfmt")
    props = dict(
        PROPS,
        **{
            "store.kafka.keys": "true",
            "keys.format.class": "io.confluent.connect.s3.format.json.JsonFormat",
        },
    )
    run_connector(spark, props, sf_dir=sf_small, output_path=out)
    n_values = spark.read.parquet(f"{out}/values").count()
    key_files = glob.glob(f"{out}/keys/*/*.json")
    assert key_files, "keys sidecar should be JSON files"
    assert spark.read.json(f"{out}/keys").count() == n_values


def test_recover_resume_offsets_scan_limit(spark, sf_small, tmp_path):
    """max.files.scan.limit: bounding the lookback to the most recently
    committed files (by end offset) per partition yields the same resume
    offsets, including limit=1."""
    from kafka_connect_storage_cloud_spark.connector import recover_resume_offsets

    out = str(tmp_path / "scanlim")
    run_connector(spark, PROPS, sf_dir=sf_small, output_path=out)
    full = {
        r["kafka_partition"]: r["resume_offset"]
        for r in recover_resume_offsets(spark, out).collect()
    }
    for limit in (1, 100):
        bounded = {
            r["kafka_partition"]: r["resume_offset"]
            for r in recover_resume_offsets(spark, out, scan_limit=limit).collect()
        }
        assert bounded == full


def test_new_config_keys_parse_and_validate():
    from kafka_connect_storage_cloud_spark.config import parse_properties

    cfg = parse_properties(
        {
            "keys.format.class": "io.confluent.connect.s3.format.json.JsonFormat",
            "max.files.scan.limit": "25",
            "max.write.duration.ms": "60000",
        }
    )
    assert cfg.keys_spark_format == "json"
    assert cfg.headers_spark_format == cfg.spark_format  # inherit
    assert cfg.max_files_scan_limit == 25
    assert cfg.max_write_duration_ms == 60000
    with pytest.raises(ValueError):
        parse_properties({"max.files.scan.limit": "0"})
    with pytest.raises(ValueError):
        parse_properties({"keys.format.class": "orc"})


def test_run_connector_applies_smt_chain(spark, sf_small, tmp_path):
    """transforms= in the property file routes through the SMT chain before
    the sink: TimestampRouter rewrites the topic (and therefore every file
    key), MaskField redacts keys, Filter drops tombstones."""
    props = {
        "topics": "events",
        "format.class": "parquet",
        "partitioner.class": "io.confluent.connect.storage.partitioner.DefaultPartitioner",
        "flush.size": "1000",
        "behavior.on.null.values": "ignore",
        "transforms": "mask,route,drop",
        "transforms.mask.type": "org.apache.kafka.connect.transforms.MaskField$Key",
        "transforms.route.type": "org.apache.kafka.connect.transforms.TimestampRouter",
        "transforms.route.topic.format": "${topic}-${timestamp}",
        "transforms.route.timestamp.format": "yyyyMMdd",
        "transforms.drop.type": "org.apache.kafka.connect.transforms.Filter",
    }
    out = tmp_path / "smt_out"
    manifest = run_connector(spark, props, sf_dir=sf_small, output_path=str(out))
    paths = [r["file_path"] for r in manifest.collect()]
    assert paths and all(p.startswith("events-20") for p in paths), paths[:3]
    written = spark.read.parquet(f"{out}/encoded_partition=*")
    keys = [r["key"] for r in written.select("key").distinct().collect()]
    assert keys == ["****"]


def test_json_decimal_format_base64_and_numeric(spark, tmp_path):
    """json.decimal.format: BASE64 writes base64(unscaled two's-complement
    bytes) — Connect JsonConverter's default wire form; NUMERIC writes plain
    numbers. 12.34 scale 2 -> unscaled 1234 -> bytes 04 D2 -> 'BNI='."""
    import json as jsonlib

    from kafka_connect_storage_cloud_spark.sinks.writers import (
        SinkConfig,
        write_partitioned,
    )

    df = spark.createDataFrame(
        [("a", "12.34"), ("a", "-0.01"), ("b", None)], "part string, amount string"
    ).selectExpr("part", "CAST(amount AS DECIMAL(10,2)) AS amount")

    def read_rows(path):
        rows = []
        for fp in glob.glob(f"{path}/part=*/*.json"):
            with open(fp) as fh:
                rows += [jsonlib.loads(line) for line in fh if line.strip()]
        return rows

    b64 = tmp_path / "b64"
    write_partitioned(df, str(b64), SinkConfig(format="json", partition_cols=("part",)))
    vals = {r.get("amount") for r in read_rows(b64)}
    assert "BNI=" in vals  # 1234 -> 0x04D2
    assert "/w==" in vals  # -1 -> 0xFF

    num = tmp_path / "num"
    write_partitioned(
        df,
        str(num),
        SinkConfig(format="json", partition_cols=("part",), json_decimal_format="NUMERIC"),
    )
    vals = {r.get("amount") for r in read_rows(num)}
    assert 12.34 in vals and -0.01 in vals


def test_errors_tolerance_all_routes_malformed_to_dlq(spark, sf_small, tmp_path):
    """errors.tolerance=all: records whose value fails JSON conversion are
    skipped and land in the errors DLQ; main output + both DLQs partition
    the input exactly (Connect runtime error-handling semantics)."""
    from kafka_connect_storage_cloud_spark.sources.topic import events_as_topic

    rec = events_as_topic(spark, sf_small)
    broken = rec.withColumn(
        "value",
        F.when(F.col("offset") % 97 == 0, F.lit("{not json")).otherwise(F.col("value")),
    )
    props = {
        "topics": "events",
        "format.class": "parquet",
        "partitioner.class": "io.confluent.connect.storage.partitioner.DefaultPartitioner",
        "flush.size": "1000",
        "behavior.on.null.values": "ignore",
        "errors.tolerance": "all",
        "errors.deadletterqueue.topic.name": "dlq-events",
    }
    out, dlq = str(tmp_path / "out"), str(tmp_path / "dlq")
    manifest = run_connector(
        spark, props, records=broken, output_path=out, dlq_path=dlq
    )
    n_total = broken.count()
    n_written = sum(r["record_count"] for r in manifest.collect())
    n_err = spark.read.json(f"{dlq}_errors").count()
    n_null = spark.read.json(dlq).count()
    assert n_err > 0 and n_written + n_err + n_null == n_total


def test_errors_tolerance_none_fails_fast(spark, sf_small):
    from kafka_connect_storage_cloud_spark.sources.topic import events_as_topic

    rec = events_as_topic(spark, sf_small).withColumn(
        "value",
        F.when(F.col("offset") == 3, F.lit("{not json")).otherwise(F.col("value")),
    )
    props = {
        "topics": "events",
        "format.class": "parquet",
        "partitioner.class": "io.confluent.connect.storage.partitioner.DefaultPartitioner",
        "flush.size": "1000",
        "behavior.on.null.values": "ignore",
        "errors.tolerance": "none",
    }
    with pytest.raises(ValueError, match="errors.tolerance=none"):
        run_connector(spark, props, records=rec)


def test_manifest_python_datasource(spark, sf_small, tmp_path):
    """The commit manifest reads back as a first-class format through the
    Spark 4 Python Data Source API, and its totals reconcile with the
    returned manifest DataFrame (one InputPartition per manifest shard)."""
    from kafka_connect_storage_cloud_spark.sources.manifest_source import register

    props = {
        "topics": "events",
        "format.class": "parquet",
        "partitioner.class": "io.confluent.connect.storage.partitioner.FieldPartitioner",
        "partition.field.name": "event_type",
        "flush.size": "500",
        "behavior.on.null.values": "ignore",
    }
    out = str(tmp_path / "landed")
    manifest = run_connector(spark, props, sf_dir=sf_small, output_path=out)
    expected = {
        r["file_path"]: (r["record_count"], r["min_offset"], r["max_offset"])
        for r in manifest.collect()
    }
    register(spark)
    got_df = spark.read.format("connector_manifest").load(out)
    got = {
        r["file_path"]: (r["record_count"], r["min_offset"], r["max_offset"])
        for r in got_df.collect()
    }
    assert got == expected
    # parsed columns: every row carries its encoded partition + kafka partition
    parsed = got_df.where(
        F.col("encoded_partition").startswith("event_type=")
        & F.col("kafka_partition").isNotNull()
    ).count()
    assert parsed == len(expected)


def test_object_tagging_manifest(spark, sf_small):
    """s3.object.tagging: the manifest gains startOffset/endOffset/
    recordCount tags plus parsed extra pairs (reference tagFile,
    TopicPartitionWriter.java:1055)."""
    props = dict(
        PROPS,
        **{
            "s3.object.tagging": "true",
            "s3.object.tagging.key.value.pairs": "team:data, env:prod",
        },
    )
    rows = run_connector(spark, props, sf_dir=sf_small).collect()
    assert rows
    for r in rows:
        t = r["tags"]
        assert t["startOffset"] == str(r["min_offset"])
        assert t["endOffset"] == str(r["max_offset"])
        assert t["recordCount"] == str(r["record_count"])
        assert t["team"] == "data" and t["env"] == "prod"


def test_object_tagging_error_behavior(spark, sf_small):
    """Malformed extra tag pair: default 'ignore' skips it; 'fail' raises
    (s3.object.behavior.on.tagging.error, reference IgnoreOrFailBehavior)."""
    bad = {"s3.object.tagging": "true", "s3.object.tagging.key.value.pairs": "oops"}
    rows = run_connector(spark, dict(PROPS, **bad), sf_dir=sf_small).collect()
    assert all("oops" not in r["tags"] for r in rows)
    with pytest.raises(ValueError, match="malformed"):
        run_connector(
            spark,
            dict(PROPS, **bad, **{"s3.object.behavior.on.tagging.error": "fail"}),
            sf_dir=sf_small,
        )


def test_untagged_manifest_has_no_tags_column(spark, sf_small):
    manifest = run_connector(spark, PROPS, sf_dir=sf_small)
    assert "tags" not in manifest.columns


# ---------------------------------------------------------------------------
# Rotation-policy routing through run_connector (VERDICT r5 gaps #1/#2):
# rotate.file.on.partition.change and partitioner.max.open.files must reach
# _assign_files' dispatch, pinned against the reference writer tests.


def _interleaved_records(spark):
    """5 records on one kafka partition whose encoded partitions alternate
    A,B,A,B,A with the out-of-order timestamps of the reference test
    TopicPartitionWriterTest.testWriteRecordTimeBasedPartitionRecordTimestamp
    HoursOutOfOrderAndRotateOnPartitionChange (base, -2m, +9m, -5m, +10m)."""
    base = 1488477600000  # 2017-03-02T10:00:00-08:00 in ms
    rows = [
        (0, base, "A"),
        (1, base - 2 * 60_000, "B"),
        (2, base + 9 * 60_000, "A"),
        (3, base - 5 * 60_000, "B"),
        (4, base + 10 * 60_000, "A"),
    ]
    df = spark.createDataFrame(rows, "offset long, ts_ms long, event_type string")
    return df.select(
        F.lit("events").alias("topic"),
        F.lit(12).cast("int").alias("kafka_partition"),
        "offset",
        F.timestamp_millis(F.col("ts_ms")).alias("timestamp"),
        F.lit("key").alias("key"),
        F.lit("{}").alias("value"),
        "event_type",
    )


_ROTATE_PROPS = {
    "topics": "events",
    "format.class": "io.confluent.connect.s3.format.parquet.ParquetFormat",
    "partitioner.class": "io.confluent.connect.storage.partitioner.FieldPartitioner",
    "partition.field.name": "event_type",
    "flush.size": "1000",
    "rotate.interval.ms": str(10 * 60_000),
}


def test_partition_change_rotation_is_the_interval_default(spark):
    """With rotate.interval.ms set and rotate.file.on.partition.change left
    at its reference default (true), EVERY encoded-partition flip starts a
    new file: the reference test expects fresh files at offsets 0,1,2,3
    (each a 1-record file) for the alternating A/B stream."""
    manifest = run_connector(spark, _ROTATE_PROPS, records=_interleaved_records(spark))
    rows = {r["min_offset"]: r for r in manifest.collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    assert all(r["record_count"] == 1 for r in rows.values())
    # start-offset naming: byte-identical to fileKeyToCommit for each run
    for off, r in rows.items():
        assert r["file_path"].endswith(f"events+12+{off:010d}.parquet")
    assert rows[0]["file_path"] == "events/event_type=A/events+12+0000000000.parquet"


def test_partition_change_rotation_disabled_matches_reference(spark):
    """rotate.file.on.partition.change=false: only the 10-minute interval
    rotates, per (kafka_partition, encoded_partition) group — A splits at
    +10m ([0,2] then [4]), B stays one file ([1,3]) — the reference's
    ...DailyRotationInterval test shape."""
    props = dict(_ROTATE_PROPS, **{"rotate.file.on.partition.change": "false"})
    manifest = run_connector(spark, props, records=_interleaved_records(spark))
    got = {
        (r["min_offset"], r["max_offset"], r["record_count"])
        for r in manifest.collect()
    }
    assert got == {(0, 2, 2), (4, 4, 1), (1, 3, 2)}


def test_tombstone_transition_suppresses_partition_change(spark):
    """behavior.on.null.values=write: transitions to/from the tombstone
    partition do NOT rotate (TopicPartitionWriter.java:644-657), while
    regular A<->B flips still do."""
    rec = _interleaved_records(spark).withColumn(
        "value", F.when(F.col("offset") == 1, None).otherwise(F.col("value"))
    )
    props = dict(
        _ROTATE_PROPS,
        **{"behavior.on.null.values": "write", "store.kafka.keys": "true"},
    )
    manifest = run_connector(spark, props, records=rec)
    rows = sorted(
        (r["min_offset"], r["max_offset"], r["record_count"])
        for r in manifest.collect()
    )
    # offset 1 routes to the tombstone partition; the A->tombstone->A round
    # trip is suppressed, so NO commit happens across offsets 0..2: the A
    # file keeps [0,2] and the tombstone record writes into its own open
    # file [1] (files are still per encoded partition — suppression avoids
    # the commit, not the per-partition file split). Offset 3 (A->B) and
    # offset 4 (B->A) are regular flips and still rotate. Without
    # suppression A would have split into [0] and [2].
    assert rows == [(0, 2, 2), (1, 1, 1), (3, 3, 1), (4, 4, 1)]


def test_max_open_files_routes_through_runner(spark):
    """partitioner.max.open.files reaches _assign_files: the runner manifest
    equals the standalone assign_files_max_open manifest (reference
    TopicPartitionWriter.java:530-541)."""
    from kafka_connect_storage_cloud_spark.operators import rotation as R
    from kafka_connect_storage_cloud_spark.operators.partitioners import (
        partitioner_expr,
    )
    from kafka_connect_storage_cloud_spark.config import parse_properties

    rows = [(i, 1488477600000 + i * 1000, "ABC"[i % 3]) for i in range(12)]
    df = spark.createDataFrame(rows, "offset long, ts_ms long, event_type string")
    rec = df.select(
        F.lit("events").alias("topic"),
        F.lit(3).cast("int").alias("kafka_partition"),
        "offset",
        F.timestamp_millis(F.col("ts_ms")).alias("timestamp"),
        F.lit("k").alias("key"),
        F.lit("{}").alias("value"),
        "event_type",
    )
    props = {
        "topics": "events",
        "format.class": "io.confluent.connect.s3.format.parquet.ParquetFormat",
        "partitioner.class": "io.confluent.connect.storage.partitioner.FieldPartitioner",
        "partition.field.name": "event_type",
        "flush.size": "1000",
        "partitioner.max.open.files": "2",
    }
    manifest = run_connector(spark, props, records=rec)
    cfg = parse_properties(props)
    expected = R.file_manifest(
        R.assign_files_max_open(
            rec.withColumn("encoded_partition", partitioner_expr(cfg)), 2
        )
    )
    got = sorted(tuple(r) for r in manifest.collect())
    want = sorted(tuple(r) for r in expected.orderBy("file_path").collect())
    assert got == want
    # A,B,C interleave with cap 2: every C arrival (and the A after it)
    # finds 2 open files -> epoch rotation; 12 records / cycle of 3 with 2
    # rotations per cycle -> more than the 3 files an uncapped run yields
    assert len(got) > 3


def test_max_open_files_composes_with_flush_size(spark):
    """flush.size is NOT mutually exclusive with max.open.files: the
    reference checks rotateOnSize on every write regardless
    (TopicPartitionWriter.java:513-525), and either trigger commits all
    open files. A small flush.size must therefore cap files even while
    the max-open-files policy is active (ADVICE r6 #3)."""
    from kafka_connect_storage_cloud_spark.operators import rotation as R
    from kafka_connect_storage_cloud_spark.operators.partitioners import (
        partitioner_expr,
    )
    from kafka_connect_storage_cloud_spark.config import parse_properties

    # one encoded partition only: the open-file cap (2) never fires, so any
    # rotation observed is the size trigger
    rows = [(i, 1488477600000 + i * 1000, "A") for i in range(12)]
    df = spark.createDataFrame(rows, "offset long, ts_ms long, event_type string")
    rec = df.select(
        F.lit("events").alias("topic"),
        F.lit(3).cast("int").alias("kafka_partition"),
        "offset",
        F.timestamp_millis(F.col("ts_ms")).alias("timestamp"),
        F.lit("k").alias("key"),
        F.lit("{}").alias("value"),
        "event_type",
    )
    props = {
        "topics": "events",
        "format.class": "io.confluent.connect.s3.format.parquet.ParquetFormat",
        "partitioner.class": "io.confluent.connect.storage.partitioner.FieldPartitioner",
        "partition.field.name": "event_type",
        "flush.size": "5",
        "partitioner.max.open.files": "2",
    }
    manifest = run_connector(spark, props, records=rec)
    got = sorted(tuple(r) for r in manifest.collect())
    # 12 records / flush.size 5 -> three files (5, 5, 2)
    assert len(got) == 3
    cfg = parse_properties(props)
    expected = R.file_manifest(
        R.assign_files_max_open(
            rec.withColumn("encoded_partition", partitioner_expr(cfg)),
            2,
            flush_size=5,
        )
    )
    want = sorted(tuple(r) for r in expected.orderBy("file_path").collect())
    assert got == want


def test_max_open_files_key_parses_not_extra(spark):
    from kafka_connect_storage_cloud_spark.config import parse_properties

    cfg = parse_properties({"partitioner.max.open.files": "7", "flush.size": "5"})
    assert cfg.partitioner_max_open_files == 7
    assert "partitioner.max.open.files" not in cfg.extra
    with pytest.raises(ValueError, match="partitioner.max.open.files"):
        parse_properties({"partitioner.max.open.files": "0"})
