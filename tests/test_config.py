"""Config parity: connector property maps parse with reference defaults and
validation (S3SinkConnectorConfig.java behaviors)."""

import pytest

from kafka_connect_storage_cloud_spark.config import ConnectorConfig, parse_properties


def test_defaults_match_reference():
    cfg = ConnectorConfig()
    assert cfg.behavior_on_null_values == "fail"  # BEHAVIOR_ON_NULL_VALUES_DEFAULT
    assert cfg.compression_type == "none"  # COMPRESSION_TYPE_DEFAULT
    assert cfg.rotate_file_on_partition_change is True
    assert cfg.schema_compatibility == "NONE"


def test_parse_connector_property_map():
    cfg = parse_properties(
        {
            "topics": "events,orders",
            "format.class": "io.confluent.connect.s3.format.parquet.ParquetFormat",
            "flush.size": "500",
            "rotate.interval.ms": "60000",
            "partitioner.class": "io.confluent.connect.storage.partitioner.TimeBasedPartitioner",
            "path.format": "year/month/day",
            "timestamp.extractor": "RecordField",
            "timestamp.field": "ts",
            "s3.compression.type": "gzip",
            "behavior.on.null.values": "write",
            "store.kafka.keys": "true",
            "s3.bucket.name": "my-bucket",  # transport key -> extra
        }
    )
    assert cfg.topics == ("events", "orders")
    assert cfg.spark_format == "parquet"
    assert cfg.flush_size == 500
    assert cfg.partitioner_class == "time_based"
    assert cfg.timestamp_extractor == "RecordField"
    assert cfg.store_kafka_keys is True
    assert cfg.extra == {"s3.bucket.name": "my-bucket"}


def test_field_partitioner_class_parse():
    cfg = parse_properties(
        {
            "partitioner.class": "io.confluent.connect.storage.partitioner.FieldPartitioner",
            "partition.field.name": "event_type",
        }
    )
    assert cfg.partitioner_class == "field"
    assert cfg.partition_field_name == ("event_type",)


@pytest.mark.parametrize(
    "props",
    [
        {"flush.size": "0"},
        {"format.class": "orc"},
        {"partitioner.class": "FieldPartitioner"},  # field without fields
        {"behavior.on.null.values": "explode"},
        {"s3.compression.type": "lz77"},
        {"timestamp.extractor": "Sundial"},
        {"schema.compatibility": "SIDEWAYS"},
    ],
)
def test_validation_rejects(props):
    with pytest.raises(ValueError):
        parse_properties(props)


def test_properties_drive_partitioner_expression(spark, sf_small):
    """A user's connector property file, parsed verbatim, produces the same
    encoded partitions the reference would."""
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.operators.partitioners import partitioner_expr
    from kafka_connect_storage_cloud_spark.sources.topic import events_as_topic

    props = {
        "topics": "events",
        "format.class": "io.confluent.connect.s3.format.parquet.ParquetFormat",
        "partitioner.class": "io.confluent.connect.storage.partitioner.TimeBasedPartitioner",
        "path.format": "'dt'=YYYY-MM-dd/'hr'=HH",
        "timestamp.extractor": "Record",
        "flush.size": "100",
    }
    cfg = parse_properties(props)
    rec = events_as_topic(spark, sf_small).withColumn(
        "encoded_partition", partitioner_expr(cfg)
    )
    sample = rec.select("timestamp", "encoded_partition").first()
    assert sample["encoded_partition"] == sample["timestamp"].strftime("dt=%Y-%m-%d/hr=%H")


def test_properties_tombstone_write_routes_nulls(spark, sf_small):
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.operators.partitioners import partitioner_expr
    from kafka_connect_storage_cloud_spark.sources.topic import events_as_topic

    cfg = parse_properties(
        {
            "partitioner.class": "io.confluent.connect.storage.partitioner.DailyPartitioner",
            "behavior.on.null.values": "write",
            "store.kafka.keys": "true",
        }
    )
    rec = events_as_topic(spark, sf_small).withColumn(
        "encoded_partition", partitioner_expr(cfg)
    )
    nulls = rec.where(F.col("value").isNull())
    if nulls.count():
        assert (
            nulls.select("encoded_partition").distinct().collect()[0][0] == "tombstone"
        )
    assert (
        rec.where(F.col("value").isNotNull())
        .where(F.col("encoded_partition") == "tombstone")
        .count()
        == 0
    )


def test_properties_affix_and_tombstone_partition(spark, sf_small):
    """S3SinkTask.newPartitioner wrapping order: schema affix wraps the
    delegate, tombstone routing wraps outermost with its configured name."""
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.operators.partitioners import partitioner_expr
    from kafka_connect_storage_cloud_spark.sources.topic import events_as_topic

    cfg = parse_properties(
        {
            "partitioner.class": "io.confluent.connect.storage.partitioner.DailyPartitioner",
            "s3.schema.partition.affix.type": "SUFFIX",
            "behavior.on.null.values": "write",
            "store.kafka.keys": "true",
            "tombstone.encoded.partition": "null-records",
        }
    )
    rec = events_as_topic(spark, sf_small).withColumn(
        "encoded_partition", partitioner_expr(cfg)
    )
    non_null = rec.where(F.col("value").isNotNull()).select("encoded_partition").first()[0]
    assert "/schema_name=" in non_null and non_null.startswith("year=")
    nulls = rec.where(F.col("value").isNull())
    if nulls.count():
        assert nulls.select("encoded_partition").distinct().first()[0] == "null-records"


def test_tombstone_write_requires_stored_keys():
    """S3SinkConnectorValidator.validateTombstoneWriter: tombstone writing
    without stored keys is a config error."""
    import pytest

    with pytest.raises(ValueError, match="store.kafka.keys"):
        parse_properties({"behavior.on.null.values": "write"})
    cfg = parse_properties(
        {"behavior.on.null.values": "write", "store.kafka.keys": "true"}
    )
    assert cfg.behavior_on_null_values == "write"


def test_cross_validation_matrix():
    """SinkConnectorConfig.validate() enforces the reference validator's
    compression x format matrix (S3SinkConnectorValidator.java:
    COMPRESSION_SUPPORTED_FORMATS — gzip only for Json/ByteArray) plus the
    keys/headers sidecar formats and the wan-mode/path-style exclusion."""
    from kafka_connect_storage_cloud_spark.config import parse_properties

    def errs(extra):
        props = {"topics": "events", "flush.size": "10"}
        props.update(extra)
        return parse_properties(props).validate()

    # gzip + parquet data format: rejected (reference matrix)
    assert errs({"format.class": "parquet", "s3.compression.type": "gzip"})
    # gzip + json: fine
    assert not errs({"format.class": "json", "s3.compression.type": "gzip"})
    # gzip + bytearray: fine
    assert not errs({"format.class": "bytearray", "s3.compression.type": "gzip"})
    # snappy rides the columnar codecs (repo extension): parquet ok, json not
    assert not errs({"format.class": "parquet", "s3.compression.type": "snappy"})
    assert errs({"format.class": "json", "s3.compression.type": "snappy"})
    # sidecar keys format inherits the matrix when store.kafka.keys is on
    assert errs(
        {
            "format.class": "json",
            "s3.compression.type": "gzip",
            "store.kafka.keys": "true",
            "keys.format.class": "parquet",
        }
    )
    # wan mode and path-style access are mutually exclusive
    assert errs(
        {
            "format.class": "json",
            "s3.wan.mode": "true",
            "s3.path.style.access.enabled": "true",
        }
    )
    assert not errs({"format.class": "json", "s3.wan.mode": "true"})


def test_run_connector_rejects_invalid_cross_config(spark, sf_small):
    import pytest as _pytest

    from kafka_connect_storage_cloud_spark.connector import run_connector

    with _pytest.raises(ValueError, match="Compression Type gzip"):
        run_connector(
            spark,
            {
                "topics": "events",
                "format.class": "parquet",
                "s3.compression.type": "gzip",
                "flush.size": "10",
            },
            sf_dir=sf_small,
        )


def test_part_size_parses_and_validates_like_reference():
    """s3.part.size / s3.part.retries: typed parse with the reference's
    PartRange floor (5 MiB — S3's multipart minimum) and non-negative
    retries."""
    import pytest

    from kafka_connect_storage_cloud_spark.config import parse_properties

    cfg = parse_properties({"s3.part.size": "10485760", "s3.part.retries": "5"})
    assert cfg.part_size == 10 * 1024 * 1024
    assert cfg.part_retries == 5
    assert parse_properties({}).part_size == 25 * 1024 * 1024  # reference default
    with pytest.raises(ValueError):
        parse_properties({"s3.part.size": "1048576"})  # below the 5 MiB floor
    with pytest.raises(ValueError):
        parse_properties({"s3.part.retries": "-1"})
