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
