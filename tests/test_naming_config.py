"""The five file/dir naming config keys (VERDICT r3 next-round #3/#8):
`filename.offset.zero.pad.width`, `topics.dir`, `directory.delim`,
`file.delim` (TopicPartitionWriter.java:186,216-221,868-883) and the
TimeBasedPartitioner `locale` (storage-common PartitionerConfig). The
layout fixture test pins the engine's keys byte-for-byte against the
expectations of the reference's own TopicPartitionWriterTest, whose test
FileUtils uses TEST_DIRECTORY_DELIM="_" / TEST_FILE_DELIM="#" and whose
zero-pad test asserts "%02d" keys at flush.size=3
(TopicPartitionWriterTest.java:288-292 with StorageSinkTestBase's
TOPIC="topic", PARTITION=12, topics.dir="topics")."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_spark.config import parse_properties
from kafka_connect_storage_cloud_spark.connector import (
    recover_resume_offsets,
    resume_name_re,
    run_connector,
)
from kafka_connect_storage_cloud_spark.operators import partitioners as P
from kafka_connect_storage_cloud_spark.operators import rotation as R

TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _records(spark, rows):
    df = spark.createDataFrame(
        rows, "topic string, kafka_partition int, offset long, timestamp timestamp"
    )
    return df.withColumn("encoded_partition", F.lit("p"))


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


def test_parse_all_five_naming_keys():
    cfg = parse_properties(
        {
            "topics": "events",
            "topics.dir": "topics",
            "directory.delim": "_",
            "file.delim": "#",
            "filename.offset.zero.pad.width": "2",
            "locale": "fr-FR",
        }
    )
    assert cfg.topics_dir == "topics"
    assert cfg.directory_delim == "_"
    assert cfg.file_delim == "#"
    assert cfg.zero_pad_width == 2
    assert cfg.locale == "fr_FR"
    n = cfg.naming
    assert (n.topics_dir, n.dir_delim, n.file_delim, n.zero_pad_width) == (
        "topics", "_", "#", 2,
    )


def test_naming_defaults_match_engine_layout():
    cfg = parse_properties({"topics": "events"})
    n = cfg.naming
    # engine defaults: blank topics.dir (the reference fileKey()'s
    # isNotBlank-skip branch), reference delims, reference pad width
    assert (n.topics_dir, n.dir_delim, n.file_delim, n.zero_pad_width) == (
        "", "/", "+", 10,
    )
    assert cfg.locale == "en_US"


def test_invalid_naming_values_rejected():
    with pytest.raises(ValueError, match="zero.pad.width"):
        parse_properties({"topics": "e", "filename.offset.zero.pad.width": "-1"})
    with pytest.raises(ValueError, match="delim"):
        parse_properties({"topics": "e", "directory.delim": ""})
    with pytest.raises(ValueError, match="locale"):
        parse_properties({"topics": "e", "locale": "tlh_KX"})


# ---------------------------------------------------------------------------
# per-key layout behavior
# ---------------------------------------------------------------------------


def test_zero_pad_width_builds_reference_format(spark):
    """zeroPadOffsetFormat = "%0" + width + "d" (TopicPartitionWriter:219)."""
    rows = [("t", 4, i + 100, TS0) for i in range(4)]
    naming = R.FileNaming(zero_pad_width=2)
    out = R.assign_files_flush_size(_records(spark, rows), 2, ext="bin", naming=naming)
    assert sorted({r["file_path"] for r in out.collect()}) == [
        "t/p/t#4#100.bin".replace("#", "+"),
        "t/p/t#4#102.bin".replace("#", "+"),
    ]
    # width larger than the offset digits pads; width smaller never truncates
    wide = R.assign_files_flush_size(
        _records(spark, rows), 2, ext="bin", naming=R.FileNaming(zero_pad_width=6)
    )
    assert sorted({r["file_path"] for r in wide.collect()}) == [
        "t/p/t+4+000100.bin",
        "t/p/t+4+000102.bin",
    ]


def test_topics_dir_prefixes_and_blank_skips(spark):
    rows = [("t", 0, 0, TS0)]
    with_dir = R.assign_files_flush_size(
        _records(spark, rows), 10, naming=R.FileNaming(topics_dir="topics")
    )
    assert with_dir.collect()[0]["file_path"] == "topics/t/p/t+0+0000000000.parquet"
    blank = R.assign_files_flush_size(_records(spark, rows), 10)
    assert blank.collect()[0]["file_path"] == "t/p/t+0+0000000000.parquet"


def test_schema_partitioner_affix_joins_with_directory_delim(spark):
    """SchemaPartitioner.java:40 reads directory.delim for the affix join."""
    df = spark.createDataFrame([("s1", "enc")], "sn string, inner string")
    got = df.select(
        P.schema_partitioner(F.col("sn"), F.col("inner"), "PREFIX", "_").alias("p"),
        P.schema_partitioner(F.col("sn"), F.col("inner"), "SUFFIX", "_").alias("s"),
    ).collect()[0]
    assert got["p"] == "schema_name=s1_enc"
    assert got["s"] == "enc_schema_name=s1"


def test_locale_renders_shipped_name_tables(spark):
    ts = dt.datetime(2024, 3, 4, 7, 0, 0)  # March, a Monday
    df = spark.createDataFrame([(ts,)], "ts timestamp")
    pat = "'m'=MMM/'d'=EEE"
    got = {
        loc: df.select(
            P.path_format_partitioner(F.col("ts"), pat, loc).alias("x")
        ).collect()[0]["x"]
        for loc in ("en_US", "fr_FR", "de_DE")
    }
    assert got == {
        "en_US": "m=Mar/d=Mon",
        "fr_FR": "m=mars/d=lun.",
        "de_DE": "m=März/d=Mo.",
    }
    # full-name forms
    full = df.select(
        P.path_format_partitioner(F.col("ts"), "MMMM'/'EEEE", "en_US").alias("x")
    ).collect()[0]["x"]
    assert full == "March/Monday"


# ---------------------------------------------------------------------------
# reference-fixture layout parity (VERDICT r3 #8)
# ---------------------------------------------------------------------------


def test_layout_matches_reference_test_fixture(spark):
    """Byte-identical keys vs the reference's zero-pad writer test:
    TopicPartitionWriterTest.java:288-292 expects, for 9 records at
    flush.size=3 through DefaultPartitioner with the test harness's
    delims (dir "_", file "#"), topics.dir="topics" and pad "%02d":
        topics_topic_partition=12_topic#12#00.avro  (offsets 0-2)
        topics_topic_partition=12_topic#12#03.avro  (offsets 3-5)
        topics_topic_partition=12_topic#12#06.avro  (offsets 6-8)
    (fixture strings derived from test util FileUtils.fileKeyToCommit with
    TEST_DIRECTORY_DELIM/_FILE_DELIM and StorageSinkTestBase TOPIC="topic",
    PARTITION=12)."""
    naming = R.FileNaming(
        topics_dir="topics", dir_delim="_", file_delim="#", zero_pad_width=2
    )
    rows = [("topic", 12, i, TS0) for i in range(9)]
    rec = spark.createDataFrame(
        rows, "topic string, kafka_partition int, offset long, timestamp timestamp"
    ).withColumn("encoded_partition", P.default_partitioner(F.col("kafka_partition")))
    out = R.assign_files_flush_size(rec, 3, ext="avro", naming=naming)
    assert sorted({r["file_path"] for r in out.collect()}) == [
        "topics_topic_partition=12_topic#12#00.avro",
        "topics_topic_partition=12_topic#12#03.avro",
        "topics_topic_partition=12_topic#12#06.avro",
    ]


# ---------------------------------------------------------------------------
# e2e: property file -> manifest -> resume round-trip at non-default naming
# ---------------------------------------------------------------------------


def test_run_connector_naming_keys_end_to_end(spark, sf_small, tmp_path):
    props = {
        "topics": "events",
        "format.class": "parquet",
        "flush.size": "200",
        "topics.dir": "topics",
        "file.delim": "#",
        "filename.offset.zero.pad.width": "6",
    }
    out = str(tmp_path / "sink")
    manifest = run_connector(spark, props, sf_dir=sf_small, output_path=out)
    paths = [r["file_path"] for r in manifest.collect()]
    assert paths and all(p.startswith("topics/events/") for p in paths)
    assert all("#" in p and "+" not in p.split("/")[-1] for p in paths)
    # offsets render at width 6
    import re

    for p in paths:
        m = re.search(resume_name_re(parse_properties(props).naming), p)
        assert m, p
        assert len(m.group(3)) == 6, p
    # resume recovery parses the custom layout
    resumed = recover_resume_offsets(
        spark, out, naming=parse_properties(props).naming
    ).collect()
    assert resumed and all(r["topic"] == "events" for r in resumed)
