"""Sink tests modeled on the reference's DataWriter*Test / TopicPartitionWriterTest:
expected partition layout, record roundtrip per format, flush.size file caps,
exactly-once replay idempotence."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_spark.operators import partitioners as P
from kafka_connect_storage_cloud_spark.sinks.writers import (
    SinkConfig,
    write_kv_header_views,
    write_partitioned,
)
from kafka_connect_storage_cloud_spark.sources.topic import events_as_topic


@pytest.fixture()
def records(spark, sf_small):
    return events_as_topic(spark, sf_small).withColumn(
        "encoded_partition", P.field_partitioner(["event_type"])
    )


def _data_files(path, ext):
    return [
        f
        for f in glob.glob(f"{path}/**/*", recursive=True)
        if os.path.isfile(f) and ext in f and not f.endswith(".crc") and "_SUCCESS" not in f
    ]


def test_parquet_partition_layout_and_roundtrip(spark, records, tmp_path):
    out = str(tmp_path / "out")
    write_partitioned(records.select("offset", "value", "encoded_partition"), out, SinkConfig())
    dirs = {os.path.basename(d) for d in glob.glob(f"{out}/*") if os.path.isdir(d)}
    types = {r[0] for r in records.select("event_type").distinct().collect()}
    assert dirs == {f"encoded_partition=event_type%3D{t}" for t in types}
    back = spark.read.parquet(out)
    assert back.count() == records.count()
    orig = {(r["offset"], r["value"]) for r in records.select("offset", "value").collect()}
    got = {(r["offset"], r["value"]) for r in back.select("offset", "value").collect()}
    assert got == orig


def test_flush_size_caps_files(spark, records, tmp_path):
    out = str(tmp_path / "flush")
    n = records.count()
    write_partitioned(
        records.select("offset", "encoded_partition"), out, SinkConfig(flush_size=50)
    )
    files = _data_files(out, ".parquet")
    # every data file holds <= 50 records
    for f in files:
        assert spark.read.parquet(f).count() <= 50
    assert spark.read.parquet(out).count() == n


def test_json_gzip_roundtrip(spark, records, tmp_path):
    out = str(tmp_path / "json")
    write_partitioned(
        records.select("offset", "value", "encoded_partition"),
        out,
        SinkConfig(format="json", compression="gzip"),
    )
    assert _data_files(out, ".json.gz"), "expected gzipped json parts"
    back = spark.read.json(out)
    assert back.count() == records.count()


def test_csv_roundtrip(spark, records, tmp_path):
    out = str(tmp_path / "csv")
    write_partitioned(
        records.select("offset", "key", "encoded_partition"),
        out,
        SinkConfig(format="csv"),
    )
    back = spark.read.option("inferSchema", "true").csv(out)
    assert back.count() == records.count()


def test_bytearray_roundtrip(spark, records, tmp_path):
    """ByteArrayFormat analog: raw values, newline separated, partition
    layout preserved; non-null payloads survive the roundtrip verbatim."""
    out = str(tmp_path / "ba")
    src = records.where(F.col("value").isNotNull()).select("value", "encoded_partition")
    write_partitioned(src, out, SinkConfig(format="bytearray"))
    back = spark.read.text(out)
    assert back.count() == src.count()
    assert {r[0] for r in back.collect()} == {r[0] for r in src.select("value").collect()}


def test_bytearray_gzip_produces_gz_files(spark, records, tmp_path):
    out = str(tmp_path / "ba_gz")
    src = records.where(F.col("value").isNotNull()).select("value", "encoded_partition")
    write_partitioned(src, out, SinkConfig(format="bytearray", compression="gzip"))
    assert _data_files(out, ".gz"), "expected gzip text files"
    assert spark.read.text(out).count() == src.count()


def test_avro_roundtrip(spark, records, tmp_path):
    """Avro sink (pure-Python container fallback when spark-avro is
    absent): spec-compliant .avro files, hive partition layout, values
    round-trip exactly."""
    from kafka_connect_storage_cloud_spark.sinks.avro_py import read_avro_dir

    out = str(tmp_path / "avro")
    src = records.select("offset", "key", "value", "encoded_partition")
    write_partitioned(src, out, SinkConfig(format="avro"))
    back = read_avro_dir(out)
    want = {
        (r["offset"], r["key"], r["value"], r["encoded_partition"])
        for r in src.collect()
    }
    got = {
        (r["offset"], r["key"], r["value"], r["encoded_partition"]) for r in back
    }
    assert got == want


def test_avro_deflate_and_flush_size(spark, records, tmp_path):
    """gzip maps to the Avro deflate codec; flush_size caps records per
    container file; replay rewrites identical bytes (exactly-once)."""
    import glob
    import os

    from kafka_connect_storage_cloud_spark.sinks.avro_py import (
        read_avro_dir,
        read_container,
    )

    out = str(tmp_path / "avro_gz")
    src = records.select("offset", "value", "encoded_partition")
    cfg = SinkConfig(format="avro", compression="gzip", flush_size=7)
    write_partitioned(src, out, cfg)
    files = sorted(glob.glob(os.path.join(out, "**", "*.avro"), recursive=True))
    assert files
    schema, rows = read_container(files[0])
    assert len(rows) <= 7
    assert len(read_avro_dir(out)) == src.count()
    before = {f: open(f, "rb").read() for f in files}
    write_partitioned(src, out, cfg)  # replay
    after = {f: open(f, "rb").read() for f in sorted(
        glob.glob(os.path.join(out, "**", "*.avro"), recursive=True))}
    assert before == after


def test_avro_snappy_still_gated(records, tmp_path):
    with pytest.raises(NotImplementedError):
        write_partitioned(
            records.select("offset", "encoded_partition"),
            str(tmp_path / "avro_snappy"),
            SinkConfig(format="avro", compression="snappy"),
        )


def test_exactly_once_replay_idempotent(spark, records, tmp_path):
    """Writing the same batch twice must not duplicate data — the connector's
    replay guarantee (start-offset file keys overwrite)."""
    out = str(tmp_path / "replay")
    sel = records.select("offset", "value", "encoded_partition")
    write_partitioned(sel, out, SinkConfig())
    first = spark.read.parquet(out).count()
    write_partitioned(sel, out, SinkConfig())  # replay
    assert spark.read.parquet(out).count() == first


def test_kv_header_views_sibling_datasets(spark, records, tmp_path):
    base = str(tmp_path / "views")
    write_kv_header_views(records, base, SinkConfig())
    n = records.count()
    assert spark.read.parquet(f"{base}/values").count() == n
    assert spark.read.parquet(f"{base}/keys").count() == n
    hdr = spark.read.parquet(f"{base}/headers")
    assert hdr.count() == n
    assert set(hdr.columns) == {"encoded_partition", "offset", "headers"}


def test_tombstone_partition_layout(spark, sf_small, tmp_path):
    rec = events_as_topic(spark, sf_small).withColumn(
        "value",
        F.when(F.pmod(F.col("offset"), F.lit(50)) == 0, F.lit(None)).otherwise(F.col("value")),
    )
    rec = rec.withColumn(
        "encoded_partition",
        P.tombstone_supported_partitioner(F.col("value"), P.field_partitioner(["event_type"])),
    )
    out = str(tmp_path / "tomb")
    write_partitioned(rec.select("offset", "value", "encoded_partition"), out, SinkConfig())
    dirs = {os.path.basename(d) for d in glob.glob(f"{out}/*") if os.path.isdir(d)}
    assert "encoded_partition=tombstone" in dirs
    tomb = spark.read.parquet(out).where(F.col("encoded_partition") == "tombstone")
    assert tomb.where(F.col("value").isNotNull()).count() == 0


@pytest.mark.parametrize("codec", ["snappy", "zstd", "gzip"])
def test_parquet_compression_codecs_roundtrip(spark, records, tmp_path, codec):
    """s3.compression.type analog for parquet: each codec writes readable
    files with the codec visible in the file name."""
    out = str(tmp_path / f"pq_{codec}")
    src = records.select("offset", "value", "encoded_partition")
    write_partitioned(src, out, SinkConfig(format="parquet", compression=codec))
    files = _data_files(out, ".parquet")
    token = {"snappy": ".snappy.", "zstd": ".zstd.", "gzip": ".gz."}[codec]
    assert files and all(token in os.path.basename(f) for f in files)
    assert spark.read.parquet(out).count() == src.count()


def test_gzip_compression_level_honored(spark, tmp_path):
    """s3.compression.level: BEST_COMPRESSION output is no larger than
    BEST_SPEED on compressible data, and both roundtrip identically."""
    df = spark.range(2000).select(
        F.lit("grp").alias("encoded_partition"),
        F.concat(F.lit("payload-" * 30), (F.col("id") % 7).cast("string")).alias("value"),
    )
    sizes = {}
    for level in (1, 9):
        out = str(tmp_path / f"lvl{level}")
        cfg = SinkConfig(format="json", compression="gzip", compression_level=level)
        write_partitioned(df, out, cfg)
        files = _data_files(out, ".gz")
        assert files
        sizes[level] = sum(os.path.getsize(f) for f in files)
        back = spark.read.json(out)
        assert back.count() == 2000
    assert sizes[9] <= sizes[1]


def test_bytearray_separator_roundtrip(spark, records, tmp_path):
    """format.bytearray.separator: custom record separator is honored and
    round-trips through the matching read-side lineSep."""
    out = str(tmp_path / "sep")
    cfg = SinkConfig(format="bytearray", bytearray_separator="|#|")
    write_partitioned(records.select("encoded_partition", "value"), out, cfg)
    back = spark.read.option("lineSep", "|#|").text(out)
    n_values = records.where(F.col("value").isNotNull()).count()
    assert back.where(F.length("value") > 0).count() == n_values


def test_compression_level_validation():
    from kafka_connect_storage_cloud_spark.config import parse_properties

    with pytest.raises(ValueError):
        parse_properties({"s3.compression.level": "10"})
    cfg = parse_properties(
        {
            "s3.compression.level": "9",
            "s3.schema.partition.affix.type": "suffix",
            "tombstone.encoded.partition": "null-records",
            "format.bytearray.separator": ";",
        }
    )
    assert cfg.compression_level == 9
    assert cfg.schema_affix_type == "SUFFIX"
    assert cfg.tombstone_encoded_partition == "null-records"
    assert cfg.bytearray_separator == ";"


def test_readback_prunes_partitions(spark, records, tmp_path):
    """The consumer side of the connector layout: a filter on the encoded
    partition column must prune directories at planning time (PartitionFilters
    on the scan), not read-and-filter — the property that makes reading one
    hour out of a year of S3 layout cheap."""
    out = str(tmp_path / "pruned")
    write_partitioned(records, out, SinkConfig())
    one_part = spark.read.parquet(out).where(
        F.col("encoded_partition") == "event_type=click"
    )
    plan = one_part._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [" in plan
    assert "event_type=click" in plan
    # and the filter is partition-level: no row-level Filter over the payload
    got = {r[0] for r in one_part.select("encoded_partition").distinct().collect()}
    assert got == {"event_type=click"}


def test_max_open_files_cap_still_writes_all_partitions(spark, records, tmp_path):
    """partitioner.max.open.files -> maxConcurrentOutputFileWriters: with a
    cap of 1 concurrent writer the layout and content are unchanged (Spark
    falls back to sort-then-stream per partition)."""
    out = str(tmp_path / "capped")
    try:
        write_partitioned(records, out, SinkConfig(max_open_files=1))
        back = spark.read.parquet(out)
        assert back.count() == records.count()
        n_parts = records.select("encoded_partition").distinct().count()
        assert back.select("encoded_partition").distinct().count() == n_parts
    finally:
        spark.conf.unset("spark.sql.maxConcurrentOutputFileWriters")


def test_readback_merges_evolved_schemas(spark, records, tmp_path):
    """BACKWARD schema evolution across connector runs: a later run adds a
    column; read-back surfaces it as NULL for the earlier run's files."""
    from kafka_connect_storage_cloud_spark.sources.readback import (
        read_connector_output,
        read_manifest,
    )

    out = str(tmp_path / "evolved")
    v1 = records.select("encoded_partition", "offset", "value")
    v2 = records.select(
        "encoded_partition", "offset", "value", F.lit("hdr").alias("new_header")
    ).withColumn("offset", F.col("offset") + 1_000_000)
    write_partitioned(v1, out, SinkConfig(mode="append"))
    write_partitioned(v2, out, SinkConfig(mode="append"))
    back = read_connector_output(spark, out)
    assert "new_header" in back.columns
    assert back.count() == v1.count() + v2.count()
    assert back.where(F.col("new_header").isNull()).count() == v1.count()
    assert "encoded_partition" in back.columns


def test_read_manifest_sidecar(spark, records, tmp_path):
    from kafka_connect_storage_cloud_spark.connector import run_connector
    from kafka_connect_storage_cloud_spark.sources.readback import read_manifest

    props = {
        "topics": "events",
        "format.class": "parquet",
        "partitioner.class": "io.confluent.connect.storage.partitioner.FieldPartitioner",
        "partition.field.name": "event_type",
        "flush.size": "100",
        "behavior.on.null.values": "ignore",
    }
    out = str(tmp_path / "mf")
    manifest = run_connector(spark, props, sf_dir="/root/testdata/sf0.001", output_path=out)
    back = read_manifest(spark, out)
    assert back.count() == manifest.count()


def test_avro_py_conformance_against_jvm_reference_reader(spark, records, tmp_path):
    """Independent spec-conformance gate: files written by the pure-Python
    container writer must be readable by the REFERENCE implementation —
    org.apache.avro's DataFileReader (the avro jar Spark bundles) — with
    identical schema and values, under both the null and deflate codecs.
    This is the cross-check that avro_py implements the spec, not a
    self-consistent dialect."""
    import json

    from kafka_connect_storage_cloud_spark.sinks import avro_py as A

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
            {"name": "flag", "type": "boolean"},
            {"name": "tags", "type": {"type": "array", "items": "int"}},
        ],
    }
    rows = [
        {"id": 1, "name": "alpha", "score": 1.5, "flag": True, "tags": [1, -2, 3]},
        {"id": -(2**60), "name": None, "score": -2.25, "flag": False, "tags": []},
        {"id": 0, "name": "", "score": 0.0, "flag": True, "tags": [0]},
    ]
    jvm = spark._jvm
    for codec in ("null", "deflate"):
        path = str(tmp_path / f"conf_{codec}.avro")
        A.write_container(path, schema, rows, codec=codec)
        freader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
        )
        assert json.loads(freader.getSchema().toString()) == schema
        got = []
        while freader.hasNext():
            got.append(json.loads(str(freader.next())))
        freader.close()
        assert got == rows, codec
    # and a real sink-written partition file
    out = str(tmp_path / "sink_avro")
    src = records.select("offset", "key", "value", "encoded_partition")
    write_partitioned(src, out, SinkConfig(format="avro"))
    import glob
    import os

    files = sorted(glob.glob(os.path.join(out, "**", "*.avro"), recursive=True))
    assert files
    freader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(files[0]), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    n = 0
    while freader.hasNext():
        freader.next()
        n += 1
    freader.close()
    assert n > 0


def test_avro_readback_distributed(spark, records, tmp_path):
    """Consumer read-back of an avro-landed dataset without spark-avro:
    read_connector_output(fmt='avro') falls back to the distributed
    pure-Python container reader and returns the full dataset with the
    partition column restored."""
    from kafka_connect_storage_cloud_spark.sources.readback import read_connector_output

    out = str(tmp_path / "avro_rb")
    src = records.select("offset", "key", "value", "encoded_partition")
    write_partitioned(src, out, SinkConfig(format="avro"))
    back = read_connector_output(spark, out, fmt="avro")
    want = {
        (r["offset"], r["key"], r["value"], r["encoded_partition"])
        for r in src.collect()
    }
    got = {
        (r["offset"], r["key"], r["value"], r["encoded_partition"])
        for r in back.collect()
    }
    assert got == want
