"""Streaming pipeline tests: the micro-batch connector loop produces the
same partitioned layout as the batch sink, checkpointed restarts don't
duplicate, and watermarked rollups match the batch aggregation."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_spark.operators import partitioners as P
from kafka_connect_storage_cloud_spark.session import read_events
from kafka_connect_storage_cloud_spark.sinks.writers import SinkConfig
from kafka_connect_storage_cloud_spark.streaming.pipeline import (
    connector_sink_stream,
    partitioned_event_stream,
    stream_events_source,
    windowed_rollup_stream,
)


@pytest.fixture()
def batch_events(spark, sf_small):
    return read_events(spark, sf_small)


def test_stream_sink_matches_batch_layout(spark, sf_small, batch_events, tmp_path):
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    stream = partitioned_event_stream(stream_events_source(spark, sf_small))
    q = connector_sink_stream(stream, out, ckpt, SinkConfig())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == batch_events.count()
    expected_parts = {
        r[0]
        for r in batch_events.select(
            P.daily_partitioner(F.col("ts")).alias("p")
        ).distinct().collect()
    }
    actual_parts = {r[0] for r in got.select("encoded_partition").distinct().collect()}
    assert actual_parts == expected_parts


def test_stream_restart_is_idempotent(spark, sf_small, batch_events, tmp_path):
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    stream = partitioned_event_stream(stream_events_source(spark, sf_small))
    connector_sink_stream(stream, out, ckpt, SinkConfig()).awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # restart against the same checkpoint: source is exhausted -> no new data
    stream2 = partitioned_event_stream(stream_events_source(spark, sf_small))
    connector_sink_stream(stream2, out, ckpt, SinkConfig()).awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_windowed_rollup_matches_batch(spark, sf_small, batch_events, tmp_path):
    ckpt = str(tmp_path / "ckpt_roll")
    rolled = windowed_rollup_stream(stream_events_source(spark, sf_small))
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("rollup_test")
    expected = (
        batch_events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    # watermark may hold back the final window(s) in append mode; everything
    # emitted must match batch exactly
    emitted = {(r["bucket"], r["event_type"]): r["n_events"] for r in got.collect()}
    exp = {(r["bucket"], r["event_type"]): r["n_events"] for r in expected.collect()}
    assert emitted, "stream emitted nothing"
    for k, v in emitted.items():
        assert exp.get(k) == v, f"window {k}: stream={v} batch={exp.get(k)}"
