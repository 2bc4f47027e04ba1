"""Rotation semantics on hand-built micro-streams — the reference's
TopicPartitionWriterTest equivalents (expected file keys for given
flush.size / rotate.interval)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_spark.operators import rotation as R


def _records(spark, rows):
    df = spark.createDataFrame(
        rows, "topic string, kafka_partition int, offset long, timestamp timestamp"
    )
    return df.withColumn("encoded_partition", F.lit("p"))


TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_flush_size_boundaries(spark):
    rows = [("t", 0, i, TS0) for i in range(7)]
    out = R.assign_files_flush_size(_records(spark, rows), flush_size=3)
    got = {r["offset"]: (r["file_seq"], r["file_start_offset"]) for r in out.collect()}
    assert got == {
        0: (0, 0), 1: (0, 0), 2: (0, 0),
        3: (1, 3), 4: (1, 3), 5: (1, 5) if False else (1, 3),
        6: (2, 6),
    }


def test_flush_size_file_names_use_start_offset(spark):
    rows = [("t", 4, i + 100, TS0) for i in range(4)]
    out = R.assign_files_flush_size(_records(spark, rows), flush_size=2, ext="bin")
    paths = sorted({r["file_path"] for r in out.collect()})
    assert paths == ["t/p/t+4+0000000100.bin", "t/p/t+4+0000000102.bin"]


def test_rotate_interval_resets_base(spark):
    """Base timestamp resets on each new file: records at +0s,+30s,+61s,+70s,
    +130s with 60s interval -> files {0,30},{61,70},{130}."""
    offs = [0, 30, 61, 70, 130]
    rows = [("t", 0, i, TS0 + dt.timedelta(seconds=s)) for i, s in enumerate(offs)]
    out = R.assign_files_rotate_interval(_records(spark, rows), rotate_interval_ms=60_000)
    seqs = {r["offset"]: r["file_seq"] for r in out.collect()}
    assert seqs == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


def test_rotate_interval_exact_boundary_rotates(spark):
    """span == interval rotates (reference: >= rotateIntervalMs)."""
    rows = [
        ("t", 0, 0, TS0),
        ("t", 0, 1, TS0 + dt.timedelta(milliseconds=59_999)),
        ("t", 0, 2, TS0 + dt.timedelta(milliseconds=60_000)),
    ]
    out = R.assign_files_rotate_interval(_records(spark, rows), rotate_interval_ms=60_000)
    seqs = {r["offset"]: r["file_seq"] for r in out.collect()}
    assert seqs == {0: 0, 1: 0, 2: 1}


def test_scheduled_rotation_fixed_buckets(spark):
    rows = [
        ("t", 0, 0, TS0),
        ("t", 0, 1, TS0 + dt.timedelta(minutes=59)),
        ("t", 0, 2, TS0 + dt.timedelta(minutes=60)),
        ("t", 0, 3, TS0 + dt.timedelta(minutes=200)),
    ]
    out = R.assign_files_scheduled(_records(spark, rows), interval_ms=3_600_000)
    seqs = sorted({(r["offset"], r["file_seq"]) for r in out.collect()})
    buckets = {o: s for o, s in seqs}
    assert buckets[0] == buckets[1]
    assert buckets[2] == buckets[1] + 1
    assert buckets[3] == buckets[1] + 3


def test_manifest_replay_invariant(spark):
    rows = [("t", 0, i, TS0) for i in range(10)]
    rec = _records(spark, rows)
    once = R.file_manifest(R.assign_files_flush_size(rec, 4)).collect()
    replay = rec.unionAll(rec).dropDuplicates(["kafka_partition", "offset"])
    twice = R.file_manifest(R.assign_files_flush_size(replay, 4)).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


def test_partition_change_isolation(spark):
    """Files never span encoded partitions (rotate-on-partition-change)."""
    rows = [("t", 0, i, TS0) for i in range(6)]
    df = spark.createDataFrame(
        rows, "topic string, kafka_partition int, offset long, timestamp timestamp"
    ).withColumn("encoded_partition", F.when(F.col("offset") % 2 == 0, "even").otherwise("odd"))
    out = R.assign_files_flush_size(df, flush_size=100)
    per_file = out.groupBy("file_path").agg(F.countDistinct("encoded_partition").alias("n"))
    assert all(r["n"] == 1 for r in per_file.collect())


def test_partition_change_rotates_and_restarts_files(spark):
    """TopicPartitionWriter.java:630-657: returning to a previously seen
    encoded partition starts a NEW file — offsets within a file must be one
    contiguous run."""
    rows = [("t", 0, i, TS0) for i in range(6)]
    df = spark.createDataFrame(
        rows, "topic string, kafka_partition int, offset long, timestamp timestamp"
    ).withColumn(
        "encoded_partition",
        F.when(F.col("offset").isin(0, 1, 4, 5), "a").otherwise("b"),
    )
    out = R.assign_files_partition_change(df)
    by_file = {}
    for r in out.collect():
        by_file.setdefault(r["file_path"], []).append(r["offset"])
    # runs: a=[0,1], b=[2,3], a=[4,5] -> three files, two under partition a
    assert {p: sorted(o) for p, o in by_file.items()} == {
        "t/a/t+0+0000000000.parquet": [0, 1],
        "t/b/t+0+0000000002.parquet": [2, 3],
        "t/a/t+0+0000000004.parquet": [4, 5],
    }


def test_kafka_source_is_gated():
    from pyspark.sql import SparkSession

    from kafka_connect_storage_cloud_spark.sources.topic import kafka_source

    spark = SparkSession.getActiveSession() or SparkSession.builder.master(
        "local[2]"
    ).getOrCreate()
    with pytest.raises(NotImplementedError, match="Kafka source requires"):
        kafka_source(spark, "localhost:9092", "events")


def test_max_open_files_commits_all_open_files(spark):
    """rotateOnPartitionerMaxOpenFiles (TopicPartitionWriter.java:530-541):
    a record for a NOT-open encoded partition at a full open set (== limit)
    commits EVERY open file. Stream p1 p2 p1 p3 p1 p2 with limit 2:
    p3's arrival at {p1,p2} rotates -> epoch 1 opens with p3; the later p1/p2
    records then reopen NEW files in epoch 1."""
    import pyspark.sql.functions as F

    rows = [
        ("t", 0, 0, "p1"), ("t", 0, 1, "p2"), ("t", 0, 2, "p1"),
        ("t", 0, 3, "p3"), ("t", 0, 4, "p1"), ("t", 0, 5, "p2"),
    ]
    df = spark.createDataFrame(
        rows, "topic string, kafka_partition int, offset long, encoded_partition string"
    ).withColumn("timestamp", F.lit(None).cast("timestamp"))
    out = R.assign_files_max_open(df, 2)
    got = {r["offset"]: (r["epoch"], r["file_start_offset"]) for r in out.collect()}
    assert got == {
        0: (0, 0),  # p1 epoch0 file starts at 0
        1: (0, 1),  # p2 epoch0
        2: (0, 0),  # p1 same open file
        3: (1, 3),  # p3 trips the cap -> commit all, epoch1
        4: (1, 4),  # p1 reopens in epoch1 (new file, new start offset)
        5: (2, 5),  # p2 arrives at full epoch1 set {p3,p1} -> rotates again
    }


def test_max_open_files_exact_epochs(spark):
    """Tighter pin, no ambiguity: limit 2, stream p1 p2 p3 p1 -> p3 rotates
    (epoch1={p3}), p1 joins epoch1's open set (size 1 < 2, no rotation)."""
    import pyspark.sql.functions as F

    rows = [("t", 0, 0, "p1"), ("t", 0, 1, "p2"), ("t", 0, 2, "p3"), ("t", 0, 3, "p1")]
    df = spark.createDataFrame(
        rows, "topic string, kafka_partition int, offset long, encoded_partition string"
    ).withColumn("timestamp", F.lit(None).cast("timestamp"))
    got = {
        r["offset"]: (r["epoch"], r["file_start_offset"])
        for r in R.assign_files_max_open(df, 2).collect()
    }
    assert got == {0: (0, 0), 1: (0, 1), 2: (1, 2), 3: (1, 3)}
