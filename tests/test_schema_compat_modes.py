"""schema.compatibility mode matrix (VERDICT r3 #7): the four
StorageSchemaCompatibility modes applied to one version-flipping stream
must differ exactly as the reference's shouldChangeSchema/project pair
does (TopicPartitionWriter.java:471-505): NONE rotates on EVERY version
change in both directions; BACKWARD/FULL rotate only on upgrades and
project older records up; FORWARD rotates only on downgrades and projects
newer records down."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_spark.operators import rotation as R

TS0 = dt.datetime(2024, 1, 1)

# one kafka partition, one encoded partition, versions 1,1,2,2,1,1,3,3
_VERSIONS = [1, 1, 2, 2, 1, 1, 3, 3]


@pytest.fixture(scope="module")
def stream(spark):
    rows = [("t", 0, i, TS0, v) for i, v in enumerate(_VERSIONS)]
    return spark.createDataFrame(
        rows,
        "topic string, kafka_partition int, offset long, "
        "timestamp timestamp, schema_version int",
    ).withColumn("encoded_partition", F.lit("p"))


def _files(df):
    rows = df.select("offset", "file_seq", "projected_version").collect()
    return {r["offset"]: (r["file_seq"], r["projected_version"]) for r in rows}


def test_none_rotates_on_every_version_change(stream):
    got = _files(R.assign_files_schema_compat(stream, "NONE"))
    # runs: 1,1 | 2,2 | 1,1 | 3,3 -> four files, no projection ever
    assert got == {
        0: (0, 1), 1: (0, 1), 2: (1, 2), 3: (1, 2),
        4: (2, 1), 5: (2, 1), 6: (3, 3), 7: (3, 3),
    }


@pytest.mark.parametrize("mode", ["BACKWARD", "FULL"])
def test_backward_rotates_on_upgrade_and_projects_up(stream, mode):
    got = _files(R.assign_files_schema_compat(stream, mode))
    # current = running max: v1 file (offsets 0-1), v2 file (2-5: the v1
    # records at 4-5 are PROJECTED up to 2, no rotation), v3 file (6-7)
    assert got == {
        0: (0, 1), 1: (0, 1), 2: (1, 2), 3: (1, 2),
        4: (1, 2), 5: (1, 2), 6: (2, 3), 7: (2, 3),
    }


def test_forward_rotates_on_downgrade_and_projects_down(stream):
    got = _files(R.assign_files_schema_compat(stream, "FORWARD"))
    # current = running min: everything stays version 1 (the v2/v3 records
    # project DOWN; the stream never goes below its starting version, so
    # one file)
    assert got == {i: (0, 1) for i in range(8)}


def test_forward_actually_rotates_when_version_drops(spark):
    rows = [("t", 0, i, TS0, v) for i, v in enumerate([3, 3, 2, 2, 3, 1])]
    df = spark.createDataFrame(
        rows,
        "topic string, kafka_partition int, offset long, "
        "timestamp timestamp, schema_version int",
    ).withColumn("encoded_partition", F.lit("p"))
    got = _files(R.assign_files_schema_compat(df, "FORWARD"))
    assert got == {
        0: (0, 3), 1: (0, 3), 2: (1, 2), 3: (1, 2), 4: (1, 2), 5: (2, 1),
    }


def test_invalid_mode_rejected(stream):
    with pytest.raises(ValueError, match="schema.compatibility"):
        R.assign_files_schema_compat(stream, "SIDEWAYS")


def test_mode_file_counts_ordered_on_real_corpus(spark, sf_small):
    """On the synthetic 3-version deployment, NONE must open at least as
    many files as BACKWARD/FULL (every flip vs upgrades only), and FORWARD
    the fewest (the cycle starts at its minimum in most groups)."""
    from kafka_connect_storage_cloud_spark.plans.connector import (
        schema_compat_rotation_plan,
    )

    counts = {
        m: schema_compat_rotation_plan(spark, sf_small, m).count()
        for m in ("NONE", "BACKWARD", "FULL", "FORWARD")
    }
    assert counts["BACKWARD"] == counts["FULL"]
    assert counts["NONE"] >= counts["BACKWARD"] >= counts["FORWARD"]
    # BACKWARD projects: some records must carry a version they didn't arrive with
    projected = (
        schema_compat_rotation_plan(spark, sf_small, "BACKWARD")
        .agg(F.sum("n_projected"))
        .collect()[0][0]
    )
    assert projected > 0
