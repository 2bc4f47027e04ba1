"""File rotation: assign every record to a deterministic output file, the
Spark-first re-expression of TopicPartitionWriter's rotation + commit logic
(reference /root/reference/.../TopicPartitionWriter.java:610-703, 954-1023).

Three rotation policies, matching the connector's:

1. flush.size           -> a file closes after N records
2. rotate.schedule      -> a file closes at fixed wall-clock boundaries
                           (deterministic form: fixed time buckets of the
                           record timestamp — what the schedule converges to
                           under steady flow)
3. rotate.interval.ms   -> a file closes when recordTimestamp -
                           baseRecordTimestamp >= interval, where base is the
                           FIRST record's timestamp in the file (resets per
                           file). Sequential semantics — implemented with
                           applyInPandas per (kafka_partition,
                           encoded_partition) group.

File naming is the connector's exactly-once scheme
(util/S3FileUtils.fileKeyToCommit): the file is named by the START offset of
the records it holds —
    <topic>/<encodedPartition>/<topic>+<kafkaPartition>+<startOffset>.<ext>
so re-processing the same offsets reproduces byte-identical file keys and
overwrites are idempotent (the connector's exactly-once guarantee).

Scale notes: policies 1-2 are pure window functions over
(kafka_partition, encoded_partition) ordered by offset — one shuffle, fully
parallel across partitions, no driver involvement. Policy 3 runs
applyInPandas per group; groups are per (kafka_partition, encodedPartition),
i.e. thousands of modest groups at 100 TB, not one giant one.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FileNaming:
    """The four file/dir naming knobs of TopicPartitionWriter.fileKeyToCommit
    (TopicPartitionWriter.java:868-883, config reads :186,216-221):

    - topics_dir  (`topics.dir`): prefix above the per-topic directory. The
      reference defaults to "topics" under the bucket root; this engine's
      sink root IS the topics dir, so the engine default is "" — the blank
      branch of the reference's own fileKey() (StringUtils.isNotBlank skip).
      Set it to reproduce a reference bucket's key space byte-for-byte.
    - dir_delim   (`directory.delim`, reference default "/")
    - file_delim  (`file.delim`, reference default "+")
    - zero_pad_width (`filename.offset.zero.pad.width`, reference default 10:
      zeroPadOffsetFormat = "%0" + width + "d", TopicPartitionWriter.java:219)
    """

    topics_dir: str = ""
    dir_delim: str = "/"
    file_delim: str = "+"
    zero_pad_width: int = 10


DEFAULT_NAMING = FileNaming()


def _file_name(ext: str, naming: FileNaming = DEFAULT_NAMING) -> F.Column:
    return F.concat(
        F.col("topic"),
        F.lit(naming.file_delim),
        F.col("kafka_partition").cast("string"),
        F.lit(naming.file_delim),
        F.format_string(f"%0{int(naming.zero_pad_width)}d", F.col("file_start_offset")),
        F.lit(f".{ext}"),
    )


def _with_file_path(
    out: DataFrame, ext: str, naming: FileNaming = DEFAULT_NAMING
) -> DataFrame:
    """fileKeyToCommit: [<topics_dir><dirDelim>]<topic><dirDelim>
    <encodedPartition><dirDelim><topic><fileDelim><kafkaPartition>
    <fileDelim><zeroPad(startOffset)>.<ext>."""
    head = [F.lit(naming.topics_dir), F.lit(naming.dir_delim)] if naming.topics_dir else []
    return out.withColumn(
        "file_path",
        F.concat(
            *head,
            F.col("topic"),
            F.lit(naming.dir_delim),
            F.col("encoded_partition"),
            F.lit(naming.dir_delim),
            _file_name(ext, naming),
        ),
    )


def assign_files_flush_size(
    records: DataFrame,
    flush_size: int,
    ext: str = "parquet",
    naming: FileNaming = DEFAULT_NAMING,
) -> DataFrame:
    """flush.size rotation: within each (kafka_partition, encoded_partition),
    records ordered by offset are chunked into files of `flush_size`.

    Adds: file_seq (index of file within group), file_start_offset, file_path.
    """
    w = Window.partitionBy("kafka_partition", "encoded_partition").orderBy("offset")
    seq = F.row_number().over(w) - F.lit(1)
    out = records.withColumn("file_seq", F.floor(seq / F.lit(flush_size)).cast("bigint"))
    wf = Window.partitionBy("kafka_partition", "encoded_partition", "file_seq")
    out = out.withColumn("file_start_offset", F.min("offset").over(wf))
    return _with_file_path(out, ext, naming)


def assign_files_scheduled(
    records: DataFrame,
    interval_ms: int,
    ts_col: str = "timestamp",
    ext: str = "parquet",
    naming: FileNaming = DEFAULT_NAMING,
) -> DataFrame:
    """rotate.schedule.interval.ms (deterministic form): records are bucketed
    into fixed intervals of the record timestamp; each bucket is one file."""
    bucket = F.floor(F.unix_millis(F.col(ts_col)) / F.lit(interval_ms))
    out = records.withColumn("file_seq", bucket.cast("bigint"))
    wf = Window.partitionBy("kafka_partition", "encoded_partition", "file_seq")
    out = out.withColumn("file_start_offset", F.min("offset").over(wf))
    return _with_file_path(out, ext, naming)


def assign_files_rotate_interval(
    records: DataFrame,
    rotate_interval_ms: int,
    ts_col: str = "timestamp",
    ext: str = "parquet",
    naming: FileNaming = DEFAULT_NAMING,
) -> DataFrame:
    """rotate.interval.ms exact semantics (TopicPartitionWriter.rotateOnTime):
    a new file starts when recordTimestamp - baseRecordTimestamp >= interval,
    where base resets to the first timestamp of each new file.

    Inherently sequential per group (the boundary depends on the previous
    boundary), so plain window functions can't express it; we run a vectorized
    per-group pass with applyInPandas. Not plain-SQL expressible -> rows-only
    oracle check.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    schema_out = StructType(
        list(records.schema.fields)
        + [StructField("file_seq", LongType()), StructField("file_start_offset", LongType())]
    )

    def chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("offset").reset_index(drop=True)
        ts_ms = pdf[ts_col].astype("int64") // 1_000_000  # ns -> ms
        seqs = []
        starts = []
        base_ts = None
        seq = -1
        start = None
        for off, t in zip(pdf["offset"].tolist(), ts_ms.tolist()):
            if base_ts is None or t - base_ts >= rotate_interval_ms:
                seq += 1
                base_ts = t
                start = off
            seqs.append(seq)
            starts.append(start)
        pdf["file_seq"] = pd.Series(seqs, dtype="int64")
        pdf["file_start_offset"] = pd.Series(starts, dtype="int64")
        return pdf

    out = records.groupBy("kafka_partition", "encoded_partition").applyInPandas(
        chunk, schema=schema_out
    )
    return _with_file_path(out, ext, naming)


def assign_files_partition_change(
    records: DataFrame, ext: str = "parquet", naming: FileNaming = DEFAULT_NAMING
) -> DataFrame:
    """rotate.file.on.partition.change: a file holds a maximal run of
    CONSECUTIVE offsets sharing one encoded partition; when the stream
    returns to an earlier encoded partition a NEW file starts, because a
    file's offsets must be contiguous for exactly-once replay (reference
    TopicPartitionWriter.java:630-657, shouldRotateOnPartitionChange).

    One window key (kafka_partition, ordered by offset) serves both the
    change detection (lag) and the run id (running sum) — a single shuffle.
    """
    wk = Window.partitionBy("kafka_partition").orderBy("offset")
    prev = F.lag("encoded_partition").over(wk)
    flag = F.when(prev.isNull() | (F.col("encoded_partition") != prev), 1).otherwise(0)
    run = F.sum(flag).over(wk.rowsBetween(Window.unboundedPreceding, 0)) - F.lit(1)
    out = records.withColumn("file_seq", run.cast("bigint"))
    wf = Window.partitionBy("kafka_partition", "file_seq")
    out = out.withColumn("file_start_offset", F.min("offset").over(wf))
    return _with_file_path(out, ext, naming)


def rotation_stats(assigned: DataFrame) -> DataFrame:
    """FileRotationTracker analog (util/FileRotationTracker.java): per
    encoded partition, how many files were opened and why they closed —
    capacity (hit flush.size / interval) vs tail (last open file)."""
    keys = ["kafka_partition", "encoded_partition"]
    per_file = assigned.groupBy(*keys, "file_seq").agg(
        F.count(F.lit(1)).alias("records_in_file")
    )
    max_seq = per_file.groupBy(*keys).agg(F.max("file_seq").alias("last_seq"))
    return (
        per_file.join(max_seq, keys)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.when(F.col("file_seq") < F.col("last_seq"), 1).otherwise(0)).alias(
                "rotations_by_capacity"
            ),
            F.min("records_in_file").alias("min_file_records"),
            F.max("records_in_file").alias("max_file_records"),
        )
    )


def file_manifest(assigned: DataFrame) -> DataFrame:
    """Collapse a file assignment into the commit manifest: one row per output
    file with record count and offset range. Replaying the same input yields
    the identical manifest — the exactly-once invariant the connector gets
    from start-offset file naming (S3FileUtils.fileKeyToCommit)."""
    return assigned.groupBy("file_path").agg(
        F.count(F.lit(1)).alias("record_count"),
        F.min("offset").alias("min_offset"),
        F.max("offset").alias("max_offset"),
    )


def assign_files_run_change(
    records: DataFrame,
    run_cols: list[str],
    ext: str = "parquet",
    naming: FileNaming = DEFAULT_NAMING,
) -> DataFrame:
    """Generalized run-boundary rotation: a file holds a maximal run of
    consecutive offsets over which ALL run_cols stay constant. With
    run_cols=[encoded_partition] this is partition-change rotation; adding
    schema_version mirrors the reference's rotate-on-schema-change
    (TopicPartitionWriter.java:473 shouldChangeSchema — a file never mixes
    record schemas, so a version flip closes the file exactly like an
    encoded-partition change). Same single-shuffle lag + running-sum shape
    as assign_files_partition_change."""
    wk = Window.partitionBy("kafka_partition").orderBy("offset")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in run_cols])
    prev = F.lag(key).over(wk)
    flag = F.when(prev.isNull() | (key != prev), 1).otherwise(0)
    run = F.sum(flag).over(wk.rowsBetween(Window.unboundedPreceding, 0)) - F.lit(1)
    out = records.withColumn("file_seq", run.cast("bigint"))
    wf = Window.partitionBy("kafka_partition", "file_seq")
    out = out.withColumn("file_start_offset", F.min("offset").over(wf))
    return _with_file_path(out, ext, naming)


def assign_files_schema_compat(
    records: DataFrame,
    mode: str = "NONE",
    version_col: str = "schema_version",
    ext: str = "parquet",
    naming: FileNaming = DEFAULT_NAMING,
) -> DataFrame:
    """schema.compatibility-aware rotation (TopicPartitionWriter.java:471-487
    + storage-common StorageSchemaCompatibility semantics): the writer keeps
    ONE current schema per encoded partition; an arriving record either
    rotates the file and becomes the new current, or is PROJECTED onto the
    current schema and appended.

    - NONE:     any version change is incompatible -> rotate both directions
                (files = maximal runs of constant version).
    - BACKWARD: only a NEWER version rotates (current can read older data);
                older-versioned records project UP to current = the running
                MAX version seen so far in the group.
    - FORWARD:  only an OLDER version rotates (older current can read newer
                data); newer records project DOWN to current = the running
                MIN version.
    - FULL:     compatible both ways; the rotation trigger matches BACKWARD
                (adopt newer, project everything else).

    Adds `projected_version` (the schema every record in the file carries
    after projection — the reference's compatibility.project step,
    TopicPartitionWriter.java:505) next to the usual file columns. One
    window per (kafka_partition, encoded_partition) ordered by offset — a
    single shuffle, same scale shape as the other policies."""
    if mode not in ("NONE", "BACKWARD", "FORWARD", "FULL"):
        raise ValueError(f"schema.compatibility {mode!r} invalid")
    wk = Window.partitionBy("kafka_partition", "encoded_partition").orderBy("offset")
    running = wk.rowsBetween(Window.unboundedPreceding, 0)
    v = F.col(version_col)
    if mode == "NONE":
        effective = v
    elif mode == "FORWARD":
        effective = F.min(v).over(running)
    else:  # BACKWARD | FULL
        effective = F.max(v).over(running)
    out = records.withColumn("projected_version", effective.cast("int"))
    # gaps-and-islands on the projected version: each maximal run of one
    # current schema is one file (for BACKWARD/FORWARD the running extreme
    # is monotone, so runs == distinct values; NONE genuinely needs runs)
    prev = F.lag("projected_version").over(wk)
    flag = F.when(prev.isNull() | (F.col("projected_version") != prev), 1).otherwise(0)
    run = F.sum(flag).over(running) - F.lit(1)
    out = out.withColumn("file_seq", run.cast("bigint"))
    wf = Window.partitionBy("kafka_partition", "encoded_partition", "file_seq")
    out = out.withColumn("file_start_offset", F.min("offset").over(wf))
    return _with_file_path(out, ext, naming)


def assign_files_max_open(
    records: DataFrame,
    max_open_files: int,
    ext: str = "parquet",
    naming: FileNaming = DEFAULT_NAMING,
    flush_size: int | None = None,
) -> DataFrame:
    """partitioner.max.open.files rotation (TopicPartitionWriter.java:530-541
    rotateOnPartitionerMaxOpenFiles): a record for a NOT-currently-open
    encoded partition arriving while exactly `max_open_files` files are open
    triggers rotation, which commits EVERY open file of the topic-partition
    (the writer's rotation commits all open files, then the new partition's
    file opens into a fresh commit epoch).

    With `flush_size` set, size rotation COMPOSES (reference: rotateOnSize,
    TopicPartitionWriter.java:513-525/813-821, is checked on every write
    regardless of the max-open-files policy): `recordCount` — the writer's
    TOTAL records since its last commit, across all its open encoded
    partitions — reaching flush.size also rotates, and either trigger
    commits EVERY open file (commitFiles resets recordCount and the open
    set), i.e. starts a new epoch here (ADVICE r6 #3).

    Like rotate.interval.ms this walk is inherently sequential per
    kafka_partition (the open set depends on every prior record), so it runs
    as a vectorized per-group pass; groups are per kafka partition —
    thousands of modest groups at scale, never one giant one. Adds `epoch`
    (commit generation) next to the usual file columns; files are
    (epoch, encoded_partition) groups named by their start offset."""
    from pyspark.sql.types import LongType, StructField, StructType

    if max_open_files < 1:
        raise ValueError("partitioner.max.open.files must be >= 1 (or unset)")

    schema_out = StructType(
        list(records.schema.fields) + [StructField("epoch", LongType())]
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("offset").reset_index(drop=True)
        open_set: set = set()
        epoch = 0
        count = 0
        epochs = []
        for ep in pdf["encoded_partition"].tolist():
            if ep not in open_set:
                if len(open_set) == max_open_files:
                    epoch += 1
                    open_set = set()
                    count = 0
                open_set.add(ep)
            epochs.append(epoch)
            count += 1
            # post-write size check (the record that reaches flush.size
            # stays in the epoch it was written into; the commit follows)
            if flush_size is not None and count >= flush_size:
                epoch += 1
                open_set = set()
                count = 0
        pdf["epoch"] = pd.Series(epochs, dtype="int64")
        return pdf

    out = records.groupBy("kafka_partition").applyInPandas(walk, schema=schema_out)
    wf = Window.partitionBy("kafka_partition", "epoch", "encoded_partition")
    out = out.withColumn("file_start_offset", F.min("offset").over(wf))
    return _with_file_path(out, ext, naming)


def assign_files_interval_partition_change(
    records: DataFrame,
    rotate_interval_ms: int,
    ts_col: str = "timestamp",
    ext: str = "parquet",
    naming: FileNaming = DEFAULT_NAMING,
    tombstone_partition: str | None = None,
) -> DataFrame:
    """rotate.interval.ms with rotate.file.on.partition.change=true — the
    reference DEFAULT whenever a time-based rotation interval is set. In
    TopicPartitionWriter.rotateOnTime (TopicPartitionWriter.java:659-702)
    periodicRotation fires when rotateIntervalMs > 0 AND (recordTimestamp -
    baseRecordTimestamp >= interval OR the encoded partition differs from
    currentEncodedPartition, :630-657). Either trigger commits EVERY open
    file of the topic partition and resets baseRecordTimestamp, so under
    this mode files are maximal runs of one encoded partition, additionally
    broken at interval boundaries — exactly the file set
    TopicPartitionWriterTest's out-of-order-hours case pins (offsets
    0,1,2,3,4 each a fresh file when partitions alternate).

    tombstone_partition mirrors shouldRotateOnPartitionChangeWithTombstone-
    Check (:644-657): when tombstone writing is enabled, transitions to/from
    the tombstone partition do NOT rotate (containment match, because
    wrapper partitioners may prefix the tombstone partition).

    Sequential per kafka partition (current pointer + base timestamp carry
    across every record), so it runs as one vectorized per-group pass —
    thousands of modest groups at 100 TB, never one giant task.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    schema_out = StructType(
        list(records.schema.fields)
        + [StructField("file_seq", LongType()), StructField("file_start_offset", LongType())]
    )
    tomb = tombstone_partition

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("offset").reset_index(drop=True)
        ts_ms = pdf[ts_col].astype("int64") // 1_000_000  # ns -> ms
        seqs: list[int] = []
        cur_ep = None
        base_ts = None
        seq = -1
        for t, ep in zip(ts_ms.tolist(), pdf["encoded_partition"].tolist()):
            ep_change = cur_ep is not None and ep != cur_ep
            if ep_change and tomb is not None and (tomb in ep or tomb in cur_ep):
                ep_change = False  # tombstone transition: suppressed
            if base_ts is None or ep_change or t - base_ts >= rotate_interval_ms:
                seq += 1
                base_ts = t
            cur_ep = ep
            seqs.append(seq)
        pdf["file_seq"] = pd.Series(seqs, dtype="int64")
        return pdf

    schema_out = StructType(
        [f for f in schema_out.fields if f.name != "file_start_offset"]
    )
    out = records.groupBy("kafka_partition").applyInPandas(walk, schema=schema_out)
    # a commit epoch (file_seq) can hold several encoded partitions when
    # tombstone transitions are suppressed — each partition's file is named
    # by the first offset written INTO it (reference startOffsets map,
    # TopicPartitionWriter.java:889-899), not the epoch's first offset
    wf = Window.partitionBy("kafka_partition", "file_seq", "encoded_partition")
    out = out.withColumn("file_start_offset", F.min("offset").over(wf))
    return _with_file_path(out, ext, naming)
