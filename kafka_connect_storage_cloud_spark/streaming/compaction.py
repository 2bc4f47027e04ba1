"""Streaming compacted-store maintenance: the live materialized view of a
compacted topic (latest record per key, tombstone deletes) kept current
across micro-batches.

Batch side proves merge == recompact (plans/temporal.py cdc_merge_apply);
this sink exploits it live: each micro-batch's per-key struct-max merges
into the persisted snapshot with another struct-max — associative and
idempotent, so replayed batches converge instead of corrupting (the same
argument as deterministic file keys). Store size is |live keys|, never
stream length; this is the Kafka Streams KTable / CDC MERGE target
re-expressed as a foreachBatch sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def compact_batch(records: DataFrame) -> DataFrame:
    """Latest record per key via struct-max on (offset, value); map-side
    combinable, carries one row per key."""
    return (
        records.groupBy("key")
        .agg(F.max(F.struct(F.col("offset"), F.col("value"))).alias("last"))
        .select(
            "key",
            F.col("last.offset").alias("last_offset"),
            F.col("last.value").alias("last_value"),
        )
    )


def compacted_store_stream(
    stream_records: DataFrame, store_path: str, checkpoint: str
) -> StreamingQuery:
    """Maintain the compacted snapshot across micro-batches. Tombstones
    (null value) stay IN the store as deletion markers so a late-arriving
    older record can't resurrect the key; readers filter
    `last_value IS NOT NULL` (exactly how compacted-topic consumers treat
    tombstones before retention kicks in)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = compact_batch(batch_df)
        if os.path.exists(store_path):
            old = spark.read.parquet(store_path)
            # distributed merge: union of two compacted sets re-compacted —
            # struct-max is associative, so this equals recompacting the
            # whole history (the cdc_merge_apply invariant, applied live)
            part = compact_batch(
                old.union(part).select(
                    F.col("key"),
                    F.col("last_offset").alias("offset"),
                    F.col("last_value").alias("value"),
                )
            )
        # materialize before overwriting the path we just read
        # (localCheckpoint truncates lineage to the computed blocks)
        part = part.localCheckpoint(eager=True)
        part.write.mode("overwrite").parquet(store_path)

    return (
        stream_records.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
