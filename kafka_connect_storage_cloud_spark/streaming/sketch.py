"""Streaming sketch maintenance: HLL registers merged across micro-batches.

The batch side (llm/sketches.py) proves registers are mergeable
(hll_merge_invariant); this sink exploits it: each micro-batch contributes
its partial registers, and the persistent register store is the MAX-merge
of everything seen — byte-identical to the registers a one-pass batch
build produces over the same records. This is how a 100 TB pipeline keeps
a live distinct-count dashboard without ever re-scanning the corpus: the
stored state is (groups × m) rows regardless of stream length.

The store is tiny by construction (m=64 registers per group), so the
merge collects to the driver and rewrites — deliberately, the same way a
metrics store would keep sketch state in a KV table rather than a data
lake scan. The data-plane work (hashing + per-batch max) stays
distributed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..llm.sketches import HLL_M


def hll_partial_registers(ev: DataFrame) -> DataFrame:
    """Per-(event_type, bucket) max-rho registers for one slice of events.
    Pure projection + one map-side-combined groupBy."""
    from ..functions import hashing as H

    h = H.h60(F.concat(F.lit("hll:"), F.col("user_id").cast("string")))
    rho_df = ev.select(
        "event_type",
        (h % HLL_M).alias("bucket"),
        h.alias("h"),
    ).select(
        "event_type",
        "bucket",
        F.expr(f"h div {HLL_M}").alias("rem"),
    ).withColumn(
        "rho",
        F.when(F.col("rem") == 0, F.lit(55)).otherwise(
            F.lit(55) - F.length(F.bin(F.col("rem")))
        ),
    )
    return rho_df.groupBy("event_type", "bucket").agg(F.max("rho").alias("reg"))


def hll_register_store_stream(
    stream_events: DataFrame,
    store_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """Maintain the HLL register store across micro-batches via foreachBatch
    MAX-merge. Restart-safe: merging a replayed batch is a no-op (max is
    idempotent), the sketch analog of the connector's deterministic file
    keys."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = hll_partial_registers(batch_df)
        rows = {(r["event_type"], r["bucket"]): r["reg"] for r in part.collect()}
        if os.path.exists(store_path):
            for r in spark.read.parquet(store_path).collect():
                k = (r["event_type"], r["bucket"])
                rows[k] = max(rows.get(k, 0), r["reg"])
        merged = spark.createDataFrame(
            [(t, b, int(reg)) for (t, b), reg in sorted(rows.items())],
            "event_type string, bucket bigint, reg int",
        )
        merged.coalesce(1).write.mode("overwrite").parquet(store_path)

    return (
        stream_events.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def cms_partial_cells(docs: DataFrame) -> DataFrame:
    """One slice's count-min cell increments over the documents' token
    stream (same d x w cell addressing as llm/sketches.cms_heavy_hitters)."""
    from ..llm.sketches import CMS_ROWS, CMS_WIDTH
    from ..functions import hashing as H

    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (H.h32(F.concat(F.lit(f"cms{i}:"), F.col("token"))) % CMS_WIDTH).alias(
                    "bucket"
                ),
            )
            for i in range(CMS_ROWS)
        ]
    )
    return (
        toks.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )


def cms_cell_store_stream(
    stream_docs: DataFrame, store_path: str, checkpoint: str
) -> StreamingQuery:
    """Maintain a live count-min sketch over a document stream. Unlike the
    HLL store's MAX (idempotent), CMS cells ADD — so each micro-batch's
    partial lands under its batch_id partition (dynamic overwrite): a
    replayed batch overwrites its own rows instead of double-counting,
    keeping the store exactly-once. Query-side state is the partial-cell
    table: batches x d x w rows, compacted on read by one tiny groupBy."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            cms_partial_cells(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(store_path)
        )

    return (
        stream_docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def cms_store_totals(spark: SparkSession, store_path: str) -> DataFrame:
    """Compact the partial-cell store to the live sketch (d x w rows)."""
    return (
        spark.read.parquet(store_path)
        .groupBy("row", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
