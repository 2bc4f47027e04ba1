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
    sessionize_stream,
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


def test_session_window_matches_batch_sessions(spark, sf_small, batch_events, tmp_path):
    """Every session the stream closes must be one of the batch lag-based
    sessions: same user, same start, same event count (session_window and
    the 30-min-gap window formulation define identical groupings)."""
    ckpt = str(tmp_path / "ckpt_sess")
    q = (
        sessionize_stream(stream_events_source(spark, sf_small))
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("sess_test").collect()
    assert got, "no sessions emitted"
    from kafka_connect_storage_cloud_spark.plans.events import events_sessionize

    exp = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in events_sessionize(spark, sf_small).collect()
    }
    for r in got:
        key = (r["user_id"], r["session_start"])
        assert exp.get(key) == r["n_events"], f"session {key} mismatch"


def test_stateful_rotation_matches_batch(spark, sf_small, tmp_path):
    """rotate.interval.ms across micro-batches: the stateful streaming
    assignment must reproduce the batch manifest exactly, including files
    whose records span micro-batch boundaries (state carries the base ts)."""
    import os

    from kafka_connect_storage_cloud_spark.operators.rotation import (
        assign_files_rotate_interval,
        file_manifest,
    )
    from kafka_connect_storage_cloud_spark.sources.topic import events_as_topic
    from kafka_connect_storage_cloud_spark.streaming.stateful import rotate_interval_stateful

    interval_ms = 3600 * 1000
    records = events_as_topic(spark, sf_small).withColumn(
        "encoded_partition", F.concat(F.lit("event_type="), F.col("event_type"))
    )
    cols = ["topic", "kafka_partition", "offset", "timestamp", "encoded_partition"]
    expected = {
        r["file_path"]: (r["record_count"], r["min_offset"], r["max_offset"])
        for r in file_manifest(
            assign_files_rotate_interval(records.select(*cols), interval_ms)
        ).collect()
    }

    # stage three offset-ordered chunks with increasing mtimes so
    # maxFilesPerTrigger=1 yields three ordered micro-batches
    src = tmp_path / "chunks"
    src.mkdir()
    pdf = records.select(*cols).orderBy("offset").toPandas()
    pdf["timestamp"] = pdf["timestamp"].astype("datetime64[us]")
    n = len(pdf)
    cuts = (pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :])
    for i, chunk in enumerate(cuts):
        p = str(src / f"chunk{i}.parquet")
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    stream = (
        spark.readStream.schema(records.select(*cols).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        rotate_interval_stateful(stream, interval_ms)
        .writeStream.format("memory")
        .queryName("rot_stateful")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_rot"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["file_path"]: (r["record_count"], r["min_offset"], r["max_offset"])
        for r in spark.table("rot_stateful")
        .groupBy("file_path")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
        )
        .collect()
    }
    assert got == expected


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


def test_stream_dedup_drops_redelivered_records(spark, sf_small, batch_events, tmp_path):
    """dropDuplicatesWithinWatermark: a re-delivered record (same event_id)
    commits no second copy — the stream-side exactly-once guarantee."""
    from kafka_connect_storage_cloud_spark.streaming.pipeline import dedup_stream

    src_dir = str(tmp_path / "dup_src")
    events = batch_events.limit(200)
    # two files, overlapping halves -> redelivery across micro-batches
    events.write.mode("overwrite").parquet(src_dir)
    events.limit(120).write.mode("append").parquet(src_dir)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = str(tmp_path / "dedup_out")
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == got.select("event_id").distinct().count() == 200


def test_stream_stream_attribution_matches_batch(spark, sf_small, batch_events, tmp_path):
    """Time-bounded stream-stream join produces exactly the batch join's
    result set once all data is processed."""
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        attribution_stream,
        stream_events_source,
    )

    out = str(tmp_path / "attr_out")
    q = (
        attribution_stream(stream_events_source(spark, sf_small))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    expected = attribution_stream(batch_events)
    assert got.count() == expected.count() > 0
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_run_connector_stream_matches_batch(spark, sf_small, tmp_path):
    """The same property file produces the identical dataset via the batch
    runner and the streaming runner (layout and content)."""
    from kafka_connect_storage_cloud_spark.connector import run_connector
    from kafka_connect_storage_cloud_spark.streaming.pipeline import run_connector_stream

    props = {
        "topics": "events",
        "format.class": "parquet",
        "partitioner.class": "io.confluent.connect.storage.partitioner.FieldPartitioner",
        "partition.field.name": "event_type",
        "flush.size": "100",
        "behavior.on.null.values": "ignore",
    }
    batch_out = str(tmp_path / "batch")
    run_connector(spark, props, sf_dir=sf_small, output_path=batch_out)
    stream_out = str(tmp_path / "stream")
    q = run_connector_stream(
        spark, props, sf_small, stream_out, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    b = spark.read.parquet(batch_out).select("offset", "value", "encoded_partition")
    s = spark.read.parquet(stream_out).select("offset", "value", "encoded_partition")
    assert b.exceptAll(s).count() == 0 and s.exceptAll(b).count() == 0


def test_run_connector_stream_applies_smt(spark, sf_small, tmp_path):
    """transforms= behaves identically in the streaming and batch runners:
    the TimestampRouter-routed topics and masked keys land the same."""
    from kafka_connect_storage_cloud_spark.connector import run_connector
    from kafka_connect_storage_cloud_spark.streaming.pipeline import run_connector_stream

    props = {
        "topics": "events",
        "format.class": "parquet",
        "partitioner.class": "io.confluent.connect.storage.partitioner.DefaultPartitioner",
        "flush.size": "100",
        "behavior.on.null.values": "ignore",
        "transforms": "mask,route",
        "transforms.mask.type": "org.apache.kafka.connect.transforms.MaskField$Key",
        "transforms.route.type": "org.apache.kafka.connect.transforms.TimestampRouter",
        "transforms.route.topic.format": "${topic}-${timestamp}",
        "transforms.route.timestamp.format": "yyyyMMdd",
    }
    batch_out = str(tmp_path / "batch")
    manifest = run_connector(spark, props, sf_dir=sf_small, output_path=batch_out)
    assert all(
        r["file_path"].startswith("events-20") for r in manifest.collect()
    )
    stream_out = str(tmp_path / "stream")
    q = run_connector_stream(spark, props, sf_small, stream_out, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    b = spark.read.parquet(batch_out).select("offset", "key", "encoded_partition")
    s = spark.read.parquet(stream_out).select("offset", "key", "encoded_partition")
    assert b.exceptAll(s).count() == 0 and s.exceptAll(b).count() == 0
    assert set(r["key"] for r in s.select("key").distinct().collect()) == {"****"}


def test_rotate_interval_transform_with_state_matches_batch(spark, sf_small, tmp_path):
    """Same rotate.interval manifest through Spark 4's
    transformWithStateInPandas (RocksDB state store) as the batch operator —
    the new arbitrary-stateful API carrying the open-file state across
    micro-batches. Gated: the TWS state server speaks protobuf, absent in
    this container (no installs) — the applyInPandasWithState twin above
    covers the semantics here."""
    pytest.importorskip("google.protobuf")
    import os

    from kafka_connect_storage_cloud_spark.operators.rotation import (
        assign_files_rotate_interval,
        file_manifest,
    )
    from kafka_connect_storage_cloud_spark.sources.topic import events_as_topic
    from kafka_connect_storage_cloud_spark.streaming.stateful import rotate_interval_tws

    interval_ms = 3600 * 1000
    records = events_as_topic(spark, sf_small).withColumn(
        "encoded_partition", F.concat(F.lit("event_type="), F.col("event_type"))
    )
    cols = ["topic", "kafka_partition", "offset", "timestamp", "encoded_partition"]
    expected = {
        r["file_path"]: (r["record_count"], r["min_offset"], r["max_offset"])
        for r in file_manifest(
            assign_files_rotate_interval(records.select(*cols), interval_ms)
        ).collect()
    }

    src = tmp_path / "tws_chunks"
    src.mkdir()
    pdf = records.select(*cols).orderBy("offset").toPandas()
    pdf["timestamp"] = pdf["timestamp"].astype("datetime64[us]")
    n = len(pdf)
    cuts = (pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :])
    for i, chunk in enumerate(cuts):
        p = str(src / f"chunk{i}.parquet")
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(records.select(*cols).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            rotate_interval_tws(stream, interval_ms)
            .writeStream.format("memory")
            .queryName("rot_tws")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)
    got = {
        r["file_path"]: (r["record_count"], r["min_offset"], r["max_offset"])
        for r in spark.table("rot_tws")
        .groupBy("file_path")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
        )
        .collect()
    }
    assert got == expected


def test_hll_register_store_matches_batch(spark, sf_small, tmp_path):
    """Streaming HLL maintenance: registers MAX-merged across three
    micro-batches equal the one-pass batch registers exactly (mergeability
    exploited live — the sketch analog of rollup_incremental_merge)."""
    import os

    from kafka_connect_storage_cloud_spark.session import read_events
    from kafka_connect_storage_cloud_spark.streaming.sketch import (
        hll_partial_registers,
        hll_register_store_stream,
    )

    ev = read_events(spark, sf_small).select("event_id", "user_id", "event_type")
    expected = {
        (r["event_type"], r["bucket"]): r["reg"]
        for r in hll_partial_registers(ev).collect()
    }

    src = tmp_path / "sketch_chunks"
    src.mkdir()
    pdf = ev.orderBy("event_id").toPandas()
    n = len(pdf)
    cuts = (pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :])
    for i, chunk in enumerate(cuts):
        p = str(src / f"chunk{i}.parquet")
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path / "hll_store")
    q = hll_register_store_stream(stream, store, str(tmp_path / "ckpt_hll"))
    q.awaitTermination(180)
    got = {
        (r["event_type"], r["bucket"]): r["reg"]
        for r in spark.read.parquet(store).collect()
    }
    assert got == expected


def test_stream_static_enrichment_matches_batch(spark, sf_small, batch_events, tmp_path):
    """Stream-static broadcast join: per-record dimension enrichment in
    micro-batches equals the batch join exactly (no dropped/duplicated
    rows, same attribute values)."""
    from kafka_connect_storage_cloud_spark.session import read_table
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        enrich_stream,
        stream_events_source,
    )

    dim = read_table(spark, sf_small, "customer")
    expected = {
        (r["event_id"], r["c_mktsegment"], r["c_nationkey"])
        for r in enrich_stream(batch_events, dim).collect()
    }
    q = (
        enrich_stream(stream_events_source(spark, sf_small), dim)
        .writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["c_mktsegment"], r["c_nationkey"])
        for r in spark.table("enrich_test").collect()
    }
    assert got == expected


def test_manifest_stream_source_tails_new_and_grown_files(spark, sf_small, tmp_path):
    """Streaming connector_manifest source: first trigger emits the whole
    manifest; after more data lands, a restarted stream on the same
    checkpoint emits ONLY new-or-grown files (landed_files_diff live)."""
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.connector import run_connector
    from kafka_connect_storage_cloud_spark.sources.manifest_source import register
    from kafka_connect_storage_cloud_spark.sources.topic import events_as_topic

    register(spark)
    out = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt_tail")
    props = {
        "topics": "events",
        "format.class": "parquet",
        "partitioner.class": "io.confluent.connect.storage.partitioner.FieldPartitioner",
        "partition.field.name": "event_type",
        "flush.size": "500",
        "behavior.on.null.values": "ignore",
    }
    rec = events_as_topic(spark, sf_small)
    cutoff = rec.agg(F.expr("percentile(offset, 0.5)")).collect()[0][0]
    m1 = {
        r["file_path"]: r["max_offset"]
        for r in run_connector(
            spark, props, records=rec.where(F.col("offset") <= cutoff), output_path=out
        ).collect()
    }

    sink_dir = str(tmp_path / "tailed")

    def drain():
        # file sink (memory sink cannot recover from a checkpoint); each
        # drain appends this trigger's emissions, so reading the dir gives
        # the cumulative multiset
        q = (
            spark.readStream.format("connector_manifest")
            .load(out)
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r["file_path"], r["max_offset"])
            for r in spark.read.parquet(sink_dir).collect()
        )

    got1 = drain()
    assert dict(got1) == m1 and len(got1) == len(m1)

    m2 = {
        r["file_path"]: r["max_offset"]
        for r in run_connector(spark, props, records=rec, output_path=out).collect()
    }
    cumulative = drain()  # same checkpoint: only the diff is appended
    expected_diff = {p: off for p, off in m2.items() if p not in m1 or off > m1[p]}
    assert expected_diff, "growth scenario produced no diff — test is vacuous"
    expected_multiset = sorted(list(m1.items()) + list(expected_diff.items()))
    assert cumulative == expected_multiset


def test_cms_cell_store_matches_batch(spark, sf_small, tmp_path):
    """Streaming CMS maintenance: per-batch partial cells (idempotent via
    batch_id partitions) summed over the store equal the one-pass batch
    sketch exactly."""
    import os

    from kafka_connect_storage_cloud_spark.session import read_table
    from kafka_connect_storage_cloud_spark.streaming.sketch import (
        cms_cell_store_stream,
        cms_partial_cells,
        cms_store_totals,
    )

    docs = read_table(spark, sf_small, "documents").select("doc_id", "text")
    expected = {
        (r["row"], r["bucket"]): r["cell_count"]
        for r in cms_partial_cells(docs).collect()
    }

    src = tmp_path / "cms_chunks"
    src.mkdir()
    pdf = docs.orderBy("doc_id").toPandas()
    n = len(pdf)
    cuts = (pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :])
    for i, chunk in enumerate(cuts):
        p = str(src / f"chunk{i}.parquet")
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path / "cms_store")
    q = cms_cell_store_stream(stream, store, str(tmp_path / "ckpt_cms"))
    q.awaitTermination(180)
    got = {
        (r["row"], r["bucket"]): r["cell_count"]
        for r in cms_store_totals(spark, store).collect()
    }
    assert got == expected


def test_stream_stream_left_outer_attribution(spark, sf_small, batch_events, tmp_path):
    """Left-outer watermarked stream-stream join: matched rows equal the
    inner join exactly; abandoned clicks (no purchase within horizon) emit
    once the watermark passes — every sufficiently-old batch-unmatched
    click must appear, and nothing outside the batch left join may."""
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        attribution_stream,
        attribution_stream_outer,
        stream_events_source,
    )

    out = str(tmp_path / "attr_outer")

    def drain():
        q = (
            attribution_stream_outer(stream_events_source(spark, sf_small))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    # a second run on the same checkpoint executes a no-new-data batch,
    # which advances the watermark past the last horizon and flushes the
    # expired unmatched state (outer-join rows only emit once the
    # watermark PROVES no match can arrive)
    drain()
    got = spark.read.parquet(out)

    matched_got = got.where(F.col("purchase_ts").isNotNull())
    matched_want = attribution_stream(batch_events)
    assert matched_got.count() == matched_want.count() > 0
    assert matched_got.exceptAll(matched_want).count() == 0

    # batch truth for abandonment
    want_all = attribution_stream_outer(batch_events)
    unmatched_want = {
        (r["user_id"], r["click_ts"])
        for r in want_all.where(F.col("purchase_ts").isNull()).collect()
    }
    unmatched_got = {
        (r["user_id"], r["click_ts"])
        for r in got.where(F.col("purchase_ts").isNull()).collect()
    }
    assert unmatched_got <= unmatched_want
    # the global watermark is min over BOTH sides' (max event time - delay),
    # and left-state eviction needs watermark > click_ts + horizon; stay a
    # full extra horizon conservative on top of that
    import datetime as dt

    per_type_max = {
        r["event_type"]: r["m"]
        for r in batch_events.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .collect()
    }
    cutoff = min(per_type_max.values()) - dt.timedelta(hours=6)
    must_emit = {p for p in unmatched_want if p[1] < cutoff}
    assert must_emit <= unmatched_got
    assert must_emit, "no provably-expired unmatched clicks — test is vacuous"


def test_compacted_store_stream_matches_batch(spark, sf_small, tmp_path):
    """Streaming compacted-store maintenance: after three micro-batches the
    persisted snapshot equals one-pass batch compaction of the full stream
    (merge == recompact, applied live; tombstones retained as markers)."""
    import os

    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.sources.topic import events_as_topic
    from kafka_connect_storage_cloud_spark.streaming.compaction import (
        compact_batch,
        compacted_store_stream,
    )

    rec = events_as_topic(spark, sf_small).select("key", "offset", "value")
    # synthesize tombstones the same way tombstone_routing does
    rec = rec.withColumn(
        "value",
        F.when(F.col("offset") % 50 == 0, F.lit(None).cast("string")).otherwise(
            F.col("value")
        ),
    )
    expected = {
        r["key"]: (r["last_offset"], r["last_value"])
        for r in compact_batch(rec).collect()
    }

    src = tmp_path / "cmp_chunks"
    src.mkdir()
    pdf = rec.orderBy("offset").toPandas()
    n = len(pdf)
    cuts = (pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :])
    for i, chunk in enumerate(cuts):
        p = str(src / f"chunk{i}.parquet")
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    stream = (
        spark.readStream.schema(rec.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path / "compacted_store")
    q = compacted_store_stream(stream, store, str(tmp_path / "ckpt_cmp"))
    q.awaitTermination(180)
    got = {
        r["key"]: (r["last_offset"], r["last_value"])
        for r in spark.read.parquet(store).collect()
    }
    assert got == expected
    # tombstones flowed through the pipeline (whether any key's LATEST
    # record is a tombstone is data-dependent; equality above already
    # proves the marker semantics match batch compaction)
    assert rec.where(F.col("value").isNull()).count() > 0


def test_run_connector_stream_scheduled_trigger_path(spark, sf_small, tmp_path):
    """True wall-clock rotate.schedule.interval.ms analog: the processing-
    time trigger commits every open file at each interval (reference
    TopicPartitionWriter.rotateOnScheduleTime); batch files carry the
    batch-keyed names and a restart from the same checkpoint re-lands
    nothing (committed-batch markers make replays no-ops)."""
    import glob
    import os
    import shutil
    import time

    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        run_connector_stream_scheduled,
    )

    # private sf_dir copy -> private staging dir, so this stream cannot
    # contaminate the shared stream_events_source staging of other tests
    sf_copy = tmp_path / "sfcopy"
    sf_copy.mkdir()
    shutil.copy(os.path.join(sf_small, "events.parquet"), sf_copy / "events.parquet")
    props = {
        "topics": "events",
        "format.class": "parquet",
        "partitioner.class": "io.confluent.connect.storage.partitioner.FieldPartitioner",
        "partition.field.name": "event_type",
        "rotate.schedule.interval.ms": "700",
        "behavior.on.null.values": "ignore",
    }
    out = str(tmp_path / "sched")
    ckpt = str(tmp_path / "ckpt_sched")
    q = run_connector_stream_scheduled(spark, props, str(sf_copy), out, ckpt)
    deadline = time.time() + 120
    while time.time() < deadline and not glob.glob(os.path.join(out, "_batch_*_committed")):
        time.sleep(0.5)
    # second wall-clock window: new records arrive AFTER the first scheduled
    # commit and must land in their own batch-keyed files (multi-window
    # rotation, not just a single flush)
    import hashlib
    import tempfile

    import pyarrow.parquet as pq

    path = os.path.abspath(str(sf_copy / "events.parquet"))
    tag = hashlib.md5(path.encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"kcsc_events_stream_{tag}")
    tbl = pq.read_table(path)
    shifted = tbl.set_column(
        tbl.schema.get_field_index("event_id"),
        "event_id",
        [[v.as_py() + 10_000_000 for v in tbl["event_id"].combine_chunks()]],
    )
    pq.write_table(shifted, os.path.join(stage, "events2.parquet"))
    n_markers = lambda: len(glob.glob(os.path.join(out, "_batch_*_committed")))  # noqa: E731
    first = n_markers()
    deadline = time.time() + 120
    while time.time() < deadline and n_markers() <= first:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    assert n_markers() >= 2, "second scheduled window never committed"
    files = glob.glob(os.path.join(out, "**", "part-b*.parquet"), recursive=True)
    batch_ids = {os.path.basename(f).split("-")[1] for f in files}
    assert len(batch_ids) >= 2, f"expected files from >=2 scheduled windows, got {batch_ids}"
    got = spark.read.option("pathGlobFilter", "part-b*.parquet").parquet(out).count()
    src = spark.read.parquet(path).count()
    assert got == 2 * src
    # restart: checkpoint + markers must prevent any re-landing
    q2 = run_connector_stream_scheduled(spark, props, str(sf_copy), out, ckpt)
    time.sleep(2.5)
    q2.stop()
    q2.awaitTermination(60)
    assert (
        spark.read.option("pathGlobFilter", "part-b*.parquet").parquet(out).count()
        == 2 * src
    )


def test_streaming_sq8_encode_matches_batch(spark, sf_small, tmp_path):
    """The SQ8 compression path serves STREAMING ingest too: embeddings
    arriving as a stream encode against the broadcast-trained quantizer
    ranges and land with exactly the batch encoder's codes/errors —
    continuously-arriving vectors join a corpus without re-encoding it."""
    import os
    import shutil

    from kafka_connect_storage_cloud_spark.llm.sq import _dim_ranges, embedding_sq8
    from kafka_connect_storage_cloud_spark.llm.similarity import SCALE
    from kafka_connect_storage_cloud_spark.llm.sq import SQ_LEVELS

    expected = {
        (r["vec_id"], r["recon_err_sq"], r["code_sum"])
        for r in embedding_sq8(spark, sf_small).collect()
    }
    mn, mx = _dim_ranges(spark, sf_small)
    mn_arr = "array(" + ",".join(f"{v}L" for v in mn) + ")"
    rng_arr = "array(" + ",".join(f"{(b - a) if b > a else 1}L" for a, b in zip(mn, mx)) + ")"
    stage = tmp_path / "emb_stream"
    stage.mkdir()
    shutil.copy(os.path.join(sf_small, "embeddings.parquet"), stage / "embeddings.parquet")
    raw_schema = spark.read.parquet(str(stage)).schema
    stream = spark.readStream.schema(raw_schema).parquet(str(stage))
    v = f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}, 0) AS BIGINT))"
    code = (
        f"zip_with(zip_with({v}, {mn_arr}, (x, m) -> x - m), {rng_arr}, "
        f"(d, r) -> (d * {SQ_LEVELS}) div r)"
    )
    recon = (
        f"zip_with(zip_with({code}, {rng_arr}, (c, r) -> (c * r) div {SQ_LEVELS}), "
        f"{mn_arr}, (q, m) -> q + m)"
    )
    enc = stream.selectExpr(
        "vec_id",
        f"aggregate(zip_with({v}, {recon}, (a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), (acc, e) -> acc + e) AS recon_err_sq",
        f"aggregate({code}, CAST(0 AS BIGINT), (a, c) -> a + c) AS code_sum",
    )
    q = (
        enc.writeStream.format("memory")
        .queryName("sq8_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sq8"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["vec_id"], r["recon_err_sq"], r["code_sum"])
        for r in spark.table("sq8_stream").collect()
    }
    assert got == expected


def test_scheduled_sink_purges_stale_partial_batch_files(spark, sf_small, tmp_path):
    """Crash-window exactly-once: files named part-b<id>-* that exist
    WITHOUT the batch's committed marker are survivors of an aborted rename
    pass. The replayed batch must purge them before landing its own files,
    otherwise a replay that produces fewer or renumbered files leaves the
    stale ones alongside the new — duplicating records."""
    import glob
    import os
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        run_connector_stream_scheduled,
    )

    sf_copy = tmp_path / "sfcopy"
    sf_copy.mkdir()
    shutil.copy(os.path.join(sf_small, "events.parquet"), sf_copy / "events.parquet")
    out = str(tmp_path / "sched")
    # simulate an aborted batch-0 rename pass: a landed data file, no marker
    stale_dir = os.path.join(out, "event_type=stale")
    os.makedirs(stale_dir)
    pq.write_table(
        pa.table({"offset": pa.array([1], pa.int64())}),
        os.path.join(stale_dir, "part-b00000-99999.parquet"),
    )
    props = {
        "topics": "events",
        "format.class": "parquet",
        "partitioner.class": "io.confluent.connect.storage.partitioner.FieldPartitioner",
        "partition.field.name": "event_type",
        "rotate.schedule.interval.ms": "700",
        "behavior.on.null.values": "ignore",
    }
    q = run_connector_stream_scheduled(
        spark, props, str(sf_copy), out, str(tmp_path / "ckpt")
    )
    deadline = time.time() + 120
    while time.time() < deadline and not glob.glob(
        os.path.join(out, "_batch_0_committed")
    ):
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    assert not os.path.exists(
        os.path.join(stale_dir, "part-b00000-99999.parquet")
    ), "stale partial-batch file survived the replayed commit"
    got = spark.read.option("pathGlobFilter", "part-b*.parquet").parquet(out).count()
    src = spark.read.parquet(str(sf_copy / "events.parquet")).count()
    assert got == src


def test_corpus_ingest_stream_matches_batch(spark, sf_small, tmp_path):
    """Streaming corpus ingest == batch: the fused quality verdict over a
    documents stream staged as two files (the second re-delivers half of
    the first — a re-crawl) must (a) emit each distinct text exactly once
    and (b) agree with the batch quality_filter verdict value-for-value on
    every emitted doc."""
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        corpus_ingest_stream,
        stream_documents_source,
    )
    from kafka_connect_storage_cloud_spark.llm.quality import quality_filter

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    stage = str(tmp_path / "doc_stage")
    first = docs.where(F.col("doc_id") % 2 == 0)
    second = docs.where(F.col("doc_id") % 2 == 1).unionByName(
        docs.where(F.col("doc_id") % 4 == 0)  # re-delivered half of file 1
    )
    first.coalesce(1).write.parquet(stage)
    second.coalesce(1).write.mode("append").parquet(stage)
    ckpt = str(tmp_path / "ckpt_corpus")
    q = (
        corpus_ingest_stream(stream_documents_source(spark, stage))
        .writeStream.format("memory")
        .queryName("corpus_ingest")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("corpus_ingest").collect()
    # (a) exactly-once per distinct text
    md5s = [r["text_md5"] for r in got]
    assert len(md5s) == len(set(md5s))
    assert len(set(md5s)) == docs.select(F.md5("text")).distinct().count()
    # (b) verdict parity with the batch operator (keyed on doc_id: dup
    # texts share a verdict, so whichever copy survived must match batch)
    exp = {
        r["doc_id"]: (r["quality"], r["rep_flagged"], r["detected_lang"], r["keep"], r["reasons"])
        for r in quality_filter(spark, sf_small).collect()
    }
    for r in got:
        assert exp[r["doc_id"]] == (
            r["quality"], r["rep_flagged"], r["detected_lang"], r["keep"], r["reasons"]
        ), f"doc {r['doc_id']} verdict mismatch"


def test_minhash_dedup_stream_matches_batch_lsh(spark, sf_small, tmp_path):
    """Streaming near-dup ingest == one-shot batch LSH: stream the corpus
    as two micro-batches (even / odd doc_ids); cross-batch AND
    within-batch matches together must reproduce dedup_minhash_lsh's
    full unordered pair set — the batch-split-independence contract —
    and a full replay into a fresh checkpoint must rewrite the same
    state (exactly-once)."""
    from kafka_connect_storage_cloud_spark.llm.dedup import dedup_minhash_lsh
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        minhash_dedup_stream,
        minhash_stream_pairs,
        stream_documents_source,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    stage = str(tmp_path / "dd_stage")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(stage)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(stage)
    store = str(tmp_path / "dd_store")

    def run(ckpt: str) -> set:
        q = minhash_dedup_stream(
            stream_documents_source(spark, stage), store, str(tmp_path / ckpt)
        )
        assert q.awaitTermination(120), "stream did not drain in time"
        got = minhash_stream_pairs(spark, store)
        # orientation depends on which batch a doc landed in: compare
        # unordered
        return {
            (min(r["new_doc"], r["index_doc"]), max(r["new_doc"], r["index_doc"]))
            for r in got.collect()
        }

    got1 = run("ckpt1")
    exp = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in dedup_minhash_lsh(spark, sf_small).collect()
    }
    assert got1 == exp
    # replay everything into a fresh checkpoint: same batch-keyed files
    # recomputed from the same prior-batch store states — byte-stable
    got2 = run("ckpt2")
    assert got2 == exp


def test_minhash_dedup_stream_four_way_split(spark, sf_small, tmp_path):
    """Split-independence at a different granularity: the same corpus
    streamed as FOUR micro-batches (doc_id % 4) must accumulate exactly
    the same unordered pair set as the one-shot batch LSH — pairs must
    not depend on which batch boundary separated their documents."""
    from kafka_connect_storage_cloud_spark.llm.dedup import dedup_minhash_lsh
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        minhash_dedup_stream,
        minhash_stream_pairs,
        stream_documents_source,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    stage = str(tmp_path / "dd4_stage")
    for part in range(4):
        docs.where(F.col("doc_id") % 4 == part).coalesce(1).write.mode(
            "append"
        ).parquet(stage)
    store = str(tmp_path / "dd4_store")
    q = minhash_dedup_stream(
        stream_documents_source(spark, stage), store, str(tmp_path / "dd4_ckpt")
    )
    assert q.awaitTermination(180), "stream did not drain in time"
    got = {
        (min(r["new_doc"], r["index_doc"]), max(r["new_doc"], r["index_doc"]))
        for r in minhash_stream_pairs(spark, store).collect()
    }
    exp = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in dedup_minhash_lsh(spark, sf_small).collect()
    }
    assert got == exp


def test_minhash_stream_bucket_crossing_max_bucket_matches_batch(
    spark, tmp_path, monkeypatch
):
    """A band bucket that crosses MAX_BUCKET ACROSS batch boundaries: the
    early batch legitimately emits its within-bucket pairs (the bucket is
    still small), a later batch pushes the bucket over the cap, and the
    one-shot op drops the whole bucket. The drain-time finalize must drop
    those stored pairs too — while a normal near-dup pair in an
    unaffected bucket survives. MAX_BUCKET is patched small so the
    pathology stays unit-test sized; both engines read the patched value
    at call time."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_connect_storage_cloud_spark.llm import dedup as dedup_mod
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        minhash_dedup_stream,
        minhash_stream_pairs,
        stream_documents_source,
    )

    monkeypatch.setattr(dedup_mod, "MAX_BUCKET", 10)
    mass = ["the same boilerplate page text repeated verbatim many times over"] * 13
    near = [
        "a distinct document about spark shuffles and partitions number one",
        "a distinct document about spark shuffles and partitions number two",
    ]
    texts = mass + near

    def write_docs(path: str, lo: int, hi: int, mode: str) -> None:
        ids = list(range(lo, hi))
        tbl = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids]),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["src0"] * len(ids)),
                "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
            }
        )
        import os

        os.makedirs(path, exist_ok=True)
        pq.write_table(tbl, f"{path}/part-{lo}.parquet")

    stage = str(tmp_path / "xb_stage")
    # batch 1: 8 of the 13 identical docs + the near-dup pair (bucket=8 <= 10)
    write_docs(stage, 0, 8, "w")
    write_docs(stage, 13, 15, "a")
    # batch 2: 5 more identical docs -> bucket hits 13 > 10
    write_docs(stage, 8, 13, "a")
    store = str(tmp_path / "xb_store")
    q = minhash_dedup_stream(
        stream_documents_source(spark, stage), store, str(tmp_path / "xb_ckpt")
    )
    assert q.awaitTermination(120), "stream did not drain in time"
    # the raw store DID emit mass-bucket pairs in the early batch —
    # otherwise this test isn't exercising the crossing at all
    raw = spark.read.parquet(f"{store}/pairs")
    mass_raw = raw.where(
        (F.col("new_doc") < 13) & (F.col("index_doc") < 13)
    ).count()
    assert mass_raw > 0, "scenario vacuous: early batch emitted no mass pairs"
    got = {
        (min(r["new_doc"], r["index_doc"]), max(r["new_doc"], r["index_doc"]))
        for r in minhash_stream_pairs(spark, store).collect()
    }
    # one-shot with the same patched MAX_BUCKET on the same corpus
    d = tmp_path / "xb_oneshot"
    d.mkdir()
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["src0"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    exp = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in dedup_mod.dedup_minhash_lsh(spark, str(d)).collect()
    }
    assert got == exp
    assert all(a >= 13 or b >= 13 for a, b in got), "mass-bucket pairs survived"
    assert (13, 14) in got, "the genuine near-dup pair must survive"


def test_consumer_lag_stream_matches_batch_report(spark, sf_small, tmp_path):
    """Streaming lag monitor == batch consumer_lag_report once the stream
    drains, regardless of micro-batch split; intermediate snapshots exist
    per batch and replaying into a fresh checkpoint rewrites the same
    final snapshot (overwrite idempotence)."""
    from kafka_connect_storage_cloud_spark.plans.connector import consumer_lag_report
    from kafka_connect_storage_cloud_spark.sources.topic import as_topic_records
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        consumer_lag_stream,
        stream_events_source,
    )

    store = str(tmp_path / "lag_store")

    def run(ckpt: str):
        q = consumer_lag_stream(
            as_topic_records(stream_events_source(spark, sf_small)),
            store,
            str(tmp_path / ckpt),
        )
        assert q.awaitTermination(120), "lag stream did not drain in time"
        import os

        batches = sorted(
            int(e.split("=", 1)[1])
            for e in os.listdir(f"{store}/lag")
            if e.startswith("batch=")
        )
        assert batches, "no lag snapshots written"
        last = spark.read.parquet(f"{store}/lag/batch={batches[-1]}")
        return sorted(map(tuple, last.collect()))

    got = run("ckpt1")
    exp = sorted(map(tuple, consumer_lag_report(spark, sf_small).collect()))
    assert got == exp
    assert run("ckpt2") == exp  # replay == original (idempotent state)


def test_containment_dedup_stream_matches_batch(spark, sf_small, tmp_path):
    """Streaming containment ingest == one-shot dedup_containment: stream
    the corpus as two micro-batches (even/odd doc_ids); the accumulated
    scored pair set (both probe directions — new-prefix x store-index and
    store-prefix x new-index) must reproduce the batch operator's rows,
    and a full replay into a fresh checkpoint must rewrite the same state
    (exactly-once, same contract as the minhash twin)."""
    from kafka_connect_storage_cloud_spark.llm.dedup import dedup_containment
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        containment_dedup_stream,
        stream_documents_source,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    stage = str(tmp_path / "ct_stage")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(stage)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(stage)
    store = str(tmp_path / "ct_store")

    def run(ckpt: str) -> set:
        q = containment_dedup_stream(
            stream_documents_source(spark, stage), store, str(tmp_path / ckpt)
        )
        assert q.awaitTermination(180), "stream did not drain in time"
        cols = ["doc_a", "doc_b", "na", "nb", "n_inter",
                "containment", "jaccard", "dup_class"]
        return {
            tuple(r)
            for r in spark.read.parquet(f"{store}/pairs").select(*cols).collect()
        }

    got1 = run("ct_ckpt1")
    exp = {tuple(r) for r in dedup_containment(spark, sf_small).collect()}
    assert got1 == exp and exp, "accumulated pairs != one-shot containment"
    got2 = run("ct_ckpt2")
    assert got2 == exp


def test_containment_dedup_stream_four_way_split(spark, sf_small, tmp_path):
    """Split-independence: FOUR micro-batches (doc_id % 4) accumulate the
    same scored pair set as the one-shot operator — subset dupes must not
    hide behind any batch boundary orientation (smaller side earlier AND
    smaller side later both occur in this split)."""
    from kafka_connect_storage_cloud_spark.llm.dedup import dedup_containment
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        containment_dedup_stream,
        stream_documents_source,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    stage = str(tmp_path / "ct4_stage")
    for part in range(4):
        docs.where(F.col("doc_id") % 4 == part).coalesce(1).write.mode(
            "append"
        ).parquet(stage)
    store = str(tmp_path / "ct4_store")
    q = containment_dedup_stream(
        stream_documents_source(spark, stage), store, str(tmp_path / "ct4_ckpt")
    )
    assert q.awaitTermination(240), "stream did not drain in time"
    cols = ["doc_a", "doc_b", "na", "nb", "n_inter",
            "containment", "jaccard", "dup_class"]
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{store}/pairs").select(*cols).collect()
    }
    exp = {tuple(r) for r in dedup_containment(spark, sf_small).collect()}
    assert got == exp and exp


def test_cosine_dup_stream_matches_batch(spark, sf_small, tmp_path):
    """Streaming embedding ingest == one-shot embedding_cosine_dups: stream
    the vectors as two micro-batches (even/odd vec_ids) at the one-shot
    operator's adaptive band width; the accumulated confirmed pair set must
    reproduce the batch operator's rows bit-identically, and a full replay
    into a fresh checkpoint must rewrite the same state (exactly-once,
    same contract as the minhash/containment twins)."""
    from kafka_connect_storage_cloud_spark.llm.similarity import (
        _cb_bits,
        embedding_cosine_dups,
    )
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        cosine_dup_stream,
        stream_embeddings_source,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    bits = _cb_bits(emb.count())
    stage = str(tmp_path / "cd_stage")
    emb.where(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(stage)
    emb.where(F.col("vec_id") % 2 == 1).coalesce(1).write.mode("append").parquet(stage)
    store = str(tmp_path / "cd_store")

    def run(ckpt: str) -> set:
        q = cosine_dup_stream(
            stream_embeddings_source(spark, stage), store, str(tmp_path / ckpt), bits
        )
        assert q.awaitTermination(180), "stream did not drain in time"
        cols = ["vec_a", "vec_b", "label", "cosine"]
        return {
            tuple(r)
            for r in spark.read.parquet(f"{store}/pairs").select(*cols).collect()
        }

    got1 = run("cd_ckpt1")
    exp = {tuple(r) for r in embedding_cosine_dups(spark, sf_small).collect()}
    assert got1 == exp and exp, "accumulated pairs != one-shot embedding_cosine_dups"
    got2 = run("cd_ckpt2")
    assert got2 == exp


def test_cosine_dup_stream_four_way_split(spark, sf_small, tmp_path):
    """Split-independence: FOUR micro-batches (vec_id % 4) accumulate the
    same confirmed pair set as the one-shot operator — a near-dup pair must
    not hide behind any batch boundary orientation."""
    from kafka_connect_storage_cloud_spark.llm.similarity import (
        _cb_bits,
        embedding_cosine_dups,
    )
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        cosine_dup_stream,
        stream_embeddings_source,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    bits = _cb_bits(emb.count())
    stage = str(tmp_path / "cd4_stage")
    for part in range(4):
        emb.where(F.col("vec_id") % 4 == part).coalesce(1).write.mode(
            "append"
        ).parquet(stage)
    store = str(tmp_path / "cd4_store")
    q = cosine_dup_stream(
        stream_embeddings_source(spark, stage), store, str(tmp_path / "cd4_ckpt"), bits
    )
    assert q.awaitTermination(240), "stream did not drain in time"
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{store}/pairs")
        .select("vec_a", "vec_b", "label", "cosine")
        .collect()
    }
    exp = {tuple(r) for r in embedding_cosine_dups(spark, sf_small).collect()}
    assert got == exp and exp


def test_simhash_dup_stream_matches_batch(spark, sf_small, tmp_path):
    """Streaming simhash ingest == one-shot dedup_simhash: two even/odd
    micro-batches accumulate the batch operator's (doc_a, doc_b, hamming)
    set exactly; a full replay into a fresh checkpoint rewrites the same
    state (the band-store exactly-once contract, fourth signature class
    after minhash/containment/cosine)."""
    from kafka_connect_storage_cloud_spark.llm.dedup import dedup_simhash
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        simhash_dup_stream,
        stream_documents_source,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    stage = str(tmp_path / "sh_stage")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(stage)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(stage)
    store = str(tmp_path / "sh_store")

    def run(ckpt: str) -> set:
        q = simhash_dup_stream(
            stream_documents_source(spark, stage), store, str(tmp_path / ckpt)
        )
        assert q.awaitTermination(180), "stream did not drain in time"
        return {
            tuple(r)
            for r in spark.read.parquet(f"{store}/pairs")
            .select("doc_a", "doc_b", "hamming")
            .collect()
        }

    got1 = run("sh_ckpt1")
    exp = {tuple(r) for r in dedup_simhash(spark, sf_small).collect()}
    assert got1 == exp and exp, "accumulated pairs != one-shot dedup_simhash"
    got2 = run("sh_ckpt2")
    assert got2 == exp


def test_simhash_dup_stream_four_way_split(spark, sf_small, tmp_path):
    """Split-independence for the simhash twin: four doc_id%4 batches
    accumulate the same pair set as one-shot dedup_simhash."""
    from kafka_connect_storage_cloud_spark.llm.dedup import dedup_simhash
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        simhash_dup_stream,
        stream_documents_source,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    stage = str(tmp_path / "sh4_stage")
    for part in range(4):
        docs.where(F.col("doc_id") % 4 == part).coalesce(1).write.mode(
            "append"
        ).parquet(stage)
    store = str(tmp_path / "sh4_store")
    q = simhash_dup_stream(
        stream_documents_source(spark, stage), store, str(tmp_path / "sh4_ckpt")
    )
    assert q.awaitTermination(240), "stream did not drain in time"
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{store}/pairs")
        .select("doc_a", "doc_b", "hamming")
        .collect()
    }
    exp = {tuple(r) for r in dedup_simhash(spark, sf_small).collect()}
    assert got == exp and exp


def test_burst_runs_stream_matches_batch(spark, sf_small, tmp_path):
    """Streaming burst monitor == one-shot events_burst_runs after the
    final batch: hour cells merge across an even/odd event_id split, and
    a replay into a fresh checkpoint rewrites the same runs table."""
    from kafka_connect_storage_cloud_spark.plans.events_ext import events_burst_runs
    from kafka_connect_storage_cloud_spark.session import read_events
    from kafka_connect_storage_cloud_spark.streaming.pipeline import burst_runs_stream

    ev = read_events(spark, sf_small)
    stage = str(tmp_path / "br_stage")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(stage)
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(stage)
    store = str(tmp_path / "br_store")
    cols = ["event_type", "hr_start", "hr_end", "run_len", "peak_c",
            "total_c", "share_of_type"]

    def run(ckpt: str) -> set:
        stream = (
            spark.readStream.schema(spark.read.parquet(stage).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        q = burst_runs_stream(stream, store, str(tmp_path / ckpt))
        assert q.awaitTermination(180), "stream did not drain in time"
        return {
            tuple(r)
            for r in spark.read.parquet(f"{store}/runs").select(*cols).collect()
        }

    got1 = run("br_ckpt1")
    exp = {tuple(r) for r in events_burst_runs(spark, sf_small).collect()}
    assert got1 == exp and exp, "final runs table != one-shot events_burst_runs"
    got2 = run("br_ckpt2")
    assert got2 == exp


def test_corpus_prep_stream_matches_batch(spark, sf_small, tmp_path):
    """The r8 streaming corpus-prep capstone: quality ∘ cross-batch near-dup
    keep-best ∘ mixture ∘ packing over a 2-batch ingest must reproduce the
    one-shot corpus_prep_pipeline manifest row-for-row; a 4-way split must
    produce the same manifest (batch-split independence); and a full replay
    into a fresh checkpoint must land identical state (exactly-once)."""
    import shutil

    from kafka_connect_storage_cloud_spark.llm.corpus import corpus_prep_pipeline
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        corpus_prep_stream,
        corpus_prep_stream_manifest,
        stream_documents_source,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")

    def run(stage: str, store: str, ckpt: str) -> set:
        q = corpus_prep_stream(
            stream_documents_source(spark, stage), store, ckpt
        )
        assert q.awaitTermination(180), "corpus prep stream did not drain"
        return {
            tuple(r)
            for r in corpus_prep_stream_manifest(spark, store).collect()
        }

    # 2-way split
    stage2 = str(tmp_path / "cp_stage2")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(stage2)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(stage2)
    store2 = str(tmp_path / "cp_store2")
    got2 = run(stage2, store2, str(tmp_path / "cp_ckpt2"))

    exp = {tuple(r) for r in corpus_prep_pipeline(spark, sf_small).collect()}
    assert got2 == exp

    # replay: fresh checkpoint over the same stage + store — identical state
    got2r = run(stage2, store2, str(tmp_path / "cp_ckpt2r"))
    assert got2r == exp

    # 4-way split independence
    stage4 = str(tmp_path / "cp_stage4")
    for m in range(4):
        docs.where(F.col("doc_id") % 4 == m).coalesce(1).write.mode(
            "append" if m else "overwrite"
        ).parquet(stage4)
    store4 = str(tmp_path / "cp_store4")
    got4 = run(stage4, store4, str(tmp_path / "cp_ckpt4"))
    assert got4 == exp
    shutil.rmtree(stage4, ignore_errors=True)


def test_winnowing_dup_stream_matches_batch(spark, sf_small, tmp_path):
    """The fifth near-dup signature class's incremental twin: the
    fingerprint store accumulated over a 2-batch ingest (with a
    re-delivered half) must roll up to EXACTLY the batch
    winnowing_fingerprints output; a 4-way split must match too."""
    from kafka_connect_storage_cloud_spark.llm.dedup import winnowing_fingerprints
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        stream_documents_source,
        winnowing_dup_stream,
        winnowing_dup_stream_stats,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    exp = {tuple(r) for r in winnowing_fingerprints(spark, sf_small).collect()}

    def run(stage: str, store: str, ckpt: str) -> set:
        q = winnowing_dup_stream(stream_documents_source(spark, stage), store, ckpt)
        assert q.awaitTermination(120), "winnowing stream did not drain"
        return {tuple(r) for r in winnowing_dup_stream_stats(spark, store).collect()}

    stage2 = str(tmp_path / "wn_stage2")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(stage2)
    # second file re-delivers a quarter of the first (re-crawl)
    docs.where(F.col("doc_id") % 2 == 1).unionByName(
        docs.where(F.col("doc_id") % 4 == 0)
    ).coalesce(1).write.mode("append").parquet(stage2)
    got2 = run(stage2, str(tmp_path / "wn_store2"), str(tmp_path / "wn_ckpt2"))
    assert got2 == exp

    stage4 = str(tmp_path / "wn_stage4")
    for m in range(4):
        docs.where(F.col("doc_id") % 4 == m).coalesce(1).write.mode(
            "append" if m else "overwrite"
        ).parquet(stage4)
    got4 = run(stage4, str(tmp_path / "wn_store4"), str(tmp_path / "wn_ckpt4"))
    assert got4 == exp


def test_erase_doc_ids_minhash_and_winnowing_stores(spark, sf_small, tmp_path):
    """Right-to-erasure across the streaming stores (VERDICT r8 #6): after
    erase_doc_ids, a drain over the surviving store state must equal a
    FRESH run on the corpus minus the erased ids — for the minhash band/
    pair store (finalized pair set) and the winnowing fingerprint store
    (full stats rollup). Erased ids are chosen as real near-dup pair
    endpoints so the store actually loses rows."""
    from kafka_connect_storage_cloud_spark.llm.dedup import (
        dedup_minhash_lsh,
        winnowing_fingerprints,
    )
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        erase_doc_ids,
        minhash_dedup_stream,
        minhash_stream_pairs,
        stream_documents_source,
        winnowing_dup_stream,
        winnowing_dup_stream_stats,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    all_pairs = dedup_minhash_lsh(spark, sf_small).collect()
    assert all_pairs, "sf_small has no near-dup pairs; erasure test vacuous"
    erase = sorted({r["doc_a"] for r in all_pairs})[:2]
    minus = str(tmp_path / "er_minus")
    docs.where(~F.col("doc_id").isin(erase)).coalesce(1).write.parquet(
        f"{minus}/documents.parquet"
    )

    stage = str(tmp_path / "er_stage")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(stage)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(stage)

    # --- minhash band/pair store ---
    store = str(tmp_path / "er_mh_store")
    q = minhash_dedup_stream(
        stream_documents_source(spark, stage), store, str(tmp_path / "er_mh_ckpt")
    )
    assert q.awaitTermination(120), "stream did not drain in time"
    removed = erase_doc_ids(spark, store, erase)
    assert removed.get("bands", 0) > 0, "erasure removed no band rows"
    assert removed.get("pairs", 0) > 0, "erasure removed no pair rows"
    got = {
        (min(r["new_doc"], r["index_doc"]), max(r["new_doc"], r["index_doc"]))
        for r in minhash_stream_pairs(spark, store).collect()
    }
    exp = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in dedup_minhash_lsh(spark, minus).collect()
    }
    assert got == exp
    assert all(a not in erase and b not in erase for a, b in got)

    # --- winnowing fingerprint store ---
    wstore = str(tmp_path / "er_wn_store")
    q = winnowing_dup_stream(
        stream_documents_source(spark, stage), wstore, str(tmp_path / "er_wn_ckpt")
    )
    assert q.awaitTermination(120), "winnowing stream did not drain"
    wremoved = erase_doc_ids(spark, wstore, erase)
    assert wremoved.get("fps", 0) > 0, "erasure removed no fingerprint rows"
    wgot = {tuple(r) for r in winnowing_dup_stream_stats(spark, wstore).collect()}
    wexp = {tuple(r) for r in winnowing_fingerprints(spark, minus).collect()}
    assert wgot == wexp and wexp


def test_cms_sketch_stream_matches_batch(spark, sf_small, tmp_path):
    """Streaming count-min == one-shot cms_heavy_hitters after drain:
    sketch cells and exact counts are ADDITIVE, so a 2-way and a 4-way
    document split must both land the identical estimate table, and a
    replay into a fresh checkpoint rewrites the same stores."""
    import shutil

    from kafka_connect_storage_cloud_spark.llm.sketches import cms_heavy_hitters
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        cms_sketch_stream,
        cms_sketch_stream_stats,
        stream_documents_source,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    exp = {tuple(r) for r in cms_heavy_hitters(spark, sf_small).collect()}
    assert exp

    def run(n_split: int, tag: str) -> set:
        stage = str(tmp_path / f"cms_stage_{tag}")
        for i in range(n_split):
            docs.where(F.col("doc_id") % n_split == i).coalesce(1).write.mode(
                "append"
            ).parquet(stage)
        store = str(tmp_path / f"cms_store_{tag}")
        q = cms_sketch_stream(
            stream_documents_source(spark, stage), store, str(tmp_path / f"cms_ck_{tag}")
        )
        assert q.awaitTermination(180), "cms stream did not drain"
        got = {tuple(r) for r in cms_sketch_stream_stats(spark, store).collect()}
        # replay: fresh checkpoint over the same stage + store
        q2 = cms_sketch_stream(
            stream_documents_source(spark, stage), store, str(tmp_path / f"cms_ck2_{tag}")
        )
        assert q2.awaitTermination(180)
        got_replay = {tuple(r) for r in cms_sketch_stream_stats(spark, store).collect()}
        assert got_replay == got, "replay changed the drained estimates"
        return got

    assert run(2, "s2") == exp
    assert run(4, "s4") == exp


def test_kmv_sketch_stream_matches_batch(spark, sf_small, tmp_path):
    """Streaming KMV == one-shot kmv_distinct after drain: min-k sets are
    mergeable by union-then-bottom-k, so a 2-way and a 4-way event split
    land the identical estimate table, and a replay into a fresh
    checkpoint rewrites the same stores."""
    from kafka_connect_storage_cloud_spark.llm.sketches import kmv_distinct
    from kafka_connect_storage_cloud_spark.session import read_events
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        kmv_sketch_stream,
        kmv_sketch_stream_stats,
    )

    ev = read_events(spark, sf_small).select("event_id", "event_type", "user_id")
    exp = {tuple(r) for r in kmv_distinct(spark, sf_small).collect()}
    assert exp

    def run(n_split: int, tag: str) -> set:
        stage = str(tmp_path / f"kmv_stage_{tag}")
        for i in range(n_split):
            ev.where(F.col("event_id") % n_split == i).coalesce(1).write.mode(
                "append"
            ).parquet(stage)
        store = str(tmp_path / f"kmv_store_{tag}")
        src = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        q = kmv_sketch_stream(src, store, str(tmp_path / f"kmv_ck_{tag}"))
        assert q.awaitTermination(180), "kmv stream did not drain"
        got = {tuple(r) for r in kmv_sketch_stream_stats(spark, store).collect()}
        q2 = kmv_sketch_stream(src, store, str(tmp_path / f"kmv_ck2_{tag}"))
        assert q2.awaitTermination(180)
        got_replay = {tuple(r) for r in kmv_sketch_stream_stats(spark, store).collect()}
        assert got_replay == got, "replay changed the drained estimates"
        return got

    assert run(2, "s2") == exp
    assert run(4, "s4") == exp


def test_kmv_stream_min_store_is_bounded(spark, sf_small, tmp_path):
    """The production state (mins store) holds <= |types| * K rows per
    batch regardless of batch size."""
    from kafka_connect_storage_cloud_spark.llm.sketches import KMV_K
    from kafka_connect_storage_cloud_spark.session import read_events
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        kmv_sketch_stream,
    )

    ev = read_events(spark, sf_small).select("event_id", "event_type", "user_id")
    stage = str(tmp_path / "kmvb_stage")
    ev.coalesce(1).write.parquet(stage)
    store = str(tmp_path / "kmvb_store")
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = kmv_sketch_stream(src, store, str(tmp_path / "kmvb_ck"))
    assert q.awaitTermination(180)
    mins = spark.read.parquet(f"{store}/mins/batch=0")
    n_types = ev.select("event_type").distinct().count()
    assert mins.count() <= n_types * KMV_K
    per = mins.groupBy("event_type").count().collect()
    assert all(r["count"] <= KMV_K for r in per)


def test_histogram_sketch_stream_matches_batch(spark, sf_small, tmp_path):
    """Streaming binned-quantile histogram == one-shot
    quantile_sketch_audit after drain: bins and value counts are
    additive, so 2-way and 4-way splits land the identical table and a
    replay rewrites the same stores."""
    from kafka_connect_storage_cloud_spark.llm.sketches import quantile_sketch_audit
    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        histogram_sketch_stream,
        histogram_sketch_stream_stats,
        stream_documents_source,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    exp = {tuple(r) for r in quantile_sketch_audit(spark, sf_small).collect()}
    assert exp

    def run(n_split: int, tag: str) -> set:
        stage = str(tmp_path / f"qsk_stage_{tag}")
        for i in range(n_split):
            docs.where(F.col("doc_id") % n_split == i).coalesce(1).write.mode(
                "append"
            ).parquet(stage)
        store = str(tmp_path / f"qsk_store_{tag}")
        q = histogram_sketch_stream(
            stream_documents_source(spark, stage), store, str(tmp_path / f"qsk_ck_{tag}")
        )
        assert q.awaitTermination(180), "histogram stream did not drain"
        got = {tuple(r) for r in histogram_sketch_stream_stats(spark, store).collect()}
        q2 = histogram_sketch_stream(
            stream_documents_source(spark, stage), store, str(tmp_path / f"qsk_ck2_{tag}")
        )
        assert q2.awaitTermination(180)
        got_replay = {
            tuple(r) for r in histogram_sketch_stream_stats(spark, store).collect()
        }
        assert got_replay == got, "replay changed the drained audit"
        return got

    assert run(2, "s2") == exp
    assert run(4, "s4") == exp
