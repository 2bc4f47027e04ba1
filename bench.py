"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_connect_storage_cloud_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("kcsc-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    headline = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q6_revenue_change",
        "q10_returned_items",
        "events_hourly_rollup",
        "events_sessionize",
        "rotation_flush_size",
        "exactly_once_manifest",
    ]
    # optional heavy ops appended as they land (r4: the round-3 production
    # scale paths — LSH kNN graph and PQ encode — are timed every round so
    # BASELINE.md can grow rows for them)
    for opt in (
        "dedup_minhash_lsh",
        "ann_topk_bruteforce",
        "ann_topk_ivf",
        "dedup_exact",
        "dedup_chunks",
        "quality_score",
        "quality_filter",
        "token_shard_pack",
        "hll_distinct",
        "scd2_history",
        "rfm_segmentation",
        "knn_graph_lsh",
        "embedding_pq",
        # r6: the r5 corpus-shaped audits (prefix x inverted-index join) are
        # tracked per round like knn_graph_lsh (VERDICT r5 next-round #7)
        "dedup_containment",
        "dedup_method_matrix",
        # r7: the new families' heaviest representatives get their own
        # first-measurement rows (lexical retrieval, sketch set-ops,
        # wavelet spectrum, SemDeDup)
        "bm25_topk",
        "kmv_set_ops",
        "events_haar_energy",
        "semdedup_cells",
        # r8: the new dedup-family generator (heaviest new leg) + the two
        # time-series additions + the shard integrity manifest get
        # first-measurement rows
        "winnowing_fingerprints",
        "events_acf_profile",
        "events_theil_sen",
        "shard_checksum_manifest",
        # r9: the two-level IVF serving path (the semdedup codebook's
        # search face), the RRF fusion (heaviest new leg: full semantic
        # ranking scan), and the robust outlier filter
        "ann_topk_ivf_twolevel",
        "hybrid_rrf_fusion",
        "events_hampel_filter",
        # r9 late batch: the two-sample drift test, the Kadane burst
        # window, the STL-lite residual scorer, and the token-inequality
        # audit (dedup_cascade_yield is deliberately NOT a leg — its
        # generators are already timed via dedup_method_matrix and the
        # memoized tokenize would hide its true cold cost)
        "events_ks_drift",
        "events_max_burst_window",
        "events_stl_anomaly",
        "token_lorenz_gini",
        "events_mann_kendall",
        "events_ljung_box",
        # r9 inference/text batches: the shingle-vocabulary audit (heaviest
        # new leg: distinct (source, doc, shingle) stream), the double
        # rank-pass quantile normalizer, the 4-scale R/S window stack, and
        # the all-pairs Pettitt change-point
        "boilerplate_shingles",
        "quality_quantile_normalize",
        "events_hurst_rs",
        "events_pettitt_change",
        # r9 session 3: the codebook-quality audit (heaviest new leg — the
        # full two-level Lloyd chain + depth-2 score pass), the term-level
        # burstiness shuffle, the in-array winnowing tuning sweep, the
        # 90-lag RQA pair stage, and the layout advisor's double fan-out
        "cluster_silhouette",
        "term_burstiness",
        "winnowing_window_tuning",
        "events_recurrence_quant",
        "partition_pruning_matrix",
    ):
        if opt in qs:
            headline.append(opt)

    # warm the JVM, parquet footers, and each query's generated code once, so
    # the timed pass measures steady-state plan execution — the regime a
    # long-lived cluster session actually runs in — not one-shot codegen
    # compilation and first-touch I/O
    from kafka_connect_storage_cloud_spark.session import read_table

    for t in ("events", "documents", "embeddings"):
        read_table(spark, sf_dir, t).count()
    for name in headline:
        qs[name](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in headline:
        best = float("inf")
        for _ in range(3):  # min-of-3: squeeze out GC/scheduler noise
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # sink throughput: the full connector path (partition -> rotate ->
    # partitioned parquet write + manifest), the reference's headline metric
    import shutil
    import tempfile

    from kafka_connect_storage_cloud_spark.connector import run_connector

    props = {
        "topics": "events",
        "format.class": "parquet",
        "partitioner.class": "io.confluent.connect.storage.partitioner.FieldPartitioner",
        "partition.field.name": "event_type",
        "flush.size": "5000",
        "behavior.on.null.values": "ignore",
    }
    n_records = read_table(spark, sf_dir, "events").count()
    out = tempfile.mkdtemp(prefix="bench_sink_")
    try:
        run_connector(spark, props, sf_dir=sf_dir, output_path=out).collect()  # warm
        shutil.rmtree(out)
        sink_sec = float("inf")
        for _ in range(3):  # same min-of-3 steady-state convention as queries
            t0 = time.perf_counter()
            run_connector(spark, props, sf_dir=sf_dir, output_path=out).collect()
            sink_sec = min(sink_sec, round(time.perf_counter() - t0, 3))
            shutil.rmtree(out)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    timings["sink_connector_parquet"] = sink_sec

    # streaming near-dup ingest: the corpus as two micro-batches through
    # minhash_dedup_stream (cross-batch band store), end-to-end drain time —
    # the r3 streaming scale path, timed per round like the batch legs
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.streaming.pipeline import (
        minhash_dedup_stream,
        stream_documents_source,
    )

    docs = read_table(spark, sf_dir, "documents")
    stage = tempfile.mkdtemp(prefix="bench_dd_stage_")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(stage)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(stage)
    stream_sec = float("inf")
    try:
        for _ in range(2):  # min-of-2 (each run rebuilds store + checkpoint)
            scratch = tempfile.mkdtemp(prefix="bench_dd_run_")
            t0 = time.perf_counter()
            q = minhash_dedup_stream(
                stream_documents_source(spark, stage),
                os.path.join(scratch, "store"),
                os.path.join(scratch, "ckpt"),
            )
            assert q.awaitTermination(600), "dedup stream did not drain"
            stream_sec = min(stream_sec, round(time.perf_counter() - t0, 3))
            shutil.rmtree(scratch, ignore_errors=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    timings["minhash_dedup_stream"] = stream_sec

    # --- opt-in scale probe (r10, VERDICT r9 next-round #7) -------------
    # sf0.1 is overhead-bound (the r9 8-core bench beat the 32-core bench),
    # so §2-class wins are invisible in the default legs' wall-clock. When
    # $SPARK_GRAFT_SCALE_PROBE_DIR points at a tiled corpus (see
    # tools/make_scale_probe.py), the heaviest legs are additionally timed
    # there, single-pass (min-of-1), and reported in an EXTRA JSON field.
    # The env var is never set by the driver: the default output and the
    # timed legs above are byte-identical with the probe off.
    scale_probe: dict[str, float] | None = None
    probe_dir = os.environ.get("SPARK_GRAFT_SCALE_PROBE_DIR")
    if probe_dir:
        scale_probe = {}
        for name in (
            "dedup_method_matrix",
            "knn_graph_lsh",
            "dedup_containment",
            "cluster_silhouette",
        ):
            t0 = time.perf_counter()
            qs[name](spark, probe_dir).collect()
            scale_probe[name] = round(time.perf_counter() - t0, 3)
        pdocs = read_table(spark, probe_dir, "documents")
        pstage = tempfile.mkdtemp(prefix="probe_dd_stage_")
        pdocs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(pstage)
        pdocs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(pstage)
        pscratch = tempfile.mkdtemp(prefix="probe_dd_run_")
        try:
            t0 = time.perf_counter()
            q = minhash_dedup_stream(
                stream_documents_source(spark, pstage),
                os.path.join(pscratch, "store"),
                os.path.join(pscratch, "ckpt"),
            )
            assert q.awaitTermination(1800), "probe dedup stream did not drain"
            scale_probe["minhash_dedup_stream"] = round(time.perf_counter() - t0, 3)
        finally:
            shutil.rmtree(pstage, ignore_errors=True)
            shutil.rmtree(pscratch, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    # the 21 legs pinned in BASELINE.md (round 2) — the cross-round
    # comparison basis; later-round legs are tracked against their own
    # first-measurement rows, so the raw total is not comparable across
    # leg sets and the subtotal is emitted explicitly
    pinned = (
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
        "q6_revenue_change", "q10_returned_items", "events_hourly_rollup",
        "events_sessionize", "rotation_flush_size", "exactly_once_manifest",
        "dedup_minhash_lsh", "ann_topk_bruteforce", "ann_topk_ivf",
        "dedup_exact", "dedup_chunks", "quality_score", "quality_filter",
        "token_shard_pack", "hll_distinct", "scd2_history", "rfm_segmentation",
        "sink_connector_parquet",
    )
    # audit-path legs (corpus-pair audits + the production LSH graph + the
    # streaming ingest) reported as their own subtotal so drift verdicts can
    # split production-path vs audit-path movement at a glance (VERDICT r6 #7)
    audit = (
        "dedup_containment", "dedup_method_matrix", "knn_graph_lsh",
        "minhash_dedup_stream",
    )
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "pinned_leg_subtotal": round(
            sum(timings[k] for k in pinned if k in timings), 3
        ),
        "audit_leg_subtotal": round(
            sum(timings[k] for k in audit if k in timings), 3
        ),
        "sf": float(sf),
        "sink_records": n_records,
        "sink_records_per_sec": round(n_records / sink_sec),
    }
    if scale_probe is not None:  # extra field, opt-in only (never the driver)
        out["scale_probe"] = {"dir": probe_dir, "queries": scale_probe}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
