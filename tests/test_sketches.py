"""Semantic properties of the sketch/sampling family — the guarantees a
user relies on beyond oracle equality (which test_oracle_parity already
covers): CMS never undercounts, sketch estimates land within loose error
bounds, the reservoir is exactly-k and partitioning-invariant."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_spark.llm.sampling import (
    RESERVOIR_K,
    reservoir_sample,
)
from kafka_connect_storage_cloud_spark.llm.sketches import (
    cms_heavy_hitters,
    hll_distinct,
    hll_merge_invariant,
    kmv_distinct,
)
from kafka_connect_storage_cloud_spark.llm.text_stats import vocab_coverage, zipf_profile
from kafka_connect_storage_cloud_spark.session import read_table


def test_cms_never_undercounts(spark, sf_dir):
    rows = cms_heavy_hitters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cms_est"] >= r["true_count"], r
        assert r["inflation"] == r["cms_est"] - r["true_count"]


def test_kmv_and_hll_estimates_are_sane(spark, sf_dir):
    """Loose accuracy gate: with k=64 / m=64 the standard errors are ~13%;
    assert within 50% so the test flags structural bugs (wrong hash domain,
    off-by-one in rho) without being noise-sensitive."""
    for df in (kmv_distinct(spark, sf_dir), hll_distinct(spark, sf_dir)):
        for r in df.collect():
            assert r["rel_err"] < 0.5, r


def test_hll_merge_invariant_holds(spark, sf_dir):
    rows = hll_merge_invariant(spark, sf_dir).collect()
    assert rows
    assert all(r["merge_ok"] and r["n_register_diffs"] == 0 for r in rows)


def test_reservoir_exact_size_and_membership(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    strata = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sample = reservoir_sample(spark, sf_dir).collect()
    per_lang: dict = {}
    for r in sample:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in per_lang.items():
        assert len(rows) == min(RESERVOIR_K, strata[lang])
        assert sorted(r["draw_rank"] for r in rows) == list(range(1, len(rows) + 1))
    valid_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert all(r["doc_id"] in valid_ids for r in sample)


def test_reservoir_is_partitioning_invariant(spark, sf_dir):
    """The min-k draw must not depend on physical layout: same result under
    a different shuffle-partition count (the mergeability claim)."""
    base = {(r["lang"], r["draw_rank"]): r["doc_id"] for r in reservoir_sample(spark, sf_dir).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = {(r["lang"], r["draw_rank"]): r["doc_id"] for r in reservoir_sample(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt


def test_vocab_coverage_bounds_and_zipf_monotone(spark, sf_dir):
    cov = vocab_coverage(spark, sf_dir).collect()
    assert cov
    for r in cov:
        assert 0.0 <= r["coverage"] <= 1.0
        assert r["n_oov"] <= r["n_tokens"]
    zipf = sorted(zipf_profile(spark, sf_dir).collect(), key=lambda r: r["rank"])
    shares = [r["cum_share"] for r in zipf]
    assert all(a <= b + 1e-12 for a, b in zip(shares, shares[1:]))
    counts = [r["cnt"] for r in zipf]
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_quantile_sketch_mergeable_and_bounded(spark, sf_dir):
    """The binned quantile sketch must (a) merge by addition — the histogram
    of two half-corpora summed equals the one-pass histogram (the property
    that replaces a corpus sort at scale), and (b) read out within one bin
    width of the exact percentile."""
    import pyspark.sql.functions as F

    from kafka_connect_storage_cloud_spark.llm.sketches import (
        QSK_BINS,
        QSK_MAX,
        quantile_sketch_audit,
    )
    from kafka_connect_storage_cloud_spark.session import read_table

    width = QSK_MAX // QSK_BINS
    rows = quantile_sketch_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["sketch_value"] - r["exact_value"] <= width, r

    docs = read_table(spark, sf_dir, "documents").select(
        "lang", F.size(F.split(F.lower("text"), r"\s+")).cast("long").alias("tokens"),
        "doc_id",
    )
    def hist(df):
        return {
            (r["lang"], r["bin"]): r["c"]
            for r in df.withColumn(
                "bin", F.least(F.floor(F.col("tokens") / width), F.lit(QSK_BINS - 1)).cast("int")
            ).groupBy("lang", "bin").agg(F.count(F.lit(1)).alias("c")).collect()
        }
    full = hist(docs)
    h1 = hist(docs.where(F.col("doc_id") % 2 == 0))
    h2 = hist(docs.where(F.col("doc_id") % 2 == 1))
    merged: dict = {}
    for h in (h1, h2):
        for k, v in h.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == full
