"""Property-based invariants for the corpus-prep operators (hypothesis):

token_shard_pack, for arbitrary (doc_id, tokens) corpora:
  (a) every document lands in exactly one shard (doc conservation),
  (b) shard_tokens sums to the corpus total (token conservation),
  (c) within a worker, shard indices are the floor(prev_cum/budget) walk —
      starting at 0, strictly increasing (over-budget docs may skip),
  (d) a shard exceeds the budget only via its final document (greedy rule).

A pure-python model checks (a)-(d) across the drawn space; drawn samples
also cross-check the Spark implementation against the model.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_storage_cloud_spark.llm.corpus import (
    SHARD_SALT,
    SHARD_TOKEN_BUDGET,
    SHARD_WORKERS,
    pack_manifest,
)

_corpus = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10_000), st.integers(min_value=1, max_value=5_000)),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


def _worker(doc_id: int) -> int:
    h = int(hashlib.md5(f"{SHARD_SALT}{doc_id}".encode()).hexdigest()[:8], 16)
    return h % SHARD_WORKERS


def _model(corpus, budget=SHARD_TOKEN_BUDGET):
    """Pure-python shard packing: the floor(prev_cum/budget) walk."""
    shards = {}
    per_worker = {}
    for doc_id, tokens in sorted(corpus):
        w = _worker(doc_id)
        cum = per_worker.get(w, 0)
        k = cum // budget
        per_worker[w] = cum + tokens
        shards.setdefault((w, k), []).append((doc_id, tokens))
    return shards


@given(_corpus)
@settings(max_examples=200, deadline=None)
def test_model_invariants(corpus):
    shards = _model(corpus)
    packed = [d for docs in shards.values() for d in docs]
    assert sorted(packed) == sorted(corpus)  # (a) + (b)
    by_worker = {}
    for (w, k), docs in shards.items():
        by_worker.setdefault(w, []).append(k)
    for w, ks in by_worker.items():
        # (c) the walk starts at shard 0 and only moves forward (an
        # over-budget doc may skip indices, so density is NOT guaranteed)
        assert min(ks) == 0 and len(set(ks)) == len(ks)
    for (w, k), docs in shards.items():
        total = sum(t for _, t in docs)
        before_last = total - docs[-1][1]
        assert before_last < SHARD_TOKEN_BUDGET  # (d) only last doc overflows


@given(_corpus)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_spark_matches_model(spark, corpus):
    toks = spark.createDataFrame(list(sorted(corpus)), "doc_id long, tokens long")
    got = {
        (r["worker"], r["shard"]): (r["n_docs"], r["shard_tokens"])
        for r in pack_manifest(toks).collect()
    }
    model = {
        k: (len(docs), sum(t for _, t in docs)) for k, docs in _model(corpus).items()
    }
    assert got == model


def test_udtf_chunker_matches_explode_chunker(spark, sf_small):
    """The Python UDTF chunker (Spark 4 lateral table function) must equal
    the JVM explode chunker row-for-row — the gate for swapping a real
    Python tokenizer into the chunk path."""
    from kafka_connect_storage_cloud_spark.llm.corpus import (
        doc_chunk_split,
        doc_chunk_split_udtf,
    )

    want = {
        (r["doc_id"], r["chunk_ord"]): (r["chunk_tokens"], r["chunk_md5"])
        for r in doc_chunk_split(spark, sf_small).collect()
    }
    got = {
        (r["doc_id"], r["chunk_ord"]): (r["chunk_tokens"], r["chunk_md5"])
        for r in doc_chunk_split_udtf(spark, sf_small).collect()
    }
    assert got == want and want


def test_doc_truncation_loss_invariants(spark, sf_small):
    """Longer context can only reduce truncation: shares are monotone
    non-increasing in ctx_len within a language, lost <= total, and the
    shortest candidate length actually truncates something (in-distribution
    — a loss table that is all zeros is a dead feature)."""
    from kafka_connect_storage_cloud_spark.llm.corpus import doc_truncation_loss

    rows = doc_truncation_loss(spark, sf_small).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert by_lang
    any_truncated = False
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["ctx_len"])
        for a, b in zip(rs, rs[1:]):
            assert a["truncated_share"] >= b["truncated_share"], lang
            assert a["lost_share"] >= b["lost_share"], lang
        for r in rs:
            assert 0 <= r["tokens_lost"] <= r["tokens_total"]
            assert r["n_truncated"] <= r["n_docs"]
        any_truncated |= rs[0]["n_truncated"] > 0
    assert any_truncated, "no candidate length truncates anything at this SF"


def test_quality_threshold_yield_monotone_and_splits(spark, sf_small):
    """A higher bar can only keep fewer docs/tokens, and the curve must
    actually separate somewhere inside the sweep (vacuous-curve lint)."""
    from kafka_connect_storage_cloud_spark.llm.quality import quality_threshold_yield

    rows = sorted(
        quality_threshold_yield(spark, sf_small).collect(),
        key=lambda r: r["threshold"],
    )
    assert len(rows) == 9
    for a, b in zip(rows, rows[1:]):
        assert a["n_kept"] >= b["n_kept"]
        assert a["tokens_kept"] >= b["tokens_kept"]
        assert a["n_docs"] == b["n_docs"]  # every doc in every group
    yields = {r["doc_yield"] for r in rows}
    assert len(yields) > 1, "yield curve is flat — thresholds sit outside the score range"


def test_dup_cluster_size_profile_accounts_for_every_doc(spark, sf_small):
    """Σ n_docs over the histogram == corpus size; removable == n_docs -
    n_clusters per row; and the corpus actually contains some k>=2 cluster
    (in-distribution)."""
    from kafka_connect_storage_cloud_spark.llm.clustering import (
        dup_cluster_size_profile,
    )

    rows = dup_cluster_size_profile(spark, sf_small).collect()
    n_docs_total = spark.read.parquet(f"{sf_small}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    for r in rows:
        assert r["removable_docs"] == r["n_docs"] - r["n_clusters"]
    assert any(r["cluster_size"] >= 2 for r in rows)
