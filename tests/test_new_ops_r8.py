"""Round-8 operator tests: winnowing fingerprints (guarantee property +
corpus sanity) and the multi-lag ACF profile (numpy recomputation)."""

import pyspark.sql.functions as F


def test_winnowing_guarantee_shared_run_yields_shared_fp(spark, tmp_path):
    """Schleimer et al.'s winnowing guarantee: two documents sharing a
    token run of length >= K+W-1 (= 6 here) must select at least one
    COMMON fingerprint — the property that makes winnowing a detection
    floor rather than a probabilistic signal."""
    from kafka_connect_storage_cloud_spark.llm.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnowing_fingerprints,
    )

    run = "alpha beta gamma delta epsilon zeta"  # K+W-1 = 6 shared tokens
    rows = [
        (1, f"one two three {run} four five six", "en", "src1", 60),
        (2, f"seven eight nine ten {run} eleven", "en", "src1", 60),
        (3, "completely different words with no overlap at all here", "en", "src1", 55),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    dst = str(tmp_path / "winnow_sf")
    df.write.parquet(f"{dst}/documents.parquet")
    out = {r["doc_id"]: r for r in winnowing_fingerprints(spark, dst).collect()}
    assert len(run.split()) == WINNOW_K + WINNOW_W - 1
    # docs 1 and 2 share the run -> each must report >= 1 shared fp
    assert out[1]["n_shared"] >= 1
    assert out[2]["n_shared"] >= 1
    # every doc selects at least one fingerprint per window block
    for r in out.values():
        assert 1 <= r["n_fp"] <= r["n_windows"]
        assert 0.0 < r["fp_density"] <= 1.0


def test_winnowing_density_near_theory(spark, sf_small):
    """On random-ish text the expected winnowing density is 2/(W+1) = 0.4;
    the corpus mean must sit in a loose band around it (far from the 0
    and 1 degeneracies that would mean the window logic broke)."""
    from kafka_connect_storage_cloud_spark.llm.dedup import winnowing_fingerprints

    rows = winnowing_fingerprints(spark, sf_small).collect()
    assert rows
    mean_density = sum(r["fp_density"] for r in rows) / len(rows)
    assert 0.2 < mean_density < 0.8, mean_density


def test_acf_profile_matches_numpy(spark, sf_small):
    """Pearson r at each lag recomputed with numpy from the raw hourly
    pairs (hours present in the series, same estimator) — guards the
    fan-out join and the fixed-order final expression."""
    import math

    from kafka_connect_storage_cloud_spark.plans.warehouse import (
        ACF_LAGS,
        events_acf_profile,
    )
    from kafka_connect_storage_cloud_spark.session import read_events

    got = {
        (r["event_type"], r["lag"]): (r["n"], r["acf"])
        for r in events_acf_profile(spark, sf_small).collect()
    }
    assert got
    ev = read_events(spark, sf_small).select("event_type", "ts").collect()
    series: dict = {}
    for r in ev:
        hr = int(r["ts"].timestamp() * 1000) // 3600000
        series.setdefault(r["event_type"], {}).setdefault(hr, 0)
        series[r["event_type"]][hr] += 1
    for (et, lag), (n, acf) in got.items():
        s = series[et]
        pairs = [(y, s[h + lag]) for h, y in s.items() if h + lag in s]
        assert len(pairs) == n, (et, lag)
        sa = sum(a for a, _ in pairs); sb = sum(b for _, b in pairs)
        sab = sum(a * b for a, b in pairs)
        saa = sum(a * a for a, _ in pairs); sbb = sum(b * b for _, b in pairs)
        num = n * sab - sa * sb
        da, db = n * saa - sa * sa, n * sbb - sb * sb
        exp = math.floor((num / (math.sqrt(da) * math.sqrt(db))) * 1e6 + 0.5) / 1e6
        assert acf == exp, (et, lag, acf, exp)
    # every lag 1..ACF_LAGS is present for at least one type
    assert {lag for _, lag in got} == set(range(1, ACF_LAGS + 1))


def test_theil_sen_robust_to_outlier_day(spark, sf_small):
    """Exact recompute of the median-of-pairwise-slopes from the raw daily
    series (same (slope, x1, x2) order, same even/odd median rule) —
    guards the pair join, the rank tiebreak, and the two-row average."""
    import math

    from kafka_connect_storage_cloud_spark.plans.warehouse import events_theil_sen
    from kafka_connect_storage_cloud_spark.session import read_events

    rows = {r["event_type"]: r for r in events_theil_sen(spark, sf_small).collect()}
    assert rows
    # exact recompute: median of pairwise slopes from the raw daily series
    ev = read_events(spark, sf_small).select("event_type", F.to_date("ts").alias("d")).collect()
    import datetime
    base = datetime.date(2024, 1, 1)
    daily: dict = {}
    for r in ev:
        x = (r["d"] - base).days
        daily.setdefault(r["event_type"], {}).setdefault(x, 0)
        daily[r["event_type"]][x] += 1
    for et, series in daily.items():
        xs = sorted(series)
        slopes = sorted(
            ((series[x2] - series[x1]) / (x2 - x1), x1, x2)
            for i, x1 in enumerate(xs) for x2 in xs[i + 1:]
        )
        if not slopes:
            assert et not in rows
            continue
        m = len(slopes)
        lo, hi = slopes[(m + 1) // 2 - 1][0], slopes[(m + 2) // 2 - 1][0]
        exp = math.floor(((lo + hi) / 2) * 1e6 + 0.5) / 1e6
        assert rows[et]["n_pairs"] == m
        assert rows[et]["theil_sen_slope"] == exp, et


def test_shard_checksums_align_with_pack_and_detect_change(spark, sf_small, tmp_path):
    """(1) The checksum manifest's (worker, shard, n_docs, shard_tokens)
    must agree exactly with token_shard_pack's (same assignment window);
    (2) re-running produces identical checksums (deterministic); (3) a
    one-character change in one document flips exactly that shard's
    checksum and no other."""
    from kafka_connect_storage_cloud_spark.llm.corpus import (
        shard_checksum_manifest,
        token_shard_pack,
    )

    chk = {(r["worker"], r["shard"]): r for r in shard_checksum_manifest(spark, sf_small).collect()}
    pack = {(r["worker"], r["shard"]): r for r in token_shard_pack(spark, sf_small).collect()}
    assert set(chk) == set(pack)
    for k, r in chk.items():
        assert (r["n_docs"], r["shard_tokens"]) == (pack[k]["n_docs"], pack[k]["shard_tokens"]), k
    chk2 = {(r["worker"], r["shard"]): r["checksum"]
            for r in shard_checksum_manifest(spark, sf_small).collect()}
    assert chk2 == {k: r["checksum"] for k, r in chk.items()}
    # mutate one doc's text in a copied corpus: only its shard's checksum moves
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    victim = docs.select("doc_id").orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == victim, F.concat(F.col("text"), F.lit("X"))).otherwise(
            F.col("text")
        ),
    )
    dst = str(tmp_path / "mut_sf")
    mutated.write.parquet(f"{dst}/documents.parquet")
    chk_mut = {(r["worker"], r["shard"]): r["checksum"]
               for r in shard_checksum_manifest(spark, dst).collect()}
    diffs = [k for k in chk if chk_mut.get(k) != chk[k]["checksum"]]
    assert len(diffs) == 1, diffs


def test_t_closeness_exact_tvd_and_flag_splits(spark, sf_small):
    """TVD per class recomputed exactly from raw counts (same per-term
    1e-9 quantization), and the at_risk flag must SPLIT on the corpus
    (not vacuously all-0/all-1) — the round-3 flag rule."""
    import math

    from kafka_connect_storage_cloud_spark.llm.corpus import (
        T_CLOSE,
        t_closeness_audit,
    )
    from kafka_connect_storage_cloud_spark.session import read_table

    got = {(r["lang"], r["len_decile"]): r for r in t_closeness_audit(spark, sf_small).collect()}
    assert got
    docs = read_table(spark, sf_small, "documents").select("lang", "source", "n_chars").collect()
    cells: dict = {}
    for r in docs:
        key = (r["lang"], min(r["n_chars"] // 100, 9), r["source"])
        cells[key] = cells.get(key, 0) + 1
    g: dict = {}
    for (_, _, s), c in cells.items():
        g[s] = g.get(s, 0) + c
    N = sum(g.values())
    classes: dict = {}
    for (lang, dec, s), c in cells.items():
        classes.setdefault((lang, dec), {})[s] = c
    flags = set()
    for key, members in classes.items():
        n = sum(members.values())
        nano = sum(
            math.floor(
                abs(float(members.get(s, 0)) * float(N) - float(gs) * float(n))
                / (2.0 * float(n) * float(N)) * 1e9 + 0.5
            )
            for s, gs in g.items()
        )
        exp_tvd = math.floor((nano / 1e9) * 1e6 + 0.5) / 1e6
        assert got[key]["class_size"] == n, key
        assert got[key]["tvd_source"] == exp_tvd, key
        assert got[key]["at_risk"] == int(nano > int(T_CLOSE * 1e9)), key
        flags.add(got[key]["at_risk"])
    assert flags == {0, 1}, f"at_risk vacuous: {flags}"


def test_hybrid_agreement_bounds(spark, sf_small):
    """Structural invariants: n_common <= min(k, n_lex_emb) (an agreed hit
    must be an embedded lexical hit), overlap <= agreement_ceiling, and
    sem_rank_top_lex is 0 only when the lexical #1 has no embedding."""
    from kafka_connect_storage_cloud_spark.llm.retrieval import (
        BM25_TOPK,
        bm25_topk,
        hybrid_retrieval_agreement,
    )
    from kafka_connect_storage_cloud_spark.session import read_table

    rows = hybrid_retrieval_agreement(spark, sf_small).collect()
    assert rows
    emb_ids = {
        r["vec_id"]
        for r in read_table(spark, sf_small, "embeddings").select("vec_id").collect()
    }
    top_lex = {
        r["qid"]: r["doc_id"]
        for r in bm25_topk(spark, sf_small).collect()
        if r["rk"] == 1
    }
    for r in rows:
        assert r["n_lex"] <= BM25_TOPK
        assert r["n_common"] <= min(BM25_TOPK, r["n_lex_emb"])
        assert r["overlap"] <= r["agreement_ceiling"] + 1e-9
        has_emb = top_lex[r["qid"]] in emb_ids
        assert (r["sem_rank_top_lex"] > 0) == has_emb, r["qid"]
