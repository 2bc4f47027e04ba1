"""Skew helpers: salted transforms must be EXACTLY equivalent to their
unsalted forms (they change the physical distribution, never the result)."""

from pyspark.sql import functions as F

from kafka_connect_storage_cloud_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)
from kafka_connect_storage_cloud_spark.session import read_events, read_table


def test_salted_join_matches_plain_join(spark, sf_small):
    events = read_events(spark, sf_small).select("event_id", "user_id", "event_type")
    dim = (
        events.select("event_type").distinct()
        .withColumn("type_tag", F.upper("event_type"))
    )
    plain = events.join(dim, ["event_type"]).select("event_id", "type_tag")
    salted = salted_join(events, dim, ["event_type"]).select("event_id", "type_tag")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_count_distinct_is_exact(spark, sf_small):
    events = read_events(spark, sf_small)
    expected = {
        (r["event_type"],): r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        (r["event_type"],): r["distinct_user_id"]
        for r in salted_count_distinct(events, ["event_type"], "user_id").collect()
    }
    assert got == expected


def test_salted_join_spreads_hot_key(spark):
    """A 100%-skewed key (every row identical) must land in multiple salt
    groups — the property that breaks the single-task bottleneck."""
    hot = spark.range(10000).select(F.lit("hot").alias("k"), F.col("id"))
    n_groups = (
        hot.withColumn("s", F.pmod(F.xxhash64("k", "id"), F.lit(16)))
        .select("s")
        .distinct()
        .count()
    )
    assert n_groups == 16


def test_minhash_degenerate_bucket_guard(spark, tmp_path):
    """Mass-duplicate pathology: thousands of IDENTICAL documents collapse
    into one band bucket whose pair expansion would be quadratic. The
    MAX_BUCKET guard must drop that bucket from candidate generation
    (identical docs pair in EVERY band, so candidates vanish entirely),
    while normal-sized near-dup groups still produce their pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_connect_storage_cloud_spark.llm.dedup import (
        MAX_BUCKET,
        dedup_minhash_lsh,
    )

    n_mass = MAX_BUCKET + 100
    mass = ["the same boilerplate page text repeated verbatim many times over"] * n_mass
    near = [
        "a distinct document about spark shuffles and partitions number one",
        "a distinct document about spark shuffles and partitions number two",
    ]
    texts = mass + near
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["src0"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path / "massdup"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    pairs = dedup_minhash_lsh(spark, str(d)).collect()
    mass_pairs = [r for r in pairs if r["doc_a"] < n_mass and r["doc_b"] < n_mass]
    assert not mass_pairs, "degenerate bucket leaked quadratic candidates"
    near_ids = {n_mass, n_mass + 1}
    assert any(
        {r["doc_a"], r["doc_b"]} == near_ids for r in pairs
    ), "normal near-dup pair lost by the guard"


def test_fuzzy_degenerate_block_guard_and_short_names(spark, tmp_path):
    """Pathological key distribution: thousands of IDENTICAL customer names
    share every pigeonhole block key, so the block self-join would expand
    quadratically. The FUZZY_MAX_BLOCK guard must drop those blocks from
    candidate generation (recall degrades observably, the join never
    explodes a join) while a normal near-pair is still found. Short names
    must match too: the interleaved mod-5 pieces make the completeness
    proof hold at every length."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_connect_storage_cloud_spark.plans.warehouse import (
        FUZZY_MAX_BLOCK,
        fuzzy_name_matches,
    )

    n_mass = FUZZY_MAX_BLOCK + 100
    names = ["Customer#000IDENTICAL"] * n_mass  # nation 1: degenerate block
    nations = [1] * n_mass
    # nation 2: a normal 1-substitution pair (length >= 9)
    names += ["Customer#000000101", "Customer#000000102"]
    nations += [2, 2]
    # nation 3: short names (length 6), 1 substitution
    names += ["abcdef", "abcxef"]
    nations += [3, 3]
    tbl = pa.table(
        {
            "c_custkey": pa.array(range(len(names)), pa.int64()),
            "c_nationkey": pa.array(nations, pa.int64()),
            "c_name": pa.array(names),
        }
    )
    d = tmp_path / "fuzzydgen"
    d.mkdir()
    pq.write_table(tbl, str(d / "customer.parquet"))
    rows = fuzzy_name_matches(spark, str(d)).collect()
    by_nation = {r["nationkey"]: r for r in rows}
    assert 1 not in by_nation, "degenerate block leaked quadratic candidates"
    assert by_nation[2]["n_pairs"] == 1
    assert by_nation[3]["n_pairs"] == 1, "short-name pair missed by blocking"


def test_winnowing_degenerate_fp_bucket_guard(spark, tmp_path):
    """Mass-duplicate pathology for the FOURTH candidate generator
    (VERDICT r8 'Next round' #8, the test_minhash_degenerate_bucket_guard
    shape): thousands of IDENTICAL documents share every winnowed
    fingerprint, so each fp bucket exceeds MAX_BUCKET and the quadratic
    pair expansion must be dropped from candidate generation entirely —
    while a genuine shared-run pair in a normal-sized bucket still
    surfaces. Pinned on BOTH engines: the Spark generator and its DuckDB
    CTE twin must agree on the exact surviving pair set."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_connect_storage_cloud_spark.llm.dedup import (
        MAX_BUCKET,
        _docs_ws,
        _sql_winnow_cands,
        _winnow_fps_from_ws,
        _winnow_pairs_of,
    )

    n_mass = MAX_BUCKET + 100
    mass = ["the same boilerplate page text repeated verbatim many times over"] * n_mass
    near = [
        # shares a 9-word run >= K+W-1 = 6: a winnowed fingerprint is
        # GUARANTEED shared (the pigeonhole argument the op documents)
        "a distinct document about spark shuffles and partitions number one",
        "a distinct document about spark shuffles and partitions number two",
    ]
    texts = mass + near
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["src0"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path / "wmassdup"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    got = {
        (r["doc_a"], r["doc_b"])
        for r in _winnow_pairs_of(
            _winnow_fps_from_ws(_docs_ws(spark, str(d)))
        ).collect()
    }
    mass_pairs = {(a, b) for a, b in got if a < n_mass and b < n_mass}
    assert not mass_pairs, "degenerate fp bucket leaked quadratic candidates"
    assert (n_mass, n_mass + 1) in got, "normal shared-run pair lost by the guard"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    duck = {tuple(r) for r in con.sql(_sql_winnow_cands()).fetchall()}
    con.close()
    assert duck == got, "Spark and DuckDB winnowing guards diverge"


def test_simhash_packed_vote_long_doc_guard(spark):
    """Packed-vote saturation guard (VERDICT r9 'What's wrong' #1): the
    16-bit-field packing is exact only while a document has at most
    SIM_PACK_MAX_TOKENS (32,767) tokens — the int64 SUM of the top
    2^48-weighted field wraps first, BEFORE the 16-bit field capacity.
    A longer document must fail LOUDLY (raise_error) instead of silently
    corrupting its signature, and a document just under the bound must
    produce the exact unpacked majority-vote signature."""
    import pytest
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.functions import hashing as H
    from kafka_connect_storage_cloud_spark.llm.dedup import (
        SIM_BITS,
        SIM_PACK_MAX_TOKENS,
        _simhash_signatures_from_ws,
    )

    assert SIM_PACK_MAX_TOKENS == (2**63 - 1) // (2**48 + 2**32 + 2**16 + 1)

    # a vocabulary small enough that per-bit votes are adversarial, big
    # enough that ws arrays stress real aggregation (not a 1-token doc)
    vocab = [f"tok{i}" for i in range(7)]

    def ws_doc(doc_id: int, n_tokens: int):
        return (doc_id, [vocab[i % len(vocab)] for i in range(n_tokens)])

    ok = spark.createDataFrame(
        [ws_doc(1, 1000), ws_doc(2, 31)], "doc_id long, ws array<string>"
    )
    got = {r["doc_id"]: r["simhash"] for r in _simhash_signatures_from_ws(ok).collect()}

    # unpacked reference: per-bit ones counts via the engine's own h60
    toks = ok.select("doc_id", F.explode("ws").alias("w")).select(
        "doc_id", H.h60(F.col("w")).alias("h")
    )
    ref_agg = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.expr(f"shiftright(h, {j}) & 1")).alias(f"c{j}")
            for j in range(SIM_BITS)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    expected = {}
    for r in ref_agg.collect():
        sig = sum((1 << j) for j in range(SIM_BITS) if r[f"c{j}"] * 2 > r["n"])
        expected[r["doc_id"]] = sig
    assert got == expected, "packed signature diverged from unpacked majority vote"

    # over the bound: loud failure, not corruption. DISTINCT tokens keep
    # every per-bit ones-count near n/2, so the int64 SUM cannot hit
    # Spark's own ANSI ARITHMETIC_OVERFLOW — this is exactly the silent-
    # corruption regime (field-to-field carry) the guard exists for.
    too_long = spark.createDataFrame(
        [(9, [f"t{i}" for i in range(SIM_PACK_MAX_TOKENS + 1)])],
        "doc_id long, ws array<string>",
    )
    with pytest.raises(Exception, match="simhash packed-vote overflow"):
        _simhash_signatures_from_ws(too_long).collect()
