"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched mapInPandas.

The decode step itself is STUBBED (image/audio libraries are not in this
container): `decode_image_stub` produces a deterministic fake feature vector
from the bytes. Everything Spark-side is real and tested — schema, binary
column handling, batch iteration, partition-preserving mapInPandas — so a
real decoder drops in by replacing one function.

Scale notes: payloads stay in the `binary` column end-to-end (no base64
blowup); mapInPandas streams Arrow batches so peak memory is one batch, not
one partition; metadata filters (mime/width) are plain columns that still
push down to parquet.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..session import read_table

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table: document text bytes as the opaque
    payload + typed metadata. Stands in for an image/audio parquet."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/png")).otherwise(F.lit("audio/wav")).alias("mime"),
        (F.col("doc_id") % 640 + 32).cast("long").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("long").alias("height"),
        F.length(F.col("text")).cast("long").alias("n_bytes"),
    )


def decode_image_stub(payload: bytes) -> list[float]:
    """STUB decoder — replace with PIL/torchvision/ffmpeg in production.
    Deterministic fake: 4 features from byte statistics."""
    if payload is None:
        raise NotImplementedError("real decode requires an image library; got null payload")
    n = len(payload)
    return [
        float(n),
        float(payload[0]) if n else 0.0,
        float(payload[-1]) if n else 0.0,
        float(sum(payload[:64]) % 997),
    ]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. The UDF sees
    pandas batches (never whole partitions); output schema is fixed."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": [decode_image_stub(p) for p in pdf["payload"]],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: synth media -> filter on metadata (pushdown-friendly) ->
    Arrow-batched decode -> per-mime feature aggregate."""
    media = synth_media(spark, sf_dir).where(F.col("n_bytes") > 0)
    feats = extract_features(media)
    return (
        feats.select(
            "media_id",
            "mime",
            "n_bytes",
            F.round(F.element_at("feature", 4).cast("double"), 1).alias("checksum_feature"),
        )
    )


RESIZE_W = 16
RESIZE_H = 16

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
        StructField("out_bytes", LongType()),
        StructField("checksum", LongType()),
    ]
)


def resize_stub(payload: bytes, w: int, h: int) -> bytes:
    """STUB resize — replace with PIL `Image.resize` in production.
    Deterministic fake: nearest-neighbor 1-D resample of the byte stream to
    w*h samples (idx(i) = floor(i*n/m)), which is exactly what NN resize
    does per raster row."""
    n = len(payload)
    m = w * h
    if n == 0:
        return b""
    return bytes(payload[(i * n) // m] for i in range(m))


def resize_media(media: DataFrame, w: int = RESIZE_W, h: int = RESIZE_H) -> DataFrame:
    """Arrow-batched resize over the binary column. The resized payload
    stays binary end-to-end; the query surface exposes its checksum so the
    byte-level result is value-checked without shipping blobs to the driver."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [resize_stub(p, w, h) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": w,
                    "out_h": h,
                    "out_bytes": [len(r) for r in resized],
                    "checksum": [sum(r) % 997 for r in resized],
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-path rows only (mime filter is a plain column predicate that
    reaches the scan), resized to RESIZE_W x RESIZE_H via the stub."""
    media = synth_media(spark, sf_dir).where(
        (F.col("mime") == "image/png") & (F.col("n_bytes") > 0)
    )
    return resize_media(media)


FRAME_BYTES = 32
FRAME_STRIDE = 4

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)


def frame_sample(media: DataFrame, frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE) -> DataFrame:
    """STUB video/audio frame sampler — replace the chunking with ffmpeg
    keyframe extraction in production. Deterministic fake: the payload is a
    sequence of `frame_bytes`-sized frames; every `stride`-th frame is
    emitted as its own row. Row-multiplying mapInPandas: one input row
    yields ceil(n_frames/stride) output rows, streamed per Arrow batch so
    peak memory is one batch of frames, never a whole video."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n_frames = len(p) // frame_bytes
                for f in range(0, n_frames, stride):
                    ids.append(mid)
                    idxs.append(f)
                    sums.append(sum(p[f * frame_bytes : (f + 1) * frame_bytes]) % 997)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_checksum": sums})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio/video-path rows only; every FRAME_STRIDE-th FRAME_BYTES frame."""
    media = synth_media(spark, sf_dir).where(F.col("mime") == "audio/wav")
    return frame_sample(media)


SAMPLE_BYTES = 2  # 16-bit PCM
RESAMPLE_R = 2  # 16 kHz -> 8 kHz decimation
OUT_RATE = 8000

RESAMPLED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("in_samples", LongType()),
        StructField("out_samples", LongType()),
        StructField("out_rate", LongType()),
        StructField("checksum", LongType()),
    ]
)


def resample_stub(payload: bytes, r: int = RESAMPLE_R) -> bytes:
    """STUB audio resample — replace with scipy/soxr in production.
    Deterministic fake: decimate the 16-bit PCM stream by r (keep every
    r-th 2-byte sample), the zero-order-hold downsample."""
    n_samples = len(payload) // SAMPLE_BYTES
    out = bytearray()
    for j in range(n_samples // r):
        s = j * r * SAMPLE_BYTES
        out += payload[s : s + SAMPLE_BYTES]
    return bytes(out)


def resample_media(media: DataFrame, r: int = RESAMPLE_R) -> DataFrame:
    """Arrow-batched PCM decimation over the binary column; emits sample
    counts + checksum so the byte-level result is value-checked."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = [resample_stub(p, r) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "in_samples": [len(p) // SAMPLE_BYTES for p in pdf["payload"]],
                    "out_samples": [len(o) // SAMPLE_BYTES for o in outs],
                    "out_rate": OUT_RATE,
                    "checksum": [sum(o) % 997 for o in outs],
                }
            )

    return media.mapInPandas(run, schema=RESAMPLED_SCHEMA)


def multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio rows only (mime predicate reaches the scan); 2x PCM decimation
    via the stub — the audio twin of multimodal_resize."""
    media = synth_media(spark, sf_dir).where(
        (F.col("mime") == "audio/wav") & (F.col("n_bytes") >= SAMPLE_BYTES * RESAMPLE_R)
    )
    return resample_media(media)


# Decimation keeps bytes [j*r*2+1, j*r*2+2] (1-based) for j in 0..n//2//r-1.
SQL_MULTIMODAL_AUDIO_RESAMPLE = f"""
SELECT doc_id AS media_id,
       len(text) // {SAMPLE_BYTES} AS in_samples,
       (len(text) // {SAMPLE_BYTES}) // {RESAMPLE_R} AS out_samples,
       CAST({OUT_RATE} AS BIGINT) AS out_rate,
       CAST(list_sum([ascii(substr(text,
                        CAST((k // {SAMPLE_BYTES}) * {RESAMPLE_R * SAMPLE_BYTES}
                             + (k % {SAMPLE_BYTES}) + 1 AS INT), 1))
                      for k in generate_series(0, (len(text) // {SAMPLE_BYTES}) // {RESAMPLE_R} * {SAMPLE_BYTES} - 1)])
            % 997 AS BIGINT) AS checksum
FROM documents
WHERE doc_id % 2 = 1 AND len(text) >= {SAMPLE_BYTES * RESAMPLE_R}
ORDER BY media_id
"""

# Oracle: the stub's 4th feature = sum(first 64 bytes) % 997 on utf-8 text
# (ASCII here, so ord == byte value).
SQL_MULTIMODAL = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
       len(text) AS n_bytes,
       ROUND(CAST(list_sum(list_transform(
           [substr(text, i, 1) for i in generate_series(1, LEAST(len(text), 64))],
           c -> ascii(c))) % 997 AS DOUBLE), 1) AS checksum_feature
FROM documents
WHERE len(text) > 0
ORDER BY media_id
"""

# Same nearest-neighbor index arithmetic ((i*n)//m, 0-based) over the utf-8
# text bytes; DuckDB // is integer division on BIGINTs.
SQL_MULTIMODAL_RESIZE = f"""
SELECT doc_id AS media_id,
       CAST({RESIZE_W} AS BIGINT) AS out_w,
       CAST({RESIZE_H} AS BIGINT) AS out_h,
       CAST({RESIZE_W * RESIZE_H} AS BIGINT) AS out_bytes,
       CAST(list_sum([ascii(substr(text, CAST((i * len(text)) // {RESIZE_W * RESIZE_H} AS INT) + 1, 1))
                      for i in generate_series(0, {RESIZE_W * RESIZE_H - 1})]) % 997 AS BIGINT) AS checksum
FROM documents
WHERE doc_id % 2 = 0 AND len(text) > 0
ORDER BY media_id
"""

SQL_MULTIMODAL_FRAMES = f"""
SELECT doc_id AS media_id,
       f AS frame_idx,
       CAST(list_sum([ascii(substr(text, CAST(f * {FRAME_BYTES} + i AS INT), 1))
                      for i in generate_series(1, {FRAME_BYTES})]) % 997 AS BIGINT) AS frame_checksum
FROM documents,
     LATERAL (SELECT unnest(generate_series(0, len(text) // {FRAME_BYTES} - 1)) AS f)
WHERE doc_id % 2 = 1 AND f % {FRAME_STRIDE} = 0
ORDER BY media_id, frame_idx
"""

ORACLES = {
    "multimodal_pipeline": SQL_MULTIMODAL,
    "multimodal_resize": SQL_MULTIMODAL_RESIZE,
    "multimodal_frame_sample": SQL_MULTIMODAL_FRAMES,
    "multimodal_audio_resample": SQL_MULTIMODAL_AUDIO_RESAMPLE,
}


# ---------------------------------------------------------------------------
# Byte-level payload near-dup — the one dedup that needs NO decoder: raw
# payload bytes are chunked, chunk digests minhashed, candidates banded and
# confirmed by exact chunk-set Jaccard. Works on any modality today (the
# decode stub is irrelevant here), which is exactly how multimodal corpora
# get deduped before anyone pays for decoding.
# ---------------------------------------------------------------------------

MMD_CHUNK = 32  # bytes per chunk
MMD_PERMS = 8
MMD_BANDS = 4  # 2 rows per band
MMD_TAU = 0.5  # exact chunk-set Jaccard confirm bar
MMD_MAX_BUCKET = 64  # degenerate band-bucket guard (boilerplate floods)


def _mmd_chunks(media: DataFrame) -> DataFrame:
    """(media_id, mime, h): distinct 32-bit chunk digests of each payload's
    MMD_CHUNK-byte windows — digests computed on the BINARY column."""
    from ..functions import hashing as H

    n_chunks = F.floor((F.col("n_bytes") - 1) / MMD_CHUNK)
    hexd = F.expr(
        f"md5(substring(payload, i * {MMD_CHUNK} + 1, {MMD_CHUNK}))"
    )
    return (
        media.withColumn("i", F.explode(F.sequence(F.lit(0), n_chunks)))
        .select(
            "media_id",
            "mime",
            F.conv(F.substring(hexd, 1, 8), 16, 10).cast("bigint").alias("h"),
        )
        .distinct()
    )


def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate payloads per mime: minhash (MMD_PERMS portable perms)
    over byte-chunk digests, MMD_BANDS OR-ed 2-row bands for candidates,
    exact chunk-set Jaccard >= MMD_TAU confirm. Identical plan shape to the
    text dedup_minhash_lsh (signature projection, band equi-join, bounded
    buckets) but driven entirely from the binary column."""
    from ..functions import hashing as H

    media = synth_media(spark, sf_dir).where(F.col("n_bytes") > 0)
    chunks = _mmd_chunks(media).localCheckpoint()
    mins = [
        F.min(
            H.h32(F.concat(F.lit(f"mmp{j}:"), F.col("h").cast("string")))
        ).alias(f"mh{j}")
        for j in range(MMD_PERMS)
    ]
    sig = chunks.groupBy("media_id", "mime").agg(*mins)
    bands = sig.select(
        "media_id",
        "mime",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ":", F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}")
                        ).alias("bval"),
                    )
                    for b in range(MMD_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "mime", F.col("bk.band").alias("band"), F.col("bk.bval").alias("bval"))
    sizes = bands.groupBy("mime", "band", "bval").agg(F.count(F.lit(1)).alias("bn"))
    # broadcast the OVERSIZED keys (tiny by pigeonhole) as an anti-join —
    # the ok complement is corpus-sized and must never be a forced broadcast
    big = sizes.where(F.col("bn") > MMD_MAX_BUCKET).select("mime", "band", "bval")
    bands_ok = bands.join(F.broadcast(big), ["mime", "band", "bval"], "left_anti")
    a = bands_ok.select("mime", "band", "bval", F.col("media_id").alias("media_a"))
    b = bands_ok.select("mime", "band", "bval", F.col("media_id").alias("media_b"))
    cand = (
        a.join(b, ["mime", "band", "bval"])
        .where(F.col("media_a") < F.col("media_b"))
        .select("mime", "media_a", "media_b")
        .distinct()
    )
    ca = chunks.select(F.col("media_id").alias("media_a"), F.col("h").alias("ha"))
    cb = chunks.select(F.col("media_id").alias("media_b"), F.col("h").alias("hb"))
    inter = (
        cand.join(ca, "media_a")
        .join(cb, "media_b")
        .where(F.col("ha") == F.col("hb"))
        .groupBy("mime", "media_a", "media_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes_m = chunks.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_ch"))
    sa = sizes_m.select(F.col("media_id").alias("media_a"), F.col("n_ch").alias("na"))
    sb = sizes_m.select(F.col("media_id").alias("media_b"), F.col("n_ch").alias("nb"))
    jac = (
        F.floor(
            (F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"))
            * 1000000.0
            + F.lit(0.5)
        )
        / 1000000.0
    )
    return (
        cand.join(inter, ["mime", "media_a", "media_b"], "left")
        .join(sa, "media_a")
        .join(sb, "media_b")
        .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0)))
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= MMD_TAU)
        .select("mime", "media_a", "media_b", F.col("n_inter").cast("long").alias("n_shared_chunks"), "jaccard")
        .orderBy("mime", "media_a", "media_b")
    )


def _sql_mmd() -> str:
    """DuckDB twin: the synthetic payload is encode(text) and the corpus is
    ASCII, so byte-windows of the payload == char-windows of the text and
    the md5 digests are identical."""
    from ..functions import hashing as H

    perms = ",\n         ".join(
        "MIN("
        + H.sql_h32(f"'mmp{j}:' || CAST(h AS VARCHAR)")
        + f") AS mh{j}"
        for j in range(MMD_PERMS)
    )
    band_rows = "\n  UNION ALL ".join(
        f"SELECT media_id, mime, {b} AS band, CAST(mh{2 * b} AS VARCHAR) || ':' || CAST(mh{2 * b + 1} AS VARCHAR) AS bval FROM sig"
        for b in range(MMD_BANDS)
    )
    return f"""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
         text, len(text) AS n_bytes
  FROM documents WHERE len(text) > 0
),
chunks AS (
  SELECT DISTINCT media_id, mime,
         CAST(('0x' || substr(md5(substring(text, i * {MMD_CHUNK} + 1, {MMD_CHUNK})), 1, 8)) AS BIGINT) AS h
  FROM (SELECT *, UNNEST(generate_series(0, CAST(floor((n_bytes - 1) / {MMD_CHUNK}) AS BIGINT))) AS i FROM media)
),
sig AS (
  SELECT media_id, mime,
         {perms}
  FROM chunks GROUP BY media_id, mime
),
bands AS (
  {band_rows}
),
bucket_sizes AS (SELECT mime, band, bval, COUNT(*) AS bn FROM bands GROUP BY 1, 2, 3),
bands_ok AS (
  SELECT b.* FROM bands b JOIN bucket_sizes s USING (mime, band, bval) WHERE s.bn <= {MMD_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.mime, a.media_id AS media_a, b.media_id AS media_b
  FROM bands_ok a JOIN bands_ok b
    ON a.mime = b.mime AND a.band = b.band AND a.bval = b.bval AND a.media_id < b.media_id
),
inter AS (
  SELECT c.mime, c.media_a, c.media_b, COUNT(*) AS n_inter
  FROM cand c JOIN chunks ca ON ca.media_id = c.media_a
              JOIN chunks cb ON cb.media_id = c.media_b AND ca.h = cb.h
  GROUP BY 1, 2, 3
),
sizes AS (SELECT media_id, COUNT(*) AS n_ch FROM chunks GROUP BY 1)
SELECT c.mime, c.media_a, c.media_b,
       CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_shared_chunks,
       (floor((CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
             / (sa.n_ch + sb.n_ch - COALESCE(i.n_inter, 0))) * 1000000.0 + 0.5) / 1000000.0) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.mime = c.mime AND i.media_a = c.media_a AND i.media_b = c.media_b
JOIN sizes sa ON sa.media_id = c.media_a
JOIN sizes sb ON sb.media_id = c.media_b
WHERE (floor((CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
            / (sa.n_ch + sb.n_ch - COALESCE(i.n_inter, 0))) * 1000000.0 + 0.5) / 1000000.0) >= {MMD_TAU}
ORDER BY c.mime, c.media_a, c.media_b
"""


ORACLES["multimodal_payload_dedup"] = _sql_mmd()
