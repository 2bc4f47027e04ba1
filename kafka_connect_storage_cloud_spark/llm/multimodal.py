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

ORACLES = {"multimodal_pipeline": SQL_MULTIMODAL}
