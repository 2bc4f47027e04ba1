"""Bucketed-table sink: pre-shuffled, co-located storage for the fact tables
that join repeatedly at scale.

At 100 TB the dominant cost of orders ⋈ lineitem is the shuffle of both
sides on the join key — every query pays it again. Bucketing pays the
shuffle once at write time: both tables hash-partitioned into the same
number of buckets on the join key (and sorted within buckets), so every
subsequent join is a zero-exchange sort-merge of aligned buckets. This is
Spark's counterpart of the co-located table layouts a warehouse engine
would use, and the write-side analog of the connector's deterministic
partition layout (the bucket file set is stable under replay via
dynamic-partition overwrite semantics).

Bucket-count sizing at scale: buckets ≈ table_size / target_partition_size
(128-256 MB post-compression), rounded to a multiple of the cluster's
executor-core count so every core owns whole buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
    fmt: str = "parquet",
) -> None:
    """Persist df as an external bucketed table, bucketed AND sorted by
    bucket_col so downstream equi-joins/aggregations on that column need
    neither an exchange nor a sort."""
    (
        df.write.mode("overwrite")
        .format(fmt)
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on)
