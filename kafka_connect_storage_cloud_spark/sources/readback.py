"""Consumer-side read-back of connector-written layouts.

A connector run (batch or streaming) lands Hive-partitioned files under
<path>/encoded_partition=<value>/... — possibly across multiple runs whose
record schemas evolved (schema.compatibility BACKWARD: later files add
columns). This reader is what a downstream Spark job should use:

- partition discovery keeps encoded_partition as a queryable column, and a
  filter on it prunes directories at PLANNING time (no S3 listing/read of
  untouched partitions — asserted by tests/test_sinks.py's pruning gate);
- mergeSchema unions evolved file schemas: old files surface the added
  columns as NULL, the BACKWARD semantics of the reference's
  schema.compatibility (storage-common SchemaCompatibility);
- the manifest sidecar (`_manifest/`, underscore-hidden from the data scan)
  is exposed separately for audit joins.

At scale: mergeSchema reads every file footer on first resolution — for
10⁶-file layouts, pass a user schema (schema=) instead, or maintain the
union schema in a catalog; partition pruning applies either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_connector_output(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    merge_schema: bool = True,
) -> DataFrame:
    """Read a connector output dataset with partition discovery and evolved
    schemas merged (added columns are NULL on pre-evolution files)."""
    if fmt == "avro":
        # spark-avro when available; otherwise the distributed pure-Python
        # container reader (tasks parse their own files — driver sees paths)
        try:
            return spark.read.format("avro").load(path)
        except Exception:
            from ..sinks.avro_py import read_avro_distributed

            return read_avro_distributed(spark, path)
    reader = spark.read.format(fmt)
    if merge_schema and fmt == "parquet":
        reader = reader.option("mergeSchema", "true")
    return reader.load(path)


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """The persisted commit manifest for a connector output dataset."""
    return spark.read.json(f"{path}/_manifest")
