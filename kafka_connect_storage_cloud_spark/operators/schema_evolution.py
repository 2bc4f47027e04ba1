"""Schema evolution/compatibility: Spark-first re-expression of the
connector's StorageSchemaCompatibility handling (storage-common, used by
TopicPartitionWriter: on a compatible schema change the current file rotates
and subsequent records are projected onto the new schema).

Spark mapping:
  BACKWARD (new reader reads old data) -> unionByName(allowMissingColumns):
    old-version records surface the added columns as NULL
  file-per-schema rotation             -> schema_version partition column
  projection of old records            -> select with null-filled columns
  reading mixed generations            -> spark.read.option(mergeSchema=true)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import read_events

V1_COLS = ("event_id", "ts", "user_id", "event_type")  # original schema
V2_ADDED = ("value", "props")  # columns added by the evolved schema


def split_generations(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Deterministically split events into two schema generations: even
    offsets were written before the evolution (v1, no value/props), odd
    offsets after (v2, full schema)."""
    ev = read_events(spark, sf_dir)
    v1 = ev.where(F.col("event_id") % 2 == 0).select(*V1_COLS)
    v2 = ev.where(F.col("event_id") % 2 == 1)
    return v1, v2


def evolve_backward(v1: DataFrame, v2: DataFrame) -> DataFrame:
    """BACKWARD-compatible merge: project v1 records onto the v2 schema with
    nulls for added columns, tagging each record's source schema version."""
    v1_tagged = v1.withColumn("schema_version", F.lit(1))
    v2_tagged = v2.withColumn("schema_version", F.lit(2))
    return v1_tagged.unionByName(v2_tagged, allowMissingColumns=True)


def schema_evolution_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form: merge both generations, report per-version record counts
    and null-rates of the added columns (v1 rows must be all-null there)."""
    v1, v2 = split_generations(spark, sf_dir)
    merged = evolve_backward(v1, v2)
    return (
        merged.groupBy("schema_version")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("null_values"),
            F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("null_props"),
            F.countDistinct("event_type").alias("n_event_types"),
        )
        .orderBy("schema_version")
    )


SQL_SCHEMA_EVOLUTION = """
WITH v1 AS (
  SELECT event_id, ts, user_id, event_type,
         CAST(NULL AS DOUBLE) AS "value", CAST(NULL AS VARCHAR) AS props,
         1 AS schema_version
  FROM events WHERE event_id % 2 = 0
),
v2 AS (
  SELECT event_id, ts, user_id, event_type, "value", props, 2 AS schema_version
  FROM events WHERE event_id % 2 = 1
),
merged AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT schema_version, COUNT(*) AS record_count,
       CAST(SUM(CASE WHEN "value" IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_values,
       CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
       COUNT(DISTINCT event_type) AS n_event_types
FROM merged GROUP BY schema_version ORDER BY schema_version
"""

ORACLES = {"schema_evolution": SQL_SCHEMA_EVOLUTION}
