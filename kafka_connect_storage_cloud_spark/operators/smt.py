"""Single Message Transforms (SMTs) — the record-transform chain the Kafka
Connect runtime applies before a sink connector sees records (public Connect
API: org.apache.kafka.connect.transforms.*; the reference connector is
deployed behind exactly this chain, configured via `transforms=` properties).

Spark-first mapping: every SMT is a pure Column expression over the
SinkRecord frame — the whole chain composes into one projection inside
whole-stage codegen, zero shuffle, batch- and streaming-safe.

Supported (the transforms storage-sink deployments actually use):
  InsertField$Value   static field / kafka metadata (topic,partition,offset,ts)
  ExtractField$Value  pull one field out of the JSON value payload
  MaskField$Key       redact the record key
  TimestampRouter     topic := format(topic, record timestamp)
  RegexRouter         topic := regex_replace(topic)
  Filter (+ RecordIsTombstone predicate) drop/keep tombstones
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.topic import events_as_topic

# Connect's SimpleDateFormat letters -> Spark/DuckDB strftime-compatible
_SDF_TO_SPARK = ("yyyyMMdd", "yyyyMMdd")  # we support the common daily format


def _joda_daily(ts: Column) -> Column:
    return F.date_format(ts, "yyyyMMdd")


def apply_smt_chain(records: DataFrame, props: dict[str, str]) -> DataFrame:
    """Apply a Connect-style `transforms=` chain, in declared order. Each
    transform rewrites columns of the SinkRecord frame; the result is still a
    SinkRecord frame (composability — exactly the runtime contract)."""
    chain = [t.strip() for t in props.get("transforms", "").split(",") if t.strip()]
    df = records
    for name in chain:
        p = f"transforms.{name}."
        ttype = props[p + "type"]
        if ttype.endswith("InsertField$Value"):
            # kafka-metadata and static fields land as typed sibling columns
            # (the flattened form of the struct the runtime would build)
            if p + "topic.field" in props:
                df = df.withColumn(props[p + "topic.field"], F.col("topic"))
            if p + "partition.field" in props:
                df = df.withColumn(props[p + "partition.field"], F.col("kafka_partition"))
            if p + "offset.field" in props:
                df = df.withColumn(props[p + "offset.field"], F.col("offset"))
            if p + "timestamp.field" in props:
                df = df.withColumn(props[p + "timestamp.field"], F.col("timestamp"))
            if p + "static.field" in props:
                df = df.withColumn(
                    props[p + "static.field"], F.lit(props[p + "static.value"])
                )
        elif ttype.endswith("ExtractField$Value"):
            field = props[p + "field"]
            df = df.withColumn(
                field, F.get_json_object(F.col("value"), f"$.{field}").cast("bigint")
            )
        elif ttype.endswith("MaskField$Key"):
            df = df.withColumn(
                "key", F.when(F.col("key").isNotNull(), F.lit("****"))
            )
        elif ttype.endswith("TimestampRouter"):
            fmt = props.get(p + "topic.format", "${topic}-${timestamp}")
            routed = fmt.replace("${topic}", "', topic, '").replace(
                "${timestamp}", "', date_format(timestamp, 'yyyyMMdd'), '"
            )
            df = df.withColumn("topic", F.expr(f"concat('{routed}')"))
        elif ttype.endswith("RegexRouter"):
            df = df.withColumn(
                "topic",
                F.regexp_replace(
                    F.col("topic"), props[p + "regex"], props[p + "replacement"]
                ),
            )
        elif ttype.endswith("Filter"):
            # with the RecordIsTombstone predicate: drop null-value records
            df = df.where(F.col("value").isNotNull())
        else:
            raise ValueError(f"unsupported SMT type: {ttype}")
    return df


CANONICAL_SMT_PROPS = {
    "transforms": "extract,insert,mask,route,drop",
    "transforms.extract.type": "org.apache.kafka.connect.transforms.ExtractField$Value",
    "transforms.extract.field": "k",
    "transforms.insert.type": "org.apache.kafka.connect.transforms.InsertField$Value",
    "transforms.insert.offset.field": "kafka_offset",
    "transforms.insert.partition.field": "kafka_part",
    "transforms.insert.static.field": "pipeline",
    "transforms.insert.static.value": "s3-sink",
    "transforms.mask.type": "org.apache.kafka.connect.transforms.MaskField$Key",
    "transforms.route.type": "org.apache.kafka.connect.transforms.TimestampRouter",
    "transforms.route.topic.format": "${topic}-${timestamp}",
    "transforms.route.timestamp.format": "yyyyMMdd",
    "transforms.drop.type": "org.apache.kafka.connect.transforms.Filter",
}


def smt_chain_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical 5-transform chain over the topic, summarized per routed
    topic — proves extract/insert/mask/route/filter compose as one projection."""
    rec = events_as_topic(spark, sf_dir)
    out = apply_smt_chain(rec, CANONICAL_SMT_PROPS)
    return (
        out.groupBy("topic")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.count_distinct("key").alias("distinct_keys_after_mask"),
            F.min("kafka_offset").alias("min_offset"),
            F.max("kafka_offset").alias("max_offset"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.count_distinct("kafka_part").alias("n_partitions"),
            F.max("pipeline").alias("pipeline"),
        )
        .orderBy("topic")
    )


SQL_SMT_CHAIN = """
WITH records AS (
  SELECT 'events' AS topic,
         CAST(user_id % 8 AS INT) AS kafka_partition,
         event_id AS "offset", ts AS "timestamp",
         CAST(user_id AS VARCHAR) AS "key", props AS "value"
  FROM events
),
transformed AS (
  SELECT 'events-' || strftime("timestamp", '%Y%m%d') AS topic,
         CASE WHEN "key" IS NOT NULL THEN '****' END AS "key",
         "offset" AS kafka_offset,
         kafka_partition AS kafka_part,
         's3-sink' AS pipeline,
         CAST(json_extract_string("value", '$.k') AS BIGINT) AS k
  FROM records
  WHERE "value" IS NOT NULL
)
SELECT topic, COUNT(*) AS n_records,
       COUNT(DISTINCT "key") AS distinct_keys_after_mask,
       MIN(kafka_offset) AS min_offset,
       MAX(kafka_offset) AS max_offset,
       COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       COUNT(DISTINCT kafka_part) AS n_partitions,
       MAX(pipeline) AS pipeline
FROM transformed GROUP BY topic ORDER BY topic
"""

QUERIES = {"smt_chain": smt_chain_plan}
ORACLES = {"smt_chain": SQL_SMT_CHAIN}
