"""Sources: Kafka (gated — no broker in the test env) and the deterministic
events-as-topic adapter used by tests and the correctness oracle.

The adapter reshapes the synthetic `events` table into the Kafka record shape
the connector consumes (SinkRecord: topic, kafkaPartition, offset, timestamp,
key, value, headers):

  offset          := event_id                (monotone per topic)
  kafka_partition := pmod(user_id, n_partitions)  -- key-hash partitioning
  timestamp       := ts
  key             := user_id as string
  value           := props (JSON string; NULL => tombstone record)
  headers         := map(event_type)

Everything is a pure projection — no shuffle, survives any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import read_events

TOPIC_NAME = "events"
DEFAULT_N_PARTITIONS = 8


def events_as_topic(
    spark: SparkSession, sf_dir: str, n_partitions: int = DEFAULT_N_PARTITIONS
) -> DataFrame:
    """Read the events table as a stream of SinkRecord-shaped rows."""
    return as_topic_records(read_events(spark, sf_dir), n_partitions)


def as_topic_records(ev: DataFrame, n_partitions: int = DEFAULT_N_PARTITIONS) -> DataFrame:
    """The SinkRecord projection, applicable to a batch OR streaming events
    frame (pure expressions — no shuffle, streaming-safe)."""
    return ev.select(
        F.lit(TOPIC_NAME).alias("topic"),
        F.pmod(F.col("user_id"), F.lit(n_partitions)).cast("int").alias("kafka_partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").alias("key"),
        F.col("props").alias("value"),
        F.create_map(F.lit("event_type"), F.col("event_type")).alias("headers"),
        # keep originals for field partitioners / analytics
        F.col("event_type"),
        F.col("user_id"),
        F.col("value").alias("metric_value"),
        F.col("ts"),
    )


def kafka_source(spark: SparkSession, bootstrap_servers: str, topic: str, starting_offsets: str = "earliest"):
    """Real Kafka source (requires spark-sql-kafka package + broker).

    Gated: raises a clear error when the Kafka connector jars are absent,
    so local tests use `events_as_topic` instead.
    """
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # pragma: no cover - env without kafka jars
        raise NotImplementedError(
            "Kafka source requires the spark-sql-kafka-0-10 package and a broker; "
            "use sources.topic.events_as_topic for offline runs"
        ) from exc
