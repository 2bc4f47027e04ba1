"""CDC / dimension-history operators over the topic stream.

The reference connector lands raw change streams into object storage
(kafka-connect-s3 TopicPartitionWriter.java); the natural downstream
consumers of those landed files are exactly these three shapes:

- scd2_history       : slowly-changing-dimension Type-2 build — collapse
                       consecutive identical attribute values per key into
                       versioned validity intervals [valid_from, valid_to).
- scd2_snapshot_asof : point-in-time reconstruction — each key's attribute
                       state as of a fixed timestamp T, without building
                       the full history (change-detect + struct-max).
- late_data_audit    : watermark-sizing audit — per kafka partition, how
                       late records arrive relative to the running max
                       event time in offset order. This is the measurement
                       that picks `withWatermark` bounds and the
                       reference's rotate.interval.ms safety margin.

Scale: scd2_history is two window passes over ONE hash shuffle on the key
(lag + running sum share the (user_id, ts) sort); the snapshot is a
change-filter plus one map-side-combined struct-max groupBy; the audit is
one window per kafka_partition (8 partitions → 8 sort groups, each sorted
by offset — the order Kafka already delivers, so on a real stream this is
a zero-sort pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..session import read_events
from ..sources.topic import events_as_topic

ASOF_T = "2024-01-16 00:00:00"  # mid-range of the synthetic events month


def _changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows where the tracked attribute (event_type) differs from the key's
    previous record — classic CDC change detection. One shuffle on user_id;
    both windows below reuse its (user_id, ts, event_id) sort order."""
    ev = read_events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.withColumn("prev_attr", F.lag("event_type").over(w)).withColumn(
        "is_change",
        (F.col("prev_attr").isNull() | (F.col("prev_attr") != F.col("event_type"))).cast(
            "long"
        ),
    )


_SQL_CHANGES = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_attr
  FROM events
),
changes AS (
  SELECT *, CASE WHEN prev_attr IS NULL OR prev_attr <> event_type THEN 1 ELSE 0 END AS is_change
  FROM ordered
)
"""


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history: per key, consecutive records with the same
    attribute collapse into one version; each version carries
    [valid_from, valid_to) and is_current. valid_to is the next version's
    valid_from (NULL for the open current version)."""
    ch = _changes(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versioned = ch.withColumn("version", F.sum("is_change").over(w))
    per_version = versioned.groupBy("user_id", "version").agg(
        F.min("event_type").alias("attr"),  # constant within a version
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_collapsed"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return per_version.select(
        "user_id",
        F.col("version").cast("bigint").alias("version"),
        "attr",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_collapsed",
    )


SQL_SCD2_HISTORY = f"""{_SQL_CHANGES},
versioned AS (
  SELECT *, SUM(is_change) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
  FROM changes
),
per_version AS (
  SELECT user_id, version,
         MIN(event_type) AS attr,  -- constant within a version
         MIN(ts) AS valid_from,
         COUNT(*) AS n_collapsed
  FROM versioned GROUP BY 1, 2
)
SELECT user_id, CAST(version AS BIGINT) AS version, attr, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS is_current,
       n_collapsed
FROM per_version
ORDER BY user_id, version
"""


def scd2_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension state as of ASOF_T: for each key seen by T, the attribute
    value in force and when that version began. Avoids materializing the
    full history: change rows at/before T reduce via one struct-max
    (latest change wins) — map-side combinable, |keys| output rows."""
    ch = _changes(spark, sf_dir).filter(
        (F.col("ts") <= F.lit(ASOF_T).cast("timestamp")) & (F.col("is_change") == 1)
    )
    latest = ch.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type")).alias("last"),
        F.count(F.lit(1)).alias("n_versions_to_t"),
    )
    return latest.select(
        "user_id",
        F.col("last.event_type").alias("attr_at_t"),
        F.col("last.ts").alias("since_ts"),
        "n_versions_to_t",
    )


SQL_SCD2_SNAPSHOT = f"""{_SQL_CHANGES},
upto AS (
  SELECT * FROM changes WHERE ts <= TIMESTAMP '{ASOF_T}' AND is_change = 1
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_versions_to_t
  FROM upto
)
SELECT user_id, event_type AS attr_at_t, ts AS since_ts, n_versions_to_t
FROM ranked WHERE rn = 1
ORDER BY user_id
"""


LATE_SHUFFLE = 1000  # synthetic disorder: hash-shuffled arrival order stand-in


def _lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(kafka_partition, lateness_ms) per record — lateness = (running max
    event time in arrival order) − (own event time), arrival order = the
    topic offset order. Shared by late_data_audit (the distribution) and
    watermark_advisor (the delay decision table)."""
    rec = events_as_topic(spark, sf_dir).select("kafka_partition", "offset", "ts")
    w = (
        Window.partitionBy("kafka_partition")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rec.withColumn(
        "lateness_ms", F.max(F.unix_millis("ts")).over(w) - F.unix_millis("ts")
    )


def late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time lateness per kafka partition: a record is late by
    (running max event time in arrival order) - (its own event time).
    Arrival order is the topic offset order. Reports the distribution a
    streaming job reads to size its watermark (and the batch connector to
    size rotate.interval.ms grace)."""
    late = _lateness(spark, sf_dir)
    return (
        late.groupBy("kafka_partition")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum((F.col("lateness_ms") > 0).cast("long")).alias("n_late"),
            F.max("lateness_ms").alias("max_lateness_ms"),
            H.round6(F.sum("lateness_ms").cast("double") / F.count(F.lit(1))).alias(
                "avg_lateness_ms"
            ),
            H.round6(
                F.sum((F.col("lateness_ms") > 0).cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias("late_share"),
        )
        .orderBy("kafka_partition")
    )


_SQL_LATENESS_CTES = """rec AS (
  SELECT CAST(user_id % 8 AS INT) AS kafka_partition, event_id AS "offset", ts
  FROM events
),
late AS (
  SELECT kafka_partition,
         MAX(epoch_ms(ts)) OVER (PARTITION BY kafka_partition ORDER BY "offset"
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - epoch_ms(ts) AS lateness_ms
  FROM rec
)"""

SQL_LATE_DATA_AUDIT = f"""
WITH {_SQL_LATENESS_CTES}
SELECT kafka_partition,
       COUNT(*) AS n_records,
       CAST(SUM(CASE WHEN lateness_ms > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       MAX(lateness_ms) AS max_lateness_ms,
       {H.sql_round6('CAST(SUM(lateness_ms) AS DOUBLE) / COUNT(*)')} AS avg_lateness_ms,
       {H.sql_round6('CAST(SUM(CASE WHEN lateness_ms > 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)')} AS late_share
FROM late GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "scd2_history": scd2_history,
    "scd2_snapshot_asof": scd2_snapshot_asof,
    "late_data_audit": late_data_audit,
}

ORACLES = {
    "scd2_history": SQL_SCD2_HISTORY,
    "scd2_snapshot_asof": SQL_SCD2_SNAPSHOT,
    "late_data_audit": SQL_LATE_DATA_AUDIT,
}


# ---------------------------------------------------------------------------
# watermark_advisor (r9 session 3) — delay vs drop-rate decision table
# ---------------------------------------------------------------------------

WATERMARK_DELAYS_MS = (1_000, 10_000, 60_000, 600_000)


def watermark_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermark DECISION TABLE late_data_audit's distribution is read
    for: for each candidate delay D, exactly how many records a
    `withWatermark(D)` pipeline would DROP (lateness > D under
    offset-arrival order), globally and in the worst partition — drop
    share buys state size, and this table prices the trade at the
    candidate delays a config review actually debates (1 s / 10 s /
    1 min / 10 min). The worst-partition column matters because
    watermarks are global but lateness is per-partition: a delay that
    drops 0.1% overall can still gut one skewed partition.

    Scale: the lateness frame is ONE running-max window over the topic
    order (shared with late_data_audit); the delay fan-out is a 4-row
    rule-17 literal explode BEFORE the rollup, so the stream is scanned
    once and every aggregate is (delay[, partition])-keyed.

    Corpus note: the synthetic topic assigns offsets in event-time order,
    so lateness is identically zero here and every drop count is
    legitimately 0 (late_data_audit reports the same) — the pytest pins
    the reconciliation identities; on a real out-of-order topic the same
    plan prices the delays."""
    late = _lateness(spark, sf_dir)
    fan = late.withColumn(
        "delay_ms",
        F.explode(F.array(*[F.lit(d).cast("long") for d in WATERMARK_DELAYS_MS])),
    )
    per_part = fan.groupBy("delay_ms", "kafka_partition").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("lateness_ms") > F.col("delay_ms")).cast("long")).alias("d"),
    )
    agg = per_part.groupBy("delay_ms").agg(
        F.sum("n").alias("n_records"),
        F.sum("d").alias("n_dropped"),
        F.max(
            F.floor(
                (F.col("d") * F.lit(1000000)).cast("double") / F.col("n").cast("double")
            ).cast("long")
        ).alias("worst_mic"),
    )
    return agg.select(
        "delay_ms",
        "n_records",
        "n_dropped",
        (F.col("n_dropped").cast("double") / F.col("n_records").cast("double")).alias(
            "drop_share"
        ),
        (F.col("worst_mic").cast("double") / F.lit(1000000).cast("double")).alias(
            "worst_partition_drop_share"
        ),
    )


_WM_DELAYS_SQL = ", ".join(str(d) for d in WATERMARK_DELAYS_MS)

SQL_WATERMARK_ADVISOR = f"""
WITH {_SQL_LATENESS_CTES},
wmfan AS (
  SELECT l.kafka_partition, l.lateness_ms, dd.delay_ms
  FROM late l
  CROSS JOIN (SELECT UNNEST([{_WM_DELAYS_SQL}]) AS delay_ms) dd
),
wmpart AS (
  SELECT delay_ms, kafka_partition,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN lateness_ms > delay_ms THEN 1 ELSE 0 END) AS BIGINT)
           AS d
  FROM wmfan GROUP BY 1, 2
),
wmagg AS (
  SELECT delay_ms,
         CAST(SUM(n) AS BIGINT) AS n_records,
         CAST(SUM(d) AS BIGINT) AS n_dropped,
         CAST(MAX(CAST(FLOOR(CAST(d * 1000000 AS DOUBLE) / CAST(n AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS worst_mic
  FROM wmpart GROUP BY 1
)
SELECT CAST(delay_ms AS BIGINT) AS delay_ms, n_records, n_dropped,
       CAST(n_dropped AS DOUBLE) / CAST(n_records AS DOUBLE) AS drop_share,
       CAST(worst_mic AS DOUBLE) / CAST(1000000 AS DOUBLE)
         AS worst_partition_drop_share
FROM wmagg
"""

QUERIES["watermark_advisor"] = watermark_advisor
ORACLES["watermark_advisor"] = SQL_WATERMARK_ADVISOR
