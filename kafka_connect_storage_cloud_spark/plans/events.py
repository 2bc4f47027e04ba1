"""Event-stream analytics: the hypertable-rollup / sessionization / top-k
plans a storage-sink user runs downstream of the connector's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import money as M
from ..session import read_events


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hourly rollup: time_bucket + groupBy. Single shuffle
    on (bucket, event_type); partial aggregation is map-side."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            M.money_sum(M.dec("value"), "sum_value"),
            M.money_avg(M.dec("value"), "avg_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
    )


def events_sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than the gap. One shuffle (partitionBy user), then pure window
    functions — the classic scalable sessionization plan."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_ms = gap_minutes * 60 * 1000
    with_gap = ev.withColumn(
        "new_session",
        (
            F.coalesce(
                F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w)),
                F.lit(gap_ms + 1),
            )
            > gap_ms
        ).cast("int"),
    )
    with_id = with_gap.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_id.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            M.money_sum(M.dec("value"), "session_value"),
        )
    )


def events_topk_users(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Top-k users by total value within each event_type: aggregate first
    (shrinks to |users|×|types|), then rank — never a global sort."""
    ev = read_events(spark, sf_dir)
    per_user = ev.groupBy("event_type", "user_id").agg(
        M.money_sum(M.dec("value"), "total_value"), F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("total_value"), F.asc("user_id"))
    return (
        per_user.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


SESSION_GAP_MIN = 30


def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through Spark's NATIVE session_window operator (the
    same merging-session machinery Structured Streaming uses for stateful
    gap sessions, here in batch). Proven against the portable lag-based
    formulation in the oracle: session_window merges an event into the
    session while its gap to the previous event is < gap, so the oracle
    cuts on diff >= gap.

    The plan is one shuffle on (user_id) + Spark's session-merge aggregate;
    at scale it's the same topology as the window formulation but with the
    merge done by the purpose-built operator (no per-row running sum)."""
    ev = read_events(spark, sf_dir).select("user_id", "ts")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
    )


SQL_EVENTS_SESSION_WINDOW_NATIVE = f"""
WITH with_gap AS (
  SELECT user_id, ts,
    CASE WHEN COALESCE(epoch_ms(ts) - epoch_ms(LAG(ts) OVER w), {SESSION_GAP_MIN * 60 * 1000})
              >= {SESSION_GAP_MIN * 60 * 1000}
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
with_id AS (
  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM with_gap
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM with_id GROUP BY user_id, session_seq
ORDER BY user_id, session_start
"""


SLIDE_WIN_MIN = 60
SLIDE_STEP_MIN = 30


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregate through Spark's NATIVE window(ts, 1h, 30m)
    generator: each event contributes to the 2 overlapping hourly windows
    that contain it (window start = ts floored to each 30-min slide). The
    oracle reproduces the window-assignment arithmetic with an explicit
    2-element unnest. One explode (x2 rows) + one map-side-combined
    aggregation; the shuffle carries |windows| x |types| partials."""
    ev = read_events(spark, sf_dir).select("event_type", "ts", "value")
    v = F.col("value").cast("decimal(10,4)")
    return (
        ev.groupBy(
            F.window("ts", f"{SLIDE_WIN_MIN} minutes", f"{SLIDE_STEP_MIN} minutes"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(v), 4).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("win_start", "event_type")
    )


SQL_EVENTS_SLIDING_WINDOW = f"""
WITH assigned AS (
  SELECT event_type, "value",
         make_timestamp(((epoch_ms(ts) // 1000 // {SLIDE_STEP_MIN * 60} - k) * {SLIDE_STEP_MIN * 60}) * 1000000)
           AS win_start,
         epoch_ms(ts) AS tms
  FROM events, UNNEST(generate_series(0, {SLIDE_WIN_MIN // SLIDE_STEP_MIN - 1})) AS g(k)
),
valid AS (
  SELECT * FROM assigned
  WHERE tms >= epoch_ms(win_start) AND tms < epoch_ms(win_start) + {SLIDE_WIN_MIN * 60 * 1000}
)
SELECT win_start, event_type, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST("value" AS DECIMAL(10,4))), 4) AS DOUBLE) AS sum_value
FROM valid GROUP BY 1, 2 ORDER BY 1, 2
"""
