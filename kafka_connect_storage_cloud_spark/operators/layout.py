"""Data-layout engineering: Z-order (Morton-code) clustering and the
zone-map file-skipping audit that justifies it.

A storage sink's file layout decides how much a reader scans. Natural
(offset-order) files cluster by arrival time only, so a per-user query must
open almost every file. Re-clustering the same records along a Morton curve
over (user bucket, time bucket) gives files that are selective in BOTH
dimensions; parquet min/max zone maps then skip most files.

`zorder_file_skipping` materializes both layouts' zone maps and measures the
average fraction of files a per-user probe must touch — the number a table
format's OPTIMIZE ZORDER reports. Everything is integer arithmetic
(interleave via div/mod), exact in both engines.

Scale: the Z-sort is a range-partitioned global sort (one exchange — the
standard compaction job shape); zone maps are per-file aggregates
(manifest-sized); the audit joins |users| x |files| zone rows, never
records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import read_events

Z_BITS = 8  # bits per dimension -> 16-bit Morton code
Z_FLUSH = 200  # records per file in both layouts


def _morton_expr(a: str, b: str) -> str:
    """Interleave the low Z_BITS of a (even positions) and b (odd): pure
    div/mod arithmetic, identical in Spark SQL and DuckDB."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({a} div {2**i}) % 2) * {4**i}")
        terms.append(f"(({b} div {2**i}) % 2) * {2 * 4**i}")
    return " + ".join(terms)


_SQL_MORTON_TMPL = _morton_expr("{a}", "{b}").replace(" div ", " // ")


def zorder_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compare per-user file pruning under offset-order vs Z-order layout.
    Output: one row per layout with file count and the mean fraction of
    files whose (min,max) user_id zone map admits a probe user."""
    ev = read_events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.least(F.col("user_id") / F.lit(8), F.lit(255)).cast("bigint").alias("ub"),
        (F.floor(F.unix_millis("ts") / F.lit(3600 * 1000)) % 256).alias("tb"),
    )
    ev = ev.withColumn("morton", F.expr(_morton_expr("ub", "tb")))

    def layout(order_cols, name: str) -> DataFrame:
        w = Window.orderBy(*order_cols)
        files = (
            ev.withColumn(
                "file_id",
                F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(Z_FLUSH)).cast(
                    "bigint"
                ),
            )
            .groupBy("file_id")
            .agg(F.min("user_id").alias("zmin"), F.max("user_id").alias("zmax"))
        )
        users = ev.select("user_id").distinct()
        touched = users.join(
            F.broadcast(files),
            (F.col("user_id") >= F.col("zmin")) & (F.col("user_id") <= F.col("zmax")),
            "left",
        ).groupBy("user_id").agg(F.count("file_id").alias("n_touched"))
        n_files = files.count()
        return touched.agg(
            F.lit(name).alias("layout"),
            F.lit(n_files).alias("n_files"),
            (
                F.floor(
                    F.avg(F.col("n_touched") / F.lit(float(n_files))) * 1000000.0 + 0.5
                )
                / 1000000.0
            ).alias("avg_files_touched_frac"),
        )

    natural = layout([F.col("event_id")], "natural_offset")
    zorder = layout([F.col("morton"), F.col("event_id")], "zorder")
    return natural.unionByName(zorder).orderBy("layout")


def _sql_layout(order_sql: str, name: str) -> str:
    morton = _SQL_MORTON_TMPL.format(a="LEAST(user_id // 8, 255)", b="tb")
    return f"""
SELECT '{name}' AS layout, n_files,
       floor(AVG(CAST(n_touched AS DOUBLE) / n_files) * 1000000.0 + 0.5) / 1000000.0
         AS avg_files_touched_frac
FROM (
  WITH ev AS (
    SELECT event_id, user_id,
           CAST(floor(epoch_ms(ts) / {3600 * 1000}.0) AS BIGINT) % 256 AS tb
    FROM events
  ),
  coded AS (SELECT *, {morton} AS morton FROM ev),
  filed AS (
    SELECT user_id,
           CAST((ROW_NUMBER() OVER (ORDER BY {order_sql}) - 1) // {Z_FLUSH} AS BIGINT) AS file_id
    FROM coded
  ),
  files AS (SELECT file_id, MIN(user_id) AS zmin, MAX(user_id) AS zmax FROM filed GROUP BY 1),
  users AS (SELECT DISTINCT user_id FROM ev),
  touched AS (
    SELECT u.user_id, COUNT(f.file_id) AS n_touched
    FROM users u LEFT JOIN files f ON u.user_id >= f.zmin AND u.user_id <= f.zmax
    GROUP BY 1
  )
  SELECT t.*, (SELECT COUNT(*) FROM files) AS n_files FROM touched t
)
GROUP BY n_files"""


SQL_ZORDER_FILE_SKIPPING = (
    _sql_layout("event_id", "natural_offset")
    + "\nUNION ALL\n"
    + _sql_layout("morton, event_id", "zorder")
    + "\nORDER BY layout"
)

QUERIES = {"zorder_file_skipping": zorder_file_skipping}
ORACLES = {"zorder_file_skipping": SQL_ZORDER_FILE_SKIPPING}
