"""Warehouse-style customer analytics composed from the TPC-H-ish star
schema. First resident: RFM segmentation — the classic
recency/frequency/monetary quintile scoring marketing warehouses run.

Scale: one map-side-combined groupBy on o_custkey builds the per-customer
(last order, order count, decimal-exact spend) triple; the three NTILE
windows then run over the |customers| aggregate — never over orders — and
each uses a deterministic tie order (metric, custkey) so results are
replay- and engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import read_table

RFM_ANCHOR = "1998-12-31"  # fixed as-of date (max o_orderdate neighborhood)


def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer RFM quintiles and the combined segment code.
    R: days since last order as of RFM_ANCHOR (fewer = better);
    F: lifetime order count; M: decimal-exact lifetime spend.
    Quintile 5 is best on every axis; segment = R*100 + F*10 + M."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(12,4)").alias("price"),
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(F.lit(RFM_ANCHOR).cast("date"), F.max("o_orderdate")).alias(
            "recency_days"
        ),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("price").alias("monetary_dec"),
    )
    monetary = F.round(F.col("monetary_dec"), 4).cast("double")
    scored = per_cust.select(
        "o_custkey",
        "recency_days",
        "frequency",
        monetary.alias("monetary"),
    )
    w_r = Window.orderBy(F.desc("recency_days"), F.asc("o_custkey"))  # recent last -> rank 5
    w_f = Window.orderBy(F.asc("frequency"), F.asc("o_custkey"))
    w_m = Window.orderBy(F.asc("monetary"), F.asc("o_custkey"))
    out = (
        scored.withColumn("r_score", F.ntile(5).over(w_r))
        .withColumn("f_score", F.ntile(5).over(w_f))
        .withColumn("m_score", F.ntile(5).over(w_m))
    )
    return out.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).alias(
            "rfm_segment"
        ),
    ).orderBy("o_custkey")


SQL_RFM_SEGMENTATION = f"""
WITH per_cust AS (
  SELECT o_custkey,
         datediff('day', MAX(o_orderdate), TIMESTAMP '{RFM_ANCHOR} 00:00:00') AS recency_days,
         COUNT(*) AS frequency,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS monetary
  FROM orders GROUP BY 1
),
scored AS (
  SELECT *,
         NTILE(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
         NTILE(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
         NTILE(5) OVER (ORDER BY monetary, o_custkey) AS m_score
  FROM per_cust
)
SELECT o_custkey, recency_days, frequency, monetary,
       r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS rfm_segment
FROM scored ORDER BY o_custkey
"""


QUERIES = {"rfm_segmentation": rfm_segmentation}
ORACLES = {"rfm_segmentation": SQL_RFM_SEGMENTATION}
