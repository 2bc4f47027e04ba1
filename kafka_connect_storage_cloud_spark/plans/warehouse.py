"""Warehouse analytics + exact-statistics operators over the star schema:

- customer value: rfm_segmentation, orders_cohort_ltv, revenue_pareto
- supply side: supplier_scorecard, part_affinity, market_concentration_hhi
- entity resolution: fuzzy_name_matches (blocked bounded levenshtein)
- time-series stats: events_trend_slope, events_autocorr_lag1,
  events_changepoint (CUSUM)
- forensics/inference: benford_audit, bootstrap_mean_ci (Poisson
  bootstrap, all replicas in one scan)

Common discipline: money stays decimal until a single rounded cast;
ratios/statistics are built from exact int64 or decimal sums with one
fixed-order float step at the end (never a float accumulation, never
libm); every ranking window has a deterministic tie order; windows run
over per-entity aggregates, never the raw facts. See SCALE.md for the
per-operator 100 TB arguments.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..session import read_table

RFM_ANCHOR = "1998-12-31"  # fixed as-of date (max o_orderdate neighborhood)


def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer RFM quintiles and the combined segment code.
    R: days since last order as of RFM_ANCHOR (fewer = better);
    F: lifetime order count; M: decimal-exact lifetime spend.
    Quintile 5 is best on every axis; segment = R*100 + F*10 + M."""
    scored = _rfm_scored(spark, sf_dir)
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


def _rfm_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-customer R/F/M aggregate both quintile forms rank."""
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
    return per_cust.select(
        "o_custkey",
        "recency_days",
        "frequency",
        monetary.alias("monetary"),
    )


def rfm_segmentation_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rfm_segmentation, scale-safe: identical quintiles from three exact
    two-pass ranks (value histogram cumulative edges + per-value tiebreak
    window, functions/ranking.py) instead of three unpartitioned NTILE
    windows — at 1B customers each NTILE sorts the whole aggregate in one
    task; here the only global windows run over the distinct-value
    histograms (bounded: |distinct days|, |distinct counts|, |distinct
    rounded spends|). Same oracle as the NTILE twin."""
    from ..functions.ranking import ntile_of_rank, with_global_rank

    scored = _rfm_scored(spark, sf_dir)
    axes = {
        "r_score": ("recency_days", True),  # recent (small) last -> rank 5
        "f_score": ("frequency", False),
        "m_score": ("monetary", False),
    }
    out = scored
    for name, (col, desc) in axes.items():
        out = with_global_rank(out, col, "o_custkey", desc=desc)
        out = out.withColumn(
            name, ntile_of_rank(F.col("__rank"), F.col("__total"), 5)
        ).drop("__rank", "__total")
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


QUERIES = {
    "rfm_segmentation": rfm_segmentation,
    # exact two-pass rank == exact NTILE output: same oracle verifies both
    "rfm_segmentation_edges": rfm_segmentation_edges,
}
ORACLES = {
    "rfm_segmentation": SQL_RFM_SEGMENTATION,
    "rfm_segmentation_edges": SQL_RFM_SEGMENTATION,
}


def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: customers grouped by first-order month, with
    cumulative revenue per month-age — the LTV curve matrix (the money
    twin of events_retention). Revenue stays decimal until one rounded
    cast; the cumulative sum runs over the (cohort, month_age) aggregate
    (|cohorts| x |ages| rows), never over orders."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("om"),
        F.col("o_totalprice").cast("decimal(12,4)").alias("price"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("om").alias("cohort_month"))
    aged = orders.join(first, "o_custkey").withColumn(
        "month_age",
        (F.months_between(F.col("om"), F.col("cohort_month"))).cast("int"),
    )
    cell = aged.groupBy("cohort_month", "month_age").agg(
        F.countDistinct("o_custkey").alias("active_customers"),
        F.sum("price").alias("rev_dec"),
    )
    wcum = (
        Window.partitionBy("cohort_month")
        .orderBy("month_age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cell.withColumn("cum_rev_dec", F.sum("rev_dec").over(wcum))
        .select(
            "cohort_month",
            "month_age",
            "active_customers",
            F.round(F.col("rev_dec"), 4).cast("double").alias("month_revenue"),
            F.round(F.col("cum_rev_dec"), 4).cast("double").alias("cumulative_revenue"),
        )
        .orderBy("cohort_month", "month_age")
    )


SQL_ORDERS_COHORT_LTV = """
WITH orders_m AS (
  SELECT o_custkey,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS om,
         CAST(o_totalprice AS DECIMAL(12,4)) AS price
  FROM orders
),
first_m AS (
  SELECT o_custkey, MIN(om) AS cohort_month FROM orders_m GROUP BY 1
),
aged AS (
  SELECT o.*, f.cohort_month,
         CAST(datediff('month', f.cohort_month, o.om) AS INT) AS month_age
  FROM orders_m o JOIN first_m f USING (o_custkey)
),
cell AS (
  SELECT cohort_month, month_age,
         COUNT(DISTINCT o_custkey) AS active_customers,
         SUM(price) AS rev_dec
  FROM aged GROUP BY 1, 2
)
SELECT cohort_month, month_age, active_customers,
       CAST(ROUND(rev_dec, 4) AS DOUBLE) AS month_revenue,
       CAST(ROUND(SUM(rev_dec) OVER (PARTITION BY cohort_month ORDER BY month_age
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS cumulative_revenue
FROM cell ORDER BY cohort_month, month_age
"""


def revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 audit: cumulative revenue share of customers ranked by spend,
    reported at decile cut points — how concentrated the revenue base is.
    Cumulative sums stay decimal (exact); the two share divisions are the
    only floating steps. Windows run over the |customers| aggregate."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(12,4)").alias("price")
    )
    per_cust = orders.groupBy("o_custkey").agg(F.sum("price").alias("spend"))
    w = Window.orderBy(F.desc("spend"), F.asc("o_custkey"))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n = per_cust.count()
    total = per_cust.agg(F.sum("spend")).collect()[0][0]  # exact Decimal
    ranked = (
        per_cust.withColumn("rk", F.row_number().over(w))
        .withColumn("cum_spend", F.sum("spend").over(wcum))
        .withColumn("decile", F.ntile(10).over(w))
    )
    # cum_spend is monotone along the rank order (spend > 0), so the
    # decile-end cumulative is simply MAX(cum_spend)
    top_of_decile = ranked.groupBy("decile").agg(
        F.max("rk").alias("n_customers"),
        F.max("cum_spend").alias("cum_end"),
    )
    cum = F.col("cum_end")
    return top_of_decile.select(
        "decile",
        "n_customers",
        (
            F.floor(
                (F.col("n_customers").cast("double") / F.lit(float(n))) * 1000000.0
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("customer_share"),
        (
            F.floor(
                (cum.cast("double") / F.lit(float(total))) * 1000000.0 + F.lit(0.5)
            )
            / 1000000.0
        ).alias("revenue_share"),
    ).orderBy("decile")


SQL_REVENUE_PARETO = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS spend
  FROM orders GROUP BY 1
),
tot AS (SELECT COUNT(*) AS n, SUM(spend) AS total FROM per_cust),
ranked AS (
  SELECT o_custkey, spend,
         ROW_NUMBER() OVER (ORDER BY spend DESC, o_custkey) AS rk,
         SUM(spend) OVER (ORDER BY spend DESC, o_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_spend,
         NTILE(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
  FROM per_cust
),
top_of_decile AS (
  SELECT decile, MAX(rk) AS n_customers,
         MAX(cum_spend) AS cum_end
  FROM ranked GROUP BY 1
)
SELECT d.decile, d.n_customers,
       (floor((CAST(d.n_customers AS DOUBLE) / CAST(t.n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)
         AS customer_share,
       (floor((CAST(d.cum_end AS DOUBLE) / CAST(t.total AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)
         AS revenue_share
FROM top_of_decile d CROSS JOIN tot t
ORDER BY d.decile
"""


def revenue_pareto_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """revenue_pareto, scale-safe: identical deciles and exact decimal
    cumulative revenue from ONE exact two-pass rank (spend histogram
    cumulative edges + per-spend-value tiebreak window,
    functions/ranking.py) — no unpartitioned row-level window over the
    customer aggregate. The within-value cumulative is spend × in-value
    row_number added to the histogram's prior-value decimal sum, so
    cum_spend is the same exact DECIMAL as the single-window form. Same
    oracle as the NTILE twin."""
    from ..functions.ranking import ntile_of_rank, with_global_rank

    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(12,4)").alias("price")
    )
    per_cust = orders.groupBy("o_custkey").agg(F.sum("price").alias("spend"))
    n = per_cust.count()
    total = per_cust.agg(F.sum("spend")).collect()[0][0]  # exact Decimal
    ranked = with_global_rank(
        per_cust, "spend", "o_custkey", desc=True, cum_cols=("spend",)
    )
    ranked = ranked.withColumn(
        "decile", ntile_of_rank(F.col("__rank"), F.col("__total"), 10)
    )
    top_of_decile = ranked.groupBy("decile").agg(
        F.max("__rank").alias("n_customers"),
        F.max("__cum_spend").alias("cum_end"),
    )
    cum = F.col("cum_end")
    return top_of_decile.select(
        "decile",
        "n_customers",
        (
            F.floor(
                (F.col("n_customers").cast("double") / F.lit(float(n))) * 1000000.0
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("customer_share"),
        (
            F.floor(
                (cum.cast("double") / F.lit(float(total))) * 1000000.0 + F.lit(0.5)
            )
            / 1000000.0
        ).alias("revenue_share"),
    ).orderBy("decile")


QUERIES["orders_cohort_ltv"] = orders_cohort_ltv
QUERIES["revenue_pareto"] = revenue_pareto
# exact two-pass rank == exact NTILE output: same oracle verifies both
QUERIES["revenue_pareto_edges"] = revenue_pareto_edges
ORACLES["orders_cohort_ltv"] = SQL_ORDERS_COHORT_LTV
ORACLES["revenue_pareto"] = SQL_REVENUE_PARETO
ORACLES["revenue_pareto_edges"] = SQL_REVENUE_PARETO


def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier operational KPIs: line volume, decimal-exact revenue,
    return rate, average order-to-ship lead time, and part breadth. The
    lineitem⋈orders equi-join is the one scale-bound shuffle (orderkey
    co-partitioned, AQE-coalesced); supplier is broadcast; every KPI is a
    map-side-combinable aggregate over the joined fact."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        "l_partkey",
        "l_returnflag",
        "l_shipdate",
        (
            F.col("l_extendedprice").cast("decimal(10,4)")
            * (F.lit(1).cast("decimal(10,4)") - F.col("l_discount").cast("decimal(10,4)"))
        ).cast("decimal(18,8)").alias("net"),
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "lead_days", F.datediff("l_shipdate", "o_orderdate")
    )
    per_sup = joined.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("net"), 4).cast("double").alias("revenue"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("n_returns"),
        F.sum("lead_days").alias("lead_sum"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    return (
        per_sup.join(F.broadcast(sup), per_sup.l_suppkey == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            "s_nationkey",
            "n_lines",
            "revenue",
            (
                F.floor(
                    (F.col("n_returns").cast("double") / F.col("n_lines").cast("double"))
                    * 1000000.0
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("return_rate"),
            (
                F.floor(
                    (F.col("lead_sum").cast("double") / F.col("n_lines").cast("double"))
                    * 1000000.0
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("avg_lead_days"),
            "n_parts",
        )
        .orderBy("s_suppkey")
    )


SQL_SUPPLIER_SCORECARD = """
WITH joined AS (
  SELECT l.l_suppkey, l.l_partkey, l.l_returnflag,
         CAST(CAST(l.l_extendedprice AS DECIMAL(10,4)) *
              (CAST(1 AS DECIMAL(10,4)) - CAST(l.l_discount AS DECIMAL(10,4))) AS DECIMAL(18,8)) AS net,
         datediff('day', o.o_orderdate, l.l_shipdate) AS lead_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
per_sup AS (
  SELECT l_suppkey,
         COUNT(*) AS n_lines,
         CAST(ROUND(SUM(net), 4) AS DOUBLE) AS revenue,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returns,
         SUM(lead_days) AS lead_sum,
         COUNT(DISTINCT l_partkey) AS n_parts
  FROM joined GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, s.s_nationkey,
       p.n_lines, p.revenue,
       (floor((CAST(p.n_returns AS DOUBLE) / CAST(p.n_lines AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)
         AS return_rate,
       (floor((CAST(p.lead_sum AS DOUBLE) / CAST(p.n_lines AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)
         AS avg_lead_days,
       p.n_parts
FROM per_sup p JOIN supplier s ON p.l_suppkey = s.s_suppkey
ORDER BY s.s_suppkey
"""


QUERIES["supplier_scorecard"] = supplier_scorecard
ORACLES["supplier_scorecard"] = SQL_SUPPLIER_SCORECARD


AFFINITY_TOP = 50
AFFINITY_MIN = 2


def part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the top co-ordered part pairs with support
    and lift = P(ab)/(P(a)P(b)) over orders. The pair join is a
    self-equi-join on l_orderkey of the DISTINCT (order, part) table —
    co-partitioned, and fan-out bounded by lines-per-order, never |parts|².
    Lift is the exp-PMI exact-ratio form (fixed-order divisions), the same
    association measure bigram_lift uses on text."""
    op = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = read_table(spark, sf_dir, "orders").select("o_orderkey").count()
    freq = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    a = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= AFFINITY_MIN)
    )
    w = Window.orderBy(F.col("c_ab").desc(), F.col("part_a"), F.col("part_b"))
    top = pairs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= AFFINITY_TOP)
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("cnt").alias("c_a"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("cnt").alias("c_b"))
    # broadcast the TOP-50 side, not the |parts|-sized frequency table —
    # freq is dim-proportional and would not fit a broadcast at extreme SF
    joined = F.broadcast(top).join(fa, "part_a").join(fb, "part_b")
    nf = F.lit(float(n_orders))
    lift = (F.col("c_ab").cast("double") / nf) / (
        (F.col("c_a").cast("double") / nf) * (F.col("c_b").cast("double") / nf)
    )
    return joined.select(
        "part_a",
        "part_b",
        "c_ab",
        "c_a",
        "c_b",
        (F.floor(lift * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("lift"),
    ).orderBy(F.col("c_ab").desc(), "part_a", "part_b")


SQL_PART_AFFINITY = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
tot AS (SELECT COUNT(*) AS n_orders FROM orders),
freq AS (SELECT l_partkey, COUNT(*) AS cnt FROM op GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS c_ab
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {AFFINITY_MIN}
),
top AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY c_ab DESC, part_a, part_b) AS rk FROM pairs
  ) WHERE rk <= {AFFINITY_TOP}
)
SELECT t.part_a, t.part_b, t.c_ab, fa.cnt AS c_a, fb.cnt AS c_b,
       (floor(((CAST(t.c_ab AS DOUBLE) / CAST(tt.n_orders AS DOUBLE)) /
               ((CAST(fa.cnt AS DOUBLE) / CAST(tt.n_orders AS DOUBLE)) *
                (CAST(fb.cnt AS DOUBLE) / CAST(tt.n_orders AS DOUBLE)))) * 1000000.0 + 0.5) / 1000000.0)
         AS lift
FROM top t
JOIN freq fa ON t.part_a = fa.l_partkey
JOIN freq fb ON t.part_b = fb.l_partkey
CROSS JOIN tot tt
ORDER BY t.c_ab DESC, t.part_a, t.part_b
"""


QUERIES["part_affinity"] = part_affinity
ORACLES["part_affinity"] = SQL_PART_AFFINITY


FUZZY_MAX_DIST = 2
FUZZY_MAX_BLOCK = 2000  # degenerate-block guard, same semantics as
# dedup.MAX_BUCKET: a block key shared by more members than this (a
# pathological key distribution) is dropped from CANDIDATE generation on
# BOTH engines, so recall degrades observably instead of a join exploding

# Pigeonhole blocking pieces: position p of the name belongs to piece
# p mod 5 (an INTERLEAVED partition, r3). A pair within FUZZY_MAX_DIST=2
# SUBSTITUTIONS touches at most 2 pieces, so it agrees exactly on some
# 3-piece complement — emitting one block key per excluded 2-subset
# (C(5,2)=10 keys) finds every such pair. Versus round 2's contiguous
# head+tail pieces this (a) spreads key entropy evenly — sequential
# id-styled names ("Customer#000012345") put their varying low digits one
# per piece, so EVERY key keeps varying content and block sizes stay flat
# as the corpus grows (the r2 layout's keys that dropped both varying tail
# pieces collapsed into nation×length-sized blocks: the measured 6.4×
# superlinearity) — and (b) makes the completeness proof hold at EVERY
# name length (each position belongs to exactly one piece; no clamped
# overlaps), removing the r2 short-name precondition.
_FUZZY_PIECE_SPAN = 8  # chars sampled per piece: covers names up to 40
# chars; positions beyond that fall out of the key (never breaks
# completeness — unkeyed positions only ever ADD collisions)


def _fuzzy_piece(name: str, j: int) -> str:
    """Piece j (1..5): the name's characters at positions j, j+5, j+10, ...
    — engine-portable (substring past the end is '' on both engines)."""
    parts = ", ".join(
        f"substring({name}, {j + 5 * t}, 1)" for t in range(_FUZZY_PIECE_SPAN)
    )
    return f"concat({parts})"


# Second key family (keyid 10, r3): SINGLE-DELETION variants. An
# equal-length pair at distance 2 that is NOT two substitutions is exactly
# one insert + one delete (a local shift, e.g. ...1096 vs ...1960, the
# class the piece keys cannot see: the shift changes every mod-5 piece
# from the edit point on). For such a pair, deleting the moved char from
# each side yields IDENTICAL (L-1)-length strings — so both sides emit the
# variant and provably collide. Variant keys carry almost the whole name's
# entropy, so their blocks are near-singleton at ANY corpus size — this is
# what replaced round 2's contiguous head+tail family, whose shift-catching
# keys were precisely its low-entropy (nation x length)-sized blocks (the
# measured 6.4x superlinearity: catching shifts through coarse blocks is
# inherently quadratic; catching them through deletion variants is linear).
# Together: keyids 0-9 + 10 make the blocking COMPLETE for every
# equal-length pair within distance 2 (2 subs | sub | ins+del), up to the
# FUZZY_MAX_BLOCK guard and edits past position FUZZY_DEL_SPAN.
FUZZY_DEL_SPAN = 24  # deletion positions keyed; names longer than this
# miss only pairs whose EVERY minimal edit sits past it


def _fuzzy_keys(name: str, L: str = "nlen") -> list[tuple[int, str]]:
    """(keyid, keyval-SQL[, guard-SQL]): keyids 0-9 are the excluded
    2-subsets of the mod-5 pieces (substitution-complete, flat blocks);
    keyid 10 repeats for each deletion position d with the WHERE guard
    'd <= L' (ins+del completeness)."""
    out = []
    kid = 0
    pieces = [_fuzzy_piece(name, j) for j in range(1, 6)]
    for i in range(5):
        for j in range(i + 1, 5):
            kept = [pieces[k] for k in range(5) if k not in (i, j)]
            out.append((kid, f"concat_ws(':', {', '.join(kept)})", None))
            kid += 1
    for d in range(1, FUZZY_DEL_SPAN + 1):
        variant = (
            f"concat(substring({name}, 1, {d - 1}), substring({name}, {d + 1}, 4096))"
        )
        out.append((10, variant, f"{L} >= {d}"))
    return out


def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution screen: per nation, how many customer-name pairs
    sit within levenshtein distance 1..FUZZY_MAX_DIST — the
    blocked-pair edit-distance pass record-linkage pipelines run before
    human review. Candidates come from two key families (see _fuzzy_keys):
    mod-5 pigeonhole pieces (PROVABLY complete for <=2-substitution pairs
    incl. transpositions; hypothesis-tested) plus single-deletion variants
    (provably complete for the 1-insert+1-delete shift class; hypothesis-
    tested) — together COMPLETE for every equal-length pair within
    distance 2, up to the FUZZY_MAX_BLOCK degenerate-block guard and edits
    past FUZZY_DEL_SPAN (measured recall 1.0 at sf0.1 — see SCALE.md).
    Both engines implement the identical blocking, so the oracle contract
    stays exact. The edit distance is a built-in on BOTH engines (exact
    int) — zero custom UDF."""
    entries = ", ".join(
        f"struct({kid} AS keyid, {kv} AS keyval)"
        if guard is None
        else f"IF({guard}, struct({kid} AS keyid, {kv} AS keyval), NULL)"
        for kid, kv, guard in _fuzzy_keys("c_name")
    )
    keys = F.expr(f"filter(array({entries}), x -> x IS NOT NULL)")
    cust = (
        read_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey", "c_name", F.length("c_name").alias("nlen"))
        .select(
            "c_custkey", "c_nationkey", "c_name", "nlen",
            F.explode(keys).alias("bk"),
        )
        .select(
            "c_custkey", "c_nationkey", "c_name", "nlen",
            F.col("bk.keyid").alias("keyid"), F.col("bk.keyval").alias("keyval"),
        )
    )
    # degenerate-block guard: keys shared by > FUZZY_MAX_BLOCK members (a
    # pathological key distribution) leave candidate generation entirely —
    # the oversized-key list is tiny by construction, so it broadcasts
    big = (
        cust.groupBy("c_nationkey", "nlen", "keyid", "keyval")
        .agg(F.count(F.lit(1)).alias("bn"))
        .where(F.col("bn") > FUZZY_MAX_BLOCK)
        .select("c_nationkey", "nlen", "keyid", "keyval")
    )
    cust = cust.join(
        F.broadcast(big), ["c_nationkey", "nlen", "keyid", "keyval"], "left_anti"
    )
    a = cust.select(
        F.col("c_nationkey").alias("nat"), "nlen", "keyid", "keyval",
        F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"),
    )
    b = cust.select(
        F.col("c_nationkey").alias("nat"), "nlen", "keyid", "keyval",
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"),
    )
    # Spark's bounded levenshtein(l, r, threshold) abandons a pair's DP as
    # soon as the distance provably exceeds the bound (returns -1), which
    # is most pairs — the standard edit-distance band optimization. The
    # oracle keeps the unbounded form: the kept set and kept distances are
    # identical by construction.
    pairs = (
        a.join(b, ["nat", "nlen", "keyid", "keyval"])
        .where(F.col("key_a") < F.col("key_b"))
        .select("nat", "key_a", "key_b", "name_a", "name_b")
        .distinct()  # a pair may collide under several keys
        .withColumn(
            "dist", F.expr(f"levenshtein(name_a, name_b, {FUZZY_MAX_DIST})")
        )
        .where((F.col("dist") >= 1) & (F.col("dist") <= FUZZY_MAX_DIST))
    )
    return (
        pairs.groupBy("nat", "dist")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(F.struct("key_a", "key_b")).alias("_ex"),
        )
        .select(
            F.col("nat").alias("nationkey"),
            "dist",
            "n_pairs",
            F.col("_ex.key_a").alias("example_a"),
            F.col("_ex.key_b").alias("example_b"),
        )
        .orderBy("nationkey", "dist")
    )


_SQL_FUZZY_KEYS = "\n  UNION ALL ".join(
    f"SELECT c_custkey, nat, c_name, nlen, {kid} AS keyid, {kv} AS keyval FROM cust"
    + (f" WHERE {guard}" if guard else "")
    for kid, kv, guard in _fuzzy_keys("c_name")
)

SQL_FUZZY_NAME_MATCHES = f"""
WITH cust AS (
  SELECT c_custkey, c_nationkey AS nat, c_name, LENGTH(c_name) AS nlen FROM customer
),
blocked_all AS (
  {_SQL_FUZZY_KEYS}
),
big AS (
  SELECT nat, nlen, keyid, keyval FROM (
    SELECT nat, nlen, keyid, keyval, COUNT(*) AS bn FROM blocked_all GROUP BY 1, 2, 3, 4
  ) WHERE bn > {FUZZY_MAX_BLOCK}
),
blocked AS (
  SELECT bl.* FROM blocked_all bl ANTI JOIN big g
    ON bl.nat = g.nat AND bl.nlen = g.nlen AND bl.keyid = g.keyid AND bl.keyval = g.keyval
),
cand AS (
  SELECT DISTINCT a.nat, a.c_custkey AS key_a, b.c_custkey AS key_b,
         a.c_name AS name_a, b.c_name AS name_b
  FROM blocked a JOIN blocked b
    ON a.nat = b.nat AND a.nlen = b.nlen
   AND a.keyid = b.keyid AND a.keyval = b.keyval
   AND a.c_custkey < b.c_custkey
),
pairs AS (
  SELECT nat, levenshtein(name_a, name_b) AS dist, key_a, key_b
  FROM cand
  WHERE levenshtein(name_a, name_b) BETWEEN 1 AND {FUZZY_MAX_DIST}
)
SELECT nat AS nationkey, dist, COUNT(*) AS n_pairs,
       MIN({{'key_a': key_a, 'key_b': key_b}}).key_a AS example_a,
       MIN({{'key_a': key_a, 'key_b': key_b}}).key_b AS example_b
FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of daily event volume: exact-integer OLS —
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with x = day ordinal and
    y = daily count, every sum an int64, one final double division (plus
    one for the intercept). The regression the ops dashboard fits to ask
    'is this stream growing?' — computed without a single float until the
    last step, so it is engine-exact. One two-level aggregation; the OLS
    runs on |types| × |days| rows."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type", F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("x")
    )
    daily = ev.groupBy("event_type", "x").agg(F.count(F.lit(1)).alias("y"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / F.col("n").cast("double")
    return s.select(
        "event_type",
        "n",
        (F.floor(slope * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("slope_per_day"),
        (F.floor(intercept * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("intercept"),
    ).orderBy("event_type")


SQL_EVENTS_TREND_SLOPE = """
WITH daily AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM daily GROUP BY 1
)
SELECT event_type, n,
       (floor((CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)
         AS slope_per_day,
       (floor(((CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)
         AS intercept
FROM s ORDER BY event_type
"""


QUERIES["fuzzy_name_matches"] = fuzzy_name_matches
QUERIES["events_trend_slope"] = events_trend_slope
ORACLES["fuzzy_name_matches"] = SQL_FUZZY_NAME_MATCHES
ORACLES["events_trend_slope"] = SQL_EVENTS_TREND_SLOPE


def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of daily event volume per type — the
    seasonality/momentum diagnostic next to events_trend_slope. Pearson r
    over (y_t, y_{t+1}) pairs from exact int64 sums; the only floating
    steps are two sqrt's and one division, in fixed order on both
    engines."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("x"),
    )
    daily = ev.groupBy("event_type", "x").agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("event_type").orderBy("x")
    pairs = daily.withColumn("y_next", F.lead("y").over(w)).where(
        F.col("y_next").isNotNull()
    )
    s = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sa"),
        F.sum("y_next").alias("sb"),
        F.sum(F.col("y") * F.col("y_next")).alias("sab"),
        F.sum(F.col("y") * F.col("y")).alias("saa"),
        F.sum(F.col("y_next") * F.col("y_next")).alias("sbb"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    da = (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    db = (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    r = num / (F.sqrt(da) * F.sqrt(db))
    return s.select(
        "event_type",
        "n",
        (F.floor(r * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("autocorr_lag1"),
    ).orderBy("event_type")


SQL_EVENTS_AUTOCORR_LAG1 = """
WITH daily AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT event_type, y,
         LEAD(y) OVER (PARTITION BY event_type ORDER BY x) AS y_next
  FROM daily
),
s AS (
  SELECT event_type, COUNT(*) AS n, SUM(y) AS sa, SUM(y_next) AS sb,
         SUM(y * y_next) AS sab, SUM(y * y) AS saa, SUM(y_next * y_next) AS sbb
  FROM pairs WHERE y_next IS NOT NULL GROUP BY 1
)
SELECT event_type, n,
       (floor((CAST(n * sab - sa * sb AS DOUBLE) /
               (sqrt(CAST(n * saa - sa * sa AS DOUBLE)) * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))))
              * 1000000.0 + 0.5) / 1000000.0) AS autocorr_lag1
FROM s ORDER BY event_type
"""


QUERIES["events_autocorr_lag1"] = events_autocorr_lag1
ORACLES["events_autocorr_lag1"] = SQL_EVENTS_AUTOCORR_LAG1


def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over daily volume per type: the day where
    the cumulative deviation from the overall mean peaks, plus the peak
    magnitude — the classic level-shift detector. Scaled to stay integer:
    CUSUM_t·n = n·Σ_{i<=t} y_i − t_rank·Σy is exact int64; the argmax tie
    breaks to the earliest day; only the final magnitude normalization
    divides. Two windows over the |types|×|days| aggregate."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("x"),
    )
    daily = ev.groupBy("event_type", "x").agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("event_type").orderBy("x")
    wall = Window.partitionBy("event_type")
    scored = (
        daily.withColumn("t_rank", F.row_number().over(w))
        .withColumn("cum_y", F.sum("y").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("sy", F.sum("y").over(wall))
        .withColumn(
            "cusum_scaled",
            F.abs(F.col("n") * F.col("cum_y") - F.col("t_rank") * F.col("sy")),
        )
    )
    wpick = Window.partitionBy("event_type").orderBy(F.desc("cusum_scaled"), F.asc("x"))
    return (
        scored.withColumn("pick", F.row_number().over(wpick))
        .where(F.col("pick") == 1)
        .select(
            "event_type",
            F.col("x").alias("changepoint_day"),
            (
                F.floor(
                    (F.col("cusum_scaled").cast("double") / F.col("n").cast("double"))
                    * 1000000.0
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("cusum_peak"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_CHANGEPOINT = """
WITH daily AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS t_rank,
         SUM(y) OVER (PARTITION BY event_type ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_y,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(y) OVER (PARTITION BY event_type) AS sy
  FROM daily
),
ranked AS (
  SELECT event_type, x,
         ABS(n * cum_y - t_rank * sy) AS cusum_scaled, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
           ORDER BY ABS(n * cum_y - t_rank * sy) DESC, x) AS pick
  FROM scored
)
SELECT event_type, x AS changepoint_day,
       (floor((CAST(cusum_scaled AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)
         AS cusum_peak
FROM ranked WHERE pick = 1 ORDER BY event_type
"""


QUERIES["events_changepoint"] = events_changepoint
ORACLES["events_changepoint"] = SQL_EVENTS_CHANGEPOINT


# Benford expected first-digit probabilities log10(1+1/d), written as
# literal doubles so both engines parse the identical constants (no libm)
_BENFORD = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829993,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen over order totals: observed first-digit shares
    vs the Benford expectation and the chi-square statistic per digit —
    the forensic-accounting anomaly test. Expected probabilities are
    literal constants (no runtime log), observed counts are exact ints,
    and every share/chi term is a fixed-order double expression. One
    map-side-combined 9-group aggregate."""
    orders = read_table(spark, sf_dir, "orders").select(
        F.substring(F.col("o_totalprice").cast("string"), 1, 1).cast("int").alias("d")
    )
    counts = orders.groupBy("d").agg(F.count(F.lit(1)).alias("obs"))
    n = read_table(spark, sf_dir, "orders").count()
    p = F.lit(0.0)
    for d, prob in _BENFORD.items():
        p = F.when(F.col("d") == d, F.lit(prob)).otherwise(p)
    exp = p * F.lit(float(n))
    chi = ((F.col("obs").cast("double") - exp) * (F.col("obs").cast("double") - exp)) / exp
    return counts.select(
        "d",
        "obs",
        (F.floor((F.col("obs").cast("double") / F.lit(float(n))) * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("obs_share"),
        (F.floor(p * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("benford_share"),
        (F.floor(chi * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("chi_term"),
    ).orderBy("d")


def _benford_case() -> str:
    whens = " ".join(f"WHEN d = {d} THEN {p!r}" for d, p in _BENFORD.items())
    return f"CASE {whens} ELSE 0.0 END"


SQL_BENFORD_AUDIT = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT) AS d FROM orders
),
counts AS (SELECT d, COUNT(*) AS obs FROM digits GROUP BY 1),
tot AS (SELECT COUNT(*) AS n FROM orders)
SELECT c.d, c.obs,
       (floor((CAST(c.obs AS DOUBLE) / CAST(t.n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) AS obs_share,
       (floor(({_benford_case().replace('d =', 'c.d =')}) * 1000000.0 + 0.5) / 1000000.0) AS benford_share,
       (floor((((CAST(c.obs AS DOUBLE) - ({_benford_case().replace('d =', 'c.d =')}) * CAST(t.n AS DOUBLE)) *
                (CAST(c.obs AS DOUBLE) - ({_benford_case().replace('d =', 'c.d =')}) * CAST(t.n AS DOUBLE))) /
               (({_benford_case().replace('d =', 'c.d =')}) * CAST(t.n AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0)
         AS chi_term
FROM counts c CROSS JOIN tot t
ORDER BY c.d
"""


QUERIES["benford_audit"] = benford_audit
ORACLES["benford_audit"] = SQL_BENFORD_AUDIT


BOOT_B = 32  # bootstrap replicas
# Poisson(1) CDF as literal constants (hash-uniform -> replica count);
# the tail (count > 5) is truncated at ~6e-4 mass — identical truncation
# on both engines, so the estimator is deterministic and oracle-exact
_POIS_CDF = [
    (0, 0.36787944117144233),
    (1, 0.7357588823428847),
    (2, 0.9196986029286058),
    (3, 0.9810118431238463),
    (4, 0.9963401531726563),
    (5, 0.9994058151824183),
]
_POW2_32 = float(1 << 32)

# The Poisson ladder only COMPARES the 32-bit uniform u = h/2^32 against the
# CDF edges, so the hex slice can be compared LEXICOGRAPHICALLY against the
# edge rendered as fixed-width lowercase hex: h < ceil(edge·2^32) ⟺ u < edge
# exactly (h is an integer; 2^32-scaling of a double is exact). This removes
# the per-replica conv(hex→int) + double division — measured 5.3s → 2.6s for
# the B=32 aggregate at sf0.1 — with bit-identical counts on both engines.
_POIS_HEX = [
    (k, format(math.ceil(edge * (1 << 32)), "08x")) for k, edge in _POIS_CDF
]


def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean order total —
    THE distributed bootstrap: instead of resampling rows (impossible in
    one pass), each row joins replica b with a Poisson(1) count derived
    from a salted hash. All B replicas accumulate in ONE scan as 2·B
    conditional int64 aggregates (no data explosion, no shuffle growth);
    replica means then sort on B rows. Counts come from literal hex CDF
    breakpoints (see _POIS_HEX), sums are exact scaled int64 — the whole
    estimator is engine-deterministic, down to the CI bounds."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(12,4)") * 10000).cast("bigint").alias("xi"),
    )
    # one md5 yields 32 hex chars = FOUR independent 8-hex uniforms;
    # replica b reads slice b%4 of hash b//4 (8 md5 calls total for B=32).
    # The hashes are materialized ONCE in their own projection so no
    # replica expression re-evaluates an md5.
    hashed = orders.select(
        "xi",
        *[
            F.md5(F.concat(F.lit(f"boot{g}:"), F.col("o_orderkey").cast("string"))).alias(f"h{g}")
            for g in range(BOOT_B // 4)
        ],
    )

    def _count(b: int) -> F.Column:
        grp, slot = divmod(b, 4)
        s = F.substring(F.col(f"h{grp}"), 1 + 8 * slot, 8)
        c = F.lit(6)
        for k, hx in reversed(_POIS_HEX):
            c = F.when(s < F.lit(hx), F.lit(k)).otherwise(c)
        return c

    # materialize each replica count ONCE in a projection; referencing the
    # CASE ladder from two aggregates would evaluate it twice per row
    with_counts = hashed.select(
        "xi", *[_count(b).alias(f"c{b}") for b in range(BOOT_B)]
    )
    aggs = []
    for b in range(BOOT_B):
        aggs.append(F.sum(F.col(f"c{b}") * F.col("xi")).alias(f"s{b}"))
        aggs.append(F.sum(F.col(f"c{b}")).alias(f"n{b}"))
    row = with_counts.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("replica"),
                        (
                            F.floor(
                                (
                                    F.col(f"s{b}").cast("double")
                                    / (F.col(f"n{b}").cast("double") * F.lit(10000.0))
                                )
                                * 1000000.0
                                + F.lit(0.5)
                            )
                            / 1000000.0
                        ).alias("mean"),
                    )
                    for b in range(BOOT_B)
                ]
            )
        ).alias("r")
    ).select("r.replica", "r.mean")
    w = Window.orderBy("mean", "replica")
    ranked = stacked.withColumn("rk", F.row_number().over(w))
    lo_rk, hi_rk = 2, BOOT_B - 1  # ~95% interval from 32 ordered replicas
    return ranked.select(
        "replica",
        "mean",
        "rk",
        F.max(F.when(F.col("rk") == lo_rk, F.col("mean"))).over(
            Window.partitionBy(F.lit(1))
        ).alias("ci_low"),
        F.max(F.when(F.col("rk") == hi_rk, F.col("mean"))).over(
            Window.partitionBy(F.lit(1))
        ).alias("ci_high"),
    ).orderBy("rk")


def _sql_pois_count(b: int) -> str:
    grp, slot = divmod(b, 4)
    s = f"substr(h{grp}, {1 + 8 * slot}, 8)"
    expr = "6"
    for k, hx in reversed(_POIS_HEX):
        expr = f"CASE WHEN {s} < '{hx}' THEN {k} ELSE {expr} END"
    return expr


def _sql_bootstrap() -> str:
    hashes = ", ".join(
        f"md5('boot{g}:' || CAST(o_orderkey AS VARCHAR)) AS h{g}"
        for g in range(BOOT_B // 4)
    )
    cols = ", ".join(
        f"SUM({_sql_pois_count(b)} * xi) AS s{b}, "
        f"SUM({_sql_pois_count(b)}) AS n{b}"
        for b in range(BOOT_B)
    )
    means = ", ".join(
        f"(floor((CAST(s{b} AS DOUBLE) / (CAST(n{b} AS DOUBLE) * 10000.0)) * 1000000.0 + 0.5) / 1000000.0)"
        for b in range(BOOT_B)
    )
    return f"""
WITH orders_x AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,4)) * 10000 AS BIGINT) AS xi, {hashes}
  FROM orders
),
sums AS (SELECT {cols} FROM orders_x),
stacked AS (
  SELECT unnest(range(0, {BOOT_B})) AS replica, unnest([{means}]) AS mean FROM sums
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY mean, replica) AS rk FROM stacked
)
SELECT replica, mean, rk,
       (SELECT mean FROM ranked WHERE rk = 2) AS ci_low,
       (SELECT mean FROM ranked WHERE rk = {BOOT_B - 1}) AS ci_high
FROM ranked ORDER BY rk
"""


QUERIES["bootstrap_mean_ci"] = bootstrap_mean_ci
ORACLES["bootstrap_mean_ci"] = _sql_bootstrap()


def market_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of supplier revenue per part
    brand — the marketplace-health metric (10000·Σ share²). Revenue stays
    decimal through the per-(brand, supplier) aggregate; the share squares
    work on the scaled-int form of those exact decimals, so Σshare² is a
    ratio of exact integers and the index is engine-deterministic. Joins:
    lineitem⋈part broadcast; everything after runs on the |brands×suppliers|
    aggregate.

    Overflow headroom: r (cell revenue ×1e8) squares inside decimal(38),
    so per-(brand, supplier) revenue to ~1e10 money units is safe — far
    past any realistic SF; drop the square scale to 1e4 if a corpus ever
    approaches it."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (
            F.col("l_extendedprice").cast("decimal(10,4)")
            * (F.lit(1).cast("decimal(10,4)") - F.col("l_discount").cast("decimal(10,4)"))
        ).cast("decimal(18,8)").alias("net"),
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cell = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum("net").alias("rev_dec"))
        # exact integer form of the decimal(·,8) revenue for the squares
        .withColumn("r", F.expr("CAST(rev_dec * 100000000 AS DECIMAL(38,0))"))
    )
    per_brand = cell.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("r").alias("tot"),
        F.sum(F.expr("r * r")).alias("sqsum"),
    )
    hhi = (
        F.lit(10000.0)
        * F.col("sqsum").cast("double")
        / (F.col("tot").cast("double") * F.col("tot").cast("double"))
    )
    return per_brand.select(
        "p_brand",
        "n_suppliers",
        (F.floor(hhi * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("hhi"),
    ).orderBy("p_brand")


SQL_MARKET_CONCENTRATION_HHI = """
WITH cell AS (
  SELECT p.p_brand, l.l_suppkey,
         CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(10,4)) *
              (CAST(1 AS DECIMAL(10,4)) - CAST(l.l_discount AS DECIMAL(10,4))) AS DECIMAL(18,8)))
              * 100000000 AS DECIMAL(38,0)) AS r
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
per_brand AS (
  SELECT p_brand, COUNT(*) AS n_suppliers, SUM(r) AS tot, SUM(r * r) AS sqsum
  FROM cell GROUP BY 1
)
SELECT p_brand, n_suppliers,
       (floor((10000.0 * CAST(sqsum AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)))
              * 1000000.0 + 0.5) / 1000000.0) AS hhi
FROM per_brand ORDER BY p_brand
"""


QUERIES["market_concentration_hhi"] = market_concentration_hhi
ORACLES["market_concentration_hhi"] = SQL_MARKET_CONCENTRATION_HHI


AGING_ANCHOR = "1998-08-01"  # as-of date for backlog aging (inside data range)
AGING_EDGES = (30, 90, 365)  # bucket edges in days


def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: orders not yet finalized (status O or P) as
    of AGING_ANCHOR, bucketed by age in days (0-30 / 31-90 / 91-365 / 365+)
    per (status, priority) with order counts and decimal-exact open value —
    the receivables-style aging report every order-management warehouse
    runs. Pure scan + small aggregate, decimal money math."""
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus").isin("O", "P"))
        .where(F.col("o_orderdate") <= F.lit(AGING_ANCHOR).cast("date"))
        .select(
            "o_orderstatus",
            "o_orderpriority",
            F.datediff(
                F.lit(AGING_ANCHOR).cast("date"), F.col("o_orderdate")
            ).alias("age_days"),
            F.col("o_totalprice").cast("decimal(12,4)").alias("price"),
        )
    )
    e1, e2, e3 = AGING_EDGES
    bucket = (
        F.when(F.col("age_days") <= e1, F.lit("0-30"))
        .when(F.col("age_days") <= e2, F.lit("31-90"))
        .when(F.col("age_days") <= e3, F.lit("91-365"))
        .otherwise(F.lit("365+"))
    )
    return (
        orders.withColumn("age_bucket", bucket)
        .groupBy("o_orderstatus", "o_orderpriority", "age_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("price"), 4).cast("double").alias("open_value"),
        )
        .orderBy("o_orderstatus", "o_orderpriority", "age_bucket")
    )


SQL_ORDERS_BACKLOG_AGING = f"""
WITH open_orders AS (
  SELECT o_orderstatus, o_orderpriority,
         date_diff('day', o_orderdate, TIMESTAMP '{AGING_ANCHOR} 00:00:00') AS age_days,
         CAST(o_totalprice AS DECIMAL(12,4)) AS price
  FROM orders
  WHERE o_orderstatus IN ('O', 'P') AND o_orderdate <= TIMESTAMP '{AGING_ANCHOR} 00:00:00'
)
SELECT o_orderstatus, o_orderpriority,
       CASE WHEN age_days <= {AGING_EDGES[0]} THEN '0-30'
            WHEN age_days <= {AGING_EDGES[1]} THEN '31-90'
            WHEN age_days <= {AGING_EDGES[2]} THEN '91-365'
            ELSE '365+' END AS age_bucket,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(price), 4) AS DOUBLE) AS open_value
FROM open_orders
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

QUERIES["orders_backlog_aging"] = orders_backlog_aging
ORACLES["orders_backlog_aging"] = SQL_ORDERS_BACKLOG_AGING


CUSUM_H_MULT = 0.9  # alarm threshold in units of n·sd — sited INSIDE the
# demo corpus's max-stat distribution (observed 0.78-1.30 across SFs; a
# textbook 4-5·sd bar never fires on a driftless synthetic corpus and the
# alarm column would be vacuous — the repetition_score r3 lesson)


def events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential one-sided CUSUM monitor over daily volume per type —
    events_changepoint finds the retrospective argmax; this is the
    MONITORING form that fires alarms as drift accumulates and RESETS after
    dips. The reset recursion S_t = max(0, S_{t-1} + dev_t) has the closed
    window form S_t = C_t − min(0, min_{s≤t} C_s) with C the running
    deviation sum, so the whole statistic is two windows per type — no
    sequential pass. Deviations stay exact int64 (n·y_t − Σy, the
    changepoint scaling); only the final sd normalization divides. Alarm
    when S_t > CUSUM_H_MULT · n · sd."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("x"),
    )
    daily = ev.groupBy("event_type", "x").agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("event_type").orderBy("x")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("event_type")
    scored = (
        daily.withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("sy", F.sum("y").over(wall))
        # exact-integer variance pieces: n·Σy² − (Σy)²  (population var ·n²)
        .withColumn("syy", F.sum(F.col("y") * F.col("y")).over(wall))
        .withColumn("dev", F.col("n") * F.col("y") - F.col("sy"))  # n·(y−mean)
        .withColumn("c", F.sum("dev").over(wrun))
        .withColumn("cmin", F.least(F.lit(0), F.min("c").over(wrun)))
        .withColumn("s", F.col("c") - F.col("cmin"))
    )
    # sd of daily y (population), in the same n-scaled units as dev:
    # sd_scaled = sqrt(n·(n·Σy² − (Σy)²)) — matches dev = n·(y−mean)
    sd_scaled = F.sqrt(
        (F.col("n") * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))).cast("double")
    )
    h = F.lit(float(CUSUM_H_MULT)) * sd_scaled
    flagged = scored.withColumn("alarm", F.col("s").cast("double") > h)
    return (
        flagged.groupBy("event_type")
        .agg(
            F.max("n").alias("n_days"),
            F.sum(F.col("alarm").cast("long")).alias("n_alarms"),
            F.min(F.when(F.col("alarm"), F.col("x"))).alias("first_alarm_day"),
            H.round6(
                F.max(F.col("s").cast("double")) / F.max(sd_scaled)
            ).alias("max_stat_sd"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_CUSUM_ALARMS = f"""
WITH daily AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT event_type, x, y,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(y) OVER (PARTITION BY event_type) AS sy,
         SUM(y * y) OVER (PARTITION BY event_type) AS syy
  FROM daily
),
scored AS (
  SELECT *, SUM(n * y - sy) OVER (PARTITION BY event_type ORDER BY x ROWS UNBOUNDED PRECEDING) AS c
  FROM base
),
stat AS (
  SELECT *, c - LEAST(0, MIN(c) OVER (PARTITION BY event_type ORDER BY x ROWS UNBOUNDED PRECEDING)) AS s,
         sqrt(CAST(n * (n * syy - sy * sy) AS DOUBLE)) AS sd_scaled
  FROM scored
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN CAST(s AS DOUBLE) > {float(CUSUM_H_MULT)} * sd_scaled THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
       MIN(CASE WHEN CAST(s AS DOUBLE) > {float(CUSUM_H_MULT)} * sd_scaled THEN x END) AS first_alarm_day,
       {H.sql_round6("MAX(CAST(s AS DOUBLE)) / MAX(sd_scaled)")} AS max_stat_sd
FROM stat GROUP BY event_type ORDER BY event_type
"""

QUERIES["events_cusum_alarms"] = events_cusum_alarms
ORACLES["events_cusum_alarms"] = SQL_EVENTS_CUSUM_ALARMS


EWMA_TERMS = 16  # dyadic EWMA window: weights 2^-1 .. 2^-16 (alpha = 1/2)


def events_ewma16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of hourly metric volume per
    event type, with alpha = 1/2 truncated at 16 terms — the smoothing the
    ops dashboard overlays on a bursty series. A recursive EWMA cannot be
    expressed engine-portably (each step compounds float error in
    engine-specific order), but the dyadic 16-term form is EXACT integer
    math: ewma_t = (Σ_{j=0..15} v_{t-j}·2^(15-j)) / 2^16 over 1e-6-quantized
    hourly sums, computed as one truncating integer division — weights sum
    to 1 - 2^-16, and both engines produce bit-identical results.

    Scale: one map-side-combined aggregation to |types|×|hours| rows, then
    a 16-lag window over that metadata-sized series (partition-local, no
    corpus data in the window)."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.floor(F.col("value") * 1000000.0 + F.lit(0.5)).cast("long").alias("v_micro"),
    )
    hourly = ev.groupBy("event_type", "hour").agg(F.sum("v_micro").alias("v_micro"))
    w = Window.partitionBy("event_type").orderBy("hour")
    num = None
    for j in range(EWMA_TERMS):
        term = F.coalesce(F.lag("v_micro", j).over(w), F.lit(0)) * F.lit(2 ** (EWMA_TERMS - 1 - j))
        num = term if num is None else num + term
    return (
        hourly.withColumn("num_col", num)
        .withColumn("n_terms", F.least(F.row_number().over(w), F.lit(EWMA_TERMS)))
        .select(
            "event_type",
            "hour",
            "v_micro",
            F.expr(f"num_col div {2 ** EWMA_TERMS}").alias("ewma_micro"),
            "n_terms",
        )
    )


def _sql_ewma16() -> str:
    terms = " + ".join(
        f'COALESCE(LAG(v_micro, {j}) OVER w, 0) * {2 ** (EWMA_TERMS - 1 - j)}'
        for j in range(EWMA_TERMS)
    )
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour, v_micro,
       CAST(({terms}) // {2 ** EWMA_TERMS} AS BIGINT) AS ewma_micro,
       CAST(LEAST(ROW_NUMBER() OVER w, {EWMA_TERMS}) AS INT) AS n_terms
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour)
ORDER BY event_type, hour
"""


QUERIES["events_ewma16"] = events_ewma16
ORACLES["events_ewma16"] = _sql_ewma16()


def _trunc_div(a: int, b: int) -> int:
    """Truncate-toward-zero division for b > 0 (DuckDB // on HUGEINT and
    Spark div semantics; Python // floors, differing on negatives)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def events_seasonality_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of a metric's variance is DAILY SEASONALITY: per event
    type, the one-way ANOVA decomposition of value variance across
    hour-of-day groups — seasonal_share = SS_between / SS_total — plus the
    peak hour. Near 1 = the series is mostly a daily cycle (alert
    thresholds should be hour-conditioned, cf. events_anomaly); near 0 =
    hour-of-day carries no signal.

    Exactness: values quantize to 1e-3 ints; per-(type, hour) sums and
    sum-of-squares are exact integers (Spark: DECIMAL(38,0) accumulators —
    a plain long sum of squared milli-values would overflow ~1e18; DuckDB:
    HUGEINT). The |types|x24-row aggregate collects to the driver (the
    bounded-solve pattern of embedding_pca_power), where arbitrary-
    precision ints compute SSB/SST with truncating division mirrored
    operation-for-operation by the HUGEINT oracle, and the one double
    division happens per type at the end. Peak-hour ties rank by the
    1e6-quantized integer mean (desc), then hour (asc) — both engines."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.hour("ts").alias("hour"),
        F.floor(F.col("value") * 1000.0 + F.lit(0.5)).cast("long").alias("v"),
    )
    g = ev.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s_h"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("q_h"),
    )
    rows = g.collect()  # bounded: |types| x 24
    out_schema = "event_type string, n_events bigint, seasonal_share double, peak_hour int"
    if not rows:
        return spark.createDataFrame([], out_schema)
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (int(r["hour"]), int(r["n_h"]), int(r["s_h"]), int(r["q_h"]))
        )
    out = []
    for et, hs in sorted(by_type.items()):
        n = sum(h[1] for h in hs)
        s = sum(h[2] for h in hs)
        q = sum(h[3] for h in hs)
        grand = _trunc_div(s * s, n)
        sst = q - grand
        ssb = sum(_trunc_div(h[2] * h[2], h[1]) for h in hs) - grand
        share = 0.0 if sst == 0 else float(ssb) / float(sst)
        share = _round6_share(share)
        peak = min(hs, key=lambda h: (-_trunc_div(h[2] * 1000000, h[1]), h[0]))[0]
        out.append((et, n, share, peak))
    return spark.createDataFrame(out, out_schema)


def _round6_share(x: float) -> float:
    import math

    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


SQL_EVENTS_SEASONALITY_ANOVA = f"""
WITH base AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
         CAST(floor("value" * 1000.0 + 0.5) AS BIGINT) AS v
  FROM events
),
g AS (
  SELECT event_type, hour, COUNT(*) AS n_h,
         CAST(SUM(v) AS HUGEINT) AS s_h,
         CAST(SUM(v * v) AS HUGEINT) AS q_h
  FROM base GROUP BY 1, 2
),
t AS (
  SELECT event_type, CAST(SUM(n_h) AS BIGINT) AS n,
         SUM(s_h) AS s, SUM(q_h) AS q,
         SUM(s_h * s_h // n_h) AS ssb_part
  FROM g GROUP BY 1
),
peak AS (
  SELECT event_type, hour AS peak_hour FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      ORDER BY (s_h * 1000000 // n_h) DESC, hour) AS rn
    FROM g
  ) WHERE rn = 1
)
SELECT t.event_type, t.n AS n_events,
       {H.sql_round6("CASE WHEN t.q - (t.s * t.s // t.n) = 0 THEN 0.0 ELSE CAST(t.ssb_part - (t.s * t.s // t.n) AS DOUBLE) / CAST(t.q - (t.s * t.s // t.n) AS DOUBLE) END")} AS seasonal_share,
       CAST(peak.peak_hour AS INT) AS peak_hour
FROM t JOIN peak ON t.event_type = peak.event_type
ORDER BY t.event_type
"""

QUERIES["events_seasonality_anova"] = events_seasonality_anova
ORACLES["events_seasonality_anova"] = SQL_EVENTS_SEASONALITY_ANOVA


# ---------------------------------------------------------------------------
# events_holt_linear (round 7)
# ---------------------------------------------------------------------------

HOLT_TERMS = 16


def _holt_kernels(terms: int = HOLT_TERMS):
    """Impulse responses of Holt's linear method at alpha = beta = 1/2:
    l_t = Σ_j hl[j]·x_{t-j}, b_t = Σ_j hb[j]·x_{t-j}. With both smoothing
    constants dyadic, every coefficient is an EXACT dyadic rational
    (denominators <= 2^(2j+2)), hence exactly representable as a double —
    the same trick that makes events_ewma16 engine-portable, extended to
    the two-state trend recursion. Computed with Fraction so the emitted
    literals are exact."""
    from fractions import Fraction as Fr

    half = Fr(1, 2)
    l, b = Fr(0), Fr(0)
    hl, hb = [], []
    for t in range(terms):
        x = Fr(1) if t == 0 else Fr(0)
        l_new = half * x + half * (l + b)
        b_new = half * (l_new - l) + half * b
        l, b = l_new, b_new
        hl.append(float(l))
        hb.append(float(b))
    return hl, hb


def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + linear trend) of hourly
    metric volume per event type, alpha = beta = 1/2, truncated at 16
    terms — the trend-aware sibling of events_ewma16 (EWMA lags a trending
    series by design; Holt's one-step forecast level+trend does not).

    A recursive Holt is not engine-portable (compounded float error in
    engine-specific order); the 16-term truncated convolution is: the
    kernels are exact dyadic doubles, the lag inputs are exact int64
    micro-sums, and each row's level/trend is ONE fixed-order expression
    (in-row left-to-right sum — both engines evaluate the identical
    literal expression tree). Output: smoothed level, trend, and the
    one-step forecast level + trend, all round6 in value units.

    Scale: identical to events_ewma16 — one map-side-combined hourly
    aggregate, then 16-lag windows over the |types| x |hours| metadata
    series."""
    from ..session import read_events

    hl, hb = _holt_kernels()
    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.floor(F.col("value") * 1000000.0 + F.lit(0.5)).cast("long").alias("v_micro"),
    )
    hourly = ev.groupBy("event_type", "hour").agg(F.sum("v_micro").alias("v_micro"))
    w = Window.partitionBy("event_type").orderBy("hour")
    lvl = None
    trd = None
    for j in range(HOLT_TERMS):
        x = F.coalesce(F.lag("v_micro", j).over(w), F.lit(0)).cast("double")
        tl = x * F.lit(hl[j])
        tb = x * F.lit(hb[j])
        lvl = tl if lvl is None else lvl + tl
        trd = tb if trd is None else trd + tb
    return (
        hourly.withColumn("lvl", lvl)
        .withColumn("trd", trd)
        .withColumn("n_terms", F.least(F.row_number().over(w), F.lit(HOLT_TERMS)))
        .select(
            "event_type",
            "hour",
            "v_micro",
            H.round6(F.col("lvl") / F.lit(1e6)).alias("holt_level"),
            H.round6(F.col("trd") / F.lit(1e6)).alias("holt_trend"),
            H.round6((F.col("lvl") + F.col("trd")) / F.lit(1e6)).alias("holt_forecast"),
            "n_terms",
        )
        .orderBy("event_type", "hour")
    )


def _sql_holt_linear() -> str:
    hl, hb = _holt_kernels()
    lvl = " + ".join(
        f"CAST(COALESCE(LAG(v_micro, {j}) OVER w, 0) AS DOUBLE) * {hl[j]!r}"
        for j in range(HOLT_TERMS)
    )
    trd = " + ".join(
        f"CAST(COALESCE(LAG(v_micro, {j}) OVER w, 0) AS DOUBLE) * {hb[j]!r}"
        for j in range(HOLT_TERMS)
    )
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour, v_micro,
       {H.sql_round6(f'({lvl}) / 1e6')} AS holt_level,
       {H.sql_round6(f'({trd}) / 1e6')} AS holt_trend,
       {H.sql_round6(f'(({lvl}) + ({trd})) / 1e6')} AS holt_forecast,
       CAST(LEAST(ROW_NUMBER() OVER w, {HOLT_TERMS}) AS INT) AS n_terms
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour)
ORDER BY event_type, hour
"""


QUERIES["events_holt_linear"] = events_holt_linear
ORACLES["events_holt_linear"] = _sql_holt_linear()


# ---------------------------------------------------------------------------
# events_acf_profile (round 8) — multi-lag autocorrelation spectrum
# ---------------------------------------------------------------------------

ACF_LAGS = 24  # hourly lags 1..24: one diurnal cycle


def _acf_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared correlogram frame (event_type, lag, n, acf, n0): Pearson r
    per (type, lag 1..ACF_LAGS) over the hours PRESENT in the series,
    round6-quantized so downstream consumers (the profile view and the
    Ljung–Box portmanteau) read IDENTICAL doubles on both engines; n0 is
    the type's present-hour count (the series length the Q statistic
    normalizes by). sqrt is IEEE-correctly-rounded — portable, unlike
    pow/log (the libm rule)."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type", (F.unix_millis("ts") / F.lit(3600000)).cast("long").alias("hr")
    )
    cells = (
        ev.groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint(eager=True)  # both sides of the lag join
    )
    left = cells.select(
        "event_type",
        "hr",
        F.col("y").alias("ya"),
        F.explode(F.sequence(F.lit(1), F.lit(ACF_LAGS))).alias("lag"),
    ).withColumn("hr2", F.col("hr") + F.col("lag"))
    right = cells.select(
        "event_type", F.col("hr").alias("hr2"), F.col("y").alias("yb")
    )
    pairs = left.join(right, ["event_type", "hr2"])
    s = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ya").alias("sa"),
        F.sum("yb").alias("sb"),
        F.sum(F.col("ya") * F.col("yb")).alias("sab"),
        F.sum(F.col("ya") * F.col("ya")).alias("saa"),
        F.sum(F.col("yb") * F.col("yb")).alias("sbb"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    da = (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    db = (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    r = num / (F.sqrt(da) * F.sqrt(db))
    n0 = cells.groupBy("event_type").agg(F.count(F.lit(1)).alias("n0"))
    return (
        s.where((F.col("n") >= 2))
        .join(n0, "event_type")
        .select(
            "event_type",
            "lag",
            "n",
            (F.floor(r * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("acf"),
            "n0",
        )
    )


def events_acf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation PROFILE of each type's hourly volume at lags 1..24 —
    events_autocorr_lag1 generalized from one lag-1 daily point to the
    full diurnal correlogram (a peak at lag 24 = daily seasonality, fast
    decay = bursty noise; the hypothesis-free companion to
    events_seasonality_anova, in the time domain where events_haar_energy
    is the scale domain). Pearson r per (type, lag) over the (y_t, y_{t+ℓ})
    pairs of hours PRESENT in the series, same estimator as the lag-1 op.

    Scale: events aggregate once to the (type, hour) cell frame
    (localCheckpointed — it feeds both join sides); the lag fan-out
    (cells x 24) and the self-equi-join on (type, hr+lag) stay on that
    metadata frame. All sums are exact int64; per (type, lag) the only
    floating steps are two sqrt's and one division in fixed order,
    round6-quantized (the events_autocorr_lag1 discipline)."""
    return (
        _acf_quantized(spark, sf_dir)
        .select("event_type", "lag", "n", "acf")
        .orderBy("event_type", "lag")
    )


_SQL_ACF_CTES = f"""cells AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS hr, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, l.lag, a.y AS ya, b.y AS yb
  FROM cells a
  CROSS JOIN (SELECT unnest(generate_series(1, {ACF_LAGS})) AS lag) l
  JOIN cells b ON a.event_type = b.event_type AND b.hr = a.hr + l.lag
),
s AS (
  SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(ya) AS sa, SUM(yb) AS sb, SUM(ya * yb) AS sab,
         SUM(ya * ya) AS saa, SUM(yb * yb) AS sbb
  FROM pairs GROUP BY 1, 2
),
acfn0 AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n0 FROM cells GROUP BY 1
),
acfq AS (
  SELECT s.event_type, CAST(s.lag AS INT) AS lag, s.n,
         (floor((CAST(n * sab - sa * sb AS DOUBLE) /
                 (sqrt(CAST(n * saa - sa * sa AS DOUBLE)) * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))))
                * 1000000.0 + 0.5) / 1000000.0) AS acf,
         z.n0
  FROM s JOIN acfn0 z ON s.event_type = z.event_type
  WHERE s.n >= 2
)"""

SQL_EVENTS_ACF_PROFILE = f"""
WITH {_SQL_ACF_CTES}
SELECT event_type, lag, n, acf FROM acfq ORDER BY event_type, lag
"""


QUERIES["events_acf_profile"] = events_acf_profile
ORACLES["events_acf_profile"] = SQL_EVENTS_ACF_PROFILE


# ---------------------------------------------------------------------------
# events_ljung_box (round 9) — portmanteau whiteness test on the ACF
# ---------------------------------------------------------------------------

LB_CHI2_CRIT = 36.415  # χ²(0.95, df=24): reject white noise at α=0.05
# when ALL 24 lags are present (k_lags < 24 → flag false, honest


def events_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau Q on the shared quantized correlogram:
    Q = n0(n0+2)·Σ_k acf_k²/(n0−k) per type — the single-number "is this
    series white noise at all?" companion to events_acf_profile's 24-row
    spectrum (Ljung & Box 1978). Determinism: acf_k is the 6dp-quantized
    double both engines already agree on (_acf_quantized); each term is
    quantized to a 1e-12 int64 in a FIXED expression order
    (floor(acf²/(n0−lag)·1e12 + 0.5)) before the order-free integer SUM,
    and Q is two final double multiplications. Lags with n0 ≤ lag drop on
    both engines (the term is undefined for them; sparse-series guard).
    white_noise_rejected fires only at the full k=24 spectrum against
    χ²(0.95,24) — a partial spectrum never claims significance.

    Scale: everything past the shared (type, hour) rollup runs on the
    ≤ |types|·24 correlogram frame."""
    t = _acf_quantized(spark, sf_dir).where(F.col("n0") > F.col("lag"))
    per = t.select(
        "event_type",
        "n0",
        F.floor(
            (F.col("acf") * F.col("acf"))
            / (F.col("n0") - F.col("lag")).cast("double")
            * F.lit(1000000000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("tq"),
    )
    agg = per.groupBy("event_type", "n0").agg(
        F.sum("tq").alias("sumq"), F.count(F.lit(1)).alias("k_lags")
    )
    q = (F.col("n0") * (F.col("n0") + F.lit(2))).cast("double") * (
        F.col("sumq").cast("double") / F.lit(1000000000000.0)
    )
    return agg.select(
        "event_type",
        F.col("n0").alias("n_hours"),
        "k_lags",
        q.alias("q_stat"),
        ((F.col("k_lags") == F.lit(ACF_LAGS)) & (q > F.lit(LB_CHI2_CRIT))).alias(
            "white_noise_rejected"
        ),
    )


SQL_EVENTS_LJUNG_BOX = f"""
WITH {_SQL_ACF_CTES},
lbper AS (
  SELECT event_type, n0,
         CAST(floor((acf * acf) / CAST(n0 - lag AS DOUBLE) * 1000000000000.0 + 0.5)
              AS BIGINT) AS tq
  FROM acfq WHERE n0 > lag
),
lbagg AS (
  SELECT event_type, n0, CAST(SUM(tq) AS BIGINT) AS sumq,
         CAST(COUNT(*) AS BIGINT) AS k_lags
  FROM lbper GROUP BY 1, 2
)
SELECT event_type, n0 AS n_hours, k_lags,
       CAST(n0 * (n0 + 2) AS DOUBLE) * (CAST(sumq AS DOUBLE) / 1000000000000.0)
         AS q_stat,
       (k_lags = {ACF_LAGS} AND
        CAST(n0 * (n0 + 2) AS DOUBLE) * (CAST(sumq AS DOUBLE) / 1000000000000.0)
          > {LB_CHI2_CRIT}) AS white_noise_rejected
FROM lbagg
"""

QUERIES["events_ljung_box"] = events_ljung_box
ORACLES["events_ljung_box"] = SQL_EVENTS_LJUNG_BOX


# ---------------------------------------------------------------------------
# events_hampel_filter (round 9) — rolling-median/MAD outlier detection
# ---------------------------------------------------------------------------

HAMPEL_HALF = 3  # neighborhood half-width in PRESENT hours (rank-based)
HAMPEL_NSIG = 3  # flag when |y - med| > NSIG * MAD (raw MAD — no 1.4826
# gaussian-consistency factor: the constant would drag an irrational into
# the integer decision rule; the raw-MAD variant is the documented choice)


def events_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier filter over each type's hourly volume: every hour is
    judged against the MEDIAN of its ±HAMPEL_HALF neighborhood (by rank
    over present hours) and the median absolute deviation FROM THAT
    median — the robust alternative to events_anomaly's mean/σ z-score
    (one genuine spike inflates a window's σ enough to mask a second
    spike; the median/MAD pair has a 50% breakdown point, so bursts
    cannot hide each other). Median-of-integers arithmetic stays exact:
    med2 = 2·median and mad4 = 4·MAD are integers (interpolated medians
    of ints land on .0/.5), so the decision 2·|2y−med2| > NSIG·mad4 is
    pure int64 — no float comparison can diverge across engines.

    Scale: events collapse once to the (type, hour) cell frame; the ±3
    neighborhood fan-out (≤7×) and both grouped medians run on that
    metadata-sized frame — the acf/theil_sen audit shape."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type", (F.unix_millis("ts") / F.lit(3600000)).cast("long").alias("hr")
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    idx = (
        ev.groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
        .withColumn("rn", F.row_number().over(w))
        .localCheckpoint(eager=True)  # center + neighbor sides of the join
    )
    nb = idx.select(
        "event_type", F.col("rn").alias("rn_b"), F.col("y").alias("yb")
    )
    joined = idx.join(nb, "event_type").where(
        (F.col("rn_b") >= F.col("rn") - HAMPEL_HALF)
        & (F.col("rn_b") <= F.col("rn") + HAMPEL_HALF)
    )
    med = joined.groupBy("event_type", "hr", "rn", "y").agg(
        (F.expr("percentile(yb, 0.5)") * 2).cast("long").alias("med2"),
        F.count(F.lit(1)).alias("n_win"),
    )
    dev = joined.join(
        med.select("event_type", "rn", "med2", "n_win"), ["event_type", "rn"]
    ).select(
        "event_type", "hr", "rn", "y", "med2", "n_win",
        F.abs(F.lit(2) * F.col("yb") - F.col("med2")).alias("dev2"),
    )
    mad = dev.groupBy("event_type", "hr", "y", "med2", "n_win").agg(
        (F.expr("percentile(dev2, 0.5)") * 2).cast("long").alias("mad4")
    )
    return mad.select(
        "event_type",
        "hr",
        "y",
        "n_win",
        (F.col("med2") / F.lit(2.0)).alias("med"),
        (F.col("mad4") / F.lit(4.0)).alias("mad"),
        (
            F.lit(2) * F.abs(F.lit(2) * F.col("y") - F.col("med2"))
            > F.lit(HAMPEL_NSIG) * F.col("mad4")
        ).alias("is_outlier"),
    )


SQL_EVENTS_HAMPEL = f"""
WITH hcells AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS hr, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
hidx AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS rn
  FROM hcells
),
hnb AS (
  SELECT a.event_type, a.hr, a.rn, a.y, b.y AS yb
  FROM hidx a JOIN hidx b
    ON a.event_type = b.event_type
   AND b.rn BETWEEN a.rn - {HAMPEL_HALF} AND a.rn + {HAMPEL_HALF}
),
hmed AS (
  SELECT event_type, hr, rn, y,
         CAST(quantile_cont(yb, 0.5) * 2 AS BIGINT) AS med2,
         CAST(COUNT(*) AS BIGINT) AS n_win
  FROM hnb GROUP BY 1, 2, 3, 4
),
hdev AS (
  SELECT n.event_type, n.hr, n.y, n.rn, m.med2, m.n_win,
         ABS(2 * n.yb - m.med2) AS dev2
  FROM hnb n JOIN hmed m ON n.event_type = m.event_type AND n.rn = m.rn
),
hmad AS (
  SELECT event_type, hr, y, med2, n_win,
         CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
  FROM hdev GROUP BY 1, 2, 3, 4, 5
)
SELECT event_type, hr, y, n_win,
       med2 / 2.0 AS med, mad4 / 4.0 AS mad,
       (2 * ABS(2 * y - med2) > {HAMPEL_NSIG} * mad4) AS is_outlier
FROM hmad ORDER BY event_type, hr
"""

QUERIES["events_hampel_filter"] = events_hampel_filter
ORACLES["events_hampel_filter"] = SQL_EVENTS_HAMPEL


# ---------------------------------------------------------------------------
# events_seasonal_median_decompose (round 9) — robust STL-lite
# ---------------------------------------------------------------------------

STL_TREND_HALF = 12  # trend window: ±12 present hours (~one day)


def _stl_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared STL-lite integer frame: (event_type, hr, y, seasonal2, d2,
    trend4) with seasonal2 = 2·median-by-clock-hour, d2 = 2y − seasonal2,
    trend4 = 2·rolling-median(d2) — every column EXACT int64 on both
    engines (interpolated medians of ints land on .0/.5; ×2 clears the
    half). Feeds events_seasonal_median_decompose (the dyadic-division
    view) and events_stl_anomaly (the residual-scoring view)."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type", (F.unix_millis("ts") / F.lit(3600000)).cast("long").alias("hr")
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    cells = (
        ev.groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
        .withColumn("hod", F.col("hr") % 24)
        .withColumn("rn", F.row_number().over(w))
        .localCheckpoint(eager=True)  # seasonal agg + both rolling sides
    )
    seasonal = cells.groupBy("event_type", "hod").agg(
        (F.expr("percentile(y, 0.5)") * 2).cast("long").alias("seasonal2")
    )
    d = cells.join(seasonal, ["event_type", "hod"]).withColumn(
        "d2", F.lit(2) * F.col("y") - F.col("seasonal2")
    )
    nb = d.select("event_type", F.col("rn").alias("rn_b"), F.col("d2").alias("d2_b"))
    trend = (
        d.join(nb, "event_type")
        .where(
            (F.col("rn_b") >= F.col("rn") - STL_TREND_HALF)
            & (F.col("rn_b") <= F.col("rn") + STL_TREND_HALF)
        )
        .groupBy("event_type", "hr", "y", "seasonal2", "d2")
        .agg((F.expr("percentile(d2_b, 0.5)") * 2).cast("long").alias("trend4"))
    )
    return trend


def events_seasonal_median_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust seasonal decomposition of each type's hourly volume —
    y = seasonal + trend + resid with MEDIANS instead of STL's loess:
    seasonal(type, hour-of-day) = median of that clock hour's counts
    (immune to single-day bursts, unlike the mean profile
    events_dow_profile uses), trend = ±STL_TREND_HALF-hour rolling median
    of the deseasonalized series, resid = what's left — the spike input
    events_hampel_filter and events_anomaly score, now with the diurnal
    cycle removed first. All arithmetic rides _stl_frame's exact int64
    encodings; the /2.0 and /4.0 output divisions are dyadic and
    lossless in doubles, so y == seasonal + trend + resid EXACTLY.

    Scale: one corpus rollup to (type, hour) cells, one grouped median
    per (type, hour-of-day) cell (≤ |types|·24 groups), and the hampel
    rank-neighborhood join for the rolling median — all on the
    metadata-sized frame."""
    return _stl_frame(spark, sf_dir).select(
        "event_type",
        "hr",
        "y",
        (F.col("seasonal2") / F.lit(2.0)).alias("seasonal"),
        (F.col("trend4") / F.lit(4.0)).alias("trend"),
        ((F.lit(2) * F.col("d2") - F.col("trend4")) / F.lit(4.0)).alias("resid"),
    )


_SQL_STL_CTES = f"""scells AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS hr, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
sidx AS (
  SELECT *, hr % 24 AS hod,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS rn
  FROM scells
),
sseas AS (
  SELECT event_type, hod, CAST(quantile_cont(y, 0.5) * 2 AS BIGINT) AS seasonal2
  FROM sidx GROUP BY 1, 2
),
sd AS (
  SELECT i.*, s.seasonal2, 2 * i.y - s.seasonal2 AS d2
  FROM sidx i JOIN sseas s ON i.event_type = s.event_type AND i.hod = s.hod
),
strend AS (
  SELECT a.event_type, a.hr, a.y, a.seasonal2, a.d2,
         CAST(quantile_cont(b.d2, 0.5) * 2 AS BIGINT) AS trend4
  FROM sd a JOIN sd b
    ON a.event_type = b.event_type
   AND b.rn BETWEEN a.rn - {STL_TREND_HALF} AND a.rn + {STL_TREND_HALF}
  GROUP BY 1, 2, 3, 4, 5
)"""

SQL_EVENTS_STL = f"""
WITH {_SQL_STL_CTES}
SELECT event_type, hr, y,
       seasonal2 / 2.0 AS seasonal,
       trend4 / 4.0 AS trend,
       (2 * d2 - trend4) / 4.0 AS resid
FROM strend
"""

QUERIES["events_seasonal_median_decompose"] = events_seasonal_median_decompose
ORACLES["events_seasonal_median_decompose"] = SQL_EVENTS_STL


# ---------------------------------------------------------------------------
# events_stl_anomaly (round 9) — anomaly flags on the STL residual
# ---------------------------------------------------------------------------

STL_ANOM_NSIG = 3  # flag when |resid - med(resid)| > NSIG * MAD(resid)


def events_stl_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection on the DESEASONALIZED-DETRENDED residual: hourly
    cells are scored after _stl_frame removes the diurnal profile and the
    local trend, so a perfectly ordinary rush-hour peak no longer looks
    like a spike (events_anomaly's failure mode) and a modest count at
    4am that is wildly abnormal FOR 4AM is finally flagged. The rule is
    the hampel median/MAD form applied per type to resid4 = 2·d2 − trend4:
    with medr8 = 2·median(resid4) and madr16 = 2·median(|2·resid4 −
    medr8|), flag when 2·|2·resid4 − medr8| > NSIG·madr16 — pure int64
    end to end (the scaled encodings stay integers because every median
    of integers lands on .0/.5); the output med/mad divisions are dyadic.

    Scale: everything after the corpus rollup runs on the (type, hour)
    metadata frame, localCheckpointed once here because the two grouped
    medians + two joins would otherwise re-derive the ±12-hour trend
    fan-out three times."""
    t = (
        _stl_frame(spark, sf_dir)
        .withColumn("resid4", F.lit(2) * F.col("d2") - F.col("trend4"))
        .localCheckpoint(eager=True)  # med agg + dev side + mad agg
    )
    medr = t.groupBy("event_type").agg(
        (F.expr("percentile(resid4, 0.5)") * 2).cast("long").alias("medr8")
    )
    d = t.join(medr, "event_type").withColumn(
        "dev8", F.abs(F.lit(2) * F.col("resid4") - F.col("medr8"))
    )
    madr = d.groupBy("event_type").agg(
        (F.expr("percentile(dev8, 0.5)") * 2).cast("long").alias("madr16")
    )
    return d.join(madr, "event_type").select(
        "event_type",
        "hr",
        "y",
        (F.col("resid4") / F.lit(4.0)).alias("resid"),
        (F.col("medr8") / F.lit(8.0)).alias("med_resid"),
        (F.col("madr16") / F.lit(16.0)).alias("mad_resid"),
        (F.lit(2) * F.col("dev8") > F.lit(STL_ANOM_NSIG) * F.col("madr16")).alias(
            "is_anomaly"
        ),
    )


SQL_EVENTS_STL_ANOMALY = f"""
WITH {_SQL_STL_CTES},
ares AS (
  SELECT event_type, hr, y, 2 * d2 - trend4 AS resid4 FROM strend
),
amed AS (
  SELECT event_type, CAST(quantile_cont(resid4, 0.5) * 2 AS BIGINT) AS medr8
  FROM ares GROUP BY 1
),
adev AS (
  SELECT a.*, m.medr8, ABS(2 * a.resid4 - m.medr8) AS dev8
  FROM ares a JOIN amed m USING (event_type)
),
amad AS (
  SELECT event_type, CAST(quantile_cont(dev8, 0.5) * 2 AS BIGINT) AS madr16
  FROM adev GROUP BY 1
)
SELECT d.event_type, d.hr, d.y,
       d.resid4 / 4.0 AS resid,
       d.medr8 / 8.0 AS med_resid,
       t.madr16 / 16.0 AS mad_resid,
       (2 * d.dev8 > {STL_ANOM_NSIG} * t.madr16) AS is_anomaly
FROM adev d JOIN amad t USING (event_type)
"""

QUERIES["events_stl_anomaly"] = events_stl_anomaly
ORACLES["events_stl_anomaly"] = SQL_EVENTS_STL_ANOMALY


# ---------------------------------------------------------------------------
# events_theil_sen (round 8) — robust median-of-slopes trend
# ---------------------------------------------------------------------------

def events_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily event volume per type: the MEDIAN
    of all pairwise slopes (y_j−y_i)/(x_j−x_i), x_i<x_j — the estimator
    that shrugs off the outlier days that drag events_trend_slope's OLS
    around (29.3% breakdown point vs OLS's zero; Sen 1968). Read the two
    side by side: OLS ≫ Theil–Sen means a few anomalous days, not a trend.

    Exactness: each slope is ONE IEEE division of exact int64 deltas —
    identical bits on both engines — and the median is an order statistic
    over those doubles with a deterministic (slope, x_i, x_j) tiebreak;
    even-count medians average two doubles (single fixed-order add). No
    accumulation-order dependence anywhere.

    Scale: pairs are |days|²/2 per type over the checkpointed daily cell
    frame — metadata-sized (a year is 66k pairs), never corpus rows; the
    rank runs per (type) partition on those pairs. The corpus cost is the
    one daily cell aggregate."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type", F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("x")
    )
    daily = (
        ev.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint(eager=True)  # both sides of the pair join
    )
    a = daily.select("event_type", F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = daily.select("event_type", F.col("x").alias("x2"), F.col("y").alias("y2"))
    pairs = (
        a.join(b, "event_type")
        .where(F.col("x2") > F.col("x1"))
        .select(
            "event_type",
            "x1",
            "x2",
            (
                (F.col("y2") - F.col("y1")).cast("double")
                / (F.col("x2") - F.col("x1")).cast("double")
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope", "x1", "x2")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("m"),
    )
    med = ranked.where(
        (F.col("rnk") == F.expr("div(m + 1, 2)")) | (F.col("rnk") == F.expr("div(m + 2, 2)"))
    )
    return (
        med.groupBy("event_type", "m")
        .agg((F.sum("slope") / F.count(F.lit(1))).alias("ts_slope"))
        .select(
            "event_type",
            F.col("m").alias("n_pairs"),
            (F.floor(F.col("ts_slope") * 1000000.0 + F.lit(0.5)) / 1000000.0).alias(
                "theil_sen_slope"
            ),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_THEIL_SEN = """
WITH daily AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, a.x AS x1, b.x AS x2,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON a.event_type = b.event_type AND b.x > a.x
),
ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope, x1, x2) AS rnk,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM pairs
)
SELECT event_type, CAST(m AS BIGINT) AS n_pairs,
       (floor((SUM(slope) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0) AS theil_sen_slope
FROM ranked
WHERE rnk = (m + 1) // 2 OR rnk = (m + 2) // 2
GROUP BY event_type, m ORDER BY event_type
"""


QUERIES["events_theil_sen"] = events_theil_sen
ORACLES["events_theil_sen"] = SQL_EVENTS_THEIL_SEN

# ---------------------------------------------------------------------------
# events_ks_drift (round 9) — exact two-sample Kolmogorov–Smirnov drift test
# ---------------------------------------------------------------------------


def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit: for each event type, the exact two-sample
    Kolmogorov–Smirnov statistic between the EARLY half and the LATE half
    of its `value` stream (split at the midpoint of the type's observed
    time range — 2·ms < mn+mx keeps the split integer-exact). The ECDF
    comparison never touches floats: with cum_a/cum_b the running counts
    and na/nb the half sizes, D's numerator is max|cum_a·nb − cum_b·na|
    (int64), and ks_d = d_num/(na·nb) is ONE final division of exact
    integers. ks_at is the smallest value where the supremum is attained
    (deterministic tie-break). The same drift test a training pipeline
    runs to detect covariate shift between ingestion windows.

    Scale: raw events collapse to per-(type, value) count cells before
    any window; the ordered ECDF pass per type is the same exact-rank
    class as events_value_percentiles_exact — at extreme per-type
    cardinality the histogram-cumulative decomposition
    (functions/ranking.with_global_rank) applies unchanged. The int64
    cross-product bound na·nb caps the exact path at ~3·10⁹ rows per
    half; beyond that, pre-quantize values (documented, like the chi2
    square-in-double rule)."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type", F.unix_millis("ts").alias("ms"), "value"
    ).where(F.col("value").isNotNull())
    bounds = ev.groupBy("event_type").agg(
        F.min("ms").alias("mn"), F.max("ms").alias("mx")
    )
    sided = ev.join(bounds, "event_type").select(
        "event_type",
        "value",
        F.when(F.lit(2) * F.col("ms") < F.col("mn") + F.col("mx"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("early"),
    )
    kc = sided.groupBy("event_type", "value").agg(
        F.sum("early").alias("ca"),
        F.sum(F.lit(1) - F.col("early")).alias("cb"),
    )
    wcum = Window.partitionBy("event_type").orderBy("value")
    wall = Window.partitionBy("event_type")
    kcum = (
        kc.withColumn("cuma", F.sum("ca").over(wcum))
        .withColumn("cumb", F.sum("cb").over(wcum))
        .withColumn("na", F.sum("ca").over(wall))
        .withColumn("nb", F.sum("cb").over(wall))
        .where((F.col("na") > 0) & (F.col("nb") > 0))
        .withColumn(
            "diff", F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na"))
        )
        .withColumn("dmax", F.max("diff").over(wall))
    )
    return (
        kcum.where(F.col("diff") == F.col("dmax"))
        .groupBy("event_type", "na", "nb", "dmax")
        .agg(F.min("value").alias("ks_at"))
        .select(
            "event_type",
            F.col("na").alias("n_early"),
            F.col("nb").alias("n_late"),
            F.col("dmax").alias("d_num"),
            (
                F.col("dmax").cast("double")
                / (F.col("na") * F.col("nb")).cast("double")
            ).alias("ks_d"),
            "ks_at",
        )
    )


SQL_EVENTS_KS_DRIFT = """
WITH kev AS (
  SELECT event_type, epoch_ms(ts) AS ms, value
  FROM events WHERE value IS NOT NULL
),
kb AS (
  SELECT event_type, MIN(ms) AS mn, MAX(ms) AS mx FROM kev GROUP BY 1
),
ksided AS (
  SELECT e.event_type, e.value,
         CASE WHEN 2 * e.ms < kb.mn + kb.mx THEN 1 ELSE 0 END AS early
  FROM kev e JOIN kb USING (event_type)
),
kc AS (
  SELECT event_type, value,
         CAST(SUM(early) AS BIGINT) AS ca,
         CAST(SUM(1 - early) AS BIGINT) AS cb
  FROM ksided GROUP BY 1, 2
),
kcum AS (
  SELECT event_type, value, ca, cb,
         CAST(SUM(ca) OVER (PARTITION BY event_type ORDER BY value) AS BIGINT) AS cuma,
         CAST(SUM(cb) OVER (PARTITION BY event_type ORDER BY value) AS BIGINT) AS cumb,
         CAST(SUM(ca) OVER (PARTITION BY event_type) AS BIGINT) AS na,
         CAST(SUM(cb) OVER (PARTITION BY event_type) AS BIGINT) AS nb
  FROM kc
),
kd AS (
  SELECT event_type, value, na, nb,
         ABS(cuma * nb - cumb * na) AS diff,
         MAX(ABS(cuma * nb - cumb * na)) OVER (PARTITION BY event_type) AS dmax
  FROM kcum WHERE na > 0 AND nb > 0
)
SELECT event_type, na AS n_early, nb AS n_late,
       CAST(dmax AS BIGINT) AS d_num,
       CAST(dmax AS DOUBLE) / CAST(na * nb AS DOUBLE) AS ks_d,
       MIN(value) AS ks_at
FROM kd WHERE diff = dmax
GROUP BY 1, 2, 3, 4, 5
"""

QUERIES["events_ks_drift"] = events_ks_drift
ORACLES["events_ks_drift"] = SQL_EVENTS_KS_DRIFT

# ---------------------------------------------------------------------------
# events_max_burst_window (round 9) — Kadane max-sum window, declaratively
# ---------------------------------------------------------------------------


def events_max_burst_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The single heaviest sustained burst per event type: the contiguous
    run of present hours whose total volume most exceeds the type's
    median hourly rate. Kadane's classically-sequential max-subarray
    reduction is re-expressed declaratively: with dev2 = 2y − med2 the
    centered deviations and p their running prefix sum, the best window
    ENDING at row j scores p_j − min(0, min_{i<j} p_i) — two window
    functions, no iteration. The winning end is the earliest row
    attaining the per-type max; the start is the earliest prefix row
    attaining that end's running min (the LONGEST optimal window — both
    tie-breaks deterministic). All arithmetic is int64 on both engines
    (med2 = 2·median of integer counts is exact); the only doubles are
    the dyadic /2.0 output divisions.

    Scale: one corpus rollup to (type, hour) cells, then windows + four
    self-joins on that metadata-sized, localCheckpointed frame — the
    hampel/acf audit shape. burst_excess can be legitimately ≤ 0 when a
    type never runs above its median rate."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type", (F.unix_millis("ts") / F.lit(3600000)).cast("long").alias("hr")
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    cells = (
        ev.groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
        .withColumn("rn", F.row_number().over(w))
        .localCheckpoint(eager=True)  # median + prefix + three lookup sides
    )
    med = cells.groupBy("event_type").agg(
        (F.expr("percentile(y, 0.5)") * 2).cast("long").alias("med2")
    )
    wr = Window.partitionBy("event_type").orderBy("rn")
    scored = (
        cells.join(med, "event_type")
        .withColumn("dev2", F.lit(2) * F.col("y") - F.col("med2"))
        .withColumn(
            "p",
            F.sum("dev2").over(
                wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn(
            "m",
            F.least(
                F.lit(0),
                F.coalesce(
                    F.min("p").over(wr.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0),
                ),
            ),
        )
        .withColumn("score", F.col("p") - F.col("m"))
        .withColumn("best", F.max("score").over(Window.partitionBy("event_type")))
        .localCheckpoint(eager=True)  # ends / starts / hr-lookup consumers
    )
    ends = (
        scored.where(F.col("score") == F.col("best"))
        .groupBy("event_type", "best", "med2")
        .agg(F.min("rn").alias("end_rn"))
        .join(
            scored.select(
                "event_type",
                F.col("rn").alias("end_rn"),
                F.col("m").alias("m_end"),
                F.col("hr").alias("end_hr"),
            ),
            ["event_type", "end_rn"],
        )
    )
    starts = (
        ends.join(
            scored.select(
                "event_type", F.col("rn").alias("srn"), F.col("p").alias("sp")
            ),
            "event_type",
        )
        .where((F.col("srn") < F.col("end_rn")) & (F.col("sp") == F.col("m_end")))
        .groupBy("event_type", "end_rn")
        .agg(F.min("srn").alias("min_srn"))
    )
    return (
        ends.join(starts, ["event_type", "end_rn"], "left")
        .withColumn(
            "start_rn",
            F.when(F.col("m_end") == 0, F.lit(1)).otherwise(F.col("min_srn") + 1),
        )
        .join(
            scored.select(
                "event_type",
                F.col("rn").alias("start_rn"),
                F.col("hr").alias("start_hr"),
            ),
            ["event_type", "start_rn"],
        )
        .select(
            "event_type",
            "start_hr",
            "end_hr",
            (F.col("end_rn") - F.col("start_rn") + 1).cast("long").alias("n_hours"),
            (F.col("med2") / F.lit(2.0)).alias("baseline_med"),
            (F.col("best") / F.lit(2.0)).alias("burst_excess"),
        )
    )


SQL_EVENTS_MAX_BURST = """
WITH bcells AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS hr, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
bidx AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS rn
  FROM bcells
),
bmed AS (
  SELECT event_type, CAST(quantile_cont(y, 0.5) * 2 AS BIGINT) AS med2
  FROM bcells GROUP BY 1
),
bpre AS (
  SELECT i.event_type, i.hr, i.rn, i.y, m.med2,
         CAST(SUM(2 * i.y - m.med2) OVER (
           PARTITION BY i.event_type ORDER BY i.rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
  FROM bidx i JOIN bmed m USING (event_type)
),
bscore AS (
  SELECT *,
         p - LEAST(0, COALESCE(CAST(MIN(p) OVER (
           PARTITION BY event_type ORDER BY rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)) AS score,
         LEAST(0, COALESCE(CAST(MIN(p) OVER (
           PARTITION BY event_type ORDER BY rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)) AS m
  FROM bpre
),
bbest AS (
  SELECT *, MAX(score) OVER (PARTITION BY event_type) AS best FROM bscore
),
bends AS (
  SELECT event_type, best, med2, MIN(rn) AS end_rn
  FROM bbest WHERE score = best GROUP BY 1, 2, 3
),
bends2 AS (
  SELECT e.*, s.m AS m_end, s.hr AS end_hr
  FROM bends e JOIN bbest s
    ON e.event_type = s.event_type AND e.end_rn = s.rn
),
bstarts AS (
  SELECT e.event_type, e.end_rn, MIN(s.rn) AS min_srn
  FROM bends2 e JOIN bbest s
    ON e.event_type = s.event_type AND s.rn < e.end_rn AND s.p = e.m_end
  GROUP BY 1, 2
),
bres AS (
  SELECT e.*, CASE WHEN e.m_end = 0 THEN 1 ELSE st.min_srn + 1 END AS start_rn
  FROM bends2 e LEFT JOIN bstarts st
    ON e.event_type = st.event_type AND e.end_rn = st.end_rn
)
SELECT r.event_type, s.hr AS start_hr, r.end_hr,
       CAST(r.end_rn - r.start_rn + 1 AS BIGINT) AS n_hours,
       r.med2 / 2.0 AS baseline_med,
       r.best / 2.0 AS burst_excess
FROM bres r JOIN bbest s
  ON r.event_type = s.event_type AND r.start_rn = s.rn
"""

QUERIES["events_max_burst_window"] = events_max_burst_window
ORACLES["events_max_burst_window"] = SQL_EVENTS_MAX_BURST

# ---------------------------------------------------------------------------
# events_mann_kendall (round 9) — nonparametric trend significance
# ---------------------------------------------------------------------------

MK_Z2_NUM = 38416  # z²·10⁴ at two-sided α=0.05 (z=1.96): the decision
# rule z² > 3.8416 becomes the pure-int64 comparison
# 18·10⁴·S² > 38416·varnum18 (varnum18 = 18·Var(S) is integral by the
# tie-corrected Mann–Kendall variance formula)


def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend TEST on daily volume per type — the
    significance companion to events_theil_sen's slope (same daily cell
    frame, same pair fan-out; Kendall 1975): S = Σ_{i<j} sign(y_j − y_i),
    tie-corrected 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), and the
    α=0.05 verdict via the all-int64 cross-multiplied rule
    18·10⁴·S² > 38416·varnum18 (no sqrt, no continuity correction —
    documented estimator choice; z²_stat = 18·S²/varnum18 is emitted as
    ONE exact division for inspection). Read together: theil_sen says how
    steep, mann_kendall says whether to believe it.

    Scale: pairs are |days|²/2 per type on the checkpointed daily cell
    frame (metadata-sized; the theil_sen bound — S² overflows int64 past
    ~10⁵ daily cells, far beyond any per-type daily series). The corpus
    cost is the one daily rollup."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("x"),
    )
    daily = (
        ev.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint(eager=True)  # pair sides + the tie aggregate
    )
    a = daily.select("event_type", F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = daily.select("event_type", F.col("x").alias("x2"), F.col("y").alias("y2"))
    s_tbl = (
        a.join(b, "event_type")
        .where(F.col("x2") > F.col("x1"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("y2") > F.col("y1"), F.lit(1))
                .when(F.col("y2") < F.col("y1"), F.lit(-1))
                .otherwise(F.lit(0))
            ).alias("s_stat")
        )
    )
    tn = (
        daily.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum("t").alias("n_days"),
            F.sum(
                F.col("t") * (F.col("t") - F.lit(1)) * (F.lit(2) * F.col("t") + F.lit(5))
            ).alias("tie_sum"),
        )
    )
    joined = (
        tn.join(s_tbl, "event_type", "left")
        .withColumn("s_stat", F.coalesce(F.col("s_stat"), F.lit(0)))
        .withColumn(
            "varnum18",
            F.col("n_days")
            * (F.col("n_days") - F.lit(1))
            * (F.lit(2) * F.col("n_days") + F.lit(5))
            - F.col("tie_sum"),
        )
        .withColumn(
            "sig",
            F.lit(180000) * F.col("s_stat") * F.col("s_stat")
            > F.lit(MK_Z2_NUM) * F.col("varnum18"),
        )
    )
    return joined.select(
        "event_type",
        "n_days",
        "s_stat",
        "varnum18",
        F.when(
            F.col("varnum18") > 0,
            (F.lit(18) * F.col("s_stat") * F.col("s_stat")).cast("double")
            / F.col("varnum18").cast("double"),
        ).alias("z2_stat"),
        F.when(F.col("sig") & (F.col("s_stat") > 0), F.lit("increasing"))
        .when(F.col("sig") & (F.col("s_stat") < 0), F.lit("decreasing"))
        .otherwise(F.lit("none"))
        .alias("trend"),
    )


SQL_EVENTS_MANN_KENDALL = f"""
WITH mkdaily AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
mks AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END)
              AS BIGINT) AS s_stat
  FROM mkdaily a JOIN mkdaily b
    ON a.event_type = b.event_type AND b.x > a.x
  GROUP BY 1
),
mktn AS (
  SELECT event_type,
         CAST(SUM(t) AS BIGINT) AS n_days,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_sum
  FROM (
    SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS t
    FROM mkdaily GROUP BY 1, 2
  ) GROUP BY 1
),
mkj AS (
  SELECT tn.event_type, tn.n_days,
         COALESCE(s.s_stat, 0) AS s_stat,
         tn.n_days * (tn.n_days - 1) * (2 * tn.n_days + 5) - tn.tie_sum AS varnum18
  FROM mktn tn LEFT JOIN mks s ON tn.event_type = s.event_type
)
SELECT event_type, n_days, s_stat, CAST(varnum18 AS BIGINT) AS varnum18,
       CASE WHEN varnum18 > 0
            THEN CAST(18 * s_stat * s_stat AS DOUBLE) / CAST(varnum18 AS DOUBLE)
       END AS z2_stat,
       CASE WHEN 180000 * s_stat * s_stat > {MK_Z2_NUM} * varnum18 AND s_stat > 0
            THEN 'increasing'
            WHEN 180000 * s_stat * s_stat > {MK_Z2_NUM} * varnum18 AND s_stat < 0
            THEN 'decreasing'
            ELSE 'none' END AS trend
FROM mkj
"""

QUERIES["events_mann_kendall"] = events_mann_kendall
ORACLES["events_mann_kendall"] = SQL_EVENTS_MANN_KENDALL


# ---------------------------------------------------------------------------
# events_seasonality_strength (round 9, session 3) — Hyndman F_s / F_t
# ---------------------------------------------------------------------------

SEAS_STRONG_PCT = 64  # "strong" cut: strength > 0.64 (the feasts convention)


def events_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman seasonal/trend STRENGTH of each type's hourly series, on
    the shared robust STL-lite decomposition (_stl_frame):
      F_s = max(0, 1 − Var(R) / Var(S + R))   (seasonal strength)
      F_t = max(0, 1 − Var(R) / Var(T + R))   (trend strength)
    with R, S+R = y − trend, T+R = y − seasonal all carried in the
    frame's exact quarter-unit int64 encodings (resid4 = 2·d2 − trend4,
    det4 = 4y − trend4, des4 = 2·d2 — the common ×4 scale cancels in the
    ratios). Each Var enters as the exact int64 moment n·ΣX² − (ΣX)², so
    every strength is ONE final division and the 'strong' labels are the
    all-int64 cross-multiplied rule 100·(VarSR − VarR) > 64·VarSR (the
    feasts ≥0.64 convention). The one-line summary the full
    events_seasonal_median_decompose table is usually read FOR — how much
    of each type's hourly variance the diurnal cycle vs the local trend
    actually explains.

    Scale: one grouped pass over the metadata-sized STL frame; the int64
    moments are safe past 100× the sf0.1 hourly volumes (X ≤ 4·y_max,
    n·ΣX² ≲ n²·16·y_max²)."""
    t = (
        _stl_frame(spark, sf_dir)
        .withColumn("r4", F.lit(2) * F.col("d2") - F.col("trend4"))
        .withColumn("sr4", F.lit(4) * F.col("y") - F.col("trend4"))
        .withColumn("tr4", F.lit(2) * F.col("d2"))
    )
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r4").alias("s_r"),
        F.sum(F.col("r4") * F.col("r4")).alias("q_r"),
        F.sum("sr4").alias("s_sr"),
        F.sum(F.col("sr4") * F.col("sr4")).alias("q_sr"),
        F.sum("tr4").alias("s_tr"),
        F.sum(F.col("tr4") * F.col("tr4")).alias("q_tr"),
    )
    v = (
        agg.withColumn("var_r", F.col("n") * F.col("q_r") - F.col("s_r") * F.col("s_r"))
        .withColumn(
            "var_sr", F.col("n") * F.col("q_sr") - F.col("s_sr") * F.col("s_sr")
        )
        .withColumn(
            "var_tr", F.col("n") * F.col("q_tr") - F.col("s_tr") * F.col("s_tr")
        )
        .where((F.col("var_sr") > 0) & (F.col("var_tr") > 0))
        .withColumn(
            "strong_s",
            F.lit(100) * (F.col("var_sr") - F.col("var_r"))
            > F.lit(SEAS_STRONG_PCT) * F.col("var_sr"),
        )
        .withColumn(
            "strong_t",
            F.lit(100) * (F.col("var_tr") - F.col("var_r"))
            > F.lit(SEAS_STRONG_PCT) * F.col("var_tr"),
        )
    )
    return v.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.greatest(
            F.lit(0.0),
            (F.col("var_sr") - F.col("var_r")).cast("double")
            / F.col("var_sr").cast("double"),
        ).alias("seasonal_strength"),
        F.greatest(
            F.lit(0.0),
            (F.col("var_tr") - F.col("var_r")).cast("double")
            / F.col("var_tr").cast("double"),
        ).alias("trend_strength"),
        F.when(F.col("strong_s") & F.col("strong_t"), F.lit("seasonal+trend"))
        .when(F.col("strong_s"), F.lit("seasonal"))
        .when(F.col("strong_t"), F.lit("trend"))
        .otherwise(F.lit("neither"))
        .alias("character"),
    )


SQL_EVENTS_SEASONALITY_STRENGTH = f"""
WITH {_SQL_STL_CTES},
ssx AS (
  SELECT event_type,
         2 * d2 - trend4 AS r4,
         4 * y - trend4 AS sr4,
         2 * d2 AS tr4
  FROM strend
),
ssagg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(r4) AS BIGINT) AS s_r,
         CAST(SUM(r4 * r4) AS BIGINT) AS q_r,
         CAST(SUM(sr4) AS BIGINT) AS s_sr,
         CAST(SUM(sr4 * sr4) AS BIGINT) AS q_sr,
         CAST(SUM(tr4) AS BIGINT) AS s_tr,
         CAST(SUM(tr4 * tr4) AS BIGINT) AS q_tr
  FROM ssx GROUP BY 1
),
ssv AS (
  SELECT event_type, n,
         n * q_r - s_r * s_r AS var_r,
         n * q_sr - s_sr * s_sr AS var_sr,
         n * q_tr - s_tr * s_tr AS var_tr
  FROM ssagg
  WHERE n * q_sr - s_sr * s_sr > 0 AND n * q_tr - s_tr * s_tr > 0
)
SELECT event_type, n AS n_hours,
       GREATEST(CAST(0 AS DOUBLE),
                CAST(var_sr - var_r AS DOUBLE) / CAST(var_sr AS DOUBLE))
         AS seasonal_strength,
       GREATEST(CAST(0 AS DOUBLE),
                CAST(var_tr - var_r AS DOUBLE) / CAST(var_tr AS DOUBLE))
         AS trend_strength,
       CASE WHEN 100 * (var_sr - var_r) > {SEAS_STRONG_PCT} * var_sr
                 AND 100 * (var_tr - var_r) > {SEAS_STRONG_PCT} * var_tr
            THEN 'seasonal+trend'
            WHEN 100 * (var_sr - var_r) > {SEAS_STRONG_PCT} * var_sr
            THEN 'seasonal'
            WHEN 100 * (var_tr - var_r) > {SEAS_STRONG_PCT} * var_tr
            THEN 'trend'
            ELSE 'neither' END AS character
FROM ssv
"""

QUERIES["events_seasonality_strength"] = events_seasonality_strength
ORACLES["events_seasonality_strength"] = SQL_EVENTS_SEASONALITY_STRENGTH


# ---------------------------------------------------------------------------
# broadcast_size_audit (r9 session 3) — join-strategy sizing table
# ---------------------------------------------------------------------------

BCAST_THRESHOLD = 10 * 1024 * 1024  # spark.sql.autoBroadcastJoinThreshold default
SCAN_PART_BYTES = 128 * 1024 * 1024  # spark.sql.files.maxPartitionBytes default

# (column, kind) per table — kinds: i4 (4 bytes), f8 (8: bigint/double/ts),
# str (length + 4-byte offset). Pinned to TESTDATA.md's schemas; the schema
# canary flags drift.
_BCAST_TABLES: dict = {
    "region": (("r_regionkey", "i4"), ("r_name", "str")),
    "nation": (("n_nationkey", "i4"), ("n_name", "str"), ("n_regionkey", "i4")),
    "customer": (
        ("c_custkey", "f8"), ("c_name", "str"), ("c_nationkey", "i4"),
        ("c_acctbal", "f8"), ("c_mktsegment", "str"),
    ),
    "supplier": (
        ("s_suppkey", "f8"), ("s_name", "str"), ("s_nationkey", "i4"),
        ("s_acctbal", "f8"),
    ),
    "part": (
        ("p_partkey", "f8"), ("p_name", "str"), ("p_brand", "str"),
        ("p_type", "str"), ("p_size", "i4"), ("p_retailprice", "f8"),
    ),
    "orders": (
        ("o_orderkey", "f8"), ("o_custkey", "f8"), ("o_orderstatus", "str"),
        ("o_totalprice", "f8"), ("o_orderdate", "f8"), ("o_orderpriority", "str"),
    ),
    "lineitem": (
        ("l_orderkey", "f8"), ("l_partkey", "f8"), ("l_suppkey", "f8"),
        ("l_linenumber", "i4"), ("l_quantity", "f8"), ("l_extendedprice", "f8"),
        ("l_discount", "f8"), ("l_tax", "f8"), ("l_returnflag", "str"),
        ("l_linestatus", "str"), ("l_shipdate", "f8"),
    ),
}


def broadcast_size_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy sizing table for the warehouse: per table, the exact
    in-memory data volume under a fixed byte model (4 B ints, 8 B
    bigint/double/timestamp, length+4 B strings — the flat-row estimate a
    planner's sizeInBytes stands in for), the broadcast verdict against
    Spark's default 10 MiB autoBroadcastJoinThreshold, and the scan
    parallelism ceil(bytes / 128 MiB maxPartitionBytes). This is the
    quantified form of every `F.broadcast` decision in this repo (the r8
    site audit's rule: hint only CONSTANT-bounded operands): region/
    nation/part stay broadcastable at any SF because their row counts are
    dimension-like; orders/lineitem cross the threshold as the SF grows —
    the audit shows exactly where, so the strategy flip is data-driven
    rather than folklore.

    Scale: one column-pruned scan + one 1-row aggregate per table; the
    exact SUM of string lengths is the only corpus-dependent term and is
    map-side combined."""
    frames = []
    for tname, cols in _BCAST_TABLES.items():
        per_row = None
        for c, kind in cols:
            term = (
                F.lit(4)
                if kind == "i4"
                else F.lit(8)
                if kind == "f8"
                else F.coalesce(F.length(F.col(c)), F.lit(0)) + F.lit(4)
            )
            per_row = term if per_row is None else per_row + term
        t = read_table(spark, sf_dir, tname)
        frames.append(
            t.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(per_row.cast("long")).alias("data_bytes"),
            ).select(F.lit(tname).alias("table_name"), "n_rows", "data_bytes")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "table_name",
        "n_rows",
        "data_bytes",
        (F.col("data_bytes").cast("double") / F.col("n_rows").cast("double")).alias(
            "avg_row_bytes"
        ),
        (F.col("data_bytes") <= F.lit(BCAST_THRESHOLD)).alias("broadcastable"),
        F.greatest(
            F.lit(1),
            F.expr(f"(data_bytes + {SCAN_PART_BYTES - 1}) div {SCAN_PART_BYTES}"),
        ).alias("scan_partitions"),
        F.when(
            F.col("data_bytes") <= F.lit(BCAST_THRESHOLD), F.lit("broadcast")
        )
        .otherwise(F.lit("shuffle"))
        .alias("join_strategy"),
    )


def _sql_broadcast_size_audit() -> str:
    blocks = []
    for tname, cols in _BCAST_TABLES.items():
        terms = []
        for c, kind in cols:
            if kind == "i4":
                terms.append("4")
            elif kind == "f8":
                terms.append("8")
            else:
                terms.append(f"(COALESCE(length({c}), 0) + 4)")
        blocks.append(
            f"SELECT '{tname}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(SUM({' + '.join(terms)}) AS BIGINT) AS data_bytes FROM {tname}"
        )
    un = " UNION ALL ".join(blocks)
    return f"""
WITH bsz AS ({un})
SELECT table_name, n_rows, data_bytes,
       CAST(data_bytes AS DOUBLE) / CAST(n_rows AS DOUBLE) AS avg_row_bytes,
       data_bytes <= {BCAST_THRESHOLD} AS broadcastable,
       GREATEST(1, (data_bytes + {SCAN_PART_BYTES - 1}) // {SCAN_PART_BYTES})
         AS scan_partitions,
       CASE WHEN data_bytes <= {BCAST_THRESHOLD} THEN 'broadcast'
            ELSE 'shuffle' END AS join_strategy
FROM bsz
"""


QUERIES["broadcast_size_audit"] = broadcast_size_audit
ORACLES["broadcast_size_audit"] = _sql_broadcast_size_audit()


# ---------------------------------------------------------------------------
# customer_interpurchase (r9 session 3) — reorder-cadence profile
# ---------------------------------------------------------------------------


def customer_interpurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence per market segment: the day gaps between a
    customer's CONSECUTIVE orders (ordered by o_orderdate, o_orderkey —
    the deterministic tiebreak), rolled up per c_mktsegment as
    count / mean / exact interpolated P50/P90 / max. The reorder-cycle
    table a replenishment or churn model is calibrated against —
    complements rfm_segmentation (which scores recency/frequency
    LEVELS, not the spacing between purchases) and events_inter_arrival
    (the same statistic on the telemetry stream rather than the order
    book). Day gaps are exact integers; the mean is ONE division and the
    percentile interpolation factors are binary-exact, so both engines
    agree bit-for-bit.

    Scale: one lag over the (custkey, date, key)-sorted orders —
    the same shuffle the cohort ops already pay — then a |segments|-row
    rollup; the customer dimension joins on the grouped per-customer
    frame, never row-per-order."""
    from ..session import read_table as _rt

    orders = _rt(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        orders.withColumn("prev", F.lag("d").over(w))
        .where(F.col("prev").isNotNull())
        .select("o_custkey", F.datediff(F.col("d"), F.col("prev")).alias("gap"))
    )
    cust = _rt(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        gaps.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            (F.sum("gap").cast("double") / F.count(F.lit(1))).alias("mean_gap_days"),
            F.expr("percentile(gap, 0.5)").alias("p50_gap_days"),
            F.expr("percentile(gap, 0.9)").alias("p90_gap_days"),
            F.max("gap").alias("max_gap_days"),
        )
    )


SQL_CUSTOMER_INTERPURCHASE = """
WITH ipo AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey FROM orders
),
ipg AS (
  SELECT o_custkey,
         datediff('day',
                  LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey),
                  d) AS gap
  FROM ipo
),
ipne AS (SELECT * FROM ipg WHERE gap IS NOT NULL)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(g.gap) AS DOUBLE) / COUNT(*) AS mean_gap_days,
       quantile_cont(g.gap, 0.5) AS p50_gap_days,
       quantile_cont(g.gap, 0.9) AS p90_gap_days,
       CAST(MAX(g.gap) AS BIGINT) AS max_gap_days
FROM ipne g JOIN customer c ON g.o_custkey = c.c_custkey
GROUP BY 1
"""

QUERIES["customer_interpurchase"] = customer_interpurchase
ORACLES["customer_interpurchase"] = SQL_CUSTOMER_INTERPURCHASE


# ---------------------------------------------------------------------------
# orders_priority_mix_drift (r9 session 3) — chi-square mix-shift monitor
# ---------------------------------------------------------------------------

CHI2_95_DF4_Q4 = 94877  # chi2(0.95, df=4) = 9.4877 in 1e4 units (5 priorities)


def orders_priority_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Has the ORDER-PRIORITY mix shifted between the early and late half
    of the order book? The vocab_drift_chi2 transform applied to the
    orders dimension: split at the midpoint of the date range (the
    ks_drift convention, 2·day < mn + mx integer-exact), per priority
      term_p = (c₁·N₂ − c₂·N₁)² / (N₁·N₂·(c₁ + c₂))
    with the delta cast to DOUBLE before squaring on both engines (the
    chi-square rule; the int64 denominator bounds the exact form to
    ~30× the sf0.1 order volume, documented as in vocab_drift_chi2) and
    each term 1e-9-quantized before the int64 sum, so chi2_total is ONE
    final division. The α=0.05 verdict against χ²(0.95, 4) is the
    all-int64 rule 10⁴·Σq₉ > 94877·10⁹. The mix-stability gate a
    priority-SLA dashboard needs before alerting on share wiggles.

    Scale: one rollup to (priority, day) cells, the global date bounds
    as a window over that metadata frame (no driver collect — improves
    on vocab_drift_chi2's totals collect, which its vocab-sized frame
    justified), then ≤|priorities| rows end-to-end."""
    from ..session import read_table as _rt

    orders = _rt(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")).alias(
            "day"
        ),
    )
    daily = orders.groupBy("o_orderpriority", "day").agg(
        F.count(F.lit(1)).alias("c")
    )
    wall = Window.partitionBy()
    sided = (
        daily.withColumn("mn", F.min("day").over(wall))
        .withColumn("mx", F.max("day").over(wall))
        .withColumn("early", F.lit(2) * F.col("day") < F.col("mn") + F.col("mx"))
    )
    per = sided.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("early"), F.col("c")).otherwise(0)).alias("c1"),
        F.sum(F.when(~F.col("early"), F.col("c")).otherwise(0)).alias("c2"),
    )
    per = (
        per.withColumn("n1", F.sum("c1").over(wall))
        .withColumn("n2", F.sum("c2").over(wall))
        .where((F.col("n1") > 0) & (F.col("n2") > 0))
        .withColumn(
            "dlt_d",
            (F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")).cast("double"),
        )
        .withColumn(
            "den", F.col("n1") * F.col("n2") * (F.col("c1") + F.col("c2"))
        )
        .withColumn(
            "term",
            F.when(
                F.col("den") > 0,
                F.col("dlt_d") * F.col("dlt_d") / F.col("den").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "termq", F.floor(F.col("term") * 1000000000.0 + F.lit(0.5)).cast("long")
        )
        .withColumn("chi2q", F.sum("termq").over(wall))
    )
    return per.select(
        "o_orderpriority",
        F.col("c1").alias("n_early"),
        F.col("c2").alias("n_late"),
        (F.col("c1").cast("double") / F.col("n1").cast("double")).alias("share_early"),
        (F.col("c2").cast("double") / F.col("n2").cast("double")).alias("share_late"),
        F.col("term").alias("chi2_term"),
        (F.col("chi2q").cast("double") / F.lit(1000000000).cast("double")).alias(
            "chi2_total"
        ),
        (
            F.lit(10000) * F.col("chi2q") > F.lit(CHI2_95_DF4_Q4 * 1000000000)
        ).alias("drifted"),
    )


SQL_ORDERS_PRIORITY_DRIFT = f"""
WITH opdaily AS (
  SELECT o_orderpriority,
         datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
opsided AS (
  SELECT *,
         MIN(day) OVER () AS mn, MAX(day) OVER () AS mx
  FROM opdaily
),
opper AS (
  SELECT o_orderpriority,
         CAST(SUM(CASE WHEN 2 * day < mn + mx THEN c ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN 2 * day < mn + mx THEN 0 ELSE c END) AS BIGINT) AS c2
  FROM opsided GROUP BY 1
),
optot AS (
  SELECT *,
         CAST(SUM(c1) OVER () AS BIGINT) AS n1,
         CAST(SUM(c2) OVER () AS BIGINT) AS n2
  FROM opper
),
opterm AS (
  SELECT *,
         CAST(c1 * n2 - c2 * n1 AS DOUBLE) AS dlt_d,
         n1 * n2 * (c1 + c2) AS den
  FROM optot WHERE n1 > 0 AND n2 > 0
),
opq AS (
  SELECT *,
         CASE WHEN den > 0 THEN dlt_d * dlt_d / CAST(den AS DOUBLE)
              ELSE CAST(0 AS DOUBLE) END AS term
  FROM opterm
),
opqq AS (
  SELECT *, CAST(FLOOR(term * 1000000000.0 + 0.5) AS BIGINT) AS termq FROM opq
),
opchi AS (
  SELECT *, CAST(SUM(termq) OVER () AS BIGINT) AS chi2q FROM opqq
)
SELECT o_orderpriority,
       c1 AS n_early, c2 AS n_late,
       CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS share_early,
       CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS share_late,
       term AS chi2_term,
       CAST(chi2q AS DOUBLE) / CAST(1000000000 AS DOUBLE) AS chi2_total,
       10000 * chi2q > {CHI2_95_DF4_Q4 * 1000000000} AS drifted
FROM opchi
"""

QUERIES["orders_priority_mix_drift"] = orders_priority_mix_drift
ORACLES["orders_priority_mix_drift"] = SQL_ORDERS_PRIORITY_DRIFT
