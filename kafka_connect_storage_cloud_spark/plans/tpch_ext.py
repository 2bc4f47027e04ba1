"""Extended TPC-H-style plans (q7/q8/q14/q15/q16/q17/q18/q19/q22 adapted to
the available columns). Threshold comparisons against averages are
rearranged into exact decimal inequalities (x < avg(y) <=> x * n < sum(y))
so Spark and the DuckDB oracle select identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money as M
from ..session import load_tables


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped between two nations per year, both directions.
    Both nation dims broadcast; single big join orders⋈lineitem."""
    t = load_tables(spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation"))
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    pair = (
        ((F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY"))
        | ((F.col("supp_nation") == "GERMANY") & (F.col("cust_nation") == "FRANCE"))
    )
    return (
        li.join(t["orders"].select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"].select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(M.money_sum(M.disc_price(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {M.sql_money_sum(M.SQL_DISC_PRICE, 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
    OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share of BRAZIL suppliers in AMERICA customers' ECONOMY-part
    revenue per year. Share = exact decimal division emitted as double."""
    t = load_tables(
        spark, sf_dir, ("part", "supplier", "lineitem", "orders", "customer", "nation", "region")
    )
    amer_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    supp_nation = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        t["lineitem"].select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(t["part"].where(F.col("p_type") == "ECONOMY").select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            t["orders"].where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["customer"].select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(amer_nations), F.col("c_nationkey") == F.col("c_nk"), "left_semi")
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nk"))
    )
    vol = M.disc_price()
    brazil_vol = F.when(F.col("supp_nation") == "BRAZIL", vol).otherwise(F.lit(0).cast(M.PROD))
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.floor((F.sum(brazil_vol).cast("double") / F.sum(vol).cast("double")) * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("mkt_share"),
            M.money_sum(vol, "total_volume"),
        )
        .orderBy("o_year")
    )


SQL_Q8 = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       (floor((CAST(SUM(CASE WHEN n1.n_name = 'BRAZIL' THEN {M.SQL_DISC_PRICE}
                           ELSE CAST(0 AS DECIMAL(18,8)) END) AS DOUBLE)
             / CAST(SUM({M.SQL_DISC_PRICE}) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) AS mkt_share,
       {M.sql_money_sum(M.SQL_DISC_PRICE, 'total_volume')}
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  AND c_nationkey IN (
    SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA')
GROUP BY 1 ORDER BY 1
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from PROMO parts in one month."""
    t = load_tables(spark, sf_dir, ("part", "lineitem"))
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    vol = M.disc_price()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast(M.PROD))
    return (
        li.join(F.broadcast(t["part"].select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.floor(
                    (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(vol).cast("double"))
                    * 1000000.0
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("promo_revenue_pct")
        )
    )


SQL_Q14 = f"""
SELECT (floor((100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {M.SQL_DISC_PRICE}
                                   ELSE CAST(0 AS DECIMAL(18,8)) END) AS DOUBLE)
             / CAST(SUM({M.SQL_DISC_PRICE}) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers with the maximum quarterly revenue (rank over exact decimal
    revenue — ties all surface, like the reference view formulation)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, ("supplier", "lineitem"))
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(M.money_sum(M.disc_price(), "total_revenue"))
    )
    w = Window.orderBy(F.desc("total_revenue"))
    top = rev.withColumn("rnk", F.rank().over(w)).where(F.col("rnk") == 1).drop("rnk")
    return (
        top.join(F.broadcast(t["supplier"]), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


SQL_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {M.sql_money_sum(M.SQL_DISC_PRICE, 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) excluding one brand —
    lineitem as the partsupp stand-in."""
    t = load_tables(spark, sf_dir, ("part", "lineitem"))
    part = t["part"].where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        t["lineitem"].select("l_partkey", "l_suppkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


SQL_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avg yearly revenue lost if small-quantity orders of one brand weren't
    filled. The `qty < 0.2*avg(qty per part)` predicate is rearranged to the
    exact-decimal inequality qty * n * 5 < sum(qty) (no float avg)."""
    t = load_tables(spark, sf_dir, ("part", "lineitem"))
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
    per_part = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        F.sum(M.dec("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n_li")
    )
    brand = t["part"].where(F.col("p_brand") == "Brand#2").select("p_partkey")
    return (
        li.join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("agg_pk"))
        .where(M.dec("l_quantity") * F.col("n_li") * 5 < F.col("sum_qty"))
        .agg(
            (F.floor((F.sum(M.dec("l_extendedprice")).cast("double") / 7.0) * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("avg_yearly")
        )
    )


SQL_Q17 = """
WITH per_part AS (
  SELECT l_partkey AS agg_pk, SUM(CAST(l_quantity AS DECIMAL(10,4))) AS sum_qty,
         COUNT(*) AS n_li
  FROM lineitem GROUP BY l_partkey
)
SELECT (floor((CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,4))) AS DOUBLE) / 7.0) * 1000000.0 + 0.5) / 1000000.0) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = agg_pk
WHERE p_brand = 'Brand#2'
  AND CAST(l_quantity AS DECIMAL(10,4)) * n_li * 5 < sum_qty
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose single orders exceed a quantity threshold."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    big = (
        t["lineitem"].groupBy("l_orderkey")
        .agg(F.sum(M.dec("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > 28)
    )
    return (
        big.join(t["orders"].select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"].select("c_custkey", "c_name")), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice_r"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice_r"), "o_orderkey")
        .limit(100)
    )


SQL_Q18 = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(10,4))) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(10,4))) > 28
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       ROUND(o_totalprice, 2) AS o_totalprice_r,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice_r DESC, o_orderkey
LIMIT 100
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive brand/size/quantity predicate revenue."""
    t = load_tables(spark, sf_dir, ("part", "lineitem"))
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    cond = (
        ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#9") & (F.col("p_size").between(10, 30)) & (F.col("l_quantity").between(10, 40)))
        | ((F.col("p_brand") == "Brand#15") & (F.col("p_size").between(20, 50)) & (F.col("l_quantity").between(20, 50)))
    )
    return (
        li.join(F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(M.money_sum(M.disc_price(), "revenue"))
    )


SQL_Q19 = f"""
SELECT {M.sql_money_sum(M.SQL_DISC_PRICE, 'revenue')}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#9' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich customers with no recent orders, per nation. The `acctbal >
    avg(positive acctbal)` predicate is exact-decimal rearranged:
    bal * n > sum."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "nation"))
    pos = t["customer"].where(F.col("c_acctbal") > 0)
    stats = pos.agg(
        F.sum(M.dec("c_acctbal")).alias("sum_bal"), F.count(F.lit(1)).alias("n_bal")
    )
    recent = t["orders"].where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        t["customer"]
        .crossJoin(F.broadcast(stats))
        .where(M.dec("c_acctbal") * F.col("n_bal") > F.col("sum_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            M.money_sum(M.dec("c_acctbal"), "totacctbal"),
        )
        .orderBy("n_name")
    )


SQL_Q22 = f"""
WITH stats AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(10,4))) AS sum_bal, COUNT(*) AS n_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name, COUNT(*) AS numcust,
       {M.sql_money_sum('CAST(c_acctbal AS DECIMAL(10,4))', 'totacctbal')}
FROM customer, stats
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DECIMAL(10,4)) * n_bal > sum_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n_name ORDER BY n_name
"""

ORACLES = {
    "q7_volume_shipping": SQL_Q7,
    "q8_market_share": SQL_Q8,
    "q14_promo_revenue": SQL_Q14,
    "q15_top_supplier": SQL_Q15,
    "q16_supplier_part_counts": SQL_Q16,
    "q17_small_quantity_revenue": SQL_Q17,
    "q18_large_volume_customers": SQL_Q18,
    "q19_discounted_revenue": SQL_Q19,
    "q22_global_sales_opportunity": SQL_Q22,
}

QUERIES = {
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
}
