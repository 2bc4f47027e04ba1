"""TPC-H queries 2/4/9/11/12/13/20/21 adapted to the reduced testdata schema
(no partsupp, no l_commitdate/l_receiptdate/l_shipmode, no comment columns).
With these, all 22 TPC-H query shapes are covered (the rest live in tpch.py /
tpch_ext.py).

Adaptation map (same join/subquery structure, stand-in predicates):
  - partsupp            -> distinct (l_partkey, l_suppkey) pairs from lineitem
  - ps_supplycost       -> MIN(l_extendedprice) per (part, supplier)   [q2]
                           0.6 * p_retailprice                          [q9]
  - ps_availqty*cost    -> SUM(l_extendedprice * l_quantity)            [q11]
  - l_commitdate < l_receiptdate ("late") -> l_shipdate > o_orderdate + N days
  - l_shipmode          -> l_returnflag                                 [q12]
  - comment LIKE filter -> o_orderpriority <> '4-NOT SPECIFIED'         [q13]

All threshold comparisons are exact-decimal rearrangements (x > f*total
becomes x * k > total) so Spark and DuckDB select identical rows — see
functions/money.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import money as M
from ..session import load_tables

_WIDE = "decimal(38,12)"
_SQL_WIDE = "DECIMAL(38,12)"


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each small STANDARD part, the EUROPE supplier with the minimum
    per-line price (MIN l_extendedprice as the ps_supplycost stand-in).
    The correlated min-cost subquery becomes a window MIN over the
    region-filtered cost table — one shuffle, dims broadcast."""
    t = load_tables(spark, sf_dir, ("part", "supplier", "lineitem", "nation", "region"))
    part = t["part"].where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    eu_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(M.dec("l_extendedprice")).alias("cost"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        cost.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("min_cost", F.min("cost").over(w))
        .where(F.col("cost") == F.col("min_cost"))
        .select(
            F.round(F.col("s_acctbal"), 2).alias("s_acctbal_r"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("cost").cast("double").alias("min_cost"),
        )
        .orderBy(F.desc("s_acctbal_r"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


SQL_Q2 = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(CAST(l_extendedprice AS DECIMAL(10,4))) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT ROUND(s_acctbal, 2) AS s_acctbal_r, s_name, n_name, p_partkey, p_name,
       CAST(cost AS DOUBLE) AS min_cost
FROM cost
JOIN part ON l_partkey = p_partkey
JOIN eu ON l_suppkey = s_suppkey
WHERE p_size <= 10 AND p_type = 'STANDARD'
  AND cost = (
    SELECT MIN(c2.cost) FROM cost c2 JOIN eu e2 ON c2.l_suppkey = e2.s_suppkey
    WHERE c2.l_partkey = cost.l_partkey)
ORDER BY s_acctbal_r DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per priority in one quarter having at least one late line
    (shipdate > orderdate + 30 days stands in for commitdate < receiptdate).
    EXISTS becomes a left-semi join on orderkey with the lateness predicate
    inside the join condition — no row duplication, no distinct."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and order year for 'red' parts; supplycost
    stand-in is 0.6 * p_retailprice. Amounts are exact decimal(38,12) so the
    final 4 dp rounding is engine-independent."""
    t = load_tables(spark, sf_dir, ("part", "supplier", "lineitem", "orders", "nation"))
    red = t["part"].where(F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")
    amount = M.disc_price().cast(_WIDE) - (
        M.dec("p_retailprice") * M.dec("l_quantity") * F.lit("0.6").cast(M.UNIT)
    ).cast(_WIDE)
    return (
        t["lineitem"]
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(M.money_sum(amount, "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


SQL_Q9 = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {M.sql_money_sum(
           f"CAST({M.SQL_DISC_PRICE} AS {_SQL_WIDE})"
           f" - CAST({M.sql_dec('p_retailprice')} * {M.sql_dec('l_quantity')}"
           f" * CAST(0.6 AS DECIMAL(10,4)) AS {_SQL_WIDE})",
           "sum_profit",
       )}
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2 ORDER BY 1, 2 DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose German-supplied shipped value exceeds 1/10000 of the total
    (value = SUM(l_extendedprice * l_quantity), the availqty*supplycost
    stand-in). The scalar-subquery threshold is a broadcast cross join and the
    fraction comparison is the exact rearrangement value * 10000 > total."""
    t = load_tables(spark, sf_dir, ("supplier", "lineitem", "nation"))
    german = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].where(F.col("n_name") == "GERMANY")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    val = (M.dec("l_extendedprice") * M.dec("l_quantity")).cast(M.PROD)
    per_part = (
        t["lineitem"]
        .join(F.broadcast(german), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("value_d"))
    )
    total = per_part.agg(F.sum("value_d").alias("total_d"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value_d") * 10000 > F.col("total_d"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value_d"), 4).cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


SQL_Q11 = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(10,4)) *
                  CAST(l_quantity AS DECIMAL(10,4)) AS DECIMAL(18,8))) AS value_d
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'GERMANY')
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(ROUND(value_d, 4) AS DOUBLE) AS value
FROM per_part
WHERE value_d * 10000 > (SELECT SUM(value_d) FROM per_part)
ORDER BY value DESC, p_partkey
"""


def q12_ship_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-line counts by return flag (the l_shipmode stand-in), split into
    high/low order priority — one join, one aggregation."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    li = t["lineitem"].where(F.col("l_returnflag").isin("A", "N")).select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
            & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("flag")
    )


SQL_Q12 = """
SELECT l_returnflag AS flag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag IN ('A', 'N')
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1 ORDER BY 1
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of customers by order count (orders filtered by a priority
    predicate standing in for the comment LIKE filter). Left outer join keeps
    zero-order customers; two aggregations, second one tiny."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    orders = t["orders"].where(F.col("o_orderpriority") != "4-NOT SPECIFIED").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        t["customer"].select("c_custkey")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_Q13 = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRANCE suppliers that shipped more than half of some 'small' part's
    total quantity (the availqty > 0.5*sum(qty) structure of q20). The
    nested-subquery chain becomes: per-(part,supplier) sums -> window total
    per part -> exact 2*supp > total filter -> semi join into supplier."""
    t = load_tables(spark, sf_dir, ("part", "supplier", "lineitem", "nation"))
    small = t["part"].where(F.col("p_name").like("small%")).select("p_partkey")
    per_ps = (
        t["lineitem"]
        .join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(M.dec("l_quantity")).alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_ps.withColumn("part_qty", F.sum("supp_qty").over(w))
        .where(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(
            F.broadcast(t["nation"].where(F.col("n_name") == "FRANCE")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_name", F.round(F.col("s_acctbal"), 2).alias("s_acctbal_r"))
        .orderBy("s_name")
    )


SQL_Q20 = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(10,4))) AS supp_qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l_partkey, l_suppkey
),
dominant AS (
  SELECT DISTINCT l_suppkey FROM per_ps p
  WHERE supp_qty * 2 > (SELECT SUM(supp_qty) FROM per_ps p2 WHERE p2.l_partkey = p.l_partkey)
)
SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal_r
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'FRANCE' AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that were the ONLY late shipper on a multi-supplier order
    (late = shipdate > orderdate + 60 days). q21's EXISTS/NOT-EXISTS pair
    over other lineitems collapses into one per-(order,supplier) aggregate
    followed by a window over l_orderkey for the per-order totals — the
    window reuses the aggregate's shuffle key prefix, so there is no second
    aggregation and no per_os-to-per_o join (two shuffles total, versus two
    extra self-joins of lineitem in the literal formulation)."""
    t = load_tables(spark, sf_dir, ("supplier", "lineitem", "orders", "nation"))
    li = (
        t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(t["orders"].select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "late",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")).cast("int"),
        )
    )
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("late").alias("supp_late"))
    wo = Window.partitionBy("l_orderkey")
    blamed = (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(wo))
        .withColumn("n_late", F.sum("supp_late").over(wo))
        .where((F.col("supp_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        blamed.join(
            F.broadcast(
                t["supplier"]
                .join(
                    F.broadcast(t["nation"].where(F.col("n_name") == "GERMANY")),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
                .select("s_suppkey", "s_name")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


SQL_Q21 = """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
per_os AS (
  SELECT l_orderkey, l_suppkey, MAX(late) AS supp_late
  FROM li GROUP BY l_orderkey, l_suppkey
),
per_o AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(supp_late) AS n_late
  FROM per_os GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM per_os
JOIN per_o USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE supp_late = 1 AND n_supp > 1 AND n_late = 1 AND n_name = 'GERMANY'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

def q1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q1 with ROLLUP grouping sets: per (returnflag, linestatus), per
    returnflag subtotals, and the grand total in ONE pass — Spark expands
    the grouping sets inside the same partial aggregation, so the scan and
    shuffle cost match plain q1 (rows x grouping-set-count partials, still
    collapsing map-side). GROUPING() flags disambiguate subtotal rows."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            M.money_sum(M.dec("l_quantity"), "sum_qty"),
            M.money_sum(M.disc_price(), "sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


SQL_Q1_ROLLUP = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       {M.sql_money_sum(M.sql_dec('l_quantity'), 'sum_qty')},
       {M.sql_money_sum(M.SQL_DISC_PRICE, 'sum_disc_price')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""


QUERIES = {
    "q1_rollup": q1_rollup,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_order_priority": q4_order_priority,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_stock": q11_important_stock,
    "q12_ship_priority_class": q12_ship_priority_class,
    "q13_customer_distribution": q13_customer_distribution,
    "q20_dominant_suppliers": q20_dominant_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLES = {
    "q2_min_cost_supplier": SQL_Q2,
    "q4_order_priority": SQL_Q4,
    "q9_product_type_profit": SQL_Q9,
    "q11_important_stock": SQL_Q11,
    "q12_ship_priority_class": SQL_Q12,
    "q13_customer_distribution": SQL_Q13,
    "q20_dominant_suppliers": SQL_Q20,
    "q21_waiting_suppliers": SQL_Q21,
    "q1_rollup": SQL_Q1_ROLLUP,
}


def order_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship lead-time distribution per order priority: the
    date-arithmetic surface (datediff in days) with exact integer stats and
    a portable mean. One co-partitioned orders⋈lineitem join (the fact join
    every TPC-H plan already pays) collapsing into |priorities| rows."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    joined = t["lineitem"].select("l_orderkey", "l_shipdate").join(
        t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    lead = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        joined.select("o_orderpriority", lead.alias("lead_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min("lead_days").alias("min_days"),
            F.max("lead_days").alias("max_days"),
            F.sum("lead_days").alias("total_days"),
            (
                F.floor(
                    (F.sum("lead_days") / F.count(F.lit(1))) * 1000000.0 + F.lit(0.5)
                )
                / 1000000.0
            ).alias("avg_days"),
        )
        .orderBy("o_orderpriority")
    )


SQL_ORDER_LEAD_TIME = """
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       MIN(datediff('day', o_orderdate, l_shipdate)) AS min_days,
       MAX(datediff('day', o_orderdate, l_shipdate)) AS max_days,
       CAST(SUM(datediff('day', o_orderdate, l_shipdate)) AS BIGINT) AS total_days,
       (floor((CAST(SUM(datediff('day', o_orderdate, l_shipdate)) AS DOUBLE) / COUNT(*))
              * 1000000.0 + 0.5) / 1000000.0) AS avg_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

QUERIES["order_lead_time"] = order_lead_time
ORACLES["order_lead_time"] = SQL_ORDER_LEAD_TIME
