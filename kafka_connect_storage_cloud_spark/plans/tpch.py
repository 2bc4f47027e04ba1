"""TPC-H-style analytic plans over the testdata star schema, adapted to the
available columns (see TESTDATA.md). All plans are declarative DataFrame
compositions: Catalyst handles pushdown/pruning/join ordering; small dims
(region, nation, supplier, part at any SF) are broadcast explicitly so the
100 TB plan has no shuffle on the dim side. Money aggregates use
decimal-exact math (functions.money) so results are engine-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money as M
from ..session import load_tables, read_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: single scan + partial-aggregating groupBy.
    The filter and column projection push down to the parquet scan."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            M.money_sum(M.dec("l_quantity"), "sum_qty"),
            M.money_sum(M.dec("l_extendedprice"), "sum_base_price"),
            M.money_sum(M.disc_price(), "sum_disc_price"),
            M.money_sum(M.charge(), "sum_charge"),
            M.money_avg(M.dec("l_quantity"), "avg_qty"),
            M.money_avg(M.dec("l_extendedprice"), "avg_price"),
            M.money_avg(M.dec("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped-revenue orders. customer is a broadcast dim; the
    orders⋈lineitem join shuffles on orderkey only after both sides are
    filtered (pushdown)."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = t["lineitem"].where(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(M.money_sum(M.disc_price(), "revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-way join where every dim side is broadcast;
    only the orders⋈lineitem edge shuffles at scale."""
    t = load_tables(
        spark, sf_dir, ("region", "nation", "customer", "supplier", "orders", "lineitem")
    )
    nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = t["customer"].select("c_custkey", "c_nationkey")
    supp = t["supplier"].select("s_suppkey", "s_nationkey")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(M.money_sum(M.disc_price(), "revenue"))
        .orderBy(F.desc("revenue"))
    )


def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change: fully pushed-down selective scan + global agg."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(M.money_sum(M.dec("l_extendedprice") * M.dec("l_discount"), "revenue"))


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned-item revenue."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(M.money_sum(M.disc_price(), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 customers by lifetime revenue (broadcast dim chain)."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation", "region"))
    li = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
    geo = (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
    )
    return (
        li.join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_name", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(geo), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "r_name")
        .agg(M.money_sum(M.disc_price(), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(15)
    )


def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority histogram over a quarter, counting only orders with at
    least one lineitem (semi join — no row multiplication, shuffle on key)."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def part_type_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net revenue vs retail value per part type/brand — broadcast part dim
    onto lineitem, one shuffle for the final groupBy."""
    t = load_tables(spark, sf_dir, ("part", "lineitem"))
    li = t["lineitem"].select("l_partkey", "l_extendedprice", "l_discount", "l_quantity")
    part = t["part"].select("p_partkey", "p_type", "p_brand", "p_retailprice")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(
            M.money_sum(M.disc_price(), "net_revenue"),
            M.money_sum((M.dec("p_retailprice") * M.dec("l_quantity")).cast(M.PROD), "retail_value"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("p_type", "p_brand")
    )
