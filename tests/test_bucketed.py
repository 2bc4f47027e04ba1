"""Bucketed-table sink: the pay-the-shuffle-once layout for repeated joins.
The test asserts the property that matters at 100 TB — a join of two
identically-bucketed tables runs with ZERO exchanges."""

from pyspark.sql import functions as F

from kafka_connect_storage_cloud_spark.session import read_table
from kafka_connect_storage_cloud_spark.sinks.bucketed import bucketed_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_small, tmp_path):
    orders = read_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    lineitem = read_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", str(tmp_path / "o"), "o_orderkey")
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        str(tmp_path / "l"),
        "o_orderkey",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it is not just a plan: the join answers correctly
        expected = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .agg(F.count(F.lit(1)))
            .first()[0]
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
