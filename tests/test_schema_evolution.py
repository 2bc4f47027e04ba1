"""Schema evolution: BACKWARD merge semantics + mixed-generation parquet
reads (the sink-side behavior the connector gets from schema rotation)."""

from pyspark.sql import functions as F

from kafka_connect_storage_cloud_spark.operators.schema_evolution import (
    evolve_backward,
    split_generations,
)


def test_backward_merge_nulls_added_columns(spark, sf_small):
    v1, v2 = split_generations(spark, sf_small)
    merged = evolve_backward(v1, v2)
    assert merged.count() == v1.count() + v2.count()
    v1_rows = merged.where(F.col("schema_version") == 1)
    assert v1_rows.where(F.col("value").isNotNull()).count() == 0
    assert v1_rows.where(F.col("props").isNotNull()).count() == 0
    v2_rows = merged.where(F.col("schema_version") == 2)
    assert v2_rows.where(F.col("value").isNull()).count() == 0


def test_mixed_generation_parquet_read(spark, sf_small, tmp_path):
    """Old files (v1 schema) and new files (v2 schema) in one dataset read
    back as the evolved schema with mergeSchema."""
    v1, v2 = split_generations(spark, sf_small)
    out = str(tmp_path / "gen")
    v1.write.parquet(f"{out}/g=1")
    v2.write.parquet(f"{out}/g=2")
    back = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(back.columns) >= {"event_id", "ts", "user_id", "event_type", "value", "props"}
    assert back.count() == v1.count() + v2.count()
    assert back.where(F.col("value").isNull()).count() == v1.count()
