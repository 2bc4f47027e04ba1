"""PySpark-native analytics engine with the data-processing capabilities of
confluentinc/kafka-connect-storage-cloud (S3 sink connector), re-expressed
Spark-first, plus LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Reference semantics studied at /root/reference (no code copied):
  - partitioning: TopicPartitionWriter.java, util/SchemaPartitioner.java
  - rotation:     TopicPartitionWriter.java:610-703
  - formats:      format/{avro,json,parquet,bytearray}/
  - exactly-once: util/S3FileUtils.java, TopicPartitionWriter.java:1023
"""

__version__ = "0.1.0"
