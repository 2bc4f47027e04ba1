"""Partitioned file sinks: the Spark-first counterpart of the connector's
Format/RecordWriter stack (reference format/{avro,json,parquet,bytearray}/,
storage/CompressionType.java, TopicPartitionWriter commit logic).

Mapping of connector semantics -> Spark writer:
  partitioner                  -> partitionBy on the encoded partition cols
  flush.size                   -> spark.sql.files.maxRecordsPerFile
  s3.compression.type          -> option("compression", ...)
  format.class                 -> .format("parquet"|"json"|"csv"|"avro")
  exactly-once (start-offset
  file keys + idempotent puts) -> deterministic dynamic-partition overwrite
                                  (partitionOverwriteMode=dynamic): replaying
                                  a batch rewrites the same partitions with
                                  identical content instead of duplicating

S3 notes (not exercisable offline, but the design point): writes go through
the Hadoop S3A committer ("magic" or directory committer) — multipart upload
+ atomic completion replaces the connector's own multipart machinery
(storage/S3OutputStream.java). Local tests write file:// paths; the code is
path-scheme agnostic.

Avro is gated: vanilla PySpark lacks spark-avro; writers raise a clear error
telling the user to add the package.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

VALID_FORMATS = ("parquet", "json", "csv", "avro", "bytearray")

# connector compression names -> per-format Spark codec names
_COMPRESSION = {
    ("bytearray", "none"): "none",
    ("bytearray", "gzip"): "gzip",
    ("parquet", "none"): "none",
    ("parquet", "gzip"): "gzip",
    ("parquet", "snappy"): "snappy",
    ("parquet", "zstd"): "zstd",
    ("json", "none"): "none",
    ("json", "gzip"): "gzip",
    ("csv", "none"): "none",
    ("csv", "gzip"): "gzip",
    ("avro", "none"): "uncompressed",
    ("avro", "gzip"): "deflate",
    ("avro", "snappy"): "snappy",
}


@dataclass
class SinkConfig:
    """Subset of S3SinkConnectorConfig the sink honors offline."""

    format: str = "parquet"
    compression: str = "none"  # s3.compression.type
    flush_size: int | None = None  # records per file cap
    partition_cols: tuple[str, ...] = field(default=("encoded_partition",))
    mode: str = "overwrite_partitions"  # or "append" / "overwrite"
    compression_level: int = -1  # s3.compression.level (gzip: Deflater -1..9)
    bytearray_separator: str = "\n"  # format.bytearray.separator
    max_open_files: int | None = None  # partitioner.max.open.files (-1 = unbounded)
    json_decimal_format: str = "BASE64"  # json.decimal.format (BASE64 | NUMERIC)

    def codec(self) -> str:
        key = (self.format, self.compression)
        if key not in _COMPRESSION:
            raise ValueError(f"unsupported compression {self.compression} for {self.format}")
        return _COMPRESSION[key]


def write_partitioned(df: DataFrame, path: str, cfg: SinkConfig) -> None:
    """Write records under path/<col>=<val>/... with connector semantics."""
    if cfg.format not in VALID_FORMATS:
        raise ValueError(f"format must be one of {VALID_FORMATS}, got {cfg.format}")
    spark = df.sparkSession
    if cfg.flush_size:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", str(cfg.flush_size))
    if cfg.max_open_files and cfg.max_open_files > 0:
        # partitioner.max.open.files analog: cap concurrent writers per task;
        # beyond the cap Spark sorts the remaining rows by partition key and
        # streams them writer-by-writer (bounded memory, same files)
        spark.conf.set(
            "spark.sql.maxConcurrentOutputFileWriters", str(cfg.max_open_files)
        )
    if cfg.compression == "gzip" and cfg.format in ("json", "csv", "bytearray"):
        # s3.compression.level (reference S3SinkConnectorConfig.java:150, a
        # Deflater level -1..9 handed to the gzip stream). Hadoop's GzipCodec
        # reads zlib.compress.level from the job conf; map the Deflater int
        # onto its enum. Applies to text-based codecs only (parquet manages
        # its own codec levels internally).
        level = {
            -1: "DEFAULT_COMPRESSION",
            0: "NO_COMPRESSION",
            1: "BEST_SPEED",
            9: "BEST_COMPRESSION",
        }.get(cfg.compression_level, "DEFAULT_COMPRESSION")
        spark.sparkContext._jsc.hadoopConfiguration().set("zlib.compress.level", level)
    if cfg.format == "json" and cfg.json_decimal_format == "BASE64":
        # json.decimal.format=BASE64 (Connect JsonConverter default): decimal
        # fields serialize as base64 of BigDecimal.unscaledValue().toByteArray()
        # (minimal-length two's complement). Not a hot analytics path — the
        # encode is an Arrow-batched UDF applied only to decimal columns at
        # the sink boundary.
        from pyspark.sql import functions as F
        from pyspark.sql.types import DecimalType

        from .json_decimal import make_b64_encoder

        dec_fields = [f for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
        for fld in dec_fields:
            df = df.withColumn(
                fld.name, make_b64_encoder(fld.dataType.scale)(F.col(fld.name))
            )

    if cfg.mode == "overwrite_partitions":
        # exactly-once analog: replaying the same input overwrites the same
        # partition dirs (no duplicate accumulation), others untouched
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        mode = "overwrite"
    else:
        mode = cfg.mode

    if cfg.format == "bytearray":
        # ByteArrayFormat (reference format/bytearray/ByteArrayFormat.java):
        # raw record values written back to back, one per line separator.
        # Spark's text writer is exactly that — one payload column, newline
        # separated, gzip-able.
        from pyspark.sql import functions as F

        payload = [c for c in df.columns if c not in cfg.partition_cols]
        if len(payload) != 1:
            raise ValueError(
                f"bytearray format needs exactly one payload column, got {payload}"
            )
        df = df.select(
            *cfg.partition_cols, F.col(payload[0]).cast("string").alias("value")
        )

    writer = df.write.mode(mode).option("compression", cfg.codec())
    if cfg.partition_cols:
        writer = writer.partitionBy(*cfg.partition_cols)
    if cfg.format == "bytearray":
        # format.bytearray.separator (ByteArrayFormat's line.separator analog)
        if cfg.bytearray_separator != "\n":
            writer = writer.option("lineSep", cfg.bytearray_separator)
        writer.format("text").save(path)
    elif cfg.format == "avro":
        # Preferred: the JVM spark-avro datasource (columnar, any Hadoop FS).
        # Fallback: the built-in spec-compliant pure-Python container writer
        # (avro_py) — still distributed (serialization runs on executors),
        # still deterministic-replay (sync marker + chunk naming), local/NFS
        # paths only. Reference format/avro/AvroFormat.java.
        try:
            writer.format("avro").save(path)
        except Exception as e:
            # Only fall back when the avro DATASOURCE is absent (spark-avro
            # jar not on the classpath) AND the target is a local path the
            # Python writer can actually reach. A JVM writer that exists but
            # failed mid-write (data error, executor loss) or a remote URI
            # (s3a://...) must re-raise: silently writing to a literal
            # 's3a:/...' local directory or masking the real failure would
            # corrupt the sink's exactly-once story.
            msg = str(e)
            datasource_missing = (
                "Failed to find data source" in msg
                or "Failed to find the data source" in msg
                or "ClassNotFoundException" in msg
                or "DATA_SOURCE_NOT_FOUND" in msg
            )
            has_remote_scheme = "://" in path
            if not datasource_missing or has_remote_scheme:
                raise
            from .avro_py import write_avro_partitioned

            write_avro_partitioned(
                df,
                path,
                cfg.partition_cols,
                codec={"uncompressed": "null", "deflate": "deflate",
                       "snappy": "snappy"}[cfg.codec()],
                flush_size=cfg.flush_size,
                level=cfg.compression_level,
                overwrite_partitions=(cfg.mode == "overwrite_partitions"),
            )
    else:
        writer.format(cfg.format).save(path)


def write_kv_header_views(
    records: DataFrame,
    base_path: str,
    cfg: SinkConfig,
    value_cols: tuple[str, ...] = ("offset", "value"),
    key_cols: tuple[str, ...] = ("offset", "key"),
    header_cols: tuple[str, ...] = ("offset", "headers"),
    keys_format: str | None = None,
    headers_format: str | None = None,
) -> None:
    """store.kafka.keys / store.kafka.headers: write the key and header
    streams as sibling datasets of the value stream, same partitioning
    (reference format/KeyValueHeaderRecordWriterProvider.java). The sidecar
    formats are independently configurable (keys.format.class /
    headers.format.class, S3SinkConnectorConfig.java:223-226); default is
    the value format."""
    from dataclasses import replace

    part = list(cfg.partition_cols)
    write_partitioned(records.select(*part, *value_cols), f"{base_path}/values", cfg)
    key_cfg = cfg if keys_format in (None, cfg.format) else replace(
        cfg, format=keys_format, compression=_compat_compression(keys_format, cfg.compression)
    )
    write_partitioned(records.select(*part, *key_cols), f"{base_path}/keys", key_cfg)
    headers_flat = records.select(*part, *header_cols)
    # maps don't round-trip through csv/json cleanly; headers fall back to
    # parquet unless an explicit headers.format.class says otherwise
    hdr_fmt = headers_format or "parquet"
    hdr_cfg = replace(
        cfg, format=hdr_fmt, compression=_compat_compression(hdr_fmt, cfg.compression)
    )
    write_partitioned(headers_flat, f"{base_path}/headers", hdr_cfg)


def _compat_compression(fmt: str, compression: str) -> str:
    """Carry the configured compression to a sidecar format when that
    format supports it; otherwise drop to none."""
    return compression if (fmt, compression) in _COMPRESSION else "none"
