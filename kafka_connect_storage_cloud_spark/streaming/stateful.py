"""Stateful streaming rotation: the rotate.interval.ms policy across
micro-batch boundaries, keyed per (kafka_partition, encoded_partition).

The connector's TopicPartitionWriter keeps one open file per encoded
partition and rotates when recordTimestamp - baseRecordTimestamp >= interval
(reference TopicPartitionWriter.java:659-703); the base resets to the first
record of each new file. That writer state lives across poll() calls — in
Structured Streaming terms, across micro-batches. applyInPandasWithState is
the Spark-native home for it: the GroupState holds (base_ts_ms, file_seq,
file_start_offset) per key, so a record arriving three micro-batches later
still lands in the file its timestamp belongs to.

Ordering contract: per (kafka_partition, encoded_partition), offsets must
arrive in non-decreasing order across micro-batches — exactly what the Kafka
source guarantees per topic-partition (same contract the connector's
consumer loop relies on).

Scale: state is 3 longs per open (kafka_partition, encoded_partition) —
thousands of keys at 100 TB, bytes each; the per-key pandas pass touches
only that key's slice of the micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("kafka_partition", IntegerType()),
        StructField("encoded_partition", StringType()),
        StructField("offset", LongType()),
        StructField("ts_ms", LongType()),
        StructField("file_seq", LongType()),
        StructField("file_start_offset", LongType()),
        StructField("file_path", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("base_ts_ms", LongType()),
        StructField("file_seq", LongType()),
        StructField("file_start_offset", LongType()),
    ]
)


def _ts_ms(col: pd.Series) -> pd.Series:
    """Millisecond epoch from either datetime64[ns|us] or raw int64 nanos."""
    if pd.api.types.is_datetime64_any_dtype(col):
        return col.values.astype("datetime64[ms]").astype("int64")
    return col.astype("int64") // 1_000_000


def rotate_interval_stateful(
    records: DataFrame,
    rotate_interval_ms: int,
    ts_col: str = "timestamp",
    ext: str = "parquet",
) -> DataFrame:
    """Assign every streaming record to its output file under
    rotate.interval.ms semantics, with the open-file state carried across
    micro-batches. Produces the same manifest as the batch
    operators.rotation.assign_files_rotate_interval when records arrive in
    per-key offset order."""

    from ..session import ship_package

    ship_package(records.sparkSession)

    def assign(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        kafka_partition, encoded_partition = key
        base_ts, seq, start = state.get if state.exists else (None, -1, None)
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks).sort_values("offset").reset_index(drop=True)
        ts_ms = _ts_ms(pdf[ts_col])
        seqs: list[int] = []
        starts: list[int] = []
        for off, t in zip(pdf["offset"].tolist(), ts_ms.tolist()):
            if base_ts is None or t - base_ts >= rotate_interval_ms:
                seq += 1
                base_ts = t
                start = off
            seqs.append(seq)
            starts.append(start)
        state.update((int(base_ts), int(seq), int(start)))
        topic = pdf["topic"].iloc[0]
        out = pd.DataFrame(
            {
                "topic": pdf["topic"],
                "kafka_partition": pdf["kafka_partition"].astype("int32"),
                "encoded_partition": encoded_partition,
                "offset": pdf["offset"].astype("int64"),
                "ts_ms": pd.Series(ts_ms, dtype="int64"),
                "file_seq": pd.Series(seqs, dtype="int64"),
                "file_start_offset": pd.Series(starts, dtype="int64"),
            }
        )
        out["file_path"] = (
            topic
            + "/"
            + out["encoded_partition"]
            + "/"
            + topic
            + "+"
            + out["kafka_partition"].astype(str)
            + "+"
            + out["file_start_offset"].map(lambda o: f"{o:010d}")
            + f".{ext}"
        )
        yield out

    return records.groupBy("kafka_partition", "encoded_partition").applyInPandasWithState(
        assign,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def make_rotate_processor(rotate_interval_ms: int, ts_col: str, ext: str):
    """transformWithStateInPandas processor (Spark 4's arbitrary-stateful
    API — the successor to applyInPandasWithState, with explicit typed state
    handles, timers, and multi-state support). Same rotate.interval.ms
    semantics and state as rotate_interval_stateful.

    Fully self-contained (locals + in-method imports only): the TWS state
    -schema driver worker unpickles the processor in a bare Python process
    where this package is not importable, so the class must not reference
    module-level names.

    GATED in this container: the TWS state server protocol needs
    google.protobuf, which isn't installed here (pytest importorskips); on a
    real cluster (protobuf ships with Spark distributions' Python deps) this
    path runs as-is with the RocksDB state store provider."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            from pyspark.sql.types import LongType, StructField, StructType

            self._state = handle.getValueState(
                "open_file",
                StructType(
                    [
                        StructField("base_ts_ms", LongType()),
                        StructField("file_seq", LongType()),
                        StructField("file_start_offset", LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            kafka_partition, encoded_partition = key
            prior = self._state.get() if self._state.exists() else None
            base_ts, seq, start = prior if prior is not None else (None, -1, None)
            chunks = [p for p in rows if len(p)]
            if not chunks:
                return
            pdf = _pd.concat(chunks).sort_values("offset").reset_index(drop=True)
            col = pdf[ts_col]
            if _pd.api.types.is_datetime64_any_dtype(col):
                ts_ms = col.values.astype("datetime64[ms]").astype("int64")
            else:
                ts_ms = col.astype("int64") // 1_000_000
            seqs, starts = [], []
            for off, t in zip(pdf["offset"].tolist(), list(ts_ms)):
                if base_ts is None or t - base_ts >= rotate_interval_ms:
                    seq += 1
                    base_ts = t
                    start = off
                seqs.append(seq)
                starts.append(start)
            self._state.update((int(base_ts), int(seq), int(start)))
            topic = pdf["topic"].iloc[0]
            out = _pd.DataFrame(
                {
                    "topic": pdf["topic"],
                    "kafka_partition": pdf["kafka_partition"].astype("int32"),
                    "encoded_partition": encoded_partition,
                    "offset": pdf["offset"].astype("int64"),
                    "ts_ms": _pd.Series(ts_ms, dtype="int64"),
                    "file_seq": _pd.Series(seqs, dtype="int64"),
                    "file_start_offset": _pd.Series(starts, dtype="int64"),
                }
            )
            out["file_path"] = (
                topic
                + "/"
                + out["encoded_partition"]
                + "/"
                + topic
                + "+"
                + out["kafka_partition"].astype(str)
                + "+"
                + out["file_start_offset"].map(lambda o: f"{o:010d}")
                + f".{ext}"
            )
            yield out

        def close(self) -> None:
            pass

    return _Processor()


def rotate_interval_tws(
    records: DataFrame,
    rotate_interval_ms: int,
    ts_col: str = "timestamp",
    ext: str = "parquet",
) -> DataFrame:
    """rotate.interval.ms via transformWithStateInPandas. Identical output
    contract to rotate_interval_stateful; the session must run the RocksDB
    state store provider (spark.sql.streaming.stateStore.providerClass)."""
    from ..session import ship_package

    ship_package(records.sparkSession)
    return records.groupBy("kafka_partition", "encoded_partition").transformWithStateInPandas(
        statefulProcessor=make_rotate_processor(rotate_interval_ms, ts_col, ext),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
