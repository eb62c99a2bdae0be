"""Custom stateful streaming operator (SURVEY.md §2.9 T5, §2.1 S9 persist).

`keyed_running_stats` keeps per-key running (count, sum, last event-time)
across micro-batches with `applyInPandasWithState` — the Spark-native form
of the reference's persisted state storage (`persist: true` writes the LRU
through to ES, /root/reference/asset/elasticsearch_state_storage/
schema.js:30-33): state lives in the streaming checkpoint, so a restarted
query resumes exactly where it stopped (tested).

State is Arrow-typed and partitioned by key — at 10^9 keys this scales with
executors (RocksDB state store in production configs), no driver state.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key string, cnt bigint, total double, last_ts timestamp"
# STATE_VERSION history:
#   v1: (cnt, total, last_ms)  — millisecond event-time
#   v2: (cnt, total, last_us)  — microsecond event-time (parquet TIMESTAMP
#       precision; ms truncation diverged from a batch max(ts))
# Changing the state struct is CHECKPOINT-INCOMPATIBLE: Spark's state-schema
# check aborts a restart from an older checkpoint (fail-safe — never a
# silent ms/us reinterpretation). Restarting a v1 query on v2 code requires
# a fresh checkpoint; the source replays and rebuilds state.
STATE_VERSION = 2
STATE_SCHEMA = "cnt bigint, total double, last_us bigint"


def _stats_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cnt, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            # microsecond precision: event timestamps are parquet TIMESTAMP
            # (us); ms truncation would lose ordering vs a batch max(ts)
            last_us = max(last_us, int(pdf["ts"].max().value // 1_000))
    state.update((cnt, float(total), int(last_us)))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "cnt": [cnt],
            "total": [total],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def keyed_running_stats(
    stream: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running (count, sum, max event-time), updated every batch.

    Input stream needs (key_col, ts_col timestamp, value_col numeric); the
    state handle persists in the checkpoint across restarts.
    """
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _stats_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
