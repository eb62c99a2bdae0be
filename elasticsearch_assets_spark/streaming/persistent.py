"""Persistent (continuous) reading as Structured Streaming.

The reference's persistent mode emits one slice per `interval` tumbling
window, lagged `delay` behind wall-clock so late/unflushed writes are
captured (/root/reference/asset/elasticsearch_reader/slicer.js:382-467;
rationale /root/reference/docs/ops_reference.md:79-99). The Spark-native
mapping (SURVEY.md §2.9 T1-T5):

  interval  -> F.window(ts, interval)  (tumbling only — the reference never
               slides: slicer.js:414-419 advances start and limit together)
  delay     -> withWatermark(ts, delay): event-time lag instead of the
               reference's wall-clock timer; under backlog the watermark
               pauses with the data, which strictly dominates the reference's
               fixed timer (it would emit empty slices)
  state     -> dropDuplicatesWithinWatermark / checkpointLocation

All helpers take/return streaming DataFrames; sources are pluggable
(`file_stream` over a growing table dir, `generator_stream` over the rate
source — the persistent analogue of the reference's data generator
/root/reference/asset/elasticsearch_data_generator/index.js:80-96).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# interval validation mirrors utils.js dateOptions
# (/root/reference/asset/elasticsearch_reader/elasticsearch_date_range/utils.js:6-47)
_UNITS = {
    "ms": "millisecond", "s": "second", "m": "minute", "h": "hour", "d": "day",
    "millisecond": "millisecond", "second": "second", "minute": "minute",
    "hour": "hour", "day": "day",
    "milliseconds": "millisecond", "seconds": "second", "minutes": "minute",
    "hours": "hour", "days": "day",
}


def parse_interval(spec: str) -> str:
    """'5s' / '2m' / '500ms' / '5_s' -> a Spark window duration string.

    Persistent mode requires an explicit interval (no 'auto'):
    /root/reference/asset/elasticsearch_reader/index.js:288-295.
    """
    s = spec.strip().lower().replace("_", "")
    if s == "auto":
        raise ValueError("persistent mode requires an explicit interval, not 'auto'")
    i = 0
    while i < len(s) and (s[i].isdigit()):
        i += 1
    num, unit = s[:i] or "1", s[i:].strip()
    if unit not in _UNITS:
        raise ValueError(f"unknown interval unit {unit!r} in {spec!r}")
    return f"{int(num)} {_UNITS[unit]}"


def file_stream(
    spark: SparkSession, path: str, schema: str, fmt: str = "parquet"
) -> DataFrame:
    """Stream a growing table directory — the persistent-mode reader source."""
    return spark.readStream.schema(schema).format(fmt).load(path)


def generator_stream(
    spark: SparkSession, rows_per_second: int = 100, partitions: int = 4
) -> DataFrame:
    """T3: continuous synthetic docs from the rate source, fields derived
    deterministically from the sequence number (same style as the batch
    generator in datagen/events.py)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", partitions)
        .load()
    )
    i = F.col("value")
    return rate.select(
        i.alias("event_id"),
        F.col("timestamp").alias("created"),
        F.concat(F.lit("https://example"), (i % 97).cast("string"), F.lit(".org")).alias("url"),
        (F.lit(7850) + (i * 31) % F.lit(5642867 - 7850)).alias("bytes"),
        F.concat(
            ((i * 7) % 160 - 80).cast("string"), F.lit(","), ((i * 13) % 340 - 170).cast("string")
        ).alias("location"),
    )


def persistent_window(
    stream: DataFrame, ts_col: str, interval: str, delay: str | None = None
) -> DataFrame:
    """Attach the persistent-mode tumbling window (+ watermark = delay)."""
    w = parse_interval(interval)
    if delay is not None:
        stream = stream.withWatermark(ts_col, parse_interval(delay))
    return stream.withColumn("window", F.window(F.col(ts_col), w))


def windowed_counts(
    stream: DataFrame, ts_col: str, interval: str, delay: str | None = None
) -> DataFrame:
    """The per-slice count stream — A1's histogram in persistent form:
    (window.start, window.end, cnt), one row per tumbling interval."""
    w = parse_interval(interval)
    if delay is not None:
        stream = stream.withWatermark(ts_col, parse_interval(delay))
    return (
        stream.groupBy(F.window(F.col(ts_col), w).alias("window"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            F.col("cnt"),
        )
    )


def stream_dedup(
    stream: DataFrame, keys: list[str], ts_col: str, delay: str
) -> DataFrame:
    """T5: keyed dedup bounded by the watermark — the streaming analogue of
    the reference's state-storage mget/mset dedup cache
    (/root/reference/asset/elasticsearch_state_storage/api.js:6-33)."""
    return stream.withWatermark(ts_col, parse_interval(delay)).dropDuplicatesWithinWatermark(
        keys
    )


def run_to_table(
    stream: DataFrame,
    *,
    checkpoint_dir: str,
    output_mode: str = "append",
    queryName: str = "esa_stream",
) -> "DataFrame":
    """Drive a streaming plan over all currently-available input (the batch
    boundary the reference pins at job start, docs/ops_reference.md:113) and
    return the collected result as a batch DataFrame (memory sink)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(queryName)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream.sparkSession.table(queryName)
