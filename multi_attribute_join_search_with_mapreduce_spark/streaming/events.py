"""Structured Streaming surface (SURVEY.md §7 M6 — green-field; the
reference is batch-only).

Patterns covered, all built-in Structured Streaming:

- file-source stream over the events parquet (stands in for Kafka —
  swap ``readStream.format`` for production);
- watermark + tumbling-window aggregation (late data beyond the
  watermark is dropped by the engine);
- streaming dedup bounded by the watermark
  (``dropDuplicatesWithinWatermark``).

Tests drive these with the memory sink + ``processAllAvailable`` and
assert parity with the batch renditions in ``operators/events.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream_from_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the events fixture (one file per batch)."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        # file-source streams take a directory; pick out just the events file
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour counts per event type with a watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window").getField("start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Drop duplicate event_ids arriving within the watermark bound —
    streaming state stays bounded by the watermark (exactly-once-ish
    ingestion dedup)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_stream_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming query to completion on available data; return
    the materialized result (test/smoke harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
