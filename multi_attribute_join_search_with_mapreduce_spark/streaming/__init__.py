from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
    events_stream_from_parquet,
    windowed_counts_stream,
    dedup_within_watermark_stream,
    run_stream_to_memory,
)

__all__ = [
    "events_stream_from_parquet",
    "windowed_counts_stream",
    "dedup_within_watermark_stream",
    "run_stream_to_memory",
]
