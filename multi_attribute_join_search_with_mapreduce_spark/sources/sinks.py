"""Sink surface: writers for results and derived tables.

The reference's only sinks are ``df.show()``/``collect()`` and a parquet
intermediate cache (``Par_Search.py:118-134``, SURVEY.md §2.1 S5/S7).
A general engine also needs durable, partition-aware writes; these thin
wrappers standardize the options that matter at scale:

- **parquet, partitioned**: ``partitionBy`` on low-cardinality columns
  gives partition pruning to every downstream reader; never partition by
  a high-cardinality key (one directory per value).
- **parquet, bucketed**: hash-bucket by join key at write time so
  probe-side joins skip the shuffle (see
  :func:`..index.write_posting_index` for the posting-index instance).
- **csv / json**: interchange formats; header + explicit compression.
- ``maxRecordsPerFile`` guards against giant single files when a
  partition is skewed.

All writers take a ``mode`` (default ``error`` — refuse to clobber;
callers opt into ``overwrite``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "error",
    max_records_per_file: int | None = 5_000_000,
) -> None:
    w = df.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "error", compression: str = "gzip"
) -> None:
    df.write.mode(mode).option("header", "true").option(
        "compression", compression
    ).csv(path)


def write_json(
    df: DataFrame, path: str, mode: str = "error", compression: str = "gzip"
) -> None:
    df.write.mode(mode).option("compression", compression).json(path)


def read_json_source(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON reader; pass an explicit schema in production — schema
    inference reads the data twice."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
