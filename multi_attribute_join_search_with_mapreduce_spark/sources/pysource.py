"""Custom connector surface: the Spark 4 Python Data Source API.

The reference reads its lake from a warehouse connection and its query
tables from CSV/HTTP (``handlers.py``); a modern engine also needs a
way to plug ARBITRARY feeds in as first-class sources — internal REST
APIs, proprietary formats, synthetic generators — without a JVM
connector. Spark 4's ``pyspark.sql.datasource`` API is that extension
point: a Python class declares the schema, plans ``InputPartition``s,
and yields rows per partition; the engine parallelizes partitions
across executors like any scan.

The instance here is a deterministic synthetic-events generator
(`majs_synthevents`): partition ``p`` of ``P`` yields every ``k ≡ p
(mod P)`` below ``n``, each row a closed-form function of ``k`` — so a
DuckDB oracle can replay the content exactly from ``range(n)`` and the
whole custom-source path (registration → partition planning →
per-partition iterators → downstream aggregation) is value-checked,
not just smoke-tested.

Scale notes: partitions are independent generators (no driver data
path); the source is CPU-bound Python, so a production feed would yield
Arrow batches (the API accepts them) — row-yield is fine for the
demonstration and the aggregation downstream is ordinary Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multi_attribute_join_search_with_mapreduce_spark.scratch import scratch_dir
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec

_N_ROWS = 20_000
_N_PARTS = 8
_ETYPES = ("view", "click", "purchase", "refund")


def _make_source():
    """Build the DataSource/DataSourceReader subclasses lazily (the
    base classes are worker-serialized; a factory keeps the module
    importable in environments probing it without Spark up)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class SyntheticEventsReader(DataSourceReader):
        def __init__(self, options) -> None:
            self.n = int(options.get("n", _N_ROWS))
            self.parts = int(options.get("parts", _N_PARTS))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            etypes = _ETYPES
            for k in range(partition.value, self.n, self.parts):
                yield (k, k % 97, etypes[k % 4], (k % 1000) / 10.0)

    class SyntheticEventsSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "majs_synthevents"

        def schema(self) -> str:
            return "event_id long, user_id long, event_type string, value double"

        def reader(self, schema):
            return SyntheticEventsReader(self.options)

    return SyntheticEventsSource


def python_datasource_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Registry entry: read the custom Python data source (8 planned
    partitions) and aggregate per event type. ``sf`` unused — the
    source IS the data. The oracle replays the generator's closed form
    over ``range(n)``, so partition planning and the per-partition
    iterators are value-checked end to end."""
    spark.dataSource.register(_make_source())
    df = (
        spark.read.format("majs_synthevents")
        .option("n", str(_N_ROWS))
        .option("parts", str(_N_PARTS))
        .load()
    )
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
        .orderBy("event_type")
    )


PYTHON_DATASOURCE_SQL = f"""
WITH gen AS (
  SELECT k AS event_id, k % 97 AS user_id,
    CASE k % 4 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
               WHEN 2 THEN 'purchase' ELSE 'refund' END AS event_type,
    CAST(k % 1000 AS DOUBLE) / 10.0 AS value
  FROM range({_N_ROWS}) t(k)
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
  CAST(MIN(event_id) AS BIGINT) AS min_id,
  CAST(MAX(event_id) AS BIGINT) AS max_id
FROM gen GROUP BY event_type ORDER BY event_type
"""


# --- streaming variant: a Python-defined micro-batch source ----------------

_STREAM_BATCH = 4_000


def _make_stream_source():
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options) -> None:
            self.n = int(options.get("n", _N_ROWS))
            self.batch = int(options.get("batch", _STREAM_BATCH))

        def initialOffset(self):
            return {"k": 0}

        def read(self, start):
            k0 = start["k"]
            k1 = min(k0 + self.batch, self.n)
            rows = [
                (k, k % 97, _ETYPES[k % 4], (k % 1000) / 10.0)
                for k in range(k0, k1)
            ]
            return iter(rows), {"k": k1}

        def readBetweenOffsets(self, start, end):
            return iter(
                (k, k % 97, _ETYPES[k % 4], (k % 1000) / 10.0)
                for k in range(start["k"], end["k"])
            )

    class SyntheticEventsStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "majs_synthevents_stream"

        def schema(self) -> str:
            return "event_id long, user_id long, event_type string, value double"

        def simpleStreamReader(self, schema):
            return SyntheticEventsStreamReader(self.options)

    return SyntheticEventsStreamSource


def python_stream_source_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Registry entry: the STREAMING Python data source — a custom
    micro-batch reader (offset bookkeeping + replayable
    ``readBetweenOffsets``, i.e. the Kafka contract written in Python)
    feeding a streaming aggregation drained to a memory sink. The
    oracle is the same closed form as the batch source, so the offset
    pagination provably delivers every row exactly once across the 5
    micro-batches.
    """

    spark.dataSource.register(_make_stream_source())
    stream = (
        spark.readStream.format("majs_synthevents_stream")
        .option("n", str(_N_ROWS))
        .option("batch", str(_STREAM_BATCH))
        .load()
    )
    # no countDistinct: distinct aggregations are unsupported on
    # streaming frames (the engine would need unbounded state).
    agg = (
        stream.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )
    ckpt = scratch_dir("majs_pyds_stream_")
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("pyds_stream_sink")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    return spark.sql("SELECT * FROM pyds_stream_sink").orderBy("event_type")


PYTHON_STREAM_SOURCE_SQL = f"""
WITH gen AS (
  SELECT k AS event_id,
    CASE k % 4 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
               WHEN 2 THEN 'purchase' ELSE 'refund' END AS event_type,
    CAST(k % 1000 AS DOUBLE) / 10.0 AS value
  FROM range({_N_ROWS}) t(k)
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
  CAST(MIN(event_id) AS BIGINT) AS min_id,
  CAST(MAX(event_id) AS BIGINT) AS max_id
FROM gen GROUP BY event_type ORDER BY event_type
"""


PYSOURCE_QUERIES: dict[str, QuerySpec] = {
    "python_datasource_scan": QuerySpec(python_datasource_scan, PYTHON_DATASOURCE_SQL),
    "python_stream_source_scan": QuerySpec(
        python_stream_source_scan, PYTHON_STREAM_SOURCE_SQL
    ),
}
