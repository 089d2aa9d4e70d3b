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


PYSOURCE_QUERIES: dict[str, QuerySpec] = {
    "python_datasource_scan": QuerySpec(python_datasource_scan, PYTHON_DATASOURCE_SQL),
}
