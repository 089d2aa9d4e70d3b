"""Skew-mitigation utilities (SURVEY.md §4 / the 100 TB design bar).

Two layers of defense against hot keys:

1. **AQE skew-join splitting** is on session-wide
   (``session.py``: ``spark.sql.adaptive.skewJoin.enabled``) — Spark
   splits oversized shuffle partitions of a sort-merge join at runtime.
2. **Salting**, here, for *aggregations* over power-law keys (a handful
   of users producing most events): a two-stage ``groupBy`` where stage
   one fans each hot key out over ``n_salts`` synthetic sub-keys so no
   single reducer owns a hot key, stage two folds the partials. Both
   stages are partial-aggregated map-side; the result is byte-identical
   to the naive single-stage plan, which is the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

N_SALTS = 16


def salted_count(
    df: DataFrame, keys: list[str], n_salts: int = N_SALTS
) -> DataFrame:
    """Two-stage salted count-per-key, safe for power-law key skew."""
    salted = df.withColumn("_salt", F.monotonically_increasing_id() % n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("n_events"))


def salted_event_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Per-(user, event_type) counts via salted two-stage aggregation."""
    e = load_table(spark, "events", sf)
    return salted_count(e, ["user_id", "event_type"]).orderBy("user_id", "event_type")


SALTED_EVENT_COUNTS_SQL = """
SELECT user_id, event_type, COUNT(*) AS n_events
FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type
"""


SKEW_QUERIES: dict[str, QuerySpec] = {
    "salted_event_counts": QuerySpec(salted_event_counts, SALTED_EVENT_COUNTS_SQL),
}
