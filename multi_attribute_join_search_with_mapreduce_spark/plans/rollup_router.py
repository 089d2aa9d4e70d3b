"""Materialized-view matching: route grain queries to the finest
materialized rollup that can answer them, never to the raw facts.

`operators/events.py:hierarchical_rollup` showed the rollup pyramid
computed in one plan; this module makes the reuse AUTOMATIC and
durable: materialized partial tables (parquet) register with their
grain, and `answer_at_grain` resolves a requested grain to the finest
registered grain that divides into it (week from day, month from day
or week, day only from day), re-aggregating the mergeable partials —
COUNT sums exactly and SUM stays decimal, so the routed answer is
bit-identical to grouping the raw facts directly (the differential
oracle's claim).

This is the query-rewrite half of materialized-view support in
warehouse engines (Calcite's view matching, BigQuery's MV rewrite): at
100 TB the difference between every dashboard panel rescanning the
fact table and each one reading a few thousand partial rows.

Router policy: grains form a containment chain (day ⊂ week ⊂ month —
each coarser bucket is a union of finer buckets, using ISO week / date
truncation semantics consistently on both engines); among the
registered grains that can answer the request, the COARSEST wins — it
has the fewest partial rows to re-aggregate (an exact-match rollup is
read as-is). A grain with no registered ancestor raises — falling back
to the facts silently would hide exactly the rescan this layer exists
to prevent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multi_attribute_join_search_with_mapreduce_spark.scratch import scratch_dir
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

DEC = "decimal(18,2)"

# grain -> every coarser grain it can answer (truncation-compatible:
# date_trunc(coarse, bucket_fine) == date_trunc(coarse, ts) for every
# ts in the fine bucket).
_ANSWERS = {
    "day": ("day", "week", "month"),
    "week": ("week",),  # ISO weeks straddle month boundaries
    "month": ("month",),
}


class RollupCatalog:
    """Registered materialized partials: grain -> parquet path."""

    def __init__(self) -> None:
        self._tables: dict[str, str] = {}

    def register(self, grain: str, path: str) -> None:
        self._tables[grain] = path

    def route(self, requested: str) -> tuple[str, str]:
        """(grain, path) of the COARSEST registered rollup answering
        ``requested`` (fewest partial rows to re-aggregate; an exact
        match is read as-is); raises if none can."""
        candidates = [
            g for g, answers in _ANSWERS.items()
            if requested in answers and g in self._tables
        ]
        if not candidates:
            raise ValueError(
                f"no materialized rollup can answer grain {requested!r}; "
                f"registered: {sorted(self._tables)}"
            )
        # coarsest = answers the fewest grains (week < day); an exact
        # match always wins over re-aggregating a finer grain.
        best = min(candidates, key=lambda g: len(_ANSWERS[g]))
        return best, self._tables[best]


def materialize_daily_rollup(spark: SparkSession, sf: str, out_path: str) -> None:
    """The ingest-time step: day × event_type mergeable partials
    (exact count + decimal sum) written as the materialized table."""
    e = load_table(spark, "events", sf)
    (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).alias("sum_dec"),
        )
        .write.mode("overwrite")
        .parquet(out_path)
    )


def answer_at_grain(
    spark: SparkSession, catalog: RollupCatalog, grain: str
) -> DataFrame:
    """The routed query: resolve the grain, read ONLY the matched
    rollup, re-aggregate its mergeable partials."""
    src_grain, path = catalog.route(grain)
    partials = spark.read.parquet(path)
    bucket = (
        F.col("bucket") if src_grain == grain
        else F.date_trunc(grain, F.col("bucket"))
    )
    return (
        partials.groupBy(bucket.alias("bucket"), "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_dec").cast("decimal(28,2)").cast("double").alias("total_value"),
        )
        .orderBy("bucket", "event_type")
    )


def rollup_router_weekly(spark: SparkSession, sf: str) -> DataFrame:
    """Registry entry: materialize the day rollup, then answer a WEEKLY
    query through the router — which must serve it from the day
    partials (plan-asserted in tests: the routed scan reads the rollup
    path, not the events table). Oracle = direct weekly GROUP BY over
    the raw facts, so the rewrite is proven answer-preserving."""

    path = scratch_dir("majs_rollup_router_") + "/daily"
    materialize_daily_rollup(spark, sf, path)
    catalog = RollupCatalog()
    catalog.register("day", path)
    return answer_at_grain(spark, catalog, "week")


ROLLUP_ROUTER_SQL = """
SELECT date_trunc('week', ts) AS bucket, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY bucket, event_type
"""


ROUTER_QUERIES: dict[str, QuerySpec] = {
    "rollup_router_weekly": QuerySpec(rollup_router_weekly, ROLLUP_ROUTER_SQL),
}
