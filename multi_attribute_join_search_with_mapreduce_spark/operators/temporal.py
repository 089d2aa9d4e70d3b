"""Temporal joins the reference lacks but a general engine must expose
(SURVEY.md §2.3 "notably absent": range/as-of joins).

:func:`asof_join` is the scalable union+window formulation: tag both
sides, union them, and take per-key the last right-side payload at or
before each left row — **one shuffle on the key, zero row blow-up**.
The naive formulation (non-equi join + row_number) multiplies each left
row by every earlier right row before pruning; at 100 TB that
intermediate is the difference between a working plan and an OOM. The
right-side payload travels as a single struct so all its fields come
from the same matched row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    right_cols: list[str],
    tiebreak: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward (inclusive) as-of join: for every ``left`` row, attach
    the latest ``right`` row with the same ``on`` keys and
    ``right.ts <= left.ts``. Ties on ``ts`` resolve to the largest
    ``tiebreak`` value. Unmatched left rows keep NULL payloads.
    """
    payload = F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("_payload")
    l_tagged = left.withColumn("_is_left", F.lit(1)).withColumn(
        "_payload", F.lit(None).cast(right.select(payload).schema["_payload"].dataType)
    )
    r_tagged = (
        right.select(*on, ts, tiebreak, payload)
        .withColumn("_is_left", F.lit(0))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc(ts), F.asc("_is_left"), F.asc(tiebreak))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    )
    out = matched.filter(F.col("_is_left") == 1).drop("_is_left", "_payload")
    for c in right_cols:
        out = out.withColumn(f"{prefix}{c}", F.col("_asof")[c])
    return out.drop("_asof")


def purchase_click_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """For each purchase, the same user's most recent click at-or-before
    it (classic last-touch attribution) — exercises the as-of join."""
    e = load_table(spark, "events", sf)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click")
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        ts="ts",
        right_cols=["event_id", "ts"],
        tiebreak="event_id",
        prefix="click_",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("click_event_id"),
        F.col("click_ts"),
        F.round(
            (F.col("ts").cast("double") - F.col("click_ts").cast("double")), 3
        ).alias("secs_since_click"),
        # matched-only for the oracle: NULL timestamps (NaT) trip
        # pandas-level ns/us comparisons in external differs
    ).filter(F.col("click_event_id").isNotNull())


PURCHASE_CLICK_SQL = """
WITH purch AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT event_id, user_id, ts, click_event_id, click_ts,
  ROUND(EPOCH(ts) - EPOCH(click_ts), 3) AS secs_since_click
FROM (
  SELECT p.event_id, p.user_id, p.ts,
         c.event_id AS click_event_id, c.ts AS click_ts,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id
           ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST
         ) AS rn
  FROM purch p JOIN clicks c
    ON c.user_id = p.user_id AND c.ts <= p.ts
) WHERE rn = 1
"""


def lineitem_ship_window(spark: SparkSession, sf: str) -> DataFrame:
    """Range join: line items shipped within 30 days of their order date
    (equi key + interval predicate — Catalyst evaluates the band as a
    post-join filter on the hash join, no cartesian)."""
    li = load_table(spark, "lineitem", sf)
    o = load_table(spark, "orders", sf)
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_fast_shipped")
    ).orderBy("o_orderpriority")


LINEITEM_SHIP_WINDOW_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_fast_shipped
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


TEMPORAL_QUERIES: dict[str, QuerySpec] = {
    "asof_purchase_click": QuerySpec(purchase_click_attribution, PURCHASE_CLICK_SQL),
    "range_join_ship_window": QuerySpec(lineitem_ship_window, LINEITEM_SHIP_WINDOW_SQL),
}
