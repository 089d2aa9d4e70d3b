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

from multi_attribute_join_search_with_mapreduce_spark.functions.temporal import epoch_us
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
        # Exact integer micros diff (NTZ-safe; cast-to-double is illegal
        # on TIMESTAMP_NTZ), then one shared IEEE division — bit-equal
        # to the oracle's identical expression.
        (
            (epoch_us("ts") - epoch_us("click_ts")) / F.lit(1_000_000.0)
        ).alias("secs_since_click"),
        # matched-only for the oracle: NULL timestamps (NaT) trip
        # pandas-level ns/us comparisons in external differs
    ).filter(F.col("click_event_id").isNotNull())


PURCHASE_CLICK_SQL = """
WITH purch AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT event_id, user_id, ts, click_event_id, click_ts,
  (epoch_us(ts) - epoch_us(click_ts)) / 1000000.0 AS secs_since_click
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


COGROUP_ASOF_SQL = """
WITH purch AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase' AND user_id % 5 = 0),
clicks AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click' AND user_id % 5 = 0)
SELECT event_id, user_id, ts, click_event_id, click_ts,
  (epoch_us(ts) - epoch_us(click_ts)) / 1000000.0 AS secs_since_click
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


def purchase_click_attribution_cogrouped(spark: SparkSession, sf: str) -> DataFrame:
    """The same last-touch as-of join through the COGROUPED-map API
    (``groupBy().cogroup().applyInPandas``): per user, the purchase and
    click groups meet in one pandas kernel running ``pd.merge_asof`` —
    the surface for per-key logic that needs BOTH sides as local frames
    (custom alignment, model scoring against per-key state). Gated
    against the same oracle as the native `asof_purchase_click`, so the
    two formulations are provably interchangeable.

    Parity details: clicks sort by (ts, event_id) so merge_asof's
    take-last-match rule reproduces the oracle's largest-event-id tie
    break; the seconds delta is an exact integer-micros diff over one
    IEEE division, identical to the native expression. Scale: one
    shuffle on user_id for each side (the cogroup), Arrow-batched
    kernels, per-key frames bounded by per-user activity.
    """
    import pandas as pd

    # Each side gets its OWN scan (two load_table calls, distinct
    # attribute ids) — deliberately NOT two filters of one frame.
    # When both cogroup children share one scan's attributes, a
    # count()-style consumer lets the optimizer prune the right
    # child's non-grouping columns out from under the kernel (the
    # pandas UDF then receives a key-only frame and crashes; observed
    # on Spark 4.1, full-value consumers like toPandas are unaffected,
    # which is why only the bench's count() path tripped it).
    # Independent scans keep the children's attributes distinct and
    # the pruner honest; regression-pinned in tests/test_temporal.py.
    # API-parity demo scope: a deterministic fifth of the users. The
    # kernel pays per-group pandas/Arrow overhead that the native
    # union+window plan doesn't (measured 12s vs 1s at sf0.1 on the
    # full corpus) — the gate needs the cogroup machinery proven, not
    # the whole fixture pushed through Python.
    purchases = (
        load_table(spark, "events", sf)
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") % 5 == 0))
        .select("event_id", "user_id", "ts")
    )
    clicks = (
        load_table(spark, "events", sf)
        .filter((F.col("event_type") == "click") & (F.col("user_id") % 5 == 0))
        .select("event_id", "user_id", "ts")
    )

    out_cols = [
        "event_id", "user_id", "ts", "click_event_id", "click_ts", "secs_since_click"
    ]

    def kernel(purch_pdf: pd.DataFrame, click_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(purch_pdf) == 0 or len(click_pdf) == 0:
            return pd.DataFrame(columns=out_cols)
        p = purch_pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        c = (
            click_pdf.sort_values(["ts", "event_id"])
            .rename(columns={"event_id": "click_event_id", "ts": "click_ts"})
            .reset_index(drop=True)
        )
        m = pd.merge_asof(
            p,
            c[["click_ts", "click_event_id"]],
            left_on="ts",
            right_on="click_ts",
            direction="backward",
            allow_exact_matches=True,
        )
        m = m.dropna(subset=["click_event_id"])
        ts_us = m["ts"].astype("datetime64[ns]").astype("int64") // 1000
        click_us = m["click_ts"].astype("datetime64[ns]").astype("int64") // 1000
        m["secs_since_click"] = (ts_us - click_us) / 1_000_000.0
        m["click_event_id"] = m["click_event_id"].astype("int64")
        return m[out_cols]

    schema = (
        "event_id long, user_id long, ts timestamp_ntz, "
        "click_event_id long, click_ts timestamp_ntz, secs_since_click double"
    )
    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(kernel, schema)
    )


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


def scd2_user_state(spark: SparkSession, sf: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build from a changelog: collapse
    each user's consecutive run of equal ``event_type`` into one
    versioned row with a validity interval.

    Three windowed passes over one (user_id)-partitioned sort — change
    detection (lag), run numbering (running sum of change flags), then
    interval close (lead over the grouped versions). All narrow within
    the partition: one shuffle on user_id, reused by every step, then a
    per-user groupBy that lands in the same partitioning. Validity
    bounds emitted as epoch micros (exact integer parity across
    engines; ``functions.temporal.epoch_us`` measures the lake's naive
    timestamps identically to DuckDB's ``epoch_us``).

    The open (current) version is flagged ``is_current`` and carries the
    sentinel ``valid_to_us = -1`` instead of NULL — downstream as-of
    lookups filter ``valid_from_us <= t AND (is_current OR t <
    valid_to_us)``. The sentinel is deliberate dtype hygiene: a nullable
    BIGINT column round-trips through pandas as object/None on the Spark
    side but float64/NaN on the DuckDB side, which broke the driver's
    value-hash compare in r02 even though every value matched; a
    non-null BIGINT lands as int64 in both frames.
    """
    e = load_table(spark, "events", sf)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    changed = (
        F.lag("event_type", 1).over(w).isNull()
        | (F.col("event_type") != F.lag("event_type", 1).over(w))
    ).cast("long")
    runs = (
        e.withColumn("version", F.sum(changed).over(w))
        .groupBy("user_id", "version")
        .agg(
            F.min("event_type").alias("state"),
            F.min(epoch_us("ts")).alias("valid_from_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("valid_from_us", 1).over(wv)
    return runs.select(
        "user_id",
        "version",
        "state",
        "valid_from_us",
        F.coalesce(nxt, F.lit(-1).cast("long")).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
        "n_events",
    )


SCD2_SQL = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
    CASE WHEN LAG(event_type, 1) OVER w IS NULL
           OR event_type <> LAG(event_type, 1) OVER w
         THEN 1 ELSE 0 END AS changed
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
runs AS (
  SELECT user_id,
    CAST(SUM(changed) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS BIGINT) AS version,
    event_type, ts
  FROM flagged
),
grouped AS (
  SELECT user_id, version, MIN(event_type) AS state,
    MIN(epoch_us(ts)) AS valid_from_us, COUNT(*) AS n_events
  FROM runs GROUP BY user_id, version
)
SELECT user_id, version, state, valid_from_us,
  COALESCE(LEAD(valid_from_us, 1) OVER w2, -1) AS valid_to_us,
  LEAD(valid_from_us, 1) OVER w2 IS NULL AS is_current,
  n_events
FROM grouped
WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
"""


# Changelog-compaction cutoff: rows at or after this instant are the
# "incoming batch", rows before it the base snapshot. Mid-January so
# both sides are populated at every fixture scale (events start
# 2024-01-01).
_CDC_CUTOFF = "2024-01-08 00:00:00"


def cdc_latest_state(spark: SparkSession, sf: str) -> DataFrame:
    """Latest-wins changelog merge (the batch equivalent of MERGE INTO /
    streaming upsert compaction): base snapshot = each user's last event
    before the cutoff; incoming batch = events after; merged state = the
    newest row per user, tagged with whether the batch overwrote the
    snapshot.

    One row_number per side plus one over the union — all on the same
    (user_id) shuffle key, so AQE coalesces it to a single exchange
    reused thrice. Scale-safe: no driver state, no broadcast of either
    side (both are fact-sized at 100 TB; a real lakehouse MERGE would
    also shuffle both sides on the key).
    """
    e = load_table(spark, "events", sf).select(
        "user_id", "event_type", "value", epoch_us("ts").alias("ts_us"), "event_id"
    )
    cutoff = epoch_us(F.lit(_CDC_CUTOFF).cast("timestamp_ntz"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts_us"), F.desc("event_id"))
    base = (
        e.filter(F.col("ts_us") < cutoff)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumn("from_batch", F.lit(False))
    )
    batch = (
        e.filter(F.col("ts_us") >= cutoff)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumn("from_batch", F.lit(True))
    )
    merged = (
        base.unionByName(batch)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return merged.select(
        "user_id", "event_type", "value", "ts_us", "from_batch"
    ).orderBy("user_id")


CDC_LATEST_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, value, epoch_us(ts) AS ts_us, event_id,
    ts >= TIMESTAMP '{_CDC_CUTOFF}' AS from_batch
  FROM events
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id, from_batch ORDER BY ts_us DESC, event_id DESC
    ) AS rn_side
  FROM e
),
sides AS (SELECT * FROM ranked WHERE rn_side = 1),
merged AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC
    ) AS rn
  FROM sides
)
SELECT user_id, event_type, value, ts_us, from_batch
FROM merged WHERE rn = 1 ORDER BY user_id
"""


TEMPORAL_QUERIES: dict[str, QuerySpec] = {
    "asof_purchase_click": QuerySpec(purchase_click_attribution, PURCHASE_CLICK_SQL),
    "asof_cogrouped_pandas": QuerySpec(
        purchase_click_attribution_cogrouped, COGROUP_ASOF_SQL
    ),
    "range_join_ship_window": QuerySpec(lineitem_ship_window, LINEITEM_SHIP_WINDOW_SQL),
    "scd2_user_state": QuerySpec(scd2_user_state, SCD2_SQL),
    "cdc_latest_state": QuerySpec(cdc_latest_state, CDC_LATEST_SQL),
}
