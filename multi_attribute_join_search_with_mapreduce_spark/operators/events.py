"""Event-stream analytics in batch form (SURVEY.md §7 M6 counterpart).

The streaming renditions (watermarks, ``dropDuplicatesWithinWatermark``,
update-mode windows) live in :mod:`..streaming.events`; these batch
versions have exact SQL equivalents, so they carry the differential
oracle while the streaming tests assert stream==batch parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.functions.temporal import epoch_s
from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

SESSION_GAP_MIN = 30
DEC = "decimal(18,2)"


def tumbling_window_counts(spark: SparkSession, sf: str) -> DataFrame:
    """1-hour tumbling windows per event type (epoch-aligned, like
    Structured Streaming's ``window()``)."""
    e = load_table(spark, "events", sf)
    return (
        e.groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )


TUMBLING_SQL = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def sliding_window_counts(spark: SparkSession, sf: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in 2)."""
    e = load_table(spark, "events", sf)
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").getField("start").alias("window_start")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


SLIDING_SQL = """
WITH offsets AS (SELECT UNNEST([0, 30]) AS off_min)
SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL (off_min) MINUTE AS window_start,
  COUNT(*) AS n_events
FROM events, offsets
GROUP BY 1
"""


def sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) per user, via
    lag + cumulative sum — the classic batch sessionization plan."""
    e = load_table(spark, "events", sf)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # Floor-to-second epoch computed once per row (NTZ-safe;
    # cast-to-long is illegal on TIMESTAMP_NTZ) and lagged as a plain
    # long — same boundary-count semantics as the oracle's
    # date_diff('second', ...), half the timestamp arithmetic of
    # flooring both sides of the lag separately.
    with_gap = e.withColumn("_sec", epoch_s("ts")).withColumn(
        "new_session",
        (
            F.lag("_sec").over(w).isNull()
            | (F.col("_sec") - F.lag("_sec").over(w) > SESSION_GAP_MIN * 60)
        ).cast("int"),
    )
    with_id = with_gap.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_id.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


SESSIONIZE_SQL = f"""
WITH with_gap AS (
  SELECT user_id, event_id, ts,
    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                 OR date_diff('second', prev_ts, ts) > {SESSION_GAP_MIN * 60}
            THEN 1 ELSE 0 END AS new_session
  FROM with_gap
),
with_id AS (
  SELECT *, CAST(SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
  MIN(ts) AS session_start, MAX(ts) AS session_end
FROM with_id GROUP BY user_id, session_id
"""


def native_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization via the BUILT-IN ``session_window`` operator —
    the engine-native sibling of the lag/cumsum `sessionize` plan (the
    built-in is also the streaming sessionization operator, so this
    pins batch/streaming semantic parity of the API itself).

    Boundary semantics, pinned empirically in tests: an event exactly
    ``gap`` after the previous one MERGES (the engine extends the
    session when ``diff <= gap``; splits strictly ``> gap``) — same
    split rule as `sessionize`, but session_window evaluates it at
    exact MICROSECOND precision where the lag plan compares
    floor-second epochs (so a 1800.5s gap splits here and merges
    there; both contracts are tested). The oracle therefore rebuilds
    the lag formulation with a strict ``>`` split on ``epoch_us``
    diffs rather than reusing `SESSIONIZE_SQL`'s seconds-granularity
    test. One shuffle on the session key, merge-based
    window assembly inside the aggregate — no per-user ordered window
    pass at all, which at 100 TB removes the full per-key sort the lag
    plan pays.
    """
    e = load_table(spark, "events", sf)
    return (
        e.groupBy(F.session_window("ts", f"{SESSION_GAP_MIN} minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("window_start"),
            F.col("session_window.end").alias("window_end"),
            "n_events",
        )
        .orderBy("user_id", "window_start")
    )


def _native_session_sql(where: str = "") -> str:
    # strict > split at exact microsecond precision (see docstring) —
    # not SESSIONIZE_SQL's floor-second date_diff test. ``where``
    # narrows the source (the streaming variant excludes NULL event
    # times, which never pass a watermark operator).
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    return f"""
WITH with_gap AS (
  SELECT user_id, event_id, ts,
    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
  FROM events {where}
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) > {gap_us}
            THEN 1 ELSE 0 END AS new_session
  FROM with_gap
),
with_id AS (
  SELECT *, CAST(SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
),
sessions AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
    MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM with_id GROUP BY user_id, session_id
)
SELECT user_id, session_start AS window_start,
  session_end + INTERVAL {SESSION_GAP_MIN} MINUTE AS window_end,
  CAST(n_events AS BIGINT) AS n_events
FROM sessions
ORDER BY user_id, window_start
"""


def event_type_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user funnel flags (saw view -> click -> purchase) + conversion
    aggregate — conditional aggregation over event streams."""
    e = load_table(spark, "events", sf)
    per_user = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("saw_view"),
        F.max((F.col("event_type") == "click").cast("int")).alias("saw_click"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("saw_purchase"),
    )
    return (
        per_user.groupBy("saw_view", "saw_click", "saw_purchase")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("saw_view", "saw_click", "saw_purchase")
    )


FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
    CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS INTEGER) AS saw_view,
    CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS INTEGER) AS saw_click,
    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INTEGER) AS saw_purchase
  FROM events GROUP BY user_id
)
SELECT saw_view, saw_click, saw_purchase, COUNT(*) AS n_users
FROM per_user GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def json_props_extract(spark: SparkSession, sf: str) -> DataFrame:
    """JSON extraction from the string ``props`` column."""
    e = load_table(spark, "events", sf)
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


JSON_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, COUNT(*) AS n
FROM events GROUP BY k ORDER BY k
"""


def variant_props_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured props via the VARIANT type: ``parse_json`` once
    into the binary-encoded variant, then ``variant_get`` path
    extraction — the modern engine path for JSON at scale.

    Why it matters at 100 TB: ``get_json_object`` re-parses the JSON
    string on every call, so N extracted paths cost N parses per row;
    a variant column is parsed once and each path is a cheap binary
    probe (and a variant stored to parquet is shredded columnar).
    Same aggregate as the ``get_json_object`` query family so the
    DuckDB oracle stays exact.
    """
    e = load_table(spark, "events", sf)
    v = F.parse_json("props")
    return (
        e.select("event_type", F.variant_get(v, "$.k", "int").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count("k").cast("long").alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
            F.countDistinct("k").cast("long").alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )


VARIANT_PROPS_SQL = """
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(k) AS BIGINT) AS n_with_k,
  CAST(SUM(k) AS BIGINT) AS sum_k,
  CAST(MIN(k) AS INTEGER) AS min_k,
  CAST(MAX(k) AS INTEGER) AS max_k,
  CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


def cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort-retention matrix: users grouped by the ISO week of
    their first event; for each (cohort_week, weeks_since_first) the
    count of distinct active users — the standard product/training-data
    activity analysis.

    Scale shape: the first-event aggregate and the events⨝cohorts join
    share one (user_id) hash partitioning (AQE reuses the exchange; the
    cohort side is fact-cardinality — one row per user — so broadcast is
    wrong at 100 TB and a co-located shuffle join is the plan you want).
    The final count-distinct is a two-phase partial aggregate on the
    tiny (cohort_week, week_offset) key space.
    """
    e = load_table(spark, "events", sf).select("user_id", "ts")
    cohorts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        e.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            # ts >= first_ts >= its Monday, so the day diff is >= 0 and
            # integer `div` is a true floor
            F.expr(
                "datediff(cast(ts as date), cast(cohort_week as date)) div 7"
            ).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_SQL = """
WITH cohorts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT c.cohort_week,
  date_diff('day', CAST(c.cohort_week AS DATE), CAST(e.ts AS DATE)) // 7 AS week_offset,
  COUNT(DISTINCT e.user_id) AS n_active
FROM events e JOIN cohorts c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def gap_fill_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-filled hourly rollup per event type with forward-filled
    totals — the hypertable ``time_bucket_gapfill + locf`` operator:
    every (type, hour) slot exists even when no event landed in it,
    counts fill with 0, running totals carry the last observed value.

    Plan: the fact table is touched by ONE hourly aggregate (map-side
    combinable); the hour spine is *generated* — ``sequence`` over the
    1-row global min/max bounds, broadcast-crossed with the distinct
    key list — |keys|x|buckets| narrow rows that never shuffle the
    facts. The left join keys on (hour, type); locf is a per-key
    ordered window whose partitions are bounded by the bucket count,
    not the event count.
    """
    e = load_table(spark, "events", sf)
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("value").cast(DEC)).alias("_v"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    keys = e.select("event_type").distinct()
    spine = hours.crossJoin(F.broadcast(keys))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["h", "event_type"], "left")
        .select(
            F.col("h").alias("hour_start"),
            "event_type",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
            F.coalesce(
                F.last("_v", ignorenulls=True).over(w).cast("double"), F.lit(0.0)
            ).alias("filled_total"),
        )
        .orderBy("hour_start", "event_type")
    )


GAP_FILL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds),
spine AS (
  SELECT h, event_type FROM hours
  CROSS JOIN (SELECT DISTINCT event_type FROM events)
)
SELECT s.h AS hour_start, s.event_type AS event_type,
  CAST(COALESCE(hr.n, 0) AS BIGINT) AS n_events,
  COALESCE(CAST(last_value(hr.v IGNORE NULLS) OVER (
      PARTITION BY s.event_type ORDER BY s.h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 0.0)
    AS filled_total
FROM spine s
LEFT JOIN hourly hr ON s.h = hr.h AND s.event_type = hr.event_type
ORDER BY hour_start, s.event_type
"""


def gap_fill_linear(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-filled hourly series with LINEAR interpolation — the
    hypertable ``time_bucket_gapfill + interpolate`` twin of
    `gap_fill_hourly`'s locf: a missing hour gets the straight-line
    value between its nearest observed neighbours; hours before the
    first / after the last observation stay NULL.

    Same scale shape as the locf variant (one fact aggregate, generated
    spine, per-key windows bounded by bucket count). The neighbour
    lookups are two ignore-nulls window passes (last-preceding and
    first-following) over the spine — no self-join. Hour indices come
    from ``timestampdiff`` against a fixed NTZ epoch, so the arithmetic
    is timezone-independent in any session; the interpolation is one
    multiply-add on doubles, bit-identical in Spark and DuckDB.
    """
    e = load_table(spark, "events", sf)
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        (F.sum(F.col("value").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("_avg"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    keys = e.select("event_type").distinct()
    spine = hours.crossJoin(F.broadcast(keys))

    hour_idx = F.expr("timestampdiff(HOUR, TIMESTAMP_NTZ'1970-01-01 00:00:00', h)")
    obs_idx = F.when(F.col("_avg").isNotNull(), hour_idx)
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last("_avg", ignorenulls=True).over(w_prev)
    prev_i = F.last(obs_idx.alias("_pi"), ignorenulls=True).over(w_prev)
    next_v = F.first("_avg", ignorenulls=True).over(w_next)
    next_i = F.first(obs_idx.alias("_ni"), ignorenulls=True).over(w_next)
    frac = (hour_idx - prev_i).cast("double") / (next_i - prev_i).cast("double")
    interp = F.when(F.col("_avg").isNotNull(), F.col("_avg")).otherwise(
        prev_v + (next_v - prev_v) * frac
    )
    return (
        spine.join(hourly, ["h", "event_type"], "left")
        .select(
            F.col("h").alias("hour_start"),
            "event_type",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
            F.round(interp, 6).alias("avg_value"),
            F.col("_avg").isNull().alias("is_interpolated"),
        )
        .orderBy("hour_start", "event_type")
    )


GAP_FILL_LINEAR_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avgv
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds),
spine AS (
  SELECT h, event_type FROM hours
  CROSS JOIN (SELECT DISTINCT event_type FROM events)
),
joined AS (
  SELECT s.h, s.event_type, hr.n, hr.avgv,
    date_diff('hour', TIMESTAMP '1970-01-01', s.h) AS hi_idx
  FROM spine s
  LEFT JOIN hourly hr ON s.h = hr.h AND s.event_type = hr.event_type
),
nb AS (
  SELECT *,
    last_value(avgv IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    last_value(CASE WHEN avgv IS NOT NULL THEN hi_idx END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_i,
    first_value(avgv IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY h
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    first_value(CASE WHEN avgv IS NOT NULL THEN hi_idx END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY h
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_i
  FROM joined
)
SELECT h AS hour_start, event_type,
  CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
  ROUND(CASE WHEN avgv IS NOT NULL THEN avgv
    ELSE prev_v + (next_v - prev_v) *
         (CAST(hi_idx - prev_i AS DOUBLE) / CAST(next_i - prev_i AS DOUBLE))
  END, 6) AS avg_value,
  avgv IS NULL AS is_interpolated
FROM nb
ORDER BY hour_start, event_type
"""


def rolling_active_users(spark: SparkSession, sf: str) -> DataFrame:
    """7-day rolling distinct active users per day (the WAU curve) —
    exact rolling COUNT(DISTINCT), which Spark's window frames cannot
    express natively.

    Plan: dedupe to (user, active-day) once, then *scatter* each active
    day into the ≤7 report days it contributes to (``explode(sequence)``
    — constant 7× fan-out of the already-deduped pairs, not of the raw
    facts), and count distinct users per report day. At 100 TB the raw
    fact scan reduces to |users|×|days| pairs before any fan-out, and
    the final distinct-count shuffles on report day with partial
    aggregation — no day ever re-scans its trailing week. Report days
    past the observed maximum are clipped via a broadcast 1-row bound.
    """
    e = load_table(spark, "events", sf)
    ud = e.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    hi = ud.agg(F.max("day").alias("hi"))
    contrib = ud.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
        "user_id",
    )
    return (
        contrib.crossJoin(F.broadcast(hi))
        .where(F.col("day") <= F.col("hi"))
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("active_7d"))
        .orderBy("day")
    )


ROLLING_ACTIVE_SQL = """
WITH ud AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
)
SELECT s.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_7d
FROM spine s
JOIN ud u ON u.day BETWEEN s.day - INTERVAL 6 DAY AND s.day
GROUP BY s.day
ORDER BY s.day
"""


def hierarchical_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-granularity rollup with partial reuse: daily partials are
    computed from the facts ONCE, then the weekly grain aggregates the
    daily partials — never the facts. The standard OLAP rollup-pyramid
    maintenance pattern: at 100 TB the fact scan happens exactly once
    and every coarser grain costs |finer-grain buckets| rows, so adding
    month/quarter/year grains is nearly free.

    Mergeability is the same contract as ``incremental_rollup``:
    COUNT sums exactly and SUM stays decimal across levels, so each
    derived grain is bit-identical to aggregating the raw facts at that
    grain directly — which is what the UNION-of-direct-GROUP-BYs oracle
    proves.
    """
    e = load_table(spark, "events", sf)
    daily = (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).alias("_sum_dec"),
        )
        .persist()
    )
    weekly = (
        daily.groupBy(
            F.date_trunc("week", F.col("bucket")).alias("bucket"), "event_type"
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("_sum_dec").alias("_sum_dec"),
        )
    )
    out = daily.select(F.lit("day").alias("grain"), "*").unionByName(
        weekly.select(F.lit("week").alias("grain"), "*")
    )
    return out.select(
        "grain",
        "bucket",
        "event_type",
        "n_events",
        F.col("_sum_dec").cast("double").alias("total_value"),
    ).orderBy("grain", "bucket", "event_type")


HIERARCHICAL_ROLLUP_SQL = """
SELECT 'day' AS grain, date_trunc('day', ts) AS bucket, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'week', date_trunc('week', ts), event_type,
  CAST(COUNT(*) AS BIGINT),
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
FROM events GROUP BY 2, 3
ORDER BY grain, bucket, event_type
"""


def event_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: for every (previous type → next type) pair, the transition
    count and conditional probability — the behavioral-model input for
    funnel/path analysis.

    One (user)-partitioned sort powers the lag; the pair count and the
    per-previous-type total ride the same aggregate output (window sum
    over the S²-row matrix, not the facts). The probability is a single
    exactly-rounded division of two BIGINTs — bit-stable on both
    engines, no rounding needed.
    """
    e = load_table(spark, "events", sf)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    pairs = (
        e.select(
            F.lag("event_type", 1).over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    wt = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wt)
        ).alias("p"),
    ).orderBy("prev_type", "next_type")


TRANSITION_SQL = """
WITH pairs AS (
  SELECT LAG(event_type, 1) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ) AS prev_type,
         event_type AS next_type
  FROM events
),
counts AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_transitions,
  CAST(n_transitions AS DOUBLE)
    / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type) AS BIGINT) AS p
FROM counts
ORDER BY prev_type, next_type
"""


def conversion_within_window(spark: SparkSession, sf: str) -> DataFrame:
    """Windowed funnel conversion: of each user's signup events, how
    many were followed by a purchase by the SAME user within 24 hours —
    plus the conversion rate. The sequence-pattern primitive behind
    funnel/attribution metrics.

    Plan: both sides reduce before joining — signups and purchases are
    filtered scans, the EXISTS is a left-semi join keyed on ``user_id``
    with the interval as a residual condition, so the shuffle carries
    only the two filtered event subsets. A per-user sort-merge handles
    arbitrary fan-out without duplicating signups (semi-join, not
    inner). Counting is exact-integer; the rate is one exactly-rounded
    BIGINT division.
    """
    e = load_table(spark, "events", sf)
    signups = e.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts"), F.col("event_id").alias("s_id")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = signups.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 24 HOURS")),
        "left_semi",
    )
    return (
        signups.agg(F.count(F.lit(1)).cast("long").alias("n_signups"))
        .crossJoin(
            F.broadcast(
                converted.agg(F.count(F.lit(1)).cast("long").alias("n_converted"))
            )
        )
        .select(
            "n_signups",
            "n_converted",
            (F.col("n_converted").cast("double") / F.col("n_signups")).alias(
                "conversion_rate"
            ),
        )
    )


CONVERSION_SQL = """
WITH s AS (
  SELECT user_id, ts AS s_ts FROM events WHERE event_type = 'signup'
),
conv AS (
  SELECT COUNT(*) AS n_converted
  FROM s
  WHERE EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase' AND p.user_id = s.user_id
      AND p.ts > s.s_ts AND p.ts <= s.s_ts + INTERVAL 24 HOUR
  )
)
SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signups,
  CAST(n_converted AS BIGINT) AS n_converted,
  CAST(n_converted AS DOUBLE) / (SELECT COUNT(*) FROM s) AS conversion_rate
FROM conv
"""


EWMA_ALPHA = 0.25  # exact binary fraction: 0.25*x + 0.75*acc rounds identically everywhere


def user_value_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values in
    time order — a genuinely RECURSIVE per-group computation
    (``y_t = α·x_t + (1-α)·y_{t-1}``) that no native window frame can
    express. It IS expressible as a native array fold, though:
    ``collect_list → array_sort → aggregate`` runs the identical
    sequential recurrence entirely in the JVM, so the grouped-map
    ``applyInPandas`` this used through r10 (an Arrow transpose plus a
    per-group pandas DataFrame both ways) is gone — the plan is one
    hash aggregate with no Python node (guide §4.1: built-ins and
    higher-order functions before any UDF).

    Bit-exact differential: the oracle folds DuckDB's ``list_reduce``
    over the identically-ordered value list with the identical
    ``0.25·x + 0.75·acc`` expression — the same IEEE double sequence on
    both sides (α an exact binary fraction, so ``α·x`` is exact
    scaling), no rounding tolerance needed. Seed = first value via the
    NULL-seeded CASE, matching ``list_reduce``'s no-initializer
    semantics (and the r10 pandas kernel's ``acc is None`` seed, so the
    rewrite is bit-identical to what it replaced). ``(ts, event_id)``
    is unique in the fixture, so the struct sort's trailing ``value``
    field never decides an ordering.

    Scale: the only shuffle is the groupBy(user_id) that any per-user
    op pays; per-group state is O(events-of-user) either way (the
    pandas form held the same group in memory), folded with O(1) state.
    """
    e = load_table(spark, "events", sf).select("user_id", "ts", "event_id", "value")
    vals = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    fold = F.aggregate(
        F.col("_vals"),
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            F.lit(EWMA_ALPHA) * x + F.lit(1 - EWMA_ALPHA) * acc
        ),
    )
    return (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), vals.alias("_vals"))
        .select("user_id", "n_events", fold.alias("ewma"))
        .orderBy("user_id")
    )


EWMA_SQL = f"""
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  list_reduce(
    list(value ORDER BY ts ASC, event_id ASC),
    (acc, x) -> {EWMA_ALPHA}*x + {1 - EWMA_ALPHA}*acc
  ) AS ewma
FROM events
GROUP BY user_id
ORDER BY user_id
"""


_INGEST_MOD = 7  # event_id % 7 == 0 -> the "newly arrived" batch


def incremental_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental materialized-rollup maintenance: merge a pre-computed
    per-(event_type, day) aggregate STATE with a newly ingested DELTA
    batch, without rescanning history — the continuous-aggregate /
    materialized-view-refresh operator class.

    The fixture has no real ingest feed, so the split is simulated
    deterministically: rows with ``event_id % 7 == 0`` are the delta,
    the rest are the already-rolled-up state. Both sides reduce to
    mergeable partials ``(cnt, sum, min, max)``; the merge is one
    groupBy over ``state ∪ delta`` partials — at 100 TB the state side
    is |keys| rows (days × types), so refresh cost is O(delta) + one
    tiny shuffle, never a rescan of the fact table. COUNT/MIN/MAX merge
    exactly; SUM uses the module's decimal-cast trick so the two-level
    sum is bit-identical to the oracle's single full recompute, which
    is exactly what the differential gate proves: merged state == full
    rebuild.
    """
    e = load_table(spark, "events", sf).select(
        "event_id",
        # date_trunc (not a DATE cast): both engines hand pandas a
        # datetime64 column, where DATE comes back object vs datetime64
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
        "value",
    )

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast(DEC)).alias("sum_dec"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    state = partials(e.filter(F.col("event_id") % _INGEST_MOD != 0))
    delta = partials(e.filter(F.col("event_id") % _INGEST_MOD == 0))
    return (
        state.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("cnt").cast("long").alias("n_events"),
            F.sum("sum_dec").cast("double").alias("total_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .orderBy("day", "event_type")
    )


# Oracle: the FULL recompute — proving merge(state, delta) == rebuild.
INCREMENTAL_ROLLUP_SQL = """
SELECT date_trunc('day', ts) AS day, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
  MIN(value) AS min_value,
  MAX(value) AS max_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


def rolling_zscore_anomalies(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-window anomaly detection: each hourly per-type total is
    z-scored against the previous 24 observed hours; |z| > 3 flags the
    hour. The monitoring primitive over any metric stream.

    Determinism contract: the window accumulations (sum, sum-of-squares,
    count) run in DECIMAL, so they are exact and independent of frame
    evaluation strategy — a sliding-frame sum computed by
    subtract-on-slide in one engine and full recompute in the other
    diverges in floating point but not in decimal. Mean/variance/z are
    then ONE double expression over those exact inputs, bit-identical
    in Spark and DuckDB.

    Scale: one map-side-combinable hourly aggregate over the facts;
    the window runs over hourly rows (|types| x |hours|), thousands of
    rows per year-key — never over raw events.
    """
    e = load_table(spark, "events", sf)
    vdec = F.col("value").cast(DEC)
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(
        F.sum(vdec).alias("_v"),
        F.sum((vdec * vdec).cast("decimal(38,4)")).alias("_vv"),
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    n = F.count(F.lit(1)).over(w)
    s = F.sum("_v").over(w).cast("double")
    q = F.sum("_vv").over(w).cast("double")
    x = F.col("_v").cast("double")
    mean = s / n
    var = (q - s * s / n) / (n - 1)
    z = F.when(
        (n >= 12) & (var > 0), (x - mean) / F.sqrt(var)
    )
    return hourly.select(
        F.col("h").alias("hour_start"),
        "event_type",
        x.alias("hour_value"),
        n.cast("long").alias("n_trailing"),
        F.round(z, 4).alias("zscore"),
        F.coalesce(F.abs(z) > 3, F.lit(False)).alias("is_anomaly"),
    ).orderBy("hour_start", "event_type")


ROLLING_ZSCORE_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         SUM(CAST(value AS DECIMAL(18,2))) AS v,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
             AS DECIMAL(38,4))) AS vv
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT h, event_type, CAST(v AS DOUBLE) AS x,
    COUNT(*) OVER w AS n,
    CAST(SUM(v) OVER w AS DOUBLE) AS s,
    CAST(SUM(vv) OVER w AS DOUBLE) AS q
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT h AS hour_start, event_type, x AS hour_value,
  CAST(n AS BIGINT) AS n_trailing,
  ROUND(CASE WHEN n >= 12 AND (q - s * s / n) / (n - 1) > 0
        THEN (x - s / n) / sqrt((q - s * s / n) / (n - 1)) END, 4) AS zscore,
  COALESCE(abs(CASE WHEN n >= 12 AND (q - s * s / n) / (n - 1) > 0
        THEN (x - s / n) / sqrt((q - s * s / n) / (n - 1)) END) > 3, FALSE) AS is_anomaly
FROM win
ORDER BY hour_start, event_type
"""


def top_event_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Clickstream path mining: the most common 3-step event-type
    sequences across user timelines (two ``lag``s over one per-user
    ordered window + a count) — the navigation-pattern query behind
    funnel discovery.

    The window partitions by user and sorts by (ts, event_id) — the id
    tie-break makes same-timestamp orderings deterministic, the module
    convention (`sessionize`). One shuffle on user_id, one map-side-
    combinable count; top-k is count desc then path.
    """
    e = load_table(spark, "events", sf)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    paths = (
        e.withColumn("_p1", F.lag("event_type", 1).over(w))
        .withColumn("_p2", F.lag("event_type", 2).over(w))
        .filter(F.col("_p2").isNotNull())
        .select(
            F.concat_ws(
                " > ", F.col("_p2"), F.col("_p1"), F.col("event_type")
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(15)
    )


TOP_PATHS_SQL = """
WITH seq AS (
  SELECT event_type,
    lag(event_type, 1) OVER w AS p1,
    lag(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT concat_ws(' > ', p2, p1, event_type) AS path,
  CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE p2 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT 15
"""


def value_trend_ols(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type linear trend of value over time: closed-form OLS
    slope/intercept from the four moment sums (Σx, Σy, Σxy, Σx²) —
    grouped regression as ONE map-side-combinable aggregate, the way
    distributed regression actually runs (n independent of group
    sizes; no per-group iteration).

    Exactness: x is integer hours since the corpus start, y re-enters
    DECIMAL, so all four moments are exact and order-independent; the
    slope/intercept formulas are then one double expression over exact
    inputs — the cross-engine determinism pattern of
    `rolling_zscore_anomalies`. Slope is value-units per hour.
    """
    e = load_table(spark, "events", sf)
    x0 = e.agg(F.min(F.date_trunc("hour", F.col("ts"))).alias("t0"))
    j = e.crossJoin(F.broadcast(x0))
    x = F.expr("timestampdiff(HOUR, t0, ts)").cast("long")
    y = F.col("value").cast(DEC)
    moments = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum((x.cast("decimal(18,2)") * y).cast("decimal(38,4)")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return moments.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round(slope, 6).alias("slope_per_hour"),
        F.round(intercept, 6).alias("intercept"),
    ).orderBy("event_type")


OLS_TREND_SQL = """
WITH t0 AS (SELECT date_trunc('hour', MIN(ts)) AS t0 FROM events),
m AS (
  SELECT event_type,
    COUNT(*) AS n,
    SUM(date_diff('hour', t0, ts)) AS sx,
    SUM(date_diff('hour', t0, ts) * date_diff('hour', t0, ts)) AS sxx,
    SUM(CAST(value AS DECIMAL(18,2))) AS sy,
    SUM(CAST(CAST(date_diff('hour', t0, ts) AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxy
  FROM events CROSS JOIN t0
  GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope_per_hour,
  ROUND((CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE))
        / CAST(n AS DOUBLE), 6) AS intercept
FROM m ORDER BY event_type
"""


def markov_backtest(spark: SparkSession, sf: str) -> DataFrame:
    """Backtest of the first-order Markov next-event predictor with an
    ENTITY-level holdout: the transition model trains on hash-split
    train users (md5 digit ≤ '7'), predicts ``argmax P(next | prev)``,
    and scores accuracy on held-out users' transitions — the
    leakage-free evaluation loop (`group_kfold_split`'s rationale
    applied to a sequence model; a per-row split would leak a user's
    own behavior into their eval).

    Exactness: accuracy is one division of two BIGINTs per prev_type.
    Unseen prev_types on the test side score as incorrect (pred NULL).

    100 TB shape: one user-partitioned sort per half feeds the lag
    (same shuffle the transition matrix pays); the model collapses to
    the S²-row matrix, so the argmax window and the broadcast model
    join are domain-sized, never fact-sized.
    """
    e = load_table(spark, "events", sf)
    is_train = (
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) <= "7"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    trans = (
        e.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            is_train.alias("train"),
            F.lag("event_type", 1).over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
    )
    counts = (
        trans.filter("train")
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.partitionBy("prev_type").orderBy(F.desc("n"), F.asc("next_type"))
    model = (
        counts.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("prev_type", F.col("next_type").alias("pred"))
    )
    test = trans.filter(~F.col("train"))
    return (
        test.join(F.broadcast(model), "prev_type", "left")
        .groupBy("prev_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("next_type") == F.col("pred"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
            F.min("pred").alias("pred"),
        )
        .select(
            "prev_type",
            "pred",
            "n_test",
            "n_correct",
            (F.col("n_correct").cast("double") / F.col("n_test")).alias("accuracy"),
        )
        .orderBy("prev_type")
    )


MARKOV_BACKTEST_SQL = """
WITH trans AS (
  SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7' AS train,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type,
    event_type AS next_type
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM trans WHERE train AND prev_type IS NOT NULL
  GROUP BY prev_type, next_type
),
model AS (
  SELECT prev_type, next_type AS pred
  FROM (SELECT prev_type, next_type,
          ROW_NUMBER() OVER (PARTITION BY prev_type
                             ORDER BY n DESC, next_type) AS rn
        FROM counts)
  WHERE rn = 1
)
SELECT t.prev_type, MIN(m.pred) AS pred,
  CAST(COUNT(*) AS BIGINT) AS n_test,
  CAST(SUM(CASE WHEN t.next_type = m.pred THEN 1 ELSE 0 END) AS BIGINT)
    AS n_correct,
  CAST(SUM(CASE WHEN t.next_type = m.pred THEN 1 ELSE 0 END) AS DOUBLE)
    / COUNT(*) AS accuracy
FROM trans t LEFT JOIN model m ON m.prev_type = t.prev_type
WHERE NOT t.train AND t.prev_type IS NOT NULL
GROUP BY t.prev_type ORDER BY t.prev_type
"""


EVENT_QUERIES: dict[str, QuerySpec] = {
    "markov_backtest": QuerySpec(markov_backtest, MARKOV_BACKTEST_SQL),
    "value_trend_ols": QuerySpec(value_trend_ols, OLS_TREND_SQL),
    "top_event_paths": QuerySpec(top_event_paths, TOP_PATHS_SQL),
    "native_session_window": QuerySpec(native_session_window, _native_session_sql()),
    "gap_fill_linear": QuerySpec(gap_fill_linear, GAP_FILL_LINEAR_SQL),
    "rolling_zscore_anomalies": QuerySpec(rolling_zscore_anomalies, ROLLING_ZSCORE_SQL),
    "incremental_rollup": QuerySpec(incremental_rollup, INCREMENTAL_ROLLUP_SQL),
    "rolling_active_users": QuerySpec(rolling_active_users, ROLLING_ACTIVE_SQL),
    "hierarchical_rollup": QuerySpec(hierarchical_rollup, HIERARCHICAL_ROLLUP_SQL),
    "event_transition_matrix": QuerySpec(event_transition_matrix, TRANSITION_SQL),
    "user_value_ewma": QuerySpec(user_value_ewma, EWMA_SQL),
    "conversion_within_window": QuerySpec(conversion_within_window, CONVERSION_SQL),
    "gap_fill_hourly": QuerySpec(gap_fill_hourly, GAP_FILL_SQL),
    "tumbling_window_counts": QuerySpec(tumbling_window_counts, TUMBLING_SQL),
    "sliding_window_counts": QuerySpec(sliding_window_counts, SLIDING_SQL),
    "sessionize": QuerySpec(sessionize, SESSIONIZE_SQL),
    "event_type_funnel": QuerySpec(event_type_funnel, FUNNEL_SQL),
    "json_props_extract": QuerySpec(json_props_extract, JSON_SQL),
    "variant_props_stats": QuerySpec(variant_props_stats, VARIANT_PROPS_SQL),
    "cohort_retention": QuerySpec(cohort_retention, COHORT_SQL),
}
