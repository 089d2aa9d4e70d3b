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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Skew-safe equi-join: fact side salts each row into one of
    ``n_salts`` sub-keys, dim side replicates every row across all
    sub-keys, and the join runs on ``(key, salt)`` — a hot fact key is
    spread over ``n_salts`` reducers instead of melting one.

    This is the manual fallback for engines/paths where AQE skew-join
    cannot help (e.g. the dim side is too large to broadcast but the
    fact side has power-law keys; AQE only splits *shuffle partitions*,
    not a single monster key sharing a partition hash with others).
    Dim replication costs ``n_salts ×`` the dim size — choose
    ``n_salts`` ~ hot-key-partition-size / target-partition-size.
    Result is byte-identical to the plain join (the differential test).
    """
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    f = fact.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    d = dim.withColumn("_salt", F.explode(salts))
    return f.join(d, [key, "_salt"]).drop("_salt")


def salted_user_event_join(spark: SparkSession, sf: str) -> DataFrame:
    """Registry entry: events (fact, skewed user activity) joined to a
    per-user dimension derived from orders customers via the salted
    path; aggregated so the oracle is the plain-join equivalent."""
    e = load_table(spark, "events", sf).select("user_id", "event_type", "value")
    dim = (
        load_table(spark, "events", sf)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_total"))
    )
    joined = salted_join(e, dim, "user_id")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("user_total").alias("sum_user_totals"),
        )
        .orderBy("event_type")
    )


SALTED_USER_EVENT_JOIN_SQL = """
WITH dim AS (
  SELECT user_id, COUNT(*) AS user_total FROM events GROUP BY user_id
)
SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(d.user_total) AS BIGINT) AS sum_user_totals
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY e.event_type ORDER BY e.event_type
"""


_HH_THRESHOLD = 70


def heavy_hitters(spark: SparkSession, sf: str, threshold: int = _HH_THRESHOLD) -> DataFrame:
    """EXACT frequency heavy hitters (NON-NULL keys with count >=
    threshold) without shuffling the long tail — the distributed
    Misra-Gries shape.

    The naive plan (`groupBy(key).count().filter(>=T)`) partial-aggregates
    map-side but still EXCHANGES one row per distinct key — at 100 TB
    that shuffle is vocabulary-sized (billions of tail keys) while the
    answer is a handful of rows. Catalyst cannot push the HAVING below
    the final aggregation, so phase 1 here is an Arrow-batched
    ``mapInPandas`` kernel that counts keys WITHIN each partition and
    emits only locals >= ceil(T/P) — the tail dies before the wire.
    Phase 2 recounts the surviving candidates exactly over a broadcast
    semi-join. Output is exact (the local gate keeps a provable
    superset by pigeonhole — a key with global count >= T has >= T/P in
    some partition; the recount discards false positives), which is why
    the plain HAVING query can be the oracle.

    P is the frame's partition count read from the plan, but the gate's
    soundness is VERIFIED at execution time, not assumed: a SECOND,
    near-free probe pass over the same scan counts the non-empty
    partitions the action actually executes with (its kernel peeks at
    the FIRST Arrow batch and stops — it never counts values, so its
    cost is one batch read per partition, not a corpus scan), and the
    plan carries a ``raise_error`` guard over that count — if the
    action ever executes with more (non-empty) partitions than the
    estimate (e.g. ``maxPartitionBytes`` changed between planning this
    DataFrame and running it), the query FAILS LOUDLY instead of
    silently dropping true heavy hitters. Both passes sit in ONE
    physical plan, so they are planned with the same conf snapshot and
    see the same file splits. Pigeonhole over non-empty partitions: a
    key with global count >= T has a local count >= ceil(T/P_nonempty)
    somewhere, so the gate is exact iff local_min <= ceil(T/P_actual),
    i.e. (local_min-1)·P_actual < T. NULL keys are excluded by
    contract on both sides (a "null heavy hitter" is a data-quality
    signal, `quality.dq_audit`'s job, not a frequency result — and
    semi-join re-counting cannot match NULLs anyway).

    At fixture scale every key clears the local gate (T/P < per-key
    local counts) — the pruning power grows with per-partition volume,
    which is the 100 TB regime this is built for.
    """
    import pandas as pd

    e = load_table(spark, "events", sf).select(F.col("user_id").cast("long")).filter(
        F.col("user_id").isNotNull()
    )
    n_parts = max(e.rdd.getNumPartitions(), 1)
    local_min = -(-threshold // n_parts)  # ceil(T / P), P = actual partitions

    def local_candidates(batches):
        counts: dict[int, int] = {}
        for pdf in batches:
            for k, c in pdf["user_id"].value_counts().items():
                counts[k] = counts.get(k, 0) + int(c)
        keep = [k for k, c in counts.items() if c >= local_min]
        yield pd.DataFrame({"user_id": pd.Series(keep, dtype="int64")})

    def partition_marker(batches):
        # Emit ONE row iff this partition has any input, then stop —
        # the early return leaves the remaining Arrow batches unread
        # (they stream lazily), so this pass costs one batch per
        # partition, not a second corpus scan.
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame({"one": pd.Series([1], dtype="int64")})
                return

    cands = e.mapInPandas(local_candidates, "user_id long").distinct()
    # Guard shape matters: it is UNIONED into the result (contributing
    # zero rows when sound, raising when not), NOT cross-joined — a
    # cross join evaluates per result row, so the exact failure mode it
    # exists to catch (true heavy hitters silently pruned to an EMPTY
    # result) would leave no row to evaluate it on.
    guard_sentinel = (
        e.mapInPandas(partition_marker, "one long")
        .agg(F.coalesce(F.sum("one"), F.lit(0)).alias("p_actual"))
        .select(
            F.when(
                F.lit(local_min - 1) * F.col("p_actual") < F.lit(threshold),
                F.lit(None).cast("long"),
            )
            .otherwise(
                # The cast sits on raise_error's RESULT (NullType), not
                # on the message — casting the message would throw a
                # misleading ANSI CAST_INVALID_INPUT before raise_error
                # ever ran.
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"heavy_hitters: local gate {local_min} unsound for "
                        ),
                        F.col("p_actual").cast("string"),
                        F.lit(f" executed partitions (threshold {threshold}); "
                              "partitioning drifted since planning"),
                    )
                ).cast("long")
            )
            .alias("user_id")
        )
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.lit(0).cast("long").alias("n_events"))
    )
    return (
        e.join(F.broadcast(cands), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") >= threshold)
        .unionByName(guard_sentinel)
        .orderBy("user_id")
    )


HEAVY_HITTERS_SQL = f"""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events WHERE user_id IS NOT NULL
GROUP BY user_id HAVING COUNT(*) >= {_HH_THRESHOLD}
ORDER BY user_id
"""


_CMS_D = 3  # hash rows
_CMS_W = 1024  # counters per row
_CMS_TOP = 10
# Overshoot allowance for the self-check: a CMS estimate exceeds the
# exact count by the collision mass in its least-loaded cell; E[mass] =
# N/w per cell, and min-of-d pushes the tail far below Markov's 1/e per
# row. 8x the expectation is a wide deterministic margin on the
# fixtures (measured overshoot: 0 at sf0.01/sf0.1 — distinct keys <~ w)
# while still tight enough that a broken hash/merge flips the boolean.
_CMS_SLACK = 8


def cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min sketch frequency estimates for the top event producers
    — the MERGEABLE approximate counterpart of :func:`heavy_hitters`
    (Cormode & Muthukrishnan; the sketch family's third member next to
    HLL `mergeable_hll_rollup` and KLL `approx_sketches`).

    Sketch build is ONE map-side-combinable aggregate: each event lands
    in ``d`` (row, col) cells via seeded xxhash64, and the groupBy
    output is MODEL-sized (d*w = 3072 cells), never key-cardinality-
    sized — the 100 TB contrast with exact counting, whose exchange
    carries one row per distinct key. Shard merge = cell-wise SUM
    (counters are linear), so per-day/per-source sketches fold into a
    global one without touching raw data. Estimation joins the
    candidate keys against the BROADCAST cell table (3072 rows) and
    takes min-over-d.

    Self-validation (the sketch-pair recipe, `__spark_entry__` r3/r4
    convention): the SAME job computes exact counts for the top-10
    keys — those exact rows ARE the output (oracle: plain SQL) — plus
    two booleans the driver value-hashes: ``cms_ge_exact`` (CMS never
    undercounts — a structural guarantee; FALSE means the sketch is
    broken) and ``cms_within_bound`` (overshoot <= ceil(8N/w) — FALSE
    means collision behavior drifted). Hashes are Spark-side xxhash64:
    engine-agnosticism is NOT needed because the oracle never
    recomputes the sketch, only the exact side.
    """
    e = load_table(spark, "events", sf).select(
        F.col("user_id").cast("long")
    ).filter(F.col("user_id").isNotNull())

    cell_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                F.pmod(F.xxhash64("user_id", F.lit(j)), F.lit(_CMS_W)).alias("col"),
            )
            for j in range(_CMS_D)
        ]
    )
    cells = (
        e.select(F.explode(cell_structs).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    total = e.agg(F.count(F.lit(1)).alias("n_total"))
    top = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(_CMS_TOP)
    )
    est = (
        top.select("user_id", "n_events", F.explode(cell_structs).alias("c"))
        .select("user_id", "n_events", F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .join(F.broadcast(cells), ["row", "col"])
        .groupBy("user_id", "n_events")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "n_events",
            (F.col("cms_est") >= F.col("n_events")).alias("cms_ge_exact"),
            (
                F.col("cms_est")
                <= F.col("n_events")
                + F.ceil(F.lit(_CMS_SLACK) * F.col("n_total") / F.lit(_CMS_W))
            ).alias("cms_within_bound"),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
    )


CMS_HEAVY_HITTERS_SQL = f"""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       TRUE AS cms_ge_exact, TRUE AS cms_within_bound
FROM events WHERE user_id IS NOT NULL
GROUP BY user_id
ORDER BY n_events DESC, user_id ASC
LIMIT {_CMS_TOP}
"""


SKEW_QUERIES: dict[str, QuerySpec] = {
    "cms_heavy_hitters": QuerySpec(cms_heavy_hitters, CMS_HEAVY_HITTERS_SQL),
    "heavy_hitters": QuerySpec(heavy_hitters, HEAVY_HITTERS_SQL),
    "salted_event_counts": QuerySpec(salted_event_counts, SALTED_EVENT_COUNTS_SQL),
    "salted_user_event_join": QuerySpec(
        salted_user_event_join, SALTED_USER_EVENT_JOIN_SQL
    ),
}
