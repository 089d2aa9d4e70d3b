"""Data-quality audit over the lake — the constraint-check surface a
production lakehouse runs before trusting an ingest (uniqueness,
referential integrity, range, null-rate; the Deequ/Delta-constraints
capability class, expressed as plain DataFrame plans).

One row per check: ``(check_name, n_rows, violations)``. Every check is a
single aggregate or anti-join — no driver-side looping over rules; at
100 TB each check is one scan (Catalyst prunes to the checked columns)
and the referential check is a broadcast/shuffle anti-join on the key.
A real deployment unions more rules into the same shape; the driver
gate proves the plumbing and the semantics of each check class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table


def _check(name: str, total: F.Column, violations: F.Column, df: DataFrame) -> DataFrame:
    return df.agg(
        F.lit(name).alias("check_name"),
        total.cast("long").alias("n_rows"),
        violations.cast("long").alias("violations"),
    )


def dq_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Constraint audit across four check classes, one result row each:

    - ``customer_custkey_unique`` — key uniqueness (duplicate count);
    - ``orders_custkey_references_customer`` — referential integrity
      (orders whose o_custkey has no customer row; anti-join);
    - ``lineitem_quantity_in_range`` — domain/range constraint
      (l_quantity outside [1, 50]);
    - ``events_userid_not_null`` — completeness (NULL user_id rows).
    """
    c = load_table(spark, "customer", sf)
    o = load_table(spark, "orders", sf)
    li = load_table(spark, "lineitem", sf)
    e = load_table(spark, "events", sf)

    uniq = _check(
        "customer_custkey_unique",
        F.count(F.lit(1)),
        F.count(F.lit(1)) - F.countDistinct("c_custkey"),
        c.select("c_custkey"),
    )

    orphans = (
        o.select("o_custkey")
        .join(c.select("c_custkey"), o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("_v"))
    )
    ref = o.agg(F.count(F.lit(1)).cast("long").alias("n_rows")).crossJoin(
        orphans
    ).select(
        F.lit("orders_custkey_references_customer").alias("check_name"),
        "n_rows",
        F.col("_v").cast("long").alias("violations"),
    )

    rng = _check(
        "lineitem_quantity_in_range",
        F.count(F.lit(1)),
        F.sum(
            (~F.col("l_quantity").between(1, 50)).cast("long")
        ),
        li.select("l_quantity"),
    )

    nn = _check(
        "events_userid_not_null",
        F.count(F.lit(1)),
        F.sum(F.col("user_id").isNull().cast("long")),
        e.select("user_id"),
    )

    return uniq.unionByName(ref).unionByName(rng).unionByName(nn).orderBy("check_name")


DQ_AUDIT_SQL = """
SELECT * FROM (
  SELECT 'customer_custkey_unique' AS check_name,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS violations
  FROM customer
  UNION ALL
  SELECT 'orders_custkey_references_customer',
         CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
         CAST((SELECT COUNT(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
  UNION ALL
  SELECT 'lineitem_quantity_in_range',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'events_userid_not_null',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
) ORDER BY check_name
"""


def profile_columns(spark: SparkSession, sf: str) -> DataFrame:
    """Column profiler over ``documents`` — one row per column with
    null count, exact distinct count, and min/max rendered as strings
    (one schema fits every column type). The ingest-inspection /
    catalog-statistics surface.

    One scan computes every per-column aggregate in a single
    ``agg(...)`` (no per-column scan loop); the profile is then
    unpivoted driver-side from the 1-row result — O(columns) literals,
    no data movement.
    """
    d = load_table(spark, "documents", sf)
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = d.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    pairs = ", ".join(
        f"'{c}', struct({c}__nulls AS nulls, {c}__distinct AS n_distinct, "
        f"{c}__min AS min_value, {c}__max AS max_value)"
        for c in cols
    )
    return (
        one.select(
            F.col("__n").alias("n_rows"),
            F.explode(F.expr(f"map({pairs})")).alias("column_name", "s"),
        )
        .select(
            "column_name",
            F.col("n_rows").cast("long"),
            F.col("s.nulls").cast("long").alias("n_nulls"),
            F.col("s.n_distinct").cast("long").alias("n_distinct"),
            "s.min_value",
            "s.max_value",
        )
        .orderBy("column_name")
    )


PROFILE_SQL = """
WITH base AS (SELECT COUNT(*) AS n_rows FROM documents)
SELECT column_name, CAST(n_rows AS BIGINT) AS n_rows,
  CAST(n_nulls AS BIGINT) AS n_nulls,
  CAST(n_distinct AS BIGINT) AS n_distinct, min_value, max_value
FROM (
  SELECT 'doc_id' AS column_name, (SELECT n_rows FROM base) AS n_rows,
    SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS n_nulls,
    COUNT(DISTINCT doc_id) AS n_distinct,
    CAST(MIN(doc_id) AS VARCHAR) AS min_value, CAST(MAX(doc_id) AS VARCHAR) AS max_value
  FROM documents
  UNION ALL
  SELECT 'text', (SELECT n_rows FROM base),
    SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END), COUNT(DISTINCT text),
    MIN(text), MAX(text) FROM documents
  UNION ALL
  SELECT 'lang', (SELECT n_rows FROM base),
    SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END), COUNT(DISTINCT lang),
    MIN(lang), MAX(lang) FROM documents
  UNION ALL
  SELECT 'source', (SELECT n_rows FROM base),
    SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END), COUNT(DISTINCT source),
    MIN(source), MAX(source) FROM documents
  UNION ALL
  SELECT 'n_chars', (SELECT n_rows FROM base),
    SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END), COUNT(DISTINCT n_chars),
    CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
)
ORDER BY column_name
"""


# PSI buckets: fixed doc-length edges (chars). Fixed edges — not
# corpus-derived quantiles — so the drift metric is stable release to
# release, the monitoring convention.
_PSI_EDGES = (0, 100, 200, 300, 400, 600, 1 << 62)


def length_psi_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index of the document-length distribution
    between the corpus's two content-keyed halves — the data-drift
    monitor a production pipeline runs between ingest batches
    (PSI < 0.1 stable, > 0.25 action).

    Per fixed bucket: expected/actual shares and the PSI contribution
    ``(a - e) * ln(a / e)``, with Laplace-style +1 counts so empty
    buckets stay finite. One narrow bucket map + one tiny (bucket,
    half) count — the ln/round-4 tolerance class over single divisions
    of exact integers (`word_entropy`).
    """
    d = load_table(spark, "documents", sf)
    length = F.length("text")
    bucket = None
    for i in range(len(_PSI_EDGES) - 1):
        cond = (length >= _PSI_EDGES[i]) & (length < _PSI_EDGES[i + 1])
        bucket = F.when(cond, i) if bucket is None else bucket.when(cond, i)
    counts = (
        d.select(bucket.alias("bucket"), (F.col("doc_id") % 2 == 0).alias("is_a"))
        .groupBy("bucket")
        .agg(
            F.sum(F.col("is_a").cast("long")).alias("n_a"),
            F.sum((~F.col("is_a")).cast("long")).alias("n_b"),
        )
    )
    # Every FIXED bucket appears in the output, observed or not, and
    # the Laplace divisor k is the constant bucket count — a bucket
    # crossing zero must not shift every other bucket's shares (the
    # stability fixed edges were chosen for).
    n_buckets = len(_PSI_EDGES) - 1
    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    counts = spine.join(counts, "bucket", "left").select(
        "bucket",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    totals = counts.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b"),
        F.lit(n_buckets).alias("k"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    share_a = (F.col("n_a") + 1).cast("double") / (F.col("t_a") + F.col("k"))
    share_b = (F.col("n_b") + 1).cast("double") / (F.col("t_b") + F.col("k"))
    return j.select(
        "bucket",
        F.col("n_a").cast("long").alias("n_even_half"),
        F.col("n_b").cast("long").alias("n_odd_half"),
        F.round((share_a - share_b) * F.log(share_a / share_b), 4).alias("psi_term"),
    ).orderBy("bucket")


def _psi_sql() -> str:
    whens = " ".join(
        f"WHEN length(text) >= {_PSI_EDGES[i]} AND length(text) < {_PSI_EDGES[i + 1]} THEN {i}"
        for i in range(len(_PSI_EDGES) - 1)
    )
    n_buckets = len(_PSI_EDGES) - 1
    return f"""
WITH observed AS (
  SELECT CASE {whens} END AS bucket,
    SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
    SUM(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS n_b
  FROM documents GROUP BY 1
),
counts AS (
  SELECT s.bucket, COALESCE(o.n_a, 0) AS n_a, COALESCE(o.n_b, 0) AS n_b
  FROM (SELECT unnest(generate_series(0, {n_buckets} - 1)) AS bucket) s
  LEFT JOIN observed o ON o.bucket = s.bucket
),
totals AS (SELECT SUM(n_a) AS t_a, SUM(n_b) AS t_b, {n_buckets} AS k FROM counts)
SELECT bucket,
  CAST(n_a AS BIGINT) AS n_even_half,
  CAST(n_b AS BIGINT) AS n_odd_half,
  ROUND((CAST(n_a + 1 AS DOUBLE) / (t_a + k) - CAST(n_b + 1 AS DOUBLE) / (t_b + k))
        * ln((CAST(n_a + 1 AS DOUBLE) / (t_a + k)) / (CAST(n_b + 1 AS DOUBLE) / (t_b + k))), 4) AS psi_term
FROM counts CROSS JOIN totals
ORDER BY bucket
"""


PSI_SQL = _psi_sql()


_K_ANON = 5


def k_anonymity_audit(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit over the event stream: group by the
    quasi-identifier pair (event_type, activity day) and flag every
    group whose DISTINCT-user population is below ``k`` — the groups
    where releasing the "anonymized" aggregate would still let an
    attacker with the quasi-identifiers re-identify users. Complements
    `redact.anonymize_events` (which transforms; this one measures
    residual risk).

    Scale shape: one groupBy on the quasi-identifier with a distinct
    count — at 100 TB this is the standard two-level exact
    count-distinct aggregate (partial per (qid, user), then per qid);
    no joins, no window. Day is emitted as a formatted STRING so both
    engines hash identical values (date objects round-trip differently
    through pandas).

    NULL hygiene (convention, ADVICE r3): NULL event_type / ts rows are
    excluded up front — a NULL quasi-identifier is a data-quality
    finding (`dq_audit`'s job), not an anonymity group.
    """
    e = load_table(spark, "events", sf).filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    return (
        e.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.countDistinct("user_id").alias("user_ct"),
            F.count(F.lit(1)).alias("event_ct"),
        )
        .select(
            "event_type",
            "day",
            F.col("user_ct").cast("long").alias("user_ct"),
            F.col("event_ct").cast("long").alias("event_ct"),
            (F.col("user_ct") < _K_ANON).alias("at_risk"),
        )
        .orderBy("event_type", "day")
    )


K_ANONYMITY_SQL = f"""
SELECT event_type,
  strftime(ts, '%Y-%m-%d') AS day,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS user_ct,
  CAST(COUNT(*) AS BIGINT) AS event_ct,
  COUNT(DISTINCT user_id) < {_K_ANON} AS at_risk
FROM events
WHERE event_type IS NOT NULL AND ts IS NOT NULL
GROUP BY event_type, strftime(ts, '%Y-%m-%d')
ORDER BY event_type, day
"""


QUALITY_QUERIES: dict[str, QuerySpec] = {
    "k_anonymity_audit": QuerySpec(k_anonymity_audit, K_ANONYMITY_SQL),
    "length_psi_drift": QuerySpec(length_psi_drift, PSI_SQL),
    "dq_audit": QuerySpec(dq_audit, DQ_AUDIT_SQL),
    "profile_columns": QuerySpec(profile_columns, PROFILE_SQL),
}
