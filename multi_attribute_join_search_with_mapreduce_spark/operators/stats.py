"""Distributed statistics: exact mergeable distinct counts, A/B test
inference, and moment-based correlation — the aggregate patterns a
100 TB experimentation/metrics stack runs daily.

Common scale shape: every query here is ONE map-side-combinable
aggregation pass over the fact table (no joins, no windows, no Python),
with the statistical formula applied as a scalar expression over the
exact aggregate moments. That keeps the shuffle payload at
O(groups), not O(rows), and keeps results independent of partition
count and row order.

Determinism: sums are accumulated in DECIMAL (exact, associative);
the closing float formula is ONE double expression written with the
same association on the Spark and DuckDB sides, so both engines
perform the identical sequence of correctly-rounded IEEE ops
(pattern: `events.value_trend_ols`, `events.rolling_zscore_anomalies`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

DEC = "decimal(18,2)"
DEC_SQ = "decimal(38,4)"


def bitmap_distinct_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT distinct users per event type AND overall, from mergeable
    bitmap partials in one pass (`bitmap_construct_agg` /
    `bitmap_count`, the RoaringBitmap-style surface Spark 3.5+ ships).

    Why bitmaps and not `countDistinct`: a plain COUNT(DISTINCT) must
    shuffle every distinct (group, user) pair; bitmap partials compress
    each 32k-id bucket to a fixed 4 KB bitmap that merges with OR — the
    partial aggregate is bounded by id-space/32k per group regardless
    of row count, and the SAME partials serve every grain (per-type and
    global here, daily→weekly→all-time in a rollup pyramid) because OR
    is lossless, unlike summing per-group distinct counts.

    One scan feeds both grains via GROUPING SETS ((type, bucket),
    (bucket)): Expand duplicates rows map-side, partial
    bitmap_construct_agg runs before the single shuffle, and the global
    row is built from per-bucket OR-merged bitmaps — never by a second
    scan of the fact table. Contrast `mergeable_hll_rollup`
    (approximate, fixed 1.5 KB regardless of id space); bitmaps are the
    exact variant for bounded integer key spaces.
    """
    # NULL event_type is dropped explicitly: the grouping-sets global
    # row surfaces as NULL→'ALL', so a GENUINE NULL group would silently
    # merge into the global row (and desync the oracle) the day fixtures
    # gain NULLs.
    e = (
        load_table(spark, "events", sf)
        .filter(F.col("event_type").isNotNull())
        .select(
            "event_type",
            F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
            F.bitmap_bit_position(F.col("user_id")).alias("pos"),
        )
    )
    per_bucket = e.groupingSets(
        [["event_type", "bucket"], ["bucket"]], "event_type", "bucket"
    ).agg(F.bitmap_construct_agg(F.col("pos")).alias("bmp"))
    return (
        per_bucket.groupBy(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type")
        )
        .agg(F.sum(F.bitmap_count(F.col("bmp"))).cast("long").alias("distinct_users"))
        .orderBy("event_type")
    )


BITMAP_DISTINCT_SQL = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events
WHERE event_type IS NOT NULL
GROUP BY GROUPING SETS ((event_type), ())
ORDER BY event_type
"""


def welch_ttest_value(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample Welch's t-test of `value` between deterministic A/B
    arms (user_id parity), per event type — the experimentation-stack
    readout (unequal variances, unequal n).

    Distributed shape: six moments per group (n, Σy, Σy² per arm) in
    one map-side-combinable aggregate; mean, unbiased variance, the
    t statistic, and the Welch–Satterthwaite degrees of freedom are
    scalar expressions over those exact moments. No pow(): squares are
    spelled x*x (libm pow differs in the last ulp across engines;
    sqrt/mul/div are IEEE-exact — the hash-gate convention).
    """
    e = load_table(spark, "events", sf)
    y = F.col("value").cast(DEC)
    a = (F.col("user_id") % 2) == 0
    ysq = (y * y).cast(DEC_SQ)
    g = e.groupBy("event_type").agg(
        F.count(F.when(a, 1)).alias("n_a"),
        F.sum(F.when(a, y)).alias("s_a"),
        F.sum(F.when(a, ysq)).alias("ss_a"),
        F.count(F.when(~a, 1)).alias("n_b"),
        F.sum(F.when(~a, y)).alias("s_b"),
        F.sum(F.when(~a, ysq)).alias("ss_b"),
    )
    na, sa, ssa = [F.col(c).cast("double") for c in ("n_a", "s_a", "ss_a")]
    nb, sb, ssb = [F.col(c).cast("double") for c in ("n_b", "s_b", "ss_b")]
    ma, mb = sa / na, sb / nb
    va = (ssa - sa * sa / na) / (na - F.lit(1.0))
    vb = (ssb - sb * sb / nb) / (nb - F.lit(1.0))
    sea, seb = va / na, vb / nb
    t = (ma - mb) / F.sqrt(sea + seb)
    df = ((sea + seb) * (sea + seb)) / (
        sea * sea / (na - F.lit(1.0)) + seb * seb / (nb - F.lit(1.0))
    )
    return g.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(ma, 4).alias("mean_a"),
        F.round(mb, 4).alias("mean_b"),
        F.round(t, 4).alias("t_stat"),
        F.round(df, 2).alias("welch_df"),
    ).orderBy("event_type")


WELCH_TTEST_SQL = """
WITH m AS (
  SELECT event_type,
    COUNT(*) FILTER (user_id % 2 = 0) AS n_a,
    SUM(CAST(value AS DECIMAL(18,2))) FILTER (user_id % 2 = 0) AS s_a,
    SUM(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
        AS DECIMAL(38,4))) FILTER (user_id % 2 = 0) AS ss_a,
    COUNT(*) FILTER (user_id % 2 = 1) AS n_b,
    SUM(CAST(value AS DECIMAL(18,2))) FILTER (user_id % 2 = 1) AS s_b,
    SUM(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
        AS DECIMAL(38,4))) FILTER (user_id % 2 = 1) AS ss_b
  FROM events GROUP BY event_type
),
d AS (
  SELECT event_type, n_a, n_b,
    CAST(n_a AS DOUBLE) AS na, CAST(s_a AS DOUBLE) AS sa, CAST(ss_a AS DOUBLE) AS ssa,
    CAST(n_b AS DOUBLE) AS nb, CAST(s_b AS DOUBLE) AS sb, CAST(ss_b AS DOUBLE) AS ssb
  FROM m
),
v AS (
  SELECT event_type, n_a, n_b, sa / na AS ma, sb / nb AS mb,
    ((ssa - sa * sa / na) / (na - 1.0)) / na AS sea,
    ((ssb - sb * sb / nb) / (nb - 1.0)) / nb AS seb,
    na, nb
  FROM d
)
SELECT event_type,
  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  ROUND(ma, 4) AS mean_a, ROUND(mb, 4) AS mean_b,
  ROUND((ma - mb) / SQRT(sea + seb), 4) AS t_stat,
  ROUND(((sea + seb) * (sea + seb))
        / (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0)), 2) AS welch_df
FROM v ORDER BY event_type
"""


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount")


def corr_matrix_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise Pearson correlation of the lineitem measures in ONE
    aggregation pass: all C(3,2) cross-moments (Σx, Σx², Σxy) are
    columns of a single map-side-combinable aggregate, then each
    correlation is a scalar expression over the exact moments — the
    feature-correlation scan a training pipeline runs before pruning
    redundant features.

    At 100 TB this is the only viable shape: one scan, O(k²) aggregate
    state per partition (k = column count), one 1-row shuffle. Never a
    per-pair pass (k² scans) and never `df.stat.corr` in a loop (same).
    The 1-row moment frame unpivots to (col_x, col_y, corr) rows via
    stack() — driver-hashable long form.
    """
    e = load_table(spark, "lineitem", sf)
    cols = {c: F.col(c).cast(DEC) for c in _CORR_COLS}
    aggs = [F.count(F.lit(1)).alias("n")]
    for c, x in cols.items():
        aggs.append(F.sum(x).alias(f"s_{c}"))
        aggs.append(F.sum((x * x).cast(DEC_SQ)).alias(f"ss_{c}"))
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(F.sum((cols[a] * cols[b]).cast(DEC_SQ)).alias(f"sx_{a}_{b}"))
    m = e.agg(*aggs)

    n = F.col("n").cast("double")

    def corr_expr(a: str, b: str):
        sa = F.col(f"s_{a}").cast("double")
        sb = F.col(f"s_{b}").cast("double")
        ssa = F.col(f"ss_{a}").cast("double")
        ssb = F.col(f"ss_{b}").cast("double")
        sab = F.col(f"sx_{a}_{b}").cast("double")
        return (n * sab - sa * sb) / (
            F.sqrt(n * ssa - sa * sa) * F.sqrt(n * ssb - sb * sb)
        )

    # stack() needs the corr expressions as named columns first; build
    # them, then unpivot the 1-row frame to long form.
    wide = m.select(
        *[F.round(corr_expr(a, b), 6).alias(f"corr_{a}_{b}") for a, b in pairs]
    )
    stack_args = ", ".join(f"'{a}', '{b}', corr_{a}_{b}" for a, b in pairs)
    return wide.select(
        F.expr(f"stack({len(pairs)}, {stack_args})").alias("col_x", "col_y", "corr")
    ).orderBy("col_x", "col_y")


def _corr_sql() -> str:
    moment_cols = ["COUNT(*) AS n"]
    for c in _CORR_COLS:
        moment_cols.append(f"SUM(CAST({c} AS DECIMAL(18,2))) AS s_{c}")
        moment_cols.append(
            f"SUM(CAST(CAST({c} AS DECIMAL(18,2)) * CAST({c} AS DECIMAL(18,2))"
            f" AS DECIMAL(38,4))) AS ss_{c}"
        )
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        moment_cols.append(
            f"SUM(CAST(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2))"
            f" AS DECIMAL(38,4))) AS sx_{a}_{b}"
        )
    selects = []
    for a, b in pairs:
        expr = (
            f"(CAST(n AS DOUBLE) * CAST(sx_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            f" / (SQRT(CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" * SQRT(CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
        )
        selects.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, ROUND({expr}, 6) AS corr FROM m"
        )
    return (
        "WITH m AS (SELECT "
        + ", ".join(moment_cols)
        + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY col_x, col_y"
    )


CORR_MATRIX_SQL = _corr_sql()


def chi_square_arms(spark: SparkSession, sf: str) -> DataFrame:
    """Chi-square test of independence between event type and A/B arm
    (user parity) — "did assignment skew by segment", the guardrail
    check run before trusting any experiment readout.

    The contingency table is one map-side-combinable count pass; grand
    totals ride a broadcast 1-row aggregate. The only float reduction —
    summing the per-type (o-e)²/e contributions — runs as an ORDERED
    cumulative sum over event_type: float addition is not associative,
    so a plain distributed SUM of doubles would depend on partition
    order, while an ordered window accumulates left-to-right
    identically in Spark and DuckDB (the k rows are one tiny sorted
    partition; k = event-type count, scalar at any data scale).
    """
    e = load_table(spark, "events", sf)
    a = (F.col("user_id") % 2) == 0
    g = e.groupBy("event_type").agg(
        F.count(F.when(a, 1)).alias("n_a"),
        F.count(F.when(~a, 1)).alias("n_b"),
    )
    totals = g.agg(
        F.sum("n_a").alias("t_a"),
        F.sum("n_b").alias("t_b"),
        F.count(F.lit(1)).alias("k"),
    )
    j = g.crossJoin(F.broadcast(totals))
    row_t = (F.col("n_a") + F.col("n_b")).cast("double")
    n = (F.col("t_a") + F.col("t_b")).cast("double")
    ea = row_t * F.col("t_a").cast("double") / n
    eb = row_t * F.col("t_b").cast("double") / n
    oa, ob = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    contrib = (oa - ea) * (oa - ea) / ea + (ob - eb) * (ob - eb) / eb
    from pyspark.sql import Window

    w = (
        Window.orderBy("event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = j.select(
        "event_type",
        F.sum(contrib).over(w).alias("chi2_cum"),
        F.col("k").cast("long").alias("k"),
        (F.col("t_a") + F.col("t_b")).cast("long").alias("n_events"),
    )
    return (
        cum.orderBy(F.desc("event_type"))
        .limit(1)
        .select(
            F.round("chi2_cum", 4).alias("chi2"),
            (F.col("k") - 1).alias("dof"),
            "n_events",
        )
    )


CHI_SQUARE_SQL = """
WITH g AS (
  SELECT event_type,
    CAST(COUNT(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
    CAST(COUNT(*) FILTER (user_id % 2 = 1) AS BIGINT) AS n_b
  FROM events GROUP BY event_type
),
t AS (
  SELECT CAST(SUM(n_a) AS BIGINT) AS t_a, CAST(SUM(n_b) AS BIGINT) AS t_b,
    CAST(COUNT(*) AS BIGINT) AS k
  FROM g
),
c AS (
  SELECT g.event_type, t.k, t.t_a + t.t_b AS n_events,
    (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * CAST(t_a AS DOUBLE) / CAST(t_a + t_b AS DOUBLE))
      * (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * CAST(t_a AS DOUBLE) / CAST(t_a + t_b AS DOUBLE))
      / (CAST(n_a + n_b AS DOUBLE) * CAST(t_a AS DOUBLE) / CAST(t_a + t_b AS DOUBLE))
    + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * CAST(t_b AS DOUBLE) / CAST(t_a + t_b AS DOUBLE))
      * (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * CAST(t_b AS DOUBLE) / CAST(t_a + t_b AS DOUBLE))
      / (CAST(n_a + n_b AS DOUBLE) * CAST(t_b AS DOUBLE) / CAST(t_a + t_b AS DOUBLE))
    AS contrib
  FROM g CROSS JOIN t
),
cum AS (
  SELECT event_type,
    SUM(contrib) OVER (ORDER BY event_type ROWS UNBOUNDED PRECEDING) AS chi2_cum,
    k, n_events
  FROM c
)
SELECT ROUND(chi2_cum, 4) AS chi2, k - 1 AS dof, CAST(n_events AS BIGINT) AS n_events
FROM cum ORDER BY event_type DESC LIMIT 1
"""


def mann_whitney_value(spark: SparkSession, sf: str) -> DataFrame:
    """Mann–Whitney U (rank-sum) test of `value` between A/B arms per
    event type — the non-parametric companion to `welch_ttest_value`
    for skewed metrics.

    Scale-first formulation: rank statistics WITHOUT ranking rows.
    Rows reduce to a per-(type, value) histogram (map-side combinable);
    tied-average ranks come from a cumulative count over the DISTINCT
    values of each type (bounded by value cardinality — fixed-precision
    metrics cap it — not by row count); the rank sum is then
    Σ cnt_a(v)·avgrank(v). Everything stays integer until the final
    z expression: avg ranks are half-integers, so the engine carries
    rank×2 in BIGINT and halves at the very end — exact at any scale,
    immune to float summation order. Tie correction included:
    var = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1))).
    """
    # NULL values are dropped explicitly: the rank cumulation orders by
    # `value`, and Spark sorts NULLS FIRST while DuckDB sorts NULLS LAST
    # — a NULL row would silently desync the two rank assignments.
    e = load_table(spark, "events", sf).filter(F.col("value").isNotNull())
    a = (F.col("user_id") % 2) == 0
    h = e.groupBy("event_type", "value").agg(
        F.count(F.when(a, 1)).alias("cnt_a"),
        F.count(F.lit(1)).alias("cnt"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = h.select(
        "event_type",
        "cnt_a",
        "cnt",
        # avg rank of a tie group, doubled to stay integral:
        # 2·cum_before + cnt + 1
        (F.lit(2) * (F.sum("cnt").over(w) - F.col("cnt")) + F.col("cnt") + F.lit(1)).alias(
            "rank_x2"
        ),
    )
    g = ranked.groupBy("event_type").agg(
        F.sum("cnt_a").alias("n_a"),
        (F.sum("cnt") - F.sum("cnt_a")).alias("n_b"),
        F.sum(F.col("cnt_a") * F.col("rank_x2")).alias("r_a_x2"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")).alias("tie_sum"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    u_a_x2 = F.col("r_a_x2") - F.col("n_a") * (F.col("n_a") + 1)  # exact BIGINT
    mu_x2 = (F.col("n_a") * F.col("n_b")).cast("double")
    var = (na * nb / F.lit(12.0)) * (
        (n + F.lit(1.0)) - F.col("tie_sum").cast("double") / (n * (n - F.lit(1.0)))
    )
    z = (u_a_x2.cast("double") - mu_x2) / F.lit(2.0) / F.sqrt(var)
    return g.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        (u_a_x2.cast("double") / F.lit(2.0)).alias("u_a"),
        F.round(z, 4).alias("z_stat"),
    ).orderBy("event_type")


MANN_WHITNEY_SQL = """
WITH h AS (
  SELECT event_type, value,
    CAST(COUNT(*) FILTER (user_id % 2 = 0) AS BIGINT) AS cnt_a,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY event_type, value
),
ranked AS (
  SELECT event_type, cnt_a, cnt,
    2 * (SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
                        ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS rank_x2
  FROM h
),
g AS (
  SELECT event_type,
    CAST(SUM(cnt_a) AS BIGINT) AS n_a,
    CAST(SUM(cnt) - SUM(cnt_a) AS BIGINT) AS n_b,
    CAST(SUM(cnt_a * rank_x2) AS BIGINT) AS r_a_x2,
    CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_sum
  FROM ranked GROUP BY event_type
)
SELECT event_type, n_a, n_b,
  CAST(r_a_x2 - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
  ROUND((CAST(r_a_x2 - n_a * (n_a + 1) AS DOUBLE) - CAST(n_a * n_b AS DOUBLE)) / 2.0
    / SQRT((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
      * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
         - CAST(tie_sum AS DOUBLE)
           / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
              * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)))), 4) AS z_stat
FROM g ORDER BY event_type
"""


def ks_value_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Kolmogorov–Smirnov statistic of `value` between the two
    user-parity halves of the corpus — distribution drift as the max
    ECDF gap, sharper than binned PSI (`length_psi_drift`) because it
    needs no bucket edges.

    Exact ECDFs without sorting rows: reduce to a per-value histogram,
    cumulate counts over distinct values, divide by the (exact) totals.
    The final reduction is MAX over per-value gaps — unlike a float
    SUM, max is order-independent (exact comparisons), so the result
    is deterministic under any partitioning. Distinct-value count
    bounds the window input, row count doesn't.
    """
    # Same NULL-ordering hazard as mann_whitney_value: the ECDF window
    # orders by `value` (Spark NULLS FIRST, DuckDB NULLS LAST), so NULL
    # values are dropped before cumulation.
    e = load_table(spark, "events", sf).filter(F.col("value").isNotNull())
    a = (F.col("user_id") % 2) == 0
    h = e.groupBy("value").agg(
        F.count(F.when(a, 1)).alias("cnt_a"),
        F.count(F.when(~a, 1)).alias("cnt_b"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = h.select(
        F.sum("cnt_a").over(w).alias("c_a"),
        F.sum("cnt_b").over(w).alias("c_b"),
    )
    totals = cum.agg(F.max("c_a").alias("t_a"), F.max("c_b").alias("t_b"))
    j = cum.crossJoin(F.broadcast(totals))
    gap = F.abs(
        F.col("c_a").cast("double") / F.col("t_a").cast("double")
        - F.col("c_b").cast("double") / F.col("t_b").cast("double")
    )
    return j.agg(
        F.round(F.max(gap), 6).alias("ks_stat"),
        F.max("t_a").cast("long").alias("n_a"),
        F.max("t_b").cast("long").alias("n_b"),
    )


KS_DRIFT_SQL = """
WITH h AS (
  SELECT value,
    CAST(COUNT(*) FILTER (user_id % 2 = 0) AS BIGINT) AS cnt_a,
    CAST(COUNT(*) FILTER (user_id % 2 = 1) AS BIGINT) AS cnt_b
  FROM events WHERE value IS NOT NULL GROUP BY value
),
cum AS (
  SELECT
    SUM(cnt_a) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c_a,
    SUM(cnt_b) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c_b
  FROM h
),
t AS (SELECT MAX(c_a) AS t_a, MAX(c_b) AS t_b FROM cum)
SELECT
  ROUND(MAX(ABS(CAST(c_a AS DOUBLE) / CAST(t_a AS DOUBLE)
             - CAST(c_b AS DOUBLE) / CAST(t_b AS DOUBLE))), 6) AS ks_stat,
  CAST(MAX(t_a) AS BIGINT) AS n_a,
  CAST(MAX(t_b) AS BIGINT) AS n_b
FROM cum CROSS JOIN t
"""


def median_mad_value(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT median and MAD (median absolute deviation — the robust
    spread estimator outlier pipelines prefer over stddev) of `value`
    per event type, WITHOUT sorting rows.

    Convention: the LOWER median (rank ceil(n/2)) — an actual data
    value, no interpolation — so every output is exact and the hash
    gate has no float-arithmetic surface at all beyond one subtraction
    (|value − median|, a single correctly-rounded IEEE op identical in
    both engines).

    Scale shape (same as `mann_whitney_value`): rows reduce to a
    per-(type, value) histogram (map-side combinable, bounded by value
    cardinality, not row count); the rank-ceil(n/2) element comes from
    a cumulative count over DISTINCT values; the deviation pass rebuilds
    a histogram of |value − median| from the FIRST histogram (weighted,
    never re-scanning the fact table) and applies the same rank pick.
    """
    e = load_table(spark, "events", sf).filter(F.col("value").isNotNull())
    h = e.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("cnt"))

    from pyspark.sql import Window

    def lower_median(hist: DataFrame, val_col: str) -> DataFrame:
        """(event_type, med, n) from a (event_type, <val_col>, cnt) histogram."""
        w = (
            Window.partitionBy("event_type")
            .orderBy(val_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = hist.select(
            "event_type",
            F.col(val_col).alias("v"),
            F.sum("cnt").over(w).alias("cum"),
            F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
        )
        # lower median = min v with 2*cum >= n  (cum >= ceil(n/2))
        return (
            cum.filter(F.lit(2) * F.col("cum") >= F.col("n"))
            .groupBy("event_type")
            .agg(F.min("v").alias("med"), F.max("n").cast("long").alias("n"))
        )

    med = lower_median(h, "value")
    dev_h = (
        h.join(F.broadcast(med.select("event_type", "med")), "event_type")
        .groupBy("event_type", F.abs(F.col("value") - F.col("med")).alias("dev"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    mad = lower_median(dev_h, "dev").select(
        "event_type", F.col("med").alias("mad")
    )
    return (
        med.join(mad, "event_type")
        .select("event_type", "n", F.col("med").alias("median"), "mad")
        .orderBy("event_type")
    )


MEDIAN_MAD_SQL = """
WITH h AS (
  SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY event_type, value
),
cum AS (
  SELECT event_type, value AS v,
    SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
                   ROWS UNBOUNDED PRECEDING) AS cum,
    SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM h
),
med AS (
  SELECT event_type, MIN(v) AS med, CAST(MAX(n) AS BIGINT) AS n
  FROM cum WHERE 2 * cum >= n GROUP BY event_type
),
dev_h AS (
  SELECT h.event_type, ABS(h.value - m.med) AS dev,
    CAST(SUM(h.cnt) AS BIGINT) AS cnt
  FROM h JOIN med m ON h.event_type = m.event_type
  GROUP BY h.event_type, ABS(h.value - m.med)
),
dcum AS (
  SELECT event_type, dev,
    SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev
                   ROWS UNBOUNDED PRECEDING) AS cum,
    SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM dev_h
),
mad AS (
  SELECT event_type, MIN(dev) AS mad
  FROM dcum WHERE 2 * cum >= n GROUP BY event_type
)
SELECT m.event_type, m.n, m.med AS median, mad.mad
FROM med m JOIN mad ON m.event_type = mad.event_type
ORDER BY m.event_type
"""


def roc_auc_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Exact ROC-AUC + decile calibration table for a document-quality
    classifier: score = `quality_score`'s BPE-ish token count, label =
    "all four quality criteria pass" (``quality >= 0.9``; the ≥3-of-4
    `keep` verdict is degenerate on the fixtures — every doc passes —
    and a one-class AUC is 0/0) — the model-eval pass a data pipeline
    runs on every heuristic filter before trusting it at corpus scale.

    AUC is the tie-corrected rank-sum form: with per-score counts
    ``cnt`` and positives ``pos``, the average rank of a tie group is
    ``less + (cnt+1)/2``, so ``2·Σ ranks_pos = Σ pos·(2·less+cnt+1)``
    stays INTEGER, and
    ``AUC = (2·Σranks_pos − n⁺(n⁺+1)) / (2·n⁺·n⁻)`` is one division of
    exact integers (the documented tolerance class).

    100 TB shape: ONE corpus scan reduces to a per-score histogram —
    the score domain is bounded (token counts), so the cumulative
    window and every downstream step run on a domain-sized frame, never
    a corpus-sized sort. Calibration bins are derived from the SAME
    histogram (equi-depth up to tie granularity: a tie group lands
    wholly in the bin of its cumulative position — deterministic, and
    at scale the honest alternative to a global per-row NTILE sort).
    """
    from pyspark.sql import Window

    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
        quality_score,
    )

    q = quality_score(spark, sf).select(
        F.col("n_bpe_tokens").alias("s"),
        (F.col("quality") >= 0.9).cast("int").alias("pos"),
    )
    hist = q.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("pos").cast("long").alias("pos"),
    )
    # cumulative count of strictly-smaller scores; the window runs on
    # the domain-sized histogram (see docstring), not on the corpus
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.withColumn(
        "less", F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
    ).persist()
    totals = cum.agg(
        F.sum(F.col("pos") * (2 * F.col("less") + F.col("cnt") + 1))
        .cast("long")
        .alias("two_rank_pos"),
        F.sum("pos").cast("long").alias("npos"),
        F.sum("cnt").cast("long").alias("n"),
    )
    auc = totals.select(
        F.round(
            (
                F.col("two_rank_pos").cast("double")
                - F.col("npos").cast("double") * (F.col("npos") + 1).cast("double")
            )
            / (
                2.0
                * F.col("npos").cast("double")
                * (F.col("n") - F.col("npos")).cast("double")
            ),
            6,
        ).alias("auc"),
        F.col("n").alias("_n"),
    )
    # decile of a tie group = bin of its lower cumulative position
    cal = (
        cum.join(F.broadcast(auc), how="inner", on=F.lit(True))
        # FLOOR explicitly: DuckDB CAST(double AS INT) rounds-half-even
        # while Spark's cast truncates — floor is the one both agree on
        .withColumn(
            "decile",
            (F.floor(F.lit(10) * F.col("less") / F.col("_n")) + 1).cast("int"),
        )
        .groupBy("decile")
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.round(F.sum("pos") / F.sum("cnt"), 6).alias("pos_rate"),
            F.min("s").cast("long").alias("lo_score"),
            F.max("s").cast("long").alias("hi_score"),
            F.first("auc").alias("auc"),
        )
        .orderBy("decile")
    )
    return cal


def _roc_auc_sql() -> str:
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
        QUALITY_SQL,
    )

    return f"""
WITH q AS MATERIALIZED (
  SELECT n_bpe_tokens AS s, CASE WHEN quality >= 0.9 THEN 1 ELSE 0 END AS pos
  FROM ({QUALITY_SQL})
),
hist AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(pos) AS BIGINT) AS pos
  FROM q GROUP BY s
),
cum AS MATERIALIZED (
  SELECT s, cnt, pos,
    CAST(COALESCE(SUM(cnt) OVER (ORDER BY s
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS less
  FROM hist
),
totals AS (
  SELECT CAST(SUM(pos * (2 * less + cnt + 1)) AS BIGINT) AS two_rank_pos,
         CAST(SUM(pos) AS BIGINT) AS npos,
         CAST(SUM(cnt) AS BIGINT) AS n
  FROM cum
),
auc AS (
  SELECT ROUND(
    (CAST(two_rank_pos AS DOUBLE) - CAST(npos AS DOUBLE) * CAST(npos + 1 AS DOUBLE))
    / (2.0 * CAST(npos AS DOUBLE) * CAST(n - npos AS DOUBLE)), 6) AS auc,
    n AS _n
  FROM totals
)
SELECT CAST(FLOOR(10 * less / _n) + 1 AS INT) AS decile,
  CAST(SUM(cnt) AS BIGINT) AS n,
  CAST(SUM(pos) AS BIGINT) AS n_pos,
  ROUND(CAST(SUM(pos) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) AS pos_rate,
  CAST(MIN(s) AS BIGINT) AS lo_score,
  CAST(MAX(s) AS BIGINT) AS hi_score,
  ANY_VALUE(auc) AS auc
FROM cum CROSS JOIN auc
GROUP BY decile
ORDER BY decile
"""


_ACF_MAX_LAG = 7


def acf_daily_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Sample autocorrelation of the daily revenue series at lags 1..7
    (the weekly-seasonality detector for metric monitoring).

    Box-Jenkins form with the all-series mean; cleared of early
    division by multiplying through by n²:
    ``r_k = (n²·Σxy − n·S·(H+T) + (n−k)·S²) / (n²·Σx² − n·S²)``
    where every aggregate (S, Σx², per-lag Σxy/H/T) is an exact
    DECIMAL — the closing formula is ONE double expression with
    identical association on both engines (module determinism note).

    100 TB shape: one fact scan → per-day aggregate (shuffle carries
    O(days) rows); everything after runs on the calendar-bounded daily
    frame, with the lag pairing an equi-join on ``day + k`` (broadcast:
    a daily series is small by construction at any corpus size — it is
    bounded by the calendar, not the data). No corpus-sized window, no
    global sort.
    """
    e = load_table(spark, "events", sf).filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast(DEC)).alias("x"))
        .persist()
    )
    g = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s"),
        F.sum((F.col("x") * F.col("x")).cast(DEC_SQ)).alias("sxx"),
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("lag"))
    head = daily.select("day", F.col("x").alias("xh"))
    tail = daily.select(F.col("day").alias("tday"), F.col("x").alias("xt"))
    pairs = (
        F.broadcast(lags)
        .join(head, how="inner", on=F.lit(True))
        .join(
            F.broadcast(tail),
            F.col("tday") == F.date_add(F.col("day"), F.col("lag")),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum((F.col("xh") * F.col("xt")).cast(DEC_SQ)).alias("sxy"),
            F.sum("xh").alias("h"),
            F.sum("xt").alias("t"),
        )
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    return (
        pairs.join(F.broadcast(g), how="inner", on=F.lit(True))
        .select(
            "lag",
            F.col("n").alias("n_days"),
            "n_pairs",
            F.round(
                (
                    n * n * F.col("sxy").cast("double")
                    - n * s * (F.col("h").cast("double") + F.col("t").cast("double"))
                    + (n - F.col("lag").cast("double")) * s * s
                )
                / (n * n * F.col("sxx").cast("double") - n * s * s),
                6,
            ).alias("acf"),
        )
        .orderBy("lag")
    )


ACF_SQL = f"""
WITH daily AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,2))) AS x
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY CAST(ts AS DATE)
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS s,
         SUM(CAST(x * x AS DECIMAL(38,4))) AS sxx
  FROM daily
),
lags AS (SELECT UNNEST(generate_series(1, {_ACF_MAX_LAG})) AS lag),
pairs AS (
  SELECT l.lag,
    CAST(COUNT(*) AS BIGINT) AS n_pairs,
    SUM(CAST(h.x * t.x AS DECIMAL(38,4))) AS sxy,
    SUM(h.x) AS h,
    SUM(t.x) AS t
  FROM lags l
  JOIN daily h ON TRUE
  JOIN daily t ON t.day = h.day + CAST(l.lag AS INT)
  GROUP BY l.lag
)
SELECT CAST(p.lag AS INT) AS lag, g.n AS n_days, p.n_pairs,
  ROUND(
    (CAST(g.n AS DOUBLE) * CAST(g.n AS DOUBLE) * CAST(p.sxy AS DOUBLE)
     - CAST(g.n AS DOUBLE) * CAST(g.s AS DOUBLE)
       * (CAST(p.h AS DOUBLE) + CAST(p.t AS DOUBLE))
     + (CAST(g.n AS DOUBLE) - CAST(p.lag AS DOUBLE))
       * CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE))
    / (CAST(g.n AS DOUBLE) * CAST(g.n AS DOUBLE) * CAST(g.sxx AS DOUBLE)
       - CAST(g.n AS DOUBLE) * CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)),
  6) AS acf
FROM pairs p CROSS JOIN g
ORDER BY lag
"""


# --- seasonal-naive forecast backtest ---------------------------------------


def seasonal_wape_backtest(spark: SparkSession, sf: str) -> DataFrame:
    """Backtest of the weekly seasonal-naive forecast (predict day *d*
    with day *d−7*) per event type — the baseline every metric-forecast
    model must beat, scored with WAPE ``Σ|actual−forecast| / Σactual``
    and relative bias ``Σ(actual−forecast) / Σactual``.

    WAPE, not MAPE, by design: both numerator and denominator are exact
    DECIMAL sums (order-independent), so the whole metric is ONE final
    double division per type — MAPE's per-day division would float-sum
    in partition order (the hash-gate hazard the module docstring
    bans).

    100 TB shape: one fact scan → per-(type, day) aggregate; the lag
    pairing is a broadcast self-join of the calendar-bounded daily
    frame (``date_add(day, 7)`` equi-key). Nothing after the first
    aggregate scales with the corpus.
    """
    e = load_table(spark, "events", sf).filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast(DEC)).alias("x")
    )
    fc = daily.select(
        "event_type",
        F.date_add("day", 7).alias("day"),
        F.col("x").alias("fx"),
    )
    j = daily.join(F.broadcast(fc), ["event_type", "day"])
    err = (F.col("x") - F.col("fx")).cast(DEC_SQ)
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(F.abs(err)).alias("_sae"),
            F.sum(err).alias("_se"),
            F.sum(F.col("x").cast(DEC_SQ)).alias("_sa"),
        )
        .select(
            "event_type",
            "n_days",
            (F.col("_sae").cast("double") / F.col("_sa").cast("double")).alias("wape"),
            (F.col("_se").cast("double") / F.col("_sa").cast("double")).alias("bias"),
        )
        .orderBy("event_type")
    )


SEASONAL_WAPE_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS x
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY event_type, day
)
SELECT d.event_type,
  CAST(COUNT(*) AS BIGINT) AS n_days,
  CAST(SUM(ABS(CAST(d.x - f.x AS DECIMAL(38,4)))) AS DOUBLE)
    / CAST(SUM(CAST(d.x AS DECIMAL(38,4))) AS DOUBLE) AS wape,
  CAST(SUM(CAST(d.x - f.x AS DECIMAL(38,4))) AS DOUBLE)
    / CAST(SUM(CAST(d.x AS DECIMAL(38,4))) AS DOUBLE) AS bias
FROM daily d JOIN daily f
  ON f.event_type = d.event_type AND f.day + 7 = d.day
GROUP BY d.event_type ORDER BY d.event_type
"""


STATS_QUERIES: dict[str, QuerySpec] = {
    "seasonal_wape_backtest": QuerySpec(seasonal_wape_backtest, SEASONAL_WAPE_SQL),
    "roc_auc_quality": QuerySpec(roc_auc_quality, _roc_auc_sql()),
    "acf_daily_revenue": QuerySpec(acf_daily_revenue, ACF_SQL),
    "median_mad_value": QuerySpec(median_mad_value, MEDIAN_MAD_SQL),
    "bitmap_distinct_rollup": QuerySpec(bitmap_distinct_rollup, BITMAP_DISTINCT_SQL),
    "welch_ttest_value": QuerySpec(welch_ttest_value, WELCH_TTEST_SQL),
    "corr_matrix_lineitem": QuerySpec(corr_matrix_lineitem, CORR_MATRIX_SQL),
    "chi_square_arms": QuerySpec(chi_square_arms, CHI_SQUARE_SQL),
    "mann_whitney_value": QuerySpec(mann_whitney_value, MANN_WHITNEY_SQL),
    "ks_value_drift": QuerySpec(ks_value_drift, KS_DRIFT_SQL),
}
