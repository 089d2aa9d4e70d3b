"""General relational operator surface (SURVEY.md §2 M4).

The reference only ever runs equi-joins + group-counts + window top-n
(§2.3-2.6); a user of a general engine also needs the rest of the
relational algebra. Everything here is stock DataFrame API — the point
of each query is (a) driver-checkable differential coverage of one
operator family and (b) a plan we have inspected for scale (pushdown,
broadcast, partial agg; see tests/test_plans.py).

Scale notes: every query is a single lazy DAG; dimension sides of joins
are broadcast; aggregations rely on partial/final hash aggregation;
top-k is orderBy+limit (TakeOrderedAndProject — no full sort at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.functions.temporal import epoch_s
from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

DEC = "decimal(18,2)"


def _money_sum(col: F.Column, alias: str) -> F.Column:
    """Exact, order-independent money sum rendered as DOUBLE."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


# --- TPC-H-style analytics -------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf)
    disc_price = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    charge = disc_price * (F.lit(1).cast(DEC) + F.col("l_tax").cast(DEC))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum(F.col("l_quantity"), "sum_qty"),
            _money_sum(F.col("l_extendedprice"), "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(F.col("l_discount").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, "customer", sf)
    o = load_table(spark, "orders", sf)
    l = load_table(spark, "lineitem", sf)
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")), o.o_custkey == F.col("c_custkey"))
        .filter(
            (F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
            & (F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    r = load_table(spark, "region", sf)
    n = load_table(spark, "nation", sf)
    c = load_table(spark, "customer", sf)
    o = load_table(spark, "orders", sf)
    l = load_table(spark, "lineitem", sf)
    s = load_table(spark, "supplier", sf)
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# --- grouping sets / cube / rollup ----------------------------------------

def rollup_customers(spark: SparkSession, sf: str) -> DataFrame:
    r = load_table(spark, "region", sf)
    n = load_table(spark, "nation", sf)
    c = load_table(spark, "customer", sf)
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _money_sum(F.col("c_acctbal"), "sum_acctbal"),
        )
    )


ROLLUP_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def cube_orders(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, "orders", sf)
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _money_sum(F.col("o_totalprice"), "sum_price"),
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- window functions ------------------------------------------------------

def grouping_sets_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): totals by
    (status, priority), by status alone, and the grand total — via
    ``spark.sql`` since the DataFrame API exposes only rollup/cube."""
    o = load_table(spark, "orders", sf)
    o.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


def window_topn_orders(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, "orders", sf)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


WINDOW_TOPN_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def window_running_total(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, "orders", sf)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_total"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
"""


def window_lag_events(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, "events", sf)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
    )


WINDOW_LAG_SQL = """
SELECT user_id, event_id, value,
  LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_value,
  LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_value
FROM events
"""


def window_value_functions(spark: SparkSession, sf: str) -> DataFrame:
    """The remaining analytic-window surface in one query: first_value /
    last_value / nth_value over the full partition frame, plus the
    distribution functions ntile / percent_rank / cume_dist.

    The window order ``(o_orderdate, o_orderkey)`` is a total order
    (orderkey is unique), so every one of these — including ntile's
    bucket boundaries and percent_rank's rank — is deterministic and
    engine-independent. percent_rank/cume_dist are exact rational
    doubles computed from the same integer operands on both sides, so
    the value-hash is stable. One shuffle on o_custkey; the six
    functions share a single sort within the window operator.
    """
    o = load_table(spark, "orders", sf)
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    price = F.col("o_totalprice").cast("double")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first(price).over(w_full).alias("first_price"),
        F.last(price).over(w_full).alias("last_price"),
        F.nth_value(price, 2).over(w_full).alias("second_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


WINDOW_VALUE_SQL = """
SELECT o_custkey, o_orderkey,
  FIRST_VALUE(CAST(o_totalprice AS DOUBLE)) OVER full_w AS first_price,
  LAST_VALUE(CAST(o_totalprice AS DOUBLE)) OVER full_w AS last_price,
  NTH_VALUE(CAST(o_totalprice AS DOUBLE), 2) OVER full_w AS second_price,
  CAST(NTILE(4) OVER ord_w AS INTEGER) AS quartile,
  PERCENT_RANK() OVER ord_w AS pr,
  CUME_DIST() OVER ord_w AS cd
FROM orders
WINDOW
  full_w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
  ord_w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


def lateral_topn_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery with LIMIT — the SQL-surface spelling
    of per-group top-n: for each BUILDING-segment customer, its two
    largest orders.

    Catalyst decorrelates the lateral limit into a window/rank plan (no
    per-row re-execution — there is no nested-loop "for each customer
    run a query" at runtime), so this is the same physical shape as
    ``window_topn_orders``; what the query pins is that the LATERAL
    spelling itself parses, decorrelates, and matches the oracle.
    """
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import register_lake

    register_lake(spark, sf, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, o.o_orderkey
        """
    )


LATERAL_TOPN_SQL = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c JOIN LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o ON TRUE
WHERE c.c_mktsegment = 'BUILDING'
ORDER BY c.c_custkey, o.o_orderkey
"""


def nation_revenue_share(spark: SparkSession, sf: str) -> DataFrame:
    """Per-nation order revenue and its share of the global total —
    computed the way that survives 100 TB: the total is a 1-row
    aggregate broadcast back via cross join, NOT ``sum() over ()``,
    whose empty-frame window funnels every row through one partition.
    The share is one IEEE double division of two exactly-summed
    decimals, so the value-hash is engine-stable.
    """
    c = load_table(spark, "customer", sf).select("c_custkey", "c_nationkey")
    o = load_table(spark, "orders", sf).select("o_custkey", "o_totalprice")
    n = load_table(spark, "nation", sf).select("n_nationkey", "n_name")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("_rev"))
    )
    total = rev.agg(F.sum("_rev").alias("_total"))
    return (
        rev.crossJoin(F.broadcast(total))
        .select(
            "n_name",
            F.col("_rev").cast("double").alias("revenue"),
            (F.col("_rev").cast("double") / F.col("_total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy("n_name")
    )


NATION_REVENUE_SHARE_SQL = """
WITH rev AS (
  SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS _rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name,
  CAST(_rev AS DOUBLE) AS revenue,
  CAST(_rev AS DOUBLE) / CAST((SELECT SUM(_rev) FROM rev) AS DOUBLE) AS share
FROM rev
ORDER BY n_name
"""


# --- join variants ---------------------------------------------------------

def left_join_order_counts(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, "customer", sf)
    o = load_table(spark, "orders", sf)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), F.lit(0.0)).alias("total_spend"),
        )
    )


LEFT_JOIN_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def anti_join_customers(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, "customer", sf)
    o = load_table(spark, "orders", sf)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def semi_join_parts(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, "part", sf)
    l = load_table(spark, "lineitem", sf)
    return p.join(
        l.filter(F.col("l_quantity") >= 45), p.p_partkey == l.l_partkey, "left_semi"
    ).select("p_partkey", "p_name")


SEMI_JOIN_SQL = """
SELECT p_partkey, p_name FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 45)
"""


def full_outer_nation_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Full outer join of customer-nation counts vs supplier-nation counts."""
    c = load_table(spark, "customer", sf)
    s = load_table(spark, "supplier", sf)
    cn = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_customers"))
    sn = s.groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_suppliers"))
    return (
        cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full_outer")
        .select(
            F.coalesce(cn.c_nationkey, sn.s_nationkey).alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


FULL_OUTER_SQL = """
SELECT COALESCE(cn.c_nationkey, sn.s_nationkey) AS nationkey,
  COALESCE(n_customers, 0) AS n_customers,
  COALESCE(n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) cn
FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) sn
ON cn.c_nationkey = sn.s_nationkey
"""


# --- set operations --------------------------------------------------------

def set_intersect_customers(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, "customer", sf)
    o = load_table(spark, "orders", sf)
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    with_orders = o.select(F.col("o_custkey").alias("custkey"))
    return building.intersect(with_orders)


SET_INTERSECT_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders
"""


def set_except_customers(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, "customer", sf)
    o = load_table(spark, "orders", sf)
    return (
        c.select(F.col("c_custkey").alias("custkey"))
        .exceptAll(o.select(F.col("o_custkey").alias("custkey")).distinct())
    )


SET_EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer
EXCEPT ALL
SELECT DISTINCT o_custkey AS custkey FROM orders
"""


def union_keys(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, "customer", sf)
    s = load_table(spark, "supplier", sf)
    return (
        c.select(F.col("c_nationkey").cast("int").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").cast("int").alias("nationkey")))
        .distinct()
    )


UNION_SQL = """
SELECT DISTINCT nationkey FROM (
  SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
  UNION ALL
  SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
)
"""


# --- pivot / scalar functions / top-k -------------------------------------

def pivot_returnflag(spark: SparkSession, sf: str) -> DataFrame:
    """Manual pivot (sum-when) — portable across engines by construction."""
    l = load_table(spark, "lineitem", sf)
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity").cast(DEC))).cast("double").alias("qty_o"),
            F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity").cast(DEC))).cast("double").alias("qty_f"),
        )
        .orderBy("l_returnflag")
    )


PIVOT_SQL = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o,
  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, "orders", sf)
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(25)
    )


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
"""


def scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, "orders", sf)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
        F.upper(F.col("o_orderstatus")).alias("status_upper"),
        F.substring(F.col("o_orderpriority"), 1, 1).cast("int").alias("priority_rank"),
        F.length(F.col("o_orderpriority")).alias("priority_len"),
        F.concat_ws("|", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("status_prio"),
        F.round(F.col("o_totalprice").cast(DEC) * F.lit(0.1).cast(DEC), 2).cast("double").alias("fee"),
    )


SCALAR_SQL = """
SELECT o_orderkey,
  CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
  CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
  DATE_TRUNC('month', o_orderdate)::TIMESTAMP AS order_month_start,
  UPPER(o_orderstatus) AS status_upper,
  CAST(SUBSTRING(o_orderpriority, 1, 1) AS INTEGER) AS priority_rank,
  CAST(LENGTH(o_orderpriority) AS INTEGER) AS priority_len,
  CONCAT_WS('|', o_orderstatus, o_orderpriority) AS status_prio,
  CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(18,2)), 2) AS DOUBLE) AS fee
FROM orders
"""


def case_bucketing(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, "orders", sf)
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("price_bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("price_bucket")
    )


CASE_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS price_bucket,
  COUNT(*) AS n_orders
FROM orders GROUP BY 1 ORDER BY price_bucket
"""


def distinct_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf)
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


DISTINCT_AGG_SQL = """
SELECT l_returnflag,
  COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(DISTINCT l_suppkey) AS n_supps,
  MIN(l_quantity) AS min_qty,
  MAX(l_quantity) AS max_qty,
  COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def window_range_trailing(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE-framed window (vs the ROWS frame of ``window_running_total``):
    each event's trailing 7-day sum of ``value`` for its user. The frame
    is value-based — peers at the same instant are included regardless of
    row order, and gaps in time shrink the frame — which a ROWS frame
    cannot express. Keyed on epoch seconds so both engines frame over
    exact integers."""
    e = load_table(spark, "events", sf)
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s("ts"))
        .rangeBetween(-7 * 86400, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("trailing_7d"),
    )


WINDOW_RANGE_SQL = """
SELECT user_id, event_id,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_7d
FROM events
"""


def listagg_part_types(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): the distinct
    part types per brand as one sorted CSV. Sort-before-join makes the
    concatenation deterministic under any partitioning — collect_set
    order is not, so the sort is load-bearing, not cosmetic."""
    p = load_table(spark, "part", sf)
    return (
        p.groupBy("p_brand")
        .agg(
            F.array_join(F.array_sort(F.collect_set("p_type")), ",").alias(
                "types_csv"
            ),
            F.countDistinct("p_type").alias("n_types"),
        )
        .orderBy("p_brand")
    )


LISTAGG_SQL = """
SELECT p_brand,
  string_agg(DISTINCT p_type, ',' ORDER BY p_type) AS types_csv,
  COUNT(DISTINCT p_type) AS n_types
FROM part GROUP BY p_brand ORDER BY p_brand
"""


def doc_length_quartiles(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT per-group order statistics (vs the HLL/KLL *approx*
    sketches in ``pipeline.approx_sketches``): p25/p50/p75 of document
    length per source, one pass, linear interpolation.

    Cross-engine determinism: the percentiles interpolate between
    BIGINT ranks — a + f*(b-a) with f in {0,.25,.5,.75} is exact in
    IEEE doubles for integer inputs, so the value-hash is bit-stable
    without rounding. At scale Spark's ``percentile`` is a per-group
    sort of that group's values only (not a global sort); groups are
    source-cardinality, partitions stay balanced.
    """
    d = load_table(spark, "documents", sf)
    q = F.percentile("n_chars", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        d.groupBy("source")
        .agg(q.alias("_q"), F.count(F.lit(1)).alias("n_docs"))
        .select(
            "source",
            "n_docs",
            F.col("_q")[0].alias("p25"),
            F.col("_q")[1].alias("p50"),
            F.col("_q")[2].alias("p75"),
        )
        .orderBy("source")
    )


DOC_LENGTH_QUARTILES_SQL = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  quantile_cont(n_chars, 0.25) AS p25,
  quantile_cont(n_chars, 0.50) AS p50,
  quantile_cont(n_chars, 0.75) AS p75
FROM documents GROUP BY source ORDER BY source
"""


def equi_depth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source equi-depth (equal-height) histogram of document
    length: 4 ntile buckets with count/min/max each — the optimizer-
    statistics shape (selectivity estimation buckets) and the skew-audit
    view of a column.

    ``ntile`` is deterministic here because the ordering key is total
    (``n_chars, doc_id``); both engines assign the first buckets the
    extra rows, so bucket boundaries agree exactly. One windowed pass
    over a per-source sort, then an S×4-row aggregate.
    """
    d = load_table(spark, "documents", sf)
    w = Window.partitionBy("source").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    return (
        d.select("source", "n_chars", F.ntile(4).over(w).alias("bucket"))
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
        .orderBy("source", "bucket")
    )


EQUI_DEPTH_SQL = """
SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
  MIN(n_chars) AS lo, MAX(n_chars) AS hi
FROM (
  SELECT source, n_chars,
    NTILE(4) OVER (PARTITION BY source ORDER BY n_chars ASC, doc_id ASC) AS bucket
  FROM documents
)
GROUP BY source, bucket
ORDER BY source, bucket
"""


def unpivot_part_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """The official ``DataFrame.unpivot`` (melt) API — long-form
    (part, metric, value) rows from wide numeric columns, then a
    per-metric aggregate. The posting-index builder does the same
    reshape with a generated ``stack(n, ...)`` expression
    (`index.py`); this entry pins the first-class API variant, which
    at 100 TB is the same narrow map (no shuffle until the aggregate).
    """
    p = load_table(spark, "part", sf)
    long = p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")
    return (
        long.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 2).alias("total"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("metric")
    )


UNPIVOT_SQL = """
WITH long AS (
  SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
  UNION ALL
  SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE) FROM part
)
SELECT metric, CAST(COUNT(*) AS BIGINT) AS n,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
  MIN(value) AS min_value, MAX(value) AS max_value
FROM long GROUP BY metric ORDER BY metric
"""


def try_arithmetic_ratios(spark: SparkSession, sf: str) -> DataFrame:
    """ANSI-safe arithmetic surface: ``try_divide`` / ``try_cast``
    return NULL instead of raising under ANSI mode (Spark 4's default)
    — the discount-per-quantity ratio over lineitem where zero
    quantities would otherwise kill a 100 TB job at task 9,973 of
    10,000. The oracle mirrors with NULLIF.
    """
    li = load_table(spark, "lineitem", sf)
    ratio = F.try_divide(
        F.col("l_extendedprice").cast("double"),
        (F.col("l_quantity") - F.col("l_quantity")).cast("double"),  # always 0 -> NULL
    )
    # sum_unit_price quantizes extendedprice/quantity at 6 dp in pure
    # BIGINT arithmetic: extendedprice is 2-dp money (cents =
    # ROUND(e*100) is an exact integer) and quantity is an integer, so
    # round-half-up(e/q * 1e6) = (2*cents*1e4 + q) DIV (2*q) — exact on
    # any engine. A per-row double->DECIMAL cast here diverges: Spark
    # rounds the shortest-string repr HALF_UP while DuckDB rounds the
    # binary value, and q in {8,16,32,...} puts ratios exactly on
    # decimal rounding boundaries. ROUND before the BIGINT cast is
    # load-bearing too: Spark's double->bigint cast truncates, DuckDB's
    # rounds — ROUND makes the double integer-valued first.
    r6 = F.expr(
        "(2 * CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 10000"
        " + CAST(ROUND(l_quantity) AS BIGINT))"
        " DIV (2 * CAST(ROUND(l_quantity) AS BIGINT))"
    )
    return (
        li.withColumn("ratio_e6", r6)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(ratio).alias("n_div_by_zero_survivors"),
            # final 4-dp round stays in integer space; the closing
            # /10000 of an exact <2^53 integer is IEEE-deterministic.
            F.expr("CAST((2 * SUM(ratio_e6) + 100) DIV 200 AS DOUBLE) / 10000").alias(
                "sum_unit_price"
            ),
        )
        .orderBy("l_linestatus")
    )


TRY_ARITH_SQL = """
SELECT l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(CAST(l_extendedprice AS DOUBLE) / NULLIF(l_quantity - l_quantity, 0)) AS BIGINT)
    AS n_div_by_zero_survivors,
  CAST((2 * SUM((2 * CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 10000
                 + CAST(ROUND(l_quantity) AS BIGINT))
                // (2 * CAST(ROUND(l_quantity) AS BIGINT))) + 100) // 200 AS DOUBLE) / 10000
    AS sum_unit_price
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
"""


def parameterized_sql_topn(spark: SparkSession, sf: str) -> DataFrame:
    """Parameterized SQL surface: named ``:param`` markers plus
    ``IDENTIFIER(:col)`` for a safely-injected column reference — the
    injection-proof templating a multi-tenant lake service needs (the
    reference interpolates strings into SQL; SURVEY F4 calls this the
    replacement). The query itself is a plain top-n."""
    load_table(spark, "orders", sf).createOrReplaceTempView("majs_param_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM majs_param_orders
        WHERE o_orderstatus = :status
        ORDER BY IDENTIFIER(:ordcol) DESC, o_orderkey
        LIMIT :k
        """,
        args={"status": "F", "ordcol": "o_totalprice", "k": 25},
    )


PARAM_SQL_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders WHERE o_orderstatus = 'F'
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""


def part_pair_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs ordered together
    — frequent-itemset candidate generation (the canonical MapReduce
    workload) as one self-join + count.

    Formulated as basket arrays, NOT a self-join: collect each order's
    partkeys (ONE shuffle on l_orderkey; basket size bounded by the
    order's own item count, ≤7 in TPC-H-shaped data) and enumerate
    ``a < b`` combinations with a narrow nested ``transform`` —
    C(items,2) ≤ 21 pairs per order, then a map-side-combinable count.
    The equivalent self-join plans as an SMJ that sorts the full fact
    twice; at 10× data its sort+spill grew superlinearly on the bench
    host while this shape stays one exchange + bounded fan-out.
    ``part_a < part_b`` canonicalizes; pair multiplicity (a part
    repeated across an order's lineitems) counts per occurrence exactly
    like the join. Deterministic top-k: count desc, then the pair.
    """
    li = load_table(spark, "lineitem", sf).select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_list("l_partkey").alias("parts")
    )
    combos = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x: F.filter(
                F.transform(
                    F.col("parts"),
                    lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
                ),
                lambda s: s["part_a"] < s["part_b"],
            ),
        )
    )
    return (
        baskets.select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


PART_PAIR_SQL = """
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b LIMIT 20
"""


def incremental_join_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental view maintenance of a JOIN + aggregate — the join
    twin of `events.incremental_rollup` (which maintains a plain
    rollup): the revenue-per-priority view over orders⨝lineitem is
    maintained under simultaneous deltas on BOTH join sides using the
    bilinear delta expansion

        agg(A⨝B) = agg(A₀⨝B₀) + agg(ΔA⨝B₀) + agg(A₀⨝ΔB) + agg(ΔA⨝ΔB)

    (disjoint unions distribute through the join). The old state
    ``agg(A₀⨝B₀)`` is NEVER recomputed — refresh cost is the three
    Δ-sized terms, each a delta joined against one side. Partials are
    exact decimal sums, so merge order cannot change a cent and the
    oracle (the one-shot full join+agg) matches by value.

    The deltas are content-keyed splits (orderkey/partkey mod), the
    repo's convention for deterministic "newly arrived" batches. At
    100 TB the delta terms are partition-pruned scans of the delta
    plus semi-joined probes of the other side — O(Δ), not O(history).
    """
    o = load_table(spark, "orders", sf).select("o_orderkey", "o_orderpriority")
    li = load_table(spark, "lineitem", sf).select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    o_old, o_new = o.filter("o_orderkey % 10 != 0"), o.filter("o_orderkey % 10 = 0")
    li_old, li_new = li.filter("l_partkey % 7 != 0"), li.filter("l_partkey % 7 = 0")

    def partial(orders_side: DataFrame, items_side: DataFrame) -> DataFrame:
        rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,4)"
        )
        return (
            orders_side.join(
                items_side, orders_side["o_orderkey"] == items_side["l_orderkey"]
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(rev).cast("decimal(28,4)").alias("rev_dec"),
            )
        )

    state0 = partial(o_old, li_old)
    deltas = (
        partial(o_new, li_old)
        .unionByName(partial(o_old, li_new))
        .unionByName(partial(o_new, li_new))
    )
    return (
        state0.unionByName(deltas)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_items").cast("long").alias("n_items"),
            F.sum("rev_dec").cast("decimal(28,4)").cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


INCREMENTAL_JOIN_ROLLUP_SQL = """
SELECT o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def recursive_hierarchy_walk(spark: SparkSession, sf: str) -> DataFrame:
    """``WITH RECURSIVE`` over the lake's natural containment tree
    (region → nation → customer → order): per root region, how many
    entities sit at each depth — the org-chart/bill-of-materials query
    class, run through Spark's recursive-CTE SQL surface (Spark 4).

    The edge list namespaces keys per level ('N'/'C'/'O' prefixes) so
    the recursion walks one relation. ``UNION ALL`` recursion is exact
    here because the containment graph is a TREE (each child has one
    parent — no duplicate paths, guaranteed termination at depth 3).
    Cyclic/unbounded graphs are the iterative operators' job
    (`graph.py`: label propagation, alternating star) — a recursive
    CTE materializes every path and cannot terminate on cycles, which
    is exactly why the engine carries both surfaces.

    Scale: each recursion level is one shuffle join of the frontier
    against the edge list — depth-bounded (3 here), frontier rows are
    (root, node) pairs only.
    """
    for t in ("region", "nation", "customer", "orders"):
        load_table(spark, t, sf).createOrReplaceTempView(f"majs_rec_{t}")
    return spark.sql(_RECURSIVE_WALK_BODY.format(p="majs_rec_"))


# One SQL body, two engines: Spark runs it over prefixed temp views,
# DuckDB over its pre-registered plain views.
_RECURSIVE_WALK_BODY = """
WITH RECURSIVE edges(parent, child) AS (
  SELECT 'R' || CAST(r_regionkey AS STRING), 'N' || CAST(n_nationkey AS STRING)
  FROM {p}nation JOIN {p}region ON n_regionkey = r_regionkey
  UNION ALL
  SELECT 'N' || CAST(c_nationkey AS STRING), 'C' || CAST(c_custkey AS STRING)
  FROM {p}customer
  UNION ALL
  SELECT 'C' || CAST(o_custkey AS STRING), 'O' || CAST(o_orderkey AS STRING)
  FROM {p}orders
),
walk(root, node, depth) AS (
  SELECT r_name, 'R' || CAST(r_regionkey AS STRING), 0 FROM {p}region
  UNION ALL
  SELECT w.root, e.child, w.depth + 1
  FROM walk w JOIN edges e ON e.parent = w.node
)
SELECT root, depth, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM walk GROUP BY root, depth ORDER BY root, depth
"""

RECURSIVE_WALK_SQL = _RECURSIVE_WALK_BODY.format(p="").replace(
    "AS STRING", "AS VARCHAR"
)


def observed_scan_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """Pipeline telemetry via ``df.observe`` (CollectMetrics): ingest
    health metrics — row count, price total, quantity bounds, null
    count — accumulate DURING the rollup's own scan, not in a second
    pass. At 100 TB this is how an ingest job reports volume/null-rate/
    value-bound telemetry for free: CollectMetrics is an accumulator
    piggybacked on the task stream, so the fact table is read once.

    The observed values re-enter the result as literal columns on every
    rollup row (the sanctioned model-sized driver hop, the `logreg`
    discipline) — so the differential oracle value-checks that what the
    observation COLLECTED equals what a direct aggregation computes;
    a metrics stream that dropped or double-counted a partition turns
    the row red."""
    from pyspark.sql import Observation

    li = load_table(spark, "lineitem", sf).select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    obs = Observation()
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("sum_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("n_null_qty"),
    )
    # The rollup is returnflag-sized (a handful of rows): collect it in
    # the SAME action that fills the observation and re-enter it as a
    # local DataFrame — one lineitem scan, and nothing persisted (each
    # invocation creates a fresh Observation node, so a persist here
    # would accumulate distinct cache entries for the process lifetime).
    rollup_rows = (
        observed.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("flag_price"),
        )
        .collect()
    )
    rollup = spark.createDataFrame(
        rollup_rows, "l_returnflag string, n_items bigint, flag_price double"
    )
    m = obs.get
    metrics = spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                float(m["sum_price"]),
                float(m["min_qty"]),
                float(m["max_qty"]),
                int(m["n_null_qty"]),
            )
        ],
        "obs_rows bigint, obs_price double, obs_min_qty double, "
        "obs_max_qty double, obs_null_qty bigint",
    )
    return rollup.crossJoin(F.broadcast(metrics)).orderBy("l_returnflag")


OBSERVED_SCAN_SQL = """
WITH rollup AS (
  SELECT l_returnflag,
    CAST(COUNT(*) AS BIGINT) AS n_items,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS flag_price
  FROM lineitem GROUP BY l_returnflag
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS obs_rows,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS obs_price,
    CAST(MIN(l_quantity) AS DOUBLE) AS obs_min_qty,
    CAST(MAX(l_quantity) AS DOUBLE) AS obs_max_qty,
    CAST(COUNT(CASE WHEN l_quantity IS NULL THEN 1 END) AS BIGINT) AS obs_null_qty
  FROM lineitem
)
SELECT r.*, m.* FROM rollup r CROSS JOIN m ORDER BY l_returnflag
"""


RELATIONAL_QUERIES: dict[str, QuerySpec] = {
    "observed_scan_metrics": QuerySpec(observed_scan_metrics, OBSERVED_SCAN_SQL),
    "recursive_hierarchy_walk": QuerySpec(recursive_hierarchy_walk, RECURSIVE_WALK_SQL),
    "incremental_join_rollup": QuerySpec(
        incremental_join_rollup, INCREMENTAL_JOIN_ROLLUP_SQL
    ),
    "part_pair_cooccurrence": QuerySpec(part_pair_cooccurrence, PART_PAIR_SQL),
    "unpivot_part_metrics": QuerySpec(unpivot_part_metrics, UNPIVOT_SQL),
    "try_arithmetic_ratios": QuerySpec(try_arithmetic_ratios, TRY_ARITH_SQL),
    "parameterized_sql_topn": QuerySpec(parameterized_sql_topn, PARAM_SQL_SQL),
    "equi_depth_histogram": QuerySpec(equi_depth_histogram, EQUI_DEPTH_SQL),
    "doc_length_quartiles": QuerySpec(doc_length_quartiles, DOC_LENGTH_QUARTILES_SQL),
    "tpch_q1_pricing_summary": QuerySpec(q1_pricing_summary, Q1_SQL),
    "tpch_q3_shipping_priority": QuerySpec(q3_shipping_priority, Q3_SQL),
    "tpch_q5_local_supplier": QuerySpec(q5_local_supplier, Q5_SQL),
    "rollup_customers": QuerySpec(rollup_customers, ROLLUP_SQL),
    "cube_orders": QuerySpec(cube_orders, CUBE_SQL),
    "grouping_sets_orders": QuerySpec(grouping_sets_orders, GROUPING_SETS_SQL),
    "window_topn_orders": QuerySpec(window_topn_orders, WINDOW_TOPN_SQL),
    "window_running_total": QuerySpec(window_running_total, WINDOW_RUNNING_SQL),
    "window_lag_events": QuerySpec(window_lag_events, WINDOW_LAG_SQL),
    "window_value_functions": QuerySpec(window_value_functions, WINDOW_VALUE_SQL),
    "lateral_topn_orders": QuerySpec(lateral_topn_orders, LATERAL_TOPN_SQL),
    "nation_revenue_share": QuerySpec(nation_revenue_share, NATION_REVENUE_SHARE_SQL),
    "left_join_order_counts": QuerySpec(left_join_order_counts, LEFT_JOIN_SQL),
    "anti_join_customers": QuerySpec(anti_join_customers, ANTI_JOIN_SQL),
    "semi_join_parts": QuerySpec(semi_join_parts, SEMI_JOIN_SQL),
    "full_outer_nation_counts": QuerySpec(full_outer_nation_counts, FULL_OUTER_SQL),
    "set_intersect_customers": QuerySpec(set_intersect_customers, SET_INTERSECT_SQL),
    "set_except_customers": QuerySpec(set_except_customers, SET_EXCEPT_SQL),
    "union_nation_keys": QuerySpec(union_keys, UNION_SQL),
    "pivot_returnflag": QuerySpec(pivot_returnflag, PIVOT_SQL),
    "topk_orders": QuerySpec(topk_orders, TOPK_SQL),
    "scalar_functions": QuerySpec(scalar_functions, SCALAR_SQL),
    "case_bucketing": QuerySpec(case_bucketing, CASE_SQL),
    "distinct_aggregates": QuerySpec(distinct_aggregates, DISTINCT_AGG_SQL),
    "window_range_trailing": QuerySpec(window_range_trailing, WINDOW_RANGE_SQL),
    "listagg_part_types": QuerySpec(listagg_part_types, LISTAGG_SQL),
}
