"""Subquery-shaped analytics (EXISTS / IN / correlated scalar).

The reference never issues a subquery — its only nested shape is the
SQL-level self-join (``handlers.py:92-107``, SURVEY.md §2.3 J3). A
general engine must still cover the classic decorrelated shapes, so
each query here implements one of them Spark-first:

- correlated EXISTS  -> ``left_semi`` join with the correlated predicate
  in the join condition (Catalyst's own decorrelation target);
- IN (GROUP BY ... HAVING ...) -> semi-join against the aggregated
  subquery;
- correlated scalar AVG -> window aggregate over the correlation key
  (one shuffle, no per-row re-scan);
- uncorrelated scalar -> cross-join of a 1-row aggregate (broadcast).

Scale notes: semi-joins shuffle on the correlation key only; the 1-row
scalar is a broadcast nested-loop over a single value; dimension sides
(nation, region) are broadcast; fact-scale part/customer/supplier carry
no hint — the size-based planner broadcasts them at harness scale but
must stay free to shuffle-join when they are fact-sized at 100 TB.
Queries follow TPC-H Q4/Q6/Q10/
Q14/Q17/Q18/Q22 adapted to the driver's schema (TESTDATA.md — e.g. no
l_commitdate/l_receiptdate, so Q4's EXISTS uses l_shipdate >
o_orderdate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

DEC = "decimal(18,2)"


def _revenue() -> F.Column:
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )


REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"


def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 (adapted): correlated EXISTS as a left-semi join.

    The correlated non-equi predicate (l_shipdate > o_orderdate) rides
    in the join condition; Spark executes one shuffled semi-join on
    l_orderkey — no per-order probe.
    """
    o = load_table(spark, "orders", sf).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = load_table(spark, "lineitem", sf)
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; every predicate reaches the
    parquet reader (PushedFilters), the agg is partial/final with one
    1-row exchange."""
    l = load_table(spark, "lineitem", sf)
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").cast(DEC) >= F.lit(0.05).cast(DEC))
            & (F.col("l_discount").cast(DEC) <= F.lit(0.07).cast(DEC))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC))
            .cast("double")
            .alias("revenue")
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN CAST(0.05 AS DECIMAL(18,2)) AND CAST(0.07 AS DECIMAL(18,2))
  AND l_quantity < 24
GROUP BY ALL
"""


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 (adapted: no c_address/phone/comment): revenue lost to
    returns per customer, one quarter. lineitem⨝orders shuffles on the
    orderkey; nation is broadcast."""
    c = load_table(spark, "customer", sf)
    o = load_table(spark, "orders", sf).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, "lineitem", sf).filter(F.col("l_returnflag") == "R")
    n = load_table(spark, "nation", sf)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
  CAST(SUM({REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q14_promo_effect(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14: conditional aggregate ratio. The
    ratio divides two exact decimal sums (rendered as double), so the
    result is bit-stable across partition orders."""
    l = load_table(spark, "lineitem", sf).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = load_table(spark, "part", sf)
    rev = _revenue()
    agg = (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0).cast(DEC)))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias("promo_pct"),
    )


Q14_SQL = f"""
SELECT promo_revenue, total_revenue,
       100.0 * promo_revenue / total_revenue AS promo_pct
FROM (
  SELECT
    CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {REV_SQL} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
    CAST(SUM({REV_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-02-01'
)
"""


def q17_small_quantity(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17: correlated scalar AVG decorrelated into a window
    aggregate over the correlation key (l_partkey) — one shuffle instead
    of a per-row subquery. The avg is an exact decimal sum divided by a
    count, so both engines compare identical doubles."""
    p = load_table(spark, "part", sf).filter(F.col("p_brand") == "Brand#23")
    l = load_table(spark, "lineitem", sf)
    w = Window.partitionBy("l_partkey")
    li = (
        l.join(p, l.l_partkey == p.p_partkey)
        .withColumn(
            "avg_qty",
            F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
        )
    )
    return li.filter(F.col("l_quantity") < 0.2 * F.col("avg_qty")).agg(
        (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# The correlated scalar subquery sees only this part's lineitems, which
# is exactly the window partition above (the filter is on part attrs).
Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < 0.2 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
GROUP BY ALL
"""


def q18_large_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18: IN (GROUP BY ... HAVING) as a semi-join against the
    aggregate. The HAVING side aggregates lineitem once (partial agg
    before the shuffle)."""
    big = (
        load_table(spark, "lineitem", sf)
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_sq"))
        .filter(F.col("_sq") > 150)
        .select("l_orderkey")
    )
    o = load_table(spark, "orders", sf)
    c = load_table(spark, "customer", sf)
    l = load_table(spark, "lineitem", sf)
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q22_idle_balances(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 (adapted: no phone — grouped by nation, and the NOT
    EXISTS probes urgent orders since every synthetic customer has at
    least one order): uncorrelated scalar subquery (global avg balance)
    as a broadcast 1-row cross join, plus NOT EXISTS as a left-anti
    join on o_custkey."""
    c = load_table(spark, "customer", sf)
    o = load_table(spark, "orders", sf).filter(F.col("o_orderpriority") == "1-URGENT")
    n = load_table(spark, "nation", sf)
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))
            ).alias("_avg_bal")
        )
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("n_name")
    )


Q22_SQL = """
SELECT n_name, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY n_name
ORDER BY n_name
"""


SUBQUERY_QUERIES: dict[str, QuerySpec] = {
    "tpch_q4_order_priority": QuerySpec(q4_order_priority, Q4_SQL),
    "tpch_q6_forecast_revenue": QuerySpec(q6_forecast_revenue, Q6_SQL),
    "tpch_q10_returned_items": QuerySpec(q10_returned_items, Q10_SQL),
    "tpch_q14_promo_effect": QuerySpec(q14_promo_effect, Q14_SQL),
    "tpch_q17_small_quantity": QuerySpec(q17_small_quantity, Q17_SQL),
    "tpch_q18_large_volume": QuerySpec(q18_large_volume, Q18_SQL),
    "tpch_q22_idle_balances": QuerySpec(q22_idle_balances, Q22_SQL),
}
