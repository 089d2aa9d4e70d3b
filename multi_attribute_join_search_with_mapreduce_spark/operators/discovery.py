"""Lake-wide join-graph discovery: which column PAIRS are joinable.

The reference scores one query table against the lake
(``Seq_Search.py:63-93``); the natural lake-management extension is the
all-pairs version — a join graph over every (table, column) pair,
scored by key containment, the standard joinability measure of
data-discovery systems (Aurum; JOSIE, SIGMOD'19). Everything derives
from the same unpivoted posting relation the search probes.

Plan shape and why it scales:

- collapse postings to distinct ``(key, table, column)`` — the
  column-membership relation, far smaller than the row-level index;
- **hot-key cap**: keys present in more than ``max_key_cols`` distinct
  columns ("usa", "2020", stopword-ish cells) are dropped before
  pairing — they glue every column to every other while carrying no
  discriminative signal, and they are exactly what makes the naive
  self-join quadratic. With the cap, pairs-per-key ≤ max_key_cols²/2,
  so the join output is linear in distinct keys with a constant bound —
  the JOSIE/overlap-search posting-length prune;
- one self-equi-join on ``key`` + one aggregate = overlap counts; two
  joins against the per-column distinct-key counts (column-count-sized,
  tiny — AQE broadcasts them) finish containment.

Containment = |A∩B| / min(|A|,|B|) over the *capped* key sets on both
sides (sizes count only keys that survive the cap, keeping the ratio's
numerator and denominator over the same universe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.index import (
    LAKE_TABLES,
    TableSpec,
    cached_posting_index,
    posting_index_sql,
)
from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec

_TAU = 0.25  # report pairs at or above this containment
_MAX_KEY_COLS = 8  # hot-key cap (columns per key)

# The search lake plus the wider fixture tables: join-graph discovery
# profiles every string column the lake has, not just the five tables
# the flagship search indexes. (lineitem's row id is its order key —
# row identity is irrelevant here, the graph works on distinct
# (key, table, column) membership.)
DISCOVERY_TABLES: tuple[TableSpec, ...] = LAKE_TABLES + (
    TableSpec("orders", 6, "o_orderkey", ("o_orderstatus", "o_orderpriority")),
    TableSpec("lineitem", 7, "l_orderkey", ("l_returnflag", "l_linestatus")),
    TableSpec("events", 8, "event_id", ("event_type",)),
    TableSpec("documents", 9, "doc_id", ("lang", "source")),
)


def join_graph_from_postings(
    postings: DataFrame, tau: float = _TAU, max_key_cols: int = _MAX_KEY_COLS
) -> DataFrame:
    """Joinable column pairs ``(table_a, col_a, table_b, col_b,
    n_common, n_a, n_b, containment)`` at containment ≥ ``tau``, from
    any ``(key, table, column, ...)`` posting relation."""
    cols = postings.select("key", "table", "column").distinct()
    keep = (
        cols.groupBy("key")
        .agg(F.count(F.lit(1)).alias("_n_cols"))
        .filter(F.col("_n_cols") <= max_key_cols)
        .select("key")
    )
    capped = cols.join(keep, "key")
    sizes = capped.groupBy("table", "column").agg(F.count(F.lit(1)).alias("n_keys"))
    a = capped.select(
        "key", F.col("table").alias("table_a"), F.col("column").alias("col_a")
    )
    b = capped.select(
        "key", F.col("table").alias("table_b"), F.col("column").alias("col_b")
    )
    pairs = a.join(b, "key").filter(
        (F.col("table_a") < F.col("table_b"))
        | (
            (F.col("table_a") == F.col("table_b"))
            & (F.col("col_a") < F.col("col_b"))
        )
    )
    overlap = pairs.groupBy("table_a", "col_a", "table_b", "col_b").agg(
        F.count(F.lit(1)).alias("n_common")
    )

    def sz(t: str, c: str, out: str) -> DataFrame:
        return sizes.select(
            F.col("table").alias(t), F.col("column").alias(c),
            F.col("n_keys").alias(out),
        )

    # single IEEE division of exact integers, then round — bit-stable
    # across engines (HALF_UP == half-away-from-zero on positives)
    containment = F.round(
        F.col("n_common") / F.least(F.col("n_a"), F.col("n_b")), 4
    )
    # directional containments orient the edge: c_a_in_b ≈ 1 with a
    # much larger B is the fk→pk signature (A's values live inside B's
    # domain)
    c_a_in_b = F.round(F.col("n_common") / F.col("n_a"), 4)
    c_b_in_a = F.round(F.col("n_common") / F.col("n_b"), 4)
    return (
        overlap.join(sz("table_a", "col_a", "n_a"), ["table_a", "col_a"])
        .join(sz("table_b", "col_b", "n_b"), ["table_b", "col_b"])
        .withColumn("containment", containment)
        .withColumn("c_a_in_b", c_a_in_b)
        .withColumn("c_b_in_a", c_b_in_a)
        .filter(F.col("containment") >= tau)
        .select(
            "table_a", "col_a", "table_b", "col_b",
            "n_common", "n_a", "n_b", "containment", "c_a_in_b", "c_b_in_a",
        )
        .orderBy(
            F.desc("containment"), "table_a", "col_a", "table_b", "col_b"
        )
    )


def lake_join_graph(spark: SparkSession, sf: str) -> DataFrame:
    # memoized like the search probes: index construction is an
    # ingest-time step, discovery is a query over it
    return join_graph_from_postings(
        cached_posting_index(spark, sf, DISCOVERY_TABLES)
    )


LAKE_JOIN_GRAPH_SQL = f"""
WITH idx AS (
{posting_index_sql(DISCOVERY_TABLES)}
),
cols AS (SELECT DISTINCT key, "table", "column" FROM idx),
keep AS (
  SELECT key FROM cols GROUP BY key HAVING COUNT(*) <= {_MAX_KEY_COLS}
),
capped AS (SELECT c.* FROM cols c JOIN keep USING (key)),
sizes AS (
  SELECT "table", "column", CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM capped GROUP BY "table", "column"
),
overlap AS (
  SELECT a."table" AS table_a, a."column" AS col_a,
         b."table" AS table_b, b."column" AS col_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM capped a JOIN capped b ON a.key = b.key
  WHERE a."table" < b."table"
     OR (a."table" = b."table" AND a."column" < b."column")
  GROUP BY 1, 2, 3, 4
)
SELECT o.table_a, o.col_a, o.table_b, o.col_b, o.n_common,
       sa.n_keys AS n_a, sb.n_keys AS n_b,
       ROUND(o.n_common / LEAST(sa.n_keys, sb.n_keys), 4) AS containment,
       ROUND(o.n_common / sa.n_keys, 4) AS c_a_in_b,
       ROUND(o.n_common / sb.n_keys, 4) AS c_b_in_a
FROM overlap o
JOIN sizes sa ON sa."table" = o.table_a AND sa."column" = o.col_a
JOIN sizes sb ON sb."table" = o.table_b AND sb."column" = o.col_b
WHERE ROUND(o.n_common / LEAST(sa.n_keys, sb.n_keys), 4) >= {_TAU}
ORDER BY containment DESC, table_a, col_a, table_b, col_b
"""


DISCOVERY_QUERIES: dict[str, QuerySpec] = {
    "lake_join_graph": QuerySpec(lake_join_graph, LAKE_JOIN_GRAPH_SQL),
}
