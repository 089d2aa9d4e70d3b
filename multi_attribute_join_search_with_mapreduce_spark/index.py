"""Posting-index builder: the lake flattened into an inverted index.

The reference's lake is pre-tokenized into one Vertica table
``main_tokenized(tokenized, tableid, colid, rowid)`` (``handlers.py:15``,
``handlers.py:54``) by an external process it does not ship. Here the
index is *derived*: every string column of every lake table is unpivoted
(``stack``) into ``(key STRING, table INT, column INT, row BIGINT)``
rows, with ``key`` the normalized cell value
(:func:`..functions.text.normalize_col`) — one Catalyst plan, no
external DBMS.

Scale notes (100 TB design):

- the unpivot is a narrow map — no shuffle; normalization is native
  expressions inside whole-stage codegen;
- persisted via :func:`write_posting_index` the index is written
  partitioned/bucketed **by key**, so probe-time semi-joins prune files
  and co-locate without a shuffle;
- row identity is the table's own integer primary key, not
  ``monotonically_increasing_id`` — deterministic across partitionings
  and re-runs (the reference's ``rowid`` comes from its external
  tokenizer; SURVEY.md §2.11 calls for surrogate ids that survive
  re-partitioning).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.functions.text import normalize_col, normalize_sql
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table


@dataclass(frozen=True)
class TableSpec:
    """One lake table's contribution to the posting index."""

    name: str
    table_id: int
    row_col: str  # integer primary-key column used as posting `row`
    string_cols: tuple[str, ...]  # indexed columns; position = `column` id


# Canonical lake for join search: the five TPC-H-ish dimension tables.
LAKE_TABLES: tuple[TableSpec, ...] = (
    TableSpec("region", 1, "r_regionkey", ("r_name",)),
    TableSpec("nation", 2, "n_nationkey", ("n_name",)),
    TableSpec("customer", 3, "c_custkey", ("c_name", "c_mktsegment")),
    TableSpec("supplier", 4, "s_suppkey", ("s_name",)),
    TableSpec("part", 5, "p_partkey", ("p_name", "p_brand", "p_type")),
)


def postings_for_table(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Unpivot one lake table into posting rows (narrow, shuffle-free)."""
    pairs = []
    for col_id, col_name in enumerate(spec.string_cols):
        pairs.append(
            df.select(
                normalize_col(F.col(col_name)).alias("key"),
                F.lit(spec.table_id).cast("int").alias("table"),
                F.lit(col_id).cast("int").alias("column"),
                F.col(spec.row_col).cast("bigint").alias("row"),
            )
        )
    out = reduce(DataFrame.unionByName, pairs)
    return out.filter(F.col("key") != "")


def build_posting_index(
    spark: SparkSession,
    sf_dir: str,
    specs: tuple[TableSpec, ...] = LAKE_TABLES,
) -> DataFrame:
    """The full inverted index as one lazy DataFrame."""
    parts = [postings_for_table(load_table(spark, s.name, sf_dir), s) for s in specs]
    return reduce(DataFrame.unionByName, parts)


def write_posting_index(
    spark: SparkSession,
    sf_dir: str,
    out_table: str = "posting_index",
    buckets: int = 32,
    specs: tuple[TableSpec, ...] = LAKE_TABLES,
) -> None:
    """Persist the index bucketed by ``key``.

    Probe joins on ``key`` against a bucketed index avoid the index-side
    shuffle entirely — the scan reads only the buckets the keys hash to.
    """
    (
        build_posting_index(spark, sf_dir, specs)
        .write.mode("overwrite")
        .bucketBy(buckets, "key")
        .sortBy("key")
        .saveAsTable(out_table)
    )


def posting_index_sql(specs: tuple[TableSpec, ...] = LAKE_TABLES) -> str:
    """DuckDB SQL producing the identical index (differential oracle)."""
    selects = []
    for s in specs:
        for col_id, col_name in enumerate(s.string_cols):
            selects.append(
                f"SELECT {normalize_sql(col_name)} AS key, "
                f"CAST({s.table_id} AS INTEGER) AS \"table\", "
                f"CAST({col_id} AS INTEGER) AS \"column\", "
                f"CAST({s.row_col} AS BIGINT) AS row FROM {s.name}"
            )
    union = "\nUNION ALL\n".join(selects)
    return f"SELECT * FROM (\n{union}\n) WHERE key <> ''"
