"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship multi-attribute join search at sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2), run differentially against DuckDB at sf0.01.

Column names are aliased identically on both sides; aggregates are cast
so Spark and DuckDB types line up (DuckDB SUM(BIGINT) -> HUGEINT must be
cast back to BIGINT, etc.).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from multi_attribute_join_search_with_mapreduce_spark.index import (
    build_posting_index,
    posting_index_sql,
)
from multi_attribute_join_search_with_mapreduce_spark.operators.search import (
    join_search_sql,
    multi_attribute_join_search,
)
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

FLAGSHIP_ATTRS = ["p_brand", "p_type"]


def _search(spark: SparkSession, sf_dir: str, which: str) -> DataFrame:
    postings = build_posting_index(spark, sf_dir)
    query_df = load_table(spark, "part", sf_dir)
    tbl, col = multi_attribute_join_search(postings, query_df, FLAGSHIP_ATTRS)
    return tbl if which == "tables" else col


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _search(spark, "/root/testdata/sf0.001", "tables")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "mjs_posting_index": lambda spark, sf: build_posting_index(spark, sf),
        "mjs_search_tables": lambda spark, sf: _search(spark, sf, "tables"),
        "mjs_search_columns": lambda spark, sf: _search(spark, sf, "columns"),
    }


def oracle_sql() -> dict[str, str]:
    idx = posting_index_sql()
    return {
        "mjs_posting_index": idx,
        "mjs_search_tables": join_search_sql(idx, "part", FLAGSHIP_ATTRS, result="tables"),
        "mjs_search_columns": join_search_sql(idx, "part", FLAGSHIP_ATTRS, result="columns"),
    }
