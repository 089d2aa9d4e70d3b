"""PySpark-native multi-attribute join search engine.

A from-scratch re-expression of the capabilities of the reference system
(Ninniachwen/Multi-Attribute-Join-Search-With-MapReduce — a bachelor-thesis
engine that finds data-lake tables joinable with a query table on several
attributes simultaneously), built Spark-first:

- the Vertica-backed inverted index (``main_tokenized``) becomes a
  Parquet-backed DataFrame built by unpivoting lake tables
  (:mod:`.index`);
- the per-column SQL probes + driver-side collects become one lazy
  Catalyst DAG with a broadcast semi-join (:mod:`.operators.search`);
- the Python-UDF text normalizer becomes native column expressions
  (:mod:`.functions.text`).

Everything here targets a large multi-executor cluster: no driver-side
collects inside operators, broadcast hints for small sides, partial
aggregation, and filter/column pushdown left to Catalyst.
"""

from multi_attribute_join_search_with_mapreduce_spark.session import get_spark
from multi_attribute_join_search_with_mapreduce_spark.index import build_posting_index, LAKE_TABLES
from multi_attribute_join_search_with_mapreduce_spark.operators.search import multi_attribute_join_search

__all__ = [
    "get_spark",
    "build_posting_index",
    "LAKE_TABLES",
    "multi_attribute_join_search",
]
