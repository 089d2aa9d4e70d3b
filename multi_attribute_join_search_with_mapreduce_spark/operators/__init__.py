from multi_attribute_join_search_with_mapreduce_spark.operators.search import (
    multi_attribute_join_search,
    join_search_sql,
)

__all__ = ["multi_attribute_join_search", "join_search_sql"]
