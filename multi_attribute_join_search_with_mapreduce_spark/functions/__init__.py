from multi_attribute_join_search_with_mapreduce_spark.functions.text import (
    STOPWORDS,
    normalize_col,
    normalize_sql,
    normalize_py,
    tokenize_col,
    tokenize_sql,
)

__all__ = [
    "STOPWORDS",
    "normalize_col",
    "normalize_sql",
    "normalize_py",
    "tokenize_col",
    "tokenize_sql",
]
