from multi_attribute_join_search_with_mapreduce_spark.sources.lake import (
    TABLES,
    load_table,
    load_lake,
    register_lake,
)

__all__ = ["TABLES", "load_table", "load_lake", "register_lake"]
