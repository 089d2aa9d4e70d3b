"""Skew-mitigation operators: salted paths must be row-identical to
their unsalted equivalents (the salt is a physical detail, never a
semantic one)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.operators.skew import salted_count, salted_join
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table


def test_salted_count_equals_plain_groupby(spark, sf_dir):
    e = load_table(spark, "events", sf_dir)
    salted = {tuple(r) for r in salted_count(e, ["user_id", "event_type"]).collect()}
    plain = {
        tuple(r)
        for r in e.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark, sf_dir):
    e = load_table(spark, "events", sf_dir).select("event_id", "user_id")
    dim = (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_total"))
    )
    salted = {tuple(r) for r in salted_join(e, dim, "user_id").collect()}
    plain = {tuple(r) for r in e.join(dim, "user_id").collect()}
    assert salted == plain
    # fact rows with no dim partner are dropped on both paths (inner)
    assert len(salted) == e.count()
