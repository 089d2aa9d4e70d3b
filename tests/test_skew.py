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


def test_heavy_hitters_exact_under_adversarial_partitioning(spark, tmp_path):
    """Spread each key thinly over many partitions (worst case for the
    local-candidate gate) — the output must still equal the plain
    HAVING aggregation because the gate keeps a provable superset."""
    import pandas as pd
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.operators.skew import heavy_hitters

    # key k repeated 10+k times, k in 0..29; threshold 25 -> keys >= 15
    rows = [(k,) for k in range(30) for _ in range(10 + k)]
    df = spark.createDataFrame(rows, "user_id long").repartition(40)
    lake = tmp_path / "lake"
    df.select(
        F.monotonically_increasing_id().alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(str(lake / "events.parquet"))

    out = {r.user_id: r.n_events for r in heavy_hitters(spark, str(lake), threshold=25).collect()}
    assert out == {k: 10 + k for k in range(30) if 10 + k >= 25}
