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


def test_heavy_hitters_exact_across_partition_counts(spark, tmp_path):
    """The local gate must stay a superset of the truth at ANY scan
    granularity: same lake, three maxPartitionBytes settings, identical
    results (parity with the naive HAVING plan)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.operators.skew import heavy_hitters

    rows = [(k,) for k in range(20) for _ in range(5 + 3 * k)]
    df = spark.createDataFrame(rows, "user_id long").repartition(16)
    lake = tmp_path / "lake"
    df.select(
        F.monotonically_increasing_id().alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(str(lake / "events.parquet"))

    expect = {k: 5 + 3 * k for k in range(20) if 5 + 3 * k >= 30}
    key = "spark.sql.files.maxPartitionBytes"
    saved = spark.conf.get(key)
    try:
        for mpb in ("1048576", "16384", "134217728"):
            spark.conf.set(key, mpb)
            got = {
                r.user_id: r.n_events
                for r in heavy_hitters(spark, str(lake), threshold=30).collect()
            }
            assert got == expect, f"mismatch at maxPartitionBytes={mpb}"
    finally:
        spark.conf.set(key, saved)


def test_heavy_hitters_guard_fails_loudly_on_partition_drift(spark, tmp_path):
    """ADVICE r3: if the scan executes with more non-empty partitions
    than the planning-time estimate (conf drift between building the
    DataFrame and running the action), the gate could silently drop true
    heavy hitters — the in-plan marker guard must turn that into a loud
    error instead."""
    import pytest
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.operators.skew import heavy_hitters

    rows = [(k,) for k in range(5) for _ in range(50)]
    df = spark.createDataFrame(rows, "user_id long").repartition(8)
    lake = tmp_path / "lake"
    df.select(
        F.monotonically_increasing_id().alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(str(lake / "events.parquet"))

    keys = {
        "spark.sql.files.maxPartitionBytes": None,
        "spark.sql.files.openCostInBytes": None,
        "spark.sql.files.minPartitionNum": None,
    }
    for k in keys:
        try:
            keys[k] = spark.conf.get(k)
        except Exception:
            keys[k] = None
    try:
        # Plan with ONE fat partition (local_min == threshold): zero
        # open cost + minPartitionNum=1 lets all files pack together.
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1073741824")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        spark.conf.set("spark.sql.files.minPartitionNum", "1")
        hh = heavy_hitters(spark, str(lake), threshold=40)
        # ... then execute with many small splits: each file's local
        # counts fall below the stale gate, so exactness is gone — the
        # guard must raise, not return a silently pruned result.
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
        spark.conf.set("spark.sql.files.openCostInBytes", "4194304")
        spark.conf.set("spark.sql.files.minPartitionNum", "32")
        with pytest.raises(Exception, match="heavy_hitters: local gate"):
            hh.collect()
    finally:
        for k, v in keys.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_cms_heavy_hitters_exact_rows_and_bounds(spark, sf_dir):
    """Output rows are the EXACT top-10 producers (the sketch only
    feeds the two self-check booleans), estimates never undercount
    (CMS structural guarantee), and overshoot stays within the bound."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.skew import (
        _CMS_TOP,
        cms_heavy_hitters,
    )

    rows = cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == _CMS_TOP
    assert all(r.cms_ge_exact for r in rows)
    assert all(r.cms_within_bound for r in rows)
    exact = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(_CMS_TOP)
        .collect()
    )
    assert [(r.user_id, r.n_events) for r in rows] == [(r.user_id, r.n) for r in exact]
