"""Unit tests for functions/temporal.py — the NTZ-safe epoch helpers
every event-time operator depends on (cast-to-long/double and
unix_micros are AnalysisExceptions on TIMESTAMP_NTZ)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.functions.temporal import epoch_s, epoch_us


def test_epoch_us_known_values(spark):
    df = spark.createDataFrame(
        [
            (datetime.datetime(1970, 1, 1, 0, 0, 0),),
            (datetime.datetime(1970, 1, 1, 0, 0, 1, 500000),),
            (datetime.datetime(2024, 1, 1, 0, 0, 0),),
        ],
        "ts timestamp_ntz",
    )
    got = [r.us for r in df.select(epoch_us("ts").alias("us")).collect()]
    assert got == [0, 1_500_000, 1_704_067_200_000_000]


def test_epoch_s_floors_subseconds(spark):
    df = spark.createDataFrame(
        [
            (datetime.datetime(2024, 1, 1, 0, 0, 0, 1),),
            (datetime.datetime(2024, 1, 1, 0, 0, 0, 999999),),
            (datetime.datetime(2024, 1, 1, 0, 0, 1, 0),),
        ],
        "ts timestamp_ntz",
    )
    got = [r.s for r in df.select(epoch_s("ts").alias("s")).collect()]
    assert got == [1_704_067_200, 1_704_067_200, 1_704_067_201]


def test_epoch_helpers_are_timezone_independent(spark):
    """The same NTZ wall-clock must produce the same epoch integers in
    any session timezone — the driver owns its session's tz."""
    ts = datetime.datetime(2024, 6, 15, 12, 34, 56, 789012)
    df = spark.createDataFrame([(ts,)], "ts timestamp_ntz")
    saved = spark.conf.get("spark.sql.session.timeZone")
    vals = []
    try:
        for tz in ("UTC", "America/Los_Angeles", "Asia/Kathmandu"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            vals.append(df.select(epoch_us("ts").alias("us")).first().us)
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
    assert vals[0] == vals[1] == vals[2]


def test_epoch_us_matches_duckdb(spark, sf_dir):
    import duckdb

    spark_rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", epoch_us("ts").alias("us"))
        .orderBy("event_id")
        .limit(100)
        .collect()
    )
    duck = duckdb.sql(
        f"SELECT event_id, epoch_us(ts) AS us FROM '{sf_dir}/events.parquet' "
        "ORDER BY event_id LIMIT 100"
    ).fetchall()
    assert [(r.event_id, r.us) for r in spark_rows] == duck
