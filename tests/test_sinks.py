"""Sink round-trips: write with each format, read back, value-compare.

Also asserts the scale-relevant physical properties: a partitioned
parquet write produces one directory per partition value, and reading a
single partition back prunes to that directory (partition filter, not a
full scan).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table
from multi_attribute_join_search_with_mapreduce_spark.sources.sinks import (
    read_json_source,
    write_csv,
    write_json,
    write_parquet,
)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_parquet_partitioned_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_status")
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_parquet(o, out, partition_by=("o_orderstatus",))

    # one directory per partition value
    dirs = {d for d in os.listdir(out) if d.startswith("o_orderstatus=")}
    statuses = {r[0] for r in o.select("o_orderstatus").distinct().collect()}
    assert dirs == {f"o_orderstatus={s}" for s in statuses}

    back = spark.read.parquet(out)
    assert _rows(back, ["o_orderkey", "o_orderstatus", "o_totalprice"]) == _rows(
        o, ["o_orderkey", "o_orderstatus", "o_totalprice"]
    )

    # partition pruning: the single-status read must carry a partition filter
    one = back.filter(F.col("o_orderstatus") == next(iter(statuses)))
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "nation_csv")
    n = load_table(spark, "nation", sf_dir)
    write_csv(n, out)
    back = spark.read.csv(out, header=True, inferSchema=True)
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    assert _rows(back, cols) == _rows(n, cols)


def test_json_roundtrip_with_schema(spark, sf_dir, tmp_path):
    out = str(tmp_path / "supplier_json")
    s = load_table(spark, "supplier", sf_dir)
    write_json(s, out)
    back = read_json_source(spark, out, schema=s.schema)
    cols = ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
    assert _rows(back, cols) == _rows(s, cols)


def test_write_refuses_to_clobber(spark, sf_dir, tmp_path):
    import pytest

    out = str(tmp_path / "once")
    n = load_table(spark, "region", sf_dir)
    write_parquet(n, out)
    with pytest.raises(Exception):
        write_parquet(n, out)  # mode='error' must not silently overwrite
