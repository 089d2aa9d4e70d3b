"""Snapshot/time-travel table format: isolation, compaction, crash
hygiene (sources/snapshots.py)."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.sources.snapshots import (
    snapshot_append,
    snapshot_compact,
    snapshot_read,
    snapshot_versions,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = snapshot_append(spark.range(0, 10).withColumn("x", F.col("id") * 2), t)
    v2 = snapshot_append(spark.range(10, 15).withColumn("x", F.col("id") * 2), t)
    assert (v1, v2) == (1, 2)
    return t


def test_time_travel_isolation(spark, table):
    # v1 unchanged by the later append
    assert snapshot_read(spark, table, 1).count() == 10
    assert snapshot_read(spark, table, 2).count() == 15
    assert snapshot_read(spark, table).count() == 15  # latest


def test_compaction_preserves_content_and_history(spark, table):
    before = sorted(r.id for r in snapshot_read(spark, table).collect())
    v3 = snapshot_compact(spark, table, target_files=1)
    assert v3 == 3
    after = sorted(r.id for r in snapshot_read(spark, table, v3).collect())
    assert after == before
    # compacted version is one data dir; v1 still readable
    assert snapshot_read(spark, table, 1).count() == 10
    files = glob.glob(os.path.join(table, "data/compact-*/part-*.parquet"))
    assert len(files) == 1


def test_half_written_commit_is_invisible(spark, table):
    # simulate a crash: a .tmp manifest never renamed into place
    tmp = os.path.join(table, "_manifests", ".v3.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": 3, "data_dirs": ["data/bogus"]}, f)
    assert snapshot_versions(table) == [1, 2]
    assert snapshot_read(spark, table).count() == 15


def test_read_missing_version_raises(spark, table):
    with pytest.raises(ValueError):
        snapshot_read(spark, table, 99)
