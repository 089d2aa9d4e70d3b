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


def test_upsert_latest_wins_and_inserts(spark, table):
    from multi_attribute_join_search_with_mapreduce_spark.sources.snapshots import snapshot_upsert

    updates = spark.createDataFrame([(3, 999), (100, 200)], "id long, x long")
    v3 = snapshot_upsert(updates, table, keys=["id"])
    assert v3 == 3
    rows = {r.id: r.x for r in snapshot_read(spark, table, v3).collect()}
    assert rows[3] == 999          # updated
    assert rows[100] == 200        # inserted
    assert rows[4] == 8            # untouched
    assert len(rows) == 16
    # pre-merge version still shows the old value
    old = {r.id: r.x for r in snapshot_read(spark, table, 2).collect()}
    assert old[3] == 6 and 100 not in old


def test_delete_where_copy_on_write(spark, table):
    from multi_attribute_join_search_with_mapreduce_spark.sources.snapshots import (
        snapshot_delete_where,
    )

    v3 = snapshot_delete_where(spark, table, "id % 2 = 0")
    got = sorted(r.id for r in snapshot_read(spark, table, v3).collect())
    assert got == [1, 3, 5, 7, 9, 11, 13]
    assert snapshot_read(spark, table, 2).count() == 15  # history intact


def test_snapshot_diff_classifies_all_change_types(spark):
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.sources.snapshots import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, payload string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d")], "k long, payload string"
    )
    got = {
        (r.k, r.change_type) for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        (1, "deleted"), (2, "unchanged"), (3, "changed"), (4, "inserted")
    }


def test_snapshot_diff_keys_only_table(spark):
    """With no payload columns a common key can only be unchanged."""
    from multi_attribute_join_search_with_mapreduce_spark.sources.snapshots import snapshot_diff

    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {(r.k, r.change_type) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {(1, "deleted"), (2, "unchanged"), (3, "inserted")}


def test_snapshot_expire_retention_and_gc(spark, tmp_path):
    """Three appends + a compaction; expire to keep_last=1: old
    versions become unreadable, the survivor's content is intact, and
    every data dir the survivor doesn't reference is gone from disk."""
    import os

    import pytest

    from multi_attribute_join_search_with_mapreduce_spark.sources.snapshots import (
        snapshot_append,
        snapshot_compact,
        snapshot_expire,
        snapshot_read,
        snapshot_versions,
    )

    t = str(tmp_path / "tbl")
    for i in range(3):
        snapshot_append(
            spark.range(i * 10, i * 10 + 10).withColumnRenamed("id", "k"), t
        )
    snapshot_compact(spark, t)
    assert snapshot_versions(t) == [1, 2, 3, 4]
    before = sorted(r.k for r in snapshot_read(spark, t).collect())

    out = snapshot_expire(t, keep_last=1)
    assert out["expired_versions"] == [1, 2, 3]
    # pre-compaction commit dirs are unreferenced by v4 -> collected
    assert len(out["removed_dirs"]) == 3
    assert snapshot_versions(t) == [4]
    assert sorted(r.k for r in snapshot_read(spark, t).collect()) == before
    with pytest.raises(ValueError):
        snapshot_read(spark, t, version=2)
    # on-disk data dirs == exactly the survivor's file-set
    live = set(os.listdir(os.path.join(t, "data")))
    assert live == {"compact-000004"}


def test_snapshot_expire_keeps_shared_dirs(spark, tmp_path):
    """Append-only history: v3's manifest references v1's and v2's data
    dirs, so expiring to keep_last=1 must remove NOTHING from disk."""
    from multi_attribute_join_search_with_mapreduce_spark.sources.snapshots import (
        snapshot_append,
        snapshot_expire,
        snapshot_read,
    )

    t = str(tmp_path / "tbl")
    for i in range(3):
        snapshot_append(spark.range(i * 5, i * 5 + 5).withColumnRenamed("id", "k"), t)
    out = snapshot_expire(t, keep_last=1)
    assert out["expired_versions"] == [1, 2]
    assert out["removed_dirs"] == []
    assert snapshot_read(spark, t).count() == 15


def test_snapshot_expire_spares_uncommitted_append_dirs(spark, tmp_path):
    """Snapshot isolation under a racing writer: a data dir that an
    in-flight append has WRITTEN but not yet COMMITTED (data first,
    manifest rename second) is referenced by no manifest — expire must
    not GC it, or the racing writer commits a manifest pointing at
    deleted files. GC scope = expired manifests' dirs minus live set,
    never 'everything the survivors don't mention'."""
    import os

    from multi_attribute_join_search_with_mapreduce_spark.sources.snapshots import (
        snapshot_append,
        snapshot_compact,
        snapshot_expire,
        snapshot_read,
    )

    t = str(tmp_path / "tbl")
    for i in range(2):
        snapshot_append(spark.range(i * 5, i * 5 + 5).withColumnRenamed("id", "k"), t)
    snapshot_compact(spark, t)
    # Simulate the racing append's phase 1: data written, no manifest.
    inflight = os.path.join(t, "data", "commit-000099")
    spark.range(100, 105).withColumnRenamed("id", "k").write.parquet(inflight)

    out = snapshot_expire(t, keep_last=1)
    assert out["expired_versions"] == [1, 2]
    assert "data/commit-000099" not in out["removed_dirs"]
    assert os.path.isdir(inflight), "expire deleted an uncommitted append's data"
    # The expired pre-compaction dirs WERE collected (GC still works).
    assert sorted(out["removed_dirs"]) == ["data/commit-000001", "data/commit-000002"]
    assert snapshot_read(spark, t).count() == 10


def test_snapshot_append_batch_idempotent_on_redelivery(spark, tmp_path):
    """The exactly-once contract: committing the same batch id twice
    produces ONE version; a new batch id appends normally."""
    from multi_attribute_join_search_with_mapreduce_spark.sources.snapshots import (
        snapshot_append_batch,
        snapshot_read,
        snapshot_versions,
    )

    t = str(tmp_path / "tbl")
    df = spark.range(10).withColumnRenamed("id", "k")
    assert snapshot_append_batch(df, t, batch_id=0) == 1
    # redelivery of batch 0 (e.g. crash-restart): no new version, no dup rows
    assert snapshot_append_batch(df, t, batch_id=0) is None
    assert snapshot_versions(t) == [1]
    assert snapshot_read(spark, t).count() == 10
    assert snapshot_append_batch(df, t, batch_id=1) == 2
    assert snapshot_read(spark, t).count() == 20


def test_snapshot_as_of_timestamp_resolution(spark, tmp_path):
    """AS OF TIMESTAMP resolves to the newest commit at or before the
    probe time; a probe before the first commit raises."""
    import time

    import pytest

    from multi_attribute_join_search_with_mapreduce_spark.sources.snapshots import (
        snapshot_append,
        snapshot_read,
        snapshot_version_as_of,
    )

    t = str(tmp_path / "tbl")
    t0 = time.time()
    snapshot_append(spark.range(5).withColumnRenamed("id", "k"), t)
    mid = time.time()
    time.sleep(0.05)
    snapshot_append(spark.range(5, 12).withColumnRenamed("id", "k"), t)

    assert snapshot_version_as_of(t, mid) == 1
    assert snapshot_version_as_of(t, time.time()) == 2
    assert snapshot_read(spark, t, as_of_ts=mid).count() == 5
    assert snapshot_read(spark, t, as_of_ts=time.time()).count() == 12
    with pytest.raises(ValueError):
        snapshot_version_as_of(t, t0 - 10)
    with pytest.raises(ValueError):
        snapshot_read(spark, t, version=1, as_of_ts=mid)
