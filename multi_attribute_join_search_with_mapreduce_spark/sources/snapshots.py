"""Snapshot-versioned parquet tables: manifest-based time travel.

The lakehouse capability class (Iceberg/Delta-style): every commit
writes immutable data files plus a tiny JSON manifest listing the
table's live file-set at that version. Readers resolve a manifest —
latest or pinned — and scan exactly the listed files, so

- **time travel**: any historical version stays readable forever until
  explicitly expired (old manifests keep referencing the old files);
- **snapshot isolation**: a reader pinned to v*n* is unaffected by
  concurrent appends/compactions committing v*n+1*;
- **compaction without downtime**: rewriting small files into big ones
  is just a new manifest over new files — readers of old versions are
  untouched.

Scale notes: the manifest holds *directory* entries (one per commit),
not per-file entries, so manifest size is O(commits), and the data
scan is a plain multi-path parquet read — partition pruning, predicate
pushdown, and column pruning all still apply. Commit = write manifest
``v{n}.json`` then atomically rename into place; the highest complete
manifest wins, so a crashed half-written commit is invisible.

The reference has no table-format layer (its lake lives in a warehouse,
``handlers.py:15``); this module is part of the 100 TB parquet-lake
surface the engine adds.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from multi_attribute_join_search_with_mapreduce_spark.scratch import scratch_dir

_MANIFEST_DIR = "_manifests"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"v{version}.json")


def snapshot_versions(table_dir: str) -> list[int]:
    """All committed versions, ascending (empty for a fresh dir)."""
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def _commit(
    table_dir: str, version: int, data_dirs: list[str], extra: dict | None = None
) -> None:
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".v{version}.json.tmp")
    import time

    with open(tmp, "w") as f:
        json.dump(
            {
                "version": version,
                "data_dirs": data_dirs,
                "committed_at": time.time(),
                **(extra or {}),
            },
            f,
        )
    # atomic on POSIX: the manifest appears fully-written or not at all
    os.rename(tmp, _manifest_path(table_dir, version))


def snapshot_append(df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as a new version = previous live file-set plus this
    batch's files. Returns the committed version number."""
    versions = snapshot_versions(table_dir)
    version = (versions[-1] + 1) if versions else 1
    data_dir = f"data/commit-{version:06d}"
    df.write.parquet(os.path.join(table_dir, data_dir))
    prev = _read_manifest(table_dir, versions[-1])["data_dirs"] if versions else []
    _commit(table_dir, version, [*prev, data_dir])
    return version


def snapshot_append_batch(df: DataFrame, table_dir: str, batch_id: int) -> int | None:
    """Idempotent streaming append: commit ``df`` as a new version
    TAGGED with the micro-batch id; if any manifest already carries
    this ``batch_id`` the call is a no-op (returns None).

    This is the exactly-once contract for `foreachBatch` sinks into
    snapshot tables: Structured Streaming may re-deliver a batch after
    a crash-restart, and the tag turns the redelivery into a skip
    instead of a duplicate version — the checkpoint guarantees at-
    least-once, the manifest tag upgrades it to exactly-once, and the
    atomic manifest rename means a crash mid-commit leaves no partial
    version for the retry to trip on.
    """
    versions = snapshot_versions(table_dir)
    for v in versions:
        if _read_manifest(table_dir, v).get("batch_id") == batch_id:
            return None
    version = (versions[-1] + 1) if versions else 1
    data_dir = f"data/commit-{version:06d}"
    # overwrite, not ErrorIfExists: a crash BETWEEN the data write and
    # the manifest rename leaves an orphan data dir with this exact
    # name (no manifest references it, so version re-derives the same
    # number on redelivery) — the retry must be able to rewrite it
    # instead of wedging on "path already exists".
    df.write.mode("overwrite").parquet(os.path.join(table_dir, data_dir))
    prev = _read_manifest(table_dir, versions[-1])["data_dirs"] if versions else []
    _commit(table_dir, version, [*prev, data_dir], extra={"batch_id": batch_id})
    return version


def snapshot_compact(spark: SparkSession, table_dir: str, target_files: int = 1) -> int:
    """Rewrite the CURRENT live file-set into ``target_files`` files and
    commit it as a new version. Content-preserving; every older version
    remains readable (its manifest still lists the old files)."""
    versions = snapshot_versions(table_dir)
    if not versions:
        raise ValueError(f"no snapshots at {table_dir}")
    version = versions[-1] + 1
    data_dir = f"data/compact-{version:06d}"
    (
        snapshot_read(spark, table_dir)
        .repartition(target_files)
        .write.parquet(os.path.join(table_dir, data_dir))
    )
    _commit(table_dir, version, [data_dir])
    return version


def snapshot_upsert(df: DataFrame, table_dir: str, keys: list[str]) -> int:
    """MERGE INTO, copy-on-write: rows in ``df`` replace current rows
    with the same key (latest wins) and new keys insert; commit the
    merged set as a new version. History stays readable — the previous
    manifest still lists the previous files.

    At 100 TB a production implementation rewrites only the files whose
    key-ranges intersect the batch (manifest min/max pruning); this
    commit rewrites the live set, which is the correct semantics and
    the same manifest mechanics — the file-level pruning is an
    optimization inside this function, not a different contract.
    """
    spark = df.sparkSession
    versions = snapshot_versions(table_dir)
    if versions:
        current = snapshot_read(spark, table_dir)
        merged = current.join(df.select(*keys), on=keys, how="left_anti").unionByName(df)
    else:
        merged = df
    version = (versions[-1] + 1) if versions else 1
    data_dir = f"data/merge-{version:06d}"
    merged.write.parquet(os.path.join(table_dir, data_dir))
    _commit(table_dir, version, [data_dir])
    return version


def snapshot_delete_where(
    spark: SparkSession, table_dir: str, predicate: str
) -> int:
    """DELETE, copy-on-write: commit a new version containing the rows
    that do NOT match ``predicate`` (a SQL boolean expression)."""
    from pyspark.sql import functions as F

    versions = snapshot_versions(table_dir)
    if not versions:
        raise ValueError(f"no snapshots at {table_dir}")
    remaining = snapshot_read(spark, table_dir).where(~F.expr(predicate))
    version = versions[-1] + 1
    data_dir = f"data/delete-{version:06d}"
    remaining.write.parquet(os.path.join(table_dir, data_dir))
    _commit(table_dir, version, [data_dir])
    return version


def snapshot_expire(table_dir: str, keep_last: int = 1) -> dict:
    """Retention / VACUUM: expire all but the newest ``keep_last``
    versions, then garbage-collect data directories no longer
    referenced by ANY surviving manifest.

    Ordering is the crash-safety contract: manifests are removed
    FIRST, data directories second. A crash between the two phases
    leaves unreferenced data dirs (harmless, re-collectable on the
    next expire) but never a manifest pointing at deleted files. A
    data dir shared by a surviving manifest (append commits reference
    prior dirs) is always retained — liveness is computed over the
    union of survivors' file-sets, not per-version.

    Concurrency contract: GC removes ONLY dirs referenced by the
    manifests being expired (minus the live set) — never "every dir
    no surviving manifest mentions". ``snapshot_append`` writes data
    first and commits the manifest second, so at expire time an
    in-flight append's data dir exists but is referenced by nothing;
    scanning the data root would delete it out from under the racing
    writer and break the documented snapshot isolation. Dirs orphaned
    by a writer CRASH (data written, manifest never committed) are
    therefore not collected here — that is deliberate; a separate
    offline sweep with a quiesced-writers guarantee is the place for
    orphan cleanup.

    Returns ``{"expired_versions": [...], "removed_dirs": [...]}``.
    """
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = snapshot_versions(table_dir)
    expired, survivors = versions[:-keep_last], versions[-keep_last:]
    live: set[str] = set()
    for v in survivors:
        live.update(_read_manifest(table_dir, v)["data_dirs"])
    dead: set[str] = set()
    for v in expired:
        dead.update(_read_manifest(table_dir, v)["data_dirs"])
    for v in expired:
        os.remove(_manifest_path(table_dir, v))
    removed = []
    for rel in sorted(dead - live):
        path = os.path.join(table_dir, rel)
        if os.path.isdir(path):
            shutil.rmtree(path)
            removed.append(rel)
    return {"expired_versions": expired, "removed_dirs": removed}


def snapshot_version_as_of(table_dir: str, ts: float) -> int:
    """Timestamp time travel: the newest version committed at or before
    ``ts`` (epoch seconds) — ``SELECT ... AS OF TIMESTAMP`` resolution.
    Commit times come from the manifests themselves (written at commit
    time), not file mtimes, so copies/rsyncs of the table keep history
    resolution intact. Manifests from before this field existed count
    as epoch 0 (always visible)."""
    versions = snapshot_versions(table_dir)
    eligible = [
        v
        for v in versions
        if _read_manifest(table_dir, v).get("committed_at", 0.0) <= ts
    ]
    if not eligible:
        raise ValueError(f"no version at or before ts={ts} in {table_dir}")
    return eligible[-1]


def snapshot_read(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    as_of_ts: float | None = None,
) -> DataFrame:
    """Scan the table at ``version`` (default: latest), or AS OF an
    epoch timestamp. A plain multi-path parquet read over the
    manifest's file-set — pushdown and pruning intact."""
    if version is not None and as_of_ts is not None:
        raise ValueError("pass version or as_of_ts, not both")
    versions = snapshot_versions(table_dir)
    if not versions:
        raise ValueError(f"no snapshots at {table_dir}")
    if as_of_ts is not None:
        version = snapshot_version_as_of(table_dir, as_of_ts)
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    dirs = _read_manifest(table_dir, v)["data_dirs"]
    return spark.read.parquet(*[os.path.join(table_dir, d) for d in dirs])


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Row-level diff between two table versions: per key, classify as
    ``inserted`` (key only in ``new``), ``deleted`` (only in ``old``),
    ``changed`` (both, payload differs) or ``unchanged``.

    Scale shape: each side is first reduced to ``(keys, fingerprint)``
    — ``xxhash64`` over the non-key columns — so the full-outer join
    ships 8-byte fingerprints instead of wide payloads, then one
    co-partitioned shuffle on the key. Fingerprint comparison is
    engine-internal only (never exposed in output), so hash semantics
    don't leak into results. This is the audit primitive behind
    "what did last night's merge actually change".
    """
    from pyspark.sql import functions as F

    payload = [c for c in new.columns if c not in keys]
    # keys-only table: membership is the whole payload — constant
    # fingerprint, so common keys classify as unchanged, never changed.
    fp = F.xxhash64(*payload) if payload else F.lit(0).cast("long")
    oldh = old.select(*keys, fp.alias("_h_old"))
    newh = new.select(*keys, fp.alias("_h_new"))
    change = (
        F.when(F.col("_h_old").isNull(), "inserted")
        .when(F.col("_h_new").isNull(), "deleted")
        .when(F.col("_h_old") != F.col("_h_new"), "changed")
        .otherwise("unchanged")
    )
    return (
        oldh.join(newh, keys, "full_outer")
        .select(*keys, change.alias("change_type"))
    )


def snapshot_diff_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-gated proof of the full snapshot mutation lifecycle plus
    version diff: commit a base version of ``events``, then a
    copy-on-write upsert (modify every ``event_id % 4 == 2`` row,
    insert the ``% 4 == 3`` rows), then a copy-on-write delete
    (``% 4 == 1``), and finally :func:`snapshot_diff` version 1 against
    the latest version. By construction the residue classes map exactly
    to change types (0→unchanged, 1→deleted, 2→changed, 3→inserted) —
    which is precisely what the oracle states, so a green row proves
    upsert, delete, time travel AND the diff classifier in one pass.
    """

    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    table_dir = scratch_dir("majs_snapdiff_")
    base = load_table(spark, "events", sf).select("event_id", "user_id", "value")
    m = F.col("event_id") % 4
    snapshot_append(base.where(m < 3), table_dir)  # v1: classes 0,1,2
    # v2 upsert: class-2 rows with a guaranteed-different payload, plus
    # the class-3 inserts (coalesce so NULL values still visibly change)
    changed = base.where(m == 2).withColumn(
        "value", F.coalesce(F.col("value"), F.lit(0.0)) + F.lit(1.0)
    )
    snapshot_upsert(changed.unionByName(base.where(m == 3)), table_dir, ["event_id"])
    snapshot_delete_where(spark, table_dir, "event_id % 4 = 1")  # v3
    diff = snapshot_diff(
        snapshot_read(spark, table_dir, version=1),
        snapshot_read(spark, table_dir),
        ["event_id"],
    )
    return (
        diff.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("event_id").cast("long").alias("sum_event_id"),
        )
        .orderBy("change_type")
    )


SNAPSHOT_DIFF_SQL = """
SELECT CASE event_id % 4
         WHEN 0 THEN 'unchanged'
         WHEN 1 THEN 'deleted'
         WHEN 2 THEN 'changed'
         ELSE 'inserted'
       END AS change_type,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(event_id) AS BIGINT) AS sum_event_id
FROM events
GROUP BY 1
ORDER BY change_type
"""


def snapshot_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-gated proof of the snapshot lifecycle: commit the even
    half of ``events`` (v1), append the odd half (v2), compact (v3) —
    then read every version *after all commits exist* and report exact
    per-version stats. v1's stats surviving v2/v3 IS time travel +
    snapshot isolation; v3 matching v2 proves compaction preserves
    content. Oracle: the same stats computed straight from the fixture.
    """

    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    table_dir = scratch_dir("majs_snapshots_")
    e = load_table(spark, "events", sf).select("event_id", "user_id", "value")
    snapshot_append(e.where(F.col("event_id") % 2 == 0), table_dir)
    snapshot_append(e.where(F.col("event_id") % 2 != 0), table_dir)
    snapshot_compact(spark, table_dir)

    out = None
    for v in snapshot_versions(table_dir):
        stats = snapshot_read(spark, table_dir, v).agg(
            F.lit(v).cast("long").alias("version"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("event_id").cast("long").alias("sum_event_id"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        out = stats if out is None else out.unionByName(stats)
    return out.orderBy("version")


SNAPSHOT_TIME_TRAVEL_SQL = """
SELECT 1 AS version,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events WHERE event_id % 2 = 0
UNION ALL
SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(event_id) AS BIGINT),
  CAST(COUNT(DISTINCT user_id) AS BIGINT)
FROM events
UNION ALL
SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(event_id) AS BIGINT),
  CAST(COUNT(DISTINCT user_id) AS BIGINT)
FROM events
ORDER BY version
"""


from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec  # noqa: E402

SNAPSHOT_QUERIES: dict[str, QuerySpec] = {
    "snapshot_time_travel": QuerySpec(snapshot_time_travel, SNAPSHOT_TIME_TRAVEL_SQL),
    "snapshot_diff_audit": QuerySpec(snapshot_diff_audit, SNAPSHOT_DIFF_SQL),
}
