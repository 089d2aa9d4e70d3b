"""Posting-index builder: the lake flattened into an inverted index.

The reference's lake is pre-tokenized into one Vertica table
``main_tokenized(tokenized, tableid, colid, rowid)`` (``handlers.py:15``,
``handlers.py:54``) by an external process it does not ship. Here the
index is *derived*: every string column of every lake table is unpivoted
(``stack``) into ``(key STRING, table INT, column INT, row BIGINT)``
rows, with ``key`` the normalized cell value
(:func:`..functions.text.normalize_col`) — one Catalyst plan, no
external DBMS.

Scale notes (100 TB design):

- the unpivot is a narrow map — no shuffle; normalization is native
  expressions inside whole-stage codegen;
- persisted via :func:`write_posting_index` the index is written
  partitioned/bucketed **by key**, so probe-time semi-joins prune files
  and co-locate without a shuffle;
- row identity is the table's own integer primary key, not
  ``monotonically_increasing_id`` — deterministic across partitionings
  and re-runs (the reference's ``rowid`` comes from its external
  tokenizer; SURVEY.md §2.11 calls for surrogate ids that survive
  re-partitioning).
"""

from __future__ import annotations

import weakref
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.functions.text import normalize_col, normalize_sql
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table


@dataclass(frozen=True)
class TableSpec:
    """One lake table's contribution to the posting index."""

    name: str
    table_id: int
    row_col: str  # integer primary-key column used as posting `row`
    string_cols: tuple[str, ...]  # indexed columns; position = `column` id


# Canonical lake for join search: the five TPC-H-ish dimension tables.
LAKE_TABLES: tuple[TableSpec, ...] = (
    TableSpec("region", 1, "r_regionkey", ("r_name",)),
    TableSpec("nation", 2, "n_nationkey", ("n_name",)),
    TableSpec("customer", 3, "c_custkey", ("c_name", "c_mktsegment")),
    TableSpec("supplier", 4, "s_suppkey", ("s_name",)),
    TableSpec("part", 5, "p_partkey", ("p_name", "p_brand", "p_type")),
)

# The FULL lake the driver fixture ships: the reference's data-lake
# story tokenizes EVERY lake table into main_tokenized
# (``handlers.py:15``), so join search must also discover joins into
# the document/event extension tables, not just the TPC-H dims. Every
# string column is indexed — including free-text ``documents.text``
# (whole-cell keys, exactly the reference's cell granularity) and JSON
# ``events.props``. ``embeddings`` has no string columns and so
# contributes no postings.
WIDE_LAKE_TABLES: tuple[TableSpec, ...] = LAKE_TABLES + (
    TableSpec("events", 6, "event_id", ("event_type", "props")),
    TableSpec("documents", 7, "doc_id", ("text", "lang", "source")),
)


def postings_for_table(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Unpivot one lake table into *raw* posting rows (narrow, shuffle-free).

    Emits ``(value, table, column, row)`` with the cell value still
    un-normalized: the normalizer expression is applied once above the
    union in :func:`build_posting_index`. Inlining it per column used to
    put ``n_tables × n_cols`` copies of the (large) normalizer tree into
    the plan, and Catalyst compile + codegen time dominated small-SF
    builds (~4x the runtime).
    """
    n = len(spec.string_cols)
    stack_args = ", ".join(
        f"CAST({cid} AS INT), `{c}`" for cid, c in enumerate(spec.string_cols)
    )
    return df.selectExpr(
        f"stack({n}, {stack_args}) AS (`column`, value)",
        f"CAST({spec.table_id} AS INT) AS `table`",
        f"CAST(`{spec.row_col}` AS BIGINT) AS `row`",
    )


def postings_from_df(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Normalized postings for ONE in-memory table slice — the
    streaming/micro-batch counterpart of :func:`build_posting_index`
    (which loads whole tables from a lake dir). Used by the streaming
    floored-index maintenance path, where each micro-batch of a landing
    table contributes its postings incrementally."""
    raw = postings_for_table(df, spec)
    return raw.select(
        normalize_col(F.col("value")).alias("key"), "table", "column", "row"
    ).filter(F.col("key") != "")


def build_posting_index(
    spark: SparkSession,
    sf_dir: str,
    specs: tuple[TableSpec, ...] = LAKE_TABLES,
    min_key_freq: int = 1,
) -> DataFrame:
    """The full inverted index as one lazy DataFrame.

    ``min_key_freq``: ingest-time frequency floor for wide-key lakes
    (SCALE.md §Round-8 refinement 2). A key appearing fewer than N
    times lake-wide is dropped — with the default 1, nothing is. The
    floor is a documented, bounded score change: a (table,row) match
    through a sub-floor key disappears, so join scores can only shrink,
    and a singleton free-text cell (the heaviest postings in the
    whole-lake index) could never have contributed more than a 1-match
    score anyway. Costs one extra ingest-time shuffle on ``key`` (a
    window count); probe-time plans are unchanged.
    """
    parts = [postings_for_table(load_table(spark, s.name, sf_dir), s) for s in specs]
    raw = reduce(DataFrame.unionByName, parts)
    idx = raw.select(
        normalize_col(F.col("value")).alias("key"), "table", "column", "row"
    ).filter(F.col("key") != "")
    if min_key_freq > 1:
        from pyspark.sql import Window

        idx = (
            idx.withColumn(
                "_f", F.count(F.lit(1)).over(Window.partitionBy("key"))
            )
            .filter(F.col("_f") >= min_key_freq)
            .drop("_f")
        )
    return idx


# Memoized persisted index per (session, sf_dir, specs) — the in-process
# analogue of the reference's parquet intermediate cache
# (``Par_Search.py:92-99,124-134``): repeated searches against the same
# lake reuse one materialized index instead of re-scanning/normalizing.
# Entries hold a weakref to their session and are purged on every call
# once that session is collected or stopped: a long-lived multi-session
# process neither accumulates dead persisted DataFrames nor — because
# CPython reuses object ids — serves a new session a DataFrame bound to
# a defunct one.
_INDEX_CACHE: dict[
    tuple[int, str, tuple[TableSpec, ...]],
    tuple["weakref.ref[SparkSession]", DataFrame],
] = {}


def _session_stopped(spark: SparkSession) -> bool:
    try:
        return spark._jsparkSession.sparkContext().isStopped()
    except Exception:  # py4j gateway gone => session is dead
        return True


def session_cached(cache: dict, spark: SparkSession, key_suffix: tuple, build):
    """Session-scoped memoization, the ONE implementation behind
    `_INDEX_CACHE`, `similarity._IVF_CACHE`, and `graph._EDGE_CACHE`:
    sweep entries whose session died or stopped (the weakref guards the
    CPython id-reuse hazard documented above `_INDEX_CACHE`), key on
    (id(session), *suffix), call ``build()`` on a miss and remember the
    result for the session's lifetime."""
    for k, (ref, _v) in list(cache.items()):
        sess = ref()
        if sess is None or _session_stopped(sess):
            cache.pop(k, None)
    key = (id(spark),) + tuple(key_suffix)
    hit = cache.get(key)
    if hit is not None:
        return hit[1]
    val = build()
    cache[key] = (weakref.ref(spark), val)
    return val


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` and truncate its lineage — the ONE
    implementation behind every shared-cache checkpoint in the engine
    (posting index, near-dup edge set, IVF assignments).

    ``localCheckpoint`` trades fault tolerance for plan size: the
    blocks are UNREPLICATED executor-local state with lineage gone, so
    on a real cluster (executor loss, dynamic allocation shrink) every
    downstream query fails permanently instead of recomputing. That
    trade is correct in local mode — one JVM, no executor churn — but
    at cluster scale a durable form is MANDATORY, not optional: set
    ``sc.setCheckpointDir(<reliable store>)`` and this helper upgrades
    to a reliable ``checkpoint()`` (HDFS/object-store backed, survives
    executor loss), or persist the artifact outright
    (`write_posting_index`, the bucketed on-disk form).
    """
    try:
        has_dir = df.sparkSession.sparkContext.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    return df.checkpoint(eager=True) if has_dir else df.localCheckpoint()


def cached_posting_index(
    spark: SparkSession,
    sf_dir: str,
    specs: tuple[TableSpec, ...] = LAKE_TABLES,
    min_key_freq: int = 1,
) -> DataFrame:
    return session_cached(
        _INDEX_CACHE,
        spark,
        (sf_dir, specs, min_key_freq),
        # truncate_lineage, not persist: the cached frame is joined by
        # every search-stage query, and persist alone carries the whole
        # union-of-melts logical plan into each consumer's analysis
        # (the r6 graph-tier lesson, `operators/graph.py:_candidate_edges`
        # — measured ~0.7s of Catalyst re-analysis per flagship search
        # at sf0.1). Checkpointing truncates the lineage to a scan of
        # the materialized partitions; at warehouse scale the durable
        # form of the same idea is `write_posting_index` (a bucketed
        # table on disk). See truncate_lineage for the cluster
        # durability contract.
        lambda: truncate_lineage(
            build_posting_index(spark, sf_dir, specs, min_key_freq)
        ),
    )


def write_posting_index(
    spark: SparkSession,
    sf_dir: str,
    out_table: str = "posting_index",
    buckets: int = 32,
    specs: tuple[TableSpec, ...] = LAKE_TABLES,
    hashed_keys: bool = False,
    min_key_freq: int = 1,
) -> None:
    """Persist the index bucketed by ``key``.

    Probe joins on ``key`` against a bucketed index avoid the index-side
    shuffle entirely — the scan reads only the buckets the keys hash to.

    ``hashed_keys=True`` writes the fixed-width layout: an extra
    ``key_h = xxhash64(key)`` column, with bucketing+sort on ``key_h``,
    so the bucketed write sorts 8 bytes/row regardless of cell width.
    The raw ``key`` column stays — verification and column attribution
    remain exact string lookups, so a 64-bit collision can only admit
    a false CANDIDATE (discarded at the verify stage), never a wrong
    result; the search detects the layout from the schema and probes
    on the hash automatically.

    When to use which (measured at ×10 wide-key volume, SCALE.md
    §Round-9 / ``sf1_probe_widekey.json``): PLAIN is the default for
    probe-dominated workloads at ANY key width — with a broadcast
    semi-join probe the index side never shuffles in either layout, so
    the hash saves nothing at probe time while its scan reads an extra
    column (wide-key probe measured 1.13× slower hashed). HASHED wins
    at ingest (bucketed build 1.6× faster — the write sorts fixed-width
    hashes, not wide strings) and when the probe side exceeds broadcast
    scale, where the 8-byte key narrows a real shuffle.
    """
    # An in-memory catalog forgets managed tables across sessions but
    # their warehouse directory survives, and saveAsTable then refuses
    # with LOCATION_ALREADY_EXISTS; drop both the catalog entry and any
    # stale location before writing.
    spark.sql(f"DROP TABLE IF EXISTS `{out_table}`")
    from multi_attribute_join_search_with_mapreduce_spark import fsio

    fsio.delete(
        spark,
        f"{spark.conf.get('spark.sql.warehouse.dir').rstrip('/')}/"
        f"{out_table.lower()}",
    )
    idx = build_posting_index(spark, sf_dir, specs, min_key_freq)
    bucket_col = "key"
    if hashed_keys:
        idx = idx.withColumn("key_h", F.xxhash64("key"))
        bucket_col = "key_h"
    (
        idx.write.mode("overwrite")
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(out_table)
    )


def append_posting_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    specs: tuple[TableSpec, ...],
) -> None:
    """Incrementally extend a persisted parquet index (the CLI's
    ``--write-index`` layout) with newly-landed lake tables.

    Index maintenance at scale is append-only: a new table contributes
    ``parquet.mode("append")`` files built from one narrow unpivot pass
    over just that table — the existing index is never rescanned or
    rewritten (the reference rebuilds its whole parquet intermediate,
    ``Par_Search.py:124-134``). Callers own spec disjointness: appending
    a table id that is already present would duplicate its postings.

    Deliberately NO ``min_key_freq`` here: the floor is a LAKE-WIDE
    frequency predicate, and an append sees only the new table — a key
    below the floor in the new table alone may cross it once combined
    with the existing index (and vice versa). Applying the floor
    per-append would silently diverge from the rebuild semantics the
    incremental gate (``mjs_index_incremental``) proves. For a floored
    index that MUST stay floored under appends, use
    :func:`write_floored_index` + :func:`append_floored_index` — the
    index+residual store that keeps the sub-floor postings as
    bookkeeping and moves keys across exactly when their lake-wide
    frequency crosses the floor (gated by
    ``mjs_index_incremental_floored``).
    """
    build_posting_index(spark, sf_dir, specs).write.mode("append").parquet(index_dir)


def write_store_meta(spark: SparkSession, base_dir: str, meta: dict) -> None:
    """Persist the floored store's layout parameters, landed-table log,
    commit version, and landed-batch log as
    ``<base_dir>/_store_meta.json``, via temp-sibling + atomic rename
    (`fsio.write_atomic`, ADVICE r10) — a reader racing a rewrite, or a
    crash mid-write, sees the old or the new complete metadata, never a
    torn file. Written LAST by :func:`write_floored_index` — the
    metadata doubles as the build's commit marker: a crash mid-build
    leaves no metadata and :func:`append_floored_index` refuses the
    store loudly rather than appending onto a torn half-build. For
    appends the rename is the COMMIT POINT of the whole protocol: the
    version bump, the landed-table entries, and (streaming) the
    landed-batch marker all land in one atomic replace."""
    import json

    from multi_attribute_join_search_with_mapreduce_spark import fsio

    fsio.write_atomic(
        spark,
        f"{base_dir}/_store_meta.json",
        json.dumps(meta, indent=1, sort_keys=True).encode(),
    )


def read_store_meta(spark: SparkSession, base_dir: str) -> dict | None:
    """Read a floored store's ``_store_meta.json``; None if absent
    (a pre-metadata store, or a build that crashed before commit)."""
    import json

    from multi_attribute_join_search_with_mapreduce_spark import fsio

    data = fsio.read_bytes(spark, f"{base_dir}/_store_meta.json")
    return None if data is None else json.loads(data.decode())


class ConcurrentAppendError(RuntimeError):
    """An append lost the store's optimistic-concurrency race (another
    writer claimed the commit slot first) or found an unresolved
    earlier commit (a concurrent writer mid-append, or a crash nothing
    has recovered yet). The store itself is untouched by the loser;
    resolve with :func:`recover_floored_store` (CLI:
    ``--fsck-store <dir> --repair``) and retry."""


# fsck --repair keeps this many most-recent commit markers as the audit
# tail; older ones are GC'd (pending/claim logic reads only version+1).
_COMMIT_LOG_RETAIN = 64


def _commit_marker(base_dir: str, version: int) -> str:
    return f"{base_dir}/_commits/v{version:020d}.json"


def _commit_stage(base_dir: str, version: int) -> str:
    return f"{base_dir}/_stage/v{version:020d}"


def claim_commit(
    spark: SparkSession, base_dir: str, version: int, payload: dict
) -> bool:
    """Atomically claim commit slot ``version`` of a floored store
    (create-if-absent of ``_commits/v{version}.json`` —
    `fsio.create_exclusive`). Exactly one of any number of concurrent
    claimants wins; the marker is the fence that makes
    :func:`append_floored_index` safe under concurrency AND the
    crash-evidence :func:`recover_floored_store` resolves: a marker
    with ``version > meta["version"]`` is an append that claimed its
    slot but never committed. Markers at or below the metadata version
    are the store's commit log and are kept."""
    import json

    from multi_attribute_join_search_with_mapreduce_spark import fsio

    return fsio.create_exclusive(
        spark,
        _commit_marker(base_dir, version),
        json.dumps(dict(payload, version=version), sort_keys=True).encode(),
    )


def pending_commit(spark: SparkSession, base_dir: str, meta: dict) -> dict | None:
    """The unresolved commit marker (version ``meta["version"] + 1``)
    if one exists, else None. Appends refuse to start while one is
    pending, so at most one commit can ever be in flight — which is
    what makes recovery's state analysis sound. A torn/unparseable
    marker (crash mid-claim) still counts as pending; recovery rolls
    it back without needing its content."""
    import json

    from multi_attribute_join_search_with_mapreduce_spark import fsio

    version = int(meta.get("version", 0)) + 1
    data = fsio.read_bytes(spark, _commit_marker(base_dir, version))
    if data is None:
        return None
    try:
        info = json.loads(data.decode())
        if not isinstance(info, dict):
            info = {}
    except ValueError:
        info = {}  # torn claim: pending, content unknown
    info["version"] = version
    return info


def _read_parquet_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """``spark.read.parquet`` that treats ONLY path-missing /
    schema-uninferable (row-less dir) as "no data yet" — corrupt files,
    transient FS errors, and permission failures re-raise so an append
    never silently proceeds as if the store were empty while the real
    rows survive on disk (ADVICE r9)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        cond = ""
        for probe in ("getCondition", "getErrorClass"):
            try:
                cond = getattr(exc, probe)() or ""
                break
            except Exception:
                continue
        text = f"{cond} {exc}"
        if (
            "PATH_NOT_FOUND" in text
            or "UNABLE_TO_INFER_SCHEMA" in text
            or "Path does not exist" in text
            or "Unable to infer schema" in text
        ):
            return None
        raise


def write_floored_index(
    spark: SparkSession,
    sf_dir: str,
    base_dir: str,
    specs: tuple[TableSpec, ...],
    min_key_freq: int,
    residual_buckets: int = 32,
    hashed_keys: bool = False,
) -> None:
    """The append-maintainable form of the frequency-floored index.

    ``build_posting_index(..., min_key_freq=N)`` applies a LAKE-WIDE
    floor, which a plain :func:`append_posting_index` cannot maintain
    (the append sees only the new table; a key below the floor in the
    new table alone may cross it once combined with what the lake
    already holds). This writer keeps the information the floor needs:

    - ``<base_dir>/index`` — postings of keys at/above the floor (what
      queries read);
    - ``<base_dir>/residual`` — postings of keys still below the floor,
      hash-partitioned into ``residual_buckets`` directories by
      ``kb = pmod(xxhash64(key), B)`` so an append rewrites only the
      buckets its keys hash to (dynamic partition overwrite), never the
      whole store.

    Invariant: every key's postings live wholly in ``index`` (lake-wide
    freq >= N) or wholly in ``residual`` (freq < N); their union is the
    unfloored index. The residual is the floor's bookkeeping, bounded by
    the sub-floor slice (at sf0.1×10 measured 15 % of postings —
    exactly the singleton free-text cells the floor exists to keep out
    of the probe path).

    ``hashed_keys=True`` gives the QUERYABLE index half the fixed-width
    layout (``key_h = xxhash64(key)`` alongside the raw key; the search
    probes on the hash automatically) — coherent here because the
    floored store is the ingest-bound form, exactly where the hashed
    layout measured ahead (SCALE.md §Round-9). The residual half stays
    plain: it is append-time bookkeeping probed by raw key only.
    """
    from pyspark.sql import Window

    raw = build_posting_index(spark, sf_dir, specs)
    tagged = raw.withColumn(
        "_f", F.count(F.lit(1)).over(Window.partitionBy("key"))
    )
    # Two writers (index half + residual half) consume the tagged frame;
    # without the checkpoint each write re-runs the whole unpivot +
    # key-window shuffle (Spark reuses exchanges within one job, not
    # across two write actions). Materializing once nearly halves the
    # build; on a cluster truncate_lineage upgrades to a reliable
    # checkpoint when a checkpoint dir is set (see its docstring) — or
    # skip the floor entirely at ingest and use append_floored_index's
    # incremental path, which is the production shape anyway.
    tagged = truncate_lineage(tagged)
    above = tagged.filter(F.col("_f") >= min_key_freq).drop("_f")
    if hashed_keys:
        above = above.withColumn("key_h", F.xxhash64("key"))
    # The index half is partitioned by COMMIT VERSION (`cv`): every
    # append lands its postings under its own cv= directory, so rolling
    # back a torn append (recover_floored_store) is one directory
    # delete instead of a full index rewrite — and readers that want
    # the clean posting schema go through read_floored_index, which
    # drops the bookkeeping column.
    above.withColumn("cv", F.lit(1)).write.partitionBy("cv").mode(
        "error"
    ).parquet(f"{base_dir}/index")
    (
        tagged.filter(F.col("_f") < min_key_freq)
        .drop("_f")
        .withColumn("kb", F.pmod(F.xxhash64("key"), F.lit(residual_buckets)))
        .write.partitionBy("kb")
        .mode("error")
        .parquet(f"{base_dir}/residual")
    )
    # metadata LAST = the build's commit marker (see write_store_meta).
    # residual_buckets/hashed_keys persist so appends can never run
    # under a different modulus or layout than the store was written
    # with (ADVICE r9: a mismatched bucket count would delete the wrong
    # kb= directories); landed table ids make re-appends detectable.
    write_store_meta(
        spark,
        base_dir,
        {
            "min_key_freq": min_key_freq,
            "residual_buckets": residual_buckets,
            "hashed_keys": hashed_keys,
            "version": 1,
            "landed_tables": sorted(
                [s.name, s.table_id] for s in specs
            ),
        },
    )


def read_floored_index(spark: SparkSession, base_dir: str) -> DataFrame:
    """The queryable half of a floored store, with the commit-version
    bookkeeping column dropped — what searches should read."""
    df = spark.read.parquet(f"{base_dir}/index")
    return df.drop("cv") if "cv" in df.columns else df


def append_floored_index(
    spark: SparkSession,
    sf_dir: str,
    base_dir: str,
    new_specs: tuple[TableSpec, ...],
    min_key_freq: int | None = None,
    residual_buckets: int | None = None,
) -> None:
    """Extend a :func:`write_floored_index` store with newly-landed
    tables while maintaining the lake-wide frequency floor EXACTLY —
    the maintained ``index`` equals a full floored rebuild (gated by
    ``mjs_index_incremental_floored`` and
    ``tests/test_floored_index.py``).

    Work is bounded by O(new postings + residual postings of touched
    buckets + one pruned probe of the index's key set) — the existing
    index is appended to, never rewritten, and the residual store is
    rewritten only in the hash buckets the new keys touch (dynamic
    partition overwrite). Cases per new key:

    - already in ``index`` (lake freq was >= N): its new postings
      append directly — the floor can only hold harder;
    - else, combine the new postings with the key's residual rows: at
      >= N the key CROSSES — all its postings move to ``index`` and
      leave ``residual``; below N it stays residual.

    Callers own spec disjointness (same contract as
    :func:`append_posting_index`) and, on a metadata-carrying store,
    the engine ENFORCES it: a table id/name already in the store's
    landed log raises instead of silently double-counting its postings
    toward the floor. Layout parameters (``min_key_freq``,
    ``residual_buckets``, ``hashed_keys``) are read from the store's
    own metadata; caller-supplied values are validated against it and
    a conflict raises — an append under a different bucket modulus
    would delete the wrong ``kb=`` directories (ADVICE r9). Pass None
    (the default) to just use the store's parameters. Pre-metadata
    stores fall back to the caller's values (both then required).

    Concurrency + crash contract (metadata-carrying stores): each
    append runs under the store's COMMIT PROTOCOL. It first checks for
    an unresolved earlier commit (refusing with
    :class:`ConcurrentAppendError` — retrying into a torn store is
    exactly how postings used to double-land, ADVICE r10), then
    atomically claims the next commit slot (``_commits/v{N+1}.json``
    via create-if-absent): of any number of concurrent appenders,
    exactly one proceeds and the losers raise with the store untouched.
    The mutation lands its index postings under ``cv={N+1}`` and stages
    its residual rewrite on disk before swapping, so a crash at ANY
    point is recoverable by :func:`recover_floored_store` — roll
    forward once the staged rewrite is durable, bytewise roll back
    before that — and the final metadata rename (version + landed
    tables in one atomic replace) is the commit point. Queries stay
    correct throughout: they read only ``index``, whose committed
    ``cv=`` directories are never touched by an in-flight append.
    """
    meta = read_store_meta(spark, base_dir)
    if meta is not None:
        for name, given in (
            ("min_key_freq", min_key_freq),
            ("residual_buckets", residual_buckets),
        ):
            if given is not None and given != meta[name]:
                raise ValueError(
                    f"append_floored_index: {name}={given} conflicts with "
                    f"the store's written {name}={meta[name]} ({base_dir})"
                )
        min_key_freq = meta["min_key_freq"]
        residual_buckets = meta["residual_buckets"]
        landed_ids = {tid for _n, tid in meta["landed_tables"]}
        landed_names = {n for n, _tid in meta["landed_tables"]}
        dup = sorted(
            s.name for s in new_specs
            if s.table_id in landed_ids or s.name in landed_names
        )
        if dup:
            raise ValueError(
                f"append_floored_index: tables already landed in the "
                f"store: {dup} — re-appending would double-count their "
                f"postings toward the floor ({base_dir})"
            )
        if "version" not in meta:
            # r9/r10-era store: metadata but FLAT index layout and no
            # commit version. Writing cv= partitions into a flat
            # directory would corrupt it for every subsequent read
            # ("conflicting directory structures"), so these stores
            # keep the legacy unfenced append path exactly as shipped
            # (landed-table log still enforced above). Rebuild with
            # write_floored_index to adopt the commit protocol.
            append_floored_postings(
                spark,
                build_posting_index(spark, sf_dir, new_specs),
                base_dir,
                min_key_freq,
                residual_buckets,
                hashed=meta["hashed_keys"],
            )
            meta["landed_tables"] = sorted(
                meta["landed_tables"]
                + [[s.name, s.table_id] for s in new_specs]
            )
            write_store_meta(spark, base_dir, meta)
            return
        version = int(meta["version"])
        pend = pending_commit(spark, base_dir, meta)
        if pend is not None:
            raise ConcurrentAppendError(
                f"append_floored_index: store {base_dir} has an "
                f"unresolved commit v{pend['version']} "
                f"(tables={pend.get('tables')}, "
                f"batch_id={pend.get('batch_id')}): either a concurrent "
                "appender is mid-commit, or a previous append crashed. "
                "Run recover_floored_store (CLI: --fsck-store <dir> "
                "--repair) before retrying — retrying blindly is what "
                "used to double-land postings."
            )
    else:
        if min_key_freq is None:
            raise ValueError(
                "append_floored_index: store has no _store_meta.json "
                "(pre-metadata store or torn build); min_key_freq must "
                "be supplied explicitly"
            )
        if residual_buckets is None:
            residual_buckets = 32
    new_p = build_posting_index(spark, sf_dir, new_specs)
    if meta is None:
        # Pre-metadata store: no fencing is possible (nothing to CAS
        # against) — legacy single-writer contract, unchanged.
        append_floored_postings(
            spark, new_p, base_dir, min_key_freq, residual_buckets, hashed=None
        )
        return
    tables = sorted([s.name, s.table_id] for s in new_specs)
    next_v = version + 1
    # Optimistic-concurrency claim (VERDICT r10 #1): of two appenders
    # that both read version N and both passed the landed-tables check,
    # exactly one creates _commits/v{N+1}.json; the loser raises with
    # the store untouched. An appender holding a STALE meta (a winner
    # committed N+1 meanwhile) also loses here — rereading fresh meta
    # is the retry path, and the landed-tables check then catches any
    # overlap.
    if not claim_commit(spark, base_dir, next_v, {"tables": tables}):
        raise ConcurrentAppendError(
            f"append_floored_index: lost the commit race for v{next_v} "
            f"on {base_dir} — a concurrent appender claimed the slot "
            "first (or this appender's metadata is stale). Re-read the "
            "store and retry."
        )
    append_floored_postings(
        spark,
        new_p,
        base_dir,
        min_key_freq,
        residual_buckets,
        hashed=meta["hashed_keys"],
        commit_version=next_v,
        commit_payload={"tables": tables},
    )
    _require_live_claim(spark, base_dir, next_v)
    meta["version"] = next_v
    meta["landed_tables"] = sorted(meta["landed_tables"] + tables)
    # one atomic rename = the commit point (version + landed log together)
    write_store_meta(spark, base_dir, meta)
    from multi_attribute_join_search_with_mapreduce_spark import fsio

    fsio.delete(spark, _commit_stage(base_dir, next_v))  # post-commit GC


def _require_live_claim(spark: SparkSession, base_dir: str, version: int) -> None:
    """Abort an in-flight append whose claim marker has vanished —
    i.e. `recover_floored_store` was run against this commit while the
    appender was still alive (the marker cannot distinguish a crashed
    claimant from a slow one, so recovery's contract is "run it only
    when the claimant is known dead"; this check turns the operator
    error of running it early into a LOUD abort instead of a silent
    lost-update). Checked at the two points of no return: before the
    residual-bucket swap (the first store mutation the rollback cannot
    undo) and before the metadata commit. The recovery already rolled
    the store back; the aborting appender just stops committing on top
    of it."""
    from multi_attribute_join_search_with_mapreduce_spark import fsio

    if not fsio.exists(spark, _commit_marker(base_dir, version)):
        raise ConcurrentAppendError(
            f"append v{version} on {base_dir}: the commit claim was "
            "revoked mid-append (recover_floored_store ran while this "
            "appender was live — it must only run when the claimant is "
            "known dead). The recovery rolled the store back; this "
            "append is aborted WITHOUT committing. Clean up any "
            f"re-created cv={version} index directory via fsck --repair "
            "and re-run the append."
        )


def append_floored_postings(
    spark: SparkSession,
    new_postings: DataFrame,
    base_dir: str,
    min_key_freq: int,
    residual_buckets: int,
    hashed: bool | None = None,
    commit_version: int | None = None,
    commit_payload: dict | None = None,
) -> None:
    """The posting-level core of :func:`append_floored_index`: land an
    arbitrary batch of (key, table, column, row) postings into the
    index+residual store, keeping the lake-wide floor exact. Callers
    own batch disjointness (the table-level wrapper enforces it via the
    landed-table log; the streaming path via per-batch replay markers).
    ``hashed=None`` detects the layout from the index's columns.

    ``commit_version`` (the slot the caller claimed via
    :func:`claim_commit`) makes the mutation RECOVERABLE: the index
    postings land under ``cv={version}`` so a torn append rolls back
    with one directory delete, and the residual rewrite is staged under
    ``_stage/v{version}`` where :func:`recover_floored_store` can find
    it. ``commit_payload`` (tables / batch_id) rides inside the stage's
    ``_COMPLETE`` flag so roll-forward can finalize the metadata even
    if the claim marker itself tore. Without a commit version (legacy
    pre-metadata stores) the rewrite is still staged on disk before any
    old bucket is deleted — ADVICE r10: executor-memory staging would
    lose the carried-over rows of untouched keys on any failure after
    the deletes — but a crash then leaves the flat-layout store to the
    NEXT append's self-repair anti-join instead of exact recovery."""
    from pyspark.sql import Window

    index_dir, residual_dir = f"{base_dir}/index", f"{base_dir}/residual"
    new_p = truncate_lineage(new_postings)
    index = _read_parquet_or_none(spark, index_dir)
    if index is None:
        # an initial build where EVERY key sat below the floor writes a
        # row-less index (schema uninferable); treat as the empty index.
        index = spark.createDataFrame([], new_p.schema)
    residual = _read_parquet_or_none(spark, residual_dir)
    if residual is None or "kb" not in residual.columns:
        # an all-above-floor initial build writes an empty residual
        # (no kb= partition dirs): treat as the empty store
        residual = (
            spark.createDataFrame([], new_p.schema)
            .withColumn("kb", F.lit(0).cast("bigint"))
        )
    touched = new_p.select("key").distinct()

    # keys already at/above the floor: one broadcast-semi probe of the
    # index's key set (bucket/partition-pruned on a bucketed layout)
    idx_keys = (
        index.join(F.broadcast(touched), "key", "left_semi").select("key").distinct()
    )
    idx_keys = truncate_lineage(idx_keys)
    new_to_index = new_p.join(F.broadcast(idx_keys), "key", "left_semi")
    new_rest = new_p.join(F.broadcast(idx_keys), "key", "left_anti")

    # candidates: the new sub-probe postings plus the touched keys'
    # residual rows — lake-wide frequency for these keys is exactly
    # count(candidates) by the store invariant. The anti-join against
    # idx_keys is the self-repair path for the partial-failure mode
    # documented above: a key left in BOTH halves by an interrupted
    # append contributes its index rows only (no double count), and
    # the bucket rewrite below drops its stale residual rows.
    res_touched = (
        residual.join(F.broadcast(touched), "key", "left_semi")
        .join(F.broadcast(idx_keys), "key", "left_anti")
        .select(*new_p.columns)
    )
    cands = new_rest.unionByName(res_touched).withColumn(
        "_f", F.count(F.lit(1)).over(Window.partitionBy("key"))
    )
    crossing = cands.filter(F.col("_f") >= min_key_freq).drop("_f")
    staying = cands.filter(F.col("_f") < min_key_freq).drop("_f")

    to_index = new_to_index.unionByName(crossing)
    if hashed is None:
        hashed = "key_h" in index.columns
    if hashed:  # hashed-layout store: keep it uniform
        to_index = to_index.withColumn("key_h", F.xxhash64("key"))
    if "cv" in index.columns and commit_version is None:
        raise ValueError(
            "append_floored_postings: store has the commit-versioned "
            "index layout (cv= partitions); appends must go through the "
            "commit protocol (claim_commit + commit_version) — a flat "
            "append would corrupt the layout"
        )
    if commit_version is not None:
        to_index = to_index.withColumn("cv", F.lit(int(commit_version)))
        to_index.write.partitionBy("cv").mode("append").parquet(index_dir)
    else:
        to_index.write.mode("append").parquet(index_dir)

    # rewrite ONLY the residual buckets the touched keys hash to; rows
    # of untouched keys sharing those buckets are carried over. The
    # rewrite is staged TO DISK under _stage/ before any old bucket is
    # deleted (ADVICE r10 — memory-staged blocks would lose carried
    # rows on executor failure after the deletes), then swapped in per
    # bucket. Touched buckets whose every key crossed the floor have no
    # staged output and are delete-only — dynamic partition overwrite
    # could not express that (it only replaces partitions PRESENT in
    # the output) and would break the disjointness invariant.
    touched_kb = touched.select(
        F.pmod(F.xxhash64("key"), F.lit(residual_buckets)).alias("kb")
    ).distinct()
    keep = (
        residual.join(F.broadcast(touched_kb), "kb", "left_semi")
        .join(F.broadcast(touched), "key", "left_anti")
        .select(*new_p.columns)
    )
    rewrite = keep.unionByName(staying).withColumn(
        "kb", F.pmod(F.xxhash64("key"), F.lit(residual_buckets))
    )
    kb_list = [int(r["kb"]) for r in touched_kb.collect()]  # bounded by B
    import uuid as _uuid

    stage = (
        _commit_stage(base_dir, commit_version)
        if commit_version is not None
        else f"{base_dir}/_stage/tmp-{_uuid.uuid4().hex}"
    )
    _stage_residual_rewrite(
        spark,
        base_dir,
        stage,
        rewrite,
        kb_list,
        commit_payload,
        cleanup=commit_version is None,
        commit_version=commit_version,
    )


def _stage_residual_rewrite(
    spark: SparkSession,
    base_dir: str,
    stage: str,
    rewrite: DataFrame,
    kb_list: list[int],
    commit_payload: dict | None = None,
    cleanup: bool = True,
    commit_version: int | None = None,
) -> None:
    """Materialize the residual-bucket rewrite under ``stage``, flag it
    complete (with the kb swap-lists + the commit payload, so recovery
    is self-describing even if the claim marker tore), and swap the
    staged buckets into place. Each step is idempotent / resumable —
    :func:`recover_floored_store` re-enters at the swap.

    ``cleanup=False`` (the commit-protocol path) leaves the stage on
    disk: the ``_COMPLETE`` flag is the roll-FORWARD evidence, and it
    must survive until the metadata rename commits — deleting it
    earlier would make a crash in the swap-done→finalize window look
    like a pre-stage crash, and rolling that back cannot restore the
    already-swapped residual buckets (postings of crossing keys would
    vanish from both halves). The committing caller deletes the stage
    AFTER its metadata rename; fsck garbage-collects stages of
    already-committed versions that a crash right after the rename
    left behind."""
    import json

    from multi_attribute_join_search_with_mapreduce_spark import fsio

    rewrite.write.partitionBy("kb").mode("error").parquet(f"{stage}/residual")
    staged = {
        int(name.split("=", 1)[1])
        for name in fsio.listdir(spark, f"{stage}/residual")
        if name.startswith("kb=")
    }
    flag = dict(commit_payload or {})
    flag["kb_replace"] = sorted(staged)
    flag["kb_delete"] = sorted(set(kb_list) - staged)
    if commit_version is not None:
        # point of no return: past here the residual swap mutates
        # shared state a rollback cannot restore — abort now if the
        # claim was revoked by a mid-flight recovery (see
        # _require_live_claim)
        _require_live_claim(spark, base_dir, commit_version)
    fsio.write_atomic(spark, f"{stage}/_COMPLETE", json.dumps(flag).encode())
    _finish_residual_swap(spark, base_dir, stage, flag)
    if cleanup:
        fsio.delete(spark, stage)


def _finish_residual_swap(
    spark: SparkSession, base_dir: str, stage: str, flag: dict
) -> None:
    """Swap staged residual buckets into place. Resumable: delete-only
    buckets re-delete (no-op), replace buckets are skipped once their
    staged directory is gone (i.e. already swapped) — so a crash at any
    point mid-swap is finished by running this again."""
    from multi_attribute_join_search_with_mapreduce_spark import fsio

    residual_dir = f"{base_dir}/residual"
    fsio.mkdirs(spark, residual_dir)
    for kb in flag.get("kb_delete", []):
        fsio.delete(spark, f"{residual_dir}/kb={kb}")
    for kb in flag.get("kb_replace", []):
        src = f"{stage}/residual/kb={kb}"
        if not fsio.exists(spark, src):
            continue  # already swapped by a previous attempt
        fsio.delete(spark, f"{residual_dir}/kb={kb}")
        if not fsio.rename(spark, src, f"{residual_dir}/kb={kb}"):
            raise IOError(
                f"residual swap: rename {src} -> {residual_dir}/kb={kb} failed"
            )


def recover_floored_store(spark: SparkSession, base_dir: str) -> dict:
    """Resolve an interrupted append on a commit-protocol floored store
    (the pending marker :func:`pending_commit` reports), restoring the
    store to a committed, invariant-clean state. Decision rule, from
    the durable evidence the protocol leaves behind:

    - stage ``_COMPLETE`` flag present → the index append finished and
      the residual rewrite is fully materialized on disk: **roll
      forward** — finish the (resumable) bucket swap, finalize the
      metadata from the payload the flag carries (landed tables /
      batch id + version), exactly as the crashed appender would have.
    - no ``_COMPLETE`` flag → the append died before its rewrite was
      durable: **roll back** — delete the partial stage and the torn
      append's ``cv={version}`` index directory (every posting the
      append landed, including the re-filed residual copies of
      crossing keys, lives there and nowhere else; the residual half
      is untouched before the swap starts), then release the claim
      marker so a retry can re-claim the slot. The store is bytewise
      back to its pre-append state.

    Idempotent and itself crash-safe: every step re-runs cleanly, and
    re-invoking on a healthy store is a no-op (``action: "none"``).
    Returns ``{"action": "none" | "rolled_forward" | "rolled_back",
    "version": ...}``.
    """
    import json

    from multi_attribute_join_search_with_mapreduce_spark import fsio

    meta = read_store_meta(spark, base_dir)
    if meta is None:
        raise ValueError(
            f"recover_floored_store: {base_dir} has no _store_meta.json "
            "(pre-metadata store or torn initial build — nothing to "
            "recover; rebuild with write_floored_index)"
        )
    pend = pending_commit(spark, base_dir, meta)
    if pend is None:
        return {"action": "none", "version": int(meta.get("version", 0))}
    v = pend["version"]
    stage = _commit_stage(base_dir, v)
    flag_raw = fsio.read_bytes(spark, f"{stage}/_COMPLETE")
    flag = None
    if flag_raw is not None:
        try:
            flag = json.loads(flag_raw.decode())
        except ValueError:
            flag = None  # torn flag: the stage is not trustworthy
    if flag is not None:
        _finish_residual_swap(spark, base_dir, stage, flag)
        # stage is deleted only AFTER the metadata rename below: the
        # _COMPLETE flag is the roll-forward evidence, and a crash
        # inside this very recovery must still roll forward on retry.
        if flag.get("tables"):
            meta["landed_tables"] = sorted(
                meta["landed_tables"] + [list(t) for t in flag["tables"]]
            )
        if flag.get("batch_id") is not None:
            meta["landed_batches"] = sorted(
                set(meta.get("landed_batches", [])) | {int(flag["batch_id"])}
            )
        meta["version"] = v
        write_store_meta(spark, base_dir, meta)
        fsio.delete(spark, stage)
        return {"action": "rolled_forward", "version": v}
    # roll back: the cv= directory holds exactly the torn append's rows
    fsio.delete(spark, f"{base_dir}/index/cv={v}")
    fsio.delete(spark, f"{base_dir}/index/_temporary")  # aborted-job debris
    fsio.delete(spark, stage)
    fsio.delete(spark, _commit_marker(base_dir, v))
    return {"action": "rolled_back", "version": int(meta.get("version", 0))}


def fsck_floored_store(
    spark: SparkSession, base_dir: str, repair: bool = False
) -> dict:
    """Invariant check (and optional repair) for a floored store — the
    fsck completing the partial-failure contract `append_floored_index`
    documents: an append interrupted between its index write and its
    residual rewrite leaves crossing keys in BOTH halves. Queries stay
    correct (index is authoritative and complete), the NEXT append that
    touches such a key repairs it for free, and this tool repairs the
    ones nothing touches.

    Checks, each O(store) with key-level aggregates:

    - ``double_represented_keys`` — keys present in both halves
      (disjointness violation; the known crash artifact). With
      ``repair=True`` their residual rows are dropped — the index side
      is authoritative by the append ordering — rewriting ONLY the
      residual buckets those keys hash to.
    - ``subfloor_in_index`` / ``overfloor_in_residual`` — keys whose
      own-half frequency contradicts the floor. Unreachable from this
      module's code paths (reported, never auto-repaired: they imply
      external mutation, and moving rows on that evidence could lose
      data).
    - ``duplicate_postings`` — (key, table, column, row) tuples with
      multiplicity > 1 in the index half. A posting is one cell of one
      lake row, unique by construction, so ANY multiplicity means the
      same batch landed twice (the replay artifact ADVICE r10 flagged;
      the commit protocol prevents it going forward, this makes it
      detectable on any store). Reported, never auto-repaired here —
      ``recover_floored_store`` is the sanctioned path for torn
      commits, and external double-lands need operator judgment.
    - ``pending_commit`` — an unresolved claim marker (crash or
      in-flight concurrent appender). With ``repair=True`` it is
      resolved FIRST via :func:`recover_floored_store` (roll forward
      if the staged rewrite completed, else roll back), and the
      remaining checks run on the recovered store.

    Returns the counts plus ``repaired_rows`` (residual rows dropped)
    and ``recovery`` (the recovery report, when one ran).
    """
    meta = read_store_meta(spark, base_dir)
    if meta is None:
        raise ValueError(
            f"fsck_floored_store: {base_dir} has no _store_meta.json "
            "(pre-metadata store or torn build)"
        )
    out = {
        "double_represented_keys": 0,
        "subfloor_in_index": 0,
        "overfloor_in_residual": 0,
        "duplicate_postings": 0,
        "pending_commit": None,
        "recovery": None,
        "repaired_rows": 0,
    }
    pend = pending_commit(spark, base_dir, meta)
    if pend is not None:
        out["pending_commit"] = pend["version"]
        if repair:
            out["recovery"] = recover_floored_store(spark, base_dir)
            out["pending_commit"] = None
            meta = read_store_meta(spark, base_dir)
    if repair:
        # GC stages of already-committed versions: a crash after the
        # metadata rename but before the appender's post-commit cleanup
        # leaves the (now-redundant) stage behind. Never touches the
        # pending version's stage — recovery above owns that.
        from multi_attribute_join_search_with_mapreduce_spark import fsio

        committed = int(meta.get("version", 0))
        for name in fsio.listdir(spark, f"{base_dir}/_stage"):
            if name.startswith("v"):
                try:
                    k = int(name[1:])
                except ValueError:
                    continue
                if k <= committed:
                    fsio.delete(spark, f"{base_dir}/_stage/{name}")
            elif name.startswith(("tmp-", "fsck-")):
                # legacy (uncommitted) append / fsck-repair stages are
                # deleted on success; a surviving one is crash debris.
                # Safe to GC under --repair: fsck on a store with a
                # LIVE legacy writer is already outside the protocol
                # (legacy appends have no fencing at all — that is
                # what the commit protocol replaced).
                fsio.delete(spark, f"{base_dir}/_stage/{name}")
        # Commit-marker GC: markers at or below the committed version
        # are the commit log, but pending/claim checks only ever read
        # version+1 — an unboundedly maintained store (one marker per
        # streaming trigger) would otherwise pile up small files
        # forever. Retain a bounded tail for auditability.
        for name in fsio.listdir(spark, f"{base_dir}/_commits"):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    k = int(name[1:-5])
                except ValueError:
                    continue
                if k <= committed - _COMMIT_LOG_RETAIN:
                    fsio.delete(spark, f"{base_dir}/_commits/{name}")
    index_dir, residual_dir = f"{base_dir}/index", f"{base_dir}/residual"
    index = _read_parquet_or_none(spark, index_dir)
    residual = _read_parquet_or_none(spark, residual_dir)
    floor = meta["min_key_freq"]
    if index is not None:
        out["duplicate_postings"] = (
            index.groupBy("key", "table", "column", "row")
            .agg(F.count(F.lit(1)).alias("_m"))
            .filter(F.col("_m") > 1)
            .count()
        )
        out["subfloor_in_index"] = (
            index.groupBy("key")
            .agg(F.count(F.lit(1)).alias("_f"))
            .filter(F.col("_f") < floor)
            .count()
        )
    if residual is not None and "kb" in residual.columns:
        out["overfloor_in_residual"] = (
            residual.groupBy("key")
            .agg(F.count(F.lit(1)).alias("_f"))
            .filter(F.col("_f") >= floor)
            .count()
        )
    if index is None or residual is None or "kb" not in residual.columns:
        return out
    dup_keys = truncate_lineage(
        residual.select("key").distinct().join(
            index.select("key").distinct(), "key", "left_semi"
        )
    )
    out["double_represented_keys"] = dup_keys.count()
    if not repair or out["double_represented_keys"] == 0:
        return out
    # Drop the stale residual rows: rewrite only the buckets the
    # double-represented keys hash to (same pruned-rewrite discipline
    # as the append itself).
    buckets = meta["residual_buckets"]
    bad_kb = dup_keys.select(
        F.pmod(F.xxhash64("key"), F.lit(buckets)).alias("kb")
    ).distinct()
    keep = residual.join(F.broadcast(bad_kb), "kb", "left_semi").join(
        F.broadcast(dup_keys), "key", "left_anti"
    )
    out["repaired_rows"] = (
        residual.join(F.broadcast(dup_keys), "key", "left_semi").count()
    )
    kb_list = [int(r["kb"]) for r in bad_kb.collect()]  # bounded by B
    import uuid as _uuid

    # same staged-swap discipline as the append (ADVICE r10): the kept
    # rows are durable on disk under _stage/ before any kb= directory
    # is deleted, so a failure mid-repair cannot lose untouched
    # sub-floor rows sharing those buckets.
    _stage_residual_rewrite(
        spark,
        base_dir,
        f"{base_dir}/_stage/fsck-{_uuid.uuid4().hex}",
        keep.drop("kb").withColumn(
            "kb", F.pmod(F.xxhash64("key"), F.lit(buckets))
        ),
        kb_list,
    )
    return out


def posting_index_sql(
    specs: tuple[TableSpec, ...] = LAKE_TABLES, min_key_freq: int = 1
) -> str:
    """DuckDB SQL producing the identical index (differential oracle)."""
    selects = []
    for s in specs:
        for col_id, col_name in enumerate(s.string_cols):
            selects.append(
                f"SELECT {normalize_sql(col_name)} AS key, "
                f"CAST({s.table_id} AS INTEGER) AS \"table\", "
                f"CAST({col_id} AS INTEGER) AS \"column\", "
                f"CAST({s.row_col} AS BIGINT) AS row FROM {s.name}"
            )
    union = "\nUNION ALL\n".join(selects)
    base = f"SELECT * FROM (\n{union}\n) WHERE key <> ''"
    if min_key_freq > 1:
        base = (
            f"SELECT * FROM (\n{base}\n) "
            f"QUALIFY COUNT(*) OVER (PARTITION BY key) >= {min_key_freq}"
        )
    return base
