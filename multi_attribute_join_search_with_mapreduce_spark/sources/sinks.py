"""Sink surface: writers for results and derived tables.

The reference's only sinks are ``df.show()``/``collect()`` and a parquet
intermediate cache (``Par_Search.py:118-134``, SURVEY.md §2.1 S5/S7).
A general engine also needs durable, partition-aware writes; these thin
wrappers standardize the options that matter at scale:

- **parquet, partitioned**: ``partitionBy`` on low-cardinality columns
  gives partition pruning to every downstream reader; never partition by
  a high-cardinality key (one directory per value).
- **parquet, bucketed**: hash-bucket by join key at write time so
  probe-side joins skip the shuffle (see
  :func:`..index.write_posting_index` for the posting-index instance).
- **csv / json**: interchange formats; header + explicit compression.
- ``maxRecordsPerFile`` guards against giant single files when a
  partition is skewed.

All writers take a ``mode`` (default ``error`` — refuse to clobber;
callers opt into ``overwrite``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multi_attribute_join_search_with_mapreduce_spark.scratch import scratch_dir


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "error",
    max_records_per_file: int | None = 5_000_000,
) -> None:
    w = df.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "error", compression: str = "gzip"
) -> None:
    df.write.mode(mode).option("header", "true").option(
        "compression", compression
    ).csv(path)


def write_json(
    df: DataFrame, path: str, mode: str = "error", compression: str = "gzip"
) -> None:
    df.write.mode(mode).option("compression", compression).json(path)


def read_json_source(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON reader; pass an explicit schema in production — schema
    inference reads the data twice."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "error"
) -> None:
    """XML sink (native in Spark 4 — no external package): the
    interchange format regulated/B2B feeds still arrive in."""
    df.write.format("xml").option("rowTag", row_tag).mode(mode).save(path)


def read_xml_source(
    spark: SparkSession, path: str, row_tag: str = "row", schema=None
) -> DataFrame:
    """XML reader; pass an explicit schema in production — inference
    parses the documents twice, and XML has no native numeric types to
    anchor it."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "error", compression: str = "zstd"
) -> None:
    """ORC sink — the second columnar interchange format after parquet
    (native in Spark, binary-exact for floats, predicate-pushdown-able
    on read like parquet)."""
    df.write.mode(mode).option("compression", compression).orc(path)


def read_orc_source(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


# --- driver-gated roundtrip proofs -----------------------------------------


def jsonl_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-gated proof of the JSON sink + scan pair: write an
    ``events`` projection as gzip JSONL, read it back with an explicit
    schema, and aggregate — the oracle computes the same aggregate from
    the parquet fixture, so a green row proves the interchange path is
    lossless.

    The projection is integers and strings only: JSON has no int/float
    distinction, and a DOUBLE that transits a decimal string can come
    back one ulp off — exact roundtrip claims belong to types with
    exact text representations. (Floats ride parquet/ORC sinks, which
    are binary-exact; see ``test_sinks.py`` for the float cases.)
    """
    import os

    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    path = os.path.join(scratch_dir("majs_jsonl_"), "events_jsonl")
    e = load_table(spark, "events", sf).select("event_id", "user_id", "event_type")
    write_json(e, path, mode="overwrite")
    back = read_json_source(
        spark, path, schema="event_id long, user_id long, event_type string"
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("event_id").cast("long").alias("sum_event_id"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("event_type")
    )


JSONL_ROUNDTRIP_SQL = """
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def partitioned_scan_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-gated proof of the partitioned sink + pruned scan pair:
    write ``events`` hive-partitioned by ``event_type``, then read back
    with an equality filter on the partition column and aggregate.

    At 100 TB this is THE layout decision: the filter is satisfied by
    directory listing alone (``PartitionFilters`` in the plan — asserted
    in ``tests/test_sinks.py``), so a one-partition query reads one
    partition's files, not the table. The oracle applies the same filter
    to the unpartitioned fixture — a green row proves the partitioned
    write relocated every row to the right directory and lost none.
    """
    import os

    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    path = os.path.join(scratch_dir("majs_part_"), "events_by_type")
    e = load_table(spark, "events", sf).select(
        "event_id", "user_id", "value", "event_type"
    )
    write_parquet(e, path, partition_by=("event_type",), mode="overwrite")
    back = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("event_id").cast("long").alias("sum_event_id"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


PARTITIONED_SCAN_PRUNE_SQL = """
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
WHERE event_type = 'purchase'
"""


def schema_evolution_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-gated proof of schema evolution on read: two parquet
    batches with different schemas — an early write of ``orders``
    without ``o_orderpriority``, a later one with it — land in the same
    table directory; ``mergeSchema`` reads them as one relation with
    the missing column NULL-filled for old files.

    This is the append-only-lake reality at 100 TB: producers add
    columns over time and nobody rewrites petabytes of history.
    mergeSchema reconciles footers at planning time (per-file schema
    union — no data pass); the scan itself stays pruned and pushed
    down. The oracle rebuilds the same union from the fixture with an
    explicit NULL for the legacy half.
    """
    import os

    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    path = os.path.join(scratch_dir("majs_evolve_"), "orders_evolving")
    o = load_table(spark, "orders", sf)
    v1 = o.where(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    v2 = o.where(F.col("o_orderkey") % 2 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v1.write.mode("overwrite").parquet(os.path.join(path, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(path, "batch=2"))
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        back.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("<legacy>")).alias("priority")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("priority")
    )


SCHEMA_EVOLUTION_SQL = """
SELECT COALESCE(o_orderpriority, '<legacy>') AS priority,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM (
  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 2 <> 0
)
GROUP BY 1
ORDER BY priority
"""


def file_provenance(spark: SparkSession, sf: str) -> DataFrame:
    """Row-level provenance via the hidden ``_metadata`` struct of file
    sources: which physical file each row came from and its position in
    that file — the audit/debug surface for a 100 TB lake ("which
    ingest batch produced this bad row?") with NO extra bookkeeping
    columns stored in the data.

    Per (table, leaf file): row count and the min/max ``row_index``,
    which must span ``0 .. n-1`` for a full-file scan. ``_metadata`` is
    populated by the scan node itself (constant-folded per file/row
    group), so selecting it adds no shuffle and no extra read. Oracle:
    DuckDB's ``filename=true`` + ``file_row_number=true`` over the same
    parquet.
    """
    from pyspark.sql import functions as F

    # _metadata needs a direct read (load_table's projection would drop
    # it), but the lake contract still applies: set the same legacy
    # conf load_table sets, so NANOS-era fixtures don't make this the
    # one query whose schema inference crashes order-dependently.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def per_table(name: str) -> DataFrame:
        df = spark.read.parquet(f"{sf}/{name}.parquet")
        return df.select(
            F.lit(name).alias("table_name"),
            F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
                "file_name"
            ),
            F.col("_metadata.row_index").alias("ri"),
        )

    rows = per_table("documents").unionByName(per_table("events"))
    return (
        rows.groupBy("table_name", "file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ri").alias("min_row_index"),
            F.max("ri").alias("max_row_index"),
        )
        .orderBy("table_name", "file_name")
    )


# The driver's oracle connection sees the fixture TABLES as views, not
# paths, so it cannot call read_parquet(filename=true) itself. The
# fixtures are single-file tables (one <table>.parquet per table), so
# the independent check is the CONTRACT itself: one file named
# '<table>.parquet' whose row_index spans exactly 0..n-1. The
# multi-file layout (several files, per-file 0-based spans) is covered
# by the synthetic test in tests/test_sinks.py, which does drive
# DuckDB's file_row_number over a directory it controls.
FILE_PROVENANCE_SQL = """
SELECT 'documents' AS table_name, 'documents.parquet' AS file_name,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(0 AS BIGINT) AS min_row_index,
  CAST(COUNT(*) - 1 AS BIGINT) AS max_row_index
FROM documents
UNION ALL
SELECT 'events', 'events.parquet', CAST(COUNT(*) AS BIGINT),
  CAST(0 AS BIGINT), CAST(COUNT(*) - 1 AS BIGINT)
FROM events
ORDER BY table_name
"""


def xml_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-gated proof of the XML sink + scan pair (Spark 4 ships the
    XML source natively): write a nation projection as XML, read it back
    with an explicit schema, join it to region through the roundtripped
    key, and aggregate — the oracle computes the same join-aggregate
    from the parquet fixtures, so a green row proves the XML path is
    lossless AND join-able, not just count-stable.

    Same exact-text-type discipline as `jsonl_roundtrip`: integers and
    strings only (XML is text; a DOUBLE through decimal text can come
    back one ulp off — floats belong to the binary columnar formats,
    `orc_roundtrip`).
    """
    import os

    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    path = os.path.join(scratch_dir("majs_xml_"), "nation_xml")
    n = load_table(spark, "nation", sf).select("n_nationkey", "n_regionkey", "n_name")
    write_xml(n, path, mode="overwrite")
    back = read_xml_source(
        spark, path, schema="n_nationkey long, n_regionkey long, n_name string"
    )
    r = load_table(spark, "region", sf).select("r_regionkey", "r_name")
    return (
        back.join(F.broadcast(r), back["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nations"),
            F.sum("n_nationkey").cast("long").alias("sum_key"),
            F.min("n_name").alias("first_nation"),
        )
        .orderBy("r_name")
    )


XML_ROUNDTRIP_SQL = """
SELECT r.r_name,
  CAST(COUNT(*) AS BIGINT) AS n_nations,
  CAST(SUM(n.n_nationkey) AS BIGINT) AS sum_key,
  MIN(n.n_name) AS first_nation
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name ORDER BY r.r_name
"""


def orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-gated proof of the ORC sink + scan pair: write a lineitem
    projection as zstd ORC (including a DOUBLE — columnar formats are
    binary-exact, so floats roundtrip bit-for-bit, unlike the JSONL
    probe which confines itself to exact-text types), read it back with
    a pushed-down filter, and aggregate; the oracle computes the same
    aggregate from the parquet fixture. The filter on the read side
    exercises ORC predicate pushdown (the scan skips stripes by
    min/max), which is what makes the format a lake citizen rather than
    an export format.
    """
    import os

    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    path = os.path.join(scratch_dir("majs_orc_"), "lineitem_orc")
    li = load_table(spark, "lineitem", sf).select(
        "l_orderkey", "l_linestatus", "l_quantity", "l_extendedprice"
    )
    write_orc(li, path, mode="overwrite")
    back = read_orc_source(spark, path).filter(F.col("l_quantity") >= 25)
    return (
        back.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.min("l_orderkey").cast("long").alias("min_okey"),
            F.max("l_orderkey").cast("long").alias("max_okey"),
        )
        .orderBy("l_linestatus")
    )


ORC_ROUNDTRIP_SQL = """
SELECT l_linestatus,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
  CAST(MIN(l_orderkey) AS BIGINT) AS min_okey,
  CAST(MAX(l_orderkey) AS BIGINT) AS max_okey
FROM lineitem WHERE l_quantity >= 25
GROUP BY l_linestatus ORDER BY l_linestatus
"""


# One embedded-Derby database per process (see jdbc_nation_roundtrip's
# docstring for why). [0] = the jdbc URL once booted.
_DERBY_DB: list[str] = []


def _derby_db_url(spark: SparkSession) -> str:
    """Boot (once per process) and return the embedded Derby DB URL."""
    import atexit
    import os

    if _DERBY_DB:
        return _DERBY_DB[0]
    try:
        jvm_ok = spark._jvm is not None
    except Exception:
        jvm_ok = False
    if not jvm_ok:
        # Spark Connect: there is no in-process JVM to host the engine.
        # Degrade LOUDLY — the JDBC connector itself (sources/lake.py)
        # is Connect-compatible against any networked database; only
        # this embedded test fixture is classic-session-only.
        raise RuntimeError(
            "embedded Derby fixture requires a classic (non-Connect) "
            "session: the in-process JVM hosts the database engine. "
            "Point the JDBC connector at a networked database instead."
        )
    scratch = scratch_dir("majs_jdbc_")
    # Keep Derby's engine-wide side files (derby.log) in the scratch
    # dir, not the process cwd. Only honored on the FIRST engine boot
    # in the JVM — which is exactly this one; a no-op if something else
    # booted Derby first (harmless, the DB path below is absolute).
    try:
        spark._jvm.System.setProperty(
            "derby.stream.error.file", os.path.join(scratch, "derby.log")
        )
    except Exception:
        pass
    url = f"jdbc:derby:{os.path.join(scratch, 'nation_db')};create=true"

    def _shutdown_engine() -> None:
        # A clean engine shutdown ALWAYS raises SQLException XJ015 —
        # that is Derby's documented success signal. Guard everything:
        # at interpreter exit the JVM gateway may already be gone.
        try:
            spark._jvm.java.sql.DriverManager.getConnection(
                "jdbc:derby:;shutdown=true"
            )
        except Exception:
            pass

    atexit.register(_shutdown_engine)
    _DERBY_DB.append(url)
    return url


def jdbc_nation_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-gated proof of the JDBC connector pair (SURVEY.md §2.1 S3
    — the reference reads its posting table from a warehouse DB over
    JDBC, ``handlers.py:42-59``): write the nation table to an EMBEDDED
    Apache Derby database (the JDBC engine Spark itself ships for its
    Hive metastore, so the probe needs no external service), read it
    back through :func:`..lake.read_jdbc_source` as a PARTITIONED range
    scan, and aggregate — the oracle computes the same aggregate from
    the parquet fixture, so a green row proves the connector path is
    lossless end-to-end.

    The read passes partitionColumn/numPartitions (4 parallel range
    queries over n_nationkey): a JDBC scan without a partition column
    is a single-task straw, and the split path is exactly what a
    warehouse-scale ingest needs exercised.

    ``createTableColumnTypes`` pins n_name to VARCHAR: Spark's Derby
    dialect maps StringType to CLOB, which Derby can neither GROUP BY
    nor compare.

    The database path is ONE per process (``_derby_db_url``): embedded
    Derby keeps every booted database resident in the JVM (page cache,
    open file handles) until engine shutdown, so a fresh DB per
    invocation × bench reps × driver reruns would accumulate them for
    process lifetime — and the scratch atexit rmtree would be deleting
    directories Derby still holds open. Reps reuse the single DB
    (``mode("overwrite")`` recreates the table, not the database) and an
    atexit hook shuts the engine down cleanly BEFORE the scratch rmtree
    runs (atexit is LIFO; the scratch root registers at first use, which
    this call forces first).
    """
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import (
        load_table,
        read_jdbc_source,
    )

    url = _derby_db_url(spark)
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    n = load_table(spark, "nation", sf).select("n_nationkey", "n_regionkey", "n_name")
    (
        n.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "nation_probe")
        .option("driver", driver)
        .option("createTableColumnTypes", "n_name VARCHAR(128)")
        .mode("overwrite")
        .save()
    )
    back = read_jdbc_source(
        spark,
        url,
        "nation_probe",
        partition_column="n_nationkey",
        num_partitions=4,
        lower_bound=0,
        upper_bound=32,
        driver=driver,
    )
    return (
        back.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nations"),
            F.sum("n_nationkey").cast("long").alias("sum_key"),
            F.min("n_name").alias("first_name"),
        )
        .orderBy("n_regionkey")
    )


JDBC_ROUNDTRIP_SQL = """
SELECT n_regionkey,
  CAST(COUNT(*) AS BIGINT) AS n_nations,
  CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
  MIN(n_name) AS first_name
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec  # noqa: E402

SINK_QUERIES: dict[str, QuerySpec] = {
    "file_provenance": QuerySpec(file_provenance, FILE_PROVENANCE_SQL),
    "jdbc_nation_roundtrip": QuerySpec(jdbc_nation_roundtrip, JDBC_ROUNDTRIP_SQL),
    "jsonl_roundtrip": QuerySpec(jsonl_roundtrip, JSONL_ROUNDTRIP_SQL),
    "orc_roundtrip": QuerySpec(orc_roundtrip, ORC_ROUNDTRIP_SQL),
    "xml_roundtrip": QuerySpec(xml_roundtrip, XML_ROUNDTRIP_SQL),
    "partitioned_scan_prune": QuerySpec(
        partitioned_scan_prune, PARTITIONED_SCAN_PRUNE_SQL
    ),
    "schema_evolution_merge": QuerySpec(
        schema_evolution_merge, SCHEMA_EVOLUTION_SQL
    ),
}
