"""Physical-layout operators: small-file compaction and Z-order
clustering for data-skipping.

At 100 TB the dominant cost of most scans is I/O, and the two layout
pathologies that cause it are (a) millions of small files — per-file
open/footer overhead swamps the read — and (b) data scattered so that
min/max row-group statistics prune nothing. The reference never faces
either (its lake lives in Vertica, ``handlers.py:15``); a parquet-lake
engine must manage both at write time.

- :func:`compact_parquet` rewrites a directory into ~``target_mb``
  files. Round-robin ``repartition(n)`` (an AQE-coalescible exchange)
  — not ``coalesce`` — so every output file gets an even share even
  when the input files are skewed.
- :func:`zorder_key` builds a bit-interleaved key over multiple int
  columns as a *native column expression* (no UDF); writing
  range-partitioned + sorted by that key gives every file a tight
  min/max envelope in **all** interleaved dimensions, so a predicate
  on any of them prunes files/row-groups. A plain sort gives this for
  the leading column only.
- ORC read/write round out the format surface (parquet/CSV/JSON
  already in :mod:`.sinks`); ORC is bundled with Spark, no packages.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession

from multi_attribute_join_search_with_mapreduce_spark.scratch import scratch_dir
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession, src: str, dst: str, target_mb: int = 128
) -> int:
    """Rewrite ``src`` (a parquet directory) into ``dst`` with ~target_mb
    files; returns the file count written. Local-FS implementation of
    the sizing step — on a cluster the byte count would come from the
    FileSystem API / catalog statistics, the plan is identical."""
    n = max(1, math.ceil(_dir_bytes(src) / (target_mb * 1024 * 1024)))
    spark.read.parquet(src).repartition(n).write.mode("error").parquet(dst)
    return n


def zorder_key(*cols: str | Column, bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column, highest bit first. Columns must be non-negative integers —
    rank/bucketize first for arbitrary domains (see
    :func:`cluster_by_zorder`). Pure bit arithmetic, stays in codegen.

    With k columns the key has k*bits bits; bit b of column i lands at
    position b*k + (k-1-i), so high-order bits of every column dominate
    equally — the interleave that makes per-file min/max tight in all
    dimensions at once."""
    ncols = len(cols)
    if not 1 <= ncols * bits <= 63:
        raise ValueError("k*bits must fit in a signed 64-bit key")
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for b in range(bits):
            bit = F.shiftright(col, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * ncols + (ncols - 1 - i)))
    return key


def cluster_by_zorder(
    df: DataFrame,
    cols: tuple[str, ...],
    dst: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered on the Z-order key of ``cols``.

    Each column is first min/max-scaled to the full ``bits`` range —
    interleaving raw values lets the widest column's high bits dominate
    the curve and degrades Z-order to a plain sort on that column. The
    scaling stats are one single-row aggregate broadcast back into the
    projection (a lakehouse engine would take them from catalog/file
    statistics), so the normalization adds no per-row shuffle.

    ``repartitionByRange`` on the key splits the Z-curve into
    contiguous segments (one per output file) and
    ``sortWithinPartitions`` orders rows inside each — together they
    give each file a disjoint curve interval, hence tight min/max
    bounds on every clustered column. Equivalent plan shape to
    ``OPTIMIZE ... ZORDER BY`` in lakehouse engines."""
    stats = df.select(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    )
    top = (1 << bits) - 1
    scaled = [
        F.when(
            F.col(f"_hi_{c}") > F.col(f"_lo_{c}"),
            (
                (F.col(c) - F.col(f"_lo_{c}")).cast("long") * top
            )
            .cast("long")
            / (F.col(f"_hi_{c}") - F.col(f"_lo_{c}")).cast("long"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        for c in cols
    ]
    zkey = zorder_key(*scaled, bits=bits)
    (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_z", zkey)
        .drop(*[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("error")
        .parquet(dst)
    )


def write_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def overwrite_partitions(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Idempotent partition-level re-ingest: replace ONLY the partitions
    ``df`` contains rows for, leaving every other partition's files
    untouched (dynamic partition overwrite).

    The daily-rerun pattern of a partitioned lake: re-processing one
    day must not truncate the table (static overwrite mode does) and
    must not duplicate rows (append mode does). Re-running the same
    write is a no-op state-wise — exactly-once by idempotence. The
    session's ``partitionOverwriteMode`` is scoped to this write and
    restored after, so an unconfigured (driver) session is safe.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def write_xml(df: DataFrame, path: str, row_tag: str = "row", mode: str = "error") -> None:
    """XML sink (built into Spark 4 — the old spark-xml package moved
    in-core). Interop format for feeds that still speak XML; not a
    performance path."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def read_xml(spark: SparkSession, path: str, schema: str, row_tag: str = "row") -> DataFrame:
    """XML source with an explicit schema — inference over XML is a
    full extra pass and type-guesses; production reads pin the schema."""
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(schema)
        .load(path)
    )


def write_bucketed_table(
    spark: SparkSession, df: DataFrame, out_table: str, key: str, buckets: int = 16
) -> None:
    """Persist ``df`` as a managed table bucketed+sorted by ``key`` —
    the co-location contract: two tables bucketed on their join key with
    the same bucket count sort-merge join with NO exchange on either
    side (each task reads matching bucket files directly).

    Same stale-location hygiene as ``index.write_posting_index``: the
    in-memory catalog forgets managed tables across sessions while the
    warehouse directory survives, so drop both before writing.
    """
    spark.sql(f"DROP TABLE IF EXISTS `{out_table}`")
    from multi_attribute_join_search_with_mapreduce_spark import fsio

    fsio.delete(
        spark,
        f"{spark.conf.get('spark.sql.warehouse.dir').rstrip('/')}/"
        f"{out_table.lower()}",
    )
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(out_table)
    )


def bucketed_fact_join(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-gated proof of the bucketed FACT-FACT join path: persist
    ``orders`` and ``lineitem`` bucketed by order key (the ingest-time
    layout decision a 100 TB deployment makes once), then run an
    orders⨝lineitem rollup through the bucketed table scans. The join
    inherits the bucket partitioning — zero shuffle of either fact
    (plan-asserted in ``tests/test_layout.py``); only the S-row final
    aggregate exchanges. Oracle: the same rollup as plain SQL —
    bucketing must never change results, only the plan.
    """
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    write_bucketed_table(
        spark,
        load_table(spark, "orders", sf).select("o_orderkey", "o_orderpriority"),
        "orders_by_okey",
        "o_orderkey",
    )
    write_bucketed_table(
        spark,
        load_table(spark, "lineitem", sf).select("l_orderkey", "l_extendedprice"),
        "lineitem_by_okey",
        "l_orderkey",
    )
    o = spark.table("orders_by_okey")
    li = spark.table("lineitem_by_okey")
    return (
        o.hint("merge")
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


def zorder_clustered_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-gated proof of the Z-order clustering path: rewrite
    ``lineitem`` clustered on ``(l_partkey, l_suppkey)``
    (:func:`cluster_by_zorder`), then run a two-dimensional selective
    scan over the clustered copy and aggregate.

    The oracle runs the same predicate on the unclustered fixture — a
    green row proves the Morton-key rewrite (scale, interleave,
    range-partition, sort) moved every row and invented none. The
    *pruning* payoff is asserted separately in ``tests/test_layout.py``
    (disjoint per-file min/max on both clustered columns): parquet
    row-group stats skip files whose curve interval misses the
    predicate box, in either dimension — the property a single-column
    sort cannot give.
    """

    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    li = load_table(spark, "lineitem", sf).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    dst = os.path.join(scratch_dir("majs_zorder_"), "lineitem_z")
    cluster_by_zorder(li, ("l_partkey", "l_suppkey"), dst, n_files=8)
    back = spark.read.parquet(dst).where(
        (F.col("l_partkey") <= 100) & (F.col("l_suppkey") <= 50)
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("l_orderkey").cast("long").alias("sum_okey"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


ZORDER_CLUSTERED_SCAN_SQL = """
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_partkey <= 100 AND l_suppkey <= 50
"""


BUCKETED_FACT_JOIN_SQL = """
SELECT o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec  # noqa: E402

LAYOUT_QUERIES: dict[str, QuerySpec] = {
    "bucketed_fact_join": QuerySpec(bucketed_fact_join, BUCKETED_FACT_JOIN_SQL),
    "zorder_clustered_scan": QuerySpec(
        zorder_clustered_scan, ZORDER_CLUSTERED_SCAN_SQL
    ),
}
