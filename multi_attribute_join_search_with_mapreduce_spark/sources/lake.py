"""Lake readers for the driver's parquet testdata.

The reference's only data source is a Vertica posting table plus a CSV
fetched over HTTP (``handlers.py:42-59``, ``Par_Search.py:145-148``).
Here the lake is ordinary parquet DataFrames; CSV/JSON/JDBC remain
available through the stock ``spark.read`` surface (see
:func:`read_csv_source`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


# Timestamp columns in the lake. Current testdata stores
# TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads natively
# as TIMESTAMP_NTZ — the same naive wall-clock DuckDB sees, in any
# session timezone. Earlier testdata generations used TIMESTAMP(NANOS),
# which vanilla Spark rejects outright (PARQUET_TYPE_ILLEGAL); the
# legacy conf + bigint branch below keeps those readable too.
# Downstream epoch arithmetic must use functions.temporal.epoch_us /
# epoch_s (cast-to-long/double and unix_micros are illegal on NTZ).
_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    # Runtime-settable legacy conf: harmless for MICROS data, required
    # for NANOS-era data in sessions built outside get_spark() (e.g. the
    # driver's own, which round 1 proved must work unconfigured).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            from pyspark.sql import functions as F

            # integer `div`, not `/`: float division loses precision on
            # epoch-nanos magnitudes (~1.7e18 > 2^53). Build the NTZ
            # value directly with timestampadd from the naive epoch —
            # no TIMESTAMP intermediary, so the wall clock is identical
            # to DuckDB's naive read in ANY session timezone (a
            # timestamp_micros(...).cast('timestamp_ntz') round trip
            # would shift by the zone offset in unconfigured sessions).
            df = df.withColumn(
                col,
                F.expr(
                    f"timestampadd(MICROSECOND, {col} div 1000, "
                    "TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
            )
    return df


def load_lake(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_lake(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every lake table as a temp view for the SQL surface."""
    for name, df in load_lake(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def read_jdbc_source(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Generic JDBC scan (SURVEY.md §2.1 S3 — the reference reads its
    posting table from Vertica; the engine's native path is parquet, but
    the connector surface stays available for external DBs).

    When ``partition_column`` is given, the read is split into
    ``num_partitions`` parallel range queries — without it a JDBC scan
    is a single-task bottleneck.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1 << 31))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_csv_source(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV query-table source: local path, ``file://`` URL, or an
    ``http(s)://``/``ftp://`` URL (reference: ``Par_Search.py:145-148``
    uses ``sc.addFile(url)`` + ``SparkFiles.get`` for its movie.csv
    entry; same mechanism here — the file is fetched once and shipped
    to executors, fine for query tables, which are small by
    construction)."""
    if path.startswith(("http://", "https://", "ftp://")):
        from pyspark import SparkFiles

        spark.sparkContext.addFile(path)
        path = "file://" + SparkFiles.get(path.rsplit("/", 1)[-1])
    return spark.read.csv(path, header=header, inferSchema=True)


def read_csv_robust(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Production CSV ingest: PERMISSIVE mode with an explicit schema
    and a captured ``_corrupt_record`` column — malformed rows never
    abort a 100 TB load and never silently disappear; they are
    quarantined for inspection.

    Returns ``(good, bad)``: ``good`` carries only schema-conforming
    rows, ``bad`` the raw text of every malformed line. Both are plain
    filters over one scan (Spark computes the corrupt column during
    parsing; the quarantine split costs nothing extra). An explicit
    schema is mandatory — inference is an extra full pass and would
    happily type a corrupt file as all-strings instead of flagging it.

    NOTE (Spark semantics): a from-CSV DataFrame cannot be filtered on
    ``_corrupt_record`` alone in one pass; the split materializes via a
    cached scan, which for ingest-sized batches is the documented
    pattern (SPARK-21610's required workaround).
    """
    full_schema = schema + ", _corrupt_record string"
    raw = (
        spark.read.schema(full_schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    ).cache()
    good = raw.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = raw.where(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return good, bad
