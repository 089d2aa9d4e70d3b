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

TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


# Columns stored as parquet TIMESTAMP(NANOS): with
# spark.sql.legacy.parquet.nanosAsLong they arrive as BIGINT nanoseconds
# and are converted to proper timestamps here (truncating to micros,
# which is exactly what DuckDB's nanos->TIMESTAMP read does).
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    # Runtime-settable legacy conf: sessions built outside get_spark()
    # (e.g. the driver's own) would otherwise fail with
    # PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS) columns (events.ts).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            from pyspark.sql import functions as F

            # integer `div`, not `/`: float division loses precision on
            # epoch-nanos magnitudes (~1.7e18 > 2^53)
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
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
