"""Pre-flight mirror of the driver's correctness gate.

Runs every registry query against its DuckDB oracle at sf0.01 — like the
driver does — but crucially in a VANILLA SparkSession (no confs from
session.get_spark), because the driver builds its own session and round 1
proved that any conf the package silently depends on (e.g.
spark.sql.legacy.parquet.nanosAsLong) turns into red rows only the driver
can see.

Usage: python tools/driver_sim.py [sf_dir] [name_filter ...]
       python tools/driver_sim.py [sf_dir] --skip name [name ...]
Prints one line per query and a final summary; exit 1 if any mismatch.
``--skip`` inverts the filter — run everything EXCEPT the named queries
(for the sf0.1 sweep, where set_similarity_join's deliberately-quadratic
brute-force oracle is intractable; see SCALE.md).
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: columns sorted by name, rows sorted
    by all columns, datetimes unified to ns."""
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rest = sys.argv[2:]
    skip: set[str] = set()
    name_filter: list[str] = []
    if rest and rest[0] == "--skip":
        skip = set(rest[1:])
    else:
        name_filter = rest

    # Vanilla session on purpose — mirrors the driver, NOT get_spark().
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as entry_mod

    registry = entry_mod.registry()
    failures: list[str] = []
    for name, spec in registry.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        if name in skip:
            print(f"skip  {name} (--skip)")
            continue
        try:
            from multi_attribute_join_search_with_mapreduce_spark.registry import resolve_sql

            sdf = spec.fn(spark, sf_dir)
            sql = resolve_sql(spec, sf_dir)
            if sql is None:
                n = sdf.count()
                print(f"ok    {name}: rows-only ({n} rows)")
                continue
            actual = canon(sdf.toPandas())
            expected = canon(con.execute(sql).df())
            if list(actual.columns) != list(expected.columns):
                failures.append(name)
                print(
                    f"FAIL  {name}: schema {list(actual.columns)} vs {list(expected.columns)}"
                )
                continue
            if len(actual) != len(expected):
                failures.append(name)
                print(f"FAIL  {name}: rows {len(actual)} vs {len(expected)}")
                continue
            try:
                pd.testing.assert_frame_equal(
                    actual, expected, check_dtype=False, check_exact=False, rtol=1e-9
                )
            except AssertionError as exc:
                failures.append(name)
                print(f"FAIL  {name}: values differ — {str(exc).splitlines()[-1]}")
                continue
            # Dtype-stability gate: r02's scd2_user_state was value-equal
            # here but hash-red at the driver because a nullable BIGINT
            # came back object/None from Spark and float64/NaN from
            # DuckDB. An object-vs-numeric dtype split is exactly that
            # failure class — treat it as red even though values match.
            unstable = [
                c
                for c in actual.columns
                if (str(actual[c].dtype) == "object") != (str(expected[c].dtype) == "object")
            ]
            if unstable:
                failures.append(name)
                print(
                    f"FAIL  {name}: dtype-unstable columns {unstable} "
                    f"(spark {[str(actual[c].dtype) for c in unstable]} vs "
                    f"oracle {[str(expected[c].dtype) for c in unstable]}) — "
                    "value-equal but the driver's hash will diverge on None/NaN"
                )
                continue
            print(f"ok    {name}: {len(actual)} rows hash-equal")
        except Exception:
            failures.append(name)
            print(f"ERROR {name}:")
            traceback.print_exc()

    print(f"\n{len(registry) - len(failures)}/{len(registry)} green")
    if failures:
        print("failures:", ", ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
