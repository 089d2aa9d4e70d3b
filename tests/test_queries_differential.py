"""Differential gate mirror: every registry query vs its DuckDB oracle
at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import assert_df_equals_duckdb

REGISTRY = entry_mod.registry()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    from multi_attribute_join_search_with_mapreduce_spark.registry import resolve_sql

    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    sql = resolve_sql(spec, sf_dir)
    if sql is None:
        assert df.count() >= 0  # rows-only check for non-SQL-expressible ops
    else:
        assert_df_equals_duckdb(df, sql, sf_dir)


def test_registry_is_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_equi_depth_buckets_balanced(spark, sf_dir):
    from multi_attribute_join_search_with_mapreduce_spark.operators.relational import equi_depth_histogram

    rows = equi_depth_histogram(spark, sf_dir).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert [r.bucket for r in sorted(rs, key=lambda r: r.bucket)] == [1, 2, 3, 4]
        sizes = [r.n_docs for r in rs]
        assert max(sizes) - min(sizes) <= 1  # equi-depth
        ordered = sorted(rs, key=lambda r: r.bucket)
        for a, b in zip(ordered, ordered[1:]):
            assert a.hi <= b.lo  # non-overlapping value ranges


def test_recursive_walk_depth_counts(spark, sf_dir):
    """Tree invariant: depth d row counts equal the level cardinalities
    (5 regions, 25 nations, |customer|, |orders|)."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.relational import (
        recursive_hierarchy_walk,
    )
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    out = recursive_hierarchy_walk(spark, sf_dir).collect()
    by_depth = {}
    for r in out:
        by_depth[r.depth] = by_depth.get(r.depth, 0) + r.n_nodes
    assert by_depth[0] == load_table(spark, "region", sf_dir).count()
    assert by_depth[1] == load_table(spark, "nation", sf_dir).count()
    assert by_depth[2] == load_table(spark, "customer", sf_dir).count()
    assert by_depth[3] == load_table(spark, "orders", sf_dir).count()


def test_incremental_join_rollup_deltas_are_exercised(spark, sf_dir):
    """The bilinear decomposition only proves something if all three
    delta terms are nonempty — assert the splits actually produce
    cross-term rows at this fixture scale."""
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    o = load_table(spark, "orders", sf_dir).select("o_orderkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    o_new = o.filter("o_orderkey % 10 = 0")
    li_new = li.filter("l_partkey % 7 = 0")
    o_old = o.filter("o_orderkey % 10 != 0")
    li_old = li.filter("l_partkey % 7 != 0")
    j = lambda a, b: a.join(b, a["o_orderkey"] == b["l_orderkey"]).count()
    assert j(o_new, li_old) > 0
    assert j(o_old, li_new) > 0
    assert j(o_new, li_new) > 0


def test_try_arith_integer_quantization_on_rounding_boundaries(spark):
    """Closed-form gate for the r6 rounding-parity fix: quantities in
    {8, 16, 32} put extendedprice/quantity exactly on decimal rounding
    boundaries (2-dp money over a power of two terminates at <=7 dp),
    the class where Spark's double->DECIMAL cast (HALF_UP on the
    shortest-string repr) and DuckDB's (binary-value rounding) diverge.
    The BIGINT formulation must equal the exact Fraction arithmetic."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    rows = [
        (100.04, 8.0),    # 12.505      -> tie at 6 dp? terminates at 3 dp
        (0.45, 32.0),     # 0.0140625   -> terminates at 7 dp, 5 at 7th
        (123.45, 32.0),   # 3.8578125   -> 5 exactly at the 7th dp
        (99.99, 16.0),    # 6.2493750   -> 5 at the 6th dp (round-half case)
        (104997.88, 7.0), # repeating decimal, magnitude ceiling
        (901.82, 1.0),
    ]
    df = spark.createDataFrame(rows, "l_extendedprice double, l_quantity double")
    r6 = F.expr(
        "(2 * CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 10000"
        " + CAST(ROUND(l_quantity) AS BIGINT))"
        " DIV (2 * CAST(ROUND(l_quantity) AS BIGINT))"
    )
    got = [r[0] for r in df.select(r6).collect()]
    for (e, q), g in zip(rows, got):
        cents = round(Fraction(str(e)) * 100)
        exact = Fraction(cents, int(q)) * 10**4
        # round-half-UP (floor(exact + 1/2)), not Python's banker's rounding
        expected = (2 * exact.numerator + exact.denominator) // (2 * exact.denominator)
        assert g == expected, (e, q, g)
