"""Normalizer unit tests (FIXTURES.md A4 corpus) across all three
renderings: Spark exprs, DuckDB SQL, pure Python."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.functions.text import (
    normalize_col,
    normalize_py,
    normalize_sql,
)

CORPUS = [
    ("James Cameron", "james cameron"),
    ("The Avatar!", "avatar"),
    ("avatar", "avatar"),
    ("Pirates of the Caribbean: At World's End", "pirates caribbean world s end"),
    ("  spaced   out  ", "spaced out"),
    ("punct!@#$,.-;:_soup", "punct soup"),
    ("Café\xa0Münster", "cafmnster"),  # ascii-fold drops non-ascii bytes in place
    ("UPPER_lower-Mixed.Case", "upper lower mixed case"),
    ("the of on in", ""),  # all stopwords
    ("of of", ""),  # doubled stopwords (ref's replace-loop misses these)
    ("a", ""),
    ("", ""),
    ("42 items, 7% off!", "42 items 7 off"),
    ("they will v ve d", ""),
    ("start the end", "start end"),
    ("d'Artagnan's", "artagnan s"),  # 's' is not a stopword; leading 'd' is
]


@pytest.mark.parametrize("raw,expected", CORPUS)
def test_normalize_py(raw, expected):
    assert normalize_py(raw) == expected


def test_normalize_py_idempotent():
    for raw, _ in CORPUS:
        once = normalize_py(raw)
        assert normalize_py(once) == once


def test_normalize_spark_matches_python(spark):
    df = spark.createDataFrame([(r,) for r, _ in CORPUS], ["raw"])
    out = df.select("raw", normalize_col(F.col("raw")).alias("norm")).collect()
    for row in out:
        assert row["norm"] == normalize_py(row["raw"]), row["raw"]


def test_normalize_duckdb_matches_python():
    con = duckdb.connect()
    for raw, expected in CORPUS:
        con.execute("CREATE OR REPLACE TABLE _t AS SELECT ?::VARCHAR AS raw", [raw])
        got = con.execute(f"SELECT {normalize_sql('raw')} AS n FROM _t").fetchone()[0]
        assert got == normalize_py(raw) == expected, raw


def test_normalize_null_passthrough(spark):
    assert normalize_py(None) is None
    df = spark.createDataFrame([(None,)], "raw string")
    assert df.select(normalize_col(F.col("raw")).alias("n")).first()["n"] is None


def test_near_dup_delta_completes_the_full_build(spark, sf_dir):
    """Incremental maintenance invariant: full-corpus candidates ==
    (base-vs-base candidates) ∪ (delta candidates touching a new doc),
    disjointly — so appending a batch and running the delta never loses
    or double-emits a pair."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
        _DELTA_MOD,
        near_dup_candidates,
        near_dup_delta,
    )

    full = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in near_dup_candidates(spark, sf_dir).collect()
    }
    delta = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in near_dup_delta(spark, sf_dir).collect()
    }
    is_new = lambda d: d % _DELTA_MOD == 0  # noqa: E731
    base_only = {
        (a, b, j) for (a, b, j) in full if not is_new(a) and not is_new(b)
    }
    assert delta == full - base_only
    assert delta, "fixture delta batch produced no candidate pairs"
    for a, b, _ in delta:
        assert is_new(a) or is_new(b)
