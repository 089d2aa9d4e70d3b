"""Physical-layout operators: compaction, Z-order clustering, ORC."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table
from multi_attribute_join_search_with_mapreduce_spark.sources.layout import (
    cluster_by_zorder,
    compact_parquet,
    read_orc,
    write_orc,
    zorder_key,
)


def _parquet_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def _file_minmax(path: str, col: str) -> tuple[int, int]:
    md = pq.ParquetFile(path).metadata
    idx = md.schema.names.index(col)
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        mins.append(st.min)
        maxs.append(st.max)
    return min(mins), max(maxs)


def test_compact_reduces_files(spark, sf_dir, tmp_path):
    src = str(tmp_path / "small_files")
    dst = str(tmp_path / "compacted")
    orders = load_table(spark, "orders", sf_dir)
    orders.repartition(32).write.parquet(src)
    assert len(_parquet_files(src)) == 32

    n = compact_parquet(spark, src, dst, target_mb=128)
    files = _parquet_files(dst)
    assert len(files) == n < 32

    # content-equal both ways
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_zorder_key_bit_interleave(spark):
    # x=0b101, y=0b011, bits=3: x's bit b -> position 2b+1, y's -> 2b.
    df = spark.createDataFrame([(5, 3)], "x int, y int")
    (key,) = df.select(zorder_key("x", "y", bits=3).alias("z")).collect()[0]
    assert key == (1 << 1) | (1 << 5) | (1 << 0) | (1 << 2)  # x b0,b2; y b0,b1


def test_zorder_key_bounds():
    with pytest.raises(ValueError):
        zorder_key("a", "b", bits=32)  # 64 bits doesn't fit signed long


def test_zorder_write_skips_in_both_dimensions(spark, sf_dir, tmp_path):
    """A Z-ordered layout gives non-trivial file pruning on *every*
    clustered column; a single-column sort prunes only its own column."""
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    zdir = str(tmp_path / "zorder")
    sdir = str(tmp_path / "sorted")
    n_files = 8
    cluster_by_zorder(li, ("l_orderkey", "l_partkey"), zdir, n_files=n_files)
    (
        li.repartitionByRange(n_files, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.parquet(sdir)
    )

    lo, hi = (
        li.selectExpr("min(l_partkey)", "max(l_partkey)").collect()[0]
    )
    span = (hi - lo) or 1
    # a narrow probe range in the NON-leading dimension
    probe_lo, probe_hi = lo, lo + span // 8

    def files_touched(d: str) -> tuple[int, int]:
        files = _parquet_files(d)
        touched = sum(
            1
            for f in files
            if not (probe_hi < _file_minmax(f, "l_partkey")[0]
                    or probe_lo > _file_minmax(f, "l_partkey")[1])
        )
        return touched, len(files)

    z_touched, z_total = files_touched(zdir)
    s_touched, s_total = files_touched(sdir)
    # single-column sort scatters l_partkey across every file
    assert s_touched == s_total
    # z-order prunes files on the second dimension too
    assert z_touched < z_total


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    path = str(tmp_path / "nation_orc")
    nation = load_table(spark, "nation", sf_dir)
    write_orc(nation, path)
    back = read_orc(spark, path)
    assert back.schema == nation.schema
    assert back.exceptAll(nation).count() == 0
    assert nation.exceptAll(back).count() == 0


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table
    from multi_attribute_join_search_with_mapreduce_spark.sources.layout import read_xml, write_xml

    src = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    dst = str(tmp_path / "nation_xml")
    write_xml(src, dst, row_tag="nation")
    back = read_xml(spark, dst, "n_nationkey bigint, n_name string", row_tag="nation")
    assert sorted((r.n_nationkey, r.n_name) for r in back.collect()) == sorted(
        (r.n_nationkey, r.n_name) for r in src.collect()
    )


def test_bucketed_fact_join_no_fact_shuffle(spark, sf_dir):
    """Both facts bucketed on the join key: the sort-merge join must
    read bucket files directly — no Exchange below the join."""
    import contextlib
    import io

    from multi_attribute_join_search_with_mapreduce_spark.sources.layout import bucketed_fact_join

    df = bucketed_fact_join(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    # in the formatted tree, the join's children (the fact scans) render
    # BELOW its line until the tree ends at the first blank line
    subtree = plan.split("SortMergeJoin", 1)[1].split("\n\n", 1)[0]
    assert "Exchange" not in subtree, "bucketed fact join shuffled a fact side"
    assert "Bucketed: true" in plan
    for t in ("orders_by_okey", "lineitem_by_okey"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
