"""Phase-level profiler for the lifecycle/streaming cost head (r12).

Breaks the four fixed-cost-bound gates (VERDICT r11 next-round #1) into
their real phases and times each one, so the optimization targets the
phase that actually costs, not the query as a black box:

  - mjs_cli_floored_lifecycle: build / append / search+collect
  - stream_near_dup_ingest:    src write / stream run (per-batch log) / score
  - stream_stream_left_outer:  src write + expected counts / stream run
  - python_stream_source_scan: stream run

Usage: python tools/lifecycle_prof.py [names...]  (default: all four)
Respects $SPARK_GRAFT_SF_DIR. One process, bench-style warmup.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from multi_attribute_join_search_with_mapreduce_spark.session import get_spark  # noqa: E402

spark = get_spark("majs-lifecycle-prof")

from multi_attribute_join_search_with_mapreduce_spark.index import (  # noqa: E402
    WIDE_LAKE_TABLES,
    append_floored_index,
    cached_posting_index,
    read_floored_index,
    write_floored_index,
)
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table  # noqa: E402

t0 = time.perf_counter()
cached_posting_index(spark, sf_dir).count()
load_table(spark, "events", sf_dir).count()
spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").count()
print(f"# warmup: {time.perf_counter() - t0:.3f}s", flush=True)


class T:
    def __init__(self, label: str) -> None:
        self.label = label

    def __enter__(self):
        spark.sparkContext.setJobDescription(self.label)
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        print(f"  {self.label}: {time.perf_counter() - self.t0:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)


def prof_cli_floored() -> None:
    from multi_attribute_join_search_with_mapreduce_spark.operators.search import (
        multi_attribute_join_search,
    )
    from multi_attribute_join_search_with_mapreduce_spark.scratch import scratch_dir

    print("== mjs_cli_floored_lifecycle phases ==", flush=True)
    store = os.path.join(scratch_dir("majs_prof_cli_"), "store")
    to_append = {"documents"}
    initial = tuple(s for s in WIDE_LAKE_TABLES if s.name not in to_append)
    with T("build: write_floored_index (6 tables)"):
        write_floored_index(spark, sf_dir, store, initial, 2)
    with T("append: append_floored_index(documents)"):
        append_floored_index(
            spark,
            sf_dir,
            store,
            tuple(s for s in WIDE_LAKE_TABLES if s.name in to_append),
            2,
        )
    with T("read_floored_index"):
        postings = read_floored_index(spark, store)
    q = load_table(spark, "documents", sf_dir)
    with T("search: plans built"):
        tables, columns = multi_attribute_join_search(
            postings, q, ["lang", "source"], 20
        )
    with T("search: tables.collect()"):
        tables.collect()
    with T("search: columns.collect()"):
        columns.collect()


def prof_near_dup() -> None:
    import multi_attribute_join_search_with_mapreduce_spark.streaming.events as se

    print("== stream_near_dup_ingest (whole + per-batch) ==", flush=True)
    orig_append = se._append_bands_bucketed

    def timed_append(bands, tbl, location, batch_id):
        t = time.perf_counter()
        orig_append(bands, tbl, location, batch_id)
        print(
            f"    batch {batch_id} _append_bands_bucketed: "
            f"{time.perf_counter() - t:.3f}s",
            flush=True,
        )

    se._append_bands_bucketed = timed_append
    try:
        with T("stream_near_dup_ingest total"):
            n = se.stream_near_dup_ingest(spark, sf_dir).count()
        print(f"  rows: {n}", flush=True)
    finally:
        se._append_bands_bucketed = orig_append


def prof_louter() -> None:
    import multi_attribute_join_search_with_mapreduce_spark.streaming.events as se

    print("== stream_stream_left_outer ==", flush=True)
    with T("stream_stream_left_outer total"):
        n = se.stream_stream_left_outer(spark, sf_dir).count()
    print(f"  rows: {n}", flush=True)


def prof_pysource() -> None:
    from multi_attribute_join_search_with_mapreduce_spark.sources.pysource import (
        python_stream_source_scan,
    )

    print("== python_stream_source_scan ==", flush=True)
    with T("python_stream_source_scan total"):
        n = python_stream_source_scan(spark, sf_dir).count()
    print(f"  rows: {n}", flush=True)


ALL = {
    "cli": prof_cli_floored,
    "neardup": prof_near_dup,
    "louter": prof_louter,
    "pysource": prof_pysource,
}

names = sys.argv[1:] or list(ALL)
for rep in range(2):
    print(f"--- pass {rep} ---", flush=True)
    for name in names:
        ALL[name]()
