"""Attribute the small-query drift cluster (VERDICT r6 task 3).

Hypothesis to discriminate: are the 1.3-1.6x drifts vs the min-merge
baseline (a) SESSION PRESSURE — 215 plans analyzed/codegen'd in one JVM
before the drifter runs in the full bench — or (b) a real plan/code
regression in the queries themselves?

Method: run ONLY the drift queries in a fresh session (same warmup as
bench.py, same best-of-3 min), at the same sf as the baseline, and
compare both numbers:

  isolated ~= baseline, in-bench >> baseline  -> session pressure
  isolated ~= in-bench >> baseline            -> real regression

Usage: python tools/drift_probe.py [sf_dir] [out_json] [query ...]
Defaults to the r6-verdict cluster. Run on a QUIET machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CLUSTER = [
    "rare_token_stats",
    "word_entropy",
    "heavy_hitters",
    "simhash",
    "welch_ttest_value",
    "bucketed_fact_join",
    "mjs_search_bucketed_index",
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/drift_probe.json"
    names = sys.argv[3:] or DEFAULT_CLUSTER

    from multi_attribute_join_search_with_mapreduce_spark.index import cached_posting_index
    from multi_attribute_join_search_with_mapreduce_spark.session import get_spark
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    import __spark_entry__ as e

    spark = get_spark("majs-drift-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    # identical warmup to bench.py
    cached_posting_index(spark, sf_dir).count()
    load_table(spark, "events", sf_dir).count()
    spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").count()

    base = {}
    base_path = os.path.join(REPO, "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            b = json.load(f)
        if str(b.get("sf")) in sf_dir:
            base = b["queries"]

    results: dict = {"sf_dir": sf_dir, "queries": {}}
    for name in names:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        entry = {"isolated_s": round(best, 4)}
        if name in base:
            entry["baseline_s"] = base[name]
            entry["isolated_vs_baseline"] = round(best / base[name], 2)
        results["queries"][name] = entry
        print(f"# {name}: {json.dumps(entry)}", file=sys.stderr)

    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
