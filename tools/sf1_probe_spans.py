"""×10 probe of the steepest SCALING.md grower (VERDICT r9 task #6):
``duplicate_span_stats`` showed the top x10-step ratio in the sf0.001→
sf0.1 sweep (5.9× per 10×, still sub-quadratic). Its span merge is
bounded by doc length by construction, but that claim was untested past
sf0.1 — this probe runs the operator at ×10 the sf0.1 documents volume.

The lake is deliberately adversarial, same construction as
``sf1_probe_dedup.py``: the sf0.1 documents self-unioned ×10 with
VERBATIM text (doc_ids shifted), so EVERY positional w-gram is
cross-document duplicated — every gram bucket is a 10-clique, every
token position of every doc is marked, and the per-doc merge window
sees its maximum possible input (one row per token position). Under
that worst case the expected cost model is linear-in-corpus for the
gram aggregate + semi-join and linear-in-doc-length for the merge;
superlinearity here would mean the md5-gram bucketing claim is wrong.

Usage: python tools/sf1_probe_spans.py [sf_dir] [out_json]
Writes one JSON blob; numbers are cited in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REPLICAS = 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_probe_spans.json"
    lake = "/tmp/majs_sf1_spans_lake"

    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
        duplicate_span_stats,
    )
    from multi_attribute_join_search_with_mapreduce_spark.session import get_spark
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    spark = get_spark(
        "sf1-spans-probe", extra_conf={"spark.driver.memory": "24g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"replicas": REPLICAS, "base_sf_dir": sf_dir}

    if os.path.isdir(lake):
        shutil.rmtree(lake)
    os.makedirs(lake)
    base = load_table(spark, "documents", sf_dir)
    n_base = base.count()
    t0 = time.monotonic()
    reps = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_001))
        for i in range(REPLICAS)
    ]
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    u.write.parquet(f"{lake}/documents.parquet")
    results["lake_build_s"] = round(time.monotonic() - t0, 2)
    results["n_docs"] = n_base * REPLICAS

    # ×1 (the bench lake) then ×10, same session; min of 2 reps at each
    # volume so a CPU-steal burst can't fake superlinearity.
    for label, d in (("x1", sf_dir), ("x10", lake)):
        best = float("inf")
        n = 0
        for _ in range(2):
            t0 = time.monotonic()
            n = duplicate_span_stats(spark, d).count()
            best = min(best, time.monotonic() - t0)
        results[f"{label}_s"] = round(best, 2)
        results[f"{label}_rows"] = n
    results["ratio"] = round(results["x10_s"] / max(results["x1_s"], 1e-9), 2)

    # Adversarial-construction sanity: with verbatim ×10 replication
    # every doc is fully covered by duplicated spans (dup_frac == 1 for
    # every doc long enough to hold one w-gram).
    full = duplicate_span_stats(spark, lake)
    results["x10_min_dup_frac"] = float(
        full.agg(F.min("dup_frac")).collect()[0][0]
    )

    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    shutil.rmtree(lake, ignore_errors=True)


if __name__ == "__main__":
    main()
