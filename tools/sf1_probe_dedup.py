"""sf1-equivalent DEDUP volume exercise (round 5).

The search path's ×10 probe lives in ``sf1_probe_scale.py``; this is the
dedup tier's counterpart, and deliberately the adversarial shape: the
sf0.1 documents table self-unioned ×10 with VERBATIM text (doc_ids
shifted per replica), so every document sits in a 10-way exact-duplicate
group — 50k docs, ~5k duplicate cliques. That is the worst case for LSH
banding (every band bucket holds ≥10 docs → C(10,2)+ pairs per bucket)
and the best possible stress of the claims in SCALE.md:

1. ``dedup_exact``       — hash groupBy at ×10 volume;
2. ``near_dup_candidates`` — banded pair generation when EVERY bucket is
   a 10-clique (pair count ~45×groups, still bucket-occupancy-bounded,
   never corpus²);
3. ``dedup_clusters``    — CC convergence over ~5k 10-cliques;
4. ``dedup_decision_log`` — the full cascade at ×10;
5. ``dedup_exact_delta`` — Bloom prefilter where ~100% of the batch IS
   in the base (every probe survives the filter and pays the confirm
   join — the filter's worst case, the join's upper bound).

Usage: python tools/sf1_probe_dedup.py [sf_dir] [out_json]
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
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_probe_dedup.json"
    lake = "/tmp/majs_sf1_dedup_lake"

    from multi_attribute_join_search_with_mapreduce_spark.session import get_spark
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    spark = get_spark(
        "sf1-dedup-probe", extra_conf={"spark.driver.memory": "24g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"replicas": REPLICAS, "base_sf_dir": sf_dir}

    if os.path.isdir(lake):
        shutil.rmtree(lake)
    os.makedirs(lake)
    base = load_table(spark, "documents", sf_dir)
    n_base = base.count()
    t0 = time.monotonic()
    # Shift by a non-multiple of 10 so a text's copies spread across all
    # doc_id % 10 residues — each group then has exactly one member in
    # the delta batch (doc_id % 10 == 0) and nine in the base, which is
    # what makes `delta_all_in_base` a meaningful check.
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

    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import (
        dedup_clusters,
        dedup_decision_log,
    )
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
        dedup_exact,
        dedup_exact_delta,
        near_dup_candidates,
    )

    def probe(name: str, fn) -> None:
        # ×1 (the bench lake) then ×10, same session; min of 2 reps at
        # each volume so a CPU-steal burst can't fake superlinearity.
        for label, d in (("x1", sf_dir), ("x10", lake)):
            best = float("inf")
            n = 0
            for _ in range(2):
                t0 = time.monotonic()
                n = fn(spark, d).count()
                best = min(best, time.monotonic() - t0)
            results[f"{name}_{label}_s"] = round(best, 2)
            results[f"{name}_{label}_rows"] = n
        ratio = results[f"{name}_x10_s"] / max(results[f"{name}_x1_s"], 1e-9)
        results[f"{name}_ratio"] = round(ratio, 2)
        print(
            f"# {name}: x1 {results[f'{name}_x1_s']}s "
            f"({results[f'{name}_x1_rows']} rows) -> x10 "
            f"{results[f'{name}_x10_s']}s ({results[f'{name}_x10_rows']} "
            f"rows), ratio {results[f'{name}_ratio']}",
            file=sys.stderr,
        )

    probe("dedup_exact", dedup_exact)
    probe("near_dup_candidates", near_dup_candidates)
    probe("dedup_clusters", dedup_clusters)
    probe("dedup_decision_log", dedup_decision_log)
    probe("dedup_exact_delta", dedup_exact_delta)

    # Sanity of the adversarial construction: every exact group has
    # exactly REPLICAS members, and the delta batch (doc_id % 10 == 0)
    # is a systematic slice whose texts all exist in the base.
    g = dedup_exact(spark, lake).agg(
        F.min("n_copies").alias("lo"), F.max("n_copies").alias("hi")
    ).collect()[0]
    results["exact_group_min"] = int(g["lo"])
    results["exact_group_max"] = int(g["hi"])
    delta = dedup_exact_delta(spark, lake)
    results["delta_all_in_base"] = (
        delta.filter(~F.col("in_base")).count() == 0
    )
    results["delta_bloom_sound"] = (
        delta.filter(~F.col("bloom_sound")).count() == 0
    )

    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    shutil.rmtree(lake, ignore_errors=True)


if __name__ == "__main__":
    main()
