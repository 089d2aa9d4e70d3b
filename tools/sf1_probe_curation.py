"""sf1-equivalent volume exercise for the curation COMPOSITION
(VERDICT r10 #8): `curation_pipeline_e2e` / `curation_decision_log` are
the production end-to-end shape (dedup → near-dup collapse → quality →
lang-id → decontaminate → mixture → split → pack → manifest) but had no
×10 probe entry; the per-stage operators each have their own.

Same adversarial lake as ``sf1_probe_dedup.py``: the sf0.1 documents
table replicated ×10 with VERBATIM text and shifted doc_ids, so every
document sits in a 10-way exact-duplicate clique — the exact-dedup
window collapses 90 % of the corpus in stage 1, every LSH band bucket
is a 10-clique for the near-dup drop set, and the downstream mixture /
packing stages see the same survivor corpus at both volumes (their
windows are per-(split,source,bucket), so equal-work there is the
CORRECT outcome; the scaling signal lives in stages 1-5 plus the
decision log, which must emit one disposition row per input doc —
500k at ×10).

Usage: python tools/sf1_probe_curation.py [sf_dir] [out_json]
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
    out_json = (
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_probe_curation.json"
    )
    lake = "/tmp/majs_sf1_curation_lake"

    from multi_attribute_join_search_with_mapreduce_spark.session import get_spark
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    spark = get_spark(
        "sf1-curation-probe", extra_conf={"spark.driver.memory": "24g"}
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

    from multi_attribute_join_search_with_mapreduce_spark.operators.curation import (
        curation_decision_log,
        curation_pipeline_e2e,
    )

    def probe(name: str, fn) -> None:
        # ×1 then ×10, min of 2 reps each so a host-steal burst cannot
        # fake superlinearity (same discipline as the other probes).
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

    probe("curation_pipeline_e2e", curation_pipeline_e2e)
    probe("curation_decision_log", curation_decision_log)

    # Construction sanity: the decision log covers EVERY input doc at
    # ×10 (one disposition row per document), and the exact-dedup stage
    # saw the full clique structure: drop_exact count must equal
    # n_docs − distinct_texts (the base corpus itself carries a few
    # exact duplicates, so "9/10 of the corpus" is the floor, not the
    # exact figure).
    log = curation_decision_log(spark, lake)
    results["log_covers_all_docs"] = log.count() == results["n_docs"]
    drop_exact = log.filter(F.col("disposition") == "drop_exact").count()
    distinct_texts = (
        load_table(spark, "documents", lake)
        .select(F.md5("text")).distinct().count()
    )
    results["drop_exact_rows"] = drop_exact
    results["distinct_texts"] = distinct_texts
    results["drop_exact_matches_cliques"] = (
        drop_exact == results["n_docs"] - distinct_texts
    )

    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    shutil.rmtree(lake, ignore_errors=True)


if __name__ == "__main__":
    main()
