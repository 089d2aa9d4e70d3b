"""×10 volume probe for the last two un-probed expensive families
(round 7 — VERDICT r6 task 6): PQ-ADC ANN search and the perceptual
pHash banded image join.

1. ``pq_adc_search`` over an embeddings lake self-unioned ×10 (shifted
   vec_ids, so the corpus has 10 exact copies of every vector — the
   adversarial case for a quantizer: every cell's occupancy grows ×10
   and the exact brute-force self-validation pass scans ×10 vectors).
   Scale-sound if wall-clock stays near-linear (≤ ~10×): the pipeline
   is two corpus scans (encode, ADC) + TakeOrdered — nothing
   quadratic.
2. ``media_phash_dedup`` at ``n_media`` ×10 (600 images, 200 planted
   triplet groups): the banded candidate join's fan-out is per-bucket
   occupancy; group size stays 3 while bucket COUNT grows ×10, so the
   pair output grows ~linearly and the join must too. Quadratic
   behavior (all-pairs) would show as a ~100× ratio.

Ratios are vs the same queries at ×1 in the same session, min of 2
reps per volume. Usage:
    python tools/sf1_probe_annmedia.py [sf_dir] [out_json]
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
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_probe_annmedia.json"
    lake = "/tmp/majs_sf1_annmedia_lake"

    from multi_attribute_join_search_with_mapreduce_spark.session import get_spark
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    spark = get_spark("sf1-annmedia-probe", extra_conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"replicas": REPLICAS, "base_sf_dir": sf_dir}

    if os.path.isdir(lake):
        shutil.rmtree(lake)
    os.makedirs(lake)
    base = load_table(spark, "embeddings", sf_dir)
    n_base = base.count()
    reps = [
        base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_001))
        for i in range(REPLICAS)
    ]
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    u.write.parquet(f"{lake}/embeddings.parquet")
    results["n_vectors_x1"] = n_base
    results["n_vectors_x10"] = n_base * REPLICAS

    from multi_attribute_join_search_with_mapreduce_spark.operators.multimodal import (
        N_AHASH_MEDIA,
        media_phash_dedup,
    )
    from multi_attribute_join_search_with_mapreduce_spark.operators.similarity import (
        pq_adc_search,
    )

    def probe(name: str, fn_by_label: dict, reps_n: int = 2) -> None:
        for label, fn in fn_by_label.items():
            best = float("inf")
            n = 0
            for _ in range(reps_n):
                t0 = time.monotonic()
                n = fn().count()
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

    probe(
        "pq_adc_search",
        {
            "x1": lambda: pq_adc_search(spark, sf_dir),
            "x10": lambda: pq_adc_search(spark, lake),
        },
    )
    probe(
        "media_phash_dedup",
        {
            "x1": lambda: media_phash_dedup(spark, sf_dir),
            "x10": lambda: media_phash_dedup(spark, sf_dir, n_media=10 * N_AHASH_MEDIA),
        },
    )

    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    shutil.rmtree(lake, ignore_errors=True)


if __name__ == "__main__":
    main()
