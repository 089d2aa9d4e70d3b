"""sf1-equivalent GRAPH-FIXPOINT + STREAMING-INGEST volume exercise
(round 6 — VERDICT r5 task 6).

``sf1_probe_scale.py`` covers the flagship search and
``sf1_probe_dedup.py`` the dedup cascade; this probe covers the two
remaining expensive families at ×10 volume:

1. the iterative graph tier — ``kcore_near_dup``, ``lpa_communities``,
   ``contamination_radius`` — over the adversarial 10-clique lake
   (the sf0.1 documents self-unioned ×10 with verbatim text), where the
   near-dup EDGE set blows up ~three orders of magnitude (measured
   ×979: every band bucket holds a 10-clique, and the ≥0.5-jaccard
   edge filter passes the verbatim pairs), so the fixpoints run on a
   graph ~1000× denser than the bench's;
2. ``stream_near_dup_ingest`` — the checkpointed multi-trigger LSH
   ingest, whose per-trigger work must stay O(batch·bucket), not
   O(corpus). (Its candidate PAIR output grows ×372 — a different
   number than the edge blowup above, because pairs are pre-threshold.)

A family is scale-sound if its ×10 wall-clock ratio stays well under
its structure blowup — the measured edge blowup (×979) for the
edge-linear fixpoints, ×10 input volume for the batch-linear streaming
ingest. Ratios are vs the same queries on the ×1 lake in the same
session, min of 2 reps per volume.

Usage: python tools/sf1_probe_graph.py [sf_dir] [out_json]
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
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_probe_graph.json"
    lake = "/tmp/majs_sf1_graph_lake"

    from multi_attribute_join_search_with_mapreduce_spark.session import get_spark
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    spark = get_spark("sf1-graph-probe", extra_conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"replicas": REPLICAS, "base_sf_dir": sf_dir}

    if os.path.isdir(lake):
        shutil.rmtree(lake)
    os.makedirs(lake)
    base = load_table(spark, "documents", sf_dir)
    n_base = base.count()
    t0 = time.monotonic()
    # Same shifted-replica construction as sf1_probe_dedup.py: verbatim
    # text ×10 puts every doc in a 10-way near-dup clique.
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
        _candidate_edges,
        contamination_radius,
        kcore_near_dup,
        lpa_communities,
    )
    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
        stream_near_dup_ingest,
    )

    # Edge-graph sizes at both volumes (and warm the per-sf edge cache
    # so the fixpoint timings measure rounds, not the shared build —
    # bench and any multi-query session amortize it the same way).
    for label, d in (("x1", sf_dir), ("x10", lake)):
        t0 = time.monotonic()
        results[f"edges_{label}"] = _candidate_edges(spark, d).count()
        results[f"edge_build_{label}_s"] = round(time.monotonic() - t0, 2)
    results["edge_blowup"] = round(
        results["edges_x10"] / max(results["edges_x1"], 1), 1
    )

    def probe(name: str, fn, reps_n: int = 2) -> None:
        for label, d in (("x1", sf_dir), ("x10", lake)):
            best = float("inf")
            n = 0
            for _ in range(reps_n):
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

    probe("kcore_near_dup", kcore_near_dup)
    probe("lpa_communities", lpa_communities)
    probe("contamination_radius", contamination_radius)
    # Streaming: each rep runs a full fresh 5-trigger checkpointed
    # ingest (the query stages its own scratch store per call).
    probe("stream_near_dup_ingest", stream_near_dup_ingest)

    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    shutil.rmtree(lake, ignore_errors=True)


if __name__ == "__main__":
    main()
