"""×10 volume probe for the streaming session-window aggregate
(round 7 — evidence for the newest stateful operator).

``stream_session_window``'s scale claim: state is bounded by OPEN
sessions inside the watermark horizon, and per-trigger work by the
batch — so ×10 events (the sf0.1 fixture self-unioned with shifted
user_ids, which multiplies both the event volume and the concurrent
session count by 10) should cost well under ×10 wall-clock on the
same trigger count. Quadratic state handling (e.g. re-sorting the
whole store per trigger) would blow past ×10.

Usage: python tools/sf1_probe_stream_session.py [sf_dir] [out_json]
Min of 2 reps per volume; run on a QUIET machine; cited in SCALE.md.
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
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_probe_stream_session.json"
    lake = "/tmp/majs_sf1_sesswin_lake"

    from multi_attribute_join_search_with_mapreduce_spark.session import get_spark
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table
    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
        stream_session_window,
    )

    spark = get_spark("sf1-sesswin-probe", extra_conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"replicas": REPLICAS, "base_sf_dir": sf_dir}

    if os.path.isdir(lake):
        shutil.rmtree(lake)
    os.makedirs(lake)
    base = load_table(spark, "events", sf_dir)
    n_base = base.count()
    reps = [
        base.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_001))
        .withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_001))
        for i in range(REPLICAS)
    ]
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    u.write.parquet(f"{lake}/events.parquet")
    results["n_events_x1"] = n_base
    results["n_events_x10"] = n_base * REPLICAS

    for label, d in (("x1", sf_dir), ("x10", lake)):
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.monotonic()
            n = stream_session_window(spark, d).count()
            best = min(best, time.monotonic() - t0)
        results[f"sessions_{label}"] = n
        results[f"wall_{label}_s"] = round(best, 2)
    results["ratio"] = round(results["wall_x10_s"] / max(results["wall_x1_s"], 1e-9), 2)
    print(json.dumps(results))
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    shutil.rmtree(lake, ignore_errors=True)


if __name__ == "__main__":
    main()
