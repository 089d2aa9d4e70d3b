"""×10 whole-lake (wide-key) index probe + skewed-probe-key stress.

VERDICT r8 tasks #3 and #4. The r8 hashed fixed-width layout
(`write_posting_index(..., hashed_keys=True)`) was probed only on short
dimension keys (1.02× vs plain); its payoff claim is width-independent
probe cost on WIDE keys — the whole-lake index's free-text cells
(documents.text, ~100 chars avg at sf0.1). This probe measures, at ×10
documents volume over the WIDE_LAKE_TABLES specs:

1. plain vs hashed index build wall + on-disk bytes;
2. a wide-key probe — query = a documents sample searched on
   ``["text"]`` (every probe key is a full text cell) — plain vs
   hashed layout;
3. the ``mjs_search_lake_wide`` probe shape (documents over
   lang×source, hot short keys) — plain vs hashed;
4. ingest-time frequency floor (``min_key_freq=2``) at the same
   volume: posting reduction, build cost, and the wide-key probe
   against the floored index;
5. skewed-probe-key stress (task #4): a hot-key lake where one
   ``source`` value carries ≥10 % of ALL postings, searched with the
   probe-side broadcast SUPPRESSED (the 100 TB fact-sized-query case —
   with a broadcast probe there is no skew exposure at all, which the
   probe also records). Reports hot vs uniform wall ratio and whether
   AQE's skew-join rewrite fired in the executed plan.

Usage: python tools/sf1_probe_widekey.py [sf_dir] [out_json]
Writes one JSON blob; paste the numbers into SCALE.md.
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
HOT_SOURCE = "hot-source-value"


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "sf1_probe_widekey.json")
    )

    from multi_attribute_join_search_with_mapreduce_spark.index import (
        WIDE_LAKE_TABLES,
        build_posting_index,
        write_posting_index,
    )
    from multi_attribute_join_search_with_mapreduce_spark.operators.search import (
        _probe_broadcastable,
        multi_attribute_join_search,
    )
    from multi_attribute_join_search_with_mapreduce_spark.session import get_spark
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    spark = get_spark("widekey-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"replicas": REPLICAS, "base_sf_dir": sf_dir}

    # ---- ×10 documents lakes: uniform and hot-key variants ----------------
    def build_lake(lake: str, hot: bool) -> None:
        if os.path.isdir(lake):
            shutil.rmtree(lake)
        os.makedirs(lake)
        for name in ("region", "nation", "customer", "supplier", "part", "events",
                     "embeddings"):
            load_table(spark, name, sf_dir).write.parquet(f"{lake}/{name}.parquet")
        base = load_table(spark, "documents", sf_dir)
        reps = []
        for i in range(REPLICAS):
            r = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
            if i > 0:
                # vocabulary grows ×10 (singleton text keys stay singletons —
                # the case the frequency floor exists for)
                r = r.withColumn("text", F.concat(F.col("text"), F.lit(f" r{i}")))
            reps.append(r)
        big = reps[0]
        for r in reps[1:]:
            big = big.unionByName(r)
        if hot:
            # 90% of replicated docs share ONE source value -> that key is
            # ~45k of ~450k postings (>=10% of the whole index)
            big = big.withColumn(
                "source",
                F.when(F.col("doc_id") % 10 < 9, F.lit(HOT_SOURCE)).otherwise(
                    F.col("source")
                ),
            )
        big.write.parquet(f"{lake}/documents.parquet")

    lake_u = "/tmp/majs_widekey_lake"
    lake_h = "/tmp/majs_widekey_lake_hot"
    t0 = time.monotonic()
    build_lake(lake_u, hot=False)
    build_lake(lake_h, hot=True)
    results["lake_build_s"] = round(time.monotonic() - t0, 2)
    results["documents_rows"] = REPLICAS * load_table(
        spark, "documents", sf_dir
    ).count()

    # ---- wide index builds: plain / hashed / floored -----------------------
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")

    def build_index(table: str, **kw) -> float:
        t = time.monotonic()
        write_posting_index(
            spark, lake_u, out_table=table, buckets=32, specs=WIDE_LAKE_TABLES, **kw
        )
        return round(time.monotonic() - t, 2)

    results["wide_build_plain_s"] = build_index("pidx_wide_plain")
    results["wide_build_hashed_s"] = build_index("pidx_wide_hashed", hashed_keys=True)
    results["wide_build_floor2_s"] = build_index("pidx_wide_floor2", min_key_freq=2)
    results["postings_plain"] = spark.table("pidx_wide_plain").count()
    results["postings_floor2"] = spark.table("pidx_wide_floor2").count()
    results["bytes_plain"] = _du(os.path.join(wh, "pidx_wide_plain"))
    results["bytes_hashed"] = _du(os.path.join(wh, "pidx_wide_hashed"))
    results["avg_key_chars"] = round(
        spark.table("pidx_wide_plain")
        .agg(F.avg(F.length("key")))
        .collect()[0][0],
        1,
    )

    # ---- probes: wide-key (text) and lake-wide (lang×source) ---------------
    docs = load_table(spark, "documents", lake_u)
    q_text = docs.limit(5_000)

    def run_search(index_table: str, q, attrs, **kw) -> float:
        best = float("inf")
        for _ in range(3):
            t = time.monotonic()
            tb, cb = multi_attribute_join_search(
                spark.table(index_table), q, attrs, k=20, **kw
            )
            tb.collect()
            cb.collect()
            best = min(best, time.monotonic() - t)
        return round(best, 2)

    for layout in ("plain", "hashed"):
        results[f"probe_text_{layout}_s"] = run_search(
            f"pidx_wide_{layout}", q_text, ["text"]
        )
        results[f"probe_langsource_{layout}_s"] = run_search(
            f"pidx_wide_{layout}", docs, ["lang", "source"]
        )
    results["probe_text_hashed_vs_plain_ratio"] = round(
        results["probe_text_hashed_s"] / results["probe_text_plain_s"], 2
    )
    results["probe_langsource_hashed_vs_plain_ratio"] = round(
        results["probe_langsource_hashed_s"] / results["probe_langsource_plain_s"], 2
    )
    results["probe_text_floor2_s"] = run_search("pidx_wide_floor2", q_text, ["text"])

    # ---- task #4: skewed probe key, broadcast suppressed -------------------
    # The hot lake's index: one source value carries >=10% of postings.
    write_posting_index(
        spark, lake_h, out_table="pidx_wide_hot", buckets=32, specs=WIDE_LAKE_TABLES
    )
    hot_share = (
        spark.table("pidx_wide_hot")
        .groupBy("key")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()[0]
    )
    results["hot_key_postings"] = hot_share["count"]
    results["hot_key_share"] = round(
        hot_share["count"] / spark.table("pidx_wide_hot").count(), 3
    )
    docs_hot = load_table(spark, "documents", lake_h)
    results["probe_side_auto_broadcast"] = _probe_broadcastable(docs_hot)

    # broadcast suppressed = the 100 TB fact-sized-query path where the
    # hits ⨝ probe stage becomes a shuffle join keyed on probe_key
    results["skew_hot_nobcast_s"] = run_search(
        "pidx_wide_hot", docs_hot, ["lang", "source"], broadcast_probe=False
    )
    results["skew_uniform_nobcast_s"] = run_search(
        "pidx_wide_plain", docs, ["lang", "source"], broadcast_probe=False
    )
    results["skew_hot_vs_uniform_ratio"] = round(
        results["skew_hot_nobcast_s"] / results["skew_uniform_nobcast_s"], 2
    )
    # Did AQE's skew-join rewrite fire? Inspect the executed adaptive plan.
    tb, cb = multi_attribute_join_search(
        spark.table("pidx_wide_hot"), docs_hot, ["lang", "source"], k=20,
        broadcast_probe=False,
    )
    tb.collect()
    plan = tb._jdf.queryExecution().executedPlan().toString()
    results["aqe_skew_rewrite_fired"] = "skew=true" in plan

    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
