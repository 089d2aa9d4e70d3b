"""One-off sf1-equivalent volume exercise (r3 verdict task 7).

Builds a ×10 self-union of the sf0.1 lake's fact-bearing tables
(part/customer/supplier; replicas shift primary keys and perturb
``p_name`` so the posting vocabulary grows, while brand/type replicate
→ per-key frequency grows ×10), writes the bucketed posting index over
it, and measures:

1. bucketed-index build wall-clock at ~sf1 posting volume;
2. the flagship 3-attribute search at query sizes 1k → 200k rows —
   the query side is "thousands of rows" by assumption
   (``search.py`` broadcasts the per-row probe frame), so this sweeps
   past the assumption to find where the broadcast starts to matter;
3. the B=3 heterogeneous batch search at the same lake volume.

Usage: python tools/sf1_probe_scale.py [sf_dir] [out_json]
Writes one JSON blob with all timings; paste the numbers into SCALE.md.
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
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_probe_scale.json"
    lake = "/tmp/majs_sf1_lake"

    from multi_attribute_join_search_with_mapreduce_spark.session import get_spark
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    spark = get_spark("sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"replicas": REPLICAS, "base_sf_dir": sf_dir}

    # ---- build the ×10 lake ------------------------------------------------
    if os.path.isdir(lake):
        shutil.rmtree(lake)
    os.makedirs(lake)
    t0 = time.monotonic()
    for name in ("region", "nation"):  # dimension tables stay as-is
        load_table(spark, name, sf_dir).write.parquet(f"{lake}/{name}.parquet")

    def replicate(name: str, key: str, perturb: str | None) -> int:
        base = load_table(spark, name, sf_dir)
        n = base.count()
        reps = []
        for i in range(REPLICAS):
            r = base.withColumn(key, F.col(key) + F.lit(i * 10_000_000))
            if perturb and i > 0:  # replica 0 keeps original text
                r = r.withColumn(perturb, F.concat(F.col(perturb), F.lit(f" r{i}")))
            reps.append(r)
        big = reps[0]
        for r in reps[1:]:
            big = big.unionByName(r)
        big.write.parquet(f"{lake}/{name}.parquet")
        return n * REPLICAS

    results["part_rows"] = replicate("part", "p_partkey", "p_name")
    results["customer_rows"] = replicate("customer", "c_custkey", "c_name")
    results["supplier_rows"] = replicate("supplier", "s_suppkey", "s_name")
    results["lake_build_s"] = round(time.monotonic() - t0, 2)

    # ---- bucketed index build ----------------------------------------------
    from multi_attribute_join_search_with_mapreduce_spark.index import write_posting_index

    t0 = time.monotonic()
    write_posting_index(spark, lake, out_table="posting_index_sf1", buckets=32)
    results["bucketed_index_build_s"] = round(time.monotonic() - t0, 2)
    idx = spark.table("posting_index_sf1")
    results["posting_rows"] = idx.count()

    # ---- flagship search vs query size ------------------------------------
    from multi_attribute_join_search_with_mapreduce_spark.operators.search import (
        multi_attribute_join_search,
        multi_attribute_join_search_batch,
    )

    attrs = ["p_brand", "p_type", "p_name"]
    part = load_table(spark, "part", lake)
    sweeps = {}
    for q_rows in (1_000, 10_000, 100_000, results["part_rows"]):
        q = part.limit(q_rows) if q_rows < results["part_rows"] else part
        t0 = time.monotonic()
        tables, columns = multi_attribute_join_search(idx, q, attrs, k=20)
        tables.collect()
        columns.collect()
        sweeps[str(q_rows)] = round(time.monotonic() - t0, 2)
    results["search_by_query_rows_s"] = sweeps

    # ---- batch search (B=3 heterogeneous) ----------------------------------
    cust = load_table(spark, "customer", lake)
    supp = load_table(spark, "supplier", lake)
    t0 = time.monotonic()
    tables_b, columns_b = multi_attribute_join_search_batch(
        idx,
        [
            ("q_part", part.limit(10_000), ["p_brand", "p_type"]),
            ("q_cust", cust.limit(10_000), ["c_name", "c_mktsegment"]),
            ("q_supp", supp.limit(10_000), ["s_name"]),
        ],
        k=20,
    )
    tables_b.collect()
    columns_b.collect()
    results["batch_search_b3_s"] = round(time.monotonic() - t0, 2)

    # ---- B=8 heterogeneous batch: ×10 corpus vs base ------------------------
    # The driver-gated mjs_search_batch_hetero amortization claim (index
    # scans and fact-side shuffles constant in B) measured at ×10 posting
    # volume: run the SAME B=8 spec against a bucketed index on the base
    # sf0.1 lake and against the ×10 lake, and report the wall ratio.
    # Sub-linear in the ~×9 posting growth = the batch plan's cost is
    # dominated by the one index pass, not per-query work.
    import __spark_entry__ as entry_mod

    def run_b8(lake_dir: str, index_table: str) -> float:
        batch = [
            (qid, load_table(spark, tbl, lake_dir), battrs)
            for qid, tbl, battrs in entry_mod._BATCH8
        ]
        bidx = spark.table(index_table)
        t = time.monotonic()
        tb, cb = multi_attribute_join_search_batch(bidx, batch, k=20)
        tb.collect()
        cb.collect()
        return round(time.monotonic() - t, 2)

    write_posting_index(spark, sf_dir, out_table="posting_index_base", buckets=32)
    results["batch_hetero_b8_base_s"] = run_b8(sf_dir, "posting_index_base")
    results["batch_hetero_b8_x10_s"] = run_b8(lake, "posting_index_sf1")
    results["batch_hetero_b8_x10_ratio"] = round(
        results["batch_hetero_b8_x10_s"] / results["batch_hetero_b8_base_s"], 2
    )

    # ---- hashed (fixed-width) layout at ×10 volume --------------------------
    # Same flagship 3-attr search against the xxhash64-bucketed layout vs
    # the plain bucketed index at the ×10 posting volume: the probe runs
    # on 8-byte keys, results identical; ratio ≈1 shows the layout costs
    # nothing at width-modest keys (its win is wide-key lakes + bucket
    # layout size, SCALE.md §Round-8).
    write_posting_index(
        spark, lake, out_table="posting_index_sf1_hashed", buckets=32, hashed_keys=True
    )
    q10k = part.limit(10_000)

    def run_flagship(index_table: str) -> float:
        t = time.monotonic()
        tb, cb = multi_attribute_join_search(
            spark.table(index_table), q10k, attrs, k=20
        )
        tb.collect()
        cb.collect()
        return round(time.monotonic() - t, 2)

    results["flagship_x10_plain_s"] = run_flagship("posting_index_sf1")
    results["flagship_x10_hashed_s"] = run_flagship("posting_index_sf1_hashed")
    results["hashed_vs_plain_x10_ratio"] = round(
        results["flagship_x10_hashed_s"] / results["flagship_x10_plain_s"], 2
    )

    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
