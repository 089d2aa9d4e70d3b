"""One-session A/B for the batch-search query-side dedup collapse.

Runs the CURRENT multi_attribute_join_search_batch (one post-union
dedup) against a pasted-in copy of the r10 form (per-entry
dropDuplicates) in the SAME Spark session, alternating reps, so host
epochs hit both variants equally. Prints min/median per variant.
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.functions.text import normalize_col
from multi_attribute_join_search_with_mapreduce_spark.operators import search as S
from multi_attribute_join_search_with_mapreduce_spark.index import cached_posting_index
from multi_attribute_join_search_with_mapreduce_spark.session import get_spark
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

import __spark_entry__ as e


def batch_old(postings, batch, k=S.DEFAULT_TOP_K, broadcast_probe=None, top_n=None):
    """r10 form: per-entry dropDuplicates()."""
    qrows = None
    for entry in batch:
        qid, query_df, attrs = entry[0], entry[1], entry[2]
        entry_top_n = entry[3] if len(entry) > 3 else None
        eff_top_n = entry_top_n if entry_top_n is not None else top_n
        n = len(attrs)
        rank_n = eff_top_n if eff_top_n is not None else n
        norm = query_df.select(
            *[normalize_col(F.col(a)).alias(f"_a{i}") for i, a in enumerate(attrs)]
        )
        for i in range(n):
            norm = norm.filter(F.col(f"_a{i}") != "")
        norm = norm.dropDuplicates()
        q = norm.select(
            F.lit(qid).alias("qid"),
            F.concat_ws(S.MAPKEY_SEP, *[F.col(f"_a{i}") for i in range(n)]).alias("MapKey"),
            F.array(*[F.col(f"_a{i}") for i in range(n)]).alias("_attrs"),
            F.lit(n).alias("_n"),
            F.lit(rank_n).alias("_rank_n"),
        )
        qrows = q if qrows is None else qrows.unionByName(q)

    melted = qrows.select("qid", "MapKey", "_n", F.explode("_attrs").alias("key"))
    keys = melted.select("key").distinct()
    hint = S._hinter(qrows, broadcast_probe)
    probed = S._probe_index(postings, keys, hint)
    freq = probed.groupBy("key").agg(F.count(F.lit(1)).alias("_freq"))
    with_freq = freq.join(hint(melted), "key")
    w_rare = Window.partitionBy("qid", "MapKey").orderBy(F.asc("_freq"), F.asc("key"))
    rarest = (
        with_freq.withColumn("_rn", F.row_number().over(w_rare))
        .withColumn("_n_present", F.count(F.lit(1)).over(Window.partitionBy("qid", "MapKey")))
        .filter((F.col("_rn") == 1) & (F.col("_n_present") == F.col("_n")))
        .select("qid", "MapKey", F.col("key").alias("probe_key"))
    )
    probe = rarest.join(qrows, ["qid", "MapKey"])
    deduped = (
        probed.repartition("table", "row")
        .groupBy("table", "row", "key")
        .agg(F.min("column").alias("column"))
    )
    min_n = min(len(entry[2]) for entry in batch)
    kc = (
        deduped.groupBy("table", "row")
        .agg(F.map_from_entries(F.collect_list(F.struct("key", "column"))).alias("_m"))
        .filter(F.size("_m") >= min_n)
    )
    hits = kc.select(
        "table", "row", "_m", F.explode(F.map_keys("_m")).alias("key")
    ).join(hint(probe), F.col("key") == F.col("probe_key"))
    verified = hits.filter(
        F.forall("_attrs", lambda a: F.element_at(F.col("_m"), a).isNotNull())
    )
    matched = verified.select(
        "qid", "_rank_n", "table", F.explode("_attrs").alias("_mk"), "_m"
    ).select("qid", "_rank_n", "table", F.col("_m")[F.col("_mk")].alias("column"))
    col_scores_all = matched.groupBy("qid", "table", "column").agg(
        F.count(F.lit(1)).alias("join_score"), F.min("_rank_n").alias("_rank_n")
    )
    w_rank = Window.partitionBy("qid", "table").orderBy(F.desc("join_score"), F.asc("column"))
    top_cols = (
        col_scores_all.withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") <= F.col("_rank_n"))
        .drop("_rn")
    )
    w_tab = Window.partitionBy("qid").orderBy(F.desc("join_score"), F.asc("table"))
    table_scores = (
        top_cols.groupBy("qid", "table")
        .agg(F.sum("join_score").alias("join_score"))
        .withColumn("_rn", F.row_number().over(w_tab))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("qid", F.desc("join_score"), F.asc("table"))
    )
    return table_scores


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("majs-ab")
    cached_posting_index(spark, sf_dir).count()
    spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").count()

    spec = e._BATCH8
    postings = cached_posting_index(spark, sf_dir)

    def run_new():
        batch = [(x[0], load_table(spark, x[1], sf_dir), x[2], *x[3:]) for x in spec]
        t, _ = S.multi_attribute_join_search_batch(postings, batch)
        return t.count()

    def run_old():
        batch = [(x[0], load_table(spark, x[1], sf_dir), x[2], *x[3:]) for x in spec]
        return batch_old(postings, batch).count()

    reps = int(os.environ.get("AB_REPS", "5"))
    times: dict[str, list[float]] = {"old": [], "new": []}
    run_old(); run_new()  # warm both shapes once
    for _ in range(reps):
        for name, fn in (("old", run_old), ("new", run_new)):
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f}s median={statistics.median(ts):.3f}s all={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()
