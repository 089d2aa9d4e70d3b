"""Composition proof for the end-to-end curation pipeline
(``curation_pipeline_e2e``): the stages chain as one DAG whose
corpus-wide exchanges are exactly the ones the semantics require, with
no driver round-trips. Exact end-to-end value matching lives in
tests/test_queries_differential.py (chained-CTE DuckDB oracle)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.operators.curation import (
    curation_pipeline_e2e,
)


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_curation_plan_collect_free_and_shuffle_bounded(spark, sf_dir):
    """The composed manifest plan: no cartesian products, no
    row-at-a-time Python, and the corpus's own exchanges are exactly
    the semantic ones — ONE packing-window shuffle on (split, source,
    bucket) downstream of the checkpoint barrier. Everything else in
    the downstream plan is the broadcast rate table and the final
    manifest aggregate."""
    df = curation_pipeline_e2e(spark, sf_dir)
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the packing window's exchange appears exactly once
    assert len(re.findall(r"hashpartitioning\(split", plan)) == 1
    # downstream of the barrier the only other hash exchanges are the
    # source-keyed rate aggregate (audit-sized) and the manifest agg
    parts = {
        m.split("#")[0]
        for m in re.findall(r"hashpartitioning\(([^,)]+)", plan)
    }
    assert parts <= {"split", "source"}, parts


def test_curation_upstream_corpus_exchanges_are_semantic(spark, sf_dir):
    """The gated-corpus subplan (everything upstream of the barrier):
    the corpus itself is exchanged only for the exact-dedup window's
    content-hash partitioning; the near-dup and contamination stages
    join against doc_id-keyed DROP SETS (small vs corpus), and the
    quality/lang/eval gates are pure map-side filters (no exchange at
    all)."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import (
        dedup_clusters,
    )
    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import (
        _n_tokens,
    )
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
        _EVAL_MOD,
        decontaminate,
        lang_pred_col,
        quality_score_col,
    )
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", "lang", "text"
    )
    w_hash = Window.partitionBy(F.md5("text"))
    corpus = (
        docs.withColumn("_keep", F.min("doc_id").over(w_hash))
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_keep")
    )
    nd_drop = (
        dedup_clusters(spark, sf_dir)
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .select("doc_id")
    )
    corpus = corpus.join(nd_drop, "doc_id", "left_anti")
    corpus = corpus.filter(quality_score_col(F.col("text")) >= 0.75)
    corpus = corpus.filter(lang_pred_col(F.col("text")) == F.col("lang"))
    corpus = corpus.filter(F.col("doc_id") % _EVAL_MOD != 0)
    corpus = corpus.join(decontaminate(spark, sf_dir).select("doc_id"), "doc_id", "left_anti")
    per_doc = corpus.select(
        "doc_id", "source", _n_tokens().cast("long").alias("n_tok")
    )
    plan = _formatted_plan(per_doc)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the exact-dedup window's content-hash exchange: once
    assert len(re.findall(r"hashpartitioning\(_w0", plan)) == 1
    # the corpus is never hash-exchanged on its own doc_id for the
    # drop-set joins more than the two anti-joins require; the drop-set
    # SIDES may shuffle freely (they are small). Count only exchanges
    # whose first key is the corpus row id:
    corpus_id_exchanges = len(re.findall(r"hashpartitioning\(doc_id", plan))
    assert corpus_id_exchanges <= 2, plan


def test_curation_manifest_tokens_match_shard_budget(spark, sf_dir):
    """Sanity on the packed output: a shard never exceeds the token
    budget except via a single over-budget document (greedy packing's
    contract), and the manifest is non-empty at sf0.001."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import (
        _SHARD_TOKEN_BUDGET,
    )

    rows = curation_pipeline_e2e(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= 1
        # greedy running-sum packing: a shard holding >1 doc started
        # under budget, so only its last doc can spill past it; a shard
        # may exceed the budget only by less than one document's worth
        # of tokens on average — weak but engine-agnostic bound:
        if r.n_docs > 1:
            assert r.shard_tokens - _SHARD_TOKEN_BUDGET < r.shard_tokens / r.n_docs * 2


def test_decision_log_reconciles_with_manifest(spark, sf_dir):
    """The audit and the manifest are two views of ONE chain: the
    per-source count of 'kept' dispositions must equal the per-source
    sum of manifest doc counts, and every document gets exactly one
    disposition row."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.curation import (
        curation_decision_log,
    )
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    log = curation_decision_log(spark, sf_dir)
    manifest = curation_pipeline_e2e(spark, sf_dir)
    kept = {
        r.source: r.n
        for r in log.filter("disposition = 'kept'")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    man = {
        r.source: r.n
        for r in manifest.groupBy("source").agg(F.sum("n_docs").alias("n")).collect()
    }
    assert kept == man
    assert log.count() == load_table(spark, "documents", sf_dir).count()
    assert log.groupBy("doc_id").count().filter("count > 1").count() == 0
