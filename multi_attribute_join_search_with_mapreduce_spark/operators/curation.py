"""The end-to-end curation pipeline as ONE lazy DAG (VERDICT r9 #3).

Every stage here is individually gated elsewhere; this module proves
they COMPOSE — the production shape of a pretraining-corpus build:

    exact dedup → near-dup canonical → quality gate → lang-id gate →
    decontaminate → temperature mixture → train/test split →
    pack_shards → per-shard manifest

Two driver-gated artifacts come out of the same chain:

- :func:`curation_pipeline_e2e` — the per-shard MANIFEST (what ships);
- :func:`curation_decision_log` — the per-document DISPOSITION audit
  (why each document was kept or at which stage it was dropped, in
  pipeline order), the compliance artifact a production curation run
  records next to the shards.

The whole chain is declared against one ``documents`` scan and returns
the per-shard manifest; nothing is collected between stages (the one
materialization barrier is a lineage checkpoint of the 3-column gated
corpus — see stage 6), and the corpus itself is only ever re-shuffled
where the SEMANTICS require a corpus-wide key exchange (plan-asserted
in ``tests/test_curation_pipeline.py``):

1. the exact-dedup window (partition by content hash),
2. the packing window (partition by (split, source, bucket)),
3. the final manifest aggregate (map-side partial first).

Every other stage is a map-side filter (quality, lang, eval-holdout,
the md5 temperature gate against a broadcast rate table) or an
anti-join against a DROP SET that is orders of magnitude smaller than
the corpus (near-dup non-representatives, contaminated doc ids) — at
100 TB the drop sets are the only state that moves, never the corpus.

Reference anchor: SURVEY.md §7 M5 specifies the stages; composition is
its unstated contract. The DuckDB oracles are the same chain as one
chained-CTE statement each, so manifest AND audit are value-hash
checked end-to-end, not per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.index import truncate_lineage
from multi_attribute_join_search_with_mapreduce_spark.operators.graph import (
    _cc_ctes,
    dedup_clusters,
)
from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import (
    _BUCKET_SQL,
    _N_TOKENS_SQL,
    _SHARD_TOKEN_BUDGET,
    _SPLIT_SQL,
    _bucket_col,
    _n_tokens,
    _split_col,
    temperature_kept,
    temperature_rates,
)
from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
    _EVAL_MOD,
    LANG_ID_SQL,
    QUALITY_SQL,
    decontaminate,
    decontaminate_sql,
    lang_pred_col,
    quality_score_col,
)
from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table


def _nd_drop(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup non-representatives (the canonical-collapse drop set)."""
    return (
        dedup_clusters(spark, sf)
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .select("doc_id")
    )


def _contaminated(spark: SparkSession, sf: str) -> DataFrame:
    """Training docs sharing any w-gram with the eval holdout."""
    return decontaminate(spark, sf).select("doc_id")


def curation_pipeline_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """The composed pipeline; returns the per-shard manifest
    ``(split, source, bucket, shard, n_docs, shard_tokens)``."""
    docs = load_table(spark, "documents", sf).select(
        "doc_id", "source", "lang", "text"
    )

    # 1. exact dedup: survivor = min doc_id per content hash (ONE
    #    corpus-wide exchange, on the hash)
    w_hash = Window.partitionBy(F.md5("text"))
    corpus = (
        docs.withColumn("_keep", F.min("doc_id").over(w_hash))
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_keep")
    )

    # 2. near-dup canonical: drop clustered non-representatives (the
    #    MinHash-LSH + connected-components drop set; small vs corpus)
    corpus = corpus.join(_nd_drop(spark, sf), "doc_id", "left_anti")

    # 3.+4. quality and lang-id gates: pure map-side filters
    corpus = corpus.filter(quality_score_col(F.col("text")) >= 0.75)
    corpus = corpus.filter(lang_pred_col(F.col("text")) == F.col("lang"))

    # 5. decontaminate: hold out the eval slice itself, then drop every
    #    training doc sharing a w-gram with it (drop set ≪ corpus)
    corpus = corpus.filter(F.col("doc_id") % _EVAL_MOD != 0)
    corpus = corpus.join(_contaminated(spark, sf), "doc_id", "left_anti")

    # 6. temperature mixture: rates from the SURVIVING corpus (the
    #    composition point — upstream gates change the mixture), then a
    #    map-side md5 gate against the broadcast per-source rate table.
    #    per_doc is the pipeline's ONE materialization barrier: the
    #    rate aggregate and the gate both consume the gated corpus, and
    #    without the checkpoint Catalyst instantiates the whole
    #    upstream (dedup window, drop-set joins, gram sets) once per
    #    consumer. Materialized it is 3 narrow columns — the corpus
    #    with its text dropped — exactly the intermediate a production
    #    build persists between curation and packing.
    per_doc = truncate_lineage(
        corpus.select("doc_id", "source", _n_tokens().cast("long").alias("n_tok"))
    )
    kept = temperature_kept(per_doc).drop("keep_rate")

    # 7.+8. split, then pack into fixed-token-budget shards (the second
    #    corpus-wide exchange: the packing window's running sum)
    kept = kept.withColumn("split", _split_col()).withColumn(
        "bucket", _bucket_col()
    )
    w_pack = (
        Window.partitionBy("split", "source", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = kept.withColumn("sum_tok", F.sum("n_tok").over(w_pack)).withColumn(
        "shard", F.expr(f"(sum_tok - n_tok) div {_SHARD_TOKEN_BUDGET}")
    )

    # 9. per-shard manifest (map-side partial aggregate)
    return (
        packed.groupBy("split", "source", "bucket", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("shard_tokens"),
        )
        .orderBy("split", "source", "bucket", "shard")
    )


def curation_decision_log(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document disposition audit of the SAME chain: every document
    and the FIRST pipeline stage that dropped it — ``drop_exact`` /
    ``drop_near_dup`` / ``drop_quality`` / ``drop_lang`` /
    ``eval_holdout`` / ``drop_contaminated`` / ``drop_mixture`` /
    ``kept`` — in pipeline order, so the counts reconcile exactly with
    the manifest's kept set (tested). The corpus is never re-shuffled
    for the audit: stage flags are window/map-side columns plus
    left-join markers against the same small drop sets, and the
    mixture threshold arrives as the broadcast rate table computed
    over the pre-mixture survivors (identical to the pipeline's).
    """
    docs = load_table(spark, "documents", sf).select(
        "doc_id", "source", "lang", "text"
    )
    w_hash = Window.partitionBy(F.md5("text"))
    # The narrow per-doc flag table is the audit's ONE materialization
    # barrier (the pipeline's per_doc pattern, stage 6): the rate
    # aggregate and the log output both consume every stage flag, and
    # without the checkpoint Catalyst instantiates the whole upstream —
    # documents scan, content-hash window, quality/lang text
    # expressions, both drop-set builds — once per consumer (the r10
    # plan carried 93 Exchanges; the text gates ran twice per doc).
    # Materialized it is doc_id + source + six booleans + n_tok.
    flagged = truncate_lineage(
        docs.withColumn(
            "_exact_keep", F.col("doc_id") == F.min("doc_id").over(w_hash)
        )
        .join(
            _nd_drop(spark, sf).withColumn("_nd", F.lit(True)), "doc_id", "left"
        )
        .join(
            _contaminated(spark, sf).withColumn("_cont", F.lit(True)),
            "doc_id",
            "left",
        )
        .withColumn("_qual", quality_score_col(F.col("text")) >= 0.75)
        .withColumn("_lang", lang_pred_col(F.col("text")) == F.col("lang"))
        .withColumn("_eval", F.col("doc_id") % _EVAL_MOD == 0)
        .select(
            "doc_id",
            "source",
            "_exact_keep",
            "_nd",
            "_cont",
            "_qual",
            "_lang",
            "_eval",
            _n_tokens().cast("long").alias("n_tok"),
        )
    )
    corpus0 = flagged.filter(
        F.col("_exact_keep")
        & F.col("_nd").isNull()
        & F.col("_qual")
        & F.col("_lang")
        & ~F.col("_eval")
        & F.col("_cont").isNull()
    )
    rates = temperature_rates(
        corpus0.select("doc_id", "source", "n_tok")
    ).select("source", "thr_hex")
    # left join: a source absent from the rate table has NO pre-mixture
    # survivors, so none of its docs can REACH the mixture branch — the
    # NULL threshold is unreachable by CASE order.
    log = flagged.join(F.broadcast(rates), "source", "left")
    disposition = (
        F.when(~F.col("_exact_keep"), "drop_exact")
        .when(F.col("_nd"), "drop_near_dup")
        .when(~F.col("_qual"), "drop_quality")
        .when(~F.col("_lang"), "drop_lang")
        .when(F.col("_eval"), "eval_holdout")
        .when(F.col("_cont"), "drop_contaminated")
        .when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
            >= F.col("thr_hex"),
            "drop_mixture",
        )
        .otherwise("kept")
    )
    return log.select(
        "doc_id", "source", disposition.alias("disposition")
    ).orderBy("doc_id")


def _curation_ctes() -> str:
    """The chain's shared CTE prefix (through the rate table) — one
    source of truth for both oracles."""
    return f"""
{_cc_ctes()},
nd_drop AS MATERIALIZED (SELECT doc_id FROM comp WHERE cluster_id <> doc_id),
exact_keep AS MATERIALIZED (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
qual AS MATERIALIZED (SELECT doc_id FROM ({QUALITY_SQL}) WHERE keep),
langok AS MATERIALIZED (SELECT doc_id FROM ({LANG_ID_SQL}) WHERE pred_lang = lang),
contaminated AS MATERIALIZED (SELECT doc_id FROM ({decontaminate_sql()})),
corpus0 AS MATERIALIZED (
  SELECT d.doc_id, d.source, CAST({_N_TOKENS_SQL} AS BIGINT) AS n_tok
  FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM exact_keep)
    AND d.doc_id NOT IN (SELECT doc_id FROM nd_drop)
    AND d.doc_id IN (SELECT doc_id FROM qual)
    AND d.doc_id IN (SELECT doc_id FROM langok)
    AND d.doc_id % {_EVAL_MOD} <> 0
    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
per_src AS (SELECT source, SUM(n_tok) AS c FROM corpus0 GROUP BY source),
thr AS (
  SELECT source,
    FLOOR(sqrt(CAST((SELECT MIN(c) FROM per_src) AS DOUBLE) / CAST(c AS DOUBLE))
          * 4294967296.0) AS t
  FROM per_src
),
rates AS (
  SELECT source,
    CASE WHEN t >= 4294967296 THEN 'g'
         ELSE lower(lpad(to_hex(CAST(t AS BIGINT)), 8, '0'))
    END AS thr_hex
  FROM thr
)"""


def curation_pipeline_sql() -> str:
    """The identical chain as one chained-CTE DuckDB statement."""
    return f"""
{_curation_ctes()},
kept AS (
  SELECT d.doc_id, d.source, d.n_tok,
         {_SPLIT_SQL} AS split,
         CAST({_BUCKET_SQL} AS BIGINT) AS bucket
  FROM corpus0 d JOIN rates r ON d.source = r.source
  WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < r.thr_hex
),
packed AS (
  SELECT split, source, bucket, n_tok,
         CAST((SUM(n_tok) OVER (
             PARTITION BY split, source, bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tok) // {_SHARD_TOKEN_BUDGET} AS BIGINT) AS shard
  FROM kept
)
SELECT split, source, bucket, shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS shard_tokens
FROM packed
GROUP BY split, source, bucket, shard
ORDER BY split, source, bucket, shard
"""


def curation_decision_log_sql() -> str:
    """The audit as the same chained CTEs + one ordered CASE."""
    return f"""
{_curation_ctes()}
SELECT d.doc_id, d.source,
  CASE
    WHEN d.doc_id NOT IN (SELECT doc_id FROM exact_keep) THEN 'drop_exact'
    WHEN d.doc_id IN (SELECT doc_id FROM nd_drop) THEN 'drop_near_dup'
    WHEN d.doc_id NOT IN (SELECT doc_id FROM qual) THEN 'drop_quality'
    WHEN d.doc_id NOT IN (SELECT doc_id FROM langok) THEN 'drop_lang'
    WHEN d.doc_id % {_EVAL_MOD} = 0 THEN 'eval_holdout'
    WHEN d.doc_id IN (SELECT doc_id FROM contaminated) THEN 'drop_contaminated'
    WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) >=
         (SELECT thr_hex FROM rates r WHERE r.source = d.source)
      THEN 'drop_mixture'
    ELSE 'kept'
  END AS disposition
FROM documents d
ORDER BY d.doc_id
"""


CURATION_QUERIES: dict[str, QuerySpec] = {
    "curation_pipeline_e2e": QuerySpec(
        curation_pipeline_e2e, curation_pipeline_sql()
    ),
    "curation_decision_log": QuerySpec(
        curation_decision_log, curation_decision_log_sql()
    ),
}
