"""Training-data pipeline operators over the ``documents`` corpus:
deterministic splits, mixture sampling, TF-IDF, shard packing, sketches.

The reference engine has no corpus tooling; these are the operations a
large-scale LLM-data pipeline needs around the dedup/similarity surface
in :mod:`.textops` / :mod:`.similarity`. Design rules for 100 TB:

- **Determinism via content hashing, not RNG.** Splits and samples key
  on ``md5`` of a stable id, so membership is reproducible across runs,
  partitionings, and engines (both Spark and DuckDB ship md5). No
  ``rand()`` — a reshuffled re-run must produce the same train set.
- **No global ordering.** Shard packing uses a *partition-local*
  running total over ``(source, content-hash bucket)`` — a global (or
  even per-source) cumulative sum would serialize 100 TB through a
  handful of tasks; bucketed packing bounds every window partition at
  corpus/buckets and matches real pipelines (pack per shard-writer).
  Quantile gating broadcasts a tiny per-source threshold instead of
  rank-windowing the rows.
- **Integer/exact arithmetic in comparisons.** Token counts are
  BIGINT; the TF-IDF weight avoids ``ln`` (libm vs JVM can differ by
  1 ulp) in favor of the exact-rounded rational ``tf * N / df``, so the
  differential value-hash is bit-stable.
- Sketch aggregates (HLL distinct counts, approximate quantiles) are
  genuinely approximate — no SQL oracle; bounded-error unit tests in
  ``tests/test_pipeline.py`` are the check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec
from multi_attribute_join_search_with_mapreduce_spark.functions.text import tokenize_col, tokenize_sql
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

# Whitespace token count, matching textops' convention. (A function,
# not a module constant: Column construction needs a live session.)
def _n_tokens() -> F.Column:
    return F.size(F.split(F.trim("text"), r"\s+"))


_N_TOKENS_SQL = r"len(regexp_split_to_array(trim(text), '\s+'))"


def _split_col() -> F.Column:
    """'train'/'test' from the first hex digit of md5(doc_id): digits
    0-c -> train (13/16 = 81.25%), d-f -> test. Content-keyed, so the
    assignment survives any repartitioning or re-run."""
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return F.when(h <= "c", "train").otherwise("test")


_SPLIT_SQL = (
    "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'c' "
    "THEN 'train' ELSE 'test' END"
)


def train_test_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic hash split with per-(split, source) doc/token
    accounting — the op every pretraining corpus build starts with."""
    d = load_table(spark, "documents", sf)
    return (
        d.withColumn("split", _split_col())
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(_n_tokens().cast("long")).alias("n_tokens"),
        )
        .orderBy("split", "source")
    )


TRAIN_TEST_SPLIT_SQL = f"""
SELECT {_SPLIT_SQL} AS split, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM({_N_TOKENS_SQL}) AS BIGINT) AS n_tokens
FROM documents
GROUP BY split, source
ORDER BY split, source
"""


# Per-source keep-rates as sixteenths, keyed on the SECOND md5 hex digit
# so sampling is independent of the train/test split digit.
_MIXTURE_SIXTEENTHS: dict[str, int] = {"src0": 16, "src1": 8, "src2": 4}
_MIXTURE_DEFAULT = 2
_HEX = "0123456789abcdef"


def mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-source downsampling (corpus mixture weights):
    keep a doc when its second md5 hex digit falls under the source's
    threshold. Pure map-side filter — no shuffle until the audit agg."""
    d = load_table(spark, "documents", sf)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 2, 1)
    thr = F.lit(_HEX[_MIXTURE_DEFAULT])
    for src, sixteenths in _MIXTURE_SIXTEENTHS.items():
        cond = F.col("source") == src
        thr = F.when(cond, F.lit("g" if sixteenths >= 16 else _HEX[sixteenths])).otherwise(thr)
    return (
        d.filter(h < thr)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(_n_tokens().cast("long")).alias("n_tokens"),
        )
        .orderBy("source")
    )


def _mixture_thr_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{src}' THEN '{'g' if s >= 16 else _HEX[s]}'"
        for src, s in _MIXTURE_SIXTEENTHS.items()
    )
    return f"CASE {whens} ELSE '{_HEX[_MIXTURE_DEFAULT]}' END"


MIXTURE_SAMPLE_SQL = f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM({_N_TOKENS_SQL}) AS BIGINT) AS n_tokens
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 2, 1) < {_mixture_thr_sql()}
GROUP BY source
ORDER BY source
"""


def tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus TF-IDF: top-50 terms by summed weight.

    tokens explode (narrow) -> tf per (doc, term) -> df per term; the
    corpus size N joins in as a broadcast 1-row aggregate. The weight is
    ``tf * (N / df)`` — a linear inverse-frequency weight instead of the
    usual log-idf, so both engines compute identical IEEE doubles (see
    module docstring); the ranking is monotone-equivalent for fixed df.
    """
    d = load_table(spark, "documents", sf)
    toks = d.select("doc_id", F.explode(tokenize_col(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    per_term = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("_n"))
    return (
        per_term.join(F.broadcast(n_docs))
        .withColumn(
            "sum_tfidf",
            F.col("total_tf").cast("double")
            * (F.col("_n").cast("double") / F.col("df").cast("double")),
        )
        .select("term", "df", "total_tf", "sum_tfidf")
        .orderBy(F.desc("sum_tfidf"), "term")
        .limit(50)
    )


TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({tokenize_sql('text')}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
per_term AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(tf) AS BIGINT) AS total_tf
  FROM tf GROUP BY term
)
SELECT term, df, total_tf,
       CAST(total_tf AS DOUBLE) * (CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / CAST(df AS DOUBLE)) AS sum_tfidf
FROM per_term
ORDER BY sum_tfidf DESC, term
LIMIT 50
"""

_SHARD_TOKEN_BUDGET = 2048

# Writer-parallelism within a source: docs are packed per (source, bucket)
# where bucket is content-derived (md5 hex digit), matching how real
# pipelines pack per shard-writer. Window partition size is then
# |source| / _PACK_BUCKETS regardless of source cardinality — a
# per-source-only window serializes each source through ONE task.
_PACK_BUCKETS = 8


def _bucket_col() -> F.Column:
    """Deterministic engine-agnostic bucket in [0, _PACK_BUCKETS) from
    the THIRD md5 hex digit of doc_id (digits 1-2 are taken by the
    split/mixture ops). md5, not ``hash()``: Spark's Murmur3 and
    DuckDB's hash are different functions."""
    return F.expr(
        "cast(locate(substr(md5(cast(doc_id as string)), 3, 1), "
        f"'{_HEX}') - 1 as bigint) % {_PACK_BUCKETS}"
    )


_BUCKET_SQL = (
    f"(strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) "
    f"% {_PACK_BUCKETS}"
)


def pack_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy sequence packing: assign docs to fixed token-budget shards
    by a running token total within each (source, bucket) sub-partition.

    Packing within hash-derived buckets (not whole sources) keeps the
    running-sum window's partition size bounded at corpus_size/buckets
    even when there are only a handful of sources — per-source-only
    windows send each source through one task (VERDICT r1 §wrong-3).
    Integer `div` everywhere (no double division): exact for cumulative
    token counts past 2^53 and bit-identical to DuckDB's `//`."""
    d = load_table(spark, "documents", sf).select(
        "doc_id", "source", _n_tokens().cast("long").alias("n_tok")
    ).withColumn("bucket", _bucket_col())
    w = (
        Window.partitionBy("source", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        d.withColumn("sum_tok", F.sum("n_tok").over(w))
        .withColumn("shard", F.expr(f"(sum_tok - n_tok) div {_SHARD_TOKEN_BUDGET}"))
    )
    return (
        packed.groupBy("source", "bucket", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("shard_tokens"),
        )
        .orderBy("source", "bucket", "shard")
    )


PACK_SHARDS_SQL = f"""
WITH d AS (
  SELECT doc_id, source, CAST({_N_TOKENS_SQL} AS BIGINT) AS n_tok,
         CAST({_BUCKET_SQL} AS BIGINT) AS bucket
  FROM documents
),
packed AS (
  SELECT source, bucket, n_tok,
         CAST((SUM(n_tok) OVER (
             PARTITION BY source, bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tok) // {_SHARD_TOKEN_BUDGET} AS BIGINT) AS shard
  FROM d
)
SELECT source, bucket, shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS shard_tokens
FROM packed
GROUP BY source, bucket, shard
ORDER BY source, bucket, shard
"""


def quantile_gate(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source quantile gating: keep docs at or above their source's
    median text length.

    Scale design (replaces the r1 percent_rank window, which sorted
    every source through ONE task): the threshold is the smallest length
    L with 2*|{len <= L}| >= n, computed from per-(source, length)
    counts — the only window runs over *distinct lengths per source*
    (bounded, thousands at most), never over rows. The tiny per-source
    threshold then broadcast-joins back and the gate is a map-side
    filter. All-integer arithmetic, so Spark and DuckDB agree bit-for-
    bit; a single-doc source keeps its doc (len == median), fixing the
    r1 singleton drop."""
    d = load_table(spark, "documents", sf).select(
        "source", F.length("text").cast("long").alias("len")
    )
    counts = d.groupBy("source", "len").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("source")
        .orderBy("len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("source"))
    )
    thr = (
        cum.filter(F.col("cum") * 2 >= F.col("n"))
        .groupBy("source")
        .agg(F.min("len").alias("thr"))
    )
    return (
        d.join(F.broadcast(thr), "source")
        .filter(F.col("len") >= F.col("thr"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("len").alias("min_len"),
            F.max("len").alias("max_len"),
        )
        .orderBy("source")
    )


QUANTILE_GATE_SQL = """
WITH d AS (
  SELECT source, CAST(LENGTH(text) AS BIGINT) AS len FROM documents
),
counts AS (
  SELECT source, len, COUNT(*) AS c FROM d GROUP BY source, len
),
cum AS (
  SELECT source, len,
         SUM(c) OVER (PARTITION BY source ORDER BY len
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY source) AS n
  FROM counts
),
thr AS (
  SELECT source, MIN(len) AS thr FROM cum WHERE cum * 2 >= n GROUP BY source
)
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MIN(d.len) AS BIGINT) AS min_len,
       CAST(MAX(d.len) AS BIGINT) AS max_len
FROM d JOIN thr ON d.source = thr.source AND d.len >= thr.thr
GROUP BY d.source ORDER BY d.source
"""


def approx_sketches(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch aggregates per event type: HLL++ distinct users and
    approximate value quantiles. One partial/final pass — at 100 TB the
    sketches merge map-side; no exact-distinct shuffle of user ids.

    Self-validating output (r3 verdict #4): the same job computes the
    exact counterparts and emits BOOLEAN bound checks instead of the
    raw approximations, so the DuckDB oracle is plain exact SQL with
    literal TRUE columns — a sketch drifting out of bound turns the
    driver row red. Bounds: ``approx_count_distinct`` rsd=0.02 → allow
    10 % relative error (5 sigma); ``percentile_approx`` accuracy=2000
    (rank error ≤ 1/accuracy = 0.0005, a 10× margin under the grading
    eps) → the approx value's exact ECDF interval
    [count<(v)/n, count<=(v)/n] must intersect [phi−0.005, phi+0.005].
    The exact pass exists only to *grade* the sketch — the sketch path
    itself stays one map-combinable scan, and the grading join
    broadcasts the tiny per-type agg. (accuracy was 10000 through r5;
    per-row summary updates scale with accuracy and dominated the
    query's cost at 2.1× its baseline entry for no grading benefit.)

    NULL hygiene (same class as the stats family): a NULL value would be
    excluded by percentile_approx and the lt_/le_ sums but counted in
    ``n``, deflating the ECDF bounds into a false red; a NULL event_type
    group would survive the oracle's GROUP BY but vanish from the inner
    grading join. Both filtered up front, mirrored in the oracle."""
    e = load_table(spark, "events", sf).filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    q = F.percentile_approx("value", [0.5, 0.95, 0.99], 2000)
    approx = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        q.getItem(0).alias("q50"),
        q.getItem(1).alias("q95"),
        q.getItem(2).alias("q99"),
    )
    graded = (
        e.join(F.broadcast(approx), "event_type")
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n"),
            F.first("approx_users").alias("approx_users"),
            *[
                agg
                for tag in ("q50", "q95", "q99")
                for agg in (
                    F.sum((F.col("value") < F.col(tag)).cast("long")).alias(f"lt_{tag}"),
                    F.sum((F.col("value") <= F.col(tag)).cast("long")).alias(f"le_{tag}"),
                )
            ],
        )
    )
    eps = F.lit(0.005)

    def q_ok(tag: str, phi: float):
        n = F.col("n").cast("double")
        lo = F.col(f"lt_{tag}").cast("double") / n
        hi = F.col(f"le_{tag}").cast("double") / n
        return (lo <= F.lit(phi) + eps) & (hi >= F.lit(phi) - eps)

    users_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users")).cast("double")
        <= F.lit(0.10) * F.col("exact_users").cast("double")
    )
    return graded.select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        users_ok.alias("users_ok"),
        q_ok("q50", 0.5).alias("q50_ok"),
        q_ok("q95", 0.95).alias("q95_ok"),
        q_ok("q99", 0.99).alias("q99_ok"),
    ).orderBy("event_type")


APPROX_SKETCHES_SQL = """
SELECT event_type,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  TRUE AS users_ok, TRUE AS q50_ok, TRUE AS q95_ok, TRUE AS q99_ok
FROM events
WHERE value IS NOT NULL AND event_type IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def mergeable_hll_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Persisted-mergeable distinct counts via Datasketches HLL: one
    sketch per event type, and the GLOBAL distinct-user estimate built
    by ``hll_union_agg`` over those per-group sketches — never by
    re-scanning the fact table.

    This is the sketch property the 100 TB rollup pyramid rests on:
    distinct counts don't sum across groups, but their sketches union
    losslessly (register-wise max), so daily sketches roll to weekly to
    global with no second pass over raw data.
    Self-validating output (r3 verdict #4): each row carries the exact
    distinct count plus two BOOLEANs — ``within_bound`` (sketch estimate
    within 10 % of exact; lgk=12 → rsd ≈ 1.6 %, so 10 % is > 6 sigma)
    and, on the ALL row, ``union_consistent`` (estimate of the union of
    per-group sketches EQUALS the direct whole-table sketch estimate —
    register-wise max is lossless, so this is exact equality, the merge
    property itself). Oracle = exact distinct SQL + literal TRUEs; any
    sketch regression turns the driver row red.
    """
    e = load_table(spark, "events", sf)
    per = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )

    def ok(est, exact):
        return F.abs(est - exact).cast("double") <= F.lit(0.10) * exact.cast("double")

    groups = per.select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        ok(F.hll_sketch_estimate("sk"), F.col("exact_users")).alias("within_bound"),
        F.lit(True).alias("union_consistent"),
    )
    union_est = per.agg(
        F.hll_union_agg("sk").alias("usk"),
        F.sum(F.lit(1)).alias("_one"),  # keeps a single-row agg shape
    )
    direct = e.agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("dsk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    total = union_est.crossJoin(F.broadcast(direct)).select(
        F.lit("ALL").alias("event_type"),
        F.col("exact_users").cast("long").alias("exact_users"),
        ok(F.hll_sketch_estimate("usk"), F.col("exact_users")).alias("within_bound"),
        (
            F.hll_sketch_estimate("usk") == F.hll_sketch_estimate("dsk")
        ).alias("union_consistent"),
    )
    return groups.unionByName(total).orderBy("event_type")


MERGEABLE_HLL_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  TRUE AS within_bound, TRUE AS union_consistent
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL' AS event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  TRUE AS within_bound, TRUE AS union_consistent
FROM events
ORDER BY event_type
"""


# Tokenizer-aware chunking: fixed token window with overlap, the unit
# a training pipeline actually feeds to a model. Whitespace tokens (the
# same split as token_stats) stand in for a real tokenizer; swap
# tokenize for BPE at deploy time, the plan shape is identical.
_CHUNK_TOKENS = 64
_CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Split every document into ``_CHUNK_TOKENS``-token chunks with a
    16-token overlap (stride ``_CHUNK_STRIDE``) — one output row per
    chunk, reassembled as text.

    All-native plan: token split -> per-doc chunk-count arithmetic ->
    ``posexplode(sequence(...))`` fan-out -> ``slice``/``array_join``
    reassembly. Narrow map over documents (fan-out = tokens/stride, the
    data's own growth factor); no shuffle at all, so it scales as a pure
    map stage and parquet-prunes to (doc_id, text).
    """
    d = load_table(spark, "documents", sf)
    toks = F.split(F.trim("text"), r"\s+")
    n_tok = F.size("_toks")
    # ceil((n - chunk) / stride) + 1 in integer math, min 1 chunk
    n_chunks = F.greatest(
        F.lit(1),
        F.expr(
            f"cast(ceil((size(_toks) - {_CHUNK_TOKENS}) / {_CHUNK_STRIDE}.0) as int) + 1"
        ),
    )
    return (
        d.select("doc_id", toks.alias("_toks"))
        .select(
            "doc_id",
            "_toks",
            n_tok.alias("n_doc_tokens"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id", "_i"),
        )
        .select(
            "doc_id",
            "chunk_id",
            "n_doc_tokens",
            F.array_join(
                F.slice("_toks", F.col("chunk_id") * _CHUNK_STRIDE + 1, _CHUNK_TOKENS),
                " ",
            ).alias("chunk_text"),
        )
        .withColumn(
            "n_chunk_tokens",
            F.size(F.split(F.col("chunk_text"), r"\s+")),
        )
        .filter(F.col("chunk_text") != "")
    )


CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS _toks
  FROM documents
),
counted AS (
  SELECT doc_id, _toks, len(_toks) AS n_doc_tokens,
    GREATEST(1, CAST(ceil((len(_toks) - {_CHUNK_TOKENS}) / {_CHUNK_STRIDE}.0) AS INTEGER) + 1) AS n_chunks
  FROM t
),
chunks AS (
  SELECT doc_id, i AS chunk_id, n_doc_tokens,
    array_to_string(list_slice(_toks, i * {_CHUNK_STRIDE} + 1, i * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}), ' ') AS chunk_text
  FROM counted, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
)
SELECT doc_id, chunk_id, n_doc_tokens, chunk_text,
  len(regexp_split_to_array(chunk_text, '\\s+')) AS n_chunk_tokens
FROM chunks
WHERE chunk_text <> ''
"""


def chunk_documents_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """The chunker as a Python UDTF consumed through a correlated
    LATERAL join — the user-defined TABLE function surface (Spark 4
    ``@udtf``), where one input row fans out to a variable number of
    output rows inside the engine's lateral-join machinery rather than
    via explode arithmetic.

    Deliberately the same contract as `chunk_documents` (same columns,
    same 64/48 token windows, same empty-chunk filter) and gated
    against the SAME DuckDB oracle: the two paths must be
    row-identical, proving the UDTF plumbing, not new semantics. The
    native-expression variant remains the hot path (UDTFs run in a
    Python worker, row-at-a-time); the UDTF is for logic that cannot
    be expressed as expressions — here it carries per-row Python state
    (the token list) across the yielded chunk rows.
    """
    import math
    import re

    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "doc_id bigint, chunk_id int, n_doc_tokens int, "
            "chunk_text string, n_chunk_tokens int"
        )
    )
    class Chunker:
        def eval(self, doc_id, text):
            if text is None:
                return
            toks = re.split(r"\s+", text.strip())
            n = len(toks)
            n_chunks = max(1, math.ceil((n - _CHUNK_TOKENS) / _CHUNK_STRIDE) + 1)
            for i in range(n_chunks):
                chunk = " ".join(toks[i * _CHUNK_STRIDE : i * _CHUNK_STRIDE + _CHUNK_TOKENS])
                if chunk:
                    yield doc_id, i, n, chunk, len(chunk.split(" "))

    spark.udtf.register("majs_chunker", Chunker)
    load_table(spark, "documents", sf).select("doc_id", "text").createOrReplaceTempView(
        "majs_docs_for_udtf"
    )
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_id, c.n_doc_tokens, c.chunk_text, c.n_chunk_tokens
        FROM majs_docs_for_udtf d, LATERAL majs_chunker(d.doc_id, d.text) c
        """
    )


# Corpus frequency at or below which a token counts as "rare" for the
# OOV/rarity gate (absolute count — at real scale use a ppm threshold).
_RARE_MAX_FREQ = 2


def rare_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document token-rarity profile: how much of the document is
    made of corpus-rare tokens — the OOV/noise gate of a training
    pipeline (high rare share ⇒ boilerplate/gibberish/other-language;
    rare_share and min_freq are the filter inputs).

    Integer aggregation end to end (module convention: no cross-engine
    float sums); the one double, ``rare_share``, is a single division
    of two longs — identical IEEE in both engines. Plan: tokens explode
    -> corpus term counts -> tokens⨝counts on term -> per-doc integer
    aggregate. The term join is shuffle-on-term with AQE skew handling
    (hot terms are exactly the frequent ones, so the skewed keys carry
    no information and split cleanly)."""
    d = load_table(spark, "documents", sf)
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    return (
        toks.join(vocab, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((F.col("freq") <= _RARE_MAX_FREQ).cast("long")).alias("n_rare"),
            F.min("freq").alias("min_freq"),
        )
        .withColumn(
            "rare_share",
            F.col("n_rare").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


RARE_TOKEN_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents
),
filtered AS (SELECT * FROM toks WHERE term <> ''),
vocab AS (SELECT term, COUNT(*) AS freq FROM filtered GROUP BY term)
SELECT doc_id, COUNT(*) AS n_tokens,
  CAST(SUM(CASE WHEN freq <= {_RARE_MAX_FREQ} THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
  MIN(freq) AS min_freq,
  CAST(SUM(CASE WHEN freq <= {_RARE_MAX_FREQ} THEN 1 ELSE 0 END) AS BIGINT)
    / CAST(COUNT(*) AS DOUBLE) AS rare_share
FROM filtered JOIN vocab USING (term)
GROUP BY doc_id
"""


# --- exact-size stratified sample (per-source cap) -------------------------

_STRAT_N = 30  # keep at most N docs per source
_STRAT_MARGIN = 1.3  # prefilter overshoot factor


def stratified_sample_exact(
    spark: SparkSession, sf: str, n: int = _STRAT_N, margin: float = _STRAT_MARGIN
) -> DataFrame:
    """Keep exactly ``min(n, |stratum|)`` documents per source — the
    per-domain cap of crawl pipelines — deterministically (smallest
    ``md5(doc_id)`` values win; no RNG, reproducible across engines).

    ``mixture_sample`` keeps a *rate*; caps need an exact *count*, i.e.
    a per-stratum order statistic. The naive plan — one row_number
    window over the whole corpus — funnels each stratum's 100 TB share
    through a single task. Instead:

    1. per-source counts (one map-side-combined aggregate);
    2. map-side hash prefilter at ``margin * n / count`` of hash space —
       survivors are a *prefix* of each stratum's hash order, expected
       size ``margin * n``;
    3. exact row_number window over the survivors only.

    The prefix property makes the result exact whenever a stratum keeps
    ≥ min(n, count) survivors; strata where the prefilter undershot
    (P(Binomial(count, margin·n/count) < n) — sub-1e-3 at margin 1.3,
    shrinking with n) are detected by a survivor recount and routed
    through the unfiltered window, so the output is exact always, and
    the heavy path is bounded at ~margin·n rows per stratum regardless
    of corpus size. The counts side of the joins is aggregate-reduced
    (one row per source) — left to the planner: broadcast while domain
    cardinality is small, shuffle join when it is itself huge.
    """
    h = F.md5(F.col("doc_id").cast("string"))
    d = load_table(spark, "documents", sf).select("doc_id", "source", h.alias("hkey"))
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    need = F.least(F.lit(n), F.col("n_src"))
    frac = F.least(F.lit(1.0), F.lit(margin * n) / F.col("n_src"))
    hash_int = F.conv(F.substring("hkey", 1, 8), 16, 10).cast("double")
    dd = d.join(counts, "source")
    surv = dd.filter(hash_int < frac * F.lit(float(2**32)))
    undershot = (
        counts.join(
            surv.groupBy("source").agg(F.count(F.lit(1)).alias("n_surv")),
            "source",
            "left",
        )
        .filter(F.coalesce(F.col("n_surv"), F.lit(0)) < need)
        .select("source")
    )
    w = Window.partitionBy("source").orderBy("hkey", "doc_id")
    rn = F.row_number().over(w)
    good = (
        surv.join(undershot, "source", "left_anti")
        .withColumn("rn", rn)
        .filter(F.col("rn") <= n)
    )
    rescue = (
        dd.join(undershot, "source", "left_semi")
        .withColumn("rn", rn)
        .filter(F.col("rn") <= n)
    )
    return (
        good.unionByName(rescue)
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= {_STRAT_N}
ORDER BY source, doc_id
"""


def winsorize_doc_lengths(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source outlier clipping (winsorization) of document length at
    the exact 1/8 and 7/8 quantiles — the tail-taming preprocessing step
    before length-sensitive mixing/packing.

    The clip bounds are EXACT per-group order statistics, not sketches.
    Eighths (0.125/0.875) are deliberate: the interpolation weight is an
    exact binary fraction, so ``a + f*(b-a)`` over BIGINT ranks is
    bit-identical in Spark and DuckDB regardless of each engine's
    interpolation formula — p05/p95 (0.05 is not a binary double) would
    diverge in the last ULP between formula variants.

    Plan: one per-source percentile aggregate (S rows), broadcast back
    onto the docs, map-side ``least/greatest`` clip — the fact table is
    scanned once and never shuffled.
    """
    d = load_table(spark, "documents", sf)
    q = F.percentile("n_chars", F.array(F.lit(0.125), F.lit(0.875)))
    bounds = (
        d.groupBy("source")
        .agg(q.alias("_q"))
        .select("source", F.col("_q")[0].alias("lo"), F.col("_q")[1].alias("hi"))
    )
    return (
        d.join(F.broadcast(bounds), on="source")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.least(F.greatest(F.col("n_chars").cast("double"), F.col("lo")), F.col("hi")).alias(
                "clipped_chars"
            ),
            (
                (F.col("n_chars") < F.col("lo")) | (F.col("n_chars") > F.col("hi"))
            ).alias("was_clipped"),
        )
        .orderBy("doc_id")
    )


WINSORIZE_SQL = """
WITH bounds AS (
  SELECT source,
    quantile_cont(n_chars, 0.125) AS lo,
    quantile_cont(n_chars, 0.875) AS hi
  FROM documents GROUP BY source
)
SELECT doc_id, d.source, n_chars,
  LEAST(GREATEST(CAST(n_chars AS DOUBLE), lo), hi) AS clipped_chars,
  (n_chars < lo OR n_chars > hi) AS was_clipped
FROM documents d JOIN bounds USING (source)
ORDER BY doc_id
"""


def temperature_rates(d: DataFrame) -> DataFrame:
    """Per-source α=1/2 temperature rate table ``(source, thr_hex,
    keep_rate)`` for ANY (doc_id, source, n_tok) frame — the broadcast
    side of :func:`temperature_kept`, also consumed directly by the
    curation decision log (which needs the threshold for DROPPED rows,
    not just the survivors)."""
    per_src = d.groupBy("source").agg(F.sum("n_tok").alias("c"))
    cmin = per_src.agg(F.min("c").alias("c_min"))
    thr_int = F.floor(
        F.sqrt(F.col("c_min").cast("double") / F.col("c").cast("double")) * F.lit(2.0**32)
    )
    return per_src.crossJoin(F.broadcast(cmin)).select(
        "source",
        F.when(thr_int >= F.lit(2**32), F.lit("g"))
        .otherwise(F.lower(F.lpad(F.conv(thr_int.cast("string"), 10, 16), 8, "0")))
        .alias("thr_hex"),
        F.round(
            F.sqrt(F.col("c_min").cast("double") / F.col("c").cast("double")), 6
        ).alias("keep_rate"),
    )


def temperature_kept(d: DataFrame) -> DataFrame:
    """The α=1/2 temperature gate over ANY (doc_id, source, n_tok)
    frame — shared by :func:`temperature_rebalance` (whole corpus) and
    the curation pipeline (the corpus surviving its upstream gates,
    where the rates must reflect the post-filter mixture). Returns the
    kept rows with a ``keep_rate`` column; determinism notes in
    :func:`temperature_rebalance`."""
    return (
        d.join(F.broadcast(temperature_rates(d)), "source")
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
            < F.col("thr_hex")
        )
        .drop("thr_hex")
    )


def temperature_rebalance(spark: SparkSession, sf: str) -> DataFrame:
    """Square-root temperature rebalancing of the corpus mixture
    (the α=0.5 sampling temperature of multilingual/multi-source LLM
    training): every source is deterministically downsampled relative
    to the SMALLEST source so kept token shares go ∝ sqrt(natural
    share) — big sources shrink, rare sources keep everything.

    Per-source keep rate ``r_s = sqrt(c_min / c_s)`` (token counts).
    α is fixed at 1/2 precisely so the rate needs only division and
    ``sqrt`` — both IEEE-correctly-rounded, hence bit-identical in
    Spark and DuckDB — never ``pow``, whose last-ulp behaviour is
    libm-specific and could flip a keep decision at a threshold
    boundary. The gate itself is an order-stable string compare:
    ``md5(doc_id)[0:8] < hex(floor(r_s * 2^32))`` — a pure map-side
    filter against a broadcast 1-row-per-source rate table, the same
    shape `mixture_sample` uses, so no shuffle touches the corpus
    until the audit aggregate.
    """
    d = load_table(spark, "documents", sf).select(
        "doc_id", "source", _n_tokens().cast("long").alias("n_tok")
    )
    return (
        temperature_kept(d).groupBy("source", "keep_rate")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tok").alias("n_tokens_kept"),
        )
        .select("source", "keep_rate", "n_docs_kept", "n_tokens_kept")
        .orderBy("source")
    )


TEMPERATURE_REBALANCE_SQL = f"""
WITH per_doc AS (
  SELECT doc_id, source, CAST({_N_TOKENS_SQL} AS BIGINT) AS n_tok FROM documents
),
per_src AS (SELECT source, SUM(n_tok) AS c FROM per_doc GROUP BY source),
thr AS (
  SELECT source,
    FLOOR(sqrt(CAST((SELECT MIN(c) FROM per_src) AS DOUBLE) / CAST(c AS DOUBLE)) * 4294967296.0) AS t,
    ROUND(sqrt(CAST((SELECT MIN(c) FROM per_src) AS DOUBLE) / CAST(c AS DOUBLE)), 6) AS keep_rate
  FROM per_src
),
rates AS (
  SELECT source, keep_rate,
    CASE WHEN t >= 4294967296 THEN 'g'
         ELSE lower(lpad(to_hex(CAST(t AS BIGINT)), 8, '0'))
    END AS thr_hex
  FROM thr
)
SELECT d.source, r.keep_rate,
  CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
  CAST(SUM(d.n_tok) AS BIGINT) AS n_tokens_kept
FROM per_doc d JOIN rates r ON d.source = r.source
WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < r.thr_hex
GROUP BY d.source, r.keep_rate
ORDER BY d.source
"""


# --- weighted sampling without replacement (Efraimidis–Spirakis) -----------

_WS_K = 50


def weighted_sample_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted random sampling WITHOUT replacement, distributed:
    k=``_WS_K`` docs with inclusion probability ∝ document length, via
    exponential keys (Efraimidis–Spirakis A-ES): key = -ln(u)/w, take
    the k smallest. One narrow map + a global top-k
    (TakeOrderedAndProject) — no sort of the corpus, no coordination,
    and the selection is mergeable across partitions by construction
    (that is the A-ES point: per-partition top-k then merge ≡ global
    top-k).

    Deterministic twist for the differential gate: u is not RNG but the
    md5 hash of the doc id mapped to (0,1) — ``(hash32 + 1) / 2^32`` —
    so the "random" draw is content-keyed (repo convention: survives
    reruns/repartitioning) and the oracle replays it exactly. ln/div
    are single IEEE ops on identical inputs; ties are impossible (md5
    collisions aside) and the ordering carries a doc_id tie-break
    anyway.
    """
    d = load_table(spark, "documents", sf)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "double"
        )
        + 1.0
    ) / F.lit(2.0**32)
    w = F.length("text").cast("double")
    key = -F.log(u) / w
    return (
        d.select("doc_id", "source", F.length("text").alias("n_chars_w"),
                 F.round(key, 10).alias("es_key"))
        .orderBy("es_key", "doc_id")
        .limit(_WS_K)
    )


WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, source, length(text) AS n_chars_w,
  ROUND(-ln((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS DOUBLE) + 1.0) / 4294967296.0)
        / CAST(length(text) AS DOUBLE), 10) AS es_key
FROM documents
ORDER BY es_key, doc_id LIMIT {_WS_K}
"""


# --- leakage-free grouped cross-validation folds ---------------------------

K_FOLDS = 4  # one md5 hex digit maps EXACTLY evenly onto 4 folds


def _fold_col(key: F.Column) -> F.Column:
    """Fold 0..3 from the first md5 hex digit of the group key — the
    same engine-portable idiom as `_split_col`, with 16 digits / 4
    folds giving a perfectly uniform hash partition."""
    h = F.substring(F.md5(key.cast("string")), 1, 1)
    return (
        F.when(h <= "3", 0)
        .when(h <= "7", 1)
        .when(h <= "b", 2)
        .otherwise(3)
        .cast("int")
    )


_FOLD_SQL = (
    "CAST(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '3' THEN 0 "
    "WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7' THEN 1 "
    "WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= 'b' THEN 2 "
    "ELSE 3 END AS INT)"
)


def group_kfold_split(spark: SparkSession, sf: str) -> DataFrame:
    """GroupKFold assignment for cross-validation over events: the fold
    is a pure function of ``user_id`` (md5 digit), so EVERY event of a
    user lands in one fold — the grouped split that prevents
    entity-level leakage between train and validation (the per-row
    random split a naive pipeline does leaks users across folds).

    One aggregation pass keyed on the derived fold; the share column
    runs as a window over the K-row aggregate, never over events.
    Membership is reproducible across runs, partitionings, and engines
    (`_split_col` contract).
    """
    from pyspark.sql import Window

    e = load_table(spark, "events", sf).filter(F.col("user_id").isNotNull())
    agg = e.groupBy(_fold_col(F.col("user_id")).alias("fold")).agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )
    w = Window.partitionBy()
    return agg.select(
        "fold",
        "n_users",
        "n_events",
        (F.col("n_events") / F.sum("n_events").over(w)).alias("event_share"),
        "value_sum",
    ).orderBy("fold")


GROUP_KFOLD_SQL = f"""
WITH agg AS (
  SELECT {_FOLD_SQL} AS fold,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
  FROM events WHERE user_id IS NOT NULL
  GROUP BY fold
)
SELECT fold, n_users, n_events,
  CAST(n_events AS DOUBLE) / SUM(n_events) OVER () AS event_share,
  value_sum
FROM agg
ORDER BY fold
"""


# --- cross-split leakage audit ---------------------------------------------


def split_leakage_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Train/test contamination check: every near-duplicate candidate
    pair (LSH band collision, `near_dup_candidates`) whose two docs
    landed on OPPOSITE sides of the hash split — the leak that silently
    inflates eval scores when a test doc's near-copy sits in train.
    Run after every split: a non-empty result means the split must be
    cluster-aware (split on `dedup_clusters` labels, not raw doc_id).

    Scale shape: the pair frame is LSH-banded (never all-pairs) and the
    split is a pure hash function evaluated per side — two map-side
    column derivations on the pair list, no extra join against the
    corpus.
    """
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
        near_dup_candidates,
    )

    def split_of(col: str) -> F.Column:
        h = F.substring(F.md5(F.col(col).cast("string")), 1, 1)
        return F.when(h <= "c", "train").otherwise("test")

    return (
        near_dup_candidates(spark, sf)
        .withColumn("split_a", split_of("doc_a"))
        .withColumn("split_b", split_of("doc_b"))
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b", "est_jaccard")
        .orderBy("doc_a", "doc_b")
    )


def _leakage_sql() -> str:
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
        NEAR_DUP_SQL,
    )

    split_of = (
        "CASE WHEN substr(md5(CAST({c} AS VARCHAR)), 1, 1) <= 'c' "
        "THEN 'train' ELSE 'test' END"
    )
    return f"""
SELECT doc_a, doc_b,
  {split_of.format(c="doc_a")} AS split_a,
  {split_of.format(c="doc_b")} AS split_b,
  est_jaccard
FROM ({NEAR_DUP_SQL}) nd
WHERE {split_of.format(c="doc_a")} <> {split_of.format(c="doc_b")}
ORDER BY doc_a, doc_b
"""


# --- leakage-safe leave-one-out target encoding ------------------------------


def target_encode_loo(spark: SparkSession, sf: str) -> DataFrame:
    """Leave-one-out target encoding of `event_type` against `value`:
    each event gets the mean value of its category computed WITHOUT its
    own row — ``(sum_type − value) / (cnt_type − 1)`` — the encoding
    that avoids the self-leakage a naive category-mean join bakes into
    a feature (a row's own target inside its feature).

    Exactness: the category sums accumulate in DECIMAL(18,2) (order-
    independent), the subtraction stays decimal, and only the final
    per-row division drops to double (single-division tolerance class).

    Scale shape: one map-side-combinable aggregate to |event_type| rows,
    broadcast back onto the fact (event_type is a bounded-domain enum —
    tiny at any corpus size, broadcast is structurally safe), then a
    pure map-side row expression. No window over the fact, no shuffle
    of events at all.
    """
    e = load_table(spark, "events", sf).filter(F.col("value").isNotNull())
    per = e.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    vdec = F.col("value").cast("decimal(18,2)")
    return (
        e.join(F.broadcast(per), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.when(
                F.col("c") > 1,
                (F.col("s") - vdec).cast("double") / (F.col("c") - 1),
            ).alias("loo_mean"),
        )
        .orderBy("event_id")
    )


TARGET_ENCODE_SQL = """
WITH per AS (
  SELECT event_type, SUM(CAST(value AS DECIMAL(18,2))) AS s, COUNT(*) AS c
  FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT event_id, event_type, value,
  CASE WHEN c > 1 THEN
    CAST(s - CAST(value AS DECIMAL(18,2)) AS DOUBLE) / (c - 1)
  END AS loo_mean
FROM events JOIN per USING (event_type)
WHERE value IS NOT NULL
ORDER BY event_id
"""


# --- hashing-trick feature vectors ------------------------------------------

# Every 10th user keeps the audited output human-sized; the hashed
# vector itself is computed for the full stream before the slice so the
# aggregate shape matches production (slice is a post-agg filter in
# spirit but pushed pre-agg here because the hash is per-row).
_FH_USER_MOD = 10


def feature_hashing(spark: SparkSession, sf: str) -> DataFrame:
    """The hashing trick (Weinberger et al. ICML'09): sparse categorical
    features (`event_type`, the JSON `props.k` value) hashed into 16
    signed buckets per user — the fixed-width feature vector that needs
    NO vocabulary build, no fit step, and no dimension that grows with
    cardinality (the point at 100 TB: a one-hot vocabulary join would
    be corpus-derived state; the hash is stateless).

    Bucket = first md5 hex digit of the feature string (kept as the hex
    CHARACTER — engine-portable, no base conversion); sign = ±1 from the
    second digit (the signed trick that makes collisions unbiased).
    One explode (2 features/row) + one map-side-combinable aggregation
    on (user_id, bucket). Nothing shuffles but the final small agg.
    """
    e = load_table(spark, "events", sf).filter(
        F.col("user_id").isNotNull() & (F.col("user_id") % _FH_USER_MOD == 0)
    )
    feat = F.explode(
        F.array(
            F.concat(F.lit("type="), F.col("event_type")),
            F.concat(F.lit("k="), F.get_json_object("props", "$.k")),
        )
    ).alias("feat")
    h = F.md5(F.col("feat"))
    return (
        e.select("user_id", feat)
        .select(
            "user_id",
            F.substring(h, 1, 1).alias("bucket"),
            F.when(F.substring(h, 2, 1) <= "7", 1).otherwise(-1).alias("sign"),
        )
        .groupBy("user_id", "bucket")
        .agg(F.sum("sign").cast("long").alias("feat_val"))
        .orderBy("user_id", "bucket")
    )


FEATURE_HASHING_SQL = f"""
WITH feats AS (
  SELECT user_id, 'type=' || event_type AS feat FROM events
  WHERE user_id IS NOT NULL AND user_id % {_FH_USER_MOD} = 0
  UNION ALL
  SELECT user_id, 'k=' || json_extract_string(props, '$.k') AS feat FROM events
  WHERE user_id IS NOT NULL AND user_id % {_FH_USER_MOD} = 0
)
SELECT user_id, substr(md5(feat), 1, 1) AS bucket,
  CAST(SUM(CASE WHEN substr(md5(feat), 2, 1) <= '7' THEN 1 ELSE -1 END)
       AS BIGINT) AS feat_val
FROM feats GROUP BY user_id, bucket ORDER BY user_id, bucket
"""


# --- in-engine quality-classifier training (distributed logistic GD) --------

# 10-word stoplist, learning rate, and round count tuned on the fixture:
# loss is strictly decreasing over all 10 rounds and final accuracy is
# ~0.83 vs a 0.50 majority baseline (prototyped offline; the booleans in
# the output re-prove it per run, per the self-validation recipe).
_LR_STOP = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")
_LR_RATE = 5.0
_LR_ROUNDS = 10


def _lr_features(spark: SparkSession, sf: str) -> DataFrame:
    """(x1, x2, y) per document: quantized stopword-rate and length
    features plus a PLANTED label — a linear rule over the features with
    md5-derived noise (the fixture corpus is synthetic word soup with no
    naturally learnable signal, so the ground truth is planted, exactly
    like media_phash_dedup's planted near-dup groups). Every value is
    quantized (ROUND 6) so both engines hold identical doubles; the
    label rule is written with identical association order on both
    sides, so the comparison bit-agrees."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tok = F.size(toks)
    stop = F.array(*[F.lit(s) for s in _LR_STOP])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    x1 = F.round(n_stop * F.lit(10.0) / n_tok, 6)
    x2 = F.round(n_tok / F.lit(100.0), 6)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10000
    ) / F.lit(10000.0)
    z = (
        F.lit(4.0) * x1
        + F.lit(2.0) * x2
        - F.lit(3.6)
        + F.lit(2.0) * (u - F.lit(0.5))
    )
    return (
        load_table(spark, "documents", sf)
        .filter(F.col("text").isNotNull())
        .select(
            x1.alias("x1"),
            x2.alias("x2"),
            F.when(z > 0, F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
        )
    )


def logreg_quality_train(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed logistic-regression trainer for a document-quality
    classifier — full-batch gradient descent, the Spark-ML execution
    shape: per round ONE narrow aggregation pass over the corpus (the
    gradient is 3 numbers — model-sized, like `kmeans_lloyd`'s
    centroids), weights re-enter the next round as literals. Returns the
    whole training trajectory: per-round weights, loss, accuracy count,
    and an `improved` monotone-descent flag.

    Cross-engine exactness (the `kmeans_lloyd` discipline extended to a
    transcendental link): the sigmoid is quantized per row (ROUND 6) so
    a last-ulp exp() difference between engines cannot survive; gradient
    terms (s−y)·x are products of 6-dp decimals — exactly representable
    at 12 dp, so the DECIMAL(28,12) cast is exact and the sum is
    order-independent; weight updates and per-round loss are computed
    INSIDE the engine with identical expression shape on both sides.
    The DuckDB oracle replays the identical rounds as chained 1-row
    weight CTEs and matches on values, not tolerances.

    At 100 TB: the per-round pass is map-side-combinable (a 3-column
    partial aggregate), the model never exceeds driver scale, and the
    planted label is replaced by real annotations — the plumbing is the
    product."""
    feats = _lr_features(spark, sf).persist()

    w = [0.0, 0.0, 0.0]
    rows = []
    prev_loss = None
    for rnd in range(1, _LR_ROUNDS + 1):
        z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
        s = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
        s_c = F.greatest(
            F.least(s, F.lit(0.999999999)), F.lit(0.000000001)
        )
        loss_term = F.round(
            -(
                F.col("y") * F.log(s_c)
                + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - s_c)
            ),
            6,
        ).cast("decimal(28,12)")
        grads = [
            F.sum(((s - F.col("y")) * g).cast("decimal(28,12)")).alias(f"g{j}")
            for j, g in enumerate((F.lit(1.0), F.col("x1"), F.col("x2")))
        ]
        agg = feats.agg(
            *grads,
            F.sum(loss_term).alias("loss_sum"),
            F.count(F.lit(1)).alias("n"),
            F.sum(((s > 0.5) == (F.col("y") > 0.5)).cast("long")).alias(
                "n_correct"
            ),
        ).select(
            *[
                F.round(
                    F.lit(w[j])
                    - F.lit(_LR_RATE)
                    * (F.col(f"g{j}").cast("double") / F.col("n")),
                    9,
                ).alias(f"w{j}")
                for j in range(3)
            ],
            F.round(F.col("loss_sum").cast("double") / F.col("n"), 6).alias(
                "loss"
            ),
            "n",
            "n_correct",
        )
        r = agg.collect()[0]
        w = [r["w0"], r["w1"], r["w2"]]
        rows.append(
            (
                rnd,
                w[0],
                w[1],
                w[2],
                r["loss"],
                int(r["n_correct"]),
                None if prev_loss is None else bool(r["loss"] < prev_loss),
            )
        )
        prev_loss = r["loss"]
    feats.unpersist()
    return spark.createDataFrame(
        rows,
        "round int, w0 double, w1 double, w2 double, loss double, "
        "n_correct long, improved boolean",
    ).orderBy("round")


def _logreg_sql() -> str:
    stop_in = ", ".join(f"'{s}'" for s in _LR_STOP)
    toks = r"regexp_split_to_array(trim(text), '\s+')"
    ctes = [
        f"""feats AS MATERIALIZED (
  SELECT ROUND(len(list_filter({toks}, t -> t IN ({stop_in}))) * 10.0 / len({toks}), 6) AS x1,
         ROUND(len({toks}) / 100.0, 6) AS x2,
         (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000) / 10000.0 AS u
  FROM documents WHERE text IS NOT NULL
)""",
        """lab AS MATERIALIZED (
  SELECT x1, x2,
         CASE WHEN 4.0 * x1 + 2.0 * x2 - 3.6 + 2.0 * (u - 0.5) > 0
              THEN 1.0 ELSE 0.0 END AS y
  FROM feats
)""",
        # MATERIALIZED everywhere: DuckDB inlines plain CTEs, and each
        # round's CTE references the previous one — 10 rounds would
        # expand the corpus scan 2^10 times (the _kcore_sql lesson).
        "w0 AS MATERIALIZED (SELECT 0.0::DOUBLE AS w0, 0.0::DOUBLE AS w1, 0.0::DOUBLE AS w2)",
    ]
    for r in range(1, _LR_ROUNDS + 1):
        ctes.append(
            f"""m{r} AS MATERIALIZED (
  SELECT
    SUM(CAST((s - y) * 1.0 AS DECIMAL(28,12))) AS g0,
    SUM(CAST((s - y) * x1 AS DECIMAL(28,12))) AS g1,
    SUM(CAST((s - y) * x2 AS DECIMAL(28,12))) AS g2,
    SUM(CAST(ROUND(-(y * ln(GREATEST(LEAST(s, 0.999999999), 0.000000001))
        + (1.0 - y) * ln(1.0 - GREATEST(LEAST(s, 0.999999999), 0.000000001))), 6)
        AS DECIMAL(28,12))) AS loss_sum,
    COUNT(*) AS n,
    CAST(SUM(CASE WHEN (s > 0.5) = (y > 0.5) THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
  FROM (
    SELECT y, x1, x2,
      ROUND(1.0 / (1.0 + exp(-(w.w0 + w.w1 * x1 + w.w2 * x2))), 6) AS s
    FROM lab CROSS JOIN w{r - 1} w
  )
)""")
        ctes.append(
            f"""w{r} AS MATERIALIZED (
  SELECT ROUND(w.w0 - {_LR_RATE} * (CAST(m.g0 AS DOUBLE) / m.n), 9) AS w0,
         ROUND(w.w1 - {_LR_RATE} * (CAST(m.g1 AS DOUBLE) / m.n), 9) AS w1,
         ROUND(w.w2 - {_LR_RATE} * (CAST(m.g2 AS DOUBLE) / m.n), 9) AS w2,
         ROUND(CAST(m.loss_sum AS DOUBLE) / m.n, 6) AS loss,
         m.n_correct
  FROM w{r - 1} w CROSS JOIN m{r} m
)""")
    rounds_union = "\nUNION ALL\n".join(
        (
            f"SELECT {r} AS round, w0, w1, w2, loss, n_correct, "
            "NULL::BOOLEAN AS improved FROM w1"
            if r == 1
            else f"SELECT {r} AS round, a.w0, a.w1, a.w2, a.loss, a.n_correct, "
            f"(a.loss < b.loss) AS improved FROM w{r} a CROSS JOIN w{r - 1} b"
        )
        for r in range(1, _LR_ROUNDS + 1)
    )
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT CAST(round AS INTEGER) AS round, w0, w1, w2, loss, n_correct, improved
FROM ({rounds_union})
ORDER BY round
"""


LOGREG_SQL = _logreg_sql()


PIPELINE_QUERIES: dict[str, QuerySpec] = {
    "logreg_quality_train": QuerySpec(logreg_quality_train, LOGREG_SQL),
    "feature_hashing": QuerySpec(feature_hashing, FEATURE_HASHING_SQL),
    "split_leakage_audit": QuerySpec(split_leakage_audit, _leakage_sql()),
    "target_encode_loo": QuerySpec(target_encode_loo, TARGET_ENCODE_SQL),
    "group_kfold_split": QuerySpec(group_kfold_split, GROUP_KFOLD_SQL),
    "weighted_sample_docs": QuerySpec(weighted_sample_docs, WEIGHTED_SAMPLE_SQL),
    "temperature_rebalance": QuerySpec(temperature_rebalance, TEMPERATURE_REBALANCE_SQL),
    "winsorize_doc_lengths": QuerySpec(winsorize_doc_lengths, WINSORIZE_SQL),
    "stratified_sample_exact": QuerySpec(stratified_sample_exact, STRATIFIED_SAMPLE_SQL),
    "train_test_split": QuerySpec(train_test_split, TRAIN_TEST_SPLIT_SQL),
    "mixture_sample": QuerySpec(mixture_sample, MIXTURE_SAMPLE_SQL),
    "tfidf_top_terms": QuerySpec(tfidf_top_terms, TFIDF_SQL),
    "pack_shards": QuerySpec(pack_shards, PACK_SHARDS_SQL),
    "quantile_gate": QuerySpec(quantile_gate, QUANTILE_GATE_SQL),
    "approx_sketches": QuerySpec(approx_sketches, APPROX_SKETCHES_SQL),
    "mergeable_hll_rollup": QuerySpec(mergeable_hll_rollup, MERGEABLE_HLL_SQL),
    "chunk_documents": QuerySpec(chunk_documents, CHUNK_SQL),
    "chunk_documents_udtf": QuerySpec(chunk_documents_udtf, CHUNK_SQL),
    "rare_token_stats": QuerySpec(rare_token_stats, RARE_TOKEN_SQL),
}
