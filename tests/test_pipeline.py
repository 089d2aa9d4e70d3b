"""Pipeline-operator properties: hash-split determinism, packing
invariants, sketch error bounds (the exact-match checks live in
tests/test_queries_differential.py via the registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import (
    _SHARD_TOKEN_BUDGET,
    approx_sketches,
    pack_shards,
    train_test_split,
)
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table


def test_split_is_deterministic_across_runs(spark, sf_dir):
    a = {tuple(r) for r in train_test_split(spark, sf_dir).collect()}
    b = {tuple(r) for r in train_test_split(spark, sf_dir).collect()}
    assert a == b
    splits = {r[0] for r in a}
    assert splits == {"train", "test"}


def test_split_partitions_the_corpus(spark, sf_dir):
    rows = train_test_split(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    assert total == load_table(spark, "documents", sf_dir).count()


def test_pack_shards_invariants(spark, sf_dir):
    rows = pack_shards(spark, sf_dir).collect()
    docs = load_table(spark, "documents", sf_dir)
    assert sum(r.n_docs for r in rows) == docs.count()
    by_part: dict[tuple, list] = {}
    for r in rows:
        by_part.setdefault((r.source, r.bucket), []).append(r)
    for (source, bucket), shards in by_part.items():
        shards.sort(key=lambda x: x.shard)
        ids = [s.shard for s in shards]
        assert ids == list(range(len(ids))), f"{source}/{bucket}: non-contiguous"
        # Greedy-packing invariant: a doc lands in shard i+1 only when
        # the running token total has crossed the (i+1)*budget boundary,
        # so cumulative tokens through shard i must reach that boundary.
        cum = 0
        for s in shards[:-1]:
            cum += s.shard_tokens
            assert cum >= (s.shard + 1) * _SHARD_TOKEN_BUDGET, (
                f"{source}/{bucket} shard {s.shard}: cum {cum} below budget"
            )
    total_tok = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")).cast("long"))
    ).collect()[0][0]
    assert sum(r.shard_tokens for r in rows) == total_tok
    assert _SHARD_TOKEN_BUDGET > 0


def test_approx_sketches_error_bounds(spark, sf_dir):
    """Self-validating shape (r3 verdict #4): the query grades its own
    sketches against exact counterparts computed in the same job — every
    bound-check boolean must come back TRUE, and the exact distinct
    count must equal a plain countDistinct."""
    rows = {r.event_type: r for r in approx_sketches(spark, sf_dir).collect()}
    exact = {
        r.event_type: r.users
        for r in load_table(spark, "events", sf_dir)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    assert set(rows) == set(exact)
    for et, ex_users in exact.items():
        r = rows[et]
        assert r.exact_users == ex_users
        assert r.users_ok and r.q50_ok and r.q95_ok and r.q99_ok, r


def test_quantile_gate_keeps_top_half_by_length(spark, sf_dir):
    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import quantile_gate

    rows = {r.source: r for r in quantile_gate(spark, sf_dir).collect()}
    docs = (
        load_table(spark, "documents", sf_dir)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.length("text")).alias("max_len"),
        )
        .collect()
    )
    for d in docs:
        g = rows[d.source]
        # median-length gate: strictly more than half survive only via
        # ties at the median; never fewer than half, never zero
        assert d.n // 2 < g.n_kept <= d.n
        assert g.max_len == d.max_len  # the longest doc always survives
        assert g.min_len <= g.max_len


def test_chunk_documents_invariants(spark, sf_dir):
    """Chunk coverage + overlap: concatenating each doc's chunks with
    the stride skip reconstructs the token stream, every non-final
    chunk is exactly _CHUNK_TOKENS long, and consecutive chunks share
    chunk-minus-stride tokens."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import (
        _CHUNK_STRIDE,
        _CHUNK_TOKENS,
        chunk_documents,
    )
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    rows = chunk_documents(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    docs = {
        r.doc_id: r.text.strip().split()
        for r in load_table(spark, "documents", sf_dir).select("doc_id", "text").collect()
    }
    assert set(by_doc) == {d for d, t in docs.items() if t}
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        toks = docs[doc_id]
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            got = c.chunk_text.split()
            start = c.chunk_id * _CHUNK_STRIDE
            assert got == toks[start : start + _CHUNK_TOKENS], (doc_id, c.chunk_id)
        # full coverage: the last chunk must reach the final token
        last = chunks[-1]
        assert last.chunk_id * _CHUNK_STRIDE + len(last.chunk_text.split()) >= len(toks)


def test_stratified_sample_exact_counts_and_margin_independence(spark, sf_dir):
    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import stratified_sample_exact

    n = 7
    docs = load_table(spark, "documents", sf_dir)
    src_counts = {r.source: r.c for r in docs.groupBy("source").agg(F.count("*").alias("c")).collect()}

    kept = stratified_sample_exact(spark, sf_dir, n=n).collect()
    per_src: dict[str, int] = {}
    for r in kept:
        per_src[r.source] = per_src.get(r.source, 0) + 1
    assert per_src == {s: min(n, c) for s, c in src_counts.items()}

    # margin=0 starves the prefilter: every stratum is rescued through
    # the unfiltered window — the result must be identical
    rescued = stratified_sample_exact(spark, sf_dir, n=n, margin=0.0).collect()
    assert sorted((r.source, r.doc_id) for r in rescued) == sorted(
        (r.source, r.doc_id) for r in kept
    )


def test_winsorize_closed_form(spark, tmp_path):
    """n_chars 0..8 in one source: eighth-quantile bounds are exactly
    1.0 and 7.0, so 0 clips up and 8 clips down."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import winsorize_doc_lengths

    docs = [(i, f"doc {i}", "en", "s", i) for i in range(9)]
    d = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string, n_chars long")
    lake = tmp_path / "lake"
    d.write.parquet(str(lake / "documents.parquet"))
    out = {r.doc_id: r for r in winsorize_doc_lengths(spark, str(lake)).collect()}
    assert out[0].clipped_chars == 1.0 and out[0].was_clipped
    assert out[8].clipped_chars == 7.0 and out[8].was_clipped
    for i in range(1, 8):
        assert out[i].clipped_chars == float(i) and not out[i].was_clipped


def test_mergeable_hll_union_equals_direct_sketch(spark, sf_dir):
    """The union of per-group HLL sketches must equal the direct
    whole-table sketch EXACTLY (register-wise max is associative and
    order-free), and land within HLL error of the exact count — the
    property that lets distinct counts roll up without re-scanning."""
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import mergeable_hll_rollup
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    rows = {r.event_type: r for r in mergeable_hll_rollup(spark, sf_dir).collect()}
    e = load_table(spark, "events", sf_dir)

    # union of parts == direct sketch is now asserted IN the query
    # output (union_consistent on the ALL row); here we check it came
    # back true and the exact counts line up with an independent pass.
    assert rows["ALL"].union_consistent
    assert all(r.within_bound for r in rows.values())
    exact = e.select("user_id").distinct().count()
    assert rows["ALL"].exact_users == exact
    # every per-group exact count is bounded by the global one
    assert all(
        r.exact_users <= rows["ALL"].exact_users for k, r in rows.items() if k != "ALL"
    )


def test_temperature_rebalance_invariants(spark, sf_dir):
    """α=0.5 contract: the smallest source keeps rate 1.0 (everything),
    rates fall as source token mass grows, and kept counts never exceed
    corpus counts."""
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import (
        _n_tokens,
        temperature_rebalance,
    )
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    out = {r.source: r for r in temperature_rebalance(spark, sf_dir).collect()}
    totals = {
        r.source: (r.n_docs, r.c)
        for r in load_table(spark, "documents", sf_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum(_n_tokens().cast("long")).alias("c"))
        .collect()
    }
    c_min = min(c for _, c in totals.values())
    for src, r in out.items():
        n_docs, c = totals[src]
        assert r.n_docs_kept <= n_docs and r.n_tokens_kept <= c
        assert abs(r.keep_rate - (c_min / c) ** 0.5) < 1e-6
        if c == c_min:
            # rate-1.0 source: the 'g' sentinel keeps every doc
            assert r.n_docs_kept == n_docs and r.n_tokens_kept == c


def test_chunker_udtf_identical_to_native_path(spark, sf_dir):
    """UDTF lateral-join chunker must be row-identical to the
    explode-arithmetic chunker — same contract, two surfaces."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import (
        chunk_documents,
        chunk_documents_udtf,
    )

    a = chunk_documents(spark, sf_dir)
    b = chunk_documents_udtf(spark, sf_dir)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_group_kfold_never_splits_a_user(spark, sf_dir):
    """GroupKFold contract: the fold is a pure function of user_id, so
    no user appears in two folds; folds partition the event set."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import (
        K_FOLDS,
        _fold_col,
        group_kfold_split,
    )

    e = load_table(spark, "events", sf_dir).filter(F.col("user_id").isNotNull())
    per_user = (
        e.select("user_id", _fold_col(F.col("user_id")).alias("fold"))
        .groupBy("user_id")
        .agg(F.countDistinct("fold").alias("nf"))
    )
    assert per_user.filter(F.col("nf") > 1).count() == 0

    folds = group_kfold_split(spark, sf_dir).collect()
    assert {r.fold for r in folds} <= set(range(K_FOLDS))
    assert sum(r.n_events for r in folds) == e.count()
    assert sum(r.n_users for r in folds) == e.select("user_id").distinct().count()
    assert abs(sum(r.event_share for r in folds) - 1.0) < 1e-4


def test_split_leakage_pairs_straddle_the_split(spark, sf_dir):
    import hashlib

    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import (
        split_leakage_audit,
    )
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
        near_dup_candidates,
    )

    def split(doc_id: int) -> str:
        return "train" if hashlib.md5(str(doc_id).encode()).hexdigest()[0] <= "c" else "test"

    rows = split_leakage_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (r.split_a, r.split_b) == (split(r.doc_a), split(r.doc_b))
        assert r.split_a != r.split_b
    leaky = {(r.doc_a, r.doc_b) for r in rows}
    all_pairs = {
        (r.doc_a, r.doc_b) for r in near_dup_candidates(spark, sf_dir).collect()
    }
    assert leaky == {p for p in all_pairs if split(p[0]) != split(p[1])}


def test_target_encode_loo_excludes_self(spark, sf_dir):
    from collections import defaultdict

    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import (
        target_encode_loo,
    )

    e = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    sums, cnts = defaultdict(float), defaultdict(int)
    for r in e.select("event_type", "value").collect():
        sums[r.event_type] += r.value
        cnts[r.event_type] += 1
    rows = target_encode_loo(spark, sf_dir).collect()
    assert len(rows) == sum(cnts.values())
    for r in rows[:500]:
        want = (sums[r.event_type] - r.value) / (cnts[r.event_type] - 1)
        assert abs(r.loo_mean - want) < 1e-3


def test_feature_hashing_reconstructs_from_raw_events(spark, sf_dir):
    """Hashed buckets/signs recomputed row-by-row in Python must agree
    with the aggregate — and the slice keeps only user_id % mod == 0."""
    import hashlib
    import json
    from collections import defaultdict

    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import (
        _FH_USER_MOD,
        feature_hashing,
    )

    acc: dict[tuple[int, str], int] = defaultdict(int)
    rows = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id").isNotNull() & (F.col("user_id") % _FH_USER_MOD == 0))
        .select("user_id", "event_type", "props")
        .collect()
    )
    for r in rows:
        for feat in (f"type={r.event_type}", f"k={json.loads(r.props)['k']}"):
            h = hashlib.md5(feat.encode()).hexdigest()
            acc[(r.user_id, h[0])] += 1 if h[1] <= "7" else -1
    got = {
        (r.user_id, r.bucket): r.feat_val
        for r in feature_hashing(spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in acc.items()}


def test_logreg_quality_train_learns_the_planted_rule(spark, sf_dir):
    """Training dynamics on the planted label: loss strictly decreases
    every round (the `improved` flags are the in-band proof) and final
    accuracy beats the majority baseline by a real margin."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.pipeline import (
        logreg_quality_train,
        _lr_features,
    )
    from pyspark.sql import functions as F

    rows = logreg_quality_train(spark, sf_dir).collect()
    assert [r["round"] for r in rows] == list(range(1, 11))
    assert rows[0].improved is None
    assert all(r.improved for r in rows[1:])
    assert rows[0].loss == 0.693147  # ln 2 at w=0
    lab = _lr_features(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    ).collect()[0]
    majority = max(lab.pos, lab.n - lab.pos)
    assert rows[-1].n_correct > majority + 0.05 * lab.n
