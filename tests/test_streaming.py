"""Structured Streaming: drive file-source streams to completion with
the memory sink and assert parity with the batch renditions."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.operators.events import tumbling_window_counts
from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
    dedup_within_watermark_stream,
    events_stream_from_parquet,
    run_stream_to_memory,
    windowed_counts_stream,
)


def test_windowed_counts_stream_matches_batch(spark, sf_dir):
    stream = windowed_counts_stream(events_stream_from_parquet(spark, sf_dir))
    got = run_stream_to_memory(stream, "win_counts", output_mode="complete")
    batch = tumbling_window_counts(spark, sf_dir)
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b
    assert len(g) > 0


def test_dedup_within_watermark(spark, sf_dir):
    events = events_stream_from_parquet(spark, sf_dir)
    deduped = dedup_within_watermark_stream(events)
    got = run_stream_to_memory(deduped, "dedup_stream")
    n_distinct = (
        spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id").distinct().count()
    )
    assert got.count() == n_distinct


def test_stateful_sessionize_matches_batch_closed_sessions(spark, sf_dir):
    """applyInPandasWithState sessions == batch sessions minus each
    user's final (still-open) session."""
    from pyspark.sql import Window

    from multi_attribute_join_search_with_mapreduce_spark.operators.events import sessionize
    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
        stateful_sessionize_stream,
    )

    got = run_stream_to_memory(
        stateful_sessionize_stream(events_stream_from_parquet(spark, sf_dir)),
        "sess_state_test",
    )
    w = Window.partitionBy("user_id")
    batch_closed = (
        sessionize(spark, sf_dir)
        .withColumn("_max", F.max("session_id").over(w))
        .filter(F.col("session_id") != F.col("_max"))
    )
    g = {tuple(r) for r in got.select("user_id", "session_start", "session_end", "n_events").collect()}
    b = {
        tuple(r)
        for r in batch_closed.select(
            "user_id", "session_start", "session_end", F.col("n_events").cast("long")
        ).collect()
    }
    assert g == b
    assert len(g) > 0


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream self-join == the same interval join on
    the static table (single source file, so no cross-batch loss)."""
    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
        purchase_click_join_stream,
    )

    got = run_stream_to_memory(
        purchase_click_join_stream(events_stream_from_parquet(spark, sf_dir)),
        "ss_join_test",
    )
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    batch = purchases.join(
        clicks,
        F.expr(
            "click_user = purchase_user AND "
            "click_ts >= purchase_ts - INTERVAL 1 HOURS AND click_ts <= purchase_ts"
        ),
    ).select(
        "purchase_user", "purchase_id", "purchase_ts", "purchase_value", "click_id", "click_ts"
    )
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b
    assert len(g) > 0


def test_stream_is_incremental(spark, sf_dir):
    """The source must declare itself streaming (not a disguised batch)."""
    events = events_stream_from_parquet(spark, sf_dir)
    assert events.isStreaming
    agg = windowed_counts_stream(events)
    assert agg.isStreaming


def test_stream_append_to_lake_roundtrip(spark, sf_dir, tmp_path):
    """foreachBatch parquet ingest: streaming the events table into a
    lake dir must reproduce it exactly, and the result must be queryable
    by a batch operator (event-type counts match)."""
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table
    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
        events_stream_from_parquet,
        stream_append_to_lake,
    )

    out = str(tmp_path / "lake_events")
    ckpt = str(tmp_path / "ckpt")
    stream = events_stream_from_parquet(spark, sf_dir)
    stream_append_to_lake(stream, out, ckpt, partition_by=("event_type",))

    batch = load_table(spark, "events", sf_dir)
    ingested = spark.read.parquet(out)
    assert ingested.count() == batch.count()
    got = {
        (r.event_type, r.n)
        for r in ingested.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        (r.event_type, r.n)
        for r in batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_stream_incremental_rollup_matches_batch(spark, sf_dir):
    """The foreachBatch-merged rollup state must equal the batch
    incremental rollup (itself proven == full recompute)."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.events import incremental_rollup
    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
        stream_incremental_rollup,
    )

    got = stream_incremental_rollup(spark, sf_dir).collect()
    want = incremental_rollup(spark, sf_dir).collect()
    assert got == want


def test_checkpoint_recovery_is_exactly_once(spark, sf_dir, tmp_path):
    """Stop/restart against the same checkpoint must not re-ingest:
    the file source records processed files in the checkpoint log, so a
    restarted query resumes from the unseen files only. Sink total ==
    source total (each row exactly once) after two separate runs over a
    growing source directory — the recovery contract every production
    ingest relies on."""
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table
    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
        stream_append_to_lake,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    e = load_table(spark, "events", sf_dir).select("event_id", "user_id", "event_type")
    schema = e.schema

    def run_once() -> None:
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        stream_append_to_lake(stream, out, ckpt)

    # First run sees only the even half; second run must pick up ONLY
    # the odd half appended in between — same checkpoint, new query.
    e.where(F.col("event_id") % 2 == 0).write.mode("append").parquet(src)
    run_once()
    n_first = spark.read.parquet(out).count()
    e.where(F.col("event_id") % 2 != 0).write.mode("append").parquet(src)
    run_once()

    got = spark.read.parquet(out).agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    ).collect()[0]
    want = e.agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")).collect()[0]
    assert n_first == e.where(F.col("event_id") % 2 == 0).count()
    assert (got.n, got.s) == (want.n, want.s)  # no loss, no duplication


def test_stream_stream_left_outer_emits_evicted_null_rows(spark, sf_dir):
    """The LEFT OUTER streaming join must emit exactly one NULL-padded
    row per purchase with no qualifying click — identical to the batch
    left join's unmatched set (watermark flush via sentinel rows)."""
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table
    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
        stream_stream_left_outer,
    )

    out = stream_stream_left_outer(spark, sf_dir).persist()
    e = load_table(spark, "events", sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    purch = e.filter(F.col("event_type") == "purchase")
    unmatched = purch.join(
        clicks,
        (F.col("cu") == F.col("user_id"))
        & (F.col("cts") >= F.expr("ts - INTERVAL 1 HOUR"))
        & (F.col("cts") <= F.col("ts")),
        "left_anti",
    )
    null_rows = out.filter(F.col("click_id").isNull())
    assert null_rows.count() == unmatched.count()
    # every null row corresponds to a real unmatched purchase id
    got = {r.purchase_id for r in null_rows.select("purchase_id").collect()}
    want = {r.event_id for r in unmatched.select("event_id").collect()}
    assert got == want
    # inner portion unchanged by the outer mode
    assert out.filter(F.col("click_id").isNotNull()).count() == out.count() - len(want)
    out.unpersist()


def test_stream_near_dup_ingest_equals_batch_rebuild(spark, sf_dir):
    """Incremental streaming LSH maintenance must reproduce the one-shot
    batch rebuild exactly — same pairs, same estimates — across a real
    multi-trigger run."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import near_dup_candidates
    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import stream_near_dup_ingest

    inc = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in stream_near_dup_ingest(spark, sf_dir).collect()
    }
    full = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in near_dup_candidates(spark, sf_dir).collect()
    }
    assert inc == full
    assert len(inc) > 0


def test_band_store_join_has_no_store_side_exchange(spark, sf_dir, tmp_path):
    """The streaming band store's 100 TB contract (VERDICT r6 #1): the
    accumulated store is a table bucketed on the join keys
    ``(band, band_hash)``, so the per-trigger candidate join NEVER
    exchanges the store side — only the batch-sized new side moves.
    Built through the real ingest helpers (two appended "triggers"),
    joined through the real per-trigger join, broadcast disabled to pin
    the shape the 100 TB plan takes (SMJ through the bucketing)."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import (
        _bands_from_sigs,
        signatures_from_docs,
    )
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table
    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
        _append_bands_bucketed,
        _band_store_join,
    )

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    half_a, half_b = d.filter("doc_id % 2 = 0"), d.filter("doc_id % 2 = 1")
    tbl, loc = "majs_test_band_store", str(tmp_path / "bands_tbl")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    b0 = _bands_from_sigs(signatures_from_docs(half_a, persist=False)).coalesce(1)
    b1 = _bands_from_sigs(signatures_from_docs(half_b, persist=False)).coalesce(1)
    try:
        _append_bands_bucketed(b0, tbl, loc, 0)
        _append_bands_bucketed(b1, tbl, loc, 1)
        # replay guard: re-appending a committed batch is a no-op
        before = spark.table(tbl).count()
        _append_bands_bucketed(b1, tbl, loc, 1)
        assert spark.table(tbl).count() == before

        # crash-repair: a partition dir WITHOUT the commit marker models
        # an interrupted append (some task files landed, job commit
        # incomplete). Replay must REBUILD the partition — restoring any
        # lost rows without duplicating the surviving ones — not skip it.
        import os

        part_dir = os.path.join(loc, "batch=1")
        os.remove(os.path.join(part_dir, "_majs_committed"))
        data_files = sorted(
            f for f in os.listdir(part_dir) if f.endswith(".parquet")
        )
        os.remove(os.path.join(part_dir, data_files[0]))  # simulate lost task output
        spark.catalog.refreshTable(tbl)
        assert spark.table(tbl).count() < before  # rows really were lost
        _append_bands_bucketed(b1, tbl, loc, 1)
        spark.catalog.refreshTable(tbl)
        assert spark.table(tbl).count() == before
        assert os.path.exists(os.path.join(part_dir, "_majs_committed"))

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = _band_store_join(b1, spark.table(tbl))
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "SortMergeJoin" in plan, plan
        # split the SMJ's two child branches: in toString trees the first
        # child's lines are prefixed ':', the second child's are not
        smj_tail = plan.split("SortMergeJoin", 1)[1].splitlines()[1:]
        first = [ln for ln in smj_tail if ln.lstrip().startswith(":")]
        second = [ln for ln in smj_tail if not ln.lstrip().startswith(":")]
        store_branch = first if any(tbl in ln for ln in first) else second
        assert any(tbl in ln for ln in store_branch), plan
        assert not any("Exchange" in ln for ln in store_branch), (
            "store side of the band join exchanged:\n" + plan
        )
        # and the store scan really is a bucketed read
        assert "SelectedBucketsCount" in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_stream_session_window_equals_batch_native(spark, sf_dir):
    """The built-in streaming session_window aggregate must emit exactly
    the batch native_session_window sessions (non-NULL event times) once
    the sentinel-advanced watermark closes them all."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.events import (
        native_session_window,
    )
    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
        stream_session_window,
    )

    got = {
        (r.user_id, r.window_start, r.window_end, r.n_events)
        for r in stream_session_window(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.window_start, r.window_end, r.n_events)
        for r in native_session_window(spark, sf_dir)
        .filter("window_start IS NOT NULL")
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_floored_index_equals_full_rebuild(spark, sf_dir):
    """Streaming floored-index maintenance ≡ batch rebuild: after the
    multi-trigger run lands `documents` in micro-batches, the
    maintained index must ROW-EQUAL the full floored rebuild over the
    whole wide lake (not just produce the same search scores)."""
    import glob
    import os

    from multi_attribute_join_search_with_mapreduce_spark.index import (
        WIDE_LAKE_TABLES,
        build_posting_index,
        read_floored_index,
        read_store_meta,
    )
    from multi_attribute_join_search_with_mapreduce_spark.scratch import scratch_dir
    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
        stream_floored_index_ingest,
    )

    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
        stream_maintained_floored_store,
    )

    stream_floored_index_ingest(spark, sf_dir).collect()
    store = stream_maintained_floored_store(spark, sf_dir)
    got = read_floored_index(spark, store)
    want = build_posting_index(spark, sf_dir, WIDE_LAKE_TABLES, min_key_freq=2)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # replay markers committed for every trigger
    meta = read_store_meta(spark, store)
    assert meta["landed_batches"] == [0, 1, 2]


def test_floored_ingest_batch_replay_is_noop(spark, sf_dir):
    """The per-batch replay guard: re-delivering an already-committed
    micro-batch (foreachBatch's at-least-once mode) must not land its
    postings twice."""
    import os

    from multi_attribute_join_search_with_mapreduce_spark.index import (
        WIDE_LAKE_TABLES,
        write_floored_index,
    )
    from multi_attribute_join_search_with_mapreduce_spark.scratch import scratch_dir
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table
    from multi_attribute_join_search_with_mapreduce_spark.streaming.events import (
        _floored_ingest_batch,
    )

    store = os.path.join(scratch_dir("majs_flidx_replay_"), "store")
    initial = tuple(s for s in WIDE_LAKE_TABLES if s.name != "documents")
    docs_spec = next(s for s in WIDE_LAKE_TABLES if s.name == "documents")
    write_floored_index(spark, sf_dir, store, initial, min_key_freq=2)
    batch = load_table(spark, "documents", sf_dir)
    _floored_ingest_batch(spark, store, docs_spec, batch, 0)
    idx_rows = spark.read.parquet(f"{store}/index").count()
    res_rows = spark.read.parquet(f"{store}/residual").count()
    _floored_ingest_batch(spark, store, docs_spec, batch, 0)  # replay
    assert spark.read.parquet(f"{store}/index").count() == idx_rows
    assert spark.read.parquet(f"{store}/residual").count() == res_rows
