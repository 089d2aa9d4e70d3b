

def test_gap_fill_covers_every_slot(spark, sf_dir):
    from multi_attribute_join_search_with_mapreduce_spark.operators.events import gap_fill_hourly
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    rows = gap_fill_hourly(spark, sf_dir).collect()
    types = {r.event_type for r in rows}
    hours = {r.hour_start for r in rows}
    # complete grid, no gaps
    assert len(rows) == len(types) * len(hours)
    n_raw = load_table(spark, "events", sf_dir).count()
    assert sum(r.n_events for r in rows) == n_raw
    # locf: zero-count slots never reset the running total
    by_type: dict = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.hour_start)):
        prev = by_type.get(r.event_type)
        if r.n_events == 0 and prev is not None:
            assert r.filled_total == prev
        by_type[r.event_type] = r.filled_total


def test_incremental_rollup_equals_naive_rebuild(spark, sf_dir):
    """merge(state, delta) must be row-identical to a from-scratch
    single-pass rollup — the materialized-view-refresh contract."""
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.operators.events import DEC, incremental_rollup
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    merged = incremental_rollup(spark, sf_dir).collect()
    naive = (
        load_table(spark, "events", sf_dir)
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("day", "event_type")
        .collect()
    )
    assert merged == naive


def test_rolling_active_users_synthetic(spark, tmp_path):
    """Known scatter: users on days 1, 3, and 10 — the 7-day window
    picks up exactly the users active in the trailing week."""
    import datetime as dt

    from multi_attribute_join_search_with_mapreduce_spark.operators.events import rolling_active_users

    def ev(i, day, user):
        return (i, dt.datetime(2024, 1, day, 12, 0, 0), user, "click", 1.0, "{}")

    rows = [ev(1, 1, 100), ev(2, 1, 101), ev(3, 3, 100), ev(4, 10, 102)]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    lake = tmp_path / "lake"
    e.write.parquet(str(lake / "events.parquet"))
    out = {r.day.day: r.active_7d for r in rolling_active_users(spark, str(lake)).collect()}
    assert out[1] == 2          # users 100, 101 on day 1
    assert out[3] == 2          # both still inside the trailing week
    assert out[7] == 2          # day 1 contributions last through day 7
    assert out[8] == 1          # only day 3's user 100 remains
    assert out[9] == 1
    assert out[10] == 1         # user 102 only; day 3 expired
    assert max(out) == 10       # clipped at the observed max day


def test_hierarchical_rollup_week_sums_days(spark, sf_dir):
    """Each weekly bucket must be exactly the sum of its daily buckets
    (count identity; value identity is oracle-gated bit-exact)."""
    import collections
    import datetime as dt

    from multi_attribute_join_search_with_mapreduce_spark.operators.events import hierarchical_rollup

    rows = hierarchical_rollup(spark, sf_dir).collect()
    days = [r for r in rows if r.grain == "day"]
    weeks = {(r.bucket, r.event_type): r for r in rows if r.grain == "week"}
    acc = collections.Counter()
    for r in days:
        week_start = r.bucket - dt.timedelta(days=r.bucket.weekday())
        acc[(week_start, r.event_type)] += r.n_events
    assert set(acc) == set(weeks)
    for k, n in acc.items():
        assert weeks[k].n_events == n


def test_transition_matrix_rows_are_distributions(spark, sf_dir):
    from multi_attribute_join_search_with_mapreduce_spark.operators.events import event_transition_matrix
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    rows = event_transition_matrix(spark, sf_dir).collect()
    by_prev: dict = {}
    total = 0
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r)
        total += r.n_transitions
    for prev, rs in by_prev.items():
        assert abs(sum(r.p for r in rs) - 1.0) < 1e-9
    # transitions = events - one first-event per user
    e = load_table(spark, "events", sf_dir)
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_ewma_closed_form(spark, tmp_path):
    """Hand-computed fold: alpha=0.25 over [4, 8, 16] = 0.25*16 +
    0.75*(0.25*8 + 0.75*4) = 7.75; a single event returns itself."""
    import datetime as dt

    from multi_attribute_join_search_with_mapreduce_spark.operators.events import user_value_ewma

    def ev(i, minute, user, v):
        return (i, dt.datetime(2024, 1, 1, 0, minute), user, "click", float(v), "{}")

    rows = [ev(1, 0, 7, 4), ev(2, 1, 7, 8), ev(3, 2, 7, 16), ev(4, 0, 9, 42)]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    lake = tmp_path / "lake"
    e.write.parquet(str(lake / "events.parquet"))
    out = {r.user_id: r for r in user_value_ewma(spark, str(lake)).collect()}
    assert out[7].ewma == 7.75 and out[7].n_events == 3
    assert out[9].ewma == 42.0 and out[9].n_events == 1


def test_conversion_window_boundaries(spark, tmp_path):
    """Strict-after and inclusive-24h boundary semantics."""
    import datetime as dt

    from multi_attribute_join_search_with_mapreduce_spark.operators.events import (
        conversion_within_window,
    )

    def ev(i, day, hour, user, typ):
        return (i, dt.datetime(2024, 1, day, hour), user, typ, 1.0, "{}")

    rows = [
        ev(1, 1, 0, 1, "signup"), ev(2, 1, 5, 1, "purchase"),    # converts
        ev(3, 1, 0, 2, "signup"), ev(4, 2, 0, 2, "purchase"),    # exactly 24h: converts
        ev(5, 1, 0, 3, "signup"), ev(6, 2, 1, 3, "purchase"),    # 25h: no
        ev(7, 1, 5, 4, "signup"), ev(8, 1, 0, 4, "purchase"),    # before: no
        ev(9, 1, 0, 5, "signup"),                                 # never purchases
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    lake = tmp_path / "lake"
    e.write.parquet(str(lake / "events.parquet"))
    r = conversion_within_window(spark, str(lake)).collect()[0]
    assert r.n_signups == 5 and r.n_converted == 2 and r.conversion_rate == 0.4


def test_gap_fill_linear_closed_form(spark, tmp_path):
    """Observations at hours 0 (v=10) and 4 (v=30): hours 1-3 must
    interpolate to 15/20/25; no rows outside the observed span exist
    because the spine is bounded by min/max ts."""
    import datetime as dt

    from multi_attribute_join_search_with_mapreduce_spark.operators.events import gap_fill_linear

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 30), 1, "click", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 4, 30), 1, "click", 30.0, "{}"),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    lake = tmp_path / "lake"
    e.write.parquet(str(lake / "events.parquet"))
    out = {r.hour_start.hour: r for r in gap_fill_linear(spark, str(lake)).collect()}
    assert [out[h].avg_value for h in range(5)] == [10.0, 15.0, 20.0, 25.0, 30.0]
    assert [out[h].is_interpolated for h in range(5)] == [False, True, True, True, False]
    assert out[2].n_events == 0 and out[0].n_events == 1


def test_rolling_zscore_closed_form(spark, tmp_path):
    """13 hourly values of 10 then one spike of 1000: the spike's
    trailing window has mean 10, stddev 0 -> var==0 guard keeps z NULL;
    with variance present the z-score matches the hand computation."""
    import datetime as dt
    import math

    from multi_attribute_join_search_with_mapreduce_spark.operators.events import (
        rolling_zscore_anomalies,
    )

    rows = []
    # alternating 10/14 keeps variance positive; 13 trailing hours
    for h in range(13):
        rows.append((h, dt.datetime(2024, 1, 1, h, 0), 1, "click", 10.0 + 4 * (h % 2), "{}"))
    rows.append((99, dt.datetime(2024, 1, 1, 13, 0), 1, "click", 1000.0, "{}"))
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    lake = tmp_path / "lake"
    e.write.parquet(str(lake / "events.parquet"))
    out = {r.hour_start.hour: r for r in rolling_zscore_anomalies(spark, str(lake)).collect()}
    # trailing window for hour 13: 13 values (7x10, 6x14)
    vals = [10.0 + 4 * (h % 2) for h in range(13)]
    n = len(vals)
    mean = sum(vals) / n
    var = (sum(v * v for v in vals) - sum(vals) ** 2 / n) / (n - 1)
    expect = (1000.0 - mean) / math.sqrt(var)
    assert out[13].is_anomaly
    assert abs(out[13].zscore - expect) < 1e-3
    assert out[5].zscore is None  # fewer than 12 trailing observations


def test_ols_trend_closed_form(spark, tmp_path):
    """Perfect line y = 2x + 5 per hour: slope/intercept recovered
    exactly."""
    import datetime as dt

    from multi_attribute_join_search_with_mapreduce_spark.operators.events import value_trend_ols

    rows = [
        (h, dt.datetime(2024, 1, 1, h, 0), 1, "click", 2.0 * h + 5.0, "{}")
        for h in range(10)
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    lake = tmp_path / "lake"
    e.write.parquet(str(lake / "events.parquet"))
    out = {r.event_type: r for r in value_trend_ols(spark, str(lake)).collect()}
    assert out["click"].slope_per_hour == 2.0
    assert out["click"].intercept == 5.0
    assert out["click"].n_events == 10


def test_native_session_window_gap_boundary_semantics(spark, tmp_path):
    """Empirical boundary contract: at exactly gap the engine MERGES
    (split is strict >); at gap + 0.5s session_window splits on exact
    micros while the lag plan's floor-second test still merges — both
    behaviours pinned so a fixture regeneration near the boundary can
    never silently flip the oracle."""
    import datetime as dt

    from multi_attribute_join_search_with_mapreduce_spark.operators.events import (
        native_session_window,
        sessionize,
    )

    def lake_with(rows, name):
        e = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
        )
        lake = tmp_path / name
        e.write.parquet(str(lake / "events.parquet"))
        return str(lake)

    exact = lake_with(
        [
            (1, dt.datetime(2024, 1, 1, 10, 0, 0), 7, "click", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 10, 30, 0), 7, "click", 1.0, "{}"),
        ],
        "exact",
    )
    assert native_session_window(spark, exact).count() == 1  # merged at == gap
    assert sessionize(spark, exact).count() == 1

    over = lake_with(
        [
            (1, dt.datetime(2024, 1, 1, 10, 0, 0), 7, "click", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 10, 30, 0, 500000), 7, "click", 1.0, "{}"),
        ],
        "over",
    )
    assert native_session_window(spark, over).count() == 2  # exact-micros split
    assert sessionize(spark, over).count() == 1  # floor-second test merges


def test_markov_backtest_entity_split_and_argmax(spark, sf_dir):
    """The model's per-prev prediction is the train-side argmax (ties →
    lexicographic min), accuracy arithmetic is exact, and no test user
    is a train user."""
    import hashlib
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.operators.events import (
        markov_backtest,
    )
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for r in ev:
        streams[r.user_id].append((r.ts, r.event_id, r.event_type))
    train_counts = defaultdict(Counter)
    test_trans = defaultdict(Counter)
    for uid, rows in streams.items():
        rows.sort()
        is_train = hashlib.md5(str(uid).encode()).hexdigest()[0] <= "7"
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            (train_counts if is_train else test_trans)[a][b] += 1
    model = {
        p: min((t for t, c in cnt.items() if c == max(cnt.values())))
        for p, cnt in train_counts.items()
    }
    got = {r.prev_type: r for r in markov_backtest(spark, sf_dir).collect()}
    assert set(got) == set(test_trans)
    for p, cnt in test_trans.items():
        r = got[p]
        assert r.pred == model.get(p)
        assert r.n_test == sum(cnt.values())
        assert r.n_correct == cnt.get(model.get(p), 0)
        assert abs(r.accuracy - r.n_correct / r.n_test) < 1e-4
