

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
