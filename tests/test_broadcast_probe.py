"""The broadcast_probe knob (VERDICT r6 #2): the explicit probe-side
broadcast hints must be droppable — and the AUTO path must drop them —
without changing results, and the unhinted plan must still end up a
broadcast join at fixture scale (AQE runtime conversion), proving the
fallback costs nothing when the probe really is small.

SCALE.md's documented soft spot: ``F.broadcast(probe)`` bypasses
``spark.sql.autoBroadcastJoinThreshold``, so a FACT-sized query table
would be forced driver-resident. ``broadcast_probe=None`` now applies
Catalyst's own threshold rule to the query table's size estimate.
"""

from __future__ import annotations

from multi_attribute_join_search_with_mapreduce_spark.index import cached_posting_index
from multi_attribute_join_search_with_mapreduce_spark.operators.search import (
    _probe_broadcastable,
    multi_attribute_join_search,
)
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

ATTRS = ["p_brand", "p_type"]


def _run(spark, sf_dir, **kw):
    postings = cached_posting_index(spark, sf_dir)
    part = load_table(spark, "part", sf_dir)
    t, c = multi_attribute_join_search(postings, part, ATTRS, **kw)
    return (
        {(r.table, r.join_score) for r in t.collect()},
        {(r.table, r.column, r.join_score) for r in c.collect()},
        t,
    )


def test_results_identical_hinted_and_unhinted(spark, sf_dir):
    want_t, want_c, _ = _run(spark, sf_dir, broadcast_probe=True)
    for kw in ({"broadcast_probe": False}, {"broadcast_probe": None}, {}):
        got_t, got_c, _ = _run(spark, sf_dir, **kw)
        assert got_t == want_t, kw
        assert got_c == want_c, kw


def test_unhinted_plan_still_broadcasts_small_probe(spark, sf_dir):
    """With the hints suppressed, AQE's runtime stats must still pick a
    broadcast join for the kilobyte-sized probe at fixture scale — the
    fallback only removes the FORCED broadcast, not the strategy."""
    _, _, t = _run(spark, sf_dir, broadcast_probe=False)
    plan = t._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_auto_decision_follows_threshold(spark, sf_dir):
    part = load_table(spark, "part", sf_dir).select(*ATTRS)
    assert _probe_broadcastable(part) is True

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # user disabled auto-broadcast -> auto must respect it
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert _probe_broadcastable(part) is False
        # a 1-byte threshold makes even the fixture "fact-sized"
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
        assert _probe_broadcastable(part) is False
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
