"""asof_join unit semantics: backward-inclusive, tie-break on largest
id, unmatched left rows keep NULL payloads, payload fields atomic."""

from __future__ import annotations

import datetime as dt

from multi_attribute_join_search_with_mapreduce_spark.operators.temporal import asof_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(20)), (2, 200, _ts(5)), (3, 300, _ts(10))],
        "k int, lid int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 900, _ts(10), "exact-tie"),   # same ts as lid=100 -> inclusive
            (1, 901, _ts(10), "tie-larger"),  # same ts, larger id wins the tie
            (1, 902, _ts(15), "mid"),         # latest before lid=101
            (2, 903, _ts(6), "after"),        # after left row -> no match
            # k=3 has no right rows at all
        ],
        "k int, rid int, ts timestamp, tag string",
    )
    out = asof_join(
        left, right, on=["k"], ts="ts", right_cols=["rid", "tag"], tiebreak="rid"
    )
    rows = {r["lid"]: (r["asof_rid"], r["asof_tag"]) for r in out.collect()}
    assert rows[100] == (901, "tie-larger")  # inclusive + max-id tie-break
    assert rows[101] == (902, "mid")  # latest at-or-before, not first
    assert rows[200] == (None, None)  # right row is after -> unmatched
    assert rows[300] == (None, None)  # no right rows for the key
    assert out.count() == 4  # left join: every left row survives


def test_cogrouped_asof_survives_count_pruning(spark, sf_dir):
    """Regression: a count()-style consumer must not prune the cogroup
    kernel's input columns (it did when both sides shared one scan's
    attributes — key-only right frame, KeyError in the kernel). The
    count path and the full-value path must agree."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.temporal import (
        purchase_click_attribution_cogrouped,
    )

    df = purchase_click_attribution_cogrouped(spark, sf_dir)
    n_count_path = df.count()
    n_value_path = len(df.collect())
    assert n_count_path == n_value_path > 0
