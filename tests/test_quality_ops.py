"""Closed-form tests for the quality-family additions (k-anonymity,
LM cross-entropy) — hand-computed fixtures, not just the differential
gate."""

from __future__ import annotations

import math
from datetime import datetime


def test_lm_cross_entropy_closed_form(spark, tmp_path):
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import lm_cross_entropy

    docs = [
        (1, "a a b", "en", "s", 5),
        (2, "b c", "en", "s", 3),
    ]
    d = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    lake = tmp_path / "lake"
    d.write.parquet(str(lake / "documents.parquet"))
    out = {r.doc_id: r for r in lm_cross_entropy(spark, str(lake)).collect()}
    # Corpus counts: a=2 b=2 c=1, N=5.
    # CE_1 = ln5 - (2*ln2 + 1*ln2)/3 = ln5 - ln2 = ln 2.5
    # CE_2 = ln5 - (1*ln2 + 1*ln1)/2 = ln5 - ln2/2
    assert out[1].n_tokens == 3 and out[2].n_tokens == 2
    assert out[1].cross_entropy == round(math.log(2.5), 4)
    assert out[2].cross_entropy == round(math.log(5) - math.log(2) / 2, 4)
    # Rarer vocabulary ⇒ strictly higher cross-entropy.
    assert out[2].cross_entropy > out[1].cross_entropy


def test_k_anonymity_audit_flags_small_groups(spark, tmp_path):
    from multi_attribute_join_search_with_mapreduce_spark.operators.quality import (
        _K_ANON,
        k_anonymity_audit,
    )

    day = datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        # 'click' on 2024-03-01: exactly _K_ANON distinct users -> safe
        *[(i, day, 100 + i, "click", 1.0, "{}") for i in range(_K_ANON)],
        # repeat events must not inflate the distinct-user count
        (50, day, 100, "click", 1.0, "{}"),
        # 'view' on 2024-03-01: 2 distinct users -> at risk
        (60, day, 200, "view", 1.0, "{}"),
        (61, day, 201, "view", 1.0, "{}"),
        # NULL event_type excluded by contract
        (70, day, 300, None, 1.0, "{}"),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    lake = tmp_path / "lake"
    e.write.parquet(str(lake / "events.parquet"))
    out = {(r.event_type, r.day): r for r in k_anonymity_audit(spark, str(lake)).collect()}
    assert set(out) == {("click", "2024-03-01"), ("view", "2024-03-01")}
    click = out[("click", "2024-03-01")]
    assert click.user_ct == _K_ANON and click.event_ct == _K_ANON + 1
    assert not click.at_risk
    view = out[("view", "2024-03-01")]
    assert view.user_ct == 2 and view.at_risk
