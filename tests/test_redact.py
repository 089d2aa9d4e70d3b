"""PII scrub + pseudonymization unit checks (the registry entries are
also differentially verified in test_queries_differential)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.operators.redact import (
    ANON_SALT,
    anonymize_events,
    pii_scrub,
    scrub_text,
)


def test_scrub_text_all_three_kinds(spark):
    raw = (
        "reach me at jane.doe+spam@sub.example.co.uk or 555-867-5309, "
        "server at 192.168.001.1 stays up"
    )
    df = spark.createDataFrame([(raw,)], "t string")
    (out,) = df.select(scrub_text(F.col("t")).alias("s")).collect()[0]
    assert out == (
        "reach me at <EMAIL> or <PHONE>, server at <IP> stays up"
    )


def test_scrub_text_leaves_clean_text_alone(spark):
    raw = "no pii here, just 123 plain-456 words and a.b ellipsis"
    df = spark.createDataFrame([(raw,)], "t string")
    (out,) = df.select(scrub_text(F.col("t")).alias("s")).collect()[0]
    assert out == raw


def test_pii_scrub_counts(spark, sf_dir):
    rows = pii_scrub(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # exactly one of each kind injected per document
        assert (r.n_emails, r.n_phones, r.n_ips) == (1, 1, 1)
        assert len(r.scrub_hash) == 32


def test_anonymize_is_deterministic_and_blind(spark, sf_dir):
    out = anonymize_events(spark, sf_dir)
    rows = {r.user_pseudo: r.n_events for r in out.collect()}
    # deterministic: same salt -> same pseudonyms on a second run
    again = {r.user_pseudo: r.n_events for r in anonymize_events(spark, sf_dir).collect()}
    assert rows == again
    # no raw ids: every key is a 64-hex sha256 digest
    assert all(len(k) == 64 and int(k, 16) >= 0 for k in rows)
    assert ANON_SALT  # salt is versioned, not empty
