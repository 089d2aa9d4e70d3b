"""PII redaction + pseudonymization operators (training-data hygiene).

Real pre-training pipelines scrub contact data (emails, phone numbers,
IP addresses) from document text and pseudonymize user identifiers in
telemetry before either goes anywhere near a training mix. Both are
pure map-side work — narrow projections over native ``regexp_replace``
/ ``regexp_count`` / ``sha2`` expressions, no shuffle except the final
small aggregate — so they cost one pass over the corpus at any scale.

The ``documents`` fixture is synthetic word-salad with no real PII, so
:func:`pii_scrub` first *injects* deterministic PII derived from
``doc_id`` (documented, same construction in the DuckDB oracle) and
then detects + redacts it. The regex work, replacement semantics, and
counts are exercised for real; only the input construction is
fixture-specific. On a real lake you would point the same scrub
expressions at the raw ``text`` column.

Regex dialect note: patterns here are restricted to the syntax subset
where Java's regex (Spark) and RE2 (DuckDB) agree — character classes,
bounded repetition, alternation; no backrefs, no lookaround — so the
differential oracle is meaningful.

Reference scope note: the reference engine has no redaction surface
(it normalizes text for joining, ``handlers.py:128-154``); these
operators extend the engine per the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

# Patterns valid and equivalent in both Java regex and RE2.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def _inject_pii(text: Column, doc_id: Column) -> Column:
    """Deterministic PII tail derived from doc_id (fixture-only; see
    module docstring). Kept in one place so the Spark and SQL sides
    can't drift."""
    did = doc_id.cast("string")
    return F.concat(
        text,
        F.lit(" Contact: user"), did, F.lit("@example.com tel 555-"),
        F.lpad((doc_id % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((doc_id % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (doc_id % 256).cast("string"),
        F.lit(".0."),
        ((doc_id * 7) % 256).cast("string"),
    )


_INJECT_SQL = (
    "text || ' Contact: user' || doc_id || '@example.com tel 555-' || "
    "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
    "' from 10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256)"
)


def scrub_text(col: Column) -> Column:
    """Redact emails → phones → IPs, in that order. Email first so its
    digit runs can't be half-eaten by the narrower numeric patterns;
    the phone pattern can't match inside an IP (no dashes) and vice
    versa (no dots), so the chain is order-stable after that."""
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")


def scrub_text_sql(expr: str) -> str:
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, '{EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{PHONE_RE}', '<PHONE>', 'g'), "
        f"'{IPV4_RE}', '<IP>', 'g')"
    )


def pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document PII counts + md5 of the redacted text.

    The hash proves byte-identical replacement across engines, not just
    matching counts. All counts are taken against the same pre-scrub
    text so they are independent of redaction order.
    """
    d = load_table(spark, "documents", sf)
    pii = _inject_pii(F.col("text"), F.col("doc_id"))
    return d.select(
        "doc_id",
        F.regexp_count(pii, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(pii, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_count(pii, F.lit(IPV4_RE)).cast("bigint").alias("n_ips"),
        F.md5(scrub_text(pii)).alias("scrub_hash"),
    )


PII_SCRUB_SQL = f"""
WITH pii AS (SELECT doc_id, {_INJECT_SQL} AS t FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(t, '{IPV4_RE}')) AS BIGINT) AS n_ips,
  md5({scrub_text_sql('t')}) AS scrub_hash
FROM pii
"""


ANON_SALT = "majs-anon-v1"  # versioned pepper; rotate => new pseudonym space


def anonymize_events(spark: SparkSession, sf: str) -> DataFrame:
    """Pseudonymize ``events.user_id`` with salted SHA-256 and aggregate
    per pseudonym. Joins between datasets anonymized with the same salt
    version still line up (the mapping is deterministic), but raw ids
    never leave the pipeline. Map-side hash + one hash-partitioned
    aggregate — the same cost profile as a plain groupBy(user_id)."""
    e = load_table(spark, "events", sf)
    pseudo = F.sha2(F.concat(F.lit(ANON_SALT), F.col("user_id").cast("string")), 256)
    return (
        e.select(pseudo.alias("user_pseudo"), "event_type")
        .groupBy("user_pseudo")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


ANONYMIZE_SQL = f"""
SELECT sha256('{ANON_SALT}' || CAST(user_id AS VARCHAR)) AS user_pseudo,
  COUNT(*) AS n_events
FROM events GROUP BY 1
"""


REDACT_QUERIES: dict[str, QuerySpec] = {
    "pii_scrub": QuerySpec(pii_scrub, PII_SCRUB_SQL),
    "anonymize_events": QuerySpec(anonymize_events, ANONYMIZE_SQL),
}
