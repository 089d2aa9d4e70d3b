"""Typo-tolerant (fuzzy) string matching — the edit-distance extension
of the reference's exact normalized-key join search.

The reference matches attributes only after exact normalization
(handlers.py:128-154); a real data-integration engine also needs to
match *near*-equal strings (OCR noise, typos, vendor spelling drift).
This module implements the scale-safe shape for that:

1. **Block**, don't cross-join: an edit-distance-:math:`\\le 1` match
   implies the lengths differ by at most 1, so the probe side emits two
   block keys (``len`` and ``len+1`` — a deletion made it one shorter
   than, or equal to, the original) and the dimension side one. The
   equi-join on the block key is an ordinary hash join; the quadratic
   all-pairs comparison never materializes. At fact×fact scale, tighten
   the blocks further with prefix/suffix keys or q-gram LSH — same
   join shape, more keys.
2. **Verify natively**: ``levenshtein`` is a JVM built-in in Spark and
   a native function in DuckDB — the exact check runs inside
   whole-stage codegen on only the blocked candidates.

The fixture query perturbs each distinct ``part.p_type`` (deleting one
md5-picked character — deterministic and engine-identical) and fuzzy-
joins the perturbed vocabulary back against the clean one. The
vocabulary side is dimension-sized at any corpus scale (distinct types,
not rows), so Catalyst broadcasts it; the probe side stays partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

_MAX_DIST = 1


def _perturb(col: F.Column) -> F.Column:
    """Delete the character at position (ascii(md5-hex-digit) mod len)+1
    — a deterministic, content-keyed single-character typo."""
    pos = (F.ascii(F.substring(F.md5(col), 1, 1)) % F.length(col)) + F.lit(1)
    return F.concat(
        F.substring(col, F.lit(1), pos - 1),
        col.substr(pos + 1, F.length(col)),
    )


_PERTURB_SQL = (
    "concat(substr({c}, 1, (ascii(substr(md5({c}), 1, 1)) % length({c}) + 1) - 1), "
    "substr({c}, (ascii(substr(md5({c}), 1, 1)) % length({c}) + 1) + 1, length({c})))"
)


def fuzzy_match_types(spark: SparkSession, sf: str) -> DataFrame:
    """Every perturbed ``p_type`` with every clean ``p_type`` within
    edit distance ``_MAX_DIST``, via length-band blocking."""
    vocab = load_table(spark, "part", sf).select("p_type").distinct()
    probe = vocab.select(_perturb(F.col("p_type")).alias("probe_type")).distinct()
    # ed<=1 bounds the length gap to 1 in either direction (the match
    # may be an insertion, substitution, or deletion relative to the
    # probe) -> three bands per probe row, one per dimension row.
    probe_k = probe.select(
        "probe_type",
        F.explode(
            F.array(
                F.length("probe_type") - 1,
                F.length("probe_type"),
                F.length("probe_type") + 1,
            )
        ).alias("block"),
    )
    vocab_k = vocab.select("p_type", F.length("p_type").alias("block"))
    return (
        probe_k.join(vocab_k, "block")
        .filter(F.levenshtein("probe_type", "p_type") <= _MAX_DIST)
        .select(
            "probe_type",
            F.col("p_type").alias("matched_type"),
            F.levenshtein("probe_type", "p_type").cast("long").alias("edit_dist"),
        )
        .orderBy("probe_type", "matched_type")
    )


_P = _PERTURB_SQL.format(c="p_type")

FUZZY_MATCH_SQL = f"""
WITH vocab AS (SELECT DISTINCT p_type FROM part),
probe AS (SELECT DISTINCT {_P} AS probe_type FROM vocab)
SELECT probe_type, p_type AS matched_type,
  CAST(levenshtein(probe_type, p_type) AS BIGINT) AS edit_dist
FROM probe JOIN vocab
  ON abs(length(probe_type) - length(p_type)) <= 1
WHERE levenshtein(probe_type, p_type) <= {_MAX_DIST}
ORDER BY probe_type, matched_type
"""


def er_resolve_types(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end entity resolution: the full block → verify →
    TRANSITIVELY CLUSTER pipeline over a dirty vocabulary (clean
    ``p_type``s unioned with their perturbed variants). Pairwise fuzzy
    matching alone under-merges — A≈B and B≈C must land A, B, C in ONE
    entity even when A̸≈C — so the verified pairs feed the same
    iterative connected-components operator the dedup pipeline uses,
    with the STRING itself as the node key (min-label propagation is
    type-agnostic; the cluster id is the lexicographically smallest
    member, which doubles as the survivorship rule: pick the canonical
    spelling).

    Scale shape: length-band blocking bounds the self-join (never
    all-pairs), native ``levenshtein`` verifies candidates in codegen,
    and the component rounds shuffle (string, label) pairs only.
    Oracle: exact transitive closure via recursive CTE over the same
    pair SQL.
    """
    from multi_attribute_join_search_with_mapreduce_spark.operators.graph import (
        connected_components,
    )

    vocab = load_table(spark, "part", sf).select("p_type").distinct()
    records = vocab.unionByName(
        vocab.select(_perturb(F.col("p_type")).alias("p_type"))
    ).distinct()
    # The component operator iterates on numeric node ids; strings get
    # content-keyed 60-bit ids (md5 prefix — collision-free at
    # vocabulary scale) and the label maps back to the
    # lexicographically-smallest member string afterwards, so the
    # OUTPUT contract is engine-independent of the id scheme.
    def hid(c: F.Column) -> F.Column:
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

    rec_k = records.select(
        F.col("p_type").alias("rec"),
        # all three bands: the `rec < other` canonical orientation is
        # independent of which side is shorter, so the probe must cover
        # len-1, len, AND len+1 (distinct() collapses double-found
        # same-length pairs).
        F.explode(
            F.array(
                F.length("p_type") - 1,
                F.length("p_type"),
                F.length("p_type") + 1,
            )
        ).alias("block"),
    )
    other_k = records.select(F.col("p_type").alias("other"), F.length("p_type").alias("block"))
    pairs = (
        rec_k.join(other_k, "block")
        .filter(F.col("rec") < F.col("other"))
        .filter(F.levenshtein("rec", "other") <= _MAX_DIST)
        .select(hid(F.col("rec")).alias("src"), hid(F.col("other")).alias("dst"))
        .distinct()
    )
    comp = connected_components(pairs).select("id", "label")
    named = comp.join(
        records.select(F.col("p_type").alias("record"), hid(F.col("p_type")).alias("id")),
        "id",
    )
    canon = named.groupBy("label").agg(
        F.min("record").alias("entity_id"),
        F.count(F.lit(1)).alias("entity_size"),
    )
    return (
        named.join(canon, "label")
        .select("record", "entity_id", "entity_size")
        .orderBy("record")
    )


ER_RESOLVE_SQL = f"""
WITH RECURSIVE vocab AS (SELECT DISTINCT p_type FROM part),
records AS (
  SELECT p_type FROM vocab
  UNION
  SELECT {_P} FROM vocab
),
pairs AS (
  SELECT a.p_type AS src, b.p_type AS dst
  FROM records a JOIN records b
    ON abs(length(a.p_type) - length(b.p_type)) <= 1
   AND a.p_type < b.p_type
  WHERE levenshtein(a.p_type, b.p_type) <= {_MAX_DIST}
),
edges AS (
  SELECT src AS u, dst AS v FROM pairs
  UNION ALL
  SELECT dst, src FROM pairs
),
reach(u, v) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (SELECT u AS record, MIN(v) AS entity_id FROM reach GROUP BY u)
SELECT c.record, c.entity_id, s.entity_size
FROM comp c
JOIN (
  SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS entity_size
  FROM comp GROUP BY entity_id
) s USING (entity_id)
ORDER BY c.record
"""


FUZZY_QUERIES: dict[str, QuerySpec] = {
    "fuzzy_match_types": QuerySpec(fuzzy_match_types, FUZZY_MATCH_SQL),
    "er_resolve_types": QuerySpec(er_resolve_types, ER_RESOLVE_SQL),
}
