"""Cell/text normalizer as native Spark column expressions.

Semantics (the engine's spec, derived from the reference's
``clean_argument_for_query``, ``handlers.py:128-154``):

1. lowercase;
2. drop non-ASCII characters (the reference's
   ``encode('ascii','ignore')`` fold);
3. replace every run of characters outside ``[a-z0-9]`` with a single
   space (subsumes the reference's punctuation-translate step and its
   ``[\\W_]+`` regex);
4. trim, split on single spaces;
5. drop empty tokens and the reference's 31-word stopword list
   (``handlers.py:138-140``);
6. re-join with single spaces.

Deliberate divergences from the reference, documented per SURVEY.md §7:

- stopword removal is token-based instead of the reference's sequential
  ``str.replace(' w ', ' ')`` loop, whose result depends on stopword
  iteration order and misses doubled stopwords ("of of") — token
  filtering is order-independent and idempotent;
- the undocumented ``" s " -> "''s "`` rewrite (``handlers.py:146``,
  which re-introduces a quote character the earlier steps removed) is
  dropped.

Three synchronized renderings are provided so the same spec runs as a
Spark plan, as DuckDB oracle SQL, and as plain Python for unit tests.
All Spark-side logic is native expressions / higher-order functions —
JVM-side, codegen-friendly — never a row-at-a-time Python UDF (the
reference wraps this in ``udf(...)`` at ``Par_Search.py:164-166``; that
is its single biggest performance sink and is exactly what we avoid).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's stopword list, verbatim (handlers.py:138-140).
STOPWORDS: tuple[str, ...] = (
    "a", "the", "of", "on", "in", "an", "and", "is", "at", "are", "as",
    "be", "but", "by", "for", "it", "no", "not", "or", "such", "that",
    "their", "there", "these", "to", "was", "with", "they", "will",
    "v", "ve", "d",
)

_NON_ASCII_RE = r"[^\x00-\x7F]"
_NON_ALNUM_RE = r"[^a-z0-9]+"


def _clean_col(col: Column) -> Column:
    c = F.lower(col)
    c = F.regexp_replace(c, _NON_ASCII_RE, "")
    c = F.regexp_replace(c, _NON_ALNUM_RE, " ")
    return F.trim(c)


def tokenize_col(col: Column) -> Column:
    """Stopword-free token array for a raw string column (native exprs)."""
    toks = F.split(_clean_col(col), " ")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.filter(toks, lambda t: (t != "") & ~F.array_contains(stop, t))


def normalize_col(col: Column) -> Column:
    """Normalized single-string key for a raw string column (native exprs)."""
    return F.array_join(tokenize_col(col), " ")


def tokenize_sql(expr: str) -> str:
    """DuckDB SQL rendering of :func:`tokenize_col` over SQL expression ``expr``."""
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return (
        "list_filter(string_split(trim(regexp_replace(regexp_replace("
        f"lower({expr}), '{_NON_ASCII_RE}', '', 'g'), '{_NON_ALNUM_RE}', ' ', 'g')), ' '), "
        f"t -> t <> '' AND t NOT IN ({stop}))"
    )


def normalize_sql(expr: str) -> str:
    """DuckDB SQL rendering of :func:`normalize_col` over SQL expression ``expr``.

    DuckDB's ``array_to_string`` returns NULL for an empty list where
    Spark's ``array_join`` returns ``''`` — the CASE keeps NULL-in →
    NULL-out while mapping empty token lists to ``''``.
    """
    return (
        f"CASE WHEN ({expr}) IS NULL THEN NULL "
        f"ELSE COALESCE(array_to_string({tokenize_sql(expr)}, ' '), '') END"
    )


def normalize_spark_sql(expr: str) -> str:
    """Spark-SQL-dialect rendering of :func:`normalize_col` (for the
    ``spark.sql`` surface — same spec, third dialect)."""
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    toks = (
        "filter(split(trim(regexp_replace(regexp_replace("
        f"lower({expr}), '[^\\\\x00-\\\\x7F]', ''), '[^a-z0-9]+', ' ')), ' '), "
        f"t -> t != '' AND NOT array_contains(array({stop}), t))"
    )
    return f"array_join({toks}, ' ')"


def normalize_py(s: str | None) -> str | None:
    """Pure-Python rendering of the same spec (unit-test oracle)."""
    if s is None:
        return None
    c = s.lower()
    c = c.encode("ascii", "ignore").decode("ascii")
    c = re.sub(_NON_ALNUM_RE, " ", c).strip()
    return " ".join(t for t in c.split(" ") if t and t not in STOPWORDS)
