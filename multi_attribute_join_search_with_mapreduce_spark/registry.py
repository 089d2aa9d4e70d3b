"""Named-query registry shared by the driver contract and bench.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the
equivalent DuckDB SQL (the differential oracle). ``sql=None`` marks a
genuinely non-SQL-expressible operator (driver falls back to a
rows-only check).

Determinism conventions (so order-insensitive value-hashes match):

- every computed column is aliased identically on both sides;
- money sums go through DECIMAL(18,2) so accumulation is exact and
  partition-order-independent (double sums are not associative), then
  cast back to DOUBLE;
- counts / integer sums are cast to BIGINT on the DuckDB side (DuckDB
  widens SUM(BIGINT) to HUGEINT);
- top-k queries order on a total key (ties broken by ids) before LIMIT.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    # str = static oracle; None = rows-only; zero-arg callable = lazy
    # oracle whose text is derived from the data (pca_project embeds
    # eigensolved loadings as literals) — resolved via resolve_sql() so
    # importing the registry never pays the generation cost.
    sql: str | None | Callable[[], str]


_ORACLE_PIN_SF = "/root/testdata/sf0.01"  # the driver's correctness scale
_LAZY_SQL_CACHE: dict[tuple[int, str], str] = {}


def resolve_sql(spec: "QuerySpec", sf_dir: str | None = None) -> str | None:
    """Resolve a QuerySpec's oracle to its SQL text (or None).

    Lazy oracles derive literals from the data, so they need the sf dir:
    pass it when known (tests / driver_sim) and it is exported as
    ``SPARK_GRAFT_ORACLE_SF_DIR`` for the callable; with no sf_dir the
    var is explicitly (re)pinned to sf0.01 — the driver's correctness
    scale — so a leftover export from an earlier scale-specific
    resolve_sql in the same process can never leak into a bare
    ``oracle_sql()`` call (wrong-scale literals would red-flag a correct
    engine). Resolutions are memoized per (callable, sf): the pca oracle
    runs a DuckDB gram read + eigensolve, which should happen once per
    scale, not once per oracle_sql() call.
    """
    if not callable(spec.sql):
        return spec.sql
    import os

    effective = sf_dir if sf_dir is not None else _ORACLE_PIN_SF
    key = (id(spec.sql), effective)
    if key in _LAZY_SQL_CACHE:
        return _LAZY_SQL_CACHE[key]
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = effective
    out = spec.sql()
    _LAZY_SQL_CACHE[key] = out
    return out


# Queries whose PURPOSE is the Python-executed surface itself — the one
# shared exemption list for the BatchEvalPython gates (tests/test_plans
# and tools/plan_audit import this, so the two can never diverge). The
# UDTF entry proves the @udtf + LATERAL machinery; its native twin
# (chunk_documents) stays under the no-Python gate.
PYTHON_EVAL_ALLOWED: frozenset[str] = frozenset({"chunk_documents_udtf"})


def merge(*registries: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for r in registries:
        dup = set(out) & set(r)
        if dup:
            raise ValueError(f"duplicate query names: {sorted(dup)}")
        out.update(r)
    return out
