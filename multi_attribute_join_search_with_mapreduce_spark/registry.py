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
    sql: str | None


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
