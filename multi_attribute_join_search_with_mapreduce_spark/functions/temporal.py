"""Timezone-independent epoch arithmetic for TIMESTAMP_NTZ columns.

The lake's ``events.ts`` is parquet TIMESTAMP(MICROS, isAdjustedToUTC=
false), which Spark 4 reads natively as TIMESTAMP_NTZ. NTZ deliberately
has no epoch: ``cast(ts AS DOUBLE/LONG)`` and ``unix_micros(ts)`` are
all AnalysisExceptions, and ``unix_timestamp(ts)`` silently depends on
the *session* timezone — a correctness trap when the engine runs inside
a session it doesn't own (the driver's).

These helpers instead measure wall-clock micros/seconds since the NTZ
epoch with ``timestamp_diff`` — exact 64-bit integers, identical in any
session timezone, and bit-equal to DuckDB's ``epoch_us(ts)`` on the same
naive parquet values. Use them for every duration / ordering / cutoff
computed from lake timestamps.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def _epoch_ntz() -> Column:
    # Naive epoch literal: comparing NTZ wall-clock against it yields
    # the same integers DuckDB's epoch_us/epoch produce for naive
    # timestamps. Built lazily — F.lit needs an active SparkContext,
    # which doesn't exist at import time.
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def epoch_us(col: str | Column) -> Column:
    """Exact integer microseconds since the naive epoch (≡ DuckDB
    ``epoch_us(ts)`` for TIMESTAMP values read from the same parquet)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("MICROSECOND", _epoch_ntz(), c)


def epoch_s(col: str | Column) -> Column:
    """Floor-to-second epoch integer. Matches ``CAST(ts AS LONG)`` on
    legacy TZ reads and DuckDB ``epoch_us(ts) // 1000000``.

    One ``timestamp_diff`` + one float division: the division is exact
    whenever the true quotient is an integer (micros remainder 0), and
    otherwise its rounding error (< 2^-22 s at epoch magnitudes, micros
    < 2^53) is far too small to carry the value across an integer
    boundary — so ``floor`` is the true floor for any realistic
    timestamp."""
    return F.floor(epoch_us(col) / F.lit(1_000_000.0)).cast("long")
