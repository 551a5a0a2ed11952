"""Timestamp-type-tolerant time expressions.

The driver's parquet testdata has carried three different physical types
for ``events.ts`` across regenerations: TIMESTAMP(NANOS) (read as long via
``spark.sql.legacy.parquet.nanosAsLong``), TIMESTAMP(MICROS) with UTC
adjustment (Spark ``TIMESTAMP``), and TIMESTAMP(MICROS) without timezone
(Spark ``TIMESTAMP_NTZ`` — the Spark 4 default for tz-naive parquet).
``F.unix_micros`` accepts only ``TIMESTAMP``, so every epoch-arithmetic
expression in the engine routes through :func:`epoch_micros`, which casts
first.  The cast is a no-op for ``TIMESTAMP`` and interprets ``TIMESTAMP_NTZ``
wall-clock in the session timezone — the catalog pins that to UTC
(``queries._t``), which is exactly DuckDB's ``epoch_us`` on naive
timestamps, so oracle hashes agree.  For *difference* arithmetic (session
gaps, funnel durations, trailing range frames) the session-timezone offset
cancels entirely, so those are correct under any fixed session timezone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_micros(col: Column | str, *, nanos_long: bool = False) -> Column:
    """Microseconds since the epoch for TIMESTAMP *or* TIMESTAMP_NTZ input.

    ``unix_micros(cast(c AS timestamp))`` — integer microseconds, never a
    double (epoch-micros exceed a double's 53-bit mantissa at nanosecond
    precision and row-dependent rounding would break oracle hash-matches).

    NOT safe for an integral column: ``cast(LONG AS timestamp)`` reads the
    value as epoch *seconds*, so a TIMESTAMP(NANOS) column read as long
    under ``nanosAsLong`` would come out silently 1e9× wrong.  The catalog
    loader (``queries._t``) converts that layout to a real timestamp at
    read time; callers holding the raw long instead pass
    ``nanos_long=True``, which truncates nanos→micros with *integer*
    division (``div``, never ``/`` — see mantissa note above).
    """
    c = F.col(col) if isinstance(col, str) else col
    if nanos_long:
        return F.call_function("div", c.cast("long"), F.lit(1000))
    return F.unix_micros(c.cast("timestamp"))


__all__ = ["epoch_micros"]
