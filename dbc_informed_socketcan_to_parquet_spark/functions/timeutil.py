"""Timezone- and precision-safe time arithmetic.

All engine time math runs on epoch-millisecond integers rather than
timestamps, for three reasons:

1. Spark timestamp rendering/parsing depends on the *session* timezone,
   which the engine does not control when embedded (the driver harness
   owns the session).  ``unix_millis`` is timezone-independent.
2. The fixtures carry nanosecond-precision parquet timestamps; Spark
   truncates to microseconds on read while DuckDB keeps ns.  Millisecond
   flooring is the finest granularity on which both engines agree
   (floor(ns → µs → ms) ≡ floor(ns → ms) for non-negative epochs).
3. The reference's own time axis *is* epoch-derived milliseconds
   (``Time_ms``, /root/reference/src/decoder.cpp:15).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms(ts: Column) -> Column:
    """Epoch milliseconds (floor) of a timestamp column, TZ-independent."""
    return F.floor(F.unix_micros(ts) / F.lit(1000)).cast("long")


def utc_ms(iso: str) -> int:
    """Driver-side constant: epoch ms of an ISO date/datetime taken as UTC.

    Used instead of comparing timestamps to string literals (which Spark
    parses in session TZ)."""
    dt = datetime.fromisoformat(iso)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def bucket_ms(ts_ms: Column, width_ms: float) -> Column:
    """Aligned tumbling-bucket start for an epoch-ms column.

    The reference's buckets are stream-relative and drift by one message
    (event-driven close, /root/reference/src/main.cpp:110-131 — see
    SURVEY.md §2.3 A1); we adopt epoch-aligned buckets as the clean,
    shuffle-friendly semantic and document the divergence.  Width may be
    fractional ms; output is the bucket's start in ms (double when width
    is fractional, long otherwise).
    """
    if float(width_ms) == int(width_ms):
        w = int(width_ms)
        return (F.floor(ts_ms / F.lit(w)) * F.lit(w)).cast("long")
    return F.floor(ts_ms / F.lit(float(width_ms))) * F.lit(float(width_ms))
