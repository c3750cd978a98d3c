"""A1/A2 — time-bucket downsample with last/first-value semantics.

The reference's "cache" groups the message stream into ``--cache <ms>``
buckets, one output row per bucket (/root/reference/src/main.cpp:110-131).
Within a bucket each signal keeps ONE value — last-write-wins in v1
(/root/reference/src/main.cpp.bak:340-342), accidentally first-write-wins in
v2 (unchecked ``SetValueAt`` status, /root/reference/src/writeparquet.h:70-75).
We standardize on **last** (the evident intent) and expose ``agg="first"``.

Implementation: ``max_by(value, ord) FILTER (WHERE value IS NOT NULL)``
per signal under a groupBy on the aligned bucket key.  This is
order-independent and therefore shuffle-safe — unlike ``last()`` over a
groupBy, whose result depends on physical row order.  ``ord`` defaults to
the time column; pass a sequence column (e.g. a line number) to break
same-millisecond ties deterministically.

Scale: one hash aggregation = one shuffle on the bucket key, with map-side
partial aggregation; no window, no sort.  Buckets are epoch-aligned
(documented divergence from the reference's stream-relative drift —
SURVEY.md §2.3 A1) precisely so that the key is computable map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.functions.timeutil import bucket_ms


def _one_value(col: str, ord_col: Column, agg: str) -> Column:
    fn = F.max_by if agg == "last" else F.min_by
    guarded_ord = F.when(F.col(col).isNotNull(), ord_col)
    return fn(F.col(col), guarded_ord).alias(col)


def bucket_downsample(
    wide: DataFrame,
    cache_ms: float,
    signal_cols: list[str] | None = None,
    time_col: str = "Time_ms",
    order_col: str | None = None,
    agg: str = "last",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Collapse a sparse wide frame-stream into one row per time bucket.

    ``cache_ms <= 0`` reproduces the reference default (row per message,
    /root/reference/src/arguments.h:29): no aggregation at all.
    ``extra_keys`` allows per-entity streams (e.g. one CAN interface per
    vehicle) to downsample independently without a second shuffle.
    """
    if signal_cols is None:
        # exclude the grouping/order columns or they'd surface twice
        # (once as keys, once as max_by aggregates) with duplicate names
        skip = {time_col, order_col, *(extra_keys or [])}
        signal_cols = [c for c in wide.columns if c not in skip]
    if cache_ms is None or cache_ms <= 0:
        return wide

    ord_col = F.col(order_col) if order_col else F.col(time_col)
    if agg not in ("last", "first"):
        raise ValueError(f"agg must be 'last' or 'first', got {agg!r}")

    bucket = bucket_ms(F.col(time_col), cache_ms).alias(time_col)
    keys = [bucket] + [F.col(k) for k in (extra_keys or [])]
    aggs = [_one_value(c, ord_col, agg) for c in signal_cols if c != order_col]
    return wide.groupBy(*keys).agg(*aggs)
