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


def rollup_cascade(
    wide: DataFrame,
    resolutions_ms: list[float],
    signal_cols: list[str] | None = None,
    time_col: str = "Time_ms",
    order_col: str | None = None,
    agg: str = "last",
    extra_keys: list[str] | None = None,
) -> dict[float, DataFrame]:
    """Multi-resolution rollup: each coarser level re-aggregates the
    previous level instead of rescanning the raw stream.

    Exact for last/first-value because buckets are epoch-aligned and
    nested (each resolution must divide the next): the last non-null
    write inside a coarse bucket lives in the LAST fine bucket that has
    one, and the fine level already kept exactly that write.  So
    ``max_by(value, fine_bucket_start)`` over fine rows equals
    ``max_by(value, ord)`` over raw rows.  Requires ``order_col`` (when
    given) to be monotone in ``time_col`` — true for the line-number
    tie-breakers this engine uses.

    Scale: the raw table is scanned ONCE (the finest level); every other
    level aggregates the previous level's output, which is smaller by the
    bucket ratio.  At 100 TB, write each level to a table and build the
    next from the stored copy (otherwise lineage recomputes the chain per
    action); locally the returned DataFrames chain lazily.
    """
    rs = sorted(float(r) for r in resolutions_ms)
    if not rs or rs[0] <= 0:
        raise ValueError("resolutions_ms must be positive")
    for fine, coarse in zip(rs, rs[1:]):
        # ratio-based check: float modulo falsely rejects exact multiples
        # of non-binary resolutions (0.3 % 0.1 != 0 in binary float)
        ratio = coarse / fine
        if abs(ratio - round(ratio)) > 1e-9 or round(ratio) < 1:
            raise ValueError(
                f"resolutions must nest: {coarse} is not a multiple of {fine}"
            )
    if signal_cols is None:
        skip = {time_col, order_col, *(extra_keys or [])}
        signal_cols = [c for c in wide.columns if c not in skip]

    out: dict[float, DataFrame] = {}
    cur, ord_c = wide, order_col
    for r in rs:
        cur = bucket_downsample(
            cur, r, signal_cols=signal_cols, time_col=time_col,
            order_col=ord_c, agg=agg, extra_keys=extra_keys,
        )
        # coarser levels order by the fine bucket start: order_col (if
        # any) does not survive the first aggregation
        ord_c = None
        out[r] = cur
    return out
