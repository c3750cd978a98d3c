"""As-of join and sessionization — the time-series operators a signal
engine needs beyond plain relational algebra (absent from both Spark's
builtin surface and the reference; SURVEY §2.6 / public "common OLAP
patterns").

As-of join, Spark-first: Spark has no native ASOF JOIN; the scalable
re-expression is the **union trick** — interleave left probes and right
quotes into one stream, partition by the equi-key, order by (time,
side-rank), and carry the latest quote forward with
``last(_, ignorenulls)``.  One shuffle on the key, per-key local sort, no
range-explosion, no per-group Python.  (The ``merge_asof``-per-group
Pandas fallback exists for exotic tolerances, but the union form covers
the backward-join default.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    order: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row: the latest right row with
    ``right.order <= left.order`` (or ``<`` when ``strict``) per ``by`` key.

    Both inputs must share the ``by`` and ``order`` columns; ``value_cols``
    are taken from the right side.  Left columns pass through.
    """
    l_tag, r_tag = (1, 0) if not strict else (0, 1)
    lhs = left.withColumn("_side", F.lit(l_tag))
    for c in value_cols:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None))
    rhs_cols = [by, order] + value_cols
    rhs = right.select(*rhs_cols).withColumn("_side", F.lit(r_tag))
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    unioned = lhs.select(*lhs.columns).unionByName(rhs.select(*lhs.columns))

    # quotes sort before probes at equal timestamps (>= semantics); with
    # strict=True the tags flip and probes see only strictly-earlier quotes
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(order), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for c in value_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.filter(F.col("_side") == l_tag).drop("_side")


def sessionize(
    df: DataFrame,
    by: str,
    ts_col: str,
    gap: int,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap to the
    previous event exceeds ``gap`` (same units as ``ts_col``).

    The canonical lag+cumsum sessionization: one shuffle on the key, the
    cumulative sum runs inside the per-key sorted window.  (Streaming
    flavor: ``session_window`` in Structured Streaming.)
    """
    w = Window.partitionBy(by).orderBy(ts_col)
    is_new = F.when(
        (F.col(ts_col) - F.lag(ts_col).over(w)) > gap, 1
    ).otherwise(F.when(F.lag(ts_col).over(w).isNull(), 1).otherwise(0))
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("session_id", F.sum(is_new).over(w_run))


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    within: int,
) -> DataFrame:
    """Pairs with ``|left_ts - right_ts| <= within`` per ``by`` key, as an
    EQUI-join: bucket the time axis at ``within`` granularity and probe the
    three adjacent buckets, then filter exactly.

    A naive inequality join plans as BroadcastNestedLoopJoin (quadratic,
    cluster-killing); this shape is a hash join on (key, bucket) with ≤3×
    probe fan-out — the standard interval-join decomposition (what
    dedicated stream engines do for interval joins internally).
    """
    lb = F.floor(F.col(left_ts) / F.lit(within)).cast("long")
    probe = left.select(
        "*", F.explode(F.array(lb - 1, lb, lb + 1)).alias("_bkt")
    )
    build = right.select(
        F.col(by), F.col(right_ts),
        F.floor(F.col(right_ts) / F.lit(within)).cast("long").alias("_bkt"),
        *[c for c in right.columns if c not in (by, right_ts)],
    )
    joined = probe.join(build, [by, "_bkt"])
    return joined.filter(
        F.abs(F.col(left_ts) - F.col(right_ts)) <= F.lit(within)
    ).drop("_bkt")


def debounce(
    df: DataFrame,
    by: str,
    ts_col: str,
    min_gap: int,
) -> DataFrame:
    """First-of-burst debounce: collapse each chain of sub-``min_gap``
    events to its first row, per key (sensor chatter suppression).

    Semantics: a row survives iff its gap to the previous RAW row exceeds
    ``min_gap`` (or it is the key's first row).  A chain of events each
    within ``min_gap`` of the previous one collapses to one row regardless
    of the chain's total span — e.g. events at t=0,3,6 with min_gap=4 keep
    only {0}.  This differs from greedy "distance to the previously KEPT
    row" debounce (which would keep {0,6}); greedy kept-row state is
    inherently sequential and cannot be expressed as a fixed-depth window
    — first-of-burst is the distributed-friendly form and is what the
    oracle pins.
    """
    w = Window.partitionBy(by).orderBy(ts_col)
    gap_break = F.when(
        (F.col(ts_col) - F.lag(ts_col).over(w)) > min_gap, 1
    ).otherwise(F.when(F.lag(ts_col).over(w).isNull(), 1).otherwise(0))
    grp = F.sum(gap_break).over(w.rowsBetween(Window.unboundedPreceding, 0))
    w_grp = Window.partitionBy(by, grp).orderBy(ts_col)
    return (
        df.withColumn("_rn", F.row_number().over(w_grp))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
