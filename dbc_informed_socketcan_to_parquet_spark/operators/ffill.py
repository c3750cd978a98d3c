"""A4 — forward-fill (last observation carried forward).

Reference semantics: ``--forward-fill`` keeps each signal's last observed
value in subsequent rows instead of NULL (README.md:38; v1 implementation =
"don't clear the cache", /root/reference/src/main.cpp.bak:399-405; the v2
binary only prints ``FORWARD FILL NOT WRITTEN``,
/root/reference/src/main.cpp:146-148 — we implement the documented
behavior).

Two physical strategies:

- :func:`forward_fill` — the canonical Spark LOCF: ``last(c, ignorenulls)``
  over an unbounded-preceding row window.  With no partition key this
  collapses to a single task; correct, and fine post-downsample (the
  downsample already shrank the data by orders of magnitude), but not the
  100 TB path.
- :func:`forward_fill_blocks` — scalable two-pass LOCF: split the time axis
  into aligned blocks, fill within blocks in parallel, compute each block's
  carry-out (last non-null per column — a tiny aggregate), prefix-fill the
  carries on the driver-sized block table, broadcast-join the carry-in back
  and coalesce.  Work is O(n) with one narrow shuffle (the within-block
  window sorts block-locally) plus one broadcast join: no global sort, no
  single-task stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def forward_fill(
    df: DataFrame,
    order_col: str,
    cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """LOCF over ``order_col``; optionally per ``partition_cols`` group."""
    if cols is None:
        cols = [c for c in df.columns if c != order_col and c not in (partition_cols or [])]
    w = Window.orderBy(order_col) if not partition_cols else Window.partitionBy(*partition_cols).orderBy(order_col)
    w = w.rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def forward_fill_blocks(
    df: DataFrame,
    order_col: str,
    cols: list[str] | None = None,
    block_width: float | None = None,
    num_blocks: int = 256,
) -> DataFrame:
    """Scalable LOCF: aligned time blocks + carry-in broadcast.

    ``block_width`` is in units of ``order_col`` (e.g. ms); when omitted it
    is derived from the observed min/max so ~``num_blocks`` blocks result.
    Correctness is independent of the block width; width only tunes
    parallelism.
    """
    if cols is None:
        cols = [c for c in df.columns if c != order_col]

    if block_width is None:
        # derive the width lazily: broadcast the 1-row min/max aggregate
        # into the same action instead of an eager driver-side .first()
        # pass over the (possibly huge) input
        bounds = df.agg(F.min(order_col).alias("_lo"), F.max(order_col).alias("_hi"))
        width = (F.col("_hi") - F.col("_lo")) / F.lit(float(num_blocks))
        blocked = (
            df.crossJoin(F.broadcast(bounds))
            .withColumn(
                "_blk",
                F.when(width <= 0, F.lit(0))
                .otherwise(F.floor((F.col(order_col) - F.col("_lo")) / width))
                .cast("long"),
            )
            .drop("_lo", "_hi")
        )
    else:
        blocked = df.withColumn(
            "_blk", F.floor(F.col(order_col) / F.lit(float(block_width))).cast("long")
        )

    # Both consumers below (the within-block fill window and the carry-out
    # aggregate) need the data clustered by _blk.  Establish that with ONE
    # explicit exchange they both sit above: the window's required
    # distribution and the aggregate's grouping are each satisfied by this
    # partitioning, so neither inserts its own shuffle, the two plan
    # branches share an identical Exchange subtree, and ReuseExchange
    # executes the (possibly expensive — parse + pivot in the bench spine)
    # upstream exactly once instead of twice (r15; guide §2.4).
    blocked = blocked.repartition("_blk")

    # Pass 1: fill within each block (block-local sort, fully parallel).
    w_in = Window.partitionBy("_blk").orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    filled = blocked
    for c in cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w_in))

    # Pass 2: per-block carry-out = value at the max ord where c is non-null.
    carry_out = blocked.groupBy("_blk").agg(
        *[
            F.max_by(F.col(c), F.when(F.col(c).isNotNull(), F.col(order_col))).alias(c)
            for c in cols
        ]
    )
    # Prefix-fill carries across blocks: the block table is tiny (≈ number
    # of partitions), so a single-task window here is free.
    w_blk = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    carry_in = carry_out.select(
        "_blk", *[F.last(c, ignorenulls=True).over(w_blk).alias(f"_carry_{c}") for c in cols]
    )

    out = filled.join(F.broadcast(carry_in), "_blk", "left")
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"_carry_{c}"))).drop(f"_carry_{c}")
    return out.drop("_blk")
