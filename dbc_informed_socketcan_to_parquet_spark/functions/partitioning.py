"""Partition-shape guards for row-multiplying operators.

A small input (one parquet file, a broadcast-sized dimension) scans as a
single partition; any operator that multiplies rows downstream of it —
shingle explode (~4k rows per document), fingerprint windows, per-query
similarity fan-out — then runs on ONE core no matter how large the
cluster is.  Measured at sf0.1 on local[32]: the simhash shingle explode
alone took 5.7 s single-threaded; fanned out it takes a fraction of a
second.  The repartition cost is a shuffle of the *narrow pre-explode*
rows, trivial next to the exploded work it parallelizes.

At real scale the guard is a no-op: a 100 TB table already scans with
more partitions than ``defaultParallelism``, so ``fan_out`` never
shrinks or reshuffles it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism (× ``multiplier``) — only when it currently has fewer
    partitions.  Use immediately before explode-like operators whose
    output is orders of magnitude larger than their input."""
    sc = df.sparkSession.sparkContext
    target = max(int(sc.defaultParallelism) * multiplier, 1)
    # .rdd triggers physical planning but no job; cheap for this check
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
