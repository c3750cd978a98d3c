"""Mergeable-sketch rollups — the incremental-statistics pattern at 100 TB.

``approx_count_distinct`` answers one query over one scan; at corpus
scale the question is different: distinct counts per (source, day) slice
that can be COMBINED later — union any subset of slices (a week, one
source, the whole corpus) without rescanning the data.  Apache
DataSketches HLL sketches (Spark 4's ``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) are exactly that: a
fixed-size binary per group, persisted next to the rollup, unioned
associatively afterwards.

The same shape carries any mergeable summary (KLL quantiles, CPC, theta);
HLL distinct-counting is the canonical instance a curation pipeline needs
(distinct urls/doc-hashes per shard, dedup-rate dashboards, leakage
monitors) so it is the one implemented and accuracy-pinned here
(tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Per-group HLL sketch of distinct ``value_col`` values:
    ``group_cols + (n_rows, hll_sketch binary)``.

    One hash aggregation with map-side partial sketches — the shuffle
    carries one ~``2^lg_k``-byte sketch per (task, group), never raw
    values.  Persist the result as the slice-level rollup table; later
    queries union sketches instead of rescanning raw data.
    """
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k)).alias(sketch_col),
    )


def sketch_union(
    rollup: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Re-aggregate a sketch rollup to a coarser grain (e.g. (source, day)
    → source, or → the single global row when ``group_cols`` is empty):
    ``group_cols + (n_rows, estimate)``.

    Input is the (tiny) rollup table — unioning is associative and
    commutative, so any slice combination is exact-sketch-equivalent to
    having sketched the raw union directly.
    """
    grouped = rollup.groupBy(*group_cols) if group_cols else rollup.groupBy()
    return grouped.agg(
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias("estimate"),
    )
