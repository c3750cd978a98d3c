"""Storage layouts for recurring workloads — the write-time half of the
100 TB design.

Two levers Spark gives a curated table that a raw parquet dump lacks:

- **Hash bucketing** (``write_bucketed_table``): rows are hash-placed
  into a fixed number of buckets by key at WRITE time.  Every later
  join or aggregation on that key reads co-located data — the exchange
  disappears from the plan entirely (see
  tests/test_storage.py::test_bucketed_join_no_shuffle).  At 100 TB a
  recurring join's shuffle is usually the dominant cost; paying one
  shuffle at ingest amortizes it across every downstream run.
- **Directory partitioning** (``partition_by`` on ``write_parquet`` /
  here): low-cardinality columns (date, source, language) become
  directories; a filter on them prunes whole directories at planning
  time (``PartitionFilters`` in the scan) — the scan never opens the
  files, which is the difference between reading 100 TB and reading one
  day's slice.

Bucketed tables go through the catalog (``saveAsTable``) because bucket
metadata lives there; pass ``path`` to keep the data external.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    partition_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted, optionally
    directory-partitioned) parquet table registered as ``name``."""
    w = df.write.format("parquet").mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w = w.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet: filters on ``partition_cols`` prune
    at planning time."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
