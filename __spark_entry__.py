"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in
``dbc_informed_socketcan_to_parquet_spark/queries.py`` — one entry per
operator from SURVEY.md §2 plus the north-star corpus operators;
``tests/oracle_harness.py`` is the local replica of the driver's check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbc_informed_socketcan_to_parquet_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's whole spine in one plan —
    candump-format parse (T1) → known-id filter (T6) → bit-field decode
    (T3, little- and big-endian) → aligned 60 s bucket downsample with
    last-write-wins (A1/A2) — expressed as a single declarative lineage."""
    return QUERIES["bucket_downsample_wide"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + north-star.

    Every callable takes (spark, sf_dir) and returns a DataFrame whose
    column names match its ``oracle_sql()`` aliases exactly.
    """
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query — ALL 50 driver queries are
    oracle-paired (the genuinely engine-specific ops — HLL sketches,
    trained-BPE counts, zlib ratios — live in the EXTRA registry as
    rows-only entries, value-pinned in pytest instead)."""
    return dict(ORACLES)
