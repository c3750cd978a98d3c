"""S4/T9 — Parquet re-ingest with legacy schema migration.

The reference's ``--parquet`` path replays an existing Parquet file as if it
were a message stream, migrating legacy schemas on the way
(/root/reference/src/main.cpp.bak:261-331):

- a column named ``Time``/``timestamp``/``Seconds`` holding *seconds* is
  renamed to ``Time_ms`` and scaled ×1000 (main.cpp.bak:295-304),
- rows with no time column at all get synthetic timestamps
  ``row_number * 11.91`` ms (main.cpp.bak:328-331),
- every cell is cast to the DBC-derived column type (main.cpp.bak:293;
  type map custom_types.cpp:130-140).

The reference materializes the whole file in RAM
(/root/reference/src/inputs/parquetInput.cpp:20) — an anti-pattern we do
not carry: this is a lazy columnar scan with pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.dbc.spec import DbcSpec

#: Legacy second-resolution time column names, checked in this order
#: (/root/reference/src/main.cpp.bak:295-304).
LEGACY_TIME_COLS = ("Time", "timestamp", "Seconds")

#: Synthetic inter-row spacing when no time column exists
#: (/root/reference/src/main.cpp.bak:328-331).
SYNTHETIC_STEP_MS = 11.91


def read_legacy_parquet(
    spark: SparkSession,
    path: str,
    spec: DbcSpec | None = None,
    time_col: str = "Time_ms",
) -> DataFrame:
    df = spark.read.parquet(path)
    return migrate_legacy(df, spec=spec, time_col=time_col)


def migrate_legacy(df: DataFrame, spec: DbcSpec | None = None, time_col: str = "Time_ms") -> DataFrame:
    cols = set(df.columns)
    if time_col not in cols:
        legacy = next((c for c in LEGACY_TIME_COLS if c in cols), None)
        if legacy is not None:
            df = df.withColumn(time_col, F.col(legacy).cast("double") * 1000.0).drop(legacy)
        else:
            # No time axis at all: synthesize one in row order.  Row order of
            # a parquet scan is file order per file; monotonically_increasing_id
            # preserves it within partitions, matching the reference's
            # sequential replay for single-file inputs.
            w = Window.orderBy(F.monotonically_increasing_id())
            df = df.withColumn(time_col, (F.row_number().over(w) - 1).cast("double") * F.lit(SYNTHETIC_STEP_MS))

    if spec is not None:
        for _, sig in spec.all_signals():
            if sig.column_name in df.columns:
                df = df.withColumn(sig.column_name, F.col(sig.column_name).cast(sig.spark_type))
        ordered = [time_col] + [s.column_name for _, s in spec.all_signals() if s.column_name in df.columns]
        df = df.select(*ordered)
    return df
