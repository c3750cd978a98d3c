"""A1/A2/A4 golden tests: cache semantics (row-per-message, last- and
first-write-wins buckets) and forward-fill equivalence of the windowed and
two-pass block implementations (FIXTURES.md §1.4 golden cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.operators.bucket import bucket_downsample
from dbc_informed_socketcan_to_parquet_spark.operators.ffill import forward_fill, forward_fill_blocks
from dbc_informed_socketcan_to_parquet_spark.operators.pivot import pivot_last, unpivot


def _wide(spark):
    # (Time_ms, a, b): two signals scattered over 3 buckets of 50 ms
    rows = [
        (0.0, 1.0, None),
        (10.0, 2.0, None),
        (60.0, None, 7.0),
        (70.0, 3.0, 8.0),
        (160.0, None, 9.0),
    ]
    return spark.createDataFrame(rows, "Time_ms double, a double, b double")


def test_cache_zero_row_per_message(spark):
    df = _wide(spark)
    assert bucket_downsample(df, 0).count() == df.count()


def test_last_write_wins(spark):
    out = {r.Time_ms: (r.a, r.b) for r in bucket_downsample(_wide(spark), 50).collect()}
    assert out[0] == (2.0, None)      # last a in [0,50)
    assert out[50] == (3.0, 8.0)      # both updated at t=70
    assert out[150] == (None, 9.0)


def test_first_write_wins(spark):
    out = {r.Time_ms: (r.a, r.b) for r in bucket_downsample(_wide(spark), 50, agg="first").collect()}
    assert out[0] == (1.0, None)      # v2 semantics: first write kept
    assert out[50] == (3.0, 7.0)


def test_ffill_window_and_blocks_agree(spark):
    df = bucket_downsample(_wide(spark), 50)
    a = {(r.Time_ms): (r.a, r.b) for r in forward_fill(df, "Time_ms", ["a", "b"]).collect()}
    b = {(r.Time_ms): (r.a, r.b) for r in forward_fill_blocks(df, "Time_ms", ["a", "b"], block_width=60).collect()}
    assert a == b
    assert a[150] == (3.0, 9.0)       # a carried forward across two blocks


def test_ffill_blocks_carry_across_empty_blocks(spark):
    rows = [(0.0, 1.0), (1000.0, None)]
    df = spark.createDataFrame(rows, "Time_ms double, x double")
    out = forward_fill_blocks(df, "Time_ms", ["x"], block_width=10.0)
    got = {r.Time_ms: r.x for r in out.collect()}
    assert got[1000.0] == 1.0


def test_pivot_and_unpivot(spark):
    long_rows = [(0, "a", 1.0, 1), (0, "a", 2.0, 2), (0, "b", 5.0, 1), (50, "b", 6.0, 3)]
    long_df = spark.createDataFrame(long_rows, "bucket long, signal_name string, value double, ord long")
    wide = pivot_last(long_df, ["a", "b"], ["bucket"], order_col="ord")
    got = {r.bucket: (r.a, r.b) for r in wide.collect()}
    assert got[0] == (2.0, 5.0) and got[50] == (None, 6.0)
    back = unpivot(wide, ["bucket"], ["a", "b"])
    assert back.count() == 4  # 2 buckets × 2 signals (nulls kept by unpivot)
