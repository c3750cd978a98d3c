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


def test_rollup_cascade_exact_vs_direct(spark):
    import random

    from dbc_informed_socketcan_to_parquet_spark.operators.bucket import (
        bucket_downsample,
        rollup_cascade,
    )

    # sparse two-signal stream with nulls, deterministic shuffle-resistant ord
    rng = random.Random(7)
    rows = [
        (float(t), rng.choice([None, float(rng.randint(0, 99))]),
         rng.choice([None, float(rng.randint(0, 99))]), t)
        for t in range(0, 60_000, 37)
    ]
    df = spark.createDataFrame(rows, "Time_ms double, a double, b double, ord long")

    levels = rollup_cascade(df, [100, 1000, 10_000], order_col="ord")
    assert set(levels) == {100.0, 1000.0, 10_000.0}
    for res, got_df in levels.items():
        want_df = bucket_downsample(df, res, order_col="ord")
        got = sorted(map(tuple, got_df.collect()))
        want = sorted(map(tuple, want_df.collect()))
        assert got == want, f"cascade level {res} diverges from direct"


def test_rollup_cascade_first_semantics_and_validation(spark):
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.bucket import rollup_cascade

    df = spark.createDataFrame(
        [(0.0, 1.0), (40.0, 2.0), (960.0, 3.0)], "Time_ms double, a double"
    )
    lv = rollup_cascade(df, [100, 1000], agg="first")
    top = {r.Time_ms: r.a for r in lv[1000.0].collect()}
    assert top == {0.0: 1.0}  # first write in the 1 s bucket

    with _pytest.raises(ValueError):
        rollup_cascade(df, [100, 250])  # 250 not a multiple of 100
    with _pytest.raises(ValueError):
        rollup_cascade(df, [])


def test_rollup_cascade_accepts_non_binary_nesting(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.bucket import rollup_cascade

    df = spark.createDataFrame([(0.0, 1.0), (0.25, 2.0)], "Time_ms double, a double")
    lv = rollup_cascade(df, [0.1, 0.3])        # 0.3 % 0.1 != 0 in binary float
    assert set(lv) == {0.1, 0.3}


# -- unaligned (bit-parity) bucket replica -----------------------------------

def _ref_bucket_sim(msgs, cache_ms, sig_names):
    """Straight-line replay of /root/reference/src/main.cpp:110-131 +
    writeparquet.h append-only builders: first-write-wins, crossing
    message in the closing row, Time_ms = rowStart, NULL-Time_ms tail."""
    closed, cur, row_start = [], {}, 0.0
    for ts, vals in msgs:
        for s in sig_names:
            v = vals.get(s)
            if v is not None and s not in cur:
                cur[s] = v
        if ts - row_start > cache_ms:
            closed.append((row_start, cur))
            cur, row_start = {}, ts
    if cur:
        closed.append((None, cur))
    return [
        (t, tuple(c.get(s) for s in sig_names)) for t, c in closed
    ]


def test_bucket_unaligned_hand_traced(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.bucket import (
        bucket_downsample_unaligned,
    )

    rows = [
        (0.0, 1.0, None, None),    # opens row 0 (rowStart stays 0.0)
        (30.0, 2.0, 10.0, None),   # a=2 rejected (first-wins), b=10 lands
        (60.0, None, 20.0, 5.0),   # crossing: c=5 lands in CLOSING row 0,
                                   # b=20 rejected; next row starts at 60
        (100.0, 7.0, None, None),  # tail row, never closes
    ]
    df = spark.createDataFrame(rows, "Time_ms double, a double, b double, c double")
    out = bucket_downsample_unaligned(df, 50.0, ["a", "b", "c"]).collect()
    assert len(out) == 2
    r0 = next(r for r in out if r.Time_ms is not None)
    rt = next(r for r in out if r.Time_ms is None)
    assert (r0.Time_ms, r0.a, r0.b, r0.c) == (0.0, 1.0, 10.0, 5.0)
    assert (rt.a, rt.b, rt.c) == (7.0, None, None)


def test_bucket_unaligned_matches_reference_sim(spark):
    import random

    from dbc_informed_socketcan_to_parquet_spark.operators.bucket import (
        bucket_downsample_unaligned,
    )

    rng = random.Random(7)
    ts, msgs = 0.0, []
    for i in range(400):
        ts += rng.choice([0.0, 1.0, 3.0, 9.0, 25.0])
        vals = {
            "a": float(i) if rng.random() < 0.5 else None,
            "n": i if rng.random() < 0.3 else None,
        }
        msgs.append((ts, vals))
    expected = _ref_bucket_sim(msgs, 20.0, ["a", "n"])

    df = spark.createDataFrame(
        [(i, t, v["a"], v["n"]) for i, (t, v) in enumerate(msgs)],
        "seq long, Time_ms double, a double, n long",
    )
    got = bucket_downsample_unaligned(
        df, 20.0, ["a", "n"], order_cols=["Time_ms", "seq"]
    ).collect()
    got_rows = sorted(
        ((r.Time_ms, (r.a, r.n)) for r in got),
        key=lambda x: (x[0] is None, x[0]),
    )
    exp_rows = sorted(expected, key=lambda x: (x[0] is None, x[0]))
    assert got_rows == exp_rows
