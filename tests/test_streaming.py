"""M4 streaming parity: file-source micro-batch drive of the decode +
windowed downsample lineage into a memory sink (synchronous via
processAllAvailable — the public local-smoke pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbc_informed_socketcan_to_parquet_spark.dbc.compiler import DecodeCompiler
from dbc_informed_socketcan_to_parquet_spark.functions.candump import parse_candump_lines
from dbc_informed_socketcan_to_parquet_spark.streaming.pipeline import (
    streaming_bucket_downsample,
    streaming_decode,
)

from tests.conftest import le_line


def test_stream_decode_window(spark, tiny_spec, tmp_path):
    log_dir = tmp_path / "stream_in"
    log_dir.mkdir()
    lines = [le_line(1700000000.0 + 0.01 * i, 0x100, (i % 4096) | (1 << 32)) for i in range(200)]
    (log_dir / "a.log").write_text("\n".join(lines))

    raw = (
        spark.readStream.format("text")
        .schema(T.StructType([T.StructField("value", T.StringType())]))
        .load(str(log_dir))
    )
    frames = parse_candump_lines(raw)
    wide = streaming_decode(frames, DecodeCompiler(tiny_spec))
    sig_cols = [s.column_name for _, s in tiny_spec.all_signals()]
    agged = streaming_bucket_downsample(wide, 500, sig_cols, watermark="5 seconds")

    # append mode would hold every window behind the watermark until a
    # LATER micro-batch advances it — with a single availableNow batch
    # nothing would ever emit.  complete mode emits the full state.
    q = (
        agged.writeStream.format("memory")
        .queryName("stream_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.sql("SELECT * FROM stream_out").collect()
    # 200 frames over 2 s in 500 ms windows → ≥3 closed windows (the last
    # may be held back by the watermark in append mode)
    assert len(out) >= 3
    assert all(r.EngSpeed is not None for r in out)
    assert all(r.Time_ms % 500 == 0 for r in out)
