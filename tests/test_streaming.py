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


@pytest.mark.parametrize("reverse_arrival", [False, True])
def test_stream_downsample_cross_batch_determinism(spark, tiny_spec, tmp_path, reverse_arrival):
    """The per-window value is event-time-defined, not arrival-order-
    defined: a row with an EARLIER event time arriving in a LATER
    micro-batch must not override the window's latest-event-time value.
    Both arrival orders of the same two frames yield identical output."""
    log_dir = tmp_path / f"stream_det_{reverse_arrival}"
    log_dir.mkdir()
    # same 500 ms window [1700000000500, 1700000001000); raw 100 → EngSpeed
    # (factor 0.5, offset -100) = -50.0; raw 200 → 0.0
    late_event = le_line(1700000000.900, 0x100, 200)   # latest event time
    early_event = le_line(1700000000.600, 0x100, 100)
    batches = [late_event, early_event] if reverse_arrival else [early_event, late_event]

    raw = (
        spark.readStream.format("text")
        .schema(T.StructType([T.StructField("value", T.StringType())]))
        .load(str(log_dir))
        .coalesce(1)
    )
    wide = streaming_decode(parse_candump_lines(raw), DecodeCompiler(tiny_spec))
    sig_cols = [s.column_name for _, s in tiny_spec.all_signals()]
    agged = streaming_bucket_downsample(wide, 500, sig_cols, watermark="5 seconds")

    name = f"stream_det_{int(reverse_arrival)}"
    q = agged.writeStream.format("memory").queryName(name).outputMode("complete").start()
    try:
        # one file per micro-batch: true cross-batch arrival-order test
        for i, line in enumerate(batches):
            (log_dir / f"b{i}.log").write_text(line + "\n")
            q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(f"SELECT Time_ms, EngSpeed FROM {name}").collect()
    assert len(rows) == 1
    # the event-time-latest frame (raw 200 → 0.0) wins in BOTH arrival orders
    assert rows[0].Time_ms == 1700000000500.0
    assert rows[0].EngSpeed == 0.0


def test_decode_stream_funnel(spark, tiny_spec, tmp_path):
    """Streaming decode drop funnel: per-batch observe metrics count the
    malformed-line and unknown-id losses (streaming twin of
    plans/pipeline.decode_audit)."""
    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.dbc.compiler import DecodeCompiler
    from dbc_informed_socketcan_to_parquet_spark.sources.candump import (
        stream_candump_dir,
    )
    from dbc_informed_socketcan_to_parquet_spark.streaming.pipeline import (
        decode_stream_funnel,
    )
    from tests.conftest import le_line

    land = tmp_path / "land"
    land.mkdir()
    (land / "cap.log").write_text("\n".join([
        le_line(1.0, 0x100, 0x0123),
        le_line(1.1, 0x101, 0x0456),
        le_line(1.2, 0x7FF, 0x0789),   # unknown id
        "garbage",                      # malformed
    ]) + "\n")
    frames = stream_candump_dir(spark, str(land), observe_funnel=True)
    frames = DecodeCompiler(tiny_spec).known_id_filter(frames).observe(
        "funnel_known_id", F.count(F.lit(1)).alias("rows")
    )
    q = (frames.writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    funnel = {f["stage"]: f for f in decode_stream_funnel(q)}
    assert funnel["parse"]["rows_in"] == 4
    assert funnel["parse"]["dropped"] == 1
    assert funnel["known_id"]["dropped"] == 1
    assert funnel["known_id"]["rows_out"] == 2
