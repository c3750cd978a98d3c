"""Cross-micro-batch state: the stateful forward-fill must carry values
from batch 1 into batch 2 (maxFilesPerTrigger=1 forces two batches)."""

from __future__ import annotations

import time

from pyspark.sql import types as T

from dbc_informed_socketcan_to_parquet_spark.streaming.stateful import streaming_forward_fill


def test_forward_fill_carries_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    schema = T.StructType([
        T.StructField("iface", T.StringType()),
        T.StructField("t", T.LongType()),
        T.StructField("a", T.DoubleType()),
        T.StructField("b", T.DoubleType()),
    ])
    # batch 1: a observed; batch 2: a never observed → must carry 2.0
    (in_dir / "b1.csv").write_text("vcan0,1,1.0,\nvcan0,2,2.0,5.0\n")
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    (in_dir / "b2.csv").write_text("vcan0,3,,6.0\nvcan0,4,,\n")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .csv(str(in_dir))
    )
    filled = streaming_forward_fill(stream, "iface", "t", ["a", "b"])
    q = (
        filled.writeStream.format("memory")
        .queryName("ffill_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r.t: (r.a, r.b) for r in spark.sql("SELECT * FROM ffill_out").collect()}
    assert rows[1] == (1.0, None)          # nothing to carry yet for b
    assert rows[2] == (2.0, 5.0)
    assert rows[3] == (2.0, 6.0)           # a carried across the batch boundary
    assert rows[4] == (2.0, 6.0)           # both carried within batch 2


def test_streaming_sessionize_gap_merge_and_split(spark, tmp_path):
    from dbc_informed_socketcan_to_parquet_spark.streaming.stateful import streaming_sessionize

    in_dir = tmp_path / "sess_in"
    in_dir.mkdir()
    schema = T.StructType([
        T.StructField("user", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    # u1: events at 0s,10s (one session), then 120s (gap > 30s -> new session)
    # u2: single event
    (in_dir / "b1.csv").write_text(
        "u1,2024-01-01 00:00:00\n"
        "u1,2024-01-01 00:00:10\n"
        "u2,2024-01-01 00:00:05\n"
    )
    time.sleep(1.1)
    (in_dir / "b2.csv").write_text(
        "u1,2024-01-01 00:02:00\n"
        # advance the watermark far enough to close every session above
        "u3,2024-01-01 00:30:00\n"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .csv(str(in_dir))
    )
    out = streaming_sessionize(stream, "user", "ts", gap="30 seconds", watermark="10 seconds")
    q = (
        out.writeStream.format("memory").queryName("sess_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [(r.user, r.n_events) for r in
            spark.sql("SELECT * FROM sess_out ORDER BY user, session_start").collect()]
    # u1's first two events merged (10s < 30s gap); the 120s event opened
    # a second session; u2 sessioned alone.  u3's session is still open
    # (watermark never passed it) — correctly absent in append mode.
    assert rows == [("u1", 2), ("u1", 1), ("u2", 1)]


def test_streaming_sliding_counts_overlap(spark, tmp_path):
    from dbc_informed_socketcan_to_parquet_spark.streaming.stateful import streaming_sliding_counts

    in_dir = tmp_path / "slide_in"
    in_dir.mkdir()
    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    (in_dir / "b1.csv").write_text(
        "a,2024-01-01 00:00:15\n"      # windows [59:30,00:30) [00:00,01:00)
        "a,2024-01-01 00:00:45\n"      # windows [00:00,01:00) [00:30,01:30)
        "z,2024-01-01 00:30:00\n"      # watermark pump: closes all of the above
    )
    stream = spark.readStream.schema(schema).csv(str(in_dir))
    out = streaming_sliding_counts(stream, "k", "ts", window="1 minute",
                                   slide="30 seconds", watermark="10 seconds")
    q = (
        out.writeStream.format("memory").queryName("slide_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {(r.k, str(r.window_start)): r.n_events for r in
            spark.sql("SELECT * FROM slide_out WHERE k = 'a'").collect()}
    # each event lands in 2 overlapping windows; the shared [00:00,01:00)
    # window holds both
    assert rows[("a", "2023-12-31 23:59:30")] == 1
    assert rows[("a", "2024-01-01 00:00:00")] == 2
    assert rows[("a", "2024-01-01 00:00:30")] == 1
