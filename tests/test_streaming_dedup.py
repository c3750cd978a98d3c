"""Streaming ingest dedup: duplicates suppressed across micro-batches
within the watermark horizon, distinct content passes through."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbc_informed_socketcan_to_parquet_spark.streaming.dedup import streaming_exact_dedup


def _write_batch(log_dir, name, rows):
    (log_dir / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_streaming_dedup_cross_batch(spark, tmp_path):
    log_dir = tmp_path / "stream_docs"
    log_dir.mkdir()
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    raw = (
        spark.readStream.format("json").schema(schema).load(str(log_dir))
        .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    )
    out = streaming_exact_dedup(raw, text_col="text", time_col="event_time", watermark="1 hour")

    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").start()
    )
    try:
        t0 = 1_700_000_000_000
        # batch 1: two distinct docs, one in-batch duplicate
        _write_batch(log_dir, "b0.json", [
            {"doc_id": 1, "ts_ms": t0, "text": "alpha"},
            {"doc_id": 2, "ts_ms": t0 + 1000, "text": "beta"},
            {"doc_id": 3, "ts_ms": t0 + 2000, "text": "alpha"},
        ])
        q.processAllAvailable()
        # batch 2: cross-batch duplicate (within horizon) + one new doc
        _write_batch(log_dir, "b1.json", [
            {"doc_id": 4, "ts_ms": t0 + 3000, "text": "beta"},
            {"doc_id": 5, "ts_ms": t0 + 4000, "text": "gamma"},
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT doc_id, text FROM dedup_out ORDER BY doc_id").collect()
    # first occurrence of each content survives; doc 3 (in-batch dup) and
    # doc 4 (cross-batch dup) are suppressed
    assert [(r.doc_id, r.text) for r in rows] == [(1, "alpha"), (2, "beta"), (5, "gamma")]
