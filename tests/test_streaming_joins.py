"""Streaming joins: stream-static broadcast enrichment and the
watermark-bounded stream-stream interval join (streaming/joins.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbc_informed_socketcan_to_parquet_spark.streaming.joins import (
    stream_interval_join,
    stream_static_enrich,
)

_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("vehicle", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def _write_jsonl(path, rows):
    path.write_text(
        "\n".join(
            json.dumps({"ts": f"2026-01-01T00:00:{s:06.3f}", "vehicle": veh, "v": v})
            for s, veh, v in rows
        )
    )


def _stream(spark, d):
    return spark.readStream.schema(_SCHEMA).json(str(d))


def _drain(df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stream_static_enrich_broadcasts_dim(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_jsonl(d / "a.jsonl", [(0.0, "car1", 1), (1.0, "car2", 2), (2.0, "car9", 3)])

    dim = spark.createDataFrame(
        [("car1", "fleet-a"), ("car2", "fleet-b")], ["vehicle", "fleet"]
    )
    out = stream_static_enrich(_stream(spark, d), dim, on="vehicle")
    _drain(out, "enriched")

    rows = {r.v: r.fleet for r in spark.sql("SELECT * FROM enriched").collect()}
    assert rows == {1: "fleet-a", 2: "fleet-b", 3: None}  # left join keeps car9


def test_stream_interval_join_matches_within_window(spark, tmp_path):
    ld, rd = tmp_path / "l", tmp_path / "r"
    ld.mkdir(), rd.mkdir()
    # left: one frame per second; right: events at +0.2s of seconds 1 and 3,
    # plus one far outside any window
    _write_jsonl(ld / "a.jsonl", [(float(s), "car1", s) for s in range(5)])
    _write_jsonl(rd / "a.jsonl", [(1.2, "car1", 100), (3.2, "car1", 300), (30.0, "car1", 999)])

    left = _stream(spark, ld).withColumnRenamed("ts", "l_ts").withColumnRenamed("v", "l_v")
    right = _stream(spark, rd).withColumnRenamed("ts", "r_ts").withColumnRenamed("v", "r_v")

    out = stream_interval_join(
        left, right, "l_ts", "r_ts", on=["vehicle"], lower_ms=0, upper_ms=500
    )
    _drain(out, "ij")

    rows = sorted((r.l_v, r.r_v) for r in spark.sql("SELECT * FROM ij").collect())
    # each event matches exactly the frame whose second it falls into
    assert rows == [(1, 100), (3, 300)]
    cols = spark.sql("SELECT * FROM ij").columns
    assert cols.count("vehicle") == 1  # right-side key dropped


def test_stream_interval_join_rejects_batch_inputs(spark):
    df = spark.range(3).select(
        F.current_timestamp().alias("l_ts"), F.col("id").alias("l_v")
    )
    with pytest.raises(ValueError):
        stream_interval_join(df, df, "l_ts", "r_ts")


def test_stream_interval_join_rejects_same_ts_name(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_jsonl(d / "a.jsonl", [(0.0, "car1", 1)])
    s = _stream(spark, d)
    with pytest.raises(ValueError):
        stream_interval_join(s, s, "ts", "ts")


def test_stream_static_enrich_rejects_streaming_dim(spark, tmp_path):
    d = tmp_path / "in2"
    d.mkdir()
    _write_jsonl(d / "a.jsonl", [(0.0, "car1", 1)])
    s = _stream(spark, d)
    with pytest.raises(ValueError):
        stream_static_enrich(s, s, on="vehicle")
