"""T1 parser tests: golden lines, malformed-line skip semantics, truncation
(reference: /root/reference/src/inputs/candump_parse.h:38-101 — skip + warn;
>8-byte payloads truncated, candump_parse.h:87-89)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.functions.candump import (
    format_candump_line,
    parse_candump_lines,
)


def _parse(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    return parse_candump_lines(df).orderBy("ts").collect()


def test_golden_line(spark):
    rows = _parse(spark, ["(1700000000.123456) vcan0 1A5#DEADBEEF01020304"])
    assert len(rows) == 1
    r = rows[0]
    assert abs(r.ts - 1700000000.123456) < 1e-5
    assert r.iface == "vcan0"
    assert r.can_id == 0x1A5
    assert bytes(r.data) == bytes.fromhex("DEADBEEF01020304")


def test_malformed_lines_skipped(spark):
    rows = _parse(spark, [
        "",                                   # empty
        "garbage",                            # no structure
        "(notanumber) vcan0 100#00",          # bad ts
        "(1.0) vcan0 XYZ#00",                 # bad hex id
        "(1.0) vcan0 100 00",                 # missing '#'
        "(2.0) vcan0 100#AB",                 # valid
    ])
    assert len(rows) == 1 and rows[0].can_id == 0x100


def test_payload_truncated_to_8_bytes(spark):
    rows = _parse(spark, ["(1.0) vcan0 7FF#" + "AB" * 12])
    assert bytes(rows[0].data) == bytes.fromhex("AB" * 8)


def test_empty_and_odd_payload(spark):
    rows = _parse(spark, ["(1.0) vcan0 10#", "(2.0) vcan0 11#ABC"])
    assert bytes(rows[0].data) == b""
    # odd trailing nibble dropped, byte pairs kept
    assert bytes(rows[1].data) == bytes.fromhex("AB")


def test_remote_request_frame(spark):
    rows = _parse(spark, ["(1.0) vcan0 100#R"])
    assert len(rows) == 1 and bytes(rows[0].data) == b""


def test_format_parse_roundtrip(spark):
    df = spark.createDataFrame(
        [(1700000000.25, "can0", 0x1A5, "DEADBEEF")],
        "ts double, iface string, can_id long, payload string",
    )
    line = df.select(
        format_candump_line(F.col("ts"), F.col("iface"), F.col("can_id"), F.col("payload")).alias("value")
    )
    back = parse_candump_lines(line).collect()[0]
    assert back.can_id == 0x1A5 and abs(back.ts - 1700000000.25) < 1e-6
    assert bytes(back.data) == bytes.fromhex("DEADBEEF")
