"""S2/S3 live test: candump lines over a TCP socket (the ``nc`` path) into
the streaming parse + decode lineage — drives Spark's socket source against
an in-process feeder server."""

from __future__ import annotations

import socket
import threading
import time

import pytest

from dbc_informed_socketcan_to_parquet_spark.dbc.compiler import DecodeCompiler
from dbc_informed_socketcan_to_parquet_spark.sources.candump import stream_candump_socket
from dbc_informed_socketcan_to_parquet_spark.streaming.pipeline import streaming_decode

from tests.conftest import le_line


class _Feeder(threading.Thread):
    """Accept one client and push candump lines, then hold the connection."""

    def __init__(self, lines):
        super().__init__(daemon=True)
        self.lines = lines
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.stop_evt = threading.Event()

    def run(self):
        conn, _ = self.sock.accept()
        try:
            payload = ("\n".join(self.lines) + "\n").encode()
            conn.sendall(payload)
            self.stop_evt.wait(timeout=60)
        finally:
            conn.close()


def test_socket_stream_decode(spark, tiny_spec):
    lines = [
        le_line(1700000000.0 + 0.01 * i, 0x100, (500 + i) | (1 << 32)) for i in range(50)
    ] + ["garbage mid-stream", le_line(1700000001.0, 0x999, 0xFF)]
    feeder = _Feeder(lines)
    feeder.start()

    frames = stream_candump_socket(spark, "127.0.0.1", feeder.port)
    wide = streaming_decode(frames.drop("proc_time"), DecodeCompiler(tiny_spec))
    q = (
        wide.writeStream.format("memory")
        .queryName("sock_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT count(*) AS n FROM sock_out").first().n >= 50:
                break
            time.sleep(1)
        rows = spark.sql("SELECT * FROM sock_out").collect()
    finally:
        q.stop()          # C2: graceful stop, no partial-batch corruption
        feeder.stop_evt.set()

    assert len(rows) == 50                      # malformed + unknown-id dropped
    speeds = sorted(r.EngSpeed for r in rows)
    assert speeds[0] == 500 * 0.5 - 100.0
    assert all(r.EngActive for r in rows)
