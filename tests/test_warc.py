"""WARC ingest (sources/warc, r9).

Round-trips synthesized WARC files (plain + gzip member-per-record)
through the Python Data Source, exercises the robustness doctrine
(truncated tails, missing Content-Length, oversized payloads, charset
fallback), and pins the column-level ``warc_record_decode`` kernel that
the oracle-paired registry entry runs.
"""

from __future__ import annotations

import gzip

import pytest

from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.sources.warc import (
    iter_warc_file,
    read_warc,
    warc_record_decode,
)


def _record(warc_type: str, payload: bytes, url: str | None = None,
            extra: dict | None = None) -> bytes:
    headers = {
        "WARC-Type": warc_type,
        "WARC-Record-ID": f"<urn:uuid:{warc_type}-{len(payload)}>",
        "WARC-Date": "2026-08-15T00:00:00Z",
        "Content-Length": str(len(payload)),
    }
    if warc_type in ("response", "request"):
        headers["Content-Type"] = "application/http; msgtype=" + warc_type
    if url:
        headers["WARC-Target-URI"] = url
    headers.update(extra or {})
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers.items()
    ) + b"\r\n"
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, content_type: str = "text/html; charset=utf-8",
          status: str = "200 OK") -> bytes:
    return (
        f"HTTP/1.1 {status}\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n".encode() + body
    )


def _crawl_records() -> list[bytes]:
    return [
        _record("warcinfo", b"software: synth-crawler/1.0\r\n"),
        _record("request", b"GET /a HTTP/1.1\r\nHost: x.test\r\n\r\n",
                url="https://x.test/a"),
        _record("response", _http(b"<html><body><p>alpha page prose</p></body></html>"),
                url="https://x.test/a"),
        _record("response",
                _http("latin caf\xe9".encode("latin-1"),
                      content_type="text/plain; charset=ISO-8859-1"),
                url="https://x.test/b"),
        _record("response", _http(b'{"k": 1}', content_type="application/json"),
                url="https://x.test/c"),
    ]


@pytest.fixture()
def plain_warc(tmp_path):
    p = tmp_path / "seg-00000.warc"
    p.write_bytes(b"".join(_crawl_records()))
    return str(p)


@pytest.fixture()
def gz_warc(tmp_path):
    # Common Crawl layout: one gzip member PER RECORD, concatenated.
    p = tmp_path / "seg-00000.warc.gz"
    p.write_bytes(b"".join(gzip.compress(r) for r in _crawl_records()))
    return str(p)


def test_plain_warc_responses(spark, plain_warc):
    rows = read_warc(spark, plain_warc).collect()
    assert [r["url"] for r in rows] == [
        "https://x.test/a", "https://x.test/b", "https://x.test/c"]
    assert [r["http_status"] for r in rows] == [200, 200, 200]
    assert rows[0]["text"] == "<html><body><p>alpha page prose</p></body></html>"
    assert rows[0]["warc_type"] == "response"
    assert rows[0]["warc_date"] == "2026-08-15T00:00:00Z"
    assert rows[0]["content_type"] == "text/html; charset=utf-8"
    assert all(r["parse_ok"] for r in rows)


def test_gzip_member_per_record_equals_plain(spark, plain_warc, gz_warc):
    plain = [tuple(r) for r in read_warc(spark, plain_warc)
             .drop("warc_file").collect()]
    gz = [tuple(r) for r in read_warc(spark, gz_warc)
          .drop("warc_file").collect()]
    assert plain == gz


def test_charset_decode_latin1(spark, plain_warc):
    rows = {r["url"]: r["text"] for r in read_warc(spark, plain_warc).collect()}
    assert rows["https://x.test/b"] == "latin café"


def test_html_only_filter(spark, plain_warc):
    rows = read_warc(spark, plain_warc, html_only=True).collect()
    assert [r["url"] for r in rows] == ["https://x.test/a"]


def test_record_types_all(spark, plain_warc):
    rows = read_warc(spark, plain_warc, record_types="*").collect()
    assert [r["warc_type"] for r in rows] == [
        "warcinfo", "request", "response", "response", "response"]
    # request payload is an HTTP *request* — no status line match
    assert rows[1]["http_status"] is None
    assert rows[1]["text"].startswith("GET /a")


def test_directory_glob_and_file_column(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_crawl_records()[2])
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_crawl_records()[3]))
    (tmp_path / "ignored.txt").write_bytes(b"not a warc")
    rows = read_warc(spark, str(tmp_path)).collect()
    assert sorted(r["url"] for r in rows) == [
        "https://x.test/a", "https://x.test/b"]
    assert all(r["warc_file"] for r in rows)


def test_oversized_payload_skipped_not_buffered(spark, tmp_path):
    big = _record("response", _http(b"x" * 4096), url="https://x.test/big")
    small = _record("response", _http(b"<p>small</p>"), url="https://x.test/s")
    p = tmp_path / "seg.warc"
    p.write_bytes(big + small)
    rows = read_warc(spark, str(p), max_content_length=1024).collect()
    by_url = {r["url"]: r for r in rows}
    assert by_url["https://x.test/big"]["text"] is None
    assert by_url["https://x.test/big"]["parse_ok"] is False
    # the reader kept streaming: the NEXT record still parsed fine
    assert by_url["https://x.test/s"]["text"] == "<p>small</p>"
    assert by_url["https://x.test/s"]["parse_ok"] is True


def test_truncated_tail_keeps_earlier_records(tmp_path):
    good = _record("response", _http(b"<p>ok</p>"), url="https://x.test/ok")
    cut = _record("response", _http(b"<p>never finishes</p>"),
                  url="https://x.test/cut")[:-20]
    p = tmp_path / "seg.warc"
    p.write_bytes(good + cut)
    rows = list(iter_warc_file(str(p)))
    assert [r[2] for r in rows] == ["https://x.test/ok"]


def test_missing_content_length_stops_cleanly(tmp_path):
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://x.test/nolen\r\n\r\nbody")
    p = tmp_path / "seg.warc"
    p.write_bytes(_record("response", _http(b"<p>first</p>"),
                          url="https://x.test/1") + bad)
    rows = list(iter_warc_file(str(p)))
    assert [r[2] for r in rows] == ["https://x.test/1"]


def test_header_obs_fold_continuation(tmp_path):
    payload = _http(b"<p>folded</p>")
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: https://x.test/f\r\n"
           b"WARC-Odd: part one\r\n  part two\r\n"
           b"Content-Type: application/http; msgtype=response\r\n"
           + f"Content-Length: {len(payload)}\r\n\r\n".encode()
           + payload + b"\r\n\r\n")
    p = tmp_path / "seg.warc"
    p.write_bytes(rec)
    rows = list(iter_warc_file(str(p)))
    assert len(rows) == 1 and rows[0][7] == "<p>folded</p>"


def test_missing_path_raises(spark, tmp_path):
    with pytest.raises(Exception, match="no WARC files"):
        read_warc(spark, str(tmp_path / "nope")).collect()


def test_record_decode_kernel(spark):
    recs = [
        _record("response", _http(b"<p>kernel page one</p>"),
                url="https://x.test/k1"),
        _record("response",
                _http("acc\xe9nt".encode("latin-1"),
                      content_type="text/plain; charset=latin-1"),
                url="https://x.test/k2"),
        None,
        b"not a warc record at all",
    ]
    df = spark.createDataFrame(
        [(i, bytearray(r) if r is not None else None)
         for i, r in enumerate(recs)],
        "i long, rec binary")
    out = {r["i"]: r["d"] for r in
           df.select("i", warc_record_decode(F.col("rec")).alias("d")).collect()}
    assert out[0]["url"] == "https://x.test/k1"
    assert out[0]["http_status"] == 200
    assert out[0]["text"] == "<p>kernel page one</p>"
    assert out[1]["text"] == "accént"
    assert out[2]["url"] is None and out[2]["text"] is None
    assert out[3]["url"] is None and out[3]["text"] is None


def test_ingest_warc_cli_end_to_end(spark, tmp_path):
    """Crawl front door via the CLI: WARC segments -> extracted documents
    parquet ready for curate (html-only + status-200 defaults, prose out,
    idempotent content-keyed doc ids)."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    prose = ("a genuinely long paragraph of crawl prose with plenty of "
             "distinct everyday words to keep the boilerplate gate happy")
    page = (b"<html><head><script>var x=1;</script></head><body>"
            b"<nav><a href='/'>Home</a></nav><p>" + prose.encode()
            + b"</p></body></html>")
    recs = (
        _record("warcinfo", b"software: synth\r\n")
        + _record("response", _http(page), url="https://x.test/good")
        + _record("response", _http(b"<p>gone</p>", status="404 Not Found"),
                  url="https://x.test/missing")
        + _record("response", _http(b'{"k":1}', content_type="application/json"),
                  url="https://x.test/api")
    )
    seg = tmp_path / "segs"
    seg.mkdir()
    (seg / "part-0.warc.gz").write_bytes(gzip.compress(recs))
    out = tmp_path / "docs.parquet"
    main(["ingest-warc", "--in", str(seg), "--out", str(out), "--extract-html"])
    rows = spark.read.parquet(str(out)).collect()
    assert [r["url"] for r in rows] == ["https://x.test/good"]
    assert rows[0]["text"] == prose          # markup stripped, nav dropped
    assert rows[0]["doc_id"] is not None
    # idempotent re-ingest: same content -> same doc_id
    before = rows[0]["doc_id"]
    main(["ingest-warc", "--in", str(seg), "--out", str(out), "--extract-html"])
    assert spark.read.parquet(str(out)).collect()[0]["doc_id"] == before


def test_stream_warc_incremental_landing_dir(spark, tmp_path):
    """Streaming twin: segments landing over time are each planned
    exactly once (offset = seen-file set), regardless of name order."""
    from dbc_informed_socketcan_to_parquet_spark.sources.warc import stream_warc

    land = tmp_path / "land"
    land.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # deliberately non-monotonic names: z- lands first, a- second
    (land / "z-first.warc").write_bytes(
        _record("response", _http(b"<p>one</p>"), url="https://x.test/1"))
    q = (stream_warc(spark, str(land))
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .start())
    try:
        q.processAllAvailable()
        (land / "a-second.warc.gz").write_bytes(gzip.compress(
            _record("response", _http(b"<p>two</p>"), url="https://x.test/2")))
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    assert sorted(r["url"] for r in rows) == [
        "https://x.test/1", "https://x.test/2"]  # both, exactly once


def test_stream_curate_warc_lane_cli(spark, tmp_path):
    """stream-curate --warc --available-now: crawl segments land, the
    curate lane extracts HTML, gates quality, dedups, and writes
    documents parquet — the streaming twin of ingest-warc + curate."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    prose = ("a genuinely long paragraph of crawl prose with plenty of "
             "distinct everyday words to keep the quality gate happy here")
    page = (b"<html><body><nav><a href='/'>Home</a></nav><p>" + prose.encode()
            + b"</p></body></html>")
    land = tmp_path / "land"
    land.mkdir()
    recs = (
        _record("response", _http(page), url="https://x.test/good")
        # duplicate content under another URL: streaming dedup drops it
        + _record("response", _http(page), url="https://x.test/mirror")
        + _record("response", _http(b'{"k":1}', content_type="application/json"),
                  url="https://x.test/api")
    )
    (land / "seg-0.warc.gz").write_bytes(gzip.compress(recs))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    main(["stream-curate", "--in", str(land), "--out", out,
          "--checkpoint", ckpt, "--warc", "--available-now",
          "--min-quality", "0.0", "--min-chars", "10"])
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    assert rows[0]["text"] == prose
    assert rows[0]["source"] in ("https://x.test/good", "https://x.test/mirror")
