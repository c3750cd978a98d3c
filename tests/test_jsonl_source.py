"""JSONL document source: schema enforcement, corrupt-line quarantine,
round-trip, and streaming directory pickup."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.sources.jsonl import (
    CORRUPT_COL,
    DOC_SCHEMA,
    read_jsonl,
    split_corrupt,
    stream_jsonl_dir,
    write_jsonl,
)


def _doc(i: int) -> dict:
    text = f"document number {i} with some text"
    return {"doc_id": i, "text": text, "lang": "en", "source": "web", "n_chars": len(text)}


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    lines = [json.dumps(_doc(i)) for i in range(10)]
    lines.insert(3, "{not valid json at all")
    lines.insert(7, '"a bare string is not an object"')
    (tmp_path / "shard0.jsonl").write_text("\n".join(lines) + "\n")

    df = read_jsonl(spark, str(tmp_path / "shard0.jsonl"))
    assert df.columns == [f.name for f in DOC_SCHEMA.fields] + [CORRUPT_COL]

    clean, quarantine = split_corrupt(df)
    assert clean.count() == 10
    assert {r.doc_id for r in clean.collect()} == set(range(10))
    bad = [r.raw_line for r in quarantine.collect()]
    assert "{not valid json at all" in bad and len(bad) == 2

    # DROPMALFORMED: corrupt lines silently dropped, no corrupt column
    dropped = read_jsonl(spark, str(tmp_path / "shard0.jsonl"), keep_corrupt=False)
    assert CORRUPT_COL not in dropped.columns
    assert dropped.count() == 10

    # the shared default schema must not have been mutated by the reads
    assert len(DOC_SCHEMA.fields) == 5


def test_jsonl_round_trip(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "export")
    write_jsonl(docs, out)
    back, quarantine = split_corrupt(read_jsonl(spark, out))
    assert quarantine.count() == 0
    assert back.count() == docs.count()
    # value-exact round trip
    a = {tuple(r) for r in docs.select("doc_id", "text", "lang", "source", "n_chars").collect()}
    b = {tuple(r) for r in back.select("doc_id", "text", "lang", "source", "n_chars").collect()}
    assert a == b


def test_stream_jsonl_dir_picks_up_new_shards(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    (land / "s0.jsonl").write_text("\n".join(json.dumps(_doc(i)) for i in range(5)) + "\n")

    stream = stream_jsonl_dir(spark, str(land), max_files_per_trigger=1)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_ingest")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) c FROM jsonl_ingest").collect()[0].c == 5
        # a new shard (with one corrupt line) lands mid-stream
        lines = [json.dumps(_doc(i)) for i in range(5, 9)] + ["broken {"]
        (land / "s1.jsonl").write_text("\n".join(lines) + "\n")
        q.processAllAvailable()
        rows = spark.sql(f"SELECT doc_id, {CORRUPT_COL} FROM jsonl_ingest").collect()
        assert len(rows) == 10
        assert sum(1 for r in rows if r[CORRUPT_COL] is not None) == 1
        assert {r.doc_id for r in rows if r.doc_id is not None} == set(range(9))
    finally:
        q.stop()


def test_jsonl_stream_composes_with_streaming_dedup(spark, tmp_path):
    """The online ingest composition: JSONL landing dir → quarantine split
    → watermarked exact dedup → sink.  A re-delivered shard (same content,
    new file) must not re-emit its documents."""
    from dbc_informed_socketcan_to_parquet_spark.streaming.dedup import (
        streaming_exact_dedup,
    )

    land = tmp_path / "landing"
    land.mkdir()
    shard = "\n".join(json.dumps(_doc(i)) for i in range(6)) + "\nbroken{\n"
    (land / "s0.jsonl").write_text(shard)

    stream = stream_jsonl_dir(spark, str(land), max_files_per_trigger=1)
    clean, _ = split_corrupt(stream)
    clean = clean.withColumn("event_time", F.current_timestamp())
    deduped = streaming_exact_dedup(clean, watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("jsonl_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) c FROM jsonl_dedup").collect()[0].c == 6
        # the same shard content redelivered under a new name: all dups
        (land / "s0_redelivery.jsonl").write_text(shard)
        # plus one genuinely new document
        (land / "s1.jsonl").write_text(json.dumps(_doc(99)) + "\n")
        q.processAllAvailable()
        rows = spark.sql("SELECT doc_id FROM jsonl_dedup").collect()
        assert sorted(r.doc_id for r in rows) == [0, 1, 2, 3, 4, 5, 99]
    finally:
        q.stop()
