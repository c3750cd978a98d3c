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


def test_rowlocal_minhash_matches_batch(spark):
    """The streaming (row-local) signature and the batch (explode+groupBy)
    signature must be IDENTICAL — the two dedup tiers agree by
    construction."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import minhash_signatures
    from dbc_informed_socketcan_to_parquet_spark.streaming.dedup import _rowlocal_minhash

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    batch = {r.doc_id: list(r.sig) for r in
             minhash_signatures(docs, "doc_id", "text", num_perms=16, shingle_n=5, seed=42).collect()}
    rowlocal = {r.doc_id: list(r.s) for r in
                docs.select("doc_id", _rowlocal_minhash(F.col("text"), 16, 5, 42, 4096).alias("s")).collect()}
    assert batch == rowlocal


def test_streaming_near_dup_cross_batch(spark, tmp_path):
    from dbc_informed_socketcan_to_parquet_spark.streaming.dedup import streaming_near_dup

    base = ("the quick brown fox jumps over the lazy dog while the river "
            "bank stays quiet and the training corpus keeps growing daily")
    log_dir = tmp_path / "stream_neardup"
    log_dir.mkdir()
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    raw = spark.readStream.format("json").schema(schema).load(str(log_dir))
    out = streaming_near_dup(raw, num_perms=16, shingle_n=5, num_bands=4, threshold=0.5)

    q = (
        out.writeStream.format("memory").queryName("neardup_out")
        .outputMode("append").start()
    )
    try:
        # batch 1: the original + one unrelated doc found their buckets
        _write_batch(log_dir, "b0.json", [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": "completely different material about engines and parquet files"},
        ])
        q.processAllAvailable()
        # batch 2: exact dup of 1, near dup of 1 (one word changed), new distinct
        _write_batch(log_dir, "b1.json", [
            {"doc_id": 3, "text": base},
            {"doc_id": 4, "text": base.replace("quiet", "noisy")},
            {"doc_id": 5, "text": "yet another unrelated document describing socketcan frames"},
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM neardup_out").collect()
    flagged = {}
    for r in rows:
        flagged.setdefault(r.doc_id, set()).add(r.rep_id)
    assert flagged.get(3) == {1}                   # exact dup → rep is doc 1
    assert 4 in flagged and flagged[4] == {1}      # near dup flags too
    ests = {r.doc_id: r.est_jaccard for r in rows}
    assert ests[3] == 1.0                          # identical signature
    assert 2 not in flagged and 5 not in flagged   # distinct docs unflagged
    assert 1 not in flagged                        # the representative itself


def test_streaming_near_dup_ttl_eviction(spark, tmp_path):
    """VERDICT r4 #5: with a processing-time TTL, an idle bucket's state is
    evicted and the next arrival founds a FRESH representative — the
    bounded-state contract that keeps the store finite on an unbounded
    stream.  processAllAvailable() never settles under a processing-time
    timeout (the engine schedules empty batches to fire evictions), so
    this test polls the sink with a deadline instead."""
    import time

    from dbc_informed_socketcan_to_parquet_spark.streaming.dedup import streaming_near_dup

    base = ("the quick brown fox jumps over the lazy dog while the river "
            "bank stays quiet and the training corpus keeps growing daily")
    log_dir = tmp_path / "stream_ttl"
    log_dir.mkdir()
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    raw = spark.readStream.format("json").schema(schema).load(str(log_dir))
    out = streaming_near_dup(
        raw, num_perms=16, shingle_n=5, num_bands=4, threshold=0.5,
        state_ttl_ms=1500,
    )
    q = (
        out.writeStream.format("memory").queryName("neardup_ttl_out")
        .outputMode("append").trigger(processingTime="300 milliseconds")
        .start()
    )

    def wait_for(doc_id, deadline_s=90):
        end = time.monotonic() + deadline_s
        while time.monotonic() < end:
            n = spark.sql(
                f"SELECT count(*) c FROM neardup_ttl_out WHERE doc_id = {doc_id}"
            ).collect()[0].c
            if n > 0:
                return
            time.sleep(0.3)
        raise AssertionError(f"doc {doc_id} never reached the sink")

    try:
        # batch 1: doc 1 founds every bucket; doc 2 (identical text, same
        # buckets) is flagged against rep 1
        _write_batch(log_dir, "b0.json", [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base},
        ])
        wait_for(2)
        # idle past the TTL — the continuously-scheduled empty batches
        # fire the eviction for every bucket doc 1 founded
        time.sleep(5.0)
        # batch 2: identical text again.  If state survived, doc 3 would
        # be flagged against rep 1; after eviction it must found fresh
        # buckets instead, and doc 4 flags against the NEW rep 3.
        _write_batch(log_dir, "b1.json", [
            {"doc_id": 3, "text": base},
            {"doc_id": 4, "text": base},
        ])
        wait_for(4)
    finally:
        q.stop()

    rows = spark.sql("SELECT doc_id, rep_id FROM neardup_ttl_out").collect()
    flagged = {}
    for r in rows:
        flagged.setdefault(r.doc_id, set()).add(r.rep_id)
    assert flagged.get(2) == {1}           # pre-eviction: rep is doc 1
    assert 3 not in flagged                # post-eviction: doc 3 founds fresh buckets...
    assert flagged.get(4) == {3}           # ...and becomes the new representative


def test_streaming_scrub_eval_spans_parity_with_batch(spark):
    """The streaming span scrub (r11) must reproduce the batch
    remove_eval_spans keep_schema rewrite EXACTLY — same \\s+
    tokenization, same lowercased-window md5_long family, same cover
    union — including unaligned quotes, case-folded matches, tab/newline
    whitespace, NULL text, and docs shorter than one window."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        remove_eval_spans,
    )
    from dbc_informed_socketcan_to_parquet_spark.streaming.dedup import (
        eval_span_hashes,
        streaming_scrub_eval_spans,
    )

    quote = "q1 q2 q3 q4 q5 q6"
    eval_df = spark.createDataFrame(
        [(900, f"bench {quote} key")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, f"a1 a2 a3 {quote} z1"),
         (2, f"b1\t{quote.upper()}\n b2  b3"),   # case + tab/newline ws
         (3, "clean words with no overlap whatsoever"),
         (4, "tiny"),
         (5, None), (6, "")],
        "doc_id long, text string",
    )
    w = 4
    batch = {r.doc_id: r.text for r in remove_eval_spans(
        docs, eval_df, window_tokens=w, keep_schema=True).collect()}
    stream_twin = {r.doc_id: r.text for r in streaming_scrub_eval_spans(
        docs, eval_span_hashes(eval_df, window_tokens=w), window_tokens=w,
    ).collect()}
    assert stream_twin == batch
    assert "q1" not in (batch[1] or "") and batch[3].startswith("clean")


def test_stream_curate_decon_spans_e2e(spark, tmp_path):
    """stream-curate with the span scrub: an arriving doc quoting the
    eval corpus lands scrubbed (quote gone, doc kept)."""
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
    )

    quote = " ".join(f"qq{i}" for i in range(8))
    ev = str(tmp_path / "eval.parquet")
    spark.createDataFrame(
        [(900, f"benchmark {quote} answer")], "doc_id long, text string"
    ).write.parquet(ev)
    land = tmp_path / "land"
    land.mkdir()
    doc_text = (f"a long clean essay with plenty of ordinary words {quote} "
                "and then a return to perfectly original prose for the rest")
    _write_batch(land, "b0.json", [
        {"doc_id": 1, "text": doc_text, "lang": "en", "source": "s",
         "n_chars": len(doc_text)},
    ])
    out = str(tmp_path / "out")
    queries = run_streaming_curate(
        spark, str(land), out, str(tmp_path / "ckpt"),
        min_chars=10, min_quality=0.0, available_now=True,
        eval_corpus_path=ev, decon_span_window=4,
    )
    for q in queries:
        q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    assert "qq0" not in rows[0].text and "original prose" in rows[0].text


def test_streaming_semantic_dedup_against_index(spark, tmp_path):
    """STREAMING vs-history embedding gate (r14): records whose embedding
    near-duplicates the persisted history index drop as they arrive; the
    kept set for a drained window equals the BATCH operator's answer on
    the same records (two-tier parity), and records with no history
    candidate in any probed cluster survive (NULL max cosine)."""
    import math

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_write,
        semantic_dedup_against,
    )
    from dbc_informed_socketcan_to_parquet_spark.streaming.dedup import (
        streaming_semantic_dedup_against,
    )

    def unit(seed, dim=8):
        v = [math.sin(seed * 37.0 + d * 13.0) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    history = spark.createDataFrame(
        [(100 + s, unit(s)) for s in range(12)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "hist_idx")
    ivf_index_write(history, idx, dim=8, num_clusters=4, n_iters=2)

    novel = [s / math.sqrt(8) for s in (1, 1, -1, -1, 1, 1, -1, 1)]
    log_dir = tmp_path / "emb_stream"
    log_dir.mkdir()
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    raw = (
        spark.readStream.format("json").schema(schema).load(str(log_dir))
        .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
        .drop("ts_ms")
    )
    out = streaming_semantic_dedup_against(
        raw, spark, idx, threshold=0.95, nprobe=4,
        time_col="event_time", watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory").queryName("sem_against_out")
        .outputMode("append").start()
    )
    try:
        t0 = 1_700_000_000_000
        _write_batch(log_dir, "b0.json", [
            # doc 1 sits exactly on history vector 103 -> drop
            {"doc_id": 1, "ts_ms": t0, "text": "p", "embedding": unit(3)},
            # doc 2 is near-orthogonal to every history vector -> keep
            {"doc_id": 2, "ts_ms": t0 + 1000, "text": "n", "embedding": novel},
            # doc 4 is un-embeddable (NULL embedding) -> KEPT, like the
            # batch gate keeps it (r15 advisory: must not be silently
            # dropped by the probe explode)
            {"doc_id": 4, "ts_ms": t0 + 2000, "text": "x", "embedding": None},
        ])
        q.processAllAvailable()
        # a much-later batch advances the watermark so batch-0 windows
        # finalize (append-mode aggregation emits after the horizon)
        _write_batch(log_dir, "b1.json", [
            {"doc_id": 3, "ts_ms": t0 + 3 * 3_600_000, "text": "late",
             "embedding": novel},
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(
        "SELECT doc_id, text FROM sem_against_out ORDER BY doc_id").collect()
    assert [(r.doc_id, r.text) for r in rows] == [(2, "n"), (4, "x")]

    # two-tier parity: the batch gate over the same landed records keeps
    # the same ids (and never flags the un-embeddable doc 4)
    landed = spark.createDataFrame(
        [(1, unit(3)), (2, novel), (4, None)],
        "doc_id long, embedding array<double>")
    flagged = {r.doc_id for r in semantic_dedup_against(
        spark, idx, landed, threshold=0.95, nprobe=4,
        batch_id_col="doc_id").collect()}
    assert flagged == {1}


import pytest


@pytest.mark.parametrize("layout", ["pq", "sq8"])
def test_streaming_semantic_dedup_against_coded_index(spark, tmp_path, layout):
    """The streaming vs-history embedding gate over a CODES-ONLY index —
    IVF-PQ (ivfpq_index_write) or scalar-quantized (sq8_index_write):
    the static side reconstructs history vectors once, scoring uses the
    stored true norms, and the kept set matches the batch gate on the
    same records — the 100 TB posture where the float history was never
    retained."""
    import math

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivfpq_index_write,
        semantic_dedup_against,
        sq8_index_write,
    )
    from dbc_informed_socketcan_to_parquet_spark.streaming.dedup import (
        streaming_semantic_dedup_against,
    )

    def unit(seed, dim=16):
        # full-rank hash-style family (max pairwise cosine ~0.8)
        v = [math.sin(seed * 12.9898 + d * 78.233) * 43758.5453 % 2.0 - 1.0
             for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    history = spark.createDataFrame(
        [(1000 + s, unit(s)) for s in range(128)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / f"{layout}_hist_idx")
    if layout == "pq":
        ivfpq_index_write(history, idx, dim=16, num_clusters=4,
                          num_subspaces=8, bits=6, pq_iters=4)
    else:
        sq8_index_write(history, idx, dim=16, num_clusters=4)

    novel = unit(5000)  # max cosine vs history ~0.55
    log_dir = tmp_path / f"emb_stream_{layout}"
    log_dir.mkdir()
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    raw = (
        spark.readStream.format("json").schema(schema).load(str(log_dir))
        .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
        .drop("ts_ms")
    )
    out = streaming_semantic_dedup_against(
        raw, spark, idx, threshold=0.9, nprobe=4,
        time_col="event_time", watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory").queryName(f"sem_against_{layout}_out")
        .outputMode("append").start()
    )
    try:
        t0 = 1_700_000_000_000
        _write_batch(log_dir, "b0.json", [
            {"doc_id": 1, "ts_ms": t0, "embedding": unit(3)},      # dup -> drop
            {"doc_id": 2, "ts_ms": t0 + 1000, "embedding": novel}, # keep
            {"doc_id": 4, "ts_ms": t0 + 2000, "embedding": None},  # keep
        ])
        q.processAllAvailable()
        _write_batch(log_dir, "b1.json", [
            {"doc_id": 3, "ts_ms": t0 + 3 * 3_600_000, "embedding": novel},
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(
        f"SELECT doc_id FROM sem_against_{layout}_out ORDER BY doc_id").collect()
    assert [r.doc_id for r in rows] == [2, 4]

    landed = spark.createDataFrame(
        [(1, unit(3)), (2, novel), (4, None)],
        "doc_id long, embedding array<double>")
    flagged = {r.doc_id for r in semantic_dedup_against(
        spark, idx, landed, threshold=0.9, nprobe=4,
        batch_id_col="doc_id").collect()}
    assert flagged == {1}
