"""Streaming curate composition (streaming/curate.py): JSONL landing dir
→ quarantine split → normalize → quality gate → watermarked exact dedup
→ parquet landing, with cross-drain state via the checkpoint."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def _write_batch(land, name, rows):
    lines = []
    for r in rows:
        lines.append(r if isinstance(r, str) else json.dumps(r))
    (land / name).write_text("\n".join(lines) + "\n")


def _doc(i, text, **kw):
    d = {"doc_id": i, "text": text, "lang": "en", "source": "w",
         "n_chars": len(text)}
    d.update(kw)
    return d


GOOD_A = ("a clear and well formed english paragraph about everyday cooking "
          "with enough distinct words to pass the structural quality rules")
GOOD_B = ("an entirely different essay describing distributed query engines "
          "and the shuffle strategies they use for terabyte scale joins")
MESSY_B = GOOD_B.replace(" ", "  ") + " \n"   # normalizes to GOOD_B


def test_streaming_curate_end_to_end(spark, tmp_path):
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
    )

    land = tmp_path / "land"
    land.mkdir()
    out = str(tmp_path / "curated")
    quar = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")

    # drain 1: good doc, short doc (gated), corrupt line
    _write_batch(land, "b0.jsonl", [
        _doc(1, GOOD_A),
        _doc(2, "too short"),
        "corrupt {line",
    ])
    for q in run_streaming_curate(
        spark, str(land), out, ckpt, min_chars=32, min_quality=0.0,
        watermark="1 hour", quarantine_dir=quar, available_now=True,
    ):
        q.awaitTermination()

    kept = spark.read.parquet(out)
    assert [r.doc_id for r in kept.collect()] == [1]
    assert spark.read.json(quar).count() == 1

    # drain 2 (fresh queries, same checkpoint): an exact dup of doc 1 is
    # suppressed BY STATE from drain 1; a whitespace-messy variant of a
    # new doc normalizes, passes, and lands once
    _write_batch(land, "b1.jsonl", [
        _doc(3, GOOD_A),          # cross-drain exact dup -> suppressed
        _doc(4, MESSY_B),         # normalizes to GOOD_B -> kept
        _doc(5, GOOD_B),          # dup of the normalized 4 -> suppressed
    ])
    for q in run_streaming_curate(
        spark, str(land), out, ckpt, min_chars=32, min_quality=0.0,
        watermark="1 hour", quarantine_dir=quar, available_now=True,
    ):
        q.awaitTermination()

    rows = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    # doc 3 suppressed by drain-1 state; docs 4 and 5 are content-equal
    # AFTER normalization, so exactly ONE lands (in-batch arrival order
    # across the repartition barrier is not part of the contract)
    assert 1 in rows and len(rows) == 2
    survivor = (set(rows) - {1}).pop()
    assert survivor in (4, 5)
    assert rows[survivor] == GOOD_B   # text landed normalized
    # output schema = input schema + ingest timestamp provenance
    assert set(spark.read.parquet(out).columns) == {
        "doc_id", "text", "lang", "source", "n_chars", "_ingest_ts"
    }


def test_streaming_curate_frame_matches_batch_gate(spark, tmp_path):
    """The streaming gate keeps exactly the docs the batch quality
    expressions keep (same _doc_stat_cols, same thresholds)."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        doc_quality_stats,
        normalize_text,
    )
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        streaming_curate_frame,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    land = tmp_path / "gate_land"
    land.mkdir()
    rows = [
        {"doc_id": r.doc_id, "text": r.text, "lang": r.lang,
         "source": r.source, "n_chars": r.n_chars}
        for r in docs.collect()
    ]
    _write_batch(land, "all.jsonl", rows)

    from dbc_informed_socketcan_to_parquet_spark.sources.jsonl import stream_jsonl_dir
    raw = stream_jsonl_dir(spark, str(land)).filter(
        F.col("_corrupt_record").isNull()
    ).drop("_corrupt_record")
    curated = streaming_curate_frame(
        raw, min_chars=64, min_quality=0.5, watermark="1 hour"
    )
    q = (curated.writeStream.format("memory").queryName("gate_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r.h for r in spark.sql(
        "SELECT md5(text) AS h FROM gate_out").collect()}
    got_n = spark.sql("SELECT count(*) AS n FROM gate_out").collect()[0].n

    normed = normalize_text(docs, "text")
    stats = doc_quality_stats(normed, "doc_id", "text")
    want_quality = {
        r.doc_id for r in stats.filter(
            (F.col("n_chars") >= 64) & (F.col("quality") >= 0.5)
        ).collect()
    }
    # batch replay: the gated set deduped by content — compare CONTENT
    # (which occurrence survives in-batch is not part of the contract)
    gated = normed.join(
        spark.createDataFrame([(i,) for i in want_quality], "doc_id long"),
        "doc_id", "left_semi",
    )
    want = {r.h for r in gated.select(F.md5(F.col("text")).alias("h")).distinct().collect()}
    assert got == want
    assert got_n == len(want)         # exactly one row per content


def test_streaming_curate_with_model_gates(spark, tmp_path):
    """Persisted LM + classifier gates run INSIDE the stream (row-local
    kernels) and drop exactly the docs the batch gates would."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        classifier_write,
        lm_score,
        lm_write,
    )
    from dbc_informed_socketcan_to_parquet_spark.functions.hashing import py_md5_long
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
    )

    body = ("a clear and well formed english paragraph about everyday cooking "
            "with enough distinct words to pass the structural quality rules")
    gib = ("zxqv wkjh qpzm vbnx lkjq rtyu asdf ghjk zxcv bnml qwer tyui "
           "opas dfgh jklz xcvb nmqw erty uiop asdf ghjk lzxc vbnm qqqq")
    ref = spark.createDataFrame([(i, body) for i in range(20)], "doc_id long, text string")
    lm_dir = str(tmp_path / "lm")
    lm_write(ref, lm_dir)
    probe = spark.createDataFrame([(1, body), (2, gib)], "doc_id long, text string")
    perp = {r.doc_id: r.perplexity for r in lm_score(probe, corpus=ref).collect()}
    thr = (perp[1] + perp[2]) / 2

    nf = 1 << 12
    w = spark.createDataFrame(
        [(py_md5_long("cooking", salt="clf|") % nf, 8.0)], "idx long, w double"
    )
    clf_dir = str(tmp_path / "clf")
    classifier_write(w, clf_dir, num_features=nf)

    land = tmp_path / "mg_land"
    land.mkdir()
    other = ("an entirely different but equally clean essay on distributed "
             "query engines and the merits of columnar storage formats")
    _write_batch(land, "b0.jsonl", [
        _doc(1, body),      # passes both gates
        _doc(2, gib),       # LM gate drops
        _doc(3, other),     # clean but no 'cooking' -> classifier drops
    ])
    out = str(tmp_path / "mg_out")
    for q in run_streaming_curate(
        spark, str(land), out, str(tmp_path / "mg_ckpt"),
        min_chars=32, min_quality=0.0, watermark="1 hour", available_now=True,
        lm_path=lm_dir, max_perplexity=thr,
        classifier_path=clf_dir, min_clf_prob=0.51,
    ):
        q.awaitTermination()
    assert [r.doc_id for r in spark.read.parquet(out).collect()] == [1]

    import pytest as _pytest
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        streaming_curate_frame,
    )
    with _pytest.raises(ValueError, match="lm_path"):
        streaming_curate_frame(probe, max_perplexity=100.0)


def test_streaming_curate_with_trained_lang_gate(spark, tmp_path):
    """The r7 trained language gate runs INSIDE the stream (row-local NB
    kernel against the persisted langid model) and keeps exactly the
    allowed languages."""
    from dbc_informed_socketcan_to_parquet_spark.operators.langid import lang_write
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
        streaming_curate_frame,
    )

    en = ("the quick brown fox jumps over the lazy dog near the river and "
          "the engine reads the plan before sending work to every node")
    de = ("der schnelle braune fuchs springt über den faulen hund am fluss und "
          "die maschine liest den plan bevor sie die arbeit verteilt")
    corpus = spark.createDataFrame(
        [(1, en, "en"), (2, de, "de")], "doc_id long, text string, lang string"
    )
    model_dir = str(tmp_path / "langmodel")
    lang_write(corpus, model_dir, num_features=1 << 14)

    land = tmp_path / "lg_land"
    land.mkdir()
    _write_batch(land, "b0.jsonl", [_doc(1, en), _doc(2, de)])
    out = str(tmp_path / "lg_out")
    for q in run_streaming_curate(
        spark, str(land), out, str(tmp_path / "lg_ckpt"),
        min_chars=32, min_quality=0.0, watermark="1 hour", available_now=True,
        lang_model_path=model_dir, allowed_langs=("en",),
    ):
        q.awaitTermination()
    landed = spark.read.parquet(out)
    assert [r.doc_id for r in landed.collect()] == [1]
    # gate columns are internal: the landed schema is the input schema
    assert "lang_pred" not in landed.columns

    import pytest as _pytest
    with _pytest.raises(ValueError, match="lang_model_path"):
        streaming_curate_frame(corpus, allowed_langs=("en",))


def test_streaming_funnel_observed_metrics(spark, tmp_path):
    """observe()-based drop funnel: per-gate CollectMetrics on the ONE
    streaming plan reconstruct the same audit shape as batch
    curate_audit, with zero extra passes."""
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
        streaming_funnel,
    )

    land = tmp_path / "land"
    land.mkdir()
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(land, "b0.jsonl", [
        _doc(1, GOOD_A),
        _doc(2, GOOD_A),          # exact dup -> dedup stage
        _doc(3, "too short"),     # -> quality stage
        _doc(4, GOOD_B),
    ])
    queries = run_streaming_curate(
        spark, str(land), out, ckpt, min_chars=32, min_quality=0.0,
        watermark="1 hour", available_now=True, observe_funnel=True,
    )
    for q in queries:
        q.awaitTermination()
    funnel = streaming_funnel(queries[0])
    assert [f["stage"] for f in funnel] == ["quality", "exact_dedup"]
    by = {f["stage"]: f for f in funnel}
    assert by["quality"]["rows_in"] == 4
    assert by["quality"]["dropped"] == 1
    assert by["exact_dedup"]["dropped"] == 1
    assert by["exact_dedup"]["rows_out"] == 2
    assert spark.read.parquet(out).count() == 2
    # telescoping invariant
    for prev, cur in zip(funnel, funnel[1:]):
        assert cur["rows_in"] == prev["rows_out"]


def test_streaming_funnel_off_by_default(spark, tmp_path):
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
        streaming_funnel,
    )

    land = tmp_path / "land"
    land.mkdir()
    _write_batch(land, "b0.jsonl", [_doc(1, GOOD_A)])
    queries = run_streaming_curate(
        spark, str(land), str(tmp_path / "o"), str(tmp_path / "c"),
        min_quality=0.0, watermark="1 hour", available_now=True,
    )
    for q in queries:
        q.awaitTermination()
    assert streaming_funnel(queries[0]) == []


def test_streaming_max_pii_gate_and_funnel(spark, tmp_path):
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
        streaming_funnel,
    )

    scrape = ("contact a@x.io b@x.io c@x.io or call +15550101234 and "
              "+15550105678 or visit 10.0.0.1 today for the directory")
    land = tmp_path / "land"
    land.mkdir()
    _write_batch(land, "b0.jsonl", [_doc(1, GOOD_A), _doc(2, scrape)])
    queries = run_streaming_curate(
        spark, str(land), str(tmp_path / "o"), str(tmp_path / "c"),
        min_quality=0.0, watermark="1 hour", available_now=True,
        max_pii=3, observe_funnel=True,
    )
    for q in queries:
        q.awaitTermination()
    assert [r.doc_id for r in spark.read.parquet(str(tmp_path / "o")).collect()] == [1]
    funnel = {f["stage"]: f for f in streaming_funnel(queries[0])}
    assert funnel["pii"]["dropped"] == 1
    assert funnel["pii"]["rows_in"] == 2


def test_streaming_compression_gate(spark, tmp_path):
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
        streaming_funnel,
    )

    junk = "buy now " * 40
    land = tmp_path / "land"
    land.mkdir()
    _write_batch(land, "b0.jsonl", [_doc(1, GOOD_A), _doc(2, junk)])
    queries = run_streaming_curate(
        spark, str(land), str(tmp_path / "o"), str(tmp_path / "c"),
        min_quality=0.0, watermark="1 hour", available_now=True,
        min_compression_ratio=0.2, observe_funnel=True,
    )
    for q in queries:
        q.awaitTermination()
    assert [r.doc_id for r in spark.read.parquet(str(tmp_path / "o")).collect()] == [1]
    funnel = {f["stage"]: f for f in streaming_funnel(queries[0])}
    assert funnel["compression"]["dropped"] == 1


def test_funnel_listener_accumulates_without_window_cap(spark, tmp_path):
    """FunnelListener (r10): listener-bus accumulation of the observe()
    funnel metrics — same totals as recentProgress on a short drain, but
    with no ~100-update retention window."""
    import time

    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        _make_funnel_listener,
        run_streaming_curate,
        streaming_funnel,
    )

    land = tmp_path / "land"
    land.mkdir()
    _write_batch(land, "b0.jsonl", [
        _doc(1, GOOD_A), _doc(2, GOOD_A), _doc(3, "too short"), _doc(4, GOOD_B),
    ])
    listener = _make_funnel_listener()
    spark.streams.addListener(listener)
    try:
        queries = run_streaming_curate(
            spark, str(land), str(tmp_path / "out"), str(tmp_path / "ckpt"),
            min_chars=32, min_quality=0.0, watermark="1 hour",
            available_now=True, observe_funnel=True,
        )
        for q in queries:
            q.awaitTermination()
        # the listener bus is async — wait for the totals to settle
        prev = None
        for _ in range(50):
            snap = dict(listener.totals)
            if snap and snap == prev:
                break
            prev = snap
            time.sleep(0.1)
        assert listener.funnel() == streaming_funnel(queries[0])
        by = {f["stage"]: f for f in listener.funnel()}
        assert by["quality"]["rows_in"] == 4
        assert by["exact_dedup"]["rows_out"] == 2
    finally:
        spark.streams.removeListener(listener)


def test_streaming_against_history_gates(spark, tmp_path):
    """Incremental vs-history gates on the stream (r10): arriving docs
    that exact-duplicate the historical corpus drop at against_exact
    (stream-static digest join); docs that NEAR-duplicate history drop
    at against_near (row-local signature + per-band rep verify against
    the persisted store); clean docs land.  Both stages report in the
    funnel."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        minhash_signatures,
        minhash_write,
    )
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
        streaming_funnel,
    )

    hist_a = GOOD_A
    hist_b = GOOD_B
    hist = spark.createDataFrame(
        [(100, hist_a), (101, hist_b)], "doc_id long, text string"
    )
    hist_path = str(tmp_path / "history.parquet")
    hist.write.parquet(hist_path)
    sig_store = str(tmp_path / "sigs")
    minhash_write(
        minhash_signatures(hist, "doc_id", "text", num_perms=16, shingle_n=5),
        sig_store, num_perms=16, shingle_n=5,
    )

    near_b = hist_b.replace("terabyte", "petabyte")   # near-dup of history
    clean = ("completely novel prose about alpine meadows and the slow "
             "migration of pollinators up the valley sides every spring")
    land = tmp_path / "land"
    land.mkdir()
    _write_batch(land, "b0.jsonl", [
        _doc(1, hist_a),        # exact dup of history -> against_exact
        _doc(2, near_b),        # near dup of history  -> against_near
        _doc(3, clean),
    ])
    queries = run_streaming_curate(
        spark, str(land), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        min_chars=32, min_quality=0.0, watermark="1 hour",
        available_now=True, observe_funnel=True,
        against_path=hist_path, against_sigs_path=sig_store,
        against_num_bands=4, against_jaccard=0.5,
    )
    for q in queries:
        q.awaitTermination()
    got = spark.read.parquet(str(tmp_path / "out"))
    assert [r.doc_id for r in got.collect()] == [3]
    funnel = {f["stage"]: f for f in streaming_funnel(queries[0])}
    assert funnel["against_exact"]["dropped"] == 1
    assert funnel["against_near"]["dropped"] == 1
    assert funnel["against_near"]["rows_out"] == 1


def test_streaming_near_against_matches_batch_operator(spark, tmp_path):
    """The streaming rep-verify tier agrees with the batch
    near_dedup_against_corpus on singleton-bucket stores (where
    representative == only member, the semantics coincide)."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        minhash_signatures,
        near_dedup_against_corpus,
    )
    from dbc_informed_socketcan_to_parquet_spark.streaming.dedup import (
        streaming_near_dedup_against,
    )

    hist = spark.createDataFrame(
        [(100, GOOD_A), (101, GOOD_B)], "doc_id long, text string"
    )
    sigs = minhash_signatures(hist, "doc_id", "text", num_perms=16, shingle_n=5)
    batch = spark.createDataFrame(
        [(1, GOOD_A.replace("cooking", "baking")),
         (2, "entirely unrelated text about suspension bridges and cables "
             "spanning the long river gorge in heavy morning fog")],
        "doc_id long, text string",
    )
    expected = near_dedup_against_corpus(
        batch, corpus_sigs=sigs, num_perms=16, shingle_n=5,
        num_bands=4, rows_per_band=4, verify_threshold=0.5,
    )
    got = streaming_near_dedup_against(
        batch, sigs, num_perms=16, shingle_n=5, seed=42,
        num_bands=4, threshold=0.5,
    )
    assert sorted(r.doc_id for r in got.collect()) == \
        sorted(r.doc_id for r in expected.collect())


def test_streaming_against_gates_add_no_state(spark, tmp_path):
    """The vs-history gates must stay STATELESS: with both enabled, the
    drained query's progress reports exactly the one stateful operator
    the watermarked exact dedup owns — the stream-static joins and the
    row-local signature add none."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        minhash_signatures,
        minhash_write,
    )
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
    )

    hist = spark.createDataFrame([(100, GOOD_A)], "doc_id long, text string")
    hist_path = str(tmp_path / "history.parquet")
    hist.write.parquet(hist_path)
    sig_store = str(tmp_path / "sigs")
    minhash_write(
        minhash_signatures(hist, "doc_id", "text", num_perms=16, shingle_n=5),
        sig_store, num_perms=16, shingle_n=5,
    )
    land = tmp_path / "land"
    land.mkdir()
    _write_batch(land, "b0.jsonl", [_doc(1, GOOD_B)])
    queries = run_streaming_curate(
        spark, str(land), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        min_chars=32, min_quality=0.0, watermark="1 hour",
        available_now=True,
        against_path=hist_path, against_sigs_path=sig_store,
    )
    for q in queries:
        q.awaitTermination()
    ops = [p["stateOperators"] for p in queries[0].recentProgress
           if p.get("stateOperators")]
    flat = [o for batch in ops for o in batch]
    assert flat, "expected the dedup state operator to report"
    names = {o.get("operatorName") for o in flat}
    assert names == {"dedupeWithinWatermark"}, names


def test_streaming_gopher_repetition_gate(spark, tmp_path):
    """--gopher-repetition streaming twin (r12): the boilerplate doc
    drops at the funnel_repetition stage, varied prose survives, and
    the streaming pass column agrees with the batch flags battery on
    the same docs."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        gopher_repetition_flags,
        with_passes_repetition,
    )
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
        streaming_funnel,
    )

    spam = "repeat this exact line forever\n" * 25
    queries = None
    land = tmp_path / "land"
    land.mkdir()
    _write_batch(land, "b0.jsonl", [_doc(1, GOOD_A), _doc(2, spam)])
    queries = run_streaming_curate(
        spark, str(land), str(tmp_path / "o"), str(tmp_path / "c"),
        min_quality=0.0, watermark="1 hour", available_now=True,
        gopher_repetition=True, observe_funnel=True,
    )
    for q in queries:
        q.awaitTermination()
    assert [r.doc_id for r in
            spark.read.parquet(str(tmp_path / "o")).collect()] == [1]
    funnel = {f["stage"]: f for f in streaming_funnel(queries[0])}
    assert funnel["repetition"]["dropped"] == 1

    # batch-parity: the appended pass column == the batch conjunction
    docs = spark.createDataFrame([(1, GOOD_A), (2, spam)],
                                 "doc_id long, text string")
    stream_side = {r.doc_id: r._passes_repetition
                   for r in with_passes_repetition(docs).collect()}
    batch_side = {r.doc_id: r.passes_repetition
                  for r in gopher_repetition_flags(docs).collect()}
    assert stream_side == batch_side == {1: True, 2: False}
