"""End-to-end pipeline tests: batch decode pipeline (the CLI path),
legacy parquet re-ingest (S4/T9), sinks (K1 row-group cadence, influx
line rendering, Arrow IPC bytes)."""

from __future__ import annotations

import io

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.plans.pipeline import DecodePipeline, PipelineConfig
from dbc_informed_socketcan_to_parquet_spark.sinks import arrow_ipc_bytes, influx_lines
from dbc_informed_socketcan_to_parquet_spark.sources.parquet_reingest import migrate_legacy

from tests.conftest import le_line


@pytest.fixture(scope="module")
def canlog(tmp_path_factory):
    d = tmp_path_factory.mktemp("canlog")
    lines = []
    t = 1700000000.0
    for i in range(300):
        t += 0.013
        mid = 0x100 + i % 3
        payload = (i % 4096) | ((i % 65536) << 16) | ((i % 2) << 32) | ((i % 16) or 1)
        lines.append(le_line(t, mid, payload))
    (d / "cap.log").write_text("\n".join(lines) + "\n")
    return str(d / "cap.log")


def test_batch_pipeline_cache_and_ffill(spark, tiny_spec, canlog, tmp_path):
    cfg = PipelineConfig(
        input_path=canlog, output_path=str(tmp_path / "out.parquet"),
        cache_ms=50, forward_fill=True,
    )
    out = DecodePipeline(cfg, spec=tiny_spec).run_batch(spark)
    rows = out.collect()
    assert rows[0].Time_ms == 0.0                      # normalized axis
    assert out.columns[0] == "Time_ms"                 # reference column order
    # forward fill ⇒ after the first occurrence, EngSpeed never null again
    seen = False
    for r in rows:
        if r.EngSpeed is not None:
            seen = True
        elif seen:
            pytest.fail("null after forward-fill")
    # parquet written and readable
    assert spark.read.parquet(str(tmp_path / "out.parquet")).count() == len(rows)


def test_pipeline_no_adjust_timestamp(spark, tiny_spec, canlog):
    cfg = PipelineConfig(input_path=canlog, cache_ms=0, adjust_timestamp=False)
    out = DecodePipeline(cfg, spec=tiny_spec).run_batch(spark)
    assert out.first().Time_ms > 1.6e12               # absolute epoch ms


def test_legacy_parquet_reingest(spark, tiny_spec, tmp_path):
    legacy = spark.createDataFrame(
        [(1.5, 400.0), (2.5, 500.0)], "Seconds double, EngSpeed double"
    )
    p = str(tmp_path / "legacy.parquet")
    legacy.write.parquet(p)
    cfg = PipelineConfig(input_path=p, input_format="parquet")
    out = DecodePipeline(cfg, spec=tiny_spec).run_batch(spark)
    rows = out.orderBy("Time_ms").collect()
    assert rows[0].Time_ms == 1500.0                  # s → ms ×1000
    assert rows[0].EngSpeed == pytest.approx(400.0)


def test_legacy_synthetic_timestamps(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    out = migrate_legacy(df).orderBy("Time_ms").collect()
    assert [r.Time_ms for r in out] == [0.0, 11.91, 23.82]


def test_arrow_ipc_bytes_roundtrip(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    buf = arrow_ipc_bytes(df)
    table = pa.ipc.open_stream(io.BytesIO(buf)).read_all()
    assert table.num_rows == 2 and table.column_names == ["id", "s"]


def test_influx_line_rendering(spark):
    df = spark.createDataFrame([(10.0, 1.5, None)], "Time_ms double, a double, b double")
    line = influx_lines(df, "can", tags={"src": "t"}).first().line
    assert line.startswith("can,src=t ")
    assert "a=1.5" in line and "b=" not in line        # nulls skipped
    assert line.endswith(" 10000000")                  # ms → ns


def test_first_wins_changes_bucket_values(spark, tiny_spec, canlog):
    """--first-wins (v2 first-write-wins, reference writeparquet.h:70-75)
    must actually reach the bucket aggregation from the CLI config."""
    last = DecodePipeline(
        PipelineConfig(input_path=canlog, cache_ms=200, agg="last"), spec=tiny_spec
    ).run_batch(spark).orderBy("Time_ms").collect()
    first = DecodePipeline(
        PipelineConfig(input_path=canlog, cache_ms=200, agg="first"), spec=tiny_spec
    ).run_batch(spark).orderBy("Time_ms").collect()
    assert len(last) == len(first)
    assert any(
        a.EngSpeed != b.EngSpeed for a, b in zip(last, first)
    ), "agg=first produced identical buckets — flag not wired"


def test_cache0_path_has_no_global_sort(spark, tiny_spec, canlog):
    """Default row-per-frame path must not total-sort the stream: no
    rangepartitioning exchange, only a partition-local sort."""
    cfg = PipelineConfig(input_path=canlog, cache_ms=0)
    out = DecodePipeline(cfg, spec=tiny_spec).run_batch(spark)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
    # downsampled path keeps the cheap total order (post-agg cardinality)
    agg_out = DecodePipeline(
        PipelineConfig(input_path=canlog, cache_ms=200), spec=tiny_spec
    ).run_batch(spark)
    agg_plan = agg_out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in agg_plan.lower()


def test_stdin_batch_source(spark, tiny_spec, canlog, monkeypatch):
    """S3: --stdin spools the pipe to a landing file and decodes it
    (reference stdinInput.cpp:12-43)."""
    import io as _io
    import sys

    monkeypatch.setattr(sys, "stdin", _io.StringIO(open(canlog).read()))
    cfg = PipelineConfig(input_format="stdin", cache_ms=0)
    out = DecodePipeline(cfg, spec=tiny_spec).run_batch(spark)
    n_file = DecodePipeline(
        PipelineConfig(input_path=canlog, cache_ms=0), spec=tiny_spec
    ).run_batch(spark).count()
    assert out.count() == n_file > 0


def test_partitioned_parquet_write(spark, tmp_path):
    from dbc_informed_socketcan_to_parquet_spark.sinks import write_parquet

    df = spark.createDataFrame(
        [(float(i), i % 3, float(i * 2)) for i in range(30)],
        "Time_ms double, hour int, EngSpeed double",
    )
    out = str(tmp_path / "partitioned")
    write_parquet(df, out, mode="overwrite", partition_by=("hour",))
    import os

    parts = sorted(d for d in os.listdir(out) if d.startswith("hour="))
    assert parts == ["hour=0", "hour=1", "hour=2"]
    back = spark.read.parquet(out)
    assert back.count() == 30
    # partition pruning: a filter on the partition column prunes directories
    pruned = back.filter(F.col("hour") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 10


def test_console_sink_warns_unknown_signal(spark):
    """Unknown --live-decode names warn and continue, mirroring the
    reference's 'signal not found in schema_fields' stderr path
    (/root/reference/src/decoder.cpp:117-119)."""
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.sinks import console_sink

    df = spark.createDataFrame([(0.0, 1.0)], "Time_ms double, EngSpeed double")
    with _pytest.warns(RuntimeWarning, match="signal not found in schema_fields: Bogus"):
        console_sink(df, ["EngSpeed", "Bogus"], num_rows=1)


def test_cli_curate_subcommand(spark, tmp_path, capsys, monkeypatch):
    """`python -m ... curate` drives the curation pipeline over parquet and
    JSONL inputs (corrupt lines quarantined) without touching the legacy
    decode surface."""
    import json

    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    # get_spark() inside the CLI returns the same active session
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running through "
        "the quiet green field while the sun is high in the clear blue sky"
    )
    rows = [(1, base), (2, base), (3, "x"),
            (4, "an entirely different essay on spark shuffle strategies and "
                "terabyte scale query engines with novel distributed ideas")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)

    out = str(tmp_path / "kept.parquet")
    main(["curate", "--in", src, "--out", out,
          "--min-chars", "32", "--min-quality", "0.0", "--jaccard", "0.5"])
    kept = spark.read.parquet(out)
    assert {r.doc_id for r in kept.collect()} == {1, 4}   # dup + short gone
    assert "curated 4 -> 2 documents" in capsys.readouterr().out

    # JSONL path with a corrupt line
    land = tmp_path / "in.jsonl"
    lines = [json.dumps({"doc_id": i, "text": t, "lang": "en", "source": "w",
                         "n_chars": len(t)}) for i, t in rows]
    lines.append("corrupt {line")
    land.write_text("\n".join(lines) + "\n")
    out2 = str(tmp_path / "kept_jsonl")
    main(["curate", "--in", str(land), "--out", out2, "--jsonl",
          "--min-chars", "32", "--min-quality", "0.0", "--jaccard", "0.5"])
    captured = capsys.readouterr().out
    assert "curated 4 -> 2 documents (1 quarantined lines)" in captured
    back = spark.read.json(out2)
    assert {r.doc_id for r in back.collect()} == {1, 4}
    quarantined = spark.read.json(f"{out2}_quarantine")
    assert quarantined.count() == 1


def test_cli_curate_url_front_door(spark, tmp_path, capsys):
    """--url-col + --block-domain + --url-dedup gate the r6 URL stage."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    rows = [
        (1, "an essay about distributed shuffle strategies in modern query engines",
         "https://spam.net/a"),
        (2, "a long meditation on columnar compression and run length encoding wins",
         "https://keep.org/p?b=2&a=1"),
        (3, "gardens tomatoes and the summer heat of a completely different topic",
         "http://www.keep.org/p/?a=1&b=2&utm_source=x"),  # URL dup of 2
    ]
    src = str(tmp_path / "urldocs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string, url string").write.parquet(src)
    out = str(tmp_path / "urlkept.parquet")
    main(["curate", "--in", src, "--out", out,
          "--min-chars", "10", "--min-quality", "0.0", "--jaccard", "0.9",
          "--url-col", "url", "--block-domain", "spam.net", "--url-dedup"])
    kept = spark.read.parquet(out)
    assert {r.doc_id for r in kept.collect()} == {2}
    assert "curated 3 -> 1 documents" in capsys.readouterr().out

    # url flags without --url-col are a parse error, not a silent no-op
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        main(["curate", "--in", src, "--out", out, "--url-dedup"])


def test_export_cli_writes_shards_and_manifest(spark, tmp_path, capsys):
    import json

    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 31 + 5).cast("long").alias("n_tokens"),
    )
    src = str(tmp_path / "curated.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "shards")
    main(["export", "--in", src, "--out", out,
          "--max-tokens", "128", "--shards", "4", "--seed", "7"])
    captured = capsys.readouterr().out
    assert "exported 200 docs" in captured and "across 4 shards (seed 7)" in captured
    manifest = json.loads((tmp_path / "shards" / "_manifest.json").read_text())
    assert manifest["total_docs"] == 200
    assert manifest["total_tokens"] == sum(i % 31 + 5 for i in range(200))
    packs = spark.read.parquet(out)
    assert packs.agg(F.sum("n_docs")).first()[0] == 200


def test_cli_stream_curate_drain(spark, tmp_path, capsys):
    """`stream-curate --available-now` drains the landing dir through the
    full streaming lane and reports the landed count; a second drain with
    the same checkpoint suppresses cross-drain duplicates."""
    import json as _json

    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    land = tmp_path / "sc_land"
    land.mkdir()
    good = ("a clear and well formed english paragraph about everyday "
            "cooking with enough distinct words to pass the quality rules")
    (land / "b0.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": good, "lang": "en",
                     "source": "w", "n_chars": len(good)}) + "\n"
        + "broken {line\n"
    )
    out = str(tmp_path / "sc_out")
    ckpt = str(tmp_path / "sc_ckpt")
    quar = str(tmp_path / "sc_quar")
    args = ["stream-curate", "--in", str(land), "--out", out,
            "--checkpoint", ckpt, "--quarantine", quar,
            "--min-chars", "32", "--min-quality", "0.0",
            "--watermark", "1 hour", "--available-now"]
    main(args)
    assert "stream-curate drained: 1 documents" in capsys.readouterr().out
    assert spark.read.json(quar).count() == 1

    # duplicate arrives later: state from drain 1 suppresses it
    (land / "b1.jsonl").write_text(
        _json.dumps({"doc_id": 2, "text": good, "lang": "en",
                     "source": "w", "n_chars": len(good)}) + "\n")
    main(args)
    assert "stream-curate drained: 1 documents" in capsys.readouterr().out

    # threshold flags without their model paths are parse errors
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        main(["stream-curate", "--in", str(land), "--out", out,
              "--checkpoint", ckpt, "--max-perplexity", "5"])


def test_cli_stream_curate_empty_drain_reports_zero(spark, tmp_path, capsys):
    """Zero-batch drain (r13, ADVICE r12): the summary probes the sink by
    read-error CONDITION (PATH_NOT_FOUND / schema-inference, incl. the
    legacy streaming-sink variant), not driver-local os.path — so an
    empty drain prints 0 instead of crashing, and the probe would work
    unchanged for remote (s3://, hdfs://) output URIs."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    land = tmp_path / "empty_land"
    land.mkdir()
    main(["stream-curate", "--in", str(land),
          "--out", str(tmp_path / "sc_out"),
          "--checkpoint", str(tmp_path / "sc_ckpt"),
          "--min-quality", "0.0", "--watermark", "1 hour",
          "--available-now"])
    assert "stream-curate drained: 0 documents" in capsys.readouterr().out


def test_cli_decode_audit_flag(spark, tmp_path, capsys):
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main
    from tests.conftest import TINY_DBC_TEXT

    dbc = tmp_path / "tiny.dbc"
    dbc.write_text(TINY_DBC_TEXT)
    log = tmp_path / "cap.log"
    log.write_text("\n".join([
        le_line(1.0, 0x100, 0x0123),
        le_line(1.1, 0x101, 0x0456),
        le_line(1.2, 0x7FF, 0x0789),        # unknown id
        "garbage line",                      # malformed
    ]) + "\n")
    main([str(dbc), "--if", str(log), "--file", "--audit"])
    printed = capsys.readouterr().out
    assert "audit 1 parse: 4 -> 3 (-1)" in printed
    assert "audit 2 known_id: 3 -> 2 (-1)" in printed


def test_cli_tune_lsh_and_decon_report(spark, tmp_path):
    """r12 CLI surfaces: tune-lsh sweeps bandings with custom --config,
    decon-report prints the triad summary and lands per-eval counts."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "sweep.parquet")
    main(["tune-lsh", "--in", src, "--config", "4x4", "--config", "8x2",
          "--out", out])
    rows = {(r.num_bands, r.rows_per_band): r
            for r in spark.read.parquet(out).collect()}
    assert set(rows) == {(4, 4), (8, 2)}
    assert all(r.truth_total == rows[(4, 4)].truth_total for r in rows.values())
    assert rows[(8, 2)].recall >= rows[(4, 4)].recall  # more bands -> looser

    # decon-report: eval drawn from the corpus itself -> every mechanism
    # must flag every eval doc at least once (its own copy)
    docs = spark.read.parquet(src)
    ev = str(tmp_path / "eval.parquet")
    docs.filter(F.col("doc_id") % 100 == 0).select("doc_id", "text") \
        .write.parquet(ev)
    rep = str(tmp_path / "decon.parquet")
    main(["decon-report", "--in", src, "--eval", ev, "--out", rep])
    got = spark.read.parquet(rep)
    assert got.filter(F.col("n_exact") == 0).count() == 0
    # span reach needs >= window_tokens tokens — short eval docs have no
    # windows by construction, every long one must hit its own copy
    long_ids = [r.doc_id for r in spark.read.parquet(ev).filter(
        F.size(F.split("text", r"\s+")) >= 20).collect()]
    assert got.filter(F.col("eval_id").isin(long_ids)
                      & (F.col("n_span") == 0)).count() == 0


def test_cli_report_vocab_coverage(spark, tmp_path):
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "rep.parquet")
    main(["report", "--in", src, "--group-col", "lang",
          "--vocab-coverage", "--vocab-top-k", "10", "--out", out])
    cov = spark.read.parquet(out + "_vocab")
    assert set(cov.columns) == {"lang", "n_tokens", "n_covered", "oov_rate",
                                "n_distinct", "n_distinct_covered"}
    assert cov.filter(F.col("oov_rate") > 0).count() > 0  # top-10 of 31 words


def test_cli_report_repetition_and_novelty(spark, tmp_path):
    """report --repetition + --novelty-against (r12): both land parquet
    artifacts; repetition flags the boilerplate doc, novelty scores the
    reference echo at 0."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    src = str(tmp_path / "docs.parquet")
    ref = str(tmp_path / "ref.parquet")
    spark.createDataFrame(
        [(1, "copy me\ncopy me\ncopy me\nnew line"),
         (2, "ref alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id long, text string",
    ).write.parquet(src)
    spark.createDataFrame(
        [(9, "ref alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id long, text string",
    ).write.parquet(ref)
    out = str(tmp_path / "rep.parquet")
    main(["report", "--in", src, "--repetition",
          "--novelty-against", ref, "--novelty-n", "8", "--out", out])

    rept = {r.doc_id: r for r in spark.read.parquet(out + "_repetition").collect()}
    assert rept[1].dup_line_frac == 0.5 and rept[2].dup_line_frac == 0.0
    nov = {r.doc_id: r for r in spark.read.parquet(out + "_novelty").collect()}
    assert nov[2].novelty == 0.0       # verbatim reference echo
    assert nov[1].novelty == 1.0       # nothing shared with the reference


def test_cli_curate_preserve_separators(spark, tmp_path):
    """--preserve-separators (r12): the CLI span scrub keeps surviving
    tokens' original newlines, so paragraph structure survives for
    downstream paragraph-level stages; without the flag the rewrite
    joins with single spaces."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    quote = ("which planet is closest to the sun answer mercury because "
             "it orbits nearest among all the planets")
    doc = (f"paragraph one stays fully intact here\n\n{quote}\n\n"
           "paragraph three also stays fully intact here")
    src = str(tmp_path / "docs.parquet")
    ev = str(tmp_path / "eval.parquet")
    spark.createDataFrame([(1, doc)], "doc_id long, text string").write.parquet(src)
    spark.createDataFrame([(9, quote)], "doc_id long, text string").write.parquet(ev)

    out1 = str(tmp_path / "kept_flat.parquet")
    main(["curate", "--in", src, "--out", out1, "--min-quality", "0.0",
          "--min-chars", "1", "--eval-corpus", ev, "--decon-spans", "8"])
    flat = spark.read.parquet(out1).collect()[0].text
    assert quote not in flat and "\n\n" not in flat  # default: spaces

    out2 = str(tmp_path / "kept_seps.parquet")
    main(["curate", "--in", src, "--out", out2, "--min-quality", "0.0",
          "--min-chars", "1", "--eval-corpus", ev, "--decon-spans", "8",
          "--preserve-separators"])
    seps = spark.read.parquet(out2).collect()[0].text
    assert quote not in seps
    assert "intact here\n\n" in seps  # paragraph boundary survived


def test_cli_report_cluster_sizes(spark, tmp_path):
    """report --cluster-sizes (r12): lands the histogram artifact;
    frac_docs sums to 1 over the corpus."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "rep.parquet")
    main(["report", "--in", src, "--cluster-sizes", "--out", out])
    cs = spark.read.parquet(out + "_clusters").collect()
    assert {c for r in cs for c in r.asDict()} == {
        "cluster_size", "n_clusters", "n_docs", "frac_docs"}
    assert abs(sum(r.frac_docs for r in cs) - 1.0) < 1e-4


def test_cli_curate_gopher_repetition_gate(spark, tmp_path):
    """--gopher-repetition (r12): the boilerplate doc drops, the long
    varied doc survives."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    spam = "\n".join(["buy cheap pills online now today"] * 20)
    prose = ("an essay of genuinely varied content " +
             " ".join(f"idea{i} topic{i} detail{i}" for i in range(20)))
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame([(1, spam), (2, prose)],
                          "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "kept.parquet")
    main(["curate", "--in", src, "--out", out, "--min-quality", "0.0",
          "--min-chars", "1", "--gopher-repetition"])
    assert [r.doc_id for r in spark.read.parquet(out).collect()] == [2]


def test_cli_report_topics(spark, tmp_path):
    """report --topics-embeddings (r12): the topic artifact lands with
    ranked distinctive terms per cluster."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    src = "/root/testdata/sf0.001/documents.parquet"
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    out = str(tmp_path / "rep.parquet")
    main(["report", "--in", src, "--topics-embeddings", emb,
          "--topics-k", "4", "--out", out])
    t = spark.read.parquet(out + "_topics")
    assert set(t.columns) == {"cluster", "n_docs", "term", "rank", "score"}
    assert t.count() > 0
    assert t.filter(t.rank > 5).count() == 0


def test_cli_calibration_report(spark, tmp_path, capsys):
    """`calibration --in scored.parquet` (r13): prints the ECE summary,
    lands the per-bin report, honors --bins/--prob-col/--label-col."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    src = str(tmp_path / "scored.parquet")
    spark.createDataFrame(
        [(i, (i % 10) / 10.0 + 0.05, 1 if i % 3 == 0 else 0)
         for i in range(60)],
        "doc_id long, p double, y int",
    ).write.parquet(src)
    out = str(tmp_path / "cal.parquet")
    main(["calibration", "--in", src, "--prob-col", "p",
          "--label-col", "y", "--bins", "5", "--out", out])
    printed = capsys.readouterr().out
    assert "ECE:" in printed and "60 scored rows" in printed
    rep = {r.bin: r for r in spark.read.parquet(out).collect()}
    assert set(rep) == {0, 1, 2, 3, 4} and sum(r.n for r in rep.values()) == 60


def test_cli_calibration_sweep(spark, tmp_path, capsys):
    """`calibration --sweep` (r13): the threshold sweep prints next to
    the reliability report and lands as a separate _sweep artifact."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    src = str(tmp_path / "scored2.parquet")
    spark.createDataFrame(
        [(i, i / 20.0, 1 if i >= 10 else 0) for i in range(20)],
        "doc_id long, prob double, label int",
    ).write.parquet(src)
    out = str(tmp_path / "cal2.parquet")
    main(["calibration", "--in", src, "--sweep", "0.25,0.5,0.75",
          "--out", out])
    printed = capsys.readouterr().out
    assert "ECE:" in printed and "threshold sweep" in printed
    sw = {r.threshold: r for r in spark.read.parquet(out + "_sweep").collect()}
    assert set(sw) == {0.25, 0.5, 0.75}
    assert sw[0.5].n_kept == 10 and sw[0.5].recall == 1.0
    assert sw[0.5].precision == 1.0  # labels = prob >= 0.5 exactly


def test_cli_select_token_budget(spark, tmp_path, capsys):
    """`select --budget N` (r13): lands the kept prefix and reports the
    selected doc/token totals."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    src = str(tmp_path / "scored3.parquet")
    spark.createDataFrame(
        [(1, 0.9, 100), (2, 0.7, 200), (3, 0.5, 300), (4, 0.1, 400)],
        "doc_id long, score double, n_tokens long",
    ).write.parquet(src)
    out = str(tmp_path / "sel.parquet")
    main(["select", "--in", src, "--budget", "250", "--out", out])
    assert "selected 2 documents / 300 tokens" in capsys.readouterr().out
    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 2]


def test_cli_select_by_group(spark, tmp_path, capsys):
    """`select --by-group lang` (r14): per-group prefixes to per-group
    budgets — explicit --group-budget overrides win, unnamed groups
    fall back to --budget, and --group-budget without --by-group fails
    fast."""
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    src = str(tmp_path / "scored_g.parquet")
    spark.createDataFrame(
        [(1, "en", 0.9, 100), (2, "en", 0.7, 200), (3, "en", 0.5, 300),
         (4, "de", 0.8, 50), (5, "de", 0.6, 50)],
        "doc_id long, lang string, score double, n_tokens long",
    ).write.parquet(src)
    out = str(tmp_path / "sel_g.parquet")
    main(["select", "--in", src, "--by-group", "lang", "--budget", "60",
          "--group-budget", "en=250", "--out", out])
    # en override 250: docs 1+2 (crossing); de falls back to 60: 4+5
    assert "per lang" in capsys.readouterr().out
    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 4, 5]
    with _pytest.raises(SystemExit, match="requires --by-group"):
        main(["select", "--in", src, "--budget", "60",
              "--group-budget", "en=250", "--out", out])
    with _pytest.raises(SystemExit, match="GROUP=TOKENS"):
        main(["select", "--in", src, "--by-group", "lang", "--budget", "60",
              "--group-budget", "en:250", "--out", out])
    # r15: non-positive budgets are rejected like validate_recipe does,
    # instead of silently dropping the group (en=-5 typo ate a language)
    for bad in ("en=-5", "en=0"):
        with _pytest.raises(SystemExit, match="GROUP=TOKENS|positive"):
            main(["select", "--in", src, "--by-group", "lang",
                  "--budget", "60", "--group-budget", bad, "--out", out])


def test_cli_index_embeddings(spark, tmp_path, capsys):
    """`index-embeddings` (r14): builds the persisted cluster-partitioned
    IVF index from the CLI, `--append` grows it with stored centroids
    (no retrain), and the result serves `semantic_dedup_against`."""
    import math

    from dbc_informed_socketcan_to_parquet_spark.__main__ import main
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        semantic_dedup_against,
    )

    def unit(seed, dim=8):
        v = [math.sin(seed * 37.0 + d * 13.0) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    emb = str(tmp_path / "hist_emb.parquet")
    spark.createDataFrame(
        [(100 + s, unit(s)) for s in range(12)],
        "vec_id long, embedding array<double>").write.parquet(emb)
    idx = str(tmp_path / "idx")
    main(["index-embeddings", "--in", emb, "--out", idx, "--clusters", "4"])
    assert "indexed 12 vectors across 4 clusters" in capsys.readouterr().out

    more = str(tmp_path / "more_emb.parquet")
    spark.createDataFrame(
        [(200 + s, unit(50 + s)) for s in range(5)],
        "vec_id long, embedding array<double>").write.parquet(more)
    main(["index-embeddings", "--in", more, "--out", idx, "--append"])
    assert "appended 17 vectors" in capsys.readouterr().out

    # the grown index serves the vs-history gate: a batch doc planted on
    # an APPENDED vector is flagged with that history id
    batch = spark.createDataFrame(
        [(1, unit(52))], "vec_id long, embedding array<double>")
    hits = semantic_dedup_against(spark, idx, batch, threshold=0.99,
                                  nprobe=4, round_to=6).collect()
    assert [(r.vec_id, r.history_id) for r in hits] == [(1, 202)]

    # r15 (advisory): --id-col/--vec-col overrides NORMALIZE to the
    # canonical (vec_id, embedding) layout, so an index built from a
    # renamed source still serves the default-column consumers
    # (curate --against-embeddings, semantic_dedup_against)
    ren = str(tmp_path / "renamed_emb.parquet")
    spark.createDataFrame(
        [(300 + s, unit(s)) for s in range(8)],
        "chunk_id long, vec array<double>").write.parquet(ren)
    idx2 = str(tmp_path / "idx2")
    main(["index-embeddings", "--in", ren, "--out", idx2, "--clusters", "2",
          "--id-col", "chunk_id", "--vec-col", "vec"])
    assert "indexed 8 vectors" in capsys.readouterr().out
    data_cols = set(spark.read.parquet(f"{idx2}/data").columns)
    assert {"vec_id", "embedding"} <= data_cols
    hits2 = semantic_dedup_against(
        spark, idx2, spark.createDataFrame(
            [(9, unit(5))], "vec_id long, embedding array<double>"),
        threshold=0.99, nprobe=2, round_to=6).collect()
    assert [(r.vec_id, r.history_id) for r in hits2] == [(9, 305)]


def test_cli_index_embeddings_health_and_rebuild(spark, tmp_path, capsys):
    """index-embeddings growth health (r15, VERDICT r14 item 4):
    --append prints rebuild advice on the grown index, --stats reports
    per-cluster health without touching vectors, and --rebuild-from
    retrains into a NEW path (publish-by-swap)."""
    import math

    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    def unit(seed, dim=8):
        v = [math.sin(seed * 37.0 + d * 13.0) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    def cone(seed, spread=0.45):
        base, noise = unit(3), unit(seed)
        v = [b + spread * x for b, x in zip(base, noise)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    emb = str(tmp_path / "emb.parquet")
    spark.createDataFrame([(s, unit(s)) for s in range(24)],
                          "vec_id long, embedding array<double>").write.parquet(emb)
    idx = str(tmp_path / "idx")
    main(["index-embeddings", "--in", emb, "--out", idx, "--clusters", "8"])
    capsys.readouterr()

    drift = str(tmp_path / "drift.parquet")
    spark.createDataFrame([(100 + i, cone(50 + i)) for i in range(72)],
                          "vec_id long, embedding array<double>").write.parquet(drift)
    main(["index-embeddings", "--in", drift, "--out", idx, "--append",
          "--imbalance-threshold", "2.0"])
    out = capsys.readouterr().out
    assert "appended 96 vectors" in out
    assert "rebuild advised" in out and "recommended k=" in out

    main(["index-embeddings", "--out", idx, "--stats",
          "--imbalance-threshold", "2.0"])
    out = capsys.readouterr().out
    assert "cluster" in out and "imbalance" in out
    assert "rebuild advised" in out

    idx2 = str(tmp_path / "idx_v2")
    main(["index-embeddings", "--out", idx2, "--rebuild-from", idx,
          "--clusters", "0", "--imbalance-threshold", "2.0"])
    out = capsys.readouterr().out
    assert "rebuilt 96 vectors" in out
    assert spark.read.parquet(f"{idx2}/data").count() == 96

    # --in required on the build path
    import pytest as _pytest
    with _pytest.raises(SystemExit, match="--in is required"):
        main(["index-embeddings", "--out", str(tmp_path / "nope")])


def test_cli_calibration_empty_input(spark, tmp_path, capsys):
    """Zero scored rows (r13 review): a clean 0-row ECE line, not a
    NoneType format crash."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    src = str(tmp_path / "empty_scored.parquet")
    spark.createDataFrame([], "doc_id long, prob double, label int").write.parquet(src)
    main(["calibration", "--in", src])
    assert "ECE: 0.000000 over 0 scored rows" in capsys.readouterr().out
