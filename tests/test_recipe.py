"""Declarative recipe runner (plans/recipe, r9): one JSON drives
ingest → curate → report → split → export, each stage delegating to the
already-tested operator."""

from __future__ import annotations

import gzip
import json

import pytest

from dbc_informed_socketcan_to_parquet_spark.plans.recipe import (
    run_recipe,
    validate_recipe,
)


def test_validate_recipe_fails_fast():
    with pytest.raises(ValueError, match="requires a 'ingest'"):
        validate_recipe({"out": "x"})
    with pytest.raises(ValueError, match="unknown recipe sections"):
        validate_recipe({"ingest": {"path": "p"}, "out": "x", "extra": {}})
    with pytest.raises(ValueError, match="unknown curate keys"):
        validate_recipe({"ingest": {"path": "p"}, "out": "x",
                         "curate": {"min_qality": 0.5}})
    with pytest.raises(ValueError, match="unknown ingest format"):
        validate_recipe({"ingest": {"path": "p", "format": "csv"}, "out": "x"})
    with pytest.raises(ValueError, match="split requires fractions"):
        validate_recipe({"ingest": {"path": "p"}, "out": "x", "split": {}})
    with pytest.raises(ValueError, match="export requires"):
        validate_recipe({"ingest": {"path": "p"}, "out": "x",
                         "export": {"out": "e"}})


def test_recipe_parquet_full_chain(spark, tmp_path):
    """parquet ingest → curate → leakage-safe split → report → export:
    every stage's artifact lands and the summary reflects it."""
    recipe = {
        "ingest": {"format": "parquet",
                   "path": "/root/testdata/sf0.001/documents.parquet"},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": str(tmp_path / "curated.parquet"),
        "report": {"group_col": "lang", "out": str(tmp_path / "report.parquet")},
        "split": {"fractions": {"train": 0.8, "val": 0.1, "test": 0.1},
                  "leakage_safe": True},
        "export": {"out": str(tmp_path / "shards"), "max_tokens": 4096,
                   "num_shards": 8},
    }
    summary = run_recipe(spark, recipe)
    assert summary["ingest"]["n_docs"] == 500
    assert 0 < summary["curate"]["n_docs"] <= 500
    assert set(summary["split"]) <= {"train", "val", "test"}
    assert sum(summary["split"].values()) == summary["curate"]["n_docs"]
    assert summary["report"]["rows"] >= 2          # langs + total row
    assert summary["export"]["n_shards"] == 8

    curated = spark.read.parquet(recipe["out"])
    assert "split" in curated.columns
    manifest = json.loads((tmp_path / "shards" / "_manifest.json").read_text())
    assert len(manifest["shards"]) == 8


def test_recipe_warc_cli(spark, tmp_path):
    """run-recipe CLI over a WARC landing dir: extraction defaults on,
    spam-free prose lands curated."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    prose = ("a clear well formed paragraph about everyday cooking with "
             "plenty of distinct words to pass the quality gate easily")
    page = (b"<html><body><nav><a href='/'>Home</a></nav><p>" + prose.encode()
            + b"</p></body></html>")
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
            + page)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:1>\r\n"
           b"WARC-Target-URI: https://x.test/p\r\n"
           b"Content-Type: application/http; msgtype=response\r\n"
           + f"Content-Length: {len(http)}\r\n\r\n".encode() + http + b"\r\n\r\n")
    land = tmp_path / "land"
    land.mkdir()
    (land / "seg-0.warc.gz").write_bytes(gzip.compress(rec))
    recipe_path = tmp_path / "recipe.json"
    out = str(tmp_path / "curated.parquet")
    recipe_path.write_text(json.dumps({
        "ingest": {"format": "warc", "path": str(land)},
        "curate": {"min_quality": 0.0, "min_chars": 10},
        "out": out,
    }))
    main(["run-recipe", str(recipe_path)])
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0]["text"] == prose


def test_recipe_audit_funnel(spark, tmp_path):
    """audit: true records the per-stage drop funnel in the summary and
    (dict form) lands it as parquet; the funnel telescopes from the
    ingest count to the curated count."""
    recipe = {
        "ingest": {"format": "parquet",
                   "path": "/root/testdata/sf0.001/documents.parquet"},
        "curate": {"min_quality": 0.0, "min_chars": 1,
                   "jaccard_threshold": 0.5},
        "out": str(tmp_path / "curated.parquet"),
        "audit": {"out": str(tmp_path / "funnel.parquet")},
    }
    summary = run_recipe(spark, recipe)
    funnel = summary["audit"]
    assert [f["stage"] for f in funnel] == ["quality", "exact_dup", "near_dup"]
    assert funnel[0]["rows_in"] == summary["ingest"]["n_docs"] == 500
    for prev, cur in zip(funnel, funnel[1:]):
        assert cur["rows_in"] == prev["rows_out"]
    assert funnel[-1]["rows_out"] == summary["curate"]["n_docs"]
    landed = {r.stage: r.dropped for r in
              spark.read.parquet(str(tmp_path / "funnel.parquet")).collect()}
    assert landed == {f["stage"]: f["dropped"] for f in funnel}


def test_validate_recipe_audit_keys():
    with pytest.raises(ValueError, match="audit must be"):
        validate_recipe({"ingest": {"path": "p"}, "out": "x", "audit": "yes"})
    with pytest.raises(ValueError, match="unknown audit keys"):
        validate_recipe({"ingest": {"path": "p"}, "out": "x",
                         "audit": {"out": "f", "mode": "x"}})


def test_recipe_export_bpe_path(spark, tmp_path):
    """export.bpe_path budgets shards with the persisted real tokenizer
    (the `export --bpe-path` hand-off) instead of whitespace counts."""
    from dbc_informed_socketcan_to_parquet_spark.operators.bpe import (
        bpe_train,
        bpe_write,
    )

    src = str(tmp_path / "docs.parquet")
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliett kilo lima mike november oscar papa").split()
    spark.createDataFrame(
        [(i, f"distinct essay {i} mentioning {words[i % 16]} and "
             f"{words[(i * 7 + 3) % 16]} twice {words[(i * 5 + 1) % 16]} then "
             "a shared tail of vocabulary the tokenizer learns merges from")
         for i in range(20)],
        "doc_id long, text string",
    ).write.parquet(src)
    model = str(tmp_path / "bpe")
    merges, stats = bpe_train(spark.read.parquet(src), num_merges=20)
    bpe_write(spark, merges, model, stats)

    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": str(tmp_path / "curated.parquet"),
        "export": {"out": str(tmp_path / "shards"), "max_tokens": 512,
                   "num_shards": 4, "bpe_path": model},
    }
    summary = run_recipe(spark, recipe)
    assert summary["export"]["n_shards"] == 4
    manifest = json.loads((tmp_path / "shards" / "_manifest.json").read_text())
    assert manifest["total_docs"] == summary["curate"]["n_docs"] > 1
    # BPE counts are sub-word: strictly more tokens than whitespace words
    from pyspark.sql import functions as F
    ws = (spark.read.parquet(recipe["out"])
          .agg(F.sum(F.size(F.split("text", r"\s+")))).collect()[0][0])
    assert manifest["total_tokens"] > ws


def test_validate_streaming_recipe_fails_fast():
    import pytest

    from dbc_informed_socketcan_to_parquet_spark.plans.recipe import validate_recipe

    base = {"mode": "streaming",
            "ingest": {"format": "jsonl", "path": "land/"},
            "out": "o/", "checkpoint": "c/"}
    validate_recipe(base)  # minimal streaming recipe is valid
    with pytest.raises(ValueError, match="requires a 'checkpoint'"):
        validate_recipe({k: v for k, v in base.items() if k != "checkpoint"})
    with pytest.raises(ValueError, match="batch-mode stages"):
        validate_recipe({**base, "export": {"out": "s/", "max_tokens": 512}})
    with pytest.raises(ValueError, match="unknown streaming curate keys"):
        validate_recipe({**base, "curate": {"paragraph_dedup": True}})
    with pytest.raises(ValueError, match="needs lm_path"):
        validate_recipe({**base, "curate": {"max_perplexity": 500.0}})
    with pytest.raises(ValueError, match="must be jsonl or warc"):
        validate_recipe({**base, "ingest": {"format": "parquet", "path": "x"}})
    with pytest.raises(ValueError, match="unknown recipe mode"):
        validate_recipe({**base, "mode": "micro-batch"})


def test_streaming_recipe_drains_with_audit(spark, tmp_path):
    """Streaming recipe e2e (r10): one JSON pins the landing-dir drain —
    quarantine split, quality gate, watermarked exact dedup — and the
    audit section arrives populated from the observe() metrics (listener
    bus), same funnel shape as the batch lane."""
    import json

    from dbc_informed_socketcan_to_parquet_spark.plans.recipe import run_recipe

    land = tmp_path / "land"
    land.mkdir()
    good_a = ("a clear and well formed english paragraph about everyday "
              "cooking with enough distinct words to pass the quality rules")
    good_b = ("an entirely different essay describing distributed query "
              "engines and the shuffle strategies they use at terabyte scale")
    rows = [
        {"doc_id": 1, "text": good_a, "lang": "en", "source": "w", "n_chars": len(good_a)},
        {"doc_id": 2, "text": good_a, "lang": "en", "source": "w", "n_chars": len(good_a)},
        {"doc_id": 3, "text": "too short", "lang": "en", "source": "w", "n_chars": 9},
        {"doc_id": 4, "text": good_b, "lang": "en", "source": "w", "n_chars": len(good_b)},
    ]
    with open(land / "b0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("{not json\n")  # -> quarantine lane

    recipe = {
        "mode": "streaming",
        "ingest": {"format": "jsonl", "path": str(land),
                   "quarantine": str(tmp_path / "quar")},
        "curate": {"min_chars": 32, "min_quality": 0.0, "watermark": "1 hour"},
        "out": str(tmp_path / "curated"),
        "checkpoint": str(tmp_path / "ckpt"),
        "audit": {"out": str(tmp_path / "funnel.parquet")},
    }
    summary = run_recipe(spark, recipe)
    assert summary["mode"] == "streaming"
    assert summary["curate"]["n_docs"] == 2          # dup + short dropped
    by = {f["stage"]: f for f in summary["audit"]}
    assert by["quality"]["rows_in"] == 4
    assert by["quality"]["dropped"] == 1
    assert by["exact_dedup"]["dropped"] == 1
    # funnel parquet artifact matches the summary
    written = {r.stage: r.dropped
               for r in spark.read.parquet(str(tmp_path / "funnel.parquet")).collect()}
    assert written == {f["stage"]: f["dropped"] for f in summary["audit"]}
    # the quarantine lane caught the corrupt line
    import glob

    quar_lines = []
    for p in glob.glob(str(tmp_path / "quar" / "*")):
        if not p.endswith((".crc", "_spark_metadata")):
            try:
                quar_lines += open(p).read().splitlines()
            except (IsADirectoryError, UnicodeDecodeError):
                pass
    assert any("not json" in ln for ln in quar_lines)


def test_recipe_report_fertility(spark, tmp_path):
    from dbc_informed_socketcan_to_parquet_spark.plans.recipe import (
        run_recipe,
        validate_recipe,
    )

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "hello world of many plain tokens here", "en"),
         (2, "ein ganz anderer text mit anderen worten", "de")],
        "doc_id long, text string, lang string",
    ).write.parquet(src)
    fert_out = str(tmp_path / "fert.parquet")
    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": str(tmp_path / "curated.parquet"),
        "report": {"group_col": "lang", "fertility": {"out": fert_out}},
    }
    summary = run_recipe(spark, recipe)
    assert summary["report"]["fertility"]["rows"] == 2
    assert summary["report"]["fertility"]["units"] == "bpe_ish_regex"
    got = {r.lang: r.n_words for r in spark.read.parquet(fert_out).collect()}
    assert got == {"en": 7, "de": 7}

    import pytest

    with pytest.raises(ValueError, match="unknown report.fertility keys"):
        validate_recipe({**recipe, "report": {"fertility": {"model": "x"}}})


def test_recipe_fertility_lang_col_fails_fast(spark, tmp_path):
    """report.fertility on a corpus without the lang column must die at
    recipe start — on the ingest schema — not as an AnalysisException
    after the full curate run (r11, ADVICE)."""
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "plain document with no language column at all")],
        "doc_id long, text string",
    ).write.parquet(src)
    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": str(tmp_path / "curated.parquet"),
        "report": {"fertility": True},
    }
    with pytest.raises(ValueError, match="fertility groups on column 'lang'"):
        run_recipe(spark, recipe)
    # nothing was written — the failure predates all compute
    import os

    assert not os.path.exists(recipe["out"])
    # a custom lang_col that DOES exist passes the gate
    recipe["report"] = {"fertility": {"lang_col": "doc_id"}}
    # doc_id is not a language, but schema-wise the gate is satisfied
    summary = run_recipe(spark, recipe)
    assert summary["report"]["fertility"]["rows"] == 1


def test_recipe_report_overlap_and_spans(spark, tmp_path):
    """recipe report.overlap / report.dup_spans (r11): both land as
    parquet and report their row counts in the summary; unknown subkeys
    fail fast."""
    shared = "s1 s2 s3 s4 s5"
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, f"{shared} a6 a7 a8 a9", "A"), (2, f"{shared} b6 b7 b8 b9", "B")],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    ov_out = str(tmp_path / "ov.parquet")
    sp_out = str(tmp_path / "sp.parquet")
    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": str(tmp_path / "curated.parquet"),
        "report": {"overlap": {"shingle_n": 3, "out": ov_out},
                   "dup_spans": {"window_tokens": 4, "out": sp_out}},
    }
    summary = run_recipe(spark, recipe)
    assert summary["report"]["overlap"]["rows"] == 1
    assert summary["report"]["dup_spans"]["rows"] == 2
    ov = spark.read.parquet(ov_out).collect()
    assert [(r.source_a, r.source_b, r.n_shared) for r in ov] == [("A", "B", 3)]
    assert {(r.doc_id, r.span_start, r.span_end)
            for r in spark.read.parquet(sp_out).collect()} == {(1, 1, 5), (2, 1, 5)}

    with pytest.raises(ValueError, match="unknown report.overlap keys"):
        validate_recipe({**recipe, "report": {"overlap": {"n": 3}}})
    with pytest.raises(ValueError, match="report.dup_spans must be"):
        validate_recipe({**recipe, "report": {"dup_spans": "yes"}})


def test_recipe_decon_span_scrub(spark, tmp_path):
    """recipe curate.decon_span_window + eval_corpus (r11): the quoted
    span is cut from the recipe run's output; pairing is validated."""
    quote = "q1 q2 q3 q4 q5 q6 q7 q8"
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, f"intro words here {quote} outro words here again ok")],
        "doc_id long, text string",
    ).write.parquet(src)
    ev = str(tmp_path / "eval.parquet")
    spark.createDataFrame(
        [(900, f"benchmark {quote} answer")], "doc_id long, text string"
    ).write.parquet(ev)
    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 1,
                   "decon_span_window": 4, "eval_corpus": ev},
        "out": str(tmp_path / "curated.parquet"),
    }
    run_recipe(spark, recipe)
    out = spark.read.parquet(recipe["out"]).collect()[0].text
    assert "q1" not in out and "intro words here" in out

    with pytest.raises(ValueError, match="go together"):
        validate_recipe({**recipe, "curate": {"decon_span_window": 4}})
    with pytest.raises(ValueError, match="go together"):
        validate_recipe({**recipe, "curate": {"eval_corpus": ev}})


def test_validate_recipe_decon_keys():
    """Decontamination recipe surface (r11): decon_cosine without the
    embedding side-inputs — or side-inputs without the gate — must die
    at validation."""
    base = {"ingest": {"path": "p"}, "out": "x"}
    with pytest.raises(ValueError, match="decon_cosine needs"):
        validate_recipe({**base, "curate": {"decon_cosine": 0.9}})
    with pytest.raises(ValueError, match="decon_cosine needs.*eval_embeddings"):
        validate_recipe({**base, "curate": {"decon_cosine": 0.9,
                                            "embeddings": "e.parquet"}})
    with pytest.raises(ValueError, match="only read by the"):
        validate_recipe({**base, "curate": {"embeddings": "e.parquet",
                                            "eval_embeddings": "v.parquet"}})
    # the complete triple validates
    validate_recipe({**base, "curate": {
        "decon_cosine": 0.9, "embeddings": "e.parquet",
        "eval_embeddings": "v.parquet"}})
    # r14: the vs-history embedding gate pairs embeddings with
    # against_embeddings_path instead of decon_cosine
    validate_recipe({**base, "curate": {
        "against_embeddings_path": "idx", "embeddings": "e.parquet"}})
    with pytest.raises(ValueError, match="against_embeddings_path needs"):
        validate_recipe({**base, "curate": {"against_embeddings_path": "idx"}})


def test_recipe_decontamination_e2e(spark, tmp_path):
    """The decontamination gate pinned FROM A RECIPE (r11, VERDICT item
    2): a doc whose embedding near-matches an eval-set embedding (a
    paraphrased benchmark question — no shared shingles) drops at the
    'decontaminate' funnel stage of a recipe run; the clean doc
    survives to the output."""
    a = ("the quick brown fox jumps over the lazy dog and keeps running "
         "through the quiet green field while the sun is high in the sky")
    b = ("an entirely different essay describing distributed query engines "
         "and the shuffle strategies they use for terabyte scale joins")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    ).write.parquet(src)
    emb = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "doc_id long, embedding array<double>",
    ).write.parquet(emb)
    eval_emb = str(tmp_path / "eval_emb.parquet")
    spark.createDataFrame(
        [(900, [0.99, 0.1, 0.0, 0.0])], "doc_id long, embedding array<double>"
    ).write.parquet(eval_emb)

    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 32,
                   "decon_cosine": 0.9, "embeddings": emb,
                   "eval_embeddings": eval_emb},
        "out": str(tmp_path / "curated.parquet"),
        "audit": True,
    }
    summary = run_recipe(spark, recipe)
    funnel = {f["stage"]: f["dropped"] for f in summary["audit"]}
    assert funnel["decontaminate"] == 1
    kept = spark.read.parquet(recipe["out"])
    assert [r.doc_id for r in kept.collect()] == [2]


def test_recipe_chunk_stage(spark, tmp_path):
    """recipe chunk stage (r11): curated docs land as fixed-token chunk
    rows in a separate artifact; validation requires out + chunk_tokens
    and rejects unknown keys."""
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))],
        "doc_id long, text string",
    ).write.parquet(src)
    ch_out = str(tmp_path / "chunks.parquet")
    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": str(tmp_path / "curated.parquet"),
        "chunk": {"out": ch_out, "chunk_tokens": 4, "overlap_tokens": 1},
    }
    summary = run_recipe(spark, recipe)
    assert summary["chunk"]["n_chunks"] == 3
    rows = sorted((r.chunk_idx, r.text) for r in spark.read.parquet(ch_out).collect())
    assert rows == [(0, "t0 t1 t2 t3"), (1, "t3 t4 t5 t6"), (2, "t6 t7 t8 t9")]

    with pytest.raises(ValueError, match="chunk requires"):
        validate_recipe({**recipe, "chunk": {"chunk_tokens": 4}})
    with pytest.raises(ValueError, match="unknown chunk keys"):
        validate_recipe({**recipe, "chunk": {"out": ch_out, "chunk_tokens": 4,
                                             "stride": 2}})


def test_recipe_report_vocab_coverage(spark, tmp_path):
    """recipe report.vocab_coverage (r12): lands the per-language OOV
    table; unknown keys fail validation."""
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.plans.recipe import (
        run_recipe,
        validate_recipe,
    )

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "en", "a a b c " * 20), (2, "de", "c c b x " * 20)],
        "doc_id long, lang string, text string",
    ).write.parquet(src)
    out = str(tmp_path / "kept.parquet")
    vc_out = str(tmp_path / "vocab.parquet")
    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": out,
        "report": {"vocab_coverage": {"top_k": 2, "out": vc_out}},
    }
    summary = run_recipe(spark, recipe)
    assert summary["report"]["vocab_coverage"]["rows"] == 2
    cov = {r.lang: r for r in spark.read.parquet(vc_out).collect()}
    assert set(cov) == {"en", "de"}

    with _pytest.raises(ValueError, match="vocab_coverage"):
        validate_recipe({**recipe,
                         "report": {"vocab_coverage": {"bogus": 1}}})


def test_recipe_report_repetition_and_novelty(spark, tmp_path):
    """recipe report.repetition / report.novelty (r12): both sections
    land artifacts over the CURATED docs; novelty without `against`
    fails validation."""
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.plans.recipe import (
        run_recipe,
        validate_recipe,
    )

    src = str(tmp_path / "docs.parquet")
    ref = str(tmp_path / "ref.parquet")
    spark.createDataFrame(
        [(1, "en", "same line\nsame line\n" + "the quick brown fox jumps over a lazy dog and then rests " * 4),
         (2, "en", "fresh words only here " * 10)],
        "doc_id long, lang string, text string",
    ).write.parquet(src)
    spark.createDataFrame(
        [(9, "fresh words only here " * 10)], "doc_id long, text string",
    ).write.parquet(ref)
    out = str(tmp_path / "kept.parquet")
    rp_out = str(tmp_path / "repetition.parquet")
    nv_out = str(tmp_path / "novelty.parquet")
    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": out,
        "report": {"repetition": {"out": rp_out},
                   "novelty": {"against": ref, "n": 4, "out": nv_out},
                   "cluster_sizes": True},
    }
    summary = run_recipe(spark, recipe)
    assert summary["report"]["repetition"]["rows"] == 2
    assert summary["report"]["novelty"]["rows"] == 2
    assert summary["report"]["cluster_sizes"]["rows"] >= 1
    nov = {r.doc_id: r.novelty for r in spark.read.parquet(nv_out).collect()}
    assert nov[2] == 0.0 and nov[1] > 0.9

    with _pytest.raises(ValueError, match="novelty"):
        validate_recipe({**recipe, "report": {"novelty": True}})
    with _pytest.raises(ValueError, match="repetition"):
        validate_recipe({**recipe, "report": {"repetition": {"bogus": 1}}})


def test_recipe_report_topics(spark, tmp_path):
    """recipe report.topics (r12): lands the topic artifact over the
    curated docs; topics without `embeddings` fails validation."""
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.plans.recipe import (
        run_recipe,
        validate_recipe,
    )

    src = str(tmp_path / "docs.parquet")
    emb = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        [(i, "cooking recipes kitchen simmer braise pots pans " * 8)
         if i % 2 == 0 else
         (i, "orbital telescope asteroid spacecraft nebula stars " * 8)
         for i in range(12)],
        "doc_id long, text string",
    ).write.parquet(src)
    spark.createDataFrame(
        [(i, [1.0 + 0.01 * i] * 4 if i % 2 == 0 else [-1.0 - 0.01 * i] * 4)
         for i in range(12)],
        "vec_id long, embedding array<double>",
    ).write.parquet(emb)
    out = str(tmp_path / "kept.parquet")
    tp_out = str(tmp_path / "topics.parquet")
    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": out,
        "report": {"topics": {"embeddings": emb, "k": 2, "top_terms": 3,
                              "out": tp_out}},
    }
    summary = run_recipe(spark, recipe)
    assert summary["report"]["topics"]["rows"] >= 2
    t = spark.read.parquet(tp_out)
    assert {r.cluster for r in t.collect()} and t.filter(t.rank > 3).count() == 0

    with _pytest.raises(ValueError, match="topics"):
        validate_recipe({**recipe, "report": {"topics": True}})


def test_recipe_report_contamination_indexed(spark, tmp_path):
    """recipe report.contamination (r16, VERDICT r15 item 8): the
    persisted-index sweep is the recipe's production posture — the
    corpus index is probed, never re-clustered, and the hits match
    semantic_contamination_indexed run directly; validation requires
    index + eval_embeddings."""
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_write,
        semantic_contamination_indexed,
    )
    from dbc_informed_socketcan_to_parquet_spark.plans.recipe import (
        run_recipe,
        validate_recipe,
    )

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"document body number {i} with enough text to keep " * 2)
         for i in range(8)],
        "doc_id long, text string",
    ).write.parquet(src)
    # corpus embeddings: two well-separated blobs; eval probes one blob
    corpus_emb = spark.createDataFrame(
        [(i, [1.0 + 0.001 * i] * 4 if i % 2 == 0 else [-1.0 - 0.001 * i] * 4)
         for i in range(16)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "corpus_idx")
    ivf_index_write(corpus_emb, idx, dim=4, num_clusters=2, n_iters=2)
    ev = str(tmp_path / "eval_emb.parquet")
    spark.createDataFrame(
        [(100, [1.0, 1.0, 1.0, 1.0])],
        "vec_id long, embedding array<double>",
    ).write.parquet(ev)

    out = str(tmp_path / "kept.parquet")
    ct_out = str(tmp_path / "contamination.parquet")
    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": out,
        "report": {"contamination": {
            "index": idx, "eval_embeddings": ev,
            "threshold": 0.9, "nprobe": 2, "out": ct_out,
        }},
    }
    summary = run_recipe(spark, recipe)
    got = {(r.vec_id, r.eval_id) for r in spark.read.parquet(ct_out).collect()}
    direct = semantic_contamination_indexed(
        spark, idx, spark.read.parquet(ev), threshold=0.9, nprobe=2)
    want = {(r.vec_id, r.eval_id) for r in direct.collect()}
    assert got == want and got  # the +1 blob is flagged, per the operator
    assert summary["report"]["contamination"]["rows"] == len(want)

    with _pytest.raises(ValueError, match="contamination"):
        validate_recipe({**recipe, "report": {"contamination": {"index": idx}}})
    with _pytest.raises(ValueError, match="unknown report.contamination"):
        validate_recipe({**recipe, "report": {"contamination": {
            "index": idx, "eval_embeddings": ev, "mode": "ivf"}}})


def test_recipe_select_stage(spark, tmp_path):
    """recipe select stage (r13): the curated corpus narrows to the
    token budget (score column respected, whitespace token count
    derived when absent) and the chunk/export stages downstream consume
    the SELECTED set; validation requires out + positive budget and
    rejects unknown keys."""
    src = str(tmp_path / "docs.parquet")
    texts = {  # 30 varied tokens each (repetitive docs fail the quality gate)
        1: " ".join(f"alpha{i} beta{i}" for i in range(15)),   # score 0.9
        2: " ".join(f"gamma{i} delta{i}" for i in range(15)),  # score 0.5
        3: " ".join(f"omega{i} sigma{i}" for i in range(15)),  # score 0.1
    }
    spark.createDataFrame(
        [(k, v, {1: 0.9, 2: 0.5, 3: 0.1}[k]) for k, v in texts.items()],
        "doc_id long, text string, score double",
    ).write.parquet(src)
    sel_out = str(tmp_path / "selected.parquet")
    ch_out = str(tmp_path / "chunks.parquet")
    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": str(tmp_path / "curated.parquet"),
        "select": {"out": sel_out, "budget": 40},
        "chunk": {"out": ch_out, "chunk_tokens": 16},
    }
    summary = run_recipe(spark, recipe)
    # budget 40 crosses into doc 2: docs 1 and 2 kept (60 tokens), 3 dropped
    assert summary["select"]["n_docs"] == 2
    assert summary["select"]["n_tokens"] == 60
    kept = sorted(r.doc_id for r in spark.read.parquet(sel_out).collect())
    assert kept == [1, 2]
    # chunking ran over the SELECTED set only
    chunk_ids = {r.doc_id for r in spark.read.parquet(ch_out).collect()}
    assert chunk_ids == {1, 2}
    # the full curated table still landed at out
    assert spark.read.parquet(recipe["out"]).count() == 3

    with pytest.raises(ValueError, match="select requires"):
        validate_recipe({**recipe, "select": {"budget": 40}})
    with pytest.raises(ValueError, match="unknown select keys"):
        validate_recipe({**recipe, "select": {"out": sel_out, "budget": 40,
                                              "bogus": 1}})
    with pytest.raises(ValueError, match="positive token count"):
        validate_recipe({**recipe, "select": {"out": sel_out, "budget": 0}})


def test_recipe_select_by_group(spark, tmp_path):
    """recipe per-group select (r14): group_budgets selects each group
    to its own budget (groups absent from the map drop); validation
    requires group_col with group_budgets, rejects budget+group_budgets
    together and non-positive per-group values."""
    src = str(tmp_path / "docs_g.parquet")
    mk = lambda tag: " ".join(f"{tag}{i} w{i}" for i in range(15))  # noqa: E731
    spark.createDataFrame(
        [(1, "en", mk("a"), 0.9), (2, "en", mk("b"), 0.5),
         (3, "de", mk("c"), 0.8), (4, "de", mk("d"), 0.2),
         (5, "fr", mk("e"), 0.9)],
        "doc_id long, lang string, text string, score double",
    ).write.parquet(src)
    sel_out = str(tmp_path / "selected_g.parquet")
    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": str(tmp_path / "curated_g.parquet"),
        "select": {"out": sel_out, "group_col": "lang",
                   "group_budgets": {"en": 40, "de": 10}},
    }
    summary = run_recipe(spark, recipe)
    # en 40 crosses into doc 2 (docs are 30 tokens each); de 10 keeps
    # only doc 3; fr absent from the map -> dropped
    kept = sorted(r.doc_id for r in spark.read.parquet(sel_out).collect())
    assert kept == [1, 2, 3]
    assert summary["select"]["n_docs"] == 3
    assert summary["select"]["group_col"] == "lang"
    assert summary["select"]["budget"] == {"en": 40, "de": 10}

    with pytest.raises(ValueError, match="requires group_col"):
        validate_recipe({**recipe, "select": {
            "out": sel_out, "group_budgets": {"en": 40}}})
    with pytest.raises(ValueError, match="mutually\\s+exclusive"):
        validate_recipe({**recipe, "select": {
            "out": sel_out, "group_col": "lang", "budget": 40,
            "group_budgets": {"en": 40}}})
    with pytest.raises(ValueError, match="positive token count"):
        validate_recipe({**recipe, "select": {
            "out": sel_out, "group_col": "lang",
            "group_budgets": {"en": 0}}})
    # flat budget + group_col (no map) is valid: per-group flat budgets
    validate_recipe({**recipe, "select": {
        "out": sel_out, "group_col": "lang", "budget": 40}})


def test_recipe_staged_resume_kill_after_stage_k(spark, tmp_path, monkeypatch):
    """Recipe-level staged resume (r14, VERDICT r13 item 5): a recipe
    with resume_dir that DIES in export re-runs only export — curate,
    select, and chunk load their committed artifacts (pinned by poisoning
    the curate operator on the resumed run) — and the final export
    manifest is byte-identical (per-shard fingerprints) to an
    uninterrupted run of the same recipe; a resume_dir written by a
    different recipe is refused."""
    import json as _json
    import os

    import dbc_informed_socketcan_to_parquet_spark.storage as storage_mod

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, " ".join(f"tok{i}w{j} u{j}" for j in range(15)), 0.9 - i * 0.1)
         for i in range(5)],
        "doc_id long, text string, score double",
    ).write.parquet(src)

    def mk_recipe(root):
        return {
            "ingest": {"format": "parquet", "path": src},
            "curate": {"min_quality": 0.0, "min_chars": 1},
            "out": f"{root}/curated.parquet",
            "select": {"out": f"{root}/selected.parquet", "budget": 100},
            "chunk": {"out": f"{root}/chunks.parquet", "chunk_tokens": 16},
            "export": {"out": f"{root}/shards", "max_tokens": 64,
                       "num_shards": 4},
            "resume_dir": f"{root}/resume",
        }

    # uninterrupted reference run
    ref = mk_recipe(str(tmp_path / "ref"))
    run_recipe(spark, ref)
    ref_manifest = _json.load(open(f"{tmp_path}/ref/shards/_manifest.json"))

    # interrupted run: export dies after chunk committed
    real_export = storage_mod.export_training_shards

    def boom(*a, **k):
        raise RuntimeError("simulated executor loss in export")

    monkeypatch.setattr(storage_mod, "export_training_shards", boom)
    broken = mk_recipe(str(tmp_path / "run"))
    with pytest.raises(RuntimeError, match="simulated executor loss"):
        run_recipe(spark, broken)
    monkeypatch.setattr(storage_mod, "export_training_shards", real_export)
    # markers exist for the committed stages, not for export
    rdir = f"{tmp_path}/run/resume"
    assert os.path.exists(f"{rdir}/curate.done.json")
    assert os.path.exists(f"{rdir}/select.done.json")
    assert os.path.exists(f"{rdir}/chunk.done.json")
    assert not os.path.exists(f"{rdir}/export.done.json")

    # resumed run must NOT recompute curate/select/chunk: poison them
    # (importlib: the operators package re-exports `curate` the FUNCTION,
    # shadowing the submodule attribute)
    import importlib

    curate_mod = importlib.import_module(
        "dbc_informed_socketcan_to_parquet_spark.operators.curate")
    sampling_mod = importlib.import_module(
        "dbc_informed_socketcan_to_parquet_spark.operators.sampling")

    def poisoned(*a, **k):
        raise AssertionError("completed stage recomputed on resume")

    monkeypatch.setattr(curate_mod, "curate", poisoned)
    monkeypatch.setattr(sampling_mod, "select_to_token_budget", poisoned)
    monkeypatch.setattr(sampling_mod, "chunk_documents", poisoned)
    summary = run_recipe(spark, broken)
    assert summary["export"]["n_shards"] == 4
    assert os.path.exists(f"{rdir}/export.done.json")

    got_manifest = _json.load(open(f"{tmp_path}/run/shards/_manifest.json"))
    # content identity: the manifests (per-shard fingerprints included)
    # are byte-identical between the resumed and uninterrupted runs
    assert got_manifest["shards"] == ref_manifest["shards"]

    # a third run with everything committed is a pure no-op fast path
    summary2 = run_recipe(spark, broken)
    assert summary2["select"] == summary["select"]
    assert summary2["export"] == summary["export"]

    # mixed-config refusal: same resume_dir, different recipe
    other = mk_recipe(str(tmp_path / "run"))
    other["select"]["budget"] = 999
    with pytest.raises(ValueError, match="different curate configuration"):
        run_recipe(spark, other)


def test_recipe_resume_checks_audit_artifact(spark, tmp_path):
    """r15 (advisory): the curate resume marker covers the AUDIT parquet
    too — deleting the audit output (but not the curated table) forces
    the curate stage to re-run and re-land the audit, instead of
    resuming cleanly while the summary claims an artifact that is gone."""
    import os
    import shutil

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, " ".join(f"tok{i}w{j} u{j}" for j in range(15)))
         for i in range(4)],
        "doc_id long, text string",
    ).write.parquet(src)
    audit_out = str(tmp_path / "audit.parquet")
    recipe = {
        "ingest": {"format": "parquet", "path": src},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": str(tmp_path / "curated.parquet"),
        "audit": {"out": audit_out},
        "resume_dir": str(tmp_path / "resume"),
    }
    s1 = run_recipe(spark, recipe)
    assert os.path.exists(f"{tmp_path}/resume/curate.done.json")
    assert spark.read.parquet(audit_out).count() >= 1

    shutil.rmtree(audit_out)
    s2 = run_recipe(spark, recipe)  # must re-run curate, re-land audit
    assert os.path.isdir(audit_out)
    assert s2["audit"] == s1["audit"]
    assert s2["curate"]["n_docs"] == s1["curate"]["n_docs"]


def test_streaming_recipe_daily_incremental_history(spark, tmp_path):
    """STREAMING daily-incremental history (r15): drain windows share
    the persistent text-matrix stores with the batch lane — day 1's
    drain creates them from its survivors; day 2 (a NEW deployment
    window: fresh checkpoint, its own out) arms against_exact from the
    digest store and against_near from the signature store, drops the
    planted dups of day 1, and appends only its novel survivor.  The
    stores, not the checkpoint state, carry the cross-window memory."""
    import json

    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.plans.recipe import (
        run_recipe,
        validate_recipe,
    )

    stores = tmp_path / "stores"
    good_a = ("a clear and well formed english paragraph about everyday "
              "cooking with enough distinct words to pass the quality rules")
    good_b = ("an entirely different essay describing distributed query "
              "engines and the shuffle strategies they use at terabyte scale")

    def mk_recipe(day, land):
        return {
            "mode": "streaming",
            "ingest": {"format": "jsonl", "path": str(land)},
            "curate": {"min_chars": 32, "min_quality": 0.0,
                       "watermark": "1 hour"},
            "out": str(tmp_path / f"out{day}"),
            "checkpoint": str(tmp_path / f"ckpt{day}"),
            "history": {"digests": str(stores / "digests.parquet"),
                        "sigs": str(stores / "sig_store"),
                        "num_perms": 32, "shingle_n": 5},
            "audit": True,
        }

    def land_rows(day, rows):
        d = tmp_path / f"land{day}"
        d.mkdir()
        with open(d / "b0.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return d

    # embeddings_index is batch-only in streaming mode
    bad = mk_recipe(0, tmp_path)
    bad["history"]["embeddings_index"] = str(stores / "idx")
    with _pytest.raises(ValueError, match="batch-mode only"):
        validate_recipe(bad)
    # manual against keys conflict with the managed stores
    bad2 = mk_recipe(0, tmp_path)
    bad2["curate"]["against_sigs_path"] = str(stores / "sig_store")
    with _pytest.raises(ValueError, match="history manages"):
        validate_recipe(bad2)

    land1 = land_rows(1, [
        {"doc_id": 1, "text": good_a, "lang": "en", "source": "w",
         "n_chars": len(good_a)},
        {"doc_id": 2, "text": good_b, "lang": "en", "source": "w",
         "n_chars": len(good_b)},
    ])
    s1 = run_recipe(spark, mk_recipe(1, land1))
    assert s1["curate"]["n_docs"] == 2
    assert s1["history"] == {"digests_appended": 2, "sigs_appended": 2}
    assert not any(f["stage"].startswith("against") for f in s1["audit"])

    near_b = good_b.replace("shuffle", "exchange")
    land2 = land_rows(2, [
        {"doc_id": 11, "text": good_a, "lang": "en", "source": "w",
         "n_chars": len(good_a)},          # exact dup of day-1 doc 1
        {"doc_id": 12, "text": near_b, "lang": "en", "source": "w",
         "n_chars": len(near_b)},          # near dup of day-1 doc 2
        {"doc_id": 13, "text": "a wholly novel composition regarding "
                               "alpine botany and seasonal pollinator "
                               "behavior in high meadows",
         "lang": "en", "source": "w", "n_chars": 100},
    ])
    s2 = run_recipe(spark, mk_recipe(2, land2))
    kept2 = spark.read.parquet(str(tmp_path / "out2"))
    assert [r.doc_id for r in kept2.collect()] == [13]
    by = {f["stage"]: f for f in s2["audit"]}
    assert by["against_exact"]["dropped"] == 1
    assert by["against_near"]["dropped"] == 1
    assert s2["history"] == {"digests_appended": 1, "sigs_appended": 1}

    # cross-lane interop: the batch vs-history gates read the SAME
    # stores the streaming drains maintain
    batch_in = str(tmp_path / "day3.parquet")
    spark.createDataFrame(
        [(21, good_a), (22, "completely fresh batch prose about tidal "
                            "estuary sediment transport dynamics")],
        "doc_id long, text string").write.parquet(batch_in)
    s3 = run_recipe(spark, {
        "ingest": {"format": "parquet", "path": batch_in},
        "curate": {"min_quality": 0.0, "min_chars": 1},
        "out": str(tmp_path / "day3_kept.parquet"),
        "history": {"digests": str(stores / "digests.parquet"),
                    "sigs": str(stores / "sig_store")},
        "audit": True,
    })
    assert s3["curate"]["n_docs"] == 1  # 21 duplicates streamed history
    assert s3["history"]["digests_appended"] == 1


def test_recipe_daily_incremental_history(spark, tmp_path):
    """Daily-incremental mode (r15, VERDICT r14 item 5): day 1 builds
    the vs-history stores from its survivors; day 2's run arms all
    three gates from them and drops planted dups of day 1 — an exact
    copy, a MinHash near-dup, and an embedding-only rewording — while
    appending its own survivors; a re-run of day 2 drops everything
    (its content is now history) and appends nothing (idempotent)."""
    import json as _json
    import os

    def doc(i, seed):
        # seed-unique vocabulary: cross-doc shingle overlap ~0, so only
        # the PLANTED near-dup pair collides in MinHash space
        return (i, " ".join(f"{seed}tok{j}q {seed}aux{j}z" for j in range(40)))

    def unit(seed, dim=8):
        import math
        v = [math.sin(seed * 37.0 + d * 13.0) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    stores = tmp_path / "stores"

    def mk_recipe(day, in_path, emb_path):
        return {
            "ingest": {"format": "parquet", "path": in_path},
            "curate": {"min_quality": 0.0, "min_chars": 1,
                       "embeddings": emb_path},
            "out": str(tmp_path / f"day{day}_kept.parquet"),
            "history": {"digests": str(stores / "digests.parquet"),
                        "sigs": str(stores / "sig_store"),
                        "embeddings_index": str(stores / "ivf_idx"),
                        "num_clusters": 4},
            "audit": True,
        }

    # ---- day 1: 4 novel docs, no stores yet -> gate-free, stores built
    d1 = str(tmp_path / "day1.parquet")
    d1_rows = [doc(1, "a"), doc(2, "b"), doc(3, "c"), doc(4, "d")]
    spark.createDataFrame(d1_rows, "doc_id long, text string").write.parquet(d1)
    e1 = str(tmp_path / "day1_emb.parquet")
    spark.createDataFrame([(i, unit(i)) for i in (1, 2, 3, 4)],
                          "doc_id long, embedding array<double>").write.parquet(e1)
    s1 = run_recipe(spark, mk_recipe(1, d1, e1))
    assert s1["curate"]["n_docs"] == 4
    assert s1["history"]["digests_appended"] == 4
    assert s1["history"]["sigs_appended"] == 4
    assert s1["history"]["embeddings_appended"] == 4
    assert not any(st["stage"].startswith("against")
                   for st in s1["audit"])  # day 1 gates unarmed

    # ---- day 2: exact dup of doc 1, near-dup of doc 2 (one token
    # changed), rewording of doc 3 (same embedding, unrelated text),
    # and one genuinely novel doc
    near = d1_rows[1][1].replace("btok5q", "CHANGED")
    assert near != d1_rows[1][1]
    d2 = str(tmp_path / "day2.parquet")
    d2_rows = [(11, d1_rows[0][1]),                     # exact dup of 1
               (12, near),                              # near-dup of 2
               (13, " ".join(f"q{j} z{j}" for j in range(40))),  # rewording
               (14, doc(14, "novel")[1])]
    spark.createDataFrame(d2_rows, "doc_id long, text string").write.parquet(d2)
    e2 = str(tmp_path / "day2_emb.parquet")
    # 95/99/97 all have cosine < 0.9 against every day-1 embedding (the
    # sin-derived units correlate at nearby seeds — picked by checking);
    # 13 carries doc 3's embedding exactly, the semantic plant
    spark.createDataFrame(
        [(11, unit(95)), (12, unit(99)), (13, unit(3)), (14, unit(97))],
        "doc_id long, embedding array<double>").write.parquet(e2)
    s2 = run_recipe(spark, mk_recipe(2, d2, e2))
    kept2 = spark.read.parquet(str(tmp_path / "day2_kept.parquet"))
    assert sorted(r.doc_id for r in kept2.collect()) == [14]
    stages = {st["stage"]: st for st in s2["audit"]}
    assert stages["against_exact"]["dropped"] == 1     # doc 11
    assert stages["against_near"]["dropped"] == 1      # doc 12
    assert stages["against_semantic"]["dropped"] == 1  # doc 13
    assert s2["history"]["digests_appended"] == 1
    assert s2["history"]["sigs_appended"] == 1
    assert s2["history"]["embeddings_appended"] == 1
    assert s2["history"]["index_advice"]["n_vecs"] == 5

    # ---- day 2 re-run: everything now duplicates history; appends 0
    s3 = run_recipe(spark, mk_recipe(2, d2, e2))
    assert s3["curate"]["n_docs"] == 0
    assert s3["history"]["digests_appended"] == 0
    assert s3["history"]["sigs_appended"] == 0
    assert s3["history"]["embeddings_appended"] == 0

    # store shapes on disk (the _json import keeps parity with siblings)
    assert os.path.exists(str(stores / "sig_store" / "meta" / "_SUCCESS"))
    assert _json is not None


def test_recipe_daily_incremental_pq_history(spark, tmp_path):
    """history.pq (r15): the daily-incremental embedding store persists
    CODES instead of floats — day 1 builds an ivfpq_index_write layout
    (binary codes on disk, no embedding column, reconstruction
    calibration in the summary), day 2's gate drops a planted semantic
    dup THROUGH the codes-only index and appends its survivor as codes
    via the layout-detecting generic append.  At 4 vectors / 4 codewords
    per subspace reconstruction is exact, so the default 0.9 threshold
    is safely below the self-cosine floor."""
    import math

    import pytest

    def unit(seed, dim=16):
        v = [math.sin(seed * 12.9898 + d * 78.233) * 43758.5453 % 2.0 - 1.0
             for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    def doc(i, seed):
        return (i, " ".join(f"{seed}tok{j}q {seed}aux{j}z" for j in range(40)))

    stores = tmp_path / "stores"

    def mk_recipe(day, in_path, emb_path):
        return {
            "ingest": {"format": "parquet", "path": in_path},
            "curate": {"min_quality": 0.0, "min_chars": 1,
                       "embeddings": emb_path},
            "out": str(tmp_path / f"pqday{day}_kept.parquet"),
            "history": {"embeddings_index": str(stores / "pq_idx"),
                        "num_clusters": 4, "pq": "4x2"},
            "audit": True,
        }

    d1 = str(tmp_path / "pqday1.parquet")
    spark.createDataFrame([doc(i, c) for i, c in
                           [(1, "a"), (2, "b"), (3, "c"), (4, "d")]],
                          "doc_id long, text string").write.parquet(d1)
    e1 = str(tmp_path / "pqday1_emb.parquet")
    spark.createDataFrame([(i, unit(i)) for i in (1, 2, 3, 4)],
                          "doc_id long, embedding array<double>").write.parquet(e1)
    s1 = run_recipe(spark, mk_recipe(1, d1, e1))
    assert s1["history"]["embeddings_appended"] == 4
    rep = s1["history"]["index_reconstruction"]
    assert rep["n"] == 4 and rep["min"] > 0.99  # 4 vecs / 4 codewords: exact
    data = spark.read.parquet(str(stores / "pq_idx" / "data"))
    assert "codes" in data.columns and "embedding" not in data.columns

    # day 2: one semantic plant (doc 3's embedding under new text), one novel
    d2 = str(tmp_path / "pqday2.parquet")
    spark.createDataFrame(
        [(13, " ".join(f"q{j} z{j}" for j in range(40))),
         doc(14, "novel")],
        "doc_id long, text string").write.parquet(d2)
    e2 = str(tmp_path / "pqday2_emb.parquet")
    spark.createDataFrame(
        [(13, unit(3)), (14, unit(5000))],
        "doc_id long, embedding array<double>").write.parquet(e2)
    s2 = run_recipe(spark, mk_recipe(2, d2, e2))
    kept2 = spark.read.parquet(str(tmp_path / "pqday2_kept.parquet"))
    assert sorted(r.doc_id for r in kept2.collect()) == [14]
    stages = {st["stage"]: st for st in s2["audit"]}
    assert stages["against_semantic"]["dropped"] == 1
    assert s2["history"]["embeddings_appended"] == 1
    assert spark.read.parquet(str(stores / "pq_idx" / "data")).count() == 5

    # config guards
    bad = mk_recipe(3, d2, e2)
    bad["history"]["auto_rebuild"] = True
    with pytest.raises(ValueError, match="auto_rebuild cannot"):
        run_recipe(spark, bad)
    bad2 = mk_recipe(3, d2, e2)
    bad2["history"]["pq"] = "16x99"
    with pytest.raises(ValueError, match="MxB"):
        run_recipe(spark, bad2)


def test_recipe_daily_incremental_sq8_history(spark, tmp_path):
    """history.sq8 (r15): the embedding store persists scalar-quantized
    codes — near-lossless, so the default gate threshold needs no
    recalibration and (unlike pq) auto_rebuild remains valid config.
    Day 1 builds the codes layout + calibration summary; day 2 drops a
    planted semantic dup through it and appends quantized survivors."""
    import math

    import pytest

    from dbc_informed_socketcan_to_parquet_spark.plans.recipe import validate_recipe

    def unit(seed, dim=16):
        v = [math.sin(seed * 12.9898 + d * 78.233) * 43758.5453 % 2.0 - 1.0
             for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    def doc(i, seed):
        return (i, " ".join(f"{seed}tok{j}q {seed}aux{j}z" for j in range(40)))

    stores = tmp_path / "stores"

    def mk_recipe(day, in_path, emb_path, **hist_extra):
        return {
            "ingest": {"format": "parquet", "path": in_path},
            "curate": {"min_quality": 0.0, "min_chars": 1,
                       "embeddings": emb_path},
            "out": str(tmp_path / f"sqday{day}_kept.parquet"),
            "history": {"embeddings_index": str(stores / "sq_idx"),
                        "num_clusters": 4, "sq8": True, **hist_extra},
            "audit": True,
        }

    d1 = str(tmp_path / "sqday1.parquet")
    spark.createDataFrame([doc(i, c) for i, c in
                           [(1, "a"), (2, "b"), (3, "c"), (4, "d")]],
                          "doc_id long, text string").write.parquet(d1)
    e1 = str(tmp_path / "sqday1_emb.parquet")
    spark.createDataFrame([(i, unit(i)) for i in (1, 2, 3, 4)],
                          "doc_id long, embedding array<double>").write.parquet(e1)
    s1 = run_recipe(spark, mk_recipe(1, d1, e1))
    assert s1["history"]["embeddings_appended"] == 4
    assert s1["history"]["index_reconstruction"]["min"] >= 0.995
    data = spark.read.parquet(str(stores / "sq_idx" / "data"))
    assert "codes" in data.columns and "embedding" not in data.columns

    d2 = str(tmp_path / "sqday2.parquet")
    spark.createDataFrame(
        [(13, " ".join(f"q{j} z{j}" for j in range(40))),
         doc(14, "novel")],
        "doc_id long, text string").write.parquet(d2)
    e2 = str(tmp_path / "sqday2_emb.parquet")
    spark.createDataFrame(
        [(13, unit(3)), (14, unit(5000))],
        "doc_id long, embedding array<double>").write.parquet(e2)
    s2 = run_recipe(spark, mk_recipe(2, d2, e2))
    kept2 = spark.read.parquet(str(tmp_path / "sqday2_kept.parquet"))
    assert sorted(r.doc_id for r in kept2.collect()) == [14]
    assert {st["stage"]: st for st in s2["audit"]}[
        "against_semantic"]["dropped"] == 1
    assert spark.read.parquet(str(stores / "sq_idx" / "data")).count() == 5

    # config guards: sq8 + auto_rebuild is VALID (retrains from its own
    # reconstruction); sq8 + pq is refused
    validate_recipe(mk_recipe(3, d2, e2, auto_rebuild=True))
    with pytest.raises(ValueError, match="mutually exclusive"):
        validate_recipe(mk_recipe(3, d2, e2, pq="8x4"))


def test_recipe_history_auto_rebuild(spark, tmp_path):
    """``history.auto_rebuild`` (r15): the embeddings_index path becomes
    a versioned root with a CURRENT.json pointer; a flagged post-append
    advice retrains into the next version at the √N-recommended k and
    publishes by atomic pointer swap, and the NEXT day's gate arms from
    the rebuilt index.  Axis-aligned embeddings make every cosine exact
    (1.0 for the planted dup, 0.0 otherwise) and day 1's ±e0 pairs make
    Lloyd's k=2 exact (the sign-LSH init splits opposite vectors by
    construction), so the growth trigger (recommended k ≥ 2× stored k)
    is pure arithmetic: day 1 lands 4 vectors at k=2 (no flag), day 2
    appends 8 orthogonal ones → n=12, recommended k=4 ≥ 2·2 → rebuild
    v0002.  A day-2 re-run keeps the pointer still — the requested-k
    memo in CURRENT.json stops rebuild oscillation even if the k=4
    retrain collapsed empty clusters."""
    import json as _json
    import os

    def doc(i, letter):
        # one doc-unique letter per doc: every char 5-gram contains it,
        # so cross-doc shingle Jaccard is exactly 0 and the within-batch
        # near-dup stage provably keeps everything
        return (i, " ".join(letter * (3 + j % 7) for j in range(40)))

    def onehot(i, dim=16, sign=1.0):
        return [sign if d == i else 0.0 for d in range(dim)]

    root = str(tmp_path / "stores" / "ivf_root")

    def mk_recipe(day, in_path, emb_path):
        return {
            "ingest": {"format": "parquet", "path": in_path},
            "curate": {"min_quality": 0.0, "min_chars": 1,
                       "embeddings": emb_path},
            "out": str(tmp_path / f"day{day}_kept.parquet"),
            "history": {"digests": str(tmp_path / "stores" / "dig.parquet"),
                        "embeddings_index": root,
                        "auto_rebuild": True,
                        "num_clusters": 2,
                        "rebuild_imbalance": 100.0},
            "audit": True,
        }

    # ---- day 1: 4 novel docs -> trains v0001 (k=2), publishes pointer;
    # embeddings are two at +e0, two at -e0 (opposite signs under every
    # hyperplane -> the k=2 quantizer provably keeps both clusters)
    d1 = str(tmp_path / "day1.parquet")
    spark.createDataFrame([doc(i, "abcd"[i - 1]) for i in (1, 2, 3, 4)],
                          "doc_id long, text string").write.parquet(d1)
    e1 = str(tmp_path / "day1_emb.parquet")
    spark.createDataFrame(
        [(1, onehot(0)), (2, onehot(0)),
         (3, onehot(0, sign=-1.0)), (4, onehot(0, sign=-1.0))],
        "doc_id long, embedding array<double>").write.parquet(e1)
    s1 = run_recipe(spark, mk_recipe(1, d1, e1))
    assert s1["history"]["embeddings_appended"] == 4
    assert "index_rebuilt_to" not in s1["history"]
    with open(os.path.join(root, "CURRENT.json")) as f:
        assert _json.load(f)["version"] == "v0001"

    # ---- day 2: 1 semantic dup of day-1 docs 1/2 (their exact +e0
    # embedding under unrelated text) + 8 novel docs on e1..e8 (cosine
    # 0 vs all history) -> dup drops via v0001, the 8 appends push n to
    # 12 and the growth rule flags -> rebuild at recommended k=4
    d2 = str(tmp_path / "day2.parquet")
    spark.createDataFrame(
        [doc(11, "e")] + [doc(i, "fghijklm"[i - 12]) for i in range(12, 20)],
        "doc_id long, text string").write.parquet(d2)
    e2 = str(tmp_path / "day2_emb.parquet")
    spark.createDataFrame(
        [(11, onehot(0))] + [(i, onehot(i - 11)) for i in range(12, 20)],
        "doc_id long, embedding array<double>").write.parquet(e2)
    s2 = run_recipe(spark, mk_recipe(2, d2, e2))
    stages = {st["stage"]: st for st in s2["audit"]}
    assert stages["against_semantic"]["dropped"] == 1
    assert s2["history"]["embeddings_appended"] == 8
    assert s2["history"]["index_advice"]["rebuild"]
    assert s2["history"]["index_rebuilt_to"] == "v0002"
    assert s2["history"]["index_rebuilt_k"] == 4
    with open(os.path.join(root, "CURRENT.json")) as f:
        assert _json.load(f)["version"] == "v0002"
    # the rebuilt index is complete on disk (Lloyd's may drop empty
    # clusters, so the stored model holds 2..4 of the requested 4)
    assert 2 <= spark.read.parquet(f"{root}/v0002/model").count() <= 4
    assert spark.read.parquet(f"{root}/v0002/data").count() == 12

    # ---- day 2 re-run: gate arms from v0002 (proving the swapped index
    # serves), everything is history, nothing appends, pointer is still
    assert sorted(
        r.doc_id for r in
        spark.read.parquet(str(tmp_path / "day2_kept.parquet")).collect()
    ) == list(range(12, 20))
    s3 = run_recipe(spark, mk_recipe(2, d2, e2))
    assert s3["curate"]["n_docs"] == 0
    assert s3["history"]["embeddings_appended"] == 0
    assert "index_rebuilt_to" not in s3["history"]
    with open(os.path.join(root, "CURRENT.json")) as f:
        assert _json.load(f)["version"] == "v0002"


def test_recipe_auto_rebuild_requires_index(spark, tmp_path):
    """history.auto_rebuild without embeddings_index fails fast — it
    manages exactly that store."""
    recipe = {
        "ingest": {"format": "parquet", "path": str(tmp_path / "x.parquet")},
        "out": str(tmp_path / "o.parquet"),
        "history": {"digests": str(tmp_path / "dig.parquet"),
                    "auto_rebuild": True},
    }
    with pytest.raises(ValueError, match="auto_rebuild"):
        validate_recipe(recipe)


def test_recipe_select_score_sources_exclusive(spark, tmp_path):
    """select.classifier_path and select.score_col together fail fast
    (r13 review: the classifier would silently override the column)."""
    recipe = {
        "ingest": {"format": "parquet", "path": str(tmp_path / "x.parquet")},
        "out": str(tmp_path / "o.parquet"),
        "select": {"out": str(tmp_path / "s.parquet"), "budget": 10,
                   "score_col": "human_score",
                   "classifier_path": str(tmp_path / "clf")},
    }
    with pytest.raises(ValueError, match="mutually\\s+exclusive"):
        validate_recipe(recipe)
